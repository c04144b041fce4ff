"""Structured-Streaming WAL tail: readStream file source → foreachBatch →
the same exactly-once merge (SURVEY.md §2.9)."""

from __future__ import annotations

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine
from image_report_spark.fixtures import ChangeLogGenerator, apply_oracle
from image_report_spark.streaming.tail import stream_apply


def test_stream_apply_matches_oracle(spark, tmp_path):
    gen = ChangeLogGenerator(seed=40, n_convs=30, max_turns=6, n_batches=4,
                             dup_frac=0.02, late_frac=0.1)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8))
    q = stream_apply(eng, log, str(tmp_path / "scp"), available_now=True)
    q.awaitTermination(300)
    expected = apply_oracle(gen.events())
    got = (eng.read().toPandas()
           .sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True))
    assert len(got) == len(expected)
    assert list(got["text"]) == list(expected["text"])
    # all four producer batches were applied under their file-derived ids
    assert eng.checkpoint.applied_batches() == [0, 1, 2, 3]


def test_stream_restart_is_idempotent(spark, tmp_path):
    gen = ChangeLogGenerator(seed=41, n_convs=20, max_turns=5, n_batches=3)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8))
    q = stream_apply(eng, log, str(tmp_path / "scp"), available_now=True)
    q.awaitTermination(300)
    digest = eng.current_table_digest()
    # restart with a FRESH stream checkpoint (worst case: Spark redelivers
    # everything) — engine markers make re-delivery a no-op
    q2 = stream_apply(eng, log, str(tmp_path / "scp2"), available_now=True)
    q2.awaitTermination(300)
    assert eng.current_table_digest() == digest


def test_stream_evolved_schema_restart(spark, tmp_path):
    """VERDICT r2 #7: schema evolution inside a running stream requires a
    restart (file sources need a fixed read schema — documented in
    streaming/tail.py). Pin that the documented procedure actually works:
    stream the pre-evolution batches, stop, add evolved batches (late
    ones carry `meta`), RESTART with the evolved schema on the SAME
    stream checkpoint, drain — the final table equals the batch path."""
    import os
    import shutil

    gen = ChangeLogGenerator(seed=42, n_convs=25, max_turns=5, n_batches=6,
                             evolve=True)
    staging = tmp_path / "all"
    gen.write_log(str(staging))
    files = sorted(os.listdir(str(staging)))
    log = tmp_path / "log"
    log.mkdir()
    for f in files[:2]:  # pre-evolution producer era (no `tool` column)
        shutil.copy(str(staging / f), str(log / f))

    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8))
    scp = str(tmp_path / "scp")
    q = stream_apply(eng, str(log), scp, available_now=True)
    q.awaitTermination(300)
    assert eng.checkpoint.applied_batches() == [0, 1]

    # the producer evolves: later batches add `tool` back and then `meta`
    for f in files[2:]:
        shutil.copy(str(staging / f), str(log / f))
    evolved_schema = spark.read.parquet(str(staging / files[-1])).schema
    assert "meta" in [f.name for f in evolved_schema.fields]

    # restart on the SAME stream checkpoint with the evolved read schema:
    # consumed files are not redelivered, new ones drain through the merge
    q2 = stream_apply(eng, str(log), scp, schema=evolved_schema,
                      available_now=True)
    q2.awaitTermination(300)
    assert eng.checkpoint.applied_batches() == [0, 1, 2, 3, 4, 5]

    # batch-path oracle over the identical log
    eng2 = CdcEngine.init(spark, str(tmp_path / "t2"), str(tmp_path / "cp2"),
                          config=EngineConfig(num_buckets=8))
    eng2.run(str(staging))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "meta"]
    got = (eng.read().toPandas()[cols]
           .sort_values(cols[:2], kind="stable").reset_index(drop=True))
    want = (eng2.read().toPandas()[cols]
            .sort_values(cols[:2], kind="stable").reset_index(drop=True))
    assert got.equals(want)


def test_stream_apply_mor_matches_oracle(spark, tmp_path):
    """Streaming tail composed with the merge-on-read write path: each
    micro-batch lands as delta files; the resolved read equals the oracle
    and compaction restores a defined digest."""
    gen = ChangeLogGenerator(seed=43, n_convs=20, max_turns=5, n_batches=3,
                             dup_frac=0.02, late_frac=0.1)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8, write_mode="mor"))
    q = stream_apply(eng, log, str(tmp_path / "scp"), available_now=True)
    q.awaitTermination(300)
    expected = apply_oracle(gen.events())
    got = (eng.read().toPandas()
           .sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True))
    assert len(got) == len(expected)
    assert list(got["text"]) == list(expected["text"])
    assert eng.checkpoint.applied_batches() == [0, 1, 2]
    out = eng.compact()
    assert out["table_digest"] is not None
    after = (eng.read().toPandas()
             .sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True))
    assert list(after["text"]) == list(expected["text"])
