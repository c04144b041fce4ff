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
