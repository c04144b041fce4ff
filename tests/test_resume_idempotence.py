"""Round-trip / idempotence / crash-resume invariants — graft of the
reference's round-trip (tests/test_rle.py:19-30) and idempotent-setup
(tests/test_utils_logging.py:7-15) tests.

* applying the same batch twice → identical table, identical digest;
* crash-resume (stop after batch k, new engine instance) == uninterrupted;
* full replay from LSN 0 == incrementally maintained table (replay_verify);
* replaying an already-committed *older* batch is absorbed by the dedup
  window (exactly-once under replay)."""

from __future__ import annotations

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine
from image_report_spark.fixtures import ChangeLogGenerator, apply_oracle


def _gen(seed=7, **kw):
    kw.setdefault("n_convs", 50)
    kw.setdefault("max_turns", 8)
    kw.setdefault("n_batches", 6)
    return ChangeLogGenerator(seed=seed, **kw)


def test_reapply_same_batch_is_noop(spark, tmp_path):
    gen = _gen()
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8))
    from image_report_spark.sources.changelog import ChangeLogSource

    src = ChangeLogSource(spark, log)
    batches = src.list_batches()
    eng.apply_batch(src.read_batch(batches[0][1]), 0)
    d1 = eng.current_table_digest()
    n1 = eng.read().count()
    # simulate the crash-between-snapshot-and-marker path: re-apply batch 0
    rpt = eng.apply_batch(src.read_batch(batches[0][1]), 0)
    assert eng.current_table_digest() == d1
    assert eng.read().count() == n1
    assert rpt.applied == 0  # every event ties with its incumbent and yields
    assert rpt.conservation_ok()


def test_crash_resume_equals_uninterrupted(spark, tmp_path):
    gen = _gen(seed=8, dup_frac=0.03, late_frac=0.1)
    log_a, log_b = str(tmp_path / "log_a"), str(tmp_path / "log_b")
    gen.write_log(log_a)
    _gen(seed=8, dup_frac=0.03, late_frac=0.1).write_log(log_b)

    # uninterrupted run
    full = CdcEngine.init(spark, str(tmp_path / "t1"), str(tmp_path / "cp1"),
                          config=EngineConfig(num_buckets=8))
    full.run(log_a)

    # interrupted: apply 3 batches, then a *fresh* engine resumes
    part = CdcEngine.init(spark, str(tmp_path / "t2"), str(tmp_path / "cp2"),
                          config=EngineConfig(num_buckets=8))
    part.run(log_b, max_batches=3)
    resumed = CdcEngine.init(spark, str(tmp_path / "t2"), str(tmp_path / "cp2"),
                             config=EngineConfig(num_buckets=8))
    reports = resumed.run(log_b)
    assert sum(1 for r in reports if r.skipped) == 3  # markers honored

    assert full.current_table_digest() == resumed.current_table_digest()
    a, b = full.read(), resumed.read()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_replay_of_old_batch_absorbed_by_dedup_window(spark, tmp_path):
    gen = _gen(seed=9, n_batches=4)
    log = str(tmp_path / "log")
    paths = gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8), dedup_window_batches=4)
    eng.run(log)
    d = eng.current_table_digest()
    rows = eng.read().count()
    # an upstream replay: batch 1's events re-arrive as a NEW batch id
    from image_report_spark.sources.changelog import ChangeLogSource

    src = ChangeLogSource(spark, log)
    replay = src.read_batch(paths[1])
    rpt = eng.apply_batch(replay, 4)
    assert rpt.applied == 0
    assert rpt.deduped == rpt.events_read  # all recognized as replays
    assert eng.current_table_digest() == d
    assert eng.read().count() == rows
    assert rpt.conservation_ok()


def test_replay_verify_full_vs_incremental(spark, tmp_path):
    gen = _gen(seed=10, dup_frac=0.02, late_frac=0.1, malformed_frac=0.01)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8))
    eng.run(log)
    report = eng.replay_verify(log, str(tmp_path / "scratch"))
    assert report["ok"], report
    # and both equal the oracle
    expected = apply_oracle(gen.events())
    assert report["rows_incremental"] == len(expected)


def test_time_travel_and_expire(spark, tmp_path):
    gen = _gen(seed=11, n_batches=3)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8))
    reports = eng.run(log)
    sids = [r.snapshot_id for r in reports]
    # time travel: row counts at each snapshot match each batch's rows_after
    for r in reports:
        assert eng.table.read(snapshot_id=r.snapshot_id).count() == r.rows_after
    # expire old snapshots → older reads gone, current intact
    n_current = eng.read().count()
    deleted = eng.table.expire_snapshots(keep_last=1)
    assert deleted > 0
    assert eng.read().count() == n_current
    assert eng.table.snapshots() == [sids[-1]]
