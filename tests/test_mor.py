"""Merge-on-read write mode (EngineConfig.write_mode='mor').

The scale argument: at 100 TB an update-heavy CDC batch that touches a few
rows per partition must not rewrite terabytes of text payloads (COW's
trade); MOR writes per-partition DELTA files and defers the merge to read
time / compaction — the Iceberg-v2 / Hudi positional-delete analog on the
engine's own table format.

Correctness contract tested here:
* the MOR ledger equals the COW ledger batch-for-batch (the keys-only
  classification scan reproduces exactly what COW's union window counts);
* the MOR resolved read equals the COW table and the pandas oracle at
  every batch point;
* base files are REUSED (appended-to, never rewritten) by MOR batches;
* compact() folds deltas into base, after which the table digest is
  defined again and EQUALS the COW digest for the same log;
* idempotent re-apply beyond the dedup window classifies as replays
  (dups), leaving the table unchanged;
* reads of a fully-compacted table are scan-only (no resolve window).
"""

from __future__ import annotations

import pandas as pd
import pytest

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine
from image_report_spark.fixtures import ChangeLogGenerator, apply_oracle

LEDGER_KEYS = [
    "events_read", "applied", "deduped", "superseded", "quarantined",
    "rows_before", "inserts", "updates", "deletes", "rows_after",
]


def _mk(spark, root, mode: str):
    return CdcEngine.init(
        spark,
        str(root / f"table-{mode}"),
        str(root / f"cp-{mode}"),
        config=EngineConfig(num_buckets=8, write_mode=mode),
    )


def _sorted_read(eng):
    return (
        eng.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


@pytest.fixture(scope="module")
def gen():
    # duplicates, out-of-order arrival, late updates, malformed rows —
    # the full generator adversarial surface, across 4 micro-batches
    return ChangeLogGenerator(
        n_convs=40, max_turns=6, n_batches=4, seed=7,
        dup_frac=0.05, late_frac=0.1, malformed_frac=0.02,
    )


def test_mor_ledger_and_read_match_cow_and_oracle(spark, tmp_path, gen):
    log_dir = str(tmp_path / "log")
    gen.write_log(log_dir)
    cow = _mk(spark, tmp_path, "cow")
    mor = _mk(spark, tmp_path, "mor")
    cow_reports = cow.run(log_dir)
    mor_reports = mor.run(log_dir)
    assert len(cow_reports) == len(mor_reports)
    for cr, mr in zip(cow_reports, mor_reports):
        assert mr.conservation_ok(), mr.ledger(set(LEDGER_KEYS))
        got = {k: getattr(mr, k) for k in LEDGER_KEYS}
        want = {k: getattr(cr, k) for k in LEDGER_KEYS}
        assert got == want, f"batch {mr.batch_id}: MOR ledger {got} != COW {want}"
    got = _sorted_read(mor)
    want = _sorted_read(cow)
    pd.testing.assert_frame_equal(got, want)
    exp = apply_oracle(gen.events())
    assert len(got) == len(exp)
    exp = exp.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    assert got["text"].tolist() == exp["text"].tolist()


def test_mor_appends_deltas_without_rewriting_base(spark, tmp_path, gen):
    log_dir = str(tmp_path / "log")
    gen.write_log(log_dir)
    mor = _mk(spark, tmp_path, "mor")
    mor.run(log_dir, max_batches=1)
    snap1 = mor.table.snapshot()
    base_files = {e["partition"]: list(e["files"]) for e in snap1["manifest"]}
    mor.run(log_dir, max_batches=2)
    snap2 = mor.table.snapshot()
    assert snap2["snapshot_id"] > snap1["snapshot_id"]
    with_deltas = [e for e in snap2["manifest"] if e.get("delta_files")]
    assert with_deltas, "batch 1 wrote no delta files"
    for e in snap2["manifest"]:
        p = e["partition"]
        if p in base_files:
            # the batch APPENDED deltas; the base file list is untouched
            assert e["files"] == base_files[p], f"partition {p} base rewritten"
    for e in with_deltas:
        # checksum undefined while deltas pend
        assert e["checksum"] is None
    assert snap2.get("table_digest") is None


def test_mor_compaction_restores_cow_digest(spark, tmp_path, gen):
    log_dir = str(tmp_path / "log")
    gen.write_log(log_dir)
    cow = _mk(spark, tmp_path, "cow")
    mor = _mk(spark, tmp_path, "mor")
    cow.run(log_dir)
    mor.run(log_dir)
    before = _sorted_read(mor)
    out = mor.compact()
    assert out["compacted_partitions"] > 0
    assert out["table_digest"] is not None
    # THE equivalence: same log, different physical strategy, same digest
    assert out["table_digest"] == cow.current_table_digest()
    # content unchanged by compaction; manifest fully clean
    pd.testing.assert_frame_equal(_sorted_read(mor), before)
    snap = mor.table.snapshot()
    assert all(not (e.get("delta_files") or []) for e in snap["manifest"])
    assert all(e["checksum"] is not None for e in snap["manifest"])
    # compaction is idempotent / a no-op when clean
    again = mor.compact()
    assert again["compacted_partitions"] == 0
    assert again["table_digest"] == out["table_digest"]


def test_mor_auto_compaction_policy(spark, tmp_path):
    """``mor_compact_delta_ratio``: a batch whose delta bytes cross
    ratio × base bytes triggers partition-local compaction inside the same
    apply call — no manual compact() anywhere — and the table ends fully
    clean: scan-only read plan, defined digest EQUAL to COW's (VERDICT r4
    #6; motivated by round 3's 2.4 s-dirty vs 0.7 s-compacted read)."""
    gen2 = ChangeLogGenerator(n_convs=10, max_turns=4, n_batches=2, seed=5)
    log_dir = str(tmp_path / "log")
    gen2.write_log(log_dir)
    cow = _mk(spark, tmp_path, "cow")
    cow.run(log_dir)
    auto = CdcEngine.init(
        spark,
        str(tmp_path / "table-auto"),
        str(tmp_path / "cp-auto"),
        config=EngineConfig(
            num_buckets=8, write_mode="mor", mor_compact_delta_ratio=0.2
        ),
    )
    reports = auto.run(log_dir)
    # similarly-sized batches against a small base cross a 0.2 ratio every
    # time — the policy must fire, and say so in the report
    assert all(r.auto_compacted_partitions > 0 for r in reports)
    assert all("auto_compact" in r.phase_ms for r in reports)
    assert all(r.conservation_ok() for r in reports)
    snap = auto.table.snapshot()
    assert all(not (e.get("delta_files") or []) for e in snap["manifest"])
    # reads return to scan-only plans (no MOR resolve window)
    plan = auto.read()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # digest defined again and COW-equal WITHOUT any manual compact()
    assert auto.current_table_digest() is not None
    assert auto.current_table_digest() == cow.current_table_digest()


def test_mor_auto_compaction_below_ratio_leaves_deltas(spark, tmp_path):
    """A generous ratio must NOT fire on a small delta — the policy is a
    threshold, not an always-compact: deltas stay pending and the read
    still resolves through the window."""
    gen2 = ChangeLogGenerator(n_convs=40, max_turns=6, n_batches=2, seed=9)
    log_dir = str(tmp_path / "log")
    gen2.write_log(log_dir)
    eng = CdcEngine.init(
        spark,
        str(tmp_path / "table-hi"),
        str(tmp_path / "cp-hi"),
        config=EngineConfig(
            num_buckets=8, write_mode="mor", mor_compact_delta_ratio=1e9
        ),
    )
    # batch 0 fills empty partitions (base bytes 0 → any delta crosses);
    # batch 1's delta against the established base is far below 1e9×
    reports = eng.run(log_dir)
    assert reports[0].auto_compacted_partitions > 0
    assert reports[1].auto_compacted_partitions == 0
    snap = eng.table.snapshot()
    assert any(e.get("delta_files") for e in snap["manifest"])
    plan = eng.read()._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan


def test_mor_reapply_beyond_window_is_replay(spark, tmp_path):
    gen = ChangeLogGenerator(n_convs=10, max_turns=4, n_batches=1, seed=3)
    log_dir = str(tmp_path / "log")
    gen.write_log(log_dir)
    mor = _mk(spark, tmp_path, "mor")
    [rpt0] = mor.run(log_dir)
    before = _sorted_read(mor)
    rows_before = rpt0.rows_after
    # replay the identical events as a far-future batch id — outside the
    # dedup window, so only the vs-incumbent classification can catch them
    from image_report_spark.sources.changelog import ChangeLogSource

    src = ChangeLogSource(mor.spark, log_dir)
    [(_, path)] = src.list_batches()
    rpt = mor.apply_batch(src.read_batch(path), batch_id=99)
    assert rpt.conservation_ok()
    assert rpt.applied == 0 and rpt.inserts == 0 and rpt.deletes == 0
    assert rpt.rows_after == rows_before
    pd.testing.assert_frame_equal(_sorted_read(mor), before)


def test_compacted_read_is_scan_only(spark, tmp_path):
    gen = ChangeLogGenerator(n_convs=10, max_turns=4, n_batches=2, seed=5)
    log_dir = str(tmp_path / "log")
    gen.write_log(log_dir)
    mor = _mk(spark, tmp_path, "mor")
    mor.run(log_dir)
    dirty_plan = mor.read()._jdf.queryExecution().executedPlan().toString()
    assert "Window" in dirty_plan  # pending deltas resolve through the window
    mor.compact()
    clean_plan = mor.read()._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in clean_plan  # clean partitions are scan-only


def test_expire_snapshots_retains_referenced_delta_files(spark, tmp_path):
    gen = ChangeLogGenerator(n_convs=10, max_turns=4, n_batches=2, seed=13)
    log_dir = str(tmp_path / "log")
    gen.write_log(log_dir)
    mor = _mk(spark, tmp_path, "mor")
    mor.run(log_dir)
    before = _sorted_read(mor)
    # keep only the newest snapshot: batch-0's delta files are still
    # referenced by the current manifest and must survive the sweep
    mor.table.expire_snapshots(keep_last=1)
    pd.testing.assert_frame_equal(_sorted_read(mor), before)


def test_mor_changes_between_sees_delta_commits(spark, tmp_path):
    gen = ChangeLogGenerator(n_convs=10, max_turns=4, n_batches=2, seed=11)
    log_dir = str(tmp_path / "log")
    gen.write_log(log_dir)
    mor = _mk(spark, tmp_path, "mor")
    reports = mor.run(log_dir)
    s0, s1 = reports[0].snapshot_id, reports[1].snapshot_id
    ch = mor.table.changes_between(s0, s1)
    # every change row carries an LSN above batch 0's high-water mark
    hwm = max(
        e["last_applied_lsn"]
        for e in mor.table.snapshot(s0)["manifest"]
        if e["last_applied_lsn"] is not None
    )
    assert ch.count() > 0
    assert ch.filter(f"_lsn <= {hwm}").count() == 0
