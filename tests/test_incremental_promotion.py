"""Incremental change feed (changes_between), snapshot history, and safe
type promotion — the Iceberg-parity surfaces added on top of the core."""

from __future__ import annotations

import pytest

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine, TRANSCRIPT_SCHEMA
from image_report_spark.fixtures import ChangeLogGenerator
from image_report_spark.operators.evolution import SchemaConflict, reconcile_schema


def _engine(spark, tmp_path, **kw):
    return CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                          config=EngineConfig(num_buckets=8, **kw))


def test_changes_between_yields_exactly_the_new_winners(spark, tmp_path):
    gen = ChangeLogGenerator(seed=60, n_convs=40, max_turns=6, n_batches=4)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = _engine(spark, tmp_path)
    reports = eng.run(log)
    s0, s2, s4 = 0, reports[1].snapshot_id, reports[3].snapshot_id

    # feed from table start == all current rows + tombstones
    full = eng.table.changes_between(s0, s4)
    live = full.filter("_op <> 'D'")
    assert live.count() == eng.read().count()

    # feed across the last two batches == rows whose winning lsn arrived there
    delta = eng.table.changes_between(s2, s4)
    max_lsn_s2 = max(
        e["last_applied_lsn"] or -1
        for e in eng.table.snapshot(s2)["manifest"]
    )
    got = delta.select("_lsn").collect()
    assert got, "delta feed should be non-empty"
    # every fed row's winning event is newer than its partition's old HWM —
    # and applying the feed onto the old snapshot reproduces the new table
    old = eng.table.read(snapshot_id=s2, with_lineage=True)
    updated_keys = delta.select("conv_id", "turn_idx").distinct()
    carried = old.join(updated_keys, ["conv_id", "turn_idx"], "left_anti")
    rebuilt = carried.unionByName(delta).filter("_op <> 'D'").drop(
        "_lsn", "_op", "_p"
    )
    now = eng.read()
    assert rebuilt.exceptAll(now).count() == 0
    assert now.exceptAll(rebuilt).count() == 0


def test_history_lineage(spark, tmp_path):
    gen = ChangeLogGenerator(seed=61, n_convs=20, max_turns=4, n_batches=3)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = _engine(spark, tmp_path)
    eng.run(log)
    h = eng.table.history()
    assert [x["snapshot_id"] for x in h] == [0, 1, 2, 3]
    assert [x["parent_snapshot_id"] for x in h] == [None, 0, 1, 2]
    assert h[-1]["ledger"]["rows_after"] == eng.read().count()


def test_type_promotion_batch_wider_than_table(spark, tmp_path):
    """A batch carrying turn_idx as BIGINT widens the table column."""
    eng = _engine(spark, tmp_path)
    b1 = spark.createDataFrame(
        [(0, "I", "a", 0, "user", "v1", None, "2026-01-01 00:00:00")],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts_s string",
    ).selectExpr("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool",
                 "cast(ts_s as timestamp) as ts")
    eng.apply_batch(b1, 0)
    b2 = spark.createDataFrame(
        [(1, "I", "a", 2147483648, "user", "big", None, "2026-01-01 00:00:01")],
        "lsn long, op string, conv_id string, turn_idx long, role string, "
        "text string, tool string, ts_s string",
    ).selectExpr("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool",
                 "cast(ts_s as timestamp) as ts")
    eng.apply_batch(b2, 1)
    final = eng.read()
    assert dict(final.dtypes)["turn_idx"] == "bigint"
    rows = {(r.conv_id, r.turn_idx): r.text for r in final.collect()}
    assert rows[("a", 0)] == "v1" and rows[("a", 2147483648)] == "big"


def test_type_promotion_batch_narrower_is_cast_up(spark):
    from pyspark.sql.types import LongType, StructField, StructType, StringType, TimestampType

    wide = StructType([
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", LongType(), False),   # table already wide
        StructField("text", StringType(), True),
        StructField("ts", TimestampType(), True),
    ])
    batch = spark.createDataFrame(
        [(0, "I", "a", 1, "x", None)],
        "lsn long, op string, conv_id string, turn_idx int, text string, ts timestamp",
    )
    aligned, evolved = reconcile_schema(batch, wide)
    assert dict(aligned.dtypes)["turn_idx"] == "bigint"
    assert [f.dataType.simpleString() for f in evolved.fields
            if f.name == "turn_idx"] == ["bigint"]


def test_unsafe_promotion_still_conflicts(spark):
    from image_report_spark.engine import TRANSCRIPT_SCHEMA

    bad = spark.createDataFrame(
        [(0, "I", "a", 0, 1.5, None)],
        "lsn long, op string, conv_id string, turn_idx int, text double, ts timestamp",
    )
    with pytest.raises(SchemaConflict):
        reconcile_schema(bad, TRANSCRIPT_SCHEMA)
