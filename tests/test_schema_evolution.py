"""Additive schema evolution (BASELINE.json:6): early batches omit `tool`,
late batches add `meta`; type conflicts fail the batch atomically."""

from __future__ import annotations

import pandas as pd
import pytest

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine, TRANSCRIPT_SCHEMA
from image_report_spark.fixtures import ChangeLogGenerator, apply_oracle
from image_report_spark.operators.evolution import SchemaConflict, reconcile_schema


def test_evolution_end_to_end(spark, tmp_path):
    gen = ChangeLogGenerator(seed=20, n_convs=40, max_turns=6, n_batches=6, evolve=True)
    log = str(tmp_path / "log")
    gen.write_log(log)
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=8))
    reports = eng.run(log)
    assert all(r.conservation_ok() for r in reports)

    final = eng.read()
    # target schema grew additively: base columns + meta
    assert set(final.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts", "meta"}

    # rows written before `meta` existed read NULL for it; rows whose winner
    # came from a pre-`tool` batch read NULL tool — full content matches the
    # oracle applied over the union schema
    events = gen.events()
    batches = gen.batches()
    # reconstruct the oracle's view of what was actually emitted per batch
    emitted = []
    for b in batches:
        bb = b.copy()
        if "tool" not in bb.columns:
            bb["tool"] = None
        if "meta" not in bb.columns:
            bb["meta"] = None
        emitted.append(bb)
    oracle_events = pd.concat(emitted, ignore_index=True)
    expected = apply_oracle(oracle_events)

    got = (final.toPandas()
           .sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True))
    assert len(got) == len(expected)
    exp = expected.reset_index(drop=True)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_dtype=False)
    pd.testing.assert_series_equal(got["tool"], exp["tool"].astype(object), check_dtype=False)
    pd.testing.assert_series_equal(
        got["meta"], exp["meta"].astype(object), check_names=False, check_dtype=False
    )


def test_reconcile_adds_missing_as_null_and_new_as_nullable(spark):
    batch = spark.createDataFrame(
        [(0, "I", "c1", 0, "hello", "2026-01-01T00:00:00")],
        "lsn long, op string, conv_id string, turn_idx int, text string, ts_raw string",
    ).withColumn("ts", __import__("pyspark").sql.functions.col("ts_raw").cast("timestamp")).drop("ts_raw")
    aligned, evolved = reconcile_schema(batch, TRANSCRIPT_SCHEMA)
    assert "role" in aligned.columns and "tool" in aligned.columns
    assert [f.name for f in evolved.fields] == [f.name for f in TRANSCRIPT_SCHEMA.fields]
    row = aligned.first()
    assert row["role"] is None and row["tool"] is None and row["text"] == "hello"


def test_type_conflict_fails_batch(spark, tmp_path):
    eng = CdcEngine.init(spark, str(tmp_path / "t"), str(tmp_path / "cp"),
                         config=EngineConfig(num_buckets=4))
    bad = spark.createDataFrame(
        [(0, "I", "c1", 0, 123, None)],
        "lsn long, op string, conv_id string, turn_idx int, text int, ts timestamp",
    )
    before = eng.table.current_version()
    with pytest.raises(SchemaConflict):
        eng.apply_batch(bad, 0)
    assert eng.table.current_version() == before  # nothing committed


def test_missing_required_column_fails(spark):
    df = spark.createDataFrame([(0, "I")], "lsn long, op string")
    with pytest.raises(SchemaConflict):
        reconcile_schema(df, TRANSCRIPT_SCHEMA)
