"""TableSink interface (SURVEY §7 M2, VERDICT r2 #6): the engine writes
through a narrow surface with two backends — IceliteTable (jar-free
default) and the documented IcebergSink stub — so the cluster swap is an
injection, not a rewrite."""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine
from image_report_spark.plans.icelite import IceliteTable
from image_report_spark.plans.sink import IcebergSink, TableSink


def test_icelite_satisfies_the_protocol(spark, tmp_path):
    from image_report_spark.engine import TRANSCRIPT_SCHEMA

    t = IceliteTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, 4)
    assert isinstance(t, TableSink)


def test_iceberg_stub_covers_the_protocol_and_refuses_cleanly(spark):
    # every protocol method exists with a compatible signature
    for name, member in inspect.getmembers(TableSink):
        if name.startswith("_") or not callable(member):
            continue
        assert hasattr(IcebergSink, name), f"IcebergSink missing {name}"
        assert (
            inspect.signature(getattr(IcebergSink, name)).parameters.keys()
            == inspect.signature(member).parameters.keys()
        ), name
    # and construction refuses cleanly without the jar (this sandbox)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergSink(spark, "catalog.db.tbl")


def test_engine_runs_through_injected_sink(spark, tmp_path):
    """The engine accepts a pre-created TableSink and applies a batch
    through it unchanged — the injection point the Iceberg swap uses."""
    from image_report_spark.engine import TRANSCRIPT_SCHEMA

    root = str(tmp_path / "tbl")
    sink = IceliteTable.create(spark, root, TRANSCRIPT_SCHEMA, num_buckets=4)
    sink.set_checksum_columns([f.name for f in TRANSCRIPT_SCHEMA.fields])
    eng = CdcEngine.init(
        spark, root, str(tmp_path / "cp"),
        config=EngineConfig(num_buckets=4), table=sink,
    )
    assert eng.table is sink
    changes = spark.createDataFrame(
        [(1, "I", "c1", 0, "user", "hello", None, "2024-01-01 00:00:00")],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rpt = eng.apply_batch(changes, 0)
    assert rpt.applied == 1 and rpt.rows_after == 1
    assert eng.read().count() == 1


def test_injected_sink_must_be_precreated(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="create it via"):
        CdcEngine.init(
            spark, str(tmp_path / "none"), str(tmp_path / "cp"),
            table=IceliteTable(spark, str(tmp_path / "none")),
        )
