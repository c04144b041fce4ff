"""image_report_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (not a port) grafting the semantics of the reference
``seanwevans/Image-Report`` (deterministic ordered processing, a
conservation-ledger accounting invariant, config-driven column selection,
per-record checksums, embarrassingly-parallel batch execution with a failure
policy, and golden/property-based testing — see SURVEY.md) onto idiomatic
Spark: a binlog/WAL-style change stream is tailed and applied to an
Iceberg-style lake table of multi-turn conversation transcripts via
key-partitioned MERGE with last-writer-wins resolution, an LSN-ordered dedup
window, additive schema evolution, salted skew handling, and a checkpoint
manifest with per-partition lineage enabling exactly-once crash-resume.

Everything is pure DataFrame ops + vectorized pandas/Arrow UDFs; no per-row
Python in any hot path.
"""

from image_report_spark.config import EngineConfig  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):  # lazy: avoid importing pyspark for fixture-only use
    if name in ("CdcEngine", "BatchReport"):
        from image_report_spark import engine

        return getattr(engine, name)
    raise AttributeError(name)
