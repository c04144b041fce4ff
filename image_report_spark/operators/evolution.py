"""Additive schema evolution: per-micro-batch Arrow schema reconciliation.

BASELINE.json:6: "handles additive schema evolution (new columns like
`tool` appearing mid-stream) by reconciling Arrow schemas per micro-batch
before the merge". Policy (graft of the reference's versioned-format
escape hatch, docs/report-schema-v2.md:96-105):

* columns in the target schema but missing from the batch → appended to
  the batch as typed NULLs (old producers keep working);
* columns in the batch but not in the target → appended to the target
  schema as nullable (new producers widen the table; old data files read
  NULL for them via schema projection);
* same name, different type → the batch FAILS (no silent coercion; type
  conflicts need a human).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructField, StructType

#: columns every change event must carry
REQUIRED_EVENT_COLUMNS = ["lsn", "op", "conv_id", "turn_idx", "ts"]

#: Iceberg-style safe type promotions (lossless widenings): a batch column
#: of the narrower type is CAST up; a table column of the narrower type is
#: widened in the evolved schema (old files read through the wider schema)
SAFE_PROMOTIONS: dict[tuple[str, str], str] = {
    ("int", "bigint"): "bigint",
    ("smallint", "int"): "int",
    ("smallint", "bigint"): "bigint",
    ("tinyint", "smallint"): "smallint",
    ("tinyint", "int"): "int",
    ("tinyint", "bigint"): "bigint",
    ("float", "double"): "double",
}


def _promote(a: DataType, b: DataType) -> str | None:
    """The common wider type if (a, b) is a safe promotion pair, else None."""
    sa, sb = a.simpleString(), b.simpleString()
    if sa == sb:
        return sa
    return SAFE_PROMOTIONS.get((sa, sb)) or SAFE_PROMOTIONS.get((sb, sa))


class SchemaConflict(ValueError):
    """Raised when a batch column type conflicts with the target schema."""


def reconcile_schema(
    batch: DataFrame, target_schema: StructType
) -> tuple[DataFrame, StructType]:
    """Align a change batch with the target *logical* schema.

    Returns ``(aligned_batch, evolved_target_schema)``. The aligned batch
    has exactly ``REQUIRED_EVENT_COLUMNS(minus payload overlap) + evolved
    payload columns`` in schema order; the evolved schema is the target
    schema plus any genuinely-new batch payload columns (additive only).
    """
    batch_fields = {f.name: f for f in batch.schema.fields}
    target_fields = {f.name: f for f in target_schema.fields}

    # intersection: identical, safely-promotable (lossless widening —
    # Iceberg type-promotion analog; Spark 4's parquet reader upcasts old
    # files through the widened schema), or a hard conflict
    promoted: dict[str, str] = {}
    for name, bf in batch_fields.items():
        tf = target_fields.get(name)
        if tf is None or bf.dataType == tf.dataType:
            continue
        wider = _promote(bf.dataType, tf.dataType)
        if wider is None:
            raise SchemaConflict(
                f"column {name!r}: batch type {bf.dataType.simpleString()} "
                f"!= table type {tf.dataType.simpleString()}"
            )
        promoted[name] = wider

    missing = [name for name in REQUIRED_EVENT_COLUMNS if name not in batch_fields]
    if missing:
        raise SchemaConflict(f"batch missing required event columns: {missing}")

    from pyspark.sql.types import _parse_datatype_string

    evolved = []
    for f in target_schema.fields:
        if f.name in promoted:
            evolved.append(
                StructField(f.name, _parse_datatype_string(promoted[f.name]), f.nullable)
            )
        else:
            evolved.append(f)
    event_extras = {"lsn", "op"}
    for f in batch.schema.fields:
        if f.name not in target_fields and f.name not in event_extras:
            evolved.append(StructField(f.name, f.dataType, nullable=True))
    evolved_schema = StructType(evolved)

    aligned = batch
    evolved_types = {f.name: f.dataType for f in evolved_schema.fields}
    for name in promoted:
        aligned = aligned.withColumn(name, F.col(name).cast(evolved_types[name]))
    for f in evolved_schema.fields:
        if f.name not in batch_fields:
            aligned = aligned.withColumn(f.name, F.lit(None).cast(f.dataType))
    # canonical column order: event header then evolved payload
    cols = ["lsn", "op"] + [f.name for f in evolved_schema.fields if f.name not in ("lsn", "op")]
    return aligned.select(*cols), evolved_schema
