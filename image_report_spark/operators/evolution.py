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
from pyspark.sql.types import StructField, StructType

#: columns every change event must carry
REQUIRED_EVENT_COLUMNS = ["lsn", "op", "conv_id", "turn_idx", "ts"]


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

    # type-conflict check over the intersection
    for name, bf in batch_fields.items():
        tf = target_fields.get(name)
        if tf is not None and bf.dataType != tf.dataType:
            raise SchemaConflict(
                f"column {name!r}: batch type {bf.dataType.simpleString()} "
                f"!= table type {tf.dataType.simpleString()}"
            )

    missing = [name for name in REQUIRED_EVENT_COLUMNS if name not in batch_fields]
    if missing:
        raise SchemaConflict(f"batch missing required event columns: {missing}")

    evolved = list(target_schema.fields)
    event_extras = {"lsn", "op"}
    for f in batch.schema.fields:
        if f.name not in target_fields and f.name not in event_extras:
            evolved.append(StructField(f.name, f.dataType, nullable=True))
    evolved_schema = StructType(evolved)

    aligned = batch
    for f in evolved_schema.fields:
        if f.name not in batch_fields:
            aligned = aligned.withColumn(f.name, F.lit(None).cast(f.dataType))
    # canonical column order: event header then evolved payload
    cols = ["lsn", "op"] + [f.name for f in evolved_schema.fields if f.name not in ("lsn", "op")]
    return aligned.select(*cols), evolved_schema
