"""Run-length encoding as a distributed DataFrame op.

Graft of the reference's RLE codec (utils.py:229-253 encode,
utils.py:256-267 decode; round-trip property tests/test_rle.py:19-30):
collapse runs of equal adjacent values into (value, run_length) — here
per group, ordered by a position column, via the classic window idiom
``run_id = sum(value != lag(value)) OVER (ORDER BY pos)``. Decode is
``explode(sequence())`` — exact inverse, tested as a round-trip."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rle_encode(
    df: DataFrame, key: str, pos: str, value: str
) -> DataFrame:
    """→ (key, run_idx, value, run_len), ordered runs per key."""
    w = Window.partitionBy(key).orderBy(pos)
    flagged = df.withColumn(
        "_new_run",
        F.when(
            F.lag(value).over(w).isNull()
            | (F.lag(value).over(w) != F.col(value)),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn("_run", F.sum("_new_run").over(w))
    return (
        runs.groupBy(key, "_run")
        .agg(
            F.first(value).alias(value),
            F.count(F.lit(1)).alias("run_len"),
            F.min(pos).alias("_start"),
        )
        .withColumn(
            "run_idx",
            F.row_number().over(Window.partitionBy(key).orderBy("_start")) - 1,
        )
        .select(key, "run_idx", value, "run_len")
    )


def rle_decode(df: DataFrame, key: str, value: str) -> DataFrame:
    """Inverse: expand runs back to (key, pos, value) with dense positions."""
    w = Window.partitionBy(key).orderBy("run_idx")
    with_offset = df.withColumn(
        "_offset", F.coalesce(F.sum("run_len").over(w) - F.col("run_len"), F.lit(0))
    )
    return (
        with_offset.select(
            key,
            F.col(value),
            F.explode(
                F.sequence(F.col("_offset"), F.col("_offset") + F.col("run_len") - 1)
            ).alias("pos"),
        )
        .select(key, "pos", value)
    )
