"""Hot-key (skew) handling: detection + salted repartitioning.

BASELINE.json:6 names this explicitly: "uses salted repartitioning to
break conv_id hot-key skew". AQE's skew-join splitting covers joins, but
NOT ``groupBy().applyInPandas`` — a zipf-hot ``conv_id`` would funnel one
giant group to one task. Salting fixes that: hot keys get
``_salt = pmod(xxhash64(turn_idx), n_salt)`` (cold keys get salt 0), so a
hot conversation fans out over ``n_salt`` tasks while per-key ``(conv_id,
turn_idx)`` resolution stays correct — the same turn always lands in the
same salted group.

Detection is a cheap count-per-key aggregate (map-side partial combine →
tiny result); at 100 TB this is one extra scan-light pass over the batch
(not the table) and the result set is bounded by #distinct hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(df: DataFrame, key: str = "conv_id", threshold: int = 100_000) -> list[str]:
    """Keys whose event count in this batch exceeds ``threshold``.

    Returns a (small) driver-side list — bounded by ``batch_size /
    threshold`` keys, so the collect is safe by construction.
    """
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def salt_hot_keys(
    df: DataFrame,
    hot_keys: list[str],
    key: str = "conv_id",
    n_salt: int = 16,
) -> DataFrame:
    """Add a ``_salt`` column: fan-out for hot keys, 0 for the rest.

    The salt is derived from ``turn_idx`` (not random) so it is
    deterministic and keeps all events for one turn in one group.
    """
    if not hot_keys:
        return df.withColumn("_salt", F.lit(0))
    is_hot = F.col(key).isin(hot_keys)
    return df.withColumn(
        "_salt",
        F.when(is_hot, F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(n_salt)).cast("int"))
        .otherwise(F.lit(0)),
    )
