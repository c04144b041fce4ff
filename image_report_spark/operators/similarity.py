"""Similarity search over embedding columns (``array<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: one scan, JVM-side dot
  product, ``ORDER BY ... LIMIT k`` (TakeOrderedAndProject — no full
  sort). The correctness baseline.
* :func:`knn_lsh` — random-hyperplane LSH: deterministic seeded planes,
  sign-bit bucket key, search only the query's bucket (and optionally
  Hamming-adjacent buckets). The 100 TB path: the scan prunes to
  ~n/2^planes rows; planes are a broadcast literal, no shuffle at all
  for a single-bucket probe.
* :func:`ivf_assign` / :func:`knn_ivf` — IVF-style coarse quantization:
  assign each vector to its nearest of C seeded centroids (broadcast
  crossJoin + min_by — C is small), probe only the query's cell(s).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_report_spark.functions.vectors import cosine, dot, lit_vector


def knn_bruteforce(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    q = lit_vector(query_vec)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), round_to).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int = 97) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col, dim: int, n_planes: int = 8, seed: int = 97):
    """Sign-bit bucket id from ``n_planes`` seeded hyperplanes."""
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        d = dot(vec_col.cast("array<double>"), lit_vector(list(planes[i])))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def knn_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 97,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign bucket."""
    dim = len(query_vec)
    planes = _planes(dim, n_planes, seed)
    qb = 0
    for i in range(n_planes):
        if float(np.dot(planes[i], query_vec)) > 0:
            qb |= 1 << i
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes, seed))
    probe = bucketed.filter(F.col("_bucket") == qb)
    return knn_bruteforce(probe, query_vec, k, id_col, vec_col, round_to)


def ivf_assign(
    df: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 101,
) -> DataFrame:
    """Assign each vector to its nearest seeded centroid (coarse IVF cell).

    Centroids are literals (broadcast by construction); the argmin is a
    fold over a small array of structs — no shuffle, no UDF."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    v = F.col(vec_col).cast("array<double>")
    scored = F.array(
        *[
            F.struct(F.lit(c).alias("cell"), dot(v, lit_vector(list(cents[c]))).alias("d"))
            for c in range(n_cells)
        ]
    )
    best = F.aggregate(
        scored,
        F.struct(F.lit(-1).alias("cell"), F.lit(float("-inf")).alias("d")),
        lambda acc, x: F.when(x["d"] > acc["d"], x).otherwise(acc),
    )
    return df.withColumn("_cell", best["cell"])


def knn_ivf(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 101,
    round_to: int = 4,
) -> DataFrame:
    """Probe only the query's IVF cell (nprobe=1)."""
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    qcell = int(np.argmax(cents @ np.asarray(query_vec)))
    assigned = ivf_assign(df, n_cells, dim, vec_col, seed)
    return knn_bruteforce(
        assigned.filter(F.col("_cell") == qcell), query_vec, k, id_col, vec_col, round_to
    )
