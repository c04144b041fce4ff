"""Similarity search over embedding columns (``array<float>``).

* :func:`knn_bruteforce` — exact cosine top-k: one scan, JVM-side dot
  product, ``ORDER BY ... LIMIT k`` (TakeOrderedAndProject — no full
  sort). The correctness baseline.
* :func:`knn_lsh` — random-hyperplane LSH: deterministic seeded planes,
  sign-bit bucket key, probe the query's bucket plus (``probe_dist``)
  Hamming-adjacent buckets. :func:`knn_lsh_adaptive` widens the probe
  radius until ≥ k candidates exist (empty-primary-bucket fallback).
  The 100 TB path: the scan prunes to ~n·(probed buckets)/2^planes rows;
  planes are broadcast literals, no shuffle for the probe.
* :func:`ivf_assign` / :func:`knn_ivf` — IVF coarse quantization: each
  vector assigned to its nearest of C centroids by ONE vectorized numpy
  matmul per Arrow batch (the centroid matrix ships in the UDF closure —
  a broadcast by construction, no C×dim literal expressions in the plan,
  so C=4096 costs the same plan size as C=16). ``nprobe`` > 1 probes the
  query's nearest cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


# ----------------------------------------------------------------------- LSH
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


def query_bucket(query_vec: list[float], n_planes: int = 6, seed: int = 97) -> int:
    planes = _planes(len(query_vec), n_planes, seed)
    qb = 0
    for i in range(n_planes):
        if float(np.dot(planes[i], query_vec)) > 0:
            qb |= 1 << i
    return qb


def _hamming_ball(center: int, n_planes: int, radius: int) -> list[int]:
    """All bucket ids within Hamming distance ``radius`` of ``center``."""
    return [
        b for b in range(1 << n_planes) if bin(b ^ center).count("1") <= radius
    ]


def knn_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 97,
    round_to: int = 4,
    probe_dist: int = 0,
) -> DataFrame:
    """Approximate top-k: probe the query's sign bucket, plus every bucket
    within Hamming distance ``probe_dist`` of it (multi-probe)."""
    dim = len(query_vec)
    qb = query_bucket(query_vec, n_planes, seed)
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes, seed))
    if probe_dist <= 0:
        probe = bucketed.filter(F.col("_bucket") == qb)
    else:
        probe = bucketed.filter(
            F.col("_bucket").isin(_hamming_ball(qb, n_planes, probe_dist))
        )
    return knn_bruteforce(probe, query_vec, k, id_col, vec_col, round_to)


def knn_lsh_adaptive(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 97,
    round_to: int = 4,
    release_cache: bool = True,
) -> DataFrame:
    """Multi-probe fallback: widen the probe radius until ≥ k candidates.

    One tiny aggregation computes the per-bucket histogram (≤ 2^n_planes
    rows on the driver — metadata-sized), then the radius is chosen
    without rescanning. The bucketed frame is cached before the histogram
    job, so the data-sized scan (+ the 2^n_planes dot products per row)
    runs ONCE: the histogram job materializes the cache and the probe
    reads ``InMemoryTableScan``, never the files again (pinned by
    ``tests/test_training_ops.py::test_knn_lsh_adaptive_single_scan``).
    At cluster scale the cached projection is (id, vec, bucket) in
    MEMORY_AND_DISK — the same working set any two-pass consumer holds.

    By default the top-k result (k rows — driver-sized) is eagerly
    materialized and the cache UNPERSISTED before returning, so repeated
    calls in a long-lived session never accumulate cached frames. Pass
    ``release_cache=False`` to get the lazy probe frame instead — the
    caller then owns the cache lifecycle (``result.unpersist_handle``
    carries the cached frame to release)."""
    from pyspark import StorageLevel

    dim = len(query_vec)
    qb = query_bucket(query_vec, n_planes, seed)
    bucketed = df.withColumn(
        "_bucket", lsh_bucket(F.col(vec_col), dim, n_planes, seed)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hist = {
        int(r["_bucket"]): int(r["n"])
        for r in bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    radius = 0
    while radius < n_planes:
        ball = _hamming_ball(qb, n_planes, radius)
        if sum(hist.get(b, 0) for b in ball) >= k:
            break
        radius += 1
    probe = bucketed.filter(
        F.col("_bucket").isin(_hamming_ball(qb, n_planes, radius))
    )
    out = knn_bruteforce(probe, query_vec, k, id_col, vec_col, round_to)
    if release_cache:
        # the probe job reads the still-live cache; the result is k rows
        # — driver-sized by construction — so collect it, drop the cache,
        # and hand back a local frame (localCheckpoint would itself stay
        # registered as a persisted RDD until GC: the same leak shape)
        rows = out.collect()
        schema = out.schema
        bucketed.unpersist()
        return df.sparkSession.createDataFrame(rows, schema)
    out.unpersist_handle = bucketed  # caller owns the cache lifecycle
    return out


def _embedding_banded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes_per_band: int,
    bands: int,
    seed: int,
) -> DataFrame | None:
    """(id, _v, band, bucket) rows, or None for empty/all-null input."""
    dim_row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.max(F.size(vec_col)))
        .first()
    )
    if dim_row is None or dim_row[0] is None:
        return None
    dim = int(dim_row[0])
    planes = _planes(dim, n_planes_per_band * bands, seed)
    v = F.col(vec_col).cast("array<double>")
    band_structs = []
    for b in range(bands):
        bucket = F.lit(0).cast("long")
        for i in range(n_planes_per_band):
            d = dot(v, lit_vector(list(planes[b * n_planes_per_band + i])))
            bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
        band_structs.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    return df.select(
        F.col(id_col), v.alias("_v"), F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        id_col, "_v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def embedding_neardup(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes_per_band: int = 2,
    bands: int = 8,
    seed: int = 97,
    round_to: int = 4,
    max_pairs_per_member: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup tier for vector
    corpora (same scale shape as MinHash LSH: candidates from banded
    sign-bucket collisions, exact cosine verify on candidates only; the
    all-pairs O(n²) never materializes).

    ``bands`` independent hyperplane sets of ``n_planes_per_band`` planes
    each; two vectors at angle θ agree on one plane with p = 1 − θ/π, so a
    pair at cosine ≥ 0.99 (θ ≤ 8.1°) collides in ≥ 1 of 8 two-plane bands
    with P ≈ 1 − (1 − 0.955²)^8 ≈ 1 − 5e-9 — recall is complete with
    overwhelming probability at this threshold/seed (a miss on new data is
    expected LSH variance, not an engine bug; the guarantee is
    threshold-specific and would NOT hold at e.g. 0.8).

    Candidates come from rank + equi-join per band bucket
    (``within_bucket_pairs`` — no O(|bucket|²) single-task intermediate);
    pair output is still inherently O(cluster²) on a true duplicate
    cluster, so at web scale prefer :func:`embedding_neardup_groups` or
    set ``max_pairs_per_member`` (and log ``capped_pair_drops``)."""
    from image_report_spark.operators.dedupe import within_bucket_pairs

    banded = _embedding_banded(df, id_col, vec_col, n_planes_per_band, bands, seed)
    if banded is None:  # empty / all-null → no pairs
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos_sim double"
        )
    pairs = within_bucket_pairs(
        banded, ["band", "bucket"], id_col, carry=("_v",),
        max_pairs_per_member=max_pairs_per_member,
    )
    return (
        pairs.select(
            "id_a", "id_b",
            F.round(cosine(F.col("_v_a"), F.col("_v_b")), round_to).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def embedding_neardup_groups(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes_per_band: int = 16,
    bands: int = 16,
    seed: int = 97,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup CLUSTERS — hot-cluster-safe: member →
    bucket-representative edges (LINEAR in bucket size), exact cosine
    verify on candidates only, distributed connected components. Output
    ``(vec_id, cluster_id)``, cluster_id = min id; singletons absent.

    Representative edges only connect a cluster when the bucket min is
    itself a cluster member, so — unlike the pair path — this variant
    needs HIGH-PRECISION buckets: the default 16 planes/band makes a
    dissimilar collision ~2⁻¹⁶ per band (buckets ≈ pure near-dup sets),
    while recall at cos ≥ 0.99 stays complete w.o.p.
    (per-band p = 0.955¹⁶ ≈ 0.48, miss ≈ (1−0.48)¹⁶ ≈ 3e-5 per pair).
    The pair path keeps coarse cheap buckets because any same-bucket
    member pair is verified directly; here precision buys connectivity."""
    from image_report_spark.operators.dedupe import bucket_candidate_edges
    from image_report_spark.operators.graph import connected_components

    banded = _embedding_banded(df, id_col, vec_col, n_planes_per_band, bands, seed)
    if banded is None:
        return df.sparkSession.createDataFrame([], f"{id_col} long, cluster_id long")
    edges = bucket_candidate_edges(banded, ["band", "bucket"], id_col, carry=("_v",))
    verified = (
        edges.withColumn(
            "cos_sim", F.round(cosine(F.col("_v_a"), F.col("_v_b")), round_to)
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(verified)
    return comp.select(
        F.col("id").alias(id_col), F.col("component").alias("cluster_id")
    )


# ----------------------------------------------------------------------- IVF
def seeded_centroids(n_cells: int, dim: int = 64, seed: int = 101) -> np.ndarray:
    """Deterministic centroids, rounded to 6 dp so the exact same decimal
    literals are parseable by any SQL oracle (decimal → nearest double is
    deterministic on both sides)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((n_cells, dim)), 6)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray | None = None,
    n_cells: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 101,
    out: str = "_cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (coarse IVF cell).

    The centroid matrix rides in the pandas-UDF closure (one broadcast per
    job) and the whole Arrow batch is assigned with a single float64
    matmul + argmax — plan size is O(1) in C, so realistic C (≥ 4096)
    costs nothing at planning time, unlike a C×dim literal expression
    tree. Ties go to the lowest cell id (np.argmax keeps the first max)."""
    cents = seeded_centroids(n_cells, dim, seed) if centroids is None else centroids
    cents_t = np.ascontiguousarray(cents.astype(np.float64).T)

    def _assign(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series(np.empty(0, np.int32))
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(np.argmax(m @ cents_t, axis=1).astype(np.int32))

    assigned = pandas_udf(_assign, "int")
    return df.withColumn(out, assigned(F.col(vec_col).cast("array<double>")))


def knn_ivf(
    df: DataFrame,
    query_vec: list[float],
    k: int = 5,
    centroids: np.ndarray | None = None,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 101,
    round_to: int = 4,
    nprobe: int = 1,
) -> DataFrame:
    """Probe the query's ``nprobe`` nearest IVF cells."""
    dim = len(query_vec)
    cents = seeded_centroids(n_cells, dim, seed) if centroids is None else centroids
    scores = cents.astype(np.float64) @ np.asarray(query_vec, dtype=np.float64)
    probe_cells = [int(c) for c in np.argsort(-scores, kind="stable")[:nprobe]]
    assigned = ivf_assign(df, cents, vec_col=vec_col)
    return knn_bruteforce(
        assigned.filter(F.col("_cell").isin(probe_cells)),
        query_vec, k, id_col, vec_col, round_to,
    )
