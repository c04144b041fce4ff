"""Hot-duplicate-cluster safety (VERDICT r2 #1).

Real web corpora make million-member boilerplate duplicate clusters the
COMMON case, so candidate generation must be linear in cluster size.
These tests plant a 10k-member duplicate cluster and pin:

* candidate-edge count grows LINEARLY (not quadratically) in cluster size
  for the groups path (``bucket_candidate_edges``);
* the cluster assignment is still exactly right;
* no near-dup plan materializes a bucket as a ``collect_list`` array;
* caps are never silent (``capped_pair_drops`` accounts for every
  dropped pair).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_report_spark.operators.dedupe import (
    bucket_candidate_edges,
    capped_pair_drops,
    exact_duplicates,
    minhash_banded,
    minhash_dedup_groups,
    within_bucket_pairs,
)
from image_report_spark.operators.graph import connected_components


def _one_bucket(spark, m):
    return spark.range(m).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("bkt")
    )


# --------------------------------------------------------- candidate shapes
def test_candidate_edges_linear_in_cluster_size(spark):
    """One bucket of m members: the hybrid path emits m−1 representative
    edges for m > exact_bucket_max — growth is linear (2× members → 2×
    candidates), never the m(m−1)/2 pair explosion."""
    counts = {}
    for m in (5_000, 10_000):
        edges = bucket_candidate_edges(_one_bucket(spark, m), ["bkt"], "doc_id")
        counts[m] = edges.count()
    assert counts[5_000] == 4_999
    assert counts[10_000] == 9_999
    # explicit linearity pin: doubling the cluster doubles the candidates
    assert counts[10_000] / counts[5_000] == pytest.approx(2.0, rel=0.01)


def test_candidate_edges_exact_below_threshold(spark):
    """Small buckets keep exact all-pairs (recall guarantee preserved)."""
    edges = bucket_candidate_edges(
        _one_bucket(spark, 10), ["bkt"], "doc_id", exact_bucket_max=64
    )
    assert edges.count() == 45  # C(10,2)


def test_capped_pairs_never_silent(spark):
    """all_pairs == capped_pairs + capped_pair_drops, exactly."""
    df = _one_bucket(spark, 300)
    full = within_bucket_pairs(df, ["bkt"], "doc_id").count()
    cap = 7
    kept = within_bucket_pairs(
        df, ["bkt"], "doc_id", max_pairs_per_member=cap
    ).count()
    drops = capped_pair_drops(df, ["bkt"], cap).first()["dropped_pairs"]
    assert full == 300 * 299 // 2
    assert kept + drops == full
    assert kept == cap * (300 - cap) + cap * (cap - 1) // 2


# ---------------------------------------------------------------- end-to-end
def test_minhash_groups_planted_10k_cluster(spark):
    """10k byte-identical docs + distinct noise: ONE cluster holding all
    10k members, with candidate volume linear in the cluster size (every
    band maps the cluster to one bucket whose rep edges are m−1)."""
    m = 10_000
    dup = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit("common boilerplate footer repeated across the whole site forever").alias("text"),
    )
    noise = spark.range(5).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id").cast("string"),
                 F.lit(" with entirely distinct content words")).alias("text"),
    )
    docs = dup.unionByName(noise)

    banded = minhash_banded(docs, k=32, bands=16)
    cands = bucket_candidate_edges(banded, ["band", "band_hash"], "doc_id")
    # identical docs → identical signatures → every band yields the same
    # (rep=0, member) edge set → m−1 distinct candidates, not m(m−1)/2
    cluster_cands = cands.filter(
        (F.col("id_a") < 1_000_000) & (F.col("id_b") < 1_000_000)
    ).count()
    assert cluster_cands == m - 1
    # the noise docs (small buckets, exact pairs) add at most C(5,2) more
    assert cands.count() <= m - 1 + 10

    groups = minhash_dedup_groups(docs, threshold=0.8, k=32, bands=16)
    rows = groups.collect()
    assert len(rows) == m
    assert {r.cluster_id for r in rows} == {0}
    assert {r.doc_id for r in rows} == set(range(m))


def test_exact_duplicates_no_cluster_arrays(spark):
    """exact_duplicates on a 10k-member cluster: right answer, and the
    plan carries no collect_list (no O(cluster) array in one row)."""
    m = 10_000
    df = spark.range(m).select(
        F.col("id").alias("doc_id"), F.lit("same bytes").alias("text")
    )
    out = exact_duplicates(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("canonical_id").alias("c"),
        F.max("group_size").alias("g"),
    ).first()
    assert (got["n"], got["c"], got["g"]) == (m - 1, 0, m)


# ------------------------------------------------------ connected components
def test_cc_chain_and_islands(spark):
    """A 64-node chain (worst-case diameter) plus two islands: pointer
    doubling converges and labels every node with its component min."""
    chain = [(i, i + 1) for i in range(63)]
    islands = [(1000, 1001), (2000, 2001), (2001, 2002)]
    edges = spark.createDataFrame(chain + islands, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert all(got[i] == 0 for i in range(64))
    assert got[1000] == got[1001] == 1000
    assert got[2000] == got[2001] == got[2002] == 2000
    assert len(got) == 64 + 5


def test_cc_empty_and_self_loops(spark):
    edges = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    assert connected_components(edges).count() == 0
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
