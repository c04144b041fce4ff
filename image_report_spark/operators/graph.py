"""Distributed connected components for dedup cluster closure.

The hot-cluster-safe near-dup tiers (``dedupe.minhash_dedup_groups``,
``dedupe.simhash_near_groups``, ``similarity.embedding_neardup_groups``)
emit *linear* candidate edges (bucket member → bucket representative) and
then need the transitive closure to turn verified edges into clusters.
That closure is this operator: min-label propagation with pointer
doubling — the standard Hash-to-Min shape (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013).

Scale shape: every round is two self-joins on the (node → label) table —
shuffles keyed on node id / label id, no driver-side state beyond the
O(1) convergence counter. Rounds are O(log diameter) thanks to the
pointer-doubling shortcut; for the star-shaped graphs the representative
edges produce, 2–3 rounds suffice. Each round's result is
``localCheckpoint``ed so the lineage (and therefore the plan) stays flat
across iterations instead of doubling per round.

Reference analog: the reference's NMS keeps a *kept set* and suppresses
against it (utils.py:304-317) — a sequential union-find; this operator is
the same transitive-grouping need expressed as a bounded number of
bulk-parallel rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns ``(id, component)`` for every node that appears in an edge,
    where ``component`` is the minimum node id in the node's component
    (deterministic canonical label). Isolated nodes never appear in
    ``edges`` and so never appear in the output — callers treat absence
    as "singleton".

    ``max_iter`` bounds the propagation rounds; with pointer doubling the
    label front at least doubles per round, so 30 rounds cover any graph
    below 2^30 diameter — hitting the bound means a logic error, so it
    raises instead of returning a partial grouping.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # 1) neighbor-min: pull the smallest label across every edge
        neigh = (
            sym.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("_ncomp"))
        )
        stepped = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("_ncomp", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        # 2) pointer doubling: component ← component[component] (shortcut
        #    chains so convergence is logarithmic, not linear, in diameter)
        doubled = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("id").alias("_pid"), F.col("component").alias("_pcomp")
                ).alias("y"),
                F.col("x.component") == F.col("y._pid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.least(
                    F.col("x.component"), F.coalesce("y._pcomp", "x.component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            doubled.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = doubled
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
