"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a full CDC replay (change stream derived
deterministically from the ``events`` table) through the engine's
Icelite MERGE path at sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
class from SURVEY.md §2 plus the training-data-pipeline operators; each
Spark query is mirrored by ANSI SQL DuckDB runs on the same parquet.
Column names and types are aligned on both sides (driver hashes values
after sorting columns by name). Floats are rounded on both sides;
timestamps are compared as epoch microseconds.
"""

from __future__ import annotations

import atexit
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Spark 4 reads parquet naive timestamps as TIMESTAMP_NTZ; normalize to
    # TIMESTAMP (session tz = UTC) so epoch math matches DuckDB's epoch_us
    for f_ in df.schema.fields:
        if f_.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# CDC: change stream derived deterministically from the events table
# ---------------------------------------------------------------------------

def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type").isin("click", "purchase"), F.lit("U"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("I"))
    )
    return ev.select(
        F.col("event_id").alias("lsn"),
        op.alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        F.pmod(F.col("event_id"), F.lit(8)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
    )


_CHANGES_SQL = """
    SELECT event_id AS lsn,
           CASE WHEN event_type IN ('click','purchase') THEN 'U'
                WHEN event_type = 'error' THEN 'D' ELSE 'I' END AS op,
           'u' || CAST(user_id AS VARCHAR) AS conv_id,
           CAST(event_id % 8 AS INT) AS turn_idx,
           event_type AS role, props AS text, ts
    FROM events
"""

_FINAL_TABLE_SQL = f"""
    WITH changes AS ({_CHANGES_SQL}),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY conv_id, turn_idx
                                ORDER BY ts DESC, lsn DESC) AS rn
      FROM changes
    )
    SELECT conv_id, turn_idx, role, text, epoch_us(ts) AS ts_us
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_replay_final_table(
    spark: SparkSession, sf_dir: str, write_mode: str = "cow"
) -> DataFrame:
    """THE flagship: replay the derived change stream through the real
    engine (Icelite table, exactly-once checkpoint, COW merge) in two
    micro-batches, then read the final table back."""
    from image_report_spark.config import EngineConfig
    from image_report_spark.engine import CdcEngine

    changes = _changes(spark, sf_dir)
    mid = changes.agg(F.expr("percentile_approx(lsn, 0.5)")).first()[0]
    scratch = os.path.join("/tmp", f"irs-entry-{uuid.uuid4().hex[:8]}")
    try:
        eng = CdcEngine.init(
            spark,
            os.path.join(scratch, "table"),
            os.path.join(scratch, "checkpoint"),
            config=EngineConfig(num_buckets=16, write_mode=write_mode),
        )
        eng.apply_batch(changes.filter(F.col("lsn") <= mid), 0)
        eng.apply_batch(changes.filter(F.col("lsn") > mid), 1)
        if write_mode == "mor":
            # fold the pending delta files into base: the read below then
            # exercises write->delta->compact end-to-end
            eng.compact()
        out = eng.read().select(
            "conv_id", "turn_idx", "role", "text", F.unix_micros("ts").alias("ts_us")
        )
        # materialize executor-side (distributed write + lazy read-back) so
        # the result never funnels through the driver — the engine's table
        # dir is removed in finally, only the small result outlives it
        result_dir = scratch + "-result"
        out.write.mode("overwrite").parquet(result_dir)
        # the returned DataFrame reads result_dir lazily, so it can't be
        # removed here — clean it up at interpreter exit instead of leaking
        # one parquet dir per bench/correctness invocation
        atexit.register(shutil.rmtree, result_dir, ignore_errors=True)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_cdc_lww_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 graft: last-writer-wins winner per key as a plain window.

    Optimization-round note: a ``max_by``-aggregate form (one candidate
    winner per key per task crossing the exchange instead of every event
    row) was implemented, proven oracle-equal, and MEASURED as a
    consistent in-suite regression (1.96 s → 2.62 s median over 5
    alternated bench runs at sf1.0): the payload struct forces a
    SortAggregate fallback whose per-split sort of 2 M wide rows on the
    4-split scan costs more than the window's single post-shuffle sort,
    and the rank-1 filter already gets the WindowGroupLimit partial
    top-k pushdown below the exchange. Reverted — the window IS the
    faster plan here (guide §1.2: measure, don't assume)."""
    ch = _changes(spark, sf_dir)
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").desc(), F.col("lsn").desc()
    )
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("conv_id", "turn_idx", "role", "text", F.unix_micros("ts").alias("ts_us"))
    )


def q_cdc_dedup_replays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-replay dedup (duplicate LSNs dropped) — the stream doubled,
    dedup by lsn, op histogram."""
    ch = _changes(spark, sf_dir)
    doubled = ch.unionAll(ch)
    return (
        doubled.dropDuplicates(["lsn"])
        .groupBy("op")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# relational operator coverage (SURVEY.md §2) over the TPC-H-ish tables
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A6: hash aggregate with partial combine (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q2_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast hash join of facts with a small dimension."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q3_multi_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join chain + top-k (TakeOrderedAndProject).

    Join order chosen deliberately (guide §3.1): the selective dimension
    side — orders ⋈ customer filtered to one mktsegment, projected to
    the 8-byte join key — is reduced FIRST and broadcast, so lineitem
    (the 6 M-row fact side) is never shuffled by the join at all; the
    only exchange left is the partial-aggregated groupBy. The previous
    shape sort-merge-joined all of lineitem against all of orders before
    the segment filter could bite. Inner-join reorder + filter pushdown:
    result set is identical. At scales where the pruned key set outgrows
    the broadcast cap, drop the hint and this degrades to the old SMJ —
    or pre-filter with a Bloom filter (guide §3.2)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    building_orders = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("o_orderkey")
    )
    return (
        li.join(F.broadcast(building_orders), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q4_range_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: self-join on an interval predicate (events within 60 s) —
    time-BUCKETED: the join key is (user_id, 60s-bucket), with the left
    side exploded into its own + next bucket so every qualifying pair
    meets in exactly one bucket (ts_b ∈ [ts_a, ts_a+60] ⇒ bucket(ts_b) ∈
    {bucket(ts_a), bucket(ts_a)+1}). Pairs per task are bounded by events
    per (user, minute) — a hot user no longer quadratically explodes one
    task, which is what kills the plain user_id equi-join at 100×."""
    ev = _t(spark, sf_dir, "events")
    bkt = F.floor(F.unix_micros(F.col("ts")) / F.lit(60_000_000)).alias("bkt")
    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_a"),
        F.col("ts").alias("ts_a"), F.col("event_type").alias("type_a"),
        F.explode(F.array(bkt, bkt + 1)).alias("bkt"),
    )
    b = ev.select(
        F.col("user_id"), F.col("event_id").alias("id_b"),
        F.col("ts").alias("ts_b"), F.col("event_type").alias("type_b"),
        bkt,
    )
    return (
        # shuffled-hash instead of sort-merge (guide §3.1): both sides are
        # shuffled either way, but SHJ skips the two full sorts — the
        # un-exploded side builds a per-partition hash table (rows/partition
        # bounded by events per (user, minute) bucket, the same property
        # that bounds pairs/task). Join strategy only; results identical.
        a.join(b.hint("shuffle_hash"), ["user_id", "bkt"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 60 SECONDS"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q5_two_pass_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 graft (Otsu shape): derive a global threshold, then filter by it."""
    ev = _t(spark, sf_dir, "events")
    thr = ev.agg((F.avg("value") * 1.5).alias("thr"))
    return (
        ev.crossJoin(thr)
        .filter(F.col("value") > F.col("thr"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.avg("value"), 6).alias("avg_above"),
        )
    )


def q6_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: fixed-width binning aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 50).cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q7_quadrant_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: quadrant-distribution groupBy over two derived boolean flags."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            (F.col("l_quantity") > 25).alias("hi_qty"),
            (F.col("l_discount") > 0.05).alias("hi_disc"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def q8_zone_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: tiled (zone) group-by density."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_custkey") / 15).cast("long").alias("zone"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


def q9_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-group inter-event gap stats.

    The lag-then-average telescopes: Σ (ts_i − ts_{i−1}) over the
    event_id order is exactly ts(max event_id) − ts(min event_id), and
    the gap count is n − 1 (ts is non-null), so the whole window+regroup
    collapses into ONE partial-aggregated groupBy (guide §2.3/§2.4: the
    full-row sort shuffle becomes a per-key endpoint struct). Exact:
    the gap sum is integer-valued and < 2^53, so the avg's double math
    is bit-identical to the windowed form's; event_id is unique, so the
    endpoint rows are well-defined. The analytic-lag idiom itself stays
    exercised by q20 (lag+lead) and q13 (rle)."""
    ev = _t(spark, sf_dir, "events")
    # min_by/max_by on the ATOMIC event_id (not min/max of a struct):
    # struct-typed aggregation buffers force a SortAggregate fallback,
    # while atomic buffers keep the whole-stage-codegen HashAggregate
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min_by("ts", "event_id").alias("_first_ts"),
        F.max_by("ts", "event_id").alias("_last_ts"),
    )
    span = F.unix_micros("_last_ts") - F.unix_micros("_first_ts")
    return (
        g.filter(F.col("_n") > 1)
        .select(
            "user_id",
            (F.col("_n") - 1).alias("n_gaps"),
            F.floor(span / (F.col("_n") - 1)).cast("long").alias("avg_gap_us"),
        )
    )


def q10_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: symmetric rows-frame sliding aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-1, 1)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("mov_sum"),
    )


def q11_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/O5: ranked top-3 per group."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "rk",
                F.round("p_retailprice", 2).alias("price"))
    )


def q12_argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: argmax per group (deterministic tie-break by key)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("top_price"))
    )


def q13_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 graft: run-length encoding of per-user event-type sequences."""
    from image_report_spark.functions.rle import rle_encode

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    return rle_encode(ev, key="user_id", pos="event_id", value="event_type")


def q14_group_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 graft: order-canonicalized content digest per group."""
    docs = _t(spark, sf_dir, "documents")
    ids_sorted = F.array_sort(F.collect_list(F.col("doc_id")))
    return docs.groupBy("source").agg(
        F.md5(
            F.concat_ws(",", F.transform(ids_sorted, lambda x: x.cast("string")))
        ).alias("digest"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q15_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: set algebra — customers with orders minus big spenders."""
    orders = _t(spark, sf_dir, "orders")
    all_cust = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    big = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return all_cust.exceptAll(big)


def q16_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: dedup by canonical key."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q17_cube_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 graft: quadrant distribution with all marginals via CUBE."""
    li = _t(spark, sf_dir, "lineitem")
    cube = li.cube(
        (F.col("l_quantity") > 25).alias("q"),
        (F.col("l_discount") > 0.05).alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # margins labeled 'ALL' → no NULL group keys in the comparable output
    return cube.select(
        F.coalesce(F.col("q").cast("string"), F.lit("ALL")).alias("hi_qty"),
        F.coalesce(F.col("d").cast("string"), F.lit("ALL")).alias("hi_disc"),
        "n",
    )


def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 graft: parse the JSON props payload (string → typed field)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy(F.pmod(F.col("k"), F.lit(10)).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


#: the paper-size dimension table graft (reference papersize.py:37-65):
#: a tiny static dimension matched by minimal L1 distance
_STANDARD_SIZES = [("XS", 5), ("S", 15), ("M", 25), ("L", 35), ("XL", 45)]


def q19_nearest_dim_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 graft: broadcast nested-loop theta-join against a literal
    dimension table, rank by |p_size − dim|, keep the best match
    (reference guess_paper_size, papersize.py:70-126)."""
    part = _t(spark, sf_dir, "part")
    dims = spark.createDataFrame(_STANDARD_SIZES, "size_name string, size_mm int")
    scored = part.crossJoin(F.broadcast(dims)).withColumn(
        "dist", F.abs(F.col("p_size") - F.col("size_mm"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("dist"), F.asc("size_name"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("size_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def q20_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 graft: weighted sliding window (the convolution shape) —
    0.25·prev + 0.5·cur + 0.25·next per user ordered by event_id."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wavg = (
        0.25 * F.coalesce(F.lag("value").over(w), F.col("value"))
        + 0.5 * F.col("value")
        + 0.25 * F.coalesce(F.lead("value").over(w), F.col("value"))
    )
    return ev.select(
        "user_id", "event_id", F.round(wavg, 4).alias("smooth")
    )


def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 graft: native tumbling event-time window (F.window) — counts
    and value mass per 5-minute window per event type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("ws_us"),
            "event_type", "n", "value_sum",
        )
    )


def q22_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 graft: native session windows (F.session_window, 30-min gap)
    per user — session count, sizes, spans."""
    ev = _t(spark, sf_dir, "events")
    sess = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sess.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        F.unix_micros(F.col("w.end")).alias("session_end_us"),
        "n_events",
    )


def t5_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score composite (length / punctuation-soup / stopword-mass
    heuristics) bucketed per source."""
    from image_report_spark.functions.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    return (
        docs.withColumn("q", q)
        .groupBy("source", F.floor(F.col("q") * 10).cast("long").alias("q_decile"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------

def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ a deterministic duplicated subset (doc_id+1000000)."""
    docs = _t(spark, sf_dir, "documents")
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return docs.unionByName(dups)


def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: canonical id + dup ids over identical text."""
    from image_report_spark.operators.dedupe import exact_duplicates

    return exact_duplicates(_docs_with_dups(spark, sf_dir)).orderBy("dup_id")


def d2_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs verified by exact n-gram Jaccard.

    Oracle: exact all-pairs Jaccard in DuckDB — the LSH pipeline's output
    must EQUAL the exact answer, which holds when band recall is complete
    at the verify threshold (bands=16 → rows-per-band r=2 →
    P(miss | j≥0.8) = (1−0.8²)^16 ≈ 8e-8; the verify step removes all
    false candidates, so candidates-side precision doesn't matter)."""
    from image_report_spark.operators.dedupe import minhash_dedup

    return minhash_dedup(
        _docs_with_dups(spark, sf_dir), threshold=0.8, bands=16
    ).orderBy("id_a", "id_b")


def d3_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash collision groups: JVM-side word hashing + vectorized numpy
    bit-fold. Uses the portable word hash so DuckDB mirrors the whole
    fingerprint computation bit-exactly."""
    from image_report_spark.functions.text import portable_word_hash
    from image_report_spark.operators.dedupe import simhash_duplicates

    return simhash_duplicates(
        _docs_with_dups(spark, sf_dir), word_hash=portable_word_hash
    ).select("simhash", F.col("n").cast("long").alias("n"))


def d4_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-ball near-dup pairs (dist ≤ 3) via simhash LSH with the
    DEFAULT auto-selected banding scheme (scheme=None → bands16 below
    10⁶ docs, Manku 20-combination keys above; both pigeonhole-complete,
    so the verified output is scheme-independent) + JVM bit_count(xor)
    verify; oracle = exact all-pairs in DuckDB."""
    from image_report_spark.functions.text import portable_word_hash
    from image_report_spark.operators.dedupe import simhash_near_pairs

    return simhash_near_pairs(
        _docs_with_dups(spark, sf_dir), max_dist=3, word_hash=portable_word_hash,
    ).orderBy("id_a", "id_b")


def _embeddings_with_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ deterministic near-duplicates: every 10th vector gets a
    copy (vec_id+1000000) perturbed as v + 0.05·reverse(v) — cosine ≈ 0.999,
    reproducible bit-for-bit in SQL (float→double is exact, then identical
    double arithmetic)."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    perturbed = F.zip_with(v, F.reverse(v), lambda a, b: a + F.lit(0.05) * b)
    dups = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        perturbed.alias("embedding"),
    )
    return emb.select("vec_id", v.alias("embedding")).unionByName(dups)


def d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup tier: banded sign-LSH candidates + exact
    cosine verify; oracle = exact all-pairs in DuckDB (recall complete with
    overwhelming probability at the 0.99 threshold/seed — see
    embedding_neardup docstring)."""
    from image_report_spark.operators.similarity import embedding_neardup

    return embedding_neardup(
        _embeddings_with_neardups(spark, sf_dir), threshold=0.99
    ).orderBy("id_a", "id_b")


def d2g_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-cluster-safe MinHash dedup CLUSTERS: member → bucket-
    representative candidate edges (LINEAR in bucket size — no O(bucket²)
    all-pairs), exact Jaccard verify, distributed connected components.
    Oracle: exact all-pairs edges + recursive-CTE components in DuckDB —
    the cluster assignment must EQUAL the exact transitive closure (holds
    w.o.p. at this threshold/seed; see minhash_dedup_groups docstring)."""
    from image_report_spark.operators.dedupe import minhash_dedup_groups

    return minhash_dedup_groups(
        _docs_with_dups(spark, sf_dir), threshold=0.8, bands=16
    ).orderBy("doc_id")


def d4g_simhash_near_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-cluster-safe SimHash Hamming-ball CLUSTERS (dist ≤ 3) under the
    DEFAULT auto-selected banding scheme (scheme=None — manku engages by
    itself at ≳10⁶ docs; verified output is scheme-independent), hybrid
    candidate edges + bit_count verify + connected components.
    Oracle: exact all-pairs + recursive-CTE components."""
    from image_report_spark.functions.text import portable_word_hash
    from image_report_spark.operators.dedupe import simhash_near_groups

    return simhash_near_groups(
        _docs_with_dups(spark, sf_dir), max_dist=3, word_hash=portable_word_hash,
    ).orderBy("doc_id")


def d5g_embedding_neardup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-cluster-safe embedding-cosine CLUSTERS: fine-grained sign-LSH
    buckets (16 planes × 16 bands — representatives only connect when
    buckets are pure), cosine verify, connected components. Oracle: exact
    all-pairs + recursive-CTE components."""
    from image_report_spark.operators.similarity import embedding_neardup_groups

    return embedding_neardup_groups(
        _embeddings_with_neardups(spark, sf_dir), threshold=0.99
    ).orderBy("vec_id")


def d6_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup via the persisted SignatureStore: batch 0 =
    the documents corpus (signatures + band index committed to an Icelite
    side table), batch 1 = the deterministic duplicated subset — batch 1
    is near-dup'd against HISTORY without recomputing or even re-banding
    historical signatures (state side = stored band-index scan only).

    Oracle: exact all-pairs Jaccard in DuckDB restricted to pairs with a
    batch-1 member — incremental output must EQUAL the exact answer over
    the union corpus (recall complete w.o.p. at threshold 0.8 with
    bands=16, same math as d2_minhash_neardup)."""
    import shutil
    import tempfile

    from image_report_spark.operators.incremental import SignatureStore

    root = tempfile.mkdtemp(prefix="irs-sigstore-")
    try:
        store = SignatureStore.init(
            spark, os.path.join(root, "s"), k=32, bands=16, threshold=0.8,
            num_buckets=8,
        )
        docs = _t(spark, sf_dir, "documents")
        store.neardup_batch(docs.select("doc_id", "text"), 0)
        batch1 = docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
        # returned pairs are eagerly materialized inside neardup_batch,
        # so the store directory can be reclaimed before consumption
        out = store.neardup_batch(batch1, 1)
        return out.orderBy("id_a", "id_b")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def t1_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text analysis: chars, words, BPE-ish tokens, punct ratio."""
    from image_report_spark.functions.text import (
        punct_ratio,
        token_count,
        word_count,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("chars"),
        word_count(F.col("text")).cast("long").alias("words_n"),
        token_count(F.col("text")).cast("long").alias("tokens_n"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
    )


def t2_source_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per source: docs, token mass, mean length."""
    from image_report_spark.functions.text import token_count, word_count

    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("tokens_total"),
        F.sum(word_count(F.col("text")).cast("long")).alias("words_total"),
        F.floor(F.avg(F.length("text"))).cast("long").alias("avg_chars"),
    )


def t3_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column; the stopword-argmax
    fold is mirrored in the DuckDB oracle."""
    from image_report_spark.functions.text import lang_guess

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("guess", lang_guess(F.col("text")))
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints, distinct count per source.
    Uses the portable (md5-based) word hash so DuckDB can mirror the
    polynomial fold exactly; production default stays xxhash64."""
    from image_report_spark.functions.text import fingerprint, portable_word_hash

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "fp", fingerprint(F.col("text"), word_hash=portable_word_hash)
        )
        .groupBy("source")
        .agg(F.countDistinct("fp").alias("n_fingerprints"))
    )


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = _t(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row[0]]


def e1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors of vec_id 0 (JVM-side dot product)."""
    from image_report_spark.operators.similarity import knn_bruteforce

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return knn_bruteforce(emb, _query_vec(spark, sf_dir), k=5)


def e2_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (single-bucket probe). Oracle: the
    seeded hyperplanes are deterministic, so DuckDB recomputes the same
    sign-bit buckets from plane literals and probes the same bucket."""
    from image_report_spark.operators.similarity import knn_lsh

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return knn_lsh(emb, _query_vec(spark, sf_dir), k=5, n_planes=6)


def e3_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantization cell histogram at realistic C=256: the
    centroid matrix rides in the pandas-UDF closure (one matmul per Arrow
    batch — plan size O(1) in C). Oracle: 256 centroid literals in SQL."""
    from image_report_spark.operators.similarity import ivf_assign

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_assign(emb, n_cells=256).groupBy(
        F.col("_cell").cast("int").alias("cell")
    ).agg(F.count(F.lit(1)).alias("n"))


def _doc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: payload = the
    first 64 printable-ASCII chars of the text (padded), as binary — so a
    SQL oracle can recompute every byte the fake decoder sees."""
    docs = _t(spark, sf_dir, "documents")
    clean = F.rpad(
        F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "[^ -~]", ""),
        64,
        "x",
    )
    kind = (
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit("image"))
        .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(clean, "utf-8").alias("payload"),
        F.lit(4).cast("int").alias("width"),
        F.lit(4).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → mapInPandas decode + featurize. The decode
    kernel is the deterministic fake (no codec libs in this container), so
    the oracle recomputes its arithmetic — tiled-byte sum over the 4×4
    decode window — from the same document-derived payload bytes in SQL.
    Per-item error isolation visible: video rows fail, never the batch."""
    from image_report_spark.operators.multimodal import extract_features

    feats = extract_features(_doc_media(spark, sf_dir))
    return feats.groupBy("kind", "status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("byte_len").cast("long").alias("bytes_total"),
        F.sum("content_hash").cast("long").alias("hash_total"),
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: full engine CDC replay, final table."""
    return q_cdc_replay_final_table(spark, "/root/testdata/sf0.001")


def q_cdc_mor_replay_final_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same replay through the merge-on-read path (write_mode='mor':
    per-partition delta files, classification vs a keys-only incumbent
    scan, then compact() folds deltas into base) — same oracle as the COW
    replay: the physical merge strategy must not change query results."""
    return q_cdc_replay_final_table(spark, sf_dir, write_mode="mor")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_replay_final_table": q_cdc_replay_final_table,
        "cdc_mor_replay_final_table": q_cdc_mor_replay_final_table,
        "cdc_lww_window": q_cdc_lww_window,
        "cdc_dedup_replays": q_cdc_dedup_replays,
        "q1_pricing_summary": q1_pricing_summary,
        "q2_broadcast_dim_join": q2_broadcast_dim_join,
        "q3_multi_join_topk": q3_multi_join_topk,
        "q4_range_self_join": q4_range_self_join,
        "q5_two_pass_threshold": q5_two_pass_threshold,
        "q6_histogram": q6_histogram,
        "q7_quadrant_flags": q7_quadrant_flags,
        "q8_zone_density": q8_zone_density,
        "q9_lag_delta": q9_lag_delta,
        "q10_sliding_window": q10_sliding_window,
        "q11_topk_per_group": q11_topk_per_group,
        "q12_argmax_order": q12_argmax_order,
        "q13_rle": q13_rle,
        "q14_group_digest": q14_group_digest,
        "q15_set_difference": q15_set_difference,
        "q16_dedup_distinct": q16_dedup_distinct,
        "q17_cube_marginals": q17_cube_marginals,
        "q18_json_extract": q18_json_extract,
        "q19_nearest_dim_match": q19_nearest_dim_match,
        "q20_weighted_moving_avg": q20_weighted_moving_avg,
        "q21_tumbling_window": q21_tumbling_window,
        "q22_session_window": q22_session_window,
        "t5_quality_score": t5_quality_score,
        "d1_exact_dedup": d1_exact_dedup,
        "d2_minhash_neardup": d2_minhash_neardup,
        "d3_simhash_groups": d3_simhash_groups,
        "d4_simhash_near_pairs": d4_simhash_near_pairs,
        "d5_embedding_neardup": d5_embedding_neardup,
        "d6_incremental_neardup": d6_incremental_neardup,
        "d2g_minhash_groups": d2g_minhash_groups,
        "d4g_simhash_near_groups": d4g_simhash_near_groups,
        "d5g_embedding_neardup_groups": d5g_embedding_neardup_groups,
        "t1_text_metrics": t1_text_metrics,
        "t2_source_token_stats": t2_source_token_stats,
        "t3_lang_guess": t3_lang_guess,
        "t4_fingerprint": t4_fingerprint,
        "e1_knn_bruteforce": e1_knn_bruteforce,
        "e2_knn_lsh": e2_knn_lsh,
        "e3_ivf_cells": e3_ivf_cells,
        "m1_multimodal_features": m1_multimodal_features,
    }


_TOKEN_RE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: DuckDB mirror of functions.text.words(): split on \s+, drop empties
_WORDS_SQL = r"list_filter(string_split_regex({col}, '\s+'), x -> x <> '')"

#: DuckDB mirror of functions.text.portable_word_hash(): first 15 hex chars
#: of md5 as a 60-bit integer
_PWH_SQL = "CAST(('0x' || substr(md5({w}), 1, 15)) AS BIGINT)"


#: DuckDB mirror of the full simhash pipeline (operators.dedupe.simhash with
#: portable_word_hash): per-word 60-bit md5-prefix hashes, strict-majority
#: bit vote. ``range(0, 60)`` because the portable hash has 60 bits (the
#: numpy fold's bits 60–63 get zero votes and stay unset on both sides).
_SIMHASH_SQL = r"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id % 10 = 0
    ), hs AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
               w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)) AS h
      FROM docs
    ), sim AS (
      SELECT doc_id,
             -- outer CAST: list_sum yields HUGEINT, which stringifies as
             -- a float and would break the value hash
             CAST(COALESCE(list_sum(list_transform(range(0, 60),
               b -> CASE WHEN 2 * len(list_filter(h, x -> ((x >> b) & 1) = 1)) > len(h)
                         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
               0) AS BIGINT) AS simhash
      FROM hs
    )
"""


def _cc_sql(edge_ctes: str, edges_select: str, id_name: str) -> str:
    """Recursive-CTE connected components over exact all-pairs edges —
    the DuckDB oracle for the hot-cluster-safe *_groups queries: Spark's
    representative-edge + distributed-CC answer must equal the exact
    transitive closure. ``reach(id, r)`` enumerates (node, member of its
    component); MIN(r) per node is the canonical component label."""
    lead = f"{edge_ctes}, " if edge_ctes.strip() else ""
    return f"""
        WITH RECURSIVE {lead}edges AS ({edges_select}),
        sym AS (
          SELECT id_a AS a, id_b AS b FROM edges
          UNION
          SELECT id_b AS a, id_a AS b FROM edges
        ),
        nodes AS (SELECT DISTINCT a AS id FROM sym),
        reach AS (
          SELECT id, id AS r FROM nodes
          UNION
          SELECT s.b AS id, reach.r FROM reach JOIN sym s ON s.a = reach.id
        )
        SELECT id AS {id_name}, MIN(r) AS cluster_id
        FROM reach GROUP BY id ORDER BY {id_name}
    """


#: shared CTE bodies (no leading WITH) for the exact-edge oracles
_D2_EDGE_CTES = r"""
        docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE doc_id % 10 = 0
        ), sh AS (
          SELECT doc_id,
                 CASE WHEN len(ws) >= 3
                      THEN list_distinct(list_transform(
                             range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                      ELSE [array_to_string(ws, ' ')] END AS s
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM docs)
        )
"""

_D5_EDGE_CTES = """
        base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), vecs AS (
          SELECT vec_id, v FROM base
          UNION ALL
          SELECT vec_id + 1000000 AS vec_id,
                 list_transform(range(1, len(v) + 1),
                                i -> v[i] + 0.05 * list_reverse(v)[i]) AS v
          FROM base WHERE vec_id % 10 = 0
        )
"""


def _lsh_bucket_sql(vec_expr: str) -> str:
    """DuckDB mirror of operators.similarity.lsh_bucket(): sign bits from
    the same seeded hyperplanes, emitted as full-precision double literals
    (repr round-trips float64 exactly on both parsers)."""
    from image_report_spark.operators.similarity import _planes

    planes = _planes(64, 6, 97)
    terms = []
    for i in range(6):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[i]) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({vec_expr}, {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def _ivf_cents_values_sql(n_cells: int = 256) -> str:
    """The seeded IVF centroids as SQL VALUES rows (values pre-rounded to
    6 dp, so the decimal literals parse to identical doubles everywhere)."""
    from image_report_spark.operators.similarity import seeded_centroids

    cents = seeded_centroids(n_cells, 64, 101)
    return ",\n".join(
        f"({c}, {[float(x) for x in cents[c]]!r})" for c in range(n_cells)
    )


def _lang_fold_sql(ws: str) -> str:
    """DuckDB mirror of functions.text.lang_guess(): fold over per-language
    stopword-hit structs, strictly-greater replaces, 'und' seed."""
    from image_report_spark.functions.text import LANG_STOPWORDS

    items = ["{'lang': 'und', 'hits': CAST(0 AS BIGINT)}"]
    for lang, sws in LANG_STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in sws) + "]"
        items.append(
            f"{{'lang': '{lang}', 'hits': len(list_filter({ws}, "
            f"x -> list_contains({arr}, x)))}}"
        )
    structs = "[" + ", ".join(items) + "]"
    return (
        f"list_reduce({structs}, "
        "(a, x) -> CASE WHEN x.hits > a.hits THEN x ELSE a END).lang"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_replay_final_table": _FINAL_TABLE_SQL,
        "cdc_mor_replay_final_table": _FINAL_TABLE_SQL,
        "cdc_lww_window": _FINAL_TABLE_SQL,
        "cdc_dedup_replays": f"""
            WITH changes AS ({_CHANGES_SQL})
            SELECT op, COUNT(*) AS n_events FROM changes GROUP BY op
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q2_broadcast_dim_join": """
            SELECT c_mktsegment,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "q3_multi_join_topk": """
            SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q4_range_self_join": """
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_pairs
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND a.event_id < b.event_id
             AND b.ts >= a.ts
             AND b.ts <= a.ts + INTERVAL 60 SECOND
            GROUP BY a.event_type, b.event_type
        """,
        "q5_two_pass_threshold": """
            SELECT event_type,
                   COUNT(*) AS n_above,
                   ROUND(AVG(value), 6) AS avg_above
            FROM events
            WHERE value > (SELECT AVG(value) * 1.5 FROM events)
            GROUP BY event_type
        """,
        "q6_histogram": """
            SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bin, COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "q7_quadrant_flags": """
            SELECT l_quantity > 25 AS hi_qty,
                   l_discount > 0.05 AS hi_disc,
                   COUNT(*) AS n,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price
            FROM lineitem GROUP BY 1, 2
        """,
        "q8_zone_density": """
            SELECT CAST(FLOOR(o_custkey / 15) AS BIGINT) AS zone,
                   CAST(MONTH(o_orderdate) AS INT) AS mo,
                   COUNT(*) AS n,
                   ROUND(AVG(o_totalprice), 6) AS avg_price
            FROM orders GROUP BY 1, 2
        """,
        "q9_lag_delta": """
            WITH g AS (
              SELECT user_id,
                     epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY event_id)) AS gap_us
              FROM events
            )
            SELECT user_id, COUNT(*) AS n_gaps,
                   CAST(FLOOR(AVG(gap_us)) AS BIGINT) AS avg_gap_us
            FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
        """,
        "q10_sliding_window": """
            SELECT user_id, event_id,
                   ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS mov_sum
            FROM events
        """,
        "q11_topk_per_group": """
            WITH r AS (
              SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
              FROM part
            )
            SELECT p_brand, p_partkey, CAST(rk AS INT) AS rk,
                   ROUND(p_retailprice, 2) AS price
            FROM r WHERE rk <= 3
        """,
        "q12_argmax_order": """
            WITH r AS (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders
            )
            SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS top_price
            FROM r WHERE rk = 1
        """,
        "q13_rle": """
            WITH flagged AS (
              SELECT user_id, event_id, event_type,
                     CASE WHEN lag(event_type) OVER w IS NULL
                            OR lag(event_type) OVER w <> event_type
                          THEN 1 ELSE 0 END AS new_run
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            ), runs AS (
              SELECT *, SUM(new_run) OVER (PARTITION BY user_id ORDER BY event_id) AS run
              FROM flagged
            )
            SELECT user_id, CAST(run - 1 AS INT) AS run_idx, event_type,
                   COUNT(*) AS run_len
            FROM runs GROUP BY user_id, run, event_type
        """,
        "q14_group_digest": """
            SELECT source,
                   md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS digest,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY source
        """,
        "q15_set_difference": """
            SELECT DISTINCT o_custkey AS custkey FROM orders
            EXCEPT
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        """,
        "q16_dedup_distinct": """
            SELECT event_type, COUNT(*) AS n_users
            FROM (SELECT DISTINCT event_type, user_id FROM events)
            GROUP BY event_type
        """,
        "q17_cube_marginals": """
            SELECT COALESCE(CAST(q AS VARCHAR), 'ALL') AS hi_qty,
                   COALESCE(CAST(d AS VARCHAR), 'ALL') AS hi_disc,
                   n
            FROM (
              SELECT l_quantity > 25 AS q, l_discount > 0.05 AS d,
                     COUNT(*) AS n
              FROM lineitem GROUP BY CUBE (1, 2)
            )
        """,
        "q18_json_extract": """
            SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS value_sum
            FROM events GROUP BY 1
        """,
        "q19_nearest_dim_match": """
            WITH dims(size_name, size_mm) AS (
              VALUES ('XS', 5), ('S', 15), ('M', 25), ('L', 35), ('XL', 45)
            ), scored AS (
              SELECT p_partkey, size_name, ABS(p_size - size_mm) AS dist,
                     row_number() OVER (PARTITION BY p_partkey
                                        ORDER BY ABS(p_size - size_mm) ASC, size_name ASC) AS rk
              FROM part CROSS JOIN dims
            )
            SELECT size_name, COUNT(*) AS n_parts FROM scored WHERE rk = 1
            GROUP BY size_name
        """,
        "q20_weighted_moving_avg": """
            SELECT user_id, event_id,
                   ROUND(0.25 * COALESCE(lag(value) OVER w, value)
                       + 0.5 * value
                       + 0.25 * COALESCE(lead(value) OVER w, value), 4) AS smooth
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        """,
        "q21_tumbling_window": """
            SELECT CAST(FLOOR(epoch_us(ts) / 300000000) * 300000000 AS BIGINT) AS ws_us,
                   event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        # session_window semantics: an event extends its session to
        # [ts, ts + gap); the next event merges iff it lands strictly inside,
        # so a gap >= 30 min starts a new session; session_end = last + gap
        "q22_session_window": """
            WITH g AS (
              SELECT user_id, epoch_us(ts) AS e,
                     CASE WHEN lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts) IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts) >= 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
            ), s AS (
              SELECT user_id, e,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY e) AS sid
              FROM g
            )
            SELECT user_id,
                   MIN(e) AS session_start_us,
                   MAX(e) + 1800000000 AS session_end_us,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "t5_quality_score": r"""
            WITH t AS (
              SELECT source,
                     length(text) AS nch,
                     length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS nclean,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS ws
              FROM documents
            ), q AS (
              SELECT source,
                ROUND((
                  LEAST(nch / 500.0, 1.0)
                  + (1.0 - LEAST((CASE WHEN nch > 0
                        THEN (nch - nclean) * 1.0 / nch ELSE 0.0 END) * 4, 1.0))
                  + LEAST((CASE WHEN len(ws) > 0
                        THEN len(list_filter(ws, x -> list_contains(
                               ['the','and','of','to','a','in','is','that'], x)))
                             * 1.0 / len(ws)
                        ELSE 0.0 END) * 5, 1.0)
                ) / 3, 6) AS qv
              FROM t
            )
            SELECT source, CAST(FLOOR(qv * 10) AS BIGINT) AS q_decile,
                   COUNT(*) AS n
            FROM q GROUP BY 1, 2
        """,
        "d1_exact_dedup": """
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
            ), grp AS (
              SELECT text, MIN(doc_id) AS canonical_id,
                     COUNT(*) AS group_size, list_sort(list(doc_id)) AS ids
              FROM docs GROUP BY text HAVING COUNT(*) > 1
            )
            SELECT canonical_id, u.dup_id, group_size
            FROM grp, unnest(ids) AS u(dup_id)
            WHERE u.dup_id <> canonical_id
            ORDER BY u.dup_id
        """,
        "t1_text_metrics": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS chars,
                   CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS words_n,
                   CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS tokens_n,
                   ROUND(CASE WHEN length(text) > 0
                         THEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))
                              * 1.0 / length(text)
                         ELSE 0.0 END, 6) AS punct_ratio
            FROM documents
        """,
        "t2_source_token_stats": f"""
            SELECT source,
                   COUNT(*) AS n_docs,
                   -- DuckDB SUM(BIGINT) yields HUGEINT (stringifies as float);
                   -- cast back so the value-hash matches Spark's bigint
                   CAST(SUM(CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT)) AS BIGINT) AS tokens_total,
                   CAST(SUM(CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)) AS BIGINT) AS words_total,
                   CAST(FLOOR(AVG(length(text))) AS BIGINT) AS avg_chars
            FROM documents GROUP BY source
        """,
        # exact all-pairs n-gram Jaccard — the LSH pipeline must equal the
        # exact answer (recall complete with overwhelming probability at the
        # verify threshold/seed, see
        # d2_minhash_neardup). Shingles mirror operators.dedupe.shingles():
        # distinct word 3-grams, whole-doc fallback when < 3 words.
        "d2_minhash_neardup": r"""
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents
              WHERE doc_id % 10 = 0
            ), sh AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 3
                          THEN list_distinct(list_transform(
                                 range(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                          ELSE [array_to_string(ws, ' ')] END AS s
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS ws
                    FROM docs)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(len(list_intersect(a.s, b.s)) * 1.0
                         / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
            ORDER BY id_a, id_b
        """,
        # incremental store == exact answer restricted to batch-1 pairs
        # (batch 1 = the +1000000 duplicated subset)
        "d6_incremental_neardup": r"""
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents
              WHERE doc_id % 10 = 0
            ), sh AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 3
                          THEN list_distinct(list_transform(
                                 range(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                          ELSE [array_to_string(ws, ' ')] END AS s
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS ws
                    FROM docs)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(len(list_intersect(a.s, b.s)) * 1.0
                         / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s)) * 1.0
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
              AND (a.doc_id >= 1000000 OR b.doc_id >= 1000000)
            ORDER BY id_a, id_b
        """,
        "d3_simhash_groups": f"""
            {_SIMHASH_SQL}
            SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n
            FROM sim GROUP BY simhash HAVING COUNT(*) > 1
        """,
        "d4_simhash_near_pairs": f"""
            {_SIMHASH_SQL}
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS dist
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY id_a, id_b
        """,
        "d5_embedding_neardup": """
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), vecs AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id,
                     list_transform(range(1, len(v) + 1),
                                    i -> v[i] + 0.05 * list_reverse(v)[i]) AS v
              FROM base WHERE vec_id % 10 = 0
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
            FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.99
            ORDER BY id_a, id_b
        """,
        "d2g_minhash_groups": _cc_sql(
            _D2_EDGE_CTES,
            """
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s)) * 1.0
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
            """,
            "doc_id",
        ),
        "d4g_simhash_near_groups": _cc_sql(
            # _SIMHASH_SQL is a full WITH clause; _cc_sql owns the WITH
            # RECURSIVE keyword, so strip the leading WITH
            _SIMHASH_SQL.strip().removeprefix("WITH"),
            """
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sim a JOIN sim b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            """,
            "doc_id",
        ),
        "d5g_embedding_neardup_groups": _cc_sql(
            _D5_EDGE_CTES,
            """
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
              WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.99
            """,
            "vec_id",
        ),
        "t3_lang_guess": f"""
            WITH w AS (
              SELECT lang, {_WORDS_SQL.format(col="lower(text)")} AS ws
              FROM documents
            ), g AS (
              SELECT lang, {_lang_fold_sql("ws")} AS guess FROM w
            )
            SELECT lang, guess, COUNT(*) AS n FROM g GROUP BY lang, guess
        """,
        "t4_fingerprint": f"""
            WITH h AS (
              SELECT source,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform({_WORDS_SQL.format(col="text")},
                                        w -> {_PWH_SQL.format(w="w")} % 2147483647)),
                       (a, b) -> (a * 31 + b) % 2147483647) AS fp
              FROM documents
            )
            SELECT source, COUNT(DISTINCT fp) AS n_fingerprints
            FROM h GROUP BY source
        """,
        "e1_knn_bruteforce": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                CAST(q.qv AS DOUBLE[])), 4) AS cos_sim
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id ASC
            LIMIT 5
        """,
        # mirrors _doc_media + the fake decoder: payload = first 64
        # printable-ASCII chars (padded); decode window = first 4×4 = 16
        # bytes; content_hash = their sum; video decoders are unavailable
        "m1_multimodal_features": r"""
            WITH m AS (
              SELECT CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                       ELSE 'video' END AS kind,
                     rpad(regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g'),
                          64, 'x') AS s
              FROM documents
            ), f AS (
              SELECT kind,
                     CASE WHEN kind = 'video'
                          THEN 'failed:decoder_unavailable' ELSE 'ok' END AS status,
                     length(s) AS byte_len,
                     CASE WHEN kind <> 'video'
                          THEN list_sum(list_transform(range(1, 17),
                                        i -> ascii(substr(s, i, 1))))
                          ELSE NULL END AS content_hash
              FROM m
            )
            SELECT kind, status, COUNT(*) AS n,
                   CAST(SUM(byte_len) AS BIGINT) AS bytes_total,
                   CAST(SUM(content_hash) AS BIGINT) AS hash_total
            FROM f GROUP BY kind, status
        """,
        "e2_knn_lsh": f"""
            WITH q AS (
              SELECT CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id = 0
            ), b AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     {_lsh_bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
              FROM embeddings WHERE vec_id <> 0
            ), qb AS (
              SELECT {_lsh_bucket_sql("qv")} AS bucket FROM q
            )
            SELECT b.vec_id,
                   ROUND(list_cosine_similarity(b.v, q.qv), 4) AS cos_sim
            FROM b, q, qb
            WHERE b.bucket = qb.bucket
            ORDER BY cos_sim DESC, b.vec_id ASC
            LIMIT 5
        """,
        "e3_ivf_cells": f"""
            WITH cents(cell, cv) AS (VALUES {_ivf_cents_values_sql(256)}),
            scored AS (
              SELECT e.vec_id, c.cell,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                 c.cv) DESC,
                                c.cell ASC) AS rk
              FROM embeddings e CROSS JOIN cents c
            )
            SELECT CAST(cell AS INT) AS cell, COUNT(*) AS n
            FROM scored WHERE rk = 1 GROUP BY cell
        """,
    }
