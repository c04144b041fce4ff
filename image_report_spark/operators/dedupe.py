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
def _simhash_bitfold_fn(hash_arrays: pd.Series) -> pd.Series:
    """64-bit SimHash bit-vote over PRE-HASHED token arrays.

    Fully vectorized — no per-row/per-token Python: all docs' hashes in the
    Arrow batch are concatenated into one uint64 array, unpacked to a
    (tokens, 64) bit matrix in one shift, and majority-voted per doc with a
    single ``np.add.reduceat`` segment sum. Word hashing itself happens
    JVM-side (``transform(words, xxhash64)``) before this UDF.
    """
    n = len(hash_arrays)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pd.Series(out)
    lists = [
        np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
        for a in hash_arrays
    ]
    lens = np.fromiter((len(a) for a in lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return pd.Series(out)
    flat = np.concatenate([a for a in lists if len(a)]).view(np.uint64)
    bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )  # (total_tokens, 64)
    nz = np.flatnonzero(lens)
    offsets = np.zeros(n, dtype=np.int64)
    offsets[1:] = np.cumsum(lens)[:-1]
    votes = np.add.reduceat(bits, offsets[nz], axis=0)  # (n_nonempty, 64)
    maj = (votes * 2 > lens[nz, None]).astype(np.uint64)  # strict majority → 1
    sims = (maj << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    # bit-preserving uint64 → int64 (astype raises OverflowError on numpy 2)
    out[nz] = sims.view(np.int64)
    return pd.Series(out)


_simhash_udf = None


def simhash(df: DataFrame, text_col: str = "text", word_hash=None) -> Column:
    """64-bit SimHash column: JVM-side word hashing (default ``xxhash64``;
    pass ``portable_word_hash`` for a SQL-mirrorable 60-bit variant), then
    the vectorized numpy bit-fold."""
    global _simhash_udf
    if _simhash_udf is None:  # deferred: pandas_udf needs an active session
        _simhash_udf = pandas_udf(_simhash_bitfold_fn, "long")
    wh = word_hash or (lambda w: F.xxhash64(w))  # xxhash64 is *args — wrap
    hashes = F.transform(words(F.col(text_col)), wh)
    return _simhash_udf(hashes)


def simhash_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", word_hash=None
) -> DataFrame:
    """Exact-SimHash-collision groups (Hamming distance 0; use
    :func:`simhash_near_pairs` for distance ≤ k grouping)."""
    h = df.select(F.col(id_col), simhash(df, text_col, word_hash).alias("simhash"))
    return (
        h.groupBy("simhash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 3,
    word_hash=None,
) -> DataFrame:
    """Near-duplicate pairs at Hamming distance ≤ ``max_dist`` (< 4).

    Banded LSH on the fingerprint itself: the 64 bits split into 4 16-bit
    bands; two keys within distance ≤ 3 must agree on ≥ 1 whole band
    (pigeonhole), so candidates = same-band-value pairs — the all-pairs
    O(n²) never materializes, and the shuffle key ``(band, band_bits)`` is
    uniform. Candidates are verified with a JVM-side
    ``bit_count(a XOR b)`` — no Python in the verify path."""
    if not 0 <= max_dist < 4:
        raise ValueError("banding with 4 bands covers max_dist in [0, 3]")
    h = df.select(F.col(id_col), simhash(df, text_col, word_hash).alias("_sim"))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("_sim"), 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_bits"),
            )
            for b in range(4)
        ]
    )
    banded = h.select(id_col, "_sim", F.explode(band_arr).alias("bb")).select(
        id_col, "_sim", F.col("bb.band").alias("band"), F.col("bb.band_bits").alias("band_bits")
    )
    a = banded.select(
        F.col("band"), F.col("band_bits"),
        F.col(id_col).alias("id_a"), F.col("_sim").alias("_sim_a"),
    )
    b = banded.select(
        F.col("band"), F.col("band_bits"),
        F.col(id_col).alias("id_b"), F.col("_sim").alias("_sim_b"),
    )
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist",
            F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b"))).cast("int"),
        )
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
        .distinct()
    )
