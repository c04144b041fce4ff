"""Text-analysis functions for training-data pipelines.

All JVM-side column expressions (``pyspark.sql.functions`` only — no
Python UDFs): token counting, quality scoring, language-ID heuristic,
document fingerprinting. Graft of the reference's per-record feature
extractors (the hash family, hashing_config.py:446-509) re-aimed at text.

ANSI-mode note (Spark 4 default): the rolling fingerprint keeps every
intermediate below 2^36 via per-step modulus, so no overflow throws.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword seeds for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
}

#: a BPE-ish tokenizer regex: word pieces OR single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FP_MOD = 2_147_483_647  # 2^31 − 1 (Mersenne prime) — keeps the fold bounded


def words(col: Column) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def token_count(col: Column) -> Column:
    """BPE-ish token count (regex pieces, JVM-side ``regexp_count``)."""
    return F.regexp_count(col, F.lit(TOKEN_RE))


def word_count(col: Column) -> Column:
    return F.size(words(col))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace."""
    clean = F.length(F.regexp_replace(col, r"[^A-Za-z0-9\s]", ""))
    return F.when(F.length(col) > 0, (F.length(col) - clean) / F.length(col)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    ws = words(F.lower(col))
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """A simple composite quality heuristic in [0, 1]: long-enough, not
    punctuation-soup, some stopword mass (fluency proxy)."""
    len_term = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return F.round((len_term + punct_term + stop_term) / 3, 6)


def lang_scores(col: Column) -> Column:
    """Map language → stopword-hit count (the n-gram-heuristic core)."""
    ws = words(F.lower(col))
    pairs = []
    for lang, sw_list in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in sw_list])
        pairs.append(F.struct(F.lit(lang).alias("lang"),
                              F.size(F.filter(ws, lambda w: F.array_contains(sw, w))).alias("hits")))
    return F.array(*pairs)


def lang_guess(col: Column) -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when all zero."""
    scored = lang_scores(col)
    best = F.aggregate(
        scored,
        F.struct(F.lit("und").alias("lang"), F.lit(0).alias("hits")),
        lambda acc, x: F.when(x["hits"] > acc["hits"], x).otherwise(acc),
    )
    return best["lang"]


def portable_word_hash(w: Column) -> Column:
    """60-bit word hash computable bit-identically in ANSI SQL engines:
    the first 15 hex chars of md5 as an integer. Slower than xxhash64
    (md5 + string slice per word) — use for oracle-verified paths; the
    xxhash64 default is the production path."""
    return F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")


def xxhash_word_hash(w: Column) -> Column:
    """Production word hash: 64-bit xxhash, folded to non-negative."""
    return F.pmod(F.xxhash64(w), F.lit(FP_MOD))


def fingerprint(col: Column, word_hash=None) -> Column:
    """Order-sensitive rolling hash over words (document fingerprint).

    Polynomial fold ``h = (h*31 + hash(word)) mod (2^31−1)`` — the graft of
    the reference's content hashes; per-step mod keeps ANSI math safe.
    ``word_hash`` swaps the per-word hash (default xxhash64;
    :func:`portable_word_hash` for SQL-oracle-verifiable fingerprints)."""
    wh = word_hash or xxhash_word_hash
    return F.aggregate(
        words(col),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + F.pmod(wh(w), F.lit(FP_MOD))) % F.lit(FP_MOD),
    )
