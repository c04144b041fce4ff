"""Tests for training-data-pipeline operators: RLE round-trip (graft of
tests/test_rle.py:19-30), text metrics, dedup family, similarity search,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from image_report_spark.functions.rle import rle_decode, rle_encode
from image_report_spark.functions.text import (
    fingerprint,
    lang_guess,
    quality_score,
    token_count,
    word_count,
)
from image_report_spark.operators.dedupe import (
    exact_duplicates,
    dedup_exact,
    jaccard,
    minhash_dedup,
    minhash_lsh_candidates,
    shingles,
    simhash_duplicates,
)
from image_report_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synth_media,
)
from image_report_spark.operators.similarity import (
    ivf_assign,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
)


# ------------------------------------------------------------------- RLE
def test_rle_roundtrip_random(spark):
    rng = np.random.default_rng(0)
    rows = [
        (int(k), int(i), str(v))
        for k in range(5)
        for i, v in enumerate(rng.integers(0, 3, size=40))
    ]
    df = spark.createDataFrame(rows, "k int, pos int, v string")
    enc = rle_encode(df, "k", "pos", "v")
    dec = rle_decode(enc, "k", "v")
    # round-trip: decode(encode(x)) == x (positions re-densified)
    orig = df.orderBy("k", "pos").collect()
    back = dec.orderBy("k", "pos").collect()
    assert [(r.k, r.v) for r in orig] == [(r.k, r.v) for r in back]
    # compression property (graft of tests/test_rle.py:32-37)
    assert enc.count() <= df.count()


def test_rle_golden(spark):
    df = spark.createDataFrame(
        [(0, 0, "a"), (0, 1, "a"), (0, 2, "b"), (0, 3, "a"), (0, 4, "a")],
        "k int, pos int, v string",
    )
    runs = rle_encode(df, "k", "pos", "v").orderBy("run_idx").collect()
    assert [(r.run_idx, r.v, r.run_len) for r in runs] == [
        (0, "a", 2), (1, "b", 1), (2, "a", 2),
    ]


# ------------------------------------------------------------------ text
def test_text_metrics_golden(spark):
    df = spark.createDataFrame([("Hello, world! 42",)], "t string")
    row = df.select(
        word_count(F.col("t")).alias("w"),
        token_count(F.col("t")).alias("tok"),
    ).first()
    assert row["w"] == 3
    # tokens: Hello , world ! 42 → 5
    assert row["tok"] == 5


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is in a house that",),
         ("der hund und die katze ist nicht ein zu",),
         ("xyzzy qwerty",)],
        "t string",
    )
    got = [r[0] for r in df.select(lang_guess(F.col("t"))).collect()]
    assert got == ["en", "de", "und"]


def test_quality_and_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("some reasonable english text here",)] * 2, "t string")
    q = df.select(quality_score(F.col("t")).alias("q"), fingerprint(F.col("t")).alias("f")).collect()
    assert q[0]["q"] == q[1]["q"] and 0 <= q[0]["q"] <= 1
    assert q[0]["f"] == q[1]["f"] and q[0]["f"] >= 0


# ----------------------------------------------------------------- dedup
@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog again and again"),  # near dup of 0
        (3, "completely different content about spark window functions here"),
        (4, "another unrelated document mentioning checkpoint manifests only"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    pairs = exact_duplicates(docs).collect()
    assert [(r.canonical_id, r.dup_id) for r in pairs] == [(0, 1)]
    kept = dedup_exact(docs)
    assert kept.count() == 4 and kept.filter("doc_id = 1").count() == 0


def test_shingle_jaccard(spark, docs):
    two = docs.filter("doc_id in (0, 2)").select("doc_id", shingles(F.col("text")).alias("s"))
    a = two.filter("doc_id = 0").first()["s"]
    b = two.filter("doc_id = 2").first()["s"]
    inter = len(set(a) & set(b))
    union = len(set(a) | set(b))
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    got = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).first()["j"]
    assert abs(got - inter / union) < 1e-9


def test_minhash_finds_near_dup(spark, docs):
    # bands=16 (r=2) → LSH S-curve knee ≈ 0.25, reliably catches j≈0.54
    pairs = minhash_dedup(docs, threshold=0.5, k=32, bands=16).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found  # exact dup always collides
    assert (0, 2) in found or (1, 2) in found  # near dup found
    assert all({a, b} & {3, 4} == set() for a, b in found)  # no false positives


def test_minhash_candidates_no_all_pairs(spark, docs):
    cands = minhash_lsh_candidates(docs)
    assert cands.count() < 10  # never the full 5*4/2 cross product… times bands


def test_simhash_groups(spark, docs):
    groups = simhash_duplicates(docs).collect()
    assert len(groups) == 1
    assert (groups[0]["canonical_id"], groups[0]["n"]) == (0, 2)


def test_simhash_bitfold_matches_naive_loop(spark, docs):
    """Vectorized kernel == naive per-token reference loop (graft of the
    reference's impl-vs-_naive_neighbor_count equality test,
    tests/test_hashing_config.py:11-30) over the production xxhash64 path."""
    from image_report_spark.functions.text import words
    from image_report_spark.operators.dedupe import simhash

    rows = docs.select(
        "doc_id",
        F.transform(words(F.col("text")), lambda w: F.xxhash64(w)).alias("hashes"),
        simhash(docs, "text").alias("got"),
    ).collect()
    assert rows
    for r in rows:
        hs = [h & 0xFFFFFFFFFFFFFFFF for h in r["hashes"]]
        sim = 0
        for b in range(64):
            ones = sum((h >> b) & 1 for h in hs)
            if 2 * ones > len(hs):
                sim |= 1 << b
        if sim >= 1 << 63:
            sim -= 1 << 64
        assert sim == r["got"], r["doc_id"]


def test_simhash_near_pairs_hamming(spark, docs):
    """Banded Hamming-ball grouping: exact dup at dist 0, near dup within
    dist ≤ 3 iff its fingerprint is, and never any pair the exact all-pairs
    check would reject."""
    from image_report_spark.operators.dedupe import simhash, simhash_near_pairs

    sims = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", simhash(docs, "text").alias("s")).collect()
    }
    expected = set()
    ids = sorted(sims)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sims[a] ^ sims[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3:
                expected.add((a, b))
    got = {
        (r.id_a, r.id_b) for r in simhash_near_pairs(docs, max_dist=3).collect()
    }
    assert got == expected
    assert (0, 1) in got  # the exact dup pair
    # the Manku combination-key scheme changes candidate volume, never the
    # verified output — both schemes are pigeonhole-complete at dist ≤ 3
    got_manku = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(docs, max_dist=3, scheme="manku").collect()
    }
    assert got_manku == expected


def test_simhash_scheme_auto_select(spark, docs):
    """``scheme=None`` (the default everywhere) picks the scale-safe
    scheme from corpus size — no kwarg needed for the ≳10⁶-doc regime,
    no manku candidate overhead below it (VERDICT r4 #5)."""
    from image_report_spark.operators.dedupe import (
        SIMHASH_MANKU_AUTO_THRESHOLD,
        _resolve_simhash_scheme,
        simhash_banded,
        simhash_near_pairs,
    )

    # small corpus, no hint: one count() job → bands16 (4 rows/doc)
    assert _resolve_simhash_scheme(docs, None, None) == "bands16"
    # caller hint at/above threshold → manku, and NO count job runs
    assert (
        _resolve_simhash_scheme(docs, None, SIMHASH_MANKU_AUTO_THRESHOLD)
        == "manku"
    )
    # explicit override always wins
    assert _resolve_simhash_scheme(docs, "bands16", 10**9) == "bands16"
    # end-to-end: the auto-picked scheme is visible in the band fan-out
    n = docs.count()
    assert simhash_banded(docs).count() == 4 * n  # bands16: 4 keys/doc
    assert (
        simhash_banded(docs, corpus_count=SIMHASH_MANKU_AUTO_THRESHOLD).count()
        == 20 * n
    )  # manku: 20 combination keys/doc
    # and the verified output is scheme-independent under the hint
    assert {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            docs, max_dist=3, corpus_count=SIMHASH_MANKU_AUTO_THRESHOLD
        ).collect()
    } == {(r.id_a, r.id_b) for r in simhash_near_pairs(docs, max_dist=3).collect()}


def test_manku_bands_bounded_where_16bit_saturates(spark):
    """Planted key-space saturation: 100k distinct fingerprints that agree
    on their low 16 bits (mutually distant in the upper 48). The 16-bit
    scheme funnels ALL of them into one band-0 bucket — the ≳10⁶-doc
    blow-up mode; the Manku 3-block combination keys keep every bucket
    bounded because each of the 20 combinations includes at least one
    block made of genuinely differing bits."""
    from image_report_spark.operators.dedupe import simhash_bands_from_sim

    n = 100_000
    h = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # upper 48 bits pseudo-random, low 16 bits pinned to 0x1234
        F.xxhash64("id")
        .bitwiseAND(F.lit(~0xFFFF))
        .bitwiseOR(F.lit(0x1234))
        .alias("_sim"),
    )
    def max_bucket(scheme):
        return (
            simhash_bands_from_sim(h, "doc_id", scheme)
            .groupBy("band", "band_bits")
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )
    assert max_bucket("bands16") == n  # saturated: one bucket owns the corpus
    # each combo key has ≥ 16 bits of differing-bit entropy here →
    # expected max bucket ~a few; 64 is a generous determinism margin
    assert max_bucket("manku") <= 64


def test_manku_recall_guarantee_planted_neighbors(spark):
    """Pigeonhole completeness of the combination keys, directly: plant
    pairs at every distance 0–3 with flips spread across DIFFERENT blocks
    (the adversarial placement for block schemes) and assert every pair
    shares at least one of the 20 combination keys."""
    from image_report_spark.operators.dedupe import simhash_bands_from_sim

    base = 0x0123_4567_89AB_CDEF
    rows, pairs = [], []
    nid = 0
    # flip bit sets hitting 1, 2 and 3 distinct blocks incl. block edges
    for flips in [(), (0,), (63,), (10, 11), (21, 22), (5, 33, 54), (0, 32, 63)]:
        v = base
        for b in flips:
            v ^= 1 << b
        if v >= 1 << 63:
            v -= 1 << 64
        rows.append((nid, v))
        if flips:
            pairs.append((0, nid))
        nid += 1
    df = spark.createDataFrame(rows, "doc_id long, _sim long")
    banded = simhash_bands_from_sim(df, "doc_id", "manku")
    shared = {
        (r.id_a, r.id_b)
        for r in banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
        .collect()
    }
    for p in pairs:
        assert p in shared, f"pair {p} missed by combination keys"


# ------------------------------------------------------------- similarity
@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    vecs[7] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near-neighbor
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_knn_bruteforce_exact(spark, embeddings):
    df, vecs = embeddings
    q = [float(x) for x in vecs[0]]
    top = knn_bruteforce(df.filter("vec_id != 0"), q, k=3).collect()
    # numpy oracle
    v = vecs.astype(np.float64)
    sims = (v @ np.asarray(q)) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    sims[0] = -np.inf
    expect = list(np.argsort(-sims)[:3])
    assert [r.vec_id for r in top] == [int(i) for i in expect]
    assert top[0].vec_id == 7  # the planted near-neighbor wins


def test_knn_lsh_subset_of_bucket(spark, embeddings):
    df, vecs = embeddings
    q = [float(x) for x in vecs[0]]
    res = knn_lsh(df.filter("vec_id != 0"), q, k=3, n_planes=4)
    got = [r.vec_id for r in res.collect()]
    assert 7 in got  # near-identical vector shares every sign bucket


def test_ivf_cells_and_probe(spark, embeddings):
    df, vecs = embeddings
    assigned = ivf_assign(df, n_cells=8, dim=16)
    cells = assigned.select("_cell").distinct().count()
    assert 1 < cells <= 8
    q = [float(x) for x in vecs[0]]
    got = [r.vec_id for r in knn_ivf(df.filter("vec_id != 0"), q, k=3, n_cells=8).collect()]
    assert 7 in got  # near-duplicate lands in the same cell


def test_knn_lsh_adaptive_handles_empty_primary_bucket(spark, embeddings):
    from image_report_spark.operators.similarity import (
        knn_lsh_adaptive,
        lsh_bucket,
        query_bucket,
    )

    df, vecs = embeddings
    q = [float(x) for x in vecs[0]]
    qb = query_bucket(q, n_planes=4)
    # empty the primary bucket: drop every row that hashes into it
    holed = df.withColumn(
        "_b", lsh_bucket(F.col("embedding"), dim=16, n_planes=4)
    ).filter(F.col("_b") != qb).drop("_b")
    assert knn_lsh(holed, q, k=3, n_planes=4).count() == 0  # single-probe misses
    got = knn_lsh_adaptive(holed, q, k=3, n_planes=4).collect()
    assert len(got) == 3  # multi-probe widened the radius and found k


def test_ivf_assign_matches_numpy_oracle(spark, embeddings):
    from image_report_spark.operators.similarity import seeded_centroids

    df, vecs = embeddings
    cents = seeded_centroids(256, 16, seed=5)
    got = {
        r.vec_id: r["_cell"]
        for r in ivf_assign(df, centroids=cents).select("vec_id", "_cell").collect()
    }
    expect = np.argmax(vecs.astype(np.float64) @ cents.T, axis=1)
    assert got == {i: int(expect[i]) for i in range(len(vecs))}


def test_embedding_neardup_equals_exact_allpairs(spark, embeddings):
    """LSH-banded cosine near-dup == exact all-pairs at the verify
    threshold (candidates-only verify; recall complete by band math)."""
    from image_report_spark.operators.similarity import embedding_neardup

    df, vecs = embeddings
    # plant a near-dup: vec 7 is already vecs[0] + tiny noise (cos ≈ 1)
    got = {
        (r.id_a, r.id_b)
        for r in embedding_neardup(df, threshold=0.99, bands=8).collect()
    }
    v = vecs.astype(np.float64)
    sims = (v @ v.T) / (
        np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
    )
    expected = {
        (i, j)
        for i in range(len(v))
        for j in range(i + 1, len(v))
        if round(sims[i, j], 4) >= 0.99
    }
    assert got == expected
    assert (0, 7) in got  # the planted near-neighbor


def test_knn_ivf_nprobe_all_equals_bruteforce(spark, embeddings):
    df, vecs = embeddings
    q = [float(x) for x in vecs[0]]
    sub = df.filter("vec_id != 0")
    exact = [r.vec_id for r in knn_bruteforce(sub, q, k=5).collect()]
    probed = [
        r.vec_id
        for r in knn_ivf(sub, q, k=5, n_cells=8, nprobe=8).collect()
    ]
    assert probed == exact  # probing every cell degenerates to exact search


# ------------------------------------------------------------- multimodal
def test_multimodal_feature_extraction(spark):
    media = synth_media(spark, n=12, seed=7)
    feats = extract_features(media).collect()
    assert len(feats) == 12
    ok = [r for r in feats if r.status == "ok"]
    failed = [r for r in feats if r.status == "failed:decoder_unavailable"]
    assert {r.kind for r in ok} == {"image", "audio"}
    assert {r.kind for r in failed} == {"video"}  # stubbed codec isolated per item
    assert all(r.content_hash is not None for r in ok)
    # deterministic across runs
    again = extract_features(synth_media(spark, n=12, seed=7)).collect()
    assert sorted((r.media_id, r.content_hash) for r in feats) == sorted(
        (r.media_id, r.content_hash) for r in again
    )


def test_frame_sampling(spark):
    media = synth_media(spark, n=9, seed=7)
    frames = sample_frames(media, every_n=10)
    rows = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in rows)  # 30 frames → 0,10,20


def test_knn_lsh_adaptive_single_scan(spark, embeddings, tmp_path):
    """VERDICT r2 #5: the adaptive probe must not scan the data twice.
    With a parquet-backed input, the histogram job materializes the cached
    bucketed frame; the returned probe plan reads InMemoryTableScan and
    contains NO file scan."""
    from image_report_spark.operators.similarity import knn_lsh_adaptive

    df, vecs = embeddings
    path = str(tmp_path / "emb.parquet")
    df.write.parquet(path)
    disk = spark.read.parquet(path)
    q = [float(x) for x in vecs[0]]
    res = knn_lsh_adaptive(
        disk.filter("vec_id != 0"), q, k=3, n_planes=4, release_cache=False
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # everything after InMemoryRelation is the cache-DEFINITION subtree
    # (it mentions the original FileScan); the probe path above it must
    # read the cache, never the files
    probe_side = plan.split("InMemoryRelation")[0]
    assert "FileScan" not in probe_side and "Scan parquet" not in probe_side
    assert [r.vec_id for r in res.collect()][0] == 7  # still the right answer
    res.unpersist_handle.unpersist()  # caller-owned lifecycle


def test_knn_lsh_adaptive_releases_cache(spark, embeddings):
    """Default lifecycle: repeated calls in a long-lived session leave
    ZERO persisted frames behind (the r3 leak), while still answering
    from a single data scan per call."""
    from image_report_spark.operators.similarity import knn_lsh_adaptive

    df, vecs = embeddings

    def persisted_ids() -> set[int]:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(str(k)) for k in m.keySet().toArray()}

    # compare ID SETS, not sizes: earlier tests in a shared session may
    # leave persisted frames that the ContextCleaner reaps mid-test — an
    # exact size equality races with that GC; what this test owns is that
    # NO NEW persisted RDD survives the calls below
    before = persisted_ids()
    for qi in (0, 3):
        q = [float(x) for x in vecs[qi]]
        res = knn_lsh_adaptive(df, q, k=3, n_planes=4)
        top = [r.vec_id for r in res.collect()]
        assert top[0] == qi  # the query's own vector is in df
    assert persisted_ids() - before == set()


def test_minhash_vectorized_equals_jvm(spark, docs):
    """The Arrow-vectorized MinHash fold must be bit-identical to the
    pure-JVM HOF reference on every shape: normal docs, sub-n-gram short
    docs, empty/None text, and null/empty hash arrays."""
    from image_report_spark.operators.dedupe import (
        minhash_from_hashes,
        minhash_from_hashes_jvm,
        with_shingle_hashes,
    )

    extra = spark.createDataFrame(
        [(10, ""), (11, None), (12, "one"), (13, "a b " * 500)],
        "doc_id long, text string",
    )
    sh = with_shingle_hashes(docs.unionByName(extra).select("doc_id", "text"))
    rows = sh.select(
        "doc_id",
        minhash_from_hashes(F.col("_sh"), 32).alias("vec"),
        minhash_from_hashes_jvm(F.col("_sh"), 32).alias("jvm"),
    ).collect()
    assert rows and all(list(r["vec"]) == list(r["jvm"]) for r in rows)
    null_arrays = spark.createDataFrame(
        [(1, None), (2, [])], "doc_id long, _sh array<long>"
    )
    rows = null_arrays.select(
        minhash_from_hashes(F.col("_sh"), 8).alias("vec"),
        minhash_from_hashes_jvm(F.col("_sh"), 8).alias("jvm"),
    ).collect()
    assert all(list(r["vec"]) == list(r["jvm"]) == [None] * 8 for r in rows)
