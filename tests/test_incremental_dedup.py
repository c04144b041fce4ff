"""Incremental dedup state (VERDICT r2 #4): near-dups for batch N+1
against the historical corpus are found WITHOUT recomputing historical
signatures — the reference's incremental batch loop (ir:544-575) applied
to the dedup tier.

The no-recompute proof is structural: ``SignatureStore.neardup_batch``
only ever receives the delta batch; historical text is never passed, so
the historical side can only come from the stored signatures. The
correctness oracle is a full recompute over the union corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from image_report_spark.operators.dedupe import minhash_dedup
from image_report_spark.operators.incremental import SignatureStore

B1 = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "completely different content about spark window functions here"),
    (2, "another unrelated document mentioning checkpoint manifests only"),
    (3, "streaming watermarks bound state for late data in event time"),
]
B2 = [
    (10, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (11, "the quick brown fox leaps over the lazy dog again and again"),  # near dup of 0/10
    (12, "fresh text with no relation to anything that came before now"),
    (13, "fresh text with no relation to anything that came before today"),  # near dup of 12
]
B3 = [
    (20, "streaming watermarks bound state for late data in event time"),  # exact dup of 3
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _full_recompute_pairs(spark, rows):
    return {
        (r.id_a, r.id_b)
        for r in minhash_dedup(
            _df(spark, rows), threshold=0.5, k=32, bands=16
        ).collect()
    }


@pytest.fixture()
def store(spark, tmp_path):
    return SignatureStore.init(
        spark, str(tmp_path / "sigstore"), k=32, bands=16, threshold=0.5,
        num_buckets=8,
    )


def test_incremental_equals_full_recompute(spark, store):
    """Pairs from incremental batches == full-recompute pairs restricted
    to pairs involving each batch (the store never sees batch-1 text when
    batch 2 arrives)."""
    p1 = {(r.id_a, r.id_b) for r in store.neardup_batch(_df(spark, B1), 0).collect()}
    assert p1 == _full_recompute_pairs(spark, B1)  # within-batch only

    p2 = {(r.id_a, r.id_b) for r in store.neardup_batch(_df(spark, B2), 1).collect()}
    full_12 = _full_recompute_pairs(spark, B1 + B2)
    b2_ids = {r[0] for r in B2}
    expect2 = {p for p in full_12 if p[0] in b2_ids or p[1] in b2_ids}
    assert p2 == expect2
    assert (0, 10) in p2 and (0, 11) in p2 and (12, 13) in p2  # cross + intra

    # third batch: near-dup of a batch-1 doc, two commits deep
    p3 = {(r.id_a, r.id_b) for r in store.neardup_batch(_df(spark, B3), 2).collect()}
    assert p3 == {(3, 20)}


def test_state_is_signatures_not_text(spark, store):
    """State table holds (doc_id, _sh, _sig) only — no text column — and
    accumulates exactly one row per historical doc per batch."""
    store.neardup_batch(_df(spark, B1), 0)
    store.neardup_batch(_df(spark, B2), 1)
    sigs = store.signatures()
    assert set(sigs.columns) == {"doc_id", "_sh", "_sig"}
    assert sigs.count() == len(B1) + len(B2)
    assert {r.doc_id for r in sigs.select("doc_id").collect()} == {
        r[0] for r in B1 + B2
    }
    k = sigs.select(F.size("_sig").alias("n")).distinct().collect()
    assert [r.n for r in k] == [32]


def test_reapply_is_idempotent(spark, store):
    """Crash-resume re-apply of a committed batch returns the same pairs
    and never double-writes signatures."""
    store.neardup_batch(_df(spark, B1), 0)
    first = {(r.id_a, r.id_b) for r in store.neardup_batch(_df(spark, B2), 1).collect()}
    again = {(r.id_a, r.id_b) for r in store.neardup_batch(_df(spark, B2), 1).collect()}
    assert first == again
    assert store.signatures().count() == len(B1) + len(B2)


def test_state_survives_reopen(spark, store):
    """A new SignatureStore handle over the same root sees the committed
    state (params + table pointer), like any Icelite reader."""
    store.neardup_batch(_df(spark, B1), 0)
    reopened = SignatureStore(spark, store.root)
    assert reopened.threshold == 0.5 and reopened.bands == 16
    p = {(r.id_a, r.id_b) for r in reopened.neardup_batch(_df(spark, B3), 1).collect()}
    assert p == {(3, 20)}


def test_state_side_is_odelta_no_rebanding(spark, store):
    """The state side of candidate generation is the PERSISTED band index
    — per-batch banding compute is O(delta), not O(corpus). Pinned in the
    plan: the index read has no Generate (explode) node and never touches
    the signature columns, so historical rows contribute a narrow
    20-byte-row scan and zero hash work."""
    store.neardup_batch(_df(spark, B1), 0)
    store.neardup_batch(_df(spark, B2), 1)
    bands_df = store.state_bands()
    plan = bands_df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode: keys are stored, not derived
    assert "_sig" not in plan and "_sh" not in plan  # signatures never read
    # the index holds exactly bands rows per historical doc
    assert bands_df.count() == (len(B1) + len(B2)) * store.bands
    # and it serves the next batch correctly (cross pair via index only)
    p3 = {(r.id_a, r.id_b) for r in store.neardup_batch(_df(spark, B3), 2).collect()}
    assert p3 == {(3, 20)}


def test_band_index_append_is_idempotent(spark, store):
    """Crash-resume re-apply never double-writes the band index (its
    append is guarded by the band table's own committed batch id)."""
    store.neardup_batch(_df(spark, B1), 0)
    n1 = store.state_bands().count()
    store.neardup_batch(_df(spark, B1), 0)  # re-apply committed batch
    assert store.state_bands().count() == n1


def test_hot_state_bucket_rep_threshold(spark, store):
    """A boilerplate duplicate cluster accumulated in state must not
    explode the history↔delta join: with ``state_bucket_rep_threshold``,
    big state buckets contribute only their representative, candidate
    volume is linear, the skip count is surfaced (never silent), and a
    delta doc joining the cluster is still caught."""
    boiler = "standard legal disclaimer text repeated on every single page"
    big = [(100 + i, boiler) for i in range(40)]  # one pure hot cluster
    store.neardup_batch(_df(spark, big), 0)

    delta = [(500, boiler), (501, "unrelated fresh content nothing alike")]
    pairs = {
        (r.id_a, r.id_b)
        for r in store.neardup_batch(
            _df(spark, delta), 1, state_bucket_rep_threshold=4
        ).collect()
    }
    # rep edge: the delta dup pairs with the cluster representative
    assert (100, 500) in pairs
    # linear, not all-members: far fewer history-side pairs than the
    # 40-member fan-out (intra-delta and rep pairs only)
    assert len([p for p in pairs if p[1] == 500]) < 5
    # never-silent accounting: every exploded band of the 40-member
    # bucket skipped its 39 non-representatives
    assert store.last_state_rep_skips == 39 * store.bands
    # threshold=None disables the guard: exact fan-out against every
    # member, accounting reset to None
    p2 = store.neardup_batch(
        _df(spark, [(600, boiler)]), 2, state_bucket_rep_threshold=None
    )
    assert store.last_state_rep_skips is None
    assert {(r.id_a, r.id_b) for r in p2.collect()} >= {(100, 600), (500, 600)}


def test_hot_state_default_threshold_protects_accumulated_boilerplate(
    spark, store
):
    """The DEFAULT path (no kwarg anywhere) must stay linear when a
    boilerplate cluster accumulates across batches — the stateful tier's
    worst-growth case (VERDICT r4 #1). Three batches accumulate a
    90-member pure cluster in state; the next delta doc joining it emits
    only the representative pair instead of a 90-member fan-out, with the
    skip count surfaced both live and in the commit ledger."""
    boiler = "standard legal disclaimer text repeated on every single page"
    for b in range(3):  # 30 + 30 + 30 accumulated members
        store.neardup_batch(
            _df(spark, [(1000 * b + i, boiler) for i in range(30)]), b
        )
        # below the default 64-threshold nothing is skipped (exact mode)
        assert store.last_state_rep_skips == 0
    pairs = {
        (r.id_a, r.id_b)
        for r in store.neardup_batch(_df(spark, [(9000, boiler)]), 3).collect()
    }
    # rep edge caught: the delta dup pairs with the cluster representative
    assert (0, 9000) in pairs
    # linear: ONE history-side pair, not 90
    assert len(pairs) == 1
    # never silent, live attribute AND durable ledger
    assert store.last_state_rep_skips == 89 * store.bands
    ledger = store.table.snapshot()["ledger"]
    assert ledger["state_rep_skips"] == 89 * store.bands
    assert ledger["state_rep_threshold"] == 64
