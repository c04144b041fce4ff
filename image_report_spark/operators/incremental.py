"""Incremental near-dup state: a MinHash signature store as an Icelite
side table, maintained per CDC batch.

The engine's whole point is incremental maintenance (the reference's
batch loop only processes NEW files, ir:544-575); this applies the same
discipline to the dedup tier: signatures (shingle-hash set + k-minhash
signature) for every historical doc persist in an Icelite table, and a
new batch is near-dup'd by

1. computing signatures for the DELTA only (the only pass that touches
   text),
2. LSH-banding the delta, and reading the state's band keys from a
   PERSISTED band-index side table (band, band_hash, doc_id) appended
   per batch — the state side is a narrow 20-byte-row scan with ZERO
   banding compute; only the delta is ever exploded,
3. joining delta bands against the index (plus delta-internal
   candidates) and verifying candidates by exact Jaccard over the STORED
   shingle-hash arrays,
4. appending the delta's band keys and signatures as new Icelite
   snapshots (atomic commits, each guarded by its own batch id so a
   crash between the two appends resumes exactly-once).

At 100 TB the per-batch cost is O(delta · bands) banding compute plus
one narrow index scan joined on the band key — never a re-banding of
the corpus. The state table stores (doc_id, _sh, _sig): the
shingle-hash array is the standard storage trade that buys text-free
exact verification.

Hot state buckets (a boilerplate duplicate cluster accumulated in
state — the COMMON case) would make the history↔delta equi-join emit
O(|state bucket| · |delta bucket|) candidates; ``neardup_batch`` routes
big state buckets through the same hybrid shape as
:func:`bucket_candidate_edges` — buckets above
``state_bucket_rep_threshold`` (DEFAULT 64, the same bound
``bucket_candidate_edges`` uses for exact pairs; pass ``None`` to
disable) contribute only their representative (min doc id) to the
cross join, so candidate volume is linear in the delta. The skipped
member count is never silent: it lands in
``self.last_state_rep_skips`` after each batch. Recall caveat: for a
PURE hot bucket (a true duplicate cluster) only the redundant
per-member fan-out is lost, but for an IMPURE hot bucket a delta doc
whose only true near-dup neighbor is a non-representative member
loses that pair entirely (pairs output has no connected-components
recovery step) — ``last_state_rep_skips`` counts skipped members, not
missed true pairs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from image_report_spark.operators.dedupe import (
    bucket_candidate_edges,
    explode_bands,
    hash_jaccard_pairs,
    minhash_signatures,
)
from image_report_spark.plans.icelite import PART_COL, IceliteTable

_STATE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("_sh", ArrayType(LongType()), True),
        StructField("_sig", ArrayType(LongType()), True),
    ]
)

_BANDS_SCHEMA = StructType(
    [
        StructField("band", IntegerType(), False),
        StructField("band_hash", LongType(), False),
        StructField("doc_id", LongType(), False),
    ]
)


class SignatureStore:
    """MinHash signature state backed by :class:`IceliteTable`.

    The Icelite layer provides the atomic-commit / time-travel / pruning
    machinery for free; signature rows ride the physical schema with
    ``_lsn`` = batch id and ``_op`` = 'I' (signatures are append-only —
    a re-ingested doc id would be a new near-dup observation upstream).
    A second Icelite table persists the band INDEX (band, band_hash,
    doc_id) so no batch ever re-bands historical signatures. LSH
    parameters are pinned at init in ``params.json`` because signatures
    computed under different (k, bands, seed) are not comparable.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.table = IceliteTable(spark, os.path.join(root, "table"))
        self.band_table = IceliteTable(spark, os.path.join(root, "bands"))
        with open(os.path.join(root, "params.json")) as f:
            p = json.load(f)
        self.k = int(p["k"])
        self.bands = int(p["bands"])
        self.seed = int(p["seed"])
        self.threshold = float(p["threshold"])
        #: state members skipped by the rep-threshold in the last
        #: ``neardup_batch`` call (None = no threshold was active) —
        #: the "no silent caps" accounting
        self.last_state_rep_skips: int | None = None

    @classmethod
    def init(
        cls,
        spark: SparkSession,
        root: str,
        k: int = 32,
        bands: int = 16,
        seed: int = 13,
        threshold: float = 0.8,
        num_buckets: int = 32,
    ) -> "SignatureStore":
        os.makedirs(root, exist_ok=True)
        params = {"k": k, "bands": bands, "seed": seed, "threshold": threshold}
        with open(os.path.join(root, "params.json"), "w") as f:
            json.dump(params, f)
        IceliteTable.create(
            spark, os.path.join(root, "table"), _STATE_SCHEMA, num_buckets,
            merge_keys=["doc_id"],
        )
        IceliteTable.create(
            spark, os.path.join(root, "bands"), _BANDS_SCHEMA, num_buckets,
            merge_keys=["band", "band_hash", "doc_id"],
            # _append_bands buckets rows by pmod(xxhash64(doc_id)) so a
            # doc's bands co-locate — partition_spec must say so, not
            # default to merge_keys[0]='band'
            partition_column="doc_id",
        )
        return cls(spark, root)

    # ------------------------------------------------------------------ state
    def signatures(self) -> DataFrame:
        """Stored (doc_id, _sh, _sig) rows — no text anywhere."""
        return self.table.read()

    def state_bands(self) -> DataFrame:
        """The persisted band index: (band, band_hash, doc_id) — a narrow
        scan, NO banding compute (plan-pinned in tests: no Generate node,
        and the signature columns ``_sh``/``_sig`` are never read)."""
        self._ensure_band_index()
        return self.band_table.read()

    def _banded(self, sig_df: DataFrame) -> DataFrame:
        return explode_bands(sig_df, "doc_id", self.k, self.bands)

    def _ensure_band_index(self) -> None:
        """Upgrade path for stores created before the band index existed:
        backfill (one O(corpus) re-band, ONCE) and commit it at the
        signature table's batch id so subsequent appends line up."""
        if self.band_table.exists():
            return
        IceliteTable.create(
            self.spark, os.path.join(self.root, "bands"), _BANDS_SCHEMA,
            self.table.num_buckets(), merge_keys=["band", "band_hash", "doc_id"],
            partition_column="doc_id",
        )
        last = self.table.snapshot().get("batch_id")
        if last is not None:
            self._append_bands(self._banded(self.signatures()), last)

    def _append_bands(self, banded: DataFrame, batch_id: int) -> None:
        phys = banded.select(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(self.band_table.num_buckets()))
            .cast("int").alias(PART_COL),
            F.col("band").cast("int"), "band_hash", "doc_id",
            F.lit(batch_id).cast("long").alias("_lsn"),
            F.lit("I").alias("_op"),
        )
        written = self.band_table.write_partition_files(
            phys, batch_id, sort_cols=[PART_COL, "band", "band_hash", "doc_id"],
            dir_label=f"bx{batch_id:05d}",
        )
        prev = {e["partition"]: e for e in self.band_table.snapshot()["manifest"]}
        replaced = {}
        for part, files in written.items():
            old = prev.get(part, {"files": []})
            replaced[part] = {
                "files": old["files"] + files,
                "row_count": None,
                "live_rows": None,
                "checksum": None,
                "last_applied_lsn": batch_id,
            }
        self.band_table.commit(
            replaced, _BANDS_SCHEMA, batch_id,
            {"kind": "band-index-append"},
        )

    # ------------------------------------------------------------------ apply
    def neardup_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        text_col: str = "text",
        id_col: str = "doc_id",
        state_bucket_rep_threshold: int | None = 64,
    ) -> DataFrame:
        """Near-dup pairs introduced by ``batch_df`` (vs history AND
        within the batch), then append the batch's band keys and
        signatures to state.

        Returns verified (id_a, id_b, jaccard) pairs where at least one
        side is a batch doc. The historical side is served ENTIRELY from
        the stored tables: this function never sees historical text and
        never re-bands historical signatures.

        ``state_bucket_rep_threshold``: state buckets with more members
        than this contribute only their representative (min doc id) to
        the history↔delta join — the hybrid hot-cluster shape.
        DEFAULTS ON (64, the exact-pairs bound
        :func:`bucket_candidate_edges` uses) because the stateful tier
        is where boilerplate clusters ACCUMULATE across batches — the
        worst-growth case must be protected on the default path. Pass
        ``None`` to disable (exact fan-out against every member). A
        delta doc joining a big PURE duplicate cluster still pairs with
        (and Jaccard-verifies against) the representative — only the
        redundant per-member fan-out is lost; for an IMPURE hot bucket,
        a delta doc whose only true neighbor is a non-representative
        member can lose that pair (there is no connected-components
        recovery in the pairs output). Skipped member count lands in
        ``self.last_state_rep_skips`` (never silent) — monitor it and
        lower/raise the threshold per corpus.
        """
        self._ensure_band_index()
        delta_sig = minhash_signatures(
            batch_df.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
            text_col, "doc_id", self.k, self.seed,
        )
        # one computation of the delta signatures feeds banding, verify
        # and the state append — persist, don't re-shingle three times
        delta_sig = delta_sig.persist()
        try:
            state_sig = self.signatures()
            delta_banded = self._banded(delta_sig)
            state_banded = self.band_table.read()

            sb = state_banded
            if state_bucket_rep_threshold is not None:
                if state_bucket_rep_threshold < 1:
                    raise ValueError("state_bucket_rep_threshold must be >= 1")
                # groupBy (map-side combined) + equi-join back, NOT a
                # window: a window would funnel each hot bucket through
                # one task's sort — the exact shape this path avoids
                sizes = state_banded.groupBy("band", "band_hash").agg(
                    F.count(F.lit(1)).alias("_bn"),
                    F.min("doc_id").alias("_rep"),
                )
                sb = (
                    state_banded.join(sizes, ["band", "band_hash"])
                    .filter(
                        (F.col("_bn") <= F.lit(state_bucket_rep_threshold))
                        | (F.col("doc_id") == F.col("_rep"))
                    )
                    .drop("_bn", "_rep")
                )
                # no silent caps: count the skipped members (one tiny
                # aggregate over the sizes frame)
                self.last_state_rep_skips = int(
                    sizes.filter(F.col("_bn") > state_bucket_rep_threshold)
                    .agg(
                        F.coalesce(
                            F.sum(F.col("_bn") - 1), F.lit(0)
                        ).alias("skipped")
                    )
                    .collect()[0]["skipped"]
                )
            else:
                self.last_state_rep_skips = None

            # history ↔ delta candidates: equi-join on the band key; the
            # state side is the persisted narrow index — 20-byte rows,
            # no _sh/_sig bytes move, no banding compute.
            # least/greatest orientation + self-pair filter keep the
            # output stable under crash-resume re-apply, when the state
            # already contains this batch's own rows
            cross = (
                sb.select("band", "band_hash", F.col("doc_id").alias("_sid"))
                .join(
                    delta_banded.select(
                        "band", "band_hash", F.col("doc_id").alias("_did")
                    ),
                    ["band", "band_hash"],
                )
                .filter(F.col("_sid") != F.col("_did"))
                .select(
                    F.least("_sid", "_did").alias("id_a"),
                    F.greatest("_sid", "_did").alias("id_b"),
                )
                .distinct()
            )
            # delta-internal candidates: hot-cluster-safe hybrid edges
            intra = bucket_candidate_edges(
                delta_banded, ["band", "band_hash"], "doc_id"
            )
            candidates = cross.unionByName(intra.select("id_a", "id_b")).distinct()

            sh_all = state_sig.select("doc_id", "_sh").unionByName(
                delta_sig.select("doc_id", "_sh")
            )
            verified = hash_jaccard_pairs(
                candidates, sh_all, "doc_id", self.threshold
            )
            # materialize results BEFORE the commits mutate state
            out = verified.localCheckpoint(eager=True)

            # exactly-once appends: band index first, then signatures —
            # each guarded by ITS OWN committed batch id, so a crash
            # between the two commits resumes without double-writing
            # either (and a full re-apply of a committed batch recomputes
            # the deterministic pairs but writes nothing)
            last_bands = self.band_table.snapshot().get("batch_id")
            if last_bands is None or batch_id > last_bands:
                self._append_bands(delta_banded, batch_id)

            last = self.table.snapshot().get("batch_id")
            if last is not None and batch_id <= last:
                return out

            phys = delta_sig.select(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(self.table.num_buckets()))
                .cast("int").alias(PART_COL),
                "doc_id", "_sh", "_sig",
                F.lit(batch_id).cast("long").alias("_lsn"),
                F.lit("I").alias("_op"),
            )
            written = self.table.write_partition_files(
                phys, batch_id, sort_cols=[PART_COL, "doc_id"]
            )
            prev = {e["partition"]: e for e in self.table.snapshot()["manifest"]}
            replaced = {}
            for part, files in written.items():
                old = prev.get(part, {"files": [], "row_count": 0})
                replaced[part] = {
                    "files": old["files"] + files,
                    "row_count": None,
                    "live_rows": None,
                    "checksum": None,
                    "last_applied_lsn": batch_id,
                }
            self.table.commit(
                replaced, _STATE_SCHEMA, batch_id,
                # the rep-skip accounting rides the commit ledger so the
                # "no silent caps" evidence is durable, not session-local
                {
                    "appended_docs": None,
                    "kind": "signature-append",
                    "state_rep_skips": self.last_state_rep_skips,
                    "state_rep_threshold": state_bucket_rep_threshold,
                },
            )
            return out
        finally:
            delta_sig.unpersist()
