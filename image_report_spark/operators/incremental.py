"""Incremental near-dup state: a MinHash signature store as an Icelite
side table, maintained per CDC batch.

The engine's whole point is incremental maintenance (the reference's
batch loop only processes NEW files, ir:544-575); this applies the same
discipline to the dedup tier: signatures (shingle-hash set + k-minhash
signature) for every historical doc persist in an Icelite table, and a
new batch is near-dup'd by

1. computing signatures for the DELTA only (the only pass that touches
   text),
2. LSH-banding the delta AND the stored state (band hashes derive from
   the stored signature — 16 cheap hashes per row, no re-shingling),
3. joining delta bands against state bands (plus delta-internal
   candidates) and verifying candidates by exact Jaccard over the STORED
   shingle-hash arrays,
4. appending the delta's signatures as a new Icelite snapshot (atomic
   commit, time-travelable like any other table).

At 100 TB the cost per batch is O(delta · bands) shuffle rows joined
against a bucketed state scan — never a recompute of the corpus. The
state table stores (doc_id, _sh, _sig): the shingle-hash array is the
standard storage trade that buys text-free exact verification.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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


class SignatureStore:
    """MinHash signature state backed by :class:`IceliteTable`.

    The Icelite layer provides the atomic-commit / time-travel / pruning
    machinery for free; signature rows ride the physical schema with
    ``_lsn`` = batch id and ``_op`` = 'I' (signatures are append-only —
    a re-ingested doc id would be a new near-dup observation upstream).
    LSH parameters are pinned at init in ``params.json`` because
    signatures computed under different (k, bands, seed) are not
    comparable.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.table = IceliteTable(spark, os.path.join(root, "table"))
        with open(os.path.join(root, "params.json")) as f:
            p = json.load(f)
        self.k = int(p["k"])
        self.bands = int(p["bands"])
        self.seed = int(p["seed"])
        self.threshold = float(p["threshold"])

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
            spark, os.path.join(root, "table"), _STATE_SCHEMA, num_buckets
        )
        return cls(spark, root)

    # ------------------------------------------------------------------ state
    def signatures(self) -> DataFrame:
        """Stored (doc_id, _sh, _sig) rows — no text anywhere."""
        return self.table.read()

    def _banded(self, sig_df: DataFrame) -> DataFrame:
        return explode_bands(sig_df, "doc_id", self.k, self.bands)

    # ------------------------------------------------------------------ apply
    def neardup_batch(self, batch_df: DataFrame, batch_id: int,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
        """Near-dup pairs introduced by ``batch_df`` (vs history AND
        within the batch), then append the batch's signatures to state.

        Returns verified (id_a, id_b, jaccard) pairs where at least one
        side is a batch doc. The historical side is served ENTIRELY from
        the state table: this function never sees historical text.
        """
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
            state_banded = self._banded(state_sig)

            # history ↔ delta candidates: equi-join on the band key; the
            # state side at 100 TB is a bucketed scan of 8-byte keys
            # least/greatest orientation + self-pair filter keep the
            # output stable under crash-resume re-apply, when the state
            # already contains this batch's own signatures
            cross = (
                state_banded.select(
                    "band", "band_hash", F.col("doc_id").alias("_sid")
                )
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
            # materialize results BEFORE the commit mutates state
            out = verified.localCheckpoint(eager=True)

            # exactly-once append: a crash-resume re-apply of a committed
            # batch recomputes the (deterministic) pairs but never
            # double-writes the signatures
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
                {"appended_docs": None, "kind": "signature-append"},
            )
            return out
        finally:
            delta_sig.unpersist()
