"""Exact merge placement (operators/shards.py).

Pins (1) the python murmur3 preimages against Spark's own hash()/pmod —
the contract the proxy column relies on; (2) that an apply with exact
shards produces the identical table (digest, rows, ledger) as the
legacy AQE-sized repartition, i.e. the change is placement-only."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from image_report_spark.config import EngineConfig
from image_report_spark.engine import CdcEngine
from image_report_spark.fixtures import ChangeLogGenerator
from image_report_spark.operators.shards import murmur3_int, shard_expr_sql, shard_proxies


def test_proxies_match_spark_hash(spark):
    for n in (2, 8, 32, 128):
        vals = shard_proxies(n)
        assert len(set(vals)) == n
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i int, v int"
        )
        assert df.filter(F.expr(f"pmod(hash(v), {n}) != i")).count() == 0


def test_murmur3_signed_range():
    # fmix output must be a SIGNED int32, exactly like Spark's Murmur3Hash
    seen = {murmur3_int(v) for v in range(1000)}
    assert all(-(1 << 31) <= h < (1 << 31) for h in seen)


def test_exact_placement(spark):
    n = 16
    df = spark.range(64).selectExpr("cast(id as int) as _p").selectExpr(
        "_p", f"{shard_expr_sql('_p', n)} as _shard"
    )
    rows = (
        df.repartition(n, F.col("_shard"))
        .selectExpr("_p", "spark_partition_id() as pid")
        .collect()
    )
    assert all(r._p % n == r.pid for r in rows)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_shard_apply_equals_legacy(spark, tmp_path, mode):
    gen = ChangeLogGenerator(
        seed=11, n_convs=150, max_turns=8, n_batches=3, dup_frac=0.05,
        ooo_window=6, late_frac=0.1, malformed_frac=0.02,
    )
    log = str(tmp_path / "log")
    gen.write_log(log)

    def run(shards: bool, tag: str):
        eng = CdcEngine.init(
            spark,
            str(tmp_path / f"t-{tag}"),
            str(tmp_path / f"c-{tag}"),
            config=EngineConfig(
                num_buckets=8, shuffle_partitions=8, write_mode=mode,
                merge_exact_shards=shards,
            ),
        )
        reports = eng.run(log)
        return eng, reports

    e1, r1 = run(True, f"{mode}-on")
    e2, r2 = run(False, f"{mode}-off")
    assert r1[-1].table_digest == r2[-1].table_digest
    for a, b in zip(r1, r2):
        assert a.ledger({"*"}) == b.ledger({"*"})
    d1 = e1.read().orderBy("conv_id", "turn_idx").collect()
    d2 = e2.read().orderBy("conv_id", "turn_idx").collect()
    assert d1 == d2
