"""Hardware-ceiling probe: how does THIS host scale a trivially parallel
Spark job from local[8] to local[32]?

Three workloads per parallelism level, each in its own JVM/subprocess:
  * cpu  — compute-dense, memory-light: sum(xxhash64(id)) over a range
    (whole-stage codegen, no shuffle rows, ~no allocation) — an upper
    bound on what ANY engine could achieve on this box;
  * shuffle — memory-heavy: the same range materialized as ~80-byte
    strings, repartitioned by key, then aggregated — the memory-bus/
    page-cache shape of a CDC merge;
  * write — the apply path's dominant shape: the same ~80-byte-string
    rows shuffled by key then WRITTEN as snappy parquet to tmpfs. Its
    N→4N efficiency is the hardware ceiling for any engine whose wall
    is parquet-write-bound on this host; apply efficiency divided by
    THIS number is the engine's own (cluster-transferable) scaling.

A single-threaded numpy control runs before each leg to measure host
throttle drift within the window. Usage: python BENCH/ceiling_probe.py
[--rows N] [--pair 8 32] [--kinds cpu shuffle write]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG = r"""
import sys, time
cpus, rows, kind = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 2))
         .config("spark.local.dir", "/dev/shm/irs-probe-local")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# warm-up (JIT) — identical small job
spark.range(0, 10_000_000, 1, cpus).select(F.sum(F.xxhash64("id") % F.lit(1_000_000_000))).collect()
t0 = time.monotonic()
if kind == "cpu":
    # 4x rows: hashing a range is ~80x faster per row than the string
    # workloads, and sub-2s legs drown in per-job scheduling overhead
    spark.range(0, rows * 4, 1, cpus * 4).select(F.sum(F.xxhash64("id") % F.lit(1_000_000_000))).collect()
elif kind == "shuffle":
    df = spark.range(0, rows // 20, 1, cpus * 4).select(
        (F.col("id") % 1_000_000).alias("k"),
        F.concat(F.lit("c"), F.col("id").cast("string"),
                 F.lpad(F.col("id").cast("string"), 60, "x")).alias("v"))
    df.repartition(cpus * 2, "k").groupBy("k").agg(
        F.max("v"), F.count(F.lit(1))).select(F.sum("count(1)")).collect()
else:  # write: shuffle-by-key then parquet to tmpfs (the COW apply shape)
    import shutil, uuid
    dest = f"/dev/shm/irs-probe-write-{uuid.uuid4().hex[:8]}"
    df = spark.range(0, rows // 20, 1, cpus * 4).select(
        (F.col("id") % 1_000_000).alias("k"),
        F.concat(F.lit("c"), F.col("id").cast("string"),
                 F.lpad(F.col("id").cast("string"), 60, "x")).alias("v"))
    try:
        df.repartition(cpus * 2, "k").write.mode("overwrite").parquet(dest)
    finally:
        shutil.rmtree(dest, ignore_errors=True)
print(time.monotonic() - t0)
spark.stop()
"""


def control() -> float:
    a = np.random.default_rng(0).standard_normal(2_000_000)
    t0 = time.monotonic()
    for _ in range(20):
        a = np.sort(a)[::-1].copy()
    return time.monotonic() - t0


def leg(cpus: int, rows: int, kind: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", LEG, str(cpus), str(rows), kind],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-1500:])
    return float(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000_000,
                    help="row count for the cpu kind; shuffle/write use "
                         "rows//20 materialized ~80-byte rows")
    ap.add_argument("--pair", type=int, nargs=2, default=(8, 32))
    ap.add_argument("--kinds", nargs="+", default=["cpu", "shuffle"],
                    choices=["cpu", "shuffle", "write"])
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat the whole kind x cpus grid; one JSON "
                         "line per rep (interleaving cancels weather drift)")
    args = ap.parse_args()
    lo, hi = args.pair
    for rep in range(args.reps):
        res = {"rep": rep, "controls": [], "legs": {}}
        for kind in args.kinds:
            for cpus in (lo, hi):
                res["controls"].append(round(control(), 2))
                res["legs"][f"{kind}@{cpus}"] = round(leg(cpus, args.rows, kind), 2)
        for kind in args.kinds:
            tlo, thi = res["legs"][f"{kind}@{lo}"], res["legs"][f"{kind}@{hi}"]
            res[f"eff_{kind}"] = round((tlo / thi) / (hi / lo), 3)
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
