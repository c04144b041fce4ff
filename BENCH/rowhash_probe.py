"""Isolated A/B of the per-row checksum hash definition (guide §1.4).

The merge pipeline computes ``_h = xxhash64(concat_ws(SEP, canonical
string casts))`` per written row.  The canonical form allocates one
cast-string per non-string column plus one ~200-byte concat buffer per
row — candidate GC churn in a merge stage measured at 46-73%% JVM GC
time (BENCH/merge_stage_profile.py, round 6).  This probe times, on the
same synthesized 2M-row transcript batch under the bench session
config, a noop-sink write of:

  base  — the projected rows, no hash column
  canon — rows + the current canonical concat_ws hash
  fast  — rows + a typed xxhash64 over coalesce-sentineled native
          columns (no casts, no concat)

interleaved ABAB so host drift hits both arms. Usage:
  python BENCH/rowhash_probe.py [--rows N] [--reps R]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from image_report_spark.benchgen import write_bench_log
    from image_report_spark.functions.digests import NULL, SEP, canonical_cols

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = f"/dev/shm/irs-rowhash-{uuid.uuid4().hex[:8]}"
    write_bench_log(scratch, args.rows, n_batches=1, seed=7)
    df = spark.read.parquet(os.path.join(scratch, "batch-00000.parquet"))
    # raw bench logs carry timestamp_ntz; the engine's reconciled frames
    # carry tz-aware timestamps (session tz UTC), so mirror that here
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    canon = F.xxhash64(F.concat_ws(SEP, *canonical_cols(df, cols)))

    LONG_MIN = -(1 << 63)
    INT_MIN = -(1 << 31)
    typed = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        col = F.col(c)
        if dt.startswith("timestamp"):
            typed.append(F.coalesce(F.unix_micros(col), F.lit(LONG_MIN)))
        elif dt in ("int", "smallint", "tinyint"):
            typed.append(F.coalesce(col, F.lit(INT_MIN).cast(dt)))
        elif dt == "bigint":
            typed.append(F.coalesce(col, F.lit(LONG_MIN)))
        elif dt == "string":
            typed.append(F.coalesce(col, F.lit(NULL)))
        else:
            typed.append(F.coalesce(col.cast("string"), F.lit(NULL)))
    fast = F.xxhash64(*typed)

    variants = {
        "base": df,
        "canon": df.withColumn("_h", canon),
        "fast": df.withColumn("_h", fast),
    }

    # JIT warm-up of every variant once, untimed
    for v in variants.values():
        v.write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(args.reps):
        for k, v in variants.items():
            spark.sparkContext.setJobDescription(f"rowhash-{k}-rep{r}")
            t0 = time.monotonic()
            v.write.format("noop").mode("overwrite").save()
            times[k].append(round(time.monotonic() - t0, 3))
    for k, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{k}: med {med:.3f}s  samples {ts}")

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
