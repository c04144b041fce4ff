"""Dump .explain("formatted") for declared queries to plans/r06/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: e.g. "before" or "after" -> plans/r06/<query>_<suffix>.txt

Engine-running queries (cdc_replay*, d6) execute work at DataFrame-build
time and return a trivial parquet read-back, so their plan files would be
meaningless; they are skipped unless named explicitly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

DEFAULT = [
    "cdc_lww_window",
    "q1_pricing_summary",
    "q2_broadcast_dim_join",
    "q3_multi_join_topk",
    "q4_range_self_join",
    "q9_lag_delta",
    "q13_rle",
    "d1_exact_dedup",
    "d2_minhash_neardup",
    "t2_source_token_stats",
    "e1_knn_bruteforce",
]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("IRS_PLAN_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06",
    )
    os.makedirs(out_dir, exist_ok=True)

    # the bench's exact session config — plans must reflect what the
    # frozen bench.py session would plan, not a differently-tuned session
    from bench import build_spark

    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
