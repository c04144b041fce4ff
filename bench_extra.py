"""Extra measurement harness (guide §1.4): per-query noop-sink isolation.

NOT the driver's bench — bench.py stays frozen. This file times each
headline query with the noop sink (forces every column of every row,
no output write) under the same session config as bench.py, and prints
one JSON line per run with per-query seconds.

Usage: python bench_extra.py [--repeat N] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, build_spark  # session config identical to bench.py


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--count", action="store_true",
                    help="time df.count() like bench.py instead of the noop sink")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names = args.queries or [q for q in HEADLINE]

    out: dict[str, list[float]] = {}
    for rep in range(args.repeat):
        for name in names:
            fn = queries[name]
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = round(time.monotonic() - t0, 3)
            out.setdefault(name, []).append(dt)
            print(f"# rep{rep} {name}: {dt:.2f}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "sf_dir": sf_dir,
        "mode": "count" if args.count else "noop",
        "queries": {k: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
                    for k, v in out.items()},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
