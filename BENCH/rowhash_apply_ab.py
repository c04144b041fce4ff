"""Same-session ABAB of rowhash_mode over the full 8-batch COW apply.

One JVM, one synthesized log, alternating typed/canonical applies into
fresh tables — pairs share the host window, so the hypervisor's burst
throttle hits both arms (the cross-process A/B showed +/-50% drift
between invocations on this boot). Usage:
  python BENCH/rowhash_apply_ab.py [--events N] [--cycles C]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--cycles", type=int, default=3)
    args = ap.parse_args()

    from image_report_spark.benchgen import write_bench_log
    from image_report_spark.config import EngineConfig
    from image_report_spark.engine import CdcEngine

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = f"/dev/shm/irs-rhab-{uuid.uuid4().hex[:8]}"
    log_dir = os.path.join(scratch, "log")
    write_bench_log(log_dir, args.events, n_batches=8, seed=0)

    def leg(mode: str, tag: str) -> tuple[float, dict]:
        root = os.path.join(scratch, tag)
        eng = CdcEngine.init(
            spark,
            os.path.join(root, "tbl"),
            os.path.join(root, "cp"),
            config=EngineConfig(
                num_buckets=128,
                shuffle_partitions=max(cpus * 2, 8),
                rowhash_mode=mode,
            ),
        )
        spark.sparkContext.setJobDescription(f"rowhash-ab-{tag}")
        t0 = time.monotonic()
        reports = eng.run(log_dir)
        wall = time.monotonic() - t0
        phases: dict[str, int] = {}
        for r in reports:
            for k, v in r.phase_ms.items():
                phases[k] = phases.get(k, 0) + v
        shutil.rmtree(root, ignore_errors=True)
        return wall, phases

    # untimed warm-up (JIT both code paths)
    leg("typed", "warm-t")
    leg("canonical", "warm-c")

    results: dict[str, list[float]] = {"typed": [], "canonical": []}
    try:
        for c in range(args.cycles):
            order = (
                ["typed", "canonical"] if c % 2 == 0 else ["canonical", "typed"]
            )
            for mode in order:
                wall, phases = leg(mode, f"{mode}-{c}")
                results[mode].append(round(wall, 2))
                print(
                    f"cycle {c} {mode}: apply {wall:.2f}s "
                    f"wm {phases.get('write+merge', 0)} ps {phases.get('partstats', 0)}",
                    flush=True,
                )
        for mode, walls in results.items():
            med = sorted(walls)[len(walls) // 2]
            print(f"{mode}: med {med:.2f}s  samples {walls}")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
