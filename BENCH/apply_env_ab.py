"""Same-session ABBA of one env knob over the full 8-batch COW apply.

Generic version of rowhash_apply_ab.py: toggles os.environ[NAME]
between legs (the data-file writer reads its knobs from env at each
write), alternating leg order per cycle so host drift hits both arms.
Usage:
  python BENCH/apply_env_ab.py NAME VAL_A VAL_B [--events N] [--cycles C]
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
    ap.add_argument("name")
    ap.add_argument("val_a")
    ap.add_argument("val_b")
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--cycles", type=int, default=3)
    args = ap.parse_args()

    from image_report_spark.benchgen import write_bench_log
    from image_report_spark.config import EngineConfig
    from image_report_spark.engine import CdcEngine

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = f"/dev/shm/irs-envab-{uuid.uuid4().hex[:8]}"
    log_dir = os.path.join(scratch, "log")
    write_bench_log(log_dir, args.events, n_batches=8, seed=0)

    def leg(val: str, tag: str) -> tuple[float, dict, int]:
        os.environ[args.name] = val
        root = os.path.join(scratch, tag)
        eng = CdcEngine.init(
            spark,
            os.path.join(root, "tbl"),
            os.path.join(root, "cp"),
            config=EngineConfig(
                num_buckets=128, shuffle_partitions=max(cpus * 2, 8)
            ),
        )
        spark.sparkContext.setJobDescription(f"env-ab-{tag}")
        t0 = time.monotonic()
        reports = eng.run(log_dir)
        wall = time.monotonic() - t0
        phases: dict[str, int] = {}
        for r in reports:
            for k, v in r.phase_ms.items():
                phases[k] = phases.get(k, 0) + v
        nbytes = 0
        for dp, _, fs in os.walk(os.path.join(root, "tbl", "data")):
            for f in fs:
                nbytes += os.path.getsize(os.path.join(dp, f))
        shutil.rmtree(root, ignore_errors=True)
        return wall, phases, nbytes

    # untimed warm-up of both values
    leg(args.val_a, "warm-a")
    leg(args.val_b, "warm-b")

    results: dict[str, list[float]] = {args.val_a: [], args.val_b: []}
    prev_env = os.environ.get(args.name)
    try:
        for c in range(args.cycles):
            order = (
                [args.val_a, args.val_b] if c % 2 == 0 else [args.val_b, args.val_a]
            )
            for val in order:
                wall, phases, nbytes = leg(val, f"v{val}-{c}".replace("/", "_"))
                results[val].append(round(wall, 2))
                print(
                    f"cycle {c} {args.name}={val}: apply {wall:.2f}s "
                    f"wm {phases.get('write+merge', 0)} bytes {nbytes}",
                    flush=True,
                )
        for val, walls in results.items():
            med = sorted(walls)[len(walls) // 2]
            print(f"{args.name}={val}: med {med:.2f}s  samples {walls}")
    finally:
        if prev_env is None:
            os.environ.pop(args.name, None)
        else:
            os.environ[args.name] = prev_env
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
