"""A/B the partition-stats tiers at bench shape (128 buckets).

Tier 1 (observe-riding conditional aggregates) vs tier 2 (narrow
read-back scan) at the exact bench workload shape: 128 buckets,
250 k-event batches, tmpfs storage.  The observe tier evaluates
4 x touched interpreted aggregate expressions per row inside
CollectMetrics; the scan tier pays a per-batch Spark job.  Which
wins at 128 touched partitions is an empirical question -- this
harness answers it.

Usage: python BENCH/partstats_ab.py [n_events_per_batch] [n_batches]
Prints one JSON line per leg with the per-phase breakdown.
"""

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(spark, limit: int, n_events: int, n_batches: int, seed: int) -> dict:
    from image_report_spark.benchgen import write_bench_log
    from image_report_spark.config import EngineConfig
    from image_report_spark.engine import CdcEngine

    scratch = os.path.join("/dev/shm", f"irs-pstats-ab-{uuid.uuid4().hex[:8]}")
    try:
        log = os.path.join(scratch, "log")
        write_bench_log(log, n_events * n_batches, n_batches=n_batches, seed=seed)
        eng = CdcEngine.init(
            spark,
            os.path.join(scratch, "tbl"),
            os.path.join(scratch, "cp"),
            config=EngineConfig(
                num_buckets=128,
                shuffle_partitions=64,
                partstats_observe_limit=limit,
            ),
        )
        t0 = time.monotonic()
        reports = eng.run(log)
        wall = time.monotonic() - t0
        phases: dict[str, int] = {}
        for r in reports:
            for k, v in (r.phase_ms or {}).items():
                phases[k] = phases.get(k, 0) + v
        return {
            "observe_limit": limit,
            "tier": "observe" if limit >= 128 else "scan",
            "apply_sec": round(wall, 3),
            "events_per_sec": round(n_events * n_batches / wall, 1),
            "phase_ms": phases,
            "digest": reports[-1].table_digest,
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from bench import build_spark

    spark = build_spark(32)
    # JIT warm-up: one throwaway leg so neither timed leg pays codegen
    run_leg(spark, 64, 50_000, 2, seed=99)
    # interleave A/B/A/B to cancel slow weather drift
    legs = []
    for rep in range(reps):
        for limit in (64, 256):
            legs.append(run_leg(spark, limit, n_events, n_batches, seed=7))
            print(json.dumps(legs[-1]), flush=True)
    digests = {l["digest"] for l in legs}
    print(json.dumps({"digests_equal": len(digests) == 1}), flush=True)


if __name__ == "__main__":
    main()
