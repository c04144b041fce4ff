"""Stage-level profile of the 8-batch COW apply (guide §1/§7.1).

Same session config as bench.py but with the UI enabled; after the
apply, pulls per-stage task metrics from the REST API and prints the
top stages by executor run time with task-count / max-vs-median skew —
the empirical view the guide asks for before touching the merge shape.

Usage: python BENCH/merge_stage_profile.py [--events N] [--batches N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    # bench.py disables the UI; re-enabling needs a fresh context, so
    # rebuild the session with the single overridden key
    if spark.conf.get("spark.ui.enabled", "false") != "true":
        conf = dict(spark.sparkContext.getConf().getAll())
        spark.stop()
        from pyspark.sql import SparkSession

        b = SparkSession.builder
        for k, v in conf.items():
            if k != "spark.ui.enabled":
                b = b.config(k, v)
        spark = b.config("spark.ui.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from image_report_spark.benchgen import write_bench_log
    from image_report_spark.config import EngineConfig
    from image_report_spark.engine import CdcEngine

    scratch = f"/dev/shm/irs-prof-{uuid.uuid4().hex[:8]}"
    log_dir = os.path.join(scratch, "log")
    write_bench_log(log_dir, args.events, n_batches=args.batches, seed=0)
    eng = CdcEngine.init(
        spark,
        os.path.join(scratch, "table"),
        os.path.join(scratch, "checkpoint"),
        config=EngineConfig(num_buckets=128, shuffle_partitions=max(cpus * 2, 8)),
    )
    t0 = time.monotonic()
    eng.run(log_dir)
    wall = time.monotonic() - t0

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete")
    )
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"# apply wall {wall:.1f}s — top stages by executorRunTime")
    tot = sum(s.get("executorRunTime", 0) for s in stages)
    for s in stages[:18]:
        sid = s["stageId"]
        det = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages/{sid}/0/taskSummary"
                "?quantiles=0.0,0.5,1.0"
            )
        )
        dur = det.get("executorRunTime", [0, 0, 0])
        med = {
            k: round(det[k][1])
            for k in (
                "executorDeserializeTime",
                "jvmGcTime",
                "executorCpuTime",
                "resultSerializationTime",
                "schedulerDelay",
                "peakExecutionMemory",
            )
            if k in det
        }
        srm = det.get("shuffleReadMetrics", {})
        med["fetchWaitMs"] = round(srm.get("fetchWaitTime", [0, 0, 0])[1])
        swm = det.get("shuffleWriteMetrics", {})
        med["shufWriteMs"] = round(swm.get("writeTime", [0, 0, 0])[1] / 1e6)
        if "executorCpuTime" in med:
            med["executorCpuTime"] = round(med["executorCpuTime"] / 1e6)
        print(
            json.dumps(
                {
                    "stage": sid,
                    "name": s["name"].split("\n")[0][:60],
                    "tasks": s["numCompleteTasks"],
                    "runTime_s": round(s["executorRunTime"] / 1000, 2),
                    "task_ms_min_med_max": [round(x) for x in dur],
                    "med": med,
                    "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "output_mb": round(s.get("outputBytes", 0) / 1e6, 1),
                }
            )
        )
    print(f"# total executorRunTime {tot/1000:.1f}s across {len(stages)} stages")
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
