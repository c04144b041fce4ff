"""Same-window r01-vs-HEAD cdc head-to-head.

The r01 cdc-parity item (open since round 2) compares today's engine
against a NUMBER recorded in round 1's weather (62.7 k ev/s on the
2 M x 8 workload). This harness removes the weather: the round-1 tree
(a git worktree pinned at the r01 commit) and HEAD run the IDENTICAL
seeded workload (benchgen.py is byte-identical between the two trees,
verified before each campaign) back-to-back inside one rest window,
leg order alternating per pair so the burst-credit drain the first leg
causes lands on each side equally often. Per-pair ratios are
weather-cancelled; the published artifact is every pair plus the
median ratio.

Usage: python BENCH/r01_headtohead.py [--pairs N] [--rest-secs S]
       [--events N] [--batches B] [--r01 DIR]
Appends one JSON line per pair to BENCH/r01_headtohead.jsonl.
"""

from __future__ import annotations

import argparse
import filecmp
import json
import os
import statistics
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def control_secs() -> float:
    a = np.random.default_rng(0).standard_normal(2_000_000)
    t0 = time.monotonic()
    for _ in range(15):
        a = np.sort(a)[::-1].copy()
    return time.monotonic() - t0


def leg(tree: str, events: int, batches: int, skip_mor: bool) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.setdefault("SPARK_GRAFT_TMP", "/dev/shm/irs-bench")
    env.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/irs-spark-local")
    cmd = [sys.executable, "bench.py", "--cdc-only",
           "--events", str(events), "--batches", str(batches)]
    if skip_mor:
        cmd.append("--skip-mor")
    out = subprocess.run(cmd, cwd=tree, env=env, capture_output=True,
                         text=True, timeout=1800)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            cdc = json.loads(line).get("cdc", {})
            return {
                "events_per_sec": cdc.get("events_per_sec"),
                "apply_sec": cdc.get("apply_sec"),
                "single_batch_eps": (cdc.get("single_batch") or {}).get(
                    "events_per_sec"
                ),
                "phase_ms": cdc.get("phase_ms"),
            }
    print(f"leg failed in {tree}: rc={out.returncode} "
          f"{out.stderr[-1200:]}", file=sys.stderr)
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--rest-secs", type=float, default=480.0)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--r01", default="/dev/shm/r01-worktree")
    args = ap.parse_args()

    assert filecmp.cmp(
        os.path.join(REPO, "image_report_spark", "benchgen.py"),
        os.path.join(args.r01, "image_report_spark", "benchgen.py"),
        shallow=False,
    ), "benchgen diverged — legs would not run the same workload"

    log_path = os.path.join(REPO, "BENCH", "r01_headtohead.jsonl")
    ratios = []
    for i in range(args.pairs):
        print(f"# pair {i}: resting {args.rest_secs:.0f}s", flush=True)
        time.sleep(args.rest_secs)
        ctl = statistics.median(control_secs() for _ in range(3))
        order = ["r01", "head"] if i % 2 == 0 else ["head", "r01"]
        res: dict = {}
        for name in order:
            tree = args.r01 if name == "r01" else REPO
            res[name] = leg(tree, args.events, args.batches,
                            skip_mor=(name == "head"))
        rec = {
            "pair": i,
            "wall_clock": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "control_sec_pre": round(ctl, 3),
            "order": order,
            "r01": res.get("r01"),
            "head": res.get("head"),
        }
        if res.get("r01") and res.get("head"):
            rec["head_over_r01"] = round(
                res["head"]["events_per_sec"] / res["r01"]["events_per_sec"], 4
            )
            ratios.append(rec["head_over_r01"])
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    if ratios:
        print(json.dumps({"pairs": len(ratios),
                          "median_head_over_r01": round(
                              statistics.median(ratios), 4)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
