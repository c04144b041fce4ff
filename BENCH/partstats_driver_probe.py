"""Micro A/B of the driver-side partition-stats read-back (guide §1.4).

Builds one bench-shaped table (2 M events, 128 buckets), then times the
current footer-statistics implementation of ``_driver_partition_stats``
(reads only ``_h``; conv_id/_lsn/row-count from file metadata) against an
inline copy of the previous 3-column data-read implementation, ABAB on
the same files, equality-checked. Usage:
  python BENCH/partstats_driver_probe.py [--events N] [--reps R]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def _old_driver_partition_stats(root, files):
    """The pre-footer-stats implementation (3 columns read per file)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from image_report_spark.engine import PART_COL

    def one(item):
        p, rels = item
        n = live = 0
        mx = None
        x = 0
        lo = hi = None
        for rel in rels:
            t = pq.read_table(
                os.path.join(root, rel), columns=["conv_id", "_lsn", "_h"]
            )
            n += t.num_rows
            m = pc.max(t.column("_lsn")).as_py()
            if m is not None:
                mx = m if mx is None else max(mx, m)
            hv = t.column("_h").drop_null().to_numpy(zero_copy_only=False)
            live += len(hv)
            if len(hv):
                x ^= int(np.bitwise_xor.reduce(hv.astype(np.int64).view(np.uint64)))
            mm = pc.min_max(t.column("conv_id")).as_py()
            if mm["min"] is not None:
                lo = mm["min"] if lo is None else min(lo, mm["min"])
                hi = mm["max"] if hi is None else max(hi, mm["max"])
        return {
            PART_COL: p,
            "row_count": n,
            "live_rows": int(live),
            "last_applied_lsn": mx,
            "checksum": format(x & 0xFFFFFFFFFFFFFFFF, "016X"),
            "key_lo": lo,
            "key_hi": hi,
        }

    with ThreadPoolExecutor(max_workers=min(16, max(len(files), 1))) as ex:
        return list(ex.map(one, list(files.items())))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from image_report_spark.benchgen import write_bench_log
    from image_report_spark.config import EngineConfig
    from image_report_spark.engine import CdcEngine, _driver_partition_stats

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = f"/dev/shm/irs-psprobe-{uuid.uuid4().hex[:8]}"
    log_dir = os.path.join(scratch, "log")
    write_bench_log(log_dir, args.events, n_batches=1, seed=0)
    eng = CdcEngine.init(
        spark,
        os.path.join(scratch, "tbl"),
        os.path.join(scratch, "cp"),
        config=EngineConfig(num_buckets=128, shuffle_partitions=max(cpus * 2, 8)),
    )
    eng.run(log_dir)
    snap = eng.table.snapshot()
    files = {e["partition"]: e["files"] for e in snap["manifest"] if e["files"]}
    root = eng.table.root
    nbytes = sum(
        os.path.getsize(os.path.join(root, f)) for fl in files.values() for f in fl
    )
    print(f"# table: {len(files)} partitions, {nbytes/1e6:.1f} MB")

    key = lambda r: int(r["_p"])
    a = sorted(_driver_partition_stats(root, files), key=key)
    b = sorted(_old_driver_partition_stats(root, files), key=key)
    assert [dict(r) for r in a] == [dict(r) for r in b], "tier mismatch"
    print("# equality: footer-stats == 3-column read")

    times = {"footer": [], "3col": []}
    for r in range(args.reps):
        for name, fn in (
            ("footer", _driver_partition_stats),
            ("3col", _old_driver_partition_stats),
        ):
            t0 = time.monotonic()
            fn(root, files)
            times[name].append(round(time.monotonic() - t0, 3))
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: med {med:.3f}s  samples {ts}")

    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
