"""A/B the DATA-FILE parquet compression codec on the COW apply path.

The shuffle codec was settled by a 16-cycle interleaved A/B (lz4, dead
tie on 8-batch cdc).  The data-file codec has never been tested: every
COW batch parquet-encodes the full touched-partition row set (the
dominant write+merge phase), and Spark's default is snappy.  Candidates
trade encode CPU against bus bytes on a host whose binding resource is
memory bandwidth:

* ``snappy``       -- default; moderate CPU, moderate ratio
* ``lz4``          -- fastest encode of the compressed set
* ``zstd``         -- best ratio (fewest bus bytes), most CPU
* ``uncompressed`` -- zero encode CPU, ~2-3x the bus bytes

Same single-JVM interleaved design as partstats_ab.py: the codec is a
runtime-mutable SQL conf, so all legs share one warm JVM and alternate
A/B/.../A/B to cancel weather drift.  Digests must be identical across
legs (content-addressed, codec-invariant).

Usage: python BENCH/datacodec_ab.py [n_events_per_batch] [n_batches] [reps]
Prints one JSON line per leg; appends to BENCH/datacodec_ab.jsonl.
"""

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODEC_CONF = "spark.sql.parquet.compression.codec"


def _data_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def run_leg(spark, codec: str, n_events: int, n_batches: int, seed: int) -> dict:
    from image_report_spark.benchgen import write_bench_log
    from image_report_spark.config import EngineConfig
    from image_report_spark.engine import CdcEngine

    spark.conf.set(CODEC_CONF, codec)
    scratch = os.path.join("/dev/shm", f"irs-codec-ab-{uuid.uuid4().hex[:8]}")
    try:
        log = os.path.join(scratch, "log")
        write_bench_log(log, n_events * n_batches, n_batches=n_batches, seed=seed)
        tbl = os.path.join(scratch, "tbl")
        eng = CdcEngine.init(
            spark,
            tbl,
            os.path.join(scratch, "cp"),
            config=EngineConfig(num_buckets=128, shuffle_partitions=64),
        )
        t0 = time.monotonic()
        reports = eng.run(log)
        wall = time.monotonic() - t0
        phases: dict[str, int] = {}
        for r in reports:
            for k, v in (r.phase_ms or {}).items():
                phases[k] = phases.get(k, 0) + v
        return {
            "codec": codec,
            "apply_sec": round(wall, 3),
            "events_per_sec": round(n_events * n_batches / wall, 1),
            "bytes_written": _data_bytes(tbl),
            "phase_ms": phases,
            "digest": reports[-1].table_digest,
        }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    codecs = (sys.argv[4].split(",") if len(sys.argv) > 4
              else ["snappy", "lz4", "zstd", "uncompressed"])
    from bench import build_spark

    spark = build_spark(32)
    # JIT warm-up: one throwaway leg so no timed leg pays codegen
    run_leg(spark, "snappy", 50_000, 2, seed=99)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "datacodec_ab.jsonl")
    legs = []
    with open(out_path, "a") as out:
        for _rep in range(reps):
            for codec in codecs:
                leg = run_leg(spark, codec, n_events, n_batches, seed=7)
                legs.append(leg)
                print(json.dumps(leg), flush=True)
                out.write(json.dumps(leg) + "\n")
                out.flush()
        digests = {l["digest"] for l in legs}
        summary = {"digests_equal": len(digests) == 1,
                   "n_events": n_events, "n_batches": n_batches}
        print(json.dumps(summary), flush=True)
        out.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
