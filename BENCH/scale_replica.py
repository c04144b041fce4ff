"""Build a key-shifted K-fold replica of an SF dir for TIMING ONLY.

The driver's sf1.0 exists only in the driver's environment; this tool
approximates it locally by replicating sf0.1 K times with consistent
key shifts (join selectivity preserved) so optimizations can be checked
to HOLD at both sizes (guide §1/§2). Output values differ from any real
sf — never use for oracle parity, never point the graded bench at it.

Per-replica salting keeps workload character honest:
* documents.text: every word gets a replica suffix, so shingle sets are
  disjoint across replicas — otherwise every doc acquires K near-copies
  and the near-dup candidate volume inflates superlinearly vs a true
  larger corpus.
* events.user_id shifts per replica: q4's per-(user, minute) self-join
  bucket SIZES stay constant; bucket COUNT scales, as in a real stream.

Usage: python BENCH/scale_replica.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_COLS = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 600_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 600_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "events": {"event_id": 1_000_000, "user_id": 1_000_000},
}
SMALL = {"region", "nation"}  # dims joined by key: replicate once, unshifted


def _salt_text(text: pa.ChunkedArray, i: int) -> pa.Array:
    # word-level suffix: same word count, shingles disjoint across replicas
    words = pc.split_pattern(
        text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text, " "
    )
    flat = words.values
    salted = pc.binary_join_element_wise(
        flat, pa.array([str(i)] * len(flat), pa.string()), ""
    )
    rebuilt = pa.ListArray.from_arrays(words.offsets, salted)
    return pc.binary_join(rebuilt, " ")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/irs-sfx/sf1r"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        t = pq.read_table(os.path.join(src, f))
        if name in SMALL:
            pq.write_table(t, os.path.join(dst, f), compression="zstd")
            print(f"{name}: {t.num_rows} rows (unreplicated)")
            continue
        shifts = SHIFT_COLS.get(name, {})
        parts = []
        for i in range(k):
            cols = {}
            for col in t.column_names:
                c = t.column(col)
                if col in shifts and i > 0:
                    c = pc.add(c, shifts[col] * i)
                if name == "documents" and col == "text" and i > 0:
                    c = _salt_text(c, i)
                cols[col] = c
            parts.append(pa.table(cols, schema=None))
        out = pa.concat_tables(parts)
        # one file, like the source dirs; row groups keep scan splittable
        pq.write_table(
            out, os.path.join(dst, f), compression="zstd",
            row_group_size=max(out.num_rows // (2 * k), 10_000),
        )
        print(f"{name}: {out.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
