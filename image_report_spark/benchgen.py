"""Vectorized change-log synthesis for benchmarks.

The test-fixture generator (fixtures.py) is row-wise and convenient for
≤50k events; benchmarks need millions, so this module builds the same
shape of stream wholly in numpy (no Python per-row work). Deterministic
(seeded), no wall-clock, no external data — shape-identical to the 10^10
target (FIXTURES.md §4 'bench').
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in µs


def synth_changes(
    n_events: int,
    seed: int = 0,
    turns_per_conv: int = 20,
    update_frac: float = 0.25,
    delete_frac: float = 0.05,
    late_frac: float = 0.05,
    hot_keys: int = 0,
    hot_frac: float = 0.0,
    arrival: str = "shuffled",
) -> pd.DataFrame:
    """A change stream of ~n_events rows in commit order (lsn = position).

    ``arrival="shuffled"`` (default): conversation start times are i.i.d.
    uniform, so insert keys arrive interleaved across the whole id range —
    the adversarial shape for any key-locality optimization.
    ``arrival="sorted"``: start times are sorted by conversation id, so
    inserts arrive in (roughly) key order — the auto-increment-PK /
    snowflake-id / event-time CDC pattern, where each micro-batch carries
    a fresh contiguous key range (exercises the engine's append
    fast-path's zone-map tier). Updates/deletes still target uniformly
    random earlier inserts in both modes.
    """
    rng = np.random.default_rng(seed)
    n_ins = int(n_events * (1 - update_frac - delete_frac))
    n_upd = int(n_events * update_frac)
    n_del = n_events - n_ins - n_upd
    n_convs = max(1, n_ins // turns_per_conv)

    # --- inserts: dense turns per conversation --------------------------
    ins_conv = (np.arange(n_ins) // turns_per_conv) % n_convs
    ins_turn = (np.arange(n_ins) % turns_per_conv).astype(np.int32)
    if hot_keys > 0 and hot_frac > 0:
        n_hot = int(n_ins * hot_frac)
        ins_conv[:n_hot] = rng.integers(0, hot_keys, size=n_hot)
        ins_turn[:n_hot] = rng.integers(0, turns_per_conv * 50, size=n_hot).astype(np.int32)
    conv_start = rng.uniform(0, 3.6e9, size=n_convs)  # µs offsets
    if arrival == "sorted":
        # conv i starts before conv i+1, with start gaps widened so a
        # conversation's own turn span (≤ turns_per_conv × step ≈ 6e8 µs)
        # stays small next to the inter-conversation spacing — each
        # micro-batch then carries a near-contiguous fresh key range,
        # with only a thin boundary overlap between adjacent batches
        conv_start = np.sort(rng.uniform(0, 3.6e9, size=n_convs)) * 1e3
    step = rng.uniform(1e6, 3e7, size=n_convs)
    ins_commit = conv_start[ins_conv] + ins_turn * step[ins_conv]
    ins_ts = ins_commit.copy()

    # --- updates / deletes over random insert targets --------------------
    upd_target = rng.integers(0, n_ins, size=n_upd)
    upd_commit = ins_commit.max() + 1e6 + np.arange(n_upd) * 1e4 + rng.uniform(0, 1e3, n_upd)
    late = rng.random(n_upd) < late_frac
    upd_ts = np.where(late, ins_ts[upd_target] - rng.uniform(1e6, 1e8, n_upd), upd_commit)

    del_target = rng.integers(0, n_ins, size=n_del)
    del_commit = upd_commit.max() + 1e6 + np.arange(n_del) * 1e4 if n_upd else ins_commit.max() + np.arange(n_del) * 1e4
    del_ts = del_commit

    conv = np.concatenate([ins_conv, ins_conv[upd_target], ins_conv[del_target]])
    turn = np.concatenate([ins_turn, ins_turn[upd_target], ins_turn[del_target]])
    commit = np.concatenate([ins_commit, upd_commit, del_commit])
    ts = np.concatenate([ins_ts, upd_ts, del_ts])
    op = np.concatenate(
        [np.full(n_ins, "I"), np.full(n_upd, "U"), np.full(n_del, "D")]
    )

    order = np.argsort(commit, kind="stable")
    conv, turn, ts, op = conv[order], turn[order], ts[order], op[order]
    lsn = np.arange(len(op), dtype=np.int64)

    # vectorized C-level string build (arrow compute): the earlier pandas
    # .map(lambda)/.str.cat/.str.pad chain ran per-row python for ~4 s of
    # the 2 M-event synthesis; byte-identical output is pinned by
    # tests/test_benchgen_content.py
    import pyarrow.compute as pc

    conv_str = pc.binary_join_element_wise(
        "c", pc.utf8_lpad(pc.cast(pa.array(conv), pa.string()), 8, "0"), ""
    )
    # text: deterministic payload ~60 chars, no per-row python
    word_id = (lsn * 2654435761) % 100000
    text = pc.binary_join_element_wise(
        conv_str,
        pc.cast(pa.array(turn), pa.string()),
        pa.array(op),
        pc.utf8_lpad(pc.cast(pa.array(word_id), pa.string()), 40, "x"),
        ":",
    ).to_numpy(zero_copy_only=False)
    conv_str = conv_str.to_numpy(zero_copy_only=False)
    is_del = op == "D"
    text = np.where(is_del, None, text)
    role = np.where(is_del, None, np.where(turn % 2 == 0, "user", "assistant"))

    return pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": conv_str,
            "turn_idx": turn.astype(np.int32),
            "role": role,
            "text": text,
            "tool": pd.Series([None] * len(op), dtype=object),
            "ts": pd.to_datetime(BASE_EPOCH_US + ts.astype(np.int64), unit="us"),
        }
    )


def write_bench_log(
    out_dir: str, n_events: int, n_batches: int = 8, seed: int = 0, **kw
) -> int:
    """Write the synthesized stream as batch parquet files; returns rows."""
    os.makedirs(out_dir, exist_ok=True)
    df = synth_changes(n_events, seed=seed, **kw)
    types = pa.schema(
        [
            ("lsn", pa.int64()), ("op", pa.string()), ("conv_id", pa.string()),
            ("turn_idx", pa.int32()), ("role", pa.string()), ("text", pa.string()),
            ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ]
    )
    splits = np.array_split(np.arange(len(df)), n_batches)
    for b, idx in enumerate(splits):
        part = df.iloc[idx]
        pq.write_table(
            pa.Table.from_pandas(part, schema=types, preserve_index=False),
            os.path.join(out_dir, f"batch-{b:05d}.parquet"),
            # small row groups keep a single batch file splittable across
            # tasks (Spark assigns row groups to byte-range splits)
            row_group_size=32768,
        )
    return len(df)
