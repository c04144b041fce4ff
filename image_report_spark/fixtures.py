"""Deterministic fixtures: transcript change-log generator + pandas oracle.

Implements FIXTURES.md §1-§5. Everything is seeded; no wall-clock, no
external data. The generator emits a binlog/WAL-style change stream over a
multi-turn conversation-transcript table
``(conv_id, turn_idx, role, text, tool, ts)`` with configurable fault
injection (exact-replay duplicates, bounded out-of-order, late updates,
malformed rows, schema evolution, zipf-hot keys).

Semantics contract (shared by oracle and engine, tested for equality):

* events with a duplicate ``lsn`` are exact replays → dropped (first
  occurrence wins; replays are byte-identical by construction);
* per key ``(conv_id, turn_idx)`` the winner is the event with the maximum
  ``(ts, lsn)`` (last-writer-wins on ``ts``, tie → higher ``lsn``);
* the key is live iff the winner's ``op`` ∈ {I, U}; a winning ``D`` is a
  tombstone (kept physically so incremental merge is associative — a late
  insert older than a delete loses even across batch boundaries);
* malformed events (null ``lsn``/``op``, unknown op code) are quarantined,
  never applied (graft of per-item error isolation, reference ir:208-216).

Test-pattern lineage: randomized-vs-naive-oracle (reference
``tests/test_hashing_config.py:11-30``), golden vectors (reference
``tests/test_analysis.py:20-30``), round-trip invariants (reference
``tests/test_rle.py:19-30``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

BASE_EPOCH = pd.Timestamp("2026-01-01T00:00:00Z").tz_localize(None)

ROLES = np.array(["user", "assistant", "tool", "system"])

_WORDS = np.array(
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum".split()
)

#: canonical change-event column order (FIXTURES.md §2)
EVENT_COLUMNS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
KEY_COLUMNS = ["conv_id", "turn_idx"]
PAYLOAD_COLUMNS = ["role", "text", "tool", "ts"]


def _lorem(rng: np.random.Generator) -> str:
    n = int(rng.integers(5, 61))
    return " ".join(rng.choice(_WORDS, size=n))


@dataclass
class ChangeLogGenerator:
    """Seeded generator of a transcript change stream (FIXTURES.md §2/§4)."""

    seed: int = 0
    n_convs: int = 200
    max_turns: int = 20
    update_frac: float = 0.25 / 0.70  # relative to inserts → ~70/25/5 I/U/D mix
    delete_frac: float = 0.05 / 0.70
    n_batches: int = 8
    # fault injection
    dup_frac: float = 0.0       # exact-replay duplicates (same lsn, same bytes)
    ooo_window: int = 0         # bounded out-of-order shuffle window (positions)
    late_frac: float = 0.0      # updates whose ts is older than the current row
    malformed_frac: float = 0.0  # rows with null lsn/op or bad op code
    evolve: bool = False        # batches < k_evo omit `tool`; >= k_new add `meta`
    # skew
    hot_keys: int = 0           # number of zipf-hot conv_ids
    hot_frac: float = 0.0       # fraction of all events routed to hot convs
    lww_tie_frac: float = 0.02  # updates sharing an exact ts with another event

    def __post_init__(self) -> None:
        self._events: pd.DataFrame | None = None

    # ------------------------------------------------------------------
    def events(self) -> pd.DataFrame:
        """The full change log, in emission (arrival) order."""
        if self._events is None:
            self._events = self._generate()
        return self._events

    # ------------------------------------------------------------------
    def _generate(self) -> pd.DataFrame:
        rng = np.random.default_rng(self.seed)
        rows: list[dict] = []

        # --- inserts: each conversation's turns in reading order ----------
        conv_ids = np.array([f"c{i:08d}" for i in range(self.n_convs)])
        turns_per_conv = rng.integers(1, self.max_turns + 1, size=self.n_convs)
        if self.hot_keys > 0 and self.hot_frac > 0:
            # hot conversations get many more turns (zipf-ish head)
            total = int(turns_per_conv.sum())
            hot_total = int(total * self.hot_frac / (1 - self.hot_frac))
            for h in range(self.hot_keys):
                turns_per_conv[h] = max(
                    turns_per_conv[h], hot_total // self.hot_keys
                )

        conv_start = rng.uniform(0, 3600.0, size=self.n_convs)  # seconds
        conv_step = rng.uniform(1.0, 30.0, size=self.n_convs)

        for ci in range(self.n_convs):
            cid = conv_ids[ci]
            for ti in range(int(turns_per_conv[ci])):
                role = (
                    ROLES[ti % 2]
                    if rng.random() > 0.15
                    else ROLES[int(rng.integers(2, 4))]
                )
                tool = f"tool_{int(rng.integers(0, 20)):02d}" if role == "tool" else None
                commit_s = conv_start[ci] + ti * conv_step[ci]
                rows.append(
                    {
                        "op": "I",
                        "conv_id": cid,
                        "turn_idx": ti,
                        "role": role,
                        "text": f"{cid}:{ti}:{role}:" + _lorem(rng),
                        "tool": tool,
                        "commit_s": commit_s,
                        "ts_s": commit_s,
                    }
                )

        inserts = pd.DataFrame(rows)
        max_commit = float(inserts["commit_s"].max())

        # --- updates / deletes over existing keys --------------------------
        n_ins = len(inserts)
        n_upd = int(n_ins * self.update_frac)
        n_del = int(n_ins * self.delete_frac)
        key_pool = inserts[["conv_id", "turn_idx", "role", "ts_s"]]

        upd_rows: list[dict] = []
        picks = rng.integers(0, n_ins, size=n_upd)
        for k, idx in enumerate(picks):
            base = key_pool.iloc[int(idx)]
            commit_s = max_commit + 1.0 + k * 0.5 + float(rng.uniform(0, 0.25))
            late = rng.random() < self.late_frac
            # late updates carry a ts OLDER than the insert's ts → must lose LWW
            ts_s = (
                float(base["ts_s"]) - float(rng.uniform(1.0, 100.0))
                if late
                else commit_s
            )
            role = str(base["role"])
            upd_rows.append(
                {
                    "op": "U",
                    "conv_id": base["conv_id"],
                    "turn_idx": int(base["turn_idx"]),
                    "role": role,
                    "text": f"{base['conv_id']}:{int(base['turn_idx'])}:{role}:rev{k}:"
                    + _lorem(rng),
                    "tool": None,
                    "commit_s": commit_s,
                    "ts_s": ts_s,
                }
            )
        updates = pd.DataFrame(upd_rows) if upd_rows else pd.DataFrame(columns=inserts.columns)

        # exact-ts LWW ties: pairs of updates to the same key with equal ts
        if len(updates) >= 2 and self.lww_tie_frac > 0:
            n_tie = max(1, int(len(updates) * self.lww_tie_frac))
            tie_idx = rng.integers(0, len(updates), size=n_tie)
            for idx in tie_idx:
                src = updates.iloc[int(idx)]
                updates.loc[len(updates)] = {
                    "op": "U",
                    "conv_id": src["conv_id"],
                    "turn_idx": int(src["turn_idx"]),
                    "role": src["role"],
                    "text": f"{src['conv_id']}:{int(src['turn_idx'])}:{src['role']}:tie:"
                    + _lorem(rng),
                    "tool": None,
                    "commit_s": float(src["commit_s"]) + 0.01,
                    "ts_s": float(src["ts_s"]),  # same ts → lsn breaks the tie
                }

        del_rows: list[dict] = []
        picks = rng.integers(0, n_ins, size=n_del)
        for k, idx in enumerate(picks):
            base = key_pool.iloc[int(idx)]
            commit_s = max_commit + 2.0 + k * 0.7 + float(rng.uniform(0, 0.25))
            del_rows.append(
                {
                    "op": "D",
                    "conv_id": base["conv_id"],
                    "turn_idx": int(base["turn_idx"]),
                    "role": None,
                    "text": None,
                    "tool": None,
                    "commit_s": commit_s,
                    "ts_s": commit_s,  # D carries its deletion time (LWW column)
                }
            )
        deletes = pd.DataFrame(del_rows) if del_rows else pd.DataFrame(columns=inserts.columns)

        ev = pd.concat([inserts, updates, deletes], ignore_index=True)
        ev = ev.sort_values("commit_s", kind="stable").reset_index(drop=True)
        ev["lsn"] = np.arange(len(ev), dtype=np.int64)
        ev["ts"] = BASE_EPOCH + pd.to_timedelta(np.round(ev["ts_s"] * 1000).astype("int64"), unit="ms")
        ev = ev.drop(columns=["commit_s", "ts_s"])

        # --- fault injection ------------------------------------------------
        ev["lsn"] = ev["lsn"].astype("Int64")

        if self.dup_frac > 0 and len(ev) > 0:
            n_dup = max(1, int(len(ev) * self.dup_frac))
            dup_idx = rng.integers(0, len(ev), size=n_dup)
            dups = ev.iloc[dup_idx].copy()  # byte-identical replays, same lsn
            ev = pd.concat([ev, dups], ignore_index=True)
            # replays arrive later but near their original (bounded replay lag)
            order = np.arange(len(ev), dtype=np.float64)
            order[len(ev) - n_dup:] = dup_idx + rng.uniform(0.1, 5.0, size=n_dup)
            ev = ev.iloc[np.argsort(order, kind="stable")].reset_index(drop=True)

        if self.ooo_window > 0 and len(ev) > 1:
            pos = np.arange(len(ev), dtype=np.float64)
            pos += rng.uniform(0, self.ooo_window, size=len(ev))
            ev = ev.iloc[np.argsort(pos, kind="stable")].reset_index(drop=True)

        if self.malformed_frac > 0 and len(ev) > 0:
            n_bad = max(1, int(len(ev) * self.malformed_frac))
            bad = []
            for k in range(n_bad):
                kind = int(rng.integers(0, 3))
                bad.append(
                    {
                        "lsn": pd.NA if kind == 0 else int(10_000_000 + k),
                        "op": None if kind == 1 else ("X" if kind == 2 else "I"),
                        "conv_id": f"c{int(rng.integers(0, self.n_convs)):08d}",
                        "turn_idx": 0,
                        "role": "user",
                        "text": "malformed",
                        "tool": None,
                        "ts": BASE_EPOCH,
                    }
                )
            bad_df = pd.DataFrame(bad)
            insert_at = rng.integers(0, len(ev), size=n_bad)
            ev = pd.concat([ev, bad_df], ignore_index=True)
            order = np.arange(len(ev), dtype=np.float64)
            order[len(ev) - n_bad:] = insert_at + 0.5
            ev = ev.iloc[np.argsort(order, kind="stable")].reset_index(drop=True)

        ev["turn_idx"] = ev["turn_idx"].astype("int32")
        return ev[EVENT_COLUMNS]

    # ------------------------------------------------------------------
    def batches(self) -> list[pd.DataFrame]:
        """Split the log into ``n_batches`` contiguous micro-batches.

        With ``evolve=True``: batches in the first third omit the ``tool``
        column entirely (pre-evolution schema) and batches in the last third
        carry an extra nullable ``meta`` column (additive evolution,
        BASELINE.json:6).
        """
        ev = self.events()
        parts = np.array_split(np.arange(len(ev)), self.n_batches)
        out = []
        k_evo = self.n_batches // 3
        k_new = self.n_batches - self.n_batches // 3
        for b, idx in enumerate(parts):
            batch = ev.iloc[idx].reset_index(drop=True)
            if self.evolve:
                if b < k_evo:
                    batch = batch.drop(columns=["tool"])
                elif b >= k_new:
                    batch = batch.copy()
                    batch["meta"] = [
                        f"m{int(v)}" if v % 3 == 0 else None
                        for v in batch["lsn"].fillna(-1).astype("int64")
                    ]
            out.append(batch)
        return out

    # ------------------------------------------------------------------
    def write_log(self, log_dir: str, fmt: str = "parquet") -> list[str]:
        """Write ``log/batch-%05d.{parquet,jsonl}`` files; returns paths."""
        os.makedirs(log_dir, exist_ok=True)
        paths = []
        for b, batch in enumerate(self.batches()):
            if fmt == "parquet":
                path = os.path.join(log_dir, f"batch-{b:05d}.parquet")
                # explicit arrow schema: all-null string columns must not
                # degrade to the null type, and Spark can't read ns timestamps
                import pyarrow as pa
                import pyarrow.parquet as pq

                types = {
                    "lsn": pa.int64(), "op": pa.string(), "conv_id": pa.string(),
                    "turn_idx": pa.int32(), "role": pa.string(), "text": pa.string(),
                    "tool": pa.string(), "ts": pa.timestamp("us"), "meta": pa.string(),
                }
                schema = pa.schema([(c, types[c]) for c in batch.columns])
                pq.write_table(
                    pa.Table.from_pandas(batch, schema=schema, preserve_index=False),
                    path,
                )
            elif fmt == "jsonl":
                path = os.path.join(log_dir, f"batch-{b:05d}.jsonl")
                with open(path, "w") as f:
                    for rec in batch.to_dict(orient="records"):
                        clean = {}
                        for k, v in rec.items():
                            if v is pd.NA or v is None or (isinstance(v, float) and np.isnan(v)):
                                clean[k] = None
                            elif isinstance(v, pd.Timestamp):
                                clean[k] = v.isoformat()
                            elif isinstance(v, (np.integer,)):
                                clean[k] = int(v)
                            else:
                                clean[k] = v
                        f.write(json.dumps(clean) + "\n")
            else:
                raise ValueError(f"unknown fmt {fmt!r}")
            paths.append(path)
        return paths


# ----------------------------------------------------------------------
# the pandas oracle (FIXTURES.md §5) — ~30 lines of obvious code
# ----------------------------------------------------------------------

def oracle_is_malformed(ev: pd.DataFrame) -> pd.Series:
    """Quarantine predicate: null lsn/op or unknown op code."""
    return ev["lsn"].isna() | ~ev["op"].isin(["I", "U", "D"])


def apply_oracle(events: pd.DataFrame, with_tombstones: bool = False) -> pd.DataFrame:
    """Naive sequential applier — the correctness oracle.

    Drop malformed rows; drop duplicate ``lsn``s (first arrival wins);
    apply remaining events in arrival order into a dict keyed by
    ``(conv_id, turn_idx)``, where an event replaces the current entry iff
    its ``(ts, lsn)`` is strictly greater (LWW, lsn tie-break). Deletes are
    retained as tombstones for resolution, then filtered from the output
    unless ``with_tombstones``.
    """
    ev = events[~oracle_is_malformed(events)]
    ev = ev[~ev["lsn"].duplicated(keep="first")]
    state: dict[tuple, dict] = {}
    for rec in ev.to_dict(orient="records"):
        key = (rec["conv_id"], rec["turn_idx"])
        cur = state.get(key)
        if cur is None or (rec["ts"], rec["lsn"]) > (cur["ts"], cur["lsn"]):
            state[key] = rec
    rows = list(state.values())
    all_cols = list(events.columns)
    table = pd.DataFrame(rows, columns=all_cols) if rows else pd.DataFrame(columns=all_cols)
    table = table.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    extra = [c for c in events.columns if c not in EVENT_COLUMNS]
    if with_tombstones:
        # keep op/lsn lineage for ledger computation
        return table[["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn"] + extra]
    table = table[table["op"] != "D"].reset_index(drop=True)
    return table[["conv_id", "turn_idx", "role", "text", "tool", "ts"] + extra]


def oracle_ledger(events: pd.DataFrame) -> dict:
    """Expected conservation-ledger totals over a full log (FIXTURES.md §3)."""
    malformed = oracle_is_malformed(events)
    ev = events[~malformed]
    dup = ev["lsn"].duplicated(keep="first")
    ev = ev[~dup]
    final = apply_oracle(events, with_tombstones=True)
    winners = set(zip(final["conv_id"], final["turn_idx"], final["ts"], final["lsn"]))
    # applied = winning events; superseded = valid, non-dup, non-winning
    applied = 0
    for rec in ev.to_dict(orient="records"):
        if (rec["conv_id"], rec["turn_idx"], rec["ts"], rec["lsn"]) in winners:
            applied += 1
    return {
        "events_read": int(len(events)),
        "quarantined": int(malformed.sum()),
        "deduped": int(dup.sum()),
        "applied": applied,
        "superseded": int(len(ev) - applied),
        "rows_after": int((apply_oracle(events)).shape[0]),
    }
