"""Greedy order-dependent per-conversation suppression.

Direct graft of the reference's NMS (``utils.py:270-319``): walk candidates
in priority order, keep one, suppress everything it dominates, repeat —
each decision depends on the *kept* set so far, which is exactly the shape
a window function cannot express (a ``lag``-based gap filter compares each
row to its raw predecessor, not to the last KEPT row — see the test that
pins the difference).

:func:`debounce_turns` keeps, per conversation, the earliest event and then
every next event at least ``min_gap`` seconds after the last kept one.
Spark shape: ``applyInPandas`` per ``conv_id`` (the mandated per-
conversation ordered apply, BASELINE.json:6); inside the group the kernel
mirrors the reference's vectorized-NMS structure — an outer loop over KEPT
events only (O(kept)), with the suppression scan vectorized
(``np.searchsorted`` over the sorted timestamp array, the analog of the
reference's ``np.maximum`` sweep over remaining boxes).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame


def _debounce_kernel(ts_us: np.ndarray, gap_us: int) -> np.ndarray:
    """Indices kept by the greedy gap rule over a SORTED int64 ts array."""
    keep: list[int] = []
    i, n = 0, len(ts_us)
    while i < n:
        keep.append(i)
        # vectorized suppression: jump past everything within the gap
        i = int(np.searchsorted(ts_us, ts_us[i] + gap_us, side="left"))
    return np.asarray(keep, dtype=np.int64)


def debounce_turns(
    df: DataFrame,
    min_gap_s: float,
    key: str = "conv_id",
    ts_col: str = "ts",
    tiebreak: str = "lsn",
) -> DataFrame:
    """Keep per ``key`` the greedy min-gap subsequence of events.

    Events are processed in ``(ts, tiebreak)`` order; an event survives iff
    it is ≥ ``min_gap_s`` after the last SURVIVING event. NULL ``ts``
    events are kept unconditionally and never suppress anything (a gap
    from an unknown time is unknown).
    """
    if min_gap_s <= 0:
        raise ValueError(
            "min_gap_s must be > 0 (a zero gap would make the greedy kernel "
            "a no-op that never advances past the current timestamp)"
        )
    # sub-microsecond gaps truncate to 0 via int(); clamp to 1 µs so
    # searchsorted always advances past the current timestamp
    gap_us = max(1, int(min_gap_s * 1_000_000))
    schema = df.schema

    def _apply(pdf):
        pdf = pdf.sort_values(
            [ts_col, tiebreak], kind="stable", na_position="first"
        ).reset_index(drop=True)
        isnat = pdf[ts_col].isna().to_numpy()
        valid_idx = np.flatnonzero(~isnat)
        arr = (
            pdf.loc[~isnat, ts_col]
            .to_numpy(dtype="datetime64[us]")
            .astype("int64")
        )
        keep = np.concatenate(
            [np.flatnonzero(isnat), valid_idx[_debounce_kernel(arr, gap_us)]]
        )
        return pdf.iloc[np.sort(keep)]

    return df.groupBy(key).applyInPandas(_apply, schema=schema)
