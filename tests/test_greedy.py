"""Greedy per-conversation suppression (graft of reference NMS,
utils.py:270-319): the applyInPandas path earns its keep — the semantics
are genuinely sequential (each kept event suppresses the following ones),
which no window function expresses. Oracle = a naive per-row Python loop
(graft of the impl-vs-naive test pattern, tests/test_hashing_config.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from image_report_spark.operators.greedy import debounce_turns

T0 = dt.datetime(2026, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(c, i, T0 + dt.timedelta(seconds=s) if s is not None else None)
         for c, i, s in rows],
        "conv_id string, lsn long, ts timestamp",
    )


def _naive_debounce(rows, gap_s):
    """Per-row reference loop: keep iff >= gap since the last KEPT."""
    out = []
    last = None
    for lsn, s in sorted(rows, key=lambda r: (r[1], r[0])):
        if last is None or s - last >= gap_s:
            out.append(lsn)
            last = s
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_debounce_matches_naive_oracle(spark, seed):
    rng = np.random.default_rng(seed)
    rows = []
    expected = {}
    for c in range(8):
        conv = f"c{c}"
        secs = sorted(rng.integers(0, 300, size=40).tolist())
        conv_rows = [(int(1000 * c + i), int(s)) for i, s in enumerate(secs)]
        rows += [(conv, lsn, s) for lsn, s in conv_rows]
        expected[conv] = _naive_debounce(conv_rows, 10)
    got = debounce_turns(_mk(spark, rows), min_gap_s=10).collect()
    got_by_conv = {}
    for r in got:
        got_by_conv.setdefault(r.conv_id, []).append(r.lsn)
    for conv, lsns in expected.items():
        assert sorted(got_by_conv[conv]) == sorted(lsns), conv


def test_debounce_is_not_window_expressible(spark):
    """ts = [0, 6, 12], gap 10: greedy keeps {0, 12} (12 is ≥10 after the
    last KEPT event 0), but a lag-based gap filter keeps only {0} (12 is
    just 6 after its raw predecessor) — the kept-set dependence is real."""
    df = _mk(spark, [("c", 1, 0), ("c", 2, 6), ("c", 3, 12)])
    greedy = sorted(r.lsn for r in debounce_turns(df, min_gap_s=10).collect())
    assert greedy == [1, 3]

    w = Window.partitionBy("conv_id").orderBy("ts", "lsn")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    lag_based = sorted(
        r.lsn
        for r in df.withColumn("g", gap)
        .filter(F.col("g").isNull() | (F.col("g") >= 10_000_000))
        .collect()
    )
    assert lag_based == [1]  # provably different semantics
    assert greedy != lag_based


def test_debounce_null_ts_kept_and_inert(spark):
    df = _mk(spark, [("c", 1, None), ("c", 2, 0), ("c", 3, 5), ("c", 4, 11)])
    got = sorted(r.lsn for r in debounce_turns(df, min_gap_s=10).collect())
    # NULL kept; 0 kept; 5 suppressed by 0; 11 kept (>= 10 after 0)
    assert got == [1, 2, 4]


def test_debounce_rejects_nonpositive_gap(spark):
    """ADVICE r2: gap 0 made searchsorted never advance — the kernel hung an
    executor task forever. Non-positive gaps are rejected eagerly; tiny
    positive gaps (sub-µs, truncated to 0 by int()) clamp to 1 µs."""
    import pytest as _pytest

    df = _mk(spark, [("c", 1, 0), ("c", 2, 0), ("c", 3, 5)])
    with _pytest.raises(ValueError, match="min_gap_s"):
        debounce_turns(df, min_gap_s=0)
    with _pytest.raises(ValueError, match="min_gap_s"):
        debounce_turns(df, min_gap_s=-1)
    # 1e-7 s truncates to 0 µs — clamped to 1 µs, terminates, and the
    # same-timestamp duplicate is suppressed
    got = sorted(r.lsn for r in debounce_turns(df, min_gap_s=1e-7).collect())
    assert got == [1, 3]
