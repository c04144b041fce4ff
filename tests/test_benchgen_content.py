"""benchgen content pin.

The driver's frozen bench compares apply seconds across rounds on "the
same synthesized workload", so the generator's OUTPUT BYTES are part of
the measurement contract: a faster generator that drifted the stream
would silently change what cdc_apply measures. These hashes were
captured from the original pandas string-build implementation; the
arrow-vectorized rewrite must (and does) reproduce them exactly.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from image_report_spark.benchgen import synth_changes

PINS = [
    (0, 200_000, {}, "af766de7e3585fcb"),
    (7, 100_000, {"arrival": "sorted"}, "3cccd42672f91254"),
    (3, 50_000, {"hot_keys": 5, "hot_frac": 0.3}, "ca0dbbb9372434f7"),
]


def _digest(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()[:16]


def test_synth_changes_content_pinned():
    for seed, n, kw, expect in PINS:
        df = synth_changes(n, seed=seed, **kw)
        assert _digest(df) == expect, (seed, n, kw)
