"""Local stand-in for the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("parity")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            got = sdf.toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok    {name}: rows-only ({len(got)} rows)")
            if len(got) == 0 and name not in ("d3_simhash_groups",):
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        if sorted(got.columns) != sorted(exp.columns):
            failures.append((name, f"columns {sorted(got.columns)} != {sorted(exp.columns)}"))
            print(f"FAIL  {name}: column mismatch {sorted(got.columns)} vs {sorted(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append((name, f"rows {len(got)} != {len(exp)}"))
            print(f"FAIL  {name}: row count {len(got)} vs {len(exp)}")
            continue
        g, e = _canon(got), _canon(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"PASS  {name}: {len(got)} rows")
        except AssertionError as err:
            failures.append((name, "value mismatch"))
            diff = (g != e)
            bad_cols = [c for c in g.columns if diff[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                idx = diff[c].idxmax()
                print(f"      e.g. col={c} row={idx}: spark={g.loc[idx, c]!r} duck={e.loc[idx, c]!r}")
    print(f"\n{'ALL PASS' if not failures else f'{len(failures)} FAILURES'}")
    for n, why in failures:
        print(f"  - {n}: {why}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
