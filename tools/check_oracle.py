"""Local twin of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle SQL on DuckDB at a given sf dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
        # unify ints/floats across engines
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
        if df[c].dtype == object and len(df) and isinstance(
            df[c].iloc[0], (list, tuple)
        ) or str(df[c].dtype) == "object" and len(df) and hasattr(
            df[c].iloc[0], "__len__"
        ) and not isinstance(df[c].iloc[0], str):
            df[c] = df[c].map(lambda v: tuple(round(float(x), 9) for x in v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from tsclust_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    # queued driver gates (window at capacity) check the same way
    qs = {**qs, **e.queued_queries()}
    oracles = {**oracles, **e.queued_oracle_sql()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (no oracle; rows-only check)")
            continue
        try:
            want = normalize(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
            )
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:500]}")
            failures += 1
            continue
        print(f"PASS {name}: rows={len(got)}")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
