"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__ queries() entry on Spark at the given sf dir,
runs the matching oracle_sql() in DuckDB over the same parquet tables, and
compares row count + column names + canonicalized values (rows and columns
sorted, exact match). Prints a per-query verdict and a value diff sample
on mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(list(df.columns), ignore_index=True, kind="mergesort")


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            if not ((av.isna() & bv.isna()) | (av == bv)).all():
                return False
        else:
            if not (av.astype(str).fillna("∅") == bv.astype(str).fillna("∅")).all():
                return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from wikifrontier.session import get_spark

    spark = get_spark(master=os.environ.get("SPARK_MASTER", "local[8]"))
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(spark_pdf)} rows, {t1-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        sa, da = canon(spark_pdf), canon(duck_pdf)
        problems = []
        if len(sa) != len(da):
            problems.append(f"rows {len(sa)} vs {len(da)}")
        if list(sa.columns) != list(da.columns):
            problems.append(f"cols {list(sa.columns)} vs {list(da.columns)}")
        if not problems and not values_equal(sa, da):
            problems.append("values differ")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}  ({t1-t0:.1f}s)")
            failures.append(name)
            if len(sa) and len(da) and list(sa.columns) == list(da.columns):
                merged_diff = sa.compare(da) if len(sa) == len(da) else None
                if merged_diff is not None and len(merged_diff):
                    print(merged_diff.head(5).to_string())
                else:
                    print(" spark head:\n", sa.head(3).to_string())
                    print(" duck head:\n", da.head(3).to_string())
        else:
            print(f"OK   {name}: {len(sa)} rows  ({t1-t0:.1f}s)")
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
