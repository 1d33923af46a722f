"""Emulate the driver's correctness gate: run every __spark_entry__
queries()[name] on Spark and oracle_sql()[name] on DuckDB at the given
sf dir; compare row count, column names, and order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows {len(got)} != {len(want)}")
        return problems
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            ok = [
                (math.isnan(a) and math.isnan(b)) or abs(float(a) - float(b)) <= 1e-9
                for a, b in zip(gv.astype(float), wv.astype(float))
            ]
            if not all(ok):
                bad = [i for i, o in enumerate(ok) if not o][:3]
                problems.append(f"col {c} float mismatch rows {bad}: {[(gv[i], wv[i]) for i in bad]}")
        else:
            if not (gv.astype(str).values == wv.astype(str).values).all():
                bad = [i for i in range(len(gv)) if str(gv[i]) != str(wv[i])][:3]
                problems.append(f"col {c} mismatch rows {bad}: {[(gv[i], wv[i]) for i in bad]}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    import __spark_entry__ as e
    from semantic_search_engine_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "16g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        if name not in os_:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            want = con.execute(os_[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {str(ex)[:300]}")
            failures += 1
            continue
        problems = compare(got, want)
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            failures += 1
        else:
            print(f"OK    {name}: {len(got)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
