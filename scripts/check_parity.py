#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Runs every entry in ``__spark_entry__.queries()`` and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, canonicalizes both
results (columns sorted by name, rows sorted, dates/floats normalized) and
reports row-count / schema / value mismatches.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    return str(v)


def canon_df(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from ecommerce_analytics_platform_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:
        queries = {n: f for n, f in queries.items() if n in only}
    failures = []
    for name, fn in queries.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"skip  {name}: no oracle (rows-only check), rows={len(sdf)}")
            continue
        try:
            res = con.sql(sql)
            ocols = list(res.columns)
            orows = res.fetchall()  # fetchall keeps DATE as datetime.date (df() promotes)
            odf = pd.DataFrame(orows, columns=ocols)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        else:
            a, b = canon_df(sdf), canon_df(odf)
            if a != b:
                ndiff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
                problems.append(f"values differ ({ndiff} rows)")
                for x, y in zip(a, b):
                    if x != y:
                        problems.append(f"  spark : {x}")
                        problems.append(f"  oracle: {y}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:4]:
                print(p)
        else:
            print(f"ok    {name} ({len(sdf)} rows)")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries match")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
