#!/usr/bin/env python3
"""Time the DuckDB oracle SQL per query at a scale factor — the BASELINE
engine (DuckDB is literally the reference's engine). Prints one JSON line
shaped like bench.py's for side-by-side comparison."""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_analytics_platform_spark.plans.testdata_queries import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings = {}
    for name, (_fn, sql) in QUERIES.items():
        if sql is None:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "metric": "duckdb_baseline_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
    }))


if __name__ == "__main__":
    main()
