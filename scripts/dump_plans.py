#!/usr/bin/env python3
"""Dump .explain("formatted") for every registry query to a directory.

Usage: python3 scripts/dump_plans.py <out_dir> [suffix] [names...]
Writes <out_dir>/<query>_<suffix>.txt (suffix default "before").
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_analytics_platform_spark.plans.testdata_queries import QUERIES
from ecommerce_analytics_platform_spark.session import get_spark


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(QUERIES)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _sql = QUERIES[name]
        buf = io.StringIO()
        try:
            df = fn(spark, sf_dir)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # noqa: BLE001
            buf.write(f"ERROR: {e}\n")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
