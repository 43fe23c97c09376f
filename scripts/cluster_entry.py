#!/usr/bin/env python3
"""spark-submit driver program: run any registry query (or the flagship
pipeline smoke) against a parquet dataset directory.

Cluster:
    spark-submit --master yarn --deploy-mode cluster \
      --properties-file conf/spark-scale.conf \
      --py-files dist/ecommerce_analytics_platform_spark.zip \
      scripts/cluster_entry.py --sf-dir hdfs:///data/sf1000 --query pricing_summary

Local smoke (same file, no submit):
    python scripts/cluster_entry.py --sf-dir /root/testdata/sf0.001 --query daily_kpis
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True, help="dataset dir with the parquet tables")
    ap.add_argument("--query", default="pricing_summary", help="registry query name")
    ap.add_argument("--output", default=None, help="optional parquet output path")
    ap.add_argument(
        "--local", action="store_true",
        help="build a local[*] session instead of inheriting the submit conf",
    )
    args = ap.parse_args()

    from ecommerce_analytics_platform_spark.plans.testdata_queries import QUERIES
    from ecommerce_analytics_platform_spark.session import get_spark

    spark = get_spark("cluster_entry", cluster=not args.local)
    fn, _sql = QUERIES[args.query]
    df = fn(spark, args.sf_dir)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"{args.query}: wrote {args.output}")
    else:
        n = df.count()
        print(f"{args.query}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
