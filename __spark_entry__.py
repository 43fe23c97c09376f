"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY §2 + the
training-data extension surface, as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — the DuckDB-runnable ANSI-SQL twin for each query.

The real implementations live in
``ecommerce_analytics_platform_spark/plans/testdata_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_analytics_platform_spark.plans.testdata_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Daily KPIs over the events table — the reference's headline gold model
    (metrics_daily_kpis): one pass, groupBy-date aggregation with distinct
    counts and conditional rates.
    """
    fn, _ = QUERIES["daily_kpis"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
