"""Calendar dimension builder.

Reference: dbt_project/models/marts/core/dimensions/dim_date.sql — derives
min/max event dates, then generate_series + unnest into one row per day with
date parts and a weekend flag (SURVEY §2.3 F5/F8).

Spark shape: one-row agg for bounds → ``sequence(min,max,interval 1 day)`` →
``explode``. The 1-row cross join broadcasts; the explode parallelizes the
generated range. DuckDB↔Spark date-part gotchas handled in functions/compat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import dow_sunday0, is_weekend


def date_spine(df: DataFrame, date_col: Column | str) -> DataFrame:
    """One row per calendar day between min and max of ``date_col``."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    bounds = df.agg(
        F.min(c.cast("date")).alias("min_d"), F.max(c.cast("date")).alias("max_d")
    )
    return bounds.select(
        F.explode(F.sequence("min_d", "max_d", F.expr("interval 1 day"))).alias("date")
    )


def build_dim_date(df: DataFrame, date_col: Column | str) -> DataFrame:
    """Full dim_date matching reference dim_date.sql:19-28 columns."""
    spine = date_spine(df, date_col)
    return spine.select(
        F.col("date"),
        F.dayofmonth("date").cast("long").alias("day_of_month"),
        F.weekofyear("date").cast("long").alias("week_of_year"),
        F.month("date").cast("long").alias("month"),
        F.quarter("date").cast("long").alias("quarter"),
        F.year("date").cast("long").alias("year"),
        dow_sunday0("date").cast("long").alias("day_of_week"),
        is_weekend("date").alias("is_weekend"),
    )
