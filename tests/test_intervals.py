"""Interval coalescing: overlap, touch, nesting, single-Exchange plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecommerce_analytics_platform_spark.operators.intervals import merge_intervals


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, s int, e int")


def _islands(df):
    return sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_intervals"]) for r in df.collect()
    )


def test_overlap_touch_and_gap(spark):
    df = _df(spark, [("a", 0, 10), ("a", 5, 12), ("a", 12, 20), ("a", 25, 30)])
    out = _islands(merge_intervals(df, ["k"], "s", "e"))
    # [0,10)+[5,12) overlap; [12,20) touches (half-open merge); [25,30) gaps
    assert out == [("a", 0, 20, 3), ("a", 25, 30, 1)]


def test_touch_not_merged_when_closed_semantics(spark):
    df = _df(spark, [("a", 0, 10), ("a", 10, 20)])
    out = _islands(merge_intervals(df, ["k"], "s", "e", touch_merges=False))
    assert out == [("a", 0, 10, 1), ("a", 10, 20, 1)]


def test_nested_interval_absorbed(spark):
    df = _df(spark, [("a", 0, 100), ("a", 10, 20), ("a", 150, 160)])
    out = _islands(merge_intervals(df, ["k"], "s", "e"))
    assert out == [("a", 0, 100, 2), ("a", 150, 160, 1)]


def test_keys_independent(spark):
    df = _df(spark, [("a", 0, 10), ("b", 5, 15)])
    out = _islands(merge_intervals(df, ["k"], "s", "e"))
    assert out == [("a", 0, 10, 1), ("b", 5, 15, 1)]


def test_single_exchange_plan(spark):
    df = _df(spark, [("a", 0, 10), ("a", 5, 12)])
    plan = merge_intervals(df, ["k"], "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # window + groupBy share one shuffle
