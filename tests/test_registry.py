"""Driver-contract smoke: every registry query runs at sf0.001, returns a
stable schema and >= 0 rows; oracle SQL exists and its key set aligns."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERY_NAMES = sorted(entrymod.queries())


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # rows-only remainder: the fake video kernel (no uncompressed video
    # format to parse) and engine-specific sketch internals (error bounds
    # asserted below). Everything else — including the ANN trio and the
    # real image/audio codecs — now carries an oracle.
    assert set(q) - set(o) == {"video_frames", "approx_sketches", "sketch_merge"}


def test_approx_sketches_error_bounds(spark):
    """HLL distinct within 5% of exact; approx median within the value
    range percentile neighborhood of the exact median."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.plans.testdata_queries import _t

    approx = {
        r["event_type"]: r
        for r in entrymod.queries()["approx_sketches"](spark, SF_DIR).collect()
    }
    ev = _t(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap["approx_users"] - ex["users"]) <= max(0.05 * ex["users"], 2)
        assert abs(ap["value_quantiles"][0] - ex["p50"]) <= 0.1 * max(abs(ex["p50"]), 1.0)


def test_sketch_merge_accuracy(spark):
    """Weekly uniques from merged per-day HLL sketches within 5% of the
    exact weekly countDistinct — validates the merge is lossless relative
    to sketching the week directly (HLL union property)."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.plans.testdata_queries import _t

    approx = {
        r["week_start"]: r["approx_users"]
        for r in entrymod.queries()["sketch_merge"](spark, SF_DIR).collect()
    }
    ev = _t(spark, SF_DIR, "events")
    exact = {
        r["week_start"]: r["users"]
        for r in ev.groupBy(
            F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("week_start")
        )
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for wk, ex in exact.items():
        assert abs(approx[wk] - ex) <= max(0.05 * ex, 2)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
