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
    # every registry query — including the ANN trio, the sketches (accuracy
    # contracts), and the deterministic fake video kernel — carries an oracle
    assert set(q) - set(o) == set()


def test_approx_sketches_contract(spark):
    """The accuracy-contract relation: exact aggregates are real and every
    ok-flag holds (HLL within 5%+1, approx quantiles within 5%+1 of the
    interpolated exact)."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.plans.testdata_queries import _t

    rows = {
        r["event_type"]: r
        for r in entrymod.queries()["approx_sketches"](spark, SF_DIR).collect()
    }
    ev = _t(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, ex in exact.items():
        assert rows[et]["exact_users"] == ex["users"]
        assert rows[et]["hll_ok"] is True
        assert rows[et]["q_ok"] is True


def test_sketch_merge_contract(spark):
    """Weekly uniques from merged per-day HLL sketches: exact column equals
    the direct weekly countDistinct, and hll_ok certifies the merged
    estimate lands within tolerance (HLL union property)."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.plans.testdata_queries import _t

    rows = {
        r["week_start"]: r
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
    assert set(rows) == set(exact)
    for wk, ex in exact.items():
        assert rows[wk]["exact_users"] == ex
        assert rows[wk]["hll_ok"] is True


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
