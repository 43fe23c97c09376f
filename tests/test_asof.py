"""As-of join operator semantics."""

from __future__ import annotations

import datetime as dt

from ecommerce_analytics_platform_spark.operators.asof import asof_join


def test_asof_backward_semantics(spark):
    t = lambda m: dt.datetime(2026, 1, 1, 12, m, 0)  # noqa: E731
    left = spark.createDataFrame(
        [("k1", t(0), "l0"), ("k1", t(10), "l1"), ("k1", t(30), "l2"), ("k2", t(5), "l3")],
        ["k", "lts", "lval"],
    )
    right = spark.createDataFrame(
        [("k1", t(10), 100.0), ("k1", t(20), 200.0), ("k3", t(0), 999.0)],
        ["k", "rts", "amount"],
    )
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_payload=["amount"])
    got = {r["lval"]: (r["rts"], r["amount"]) for r in out.collect()}
    assert got["l0"] == (None, None)          # nothing at or before 12:00
    assert got["l1"] == (t(10), 100.0)        # same-instant match (<=)
    assert got["l2"] == (t(20), 200.0)        # latest preceding
    assert got["l3"] == (None, None)          # key has no right rows


def test_asof_tolerance(spark):
    t = lambda m: dt.datetime(2026, 1, 1, 12, m, 0)  # noqa: E731
    left = spark.createDataFrame([("k1", t(30), "x")], ["k", "lts", "lval"])
    right = spark.createDataFrame([("k1", t(0), 1.0)], ["k", "rts", "amount"])
    wide = asof_join(left, right, "k", "lts", "rts", ["amount"], tolerance_seconds=3600)
    assert wide.collect()[0]["amount"] == 1.0
    tight = asof_join(left, right, "k", "lts", "rts", ["amount"], tolerance_seconds=60)
    assert tight.collect()[0]["amount"] is None
