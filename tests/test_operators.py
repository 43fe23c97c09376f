"""Sessionization and calendar operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.calendar import build_dim_date, date_spine
from ecommerce_analytics_platform_spark.operators.sessionize import (
    rollup_sessions,
    sessionize_by_gap,
)


def test_sessionize_by_gap(spark):
    t = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("u1", t, 1),
        ("u1", t + dt.timedelta(minutes=10), 2),   # same session (<=30m)
        ("u1", t + dt.timedelta(minutes=50), 3),   # gap 40m -> new session
        ("u1", t + dt.timedelta(minutes=55), 4),
        ("u2", t, 5),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = sessionize_by_gap(df, "user_id", "ts", 1800, order_tiebreak="event_id")
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_rollup_sessions(spark):
    t = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("s1", "u1", t),
        ("s1", "u1", t + dt.timedelta(seconds=90)),
        ("s2", "u2", t),
    ]
    df = spark.createDataFrame(rows, ["session_id", "user_id", "event_ts"])
    out = {r["session_id"]: r for r in rollup_sessions(df).collect()}
    assert out["s1"]["events_in_session"] == 2
    assert out["s1"]["session_duration_seconds"] == 90
    assert out["s2"]["session_duration_seconds"] == 0


def test_date_spine_and_dim_date(spark):
    rows = [(dt.date(2026, 8, 7),), (dt.date(2026, 8, 12),)]
    df = spark.createDataFrame(rows, ["d"])
    spine = date_spine(df, "d").collect()
    assert len(spine) == 6  # inclusive bounds
    dim = {r["date"]: r for r in build_dim_date(df, F.col("d")).collect()}
    sat = dim[dt.date(2026, 8, 8)]
    sun = dim[dt.date(2026, 8, 9)]
    mon = dim[dt.date(2026, 8, 10)]
    assert (sat["day_of_week"], sat["is_weekend"]) == (6, True)
    assert (sun["day_of_week"], sun["is_weekend"]) == (0, True)
    assert (mon["day_of_week"], mon["is_weekend"]) == (1, False)
    assert mon["year"] == 2026 and mon["month"] == 8 and mon["quarter"] == 3
