"""Cross-engine portability helpers: the hash family must be bit-identical
to DuckDB's, and date-part numbering must match the reference's DuckDB
semantics (SURVEY §2.3 F5)."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import (
    dow_sunday0,
    epoch_seconds_between,
    is_weekend,
    portable_hash60,
    portable_hash60_sql,
    seeded_hash60,
    seeded_hash60_sql,
)


def test_portable_hash_matches_duckdb(spark):
    samples = ["", "a", "hello world", "日本語テキスト", "x" * 1000, "0", "None"]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", portable_hash60("s").alias("h")).collect()}
    for s in samples:
        expect = duckdb.sql(
            f"SELECT {portable_hash60_sql('?')} AS h", params=[s]
        ).fetchone()[0]
        assert got[s] == expect, s
        assert got[s] >= 0  # 60-bit: always a valid positive BIGINT


def test_seeded_hash_family_matches_duckdb(spark):
    df = spark.createDataFrame([("shingle text",)], ["s"])
    for seed in (0, 1, 13):
        got = df.select(seeded_hash60("s", seed).alias("h")).first()["h"]
        expect = duckdb.sql(
            f"SELECT {seeded_hash60_sql('?', seed)} AS h", params=["shingle text"]
        ).fetchone()[0]
        assert got == expect


def test_dow_sunday0_and_weekend(spark):
    # 2026-08-09 is a Sunday; DuckDB dow: 0=Sun..6=Sat
    days = [(dt.date(2026, 8, 9 + i),) for i in range(7)]
    df = spark.createDataFrame(days, ["d"])
    rows = df.select(
        "d", dow_sunday0("d").alias("dow"), is_weekend("d").alias("we")
    ).orderBy("d").collect()
    assert [r["dow"] for r in rows] == [0, 1, 2, 3, 4, 5, 6]
    assert [r["we"] for r in rows] == [True, False, False, False, False, False, True]
    oracle = duckdb.sql(
        "SELECT extract(dow FROM DATE '2026-08-09'), extract(dow FROM DATE '2026-08-15')"
    ).fetchone()
    assert (rows[0]["dow"], rows[6]["dow"]) == oracle


def test_epoch_seconds_between(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2026, 1, 1, 0, 0, 0), dt.datetime(2026, 1, 1, 1, 30, 15))],
        ["s", "e"],
    )
    assert df.select(epoch_seconds_between("s", "e").alias("x")).first()["x"] == 5415
