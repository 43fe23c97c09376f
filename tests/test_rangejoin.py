"""Time-bucketed range join semantics + compaction of the landing layer."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.rangejoin import range_join_buckets


def test_range_join_matches_naive(spark):
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [(u, t0 + dt.timedelta(hours=h), f"e{u}{h}") for u in (1, 2) for h in range(0, 96, 7)],
        ["k", "ts", "eid"],
    )
    right = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(hours=10), t0 + dt.timedelta(hours=30), "r1"),
            (1, t0 + dt.timedelta(hours=50), t0 + dt.timedelta(hours=60), "r2"),
            (2, t0, t0 + dt.timedelta(hours=5), "r3"),
        ],
        ["k", "lo", "hi", "rid"],
    )
    bucketed = range_join_buckets(left, right, "k", "ts", "lo", "hi", bucket_seconds=3600 * 12)
    got = {(r["eid"], r["rid"]) for r in bucketed.collect()}
    naive = left.join(
        right, (left.k == right.k) & (left.ts >= right.lo) & (left.ts <= right.hi)
    )
    expect = {(r["eid"], r["rid"]) for r in naive.collect()}
    assert got == expect and len(expect) > 0


def test_range_join_left_keeps_unmatched(spark):
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame([(1, t0, "a"), (9, t0, "b")], ["k", "ts", "eid"])
    right = spark.createDataFrame([(1, t0, t0 + dt.timedelta(hours=1), "r")], ["k", "lo", "hi", "rid"])
    out = range_join_buckets(left, right, "k", "ts", "lo", "hi", how="left")
    got = {r["eid"]: r["rid"] for r in out.collect()}
    assert got == {"a": "r", "b": None}


def test_compact_landing(spark, tmp_path):
    """S8: many small files per partition → exactly one file per partition,
    identical row content."""
    from ecommerce_analytics_platform_spark.sources.ndjson import compact_landing

    path = str(tmp_path / "landing")
    for batch in range(4):  # 4 appends × N partition files
        df = spark.createDataFrame(
            [(batch * 10 + i, f"2026-01-0{1 + i % 2}") for i in range(10)],
            ["val", "ingest_date"],
        )
        df.write.partitionBy("ingest_date").mode("append").parquet(path)
    before = spark.read.parquet(path)
    before_rows = {tuple(r) for r in before.collect()}
    files_before = glob.glob(f"{path}/ingest_date=*/*.parquet")
    assert len(files_before) > 2  # genuinely fragmented

    n = compact_landing(spark, path)
    assert n == 2
    files_after = glob.glob(f"{path}/ingest_date=*/*.parquet")
    assert len(files_after) == 2  # one file per date partition
    after_rows = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after_rows == before_rows
