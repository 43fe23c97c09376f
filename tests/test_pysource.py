"""Spark 4 custom Python DataSource: determinism, partitioning, filter
pushdown, and exactly-once streaming replay."""

from __future__ import annotations

import time

import pytest

from ecommerce_analytics_platform_spark.sources.pysource import (
    ClickstreamBatchReader,
    ClickstreamDataSource,
    _gen_row,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ClickstreamDataSource)
    return spark


def test_batch_deterministic_and_partitioned(registered):
    r1 = registered.read.format("clickstream_gen").option("n_events", 300).load()
    r2 = registered.read.format("clickstream_gen").option("n_events", 300).load()
    assert r1.count() == 300
    assert r1.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))


def test_filter_pushdown_absorbs_event_type(registered):
    from pyspark.sql.datasource import EqualTo, GreaterThan

    reader = ClickstreamBatchReader({"n_events": "100"})
    residual = list(
        reader.pushFilters([EqualTo(("event_type",), "purchase"), GreaterThan(("value",), 50)])
    )
    # equality absorbed; range predicate handed back to Spark
    assert reader.allowed_types == {"purchase"}
    assert len(residual) == 1 and isinstance(residual[0], GreaterThan)


def test_pushed_filter_matches_python_reference(registered):
    df = (
        registered.read.format("clickstream_gen")
        .option("n_events", 500)
        .load()
        .filter("event_type = 'purchase'")
    )
    expect = sum(1 for i in range(500) if _gen_row(42, i)[3] == "purchase")
    assert df.count() == expect


def test_seed_changes_content(registered):
    a = registered.read.format("clickstream_gen").option("n_events", 100).load()
    b = (
        registered.read.format("clickstream_gen")
        .option("n_events", 100)
        .option("seed", 7)
        .load()
    )
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, b.collect()))


def test_stream_exactly_once_across_restart(registered, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(seconds: float):
        q = (
            registered.readStream.format("clickstream_gen")
            .option("rows_per_batch", 25)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 seconds")
            .start()
        )
        time.sleep(seconds)
        q.stop()

    run(6)
    first = registered.read.parquet(out).count()
    run(6)  # resumes from the committed offset — no replayed duplicates
    df = registered.read.parquet(out)
    total = df.count()
    distinct = df.select("event_id").distinct().count()
    assert first > 0
    assert total > first
    assert total == distinct  # exactly-once: no duplicate event ids


def test_arrow_batch_read_equals_row_stream_content(registered, tmp_path):
    """r11: the batch reader emits Arrow RecordBatches while the stream
    reader yields row tuples — both wrap the same pure _gen_row, so the
    first N events must be identical (incl. the timestamp instant, which
    crosses the Arrow boundary as epoch micros)."""
    spark = registered
    batch = (
        spark.read.format("clickstream_gen")
        .option("n_events", 120)
        .option("seed", 7)
        .load()
    )
    got_batch = sorted(map(tuple, batch.collect()))

    q = (
        spark.readStream.format("clickstream_gen")
        .option("rows_per_batch", 120)
        .option("seed", 7)
        .load()
        .writeStream.format("memory")
        .queryName("arrow_twin")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_stream = sorted(
        map(tuple, spark.sql("select * from arrow_twin limit 120").collect())
    )
    assert got_batch == got_stream[: len(got_batch)]
