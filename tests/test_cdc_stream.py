"""Streaming CDC pipeline: micro-batch replay equals one-shot batch apply."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ecommerce_analytics_platform_spark.operators.cdc import apply_changes
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.sources.pysource import ClickstreamDataSource
from ecommerce_analytics_platform_spark.streaming.cdc_pipeline import (
    events_to_changes,
    start_cdc_stream,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ClickstreamDataSource)
    return spark


def _state(df):
    return sorted(
        (r["user_id"], r["event_id"], r["value"]) for r in df.collect()
    )


def test_streaming_cdc_matches_batch_apply(registered, tmp_path):
    target = str(tmp_path / "user_state")
    ckpt = str(tmp_path / "ckpt")
    # feed: 8 micro-batches x 25 rows from the deterministic source
    q = start_cdc_stream(
        registered,
        registered.readStream.format("clickstream_gen")
        .option("rows_per_batch", 25)
        .load(),
        target,
        ckpt,
        available_now=False,
    )
    import time

    time.sleep(8)
    q.stop()
    table = ManifestTable(registered, target)
    streamed = table.read()
    n_applied = streamed.agg(F.max("event_id")).collect()[0][0] + 1

    # one-shot batch apply over the exact same prefix of the log
    log = (
        registered.read.format("clickstream_gen")
        .option("n_events", int(n_applied))
        .load()
    )
    expected = apply_changes(
        None, events_to_changes(log), ["user_id"], ["ts"], tiebreak="event_id"
    )
    assert _state(streamed) == _state(expected)
    # snapshot history is versioned: more than one committed version exists
    assert table.latest_version() >= 1


def test_streaming_cdc_honors_deletes(registered, tmp_path):
    target = str(tmp_path / "user_state")
    ckpt = str(tmp_path / "ckpt")
    q = start_cdc_stream(
        registered,
        registered.readStream.format("clickstream_gen")
        .option("rows_per_batch", 200)
        .load(),
        target,
        ckpt,
        available_now=False,
    )
    import time

    time.sleep(5)
    q.stop()
    table = ManifestTable(registered, target)
    final = table.read()
    n_applied = final.agg(F.max("event_id")).collect()[0][0] + 1
    log = (
        registered.read.format("clickstream_gen")
        .option("n_events", int(n_applied))
        .load()
    )
    changes = events_to_changes(log)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last = changes.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    deleted = {r["user_id"] for r in last.filter("op = 'D'").collect()}
    present = {r["user_id"] for r in final.collect()}
    assert deleted, "fixture should contain users whose last op is a delete"
    assert not (deleted & present)
