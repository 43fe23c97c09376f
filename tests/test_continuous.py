"""Continuous medallion: streaming micro-batches advance bronze + silver
with exactly-once convergence to the batch-computed truth."""

from __future__ import annotations

import pytest

from ecommerce_analytics_platform_spark.fixtures.generator import generate_fixture
from ecommerce_analytics_platform_spark.sources.ndjson import write_ndjson_fixture
from ecommerce_analytics_platform_spark.sources.warehouse import Warehouse
from ecommerce_analytics_platform_spark.streaming.continuous_pipeline import (
    start_continuous_silver,
)


@pytest.mark.slow
def test_continuous_silver_converges_to_batch_truth(spark, tmp_path):
    raw = tmp_path / "raw"
    wh_root = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    events, _ = generate_fixture(seed=11, n_sessions=40, bad_ts_rate=0.05)
    half = len(events) // 2
    write_ndjson_fixture(events[:half], str(raw / "b1.json"))

    q = start_continuous_silver(spark, str(raw), wh_root, ckpt)
    assert q.awaitTermination(180)
    wh = Warehouse(spark, wh_root)
    silver1 = wh.read("staging.stg_clickstream_events")
    n1 = silver1.count()
    assert n1 > 0
    assert silver1.groupBy("event_id").count().filter("count > 1").count() == 0

    # second tranche, including re-deliveries of first-tranche events (the
    # fixture's injected duplicates span the split) — keys must re-merge
    write_ndjson_fixture(events[half:], str(raw / "b2.json"))
    q2 = start_continuous_silver(spark, str(raw), wh_root, ckpt)
    assert q2.awaitTermination(180)

    silver = wh.read("staging.stg_clickstream_events")
    assert silver.groupBy("event_id").count().filter("count > 1").count() == 0
    # converges to the batch truth: distinct parseable event_ids
    raw_df = spark.read.json(str(raw))
    expected = (
        raw_df.filter("event_time IS NOT NULL")
        .selectExpr("event_id", "try_to_timestamp(event_time) AS ts")
        .filter("ts IS NOT NULL")
        .select("event_id")
        .distinct()
        .count()
    )
    assert silver.count() == expected

    # replaying with no new files is a no-op (checkpoint exactly-once)
    q3 = start_continuous_silver(spark, str(raw), wh_root, ckpt)
    assert q3.awaitTermination(180)
    assert wh.read("staging.stg_clickstream_events").count() == expected
