"""Structured Streaming ingest: availableNow backfill, checkpointed
exactly-once file tracking, watermarked streaming sessions."""

from __future__ import annotations

import pytest

from ecommerce_analytics_platform_spark.fixtures.generator import generate_fixture
from ecommerce_analytics_platform_spark.sources.ndjson import write_ndjson_fixture
from ecommerce_analytics_platform_spark.streaming.ingest import (
    run_backfill,
    streaming_session_order_join,
    streaming_sessions,
)


@pytest.fixture(scope="module")
def stream_lake(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_lake")
    events, orders = generate_fixture(seed=7, n_sessions=30, bad_ts_rate=0.0)
    write_ndjson_fixture(events, str(root / "raw/batch_1.json"))
    write_ndjson_fixture(orders, str(root / "raw_orders/batch_1.json"))
    return root


def test_backfill_then_incremental_file_pickup(spark, stream_lake):
    raw = str(stream_lake / "raw")
    landing = str(stream_lake / "landing")
    ckpt = str(stream_lake / "ckpt")

    assert run_backfill(spark, raw, landing, ckpt, timeout_sec=120)
    n1 = spark.read.parquet(landing).count()
    assert n1 > 0
    assert "ingest_date" in spark.read.parquet(landing).columns

    # re-run with no new files: checkpoint prevents reprocessing
    assert run_backfill(spark, raw, landing, ckpt, timeout_sec=120)
    assert spark.read.parquet(landing).count() == n1

    # drop a new raw file: only IT gets processed
    events2, _ = generate_fixture(seed=8, n_sessions=5, bad_ts_rate=0.0)
    write_ndjson_fixture(events2, str(stream_lake / "raw/batch_2.json"))
    assert run_backfill(spark, raw, landing, ckpt, timeout_sec=120)
    n2 = spark.read.parquet(landing).count()
    assert n2 == n1 + len(events2)


def test_streaming_sessions_with_watermark(spark, stream_lake, tmp_path):
    """Watermarked session agg over the file stream, complete via
    availableNow into an in-memory sink; dedup-within-watermark drops the
    fixture's injected duplicate events."""
    sessions = streaming_sessions(spark, str(stream_lake / "raw"))
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM t_sessions")
    assert out.count() > 0
    # count must equal the batch-path dedup result, not the raw row count
    import pyspark.sql.functions as F

    raw = spark.read.json(str(stream_lake / "raw"))
    distinct_events = raw.filter(F.col("event_time").isNotNull()).select("event_id").distinct().count()
    total_counted = out.agg(F.sum("event_count")).collect()[0][0]
    assert total_counted == distinct_events


def test_streaming_session_window_matches_batch(spark, stream_lake, tmp_path):
    """Native session_window as a STREAMING stateful aggregation (the
    merging-session-state operator), availableNow into a memory sink,
    must equal the identical batch session_window aggregation over the
    same files."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.streaming.ingest import read_clickstream_stream
    from ecommerce_analytics_platform_spark.sources.ndjson import read_clickstream_raw

    raw = str(stream_lake / "raw")

    def sessionized(df):
        typed = df.withColumn("event_ts", F.try_to_timestamp("event_time")).filter(
            F.col("event_ts").isNotNull()
        )
        return (
            typed.withWatermark("event_ts", "1 day")
            .groupBy("user_id", F.session_window("event_ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("start"), "n_events")
        )

    q = (
        sessionized(read_clickstream_stream(spark, raw))
        .writeStream.format("memory")
        .queryName("t_sess_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["start"], r["n_events"])
        for r in spark.sql("SELECT * FROM t_sess_win").collect()
    }
    batch = read_clickstream_raw(spark, raw)
    expected = {
        (r["user_id"], r["start"], r["n_events"])
        for r in sessionized(batch).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_stream_join_matches_batch(spark, stream_lake, tmp_path):
    """Watermarked stream-stream interval join (events ⨝ orders on
    session within 1 hour), availableNow into a memory sink, must equal
    the identical batch join over the same files — and produce matches."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.sources.ndjson import (
        read_clickstream_raw,
        read_orders_raw,
    )

    joined = streaming_session_order_join(
        spark, str(stream_lake / "raw"), str(stream_lake / "raw_orders")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["session_id"], r["event_id"], r["order_id"])
        for r in spark.sql("SELECT * FROM t_ss_join").collect()
    }

    ev = (
        read_clickstream_raw(spark, str(stream_lake / "raw"))
        .withColumn("event_ts", F.try_to_timestamp("event_time"))
        .filter(F.col("event_ts").isNotNull())
    )
    od = read_orders_raw(spark, str(stream_lake / "raw_orders")).filter(
        F.col("order_time").isNotNull()
    )
    expected = {
        (r["session_id"], r["event_id"], r["order_id"])
        for r in ev.join(
            od.select(
                F.col("order_id"),
                F.col("session_id").alias("order_session_id"),
                F.col("order_time"),
            ),
            (F.col("session_id") == F.col("order_session_id"))
            & (F.col("order_time") >= F.col("event_ts"))
            & (F.col("order_time") <= F.col("event_ts") + F.expr("INTERVAL 1 hour")),
            "inner",
        ).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_static_broadcast_enrichment(spark, stream_lake, tmp_path):
    """Stream-static join: the streaming clickstream enriched against a
    broadcast static dimension (device → tier). No watermark needed —
    static side is fixed per micro-batch; the plan must broadcast it."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.sources.ndjson import read_clickstream_raw
    from ecommerce_analytics_platform_spark.sources.schemas import CLICKSTREAM_RAW_SCHEMA

    dim = spark.createDataFrame(
        [("mobile", "m-tier"), ("desktop", "d-tier"), ("tablet", "t-tier")],
        "device string, tier string",
    )
    stream = (
        spark.readStream.schema(CLICKSTREAM_RAW_SCHEMA)
        .json(str(stream_lake / "raw"))
        .join(F.broadcast(dim), "device", "left")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stream_static")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sstat"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["tier"]: r["n"] for r in spark.sql("SELECT * FROM t_stream_static").collect()}

    batch = (
        read_clickstream_raw(spark, str(stream_lake / "raw"))
        .join(F.broadcast(dim), "device", "left")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = {r["tier"]: r["n"] for r in batch.collect()}
    assert got == expected and sum(got.values()) > 0


def test_live_stream_loop_idle_sentinel_resume(spark, tmp_path):
    """The live driver loop (reference stop-file + 15 s idle shutdown):
    ingests present files then idle-stops; a stop sentinel halts the loop;
    removing it resumes from the checkpoint picking up ONLY new files."""
    from ecommerce_analytics_platform_spark.streaming.ingest import run_stream_loop

    raw = tmp_path / "raw"
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    stop = str(tmp_path / "control" / "clickstream.stop")
    (tmp_path / "control").mkdir()

    events1, _ = generate_fixture(seed=21, n_sessions=10, bad_ts_rate=0.0)
    write_ndjson_fixture(events1, str(raw / "batch_1.json"))

    res = run_stream_loop(
        spark, str(raw), landing, ckpt, stop,
        idle_timeout_sec=6, max_runtime_sec=120,
    )
    assert res["stopped_by"] == "idle"
    assert res["n_rows"] == len(events1)
    assert spark.read.parquet(landing).count() == len(events1)

    # sentinel: loop must exit reporting the stop file
    import pathlib

    pathlib.Path(stop).touch()
    events2, _ = generate_fixture(seed=22, n_sessions=4, bad_ts_rate=0.0)
    write_ndjson_fixture(events2, str(raw / "batch_2.json"))
    res2 = run_stream_loop(
        spark, str(raw), landing, ckpt, stop,
        idle_timeout_sec=6, max_runtime_sec=120,
    )
    assert res2["stopped_by"] == "sentinel"

    # resume: checkpoint picks up exactly the not-yet-processed data
    pathlib.Path(stop).unlink()
    res3 = run_stream_loop(
        spark, str(raw), landing, ckpt, stop,
        idle_timeout_sec=6, max_runtime_sec=120,
    )
    assert res3["stopped_by"] == "idle"
    total = spark.read.parquet(landing).count()
    assert total == len(events1) + len(events2)  # exactly-once across stops


def test_stream_stream_left_outer_emits_unmatched(spark, stream_lake, tmp_path):
    """Outer stream-stream join: events with no order within the delay
    window must emit with null order columns once the watermark passes —
    and matched rows must equal the inner join exactly."""
    from pyspark.sql import functions as F

    # a far-future sentinel file on BOTH streams pushes every watermark
    # past all real data, forcing state expiry so unmatched rows flush
    import json as _json
    import os as _os

    late_ev = {
        "event_id": "sentinel-ev", "event_time": "2030-01-01T00:00:00",
        "session_id": "sentinel", "user_id": "u-sentinel", "event_type": "view",
        "page": "/", "schema_version": 1,
    }
    late_od = {
        "order_id": "sentinel-od", "order_time": "2030-01-01T00:00:00",
        "session_id": "sentinel", "user_id": "u-sentinel", "items": [],
    }
    with open(_os.path.join(str(stream_lake / "raw"), "sentinel.json"), "w") as f:
        f.write(_json.dumps(late_ev) + "\n")
    with open(_os.path.join(str(stream_lake / "raw_orders"), "sentinel.json"), "w") as f:
        f.write(_json.dumps(late_od) + "\n")

    joined = streaming_session_order_join(
        spark,
        str(stream_lake / "raw"),
        str(stream_lake / "raw_orders"),
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ss_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sso"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_ss_outer").collect()
    matched = {(r["event_id"], r["order_id"]) for r in rows if r["order_id"] is not None}
    unmatched = {r["event_id"] for r in rows if r["order_id"] is None}
    assert matched, "outer join must still produce the inner matches"
    assert unmatched, "events without an in-window order must flush with nulls"
    # an event either matches (≥1 order rows) or flushes as null — never both
    assert not ({e for e, _o in matched} & unmatched)
    # inner run over the same files equals the matched subset
    inner = streaming_session_order_join(
        spark, str(stream_lake / "raw"), str(stream_lake / "raw_orders")
    )
    q2 = (
        inner.writeStream.format("memory")
        .queryName("t_ss_inner_ref")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssi"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    inner_rows = {
        (r["event_id"], r["order_id"])
        for r in spark.sql("SELECT * FROM t_ss_inner_ref").collect()
    }
    assert matched == inner_rows
