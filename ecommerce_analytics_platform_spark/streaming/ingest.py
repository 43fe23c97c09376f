"""Structured Streaming clickstream ingest: raw NDJSON → typed, enriched,
partitioned parquet landing, with exactly-once file tracking.

The reference implements "streaming" as a micro-batch file-polling loop
with a hand-rolled processed-file checkpoint (reference
ingestion/streaming_ingest.py:18-52,200-232; SURVEY §2.8). All of that is
native Structured Streaming:

| reference                              | here                              |
| poll dir / glob diff vs processed-set  | file source + checkpointLocation  |
| text-file checkpoint (S9)              | file-source commit log            |
| backfill one-pass (lines 180-194)      | trigger(availableNow=True) — the  |
|                                        | exact API the reference's fossil  |
|                                        | helper backfill_progress.py:3-7   |
|                                        | was written for                   |
| stop-file sentinel / idle timeout      | query.stop() / awaitTermination   |
| per-file DuckDB COPY → parquet (S4)    | partitioned parquet sink          |

Late data: the raw fixture has ~15% late events (generator lines 82-83);
the landing layer lands them as-is (their lineage timestamps differ) and
the silver layer's 1-day lookback + delete+insert absorbs them (SURVEY P8)
— same division of labor as the reference. For streaming *aggregations*
use :func:`streaming_sessions` which shows the watermark pattern.

Scale notes: maxFilesPerTrigger bounds micro-batch size; the sink
partitions by ingest_date so downstream prunes; checkpoint dir must be on
shared storage on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ecommerce_analytics_platform_spark.sources.ndjson import enrich_clickstream
from ecommerce_analytics_platform_spark.sources.schemas import (
    CLICKSTREAM_RAW_SCHEMA,
    ORDERS_RAW_SCHEMA,
)


def read_clickstream_stream(
    spark: SparkSession,
    raw_dir: str,
    max_files_per_trigger: int | None = None,
    schema=None,
) -> DataFrame:
    """Streaming schema-enforced NDJSON source (reference S2/S9).

    ``schema`` overrides the declared raw contract — the deployment knob
    for a producer v3 field: extend the declared StructType (additive,
    nullable) and restart the stream; v2 files read NULL for the new
    field at the source, and every downstream warehouse append lands it
    additively (sources/evolution.py)."""
    reader = spark.readStream.schema(schema or CLICKSTREAM_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(raw_dir)


def start_landing_stream(
    spark: SparkSession,
    raw_dir: str,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    source_system: str = "clickstream_producer",
) -> StreamingQuery:
    """raw NDJSON → enrich → parquet landing partitioned by ingest_date.

    ``available_now=True`` = backfill mode: process everything present,
    then stop (reference streaming_ingest.py:180-194 one-pass backfill).
    ``False`` = continuous micro-batches (the polling loop analog).
    """
    stream = read_clickstream_stream(spark, raw_dir)
    enriched = enrich_clickstream(stream, source_system=source_system)
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", landing_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("ingest_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_sessions(
    spark: SparkSession,
    raw_dir: str,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming session rollup with watermarked late-data handling.

    The streaming twin of models.stg_clickstream_sessions: per-session
    min/max/count with ``withWatermark(event_time, 1 day)`` — the watermark
    IS the reference's 1-day sliding lookback (SURVEY P8 ⇒
    ``withWatermark("event_time","1 day")``), enforced by the engine
    instead of a re-processing query. Dedup of re-delivered events uses
    ``dropDuplicatesWithinWatermark`` (streaming alternative to W1).
    Returns an unstarted streaming DataFrame — callers attach a sink.
    """
    stream = read_clickstream_stream(spark, raw_dir)
    typed = stream.withColumn("event_ts", F.try_to_timestamp("event_time")).filter(
        F.col("event_ts").isNotNull()
    )
    deduped = typed.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return deduped.groupBy("session_id", "user_id").agg(
        F.min("event_ts").alias("session_start_ts"),
        F.max("event_ts").alias("session_end_ts"),
        F.count(F.lit(1)).alias("event_count"),
    )


def streaming_session_order_join(
    spark: SparkSession,
    raw_events_dir: str,
    raw_orders_dir: str,
    watermark: str = "1 day",
    max_order_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: purchase events matched to the order
    that followed within ``max_order_delay`` on the same session.

    Both sides carry event-time watermarks plus the interval condition
    ``order_time ∈ [event_ts, event_ts + max_order_delay]``, which is what
    lets the engine BOUND join state: an event can be dropped from state
    once the order-side watermark passes ``event_ts + max_order_delay``,
    and an order once the event-side watermark passes ``order_time``. The
    reference has no streaming join (its funnel attribution runs in batch,
    metrics_daily_funnel.sql:33-36 — J5); this is the streaming twin of
    that attribution with state kept finite by design.

    Scale notes: state is hash-partitioned by ``session_id`` (the join
    key); skewed sessions shard across state-store partitions no worse
    than the batch join, and state size is O(traffic × max_order_delay),
    independent of stream length. Returns an unstarted streaming
    DataFrame.
    """
    ev = (
        read_clickstream_stream(spark, raw_events_dir)
        .withColumn("event_ts", F.try_to_timestamp("event_time"))
        .filter(F.col("event_ts").isNotNull())
        .select("event_id", "event_type", "session_id", "event_ts")
        .withWatermark("event_ts", watermark)
    )
    od = (
        spark.readStream.schema(ORDERS_RAW_SCHEMA)
        .json(raw_orders_dir)
        .filter(F.col("order_time").isNotNull())
        .select(
            F.col("order_id"),
            F.col("session_id").alias("order_session_id"),
            F.col("order_time"),
        )
        .withWatermark("order_time", watermark)
    )
    cond = (
        (F.col("session_id") == F.col("order_session_id"))
        & (F.col("order_time") >= F.col("event_ts"))
        & (F.col("order_time") <= F.col("event_ts") + F.expr(f"INTERVAL {max_order_delay}"))
    )
    # ``how='left_outer'``: events with NO order inside the delay window
    # emit with null order columns — but only once the order-side watermark
    # passes ``event_ts + max_order_delay`` (the engine must be certain no
    # match can still arrive). The interval condition + both watermarks are
    # exactly what Spark REQUIRES for outer stream-stream joins, because
    # they bound how long an unmatched row may wait in state.
    return ev.join(od, cond, how).select(
        "session_id", "event_id", "event_type", "event_ts", "order_id", "order_time"
    )


def run_stream_loop(
    spark: SparkSession,
    raw_dir: str,
    landing_dir: str,
    checkpoint_dir: str,
    stop_file: str,
    idle_timeout_sec: float = 15.0,
    poll_interval_sec: float = 0.25,
    max_runtime_sec: float | None = None,
    trigger_interval: str = "500 milliseconds",
    source_system: str = "clickstream_producer",
) -> dict:
    """Live continuous ingest with the reference's driver-loop controls
    (reference ingestion/streaming_ingest.py:16-17,198-228): a stop-file
    sentinel checked every poll, and an idle shutdown after
    ``idle_timeout_sec`` without new data (reference NO_NEW_FILES_TIMEOUT=15,
    CHECK_INTERVAL=1).

    The loop itself is driver-side babysitting of a continuous Structured
    Streaming query — the data path stays the checkpointed file source +
    partitioned parquet sink of :func:`start_landing_stream`, so
    exactly-once tracking, resume, and late-file pickup come from the
    checkpoint, not from the loop. Activity is observed through the
    query's progress events (batchId + numInputRows), never by listing
    the raw directory (at 100 TB a driver-side glob per second is its own
    outage).

    Returns ``{"stopped_by": "sentinel"|"idle"|"timeout", "n_rows": int,
    "n_batches": int}``. Re-invoking resumes from the checkpoint
    (processed files are never re-ingested — reference S9 semantics).
    """
    import os
    import time

    stream = read_clickstream_stream(spark, raw_dir)
    enriched = enrich_clickstream(stream, source_system=source_system)
    q = (
        enriched.writeStream.format("parquet")
        .option("path", landing_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("ingest_date")
        .outputMode("append")
        .trigger(processingTime=trigger_interval)
        .start()
    )
    t0 = time.monotonic()
    last_activity = time.monotonic()
    counted: set[int] = set()
    n_rows = 0
    stopped_by = "timeout"
    try:
        while True:
            if q.exception() is not None:
                raise q.exception()
            if os.path.exists(stop_file):
                stopped_by = "sentinel"
                break
            fresh_rows = 0
            for p in q.recentProgress:
                bid = p["batchId"]
                if bid not in counted:
                    counted.add(bid)
                    fresh_rows += int(p["numInputRows"])
            if fresh_rows:
                n_rows += fresh_rows
                last_activity = time.monotonic()
            elif time.monotonic() - last_activity > idle_timeout_sec:
                stopped_by = "idle"
                break
            if max_runtime_sec is not None and time.monotonic() - t0 > max_runtime_sec:
                stopped_by = "timeout"
                break
            time.sleep(poll_interval_sec)
    finally:
        q.stop()
    # drain progress emitted between the last poll and stop()
    for p in q.recentProgress:
        bid = p["batchId"]
        if bid not in counted:
            counted.add(bid)
            n_rows += int(p["numInputRows"])
    return {"stopped_by": stopped_by, "n_rows": n_rows, "n_batches": len(counted)}


def run_backfill(
    spark: SparkSession,
    raw_dir: str,
    landing_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> bool:
    """One-shot backfill: start availableNow, await termination.

    Idempotent across invocations — the checkpoint's file-source log
    remembers processed files (reference S9's processed-set semantics),
    so re-running only picks up new raw files.
    """
    q = start_landing_stream(spark, raw_dir, landing_dir, checkpoint_dir, available_now=True)
    return q.awaitTermination(timeout_sec)
