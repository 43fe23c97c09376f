"""Streaming CDC: a change feed applied per micro-batch onto a
manifest-committed snapshot table — the streaming twin of
``operators/cdc.py`` and the composition a real warehouse runs for
continuously-maintained dimensions.

Per micro-batch (``foreachBatch``):

1. Map the feed to (key, op, seq..., payload) rows.
2. ``apply_changes`` replays the batch onto the current snapshot
   (last-writer-wins within the batch; deletes honored).
3. ``ManifestTable.overwrite`` publishes the new snapshot ATOMICALLY —
   readers pinned to the previous manifest version never see a half
   state, and a crash mid-write leaves the previous version live
   (same guarantees ``tests/test_manifest.py`` pins).

Correctness under replay: if the stream restarts and re-delivers a
micro-batch (foreachBatch is at-least-once), re-applying it converges —
``apply_changes`` is idempotent for a batch whose per-key winners are
unchanged, and the CDC associativity (proved cross-engine by the
``cdc_apply`` registry query) makes sequential batch application equal to
one-shot application of the whole log as long as each key's changes
arrive seq-ordered across batches.

Scale: the snapshot here is a dimension (bounded by live keys), so the
per-batch rewrite is the standard dimension-upsert cost; for fact-sized
targets use ``continuous_pipeline``'s partition-pruned delete+insert
instead (rewrite bounded by touched partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ecommerce_analytics_platform_spark.operators.cdc import apply_changes
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable


def events_to_changes(df: DataFrame) -> DataFrame:
    """The clickstream-as-change-feed mapping used throughout the repo:
    signup ⇒ INSERT, error ⇒ DELETE, else UPDATE, keyed on user."""
    return df.select(
        "user_id",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts",
        "event_id",
        "value",
    )


def start_cdc_stream(
    spark: SparkSession,
    changes_stream: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    keys: list[str] = ("user_id",),
    seq_cols: list[str] = ("ts",),
    tiebreak: str = "event_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a manifest-committed snapshot from a streaming change feed."""
    table = ManifestTable(spark, target_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        changes = events_to_changes(batch_df)
        snapshot = table.read() if table.latest_version() is not None else None
        # snapshot must be materialized BEFORE overwrite starts replacing
        # the files it reads — the manifest read pins a version, but local
        # eager persist keeps the plan from re-scanning mid-write
        if snapshot is not None:
            snapshot = snapshot.localCheckpoint()
        new_state = apply_changes(
            snapshot, changes, list(keys), list(seq_cols), tiebreak=tiebreak
        )
        table.overwrite(new_state)

    writer = (
        changes_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
