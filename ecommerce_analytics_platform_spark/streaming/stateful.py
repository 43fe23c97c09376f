"""Custom stateful streaming operator: per-user running profile via
``applyInPandasWithState``.

The reference has no custom streaming state (its "state" is the processed-
file checkpoint — SURVEY §2.8); this is the extension pattern for operators
Spark's built-in streaming aggregations can't express: arbitrary per-key
state evolved batch-by-batch (running counters, gap-based session counting
across micro-batches, last-seen tracking).

Pattern notes (the part that matters at scale):

- State is per-key and lives in the state store (RocksDB on a real
  cluster); the pandas function sees (key, iterator-of-batches, state).
- Keep state SMALL and fixed-width (here: 4 scalars) — state size, not
  input size, is the streaming memory bound.
- ``GroupStateTimeout.NoTimeout`` here; production gap-sessionization
  would use event-time timeout + watermark to expire idle users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_sessions", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_sessions", LongType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int = 1800,
) -> Iterator[pd.DataFrame]:
    """State update function: fold each micro-batch's rows (sorted by ts)
    into (event count, value sum, gap-session count, last ts)."""
    if state.exists:
        total_events, total_value, n_sessions, last_us = state.get
    else:
        total_events, total_value, n_sessions, last_us = 0, 0.0, 0, None

    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if last_us is None or (us - last_us) > gap_seconds * 1_000_000:
                n_sessions += 1
            last_us = us
            total_events += 1
            total_value += float(value)

    state.update((total_events, total_value, n_sessions, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [total_events],
            "total_value": [round(total_value, 6)],
            "n_sessions": [n_sessions],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
        }
    )


def streaming_user_profiles(events_stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Attach the stateful per-user profile operator to a streaming events
    DataFrame with columns (user_id, ts, value). Emits one updated profile
    row per user per micro-batch (outputMode='update')."""

    def fn(key, pdfs, state):
        return _update_user_profile(key, pdfs, state, gap_seconds)

    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
