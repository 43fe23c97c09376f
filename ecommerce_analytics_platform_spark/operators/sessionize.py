"""Sessionization operators.

The reference does NOT gap-sessionize — session_id comes from its generator
and silver just min/max-aggregates per id (reference
dbt_project/models/staging/stg_clickstream_sessions.sql:22-31; SURVEY §2.8).
:func:`rollup_sessions` reproduces that. :func:`sessionize_by_gap` is the
natural extension (SURVEY §2.8 names it a candidate): derive sessions from
inactivity gaps — the standard clickstream op the reference's generator
performs upstream.

Scale notes: both are one shuffle on the entity key. Gap sessionization uses
a window (shuffle + sort by ts within user); user keys are ~uniform so no
salting needed; AQE skew-join handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import epoch_seconds_between


def rollup_sessions(
    df: DataFrame,
    session_col: str = "session_id",
    user_col: str = "user_id",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Per-session rollup matching reference stg_clickstream_sessions.sql:22-38:
    min/max timestamp, event count, duration seconds."""
    agg = df.groupBy(session_col, user_col).agg(
        F.min(ts_col).alias("session_start_ts"),
        F.max(ts_col).alias("session_end_ts"),
        F.count(F.lit(1)).alias("events_in_session"),
    )
    return agg.withColumn(
        "session_duration_seconds",
        epoch_seconds_between("session_start_ts", "session_end_ts"),
    )


def sessionize_by_gap(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session numbers: a new session starts when the gap
    since the user's previous event exceeds ``gap_seconds``.

    Classic lag + cumulative-sum construction (two window functions over ONE
    shuffle on user_col — Catalyst reuses the exchange since both windows
    share partitioning). Adds ``session_seq`` (1-based per user).

    ``order_tiebreak``: extra ordering column for deterministic results when
    timestamps tie.
    """
    order_cols = [F.col(ts_col)]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("double") - prev_ts.cast("double")) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn("__new_session", is_new).withColumn(
        "session_seq", F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new_session")
