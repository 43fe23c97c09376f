"""As-of (temporal nearest-predecessor) join.

Beyond the reference surface (its joins are all equi-joins — SURVEY §2.4);
this is the standard time-series operator Spark lacks natively, built as a
composition of existing DataFrame ops (no UDF, no mapPartitions):

**union + window construction**: tag left/right rows, union them on the
shared key, sort within key by (ts, tag), and carry the last-seen right
payload forward with ``last(..., ignorenulls=True)``. One shuffle on the
key, one sort — the same cost profile as a single sort-merge join, and it
never builds the quadratic (key, ts_l >= ts_r) range-join intermediate a
naive ``l.join(r, cond)`` + window-dedup would.

Scale notes: partitioned by the join key, so skewed keys behave like any
window op (AQE skew handling; salt if one key dominates). Tolerance
filtering happens AFTER matching — row-wise, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: the latest right row with the same ``key`` whose
    ``right_ts`` <= ``left_ts`` (backward as-of, pandas/DuckDB ASOF
    semantics). Right payload columns are appended (null when no match or
    outside ``tolerance_seconds``).

    Ties: a right row AT the left timestamp matches (<=); multiple right
    rows at the same ts → the last under (ts, payload-order) — callers
    needing determinism should ensure unique (key, right_ts).
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*([right_ts] + right_payload)).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*([right_ts] + right_payload)).alias("__r"),
    )
    # right rows sort BEFORE left rows at equal ts (__is_left asc) so a
    # same-instant right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = tagged_l.unionByName(tagged_r).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("__ts").cast("double") - F.col(f"__match.{right_ts}").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        out = out.withColumn("__match", F.when(in_tol, F.col("__match")))
    sel = [F.col(f"__l.{c}").alias(c) for c in lcols] + [
        F.col(f"__match.{c}").alias(f"{c}{suffix}" if c in lcols else c)
        for c in [right_ts] + right_payload
    ]
    return out.select(*sel)
