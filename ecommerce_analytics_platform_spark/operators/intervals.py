"""Interval coalescing (gaps-and-islands): merge overlapping/touching
[start, end) intervals per key into maximal islands.

The workhorse behind session stitching, availability/coverage windows,
on-call/maintenance-window union, and span-level text dedup ranges. The
reference's sessionization (SURVEY §2.8f) is the gap-based special case
(point events + fixed gap); this operator handles true intervals whose
ends vary per row.

Algorithm: one window pass per key — an interval starts a new island iff
its start exceeds the running max end of everything before it; the island
id is the running count of such starts; one groupBy collapses each island.
Exactly one shuffle on the key (window and groupBy share the same
partitioning, so Catalyst reuses one Exchange). No self-joins — the naive
interval-overlap self-join is quadratic per key and was never needed.

At 100 TB: islands are computed per key independently, so the operator
scales with the key cardinality like any windowed op; a single
mega-key's intervals land in one task — the usual salting caveat applies
to pathological single-key inputs (see operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    touch_merges: bool = True,
) -> DataFrame:
    """Coalesce per-key intervals into islands.

    ``touch_merges=True`` merges abutting intervals (next.start == prev.end)
    — half-open [start, end) semantics; ``False`` keeps them separate
    (closed-interval semantics). Output: ``(key..., island_start,
    island_end, n_intervals)``.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.asc(start_col), F.asc(end_col))
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    starts_new = (
        F.col(start_col) > prev_max_end if touch_merges else F.col(start_col) >= prev_max_end
    )
    flag = F.when(prev_max_end.isNull() | starts_new, F.lit(1)).otherwise(F.lit(0))
    islands = df.withColumn("__new", flag).withColumn(
        "__island", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(*key_cols, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__island")
    )
