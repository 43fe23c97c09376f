"""SCD Type 2 (slowly-changing dimension) history build + incremental merge.

The reference's dims are all Type 1 (full rebuild, latest value wins —
e.g. dim_users at dbt_project/models/marts/core/dimensions/dim_users.sql),
and its gaps-and-islands shape appears only implicitly in session handling.
A warehouse at 100 TB needs the Type 2 variant: keep every attribute state
an entity ever had, with validity ranges, and merge new change batches
WITHOUT rebuilding the whole dimension.

Shapes chosen for scale:

- ``scd2_history``: one shuffle on the key; the dedup window, the
  change-detect lag, and the valid_to lead all share the same
  (key, ts) sort order, so Catalyst evaluates them in one Window stage
  over one Exchange.
- ``scd2_merge``: work is proportional to the CHANGED keys, not the
  dimension size — unaffected keys stream through an anti join untouched,
  affected keys replay (reconstructed change log ∪ new batch). At 100 TB,
  pair with a partition-pruned writer (operators/incremental.py /
  sources/manifest.py) so the passthrough never rewrites storage.

Contract for merge == full-rebuild equivalence: each batch's timestamps
for a key must be >= that key's previously merged timestamps (the standard
SCD feed contract — changes arrive in order per key). Consecutive-
duplicate collapse makes the reconstructed log lossy for *interior* late
data; late batches need a retained raw log replay instead (documented, and
exactly what the registry query's time-split construction satisfies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dedup_log(
    df: DataFrame, key_col: str, ts_col: str, tiebreak_col: str | None
) -> DataFrame:
    """Collapse same-(key, ts) rows to one deterministic winner (highest
    tiebreak). With no tiebreak the input must already be (key, ts)-unique."""
    if tiebreak_col is None:
        return df
    w = Window.partitionBy(key_col, ts_col).orderBy(F.col(tiebreak_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Change log → Type 2 history.

    Returns one row per (key, attribute-state run):
    ``(key, *attrs, valid_from, valid_to, version, is_current)`` where
    ``valid_to`` is null on the current run and ``version`` numbers runs
    per key from 1. Consecutive rows with identical attrs collapse into
    one run (null-safe comparison per attribute).

    ONE shuffle: the same-(key, ts) dedup runs inside the key-partitioned
    window (sorted by (ts, tiebreak DESC), keep the first row of each ts
    block) instead of a (key, ts)-partitioned window, so dedup, change
    detection and the valid_to lead all share a single Exchange — the
    (ts)-ordered windows are satisfied by the (ts, tiebreak) sort prefix
    (pinned in tests/test_plans.py). ``ts_col`` must be non-null.
    """
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    winner = prev_ts.isNull() | (prev_ts != F.col(ts_col))
    keep = [key_col, ts_col, *attr_cols]
    extra = [tiebreak_col] if tiebreak_col is not None else []
    log = (
        df.select(*keep, *extra)
        .withColumn("__win", winner)
        .filter(F.col("__win"))
        .select(*keep)
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col)
    # explicit first-row marker: lag-based detection alone would drop a
    # key whose first attrs are all null (lag null eqNullSafe null -> true)
    changed = F.row_number().over(w2) == 1
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w2))
    runs = log.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    return runs.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Merge a change batch into an existing Type 2 dimension.

    ``dim`` is a prior ``scd2_history`` output; ``changes`` is a raw change
    log (``key, ts, *attrs``). Only keys present in ``changes`` are
    recomputed: their run-start log is reconstructed from the dimension
    itself (``valid_from`` is the run's change timestamp), unioned with the
    new batch (new batch wins same-timestamp collisions), and replayed
    through :func:`scd2_history`. All other keys pass through untouched —
    the merge's shuffle volume is bounded by the changed keys.

    Equals a full rebuild whenever each key's new timestamps are >= its
    already-merged ones (see module docstring for the late-data caveat).
    """
    out_cols = [key_col, *attr_cols, "valid_from", "valid_to", "version", "is_current"]
    keys = changes.select(key_col).distinct()
    untouched = dim.join(keys, key_col, "left_anti").select(*out_cols)
    old_log = (
        dim.join(keys, key_col, "left_semi")
        .select(key_col, F.col("valid_from").alias(ts_col), *attr_cols)
        .withColumn("__src", F.lit(0))
    )
    new_log = _dedup_log(changes, key_col, ts_col, tiebreak_col).select(
        key_col, ts_col, *attr_cols
    ).withColumn("__src", F.lit(1))
    # same-(key, ts) collision between a dim run-start and a new change:
    # the new change wins (__src is the replay tiebreak), resolved inside
    # scd2_history's single-shuffle dedup window
    replay = old_log.unionByName(new_log)
    rebuilt = scd2_history(replay, key_col, attr_cols, ts_col, "__src").select(*out_cols)
    return untouched.unionByName(rebuilt)
