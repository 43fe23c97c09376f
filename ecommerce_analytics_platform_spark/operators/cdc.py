"""CDC (change-data-capture) log replay: apply an insert/update/delete
operation log onto a snapshot with last-writer-wins semantics.

Beyond the reference surface (its dbt incremental is upsert-only —
delete+insert keyed on unique_key, dbt_project.yml:26-30): a real warehouse
ingesting a Debezium/binlog-style feed also has to honor DELETEs and replay
out-of-order batches. This operator is the deterministic core of
Delta/Iceberg's ``APPLY CHANGES``:

- ``latest_changes``: one row per key — the change with the greatest
  ``(seq_cols..., tiebreak)`` wins. One window over one key shuffle.
- ``apply_changes``: snapshot rows whose key is untouched pass through
  (left-anti against the distinct change keys — broadcast when the batch is
  small, the common case); the latest change per key is then applied:
  op == delete ⇒ key disappears, anything else ⇒ upsert of that row's
  payload.

Associativity (the property that makes incremental replay correct):
``apply(apply(S, L1), L2) == apply(S, L1 ∪ L2)`` whenever every key's
changes are totally ordered by seq across batches — only the globally
latest op per key survives either way. The registry's ``cdc_apply`` query
*proves* this cross-engine: Spark applies the log in two phases, the DuckDB
oracle replays the whole log in one window, and the results hash-match.

Scale shape: the snapshot is never rewritten logically — the anti-join
streams it map-side against broadcast change keys; pair with
``operators/incremental.py::merge_delete_insert(prune_partitions=True)`` to
keep the physical rewrite bounded by the touched partitions too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Reduce a change log to the winning (latest) change per key.

    Ordering is ``seq_cols`` descending, then ``tiebreak`` descending —
    pass a unique column (an LSN / event id) as the tiebreak so replay is
    deterministic even when two changes share a sequence value.
    """
    order = [F.desc(c) for c in seq_cols]
    if tiebreak:
        order.append(F.desc(tiebreak))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    snapshot: DataFrame | None,
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak: str | None = None,
) -> DataFrame:
    """Replay ``changes`` onto ``snapshot`` (last-writer-wins, deletes
    honored). Returns the new snapshot with the same columns as the change
    payload minus ``op_col``.

    ``snapshot=None`` (or empty) bootstraps from the log alone. The change
    key set is broadcast into the anti-join — the snapshot side only
    streams.
    """
    win = latest_changes(changes, keys, seq_cols, tiebreak)
    upserts = win.filter(F.col(op_col) != delete_op).drop(op_col)
    if snapshot is None:
        return upserts
    touched = changes.select(*keys).distinct()
    kept = snapshot.join(F.broadcast(touched), on=keys, how="left_anti")
    return kept.select(*upserts.columns).unionByName(upserts)
