"""SCD Type 2 history build + incremental merge (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.scd import scd2_history, scd2_merge


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, sec)


def _log(spark, rows):
    return spark.createDataFrame(rows, "k int, ts timestamp, attr string, tb int")


def _sorted(df):
    return sorted(
        df.select("k", "attr", "valid_from", "valid_to", "version", "is_current")
        .collect(),
        key=lambda r: (r.k, r.version),
    )


def test_history_collapses_runs_and_versions(spark):
    log = _log(
        spark,
        [
            (1, _ts(1), "A", 0),
            (1, _ts(2), "A", 0),  # consecutive dup -> collapsed
            (1, _ts(3), "B", 0),
            (1, _ts(4), "A", 0),  # A again later = NEW run, not merged
            (2, _ts(1), "X", 0),
        ],
    )
    out = _sorted(scd2_history(log, "k", ["attr"], "ts", "tb"))
    assert [(r.k, r.attr, r.valid_from, r.valid_to, r.version, r.is_current) for r in out] == [
        (1, "A", _ts(1), _ts(3), 1, False),
        (1, "B", _ts(3), _ts(4), 2, False),
        (1, "A", _ts(4), None, 3, True),
        (2, "X", _ts(1), None, 1, True),
    ]


def test_history_same_ts_tiebreak_and_null_attrs(spark):
    log = _log(
        spark,
        [
            (1, _ts(1), None, 1),  # first row all-null attr must survive
            (1, _ts(2), "B", 1),
            (1, _ts(2), "C", 2),  # same ts: higher tiebreak wins
        ],
    )
    out = _sorted(scd2_history(log, "k", ["attr"], "ts", "tb"))
    assert [(r.attr, r.version) for r in out] == [(None, 1), ("C", 2)]


def test_merge_equals_rebuild_over_sequential_batches(spark):
    """Three in-order batches merged one at a time == one full rebuild."""
    rows = []
    for k in range(6):
        for day in range(1, 13):
            rows.append((k, _ts(day, sec=k), f"S{(k * day * 7) % 3}", day))
    full = _log(spark, rows)
    expected = _sorted(scd2_history(full, "k", ["attr"], "ts", "tb"))

    b1 = full.filter(F.dayofmonth("ts") <= 4)
    b2 = full.filter((F.dayofmonth("ts") > 4) & (F.dayofmonth("ts") <= 8))
    b3 = full.filter(F.dayofmonth("ts") > 8)
    dim = scd2_history(b1, "k", ["attr"], "ts", "tb")
    dim = scd2_merge(dim, b2, "k", ["attr"], "ts", "tb")
    dim = scd2_merge(dim, b3, "k", ["attr"], "ts", "tb")
    assert _sorted(dim) == expected


def test_merge_leaves_unaffected_keys_untouched_and_handles_new_keys(spark):
    initial = _log(spark, [(1, _ts(1), "A", 0), (2, _ts(1), "X", 0)])
    dim = scd2_history(initial, "k", ["attr"], "ts", "tb")
    delta = _log(spark, [(2, _ts(5), "Y", 0), (3, _ts(5), "N", 0)])
    out = _sorted(scd2_merge(dim, delta, "k", ["attr"], "ts", "tb"))
    assert [(r.k, r.attr, r.version, r.is_current) for r in out] == [
        (1, "A", 1, True),  # untouched passthrough
        (2, "X", 1, False),
        (2, "Y", 2, True),
        (3, "N", 1, True),  # brand-new key
    ]
    # untouched key's row is byte-identical to the pre-merge dim row
    pre = [r for r in _sorted(dim) if r.k == 1]
    post = [r for r in out if r.k == 1]
    assert pre == post


def test_merge_delta_rewrites_current_run_on_same_state(spark):
    """A delta row repeating the key's current state must NOT open a new
    run (consecutive-dup collapse spans the merge boundary)."""
    initial = _log(spark, [(1, _ts(1), "A", 0)])
    dim = scd2_history(initial, "k", ["attr"], "ts", "tb")
    delta = _log(spark, [(1, _ts(9), "A", 0)])
    out = _sorted(scd2_merge(dim, delta, "k", ["attr"], "ts", "tb"))
    assert [(r.attr, r.valid_from, r.version, r.is_current) for r in out] == [
        ("A", _ts(1), 1, True)
    ]
