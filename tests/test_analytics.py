"""Warehouse analytics operators (operators/analytics.py) vs brute-force
Python references on tiny hand-built frames — semantics, determinism, and
edge cases (ties, incomplete funnels, single-row runs)."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.analytics import (
    basket_pairs,
    cohort_matrix,
    ordered_funnel,
    rfm_scores,
    run_length_intervals,
    transition_counts,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_cohort_matrix_month(spark):
    rows = [
        ("u1", dt.datetime(2024, 1, 5)),
        ("u1", dt.datetime(2024, 3, 2)),
        ("u2", dt.datetime(2024, 1, 20)),
        ("u2", dt.datetime(2024, 1, 25)),  # same month — one activity cell
        ("u3", dt.datetime(2024, 2, 1)),
    ]
    out = {
        (r.cohort_period.isoformat(), r.periods_since): r.n_active
        for r in cohort_matrix(_df(spark, rows, "ent string, ts timestamp"), "ent", "ts").collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,   # u1+u2 active in their cohort month
        ("2024-01-01", 2): 1,   # u1 returns in March
        ("2024-02-01", 0): 1,   # u3
    }


def test_cohort_matrix_week_integer_offsets(spark):
    rows = [
        ("u1", dt.datetime(2024, 1, 1)),   # Monday
        ("u1", dt.datetime(2024, 1, 14)),  # Sunday of week 1 → offset 1
        ("u1", dt.datetime(2024, 1, 15)),  # Monday of week 2 → offset 2
    ]
    out = sorted(
        (r.periods_since, r.n_active)
        for r in cohort_matrix(
            _df(spark, rows, "ent string, ts timestamp"), "ent", "ts", period="week"
        ).collect()
    )
    assert out == [(0, 1), (1, 1), (2, 1)]


def test_rfm_scores_buckets_and_values(spark):
    # 4 entities, clearly ordered on every metric → with n_tiles=2 the
    # split is unambiguous.
    rows = []
    base = dt.datetime(2024, 1, 1)
    spend = {"a": 400.0, "b": 300.0, "c": 200.0, "d": 100.0}
    n_orders = {"a": 4, "b": 3, "c": 2, "d": 1}
    last_day = {"a": 10, "b": 8, "c": 6, "d": 4}
    for e in "abcd":
        for i in range(n_orders[e]):
            day = last_day[e] - i
            rows.append((e, base + dt.timedelta(days=day), spend[e] / n_orders[e]))
    out = {
        r.entity: r
        for r in rfm_scores(
            _df(spark, rows, "ent string, ts timestamp, amt double"),
            "ent", "ts", "amt", n_tiles=2,
        ).collect()
    }
    assert out["a"].recency_days == 0 and out["d"].recency_days == 6
    assert out["a"].frequency == 4 and out["d"].frequency == 1
    assert abs(out["b"].monetary - 300.0) < 1e-9
    assert (out["a"].r, out["a"].f, out["a"].m) == (1, 1, 1)
    assert (out["d"].r, out["d"].f, out["d"].m) == (2, 2, 2)
    assert (out["b"].r, out["b"].f, out["b"].m) == (1, 1, 1)
    assert (out["c"].r, out["c"].f, out["c"].m) == (2, 2, 2)


def test_basket_pairs_counts(spark):
    rows = [
        ("b1", "x"), ("b1", "y"), ("b1", "z"),
        ("b2", "x"), ("b2", "y"),
        ("b3", "x"), ("b3", "y"), ("b3", "x"),  # dup item collapses
        ("b4", "z"),
    ]
    out = {
        (r.item_a, r.item_b): (r.pair_n, r.a_n, r.b_n, r.n_baskets)
        for r in basket_pairs(
            _df(spark, rows, "basket string, item string"), "basket", "item", min_support=2
        ).collect()
    }
    # (x,y) in b1,b2,b3; (x,z)/(y,z) only b1 → below min_support.
    assert out == {("x", "y"): (3, 3, 3, 4)}


def test_basket_pairs_max_basket_guard(spark):
    rows = [("big", f"i{k}") for k in range(5)] + [("s", "i0"), ("s", "i1")]
    out = basket_pairs(
        _df(spark, rows, "basket string, item string"), "basket", "item",
        min_support=1, max_basket=4,
    ).collect()
    # The 5-item basket is dropped entirely; only the small basket pairs.
    assert {(r.item_a, r.item_b, r.n_baskets) for r in out} == {("i0", "i1", 1)}


def test_transition_counts_matches_python(spark):
    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "b"), ("u1", 4, "a"),
        ("u2", 1, "b"), ("u2", 2, "a"),
        ("u3", 1, "a"),  # single event — no transition
    ]
    expected = Counter()
    seqs = defaultdict(list)
    for ent, t, s in rows:
        seqs[ent].append((t, s))
    for ent, evs in seqs.items():
        evs.sort()
        for (_, p), (_, c) in zip(evs, evs[1:]):
            expected[(p, c)] += 1
    out = {
        (r.prev_state, r.state): r.n
        for r in transition_counts(
            _df(spark, rows, "ent string, ts long, state string"), "ent", "ts", "state"
        ).collect()
    }
    assert out == dict(expected)


def test_run_length_intervals_islands(spark):
    rows = [
        ("e1", 1, "A"), ("e1", 2, "A"), ("e1", 3, "B"), ("e1", 4, "A"),
        ("e2", 10, "C"),
    ]
    out = {
        (r.entity, r.valid_from): (r.state, r.valid_to, r.n_rows)
        for r in run_length_intervals(
            _df(spark, rows, "ent string, seq long, state string"), "ent", "seq", "state"
        ).collect()
    }
    assert out == {
        ("e1", 1): ("A", 2, 2),
        ("e1", 3): ("B", 3, 1),
        ("e1", 4): ("A", 4, 1),
        ("e2", 10): ("C", 10, 1),
    }


def test_ordered_funnel_strict_ordering(spark):
    t = dt.datetime
    rows = [
        # u1 completes in order.
        ("u1", t(2024, 1, 1), "signup"), ("u1", t(2024, 1, 2), "view"),
        ("u1", t(2024, 1, 3), "buy"),
        # u2: buy BEFORE view → stage 3 not counted (strict order).
        ("u2", t(2024, 1, 1), "signup"), ("u2", t(2024, 1, 3), "view"),
        ("u2", t(2024, 1, 2), "buy"),
        # u3: never signed up → not in output at all.
        ("u3", t(2024, 1, 1), "view"),
        # u4: view at the exact signup instant → NOT strictly after.
        ("u4", t(2024, 1, 1), "signup"), ("u4", t(2024, 1, 1), "view"),
    ]
    out = {
        r.entity: r.stages_completed
        for r in ordered_funnel(
            _df(spark, rows, "ent string, ts timestamp, state string"),
            "ent", "ts", "state", stages=["signup", "view", "buy"],
        ).collect()
    }
    assert out == {"u1": 3, "u2": 2, "u4": 1}


def test_ordered_funnel_min_qualifying_timestamp(spark):
    t = dt.datetime
    # Second view (after buy) must not resurrect ordering: t_view is the
    # MIN qualifying view, so buy at t3 > t_view(t2) counts.
    rows = [
        ("u", t(2024, 1, 1), "signup"), ("u", t(2024, 1, 2), "view"),
        ("u", t(2024, 1, 3), "buy"), ("u", t(2024, 1, 4), "view"),
    ]
    row = ordered_funnel(
        _df(spark, rows, "ent string, ts timestamp, state string"),
        "ent", "ts", "state", stages=["signup", "view", "buy"],
    ).collect()[0]
    assert row.stages_completed == 3
    assert row.stage_view == t(2024, 1, 2)
