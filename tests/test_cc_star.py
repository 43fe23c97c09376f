"""Large-star/small-star CC must agree with min-label propagation —
including on the long-chain shape where min-label's round count explodes."""

from __future__ import annotations

import random

import pytest

from ecommerce_analytics_platform_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_star_matches_minlabel_on_random_graph(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges_df(spark, pairs)
    assert _labels(connected_components_star(e)) == _labels(connected_components(e))


def test_star_converges_on_long_chain_in_log_rounds(spark):
    """A 200-node chain has diameter 199 — min-label would need ~199
    rounds; star contraction must finish inside max_rounds=20 (O(log² n))
    and still label every node with the chain minimum."""
    chain = [(i, i + 1) for i in range(200)]
    got = _labels(connected_components_star(_edges_df(spark, chain), max_rounds=20))
    assert set(got) == set(range(201))
    assert all(lbl == 0 for lbl in got.values())


def test_star_handles_disjoint_components_and_self_loops(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (11, 10), (5, 5), (20, 21)]
    e = _edges_df(spark, pairs)
    got = _labels(connected_components_star(e))
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == 20
    # self-loop-only node labels itself — same contract as min-label CC
    assert got[5] == 5
    assert got == _labels(connected_components(e))


def test_star_nonconvergence_warns(spark):
    """Exhausting max_rounds without reaching the star fixpoint must warn,
    mirroring connected_components' contract."""
    chain = [(i, i + 1) for i in range(200)]
    with pytest.warns(RuntimeWarning, match="did not converge"):
        # driver_cap=None forces the distributed rounds (the r14 driver
        # union-find guard would solve a 200-edge chain exactly without
        # ever iterating)
        connected_components_star(
            _edges_df(spark, chain), max_rounds=1, driver_cap=None
        )


def test_driver_guard_matches_distributed_rounds(spark):
    """r14: below _CC_DRIVER_EDGE_CAP both CC variants run a driver
    union-find instead of iterative Spark rounds. The guarded result must
    be row-identical to the distributed paths (driver_cap=None) on a
    random multi-component graph with self-loops and duplicate edges."""
    import random

    rng = random.Random(1414)
    pairs = [(rng.randrange(80), rng.randrange(80)) for _ in range(120)]
    pairs += [(7, 7), (3, 5), (5, 3)]  # self-loop + both orientations
    e = _edges_df(spark, pairs)

    guarded_ml = _labels(connected_components(e))
    dist_ml = _labels(connected_components(e, driver_cap=None))
    assert guarded_ml == dist_ml

    guarded_st = _labels(connected_components_star(e))
    dist_st = _labels(connected_components_star(e, driver_cap=None))
    assert guarded_st == dist_st
    assert guarded_st == guarded_ml
