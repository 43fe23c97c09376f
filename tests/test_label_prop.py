"""Label propagation: clamped seeds, majority vote, deterministic ties."""

from __future__ import annotations

from ecommerce_analytics_platform_spark.operators.corpus import label_propagation


def _lp(spark, edges, seeds, iterations=2):
    e = spark.createDataFrame(edges, "src int, dst int")
    s = spark.createDataFrame(seeds, "node int, label string")
    return {
        r["node"]: r["label"]
        for r in label_propagation(e, s, iterations=iterations).collect()
    }


def test_majority_vote_and_spread(spark):
    # 1,2 labeled A; 3 labeled B; node 4 touches all three → majority A
    out = _lp(spark, [(1, 4), (2, 4), (3, 4), (4, 5)], [(1, "A"), (2, "A"), (3, "B")])
    assert out[4] == "A"
    assert out[5] == "A"  # round 2: 5 adopts 4's round-1 label


def test_tie_breaks_to_smallest_label(spark):
    out = _lp(spark, [(1, 3), (2, 3)], [(1, "B"), (2, "A")], iterations=1)
    assert out[3] == "A"


def test_seeds_are_clamped(spark):
    # seed 1 is surrounded by B-labeled neighbors but keeps its label
    out = _lp(spark, [(1, 2), (1, 3), (2, 3)], [(1, "A"), (2, "B"), (3, "B")])
    assert out[1] == "A"


def test_isolated_unlabeled_stays_unlabeled(spark):
    out = _lp(spark, [(1, 2), (3, 4)], [(1, "A")])
    assert 3 not in out and 4 not in out
    assert out[2] == "A"
