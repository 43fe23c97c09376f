"""Dedup operators: latest-record (reference W1/W2 silver pattern), exact
content hash, MinHash-LSH candidate pairs, exact Jaccard verifier."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.dedup import (
    dedup_exact,
    dedup_latest,
    dedup_latest_agg,
    jaccard_ngram_pairs,
    minhash_lsh_pairs,
)


@pytest.fixture(scope="module")
def dup_events(spark):
    t = dt.datetime(2026, 1, 1)
    rows = [
        ("e1", "u1", t, 1),
        ("e1", "u1", t + dt.timedelta(minutes=5), 2),  # late re-delivery, keep
        ("e2", "u1", t, 1),
        ("e3", "u2", t, 1),
        ("e3", "u2", t, 2),  # same ts: tiebreak on ver
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "ingested_at", "ver"])


def test_dedup_latest(dup_events):
    out = dedup_latest(
        dup_events, ["event_id"], [F.desc("ingested_at"), F.desc("ver")]
    )
    got = {r["event_id"]: r["ver"] for r in out.collect()}
    assert got == {"e1": 2, "e2": 1, "e3": 2}


def test_dedup_latest_agg_equivalent(dup_events):
    # single-order-column form: combine ts+ver into one orderable struct col
    df = dup_events.withColumn(
        "__ord", F.struct(F.col("ingested_at"), F.col("ver"))
    )
    out = dedup_latest_agg(df, ["event_id"], "__ord").drop("__ord")
    got = {r["event_id"]: r["ver"] for r in out.collect()}
    assert got == {"e1": 2, "e2": 1, "e3": 2}


def test_dedup_exact(spark):
    rows = [
        (1, "hello  world"),
        (2, "hello world"),  # ws-normalized dup of 1
        (3, "different"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_exact(df, "text", "doc_id").collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert by_id == {1: 2, 3: 1}


def test_minhash_lsh_finds_planted_neardup(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (1, base),
        (2, base.replace("dog", "cat")),  # near-dup of 1
        (3, "completely unrelated text about spark query engines at scale ok"),
        (4, "short"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=8).collect()
    pairset = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in pairset
    assert (1, 3) not in pairset and (2, 3) not in pairset


def test_jaccard_pairs(spark):
    base = "a b c d e f g h i j"
    rows = [(1, base), (2, base + " k"), (3, "z y x w v u t s r q")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = jaccard_ngram_pairs(df, "doc_id", "text", shingle_n=3, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert 0.7 < r["jaccard"] <= 1.0


def test_connected_components_chain_star_disjoint(spark):
    from ecommerce_analytics_platform_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5 (diameter > 1 forces multiple propagation rounds),
    # star 10-{11,12,13}, disjoint pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_connected_components_random_vs_union_find(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    touched = {n for e in edges for n in e}
    expected = {n: find(n) for n in touched}
    # canonicalize: label = min node of the component
    comp_min: dict[int, int] = {}
    for n in touched:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in touched}

    from ecommerce_analytics_platform_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=40).collect()}
    assert got == expected


def test_connected_components_warns_on_non_convergence(spark):
    """A 6-node chain needs >1 min-label rounds; max_iter=1 must warn
    (ADVICE r1: silent non-convergence splits duplicate clusters)."""
    import warnings

    from ecommerce_analytics_platform_spark.operators.dedup import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(5)], ["src", "dst"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # driver_cap=None forces the distributed rounds (the r14 driver
        # union-find guard would solve a 5-edge chain without iterating)
        connected_components(chain, max_iter=1, driver_cap=None).collect()
    assert any("did not converge" in str(x.message) for x in w)


def test_max_bucket_caps_boilerplate_mega_cluster(spark):
    """A boilerplate family (60 docs sharing identical text → identical
    signatures → one mega band-bucket) must be droppable via max_bucket:
    pair count bounded, genuine near-dup pairs elsewhere unchanged, and
    the flag channel reports exactly the boilerplate docs."""
    from ecommerce_analytics_platform_spark.operators.dedup import (
        lsh_oversized_docs,
        minhash_lsh_pairs,
    )

    boiler = [(i, "identical footer boilerplate text repeated on every page") for i in range(60)]
    real = [
        (100, "the quick brown fox jumps over the lazy dog in the morning sun"),
        (101, "the quick brown fox jumps over the lazy dog in the morning sun"),
        (200, "completely unrelated document about distributed query engines"),
    ]
    df = spark.createDataFrame(boiler + real, ["doc_id", "text"])

    uncapped = minhash_lsh_pairs(df, "doc_id", "text", 16, 4).cache()
    # 60-doc clique: C(60,2) = 1770 boilerplate pairs + the 1 planted pair
    assert uncapped.count() == 1770 + 1

    capped = minhash_lsh_pairs(df, "doc_id", "text", 16, 4, max_bucket=10).cache()
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(100, 101)}  # mega-cluster gone, real pair intact

    flagged = {r["doc_id"] for r in
               lsh_oversized_docs(df, "doc_id", "text", 16, 4, max_bucket=10).collect()}
    assert flagged == {i for i in range(60)}
    # the flagged family is exactly what the exact-dup pass handles:
    from ecommerce_analytics_platform_spark.operators.dedup import dedup_exact

    fam = dedup_exact(df.join(spark.createDataFrame([(i,) for i in flagged], ["doc_id"]),
                              "doc_id", "left_semi"), "text", "doc_id")
    row = fam.collect()[0]
    assert row["dup_count"] == 60 and row["doc_id"] == 0
