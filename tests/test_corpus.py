"""Corpus-preparation operators (operators/corpus.py): decontamination,
inverted index, token-budget sampling, balanced sampling, exact PageRank.
Semantics checked against plain-Python references on hand-built fixtures;
oracle parity at sf is covered by the registry (check_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from ecommerce_analytics_platform_spark.operators.corpus import (
    balanced_sample,
    inverted_index,
    ngram_overlap,
    pagerank_exact,
    token_budget_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_overlap_flags_only_real_collisions(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # shares 5-grams
            (2, "completely different words here nothing shared at all"),
            (3, "too short"),  # < 5 tokens → no grams → never flagged
        ],
    )
    ev = _docs(spark, [(100, "the quick brown fox jumps far away")])
    out = {r["doc_id"]: (r["n_shared_grams"], r["n_eval_docs"]) for r in
           ngram_overlap(train, ev, n=5).collect()}
    # only doc 1 collides, on exactly one 5-gram ("the quick brown fox jumps")
    assert out == {1: (1, 1)}


def test_ngram_overlap_counts_distinct_grams(spark):
    train = _docs(spark, [(1, "a b c d e f g")])  # grams: abcde bcdef cdefg
    ev = _docs(spark, [(9, "a b c d e f"), (10, "b c d e f g")])
    row = ngram_overlap(train, ev, n=5).collect()[0]
    # all 3 train grams appear in the eval set, across 2 eval docs
    assert (row["n_shared_grams"], row["n_eval_docs"]) == (3, 2)


def test_inverted_index_postings_sorted_capped_df_full(spark):
    docs = _docs(spark, [(i, "alpha beta" if i % 2 == 0 else "alpha") for i in range(10)])
    idx = {r["term"]: r for r in
           inverted_index(docs, min_df=1, max_postings=3).collect()}
    assert idx["alpha"]["df"] == 10  # df reports the FULL frequency
    assert idx["alpha"]["postings"] == [0, 1, 2]  # capped + ascending
    assert idx["beta"]["postings"] == [0, 2, 4]


def test_inverted_index_dedups_repeated_terms_within_doc(spark):
    docs = _docs(spark, [(1, "x x x X"), (2, "x")])
    idx = {r["term"]: r for r in inverted_index(docs, min_df=1).collect()}
    assert idx["x"]["df"] == 2 and idx["x"]["postings"] == [1, 2]


def test_token_budget_sample_respects_budget_and_determinism(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(200)]
    docs = _docs(spark, rows)
    out1 = token_budget_sample(docs, budget_tokens=400, n_shards=4).collect()
    out2 = token_budget_sample(docs, budget_tokens=400, n_shards=4).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(r["doc_id"] for r in out2)
    per_shard = {}
    for r in out1:
        per_shard[r["shard"]] = max(per_shard.get(r["shard"], 0), r["cum_tokens"])
    assert all(v <= 100 for v in per_shard.values())  # 400 // 4 per shard
    assert len(out1) > 0


def test_token_budget_sample_is_prefix_closed(spark):
    """A doc in the sample implies every earlier (hash-order) doc of its
    shard is too — the defining property of a prefix cut."""
    rows = [(i, " ".join(["w"] * 10)) for i in range(100)]
    docs = _docs(spark, rows)
    small = {r["doc_id"] for r in token_budget_sample(docs, budget_tokens=200, n_shards=2).collect()}
    large = {r["doc_id"] for r in token_budget_sample(docs, budget_tokens=600, n_shards=2).collect()}
    assert small <= large


def test_balanced_sample_thins_majority_keeps_minority(spark):
    rows = [(i, "en") for i in range(400)] + [(1000 + i, "fr") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = balanced_sample(df, "lang", "doc_id").groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    assert got.get("fr", 0) == 20  # min stratum: fraction 1 → all kept
    assert 5 <= got.get("en", 0) <= 60  # ~20 expected, hash-binomial spread


def test_span_dedup_keeps_first_occurrence_and_reconstructs(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c x y z"),   # spans (3-tok): "a b c", "x y z"
            (2, "a b c q r s"),   # "a b c" repeated → dropped; "q r s" kept
            (3, "x y z"),         # fully boilerplate → empty clean_text
        ],
    )
    from ecommerce_analytics_platform_spark.operators.corpus import span_dedup

    out = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=3).collect()}
    assert out[1]["clean_text"] == "a b c x y z" and out[1]["kept_spans"] == 2
    assert out[2]["clean_text"] == "q r s" and out[2]["kept_spans"] == 1
    assert out[3]["clean_text"] == "" and out[3]["kept_spans"] == 0
    assert out[3]["n_spans"] == 1


def test_span_dedup_partial_tail_span_is_its_own_unit(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "d")])
    from ecommerce_analytics_platform_spark.operators.corpus import span_dedup

    out = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=3).collect()}
    # doc1 spans: "a b c", "d"; doc2 span "d" is a dup of doc1's tail
    assert out[1]["kept_spans"] == 2 and out[2]["kept_spans"] == 0


def test_dedup_against_corpus_filters_both_corpus_and_batch_dupes(spark):
    from ecommerce_analytics_platform_spark.operators.dedup import dedup_against_corpus

    corpus = _docs(spark, [(1, "already in corpus"), (2, "other doc")])
    incoming = _docs(
        spark,
        [
            (10, "already  in   corpus"),  # ws-normalized dup of corpus → dropped
            (11, "brand new"),
            (12, "brand new"),             # batch-internal dup → one survivor (min id)
        ],
    )
    out = sorted(r["doc_id"] for r in
                 dedup_against_corpus(incoming, corpus, "text", "doc_id").collect())
    assert out == [11]


def test_token_zipf_ranks_deterministically(spark):
    from ecommerce_analytics_platform_spark.operators.corpus import token_zipf_stats

    docs = _docs(spark, [(1, "a a a b b c"), (2, "c b a")])
    out = {r["doc_id"]: r for r in token_zipf_stats(docs, rare_rank=2).collect()}
    # global counts: a=4, b=3, c=2 → ranks a=1, b=2, c=3
    assert (out[1]["n_tokens"], out[1]["sum_rank"], out[1]["max_rank"], out[1]["n_rare"]) == (6, 10, 3, 1)
    assert (out[2]["n_tokens"], out[2]["sum_rank"], out[2]["max_rank"], out[2]["n_rare"]) == (3, 6, 3, 1)


def test_pagerank_matches_python_reference(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank_exact(df, iterations=3).collect()}

    SCALE, BASE = 1_000_000_000, (15 * 1_000_000_000) // 100
    deg = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    nodes = {n for e in edges for n in e}
    rank = {n: SCALE for n in nodes}
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // deg[s]
        rank = {n: BASE + (85 * contrib[n]) // 100 for n in nodes}
    assert got == rank


def test_pagerank_lazy_checkpoints_bit_equal(spark):
    """r14: eager=False runs every localCheckpoint inside the consumer's
    action (driver-latency cut); results must be bit-equal to the eager
    path and the deferred frees must release every block on the next
    pin-registry drain."""
    from ecommerce_analytics_platform_spark.session import release_pinned

    edges = [(i, (i * 7 + 1) % 50) for i in range(300)]
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, ["src", "dst"])
    eager = {(r["node"], r["rank"]) for r in pagerank_exact(df, 3).collect()}
    lazy = {(r["node"], r["rank"]) for r in pagerank_exact(df, 3, eager=False).collect()}
    assert eager == lazy
    release_pinned()
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == 0


def test_pagerank_bit_exact_across_partitioning(spark):
    """The fixed-point claim: same result at 1 partition and 32 partitions."""
    edges = [(i, (i * 7 + 1) % 50) for i in range(300)]
    edges = [(s, d) for s, d in edges if s != d]
    df1 = spark.createDataFrame(edges, ["src", "dst"]).coalesce(1)
    df32 = spark.createDataFrame(edges, ["src", "dst"]).repartition(32)
    r1 = {(r["node"], r["rank"]) for r in pagerank_exact(df1, 2).collect()}
    r32 = {(r["node"], r["rank"]) for r in pagerank_exact(df32, 2).collect()}
    assert r1 == r32


def test_content_chunks_survive_insertion(spark):
    """The defining CDC property: boundaries are content-local, so an
    insertion at the head of a document re-synchronizes and the shared
    tail produces byte-identical chunks in both docs (fixed-width
    chunking would lose all alignment)."""
    from ecommerce_analytics_platform_spark.operators.corpus import (
        content_defined_chunks,
    )

    shared = " ".join(f"w{i % 37}x{i % 11}" for i in range(400))
    rows = [(1, shared), (2, "junk0 junk1 junk2 " + shared)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = content_defined_chunks(df, "doc_id", "text", modulus=8).collect()
    shared_hashes = {
        r["chunk_hash"] for r in out if r["n_docs_sharing"] == 2
    }
    # the long shared tail re-syncs: most chunks are shared between docs
    n1 = sum(1 for r in out if r["doc_id"] == 1)
    n_shared1 = sum(
        1 for r in out if r["doc_id"] == 1 and r["chunk_hash"] in shared_hashes
    )
    assert n_shared1 >= n1 - 2  # at most the head chunks differ
    assert n_shared1 > 10


def test_content_chunks_partitioning_invariant(spark):
    """Chunk ids, hashes and sharing counts are pure content functions —
    input partitioning must not matter."""
    from ecommerce_analytics_platform_spark.operators.corpus import (
        content_defined_chunks,
    )
    from ecommerce_analytics_platform_spark.plans.testdata_queries import _t

    docs = _t(spark, SF_DIR, "documents").select("doc_id", "text").limit(100)
    a = content_defined_chunks(docs.repartition(1), "doc_id", "text")
    b = content_defined_chunks(docs.repartition(13, "doc_id"), "doc_id", "text")
    ca = sorted(tuple(r) for r in a.collect())
    cb = sorted(tuple(r) for r in b.collect())
    assert ca == cb
    # chunks partition the token stream: per-doc token sums match
    import pyspark.sql.functions as F
    from ecommerce_analytics_platform_spark.functions.text import token_count

    tot = {
        r["doc_id"]: r["n"]
        for r in a.groupBy("doc_id").agg(F.sum("n_tokens").alias("n")).collect()
    }
    truth = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    assert tot == truth
