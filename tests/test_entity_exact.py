"""Streaming entity resolution, EXACT edge mode (streaming/entity.py::
process_entity_batch_exact): incremental PPJoin at Jaccard ≥ t over
distinct word-shingle sets. The maintained clustering must equal the
brute-force all-pairs truth — the same predicate the batch
``entity_clusters`` registry query implements via prefix filtering — for
every chopping of the feed, with exactly-once commits."""

from __future__ import annotations

import pytest
import json
import os

import duckdb
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.text import word_shingles
from ecommerce_analytics_platform_spark.operators.dedup import connected_components
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.streaming.entity import (
    process_entity_batch_exact,
    start_streaming_entity_resolution,
)

SF_DIR = "/root/testdata/sf0.001"


def _truth(spark, rows, t10):
    """Brute-force oracle: ALL pairs with shingle-Jaccard ≥ t10/10 (exact
    array intersection — no prefix filter, no LSH), min-label CC, docs
    colliding with nothing root themselves. Independent of the PPJoin
    machinery under test."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tk = (
        df.select(
            "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("tk")
        )
        .filter(F.size("tk") > 0)
        .withColumn("sz", F.size("tk").cast("long"))
    )
    a = tk.select(
        F.col("doc_id").alias("id_a"), F.col("tk").alias("tk_a"), F.col("sz").alias("sz_a")
    )
    b = tk.select(
        F.col("doc_id").alias("id_b"), F.col("tk").alias("tk_b"), F.col("sz").alias("sz_b")
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("inter", F.size(F.array_intersect("tk_a", "tk_b")).cast("long"))
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.lit(10) * F.col("inter") >= F.lit(t10) * F.col("uni"))
        .select("id_a", "id_b")
    )
    cc = connected_components(pairs, "id_a", "id_b").withColumnsRenamed(
        {"node": "doc_id", "component": "root"}
    )
    return tk.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("root", F.col("doc_id")).alias("root")
    )


def _canon(df):
    return sorted((r["doc_id"], r["root"]) for r in df.collect())


def _mk(spark, tmp_path):
    return (
        ManifestTable(spark, str(tmp_path / "assign")),
        ManifestTable(spark, str(tmp_path / "tokens")),
        ManifestTable(spark, str(tmp_path / "postings")),
    )


def _run(spark, tables, batches, t10, start_id=0):
    assign, tokens, postings = tables
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        process_entity_batch_exact(
            b, start_id + i, assign, tokens, postings, t10=t10
        )


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


# two vocabulary-disjoint families plus a concatenation doc: at t=0.4 the
# concat doc bridges them (J(concat, member) = 8/18 ≈ 0.44), at t=0.6 it
# does not — both regimes exercised below
TA = _words("a", 10)
TB = _words("b", 10)
ROWS = [
    (1, TA),
    (2, TA + " a10"),          # J(1,2) = 8/9 — same cluster at both thresholds
    (10, TB),
    (11, TB + " b10"),
    (50, TA + " " + TB),       # bridge at t=0.4 only
]


@pytest.mark.slow
def test_bridge_merges_at_low_threshold_only(spark, tmp_path):
    """Scenario self-check + semantics: at t10=4 the concat doc links both
    families into ONE cluster; at t10=6 it links neither."""
    truth4 = {r["doc_id"]: r["root"] for r in _truth(spark, ROWS, 4).collect()}
    assert truth4 == {1: 1, 2: 1, 10: 1, 11: 1, 50: 1}
    truth6 = {r["doc_id"]: r["root"] for r in _truth(spark, ROWS, 6).collect()}
    assert truth6 == {1: 1, 2: 1, 10: 10, 11: 10, 50: 50}
    for t10, truth in ((4, truth4), (6, truth6)):
        tables = _mk(spark, tmp_path / f"t{t10}")
        # adversarial: both families established first, bridge arrives last
        _run(spark, tables, [ROWS[:2], ROWS[2:4], ROWS[4:]], t10)
        got = {r["doc_id"]: r["root"] for r in tables[0].read().collect()}
        assert got == truth


@pytest.mark.slow
def test_batch_split_invariance(spark, tmp_path):
    truth = _canon(_truth(spark, ROWS, 4))
    for split in (
        [ROWS],
        [[r] for r in ROWS],
        [ROWS[:1], ROWS[1:3], ROWS[3:]],
    ):
        sub = tmp_path / f"s{len(split)}"
        sub.mkdir()
        tables = _mk(spark, sub)
        _run(spark, tables, split, 4)
        assert _canon(tables[0].read().select("doc_id", "root")) == truth


def test_redelivered_batch_is_noop(spark, tmp_path):
    tables = _mk(spark, tmp_path)
    _run(spark, tables, [ROWS[:2], ROWS[2:]], 4)
    versions = tuple(t.latest_version() for t in tables)
    b = spark.createDataFrame(ROWS[2:], "doc_id long, text string")
    process_entity_batch_exact(b, 1, *tables, t10=4)
    assert tuple(t.latest_version() for t in tables) == versions
    assert _canon(tables[0].read().select("doc_id", "root")) == _canon(
        _truth(spark, ROWS, 4)
    )


def test_half_commit_replay_converges(spark, tmp_path):
    """Crash window: tokens + postings landed but the assignment merge was
    lost — the replay must derive the identical edge set (its own ids are
    excluded from the state side, so nothing double-counts) and land the
    merge."""
    from ecommerce_analytics_platform_spark.streaming.entity import (
        _assign_bucket,
        _tok_part,
    )
    from pyspark.sql import Window

    from ecommerce_analytics_platform_spark.functions.compat import portable_hash60

    tables = _mk(spark, tmp_path)
    assign, tokens, postings = tables
    _run(spark, tables, [ROWS[:2], ROWS[2:4]], 4)
    # hand-land batch 2's tokens and postings commits (what the crashed
    # attempt would have written), same txn ids
    b = spark.createDataFrame(ROWS[4:], "doc_id long, text string")
    tk = (
        b.select(
            "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("tk")
        )
        .filter(F.size("tk") > 0)
        .withColumn("sz", F.size("tk").cast("long"))
    )
    tok = tk.select("doc_id", "sz", F.explode("tk").alias("tok"))
    w = Window.partitionBy("doc_id").orderBy(portable_hash60(F.col("tok")), "tok")
    plen = (
        F.col("sz")
        - F.floor((F.lit(4) * F.col("sz") + F.lit(9)) / F.lit(10)).cast("long")
        + 1
    )
    pref = (
        tok.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= plen)
        .select("doc_id", "sz", "tok")
    )
    tokens.append_once(
        tok.withColumn("n_bucket", _assign_bucket(n_buckets=256)),
        txn_id="entity-tokens-2",
        partition_by=["n_bucket"],
    )
    postings.append_once(
        pref.withColumn("tok_part", _tok_part(256)),
        txn_id="entity-postings-2",
        partition_by=["tok_part"],
    )
    process_entity_batch_exact(b, 2, assign, tokens, postings, t10=4)
    assert _canon(assign.read().select("doc_id", "root")) == _canon(
        _truth(spark, ROWS, 4)
    )
    # state holds each doc's rows exactly once (replay no-oped)
    per_doc = (
        tokens.read().groupBy("doc_id", "tok").count().agg(F.max("count")).first()[0]
    )
    assert per_doc == 1


@pytest.mark.slow
def test_matches_bruteforce_on_testdata_corpus(spark, tmp_path):
    """Real corpus slice at the registry threshold (t=0.6), chopped
    round-robin so planted near-dup groups SPAN batches: streamed
    assignment equals the brute-force all-pairs truth — i.e. the batch
    ``entity_clusters`` semantics (its PPJoin emits exactly these
    pairs)."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id LIMIT 80"
    ).fetchall()
    con.close()
    batches = [rows[0::3], rows[1::3], rows[2::3]]
    tables = _mk(spark, tmp_path)
    _run(spark, tables, batches, 6)
    truth = _truth(spark, rows, 6)
    assert _canon(tables[0].read().select("doc_id", "root")) == _canon(truth)
    # scenario self-check: the slice really contains multi-doc clusters
    n_multi = (
        truth.groupBy("root").count().filter("count > 1").count()
    )
    assert n_multi > 0


def test_streaming_query_end_to_end_ppjoin(spark, tmp_path):
    """The actual Structured Streaming query with edge_mode='ppjoin'."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id LIMIT 60"
    ).fetchall()
    con.close()
    raw = tmp_path / "raw"
    raw.mkdir()
    for i, chunk in enumerate([rows[0::2], rows[1::2]]):
        with open(raw / f"part{i}.ndjson", "w") as f:
            for d, t, s in chunk:
                f.write(json.dumps({"doc_id": d, "text": t, "source": s}) + "\n")
    q = start_streaming_entity_resolution(
        spark,
        str(raw),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        edge_mode="ppjoin",
    )
    q.awaitTermination(180)
    assign = ManifestTable(spark, str(tmp_path / "state" / "entity_assign"))
    truth = _truth(spark, [(d, t) for d, t, _s in rows], 6)
    assert _canon(assign.read().select("doc_id", "root")) == _canon(truth)
