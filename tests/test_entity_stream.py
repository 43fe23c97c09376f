"""Streaming incremental entity resolution (streaming/entity.py): per-batch
cluster assignments converge to the batch connected-components truth, are
invariant to how the feed is chopped (including the adversarial case where
a late doc BRIDGES two established clusters), and commits are exactly-once
across redelivery and half-commit replays."""

from __future__ import annotations

import json
import os

import duckdb
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.dedup import (
    connected_components,
    lsh_band_buckets,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.streaming.entity import (
    process_entity_batch,
    start_streaming_entity_resolution,
)

SF_DIR = "/root/testdata/sf0.001"
# bands=16 (1 row/band): any shared minhash collides — the fixture's
# bridge doc then links BOTH clusters deterministically
NH, NB = 16, 16

TA = "alpha beta gamma delta epsilon zeta"
TB = "one two three four five six"
BRIDGE = TA + " " + TB
ROWS = [(1, TA), (2, TA + " eta"), (10, TB), (11, TB + " seven"), (50, BRIDGE)]


def _batch_truth(spark, rows):
    """Whole-corpus truth: connected components over the LSH collision
    graph of ALL docs at once; colliding-with-nothing docs root themselves."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bb = lsh_band_buckets(df, "doc_id", "text", NH, NB)
    pairs = (
        bb.alias("l")
        .join(
            bb.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .select(F.col("l.__id").alias("a"), F.col("r.__id").alias("b"))
        .distinct()
    )
    nodes = bb.select(F.col("__id").alias("doc_id")).distinct()
    cc = connected_components(pairs, "a", "b").withColumnsRenamed(
        {"node": "doc_id", "component": "root"}
    )
    return nodes.join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("root", F.col("doc_id")).alias("root")
    )


def _canon(df):
    return sorted((r["doc_id"], r["root"]) for r in df.collect())


def _mk_tables(spark, tmp_path):
    return (
        ManifestTable(spark, str(tmp_path / "assign")),
        ManifestTable(spark, str(tmp_path / "index")),
    )


def _run_batches(spark, assign, index, batches, start_id=0):
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        process_entity_batch(b, start_id + i, assign, index, NH, NB)


def test_late_bridge_merges_established_clusters(spark, tmp_path):
    """Adversarial split: cluster A lands, cluster B lands, THEN one doc
    arrives that collides with both — every member of both clusters must
    relabel to the joint minimum, exactly as batch CC would."""
    assign, index = _mk_tables(spark, tmp_path)
    _run_batches(spark, assign, index, [ROWS[:2], ROWS[2:4]])
    # before the bridge: two separate clusters
    mid = {r["doc_id"]: r["root"] for r in assign.read().collect()}
    assert mid == {1: 1, 2: 1, 10: 10, 11: 10}
    _run_batches(spark, assign, index, [ROWS[4:]], start_id=2)
    truth = _batch_truth(spark, ROWS)
    assert _canon(assign.read().select("doc_id", "root")) == _canon(truth)
    # and the merge genuinely happened: B-cluster members moved to root 1
    final = {r["doc_id"]: r["root"] for r in assign.read().collect()}
    assert final == {1: 1, 2: 1, 10: 1, 11: 1, 50: 1}


def test_batch_split_invariance(spark, tmp_path):
    """Any chopping of the same feed yields the same assignment."""
    truth = _canon(_batch_truth(spark, ROWS))
    for split in (
        [ROWS],                                  # all at once
        [[r] for r in ROWS],                     # one per batch
        [ROWS[:1], ROWS[1:3], ROWS[3:]],         # ragged
    ):
        sub = tmp_path / f"s{len(split)}"
        sub.mkdir()
        assign, index = _mk_tables(spark, sub)
        _run_batches(spark, assign, index, split)
        assert _canon(assign.read().select("doc_id", "root")) == truth


def test_redelivered_batch_is_noop(spark, tmp_path):
    assign, index = _mk_tables(spark, tmp_path)
    _run_batches(spark, assign, index, [ROWS[:2], ROWS[2:4], ROWS[4:]])
    va, vi = assign.latest_version(), index.latest_version()
    # foreachBatch redelivery: same batch_id → both commits no-op
    b = spark.createDataFrame(ROWS[4:], "doc_id long, text string")
    process_entity_batch(b, 2, assign, index, NH, NB)
    assert (assign.latest_version(), index.latest_version()) == (va, vi)
    assert _canon(assign.read().select("doc_id", "root")) == _canon(
        _batch_truth(spark, ROWS)
    )


def test_half_commit_replay_converges(spark, tmp_path):
    """Crash window: the batch's INDEX append landed but the assignment
    merge was lost — the replay sees its own buckets in the index, derives
    the identical edge set (self-pairs filtered), and lands the merge."""
    from ecommerce_analytics_platform_spark.streaming.neardup import _bucket_part

    assign, index = _mk_tables(spark, tmp_path)
    _run_batches(spark, assign, index, [ROWS[:2], ROWS[2:4]])
    b = spark.createDataFrame(ROWS[4:], "doc_id long, text string")
    nb = lsh_band_buckets(b, "doc_id", "text", NH, NB)
    index.append_once(
        nb.select(F.col("__id").alias("doc_id"), "band", "bucket").withColumn(
            "bucket_part", _bucket_part()
        ),
        txn_id="entity-index-2",
        partition_by=["bucket_part"],
    )
    process_entity_batch(b, 2, assign, index, NH, NB)
    assert _canon(assign.read().select("doc_id", "root")) == _canon(
        _batch_truth(spark, ROWS)
    )
    # index holds each doc's buckets exactly once (replay no-oped)
    per_doc = (
        index.read().groupBy("doc_id", "band").count().agg(F.max("count")).first()[0]
    )
    assert per_doc == 1


def test_streaming_end_to_end_on_testdata(spark, tmp_path):
    """Real corpus slice through the actual Structured Streaming query,
    chopped into files: final assignment equals the batch truth."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id LIMIT 80"
    ).fetchall()
    con.close()
    raw = tmp_path / "raw"
    raw.mkdir()
    for i, chunk in enumerate([rows[:30], rows[30:60], rows[60:]]):
        with open(raw / f"part{i}.ndjson", "w") as f:
            for d, t, s in chunk:
                f.write(json.dumps({"doc_id": d, "text": t, "source": s}) + "\n")
    q = start_streaming_entity_resolution(
        spark,
        str(raw),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        num_hashes=NH,
        bands=NB,
    )
    q.awaitTermination(120)
    assign = ManifestTable(spark, str(tmp_path / "state" / "entity_assign"))
    truth = _batch_truth(spark, [(d, t) for d, t, _s in rows])
    assert _canon(assign.read().select("doc_id", "root")) == _canon(truth)
