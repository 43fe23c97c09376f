"""Streaming IVF ANN index (streaming/annindex.py): chopping invariance,
exactly-once ingest, equality with the one-shot batch IVF path,
partition-pruned search, recall, and compaction safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.gdpr import compact
from ecommerce_analytics_platform_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.streaming.annindex import (
    ann_index_search,
    assign_to_lists,
    load_quantizer,
    process_ann_batch,
    save_quantizer,
    start_streaming_ann_index,
    train_quantizer,
)

SF_DIR = "/root/testdata/sf0.001"
N_LISTS, N_PROBE, K = 8, 3, 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def centroids(emb):
    return train_quantizer(emb, "vec_id", "embedding", n_lists=N_LISTS)


def _index_rows(t: ManifestTable):
    return {
        (r.cid, r.list_id, tuple(round(x, 9) for x in r.cvec))
        for r in t.read().collect()
    }


def test_ingest_chopping_invariant_and_exactly_once(spark, tmp_path, emb, centroids):
    one = ManifestTable(spark, str(tmp_path / "one"))
    process_ann_batch(spark, emb, one, centroids, "vec_id", "embedding", txn_id="b0")
    many = ManifestTable(spark, str(tmp_path / "many"))
    for i in range(3):
        chunk = emb.filter(F.col("vec_id") % 3 == i)
        process_ann_batch(
            spark, chunk, many, centroids, "vec_id", "embedding", txn_id=f"b{i}"
        )
    assert _index_rows(one) == _index_rows(many)
    # redelivered batch is a no-op
    v = many.latest_version()
    process_ann_batch(
        spark, emb.limit(10), many, centroids, "vec_id", "embedding", txn_id="b1"
    )
    assert many.latest_version() == v


def test_search_equals_batch_ivf_path(spark, tmp_path, emb, centroids):
    t = ManifestTable(spark, str(tmp_path / "idx"))
    process_ann_batch(spark, emb, t, centroids, "vec_id", "embedding", txn_id="b0")
    queries = emb.filter(F.col("vec_id") < 40)
    got = {
        (r.qid, r.rank, r.cid)
        for r in ann_index_search(
            spark, t, centroids, queries, "vec_id", "embedding", k=K, n_probe=N_PROBE
        ).collect()
    }
    want = {
        (r.qid, r.rank, r.cid)
        for r in ivf_topk(
            queries, emb, "vec_id", "vec_id", "embedding",
            k=K, n_lists=N_LISTS, n_probe=N_PROBE,
        ).collect()
    }
    assert got == want  # same quantizer seed/trainer -> identical results


def test_search_reads_only_probed_partitions(spark, tmp_path, emb, centroids):
    t = ManifestTable(spark, str(tmp_path / "idx"))
    process_ann_batch(spark, emb, t, centroids, "vec_id", "embedding", txn_id="b0")
    queries = emb.filter(F.col("vec_id") == 7)
    probes = assign_to_lists(
        queries, "vec_id", "embedding", centroids, n_lists_probe=N_PROBE
    )
    needed = {r.list_id for r in probes.select("list_id").distinct().collect()}
    pruned = t.read(partition_values={"list_id": sorted(needed)})
    all_files = t.read().inputFiles()
    got_files = pruned.inputFiles()
    assert len(got_files) < len(all_files)
    assert all(
        any(f"list_id={lid}" in p for lid in needed) for p in got_files
    )


def test_recall_vs_exact(spark, tmp_path, emb, centroids):
    t = ManifestTable(spark, str(tmp_path / "idx"))
    process_ann_batch(spark, emb, t, centroids, "vec_id", "embedding", txn_id="b0")
    queries = emb.filter(F.col("vec_id") < 50)
    approx = ann_index_search(
        spark, t, centroids, queries, "vec_id", "embedding", k=K, n_probe=N_PROBE
    )
    exact = cosine_topk_bruteforce(
        queries, emb, "vec_id", "vec_id", "embedding", k=K
    )
    a = {(r.qid, r.cid) for r in approx.collect()}
    e = {(r.qid, r.cid) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.6  # same contract as registry ann_ivf


def test_streaming_e2e_equals_batch_ingest(spark, tmp_path, emb, centroids):
    src = str(tmp_path / "src")
    emb.write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(src)
    )
    q = start_streaming_ann_index(
        stream,
        str(tmp_path / "sidx"),
        centroids,
        checkpoint=str(tmp_path / "ckpt"),
        id_col="vec_id",
        vec_col="embedding",
    )
    q.awaitTermination(120)
    streamed = ManifestTable(spark, str(tmp_path / "sidx"))
    batch = ManifestTable(spark, str(tmp_path / "bidx"))
    process_ann_batch(spark, emb, batch, centroids, "vec_id", "embedding", txn_id="b0")
    assert _index_rows(streamed) == _index_rows(batch)


def test_compaction_preserves_search_results(spark, tmp_path, emb, centroids):
    t = ManifestTable(spark, str(tmp_path / "idx"))
    for i in range(4):  # 4 appends -> small files per list
        process_ann_batch(
            spark,
            emb.filter(F.col("vec_id") % 4 == i),
            t,
            centroids,
            "vec_id",
            "embedding",
            txn_id=f"b{i}",
        )
    queries = emb.filter(F.col("vec_id") < 20)
    before = {
        (r.qid, r.rank, r.cid)
        for r in ann_index_search(
            spark, t, centroids, queries, "vec_id", "embedding", k=K, n_probe=N_PROBE
        ).collect()
    }
    out = compact(spark, t, target_bytes=1 << 30, min_files=2)
    assert out["files_in"] > out["files_out"]
    # partition layout survives compaction: pruning still works
    m_files = t.read().inputFiles()
    assert all("list_id=" in p for p in m_files)
    after = {
        (r.qid, r.rank, r.cid)
        for r in ann_index_search(
            spark, t, centroids, queries, "vec_id", "embedding", k=K, n_probe=N_PROBE
        ).collect()
    }
    assert before == after


def test_quantizer_roundtrip(spark, tmp_path, centroids):
    save_quantizer(spark, centroids, str(tmp_path / "q"))
    assert load_quantizer(spark, str(tmp_path / "q")) == centroids


def test_ingest_writes_one_file_per_list_per_batch(spark, tmp_path, emb, centroids):
    """Small-file guard (r10): the partitioned index write is clustered by
    list_id first, so one micro-batch adds at most ONE file per touched
    list — not one per input task per list (32x amplification measured at
    the 64x probe: 32k files, search wall 25 s instead of ~flat)."""
    import os
    from collections import Counter

    t = ManifestTable(spark, str(tmp_path / "idx"))
    process_ann_batch(
        spark, emb.repartition(8), t, centroids, "vec_id", "embedding", txn_id="b0"
    )
    files = t._read_manifest(t.latest_version())["files"]
    per_list = Counter(os.path.dirname(f) for f in files)
    assert per_list and max(per_list.values()) == 1
