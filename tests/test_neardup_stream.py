"""Streaming incremental near-dup (streaming/neardup.py): decisions over a
chopped-up document feed converge to the whole-corpus batch truth, commits
are exactly-once across restarts, and batch re-delivery is a no-op.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.dedup import lsh_band_buckets
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.streaming.neardup import (
    process_neardup_batch,
    start_streaming_neardup,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs_rows():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id LIMIT 120"
    ).fetchall()
    con.close()
    return [{"doc_id": d, "text": t, "source": s} for d, t, s in rows]


def _write_ndjson(rows, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _batch_truth(spark, rows):
    """Whole-corpus truth: a doc's candidates = distinct colliding docs
    with a smaller id, over ALL docs at once (no batching)."""
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    bb = lsh_band_buckets(df, "doc_id", "text")
    cand = (
        bb.alias("i")
        .join(
            bb.alias("c"),
            on=[
                F.col("i.band") == F.col("c.band"),
                F.col("i.bucket") == F.col("c.bucket"),
                F.col("c.__id") < F.col("i.__id"),
            ],
        )
        .select(F.col("i.__id").alias("__id"), F.col("c.__id").alias("cand"))
        .distinct()
    )
    return (
        bb.select("__id")
        .distinct()
        .join(cand, "__id", "left")
        .groupBy("__id")
        .agg(
            F.count("cand").alias("n_candidates"),
            F.min("cand").alias("matched_doc_id"),
        )
        .select(F.col("__id").alias("doc_id"), "n_candidates", "matched_doc_id")
    )


def _canon(df):
    return sorted(
        tuple(r) for r in df.select("doc_id", "n_candidates", "matched_doc_id").collect()
    )


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("neardup_stream")
    raw = tmp / "raw"
    state = str(tmp / "state")
    ckpt = str(tmp / "ckpt")

    rows = _docs_rows()
    assert len(rows) == 120
    # three tranches, ids non-decreasing across batches (the documented
    # feed contract)
    _write_ndjson(rows[:50], str(raw / "b1.json"))
    q = start_streaming_neardup(spark, str(raw), state, ckpt)
    assert q.awaitTermination(300)
    _write_ndjson(rows[50:90], str(raw / "b2.json"))
    _write_ndjson(rows[90:], str(raw / "b3.json"))
    q2 = start_streaming_neardup(spark, str(raw), state, ckpt)
    assert q2.awaitTermination(300)
    return rows, state, str(raw), ckpt


def test_stream_matches_batch_truth(spark, stream_env):
    rows, state, _raw, _ckpt = stream_env
    decisions = ManifestTable(
        spark, os.path.join(state, "neardup_decisions")
    ).read()
    truth = _batch_truth(spark, rows)
    got = _canon(decisions)
    assert len(got) == truth.count()  # one decision per signable doc
    assert got == _canon(truth)


def test_restart_without_new_files_is_noop(spark, stream_env):
    rows, state, raw, ckpt = stream_env
    decisions = ManifestTable(spark, os.path.join(state, "neardup_decisions"))
    index = ManifestTable(spark, os.path.join(state, "neardup_index"))
    dv, iv = decisions.latest_version(), index.latest_version()
    q = start_streaming_neardup(spark, raw, state, ckpt)
    assert q.awaitTermination(300)
    assert decisions.latest_version() == dv
    assert index.latest_version() == iv


def test_redelivered_batch_is_idempotent(spark, stream_env):
    rows, state, _raw, _ckpt = stream_env
    decisions = ManifestTable(spark, os.path.join(state, "neardup_decisions"))
    index = ManifestTable(spark, os.path.join(state, "neardup_index"))
    before_dec = _canon(decisions.read())
    before_idx = index.read().count()
    # re-deliver the LAST tranche with its original batch_id — both
    # commits must no-op on the txn id
    batch_df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows[90:]], "doc_id long, text string"
    )
    last_bid = max(
        r.batch_id for r in decisions.read().select("batch_id").distinct().collect()
    )
    process_neardup_batch(batch_df, last_bid, decisions, index)
    assert _canon(decisions.read()) == before_dec
    assert index.read().count() == before_idx


def test_half_committed_replay_converges(spark, tmp_path):
    """Crash window: decisions committed, index append lost (or vice
    versa) — replaying the batch completes the missing commit and leaves
    the committed one untouched."""
    rows = _docs_rows()[:40]
    decisions = ManifestTable(spark, str(tmp_path / "dec"))
    index = ManifestTable(spark, str(tmp_path / "idx"))
    b0 = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows[:25]], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows[25:]], "doc_id long, text string"
    )
    process_neardup_batch(b0, 0, decisions, index)
    # simulate: batch 1's INDEX append landed but the decisions commit
    # crashed before publishing (the other ordering is covered by
    # test_redelivered_batch_is_idempotent) — replay must produce the
    # same decisions b1 would have gotten pre-crash, because the
    # cand < id rule scores own-batch index rows identically.
    nb = lsh_band_buckets(b1, "doc_id", "text")
    from ecommerce_analytics_platform_spark.streaming.neardup import _bucket_part

    index.append_once(
        nb.select(F.col("__id").alias("doc_id"), "band", "bucket").withColumn(
            "bucket_part", _bucket_part()
        ),
        txn_id="neardup-index-1",
        partition_by=["bucket_part"],
    )
    process_neardup_batch(b1, 1, decisions, index)
    truth = _batch_truth(spark, rows)
    assert _canon(decisions.read()) == _canon(truth)
    # index holds each doc's buckets exactly once (replay no-oped)
    n_docs_idx = index.read().select("doc_id").distinct().count()
    assert n_docs_idx == lsh_band_buckets(
        spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
        ),
        "doc_id",
        "text",
    ).select("__id").distinct().count()


def test_max_bucket_caps_within_a_single_batch(spark, tmp_path):
    """The max_bucket guardrail must bound bucket growth even when the
    overflow arrives INSIDE one batch (including the very first batch,
    when the index is still empty): near-identical boilerplate docs all
    sign into the same band-buckets, and only the first max_bucket per
    bucket may enter the index."""
    decisions = ManifestTable(spark, str(tmp_path / "dec"))
    index = ManifestTable(spark, str(tmp_path / "idx"))
    boiler = " ".join(f"w{i}" for i in range(40))
    b0 = spark.createDataFrame(
        [(i, boiler) for i in range(30)], "doc_id long, text string"
    )
    process_neardup_batch(b0, 0, decisions, index, max_bucket=5)
    sizes0 = (
        index.read().groupBy("band", "bucket").count().agg(F.max("count")).first()[0]
    )
    assert sizes0 <= 5
    # survivors are the smallest doc_ids per bucket (deterministic rank)
    kept = {r[0] for r in index.read().select("doc_id").distinct().collect()}
    assert kept == set(range(5))
    # a second boilerplate batch cannot push the bucket past the cap either
    b1 = spark.createDataFrame(
        [(100 + i, boiler) for i in range(10)], "doc_id long, text string"
    )
    process_neardup_batch(b1, 1, decisions, index, max_bucket=5)
    sizes1 = (
        index.read().groupBy("band", "bucket").count().agg(F.max("count")).first()[0]
    )
    assert sizes1 <= 5
    # decisions were still committed for every doc (cap drops INDEX rows only)
    assert decisions.read().count() == 40


def test_bloom_file_skipping_prunes_within_a_partition(spark, tmp_path):
    """File-level skipping below the partition prune (VERDICT r7 #3):
    with n_bucket_parts=1 every index file lands in the same partition,
    so ONLY the Bloom file index can narrow the read — a vocab-A probe
    must keep batch-A files and drop vocab-B files — and decisions with
    the bloom enabled are identical to decisions without it."""
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        _bloom_keep_files,
        _new_files,
        process_neardup_batch,
    )
    from ecommerce_analytics_platform_spark.operators.dedup import (
        lsh_band_buckets,
    )

    def mk(root):
        return (
            ManifestTable(spark, str(root / "dec")),
            ManifestTable(spark, str(root / "idx")),
            ManifestTable(spark, str(root / "bloom")),
        )

    va = " ".join(f"a{i}" for i in range(30))
    vb = " ".join(f"b{i}" for i in range(30))
    batch_a = [(i, va + f" tail{i}") for i in range(10)]
    batch_b = [(100 + i, vb + f" tail{i}") for i in range(10)]
    probe_a = [(200 + i, va + f" probe{i}") for i in range(5)]

    (tmp_path / "with").mkdir()
    dec, idx, bloom = mk(tmp_path / "with")
    for bid, rows in enumerate([batch_a, batch_b]):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        process_neardup_batch(
            b, bid, dec, idx, n_bucket_parts=1, bloom=bloom
        )
    # bloom covers exactly the committed index files
    a_files = set(_new_files(idx, 1))
    b_files = set(_new_files(idx, 2))
    covered = {r["file"] for r in bloom.read().select("file").distinct().collect()}
    assert covered == a_files | b_files

    nb = lsh_band_buckets(
        spark.createDataFrame(probe_a, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    keep = _bloom_keep_files(idx, bloom, nb)
    assert keep is not None
    # vocab-A probe: batch-A files survive, vocab-B files are skipped
    assert a_files <= keep
    assert not (b_files & keep)

    # decisions with bloom == decisions without bloom on the same feed
    b2 = spark.createDataFrame(probe_a, "doc_id long, text string")
    process_neardup_batch(b2, 2, dec, idx, n_bucket_parts=1, bloom=bloom)

    (tmp_path / "wo").mkdir()
    dec2, idx2, _ = mk(tmp_path / "wo")
    for bid, rows in enumerate([batch_a, batch_b, probe_a]):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        process_neardup_batch(b, bid, dec2, idx2, n_bucket_parts=1)
    got = sorted(
        (r["doc_id"], r["n_candidates"], r["matched_doc_id"])
        for r in dec.read().collect()
    )
    want = sorted(
        (r["doc_id"], r["n_candidates"], r["matched_doc_id"])
        for r in dec2.read().collect()
    )
    assert got == want
    # every probe doc matched something from batch A
    probe_rows = {r["doc_id"]: r["matched_doc_id"] for r in dec.read().collect()}
    assert all(probe_rows[200 + i] is not None for i in range(5))


@pytest.mark.slow
def test_compact_index_shrinks_files_and_preserves_semantics(spark, tmp_path):
    """Maintenance compaction: after N micro-batches the index holds ~N
    files per touched partition; compact_index rewrites to one file per
    partition, carries every batch txn forward (replay still no-ops),
    rebuilds the bloom against the new files, and a post-compaction batch
    decides identically to an uncompacted twin."""
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        _bloom_keep_files,
        compact_index,
        process_neardup_batch,
    )
    from ecommerce_analytics_platform_spark.operators.dedup import (
        lsh_band_buckets,
    )

    def mk(root):
        root.mkdir()
        return (
            ManifestTable(spark, str(root / "dec")),
            ManifestTable(spark, str(root / "idx")),
            ManifestTable(spark, str(root / "bloom")),
        )

    vocab = lambda p: " ".join(f"{p}{i}" for i in range(30))  # noqa: E731
    batches = [
        [(100 * b + i, vocab(f"v{b}_") + f" tail{i}") for i in range(8)]
        for b in range(4)
    ]
    probe = [(900 + i, vocab("v1_") + f" probe{i}") for i in range(4)]

    dec, idx, bloom = mk(tmp_path / "compacted")
    for bid, rows in enumerate(batches):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        process_neardup_batch(b, bid, dec, idx, n_bucket_parts=1, bloom=bloom)

    files_before = set(idx.read().inputFiles())
    va, vi = dec.latest_version(), idx.latest_version()
    v = compact_index(idx, bloom)
    assert idx.latest_version() == v
    files_after = set(idx.read().inputFiles())
    # n_bucket_parts=1: every batch's task-files collapse to ONE file
    assert len(files_before) > 1 and len(files_after) == 1
    # same rows survive the rewrite
    assert idx.read(version=v).count() == idx.read(version=vi).count()

    # replayed old batch no-ops THROUGH the compaction (txns carried)
    b1 = spark.createDataFrame(batches[1], "doc_id long, text string")
    process_neardup_batch(b1, 1, dec, idx, n_bucket_parts=1, bloom=bloom)
    assert (dec.latest_version(), idx.latest_version()) == (va, v)

    # bloom was rebuilt: it covers exactly the compacted file, and a
    # vocab-specific probe still gets a keep-verdict that includes it
    covered = {r["file"] for r in bloom.read().select("file").distinct().collect()}
    rels = {f.split(str(tmp_path / "compacted" / "idx"))[-1].lstrip("/") for f in files_after}
    assert covered == rels
    nb = lsh_band_buckets(
        spark.createDataFrame(probe, "doc_id long, text string"), "doc_id", "text"
    )
    keep = _bloom_keep_files(idx, bloom, nb)
    assert keep == rels

    # post-compaction decisions equal an uncompacted twin
    bp = spark.createDataFrame(probe, "doc_id long, text string")
    process_neardup_batch(bp, 4, dec, idx, n_bucket_parts=1, bloom=bloom)

    dec2, idx2, _b2 = mk(tmp_path / "twin")
    for bid, rows in enumerate(batches + [probe]):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        process_neardup_batch(b, bid, dec2, idx2, n_bucket_parts=1)
    got = sorted(
        (r["doc_id"], r["n_candidates"], r["matched_doc_id"])
        for r in dec.read().collect()
    )
    want = sorted(
        (r["doc_id"], r["n_candidates"], r["matched_doc_id"])
        for r in dec2.read().collect()
    )
    assert got == want


def _exact_decision_truth(spark, rows, t10):
    """Brute-force whole-corpus truth for exact-threshold decisions: per
    doc, count + min of SMALLER ids with shingle-Jaccard >= t10/10."""
    from ecommerce_analytics_platform_spark.functions.text import word_shingles

    df = spark.createDataFrame(rows, "doc_id long, text string")
    tk = (
        df.select(
            "doc_id", F.array_distinct(word_shingles(F.col("text"), 3)).alias("tk")
        )
        .filter(F.size("tk") > 0)
        .withColumn("sz", F.size("tk").cast("long"))
    )
    a = tk.select(F.col("doc_id").alias("id_a"), F.col("tk").alias("tk_a"), F.col("sz").alias("sz_a"))
    b = tk.select(F.col("doc_id").alias("id_b"), F.col("tk").alias("tk_b"), F.col("sz").alias("sz_b"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("inter", F.size(F.array_intersect("tk_a", "tk_b")).cast("long"))
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.lit(10) * F.col("inter") >= F.lit(t10) * F.col("uni"))
        .select("id_a", "id_b")
    )
    return sorted(
        (r["doc_id"], r["n"], r["m"])
        for r in tk.select(F.col("doc_id"))
        .join(pairs.withColumnsRenamed({"id_b": "doc_id"}), "doc_id", "left")
        .groupBy("doc_id")
        .agg(F.count("id_a").alias("n"), F.min("id_a").alias("m"))
        .collect()
    )


@pytest.mark.slow
def test_exact_neardup_decisions_match_bruteforce(spark, tmp_path):
    """process_neardup_batch_exact over any chopping equals the exact
    all-pairs truth (no LSH false negatives by construction), and a
    redelivered batch no-ops."""
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        process_neardup_batch_exact,
    )
    import duckdb as _dd

    con = _dd.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id LIMIT 60"
    ).fetchall()
    con.close()
    truth = _exact_decision_truth(spark, rows, 6)
    # contiguous choppings: decisions are write-once, so the feed contract
    # is ids non-decreasing ACROSS batches (same as the LSH path's
    # documented semantics); planted near-dup groups still span batch
    # boundaries because their members are id-adjacent
    for si, split in enumerate((
        [rows],
        [rows[:20], rows[20:40], rows[40:]],
    )):
        root = tmp_path / f"s{si}"
        root.mkdir()
        dec = ManifestTable(spark, str(root / "dec"))
        tokens = ManifestTable(spark, str(root / "tok"))
        postings = ManifestTable(spark, str(root / "post"))
        for bid, chunk in enumerate(split):
            b = spark.createDataFrame(chunk, "doc_id long, text string")
            process_neardup_batch_exact(b, bid, dec, tokens, postings, t10=6)
        got = sorted(
            (r["doc_id"], r["n_candidates"], r["matched_doc_id"])
            for r in dec.read().collect()
        )
        assert got == truth, f"split {si}"
    # redelivery no-op on the chopped run
    versions = (dec.latest_version(), tokens.latest_version(), postings.latest_version())
    b = spark.createDataFrame(split[-1], "doc_id long, text string")
    process_neardup_batch_exact(b, len(split) - 1, dec, tokens, postings, t10=6)
    assert (dec.latest_version(), tokens.latest_version(), postings.latest_version()) == versions
    # the slice genuinely contains exact near-dups
    assert any(n > 0 for _d, n, _m in truth)


def test_exact_neardup_streaming_query_end_to_end(spark, tmp_path):
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        start_streaming_neardup,
    )
    import duckdb as _dd
    import json as _json

    con = _dd.connect()
    rows = con.sql(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id LIMIT 40"
    ).fetchall()
    con.close()
    raw = tmp_path / "raw"
    raw.mkdir()
    for i, chunk in enumerate([rows[:20], rows[20:]]):
        with open(raw / f"p{i}.ndjson", "w") as f:
            for d, t, s in chunk:
                f.write(_json.dumps({"doc_id": d, "text": t, "source": s}) + "\n")
    q = start_streaming_neardup(
        spark,
        str(raw),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        mode="ppjoin",
    )
    q.awaitTermination(180)
    dec = ManifestTable(spark, str(tmp_path / "state" / "neardup_decisions"))
    got = sorted(
        (r["doc_id"], r["n_candidates"], r["matched_doc_id"])
        for r in dec.read().collect()
    )
    assert got == _exact_decision_truth(spark, [(d, t) for d, t, _s in rows], 6)


# -- streaming Hamming near-dup mode (VERDICT r9 directive #7) ---------------

_HB, _HD = 16, 3  # 16-bit sigs, d<=3 → 4-bit bands: dense collisions


def _hamming_decision_truth(spark, rows):
    """Whole-corpus truth from the batch operator: per signable doc, the
    exact count/min of smaller-id docs within Hamming distance _HD."""
    from ecommerce_analytics_platform_spark.functions.text import simhash_by_agg
    from ecommerce_analytics_platform_spark.operators.fuzzy import (
        hamming_neardup_pairs,
    )

    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    sigs = simhash_by_agg(df, "doc_id", "text", bits=_HB)
    pairs = hamming_neardup_pairs(sigs, "doc_id", "sig", _HB, _HD)
    return (
        sigs.select("doc_id")
        .join(pairs.withColumnsRenamed({"id_b": "doc_id"}), "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.count("id_a").alias("n_candidates"),
            F.min("id_a").alias("matched_doc_id"),
        )
    )


def _drive_hamming(spark, tmp_path, name, choppings):
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        process_neardup_batch_hamming,
    )

    decisions = ManifestTable(spark, str(tmp_path / f"{name}_dec"))
    index = ManifestTable(spark, str(tmp_path / f"{name}_idx"))
    for bid, chunk in enumerate(choppings):
        df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in chunk], "doc_id long, text string"
        )
        process_neardup_batch_hamming(
            df, bid, decisions, index, bits=_HB, max_hamming=_HD
        )
    return decisions, index


def test_hamming_stream_matches_batch_truth_any_chopping(spark, tmp_path):
    rows = _docs_rows()
    want = _canon(_hamming_decision_truth(spark, rows))
    assert any(r[1] > 0 for r in want), "fixture must contain hamming near-dups"

    d1, _ = _drive_hamming(spark, tmp_path, "a", [rows])  # one batch
    d3, _ = _drive_hamming(
        spark, tmp_path, "b", [rows[:40], rows[40:90], rows[90:]]
    )  # three batches
    assert _canon(d1.read()) == want
    assert _canon(d3.read()) == want


def test_hamming_redelivered_batch_is_noop(spark, tmp_path):
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        process_neardup_batch_hamming,
    )

    rows = _docs_rows()[:60]
    decisions, index = _drive_hamming(spark, tmp_path, "r", [rows[:30], rows[30:]])
    dv, iv = decisions.latest_version(), index.latest_version()
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows[30:]], "doc_id long, text string"
    )
    process_neardup_batch_hamming(df, 1, decisions, index, bits=_HB, max_hamming=_HD)
    assert decisions.latest_version() == dv and index.latest_version() == iv


def test_hamming_index_reads_are_pruned(spark, tmp_path):
    """Per-batch index reads touch only the batch's bucket_part
    partitions — file count strictly below the full snapshot's."""
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        _batch_parts,
        _read_index,
    )
    from ecommerce_analytics_platform_spark.functions.text import simhash_by_agg
    from ecommerce_analytics_platform_spark.operators.fuzzy import _band_bounds

    rows = _docs_rows()
    _, index = _drive_hamming(
        spark, tmp_path, "p", [rows[:40], rows[40:80], rows[80:]]
    )
    one = spark.createDataFrame(
        [(rows[5]["doc_id"], rows[5]["text"])], "doc_id long, text string"
    )
    sig = F.col("sig")
    nb = (
        simhash_by_agg(one, "doc_id", "text", bits=_HB)
        .select(
            F.col("doc_id").alias("__id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(sig, lo)
                            .bitwiseAND(F.lit((1 << w) - 1))
                            .cast("long")
                            .alias("bucket"),
                        )
                        for b, (lo, w) in enumerate(_band_bounds(_HB, _HD + 1))
                    ]
                )
            ).alias("bb"),
        )
        .select("__id", "bb.band", "bb.bucket")
    )
    parts = _batch_parts(nb, 256)
    pruned = _read_index(index, parts)
    assert 0 < len(pruned.inputFiles()) < len(index.read().inputFiles())


def test_hamming_streaming_query_end_to_end(spark, tmp_path):
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        start_streaming_neardup,
    )

    rows = _docs_rows()[:60]
    raw = str(tmp_path / "raw")
    _write_ndjson(rows[:30], os.path.join(raw, "b0.ndjson"))
    _write_ndjson(rows[30:], os.path.join(raw, "b1.ndjson"))
    q = start_streaming_neardup(
        spark,
        raw,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        mode="hamming",
        bits=_HB,
        max_hamming=_HD,
    )
    q.awaitTermination()
    dec = ManifestTable(spark, str(tmp_path / "state" / "neardup_decisions"))
    want = _canon(_hamming_decision_truth(spark, rows))
    assert _canon(dec.read()) == want
