"""Python UDTF surface: lateral-join chunking matches the columnar chunker."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.udtf_ops import register_udtfs
from tests.conftest import SF_DIR


def test_udtf_lateral_chunks_match_columnar(spark):
    """chunk_doc UDTF via SQL LATERAL produces the same (doc_id, chunk_idx,
    chunk) rows as the production pure-column doc_chunks query."""
    from ecommerce_analytics_platform_spark.plans.testdata_queries import QUERIES, _t

    register_udtfs(spark)
    docs = _t(spark, SF_DIR, "documents").select("doc_id", "text").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    lateral = spark.sql(
        "SELECT doc_id, c.chunk_idx, c.n_tokens, c.chunk "
        "FROM udtf_docs, LATERAL chunk_doc(text, 50, 40) c"
    )
    columnar = (
        QUERIES["doc_chunks"][0](spark, SF_DIR)
        .join(docs.select("doc_id"), "doc_id")
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_idx"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("chunk_text").alias("chunk"),
        )
    )
    got = {tuple(r) for r in lateral.collect()}
    want = {tuple(r) for r in columnar.collect()}
    assert got == want


def test_udtf_empty_and_null_text(spark):
    register_udtfs(spark)
    df = spark.createDataFrame([(1, None), (2, ""), (3, "a b c")], "id int, t string")
    df.createOrReplaceTempView("udtf_edge")
    out = spark.sql(
        "SELECT id, c.chunk_idx, c.chunk FROM udtf_edge, LATERAL chunk_doc(t, 2, 1) c"
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk"]))
    assert 1 not in by_id and 2 not in by_id
    assert by_id[3] == [(0, "a b"), (1, "b c"), (2, "c")]
