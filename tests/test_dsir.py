"""DSIR importance resampling: target-shift and determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecommerce_analytics_platform_spark.operators.corpus import dsir_sample


def _corpus(spark):
    rows = []
    for i in range(60):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
    for i in range(60, 120):
        rows.append((i, "der schnelle braune fuchs springt uber den faulen hund", "de"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_shifts_toward_target(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("lang") == "en")
    picked = dsir_sample(docs, target, "doc_id", "text", n_keep=40, n_buckets=128, seed=3)
    labeled = picked.join(docs.select("doc_id", "lang"), "doc_id")
    n_en = labeled.filter("lang = 'en'").count()
    # corpus is 50/50; importance weights must over-select the target lang
    assert n_en > 30
    # English docs carry strictly higher log-ratio than German ones
    en_min = labeled.filter("lang = 'en'").agg(F.min("logratio")).collect()[0][0]
    de_max_row = labeled.filter("lang = 'de'").agg(F.max("logratio")).collect()[0]
    if de_max_row[0] is not None:
        assert en_min > de_max_row[0]


def test_dsir_deterministic(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("lang") == "en")
    a = dsir_sample(docs, target, "doc_id", "text", n_keep=25, n_buckets=128, seed=3)
    b = dsir_sample(docs, target, "doc_id", "text", n_keep=25, n_buckets=128, seed=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_excludes_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "   ", "en"), (3, "", "en")],
        "doc_id long, text string, lang string",
    )
    out = dsir_sample(docs, docs, "doc_id", "text", n_keep=10, n_buckets=32, seed=3)
    assert {r["doc_id"] for r in out.collect()} == {1}
