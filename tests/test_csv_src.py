"""Robust CSV lane: typed parse + corrupt-line quarantine."""

from __future__ import annotations

from pyspark.sql import types as T

from ecommerce_analytics_platform_spark.sources.csv_src import (
    read_csv_robust,
    split_corrupt,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("label", T.StringType()),
    ]
)


def test_csv_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,amount,label\n"
        "1,10.5,ok\n"
        "not_a_number,2.0,bad_id\n"
        "2,3.25,fine\n"
        "3,oops,bad_amount\n"
    )
    df = read_csv_robust(spark, str(p), SCHEMA).cache()
    clean, bad = split_corrupt(df)
    got = {r["id"]: (r["amount"], r["label"]) for r in clean.collect()}
    assert got == {1: (10.5, "ok"), 2: (3.25, "fine")}
    bad_lines = sorted(r["raw_line"] for r in bad.collect())
    assert bad_lines == ["3,oops,bad_amount", "not_a_number,2.0,bad_id"]
    df.unpersist()


def test_csv_all_clean_roundtrip(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("id,amount,label\n7,1.0,a\n8,2.0,b\n")
    clean, bad = split_corrupt(read_csv_robust(spark, str(p), SCHEMA).cache())
    assert clean.count() == 2
    assert bad.count() == 0
