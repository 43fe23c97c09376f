"""Salted aggregation/join equivalence, and bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a uniform tail
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail).cache()


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed, ["k"],
            {"s": ("v", "sum"), "c": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"dim{i}") for i in range(50)], ["k", "attr"]
    )
    plain = skewed.join(dim, "k").groupBy("k", "attr").count()
    salted = salted_join(skewed, dim, "k", n_salts=8).groupBy("k", "attr").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_left_join_preserves_unmatched(spark, skewed):
    dim = spark.createDataFrame([("HOT", "hot-dim")], ["k", "attr"])
    out = salted_join(skewed, dim, "k", n_salts=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("attr").isNull()).count() == 1000  # the tail


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed tables co-locate join keys at write time: the sort-merge
    join must read both sides WITHOUT an Exchange — the 'pre-shuffled'
    layout a 100 TB fact/fact join needs."""
    import contextlib
    import io

    # spark.sql.warehouse.dir is static — tables land in the session default
    # (./spark-warehouse) and are dropped (managed => files removed) below
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucketing replaced the shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_skewed_count_distinct_matches_plain(spark):
    """The two-stage skewed-distinct rewrite is value-identical to plain
    countDistinct (the shuffles differ, the relation doesn't)."""
    from ecommerce_analytics_platform_spark.operators.skew import skewed_count_distinct

    df = spark.range(5000).select(
        # hot key: 40% of rows on key 1; duplicates of the value column;
        # NULLs sprinkled in (countDistinct ignores them) plus an all-NULL
        # key 999 (countDistinct reports 0, not 1)
        F.when(F.col("id") % 5 < 2, F.lit(1))
        .when(F.col("id") % 11 == 0, F.lit(999))
        .otherwise(F.col("id") % 37)
        .alias("k"),
        F.when((F.col("id") % 7 == 0) | (F.col("id") % 11 == 0), F.lit(None))
        .otherwise(F.col("id") % 997)
        .alias("v"),
    )
    got = {
        (r["k"], r["n_distinct"])
        for r in skewed_count_distinct(df, ["k"], "v").collect()
    }
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want
