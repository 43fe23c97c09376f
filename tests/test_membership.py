"""Bloom filter and Count-Min sketch: guarantees and mergeability."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecommerce_analytics_platform_spark.operators.membership import (
    bloom_bitmap,
    bloom_build,
    bloom_probe,
    cms_build,
    cms_lookup,
)

M, K, SEED = 1 << 12, 4, 7


def _members(spark, n=300):
    return spark.range(n).select((F.col("id") * 3 + 1).alias("key"))


def test_bloom_no_false_negatives(spark):
    members = _members(spark)
    bmp = bloom_bitmap(bloom_build(members, "key", M, K, SEED), M)
    probed = bloom_probe(members, "key", bmp, M, K, SEED)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    members = _members(spark)
    bmp = bloom_bitmap(bloom_build(members, "key", M, K, SEED), M)
    non_members = spark.range(10_000, 12_000).select(F.col("id").alias("key"))
    probed = bloom_probe(non_members, "key", bmp, M, K, SEED)
    fp = probed.filter("bloom_hit").count()
    # n=300, m=4096, k=4 → fill ≈ 0.25, fp ≈ 0.4%; assert a loose 5% ceiling
    assert fp / 2000 < 0.05


def test_bloom_merge_union_equals_rebuild(spark):
    a = spark.range(0, 150).select(F.col("id").alias("key"))
    b = spark.range(150, 300).select(F.col("id").alias("key"))
    both = a.unionByName(b)
    merged = bloom_build(a, "key", M, K, SEED).union(bloom_build(b, "key", M, K, SEED)).distinct()
    rebuilt = bloom_build(both, "key", M, K, SEED)
    assert merged.subtract(rebuilt).count() == 0
    assert rebuilt.subtract(merged).count() == 0


def test_bloom_probe_is_map_side(spark):
    """The probe plan must contain no Exchange — it's a broadcast-literal
    bit test, usable as a pushed-down prefilter."""
    members = _members(spark)
    bmp = bloom_bitmap(bloom_build(members, "key", M, K, SEED), M)
    probed = bloom_probe(spark.range(100).select(F.col("id").alias("key")), "key", bmp, M, K, SEED)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


W, D, S2 = 64, 3, 11


def test_cms_never_undercounts_and_exact_when_sparse(spark):
    df = spark.range(2_000).select((F.col("id") % 37).alias("key"))
    sketch = cms_build(df, "key", W, D, S2)
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_lookup(exact, "key", sketch, W, D, S2)
    assert est.filter(F.col("cms_est") < F.col("exact_n")).count() == 0
    # 37 keys in 64 columns × 3 rows: min-of-rows recovers exact counts for
    # most keys; assert the error bound ε = e/w over N
    import math

    n_total = 2_000
    bound = math.ceil(math.e / W * n_total)
    assert est.filter(F.col("cms_est") > F.col("exact_n") + bound).count() == 0


def test_cms_merge_is_counter_addition(spark):
    a = spark.range(0, 1_000).select((F.col("id") % 17).alias("key"))
    b = spark.range(1_000, 2_000).select((F.col("id") % 23).alias("key"))
    merged = (
        cms_build(a, "key", W, D, S2)
        .unionByName(cms_build(b, "key", W, D, S2))
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    rebuilt = cms_build(a.unionByName(b), "key", W, D, S2)
    assert merged.subtract(rebuilt).count() == 0
    assert rebuilt.subtract(merged).count() == 0


def test_cms_sketch_size_bounded_by_structure(spark):
    df = spark.range(50_000).select(F.col("id").alias("key"))  # 50k distinct
    sketch = cms_build(df, "key", W, D, S2)
    assert sketch.count() <= W * D


# --- portable HLL -----------------------------------------------------------

from ecommerce_analytics_platform_spark.operators.membership import (  # noqa: E402
    hll_build,
    hll_estimate,
)

B, HS = 8, 303


def test_hll_accuracy_within_envelope(spark):
    df = spark.range(5_000).select(F.col("id").alias("uid"), F.lit("g").alias("grp"))
    regs = hll_build(df, "uid", ["grp"], B, HS)
    est = hll_estimate(regs, ["grp"], B).collect()[0]["hll_est"]
    # m=256 → σ ≈ 6.5%; 20% is a >3σ envelope
    assert abs(est - 5_000) / 5_000 < 0.20


def test_hll_registers_bounded_and_merge_is_max(spark):
    a = spark.range(0, 3_000).select(F.col("id").alias("uid"), F.lit("g").alias("grp"))
    b = spark.range(2_000, 6_000).select(F.col("id").alias("uid"), F.lit("g").alias("grp"))
    ra = hll_build(a, "uid", ["grp"], B, HS)
    rb = hll_build(b, "uid", ["grp"], B, HS)
    assert ra.count() <= (1 << B)
    merged = (
        ra.unionByName(rb)
        .groupBy("grp", "bucket")
        .agg(F.max("rmax").alias("rmax"))
    )
    rebuilt = hll_build(a.unionByName(b), "uid", ["grp"], B, HS)
    assert merged.subtract(rebuilt).count() == 0
    assert rebuilt.subtract(merged).count() == 0


def test_hll_rho_matches_python_reference(spark):
    """Pin the register spec against an independent md5 reference."""
    import hashlib

    def ref(v: int, b: int, seed: int):
        h = int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)
        m = 1 << b
        bucket = h & (m - 1)
        w = h >> b
        w_bits = 60 - b
        if w == 0:
            return bucket, w_bits + 1
        return bucket, w_bits - w.bit_length() + 1

    df = spark.createDataFrame([(v,) for v in range(50)], "uid long").withColumn(
        "grp", F.lit("g")
    )
    regs = {r["bucket"]: r["rmax"] for r in hll_build(df, "uid", ["grp"], B, HS).collect()}
    expect: dict[int, int] = {}
    for v in range(50):
        bucket, rho = ref(v, B, HS)
        expect[bucket] = max(expect.get(bucket, 0), rho)
    assert regs == expect


def test_hll_small_range_linear_counting_exact_side(spark):
    """With n ≪ m the linear-counting path engages and is quite sharp."""
    df = spark.range(40).select(F.col("id").alias("uid"), F.lit("g").alias("grp"))
    regs = hll_build(df, "uid", ["grp"], B, HS)
    est = hll_estimate(regs, ["grp"], B).collect()[0]["hll_est"]
    assert abs(est - 40) / 40 < 0.10


# --- DDSketch ---------------------------------------------------------------

from ecommerce_analytics_platform_spark.operators.membership import (  # noqa: E402
    dds_build,
    dds_quantiles,
)


def test_dds_relative_error_guarantee(spark):
    import numpy as np

    rng = np.random.RandomState(9)
    vals = np.exp(rng.uniform(0, 12, 4_000))  # 6 decades of positive values
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").withColumn(
        "g", F.lit("g")
    )
    alpha = 0.02
    est = {
        r["q"]: r["dds_est"]
        for r in dds_quantiles(
            dds_build(df, "x", ["g"], alpha), ["g"], [0.5, 0.9, 0.99], alpha
        ).collect()
    }
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(est[q] - exact) / exact < 2.5 * alpha  # rank-vs-interp slack


def test_dds_merge_is_counter_addition(spark):
    a = spark.range(1, 2_000).select((F.col("id") * 1.5).alias("x"), F.lit("g").alias("g"))
    b = spark.range(2_000, 5_000).select((F.col("id") * 1.5).alias("x"), F.lit("g").alias("g"))
    merged = (
        dds_build(a, "x", ["g"])
        .unionByName(dds_build(b, "x", ["g"]))
        .groupBy("g", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    rebuilt = dds_build(a.unionByName(b), "x", ["g"])
    assert merged.subtract(rebuilt).count() == 0
    assert rebuilt.subtract(merged).count() == 0


def test_dds_bins_bounded_by_range_not_rows(spark):
    df = spark.range(1, 100_000).select((F.col("id") % 1000 + 1.0).alias("x"), F.lit("g").alias("g"))
    bins = dds_build(df, "x", ["g"], alpha=0.02)
    # values span 3 decades → ~ln(1000)/ln(γ) ≈ 175 bins, NOT 100k rows
    assert bins.count() < 400


def test_dds_drops_nonpositive(spark):
    df = spark.createDataFrame([(0.0,), (-5.0,), (10.0,)], "x double").withColumn(
        "g", F.lit("g")
    )
    out = dds_quantiles(dds_build(df, "x", ["g"]), ["g"], [0.5])
    assert out.collect()[0]["n"] == 1


# --- KMV / theta sketch -----------------------------------------------------

from ecommerce_analytics_platform_spark.operators.membership import (  # noqa: E402
    kmv_build,
    kmv_estimate,
    kmv_intersect,
)


def _sets_df(spark):
    rows = []
    rows += [("a", i) for i in range(0, 4_000)]          # |A| = 4000
    rows += [("b", i) for i in range(2_000, 7_000)]      # |B| = 5000, |A∩B| = 2000
    rows += [("c", i) for i in range(100_000, 100_050)]  # |C| = 50, disjoint
    return spark.createDataFrame(rows, "g string, uid long")


def test_kmv_distinct_estimates(spark):
    sk = kmv_build(_sets_df(spark), "uid", ["g"], k=256)
    est = {r["g"]: r["kmv_est"] for r in kmv_estimate(sk, ["g"], k=256).collect()}
    assert abs(est["a"] - 4_000) / 4_000 < 0.2
    assert abs(est["b"] - 5_000) / 5_000 < 0.2
    assert est["c"] == 50.0  # sketch not full → exact by the KMV rule


def test_kmv_intersection_estimates(spark):
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_intersect(kmv_build(_sets_df(spark), "uid", ["g"], k=256), "g", k=256).collect()
    }
    ab = out[("a", "b")]
    # |A∩B| = 2000 of |A∪B| = 7000; inclusion–exclusion over k=256 sketches
    assert abs(ab["inter_est"] - 2_000) / 2_000 < 0.5
    # disjoint pairs: estimate collapses toward 0 (clamped)
    assert out[("a", "c")]["inter_est"] < 500
    assert out[("b", "c")]["inter_est"] < 500


def test_kmv_sketch_bounded(spark):
    sk = kmv_build(_sets_df(spark), "uid", ["g"], k=64)
    sizes = {r["g"]: r["n"] for r in sk.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes["a"] == 64 and sizes["b"] == 64 and sizes["c"] == 50


# --- per-file Bloom index + idempotent append -------------------------------

from ecommerce_analytics_platform_spark.operators.membership import (  # noqa: E402
    _py_positions,
    bloom_position_cols,
    file_bloom_index,
    prune_files_for_key,
)


def test_py_positions_match_spark_hashes(spark):
    df = spark.createDataFrame([(v,) for v in [0, 7, 123456789]], "key long")
    rows = df.select(
        "key", F.array(*bloom_position_cols("key", 1 << 14, 4, 101)).alias("p")
    ).collect()
    for r in rows:
        assert list(r["p"]) == _py_positions(r["key"], 1 << 14, 4, 101)


def test_file_bloom_index_prunes_and_never_misses(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(4_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 16).alias("b")
    ).repartition(16, "b").write.parquet(path)
    df = spark.read.parquet(path)
    idx = file_bloom_index(df, "user_id").cache()
    n_files = idx.select("file").distinct().count()
    assert n_files >= 8
    for key in (5, 1234, 3999):
        files = prune_files_for_key(idx, key)
        # no false negatives: reading only the pruned files finds the key
        hit = spark.read.parquet(*[f.replace("file://", "") for f in files])
        assert hit.filter(F.col("user_id") == key).count() == 1
        # and it actually prunes (each key lives in exactly one bucket file)
        assert len(files) < n_files
    idx.unpersist()


def test_manifest_append_once_is_idempotent(spark, tmp_path):
    from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    batch = spark.range(10).select(F.col("id").alias("user_id"))
    v1 = t.append_once(batch, txn_id="batch-0")
    v2 = t.append_once(batch, txn_id="batch-0")  # re-delivery: no-op
    assert v1 == v2
    assert t.read().count() == 10
    v3 = t.append_once(batch, txn_id="batch-1")
    assert v3 > v2
    assert t.read().count() == 20
