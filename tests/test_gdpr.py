"""Right-to-be-forgotten: surgical file rewrite + physical removal audit."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from ecommerce_analytics_platform_spark.operators.gdpr import (
    affected_files,
    assert_forgotten,
    forget,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable


def _table(spark, path, n=2000):
    df = spark.range(n).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 8).alias("bucket"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    ).repartition(8, "bucket")
    t = ManifestTable(spark, path)
    t.overwrite(df)
    return t


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "user_id long")


def test_forget_removes_rows_and_preserves_rest(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    victims = [5, 17, 999]
    report = forget(spark, t, "user_id", _keys(spark, victims))
    assert report["rows_deleted"] == 3
    out = t.read()
    assert out.filter(F.col("user_id").isin(victims)).count() == 0
    assert out.count() == 2000 - 3


def test_forget_rewrites_only_affected_files(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    before = set(t._read_manifest(t.latest_version())["files"])
    # all victims share one bucket → exactly the files holding that bucket
    victims = [8, 16, 24]  # bucket 0
    hit = affected_files(spark, t, "user_id", _keys(spark, victims))
    report = forget(spark, t, "user_id", _keys(spark, victims), vacuum=False)
    after = set(t._read_manifest(t.latest_version())["files"])
    carried = before & after
    assert report["files_rewritten"] == len(hit)
    # untouched files carried by reference, not rewritten
    assert len(carried) == len(before) - len(hit)


def test_vacuum_makes_removal_physical(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _table(spark, path)
    victims = [1, 2, 3, 4]
    forget(spark, t, "user_id", _keys(spark, victims), vacuum=True)
    # read every parquet file physically on disk — no victim bytes anywhere
    assert assert_forgotten(spark, path, "user_id", victims)
    # without vacuum the old version would still hold them: prove the
    # audit actually detects leftovers
    t2 = _table(spark, str(tmp_path / "t2"))
    forget(spark, t2, "user_id", _keys(spark, [7]), vacuum=False)
    assert not assert_forgotten(spark, str(tmp_path / "t2"), "user_id", [7])


def test_forget_noop_when_keys_absent(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    report = forget(spark, t, "user_id", _keys(spark, [10**9]))
    assert report == {"files_rewritten": 0, "rows_deleted": 0, "version": v0}


def test_compact_bin_packs_small_files(spark, tmp_path):
    from ecommerce_analytics_platform_spark.operators.gdpr import compact

    t = ManifestTable(spark, str(tmp_path / "t"))
    # 8 tiny files
    df = spark.range(800).select(F.col("id").alias("user_id")).repartition(8)
    t.overwrite(df)
    before_rows = t.read().count()
    n_before = len(t._read_manifest(t.latest_version())["files"])
    report = compact(spark, t, target_bytes=10 * 1024 * 1024)
    assert report["files_in"] == n_before
    assert report["files_out"] == 1
    after = t._read_manifest(t.latest_version())["files"]
    assert len(after) == 1
    assert t.read().count() == before_rows
    assert sorted(r["user_id"] for r in t.read().collect()) == list(range(800))


def test_compact_carries_large_files_by_reference(spark, tmp_path):
    from ecommerce_analytics_platform_spark.operators.gdpr import compact

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(100).select(F.col("id").alias("user_id")).repartition(4))
    files = t._read_manifest(t.latest_version())["files"]
    # declare one file "large" by setting the threshold between sizes
    import os as _os

    sizes = sorted(_os.path.getsize(_os.path.join(t.path, f)) for f in files)
    threshold = sizes[-1]  # strictly-smaller rule keeps the biggest file
    report = compact(spark, t, target_bytes=threshold)
    after = set(t._read_manifest(t.latest_version())["files"])
    big = {f for f in files if _os.path.getsize(_os.path.join(t.path, f)) >= threshold}
    assert big <= after  # untouched, carried by reference
    assert report["files_in"] == len(files) - len(big)
    assert t.read().count() == 100


def test_forget_preserves_hive_partition_layout(spark, tmp_path):
    """ADVICE r4: on a hive-partitioned manifest table, forget() must
    rewrite files back INTO their col=value/ dirs — not dump them at the
    table root (which corrupts partition discovery and loses pruning)."""
    df = spark.range(300).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).alias("day"),
        F.concat(F.lit("p-"), F.col("id")).alias("payload"),
    )
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(df, partition_by=["day"])
    assert t.partition_columns() == ["day"]

    report = forget(spark, t, "user_id", _keys(spark, [7, 8, 9]), vacuum=False)
    assert report["rows_deleted"] == 3
    files = t._read_manifest(t.latest_version())["files"]
    # every snapshot file (carried + rewritten) still lives under day=N/
    assert all(f.split(os.sep)[0].startswith("day=") for f in files), files
    out = t.read()
    # partition column still parsed + prunable; data intact minus victims
    assert out.filter("day = 1").count() == 100 - 1  # victim 7 ≡ 1 (mod 3)
    assert out.count() == 297
    assert set(out.columns) == {"user_id", "day", "payload"}


def test_compact_preserves_hive_partition_layout(spark, tmp_path):
    from ecommerce_analytics_platform_spark.operators.gdpr import compact

    df = spark.range(400).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 2).alias("day"),
        F.concat(F.lit("p-"), F.col("id")).alias("payload"),
    ).repartition(6)
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(df, partition_by=["day"])
    report = compact(spark, t)
    assert report["files_in"] >= 2
    files = t._read_manifest(t.latest_version())["files"]
    assert all(f.split(os.sep)[0].startswith("day=") for f in files), files
    assert t.read().count() == 400
    assert t.read().filter("day = 0").count() == 200
