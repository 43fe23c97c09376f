"""Change Data Feed (ManifestTable.changes_between): row-level version
diffs bounded by changed files, with rewrite cancellation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable


def _mk(spark, path, n=12):
    t = ManifestTable(spark, str(path))
    df = spark.createDataFrame(
        [(i, f"v{i}", f"d{i % 2}") for i in range(n)], ["k", "v", "d"]
    )
    t.overwrite(df, partition_by=["d"])
    return t


def _changes(t, a, b):
    return {
        (r.k, r.v, r._change_type)
        for r in t.changes_between(a, b).select("k", "v", "_change_type").collect()
    }


def test_append_yields_inserts_only(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(
        spark.createDataFrame([(100, "new", "d0")], ["k", "v", "d"]),
        partition_by=["d"],
    )
    assert _changes(t, 1, 2) == {(100, "new", "insert")}


def test_delete_where_yields_deletes_only(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k IN (3, 5)")
    assert _changes(t, 1, 2) == {(3, "v3", "delete"), (5, "v5", "delete")}


def test_update_yields_preimage_postimage(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    batch = spark.createDataFrame([(4, "UPDATED", "d0")], ["k", "v", "d"])
    t.merge_delete_insert(batch, unique_key=["k"], partition_by=["d"])
    got = _changes(t, 1, 2)
    assert (4, "v4", "delete") in got and (4, "UPDATED", "insert") in got
    # rewritten-partition rows that did NOT change cancel out
    assert not any(k not in (4,) for k, _, _ in got)


def test_compaction_is_change_free(spark, tmp_path):
    from ecommerce_analytics_platform_spark.operators.gdpr import compact

    t = _mk(spark, tmp_path / "t", n=40)
    v1 = t.latest_version()
    out = compact(spark, t, target_bytes=1 << 30, min_files=2)
    assert out["files_in"] > out["files_out"]
    assert t.changes_between(v1, t.latest_version()).count() == 0


def test_materialize_deletes_is_change_free(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k = 0")
    v = t.latest_version()
    t.materialize_deletes()
    assert t.changes_between(v, t.latest_version()).count() == 0
    # while the full span still shows the one delete
    assert _changes(t, 1, t.latest_version()) == {(0, "v0", "delete")}


def test_restore_resurrection_is_an_insert(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k = 7")  # v2
    t.restore(1)  # v3: k=7 comes back
    assert _changes(t, 2, 3) == {(7, "v7", "insert")}


def test_schema_evolution_aligns_old_side(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(
        spark.createDataFrame([(200, "x", "d0", 9.5)], ["k", "v", "d", "score"]),
        partition_by=["d"],
    )
    ch = t.changes_between(1, 2)
    assert "score" in ch.columns
    rows = ch.collect()
    assert len(rows) == 1 and rows[0].score == 9.5


def test_identity_span_is_empty(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.changes_between(1, 1).count() == 0
    with pytest.raises(ValueError):
        t.changes_between(2, 1)


def test_clone_is_independent_and_cheap(spark, tmp_path):
    import os

    t = _mk(spark, tmp_path / "t")
    t.delete_where("k = 1")
    clone = t.clone_to(str(tmp_path / "c"))
    assert {r.k for r in clone.read().collect()} == {
        r.k for r in t.read().collect()
    }
    # hardlinked, not copied: same inode for a data file
    m = t._read_manifest(t.latest_version())
    f = m["files"][0]
    assert os.stat(os.path.join(t.path, f)).st_ino == os.stat(
        os.path.join(clone.path, f)
    ).st_ino
    # stats/schema/dv travel; txns do NOT (fresh destination)
    cm = clone._read_manifest(1)
    assert cm.get("dv") and cm.get("schema") and cm.get("txns") == []
    # divergence + vacuum on either side never breaks the other
    clone.delete_where("k = 2")
    extra = spark.createDataFrame([(50, "x", "d0")], ["k", "v", "d"])
    # partition-layout guard: unpartitioned append into a hive-partitioned
    # table is rejected (mixed layout would silently lose rows on read)
    with pytest.raises(ValueError):
        t.append(extra)
    t.append(extra, partition_by=["d"])
    t.materialize_deletes()
    t.vacuum(keep_versions=1)
    clone.vacuum(keep_versions=1)
    assert {r.k for r in clone.read().collect()} == set(range(12)) - {1, 2}
    assert 50 in {r.k for r in t.read().collect()}
    with pytest.raises(FileExistsError):
        t.clone_to(str(tmp_path / "c"))
