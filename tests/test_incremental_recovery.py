"""Crash-recovery tests for the non-atomic rename-swap window (ADVICE r1):
a crash between target→__old and __tmp→target must be repairable, and
compaction must never destroy the data it is lazily reading.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from ecommerce_analytics_platform_spark.operators.incremental import (
    merge_delete_insert,
    recover_swap,
)


def _mk(spark, path, rows):
    spark.createDataFrame(rows, ["k", "v"]).write.mode("overwrite").parquet(path)


def test_recover_restores_old_when_target_missing(spark, tmp_path):
    """Simulated crash after target→__old, before tmp→target: the complete
    __old sibling is renamed back; the reader sees the full pre-merge table."""
    target = str(tmp_path / "t")
    _mk(spark, target, [(1, "a"), (2, "b")])
    old = f"{target}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target, old)  # the vulnerable window

    assert recover_swap(target) is True
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a"), (2, "b")}
    assert not glob.glob(f"{target}__old_*")


def test_recover_prefers_complete_tmp_over_old(spark, tmp_path):
    """If the merged __tmp finished writing (_SUCCESS present) before the
    crash, recovery publishes the merge result, not the stale table."""
    target = str(tmp_path / "t")
    _mk(spark, target, [(1, "old")])
    tmp = f"{target}__tmp_{uuid.uuid4().hex[:8]}"
    _mk(spark, tmp, [(1, "new"), (2, "new")])
    old = f"{target}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target, old)

    assert recover_swap(target) is True
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "new"), (2, "new")}
    assert not glob.glob(f"{target}__old_*") and not glob.glob(f"{target}__tmp_*")


def test_recover_ignores_incomplete_tmp(spark, tmp_path):
    """A half-written tmp (no _SUCCESS) must never be published."""
    target = str(tmp_path / "t")
    _mk(spark, target, [(1, "old")])
    tmp = f"{target}__tmp_{uuid.uuid4().hex[:8]}"
    _mk(spark, tmp, [(1, "partial")])
    os.remove(os.path.join(tmp, "_SUCCESS"))
    old = f"{target}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target, old)

    assert recover_swap(target) is True
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "old")}


def test_merge_self_heals_then_merges(spark, tmp_path):
    """merge_delete_insert on a crashed target first recovers, then applies
    the delete+insert on the recovered table."""
    target = str(tmp_path / "t")
    _mk(spark, target, [(1, "a"), (2, "b")])
    os.rename(target, f"{target}__old_{uuid.uuid4().hex[:8]}")

    batch = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    merge_delete_insert(spark, target, batch, unique_key=["k"])
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_recover_noop_on_healthy_target_clears_stale_dirs(spark, tmp_path):
    target = str(tmp_path / "t")
    _mk(spark, target, [(1, "a")])
    stale = f"{target}__tmp_{uuid.uuid4().hex[:8]}"
    _mk(spark, stale, [(9, "z")])

    assert recover_swap(target) is False
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {(1, "a")}
    assert not glob.glob(f"{target}__tmp_*")


def test_compact_is_staged_not_in_place(spark, tmp_path, monkeypatch):
    """compact_landing must fully write the compacted table to a sibling dir
    before any rename touches the source — even with STATIC
    partitionOverwriteMode (the session default it previously relied on)."""
    from ecommerce_analytics_platform_spark.sources.ndjson import compact_landing

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        path = str(tmp_path / "landing")
        for batch in range(3):
            spark.createDataFrame(
                [(batch * 10 + i, f"2026-02-0{1 + i % 2}") for i in range(6)],
                ["val", "ingest_date"],
            ).write.partitionBy("ingest_date").mode("append").parquet(path)
        before = {tuple(r) for r in spark.read.parquet(path).collect()}

        n = compact_landing(spark, path)
        assert n == 2
        after = {tuple(r) for r in spark.read.parquet(path).collect()}
        assert after == before
        assert len(glob.glob(f"{path}/ingest_date=*/*.parquet")) == 2
        assert not glob.glob(f"{path}__tmp_*") and not glob.glob(f"{path}__old_*")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _file_state(root):
    """{relative parquet path: (size, mtime_ns)} — byte-identity proxy."""
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_pruned_merge_leaves_untouched_partitions_bytes_alone(spark, tmp_path):
    """replaceWhere semantics: a batch touching only day 3 must rewrite ONLY
    the day-3 partition directory — every other partition's files stay
    byte-identical (same inode content: size+mtime unchanged, same paths)."""
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, f"2026-03-0{1 + i % 3}", f"v{i}") for i in range(30)],
        ["k", "d", "v"],
    )
    merge_delete_insert(spark, target, base, unique_key=["k"], partition_by=["d"])
    before = _file_state(target)
    assert any("d=2026-03-01" in p for p in before)

    batch = spark.createDataFrame(
        [(2, "2026-03-03", "UPDATED"), (99, "2026-03-03", "new")], ["k", "d", "v"]
    )
    merge_delete_insert(spark, target, batch, unique_key=["k"], partition_by=["d"])
    after = _file_state(target)

    untouched_before = {p: s for p, s in before.items() if "d=2026-03-03" not in p}
    untouched_after = {p: s for p, s in after.items() if "d=2026-03-03" not in p}
    assert untouched_before == untouched_after  # bytes + paths + mtimes identical
    # and the touched partition applied delete+insert
    got = {(r["k"], r["v"]) for r in spark.read.parquet(target).filter("d = '2026-03-03'").collect()}
    assert (2, "UPDATED") in got and (99, "new") in got
    assert (2, "v2") not in got
    # whole-table row count: 30 original - 1 replaced + 1 new
    assert spark.read.parquet(target).count() == 31
    # no leftover scratch dirs
    assert not glob.glob(f"{target}__p*")


def test_pruned_merge_adds_new_partition(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "2026-03-01", "a")], ["k", "d", "v"])
    merge_delete_insert(spark, target, base, unique_key=["k"], partition_by=["d"])
    batch = spark.createDataFrame([(2, "2026-04-01", "b")], ["k", "d", "v"])
    merge_delete_insert(spark, target, batch, unique_key=["k"], partition_by=["d"])
    # partition-type inference reads the string dirs back as dates — stringify
    got = {(r["k"], str(r["d"]), r["v"])
           for r in spark.read.parquet(target).select("k", "d", "v").collect()}
    assert got == {(1, "2026-03-01", "a"), (2, "2026-04-01", "b")}


def test_pruned_merge_empty_batch_is_noop(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "2026-03-01", "a")], ["k", "d", "v"])
    merge_delete_insert(spark, target, base, unique_key=["k"], partition_by=["d"])
    before = _file_state(target)
    empty = spark.createDataFrame([], "k long, d string, v string")
    merge_delete_insert(spark, target, empty, unique_key=["k"], partition_by=["d"])
    assert _file_state(target) == before


def test_unpruned_merge_still_full_delete_insert(spark, tmp_path):
    """prune_partitions=False keeps the reference's whole-table delete+insert
    (for keys that CAN migrate partitions)."""
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "2026-03-01", "a"), (2, "2026-03-02", "b")], ["k", "d", "v"]
    )
    merge_delete_insert(spark, target, base, unique_key=["k"], partition_by=["d"])
    # key 2 migrates from 03-02 to 03-05: only the un-pruned path removes
    # the stale 03-02 row
    batch = spark.createDataFrame([(2, "2026-03-05", "moved")], ["k", "d", "v"])
    merge_delete_insert(
        spark, target, batch, unique_key=["k"], partition_by=["d"], prune_partitions=False
    )
    got = {(r["k"], str(r["d"]), r["v"])
           for r in spark.read.parquet(target).select("k", "d", "v").collect()}
    assert got == {(1, "2026-03-01", "a"), (2, "2026-03-05", "moved")}
