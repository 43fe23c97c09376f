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
