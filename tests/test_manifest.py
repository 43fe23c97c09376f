"""Manifest-committed tables: atomic snapshot commits, reader isolation,
partition-replace merge, crash safety, vacuum."""

from __future__ import annotations

import glob
import json
import os

import pytest

from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable


def _rows(df):
    return {tuple(str(v) for v in r) for r in df.collect()}


def test_overwrite_append_read_roundtrip(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    v1 = t.overwrite(spark.createDataFrame([(1, "a")], ["k", "v"]))
    assert v1 == 1
    v2 = t.append(spark.createDataFrame([(2, "b")], ["k", "v"]))
    assert v2 == 2
    assert _rows(t.read()) == {("1", "a"), ("2", "b")}
    # time travel: v1 still reads the original snapshot
    assert _rows(t.read(version=1)) == {("1", "a")}


def test_reader_pinned_snapshot_survives_concurrent_commit(spark, tmp_path):
    """A reader that resolved its snapshot BEFORE a commit must keep
    reading the complete old state — the dir-swap race this format closes."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(i, "old") for i in range(10)], ["k", "v"]))
    pinned = t.read()  # resolves manifest v1 now
    t.overwrite(spark.createDataFrame([(99, "new")], ["k", "v"]))
    # old files still on disk (no vacuum): the pinned plan reads v1 fully
    assert pinned.count() == 10
    assert _rows(pinned) == {(str(i), "old") for i in range(10)}
    assert t.read().count() == 1


def test_crashed_writer_leaves_snapshot_intact(spark, tmp_path):
    """Data files written without a manifest commit are invisible."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a")], ["k", "v"]))
    # simulate a crash: files land, no commit
    t._write_files(spark.createDataFrame([(2, "phantom")], ["k", "v"]), None)
    assert _rows(t.read()) == {("1", "a")}
    # vacuum removes the orphans
    removed = t.vacuum()
    assert removed >= 1
    assert _rows(t.read()) == {("1", "a")}


def test_merge_replaces_only_touched_partitions(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(i, f"2026-05-0{1 + i % 3}", f"v{i}") for i in range(30)], ["k", "d", "v"]
    )
    t.merge_delete_insert(base, unique_key=["k"], partition_by=["d"])
    m1 = json.load(open(glob.glob(str(tmp_path / "t/_manifests/v1.json"))[0]))
    batch = spark.createDataFrame([(2, "2026-05-03", "UPD"), (99, "2026-05-03", "new")],
                                  ["k", "d", "v"])
    t.merge_delete_insert(batch, unique_key=["k"], partition_by=["d"])
    m2 = json.load(open(glob.glob(str(tmp_path / "t/_manifests/v2.json"))[0]))
    # untouched partitions: exact same file entries carried over
    keep1 = {f for f in m1["files"] if "d=2026-05-03" not in f}
    keep2 = {f for f in m2["files"] if "d=2026-05-03" not in f}
    assert keep1 == keep2
    got = {(r["k"], r["v"]) for r in t.read().filter("d = '2026-05-03'").collect()}
    assert (2, "UPD") in got and (99, "new") in got and (2, "v2") not in got
    assert t.read().count() == 31


def test_commit_collision_retries_to_next_version(spark, tmp_path, monkeypatch):
    """Two writers race: one holds a stale view of the log and targets a
    version another writer already committed — the atomic link fails and
    the commit retries into the next free slot, never overwriting."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a")], ["k", "v"]))
    # a concurrent writer commits v2 while our writer still believes v1
    other = json.load(open(os.path.join(t.manifest_dir, "v1.json")))
    with open(os.path.join(t.manifest_dir, "v2.json"), "w") as f:
        json.dump({"files": other["files"], "base_version": 1}, f)
    monkeypatch.setattr(t, "latest_version", lambda: 1)  # stale log view
    v = t._commit(other["files"], 1)
    assert v == 3  # v2 was taken; retried forward
    assert json.load(open(os.path.join(t.manifest_dir, "v2.json")))["files"] == other["files"]
    assert _rows(t.read(version=3)) == {("1", "a")}


def test_vacuum_keeps_live_versions(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a")], ["k", "v"]))
    t.overwrite(spark.createDataFrame([(2, "b")], ["k", "v"]))
    t.overwrite(spark.createDataFrame([(3, "c")], ["k", "v"]))
    live = set(json.load(open(os.path.join(t.manifest_dir, "v3.json")))["files"])
    removed = t.vacuum(keep_versions=1)
    assert removed >= 2  # all v1+v2 data files gone
    on_disk = {os.path.relpath(p, t.path)
               for p in glob.glob(str(tmp_path / "t" / "**" / "*.parquet"), recursive=True)}
    assert on_disk == live
    assert _rows(t.read()) == {("3", "c")}
    with pytest.raises(Exception):
        t.read(version=1).collect()
