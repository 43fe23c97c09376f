"""Deletion vectors on ManifestTable: DELETE WHERE without data-file
rewrites, read-side application, time travel/restore semantics, OPTIMIZE
fold-in, vacuum protection, and conflict detection."""

from __future__ import annotations

import glob
import json
import os

import pytest

from ecommerce_analytics_platform_spark.sources.manifest import (
    ConcurrentWriteConflict,
    ManifestTable,
)


def _mk(spark, path, n=20, parts=False):
    t = ManifestTable(spark, str(path))
    df = spark.createDataFrame(
        [(i, f"u{i % 5}", f"d{i % 3}") for i in range(n)], ["k", "user", "d"]
    )
    t.overwrite(df, partition_by=["d"] if parts else None)
    return t


def _manifest(path, v):
    # reconstructed snapshot — versions may be delta-log docs (mlog)
    from ecommerce_analytics_platform_spark.sources import mlog

    return mlog.load_snapshot(str(path), v)


def test_delete_where_is_logical_not_physical(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    m1 = _manifest(tmp_path / "t", 1)
    v = t.delete_where("user = 'u0'")
    assert v == 2
    m2 = _manifest(tmp_path / "t", 2)
    # no data file rewritten: identical file list, only the dv map is new
    assert m1["files"] == m2["files"]
    assert set(m2["dv"]) <= set(m2["files"]) and m2["dv"]
    got = {r.k for r in t.read().collect()}
    assert got == {i for i in range(20) if i % 5 != 0}


def test_deletes_accumulate_and_stay_minimal(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("user = 'u0'")
    n_dv1 = t.deleted_positions().count()
    t.delete_where("user = 'u1'")
    assert {r.k for r in t.read().collect()} == {
        i for i in range(20) if i % 5 not in (0, 1)
    }
    # re-deleting already-deleted rows adds NOTHING (live-rows contract)
    v_before = t.latest_version()
    assert t.delete_where("user = 'u0'") == v_before
    assert t.deleted_positions().count() == n_dv1 + t.read(version=2).filter(
        "user = 'u1'"
    ).count()


def test_delete_where_txn_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v = t.delete_where("k = 7", txn_id="del-7")
    assert t.delete_where("k = 7", txn_id="del-7") == v  # redelivery no-op
    assert t.read().filter("k = 7").count() == 0
    # a no-match delete with a txn id still records it
    v2 = t.delete_where("k = 777", txn_id="del-777")
    assert t.delete_where("k = 777", txn_id="del-777") == v2


def test_time_travel_and_restore_cross_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("user = 'u0'")
    assert t.read(version=1).count() == 20  # pre-delete snapshot intact
    assert t.read(version=2).count() == 16
    t.restore(1)
    assert t.read().count() == 20  # resurrection via restore
    t.restore(2)
    assert t.read().count() == 16  # and the deletion state restores too


def test_append_carries_deletes_forward(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k < 5")
    extra = spark.createDataFrame([(100, "u0", "d0")], ["k", "user", "d"])
    t.append(extra)
    got = {r.k for r in t.read().collect()}
    assert got == set(range(5, 20)) | {100}


def test_replace_partitions_drops_only_its_dv(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", parts=True)
    t.delete_where("k IN (0, 1)")  # k=0 -> d0, k=1 -> d1
    assert t.read().count() == 18
    # rewrite partition d1 from the LIVE read (deletes materialized there)
    d1 = t.read().filter("d = 'd1'")
    t.replace_partitions(d1, ["d"])
    m = _manifest(tmp_path / "t", t.latest_version())
    assert all("d=d1" not in f for f in m.get("dv", {}))  # d1 dv dropped
    assert any("d=d0" in f for f in m.get("dv", {}))  # d0 dv survives
    assert {r.k for r in t.read().collect()} == set(range(2, 20))


def test_materialize_deletes_folds_dv_into_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", parts=True)
    t.delete_where("user = 'u2'")
    before = {r.k for r in t.read().collect()}
    t.materialize_deletes()
    m = _manifest(tmp_path / "t", t.latest_version())
    assert "dv" not in m or not m["dv"]
    assert {r.k for r in t.read().collect()} == before
    # rewritten files landed back in their hive partition dirs
    assert all("d=" in f for f in m["files"])
    # physical rows now equal logical rows
    assert t.read(apply_deletes=False).count() == len(before)


def test_vacuum_protects_referenced_dv_then_reclaims(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("user = 'u3'")
    t.vacuum(keep_versions=1)
    # dv parquet referenced by the kept snapshot survives vacuum
    assert {r.k for r in t.read().collect()} == {
        i for i in range(20) if i % 5 != 3
    }
    t.materialize_deletes()
    t.vacuum(keep_versions=1)
    # nothing references the dv files now -> reclaimed
    dv_left = glob.glob(str(tmp_path / "t" / "_dv" / "**" / "*.parquet"),
                        recursive=True)
    assert dv_left == []
    assert t.read().count() == 16


def test_delete_where_partition_values_prunes_scan(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", parts=True)
    t.delete_where("k = 3", partition_values={"d": ["d0"]})
    assert t.read().filter("k = 3").count() == 0
    assert t.read().count() == 19


def test_delete_conflict_when_touched_file_rewritten(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    rival = ManifestTable(spark, str(tmp_path / "t"))
    orig_publish = t._publish

    def racing_publish(apply_fn):
        # a compaction rewrites every data file between this delete's
        # address computation and its commit -> addresses are stale
        snap = rival.read()
        rival.replace_files(list(_manifest(tmp_path / "t", 1)["files"]), snap)
        return orig_publish(apply_fn)

    t._publish = racing_publish
    with pytest.raises(ConcurrentWriteConflict):
        t.delete_where("k = 0")


def test_two_sequential_deletes_union_on_same_file(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(i, "x") for i in range(10)], ["k", "v"])
    t.overwrite(df.coalesce(1))  # one data file -> both deletes touch it
    t.delete_where("k = 1")
    t.delete_where("k = 2")
    m = _manifest(tmp_path / "t", t.latest_version())
    (f,) = [f for f in m["dv"]]
    assert len(m["dv"][f]) >= 2  # both dv files listed for the one data file
    assert {r.k for r in t.read().collect()} == set(range(10)) - {1, 2}


def test_merge_after_delete_respects_deletions(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", parts=True)
    t.delete_where("k = 6")  # k=6 -> d0
    batch = spark.createDataFrame([(9, "u9", "d0")], ["k", "user", "d"])
    t.merge_delete_insert(batch, unique_key=["k"], partition_by=["d"])
    got = {r.k for r in t.read().filter("d = 'd0'").collect()}
    assert 6 not in got and 9 in got
    assert {r.user for r in t.read().filter("k = 9").collect()} == {"u9"}


def test_two_phase_gdpr_erasure(spark, tmp_path):
    from ecommerce_analytics_platform_spark.operators.gdpr import (
        assert_forgotten,
        forget_hard,
        forget_soft,
    )

    t = _mk(spark, tmp_path / "t", parts=True)
    keys = spark.createDataFrame([("u1",)], ["user"])
    out = forget_soft(spark, t, "user", keys, txn_id="erasure-42")
    assert out["rows_deleted"] == 4
    assert t.read().filter("user = 'u1'").count() == 0  # instant logical
    # redelivered erasure request is a no-op
    assert forget_soft(spark, t, "user", keys, txn_id="erasure-42")[
        "rows_deleted"
    ] == 0
    # bytes still physically present until phase 2
    assert not assert_forgotten(spark, str(tmp_path / "t"), "user", ["u1"])
    forget_hard(spark, t)
    assert assert_forgotten(spark, str(tmp_path / "t"), "user", ["u1"])
    assert t.read().count() == 16


# -- DV-backed MERGE (VERDICT r9 directive #6) -------------------------------


def _merge_batch(spark):
    return spark.createDataFrame(
        [(3, "UPD", "d0"), (99, "NEW", "d0")], ["k", "user", "d"]
    )


def test_merge_dv_mode_tombstones_instead_of_rewriting(spark, tmp_path):
    """delete_mode='dv': matched rows become deletion-vector tombstones and
    the batch appends — NO data file is removed/rewritten, and the final
    content equals the rewrite path's."""
    t_dv = _mk(spark, tmp_path / "dv", parts=True)
    t_rw = _mk(spark, tmp_path / "rw", parts=True)
    m1 = _manifest(tmp_path / "dv", 1)

    t_dv.merge_delete_insert(
        _merge_batch(spark), unique_key=["k"], partition_by=["d"], delete_mode="dv"
    )
    t_rw.merge_delete_insert(
        _merge_batch(spark), unique_key=["k"], partition_by=["d"], delete_mode="rewrite"
    )
    want = sorted((r.k, r.user, r.d) for r in t_rw.read().collect())
    got = sorted((r.k, r.user, r.d) for r in t_dv.read().collect())
    assert got == want and (3, "UPD", "d0") in got and (3, "u3", "d0") not in got

    m2 = _manifest(tmp_path / "dv", 2)
    # every original file survives (append-only files + dv map), vs the
    # rewrite twin which replaced the whole touched partition
    assert set(m1["files"]) <= set(m2["files"])
    assert m2.get("dv"), "matched rows must be DV tombstones"
    m2_rw = _manifest(tmp_path / "rw", 2)
    assert not m2_rw.get("dv")
    assert not set(f for f in m1["files"] if "d=d0" in f) <= set(m2_rw["files"])


def test_merge_dv_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", parts=True)
    v = t.merge_delete_insert(
        _merge_batch(spark),
        unique_key=["k"],
        partition_by=["d"],
        delete_mode="dv",
        txn_id="merge-7",
    )
    n = t.read().count()
    v2 = t.merge_delete_insert(
        _merge_batch(spark),
        unique_key=["k"],
        partition_by=["d"],
        delete_mode="dv",
        txn_id="merge-7",
    )
    assert v2 == v and t.read().count() == n


def test_merge_auto_dispatch(spark, tmp_path):
    """auto: a trickle batch (small matched fraction) routes through DVs; a
    batch replacing most of the affected rows routes through rewrite."""
    t = _mk(spark, tmp_path / "t", n=60, parts=True)
    trickle = spark.createDataFrame([(0, "UPD", "d0")], ["k", "user", "d"])
    t.merge_delete_insert(
        trickle, unique_key=["k"], partition_by=["d"], delete_mode="auto"
    )
    assert _manifest(tmp_path / "t", 2).get("dv")

    bulk = spark.createDataFrame(
        [(k, "BULK", "d1") for k in range(1, 60, 3)], ["k", "user", "d"]
    )  # every d1 key
    t.merge_delete_insert(
        bulk, unique_key=["k"], partition_by=["d"], delete_mode="auto"
    )
    m3 = _manifest(tmp_path / "t", 3)
    # rewrite path: d1's old files are gone; no NEW dv entries on d1 files
    assert not any("d=d1" in f for f in m3.get("dv", {}))
    assert t.read().filter("d = 'd1' and user != 'BULK'").count() == 0


def test_merge_dv_folds_in_at_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", parts=True)
    t.merge_delete_insert(
        _merge_batch(spark), unique_key=["k"], partition_by=["d"], delete_mode="dv"
    )
    want = sorted((r.k, r.user) for r in t.read().collect())
    t.materialize_deletes()
    assert not _manifest(tmp_path / "t", t.latest_version()).get("dv")
    assert sorted((r.k, r.user) for r in t.read().collect()) == want


def test_merge_dv_change_feed_shows_update_pair(spark, tmp_path):
    """CDF interop: a DV-merge update surfaces as delete(old)+insert(new)."""
    t = _mk(spark, tmp_path / "t", parts=True)
    t.merge_delete_insert(
        _merge_batch(spark), unique_key=["k"], partition_by=["d"], delete_mode="dv"
    )
    ch = {
        (r.k, r.user, r._change_type)
        for r in t.changes_between(1, 2).select("k", "user", "_change_type").collect()
    }
    assert ch == {(3, "u3", "delete"), (3, "UPD", "insert"), (99, "NEW", "insert")}


# -- ADVICE r10: DV-merge partition pruning vs NULL / hive-escaped values ----


def _hostile_table(spark, path):
    """Partition values the raw-segment prune used to mishandle: NULL
    (written as __HIVE_DEFAULT_PARTITION__) and hive-escaped strings
    (space, slash, colon percent-encode on write)."""
    t = ManifestTable(spark, str(path))
    rows = [
        (1, "a", None),
        (2, "b", None),
        (3, "c", "has space"),
        (4, "d", "a/b:c"),
        (5, "e", "plain"),
    ]
    t.overwrite(
        spark.createDataFrame(rows, "k int, user string, d string"),
        partition_by=["d"],
    )
    return t


@pytest.mark.parametrize("mode", ["dv", "auto"])
def test_merge_dv_null_and_escaped_partition_values(spark, tmp_path, mode):
    """ADVICE r10 #1: a DV/auto merge into a NULL or hive-escaped
    partition must tombstone the matched rows — the old str(value) prune
    dropped exactly those files, silently leaving duplicate unique keys."""
    t = _hostile_table(spark, tmp_path / "t")
    batch = spark.createDataFrame(
        [(1, "A2", None), (3, "C2", "has space"), (4, "D2", "a/b:c")],
        "k int, user string, d string",
    )
    t.merge_delete_insert(
        batch, unique_key=["k"], partition_by=["d"], delete_mode=mode
    )
    got = sorted((r.k, r.user) for r in t.read().collect())
    assert got == [(1, "A2"), (2, "b"), (3, "C2"), (4, "D2"), (5, "e")]
    # unique-key contract held: no duplicates
    assert t.read().groupBy("k").count().filter("count > 1").count() == 0


def test_read_partition_values_null_and_escaped(spark, tmp_path):
    """read(partition_values=...) matches NULL against the hive default
    sentinel and escaped values against their decoded form."""
    t = _hostile_table(spark, tmp_path / "t")
    assert {r.k for r in t.read(partition_values={"d": [None]}).collect()} == {1, 2}
    assert {
        r.k for r in t.read(partition_values={"d": ["has space", "a/b:c"]}).collect()
    } == {3, 4}


def test_delete_where_null_partition_prune(spark, tmp_path):
    t = _hostile_table(spark, tmp_path / "t")
    t.delete_where("user = 'a'", partition_values={"d": [None]})
    assert {r.k for r in t.read().collect()} == {2, 3, 4, 5}


# -- ADVICE r10: DV-merge conflict window matches the rewrite path ----------


def _dv_merge_inputs(t, spark, batch_rows):
    batch = spark.createDataFrame(batch_rows, "k int, user string, d string")
    aligned, union = t._evolved(batch)
    part_vals = batch.select("d").distinct().collect()
    return aligned, union, part_vals


def test_merge_dv_conflicts_on_concurrent_commit_in_affected_partition(
    spark, tmp_path
):
    """ADVICE r10 #2: a commit landing in an affected partition between
    the merge's read and its publish must raise ConcurrentWriteConflict —
    it may carry the same unique key, and the anti-state never saw it."""
    t = _mk(spark, tmp_path / "t", parts=True)  # v1
    aligned, union, part_vals = _dv_merge_inputs(
        t, spark, [(3, "UPD", "d0")]
    )
    # racing append inserts the SAME key into the affected partition
    t.append(
        spark.createDataFrame([(3, "RACE", "d0")], "k int, user string, d string"),
        partition_by=["d"],
    )
    with pytest.raises(ConcurrentWriteConflict):
        t._merge_via_dv(1, aligned, union, ["k"], ["d"], part_vals, None)


def test_merge_dv_commutes_with_disjoint_partition_commit(spark, tmp_path):
    """A concurrent commit in a DIFFERENT partition commutes (no abort)."""
    t = _mk(spark, tmp_path / "t", parts=True)  # v1
    aligned, union, part_vals = _dv_merge_inputs(
        t, spark, [(3, "UPD", "d0")]
    )
    t.append(
        spark.createDataFrame([(200, "ok", "d1")], "k int, user string, d string"),
        partition_by=["d"],
    )
    t._merge_via_dv(1, aligned, union, ["k"], ["d"], part_vals, None)
    got = {(r.k, r.user) for r in t.read().filter("k in (3, 200)").collect()}
    assert got == {(3, "UPD"), (200, "ok")}


def test_merge_dv_public_retry_converges_after_conflict(spark, tmp_path):
    """The public merge loop re-derives on conflict: two sequential
    dv-mode merges of the same key land with a single survivor."""
    t = _mk(spark, tmp_path / "t", parts=True)
    for tag in ("first", "second"):
        t.merge_delete_insert(
            spark.createDataFrame([(3, tag, "d0")], "k int, user string, d string"),
            unique_key=["k"],
            partition_by=["d"],
            delete_mode="dv",
        )
    rows = t.read().filter("k = 3").collect()
    assert len(rows) == 1 and rows[0].user == "second"


def test_compact_applies_deletion_vectors(spark, tmp_path):
    """r11 regression pin: compacting DV-carrying files must read LIVE
    rows (DVs applied), never raw bytes — the raw read resurrected
    logically-deleted rows. Compaction also folds the touched DVs in."""
    from ecommerce_analytics_platform_spark.operators.gdpr import compact

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(i, f"u{i % 5}") for i in range(10)], ["k", "user"]))
    t.append(spark.createDataFrame([(i, f"u{i % 5}") for i in range(10, 20)], ["k", "user"]))
    t.delete_where("user = 'u0'")
    want = sorted(r.k for r in t.read().collect())
    assert len(want) == 16
    res = compact(spark, t, target_bytes=1 << 30, min_files=2)
    assert res["files_out"] < res["files_in"]
    assert sorted(r.k for r in t.read().collect()) == want
    # the compacted snapshot carries no DV entries for rewritten files
    assert not _manifest(tmp_path / "t", t.latest_version()).get("dv")


# -- r11 review batch: lost-delete races, bool partitions, flagged commutes --


def test_boolean_partition_values_prune_and_merge(spark, tmp_path):
    """r11 review #2: Spark writes flag=true/false; Python str() says
    True/False — reads and DV merges on boolean partitions must match."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", True), (2, "b", False), (3, "c", True)],
            "k int, user string, flag boolean",
        ),
        partition_by=["flag"],
    )
    assert {r.k for r in t.read(partition_values={"flag": [True]}).collect()} == {1, 3}
    t.merge_delete_insert(
        spark.createDataFrame([(1, "A2", True)], "k int, user string, flag boolean"),
        unique_key=["k"],
        partition_by=["flag"],
        delete_mode="dv",
    )
    got = sorted((r.k, r.user) for r in t.read().collect())
    assert got == [(1, "A2"), (2, "b"), (3, "c")]


def test_replace_files_aborts_when_removed_files_gain_dvs(spark, tmp_path):
    """r11 review #1 (lost-delete race): a rewrite derived from a read at
    v must abort if a concurrent delete_where tombstoned a removed file —
    committing would resurrect the deleted rows (invisibly, if flagged)."""
    t = _mk(spark, tmp_path / "t")  # v1, unpartitioned
    v = t.latest_version()
    files = _manifest(tmp_path / "t", v)["files"]
    live = t.read(version=v)
    t.delete_where("user = 'u0'")  # concurrent delete -> v2
    with pytest.raises(ConcurrentWriteConflict, match="resurrect"):
        t.replace_files(files, live.coalesce(1), expected_base=v, data_change=False)
    # deleted rows stay deleted
    assert {r.k for r in t.read().collect()} == {
        i for i in range(20) if i % 5 != 0
    }


def test_compact_aborts_on_concurrent_delete(spark, tmp_path):
    """The same race through the public compact(): simulated by pinning
    compact's read version via a racing delete between plan and apply."""
    from ecommerce_analytics_platform_spark.operators.maintenance import (
        apply_maintenance,
        maintenance_plan,
    )

    t = _mk(spark, tmp_path / "t")
    plan = [
        s for s in maintenance_plan(t, small_file_bytes=1 << 20, min_small_files=2)
        if s["op"] == "compact"
    ]
    assert plan
    t.delete_where("user = 'u1'")  # races the planned compaction
    with pytest.raises(ConcurrentWriteConflict):
        apply_maintenance(t, plan)
    assert {r.k for r in t.read().collect()} == {
        i for i in range(20) if i % 5 != 1
    }


def test_replace_partitions_conflicts_on_concurrent_dv_delete(spark, tmp_path):
    """The rewrite-merge path's conflict window now sees DV-ONLY commits
    (they change no file list): a replace derived from v must abort if a
    delete_where landed on its partitions meanwhile."""
    t = _mk(spark, tmp_path / "t", parts=True)  # v1
    v = t.latest_version()
    d0 = t.read(version=v).filter("d = 'd0'")
    t.delete_where("k = 0", partition_values={"d": ["d0"]})  # v2, DV-only
    with pytest.raises(ConcurrentWriteConflict):
        t.replace_partitions(d0, ["d"], expected_base=v)
    assert 0 not in {r.k for r in t.read().collect()}


def test_flagged_maintenance_commutes_with_dv_merge(spark, tmp_path):
    """r11 review #5: a data_change=false rewrite of OTHER files in the
    affected partition must NOT abort a DV merge (row-preserving commits
    cannot introduce new keys); the same rewrite unflagged still does."""
    for flagged in (True, False):
        t = _mk(spark, tmp_path / f"t{flagged}", parts=True)  # v1
        aligned, union, part_vals = _dv_merge_inputs(t, spark, [(3, "UPD", "d0")])
        # rewrite d0 files that do NOT hold key 3's row... key 3 lives in
        # one d0 file; rewrite the OTHER d0 rows' files by splitting: the
        # simplest disjoint target is d1 for the unflagged contrast, so
        # instead rewrite ALL d0 files minus the one holding k=3
        m = _manifest(tmp_path / f"t{flagged}", 1)
        hold3 = {
            r["__dv_file"]
            for r in t._with_position(
                t.read(version=1, apply_deletes=False)
            ).filter("k = 3").select("__dv_file").collect()
        }
        others = [f for f in m["files"] if f.startswith("d=d0") and f not in hold3]
        if not others:
            continue  # layout put everything in one file; nothing to pin
        pos = t._with_position(t.read(version=1, apply_deletes=False))
        rows = pos.filter(pos["__dv_file"].isin(others)).drop(
            "__dv_file", "__dv_pos"
        )
        t.replace_files(others, rows, partition_by=["d"], data_change=(not flagged))
        if flagged:
            t._merge_via_dv(1, aligned, union, ["k"], ["d"], part_vals, None)
            got = {(r.k, r.user) for r in t.read().filter("k = 3").collect()}
            assert got == {(3, "UPD")}
        else:
            with pytest.raises(ConcurrentWriteConflict):
                t._merge_via_dv(1, aligned, union, ["k"], ["d"], part_vals, None)
