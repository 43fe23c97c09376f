#!/usr/bin/env python3
"""Round-11 scale probes, reproducible (PERF.md 'Round-11 measurements').

1. fulldiff   — non-append CDF diff wall vs hive partition fan-out: the
                same rewritten bytes, 1 dir vs 16 dirs (per-dir sharding).
2. bootstrap  — new-consumer cost on a CHURNED history: full CDF replay
                (reads every version's rewrite diff) vs snapshot
                bootstrap (reads live files once) vs JVM batch view init.
3. plancost   — maintenance_plan wall on a many-file table: metadata-only
                planning (manifest file_meta) never touches the data tree.
4. logscale   — per-commit log cost vs table size: bytes + wall of a
                1-file append on a 2048-file table, delta-log format vs
                forced full-snapshot docs (the pre-r11 behavior).
5. bloom      — point lookup on an unclustered high-cardinality key:
                full scan vs Bloom-sidecar file skipping (512 files).
6. mergebloom — point-update DV merge on an unpartitioned table, with
                and without the Bloom index pruning the matched scan.

Usage: python3 scripts/probe_r11.py
       [fulldiff|bootstrap|plancost|logscale|bloom|mergebloom|all]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ecommerce_analytics_platform_spark.session import get_spark
from ecommerce_analytics_platform_spark.sources.cdf_stream import (
    ManifestCDFDataSource,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable


def _stream_pass(spark, path, start="0"):
    got = []
    q = (
        spark.readStream.format("manifest_cdf")
        .option("path", path)
        .option("start_version", start)
        .load()
        .writeStream.foreachBatch(lambda df, _e: got.append(df.count()))
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(got)


def probe_fulldiff(spark):
    N = 4_000_000
    for ndirs in (1, 16):
        d = tempfile.mkdtemp()
        t = ManifestTable(spark, d + "/t")
        df = spark.range(N).selectExpr(
            "id as k",
            "cast(id as string) as v",
            f"cast(id % {ndirs} as string) as d",
        )
        t.overwrite(df.repartition(ndirs), partition_by=["d"])  # v1
        batch = spark.createDataFrame(
            [(i, "UPD", str(i % ndirs)) for i in range(ndirs)],
            "k long, v string, d string",
        )
        t.merge_delete_insert(
            batch, unique_key=["k"], partition_by=["d"], delete_mode="rewrite"
        )  # v2: full-rewrite of every partition
        t0 = time.time()
        n = _stream_pass(spark, t.path, start="1")
        print(
            f"fulldiff dirs={ndirs:3d} diff_rows={n} wall={time.time()-t0:.2f}s"
        )


def probe_bootstrap(spark):
    # churned history: base + 40 rewrite-mode merges, each rewriting one
    # of 8 partitions — history bytes >> live bytes
    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    N = 1_000_000
    df = spark.range(N).selectExpr(
        "id as k", "cast(id as string) as v", "cast(id % 8 as string) as d"
    )
    t.overwrite(df.repartition(8), partition_by=["d"])
    for i in range(40):
        t.merge_delete_insert(
            spark.createDataFrame(
                [(i, f"U{i}", str(i % 8))], "k long, v string, d string"
            ),
            unique_key=["k"],
            partition_by=["d"],
            delete_mode="rewrite",
        )
    t0 = time.time()
    n_replay = _stream_pass(spark, t.path, start="0")
    t_replay = time.time() - t0
    t0 = time.time()
    n_snap = _stream_pass(spark, t.path, start="snapshot")
    t_snap = time.time() - t0
    from ecommerce_analytics_platform_spark.streaming.cdf_view import (
        bootstrap_cdf_agg_view,
    )

    t0 = time.time()
    bootstrap_cdf_agg_view(
        spark, t.path, tempfile.mkdtemp() + "/view", keys=["d"], value_col="k"
    )
    t_jvm = time.time() - t0
    print(
        f"bootstrap history=41v live={N} replay_rows={n_replay} "
        f"replay={t_replay:.2f}s snapshot_rows={n_snap} snapshot={t_snap:.2f}s "
        f"jvm_view_init={t_jvm:.2f}s"
    )


def probe_plancost(spark):
    from ecommerce_analytics_platform_spark.operators.maintenance import (
        maintenance_plan,
    )

    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    # 512 small files across 16 partitions
    df = spark.range(500_000).selectExpr(
        "id as k", "cast(id % 16 as string) as d"
    )
    t.overwrite(df.repartition(512), partition_by=["d"])
    n_files = len(t._read_manifest(t.latest_version())["files"])
    t0 = time.time()
    plan = maintenance_plan(t, small_file_bytes=1 << 20, min_small_files=2)
    print(
        f"plancost files={n_files} plan_steps={len(plan)} "
        f"wall={time.time()-t0:.3f}s (manifest-only; no data-tree stat sweep)"
    )


def probe_logscale(spark):
    """Commit cost must track COMMIT size, not TABLE size (mlog delta
    docs). Same 1-row append onto the same 2048-file table, once with
    the delta log and once with checkpoint_interval=1 (every doc full —
    the pre-r11 format)."""
    import json
    import os

    for mode, interval in (("full-doc(r10)", 1), ("delta-log(r11)", 16)):
        d = tempfile.mkdtemp()
        t = ManifestTable(spark, d + "/t")
        t.checkpoint_interval = interval
        t.set_stats_columns(["k"])
        base = spark.range(1_000_000).selectExpr("id as k", "id % 16 as d")
        t.overwrite(base.repartition(1024))  # exactly 1024 files
        one = spark.createDataFrame([(9_999_999, 0)], ["k", "d"])
        walls, sizes = [], []
        for _ in range(3):
            t0 = time.time()
            v = t.append(one.coalesce(1))
            walls.append(time.time() - t0)
            mf = os.path.join(t.path, "_manifests", f"v{v}.json")
            sizes.append(os.path.getsize(mf))
        doc = json.load(open(mf))
        kind = "full" if "files" in doc else "delta"
        print(
            f"logscale {mode}: 1-file append on 1024-file table -> "
            f"doc={kind} log_bytes(min)={min(sizes)} "
            f"append_wall(min)={min(walls):.3f}s",
            flush=True,
        )


def probe_bloom(spark):
    """Point lookup on an UNCLUSTERED high-cardinality key: min/max
    stats can't prune (every file's range straddles every needle), the
    Bloom sidecar prunes to ~1 file. 512 files, 4M rows."""
    import random

    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    t.set_bloom_columns(["k"])
    t.set_stats_columns(["k"])
    # shuffled keys -> every file spans ~the full key range
    base = spark.range(4_000_000).selectExpr(
        "cast(hash(id) as bigint) * 4000000 + id as k", "id as v"
    )
    t.overwrite(base.repartition(512))
    needles = [r["k"] for r in t.read().sample(0.00001).limit(5).collect()]
    # full-scan side
    t0 = time.time()
    for n in needles:
        t.read().filter(f"k = {n}").count()
    full_wall = time.time() - t0
    # bloom-pruned side
    t0 = time.time()
    opened = []
    for n in needles:
        df = t.read(stats_predicates=[("k", "=", int(n))])
        opened.append(len(df.inputFiles()))
        assert df.filter(f"k = {n}").count() == 1
    bloom_wall = time.time() - t0
    print(
        f"bloom point-lookup x{len(needles)} on 512-file/4M-row table: "
        f"full-scan {full_wall:.2f}s (512 files each) vs bloom-pruned "
        f"{bloom_wall:.2f}s (files opened per lookup: {opened})"
    )


def probe_mergebloom(spark):
    """Point-update DV merge on an UNPARTITIONED bloom-indexed table:
    the matched-row scan reads only bloom-candidate files. Same 5-row
    batch, same 256-file/2M-row table, with and without the index."""
    for mode in ("no-bloom", "bloom"):
        d = tempfile.mkdtemp()
        t = ManifestTable(spark, d + "/t")
        if mode == "bloom":
            t.set_bloom_columns(["k"])
        base = spark.range(2_000_000).selectExpr(
            "cast(hash(id) as bigint) * 2000000 + id as k", "id as v"
        )
        t.overwrite(base.repartition(256))
        needles = [r["k"] for r in t.read().sample(0.00002).limit(5).collect()]
        batch = spark.createDataFrame([(int(k), -1) for k in needles], ["k", "v"])
        t0 = time.time()
        t.merge_delete_insert(batch, unique_key=["k"], partition_by=[],
                              delete_mode="dv")
        wall = time.time() - t0
        dv = t._read_manifest(t.latest_version()).get("dv", {})
        print(
            f"mergebloom {mode}: 5-key dv merge on 256-file/2M-row "
            f"unpartitioned table -> {wall:.2f}s (files tombstoned: {len(dv)})",
            flush=True,
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark()
    spark.dataSource.register(ManifestCDFDataSource)
    if which in ("fulldiff", "all"):
        probe_fulldiff(spark)
    if which in ("bootstrap", "all"):
        probe_bootstrap(spark)
    if which in ("plancost", "all"):
        probe_plancost(spark)
    if which in ("logscale", "all"):
        probe_logscale(spark)
    if which in ("bloom", "all"):
        probe_bloom(spark)
    if which in ("mergebloom", "all"):
        probe_mergebloom(spark)
