#!/usr/bin/env python3
"""Round-13 scale probes, reproducible (PERF.md 'Round-13 measurements').

1. cdc        — write-side CDF (VERDICT r12 next #1): a 4M-row
                UNPARTITIONED table takes a rewrite-mode merge touching 16
                rows; the CDF pass that consumes the writer-persisted
                change files vs the same pass forced to re-derive through
                the 16-bucket hash diff (the r12 best, ~5.5 s measured
                then). Also reports the derivation pass itself — the r13
                align-late reorder (next #7) applies to it.
2. nesteddiff — nested-column bucket hashing (next #3): a 4M-row table
                whose schema is ONLY nested columns takes a genuine
                rewrite; diff wall at 1 task (the r12 honest fallback)
                vs 16 buckets (now plannable).
3. cppartial  — columnar partial checkpoint loads (next #6): 100k-file
                parquet checkpoint, cold load wall for the FULL snapshot
                vs a file-list-only projection vs dv-only, against the
                inline-JSON parse floor.

Usage: python3 scripts/probe_r13.py [cdc|nesteddiff|cppartial|all]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ecommerce_analytics_platform_spark.session import get_spark
from ecommerce_analytics_platform_spark.sources.cdf_stream import (
    ManifestCDFDataSource,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable


def _stream_pass(spark, path, start="0", diff_buckets=None, use_cdc=True):
    got = []
    r = (
        spark.readStream.format("manifest_cdf")
        .option("path", path)
        .option("start_version", start)
    )
    if diff_buckets is not None:
        r = r.option("diff_buckets", str(diff_buckets))
    if not use_cdc:
        r = r.option("use_cdc", "false")
    q = (
        r.load()
        .writeStream.foreachBatch(lambda df, _e: got.append(df.count()))
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(got)


def probe_cdc(spark):
    """Writer-persisted change files make the rewrite-commit CDF read
    O(changes): same table, same commit, cdc vs bucket-hash derivation."""
    N = 4_000_000
    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    df = spark.range(N).selectExpr("id as k", "cast(id as string) as v")
    t.overwrite(df.repartition(16))  # v1, unpartitioned
    batch = spark.range(16).selectExpr("id as k", "'UPD' as v")
    t0 = time.time()
    t.merge_delete_insert(
        batch, unique_key=["k"], partition_by=[], delete_mode="rewrite"
    )  # v2: full-table rewrite, 16 rows changed, cdc persisted
    t_commit = time.time() - t0
    doc = t._read_doc(2)
    assert doc.get("cdc"), "merge must persist change files"
    _stream_pass(spark, t.path, start="latest")  # warm the source path
    # the Structured Streaming availableNow machinery has a fixed floor
    # (~1.5 s: query planning, checkpoint dir, batch commit) that has
    # nothing to do with either read strategy — measure it with a no-op
    # pass and report incremental work ABOVE it for both strategies
    t0 = time.time()
    _stream_pass(spark, t.path, start="latest")
    t_floor = time.time() - t0
    # a zero-partition no-op pass never spawns the source's python
    # workers, so the FIRST real pass of either strategy pays worker
    # spawn (~1.5 s) — run each twice and report the steady-state pass
    # (what a long-running stream, the actual deployment shape, pays)
    n_cdc = t_cdc = 0
    for _ in range(2):
        t0 = time.time()
        n_cdc = _stream_pass(spark, t.path, start="1")
        t_cdc = time.time() - t0
    n_drv = t_drv = 0
    for _ in range(2):
        t0 = time.time()
        n_drv = _stream_pass(
            spark, t.path, start="1", diff_buckets=16, use_cdc=False
        )
        t_drv = time.time() - t0
    assert n_cdc == n_drv, (n_cdc, n_drv)
    print(
        f"cdc rows={N} changed=16 commit_wall={t_commit:.2f}s "
        f"noop_floor={t_floor:.2f}s "
        f"cdf_cdc={t_cdc:.2f}s (+{t_cdc - t_floor:.2f}s over floor, rows={n_cdc}) "
        f"cdf_derived_16buckets={t_drv:.2f}s (+{t_drv - t_floor:.2f}s, rows={n_drv})"
    )


def probe_nesteddiff(spark):
    """A rewrite of a table with ONLY nested columns: r12 kept the
    single-task diff (honest fallback); arrow buffer-level hashing now
    fans it out."""
    N = 4_000_000
    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    df = spark.range(N).selectExpr(
        "array(id, id + 1) as xs",
        "named_struct('a', id, 'b', cast(id as string)) as st",
    )
    t.overwrite(df.repartition(16))  # v1
    upd = t.read().selectExpr(
        "case when st.a < 16 then array(st.a * -1) else xs end as xs", "st"
    )
    t.overwrite(upd.repartition(16))  # v2: full rewrite, 16 rows changed
    for buckets in (1, 16):
        t0 = time.time()
        n = _stream_pass(
            spark, t.path, start="1", diff_buckets=buckets, use_cdc=False
        )
        print(
            f"nesteddiff buckets={buckets:3d} diff_rows={n} "
            f"wall={time.time() - t0:.2f}s"
        )


def probe_cppartial(spark):
    """Cold snapshot load from a 100k-file parquet checkpoint: full vs
    projected (file list only / dv only) vs inline-JSON parse floor."""
    from ecommerce_analytics_platform_spark.sources import mlog

    n = 100_000
    files = [
        f"d={i % 64}/part-{i:06d}-0123456789abcdef.snappy.parquet"
        for i in range(n)
    ]
    snap = {
        "files": files,
        "txns": [f"batch-{i}" for i in range(200)],
        "ts": 1.0,
        "schema": {"type": "struct", "fields": []},
        "base_version": 15,
        "stats": {f: {"k": [i * 1000, (i + 1) * 1000]} for i, f in enumerate(files)},
        "file_meta": {f: [134217728, 1000000] for f in files},
        "dv": {files[i]: [f"_dv/x/{i}.parquet"] for i in range(0, n, 50)},
    }
    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "_manifests"))
    jp = os.path.join(d, "_manifests", "v16_inline.json")
    with open(jp, "w") as f:
        f.write(json.dumps(snap, indent=1))
    t0 = time.time()
    with open(jp) as f:
        json.load(f)
    t_json = time.time() - t0
    doc = mlog.encode_full(snap, d)
    t0 = time.time()
    full = mlog.resolve_full(doc, d)
    t_full = time.time() - t0
    t0 = time.time()
    flist = mlog.resolve_full(doc, d, columns=())
    t_files = time.time() - t0
    t0 = time.time()
    dvonly = mlog.resolve_full(doc, d, columns=("dv",))
    t_dv = time.time() - t0
    assert flist["files"] == full["files"] == snap["files"]
    assert "stats" not in flist and "stats" not in dvonly
    assert dvonly["dv"] == snap["dv"]
    print(
        f"cppartial files={n} json_load={t_json:.2f}s "
        f"parquet_full={t_full:.2f}s parquet_files_only={t_files:.2f}s "
        f"parquet_dv_only={t_dv:.2f}s"
    )


def probe_update(spark):
    """DV-backed update_where on a 4M-row range-clustered table: point
    touch-up of 16 rows, matched-row scan unpruned vs stats-pruned
    (stats_predicates), vs the full-rewrite alternative (the
    rewrite-mode merge in probe_cdc is the same table shape)."""
    N = 4_000_000
    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    t.set_stats_columns(["k"])
    df = spark.range(N).selectExpr("id as k", "cast(id as string) as v")
    t.overwrite(df, cluster_by=["k"], num_files=16)  # v2, disjoint ranges
    t0 = time.time()
    t.update_where("k < 16", set={"v": "concat('U', v)"})
    t_full = time.time() - t0
    t0 = time.time()
    v = t.update_where(
        "k >= 100 and k < 116",
        set={"v": "concat('U', v)"},
        stats_predicates=[("k", "between", 100, 115)],
    )
    t_pruned = time.time() - t0
    m = t._read_manifest(v)
    assert t.read().filter("v like 'U%'").count() == 32
    assert t.read().count() == N
    print(
        f"update rows={N} files=16 changed=16/commit "
        f"unpruned_scan={t_full:.2f}s stats_pruned={t_pruned:.2f}s "
        f"dv_files={len(m.get('dv', {}))}"
    )


def probe_checks(spark):
    """In-write CHECK enforcement cost: the same 4M-row append with zero
    constraints, with two constraints compiled into the write job, and
    the two-pass alternative (validate-then-write) the design avoids."""
    N = 4_000_000
    df = spark.range(N).selectExpr(
        "id as k", "cast(id as string) as v", "id % 97 as q"
    )
    import pyspark.sql.functions as F

    d = tempfile.mkdtemp()
    # warmup: session codegen + shuffle service + parquet writer paths
    ManifestTable(spark, d + "/warm").overwrite(df.limit(100_000))
    t0 = time.time()
    t_plain = ManifestTable(spark, d + "/plain")
    t_plain.overwrite(df.repartition(16))
    w_plain = time.time() - t0
    t1 = ManifestTable(spark, d + "/checked")
    t1.add_check_constraint("k_pos", "k >= 0")
    t1.add_check_constraint("q_range", "q between 0 and 96")
    t0 = time.time()
    t1.overwrite(df.repartition(16))
    w_checked = time.time() - t0
    # the two-pass shape the in-write compile avoids
    t0 = time.time()
    n_bad = df.where("not (k >= 0 and q between 0 and 96)").limit(1).count()
    t2 = ManifestTable(spark, d + "/twopass")
    t2.overwrite(df.repartition(16))
    w_twopass = time.time() - t0
    assert n_bad == 0
    print(
        f"checks rows={N} plain_write={w_plain:.2f}s "
        f"checked_write={w_checked:.2f}s (2 constraints in-job) "
        f"validate_then_write={w_twopass:.2f}s"
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="probe_r13")
    spark.dataSource.register(ManifestCDFDataSource)
    if which in ("cdc", "all"):
        probe_cdc(spark)
    if which in ("nesteddiff", "all"):
        probe_nesteddiff(spark)
    if which in ("cppartial", "all"):
        probe_cppartial(spark)
    if which in ("update", "all"):
        probe_update(spark)
    if which in ("checks", "all"):
        probe_checks(spark)


if __name__ == "__main__":
    main()
