#!/usr/bin/env python3
"""Round-12 scale probes, reproducible (PERF.md 'Round-12 measurements').

1. ubdiff    — UNPARTITIONED rewrite CDF diff wall vs row-hash bucket
               fan-out: the same rewritten bytes through 1 task (the r11
               residual shape) vs 16 bucket shards (VERDICT r11 #1).
2. cpscale   — manifest checkpoint at 100k files: inline JSON doc bytes +
               cold parse wall vs parquet checkpoint side-file bytes +
               cold resolve wall (VERDICT r11 #4).
3. metastamp — maintenance_plan wall on a LEGACY (no file_meta) manifest
               vs after ONE backfill_file_meta commit (VERDICT r11 #3):
               O(files) driver stat/footer calls vs pure metadata.

Usage: python3 scripts/probe_r12.py [ubdiff|cpscale|metastamp|all]
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


def _stream_pass(spark, path, start="0", diff_buckets=None):
    got = []
    r = (
        spark.readStream.format("manifest_cdf")
        .option("path", path)
        .option("start_version", start)
    )
    if diff_buckets is not None:
        r = r.option("diff_buckets", str(diff_buckets))
    q = (
        r.load()
        .writeStream.foreachBatch(lambda df, _e: got.append(df.count()))
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(got)


def probe_ubdiff(spark):
    """One genuine rewrite commit of a 4M-row UNPARTITIONED table: the
    r11 shape funnels the whole multiset cancellation through one Python
    task; bucket sharding fans it out (hash+filter vectorized, only the
    bucket's slice materializes to Python)."""
    N = 4_000_000
    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    df = spark.range(N).selectExpr("id as k", "cast(id as string) as v")
    t.overwrite(df.repartition(16))  # v1, unpartitioned
    upd = t.read().selectExpr(
        "k", "case when k < 16 then 'UPD' else v end as v"
    )
    t.overwrite(upd.repartition(16))  # v2: full rewrite, 16 rows changed
    for buckets in (1, 16):
        t0 = time.time()
        n = _stream_pass(spark, t.path, start="1", diff_buckets=buckets)
        print(
            f"ubdiff buckets={buckets:3d} diff_rows={n} "
            f"wall={time.time() - t0:.2f}s"
        )


def probe_cpscale(spark):
    """Synthetic 100k-file snapshot (paths + per-file stats + meta):
    checkpoint BYTES and COLD-LOAD wall, inline JSON vs parquet."""
    from ecommerce_analytics_platform_spark.sources import mlog

    n = 100_000
    snap = {
        "files": [
            f"d={i % 64}/part-{i:06d}-0123456789abcdef.snappy.parquet"
            for i in range(n)
        ],
        "txns": [f"batch-{i}" for i in range(200)],
        "ts": 1.0,
        "schema": {"type": "struct", "fields": []},
        "base_version": 15,
        "stats": {
            f"d={i % 64}/part-{i:06d}-0123456789abcdef.snappy.parquet": {
                "k": [i * 1000, (i + 1) * 1000]
            }
            for i in range(n)
        },
        "file_meta": {
            f"d={i % 64}/part-{i:06d}-0123456789abcdef.snappy.parquet": [
                134217728,
                1000000,
            ]
            for i in range(n)
        },
    }
    d = tempfile.mkdtemp()
    os.makedirs(os.path.join(d, "_manifests"))
    # inline JSON (pre-r12 checkpoint shape)
    jp = os.path.join(d, "_manifests", "v16_inline.json")
    t0 = time.time()
    with open(jp, "w") as f:
        f.write(json.dumps(snap, indent=1))
    t_jw = time.time() - t0
    t0 = time.time()
    with open(jp) as f:
        json.load(f)
    t_jr = time.time() - t0
    # parquet checkpoint
    t0 = time.time()
    doc = mlog.encode_full(snap, d)
    t_pw = time.time() - t0
    cp = os.path.join(d, "_manifests", doc["checkpoint"])
    t0 = time.time()
    back = mlog.resolve_full(doc, d)
    t_pr = time.time() - t0
    assert back["files"] == snap["files"] and back["stats"] == snap["stats"]
    assert back["file_meta"] == snap["file_meta"]
    print(
        f"cpscale files={n} json_bytes={os.path.getsize(jp)} "
        f"json_write={t_jw:.2f}s json_load={t_jr:.2f}s | "
        f"parquet_bytes={os.path.getsize(cp)} "
        f"parquet_write={t_pw:.2f}s parquet_load={t_pr:.2f}s"
    )


def probe_metastamp(spark):
    """maintenance_plan over 2,048 files: legacy manifest (per-file
    stat + footer fallback) vs after one stamp_file_meta commit."""
    from ecommerce_analytics_platform_spark.operators.maintenance import (
        maintenance_plan,
    )
    from ecommerce_analytics_platform_spark.sources import mlog

    d = tempfile.mkdtemp()
    t = ManifestTable(spark, d + "/t")
    df = spark.range(2_000_000).selectExpr(
        "id as k", "cast(id % 16 as string) as d"
    )
    t.overwrite(df.repartition(2048))  # 2048 root files, unpartitioned
    # strip file_meta -> the pre-r11 manifest shape
    v = t.latest_version()
    p = os.path.join(t.manifest_dir, f"v{v}.json")
    doc = mlog.read_doc(t.path, v)
    if "checkpoint" in doc:
        doc = mlog.resolve_full(doc, t.path)
    doc.pop("file_meta", None)
    with open(p, "w") as f:
        f.write(json.dumps(doc))
    t._snap_cache.clear()
    t._staged_file_meta.clear()
    t0 = time.time()
    plan = maintenance_plan(t, keep_versions=10)
    t_legacy = time.time() - t0
    assert any(s["op"] == "stamp_file_meta" for s in plan)
    t0 = time.time()
    stamped = t.backfill_file_meta()
    t_stamp = time.time() - t0
    t0 = time.time()
    plan2 = maintenance_plan(t, keep_versions=10)
    t_meta = time.time() - t0
    assert not any(s["op"] == "stamp_file_meta" for s in plan2)
    print(
        f"metastamp files=2048 plan_legacy={t_legacy:.3f}s "
        f"stamp_once={t_stamp:.2f}s (stamped={len(stamped)}) "
        f"plan_after={t_meta:.3f}s"
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="probe_r12")
    spark.dataSource.register(ManifestCDFDataSource)
    if which in ("ubdiff", "all"):
        probe_ubdiff(spark)
    if which in ("cpscale", "all"):
        probe_cpscale(spark)
    if which in ("metastamp", "all"):
        probe_metastamp(spark)


if __name__ == "__main__":
    main()
