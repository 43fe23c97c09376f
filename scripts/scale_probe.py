#!/usr/bin/env python3
"""Scale probe: time key operators at 1x and 8x sf0.1 volume.

Amplification happens in memory (explode over 8 replicas with remapped keys
and lightly perturbed content) so the probe needs no extra testdata on disk.
A healthy operator scales ~linearly or better (fixed overhead amortizes);
anything super-linear flags a plan that would not survive a 100x scale-up.
Results are recorded in PERF.md.

Usage: python scripts/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.plans.testdata_queries import _t
from ecommerce_analytics_platform_spark.session import fan_out, get_spark

COPIES = 8


def amplify(df: DataFrame, key_cols: list[str], text_col: str | None = None) -> DataFrame:
    """Union COPIES replicas: integer keys shifted per replica, string keys
    suffixed, text perturbed with a replica token (so near-dup structure is
    preserved instead of collapsing into exact duplicates)."""
    rep = df.select("*", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__r"))
    for k in key_cols:
        dt = dict(df.dtypes)[k]
        if dt in ("bigint", "int"):
            rep = rep.withColumn(k, F.col(k) + F.col("__r") * F.lit(100_000_000))
        else:
            rep = rep.withColumn(k, F.concat_ws("_", F.col(k), F.col("__r")))
    if text_col:
        rep = rep.withColumn(
            text_col, F.concat_ws(" ", F.col(text_col), F.concat(F.lit("rep"), F.col("__r")))
        )
    return rep.drop("__r")


def timed(name: str, build) -> float:
    """Time build + full materialization: iterative operators (connected
    components) run actions during construction, so the builder must run
    inside the clock."""
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    events = _t(spark, sf_dir, "events")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")

    def probes(ev, dc, em, lin):
        from ecommerce_analytics_platform_spark.operators.dedup import (
            connected_components,
            minhash_lsh_pairs,
        )
        from ecommerce_analytics_platform_spark.operators.sessionize import sessionize_by_gap
        from ecommerce_analytics_platform_spark.operators.similarity import (
            cosine_topk_blas,
            ivf_topk,
        )

        w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
        yield "hash_agg_daily", lambda: ev.groupBy(F.col("ts").cast("date")).agg(
            F.count(F.lit(1)), F.countDistinct("user_id"), F.sum("value")
        )
        yield "window_dedup", lambda: ev.withColumn("rn", F.row_number().over(w)).filter(
            "rn = 1"
        )
        yield "gap_sessionize", lambda: sessionize_by_gap(ev, "user_id", "ts", gap_seconds=1800)
        yield "session_window", lambda: ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes")
        ).agg(F.count(F.lit(1)))
        yield "minhash_lsh_pairs", lambda: minhash_lsh_pairs(dc, "doc_id", "text", 16, 4)
        yield "neardup_components", lambda: connected_components(
            minhash_lsh_pairs(dc, "doc_id", "text", 16, 4), "id_a", "id_b"
        )
        yield "ivf_topk", lambda: ivf_topk(em, em, "vec_id", "vec_id", "embedding", k=3)
        # forced sharded path: corpus size must bound TASK memory, not
        # driver memory (broadcast_threshold=0 disables the collect path)
        yield "sharded_exact_topk", lambda: cosine_topk_blas(
            em, em, "vec_id", "vec_id", "embedding", k=3,
            broadcast_threshold=0, shard_rows=2048,
        )

        def triangles():
            e0 = lin.filter(F.col("l_orderkey") % 10 == 0)
            a, b = e0.alias("a"), e0.alias("b")
            edges = (
                a.join(b, "l_orderkey")
                .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
                .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
                .distinct()
                .persist()
            )
            e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
            return (
                e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
                .join(e3, (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")))
                .groupBy(F.col("e1.src").alias("node"))
                .agg(F.count(F.lit(1)).alias("n_triangles"))
            )

        yield "triangle_count", triangles

        from ecommerce_analytics_platform_spark.operators.scd import scd2_history
        from ecommerce_analytics_platform_spark.operators.similarity import semantic_dedup

        yield "scd2_history", lambda: scd2_history(
            ev.select("user_id", "ts", "event_type", "event_id"),
            "user_id", ["event_type"], "ts", "event_id",
        )
        yield "semantic_dedup", lambda: semantic_dedup(
            em, "vec_id", "embedding", tau=0.9, n_lists=16
        )

        from ecommerce_analytics_platform_spark.operators.cdc import apply_changes
        from ecommerce_analytics_platform_spark.operators.corpus import dsir_sample
        from ecommerce_analytics_platform_spark.operators.membership import (
            bloom_bitmap,
            bloom_build,
            bloom_probe,
            cms_build,
            cms_lookup,
            hll_build,
            hll_estimate,
        )
        from ecommerce_analytics_platform_spark.operators.similarity import (
            random_projection,
        )

        def bloom_e2e():
            members = ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("key")
            ).distinct()
            bmp = bloom_bitmap(bloom_build(members, "key", 1 << 16), 1 << 16)
            return bloom_probe(
                ev.select(F.col("user_id").alias("key")), "key", bmp, 1 << 16
            )

        yield "bloom_build_probe", bloom_e2e

        def cms_e2e():
            sk = cms_build(ev, "user_id", 256)
            exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
            return cms_lookup(exact, "user_id", sk, 256)

        yield "cms_build_lookup", cms_e2e
        yield "portable_hll", lambda: hll_estimate(
            hll_build(ev, "user_id", ["event_type"]), ["event_type"]
        )
        yield "cdc_apply", lambda: apply_changes(
            None,
            ev.select(
                "user_id",
                F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
                "ts",
                "event_id",
                "value",
            ),
            ["user_id"],
            ["ts"],
            tiebreak="event_id",
        )
        yield "dsir_sample", lambda: dsir_sample(
            dc, dc.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", n_keep=100
        )
        yield "random_projection", lambda: random_projection(
            em, "vec_id", "embedding", out_dim=8
        )

        from ecommerce_analytics_platform_spark.operators.intervals import (
            merge_intervals,
        )
        from ecommerce_analytics_platform_spark.operators.membership import (
            kmv_build,
            kmv_intersect,
        )

        yield "interval_merge", lambda: merge_intervals(
            ev.select(
                "user_id",
                F.col("ts").alias("s"),
                (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("e"),
            ),
            ["user_id"],
            "s",
            "e",
        )
        yield "kmv_intersect", lambda: kmv_intersect(
            kmv_build(ev, "user_id", ["event_type"], 256), "event_type", 256
        )

    results: dict[str, list[float]] = {}
    for scale, (ev, dc, em, lin) in {
        1: (events, docs, emb, li),
        COPIES: (
            amplify(events, ["event_id", "user_id"]),
            amplify(docs, ["doc_id"], "text"),
            amplify(emb, ["vec_id"]),
            amplify(li, ["l_orderkey", "l_partkey"]),
        ),
    }.items():
        ev, dc, em, lin = fan_out(ev), fan_out(dc), fan_out(em), fan_out(lin)
        for name, build in probes(ev, dc, em, lin):
            best = min(timed(name, build) for _ in range(2))
            results.setdefault(name, []).append(best)
            print(f"{scale}x {name}: {best:.2f}s", flush=True)
            spark.catalog.clearCache()

    print(f"\n| operator | 1x | {COPIES}x | ratio |")
    print("| --- | --- | --- | --- |")
    for name, (t1, t8) in results.items():
        print(f"| {name} | {t1:.2f} s | {t8:.2f} s | {t8 / t1:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
