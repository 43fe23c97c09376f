#!/usr/bin/env python3
"""Disk-backed 64× scale + skew probe (VERDICT r4 directive #6).

The 8× probes in ``scale_probe.py`` amplify in memory; this probe writes a
real sf0.1×64 parquet dataset ONCE (so scans, shuffles and spills hit
disk like production) and times the top shuffle-heavy operators at 1× vs
64×, plus a power-law-skewed variant exercising:

- ``salted_agg`` vs a plain groupBy on a hot-key aggregation (AQE does
  NOT split skewed aggregations — salting is the fix), and
- AQE skew-join splitting on a hot-key shuffle join (on vs off).

Amplified tables land under ``.scale64/`` (gitignored; ~1 GB; reused on
re-runs, ``--rebuild`` to regenerate). Results go into PERF.md.

Usage: python scripts/scale_probe64.py [sf_dir] [--rebuild] [--skew-only]
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

COPIES = 64
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale64")


def amplify(df: DataFrame, key_cols: list[str], text_col: str | None = None) -> DataFrame:
    """64 replicas with remapped keys (same scheme as scale_probe.py: int
    keys shifted per replica, string keys suffixed, text perturbed so
    near-dup structure is preserved rather than collapsing)."""
    rep = df.select("*", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__r"))
    for k in key_cols:
        dt = dict(df.dtypes)[k]
        if dt in ("bigint", "int"):
            rep = rep.withColumn(
                k, F.col(k) + F.col("__r").cast("long") * F.lit(100_000_000).cast("long")
            )
        else:
            rep = rep.withColumn(k, F.concat_ws("_", F.col(k), F.col("__r")))
    if text_col:
        # suffix every SECOND token with the replica id: cross-replica
        # Jaccard drops to ~1/3 (below LSH thresholds), so replicas of one
        # base doc do NOT form 64-cliques of near-dup candidate pairs —
        # that artifact made pair count (hence LSH work) grow ~64x
        # super-linear in the first probe run. Within a replica, base
        # near-dup pairs share the same suffix pattern, so the intended
        # near-dup structure is preserved and output grows linearly.
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        idx = F.sequence(F.lit(0), F.size(toks) - 1)
        rep = rep.withColumn(
            text_col,
            F.array_join(
                F.zip_with(
                    toks,
                    idx,
                    lambda t, i: F.when(
                        i % 2 == 0, F.concat(t, F.lit("_"), F.col("__r"))
                    ).otherwise(t),
                ),
                " ",
            ),
        )
    return rep.drop("__r")


def build_dataset(spark, sf_dir: str) -> None:
    """Materialize the ×64 tables + the skewed events variant to parquet.
    Multi-file output (repartition) so 64× reads arrive as real splits."""
    specs = {
        "events": (_t(spark, sf_dir, "events"), ["event_id", "user_id"], None, 32),
        "documents": (
            _t(spark, sf_dir, "documents"), ["doc_id"], "text", 32,
        ),
        "embeddings": (_t(spark, sf_dir, "embeddings"), ["vec_id"], None, 32),
        "lineitem": (
            _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            ["l_orderkey", "l_partkey"], None, 32,
        ),
    }
    for name, (df, keys, text, n_files) in specs.items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        amplify(df, keys, text).repartition(n_files).write.mode("overwrite").parquet(path)
        print(f"built {path}", flush=True)
    # power-law skew: ~80% of all event rows collapse onto ONE user — the
    # viral-user shape that turns a user_id shuffle into a straggler. (At
    # 30% the hot partition still fit one local[32] task comfortably and
    # every mitigation measured as a wash; 80% makes the straggler the
    # critical path, which is the regime the mitigations exist for.)
    # 4 extra replicas (256x total rows) — at 64x the hot partition still
    # clears one local task in ~1s and every mitigation measures as a
    # wash; the straggler has to be the critical path to measure anything
    ev64 = spark.read.parquet(os.path.join(OUT_DIR, "events.parquet"))
    ev256 = ev64.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__r2")
    ).withColumn(
        "event_id", F.col("event_id") + F.col("__r2").cast("long") * F.lit(10_000_000_000)
    ).drop("__r2")
    skew = ev256.withColumn(
        "user_id",
        F.when(F.pmod(F.hash("event_id"), F.lit(10)) < 8, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    )
    skew.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT_DIR, "events_skew.parquet")
    )
    print("built events_skew", flush=True)


def timed(build, runs: int = 1) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def probes(spark, sf_dir: str):
    """Top shuffle-heavy operators, loaded per scale from parquet."""
    ev = fan_out(_t(spark, sf_dir, "events"))
    dc = fan_out(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    em = fan_out(_t(spark, sf_dir, "embeddings"))

    from ecommerce_analytics_platform_spark.operators.cdc import apply_changes
    from ecommerce_analytics_platform_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from ecommerce_analytics_platform_spark.operators.intervals import merge_intervals
    from ecommerce_analytics_platform_spark.operators.scd import scd2_history
    from ecommerce_analytics_platform_spark.operators.sessionize import sessionize_by_gap
    from ecommerce_analytics_platform_spark.operators.similarity import (
        cosine_topk_blas,
        ivf_topk,
    )
    from ecommerce_analytics_platform_spark.plans.testdata_queries import (
        q_unigram_logprob,
    )

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
    yield "hash_agg_daily", lambda: ev.groupBy(F.col("ts").cast("date")).agg(
        F.count(F.lit(1)), F.countDistinct("user_id"), F.sum("value")
    )
    yield "window_dedup", lambda: ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    yield "gap_sessionize", lambda: sessionize_by_gap(ev, "user_id", "ts", gap_seconds=1800)
    yield "minhash_lsh_pairs", lambda: minhash_lsh_pairs(dc, "doc_id", "text", 16, 4)
    yield "neardup_components", lambda: connected_components(
        minhash_lsh_pairs(dc, "doc_id", "text", 16, 4), "id_a", "id_b"
    )
    # IVF with CONSTANT list size (n_lists scales with the corpus — the
    # production tuning; a fixed n_lists makes every list 64x longer and
    # the self-query probe quadratic, which run 1 of this probe measured
    # at 271x) and a pinned 1k query set: per-query probed volume is then
    # scale-invariant, so the ratio isolates index build + assignment.
    scale_f = max(1, round((_t(spark, sf_dir, "embeddings").count()) / 5000))
    q1k = em.filter(F.pmod(F.hash("vec_id"), F.lit(1000)) == 0).limit(1000)
    yield "ivf_build_1kq", lambda: ivf_topk(
        q1k, em, "vec_id", "vec_id", "embedding", k=3,
        n_lists=16 * scale_f, n_probe=4, kmeans_iters=3,
    )
    # exact path with a FIXED 1k query set: corpus grows 64×, query side is
    # pinned — the realistic ANN-oracle shape (all-pairs exact at 64× is
    # deliberately quadratic and excluded; scale_probe.py documents it at 8×)
    yield "sharded_topk_1kq", lambda: cosine_topk_blas(
        em.filter(F.pmod(F.hash("vec_id"), F.lit(1000)) == 0).limit(1000),
        em, "vec_id", "vec_id", "embedding", k=3,
        exclude_self=False, broadcast_threshold=0, shard_rows=8192,
    )
    yield "scd2_history", lambda: scd2_history(
        ev.select("user_id", "ts", "event_type", "event_id"),
        "user_id", ["event_type"], "ts", "event_id",
    )
    yield "cdc_apply", lambda: apply_changes(
        None,
        ev.select(
            "user_id",
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
            "ts", "event_id", "value",
        ),
        ["user_id"], ["ts"], tiebreak="event_id",
    )
    yield "unigram_logprob", lambda: q_unigram_logprob(spark, sf_dir)
    yield "interval_merge", lambda: merge_intervals(
        ev.select("user_id", F.col("ts").alias("s"),
                  (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("e")),
        ["user_id"], "s", "e",
    )
    # r6 (VERDICT r5 #8): BPE training — one corpus-wide word-count
    # shuffle, then k vocab-local pair-count rounds whose input is the
    # (bounded) distinct-word relation, NOT the corpus. Expected shape:
    # the word-count shuffle scales ~linearly; the rounds scale with
    # VOCAB growth (sub-linear in corpus rows).
    from ecommerce_analytics_platform_spark.operators.bpe import bpe_train

    yield "bpe_train_3rounds", lambda: bpe_train(dc, "text", 3)[0]
    # r6: duplicated-passage detection — one shingle-hash shuffle + one
    # doc shuffle, both linear in token count
    from ecommerce_analytics_platform_spark.plans.testdata_queries import (
        q_dup_passages,
    )

    yield "dup_passages", lambda: q_dup_passages(spark, sf_dir)
    # r6: PQ ANN with a pinned 1k query set (same shape as the IVF/exact
    # probes: corpus grows, query side fixed) — forced onto the sharded
    # path so the probe measures the scale plan, not the broadcast one
    from ecommerce_analytics_platform_spark.operators.similarity import pq_topk

    yield "pq_topk_1kq", lambda: pq_topk(
        em.filter(F.pmod(F.hash("vec_id"), F.lit(1000)) == 0).limit(1000),
        em, "vec_id", "vec_id", "embedding", k=3, k_codes=32,
        rerank_factor=16, broadcast_threshold=0, shard_rows=8192,
    )


def vocab_growth_probe(spark) -> dict[str, float]:
    """VERDICT r5 directive #1 'Done' criterion: a probe where the VOCAB
    grows with the corpus (not just the token count). Each amplified
    replica's tokens are suffixed with its replica id (recovered from the
    doc_id key shift), so vocab is 64× the base — past the LM broadcast
    cap territory. Timed on the forced-shuffle path (broadcast cap 0, the
    plan every 100 TB run would take) vs the broadcast path."""
    from ecommerce_analytics_platform_spark.functions.text import tokens as tok_f

    docs = spark.read.parquet(os.path.join(OUT_DIR, "documents.parquet"))
    rep = F.pmod((F.col("doc_id") / F.lit(100_000_000)).cast("long"), F.lit(COPIES))
    suffixed = docs.select(
        "doc_id",
        F.array_join(
            F.transform(tok_f(F.col("text")), lambda t: F.concat(t, F.lit("_"), rep)),
            " ",
        ).alias("text"),
    )
    toks = suffixed.select(
        "doc_id", F.explode(tok_f(F.col("text"))).alias("tok")
    ).select("doc_id", F.lower("tok").alias("term"))
    n_vocab = toks.select("term").distinct().count()
    print(f"vocab-growth probe: {n_vocab} distinct terms", flush=True)

    def unigram(cap):
        from ecommerce_analytics_platform_spark.plans.testdata_queries import (
            _bounded_broadcast,
        )

        vocab = _bounded_broadcast(
            toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")), cap
        )
        total = vocab.select(F.sum("cnt").alias("total"))
        scored = (
            toks.join(vocab, "term")
            .crossJoin(F.broadcast(total))
            .withColumn(
                "logp",
                F.round(F.log(F.col("cnt") / F.col("total")), 6).cast("decimal(18,6)"),
            )
        )
        return scored.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("logp").alias("s")
        )

    out = {"vocab_rows": float(n_vocab)}
    out["unigram_shuffle_join"] = timed(lambda: unigram(0))
    spark.catalog.clearCache()
    out["unigram_broadcast_join"] = timed(lambda: unigram(50_000_000))
    spark.catalog.clearCache()
    return out


def gold_cadence_probe(spark) -> dict[str, float]:
    """r6 (VERDICT r5 #8): streaming gold per-micro-batch cost must scale
    with the BATCH footprint, not warehouse history size — that is the
    whole point of the affected-date / touched-key replay design.

    Method: prime two warehouses — 1× (100 sessions, ~3 event dates) and
    64× (6400 sessions spread over ~128 days of starts, so date
    partitions actually prune) — then stream the SAME fixed 40-session
    batch (fresh dates, fresh sessions) through ``start_continuous_gold``
    against each and time that second run only. Flat ratio = the pruned
    replay contract holds; a ratio tracking 64× = a full-table recompute
    hiding somewhere."""
    import shutil
    from datetime import datetime, timedelta

    from ecommerce_analytics_platform_spark.fixtures.generator import generate_fixture
    from ecommerce_analytics_platform_spark.plans import models as M
    from ecommerce_analytics_platform_spark.sources.ndjson import (
        enrich_orders,
        read_orders_raw,
        write_ndjson_fixture,
    )
    from ecommerce_analytics_platform_spark.sources.warehouse import Warehouse
    from ecommerce_analytics_platform_spark.streaming.gold import start_continuous_gold

    out: dict[str, float] = {}
    for label, n_tranches in (("1x", 1), ("64x", 64)):
        root = os.path.join(OUT_DIR, f"gold_cadence_{label}")
        shutil.rmtree(root, ignore_errors=True)
        raw = os.path.join(root, "raw")
        wh_root = os.path.join(root, "wh")
        gold_root = os.path.join(root, "gold")
        ckpt = os.path.join(root, "ckpt")

        all_orders: list[dict] = []
        for tr in range(n_tranches):
            ev_tr, ord_tr = generate_fixture(
                seed=700 + tr, n_sessions=100, dup_rate=0.1, late_rate=0.2,
                start=datetime(2025, 1, 1) + timedelta(days=2 * tr),
            )
            write_ndjson_fixture(ev_tr, os.path.join(raw, f"prime_{tr}.json"))
            all_orders.extend(ord_tr)
        write_ndjson_fixture(all_orders, os.path.join(root, "orders", "o.json"))
        wh = Warehouse(spark, wh_root)
        wh.overwrite(
            M.stg_orders(enrich_orders(read_orders_raw(spark, os.path.join(root, "orders")))),
            "staging.stg_orders",
        )
        q = start_continuous_gold(spark, raw, wh_root, gold_root, ckpt)
        assert q.awaitTermination(1200), f"priming {label} timed out"

        # the timed, FIXED batch: fresh sessions on fresh dates
        ev_new, _ = generate_fixture(
            seed=901, n_sessions=40, dup_rate=0.1, late_rate=0.2,
            start=datetime(2026, 3, 1),
        )
        write_ndjson_fixture(ev_new, os.path.join(raw, "batch_fixed.json"))
        t0 = time.perf_counter()
        q2 = start_continuous_gold(spark, raw, wh_root, gold_root, ckpt)
        assert q2.awaitTermination(1200), f"fixed batch {label} timed out"
        out[f"gold_batch_{label}"] = time.perf_counter() - t0
        print(f"gold cadence {label}: fixed 40-session batch "
              f"{out[f'gold_batch_{label}']:.2f}s", flush=True)
    return out


def skew_probes(spark) -> dict[str, float]:
    from ecommerce_analytics_platform_spark.operators.skew import (
        salted_agg,
        skewed_count_distinct,
    )

    skew = spark.read.parquet(os.path.join(OUT_DIR, "events_skew.parquet"))
    out: dict[str, float] = {}

    # algebraic agg: map-side combine already collapses the hot key — the
    # salted variant documents ITS overhead (second shuffle) as the honest
    # baseline for when salting is NOT needed
    out["skew_agg_unsalted"] = timed(
        lambda: skew.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"),
            F.min("ts").alias("lo"), F.max("ts").alias("hi"),
        ),
        runs=2,
    )
    out["skew_agg_salted"] = timed(
        runs=2,
        build=lambda: salted_agg(
            skew,
            ["user_id"],
            {"n": ("value", "count"), "v": ("value", "sum"),
             "lo": ("ts", "min"), "hi": ("ts", "max")},
            n_salts=32,
        )
    )

    # count-distinct: partials CANNOT collapse — the hot user's ~11M
    # distinct event_ids all land on one reducer; the two-stage rewrite
    # spreads the dedup shuffle over (user_id, event_id)
    out["skew_distinct_plain"] = timed(
        lambda: skew.groupBy("user_id").agg(
            F.countDistinct("event_id").alias("n_distinct")
        ),
        runs=2,
    )
    out["skew_distinct_two_stage"] = timed(
        lambda: skewed_count_distinct(skew, ["user_id"], "event_id"), runs=2
    )

    # hot-key shuffle join: per-event join to a per-user rollup (too big to
    # broadcast when forced) — AQE skew split carves the hot partition
    users = skew.groupBy("user_id").agg(F.sum("value").alias("user_total")).hint("merge")

    def skew_join():
        return skew.join(users, "user_id").groupBy("event_type").agg(
            F.sum(F.col("value") / F.col("user_total")).alias("share")
        )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    # local[32] partitions are small; lower the split thresholds so AQE
    # treats the hot partition as skewed at this data size
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    out["skew_join_aqe_off"] = timed(skew_join, runs=2)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["skew_join_aqe_on"] = timed(skew_join, runs=2)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    return out


def r9_probes(spark, sf_dir: str) -> None:
    """r9 surface probes.

    - hamming_neardup / edit_distance_join at 1x vs 64x (complete-filter
      fuzzy joins; the amplification preserves within-replica match
      structure and forbids cross-replica matches — edit-join replicas get
      a doubled-char prefix c1c1c2c2, pairwise ed >= 2 > threshold, so
      output grows exactly 64x).
    - deletion vectors vs physical rewrite for a spread-out erasure at
      64x (the DV pitch quantified).
    - IVF index search at 1x vs 64x corpus with lists scaled to keep list
      size constant: probed volume — hence search wall — should stay
      ~flat while the index grows 64x.
    """
    import shutil

    from ecommerce_analytics_platform_spark.operators.fuzzy import (
        edit_similarity_join,
        hamming_neardup_pairs,
    )
    from ecommerce_analytics_platform_spark.functions.text import simhash_by_agg
    from ecommerce_analytics_platform_spark.operators.gdpr import forget, forget_soft
    from ecommerce_analytics_platform_spark.session import release_pinned
    from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
    from ecommerce_analytics_platform_spark.streaming.annindex import (
        ann_index_search,
        process_ann_batch,
        train_quantizer,
    )

    # 64x customer with cross-replica edit distance >= 2 (prefix c1c1c2c2)
    cust_path = os.path.join(OUT_DIR, "customer.parquet")
    if not os.path.isdir(cust_path):
        cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
        rep = cust.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__r")
        )
        c1 = F.chr(F.lit(65) + (F.col("__r") / 8).cast("int"))
        c2 = F.chr(F.lit(65) + F.pmod(F.col("__r"), F.lit(8)))
        rep = rep.select(
            (F.col("c_custkey") + F.col("__r").cast("long") * F.lit(100_000_000)).alias("c_custkey"),
            F.concat(c1, c1, c2, c2, F.col("c_name")).alias("c_name"),
        )
        rep.repartition(32).write.mode("overwrite").parquet(cust_path)
        print(f"built {cust_path}", flush=True)

    rows: list[tuple[str, float, float]] = []

    def fuzzy_probe(d, use_out):
        docs = fan_out(
            (spark.read.parquet(os.path.join(OUT_DIR, "documents.parquet"))
             if use_out else _t(spark, d, "documents")).select("doc_id", "text")
        )
        sigs = simhash_by_agg(docs, "doc_id", "text", bits=48)
        ham = lambda: hamming_neardup_pairs(sigs, "doc_id", "sig", 48, 3)  # noqa: E731
        cust = (
            spark.read.parquet(cust_path)
            if use_out else _t(spark, d, "customer").select("c_custkey", "c_name")
        )
        edj = lambda: edit_similarity_join(cust, "c_custkey", "c_name", 1, q=4)  # noqa: E731
        return [("hamming_neardup", ham), ("edit_distance_join", edj)]

    res: dict[str, list[float]] = {}
    for scale, d, use_out in ((1, sf_dir, False), (COPIES, OUT_DIR, True)):
        for name, build in fuzzy_probe(d, use_out):
            dt = timed(build, runs=2 if scale == 1 else 1)
            res.setdefault(name, []).append(dt)
            print(f"{scale}x {name}: {dt:.2f}s", flush=True)
            spark.catalog.clearCache()
            release_pinned()

    # DV vs physical rewrite at 64x: erase one base user's events (spread
    # across every file by the row layout)
    ev = spark.read.parquet(os.path.join(OUT_DIR, "events.parquet"))
    for mode in ("dv", "rewrite"):
        p = os.path.join(OUT_DIR, f"_erase_{mode}")
        shutil.rmtree(p, ignore_errors=True)
        t = ManifestTable(spark, p)
        t.overwrite(ev.repartition(64))
        keys = spark.createDataFrame([(7,)], ["user_id"])
        t0 = time.perf_counter()
        if mode == "dv":
            out = forget_soft(spark, t, "user_id", keys)
        else:
            out = forget(spark, t, "user_id", keys, vacuum=False)
        dt = time.perf_counter() - t0
        res[f"erase_{mode}_64x"] = [dt]
        print(f"erase {mode} 64x: {dt:.2f}s ({out})", flush=True)

    # IVF search: list size held constant (n_lists scales with corpus) ->
    # probed volume per query is scale-free
    for scale, src, n_lists in (
        (1, _t(spark, sf_dir, "embeddings"), 16),
        (COPIES, spark.read.parquet(os.path.join(OUT_DIR, "embeddings.parquet")), 16 * COPIES),
    ):
        emb = src.select("vec_id", "embedding")
        cents = train_quantizer(emb, "vec_id", "embedding", n_lists=n_lists, kmeans_iters=3)
        p = os.path.join(OUT_DIR, f"_annidx_{scale}")
        shutil.rmtree(p, ignore_errors=True)
        idx = ManifestTable(spark, p)
        t0 = time.perf_counter()
        process_ann_batch(spark, emb, idx, cents, "vec_id", "embedding", txn_id="b0")
        ing = time.perf_counter() - t0
        queries = emb.filter(F.col("vec_id") < 100)
        t0 = time.perf_counter()
        n = ann_index_search(
            spark, idx, cents, queries, "vec_id", "embedding", k=5, n_probe=4
        ).count()
        srch = time.perf_counter() - t0
        res[f"ann_ingest_{scale}x"] = [ing]
        res[f"ann_search_{scale}x"] = [srch]
        print(f"{scale}x ann ingest {ing:.2f}s search {srch:.2f}s ({n} rows)", flush=True)

    print(f"\n| probe | 1x | {COPIES}x (disk) | ratio |")
    print("| --- | --- | --- | --- |")
    for name, ts in res.items():
        if len(ts) == 2:
            print(f"| {name} | {ts[0]:.2f} s | {ts[1]:.2f} s | {ts[1] / ts[0]:.1f}x |")
    for name, ts in res.items():
        if len(ts) == 1:
            print(f"| {name} | — | {ts[0]:.2f} s | — |")


def r10_probes(spark, sf_dir: str) -> None:
    """r10: MERGE delete-mode geometry (VERDICT r9 directive #6 'done'
    criterion): hold CHANGED ROWS constant (one updated row per partition,
    every partition touched — the trickle-update worst case for
    partition-pruned rewrite) while the TABLE grows 1x → 64x. The claim
    under test: rewrite cost tracks touched bytes (grows with the table),
    dv cost tracks changed rows (stays ~flat — its scan is shared by both
    modes; only the WRITE differs: KB tombstones + a 48-row append vs
    rewriting every partition)."""
    import shutil
    import time

    from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable

    res: dict[str, dict[int, float]] = {"rewrite": {}, "dv": {}}
    n_parts = 48
    for scale, src in (
        (1, _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")),
        (COPIES, spark.read.parquet(os.path.join(OUT_DIR, "lineitem.parquet"))),
    ):
        li = src.withColumn(
            "d", F.pmod(F.col("l_orderkey"), F.lit(n_parts)).cast("int")
        ).withColumn("v", F.lit("old"))
        batch = (
            li.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("d").orderBy("l_orderkey", "l_partkey")
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("v", F.lit("new"))
        ).cache()
        n_batch = batch.count()
        for mode in ("rewrite", "dv"):
            p = os.path.join(OUT_DIR, f"_merge_{mode}_{scale}")
            shutil.rmtree(p, ignore_errors=True)
            t = ManifestTable(spark, p)
            t.overwrite(li, partition_by=["d"])
            t0 = time.perf_counter()
            t.merge_delete_insert(
                batch,
                unique_key=["l_orderkey", "l_partkey"],
                partition_by=["d"],
                delete_mode=mode,
            )
            res[mode][scale] = time.perf_counter() - t0
            # bytes the merge COMMIT added (new data files + dv parquet):
            # the machine-independent view of 'cost tracks changed rows'
            m1 = t._read_manifest(t.latest_version() - 1)
            m2 = t._read_manifest(t.latest_version())
            new_files = set(m2["files"]) - set(m1["files"])
            new_dv = {
                d
                for lst in m2.get("dv", {}).values()
                for d in lst
            } - {d for lst in m1.get("dv", {}).values() for d in lst}
            wrote = sum(
                os.path.getsize(os.path.join(p, f)) for f in new_files | new_dv
            )
            res.setdefault(f"{mode}_bytes", {})[scale] = wrote
            print(
                f"{scale}x merge {mode}: {res[mode][scale]:.2f}s "
                f"({n_batch} batch rows; commit wrote {wrote / 1e6:.2f} MB "
                f"across {len(new_files | new_dv)} files)",
                flush=True,
            )
            shutil.rmtree(p, ignore_errors=True)
        batch.unpersist()
    print("\n| mode | 1x | 64x (disk) | growth | 64x commit bytes |\n| --- | --- | --- | --- | --- |")
    for mode in ("rewrite", "dv"):
        r = res[mode]
        print(
            f"| merge trickle ({n_parts} changed rows, every partition touched) "
            f"— {mode} | {r[1]:.2f} s | {r[COPIES]:.2f} s | "
            f"{r[COPIES] / r[1]:.1f}x | "
            f"{res[f'{mode}_bytes'][COPIES] / 1e6:.2f} MB |"
        )


def r10_view_probe(spark) -> None:
    """CDF aggregate-view refresh cost vs base size: a constant 1k-row
    trickle commit folded through the CDF stream at 1x vs 64x base. The
    claim: refresh cost is INDEPENDENT of base size (it reads the change
    rows + touched view partitions), while the full-rescan twin grows
    with the base — the crossover is wherever rescan exceeds the view's
    fixed streaming+merge overhead. Equality is checked at 4 decimals
    (incremental double sums fold in a different order than one-shot
    groupBy — standard distributed-sum non-associativity, counts exact)."""
    import shutil
    import time

    from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
    from ecommerce_analytics_platform_spark.streaming.cdf_view import (
        read_agg_view,
        start_cdf_agg_view,
    )

    ev64 = spark.read.parquet(os.path.join(OUT_DIR, "events.parquet")).select(
        "event_id", F.col("user_id").alias("grp"), F.col("value").alias("val")
    )
    rows = []
    for scale in (1, COPIES):
        ev = ev64 if scale == COPIES else ev64.filter(
            F.col("event_id") < 100_000
        )
        root = os.path.join(OUT_DIR, f"_cdfview_{scale}")
        shutil.rmtree(root, ignore_errors=True)
        base = ManifestTable(spark, os.path.join(root, "base"))
        base.overwrite(ev.repartition(32))

        def one_pass():
            q = start_cdf_agg_view(
                spark,
                base.path,
                os.path.join(root, "view"),
                os.path.join(root, "ckpt"),
                keys=["grp"],
                value_col="val",
            )
            q.awaitTermination()

        one_pass()  # initial build (untimed here; the refresh is the claim)
        trickle = ev.orderBy("event_id").limit(1000).withColumn(
            "event_id", F.col("event_id") + F.lit(10_000_000_000)
        )
        base.append(trickle.coalesce(1))
        t0 = time.perf_counter()
        one_pass()
        incr = time.perf_counter() - t0

        t0 = time.perf_counter()
        rescan = (
            base.read()
            .groupBy("grp")
            .agg(
                F.round(F.sum("val"), 4).alias("agg_sum"),
                F.count(F.lit(1)).alias("agg_count"),
            )
        )
        rescan.write.format("noop").mode("overwrite").save()
        full = time.perf_counter() - t0

        view = ManifestTable(spark, os.path.join(root, "view"))
        got = read_agg_view(view).select(
            "grp", F.round("agg_sum", 4).alias("agg_sum"), "agg_count"
        )
        diff = got.exceptAll(rescan).count() + rescan.exceptAll(got).count()
        rows.append((scale, incr, full, diff))
        print(
            f"{scale}x: refresh {incr:.2f}s rescan {full:.2f}s "
            f"mismatch_rows {diff}",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)

    print("\n| base | view refresh (1k-row commit) | full-rescan twin | equal |")
    print("| --- | --- | --- | --- |")
    for scale, incr, full, diff in rows:
        print(f"| {scale}x | {incr:.2f} s | {full:.2f} s | {diff == 0} |")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-64", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    if "--rebuild" in sys.argv or not os.path.isdir(os.path.join(OUT_DIR, "events_skew.parquet")):
        build_dataset(spark, sf_dir)

    if "--vocab-only" in sys.argv:
        vg = vocab_growth_probe(spark)
        print(
            f"\nvocab growth (64x corpus, 64x vocab = {int(vg['vocab_rows'])} terms): "
            f"unigram logprob shuffle-join {vg['unigram_shuffle_join']:.2f}s vs "
            f"broadcast-join {vg['unigram_broadcast_join']:.2f}s"
        )
        spark.stop()
        return

    if "--r7-only" in sys.argv:
        # r7 (VERDICT r6 #9): probe rows for the r6 surface — prefix-
        # postings growth (exact set-similarity join + entity clustering)
        # and distinct-word growth (unigram-LM EM training). The memoized
        # registry wrapper is bypassed for unigram so the probe times
        # TRAINING, not a cache hit.
        from ecommerce_analytics_platform_spark.operators.unigram import unigram_train
        from ecommerce_analytics_platform_spark.plans.testdata_queries import (
            _UNI_MAXP,
            _UNI_MAXW,
            _UNI_ROUNDS,
            _UNI_SCALE,
            _UNI_SEED_MULTI,
            _UNI_VOCAB_MULTI,
            q_entity_clusters,
            q_set_sim_join,
        )
        from ecommerce_analytics_platform_spark.session import release_pinned

        def r7_probes(d):
            yield "set_sim_join", lambda: q_set_sim_join(spark, d)
            yield "entity_clusters", lambda: q_entity_clusters(spark, d)
            yield "unigram_train", lambda: unigram_train(
                fan_out(_t(spark, d, "documents").select("text")),
                "text",
                max_word_len=_UNI_MAXW,
                max_piece_len=_UNI_MAXP,
                seed_multi=_UNI_SEED_MULTI,
                vocab_multi=_UNI_VOCAB_MULTI,
                rounds=_UNI_ROUNDS,
                scale=_UNI_SCALE,
            )

        r7: dict[str, list[float]] = {}
        for scale, d in ((1, sf_dir), (COPIES, OUT_DIR)):
            for name, build in r7_probes(d):
                dt = timed(build, runs=2 if scale == 1 else 1)
                r7.setdefault(name, []).append(dt)
                print(f"{scale}x {name}: {dt:.2f}s", flush=True)
                spark.catalog.clearCache()
                release_pinned()
        print(f"\n| operator | 1x | {COPIES}x (disk) | ratio |")
        print("| --- | --- | --- | --- |")
        for name, ts in r7.items():
            if len(ts) == 2:
                print(f"| {name} | {ts[0]:.2f} s | {ts[1]:.2f} s | {ts[1] / ts[0]:.1f}x |")
        spark.stop()
        return

    if "--r9-only" in sys.argv:
        r9_probes(spark, sf_dir)
        spark.stop()
        return

    if "--r10-only" in sys.argv:
        r10_probes(spark, sf_dir)
        spark.stop()
        return

    if "--r10-view-only" in sys.argv:
        r10_view_probe(spark)
        spark.stop()
        return

    if "--gold-only" in sys.argv:
        gc = gold_cadence_probe(spark)
        print(
            f"\ngold cadence (fixed 40-session batch): 1x warehouse "
            f"{gc['gold_batch_1x']:.2f}s vs 64x warehouse "
            f"{gc['gold_batch_64x']:.2f}s "
            f"(ratio {gc['gold_batch_64x'] / gc['gold_batch_1x']:.2f}x)"
        )
        spark.stop()
        return

    results: dict[str, list[float]] = {}
    if "--skew-only" not in sys.argv:
        for scale, d in ((1, sf_dir), (COPIES, OUT_DIR)):
            runs = 2 if scale == 1 else 1
            for name, build in probes(spark, d):
                dt = timed(build, runs=runs)
                results.setdefault(name, []).append(dt)
                print(f"{scale}x {name}: {dt:.2f}s", flush=True)
                spark.catalog.clearCache()
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist(False)

    sk = skew_probes(spark)
    for k, v in sk.items():
        print(f"skew {k}: {v:.2f}s", flush=True)

    print(f"\n| operator | 1x | {COPIES}x (disk) | ratio |")
    print("| --- | --- | --- | --- |")
    for name, ts in results.items():
        if len(ts) == 2:
            print(f"| {name} | {ts[0]:.2f} s | {ts[1]:.2f} s | {ts[1] / ts[0]:.1f}x |")
    print(
        f"\nskew (64x events, 80% of rows on one user): algebraic agg "
        f"unsalted {sk['skew_agg_unsalted']:.2f}s vs salted "
        f"{sk['skew_agg_salted']:.2f}s; count-distinct plain "
        f"{sk['skew_distinct_plain']:.2f}s vs two-stage "
        f"{sk['skew_distinct_two_stage']:.2f}s; hot-key join AQE-off "
        f"{sk['skew_join_aqe_off']:.2f}s vs AQE-on {sk['skew_join_aqe_on']:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
