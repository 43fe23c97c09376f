"""Streaming incremental entity resolution: cluster assignments
maintained per micro-batch, converging to the batch connected-components
truth over the cumulative document feed.

streaming/neardup.py answers "is this doc a near-dup of anything seen?"
(a pair-level flag). This module answers the CLUSTER question — "which
entity does this doc belong to?" — the semantics of the batch
``entity_clusters`` registry query (PPJoin/LSH pairs →
``operators/dedup.py::connected_components``), kept incrementally:

- **State** (:class:`ManifestTable`\\ s under ``state_root``):
  ``entity_assign`` — one row per signable doc ever streamed:
  ``(doc_id, root, n_bucket)`` where ``root`` is the smallest doc id
  reachable through the cumulative edge graph (the exact
  ``connected_components`` contract: component = min reachable node) —
  plus the edge-derivation mode's own index tables (below).

- **Two edge modes**, sharing the contraction/merge machinery:

  * ``edge_mode="lsh"`` — collision edges from MinHash band-buckets
    (state: ``entity_index``, the same layout as the near-dup index).
    Converges to batch CC over the LSH candidate graph — the
    ``neardup_clusters`` semantics. Probabilistic (LSH false negatives
    possible), cheap.
  * ``edge_mode="ppjoin"`` — EXACT-threshold edges: Jaccard ≥ t over
    distinct word-shingle sets, the ``entity_clusters`` registry
    semantics, via an incremental prefix-filter join (PPJoin family,
    Xiao et al. 2008). State: ``entity_tokens`` (every doc's full
    distinct shingle set, for verification) and ``entity_postings``
    (each doc's PREFIX tokens — the inverted candidate index). The
    prefix order is (hash(tok), tok) — a FIXED global total order, so a
    doc's prefix never depends on arrival time or corpus statistics;
    prefix-filter completeness holds under any fixed total order
    (frequency order in the batch query is purely an optimization), so
    the cumulative verified-pair set equals the batch PPJoin pair set
    for every chopping of the feed, and the maintained clustering equals
    batch ``entity_clusters``. tests/test_entity_stream.py pins equality
    against a brute-force all-pairs Jaccard oracle across 3 choppings.

- **Per batch**: derive edges incident to the batch (candidates against
  state ∪ own batch), contract each edge endpoint to its CURRENT root
  via the assignment state, run connected components on the tiny
  root-graph (bounded by clusters the batch touches, not corpus size),
  then rewrite exactly the affected rows: the batch's own docs plus
  every historical member of a cluster whose root changed (a new doc can
  BRIDGE two old clusters; both get relabeled to the joint minimum).

- **Batch-split invariance**: the final assignment is a pure function of
  the cumulative edge set — root-contraction preserves connectivity and
  min-roots compose (min over a union = min of mins) — so chopping the
  feed differently (or redelivering a batch) cannot change any doc's
  cluster.

- **Exactly-once**: every commit carries ``txn_id=f"...-{batch_id}"``.
  Crash between commits is safe in any order: a replay that sees its own
  batch's rows already in an index derives the identical edge set (the
  state side excludes/filters the batch's own ids where double-counting
  could occur), and each ``append_once``/merge no-ops on its txn.

- **Guardrail** (``max_bucket``, LSH mode): a band-bucket holding more
  than ``max_bucket`` docs — counting index AND batch together — is a
  boilerplate family (every page sharing a footer); its edges would make
  the per-batch join quadratic AND fuse the family into one mega-cluster
  whose every relabel rewrites it. Oversized buckets are excluded from
  edge derivation, index growth is capped at ``max_bucket`` rows per
  bucket (deterministic doc_id-rank overflow drop, same as streaming
  near-dup), and the affected batch docs are reported on the
  ``entity_oversized`` flag channel ``(doc_id, n_flagged_bands,
  max_bucket_size, batch_id)`` so callers route them to the exact pass.
  Honest caveat: edges already accrued before a bucket crossed the cap
  are never retracted — under the cap the stream's clusters FREEZE
  rather than explode, and batch-split invariance is guaranteed only for
  feeds no bucket of which ever exceeds the cap.

Scale: per batch, signing/tokenizing is map-only over the delta; every
index read (LSH buckets, PPJoin postings, verification token sets) is
PRUNED at the manifest level to the partitions the batch actually
touches (``ManifestTable.read(partition_values=)`` — bucket_part /
tok_part / n_bucket are all stable hash partitions), so per-batch scan
cost tracks batch fan-out, not corpus size; the root-graph CC is bounded
by touched clusters; and the assignment rewrite is a
``merge_delete_insert`` keyed on doc_id over stable hash buckets — rows
never migrate partitions (the bucket is a function of doc_id, not root),
so the merge replaces only the buckets holding affected docs. Finding
"all members of a merged cluster" is a filter on ``root`` over the
assignment table: at warehouse scale, sort/z-order the table by root so
parquet min/max stats prune it (see ``compact_assign_zordered``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ecommerce_analytics_platform_spark.functions.compat import (
    free_local_checkpoint,
    portable_hash60,
)
from ecommerce_analytics_platform_spark.operators.dedup import (
    connected_components,
    lsh_band_buckets,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.streaming.neardup import (
    _N_BUCKET_PARTS,
    _batch_parts,
    _bucket_part,
    _capped_index_rows,
    _read_index,
    read_docs_stream,
)

_N_ASSIGN_BUCKETS = 64


def _assign_bucket(col: str = "doc_id", n_buckets: int = _N_ASSIGN_BUCKETS):
    # stable: a doc's bucket never changes, so cluster relabels rewrite
    # rows in place instead of migrating them across partitions
    return F.pmod(F.hash(F.col(col)), F.lit(n_buckets)).cast("int")


def _tok_part(n_parts: int = _N_BUCKET_PARTS):
    return F.pmod(portable_hash60(F.col("tok")), F.lit(n_parts)).cast("int")


def _merge_edges_into_assignment(
    edges: DataFrame,
    new_ids: DataFrame,
    assign: ManifestTable,
    batch_id: int,
) -> None:
    """The predicate-agnostic half of a micro-batch: given this batch's
    collision/similarity edges (both endpoints arbitrary doc ids) and the
    batch's own doc ids, contract endpoints to their current roots, solve
    the touched-cluster root graph, and merge the relabels."""
    state = _read_index(assign)
    if state is not None:
        st = state.select("doc_id", "root")
        # contract each endpoint to its current root (new nodes are
        # their own root)
        ra = st.withColumnsRenamed({"doc_id": "a", "root": "ra"})
        rb = st.withColumnsRenamed({"doc_id": "b", "root": "rb"})
        redges = (
            edges.join(ra, "a", "left")
            .join(rb, "b", "left")
            .select(
                F.coalesce("ra", F.col("a")).alias("a"),
                F.coalesce("rb", F.col("b")).alias("b"),
            )
        )
    else:
        redges = edges
    root_edges = redges.filter(F.col("a") != F.col("b")).distinct()

    # CC on the contracted graph: tiny (touched clusters + batch),
    # NOT corpus-sized. (node, component) with component = min root.
    if root_edges.isEmpty():
        remap = None
    else:
        remap = connected_components(root_edges, "a", "b").withColumnsRenamed(
            {"node": "old_root", "component": "new_root"}
        )

    # rows to rewrite: (1) every batch doc, labeled with its final
    # root; (2) every HISTORICAL member of a cluster whose root moved
    if state is not None:
        nr = new_ids.join(
            state.select("doc_id", F.col("root").alias("r0")), "doc_id", "left"
        ).select("doc_id", F.coalesce("r0", F.col("doc_id")).alias("root"))
    else:
        nr = new_ids.withColumn("root", F.col("doc_id"))
    if remap is not None:
        nr = nr.join(
            remap, nr["root"] == remap["old_root"], "left"
        ).select(
            "doc_id", F.coalesce("new_root", F.col("root")).alias("root")
        )
        if state is not None:
            moved = remap.filter(F.col("old_root") != F.col("new_root"))
            hist = (
                state.select("doc_id", "root")
                .join(moved, state["root"] == moved["old_root"])
                .select("doc_id", F.col("new_root").alias("root"))
            )
            nr = nr.unionByName(hist)
    out = (
        nr.groupBy("doc_id")
        .agg(F.min("root").alias("root"))
        .withColumn("n_bucket", _assign_bucket())
    )
    assign.merge_delete_insert(
        out,
        unique_key=["doc_id"],
        partition_by=["n_bucket"],
        txn_id=f"entity-assign-{batch_id}",
    )
    if remap is not None:
        # the root-graph CC's final checkpoint was fully consumed by
        # the merge commit above; free its blocks now instead of
        # accreting one generation per micro-batch until a driver GC
        free_local_checkpoint(remap)


def process_entity_batch(
    batch_df: DataFrame,
    batch_id: int,
    assign: ManifestTable,
    index: ManifestTable,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    oversized: ManifestTable | None = None,
    n_bucket_parts: int = _N_BUCKET_PARTS,
    bloom: ManifestTable | None = None,
) -> None:
    """One micro-batch, LSH edge mode: sign, derive collision edges,
    contract roots, merge. Module-level (not a closure) so tests can
    drive re-delivery and half-commit replays directly.

    ``max_bucket`` excludes oversized band-buckets (index ∪ batch
    counting) from edge derivation, caps index growth, and reports the
    batch docs sitting in flagged buckets to ``oversized`` when given —
    the streaming twin of ``operators/dedup.py::lsh_oversized_docs``.
    ``bloom`` enables the same per-file skipping as streaming near-dup
    (see ``streaming/neardup.py::update_index_bloom``).
    """
    from ecommerce_analytics_platform_spark.streaming.neardup import (
        _bloom_keep_files,
        update_index_bloom,
    )

    sigs: list[DataFrame] = []
    nb = lsh_band_buckets(
        batch_df, "doc_id", "text", num_hashes, bands, shingle_n,
        sig_holder=sigs,
    ).persist()
    try:
        new_ids = nb.select(F.col("__id").alias("doc_id")).distinct()
        parts = _batch_parts(nb, n_bucket_parts)
        keep = (
            _bloom_keep_files(index, bloom, nb)
            if bloom is not None and index.latest_version() is not None
            else None
        )
        corpus = _read_index(index, parts, keep)
        all_buckets = nb.select("__id", "band", "bucket")
        if corpus is not None:
            all_buckets = all_buckets.union(
                corpus.select(F.col("doc_id").alias("__id"), "band", "bucket")
            )
        nb_join = nb
        if max_bucket is not None:
            sizes = all_buckets.groupBy("band", "bucket").agg(
                F.count(F.lit(1)).alias("__n")
            )
            over = sizes.filter(F.col("__n") > max_bucket)
            if oversized is not None:
                flagged = (
                    nb.join(over, ["band", "bucket"])
                    .groupBy("__id")
                    .agg(
                        F.count(F.lit(1)).alias("n_flagged_bands"),
                        F.max("__n").alias("max_bucket_size"),
                    )
                    .select(
                        F.col("__id").alias("doc_id"),
                        "n_flagged_bands",
                        "max_bucket_size",
                        F.lit(batch_id).cast("long").alias("batch_id"),
                    )
                )
                oversized.append_once(
                    flagged, txn_id=f"entity-oversized-{batch_id}"
                )
            ok = sizes.filter(F.col("__n") <= max_bucket)
            nb_join = nb.join(ok, ["band", "bucket"], "left_semi")
            all_buckets = all_buckets.join(ok, ["band", "bucket"], "left_semi")
        # collision edges incident to the batch (a != b; both directions
        # collapse via the canonical a<b orientation downstream in CC)
        edges = (
            nb_join.alias("i")
            .join(
                all_buckets.alias("c"),
                on=[
                    F.col("i.band") == F.col("c.band"),
                    F.col("i.bucket") == F.col("c.bucket"),
                    F.col("c.__id") != F.col("i.__id"),
                ],
            )
            .select(F.col("i.__id").alias("a"), F.col("c.__id").alias("b"))
            .distinct()
        )

        _merge_edges_into_assignment(edges, new_ids, assign, batch_id)

        new_index_rows = nb.select(
            F.col("__id").alias("doc_id"), "band", "bucket"
        ).withColumn("bucket_part", _bucket_part(n_bucket_parts))
        if max_bucket is not None:
            new_index_rows = _capped_index_rows(new_index_rows, corpus, max_bucket)
        v = index.append_once(
            # clustered: one file per touched part per batch (see the
            # neardup index append for the measured 32x amplification)
            new_index_rows.repartition("bucket_part"),
            txn_id=f"entity-index-{batch_id}",
            partition_by=["bucket_part"],
        )
        if bloom is not None:
            update_index_bloom(index, bloom, v, batch_id)
    finally:
        nb.unpersist()
        for s in sigs:
            # scoped lifetime for the signature persist (ADVICE r7: a
            # long-running stream must not accrete pins per micro-batch)
            s.unpersist()


def ppjoin_batch_pairs(
    batch_df: DataFrame,
    batch_id: int,
    tokens: ManifestTable,
    postings: ManifestTable,
    consume,
    t10: int = 6,
    shingle_words: int = 3,
    n_parts: int = _N_BUCKET_PARTS,
    txn_prefix: str = "entity",
) -> None:
    """The incremental-PPJoin core shared by exact streaming entity
    resolution and exact streaming near-dup: tokenize the batch, propose
    candidates against (postings state ∪ own batch) under the fixed
    (hash60(tok), tok) prefix order, verify exactly against (token state
    ∪ own batch), call ``consume(verified_pairs, new_ids)`` — pairs are
    ``(id_a < id_b)``, every pair has ≥1 batch endpoint — then commit
    the batch's tokens and prefix postings with ``{txn_prefix}-tokens/
    postings-{batch_id}`` txns. ``consume`` runs BEFORE the state
    commits so its own commit is the first of the batch's three (any
    crash order replays cleanly — see the exactness notes on the
    callers).

    Candidate completeness across batches: each doc's prefix is its
    first ``sz − ⌈t·sz⌉ + 1`` tokens under the FIXED global order
    (hash60(tok), tok). Two sets with J ≥ t always share a prefix token
    under any single total order, and this order never changes with the
    corpus — so when the later doc of a qualifying pair arrives, the
    earlier doc's prefix is already in the postings state (or in the
    same batch) and the pair is proposed. Verification is exact: shared
    token counts via a relational join (integer compare 10·|∩| ≥
    t10·|∪| — no float boundary), the ``q_set_sim_join`` registry
    predicate.

    Replay safety: the state side of both the candidate union and the
    verification excludes the batch's own doc ids, so a half-committed
    previous attempt (tokens/postings landed, consumer commit lost)
    derives the identical pair set; all commits carry the batch txn.
    """
    from ecommerce_analytics_platform_spark.functions.text import word_shingles

    tkset = (
        batch_df.select(
            "doc_id",
            F.array_distinct(word_shingles(F.col("text"), shingle_words)).alias("tk"),
        )
        .filter(F.size("tk") > 0)
        .withColumn("sz", F.size("tk").cast("long"))
        .persist()
    )
    try:
        new_ids = tkset.select("doc_id")
        tok = tkset.select("doc_id", "sz", F.explode("tk").alias("tok"))
        # prefix under the fixed (hash, tok) order; ⌈t·sz⌉ as (t10·sz+9)//10
        w = Window.partitionBy("doc_id").orderBy(portable_hash60(F.col("tok")), "tok")
        prefix_len = (
            F.col("sz")
            - F.floor((F.lit(t10) * F.col("sz") + F.lit(9)) / F.lit(10)).cast("long")
            + 1
        )
        pref = (
            tok.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= prefix_len)
            .select("doc_id", "sz", "tok")
            .persist()
        )
        try:
            tparts = [
                r["p"]
                for r in pref.select(_tok_part(n_parts).alias("p")).distinct().collect()
            ]
            state_post = (
                postings.read(partition_values={"tok_part": tparts})
                if postings.latest_version() is not None and tparts
                else None
            )
            cand_sides = pref.select("doc_id", "sz", "tok")
            if state_post is not None:
                # exclude own ids: a half-committed replay's postings rows
                # must not double-propose (harmless for candidates, but
                # keeps the state side disjoint by construction)
                state_side = state_post.select("doc_id", "sz", "tok").join(
                    new_ids, "doc_id", "left_anti"
                )
                cand_sides = cand_sides.unionByName(state_side)
            cands = (
                pref.alias("a")
                .join(cand_sides.alias("b"), "tok")
                .filter(F.col("a.doc_id") != F.col("b.doc_id"))
                .filter(
                    F.lit(10) * F.least("a.sz", "b.sz")
                    >= F.lit(t10) * F.greatest("a.sz", "b.sz")
                )
                .select(
                    F.least("a.doc_id", "b.doc_id").alias("id_a"),
                    F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
                )
                .distinct()
                .persist()
            )
            try:
                # verification token sets: batch docs from the batch,
                # historical candidate endpoints from entity_tokens pruned
                # to the n_bucket partitions those endpoints hash into
                vtok = tok.select("doc_id", "sz", "tok")
                if tokens.latest_version() is not None:
                    # cands is persisted, so deriving the historical
                    # endpoint set twice (once collected for partition
                    # pruning, once as the semi-join filter) is cheap
                    cand_ids = (
                        cands.select(F.col("id_a").alias("doc_id"))
                        .union(cands.select(F.col("id_b").alias("doc_id")))
                        .distinct()
                        .join(new_ids, "doc_id", "left_anti")
                    )
                    vparts = [
                        r["p"]
                        for r in cand_ids.select(
                            _assign_bucket(n_buckets=n_parts).alias("p")
                        )
                        .distinct()
                        .collect()
                    ]
                    if vparts:
                        hist_tok = tokens.read(
                            partition_values={"n_bucket": vparts}
                        ).join(cand_ids, "doc_id", "left_semi")
                        vtok = vtok.unionByName(
                            hist_tok.select("doc_id", "sz", "tok")
                        )
                ta = vtok.withColumnsRenamed(
                    {"doc_id": "id_a", "sz": "sz_a"}
                )
                tb = vtok.withColumnsRenamed(
                    {"doc_id": "id_b", "sz": "sz_b"}
                )
                scored = (
                    cands.join(ta, "id_a")
                    .join(tb, ["id_b", "tok"])
                    .groupBy("id_a", "id_b", "sz_a", "sz_b")
                    .agg(F.count(F.lit(1)).alias("inter"))
                    .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                    .filter(F.lit(10) * F.col("inter") >= F.lit(t10) * F.col("uni"))
                )
                consume(scored.select("id_a", "id_b"), new_ids)
            finally:
                cands.unpersist()

            tokens.append_once(
                tok.withColumn(
                    "n_bucket", _assign_bucket(n_buckets=n_parts)
                ).repartition("n_bucket"),
                txn_id=f"{txn_prefix}-tokens-{batch_id}",
                partition_by=["n_bucket"],
            )
            postings.append_once(
                pref.withColumn("tok_part", _tok_part(n_parts)).repartition(
                    "tok_part"
                ),
                txn_id=f"{txn_prefix}-postings-{batch_id}",
                partition_by=["tok_part"],
            )
        finally:
            pref.unpersist()
    finally:
        tkset.unpersist()


def process_entity_batch_exact(
    batch_df: DataFrame,
    batch_id: int,
    assign: ManifestTable,
    tokens: ManifestTable,
    postings: ManifestTable,
    t10: int = 6,
    shingle_words: int = 3,
    n_parts: int = _N_BUCKET_PARTS,
) -> None:
    """One micro-batch, EXACT edge mode: the incremental PPJoin core
    (:func:`ppjoin_batch_pairs`) derives the ``entity_clusters``
    registry predicate's verified pairs; the shared contraction/merge
    machinery folds them into the assignment state. Crash in any order
    between the three commits replays cleanly (the core's state side
    excludes the batch's own ids)."""

    def consume(pairs: DataFrame, new_ids: DataFrame) -> None:
        edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        _merge_edges_into_assignment(edges, new_ids, assign, batch_id)

    ppjoin_batch_pairs(
        batch_df,
        batch_id,
        tokens,
        postings,
        consume,
        t10=t10,
        shingle_words=shingle_words,
        n_parts=n_parts,
        txn_prefix="entity",
    )


def compact_assign_zordered(assign: ManifestTable, n_ranges: int = 8) -> int:
    """Maintenance compaction: cluster ``entity_assign`` by ``root`` so
    the member lookup ("all docs of cluster r" — ``root = r``) prunes
    data FILES via parquet min/max stats (SCALE.md's pruning story for
    this table; single-column range clustering — the 1-D case of
    ``sources/layout.py::write_zordered``).

    The n_bucket hive partitioning is keyed on hash(doc_id), so a root
    filter can never prune PARTITIONS — members of one cluster spread
    across all buckets by design (stable doc-keyed merges). Instead:
    range-partition the rewrite tasks by ``root`` (each task owns a
    narrow root range), keep ``partitionBy(n_bucket)`` on the write —
    every bucket dir then holds ``n_ranges`` files, EACH covering a tight
    root range, and ``root = r`` reads ~1 file per bucket instead of all
    of them (pinned by the scan-stats test). Returns the committed
    version; doc-keyed merges keep working unchanged afterwards."""
    cur = assign.read()
    clustered = cur.repartitionByRange(n_ranges, "root").sortWithinPartitions(
        "root", "doc_id"
    )
    return assign.overwrite(clustered, partition_by=["n_bucket"])


def start_streaming_entity_resolution(
    spark: SparkSession,
    raw_dir: str,
    state_root: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    n_bucket_parts: int = _N_BUCKET_PARTS,
    use_bloom: bool = False,
    edge_mode: str = "lsh",
    t10: int = 6,
    shingle_words: int = 3,
    available_now: bool = True,
) -> StreamingQuery:
    """NDJSON document feed → per-micro-batch incremental clustering.

    ``edge_mode="lsh"`` (probabilistic, ``neardup_clusters`` semantics):
    state = ``entity_assign`` + ``entity_index`` (+ ``entity_oversized``
    when ``max_bucket`` is set). ``edge_mode="ppjoin"`` (exact Jaccard ≥
    t10/10, ``entity_clusters`` semantics): state = ``entity_assign`` +
    ``entity_tokens`` + ``entity_postings``.
    """
    assign = ManifestTable(spark, os.path.join(state_root, "entity_assign"))
    if edge_mode == "ppjoin":
        tokens = ManifestTable(spark, os.path.join(state_root, "entity_tokens"))
        postings = ManifestTable(spark, os.path.join(state_root, "entity_postings"))

        def process(batch_df: DataFrame, batch_id: int) -> None:
            process_entity_batch_exact(
                batch_df,
                batch_id,
                assign,
                tokens,
                postings,
                t10=t10,
                shingle_words=shingle_words,
                n_parts=n_bucket_parts,
            )
    elif edge_mode == "lsh":
        index = ManifestTable(spark, os.path.join(state_root, "entity_index"))
        oversized = (
            ManifestTable(spark, os.path.join(state_root, "entity_oversized"))
            if max_bucket is not None
            else None
        )
        bloom = (
            ManifestTable(spark, os.path.join(state_root, "entity_bloom"))
            if use_bloom
            else None
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            process_entity_batch(
                batch_df,
                batch_id,
                assign,
                index,
                num_hashes=num_hashes,
                bands=bands,
                shingle_n=shingle_n,
                max_bucket=max_bucket,
                oversized=oversized,
                n_bucket_parts=n_bucket_parts,
                bloom=bloom,
            )
    else:
        raise ValueError(f"unknown edge_mode {edge_mode!r}")

    writer = (
        read_docs_stream(spark, raw_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
