"""Streaming incremental entity resolution: cluster assignments
maintained per micro-batch, converging to the batch connected-components
truth over the cumulative document feed.

streaming/neardup.py answers "is this doc a near-dup of anything seen?"
(a pair-level flag). This module answers the CLUSTER question — "which
entity does this doc belong to?" — the semantics of the batch
``entity_clusters`` registry query (PPJoin/LSH pairs →
``operators/dedup.py::connected_components``), kept incrementally:

- **State** (two :class:`ManifestTable`\\ s under ``state_root``):
  ``entity_index`` — the corpus band-bucket LSH index (same layout and
  role as the near-dup index; every signable doc's buckets enter it), and
  ``entity_assign`` — one row per signable doc ever streamed:
  ``(doc_id, root, n_bucket)`` where ``root`` is the smallest doc id
  reachable through the cumulative collision graph (the exact
  ``connected_components`` contract: component = min reachable node).

- **Per batch**: sign the delta, derive collision edges against
  (index ∪ own batch), contract each edge endpoint to its CURRENT root
  via the assignment state, run connected components on the tiny
  root-graph (bounded by clusters the batch touches, not corpus size),
  then rewrite exactly the affected rows: the batch's own docs plus
  every historical member of a cluster whose root changed (a new doc can
  BRIDGE two old clusters; both get relabeled to the joint minimum).

- **Batch-split invariance**: the final assignment is a pure function of
  the cumulative edge set — root-contraction preserves connectivity and
  min-roots compose (min over a union = min of mins) — so chopping the
  feed differently (or redelivering a batch) cannot change any doc's
  cluster. tests/test_entity_stream.py asserts equality with the batch
  truth under an adversarial split (bridge doc arrives last).

- **Exactly-once**: both commits carry ``txn_id=f"...-{batch_id}"``.
  Crash between them is safe in either order: if the index append landed
  but the assignment merge was lost, the replay sees its own batch's
  buckets in the index — the derived edge set is identical (self-pairs
  are filtered, collision edges are the same) — and the merge lands; if
  the assignment landed but the index append was lost, the merge no-ops
  on its txn and the index append lands.

Scale: per batch, signing is map-only over the delta; the collision join
shuffles on (band, bucket) against the bucket-partitioned index (same
pruning story as streaming/neardup.py); the root-graph CC is bounded by
touched clusters; and the assignment rewrite is a
``merge_delete_insert`` keyed on doc_id over stable hash buckets — rows
never migrate partitions (the bucket is a function of doc_id, not root),
so the merge replaces only the buckets holding affected docs. Finding
"all members of a merged cluster" is a filter on ``root`` over the
assignment table: at warehouse scale, sort/z-order the table by root so
parquet min/max stats prune it (SCALE.md); the row volume rewritten is
bounded by the touched clusters' sizes either way.

Reference semantics: the clustering this maintains is the LSH-candidate
graph (same predicate as streaming near-dup and the batch
``neardup_clusters`` path); the exact-threshold PPJoin predicate of
``entity_clusters`` plugs in by swapping the edge derivation, the state
machinery is predicate-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ecommerce_analytics_platform_spark.functions.compat import (
    free_local_checkpoint,
)
from ecommerce_analytics_platform_spark.operators.dedup import (
    connected_components,
    lsh_band_buckets,
)
from ecommerce_analytics_platform_spark.sources.manifest import ManifestTable
from ecommerce_analytics_platform_spark.streaming.neardup import (
    _bucket_part,
    _read_index,
    read_docs_stream,
)

_N_ASSIGN_BUCKETS = 64


def _assign_bucket(col: str = "doc_id"):
    # stable: a doc's bucket never changes, so cluster relabels rewrite
    # rows in place instead of migrating them across partitions
    return F.pmod(F.hash(F.col(col)), F.lit(_N_ASSIGN_BUCKETS)).cast("int")


def process_entity_batch(
    batch_df: DataFrame,
    batch_id: int,
    assign: ManifestTable,
    index: ManifestTable,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> None:
    """One micro-batch: sign, derive edges, contract roots, merge.

    Module-level (not a closure) so tests can drive re-delivery and
    half-commit replays directly.
    """
    nb = lsh_band_buckets(
        batch_df, "doc_id", "text", num_hashes, bands, shingle_n
    ).persist()
    try:
        new_ids = nb.select(F.col("__id").alias("doc_id")).distinct()
        corpus = _read_index(index)
        all_buckets = nb.select("__id", "band", "bucket")
        if corpus is not None:
            all_buckets = all_buckets.union(
                corpus.select(F.col("doc_id").alias("__id"), "band", "bucket")
            )
        # collision edges incident to the batch (a != b; both directions
        # collapse via the canonical a<b orientation downstream in CC)
        edges = (
            nb.alias("i")
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
        index.append_once(
            nb.select(F.col("__id").alias("doc_id"), "band", "bucket").withColumn(
                "bucket_part", _bucket_part()
            ),
            txn_id=f"entity-index-{batch_id}",
            partition_by=["bucket_part"],
        )
        if remap is not None:
            # the root-graph CC's final checkpoint was fully consumed by
            # the merge commit above; free its blocks now instead of
            # accreting one generation per micro-batch until a driver GC
            free_local_checkpoint(remap)
    finally:
        nb.unpersist()


def start_streaming_entity_resolution(
    spark: SparkSession,
    raw_dir: str,
    state_root: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    available_now: bool = True,
) -> StreamingQuery:
    """NDJSON document feed → per-micro-batch incremental clustering.

    State under ``state_root``: ``entity_index`` (band-bucket LSH index)
    and ``entity_assign`` (``doc_id, root, n_bucket`` — the current
    cluster assignment of every signable doc ever streamed; ``root`` is
    the min doc id of the cluster, identical to what batch
    ``connected_components`` over the whole feed would produce).
    """
    assign = ManifestTable(spark, os.path.join(state_root, "entity_assign"))
    index = ManifestTable(spark, os.path.join(state_root, "entity_index"))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_entity_batch(
            batch_df,
            batch_id,
            assign,
            index,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
        )

    writer = (
        read_docs_stream(spark, raw_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
