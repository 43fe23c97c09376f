"""Deduplication operators.

Two families:

1. **Latest-record dedup** — the reference's core silver-layer pattern
   (reference dbt_project/models/staging/stg_clickstream_events.sql:8-33 and
   stg_orders.sql:7-32, SURVEY §2.6 W1/W2): keep, per key, the row with the
   greatest ordering column (``row_number() ... desc`` then ``rn = 1``).

2. **Near-dup detection for training corpora** (beyond the reference):
   exact-hash, MinHash+LSH banding, SimHash, n-gram Jaccard. All hashing is
   cross-engine portable (functions/compat.py) so DuckDB oracles verify them.

Scale notes (100 TB): both dedup families are single-shuffle on the dedup
key. ``dedup_latest`` uses a window (one shuffle + per-partition sort);
at extreme skew (one hot key), switch to the groupBy/max_by form
(``dedup_latest_agg``) which gets map-side partial aggregation for free.
MinHash-LSH's pair-join shuffles on (band, bucket-hash) — bucket sizes are
bounded by construction, so no skew mitigation is needed beyond AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import (
    free_local_checkpoint,
    portable_hash60,
)
from ecommerce_analytics_platform_spark.session import pin
from ecommerce_analytics_platform_spark.functions.text import minhash_table


def dedup_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
) -> DataFrame:
    """Keep one row per key: the first under ``order_by`` (pass desc() cols
    for latest-wins). Callers should include a unique tiebreaker column to
    make results deterministic (SURVEY §7 watch-list: row_number ties are
    nondeterministic in both engines).

    Reference parity: stg_clickstream_events.sql:8-33 (keys=[event_id],
    order_by=[desc(pipeline_ingested_at)]).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_latest_agg(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Skew-robust latest-wins dedup via max_by aggregation.

    Same semantics as :func:`dedup_latest` for a single ordering column, but
    executes as hash aggregation (partial + final), so a hot key combines
    map-side instead of sorting one giant window partition.
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*keys)
        .agg(F.max_by(payload, F.col(order_col)).alias("__row"))
        .select("__row.*")
    )


def dedup_exact(
    df: DataFrame,
    content_col: str,
    id_col: str,
    normalize_ws: bool = True,
) -> DataFrame:
    """Exact-content dedup: hash the (optionally whitespace-normalized)
    content, keep the smallest id per hash — one shuffle on the 60-bit hash,
    not on the full text (cheap network at 100 TB).
    """
    c = F.col(content_col)
    if normalize_ws:
        c = F.regexp_replace(F.trim(c), r"\s+", " ")
    h = portable_hash60(c)
    return (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .withColumnRenamed("__h", "content_hash")
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    content_col: str,
    id_col: str,
    normalize_ws: bool = True,
) -> DataFrame:
    """Cross-snapshot incremental dedup: keep only incoming documents whose
    content fingerprint (a) does not already exist in ``corpus`` and (b) is
    the first (min id) occurrence within the incoming batch itself.

    This is how a continuously-ingesting corpus deduplicates a delta
    WITHOUT re-deduping the whole corpus: fingerprint both sides, anti-join
    the delta against the existing fingerprint set, then self-dedup the
    delta. Returns ``(id_col, fingerprint)`` for the surviving docs.

    Scale notes: the corpus side reduces to its distinct 8-byte
    fingerprints before the join — at 100 TB that relation is ~1% of the
    text bytes and the anti-join shuffles hashes only; in production the
    corpus fingerprints would be a bucketed table so the delta join is
    shuffle-free on the corpus side (see operators/skew.py bucketing).
    """

    def fp(df: DataFrame) -> Column:
        c = F.col(content_col)
        if normalize_ws:
            c = F.regexp_replace(F.trim(c), r"\s+", " ")
        return portable_hash60(c)

    seen = corpus.select(fp(corpus).alias("fingerprint")).distinct()
    incoming = new_docs.select(F.col(id_col), fp(new_docs).alias("fingerprint"))
    fresh = incoming.join(seen, "fingerprint", "left_anti")
    return (
        fresh.groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fingerprint")
    )


def lsh_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    based: DataFrame | None = None,
    max_bucket: int | None = None,
    sig_holder: list | None = None,
    persist_sig: bool = True,
) -> DataFrame:
    """``(__id, band, bucket)`` LSH band-bucket membership — the shared
    candidate-generation primitive behind corpus self-dedup
    (:func:`minhash_lsh_pairs`) and incremental batch-vs-corpus dedup
    (:func:`neardup_against_corpus`). Persisted: every consumer joins it
    at least twice. Documents with zero shingles are unsignable and
    excluded (same contract as ``minhash_table``).

    ``sig_holder``: when given, the persisted signature table is appended
    to this list INSTEAD of entering the global session pin registry — the
    caller owns the unpersist. Streaming foreachBatch bodies use this so a
    long-running stream releases one signature cache per micro-batch
    rather than accreting pins until the next registry-query entry
    (ADVICE r7).

    ``max_bucket`` is the boilerplate guardrail (SCALE.md): a band-bucket
    holding more than ``max_bucket`` docs (every page sharing a footer)
    would make the downstream self-join quadratic in that bucket. Whole
    oversized buckets are dropped — deterministic (membership, never a
    sample) — and :func:`lsh_oversized_docs` is the flag channel that
    reports the affected docs so callers route them to the cheaper exact
    pass (boilerplate families are exact-dup families)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # persisted because every consumer joins the signature table at least
    # twice; the consuming action is the CALLER's, so lifetime goes to the
    # session pin registry (released on the next registry-query entry or
    # an explicit release_pinned()) — unless the caller takes ownership
    # via sig_holder
    # ``persist_sig=False``: a caller that consumes the banding exactly
    # ONCE (and passes max_bucket=None, so this function itself adds no
    # second traversal) opts out — caching a table read once just pays
    # the columnar cache build for nothing (guide §5: persist only when
    # reused). Forced back on when max_bucket needs the size-filter pass.
    persist_sig = persist_sig or max_bucket is not None
    sig_df = minhash_table(df, id_col, text_col, num_hashes, shingle_n, based=based)
    if persist_sig:
        sig_df = sig_df.persist()
        if sig_holder is not None:
            # streaming foreachBatch branch (ADVICE r14): the caller owns
            # the lifetime AND the consumption order — micro-batch
            # consumers are serialized by the sink, so a blocking fill
            # would add one extra job per micro-batch for nothing (the
            # same measured-negative pattern as the broadcast-build
            # consumers in fuzzy.py)
            sig_holder.append(sig_df)
        else:
            pin(sig_df)
            # blocking fill: persist_sig means MULTIPLE consumers, and
            # those consumers typically launch as concurrent stages of one
            # action (self-join sides, size-filter + join) that would race
            # the lazy fill and each recompute the shingle+MinHash
            # pipeline (r14: measured multi-second spikes on the LSH
            # self-join queries)
            sig_df.count()

    def band_struct(b: int) -> Column:
        cols = [F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)]
        bucket = portable_hash60(F.concat_ws("_", *[c.cast("string") for c in cols]))
        return F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))

    # one row per (doc, band) via a single explode — no N-way union
    out = sig_df.select(
        "__id", F.explode(F.array(*[band_struct(b) for b in range(bands)])).alias("bb")
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if max_bucket is not None:
        # count-filter BEFORE any self-join: the size agg rides the same
        # (band, bucket) shuffle the join needs anyway
        sizes = out.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
        out = (
            out.join(sizes.filter(F.col("__n") <= max_bucket), ["band", "bucket"], "left_semi")
        )
    return out


def lsh_oversized_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    based: DataFrame | None = None,
) -> DataFrame:
    """Flag channel for the ``max_bucket`` guardrail: one row per document
    that sits in at least one oversized band-bucket —
    ``(id_col, n_flagged_bands, max_bucket_size)``. These are the
    boilerplate families the capped LSH pass skips; route them to
    :func:`dedup_exact` (hash-groupBy — linear, immune to bucket skew)."""
    b = lsh_band_buckets(df, id_col, text_col, num_hashes, bands, shingle_n, based=based)
    sizes = b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
    over = sizes.filter(F.col("__n") > max_bucket)
    return (
        b.join(over, ["band", "bucket"])
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_flagged_bands"),
            F.max("__n").alias("max_bucket_size"),
        )
        .select(F.col("__id").alias(id_col), "n_flagged_bands", "max_bucket_size")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    based: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    signature → split into ``bands`` bands of ``num_hashes/bands`` rows →
    band-bucket key = hash(band minhashes) → self-join within buckets →
    distinct (id_a < id_b) pairs.

    Scale path: the only shuffle is on (band_id, bucket) — documents only
    meet if they collide in ≥1 band, so the join never goes quadratic
    PROVIDED no bucket is pathological; ``max_bucket`` enforces that
    (boilerplate mega-buckets dropped pre-join, flagged docs recoverable
    via :func:`lsh_oversized_docs`).
    Output: id_a, id_b, n_bands (how many bands collided).
    """
    # vectorized signature table (numpy Carter-Wegman family — one md5 per
    # shingle JVM-side, k hashes + segment-min in one Arrow pass). persist()
    # because the LSH self-join reads the signatures from BOTH sides —
    # without it the whole shingle+hash pipeline runs twice (measured 2x).
    # At 100 TB this persist becomes an intermediate table / DISK_ONLY
    # checkpoint.
    buckets = lsh_band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_n, based=based,
        max_bucket=max_bucket,
    )

    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.__id") < F.col("r.__id"),
            ],
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def neardup_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental NEAR-dup: LSH band-buckets of the incoming batch joined
    against the corpus's buckets — the MinHash companion to the exact
    :func:`dedup_against_corpus`. A continuously-ingesting corpus keeps its
    band-bucket table materialized (bucketed on (band, bucket)); each delta
    batch computes its own buckets (map-only over the delta) and one
    bucket-key join surfaces candidates — the corpus text is never
    re-shingled, and the join is bounded by bucket collisions, never
    |delta| × |corpus|. ``max_bucket`` caps the CORPUS side's bucket
    sizes (the skew risk at scale — a boilerplate family in the corpus
    would fan every colliding delta doc out across it).

    Output, one row per signable incoming doc: ``(id_col, n_candidates,
    matched_doc_id)`` — the distinct colliding corpus docs and the smallest
    such id (null = no collision ⇒ the doc is near-dup-fresh).
    """
    # Each side's banding is consumed exactly once by the single LEFT
    # join below, so skip the signature-table persist (lsh_band_buckets
    # re-enables it itself when max_bucket forces a second traversal).
    nb = lsh_band_buckets(
        new_docs, id_col, text_col, num_hashes, bands, shingle_n, persist_sig=False
    )
    cb = lsh_band_buckets(
        corpus,
        id_col,
        text_col,
        num_hashes,
        bands,
        shingle_n,
        max_bucket=max_bucket,
        persist_sig=False,
    )
    return neardup_join_buckets(nb, cb, id_col)


def neardup_join_buckets(nb: DataFrame, cb: DataFrame, id_col: str) -> DataFrame:
    """The candidate join + rollup tail of :func:`neardup_against_corpus`,
    over PREBANDED ``(__id, band, bucket)`` tables. Exposed separately so
    a caller whose delta and corpus derive from the SAME relation (the
    oracle-twin registry query) can band once, persist the small bucket
    table, and filter it into the two sides — one shingle+MinHash
    pipeline instead of two (r14: 1.9 -> 1.1 s at sf0.1).

    ONE traversal of the incoming side's banding: a LEFT join keeps every
    signable delta doc (each has >=1 band row), so the old shape's second
    pass over nb (distinct ids re-joined to the candidates) — two extra
    shuffles and a cache-fill race between the two concurrent stages that
    both read the persisted signature table — is gone. distinct() over
    (__id, corpus_doc) before the aggregate dedups multi-band collisions
    exactly as the old pair-distinct did; count()/min() ignore the NULL
    corpus_doc rows of collision-free docs.
    """
    return (
        nb.alias("i")
        .join(
            cb.alias("c"),
            on=[
                F.col("i.band") == F.col("c.band"),
                F.col("i.bucket") == F.col("c.bucket"),
            ],
            how="left",
        )
        .select(F.col("i.__id").alias("__id"), F.col("c.__id").alias("corpus_doc"))
        .distinct()
        .groupBy("__id")
        .agg(
            F.count("corpus_doc").alias("n_candidates"),
            F.min("corpus_doc").alias("matched_doc_id"),
        )
        .select(F.col("__id").alias(id_col), "n_candidates", "matched_doc_id")
    )


def jaccard_ngram_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    length_band: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Blocking: only compare documents whose token counts are within
    ``length_band`` relative difference (a pair below that can't reach a
    high Jaccard). For production LSH does the blocking; this operator is
    the exact verifier run on LSH candidates.
    """
    from ecommerce_analytics_platform_spark.functions.text import (
        with_materialized,
        word_shingles,
    )

    # materialize the shingle array behind a Generate before filtering:
    # a filter on the inline expression gets PUSHED to the scan, where
    # the whole shingle pipeline re-evaluates single-task on the critical
    # path (the r14 minhash/PPJoin pathology — see shingle_bases)
    base = (
        with_materialized(
            df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")),
            F.array_distinct(word_shingles(F.col("__t"), shingle_n)),
            "__sh",
        )
        .filter(F.size("__sh") > 0)
        .select("__id", "__sh")
    )

    a = base.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"), F.size("__sh").alias("n_a")
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"), F.size("__sh").alias("n_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.col("n_a") + F.col("n_b") - inter
    return (
        a.join(
            b,
            on=[
                F.col("id_a") < F.col("id_b"),
                F.col("n_a") * F.lit(length_band) <= F.col("n_b"),
                F.col("n_b") * F.lit(length_band) <= F.col("n_a"),
            ],
        )
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _uf_min_label(pairs) -> list[tuple] | None:
    """Driver union-find with min-node labels over a SMALL collected edge
    list: returns ``[(node, component)]`` where component = min node id
    reachable — exactly the fixpoint both distributed CC variants compute
    (min-label propagation and star contraction converge to the same
    labels). Returns None when any id is NULL (the distributed paths own
    NULL semantics). Python str comparison is codepoint order = UTF-8
    byte order = Spark's binary string ordering, so min labels match for
    string ids too."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        if u is None or v is None:
            return None
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    return [(n, comp_min[find(n)]) for n in parent]


# Edge-count bound under which connected components runs as a driver
# union-find over the collected edge list instead of iterative Spark
# rounds. Same discipline as the registry's 100k-row pair memo and the
# exact-top-k collect guard: below the bound the data is driver-trivial
# (the same rows a broadcast would ship) and the iterative machinery is
# pure job-launch overhead (r14: 2.3 s of driver gaps + 64-task stages
# for a 256-edge graph, vs ~0.2 s collected); above it the distributed
# rounds run unchanged — the 100 TB story does not touch this path.
_CC_DRIVER_EDGE_CAP = 100_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_cap: int = _CC_DRIVER_EDGE_CAP,
) -> DataFrame:
    """Connected components by min-label propagation: cluster id = smallest
    node id reachable through the edge set. The canonical consumer is
    near-dup clustering — LSH pairs in, one representative per duplicate
    cluster out (keep ``node == component``, drop the rest).

    Each round is one shuffle: join node labels to the (symmetrized) edge
    list, take the min neighbor label, fold into the current label.
    ``localCheckpoint`` truncates lineage so the plan does not grow with
    iterations. Rounds needed = graph diameter, which for LSH near-dup
    graphs is small (bands make clusters clique-like); for general graphs
    with long chains, switch to large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) which converges in O(log^2 n) rounds — same per-round shuffle
    structure, so the scale story is unchanged.

    Output: ``(node, component)``, one row per distinct node in ``edges``.
    """
    from pyspark.sql import Observation

    from ecommerce_analytics_platform_spark.session import literal_df

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # symmetrized distinct edge list, materialized ONCE as a checkpoint
    # (consumed every round); its row count rides on the materialization
    # via observe() and drives the driver-union-find guard below
    obs_e = Observation()
    e = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_edges = obs_e.get["n"]
    if driver_cap is not None and n_edges <= driver_cap:
        rows = _uf_min_label((r["u"], r["v"]) for r in e.collect())
        if rows is not None:
            t = e.schema["u"].dataType.simpleString()
            free_local_checkpoint(e)
            return literal_df(
                edges.sparkSession, rows, f"node {t}, component {t}"
            )
    # Labels only ever DECREASE (least of self and min neighbor), so the
    # label sum is strictly monotone until the fixpoint: comparing one
    # cheap sum per round detects convergence without the old
    # join-the-two-generations change scan. The sum rides on the round's
    # checkpoint materialization via observe() — CollectMetricsExec
    # gathers it DURING the one action the round already runs, so a round
    # is ONE job, not checkpoint + a separate agg job (r14: halves the
    # per-round driver/job overhead that dominates small graphs).
    # Sum in decimal(38,0): a plain int64 sum of 60-bit labels wraps
    # silently in non-ANSI mode, making "sum unchanged" only probabilistic.
    label_sum = F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    obs0 = Observation()
    labels = (
        e.select("u").distinct().withColumn("lbl", F.col("u"))
        .observe(obs0, label_sum)
        .localCheckpoint()
    )
    prev_sum = obs0.get["s"]
    changed = 0
    try:
        for _ in range(max_iter):
            nbr = (
                e.join(labels.withColumnsRenamed({"u": "v", "lbl": "nlbl"}), "v")
                .groupBy("u")
                .agg(F.min("nlbl").alias("nbr_lbl"))
            )
            superseded = labels
            obs = Observation()
            labels = labels.join(nbr, "u", "left").select(
                "u", F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl")
            ).observe(obs, label_sum).localCheckpoint()
            # the new generation is materialized (eager checkpoint); the
            # previous round's blocks are dead weight — free them now
            # instead of pinning O(iterations) generations until a driver
            # GC cycle reaches the ContextCleaner
            free_local_checkpoint(superseded)
            new_sum = obs.get["s"]
            changed = 0 if new_sum == prev_sum else 1
            prev_sum = new_sum
            if changed == 0:
                break
    finally:
        free_local_checkpoint(e)
    if changed != 0:
        import warnings

        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations; returned labels may split duplicate clusters. "
            "Raise max_iter (rounds needed = graph diameter) or switch to "
            "connected_components_star (large-star/small-star contraction, "
            "O(log^2 n) rounds) for long-chain graphs.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("u").alias("node"), F.col("lbl").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    driver_cap: int | None = _CC_DRIVER_EDGE_CAP,
) -> DataFrame:
    """Connected components by large-star/small-star contraction (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the long-diameter companion to :func:`connected_components`.

    Min-label propagation needs O(diameter) rounds: a 10⁶-node chain needs
    10⁶ rounds. Star contraction converges in O(log² n) rounds on ANY
    graph shape by rewiring neighborhoods instead of propagating labels:

    - **large-star** (per node u): connect every strictly-larger neighbor
      to m = min(Γ(u) ∪ {u});
    - **small-star** (per node u): connect every smaller-or-equal neighbor
      (and u itself) to that minimum.

    Each half-round is one groupBy-min + one self-join-free re-emit — the
    same single-shuffle-per-round budget as min-label, so the 100 TB cost
    model is unchanged; only the round COUNT improves on chainy graphs.
    Fixpoint: the edge multiset stabilizes into stars centered at each
    component's minimum node; detected via the monotonically decreasing
    (n_edges, sum_dst) pair. Output matches ``connected_components``:
    ``(node, component)``, component = min node id reachable.
    """
    # Materialize the (often expensive) upstream edge DAG exactly once:
    # `all_nodes` is consumed lazily by the RETURNED frame, so deriving it
    # straight from `edges` re-ran the whole upstream pipeline (e.g. the
    # LSH self-join) at the consumer's action — a full duplicate pass
    # (r14 profile: a 34 s-CPU no-shuffle stage at the end of
    # neardup_clusters_star). One narrow checkpoint feeds both the node
    # universe and the contraction rounds; `raw` is freed as soon as its
    # two eager derivatives are materialized.
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = raw.filter(F.col("u") != F.col("v"))

    def canon(df: DataFrame) -> DataFrame:
        # undirected edge set, canonical u > v orientation (u attaches to v)
        return (
            df.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
        )

    # digest = (edge count, decimal-exact sum(u), sum(v)): a cheap per-round
    # fingerprint. Distinct edge sets CAN collide on any fixed digest, so a
    # digest match is only a trigger for the exact set-equality check below
    # (count equality + one-direction anti-join) — never the stop condition
    # itself.
    digest_aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
    ]
    from pyspark.sql import Observation

    def _digest(row) -> tuple:
        return (row["n"], row["su"], row["sv"])

    # the digest rides on each generation's checkpoint materialization via
    # observe() — no separate agg job per half-round (r14, same trick as
    # connected_components: per-round driver/job overhead dominates small
    # graphs)
    obs0 = Observation()
    cur = canon(e).observe(obs0, *digest_aggs).localCheckpoint()
    free_local_checkpoint(raw)  # both eager derivatives are materialized
    prev = _digest(obs0.get)
    # driver union-find under the same edge-count guard as
    # connected_components (prev[0] = canonical edge count, already
    # observed — no extra job): the iterative star machinery is pure
    # job-launch overhead on driver-trivial graphs
    if driver_cap is not None and prev[0] <= driver_cap:
        from ecommerce_analytics_platform_spark.session import literal_df

        rows = _uf_min_label((r["u"], r["v"]) for r in cur.collect())
        nodes = [r["node"] for r in all_nodes.collect()]
        if rows is not None and all(n is not None for n in nodes):
            comp = dict(rows)
            t = all_nodes.schema["node"].dataType.simpleString()
            free_local_checkpoint(cur)
            free_local_checkpoint(all_nodes)
            return literal_df(
                edges.sparkSession,
                [(n, comp.get(n, n)) for n in nodes],
                f"node {t}, component {t}",
            )
    prev_df = cur
    converged = False
    for _ in range(max_rounds):
        # ---- large-star: neighbors strictly larger than u attach to min ----
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        before_large = cur
        cur = canon(ls.union(cur)).localCheckpoint()
        # the pre-large-star generation is superseded UNLESS it is still
        # prev_df (needed for the exact set-equality convergence check)
        if before_large is not prev_df:
            free_local_checkpoint(before_large)
        # ---- small-star: neighbors <= u (canonical orientation) attach ----
        mins2 = (
            cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .groupBy("u")
            .agg(F.min("v").alias("mn"))
        )
        mins2 = mins2.select("u", F.least("mn", F.col("u")).alias("m"))
        ss = (
            cur.join(mins2, "u")  # canonical: v <= u already
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(cur.join(mins2, "u").select("u", F.col("m").alias("v")))
        )
        after_large = cur
        obs = Observation()
        cur = canon(ss).observe(obs, *digest_aggs).localCheckpoint()
        if after_large is not prev_df:
            free_local_checkpoint(after_large)
        now = _digest(obs.get)
        if now == prev:
            # digests agree — confirm with the exact check: equal counts +
            # empty (prev \ cur) means the distinct sets are identical.
            if prev_df.join(cur, ["u", "v"], "left_anti").isEmpty():
                converged = True
                break
        prev = now
        if prev_df is not cur:
            free_local_checkpoint(prev_df)
        prev_df = cur
    if prev_df is not cur:
        # convergence broke out with the penultimate generation still
        # checkpointed; only `cur` feeds the returned labels
        free_local_checkpoint(prev_df)
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star did not converge within "
            f"max_rounds={max_rounds}; returned labels may split clusters. "
            "Raise max_rounds (O(log^2 n) rounds suffice for any graph).",
            RuntimeWarning,
            stacklevel=2,
        )
    # components: every non-center node has exactly one star edge to the
    # center (the component min); centers label themselves. Nodes are drawn
    # from the UNFILTERED edge list so self-loop-only nodes still get a
    # (node, node) label — same contract as connected_components.
    lbl = cur.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("component"))
    return all_nodes.join(lbl, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
