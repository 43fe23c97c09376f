"""Corpus-preparation operators for large-scale training-data pipelines:
eval-set decontamination, inverted-index construction, token-budget
sampling, stratum-balanced sampling, and an exact integer PageRank for
link/co-occurrence-graph quality weighting.

These extend the reference's surface (it has no corpus tooling —
/root/reference is a medallion e-commerce ETL, SURVEY §0); each operator is
expressed with built-in DataFrame ops only (no Python UDFs), so the whole
family runs JVM-side under whole-stage codegen and scales with the
cluster's shuffle capacity.

Scale notes (100 TB):

- ``ngram_overlap``: the eval side of the join is tiny (benchmark suites
  are MBs) — broadcast it; the train side streams map-side. Shuffle only
  for the final per-doc count.
- ``inverted_index``: one shuffle on the term; posting lists for stop-like
  terms are the skew risk — cap with ``max_postings`` (head retained
  deterministically) exactly like production index builders.
- ``token_budget_sample``: the running sum is per-shard (hash-sharded), so
  state never concentrates on one task; the budget is enforced per shard
  (global budget / n_shards), which is how petabyte samplers bound memory.
- ``pagerank``: classic iterate-join-aggregate; every iteration is one
  shuffle on dst. Integer (fixed-point) arithmetic makes the result
  bit-exact regardless of partitioning/summation order — the property that
  lets a 1000-executor run be verified against a single-node oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import (
    free_local_checkpoint,
    portable_hash60,
    seeded_hash60,
)
from ecommerce_analytics_platform_spark.functions.text import tokens, word_shingles


class _CkptFreePin:
    """Pin adapter: defers ``free_local_checkpoint`` of an iteration-
    infrastructure checkpoint to the session pin registry (released when
    the next registry query enters — by which time the owning query's
    action has materialized and consumed it). Used by the lazy
    (``eager=False``) mode of the iterative operators, where the inline
    free would run BEFORE the single consuming action materializes the
    blocks.

    ORDERING INVARIANT (ADVICE r14): ``eager=False`` correctness depends
    on the caller running its consuming action BEFORE anything drains
    the pin registry (``release_pinned()`` / the next registry-query
    entry). If the pin drains first, this adapter unpersists a lazy,
    never-materialized localCheckpoint whose lineage is already
    truncated — the later action can fail or silently recompute the full
    lineage. Registry queries satisfy the invariant structurally (one
    query's action always runs before the next query enters); library
    callers using ``eager=False`` own it themselves."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self, blocking: bool = False) -> None:
        free_local_checkpoint(self._df)


def _free_or_pin(df: DataFrame, eager: bool) -> None:
    if eager:
        free_local_checkpoint(df)
    else:
        from ecommerce_analytics_platform_spark.session import pin

        pin(_CkptFreePin(df))


def ngram_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing ≥1 word
    ``n``-gram with any eval document (the standard pretraining-corpus
    hygiene pass; cf. GPT-3 appendix C / PaLM §C — n-gram collision
    filtering).

    Returns one row per contaminated train doc:
    ``(doc_id, n_shared_grams, n_eval_docs)`` where ``n_shared_grams``
    counts DISTINCT shared n-grams and ``n_eval_docs`` counts eval docs
    hit. The eval gram set is deduped then broadcast — at corpus scale the
    train side never shuffles its text, only (doc_id, gram) pairs that
    actually collide.
    """
    t_grams = train.select(
        F.col(id_col), F.explode_outer(word_shingles(F.col(text_col), n)).alias("gram")
    ).where(F.col("gram").isNotNull())
    e_grams = (
        eval_set.select(
            F.col(id_col).alias("eval_id"),
            F.explode_outer(word_shingles(F.col(text_col), n)).alias("gram"),
        )
        .where(F.col("gram").isNotNull())
        .distinct()
    )
    return (
        t_grams.join(F.broadcast(e_grams), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_postings: int | None = None,
) -> DataFrame:
    """Posting-list construction: term → (df, sorted doc-id list).

    One shuffle on the lowercased term. ``max_postings`` caps each list at
    the first K doc ids (ascending — deterministic) so a stop-word term
    cannot blow out a single reducer's memory; ``df`` still reports the
    full document frequency.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), F.lower("tok").alias("term"))
    agg = (
        toks.distinct()
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list(id_col)).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )
    if max_postings is not None:
        agg = agg.withColumn("postings", F.slice("postings", 1, max_postings))
    return agg


def token_budget_sample(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int = 10_000,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic token-budget sampling: take documents in portable-hash
    order until the token budget is exhausted (how you cut "the first N
    billion tokens" of a shuffled corpus reproducibly on any cluster size).

    The corpus is hash-sharded; each shard independently accumulates a
    running token sum in hash order and keeps docs whose window *ends*
    within the per-shard budget (budget/n_shards). Per-shard running sums
    mean no global ordering bottleneck: the window partitions by shard.
    Output: ``(doc_id, shard, n_tokens, cum_tokens)`` for kept docs.
    """
    shard_budget = budget_tokens // n_shards
    h = portable_hash60(F.col(id_col).cast("string"))
    base = docs.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_shards)).cast("long").alias("shard"),
        h.alias("h"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= shard_budget)
        .select(id_col, "shard", "n_tokens", "cum_tokens")
    )


def balanced_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Stratum-balanced downsampling: every stratum is thinned to (in
    expectation) the size of the smallest stratum — the language-balancing
    resample of multilingual corpus prep.

    Selection is deterministic (portable hash of the id) and exact-integer:
    keep iff ``hash % scale * stratum_n < min_n * scale`` — no float
    fraction, so Spark and any oracle agree row-for-row. Stratum counts are
    a broadcast-size aggregate joined back map-side.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("stratum_n"))
    min_n = counts.agg(F.min("stratum_n").alias("min_n"))
    h = F.pmod(portable_hash60(F.col(id_col).cast("string")), F.lit(scale))
    return (
        df.join(F.broadcast(counts), stratum_col)
        .crossJoin(F.broadcast(min_n))
        .filter(h * F.col("stratum_n") < F.col("min_n") * F.lit(scale))
        .drop("stratum_n", "min_n")
    )


def span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 10,
) -> DataFrame:
    """Span-level exact dedup (boilerplate removal, C4/RefinedWeb-style):
    split each document into non-overlapping ``span_tokens``-token spans,
    keep only the globally FIRST occurrence of each distinct span (ordered
    by ``(doc_id, span_idx)``), and reconstruct the cleaned text from the
    surviving spans in order.

    Returns ``(doc_id, n_spans, kept_spans, clean_text)`` — documents whose
    spans were all seen earlier come back with empty ``clean_text`` (their
    row is retained so the caller can count fully-boilerplate docs).

    Scale notes: spanning is scan-local (one pass of array ops, no
    shuffle); the keep-first decision is one shuffle on the span hash —
    the span space is near-unique so there is no skew; reconstruction is
    one shuffle back on ``doc_id``. At 100 TB both shuffles move only
    ``(hash, doc_id, idx, span_text)`` tuples, never whole documents.
    """
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col), toks.alias("tk"), F.size(toks).alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    spans = base.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("n_tok") - 1) / F.lit(span_tokens)).cast("int"),
                ),
                lambda i: F.struct(
                    i.cast("long").alias("idx"),
                    F.array_join(
                        F.slice(F.col("tk"), i * span_tokens + 1, span_tokens), " "
                    ).alias("span"),
                ),
            )
        ).alias("s"),
    ).select(id_col, F.col("s.idx").alias("idx"), F.col("s.span").alias("span"))
    w = Window.partitionBy(portable_hash60(F.col("span"))).orderBy(id_col, "idx")
    kept = spans.withColumn("rn", F.row_number().over(w)).withColumn(
        "keep", F.col("rn") == 1
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept_spans"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct(F.col("idx"), F.col("span")))
                        )
                    ),
                    lambda s: s.span,
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def token_zipf_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_rank: int = 20,
) -> DataFrame:
    """Zipf rank-frequency quality signal, exact-integer: rank every term
    of the corpus vocabulary by global frequency (``dense_rank`` over
    ``(count DESC, term ASC)`` — deterministic tiebreak), then score each
    document by the ranks of its tokens. Common-vocabulary documents score
    low mean rank; OOV-heavy / junk documents score high — the cheap
    corpus-relative quality heuristic that needs no model.

    Returns ``(doc_id, n_tokens, sum_rank, max_rank, n_rare)`` where
    ``n_rare`` counts tokens with rank > ``rare_rank``. All BIGINT — the
    score is bit-exact on any engine/partitioning.

    Scale notes: the vocabulary aggregate is the only corpus-wide shuffle
    and its result is vocabulary-sized (≪ data) — broadcast it back, so
    per-document scoring is map-side; the final per-doc agg shuffles only
    ``(doc_id, rank)`` pairs. The global dense_rank runs on the tiny vocab
    relation (single partition is fine *because* it is post-aggregate).
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), F.lower("tok").alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    ranked = vocab.withColumn(
        "rank",
        F.dense_rank().over(Window.orderBy(F.desc("n"), F.asc("term"))).cast("long"),
    ).select("term", "rank")
    return (
        toks.join(F.broadcast(ranked), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("rank").alias("sum_rank"),
            F.max("rank").alias("max_rank"),
            F.sum(F.when(F.col("rank") > rare_rank, 1).otherwise(0)).alias("n_rare"),
        )
    )


def pagerank_exact(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1_000_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 4,
    eager: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank in scaled integer (fixed-point) arithmetic.

    ``rank`` is a BIGINT in units of 1/scale: r0 = scale; each round
    r' = (15·scale) div 100 + (85 · Σ_in (r_u div deg_u)) div 100. Integer
    div/sum are associative-commutative-exact, so the result is bit-identical
    under any partitioning — unlike float PageRank, summation order can
    never flip a low bit. Dangling nodes keep the teleport term only.
    Output: ``(node, rank)``.

    Each iteration = one broadcast-or-shuffle join (ranks ⨝ edges) + one
    shuffle agg on dst; lineage is truncated per round so the plan stays
    flat over many iterations.

    ``eager=False`` (r14): every localCheckpoint is lazy, so the whole
    run — edge materialization included — executes inside the CALLER's
    single action instead of one eager driver-synchronized job per
    checkpoint (at small iteration counts the wall is driver round-trips,
    not compute: label_prop/pagerank measured ~1 s faster at sf0.1).
    Block frees are deferred to the session pin registry (released on
    the next registry-query entry, after the consuming action ran).
    """
    # The edge relation is re-read 2x per iteration (contrib join + agg) and
    # is often the product of an expensive upstream self-join — materialize
    # it once; deg/nodes are iteration-invariant too. (At 100 TB: write the
    # edge list to a bucketed table keyed on src so every iteration's join
    # co-partitions with no exchange.)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=eager)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=eager)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=eager)
    )
    base = ((damp_den - damp_num) * scale) // damp_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    # Checkpoint every `checkpoint_every` rounds, not every round: each
    # localCheckpoint is an eager, serializing job, and each rank
    # generation is consumed exactly once, so a few unrolled rounds per
    # materialization cost nothing extra (r14 profile: 36 driver jobs for
    # ~3 s of CPU — job-launch overhead, not compute). The FINAL round
    # always checkpoints: the infra frees below rely on the returned
    # generation having no lineage into e/deg/nodes. `live_ckpts` holds
    # superseded checkpoints that unrolled lineage may still reference —
    # freed only once the next checkpoint truncates past them.
    live_ckpts: list[DataFrame] = []
    for it in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"({damp_num} * coalesce(in_sum, 0L)) div {damp_den}")
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it + 1 == iterations:
            ranks = ranks.localCheckpoint(eager=eager)
            for p in live_ckpts:
                _free_or_pin(p, eager)
            live_ckpts = [ranks]
    if not live_ckpts:  # iterations == 0: still detach from infra lineage
        ranks = ranks.localCheckpoint(eager=eager)
    # e/deg/nodes are iteration infrastructure: the returned ranks is its
    # own checkpoint with no lineage back to them, so their blocks are
    # dead the moment the loop ends (eager) or once the caller's action
    # has run (lazy: deferred to the pin registry)
    for infra in (e, deg, nodes):
        _free_or_pin(infra, eager)
    return ranks


def dsir_sample(
    source: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_keep: int,
    n_buckets: int = 512,
    seed: int = 31,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): resample ``source`` documents toward the
    ``target`` distribution using hashed-unigram importance weights and
    the Gumbel-top-k trick.

    Features: unigram tokens hashed into ``n_buckets`` buckets with the
    portable md5 hash (bit-identical in DuckDB — the whole sampler is
    exactly reproducible by a SQL oracle, seeded Gumbel noise included).
    Per-bucket log-ratio ``ln p_target[b] − ln p_source[b]`` (add-1
    smoothed), each ln rounded to ``round_digits`` and carried as DECIMAL
    so the per-document sum is summation-order-independent cross-engine.
    Per-document importance log-weight ``λ(x) = Σ_tok ratio[bucket(tok)]``;
    sampling WITHOUT replacement ∝ exp(λ) is the Gumbel-top-k trick:
    ``key = λ + Gumbel(seed, doc)`` with deterministic per-doc uniforms
    ``u = (H(seed:id)+1) / (2^60+1)``, take the ``n_keep`` largest keys.

    Output: ``(doc_id, n_tokens, logratio, sample_key, rank)`` for the
    selected documents. Documents with no tokens are excluded (no
    features ⇒ weight undefined), matching the oracle.

    Scale shape: two token-count shuffles (source + target histograms,
    each output ≤ n_buckets rows → broadcast), one tf shuffle on
    (doc, bucket), and ONE global top-k — rank via one final window on a
    singleton partition is avoided by ``orderBy().limit(n_keep)``, which
    Spark executes as per-partition top-k + a k-row driver merge
    (TakeOrderedAndProject), never a full sort.
    """
    m = n_buckets

    def histo(df: DataFrame) -> DataFrame:
        toks = df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        return (
            toks.select((portable_hash60(F.lower(F.col("tok"))) % F.lit(m)).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    # NOTE (r14): deriving s_h from a persisted (doc, bucket) tf table —
    # "tokenize once" — was tried and measured SLOWER (1.5 → 3.4 s at
    # sf0.1): materializing |docs|×buckets cached rows costs more than the
    # tokenize pass it saves, and the two histo passes overlap on idle
    # cores anyway. Kept as two lazy passes.
    s_h = histo(source)
    t_h = histo(target)
    s_tot = s_h.agg(F.sum("cnt").alias("s_total"))
    t_tot = t_h.agg(F.sum("cnt").alias("t_total"))
    # dense bucket table with add-1 smoothing; ln rounded then DECIMAL
    buckets = (
        source.sparkSession.range(m).select(F.col("id").cast("long").alias("bucket"))
        .join(s_h.withColumnRenamed("cnt", "s_cnt"), "bucket", "left")
        .join(t_h.withColumnRenamed("cnt", "t_cnt"), "bucket", "left")
        .crossJoin(F.broadcast(s_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            "bucket",
            (
                F.round(F.log((F.coalesce("t_cnt", F.lit(0)) + 1) / (F.col("t_total") + m)), round_digits).cast("decimal(18,6)")
                - F.round(F.log((F.coalesce("s_cnt", F.lit(0)) + 1) / (F.col("s_total") + m)), round_digits).cast("decimal(18,6)")
            ).alias("ratio_dec"),
        )
    )
    tf = (
        source.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .select("doc_id", (portable_hash60(F.lower(F.col("tok"))) % F.lit(m)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    weighted = (
        tf.join(F.broadcast(buckets), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("ratio_dec")).alias("lam_dec"),
        )
    )
    # deterministic Gumbel: u in (0,1) from the portable hash, rounded ln's
    # carried in DECIMAL like the ratios
    u = (seeded_hash60(F.col("doc_id"), seed) + 1) / F.lit(float((1 << 60) + 1))
    g_dec = F.round(-F.log(-F.log(u)), round_digits).cast("decimal(18,6)")
    keyed = weighted.select(
        "doc_id",
        "n_tokens",
        F.col("lam_dec").cast("double").alias("logratio"),
        (F.col("lam_dec") + g_dec).cast("double").alias("sample_key"),
    )
    top = keyed.orderBy(F.desc("sample_key"), F.asc("doc_id")).limit(n_keep)
    w = Window.orderBy(F.desc("sample_key"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 2,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
    checkpoint_every: int = 4,
    eager: bool = True,
) -> DataFrame:
    """Semi-supervised label propagation (Zhu & Ghahramani 2002 /
    Raghavan 2007 LPA) with clamped seeds: each unlabeled node adopts the
    majority label among its labeled neighbors; ties break (count DESC,
    label ASC) so every round is fully deterministic — the property that
    lets a fixed-iteration run be verified by an unrolled SQL oracle.
    Synchronous updates; seed labels never change.

    Per iteration: one join (edges ⨝ current labels — at scale, bucket
    the symmetrized edge list by src so this co-partitions) + one
    (node, label) vote count + one window argmax on the same node
    shuffle. Returns ``(node, label)`` for every node labeled after
    ``iterations`` rounds (seeds included).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        .localCheckpoint(eager=eager)
    )
    base = seeds.select(F.col(node).alias("node"), F.col(label).alias("label"))
    labels = base
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    # Same checkpoint cadence as pagerank_exact: each generation is
    # consumed once, so a localCheckpoint per round is pure job-launch
    # overhead at small iteration counts; checkpoint every
    # `checkpoint_every` rounds and ALWAYS on the final round (the edge
    # free below requires the returned generation to carry no lineage
    # into e). `live_ckpts` = superseded checkpoints possibly still
    # referenced by unrolled lineage.
    live_ckpts: list[DataFrame] = []
    for it in range(iterations):
        votes = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        winners = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
        )
        labels = base.unionByName(winners.join(base.select("node"), "node", "left_anti"))
        if (it + 1) % checkpoint_every == 0 or it + 1 == iterations:
            labels = labels.localCheckpoint(eager=eager)
            for p in live_ckpts:
                _free_or_pin(p, eager)
            live_ckpts = [labels]
    # (iterations == 0 returns `base`, which has no lineage into e)
    # the symmetrized edge checkpoint is iteration infrastructure; the
    # final labels generation is its own checkpoint with no lineage to it
    # (lazy mode defers the free to the pin registry — see pagerank_exact)
    _free_or_pin(e, eager)
    return labels


def content_defined_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    modulus: int = 8,
    seed: int = 7177,
) -> DataFrame:
    """Content-defined chunking: split each document at ROLLING-HASH
    boundaries so chunk edges survive insertions/deletions — the
    passage-level storage-dedup primitive (Muthitacharoen et al., LBFS
    SOSP'01; the same boundary idea FastCDC/restic/borg use), applied to
    token streams for training corpora.

    Rule: a boundary opens BEFORE token i when
    ``H(seed, token[i-1] || ' ' || token[i]) % modulus == 0`` — a pure
    content predicate, so two documents sharing a long passage produce
    byte-identical interior chunks no matter where the passage sits
    (fixed-width chunking, by contrast, loses all alignment after one
    inserted word). Expected chunk length = ``modulus`` tokens.

    Output, one row per (doc, chunk): ``id_col, chunk_id`` (0-based
    position order), ``n_tokens``, ``chunk_hash`` (portable 60-bit hash
    of the space-joined tokens), ``n_docs_sharing`` (distinct docs
    containing a chunk with the same hash — >1 = shared passage).

    Scale shape: posexplode is map-side; boundary + running-sum windows
    ride ONE doc_id shuffle; the chunk rollup is a (doc, chunk) groupBy
    with map-side combine; sharing counts add one chunk_hash-keyed
    exchange. Everything is linear in token count — no joins, no
    quadratic candidate step — and the chunk_hash relation is exactly
    what a downstream exact-dedup (hash groupBy) or bloom pre-filter
    consumes at 100 TB.
    """
    from ecommerce_analytics_platform_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    gate = F.pmod(
        seeded_hash60(F.concat_ws(" ", F.lag("tok").over(w), F.col("tok")), seed),
        F.lit(modulus),
    )
    toks = toks.withColumn(
        "brk", F.when((F.col("pos") > 0) & (gate == 0), 1).otherwise(0)
    ).withColumn("chunk_id", F.sum("brk").over(w).cast("long"))
    chunks = (
        toks.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # within-group order: sort_array over (pos, tok) structs —
            # deterministic regardless of shuffle arrival order
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.getField("tok"),
                ),
                " ",
            ).alias("chunk_text"),
        )
        .withColumn("chunk_hash", portable_hash60(F.col("chunk_text")))
        .drop("chunk_text")
    )
    sharing = Window.partitionBy("chunk_hash")
    return chunks.withColumn(
        "n_docs_sharing",
        F.size(F.collect_set(F.col(id_col)).over(sharing)).cast("long"),
    )
