"""Warehouse analytics operators: cohort retention, RFM segmentation,
market-basket co-occurrence, event-transition matrices, gaps-and-islands
interval collapse (the SCD-2 build primitive), and strict-ordered funnels.

These generalize the reference's gold-layer metrics (cf.
/root/reference/dbt_project/models/marts/ — daily KPIs, funnel, user
lifecycle at metrics_daily_kpis.sql / metrics_daily_funnel.sql /
metrics_user_lifecycle.sql) into reusable DataFrame operators. All are
built-in-function-only (JVM side, whole-stage codegen) and all numeric
outputs are exact (integer counts / DECIMAL sums), so results are
bit-identical under any partitioning — the property every oracle check and
every cross-cluster rerun relies on.

Scale notes (100 TB):

- ``cohort_matrix``: two shuffles (per-entity min, then cohort cell agg);
  the output is |cohorts| × |periods| — tiny. The per-entity first-touch
  agg is the only wide pass and it partial-aggregates map-side.
- ``rfm_scores``: per-entity agg shrinks the relation to one row per
  entity first; the three ``ntile`` windows then run over entity-sized
  data. A single global ntile window is a deliberate choice: quartile
  assignment is a total order, and at cluster scale you'd range-partition
  the sort (Spark's window already sort-partitions; for >1e9 entities
  switch to approx-percentile cut points and a map-side bucket join).
- ``basket_pairs``: the pair explosion is quadratic in basket size, so
  baskets above ``max_basket`` distinct items are dropped FIRST (the
  standard market-basket guard); the self-join then shuffles only
  (order, item) pairs and the pair count partial-aggregates.
- ``transition_counts``: one window (lag) per partition key + one count
  shuffle; no data amplification.
- ``run_length_intervals``: the two row_numbers run in ONE window pass
  (same partitioning/ordering), then one agg — the classic
  gaps-and-islands trick costs a single sort-shuffle.
- ``ordered_funnel``: K stages = K conditional aggs over one shuffled
  relation; each stage's threshold joins back per-entity (entity-keyed,
  so it co-partitions with the event relation — no broadcast of big data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cohort_matrix(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    period: str = "month",
) -> DataFrame:
    """Cohort retention matrix: cohort = calendar period (``month`` or
    ``week``) of the entity's first event; one output row per
    (cohort_period, periods_since) cell with the distinct-entity count
    active in that cell.

    ``periods_since`` is exact integer arithmetic — months via
    ``(year(m)-year(c))*12 + (month(m)-month(c))``, weeks via
    ``datediff/7`` on Monday-truncated dates — no float
    ``months_between``, so any engine agrees cell-for-cell.
    """
    if period not in ("month", "week"):
        raise ValueError(f"period must be 'month' or 'week', got {period!r}")
    ent = F.col(entity_col)
    bucket = F.date_trunc(period, F.col(ts_col)).cast("date")
    first = (
        df.groupBy(ent.alias("ent"))
        .agg(F.min(bucket).alias("cohort_period"))
    )
    activity = df.select(ent.alias("ent"), bucket.alias("act_period")).distinct()
    if period == "month":
        psince = (
            (F.year("act_period") - F.year("cohort_period")) * 12
            + (F.month("act_period") - F.month("cohort_period"))
        ).cast("long")
    else:
        psince = (F.datediff("act_period", "cohort_period") / 7).cast("long")
    return (
        activity.join(first, "ent")
        .groupBy("cohort_period", psince.alias("periods_since"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def rfm_scores(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM segmentation: per entity, recency (days since last event,
    relative to the dataset's max date), frequency (event count) and
    monetary (exact DECIMAL amount sum), each cut into ``n_tiles``
    quantile buckets with ``ntile`` under a deterministic
    (metric, entity) total order.

    Returns ``(entity, recency_days, frequency, monetary, r, f, m)`` with
    r/f/m in 1..n_tiles (1 = best: most recent / most frequent / highest
    spend). Ordering ties break on the entity id, and monetary ordering
    happens in the DECIMAL domain — bucket boundaries cannot float-flip.
    """
    ent = F.col(entity_col)
    per = df.groupBy(ent.alias("entity")).agg(
        F.max(F.col(ts_col).cast("date")).alias("last_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(18,4)")).alias("monetary_dec"),
    )
    anchor = df.select(F.max(F.col(ts_col).cast("date")).alias("anchor"))
    per = (
        per.crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("anchor", "last_date").cast("long"))
        .drop("anchor", "last_date")
    )
    return (
        per.withColumn(
            "r", F.ntile(n_tiles).over(Window.orderBy(F.asc("recency_days"), F.asc("entity")))
        )
        .withColumn(
            "f", F.ntile(n_tiles).over(Window.orderBy(F.desc("frequency"), F.asc("entity")))
        )
        .withColumn(
            "m", F.ntile(n_tiles).over(Window.orderBy(F.desc("monetary_dec"), F.asc("entity")))
        )
        .select(
            "entity",
            "recency_days",
            "frequency",
            F.col("monetary_dec").cast("double").alias("monetary"),
            F.col("r").cast("int").alias("r"),
            F.col("f").cast("int").alias("f"),
            F.col("m").cast("int").alias("m"),
        )
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 100,
) -> DataFrame:
    """Market-basket co-occurrence: for every unordered item pair
    ``(item_a < item_b)`` appearing together in a basket, the number of
    baskets containing the pair plus each item's own basket count —
    everything downstream (support / confidence / lift) is a ratio of
    these exact integers, left to the caller so no float leaves the
    operator.

    Baskets with more than ``max_basket`` distinct items are discarded
    before pairing (quadratic guard); pairs below ``min_support`` baskets
    are dropped. Returns ``(item_a, item_b, pair_n, a_n, b_n, n_baskets)``.

    Plan shape: ONE wide shuffle (groupBy basket → sorted distinct item
    array), then pair / item / basket counting fused into a SINGLE
    aggregation pass — each basket row emits its pair structs (a
    higher-order array comprehension, no basket self-join), one
    ``(item, NULL)`` mark per item, and one ``(NULL, NULL)`` basket
    marker; one groupBy counts all three kinds at once. The aggregated
    relation is catalog-sized (items × items upper bound), so the final
    support-count joins are broadcasts over a persisted tiny table — the
    raw relation is scanned exactly once no matter how many statistics
    come out.
    """
    item_type = df.schema[item_col].dataType
    null_item = F.lit(None).cast(item_type)
    baskets = (
        df.groupBy(F.col(basket_col).alias("basket"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("items"))
        .filter(F.size("items") <= max_basket)
    )
    # The pair comprehension below is quadratic per basket — CPU-dense,
    # not byte-dense — but AQE coalesces the basket exchange by BYTES
    # (r14 profile: the explode stage ran on 4 tasks carrying 4.2 s of
    # CPU). Spread the compact arrays round-robin before exploding; an
    # explicit repartition is exempt from AQE coalescing, and the moved
    # relation is the small aggregated one, never the raw rows.
    baskets = baskets.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # (items[i], items[j]) for i < j; slice() is 1-based, transform's index
    # arg is 0-based, so the tail after element i starts at slice pos i+2.
    pair_array = F.flatten(
        F.transform(
            "items",
            lambda x, i: F.transform(
                F.slice("items", i + F.lit(2), F.size("items")),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    item_marks = F.transform(
        "items", lambda x: F.struct(x.alias("item_a"), null_item.alias("item_b"))
    )
    basket_mark = F.array(F.struct(null_item.alias("item_a"), null_item.alias("item_b")))
    counts = (
        baskets.select(
            F.explode(F.concat(pair_array, item_marks, basket_mark)).alias("p")
        )
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    n_baskets = counts.filter(F.col("item_a").isNull()).collect()[0]["n"]
    item_n = counts.filter(
        F.col("item_a").isNotNull() & F.col("item_b").isNull()
    ).select(F.col("item_a").alias("item"), "n")
    pairs = counts.filter(
        F.col("item_b").isNotNull() & (F.col("n") >= min_support)
    ).withColumnRenamed("n", "pair_n")
    return (
        pairs.join(
            F.broadcast(item_n.select(F.col("item").alias("item_a"), F.col("n").alias("a_n"))),
            "item_a",
        )
        .join(
            F.broadcast(item_n.select(F.col("item").alias("item_b"), F.col("n").alias("b_n"))),
            "item_b",
        )
        .select(
            "item_a", "item_b", "pair_n", "a_n", "b_n",
            F.lit(n_baskets).cast("long").alias("n_baskets"),
        )
    )


def transition_counts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order transition (Markov) counts: order each entity's events
    by ``(ts, tiebreak)`` and count ``(prev_state, state)`` adjacencies
    across the whole relation. Rows with no predecessor (each entity's
    first event) are excluded.

    Returns ``(prev_state, state, n)``. One lag window + one count shuffle.
    """
    order = [F.asc(ts_col)] + ([F.asc(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    return (
        df.withColumn("prev_state", F.lag(state_col).over(w))
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", F.col(state_col).alias("state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def run_length_intervals(
    df: DataFrame,
    entity_col: str,
    seq_col: str,
    state_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse consecutive rows of an entity that share
    the same state into one interval row — the core of an SCD Type 2
    dimension build (validity ranges from a change log).

    ``seq_col`` must be a dense orderable column (date, sequence number).
    Island id = ``row_number() over (entity ORDER BY seq) - row_number()
    over (entity, state ORDER BY seq)`` — both windows share the same
    partition sort, so Spark evaluates them in one pass.

    Returns ``(entity, state, valid_from, valid_to, n_rows)``.
    """
    w_all = Window.partitionBy(entity_col).orderBy(seq_col)
    w_state = Window.partitionBy(entity_col, state_col).orderBy(seq_col)
    grp = (F.row_number().over(w_all) - F.row_number().over(w_state)).alias("grp")
    return (
        df.select(
            F.col(entity_col).alias("entity"),
            F.col(state_col).alias("state"),
            F.col(seq_col).alias("seq"),
            grp,
        )
        .groupBy("entity", "state", "grp")
        .agg(
            F.min("seq").alias("valid_from"),
            F.max("seq").alias("valid_to"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .drop("grp")
    )


def ordered_funnel(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    stages: list[str],
) -> DataFrame:
    """Strict-ordered funnel: stage k counts only if it happens strictly
    AFTER the entity's stage k-1 time (min-qualifying-timestamp semantics,
    `t_k = min(ts | state = stages[k] ∧ ts > t_{k-1})`).

    Returns one row per entity that completed stage 1:
    ``(entity, t_1..t_K as stage_<name>, stages_completed)``. Each stage
    is one conditional agg + an entity-keyed join — the joins co-partition
    on the entity, so K stages cost K co-partitioned shuffles, not K scans
    of raw data.
    """
    ent = F.col(entity_col)
    ts = F.col(ts_col)
    state = F.col(state_col)
    base = df.select(ent.alias("entity"), ts.alias("ts"), state.alias("state"))
    cur = (
        base.filter(F.col("state") == stages[0])
        .groupBy("entity")
        .agg(F.min("ts").alias(f"stage_{stages[0]}"))
    )
    prev_col = f"stage_{stages[0]}"
    for stg in stages[1:]:
        nxt = (
            base.filter(F.col("state") == stg)
            .join(cur.select("entity", prev_col), "entity")
            .filter(F.col("ts") > F.col(prev_col))
            .groupBy("entity")
            .agg(F.min("ts").alias(f"stage_{stg}"))
        )
        cur = cur.join(nxt, "entity", "left")
        prev_col = f"stage_{stg}"
    completed: Column = F.lit(0).cast("long")
    for stg in stages:
        completed = completed + F.when(
            F.col(f"stage_{stg}").isNotNull(), 1
        ).otherwise(0)
    return cur.withColumn("stages_completed", completed)
