"""Skew mitigation: salted aggregation and salted broadcast-free joins.

Not in the reference (single-node DuckDB has no shuffle skew — SURVEY §4
"Partitioning/shuffle: none"); at 100 TB a hot key (one power user, one
viral product) turns a shuffle into a single straggler task. Two standard
remedies, both pure DataFrame compositions:

- **Salted two-stage aggregation**: add a random salt to the key, partial-
  aggregate on (key, salt) — splitting the hot key across ``n_salts``
  tasks — then final-aggregate on the key. Works for any algebraic
  aggregate (sum/count/min/max; avg as sum+count).
- **Salted join**: replicate the *small-but-not-broadcastable* side once
  per salt; the big skewed side picks a random salt. The hot key's rows
  spread over ``n_salts`` partitions instead of one.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting is for aggregations (AQE doesn't split those)
and for plans where the skew is known ahead of time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: output_name → (input_col, fn) with fn in
    {sum, count, min, max}. Stage 1 groups by keys+salt (hot key split into
    ``n_salts`` partial groups), stage 2 re-combines per key: sum/count →
    sum of partials, min/max → min/max of partials.
    """
    combiner = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            stage1_exprs.append(F.count(col).alias(out))
        elif fn in ("sum", "min", "max"):
            stage1_exprs.append(getattr(F, fn)(col).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*stage1_exprs)
    final_exprs = [combiner[fn](out).alias(out) for out, (_c, fn) in aggs.items()]
    return partial.groupBy(*keys).agg(*final_exprs)


def skewed_count_distinct(
    df: DataFrame, keys: list[str], col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Skew-robust exact COUNT(DISTINCT col) GROUP BY keys.

    Plain ``countDistinct`` shuffles every (key, value) pair to the KEY's
    reducer — a hot key's millions of distinct values land in one
    straggler partition (partial aggregation cannot collapse distincts,
    unlike sum/count/min/max where map-side combine already absorbs the
    skew). The canonical rewrite: stage 1 dedups on (keys + value) — the
    shuffle spreads over the full composite key, no hot partition — then
    stage 2 counts per key, where map-side combine collapses each task's
    rows to one partial per key before the (now tiny) key shuffle.

    Stage 2 counts ``F.count(col)`` — NOT ``count(*)`` — because the
    distinct keeps a (key, NULL) row that countDistinct would ignore;
    counting the column itself skips it, matching countDistinct exactly
    (including 0 for an all-NULL key).
    """
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(col)).alias(out_col))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-robust equi-join: ``small`` replicated ×``n_salts`` (explode),
    ``big`` assigned a uniform random salt — the hot key's rows land in
    ``n_salts`` different shuffle partitions.

    Use when ``small`` exceeds the broadcast threshold but is still ≪
    ``big`` (broadcast needs no salting at all). Supported: inner / left
    (left = big side preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (big side preserved)")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    return big_salted.join(small_rep, on=[key, "__salt"], how=how).drop("__salt")
