"""Probabilistic membership & frequency structures: Bloom filter and
Count-Min sketch, built as *relations* so they merge and broadcast the way
a 100 TB pipeline needs.

Beyond the reference surface (it has no sketch ops): these are the two
workhorses of large-scale training-data plumbing — Bloom filters for
membership pushdown (decontamination against a seen-URL set, delta-vs-corpus
dedup prefilters, semi-join runtime filters) and Count-Min for heavy-hitter
frequency estimation (boilerplate detection, hot-key diagnosis before a
skewed join).

Design stance (same as ``functions/text.py``'s MinHash): every hash is the
portable seeded md5-based family from ``functions/compat.py`` — bit-identical
in Spark and DuckDB — so the *entire* structure (bit positions, counters,
estimates, false positives included) is deterministic and exactly
reproducible by a SQL oracle. No engine-internal sketch formats.

Scale shape:

- **Build is one scan + one bounded shuffle.** Positions/cells are exploded
  JVM-side (k or d small constants) and reduced by ``distinct``/``groupBy``
  whose result size is bounded by the STRUCTURE size (≤ m bits, ≤ d·w
  cells), never by the data size. Partial aggregation does the per-partition
  combine map-side, so the shuffle carries at most one row per set bit /
  touched cell per partition.
- **The built structure is a relation** (``pos`` rows / ``(row_idx, col_idx,
  cnt)`` rows): two filters built on different days merge with
  ``union().distinct()`` (Bloom) or ``groupBy().sum()`` (CMS) — the
  mergeability that makes sketches per-partition-parallel at any scale.
- **Probe is map-side only.** ``bloom_bitmap`` packs the position relation
  into ``m/64`` int64 words (driver memory = the filter size itself, the
  thing you'd broadcast anyway) and ``bloom_probe`` tests k bits with pure
  codegen'd shift/AND arithmetic against the broadcast literal — zero
  shuffle, usable as a pushed-down prefilter in front of an expensive join.
  CMS lookup joins d broadcast cells per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import (
    seeded_hash60,
    seeded_hash60_sql,
)


def bloom_position_cols(col: Column | str, m_bits: int, k: int, seed: int) -> list[Column]:
    """k bit positions for one value: ``seeded_hash60(seed+i, x) mod m``.

    ``seeded_hash60`` output is non-negative (< 2^60), so plain ``%`` is
    already the canonical mod.
    """
    c = F.col(col) if isinstance(col, str) else col
    return [(seeded_hash60(c, seed + i) % F.lit(m_bits)).alias(f"pos{i}") for i in range(k)]


def bloom_build(df: DataFrame, col: str, m_bits: int, k: int = 4, seed: int = 101) -> DataFrame:
    """Build a Bloom filter over ``df[col]`` as a position relation
    ``(pos: long)`` — the set bits, ≤ min(n·k, m_bits) rows.

    ``distinct`` bounds the shuffle output by the filter size; two filters
    merge with ``union().distinct()``.
    """
    pos = df.select(F.explode(F.array(*bloom_position_cols(col, m_bits, k, seed))).alias("pos"))
    return pos.distinct()


def bloom_bitmap(positions: DataFrame, m_bits: int) -> list[int]:
    """Pack the position relation into ``ceil(m/64)`` signed int64 words
    (word ``p >> 6``, bit ``p & 63``). The collect is bounded by the filter
    size — exactly the bytes a probe must broadcast anyway."""
    words = [0] * ((m_bits + 63) // 64)
    for r in positions.collect():
        p = int(r["pos"])
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement fold into signed int64 so F.lit stays in LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe(
    df: DataFrame,
    col: str,
    bitmap: list[int],
    m_bits: int,
    k: int = 4,
    seed: int = 101,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Map-side membership test: all k bits set ⇒ hit (no false negatives
    by construction; false positives at the classic ``(1-e^{-kn/m})^k``
    rate). The bitmap rides in the plan as an array literal — broadcast by
    construction, tested with codegen'd shift/AND, no shuffle, no UDF.
    Bit test = ``getbit(word, pos % 64)`` — two's-complement bit indexing,
    sign-safe for the top bit of each word.
    """
    words = F.array(*[F.lit(w) for w in bitmap])
    hit = F.lit(True)
    for pos in bloom_position_cols(col, m_bits, k, seed):
        word = F.element_at(words, (pos / F.lit(64)).cast("int") + F.lit(1))
        hit = hit & (F.getbit(word, pos % F.lit(64)) == 1)
    return df.withColumn(out_col, hit)


def bloom_position_sql(expr: str, m_bits: int, i: int, seed: int) -> str:
    """DuckDB twin of one member of :func:`bloom_position_cols`."""
    return f"({seeded_hash60_sql(expr, seed + i)} % {m_bits})"


def cms_cell_cols(col: Column | str, width: int, depth: int, seed: int) -> list[Column]:
    """One ``(row_idx, col_idx)`` struct per sketch row for one value."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.struct(
            F.lit(i).alias("row_idx"),
            (seeded_hash60(c, seed + i) % F.lit(width)).alias("col_idx"),
        )
        for i in range(depth)
    ]


def cms_build(df: DataFrame, col: str, width: int, depth: int = 3, seed: int = 202) -> DataFrame:
    """Count-Min sketch over ``df[col]`` as a counter relation
    ``(row_idx, col_idx, cnt)`` — ≤ depth·width rows regardless of data
    size. Two sketches merge with ``unionByName().groupBy(row_idx,
    col_idx).sum(cnt)`` (counter addition — CMS is a linear sketch)."""
    cells = df.select(F.explode(F.array(*cms_cell_cols(col, width, depth, seed))).alias("c"))
    return (
        cells.select("c.row_idx", "c.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    keys: DataFrame,
    col: str,
    sketch: DataFrame,
    width: int,
    depth: int = 3,
    seed: int = 202,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point estimate per key: min over the d counters the key hashes to.
    One explode (d rows per key) + a broadcast join against the ≤ d·w-row
    sketch + a min re-agg on the key — never a shuffle of the sketch.
    Guarantee: est ≥ true count (never under), est ≤ true + εN with
    ε = e/width at the usual confidence."""
    probes = keys.select(
        "*", F.explode(F.array(*cms_cell_cols(col, width, depth, seed))).alias("__c")
    ).select("*", "__c.row_idx", "__c.col_idx").drop("__c")
    joined = probes.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    others = [c for c in keys.columns]
    return joined.groupBy(*others).agg(F.min("cnt").alias(out_col))


def cms_cell_sql(expr: str, width: int, i: int, seed: int) -> str:
    """DuckDB twin of one row's column index in :func:`cms_cell_cols`."""
    return f"({seeded_hash60_sql(expr, seed + i)} % {width})"
