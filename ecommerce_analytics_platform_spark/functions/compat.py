"""Cross-engine-portable scalar helpers.

The correctness oracle for this engine is DuckDB executing ANSI SQL on the
same parquet inputs (driver contract; also BASELINE.md — DuckDB is literally
the reference's execution engine). Two classes of expression diverge between
Spark and DuckDB and are centralized here:

1. **Hashes** — Spark's ``hash()`` (murmur3) and DuckDB's ``hash()``
   (xxhash-family) are incompatible. Everything that needs a deterministic
   64-bit-ish integer hash (MinHash, SimHash, LSH banding, fingerprints)
   uses the first 15 hex chars of md5 (60 bits, always positive, fits a
   signed 64-bit int) — both engines produce identical md5 hex.

2. **Date parts** — DuckDB ``extract(dow ...)`` is 0=Sunday while Spark
   ``dayofweek`` is 1=Sunday (reference dim_date.sql:22-27; SURVEY §2.3 F5).

All helpers return Column expressions built from JVM-side built-ins — no
Python UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits < 2^63: always a valid positive BIGINT in both engines.
_HASH_HEX_CHARS = 15


def portable_hash60(col: Column | str) -> Column:
    """60-bit positive integer hash identical in Spark and DuckDB.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, _HASH_HEX_CHARS), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB SQL text equivalent of :func:`portable_hash60`."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {_HASH_HEX_CHARS}))::BIGINT)"


def seeded_hash60(col: Column | str, seed: int) -> Column:
    """Member #``seed`` of a portable hash family: h_i(x) = H(i || ':' || x)."""
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash60(F.concat(F.lit(f"{seed}:"), c.cast("string")))


def seeded_hash60_sql(expr: str, seed: int) -> str:
    return portable_hash60_sql(f"'{seed}:' || CAST({expr} AS VARCHAR)")


MERSENNE61 = (1 << 61) - 1
_MASK31 = (1 << 31) - 1
_MASK30 = (1 << 30) - 1


def multmod61(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod (2^61-1) in overflow-free int64 arithmetic — a
    Carter-Wegman universal hash family member, bit-identical in Spark and
    DuckDB (both use two's-complement BIGINT with identical shift/AND
    semantics on non-negative values).

    Requires h in [0, 2^60) (portable_hash60 output) and a in [1, 2^31),
    b in [0, 2^60). Derivation (2^61 ≡ 1 mod p):
      a*h = a*h_hi*2^30 + a*h_lo          (h split at bit 30; both < 2^61)
      u*2^30 ≡ (u >> 31) + ((u mod 2^31) << 30)   (mod p, all < 2^62)
      r = (tot mod 2^61) + (tot >> 61) ≡ tot (mod p), then one subtract.

    One md5 per value + ~10 long ops per family member, vs one md5 PER
    member — ~k× cheaper MinHash signatures for k hashes.
    """
    assert 1 <= a < (1 << 31) and 0 <= b < (1 << 60)
    u = F.lit(a) * F.shiftright(h, 30)
    t1 = F.shiftright(u, 31) + F.shiftleft(u.bitwiseAND(F.lit(_MASK31)), 30)
    tot = t1 + F.lit(a) * h.bitwiseAND(F.lit(_MASK30)) + F.lit(b)
    r = tot.bitwiseAND(F.lit(MERSENNE61)) + F.shiftright(tot, 61)
    return F.when(r >= MERSENNE61, r - MERSENNE61).otherwise(r)


def multmod61_sql(expr: str, a: int, b: int) -> str:
    """DuckDB SQL twin of :func:`multmod61` (same intermediate names)."""
    p = MERSENNE61
    u = f"({a} * (({expr}) >> 30))"
    t1 = f"(({u} >> 31) + ((({u}) & {_MASK31}) << 30))"
    tot = f"({t1} + {a} * (({expr}) & {_MASK30}) + {b})"
    r = f"((({tot}) & {p}) + (({tot}) >> 61))"
    return f"(CASE WHEN {r} >= {p} THEN {r} - {p} ELSE {r} END)"


def minhash_seeds(n: int, seed: int = 894) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the multmod61 family."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31) | 1, rng.randrange(0, 1 << 60)) for _ in range(n)
    ]


def dow_sunday0(date_col: Column | str) -> Column:
    """Day-of-week with DuckDB numbering (0=Sunday..6=Saturday).

    Spark ``dayofweek`` is 1=Sunday..7=Saturday (SURVEY §2.3 F5 gotcha);
    subtract 1 for parity with the reference's ``extract(dow ...)``
    (reference dbt_project/models/marts/core/dimensions/dim_date.sql:26).
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (F.dayofweek(c) - F.lit(1)).cast("int")


def is_weekend(date_col: Column | str) -> Column:
    """Weekend flag matching reference dim_date.sql:27
    (``CASE WHEN extract(dow ...) IN (0, 6)``)."""
    d = dow_sunday0(date_col)
    return d.isin(0, 6)


def epoch_seconds_between(start: Column | str, end: Column | str) -> Column:
    """Seconds between two timestamps.

    Reference: ``EXTRACT(EPOCH FROM (end - start))``
    (stg_clickstream_sessions.sql:38). Spark: unix_timestamp difference —
    stays JVM-side, no interval arithmetic in Python.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return (e.cast("double") - s.cast("double")).cast("long")


def free_local_checkpoint(df) -> None:
    """Release the block-manager storage behind a ``localCheckpoint``.

    ``DataFrame.unpersist()`` is a no-op for checkpointed plans (the
    storage hangs off the materialized internal RDD inside the LogicalRDD
    leaf, not off a cached plan), and the ContextCleaner only frees it on
    a driver GC cycle — so iterative operators that checkpoint per round
    (connected components, pagerank, label propagation) would pin one
    round's worth of blocks per iteration until an eventual JVM GC. This
    walks the analyzed plan's leaves and unpersists each LogicalRDD's
    RDD directly.

    ONLY call on a checkpoint generation that is fully superseded (the
    next round's checkpoint is already materialized) or fully consumed:
    a locally-checkpointed RDD has no lineage, so once its blocks are
    dropped it cannot be recomputed. Best-effort: non-classic backends
    (no ``_jdf``) are silently skipped.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        it = plan.collectLeaves().iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:
        pass
