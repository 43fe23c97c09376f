"""Text-analysis column functions for large-scale training-data pipelines.

Beyond the reference's surface (it has no text ops — SURVEY §2.3: "no regex,
no string concat/split in the pipeline"), these are the ops a 100 TB
pretraining-data pipeline needs: tokenization stats, quality scoring,
language ID, fingerprinting, MinHash/SimHash. Everything is built from
JVM-side ``pyspark.sql.functions`` — no Python UDFs in the hot path.

PERFORMANCE RULE (learned by measuring): higher-order functions are not
whole-stage-codegen'd and defeat common-subexpression elimination, so an
expression like ``split(text)`` referenced inside N lambda bodies is
re-evaluated N× *per element*. Every function here therefore:

1. materializes derived arrays (words, shingles, per-word hashes) ONCE as a
   direct child of a single higher-order call, and
2. folds ALL per-document statistics in ONE ``aggregate()`` pass returning a
   struct, instead of one column expression per statistic.

This turned a 57 s MinHash stage into <1 s at the same scale.

Each function has an exact DuckDB-SQL twin used by the correctness oracle
(see ``plans/testdata_queries.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import portable_hash60

_WS = r"\s+"

# Tiny marker-word lists for heuristic language ID. Chosen to be disjoint
# across languages; real pipelines would use a trained n-gram model (e.g.
# fastText), but the *Spark plumbing* — per-language score columns then
# greatest()-argmax — is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "es", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["的", "是", "了", "在", "我"],
}

_EN_STOPWORDS = LANG_MARKERS["en"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>. Empty string → empty array."""
    t = F.trim(_c(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, _WS))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-TOKENIZED array column.

    Pass a materialized token array (``with_materialized(df, tokens(...),
    "toks")``) when the caller also needs the tokens or references the
    shingles more than once — :func:`word_shingles` inlines ``split()``
    n+1 times per row, and every additional reference to its result
    re-evaluates the whole tree (guide §1.2)."""
    w = _c(toks)
    ln = F.greatest(F.size(w) - F.lit(n - 1), F.lit(0))
    parts = [F.slice(w, j + 1, ln) for j in range(n)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda x, y: F.concat(x, F.lit(" "), y))
    return sh


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>); [] when fewer than n tokens.

    Built as n array slices zipped element-wise — the split() is evaluated
    n× per ROW (not per shingle), and the zip runs on materialized arrays.
    """
    return shingles_from_tokens(tokens(text), n)


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-grams of the whitespace-normalized text."""
    t = F.regexp_replace(F.trim(_c(text)), _WS, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1)))
    return F.when(F.length(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: t.substr(i, F.lit(n)))
    )


def gram_dup_stats(arr: Column) -> Column:
    """Duplicate statistics over an array in O(n log n) per row:
    ``struct(max_count int, dup_positions int)`` where ``max_count`` is the
    multiplicity of the most frequent element and ``dup_positions`` is the
    number of positions whose element occurs more than once.

    Shape: one ``array_sort`` then ONE ``aggregate`` run-length pass. This
    replaces the naive ``size(filter(...))``-inside-``transform`` formulation
    (O(n²) per row — 10¹⁰ comparisons for a book-length 10⁵-word document in
    a single task) with identical outputs: for an element of multiplicity m,
    the run of length m yields max_count ≥ m and contributes m duplicated
    positions when m ≥ 2 (the step adds 2 when a run reaches length 2, then
    1 per further extension). Null array → null struct, matching the
    ``when(n >= k, ...)`` guards callers already apply.
    """
    s = F.array_sort(arr)
    zero = F.lit(0).cast("int")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
        zero.alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        dup = acc["dup"] + (
            F.when(run == 2, F.lit(2)).when(run > 2, F.lit(1)).otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            dup.alias("dup"),
        )

    return F.aggregate(
        s,
        init,
        step,
        lambda acc: F.struct(
            acc["best"].alias("max_count"), acc["dup"].alias("dup_positions")
        ),
    )


def quality_struct(text: Column | str) -> Column:
    """All token-level quality statistics in ONE pass over the words array:
    struct(n_tokens, char_sum, stop_hits). Combine with per-text stats
    (length, punct count) for the full C4/Gopher-style feature set."""
    w = tokens(text)
    init = F.struct(
        F.lit(0).cast("long").alias("char_sum"),
        F.lit(0).cast("long").alias("stop_hits"),
    )
    fold = F.aggregate(
        w,
        init,
        lambda acc, x: F.struct(
            (acc.char_sum + F.length(x)).alias("char_sum"),
            (acc.stop_hits + F.when(F.lower(x).isin(*_EN_STOPWORDS), 1).otherwise(0)).alias(
                "stop_hits"
            ),
        ),
    )
    return F.struct(
        F.size(w).cast("long").alias("n_tokens"),
        fold.char_sum.alias("char_sum"),
        fold.stop_hits.alias("stop_hits"),
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Heuristic quality-scoring features. NOTE: prefer selecting
    ``quality_struct`` once and deriving ratios from the struct column —
    using several of these dict entries in one projection repeats the
    tokenization per entry."""
    t = _c(text)
    q = quality_struct(t)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}-]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": q.n_tokens,
        "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": q.stop_hits / F.greatest(q.n_tokens, F.lit(1)),
        "mean_token_len": F.when(q.n_tokens > 0, q.char_sum / q.n_tokens).otherwise(F.lit(0.0)),
    }


def language_score_struct(text: Column | str) -> Column:
    """Per-language marker-hit counts, all in ONE fold: struct(de,en,es,fr,zh)."""
    w = tokens(text)
    langs = sorted(LANG_MARKERS)
    init = F.struct(*[F.lit(0).cast("long").alias(lang) for lang in langs])
    return F.aggregate(
        w,
        init,
        lambda acc, x: F.struct(
            *[
                (acc[lang] + F.when(F.lower(x).isin(*LANG_MARKERS[lang]), 1).otherwise(0)).alias(
                    lang
                )
                for lang in langs
            ]
        ),
    )


def language_scores(text: Column | str) -> dict[str, Column]:
    s = language_score_struct(text)
    return {lang: s[lang] for lang in sorted(LANG_MARKERS)}


def predicted_lang_from_struct(scores: Column) -> Column:
    """Argmax over a language_score_struct column; deterministic tie-break on
    language code order; 'und' when zero hits."""
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = None
    for lang in langs:
        cond = (scores[lang] == best) & (best > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def predicted_lang(text: Column | str) -> Column:
    return predicted_lang_from_struct(language_score_struct(text))


def doc_fingerprint(text: Column | str) -> Column:
    """Order-sensitive 60-bit document fingerprint: hash of the
    whitespace-normalized text (a rolling-hash analog computed via one md5 —
    cheap, exact-dup-detecting, cross-engine portable)."""
    norm = F.regexp_replace(F.trim(_c(text)), _WS, " ")
    return portable_hash60(norm)


_MINHASH_INIT = 1 << 62  # sentinel > any 60-bit hash


def minhash_struct(text: Column | str, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature as ONE struct column (fields mh0..mh{k-1}).

    Two-stage: (1) transform shingles → base 60-bit hashes (ONE md5 per
    shingle — the lambda variable keeps it from being recomputed per family
    member), (2) transform bases → per-seed hashes via the Carter-Wegman
    multiply-mod-(2^61-1) family (pure int64 bit ops, ~k× cheaper than one
    md5 per member), then one ``aggregate`` folds element-wise minima.
    Documents with no shingles keep the sentinel init — callers filter on
    ``size(word_shingles(...)) > 0`` or on the mh0 sentinel.
    """
    from ecommerce_analytics_platform_spark.functions.compat import (
        minhash_seeds,
        multmod61,
    )

    sh = word_shingles(text, shingle_n)
    seeds = minhash_seeds(num_hashes)
    bases = F.transform(sh, lambda s: portable_hash60(s))
    hashed = F.transform(
        bases,
        lambda h: F.struct(
            *[multmod61(h, a, b).alias(f"h{i}") for i, (a, b) in enumerate(seeds)]
        ),
    )
    init = F.struct(
        *[F.lit(_MINHASH_INIT).cast("long").alias(f"mh{i}") for i in range(num_hashes)]
    )
    return F.aggregate(
        hashed,
        init,
        lambda acc, x: F.struct(
            *[F.least(acc[f"mh{i}"], x[f"h{i}"]).alias(f"mh{i}") for i in range(num_hashes)]
        ),
    )


def shingle_bases(
    df,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    signable_only: bool = False,
):
    """``(__id, __bases)``: per-document hashed-shingle arrays — stage 1 of
    the MinHash pipeline, reusable by exact-Jaccard verification (Jaccard
    over 60-bit shingle hashes equals Jaccard over the raw shingles —
    md5 is identical cross-engine, and a within-pair collision is both
    astronomically unlikely and engine-symmetric). fan_out BEFORE the
    shingle+md5 projection: that projection is the CPU-heavy stage and
    must not run inside a single scan task.

    By default MAY emit unsignable docs (``__bases`` = []) — ADVICE r14:
    callers that outer-join or aggregate over the output must either
    handle empty arrays or pass ``signable_only=True``. The default stays
    relaxed because an explicit ``filter(size(__bases) > 0)`` on the
    inline expression gets pushed below the fan_out exchange to the scan,
    where the whole shingle+md5 pipeline is re-evaluated SINGLE-TASK on
    the critical path (r14 profile: ~0.7 s serial per consumer at sf0.1)
    — a full second copy of the heavy expression (guide §1.2). The
    current consumers are audited: :func:`minhash_table`'s numpy fold
    masks empties (same rows out as the old filter), and
    q_neardup_verified inner-joins against candidate ids, which can
    never contain an unsignable doc. ``signable_only=True`` filters
    safely by materializing the array behind a Generate first (the
    filter then cannot be pushed past it)."""
    from ecommerce_analytics_platform_spark.session import fan_out

    base = fan_out(df.select(F.col(id_col).alias("__id"), F.col(text_col)))
    arr = F.transform(word_shingles(F.col(text_col), shingle_n), portable_hash60)
    if not signable_only:
        return base.select("__id", arr.alias("__bases"))
    return (
        with_materialized(base, arr, "__bases")
        .filter(F.size("__bases") > 0)
        .select("__id", "__bases")
    )


def minhash_table(
    df,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
    based=None,
):
    """MinHash signature table ``(__id, mh0..mh{k-1})`` — the fast path.

    Stage 1 stays JVM-side and bit-identical to the DuckDB twin: shingle →
    ``portable_hash60`` (one md5 per shingle). Stage 2 — the k-member
    Carter-Wegman family + per-document min — runs vectorized in numpy via
    ``mapInPandas``: one flat uint64 array of all bases per Arrow batch,
    k vectorized multiply-mod-(2^61-1) passes, ``minimum.reduceat`` per
    document segment. Replaces k interpreted ``transform`` folds (measured
    ~0.7 s per hash over 5k docs at sf0.1 → ~0.1 s total for all 16).
    Documents with zero shingles are dropped (callers treat them as
    unsignable, same as the sentinel filter in :func:`minhash_struct`) —
    masked INSIDE the fold, not via a JVM ``size() > 0`` filter, which
    would be pushed below the fan_out exchange and re-evaluate the whole
    shingle+md5 expression single-task at the scan (see
    :func:`shingle_bases`). The arithmetic mirrors ``compat.multmod61``
    exactly — uint64 never overflows by the same derivation — so results
    stay bit-identical.
    """
    import numpy as np
    import pandas as pd

    from ecommerce_analytics_platform_spark.functions.compat import minhash_seeds

    seeds = minhash_seeds(num_hashes)
    if based is None:
        based = shingle_bases(df, id_col, text_col, shingle_n)

    P = np.uint64((1 << 61) - 1)
    M30 = np.uint64((1 << 30) - 1)
    M31 = np.uint64((1 << 31) - 1)
    c30, c31, c61 = np.uint64(30), np.uint64(31), np.uint64(61)
    out_cols = [f"mh{i}" for i in range(num_hashes)]

    def fold(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"__id": pdf["__id"]}
                    | {c: pd.Series([], dtype="int64") for c in out_cols}
                )
                continue
            arrs = [np.asarray(v, dtype=np.uint64) for v in pdf["__bases"]]
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            ids = pdf["__id"].to_numpy()
            if not (lens > 0).all():
                keep = lens > 0
                arrs = [a for a, k in zip(arrs, keep) if k]
                lens = lens[keep]
                ids = ids[keep]
                if len(arrs) == 0:
                    yield pd.DataFrame(
                        {"__id": pd.Series([], dtype=ids.dtype)}
                        | {c: pd.Series([], dtype="int64") for c in out_cols}
                    )
                    continue
            flat = np.concatenate(arrs)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            out = {"__id": ids}
            hi, lo = flat >> c30, flat & M30
            for i, (a, b) in enumerate(seeds):
                ua = np.uint64(a)
                u = ua * hi
                tot = (u >> c31) + ((u & M31) << c30) + ua * lo + np.uint64(b)
                r = (tot & P) + (tot >> c61)
                r = np.where(r >= P, r - P, r)
                out[out_cols[i]] = np.minimum.reduceat(r, starts).astype(np.int64)
            yield pd.DataFrame(out)

    id_type = based.schema["__id"].dataType.simpleString()
    schema = f"__id {id_type}, " + ", ".join(f"{c} long" for c in out_cols)
    return based.mapInPandas(fold, schema)


def minhash_signature(text: Column | str, num_hashes: int = 16, shingle_n: int = 3) -> list[Column]:
    """Backwards-compatible per-column view of :func:`minhash_struct`.
    Null (not sentinel) when the document has no shingles."""
    sig = minhash_struct(text, num_hashes, shingle_n)
    has = F.size(word_shingles(text, shingle_n)) > 0
    return [F.when(has, sig[f"mh{i}"]).otherwise(F.lit(None)) for i in range(num_hashes)]


def simhash64(text: Column | str, bits: int = 16) -> Column:
    """SimHash over whitespace tokens using the portable hash family.

    One md5 per token (materialized via ``transform``), then ONE fold
    accumulating all ``bits`` signed counters as a struct; bit b of the
    result is set iff counter b is positive.
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda w: portable_hash60(w))
    init = F.struct(*[F.lit(0).cast("long").alias(f"c{b}") for b in range(bits)])

    def finish(acc: Column) -> Column:
        # runs ONCE on the final accumulator (the aggregate's finish lambda),
        # so the fold is never duplicated per bit
        out = F.lit(0).cast("long")
        for b in range(bits):
            out = out + F.when(acc[f"c{b}"] > 0, F.lit(1 << b)).otherwise(F.lit(0))
        return out

    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.struct(
            *[
                (
                    acc[f"c{b}"]
                    + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
                ).alias(f"c{b}")
                for b in range(bits)
            ]
        ),
        finish,
    )


def simhash_by_agg(df, id_col: str, text_col: str, bits: int = 48):
    """Relation-level SimHash: explode tokens, ONE flat aggregate per doc
    (count + per-bit ones-sums; bit b set iff ``2*ones_b > n`` — exactly
    the fold's ``±1 sum > 0``). Bit-identical to :func:`simhash64` (tie
    semantics included; equality verified at 48 bits over the corpus) but
    ~2× faster at wide ``bits``: 48 independent SUM aggregates stay in
    whole-stage codegen with map-side partial aggregation, where the
    fold's 48-field struct accumulator is one giant per-token expression.
    Costs one exchange on ``id_col`` (the fold is scan-local) — the right
    trade for wide signatures; prefer :func:`simhash64` for narrow ones.

    Returns ``(id_col, sig)``. Docs with zero tokens produce no row (the
    same docs :func:`simhash64` callers filter out)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__w")
    ).select(id_col, portable_hash60(F.col("__w")).alias("__h"))
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.shiftright("__h", b).bitwiseAND(F.lit(1))).alias(f"__s{b}")
        for b in range(bits)
    ]
    g = tok.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            F.col(f"__s{b}") * 2 > F.col("__n"), F.lit(1 << b)
        ).otherwise(F.lit(0))
    return g.select(id_col, sig.alias("sig"))


def simhash_table(df, id_col: str, text_col: str, bits: int = 48):
    """Relation-level SimHash via the :func:`minhash_table` pattern:
    stage 1 stays JVM-side and bit-identical to the oracle twin (token →
    ``portable_hash60``, one md5 per token, materialized as an array per
    doc — scan-local, no explode), stage 2 — the per-bit majority count —
    runs vectorized in numpy via ``mapInPandas``: one flat uint64 array
    of all token hashes per Arrow batch, ``bits`` vectorized
    shift-mask-``add.reduceat`` passes. Replaces
    :func:`simhash_by_agg`'s explode + groupBy(id) + ``bits``
    codegen'd SUMs (r14 profile: ~2.4 s CPU over ~1M exploded token rows
    at sf0.1) — no exchange at all, and docs never leave their scan
    partition. Bit semantics identical: bit b set iff ``2·ones_b > n``
    (tie → 0), pinned by ``test_simhash_table_matches_agg``. Zero-token
    docs are masked inside the fold (same row set as the explode-based
    aggregate, where they vanish naturally).

    Returns ``(id_col, sig)``."""
    import numpy as np
    import pandas as pd

    based = df.select(
        F.col(id_col).alias("__id"),
        F.transform(tokens(F.col(text_col)), lambda w: portable_hash60(w)).alias(
            "__hs"
        ),
    )
    id_type = based.schema["__id"].dataType.simpleString()

    def fold(batches):
        one = np.uint64(1)
        for pdf in batches:
            arrs = [np.asarray(v, dtype=np.uint64) for v in pdf["__hs"]]
            lens = np.array([len(a) for a in arrs], dtype=np.int64)
            ids = pdf["__id"].to_numpy()
            keep = lens > 0
            if not keep.all():
                arrs = [a for a, k in zip(arrs, keep) if k]
                lens = lens[keep]
                ids = ids[keep]
            if len(arrs) == 0:
                yield pd.DataFrame(
                    {
                        "__id": pd.Series([], dtype=ids.dtype),
                        "sig": pd.Series([], dtype="int64"),
                    }
                )
                continue
            flat = np.concatenate(arrs)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            sig = np.zeros(len(lens), dtype=np.int64)
            for b in range(bits):
                ones = np.add.reduceat(
                    ((flat >> np.uint64(b)) & one).astype(np.int64), starts
                )
                sig |= (2 * ones > lens).astype(np.int64) << b
            yield pd.DataFrame({"__id": ids, "sig": sig})

    return (
        based.mapInPandas(fold, f"__id {id_type}, sig long")
        .select(F.col("__id").alias(id_col), "sig")
    )


def with_materialized(df, col: Column, name: str):
    """Materialize an expensive expression exactly once per row.

    ``explode(array(expr))`` introduces a Generate node, which CollapseProject
    does not traverse — downstream projections referencing ``name`` N times
    read the materialized value instead of duplicating (and re-evaluating)
    the whole expression tree N times. Use for the struct outputs of
    ``minhash_struct`` / ``quality_struct`` / ``language_score_struct``.
    """
    return df.withColumn(name, F.explode(F.array(col)))
