"""Text-analysis column functions for large-scale training-data pipelines.

Beyond the reference's surface (it has no text ops — SURVEY §2.3: "no regex,
no string concat/split in the pipeline"), these are the ops a 100 TB
pretraining-data pipeline needs: tokenization stats, quality scoring,
language ID, fingerprinting. Everything is built from JVM-side
``pyspark.sql.functions`` (split / transform / aggregate / filter higher-order
functions) so the hot path never leaves whole-stage codegen — no Python UDFs.

Each function has an exact DuckDB-SQL twin used by the correctness oracle
(see ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import portable_hash60, seeded_hash60

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


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>. Empty string → empty array."""
    t = F.trim(_c(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, _WS))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>); [] when fewer than n tokens.

    Built with sequence+transform (higher-order functions) — stays JVM-side.
    """
    w = tokens(text)
    idx = F.sequence(F.lit(0), F.size(w) - F.lit(n))  # inclusive bounds
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)])  # noqa: E731
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, shingle)
    )


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-grams of the whitespace-normalized text."""
    t = F.regexp_replace(F.trim(_c(text)), _WS, " ")
    idx = F.sequence(F.lit(1), F.length(t) - F.lit(n - 1))
    return F.when(F.length(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: t.substr(i, F.lit(n)))
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Heuristic quality-scoring features (length, punctuation and stopword
    ratios, mean token length) — the standard cheap pre-filters for
    pretraining corpora (C4/Gopher-style rules).
    """
    t = _c(text)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}-]", ""))
    stop = F.size(F.filter(toks, lambda w: F.lower(w).isin(*LANG_MARKERS["en"])))
    mean_tok = F.when(n_tok > 0, (F.length(F.regexp_replace(F.trim(t), _WS, "")) / n_tok)).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(stop / F.greatest(n_tok, F.lit(1)), 6),
        "mean_token_len": F.round(mean_tok, 6),
    }


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts; argmax (via greatest + chained when)
    is done by the caller so ties break deterministically by language code.
    """
    toks = F.transform(tokens(text), lambda w: F.lower(w))
    return {
        lang: F.size(F.filter(toks, lambda w: w.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(text: Column | str) -> Column:
    """Heuristic language ID: language with the most marker hits;
    deterministic tie-break on language code order; 'und' when zero hits."""
    scores = language_scores(text)
    langs = sorted(scores)  # de, en, es, fr, zh — fixed deterministic order
    best = F.greatest(*[scores[l] for l in langs])
    out = F.lit("und")
    # chained when(): first lang (in sorted order) achieving the max wins
    expr = None
    for l in langs:
        cond = (scores[l] == best) & (best > 0)
        expr = F.when(cond, F.lit(l)) if expr is None else expr.when(cond, F.lit(l))
    return expr.otherwise(out)


def doc_fingerprint(text: Column | str) -> Column:
    """Order-sensitive 60-bit document fingerprint: hash of the
    whitespace-normalized text (a rolling-hash analog computed via one md5 —
    cheap, exact-dup-detecting, cross-engine portable)."""
    norm = F.regexp_replace(F.trim(_c(text)), _WS, " ")
    return portable_hash60(norm)


def minhash_signature(text: Column | str, num_hashes: int = 16, shingle_n: int = 3) -> list[Column]:
    """MinHash signature columns over word shingles.

    h_i = min over shingles of seeded portable hash i. Documents with no
    shingles get NULL minhashes (caller filters). Returns ``num_hashes``
    Column expressions — keep as separate columns (columnar, prunable)
    rather than one array so banding can select subsets without
    deserializing arrays.
    """
    sh = word_shingles(text, shingle_n)

    # NB: closures, not default-arg lambdas — PySpark higher-order functions
    # turn EVERY lambda parameter (defaults included) into a lambda variable.
    def seeded(i: int):
        prefix = f"{i}:"
        return lambda s: portable_hash60(F.concat(F.lit(prefix), s))

    sigs = []
    for i in range(num_hashes):
        sigs.append(F.array_min(F.transform(sh, seeded(i))))
    return sigs


def simhash64(text: Column | str, bits: int = 16) -> Column:
    """SimHash over whitespace tokens using the portable hash family.

    For each bit b: sum over tokens of (+1 if bit set else -1); the simhash
    has bit b set iff the sum is > 0. ``bits``=16 keeps the generated
    expression tree small while remaining a faithful SimHash; the full
    64-bit variant is the same construction.
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda w: portable_hash60(w))

    def bit_contrib(mask: int):
        return lambda a, h: a + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)

    acc = F.lit(0).cast("long")
    for b in range(bits):
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), bit_contrib(1 << b))
        acc = acc + F.when(contrib > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return acc
