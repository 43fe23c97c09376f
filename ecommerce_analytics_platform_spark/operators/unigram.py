"""SentencePiece-style unigram-LM tokenizer: distributed Viterbi hard-EM.

The subword-tokenizer family's second member next to BPE (operators/bpe.py):
where BPE greedily MERGES frequent pairs, the unigram LM (Kudo 2018,
"Subword Regularization", §3.2) starts from a LARGE seed vocabulary and
EM-shrinks it — each round segments the corpus by Viterbi under current
piece scores, re-estimates scores from piece usage, and prunes to the
target size. This implementation is the deterministic hard-EM variant
(Viterbi counts, not forward-backward expectations), with every modeling
choice made integer-exact so a DuckDB oracle twin reproduces training
bit-for-bit:

- scores are INTEGER micro-nats: ``round(scale · ln(count/total))`` as
  BIGINT (scale=10000 → 0.1 milli-nat resolution). The only transcendental
  touches a double once and is immediately quantized at a step ~11 orders
  of magnitude above libm's last-ulp disagreement; all DP arithmetic after
  that is int64.
- Viterbi ties break deterministically: max score, then SMALLEST piece
  length (engine-neutral: both sides implement argmax-then-min-plen).
- single-character pieces are never pruned and carry a +1 additive floor
  in every round — total coverage (any word segments), mirroring
  SentencePiece's required-character set.
- words longer than ``max_word_len`` are excluded from training and
  segmentation (the documented contract; bounds the DP and the unrolled
  oracle chain).

Scale shape (the BPE lesson, PERF.md): everything expensive runs on the
DISTINCT-WORD relation, which grows ~log-ish with corpus size, not on the
corpus. Per EM round: one scan-local Viterbi pass (a fold over word
positions — zero shuffle), one tiny piece-count shuffle. The corpus is
touched exactly once (word counting). The vocab is collected to the driver
between rounds as a broadcast map literal — bounded by ``seed_multi +
|alphabet|`` rows, the same bounded-literal class as the LSH hyperplanes.

No counterpart in /root/reference (the reference has no tokenizer surface);
public-algorithm implementation from the paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.text import tokens

#: score assigned to a single character absent from the vocab (can only
#: happen when segmenting text whose alphabet was not in training data)
UNK_FACTOR = -40


def corpus_words(
    docs: DataFrame, text_col: str = "text", max_word_len: int = 12
) -> DataFrame:
    """``(word, cnt)`` — the distinct-word relation all training runs on."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .select(F.lower("w").alias("word"))
        .filter(F.length("word").between(1, max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _substring_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    """Seed statistics: every substring occurrence of length ≤
    ``max_piece_len`` (with multiplicity), weighted by word count."""
    pos = words.select(
        "word",
        "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("start"),
    )
    parts = [
        pos.filter(F.col("start") + (p - 1) <= F.length("word")).select(
            F.substr("word", F.col("start"), F.lit(p)).alias("piece"), "cnt"
        )
        for p in range(1, max_piece_len + 1)
    ]
    allp = parts[0]
    for x in parts[1:]:
        allp = allp.unionAll(x)
    return allp.groupBy("piece").agg(F.sum("cnt").alias("used"))


def _prune_and_score(
    used: DataFrame, singles: DataFrame, keep_multi: int, scale: int
) -> DataFrame:
    """M-step: keep top ``keep_multi`` multi-char pieces by (used DESC,
    piece ASC), all single chars with a +1 floor; integer micro-nat
    scores against the post-prune total."""
    multi = used.filter(F.length("piece") >= 2)
    # top-k via sort+limit = TakeOrdered (per-partition heads merged on
    # the driver), NOT a global row_number window — the seed substring
    # relation can be huge at corpus scale and a single-partition window
    # sort would bottleneck there. (used DESC, piece ASC) is a total
    # order (piece unique), so the cut is deterministic.
    kept_multi = (
        multi.orderBy(F.col("used").desc(), F.col("piece").asc())
        .limit(keep_multi)
        .select("piece", "used")
    )
    kept_single = (
        singles.join(used.filter(F.length("piece") == 1), "piece", "left")
        .select(
            "piece", (F.coalesce(F.col("used"), F.lit(0)) + 1).alias("used")
        )
    )
    kept = kept_multi.unionAll(kept_single)
    total = kept.agg(F.sum("used").cast("double").alias("__total"))
    return kept.crossJoin(F.broadcast(total)).select(
        "piece",
        F.round(F.lit(scale) * F.log(F.col("used").cast("double") / F.col("__total")))
        .cast("long")
        .alias("score"),
        F.col("used").cast("long").alias("used"),
    )


def _viterbi_word(
    w: str, vmap: dict, max_piece_len: int, unk: int
) -> list[str]:
    """Max-score segmentation of one word — the same DP the previous
    column-expression fold computed: ``dp[i] = max over candidate pieces
    ending at i`` with candidates compared as ``(score, -piece_len)``
    tuples (max score, then SMALLEST piece length — engine-neutral
    tie-break), single chars falling back to ``unk`` so coverage is
    total. All-integer arithmetic: bit-identical to the oracle."""
    n = len(w)
    best = [0] * (n + 1)
    bl = [0] * (n + 1)
    for i in range(1, n + 1):
        b_s = best[i - 1] + vmap.get(w[i - 1], unk)
        b_nb = -1
        for p in range(2, max_piece_len + 1):
            if i >= p:
                sc = vmap.get(w[i - p : i])
                if sc is not None:
                    s2 = best[i - p] + sc
                    if s2 > b_s:  # ties keep the earlier = shorter piece
                        b_s, b_nb = s2, -p
        best[i], bl[i] = b_s, -b_nb
    pieces: list[str] = []
    pos = n
    while pos > 0:
        length = bl[pos]
        pieces.append(w[pos - length : pos])
        pos -= length
    pieces.reverse()
    return pieces


def viterbi_segment(
    words: DataFrame,
    vocab_rows: list[tuple[str, int]],
    max_piece_len: int = 4,
    scale: int = 10000,
) -> DataFrame:
    """Adds ``pieces array<string>`` and ``n_pieces`` to a ``word`` relation:
    the max-score segmentation under the given (piece, score) vocab.

    Scan-local ``mapInPandas``: the DP runs as a plain-Python fold per
    word with the vocab as a closure dict (guide §4.2/§4.5 — heavyweight
    state once per task). The previous pure-column implementation
    embedded 4 copies of the vocab as a ``create_map`` literal inside a
    positions fold — thousands of expression nodes whose analysis +
    Janino compile cost SECONDS per distinct vocab (r15 profile: the
    segmentation input is the distinct-WORD relation, ~dozens of rows at
    sf0.1, yet each Viterbi pass cost 4-7 s — all driver-side plan work,
    zero data work). Integer arithmetic end to end, identical tie-breaks
    (max score, then smallest piece; Python dict lookups are exact), so
    results stay bit-identical — pinned by
    tests/test_unigram.py::test_viterbi_matches_reference_and_covers.
    No shuffle: the node is a MapInPandas over the input's partitioning."""
    import pandas as pd

    vmap = {p: int(s) for p, s in vocab_rows}
    unk = UNK_FACTOR * scale
    mpl = int(max_piece_len)

    def seg(batches):
        for pdf in batches:
            out = pdf.copy()
            pieces = [_viterbi_word(w, vmap, mpl, unk) for w in pdf["word"]]
            out["pieces"] = pieces
            out["n_pieces"] = pd.Series(
                [len(p) for p in pieces], dtype="int64", index=pdf.index
            )
            yield out

    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in words.schema.fields
    )
    return words.mapInPandas(
        seg, f"{in_schema}, pieces array<string>, n_pieces bigint"
    )


def _half_up(x: float) -> int:
    """Spark/DuckDB ``round()`` semantics: half away from zero."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _prune_driver(
    counts: list[tuple[str, int]],
    singles: list[str],
    keep_multi: int,
    scale: int,
) -> dict[str, tuple[int, int]]:
    """Driver half of the M-step over the ALREADY top-k-reduced counts:
    re-apply the (used DESC, piece ASC) cut (a no-op on a correctly
    limited input — kept for exactness), give every seed single char its
    +1 floor, and quantize integer micro-nat scores. Identical math to
    the old distributed ``_prune_and_score`` tail: the only
    transcendental is one ``ln`` immediately quantized at ``scale``
    (robust to last-ulp libm/JVM disagreement by design — the same
    argument that lets the DuckDB oracle replay training), and
    ``_half_up`` is Spark's ``round()``."""
    import math

    used = {p: int(u) for p, u in counts}
    multi = sorted(
        ((p, u) for p, u in used.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:keep_multi]
    kept = dict(multi)
    for s in singles:
        kept[s] = used.get(s, 0) + 1
    total = float(sum(kept.values()))
    return {
        p: (_half_up(scale * math.log(u / total)), u) for p, u in kept.items()
    }


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    max_word_len: int = 12,
    max_piece_len: int = 4,
    seed_multi: int = 200,
    vocab_multi: int = 64,
    rounds: int = 2,
    scale: int = 10000,
) -> DataFrame:
    """Train the unigram LM vocab: seed → ``rounds`` × (Viterbi E-step,
    count M-step, prune). Returns ``(piece, score, used)`` — all-integer
    besides the piece string.

    Per-phase distributed work is ONE top-k job (r15): the heavy
    relations (distinct substrings, per-round piece usage — both grow
    with the corpus) are reduced in Spark via TakeOrdered top-k plus the
    alphabet-bounded single-char slice, and only those ≤
    ``keep_multi + |alphabet|`` rows come to the driver — the SAME rows
    every EM round already collected to drive the next Viterbi. The +1
    single-char floor, the total and the quantized ln score now happen
    driver-side (:func:`_prune_driver`): the old distributed tail spent
    2-3 s PER PHASE on broadcast-build jobs (singles join, crossJoin
    total) over ≤300-row relations (r15 profile, warm local[32])."""
    from ecommerce_analytics_platform_spark.session import literal_df

    spark = docs.sparkSession
    words = corpus_words(docs, text_col, max_word_len).persist()
    try:
        subs = _substring_counts(words, max_piece_len)

        def topk_plus_singles(counts: DataFrame, k: int) -> list[tuple[str, int]]:
            reduced = (
                counts.filter(F.length("piece") >= 2)
                .orderBy(F.col("used").desc(), F.col("piece").asc())
                .limit(k)
                .unionAll(counts.filter(F.length("piece") == 1))
            )
            return [(r["piece"], r["used"]) for r in reduced.collect()]

        seed_counts = topk_plus_singles(subs, seed_multi)
        # the seed alphabet: every single char seen in training data —
        # singles keep their +1 floor in EVERY later round even when a
        # round's segmentation never uses them
        singles = sorted(p for p, _u in seed_counts if len(p) == 1)
        vocab = _prune_driver(seed_counts, singles, seed_multi, scale)
        for _ in range(rounds):
            vrows = [(p, s) for p, (s, _u) in vocab.items()]
            seg = viterbi_segment(words, vrows, max_piece_len, scale)
            used = (
                seg.select(F.explode("pieces").alias("piece"), "cnt")
                .groupBy("piece")
                .agg(F.sum("cnt").alias("used"))
            )
            vocab = _prune_driver(
                topk_plus_singles(used, vocab_multi), singles, vocab_multi, scale
            )
        return literal_df(
            spark,
            [(p, s, u) for p, (s, u) in vocab.items()],
            "piece string, score bigint, used bigint",
        )
    finally:
        words.unpersist()


def unigram_token_count(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab_rows: list[tuple[str, int]],
    max_word_len: int = 12,
    max_piece_len: int = 4,
    scale: int = 10000,
) -> DataFrame:
    """Tokenize the corpus with a trained vocab: per doc, total pieces and
    total characters over its in-bounds words. The DP runs once per
    DISTINCT word; docs join the result (vocab-bound compute,
    corpus-bound join)."""
    doc_words = (
        docs.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
        )
        .select(id_col, F.lower("w").alias("word"))
        .filter(F.length("word").between(1, max_word_len))
    )
    distinct_words = doc_words.select("word").distinct()
    seg = viterbi_segment(distinct_words, vocab_rows, max_piece_len, scale).select(
        "word", "n_pieces"
    )
    return (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_pieces").alias("n_pieces"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
    )
