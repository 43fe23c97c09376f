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


def _vocab_map(vocab_rows: list[tuple[str, int]]) -> Column:
    items: list[Column] = []
    for piece, score in sorted(vocab_rows):
        items.append(F.lit(piece))
        items.append(F.lit(int(score)).cast("long"))
    return F.create_map(*items)


def viterbi_segment(
    words: DataFrame,
    vocab_rows: list[tuple[str, int]],
    max_piece_len: int = 4,
    scale: int = 10000,
) -> DataFrame:
    """Adds ``pieces array<string>`` and ``n_pieces`` to a ``word`` relation:
    the max-score segmentation under the given (piece, score) vocab.

    Pure scan-local column computation — a fold over word positions builds
    the DP table ``dp[i] = (best score to i, chosen piece length)``, a
    second fold walks the backpointers. No shuffle, no UDF, no driver
    loop over rows; the vocab rides along as a broadcast map literal.
    Single-char lookups fall back to ``UNK_FACTOR·scale`` so segmentation
    is total on any input."""
    vmap = _vocab_map(vocab_rows)
    unk = F.lit(UNK_FACTOR * scale).cast("long")
    word = F.col("word")

    def step(acc: Column, i: Column) -> Column:
        cands = [
            F.struct(
                (
                    F.element_at(acc, i).getField("best")
                    + F.coalesce(
                        F.try_element_at(vmap, F.substr(word, i, F.lit(1))), unk
                    )
                ).alias("s"),
                F.lit(-1).alias("nb"),
            )
        ]
        for p in range(2, max_piece_len + 1):
            idx = F.greatest(i - (p - 1), F.lit(1))
            sc = F.try_element_at(vmap, F.substr(word, idx, F.lit(p)))
            cands.append(
                F.when(
                    (i >= p) & sc.isNotNull(),
                    F.struct(
                        (F.element_at(acc, idx).getField("best") + sc).alias("s"),
                        F.lit(-p).alias("nb"),
                    ),
                )
            )
        best = F.array_max(F.array_compact(F.array(*cands)))
        return F.concat(
            acc,
            F.array(
                F.struct(
                    best.getField("s").alias("best"),
                    (-best.getField("nb")).alias("bl"),
                )
            ),
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.struct(F.lit(0).cast("long").alias("best"), F.lit(0).alias("bl"))),
        step,
    )
    out = words.withColumn("__dp", dp)

    def wstep(acc: Column, _i: Column) -> Column:
        pos = acc.getField("pos")
        bl = F.element_at(F.col("__dp"), pos + 1).getField("bl")
        return F.when(
            pos > 0,
            F.struct(
                (pos - bl).alias("pos"),
                F.concat(
                    acc.getField("ps"),
                    F.array(F.substr(word, F.greatest(pos - bl + 1, F.lit(1)), bl)),
                ).alias("ps"),
            ),
        ).otherwise(acc)

    walk = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.struct(
            F.length(word).alias("pos"), F.array().cast("array<string>").alias("ps")
        ),
        wstep,
    )
    return (
        # the backpointer walk collects pieces end-to-start; reverse to
        # natural reading order
        out.withColumn("pieces", F.reverse(walk.getField("ps")))
        .withColumn("n_pieces", F.size("pieces").cast("long"))
        .drop("__dp")
    )


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
    besides the piece string."""
    words = corpus_words(docs, text_col, max_word_len).persist()
    try:
        subs = _substring_counts(words, max_piece_len)
        singles = subs.filter(F.length("piece") == 1).select("piece")
        vocab = _prune_and_score(subs, singles, seed_multi, scale)
        for _ in range(rounds):
            vrows = [
                (r["piece"], r["score"])
                for r in vocab.select("piece", "score").collect()
            ]
            seg = viterbi_segment(words, vrows, max_piece_len, scale)
            used = (
                seg.select(F.explode("pieces").alias("piece"), "cnt")
                .groupBy("piece")
                .agg(F.sum("cnt").alias("used"))
            )
            vocab = _prune_and_score(used, singles, vocab_multi, scale)
        return vocab
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
