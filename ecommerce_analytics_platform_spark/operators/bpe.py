"""Distributed BPE merge training (Sennrich et al. 2016, public spec).

The missing piece between the registry's regex-"BPE-ish" token counter
and a real tokenizer pipeline: LEARN the merge table from the corpus,
then segment with it. Structure mirrors the reference algorithm exactly,
re-expressed Spark-first:

- One corpus-sized shuffle total: ``word -> count`` (tokens are
  whitespace words; BPE never crosses word boundaries). Every training
  round after that operates on the VOCAB-sized word table — at 100 TB the
  corpus scan happens once, and k merge rounds cost k vocab-local passes
  plus k top-1 reductions (a 1-row collect each, bounded).
- Symbol state per word is a ``\\x1f``-joined string folded with
  ``F.aggregate`` — the same greedy left-to-right non-overlapping merge
  the reference implementation applies (fold keeps the just-merged token
  as one symbol, so "aaa" merges to [aa, a], "aaaa" to [aa, aa]).
- Pair statistics count ALL adjacent pairs (overlaps included), weighted
  by word frequency — the reference's ``get_stats``. Tie-break: highest
  count, then lexicographic (left, right) — deterministic cross-engine.

The registry twin (plans/testdata_queries.py::q_bpe_merges) unrolls the
same loop in DuckDB SQL (list_reduce fold + generate_series pair gen), so
the learned merge table hash-matches cross-engine — the pagerank-style
iterative-oracle pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def chars_state(word: Column) -> Column:
    """word → initial symbol state: its characters joined by SEP."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.char_length(word)),
            lambda i: F.substring(word, i, 1),
        ),
        SEP,
    )


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """The one corpus-sized shuffle: whitespace words → counts + initial
    symbol state."""
    from ecommerce_analytics_platform_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("state", chars_state(F.col("w")))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = F.split(F.col("state"), SEP)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("left_sym"),
            F.element_at(syms, (i + 1).cast("int")).alias("right_sym"),
        ),
    )
    return (
        words.filter(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.left_sym", "p.right_sym")
        .agg(F.sum("cnt").alias("pair_cnt"))
    )


def apply_merge(state: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of ONE merge to a
    SEP-joined symbol state (pure column expression — vocab-local, no
    shuffle)."""
    syms = F.split(state, SEP)
    last = lambda acc: F.element_at(F.split(acc, SEP), -1)  # noqa: E731
    return F.aggregate(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            (last(acc) == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.substring(acc, 1, F.length(acc) - F.length(last(acc))),
                F.lit(left + right),
            ),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", k_merges: int = 10
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Learn the top ``k_merges`` BPE merges from a corpus.

    Returns ``(merges_df, merges_list)``: a DataFrame of
    (merge_rank, left_sym, right_sym, pair_cnt) and the same as a Python
    list (the driver needs each round's winner to build the next round's
    states anyway, so the list is free)."""
    spark = docs.sparkSession
    base = word_counts(docs, text_col).persist()
    base.count()  # materialize before the loop
    cur = base
    pending = 0  # apply_merge folds stacked lazily on top of `base`
    merges: list[tuple[str, str, int]] = []
    for _rank in range(k_merges):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("pair_cnt"), F.asc("left_sym"), F.asc("right_sym"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_cnt"]
        merges.append((l, r, int(c)))
        cur = cur.withColumn("state", apply_merge(F.col("state"), l, r))
        pending += 1
        # r15: no per-round persist — re-evaluating a short fold chain
        # over the ONE cached vocab table is cheaper than a
        # persist-fill job per round (the fold references its input ~3×,
        # so the expression tree grows ~3^pending: materialize every few
        # rounds to bound analysis cost, and never after the last merge)
        if pending >= 3 and _rank < k_merges - 1:
            nxt = cur.persist()
            nxt.count()
            base.unpersist()
            base = cur = nxt
            pending = 0
    base.unpersist()
    from ecommerce_analytics_platform_spark.session import literal_df

    # Arrow-backed literal (r14): the pickled-list path re-enters Python
    # workers on every scan of the merge table (guide §4.1)
    merges_df = literal_df(
        spark,
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_rank int, left_sym string, right_sym string, pair_cnt bigint",
    )
    return merges_df, merges


def _apply_merges_word(
    w: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Apply a rank-ordered merge list to one word — the same greedy
    left-to-right non-overlapping fold :func:`apply_merge` expresses in
    columns ("aaa" + (a,a) → [aa, a]); plain Python over the symbol
    list."""
    syms: list[str] = list(w)
    for left, right in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment documents with a learned merge list: per-doc token count
    under the learned vocabulary.

    The merge fold runs once per DISTINCT word, not per occurrence — the
    same vocab-bound shape as the unigram apply path and the DuckDB
    twin: at 100 TB the distinct-word relation saturates while
    occurrences keep growing, so folding per occurrence would re-run the
    k merges billions of redundant times. The fold itself is a
    ``mapInPandas`` Python pass (guide §4.2): the previous rank-ordered
    column expressions NESTED — each :func:`apply_merge` references its
    input ~3× so the tree grows ~3^k — and the analysis/codegen of that
    tree cost seconds per query against a distinct-word relation of
    dozens of rows (r15 profile). Occurrences then join the per-word
    symbol count (AQE broadcasts the word map when it is small, which it
    is — it's the vocabulary)."""
    import pandas as pd

    from ecommerce_analytics_platform_spark.functions.text import tokens

    pairs = [(m[0], m[1]) for m in merges]

    def n_syms(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "n_sym": pd.Series(
                        [len(_apply_merges_word(w, pairs)) for w in pdf["w"]],
                        dtype="int32",
                        index=pdf.index,
                    ),
                }
            )

    toks = docs.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("w")
    ).select(id_col, F.lower("w").alias("w"))
    wmap = toks.select("w").distinct().mapInPandas(n_syms, "w string, n_sym int")
    return (
        toks.join(wmap, "w")
        .groupBy(id_col)
        .agg(F.sum("n_sym").alias("bpe_tokens"), F.count(F.lit(1)).alias("words"))
    )
