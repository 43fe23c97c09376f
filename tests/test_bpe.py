"""BPE merge training (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich's get_stats/merge_vocab, plus greedy-overlap
edge cases and learned-vocabulary segmentation."""

from __future__ import annotations

from collections import Counter

from ecommerce_analytics_platform_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
)


def _ref_bpe(texts: list[str], k: int) -> list[tuple[str, str, int]]:
    vocab: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(k):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        best_count = max(stats.values())
        m = min(p for p, c in stats.items() if c == best_count)
        merges.append((m[0], m[1], stats[m]))
        newv: Counter = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == m[0] and syms[i + 1] == m[1]:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            newv[tuple(out)] += c
        vocab = newv
    return merges


def _segments(word: str, merges) -> list[str]:
    syms = list(word)
    for left, right, *_ in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_train_matches_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the hat of the cat",
        "aaa aaaa banana bandana",
        "low lower lowest the the",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    _, merges = bpe_train(docs, "text", k_merges=6)
    assert merges == _ref_bpe(texts, 6)


def test_bpe_greedy_overlap_runs(spark):
    """'aaaa' must merge to [aa, aa] and 'aaa' to [aa, a] — greedy
    left-to-right non-overlap, the reference semantics."""
    docs = spark.createDataFrame([(0, "aaaa aaa aa")], "doc_id long, text string")
    _, merges = bpe_train(docs, "text", k_merges=1)
    assert merges[0][:2] == ("a", "a")
    # counts: 'aaaa' has 3 adjacent (a,a), 'aaa' has 2, 'aa' has 1 → 6
    assert merges[0][2] == 6
    seg = bpe_segment(docs, merges).collect()[0]
    # aaaa→[aa,aa], aaa→[aa,a], aa→[aa] ⇒ 5 symbols over 3 words
    assert seg["bpe_tokens"] == 5 and seg["words"] == 3


def test_bpe_segment_matches_reference(spark):
    texts = ["banana band bandana", "ban bananas"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    _, merges = bpe_train(docs, "text", k_merges=4)
    got = {r["doc_id"]: (r["bpe_tokens"], r["words"]) for r in
           bpe_segment(docs, merges).collect()}
    for i, t in enumerate(texts):
        words = t.lower().split()
        n = sum(len(_segments(w, merges)) for w in words)
        assert got[i] == (n, len(words)), (i, merges)
