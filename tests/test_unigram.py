"""Unigram-LM tokenizer training (operators/unigram.py) vs a pure-Python
reference implementation of the hard-EM loop (Kudo 2018 §3.2, deterministic
Viterbi variant), plus segmentation edge cases: UNK fallback, tie-breaks,
word-length bounds, coverage."""

from __future__ import annotations

import math
from collections import Counter

from ecommerce_analytics_platform_spark.operators.unigram import (
    UNK_FACTOR,
    corpus_words,
    unigram_token_count,
    unigram_train,
    viterbi_segment,
)


def _half_up(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _ref_words(texts: list[str], max_word_len: int = 12) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if 1 <= len(w) <= max_word_len:
                c[w] += 1
    return c


def _ref_prune(
    used: Counter, singles: set[str], keep_multi: int, scale: int
) -> dict[str, tuple[int, int]]:
    """piece -> (score, used), mirroring _prune_and_score."""
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


def _ref_viterbi(
    word: str, vocab: dict[str, int], max_piece_len: int, scale: int
) -> list[str]:
    n = len(word)
    dp: list[tuple[int, int]] = [(0, 0)] + [(0, 0)] * n  # (best, piece_len)
    for i in range(1, n + 1):
        best = None
        for k in range(1, min(max_piece_len, i) + 1):
            piece = word[i - k : i]
            if k == 1:
                s = dp[i - k][0] + vocab.get(piece, UNK_FACTOR * scale)
            elif piece in vocab:
                s = dp[i - k][0] + vocab[piece]
            else:
                continue
            # max score, then SMALLEST k
            if best is None or (s, -k) > (best[0], -best[1]):
                best = (s, k)
        dp[i] = best  # type: ignore[assignment]
    pieces, pos = [], n
    while pos > 0:
        k = dp[pos][1]
        pieces.append(word[pos - k : pos])
        pos -= k
    return pieces[::-1]


def _ref_train(
    texts: list[str],
    max_word_len: int = 12,
    max_piece_len: int = 4,
    seed_multi: int = 200,
    vocab_multi: int = 64,
    rounds: int = 2,
    scale: int = 10000,
) -> dict[str, tuple[int, int]]:
    words = _ref_words(texts, max_word_len)
    seed: Counter = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for p in range(1, max_piece_len + 1):
                if i + p <= len(w):
                    seed[w[i : i + p]] += c
    singles = {p for p in seed if len(p) == 1}
    vocab = _ref_prune(seed, singles, seed_multi, scale)
    for _ in range(rounds):
        scores = {p: s for p, (s, _) in vocab.items()}
        used: Counter = Counter()
        for w, c in words.items():
            for piece in _ref_viterbi(w, scores, max_piece_len, scale):
                used[piece] += c
        vocab = _ref_prune(used, singles, vocab_multi, scale)
    return vocab


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox is quick and the dog is lazy",
    "pack my box with five dozen liquor jugs quickly",
    "sphinx of black quartz judge my vow",
    "brown foxes and lazy dogs jump over boxes",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_train_matches_pure_python(spark):
    got = {
        r["piece"]: (r["score"], r["used"])
        for r in unigram_train(_docs(spark), rounds=2).collect()
    }
    assert got == _ref_train(TEXTS)


def test_viterbi_matches_reference_and_covers(spark):
    vocab = _ref_train(TEXTS)
    vrows = [(p, s) for p, (s, _) in vocab.items()]
    scores = dict(vrows)
    words = corpus_words(_docs(spark))
    seg = {
        r["word"]: r["pieces"]
        for r in viterbi_segment(words, vrows).collect()
    }
    for w, pieces in seg.items():
        assert "".join(pieces) == w  # total coverage, natural order
        assert pieces == _ref_viterbi(w, scores, 4, 10000)


def test_tie_breaks_prefer_shortest_piece(spark):
    # "abab": a+b, ab+ab and abab all score -40; the per-position
    # smallest-piece tie-break picks singles at every step
    vrows = [("a", -10), ("b", -10), ("ab", -20), ("abab", -40)]
    words = spark.createDataFrame([("abab",)], "word string")
    [row] = viterbi_segment(words, vrows).collect()
    assert row["pieces"] == ["a", "b", "a", "b"]
    # and when the longer piece strictly wins, it is chosen
    vrows2 = [("a", -10), ("b", -10), ("ab", -19)]
    [row2] = viterbi_segment(words, vrows2).collect()
    assert row2["pieces"] == ["ab", "ab"]


def test_unk_fallback_on_unseen_char(spark):
    vrows = [("a", -5), ("ab", -8)]
    words = spark.createDataFrame([("axb",)], "word string")
    [row] = viterbi_segment(words, vrows).collect()
    assert row["pieces"] == ["a", "x", "b"]
    # score: -5 + 2 * UNK  (b also unseen)
    assert row["n_pieces"] == 3


def test_word_length_bounds(spark):
    texts = ["short " + "x" * 13 + " ok"]
    words = {r["word"] for r in corpus_words(_docs(spark, texts)).collect()}
    assert words == {"short", "ok"}


def test_token_count_matches_reference(spark):
    vocab = _ref_train(TEXTS)
    vrows = [(p, s) for p, (s, _) in vocab.items()]
    scores = dict(vrows)
    got = {
        r["doc_id"]: (r["n_pieces"], r["n_chars"])
        for r in unigram_token_count(_docs(spark), "doc_id", "text", vrows).collect()
    }
    for i, t in enumerate(TEXTS):
        ws = [w.lower() for w in t.split() if 1 <= len(w) <= 12]
        exp_pieces = sum(len(_ref_viterbi(w, scores, 4, 10000)) for w in ws)
        exp_chars = sum(len(w) for w in ws)
        assert got[i] == (exp_pieces, exp_chars)


def test_viterbi_plan_is_scan_local(spark):
    """The E-step DP must be a pure projection: no shuffle (Exchange) in
    the segmented-words plan beyond what the input relation carries."""
    vrows = [("a", -5)]
    words = spark.createDataFrame([("aa",)], "word string")
    plan = viterbi_segment(words, vrows)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
