"""Exactness tests for operators/fuzzy.py: both joins must equal the
brute-force all-pairs result (the filters are complete, not heuristic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.text import simhash64, tokens
from ecommerce_analytics_platform_spark.operators.fuzzy import (
    _band_bounds,
    edit_similarity_join,
    hamming_neardup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_edit(rows: list[tuple[int, str]], d: int) -> set[tuple[int, int, int]]:
    out = set()
    for i, (ia, a) in enumerate(rows):
        for ib, b in rows[i + 1 :]:
            dist = _lev(a, b)
            if dist <= d:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, dist))
    return out


def test_band_bounds_cover_bits_exactly():
    for bits, bands in [(48, 4), (17, 4), (5, 5), (64, 3)]:
        spans = _band_bounds(bits, bands)
        assert len(spans) == bands
        assert sum(w for _, w in spans) == bits
        lo = 0
        for b_lo, w in spans:
            assert b_lo == lo and w >= 1
            lo += w


@pytest.mark.parametrize("d", [1, 2])
@pytest.mark.parametrize("method", ["deletion", "qgram"])
def test_edit_join_equals_bruteforce_crafted(spark, d, method):
    # adversarial shorts: repeated-gram strings whose distinct-gram count
    # collapses ("aaaa" has ONE distinct 4-gram), empty-ish strings, plus
    # normal-length near pairs at/over the threshold
    rows = [
        (1, "aaaaaaaa"),
        (2, "aaaabaaa"),
        (3, "aaaa"),
        (4, "aaab"),
        (5, "ab"),
        (6, "b"),
        (7, ""),
        (8, "fuzzy matching join"),
        (9, "fuzzy matching joins"),
        (10, "fuzzy matching joint"),
        (11, "fuzzy watching joint"),
        (12, "completely different"),
        (13, "fuzzy matching join"),  # exact dup of 8 -> dist 0
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_similarity_join(
            df, "id", "s", max_edits=d, q=2, method=method
        ).collect()
    }
    assert got == _brute_edit(rows, d)


@pytest.mark.parametrize("method", ["deletion", "qgram"])
def test_edit_join_equals_bruteforce_customer_names(spark, method):
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name")
        .limit(400)
    )
    rows = [(r.c_custkey, r.c_name) for r in cust.collect()]
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_similarity_join(
            cust, "c_custkey", "c_name", 1, q=4, method=method
        ).collect()
    }
    assert got == _brute_edit(rows, 1)
    assert got  # the fixed-format keys must actually produce matches


@pytest.mark.parametrize("bits,d", [(48, 3), (16, 2)])
def test_hamming_join_equals_bruteforce_crafted(spark, bits, d):
    sigs = [
        (1, 0),
        (2, 1),                      # ham(1,2)=1
        (3, (1 << d) - 1),           # d low bits set
        (4, (1 << (d + 1)) - 1),     # d+1 bits -> over threshold vs 1
        (5, 1 << (bits - 1)),        # top bit only
        (6, (1 << bits) - 1),        # all ones
        (7, 0),                      # dup of 1 -> ham 0
    ]
    df = spark.createDataFrame(sigs, "id long, sig long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_neardup_pairs(df, "id", "sig", bits, d).collect()
    }
    want = set()
    for i, (ia, a) in enumerate(sigs):
        for ib, b in sigs[i + 1 :]:
            h = bin(a ^ b).count("1")
            if h <= d:
                want.add((min(ia, ib), max(ia, ib), h))
    assert got == want
    assert (1, 7, 0) in got and (1, 2, 1) in got


def test_hamming_join_equals_bruteforce_simhash_docs(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.size(tokens(F.col("text"))) > 0)
    )
    sigs = docs.select("doc_id", simhash64(F.col("text"), bits=48).alias("sig"))
    pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_neardup_pairs(sigs, "doc_id", "sig", 48, 3).collect()
    }
    rows = [(r.doc_id, r.sig) for r in sigs.collect()]
    want = set()
    for i, (ia, a) in enumerate(rows):
        for ib, b in rows[i + 1 :]:
            h = bin(a ^ b).count("1")
            if h <= 3:
                want.add((min(ia, ib), max(ia, ib), h))
    assert pairs == want
    assert pairs  # planted near-dups land under Hamming 3 at 48 bits


def test_hamming_max_bucket_drops_degenerate_bucket(spark):
    # 50 boilerplate docs share one signature (every band degenerate);
    # one genuine near pair must survive the cap
    rows = [(i, 0) for i in range(50)] + [(100, 1 << 40), (101, (1 << 40) | 1)]
    df = spark.createDataFrame(rows, "id long, sig long")
    capped = hamming_neardup_pairs(df, "id", "sig", 48, 3, max_bucket=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got
    assert not any(a < 50 and b < 50 for a, b in got)


# -- stats-driven auto dispatch (VERDICT r9 directive #8) --------------------


def test_auto_dispatch_picks_fastss_on_fixed_format_keys(spark):
    from ecommerce_analytics_platform_spark.operators.fuzzy import (
        choose_edit_join_method,
    )

    keys = spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(500)], "id long, s string"
    )
    assert choose_edit_join_method(keys, "s", max_edits=1) == "deletion"
    assert choose_edit_join_method(keys, "s", max_edits=2) == "deletion"


def test_auto_dispatch_picks_qgram_on_long_free_text(spark):
    import random

    from ecommerce_analytics_platform_spark.operators.fuzzy import (
        choose_edit_join_method,
    )

    rng = random.Random(7)
    vocab = [f"word{j}" for j in range(2000)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(80)))  # ~550 chars
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "id long, s string")
    assert choose_edit_join_method(docs, "s", max_edits=1) == "qgram"
    assert choose_edit_join_method(docs, "s", max_edits=3) == "qgram"


def test_auto_dispatch_degenerate_long_keys_prefer_fastss(spark):
    """Mid-length strings with a giant shared region: qgram postings
    degenerate (tiny vocab), so d=1 routes to the deletion neighborhood."""
    from ecommerce_analytics_platform_spark.operators.fuzzy import (
        choose_edit_join_method,
    )

    base = "ab" * 150  # 300 chars over a 2-letter alphabet: ≤16 gram types
    rows = [
        (i, base[: 2 * (i % 150)] + "z" + base[2 * (i % 150) + 1 :])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    assert choose_edit_join_method(df, "s", max_edits=1) == "deletion"


def test_auto_output_equals_forced_methods(spark):
    from ecommerce_analytics_platform_spark.operators.fuzzy import (
        edit_similarity_join,
    )

    rows = [(i, f"Customer#{i:09d}") for i in range(60)]
    rows += [(100, "Customer#000000001x"), (101, "Customer#000000059")]
    df = spark.createDataFrame(rows, "id long, s string")

    def got(method):
        return sorted(
            (r.id_a, r.id_b, r.dist)
            for r in edit_similarity_join(
                df, "id", "s", max_edits=1, method=method
            ).collect()
        )

    auto = got("auto")
    assert auto == got("deletion") == got("qgram")
    assert (1, 100, 1) in auto  # the planted one-insert pair


def test_dispatch_stable_under_sample_bound(spark, monkeypatch):
    """Shrinking the stats-sample bound (r15: 100k -> 8k) must not flip
    the auto dispatch: the decision on the registry's real join columns
    (customer names; document text) is identical to a full-input stats
    pass."""
    from ecommerce_analytics_platform_spark.operators import fuzzy
    from tests.conftest import SF_DIR

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cases = [(cust, "c_name"), (docs, "text")]
    small = [fuzzy.choose_edit_join_method(df, c, 1, 4) for df, c in cases]
    monkeypatch.setattr(fuzzy, "_STATS_SAMPLE_ROWS", 10_000_000)
    full = [fuzzy.choose_edit_join_method(df, c, 1, 4) for df, c in cases]
    assert small == full
