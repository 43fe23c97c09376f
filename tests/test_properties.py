"""Property-based tests (hypothesis) for the arithmetic-heavy operators:
one adversarial counterexample here would silently poison oracle parity."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.compat import (
    MERSENNE61,
    multmod61,
)

# keep Spark round-trips batched: collect hypothesis examples, run one job
settings.register_profile("spark", max_examples=15, deadline=None)
settings.load_profile("spark")


@given(
    hs=st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=1, max_size=50),
    a=st.integers(min_value=1, max_value=(1 << 31) - 1),
    b=st.integers(min_value=0, max_value=(1 << 60) - 1),
)
def test_multmod61_matches_bigint_truth(spark, hs, a, b):
    df = spark.createDataFrame([(h,) for h in hs], ["h"])
    got = [r["x"] for r in df.select(multmod61(F.col("h"), a, b).alias("x")).collect()]
    expect = [(a * h + b) % MERSENNE61 for h in hs]
    assert got == expect


@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
    right_ts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30, unique=True),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    from ecommerce_analytics_platform_spark.operators.asof import asof_join

    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=s), i) for i, s in enumerate(left_ts)],
        ["k", "lts", "lid"],
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=s), float(s)) for s in right_ts],
        ["k", "rts", "payload"],
    )
    out = asof_join(left, right, "k", "lts", "rts", ["payload"])
    got = {r["lid"]: r["payload"] for r in out.collect()}

    lp = pd.DataFrame({"lts": [pd.Timestamp(t0 + dt.timedelta(seconds=s)) for s in left_ts],
                       "lid": list(range(len(left_ts)))}).sort_values("lts")
    rp = pd.DataFrame({"rts": [pd.Timestamp(t0 + dt.timedelta(seconds=s)) for s in right_ts],
                       "payload": [float(s) for s in right_ts]}).sort_values("rts")
    merged = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", direction="backward")
    expect = {
        int(r.lid): (None if pd.isna(r.payload) else r.payload)
        for r in merged.itertuples()
    }
    assert got == expect


@given(
    gaps=st.lists(st.integers(min_value=1, max_value=4000), min_size=1, max_size=25),
)
def test_sessionize_counts_match_naive(spark, gaps):
    from ecommerce_analytics_platform_spark.operators.sessionize import sessionize_by_gap

    t0 = dt.datetime(2026, 1, 1)
    ts, acc = [], 0
    for g in gaps:
        acc += g
        ts.append(t0 + dt.timedelta(seconds=acc))
    df = spark.createDataFrame([(1, t, i) for i, t in enumerate(ts)], ["user_id", "ts", "event_id"])
    out = sessionize_by_gap(df, "user_id", "ts", 1800, order_tiebreak="event_id")
    got = out.agg(F.max("session_seq")).collect()[0][0]
    naive = 1 + sum(1 for g in gaps[1:] if g > 1800)
    assert got == naive


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),  # tiny alphabet → shingle collisions
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_minhash_table_matches_struct_fold(spark, texts):
    """The vectorized numpy fast path (text.minhash_table) must produce
    bit-identical signatures to the original JVM struct-fold
    (text.minhash_struct) on arbitrary text, including empty/short docs
    (both paths drop docs with no shingles)."""
    from ecommerce_analytics_platform_spark.functions.text import (
        _MINHASH_INIT,
        minhash_struct,
        minhash_table,
        with_materialized,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    fast = {
        r["__id"]: tuple(r[f"mh{i}"] for i in range(4))
        for r in minhash_table(df, "doc_id", "text", num_hashes=4, shingle_n=3).collect()
    }
    slow_df = with_materialized(
        df.select("doc_id", "text"), minhash_struct(F.col("text"), 4, 3), "sig"
    ).filter(F.col("sig")["mh0"] != F.lit(_MINHASH_INIT))
    slow = {
        r["doc_id"]: tuple(r["sig"][f"mh{i}"] for i in range(4))
        for r in slow_df.collect()
    }
    assert fast == slow


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=8, deadline=None)
def test_star_cc_equals_minlabel_cc(spark, pairs):
    """Star contraction and min-label propagation are different algorithms
    with the same contract — equal component assignments on ANY graph."""
    from ecommerce_analytics_platform_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    e = spark.createDataFrame(pairs, "src long, dst long")
    lbl = {r["node"]: r["component"] for r in connected_components(e).collect()}
    star = {r["node"]: r["component"] for r in connected_components_star(e).collect()}
    assert lbl == star
