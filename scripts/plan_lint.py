#!/usr/bin/env python3
"""Plan lint: walk EVERY registry query's physical plan and flag the
anti-patterns the 100 TB review checklist looks for:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — quadratic joins
  (legitimate only inside explicitly-guarded brute-force verifiers);
- ``BatchEvalPython`` — row-at-a-time Python UDFs (the slow path; Arrow
  batch nodes ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
  / ``FlatMapCoGroupsInPandas`` are the sanctioned Python escape hatches
  and are counted separately);
- per-query ``Exchange`` count — the shuffle budget (informational; a
  count spike is a regression smell even when wall time hides it).

Plans are inspected BEFORE execution (explain on the unexecuted frame), so
the lint is cheap enough to run per round at sf0.001.

Usage: python scripts/plan_lint.py [sf_dir] [query ...]
Exit 1 if any NON-allowlisted query plans a cartesian/BNLJ or a
row-at-a-time Python UDF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose plans legitimately contain a bounded non-equi join: each
# has an explicit row guard or is the brute-force verification twin.
BNLJ_ALLOWED = {
    "range_join",        # point-in-interval probe vs broadcast interval dim
    "asof_join",         # bounded interval condition
    "cosine_topk",       # guarded broadcast brute-force baseline
    "interval_merge",    # gaps-and-islands verify channel
    # r14: the add-1-smoothing vocab_size is a 1-row global-aggregate
    # broadcast (HashAggregate(keys=[]) build side — the same scalar
    # shape _classify_bnlj auto-sanctions), but the score table it
    # attaches to is now PERSISTED and the nested InMemoryRelation dump
    # pushes the build-side aggregate beyond the classifier's window.
    # Bounded by construction: exactly one broadcast row.
    "bigram_logprob",
}


def _classify_bnlj(plan: str) -> tuple[int, int, int]:
    """Split BroadcastNestedLoopJoin nodes into (scalar, agg_dim, general).

    - scalar: the build side under the next ``BroadcastExchange`` is a
      GLOBAL aggregate (``HashAggregate(keys=[], ...)``) — exactly one
      broadcast row (a scalar-subquery normalizer/cutoff); the join is
      linear.
    - agg_dim: the build side is a KEYED aggregate — its cardinality is
      bounded by the dimension's group count, not raw rows (the
      registry's cases: a day spine, per-label centroids, event-type
      group pairs — all ≤ O(100) groups). Linear in probe rows × groups;
      sanctioned, but worth eyeballing when a new one appears because
      boundedness rests on the DIM's cardinality.
    - general: anything else (raw relation broadcast into a non-equi
      join) — the genuine quadratic hazard the lint exists to catch."""
    lines = plan.splitlines()
    scalar = agg_dim = general = 0
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        window = lines[i + 1 : i + 40]
        seen_exchange = False
        kind = "general"
        for w in window:
            if "BroadcastExchange" in w:
                seen_exchange = True
            elif seen_exchange and "HashAggregate(keys=[]" in w:
                kind = "scalar"
                break
            elif seen_exchange and (
                "HashAggregate(keys=[" in w or "ObjectHashAggregate(keys=[" in w
            ):
                kind = "agg_dim"
                break
            elif seen_exchange and "Join" in w:
                break
        if kind == "scalar":
            scalar += 1
        elif kind == "agg_dim":
            agg_dim += 1
        else:
            general += 1
    return scalar, agg_dim, general


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from ecommerce_analytics_platform_spark.plans.testdata_queries import QUERIES
    from ecommerce_analytics_platform_spark.session import get_spark

    spark = get_spark(
        "plan-lint", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    rows = []
    for name, (fn, _sql) in QUERIES.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        cart = plan.count("CartesianProduct")
        bnlj_scalar, bnlj_dim, bnlj = _classify_bnlj(plan)
        row_udf = plan.count("BatchEvalPython")
        arrow = (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("FlatMapCoGroupsInPandas")
        )
        exch = plan.count("Exchange")
        rows.append((name, cart, bnlj, row_udf, arrow, exch, bnlj_scalar, bnlj_dim))
        if row_udf or ((cart or bnlj) and name not in BNLJ_ALLOWED):
            bad.append((name, cart, bnlj, row_udf))
        # registry pins release on next-query entry; explain doesn't run
        # jobs but some builders persist — release eagerly
        from ecommerce_analytics_platform_spark.session import release_pinned

        release_pinned()
        spark.catalog.clearCache()

    total_exch = sum(r[5] for r in rows)
    n_nonequi = sum(1 for r in rows if r[1] or r[2])
    n_arrow = sum(1 for r in rows if r[4])
    n_scalar = sum(1 for r in rows if r[6])
    n_dim = sum(1 for r in rows if r[7])
    print(f"\nqueries linted: {len(rows)}")
    print(f"total Exchange nodes: {total_exch} "
          f"(mean {total_exch / max(len(rows), 1):.1f}/query)")
    print(f"queries with ArrowEval/MapInPandas nodes: {n_arrow}")
    print(f"queries with scalar (1-row broadcast) BNLJ: {n_scalar} — linear, sanctioned")
    print(f"queries with aggregated-dim broadcast BNLJ: {n_dim} — group-count-bounded: "
          f"{sorted(r[0] for r in rows if r[7])}")
    print(f"queries with GENERAL cartesian/BNLJ: {n_nonequi} "
          f"(allowlisted: {sorted(r[0] for r in rows if (r[1] or r[2]) and r[0] in BNLJ_ALLOWED)})")
    print("top-10 by Exchange count:")
    for name, _c, _b, _u, _a, e, _s, _d in sorted(rows, key=lambda r: -r[5])[:10]:
        print(f"  {name}: {e}")
    if bad:
        print("\nFLAGGED (non-allowlisted cartesian/BNLJ or row Python UDF):")
        for name, c, b, u in bad:
            print(f"  {name}: cartesian={c} bnlj={b} row_udf={u}")
        spark.stop()
        sys.exit(1)
    print("\nno row-at-a-time Python UDFs; no unguarded cartesians — clean")
    spark.stop()


if __name__ == "__main__":
    main()
