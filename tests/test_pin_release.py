"""Persist-lifetime hygiene (VERDICT r6 #8 / ADVICE): query functions
that persist intermediates register them via ``_pin``; release is
structural — the registry wrapper drops the previous invocation's pins
on entry — so repeated registry sweeps leave no lingering cached RDDs."""

from __future__ import annotations

import __spark_entry__ as entrymod
from ecommerce_analytics_platform_spark.plans import testdata_queries as tq
from tests.conftest import SF_DIR


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _hermetic(spark) -> None:
    """Drop whatever earlier tests in the shared session left cached so
    this module measures ONLY its own queries' residue."""
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)


def test_pinning_queries_release_on_next_entry(spark):
    _hermetic(spark)
    q = entrymod.queries()
    # each of these persists an intermediate (LM count tables, PPJoin
    # shingle relation); entity_clusters persists CC edges internally
    for name in ["set_sim_join", "unigram_logprob", "bigram_logprob",
                 "entity_clusters", "pagerank", "label_prop",
                 "neardup_clusters"]:
        q[name](spark, SF_DIR).count()
    # entering any other registry query structurally releases the pins
    q["exact_dedup"](spark, SF_DIR).count()
    tq.release_pinned()
    assert _n_persistent(spark) == 0


def test_release_pinned_direct(spark):
    _hermetic(spark)
    q = entrymod.queries()
    # set_sim_join runs the PPJoin DAG every invocation (r15: no memo)
    # and pins the tkset persist for the caller's action
    q["set_sim_join"](spark, SF_DIR).count()
    assert _n_persistent(spark) >= 1  # the pinned tkset is live
    tq.release_pinned()
    assert _n_persistent(spark) == 0
    # a second invocation re-pins and re-releases the same way
    q["set_sim_join"](spark, SF_DIR).count()
    tq.release_pinned()
    assert _n_persistent(spark) == 0
