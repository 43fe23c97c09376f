"""Driver-contract smoke: every registry query runs at sf0.001, returns a
stable schema and >= 0 rows; oracle SQL exists and its key set aligns."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERY_NAMES = sorted(entrymod.queries())


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # rows-only: deterministic-fake multimodal kernels + float-boundary-
    # sensitive ANN bucketing (recall asserted in test_similarity)
    assert set(q) - set(o) == {"image_features", "audio_features", "ann_lsh", "ann_ivf"}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
