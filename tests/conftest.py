"""Shared Spark test fixtures.

One session per pytest run, local[4] with tiny shuffle parallelism so the
suite stays fast; sf0.001 testdata for integration-ish tests.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ecommerce_analytics_platform_spark.session import get_spark

    # SPARK_GRAFT_MASTER (e.g. local-cluster[2,4,2048]) lets the whole
    # suite run against real executor processes; default stays local[4]
    s = get_spark(
        "tests",
        master=os.environ.get("SPARK_GRAFT_MASTER", "local[4]"),
        shuffle_partitions=4,
    )
    yield s
    s.stop()
