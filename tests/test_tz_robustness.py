"""The driver runs the registry with ITS OWN SparkSession — the queries
must not depend on inherited session state (timezone especially:
``ts.cast(date)`` is tz-dependent in Spark, tz-naive in the DuckDB oracle)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def test_queries_pin_utc_session_timezone(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = entrymod.queries()["daily_kpis"](spark, SF_DIR)
        df.collect()
        # building the query must have re-pinned UTC before planning
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
