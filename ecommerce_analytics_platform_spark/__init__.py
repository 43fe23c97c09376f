"""ecommerce_analytics_platform_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of the
reference repo ``mattyg3/ecommerce_analytics_platform`` (a DuckDB + dbt
medallion ETL pipeline), built Spark-first:

- ``sources``    — schema-enforced NDJSON/Parquet readers & partitioned sinks
                   (reference: ingestion/streaming_ingest.py, batch_ingest.py)
- ``operators``  — dedup, sessionization, calendar, incremental
                   materialization, similarity search
- ``functions``  — cross-engine-portable scalar helpers (date parts, hashes,
                   text statistics)
- ``plans``      — the silver/gold model DAG + declarative runner
                   (reference: dbt_project/models/**)
- ``streaming``  — Structured Streaming ingest with checkpointed exactly-once
                   file tracking (reference: ingestion/streaming_ingest.py)

Everything is DataFrame/Spark-SQL declarative so Catalyst + AQE pick the
physical plan; Python UDFs are avoided in all hot paths.
"""

__version__ = "0.1.0"

from ecommerce_analytics_platform_spark.session import get_spark  # noqa: F401
