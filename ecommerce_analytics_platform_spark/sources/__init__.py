"""Sources & sinks: NDJSON ingest, partitioned parquet landing, warehouse
table management (SURVEY §2.1 S1-S10)."""
