"""Physical data layout for scan efficiency at scale.

At 100 TB the dominant cost of most queries is the scan, and the scan's
cost is decided at WRITE time: directory partitioning decides which files a
predicate must open at all (partition pruning), and within-file sort order
decides which row groups the parquet reader can skip from footer min/max
stats (row-group pruning). This module packages the write-side half of the
reference's landing-zone layout (reference ingestion/streaming_ingest.py:
147-174 compacts per-``ingest_date`` partitions; we generalize to arbitrary
partition + clustering keys).

Rules of thumb encoded here:
- Partition by LOW-cardinality columns queries filter on (date, category);
  a high-cardinality partition key creates the small-file problem.
- Range-cluster by the high-cardinality filter/join column (user,
  timestamp): ``repartitionByRange`` + ``sortWithinPartitions`` gives each
  output file a narrow, DISJOINT range of the cluster key, so footer
  min/max stats skip whole files/row groups (a 1-D Z-order substitute).
- ``num_files`` caps total output tasks — the write-side knob that
  replaces post-hoc compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet with directory partitioning + range clustering.

    Each output task holds one contiguous (partition, cluster) key range,
    and rows inside it are sorted — after ``partitionBy`` splits the task
    by directory, every file covers a narrow disjoint cluster-key range.
    """
    partition_by = partition_by or []
    cluster_by = cluster_by or []
    keys = partition_by + cluster_by
    # Spark's default parquet timestamp encoding is INT96, which carries NO
    # footer min/max stats — a timestamp cluster key would sort the data
    # and then be unable to prune on it. Write annotated int64 micros, but
    # restore the caller's setting afterwards (a session conf is global;
    # leaking it would silently change every later sink's encoding).
    conf = df.sparkSession.conf
    ts_key = "spark.sql.parquet.outputTimestampType"
    prev_ts = conf.get(ts_key, None)
    conf.set(ts_key, "TIMESTAMP_MICROS")
    try:
        out = df
        if keys:
            out = out.repartitionByRange(num_files, *keys).sortWithinPartitions(*keys)
        else:
            out = out.repartition(num_files)
        writer = out.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    finally:
        if prev_ts is None:
            conf.unset(ts_key)
        else:
            conf.set(ts_key, prev_ts)


def scan_stats(spark: SparkSession, path: str, predicate: str | None = None) -> dict:
    """Execute a (filtered) scan and report what it actually read — file
    and row counts from the leaf FileSourceScan's runtime metrics. This is
    partition pruning + row-group pruning made observable; used by tests
    and as a layout diagnostic (the 100 TB question is always "how much of
    the table did this predicate really scan?")."""
    df = spark.read.parquet(path)
    if predicate:
        df = df.filter(predicate)
    # drive the Dataset's OWN QueryExecution (a sink would build a fresh
    # one whose metrics this inspection could not see)
    df._jdf.queryExecution().executedPlan().executeCollect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    metrics = leaves.apply(0).metrics()
    out = {}
    for key in ("numFiles", "numOutputRows", "filesSize"):
        if metrics.contains(key):
            out[key] = metrics.apply(key).value()
    return out
