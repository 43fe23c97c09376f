"""Schema-enforced CSV ingest with quarantine semantics.

The reference ingests only NDJSON (SURVEY §2.1), but a drop-in engine needs
the other flat-file lane partners actually deliver. Same design stance as
``ndjson.py``: schema-on-read (no inference pass — at 100 TB inference IS a
full extra scan), malformed rows are captured rather than dropped or
crashed on, and the caller decides the quarantine policy.

PERMISSIVE + ``columnNameOfCorruptRecord`` keeps every raw line: well-formed
rows parse into typed columns, malformed rows land whole in ``_corrupt``
with typed columns null. ``split_corrupt`` then routes them to a quarantine
relation — the audit trail a lossy DROPMALFORMED read cannot give you.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV read with declared schema; malformed lines captured in
    ``_corrupt`` instead of being dropped (DROPMALFORMED) or raising
    (FAILFAST under ANSI)."""
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.schema(full)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows drop the corrupt column; quarantine
    keeps the raw offending line for replay/audit."""
    # Spark refuses raw-CSV queries whose referenced columns reduce to only
    # the corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    # RECORD_COLUMN) — the documented remedy is to cache the parsed frame
    # first, which is also what we want: both halves read the same parse.
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad
