"""Training-data export: sharded datasets with a manifest.

The last mile of a data pipeline feeding training jobs: N similarly-sized
shard files a data loader can stream round-robin, plus a manifest recording
counts/schema for reproducibility checks. Beyond the reference surface (its
terminal layer is warehouse tables).

Sharding modes:

- ``roundrobin`` — `repartition(n)` (AQE-balanced, random assignment):
  maximally even shards, NOT stable across runs. For one-shot exports.
- ``hash`` — `repartition(n, hash(id))`: same row → same shard on any run
  and any cluster size (content-addressed, like the train/val split).
  For resumable/incremental exports.

Scale notes: one shuffle either way; shard count should be chosen so each
shard is 100 MB–1 GB (the data-loader sweet spot), i.e. n ≈ bytes / 512 MB.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    mode: str = "hash",
    id_col: str | None = None,
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` as exactly ``n_shards`` files + ``_manifest.json``.

    Returns the manifest dict (rows, shards, schema, mode).
    """
    if mode == "hash":
        if not id_col:
            raise ValueError("hash mode requires id_col")
        sharded = df.repartition(n_shards, F.col(id_col))
    elif mode == "roundrobin":
        sharded = df.repartition(n_shards)
    else:
        raise ValueError(f"unknown mode: {mode}")

    sharded.write.mode("overwrite").format(fmt).save(path)
    spark = df.sparkSession
    written = spark.read.format(fmt).load(path)
    manifest = {
        "rows": written.count(),
        "shards": n_shards,
        "mode": mode,
        "format": fmt,
        "schema": written.schema.jsonValue(),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def read_shards(spark: SparkSession, path: str, validate: bool = True) -> DataFrame:
    """Read a sharded export; with ``validate`` checks the manifest row
    count (cheap corruption/partial-write detection before a training run)."""
    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    df = spark.read.format(manifest["format"]).load(path)
    if validate:
        n = df.count()
        if n != manifest["rows"]:
            raise AssertionError(f"manifest={manifest['rows']} rows, found {n}")
    return df
