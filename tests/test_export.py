"""Sharded training-data export: shard counts, manifest, hash stability."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.operators.export import read_shards, write_shards
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_write_read_roundtrip_with_manifest(spark, docs, tmp_path):
    path = str(tmp_path / "export")
    manifest = write_shards(docs, path, n_shards=4, mode="hash", id_col="doc_id")
    assert manifest["rows"] == docs.count()
    files = [f for f in glob.glob(f"{path}/*.parquet")]
    assert len(files) == 4
    back = read_shards(spark, path)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_hash_sharding_stable(spark, docs, tmp_path):
    """Same row → same shard file index across independent writes."""
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_shards(docs, p1, 4, mode="hash", id_col="doc_id")
    write_shards(docs, p2, 4, mode="hash", id_col="doc_id")

    def shard_of(path):
        out = {}
        for i, f in enumerate(sorted(glob.glob(f"{path}/part-*.parquet"))):
            for r in spark.read.parquet(f).select("doc_id").collect():
                out[r["doc_id"]] = i
        return out

    assert shard_of(p1) == shard_of(p2)


def test_manifest_validation_detects_tampering(spark, docs, tmp_path):
    path = str(tmp_path / "export_bad")
    write_shards(docs, path, 4, mode="hash", id_col="doc_id")
    # remove one shard: validation must fail loudly
    victim = sorted(glob.glob(f"{path}/part-*.parquet"))[0]
    import os

    os.remove(victim)
    with pytest.raises(AssertionError, match="manifest"):
        read_shards(spark, path)
