"""transformWithStateInPandas: typed state accumulates across micro-batches.

The state-server protocol of this API needs ``google.protobuf``, which is
not installed in this container (and installs are off-limits) — the whole
module skips cleanly there and runs wherever pyspark's declared protobuf
dependency is present. ``applyInPandasWithState`` (test_stateful.py) keeps
custom-stateful semantics covered in-container.
"""

from __future__ import annotations

import json

import pytest

try:  # transformWithState's driver worker imports google.protobuf
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas needs google.protobuf (absent here; "
    "pip installs disallowed)",
)

from ecommerce_analytics_platform_spark.streaming.tws import (  # noqa: E402
    ROCKSDB_PROVIDER,
    user_running_totals,
)

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _write_batch(dirpath, name, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def rocksdb_state(spark):
    prev = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    yield
    if prev is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, prev)


def test_tws_running_totals_accumulate(spark, tmp_path, rocksdb_state):
    raw = tmp_path / "raw"
    _write_batch(raw, "b1.json", [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ])
    schema = "user_id long, value double"

    def run_once():
        collected = []

        def sink(batch_df, _batch_id):
            collected.extend(batch_df.collect())

        q = (
            user_running_totals(spark.readStream.schema(schema).json(str(raw)))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    got = {r["user_id"]: r for r in run_once()}
    assert got[1]["n_events"] == 2 and got[1]["total_value"] == 15.0
    assert got[2]["n_events"] == 1

    _write_batch(raw, "b2.json", [{"user_id": 1, "value": 2.0}])
    rows2 = run_once()
    u1 = [r for r in rows2 if r["user_id"] == 1][-1]
    assert u1["n_events"] == 3
    assert u1["total_value"] == 17.0
