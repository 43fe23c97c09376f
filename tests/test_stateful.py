"""Custom stateful streaming operator (applyInPandasWithState): state must
accumulate across micro-batches and match the batch-computed truth."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.streaming.stateful import streaming_user_profiles


def _write_batch(dirpath, name, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stateful_profiles_accumulate_across_batches(spark, tmp_path):
    raw = tmp_path / "raw"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(uid, minutes, value):
        return {
            "user_id": uid,
            "ts": (t0 + dt.timedelta(minutes=minutes)).isoformat(sep=" "),
            "value": value,
        }

    # batch 1: u1 two events in one session; u2 one event
    _write_batch(raw, "b1.json", [ev(1, 0, 10.0), ev(1, 5, 5.0), ev(2, 0, 1.0)])

    schema = "user_id long, ts timestamp, value double"

    def run_once():
        """One availableNow pass against the SAME checkpoint (foreachBatch —
        the memory sink refuses checkpoint recovery); returns emitted rows."""
        collected = []

        def sink(batch_df, _batch_id):
            collected.extend(batch_df.collect())

        q = (
            streaming_user_profiles(
                spark.readStream.schema(schema).json(str(raw)), gap_seconds=1800
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    rows1 = run_once()
    got = {r["user_id"]: r for r in rows1}
    assert got[1]["total_events"] == 2 and got[1]["n_sessions"] == 1
    assert got[1]["total_value"] == 15.0
    assert got[2]["total_events"] == 1

    # batch 2 arrives later: u1 after a >30min gap -> second session;
    # state from batch 1 must carry over (not restart from zero)
    _write_batch(raw, "b2.json", [ev(1, 120, 2.0)])
    rows2 = run_once()
    u1 = [r for r in rows2 if r["user_id"] == 1][-1]
    assert u1["total_events"] == 3
    assert u1["n_sessions"] == 2
    assert u1["total_value"] == 17.0
    assert u1["last_ts"] == dt.datetime(2026, 1, 1, 14, 0, 0)
