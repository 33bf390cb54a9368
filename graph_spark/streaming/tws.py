"""Spark 4 transformWithState surface (the successor API to
applyInPandasWithState): typed per-key state objects managed by a
StatefulProcessor class, RocksDB-backed at scale, with timers and
multi-state support.

We expose the canonical running-totals processor — one ValueState row
per group key, updated per micro-batch — parity-tested against the
batch groupBy aggregate (tests/test_streaming.py).  The semantics are
exactly "incremental view maintenance of a grouped aggregate": after
the stream drains, the latest update per key must equal the batch
result over the same input.

Runtime dependency: the transformWithState Python<->JVM state protocol
is protobuf-based (pyspark.sql.streaming.proto.StateMessage_pb2), so
executing a query through this operator requires `protobuf` at
runtime; the parity test importorskips when it is absent.  The module
itself imports cleanly either way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE, vmax DOUBLE"
OUT_SCHEMA = "event_type STRING, n BIGINT, total DOUBLE, vmax DOUBLE"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum, max) over an unbounded stream.

    State is a single fixed-width row per key — the state store grows
    with key cardinality, not event volume, so the operator is safe on
    an unbounded high-throughput stream (contrast with buffering
    operators whose state is bounded only by the watermark).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, total, vmax = 0, 0.0, None
        if self._totals.exists():
            n, total, vmax = self._totals.get()
        for pdf in rows:
            if not len(pdf):
                continue
            n += int(len(pdf))
            total += float(pdf["value"].sum())
            m = float(pdf["value"].max())
            vmax = m if vmax is None else max(vmax, m)
        self._totals.update((n, total, vmax))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "total": [total], "vmax": [vmax]}
        )

    def close(self) -> None:
        pass


def running_totals(stream: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Running per-key totals via transformWithStateInPandas (update
    mode, no timers).  Each micro-batch emits the key's new cumulative
    (n, total, vmax); the final emission per key equals the batch
    aggregate — the incremental-view-maintenance contract."""
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
