"""Spark 4 `transformWithStateInPandas` flow-state operator (SURVEY §2 B14).

The successor API to `applyInPandasWithState` (used by the KPI stream's
IAT operator): named state variables with per-variable schemas and TTL,
managed by the state-store server instead of one opaque state tuple.
This operator keeps RUNNING per-flow totals — packets, bytes, first/last
seen — emitting the updated totals every micro-batch (`Update` mode),
i.e. the live flow table a 5G monitoring plane reads
(ref KafkaKpiPipeline.scala's always-on streaming loop).

Scale shape: state is O(#flows) rows of 4 scalars, sharded by the
groupBy key exactly like the shuffle; TTL (default 24 h) garbage-collects
idle flows so state never grows past the active working set.

ENVIRONMENT GATE: the transformWithState Python runner speaks protobuf
to the state server, so executing the stream requires the `protobuf`
package — absent from this container (same class of gate as the missing
Kafka broker).  The processor's accumulation logic is therefore
unit-tested directly against a fake state (tests/test_streaming.py),
and the end-to-end streaming test auto-skips unless google.protobuf
imports.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

FLOW_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("flow_id", T.LongType()),
        T.StructField("n_packets", T.LongType()),
        T.StructField("total_bytes", T.DoubleType()),
        T.StructField("first_ts_sec", T.DoubleType()),
        T.StructField("last_ts_sec", T.DoubleType()),
    ]
)

_STATE_DDL = "n BIGINT, b DOUBLE, first_s DOUBLE, last_s DOUBLE"


class FlowTotalsProcessor(StatefulProcessor):
    """Running totals per flow in a named ValueState with TTL."""

    def __init__(self, ttl_ms: int | None = 24 * 3600 * 1000):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_DDL, self._ttl_ms)

    def handleInputRows(self, key, rows, timerValues):
        if self._totals.exists():
            n, b, first_s, last_s = self._totals.get()
        else:
            n, b, first_s, last_s = 0, 0.0, None, None
        for pdf in rows:
            n += len(pdf)
            b += float(pdf["pkt_len"].sum())
            lo = float(pdf["ts_sec"].min())
            hi = float(pdf["ts_sec"].max())
            first_s = lo if first_s is None else min(first_s, lo)
            last_s = hi if last_s is None else max(last_s, hi)
        self._totals.update((n, b, first_s, last_s))
        yield pd.DataFrame(
            {
                "flow_id": [key[0]],
                "n_packets": [n],
                "total_bytes": [b],
                "first_ts_sec": [first_s],
                "last_ts_sec": [last_s],
            }
        )

    def close(self) -> None:
        pass


def streaming_flow_totals(
    packets: DataFrame, ttl_ms: int | None = 24 * 3600 * 1000
) -> DataFrame:
    """packet stream → live per-flow running-totals stream (Update mode).

    TTL state requires ProcessingTime time mode — Spark 4 raises
    STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL if a TTL is
    assigned under timeMode="None" — so the mode follows ttl_ms.
    """
    return packets.groupBy("flow_id").transformWithStateInPandas(
        FlowTotalsProcessor(ttl_ms),
        outputStructType=FLOW_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
