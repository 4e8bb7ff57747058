"""Arbitrary stateful streaming via Spark 4's
``transformWithStateInPandas`` (SURVEY §2 B40) — the successor API to
``applyInPandasWithState`` (which B6's streaming KPI path uses): typed
per-key state handles (value/list/map), timers, and TTL managed by the
StateStore instead of one opaque GroupState blob.

ENV-GATED in this container: the transform-with-state driver worker
speaks protobuf to the JVM (`pyspark/sql/streaming/proto/StateMessage`)
and `google.protobuf` is not installed (pip is prohibited).  The
operator classes below import cleanly and the pytest exercises them
end-to-end whenever the dependency exists (`pytest.importorskip`);
`running_count_stream` raises a clear error otherwise.  The certified
always-on twin of this surface is B6/B38/B39 — same state-store
machinery through the non-protobuf APIs.

Scale: state is partitioned by grouping key exactly like the
aggregation store; per-batch cost is O(batch + touched keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # the class definitions need only the pyspark-side ABC
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAVE_API = True
except ImportError:  # pragma: no cover - pyspark always ships the ABC
    StatefulProcessor = object  # type: ignore[assignment]
    StatefulProcessorHandle = object  # type: ignore[assignment]
    _HAVE_API = False


def have_runtime() -> bool:
    """True when the protobuf bridge the driver worker needs exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return _HAVE_API
    except ImportError:
        return False


class RunningCounter(StatefulProcessor):
    """Per-key running row count: ValueState<long> updated per batch,
    emitting the NEW total for every key that received rows (Update
    semantics — the minimal canonical transformWithState shape)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", "n LONG")

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802 — API
        import pandas as pd

        n = sum(len(pdf) for pdf in rows)
        prev = self._count.get()
        total = (prev[0] if prev else 0) + n
        self._count.update((total,))
        yield pd.DataFrame({"key": [key[0]], "n_rows": [total]})

    def close(self) -> None:
        pass


def running_count_stream(
    keyed: DataFrame, key_col: str, checkpoint: str, queryName: str
):
    """Wire a stream to the per-key running counter; returns the
    started memory-sink query.  Raises RuntimeError without the
    protobuf runtime (see module docstring)."""
    if not have_runtime():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf (the "
            "state-message bridge); install protobuf to enable B40"
        )
    out = (
        keyed.groupBy(key_col)
        .transformWithStateInPandas(
            RunningCounter(),
            outputStructType="key STRING, n_rows LONG",
            outputMode="Update",
            timeMode="None",
        )
    )
    return (
        out.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
