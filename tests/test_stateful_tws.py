"""B40 — transformWithStateInPandas running counter (env-gated: the
driver worker needs google.protobuf; see streaming/stateful.py)."""

from __future__ import annotations

import os
import uuid

import pytest

from fiveg_spark.streaming import stateful


def test_runtime_gate_is_honest():
    # the gate reflects whether the protobuf bridge imports; in this
    # container it is absent and the wire helper must refuse LOUDLY
    # rather than crash the stream mid-query
    try:
        from google.protobuf import descriptor  # noqa: F401

        assert stateful.have_runtime()
    except ImportError:
        assert not stateful.have_runtime()
        with pytest.raises(RuntimeError, match="protobuf"):
            stateful.running_count_stream(None, "k", "/tmp/x", "q")


def test_running_counter_end_to_end(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [("a",), ("a",), ("b",)], "k STRING"
    ).coalesce(1).write.parquet(src, mode="append")
    stream = spark.readStream.schema("k STRING").parquet(src)
    qn = f"t_tws_{uuid.uuid4().hex[:6]}"
    q = stateful.running_count_stream(
        stream, "k", str(tmp_path / "ckpt"), qn
    )
    q.awaitTermination(120)
    got = {r["key"]: r["n_rows"] for r in spark.table(qn).collect()}
    assert got == {"a": 2, "b": 1}
    spark.catalog.dropTempView(qn)
