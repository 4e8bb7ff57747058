"""B37 — state-store inspection readers (streaming/state_inspect.py):
metadata listing, state read-back, historical batch pinning, and the
per-partition skew census.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from fiveg_spark.streaming.state_inspect import (
    read_operator_state,
    state_health,
    state_metadata,
)

_SCHEMA = "id LONG, k LONG, v DOUBLE"


def _land(spark, src, rows, name):
    stage = os.path.join(src, f"_stage_{name}")
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(stage)
    (part,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    shutil.move(os.path.join(stage, part), os.path.join(src, f"{name}.parquet"))
    shutil.rmtree(stage)


def _run(spark, src, ckpt, qname):
    q = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("k").agg(F.sum("v").alias("s"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_metadata_and_state_readback(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _land(spark, src, [(i, i % 3, float(i)) for i in range(30)], "b0")
    _run(spark, src, ckpt, "t_state_rb")
    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    assert meta[0]["operatorName"] == "stateStoreSave"
    assert (meta[0]["minBatchId"], meta[0]["maxBatchId"]) == (0, 0)

    st = read_operator_state(spark, ckpt)
    got = {r[0]: r[1] for r in st.collect()}  # k -> running sum
    expect = {k: float(sum(i for i in range(30) if i % 3 == k))
              for k in range(3)}
    assert got == expect


def test_state_time_travel_pins_a_historical_batch(spark, tmp_path):
    """After a second micro-batch updates the running sums, batchId=0
    must still read the FIRST batch's state snapshot."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _land(spark, src, [(1, 0, 10.0), (2, 1, 20.0)], "b0")
    _run(spark, src, ckpt, "t_state_tt")
    _land(spark, src, [(3, 0, 5.0)], "b1")
    _run(spark, src, ckpt, "t_state_tt")

    latest = {r[0]: r[1] for r in read_operator_state(spark, ckpt).collect()}
    assert latest == {0: 15.0, 1: 20.0}
    pinned = {
        r[0]: r[1]
        for r in read_operator_state(spark, ckpt, batch_id=0).collect()
    }
    assert pinned == {0: 10.0, 1: 20.0}


def test_state_health_census(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _land(spark, src, [(i, i % 5, 1.0) for i in range(50)], "b0")
    _run(spark, src, ckpt, "t_state_health")
    health = state_health(spark, ckpt).collect()
    assert sum(r["n_rows"] for r in health) == 5  # 5 distinct keys
    for r in health:
        assert r["skew_ratio"] >= 1.0  # max/mean, same value every row
