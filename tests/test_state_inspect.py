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


def test_dedup_within_watermark_expires_state(spark, tmp_path):
    """B39's semantic claim: dropDuplicatesWithinWatermark GCs a key
    once the watermark passes its expiry, so a duplicate arriving
    after the window RE-EMITS (plain dropDuplicates would suppress it
    forever and its state would never shrink).  Two pinned-order
    batches: batch 1 plants key 'a' at t0 with a 10-second delay;
    batch 2's event time advances the watermark far past expiry and
    re-sends 'a' — the reader must show the OLD key gone and the new
    'a' re-emitted."""
    import uuid

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    sch = "k STRING, ts TIMESTAMP"

    def land(rows, name):
        stage = os.path.join(src, f"_stage_{name}")
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(stage)
        (part,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        shutil.move(os.path.join(stage, part),
                    os.path.join(src, f"{name}.parquet"))
        shutil.rmtree(stage)

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    land([("a", t0), ("a", t0)], "b0")  # in-batch dup suppressed
    # the watermark lags one batch (it is computed from the PREVIOUS
    # batch's max event time) and state cleanup runs at batch end, so
    # the re-send only re-emits two batches after the advance: b1
    # advances event time, b2 still sees 'a' in state (suppressed —
    # asserted below by the emitted sequence), b3 re-emits
    land([("b", t0 + dt.timedelta(hours=1))], "b1")
    land([("a", t0 + dt.timedelta(hours=1, seconds=10))], "b2")
    land([("a", t0 + dt.timedelta(hours=2))], "b3")

    qname = f"t_ddww_{uuid.uuid4().hex[:6]}"
    q = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["k"])
        .writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # emitted: a (b0), b (b1), then a AGAIN only at b3 — b2's re-send
    # was still suppressed (state not yet cleaned when it arrived),
    # b3's lands after the GC.  Plain dropDuplicates would emit 2
    # forever and never shrink state.
    emitted = [r["k"] for r in
               spark.table(qname).orderBy("ts").collect()]
    assert emitted == ["a", "b", "a"]
    assert [r["ts"] for r in spark.table(qname).orderBy("ts").collect()][
        -1
    ] == t0 + dt.timedelta(hours=2)
    # physical state: exactly ONE 'a' entry, and it is the RE-SENT one
    # (expiry past t0+1h — the b0 entry, expiring t0+10s, was GC'd).
    # 'b' may or may not have been swept yet — the cleanup pass runs on
    # the end-of-batch watermark, an engine-internal timing this test
    # doesn't pin.
    st = read_operator_state(spark, ckpt).collect()
    a_rows = [r for r in st if r["k"] == "a"]
    assert len(a_rows) == 1 and len(st) <= 2
    assert a_rows[0]["expiresAtMicros"] > int(
        (t0 + dt.timedelta(hours=1)).timestamp() * 1_000_000
    )
    spark.catalog.dropTempView(qname)
