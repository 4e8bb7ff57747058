"""Streaming CUSUM monitor: accumulation across batches catches a
persistent sub-threshold shift, stationary batches stay quiet, replay
is a no-op, and the wired availableNow e2e runs."""

from __future__ import annotations

from fiveg_spark.streaming.cusum_monitor import (
    attach_cusum_monitor,
    fit_reference_stats,
    foreach_batch_cusum,
    read_alarms,
)

SCHEMA = "key STRING, v DOUBLE"


def _frame(spark, key, vals):
    return spark.createDataFrame([(key, float(v)) for v in vals], SCHEMA)


def _ref(spark):
    # reference: mean 10, sd ~1 per key
    vals = [8.5, 9.0, 9.5, 10.0, 10.0, 10.5, 11.0, 11.5]
    return fit_reference_stats(
        _frame(spark, "a", vals).union(_frame(spark, "b", vals)), "key", "v"
    )


def test_cusum_accumulates_small_shift_and_ignores_stationary(spark, tmp_path):
    path = str(tmp_path / "cusum")
    ref = _ref(spark)
    sink = foreach_batch_cusum(path, ref, "key", "v")

    # key a: persistent +0.8-sigma shift per batch (tiny per-batch z,
    # PSI-invisible); key b: stationary at the reference mean
    for b in range(6):
        batch = _frame(spark, "a", [10.8] * 4).union(_frame(spark, "b", [10.0] * 4))
        sink(batch, b)

    alarms = {r["key"] for r in read_alarms(spark, path).collect()}
    assert alarms == {"a"}  # accumulated across batches
    metrics = spark.read.parquet(f"{path}/metrics")
    a_rows = sorted(
        (r["batch_id"], r["s_pos"]) for r in metrics.filter("key = 'a'").collect()
    )
    # s_pos grows monotonically until the alarm fires
    first_alarm = min(
        r["batch_id"] for r in metrics.filter("key = 'a' AND alarm").collect()
    )
    grows = [s for b, s in a_rows if b <= first_alarm]
    assert grows == sorted(grows) and grows[0] > 0
    assert not [r for r in metrics.filter("key = 'b'").collect() if r["alarm"]]


def test_cusum_replay_is_noop_and_state_resets_after_alarm(spark, tmp_path):
    path = str(tmp_path / "cusum")
    ref = _ref(spark)
    sink = foreach_batch_cusum(path, ref, "key", "v")

    big = _frame(spark, "a", [30.0] * 9)  # huge z -> immediate alarm
    sink(big, 0)
    assert read_alarms(spark, path).count() == 1
    state = spark.read.parquet(f"{path}/state").collect()
    (row,) = [r for r in state if r["key"] == "a"]
    assert row["s_pos"] == 0.0  # post-alarm restart persisted

    # replaying batch 0 must change nothing
    sink(big, 0)
    assert read_alarms(spark, path).count() == 1
    assert spark.read.parquet(f"{path}/state").count() == len(state)


def test_cusum_streaming_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    path = str(tmp_path / "cusum")
    ckpt = str(tmp_path / "ckpt")
    ref = _ref(spark)

    _frame(spark, "a", [12.0] * 8).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        attach_cusum_monitor(stream, path, ckpt, ref, "key", "v")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    metrics = spark.read.parquet(f"{path}/metrics").collect()
    assert metrics and all(r["key"] == "a" for r in metrics)
    # a +2-sigma batch of 8 rows has z ~ 5.7: immediate alarm
    assert any(r["alarm"] for r in metrics)
