"""observe()-based audits: metrics ride the action (batch and
streaming), and the circuit breaker judges them."""

from __future__ import annotations

import tests.conftest as c
from fiveg_spark.plans.observe import check_audit, observed
from fiveg_spark.sources.tables import load_table


def test_batch_observe_rides_the_write(spark, tmp_path):
    ev = load_table(spark, "events", c.SF_DIR)
    df, obs = observed(ev, "write_audit")
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["n_null"] == 0
    assert m["v_sum"] > 0
    verdict = check_audit(m, min_rows=100, max_null_frac=0.0)
    assert verdict.ok, verdict.reasons


def test_circuit_breaker_trips(spark):
    ev = load_table(spark, "events", c.SF_DIR).limit(10)
    df, obs = observed(ev)
    df.collect()
    m = obs.get
    v = check_audit(m, min_rows=1000)
    assert not v.ok and "row count" in v.reasons[0]
    v2 = check_audit(m, value_range=(0.0, -1.0))
    assert not v2.ok


def test_streaming_observed_metrics(spark, tmp_path):
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{c.SF_DIR}/events.parquet", src / "p0.parquet")
    schema = spark.read.parquet(str(src / "p0.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    audited, _ = observed(stream, "stream_audit")
    q = (
        audited.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    seen = [
        p["observedMetrics"]["stream_audit"]
        for p in [q.lastProgress]
        if p and "stream_audit" in (p.get("observedMetrics") or {})
    ]
    # availableNow may finish in one batch; recentProgress keeps them all
    if not seen:
        seen = [
            p["observedMetrics"]["stream_audit"]
            for p in q.recentProgress
            if "stream_audit" in (p.get("observedMetrics") or {})
        ]
    assert seen, "no observed metrics surfaced"
    total = sum(m["n_rows"] for m in seen)
    assert total == spark.read.parquet(str(src)).count()
    assert check_audit(seen[0], min_rows=1).ok


def test_circuit_breaker_all_null_value_column():
    """ADVICE r1: min/max of an all-NULL value column is None — the breaker
    must FAIL the range check, not TypeError."""
    from fiveg_spark.plans.observe import check_audit

    metrics = {"n_rows": 10, "n_null": 10, "v_min": None, "v_max": None, "v_sum": None}
    verdict = check_audit(metrics, max_null_frac=1.0, value_range=(0.0, 100.0))
    assert not verdict.ok
    assert any("NULL" in r for r in verdict.reasons)


def test_progress_report_surfaces_state_rows(spark, tmp_path):
    """progress_report mirrors the reference's monitor loop
    (KafkaKpiPipeline.scala:315-333): batch id, input rows, duration,
    and state-store rows for a stateful (windowed-agg) streaming query."""
    import shutil

    from pyspark.sql import functions as F

    from fiveg_spark.plans.observe import progress_report

    src = tmp_path / "psrc"
    src.mkdir()
    shutil.copy(f"{c.SF_DIR}/events.parquet", src / "p0.parquet")
    schema = spark.read.parquet(str(src / "p0.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    from fiveg_spark.sources.tables import normalize_event_ts

    agg = (
        normalize_event_ts(stream)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "pckpt"))
        .start()
    )
    q.awaitTermination(120)
    snap = progress_report(q)
    assert snap is not None
    assert snap.batch_id >= 0
    assert snap.batch_duration_ms >= 0
    # the windowed agg is stateful: state rows must surface
    total_inputs = snap.num_input_rows + sum(
        p.get("numInputRows", 0) for p in q.recentProgress[:-1]
    )
    assert total_inputs >= 0
    assert snap.state_rows is not None and snap.state_memory_bytes is not None
