"""B25 — watermark-lateness profile (operators/lateness.py).

The events fixture is perfectly event-time ordered, so the disorder is
synthesized (deterministic keyed-hash delays).  Covers: the profile's
late shares against an independent Python simulation of the per-minute
watermark (same md5 digit arithmetic), and a REAL Structured Streaming
run with planted stragglers — files arrive one trigger per arrival
minute and the windowed aggregate must drop exactly the events the
minute-level watermark model predicts it may.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from fiveg_spark.operators.lateness import (
    JITTER_MAX_S,
    STRAGGLER_SHARE,
    TAIL_MEAN_S,
    WATERMARK_LADDER,
    _lateness_profile_parts,
)
from fiveg_spark.plans.registry import run_parts


def _u(salt: str, event_id: int) -> float:
    h = hashlib.md5(f"{salt}#{event_id}".encode()).hexdigest()
    return sum(
        int(h[i], 16) * 16.0 ** -(i + 1) for i in range(8)
    ) + 1e-10


def _delay(event_id: int) -> float:
    gate, tail = _u("lategate", event_id), _u("latetail", event_id)
    if gate < STRAGGLER_SHARE:
        return -TAIL_MEAN_S * math.log(tail)
    return JITTER_MAX_S * tail


def _mk_events(spark, n: int = 400):
    # one event every 20 s from a fixed origin, two types
    rows = [
        (i, 1_700_000_000.0 + 20.0 * i, i % 7, "a" if i % 2 else "b", 1.0, "{}")
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, es double, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "timestamp_micros(CAST(es * 1000000 AS LONG)) AS ts",
        "user_id", "event_type", "value", "props",
    )
    df.createOrReplaceTempView("events")
    return {r["event_id"]: r["es"] for r in df.selectExpr(
        "event_id", "CAST(unix_micros(ts) AS DOUBLE)/1000000.0 AS es"
    ).collect()}


def test_profile_matches_python_watermark_simulation(spark):
    es_by_id = _mk_events(spark)
    got = {
        r["event_type"]: r.asDict()
        for r in run_parts(spark, _lateness_profile_parts).collect()
    }

    # independent simulation: per arrival-minute max event time, running
    # max shifted one minute back = watermark in force for that minute
    arr = {i: es + _delay(i) for i, es in es_by_id.items()}
    minute = {i: int(arr[i] // 60.0) for i in arr}
    minute_max: dict[int, float] = {}
    for i, es in es_by_id.items():
        m = minute[i]
        minute_max[m] = max(minute_max.get(m, -1e18), es)
    wm_at: dict[int, float] = {}
    running = None
    for m in sorted(minute_max):
        wm_at[m] = running if running is not None else -1e18
        running = max(running or -1e18, minute_max[m])

    for etype in ("a", "b"):
        ids = [i for i in es_by_id if ("a" if i % 2 else "b") == etype]
        assert got[etype]["n_events"] == len(ids)
        exp_mean = sum(arr[i] - es_by_id[i] for i in ids) / len(ids)
        assert got[etype]["mean_delay_s"] == pytest.approx(exp_mean, abs=1e-3)
        for w in WATERMARK_LADDER:
            exp_share = sum(
                1.0 for i in ids if es_by_id[i] < wm_at[minute[i]] - w
            ) / len(ids)
            assert got[etype][f"late_share_{w}s"] == pytest.approx(
                exp_share, abs=1e-3
            ), (etype, w)
    # the synthesis actually bites: SOME events are late at the 60 s
    # candidate (a perfectly-ordered fixture would certify trivially)
    assert any(got[t]["late_share_60s"] > 0.0 for t in got)


def test_streaming_drops_planted_stragglers(spark, tmp_path):
    """Real withWatermark semantics on the synthesized arrival order:
    one file per arrival minute, one trigger per file, so the watermark
    advances between minutes exactly as the profile models it."""
    src = str(tmp_path / "arrivals")
    ckpt = str(tmp_path / "ckpt")

    base = 1_700_000_000
    # trigger 1: t=0..40; trigger 2: t=300..340 (advances the
    # watermark to 340-60 = base+280); trigger 3: a fresh t=360;
    # trigger 4: a STRAGGLER from t=5 (its 60 s window ends base+40,
    # far below the watermark -> dropped) and a mildly-late t=300
    # (window end base+340 > watermark -> kept).  The straggler lands
    # TWO triggers after the data that outran it: measured behavior —
    # the drop-filter watermark lags one batch behind the in-force
    # value the progress reports (a same-batch or next-batch straggler
    # slips through; that one-batch grace is exactly why the batch
    # profile's drop shares are upper bounds on what streaming drops).
    batches = [
        [base + 0, base + 20, base + 40],
        [base + 300, base + 320, base + 340],
        [base + 360],
        [base + 5, base + 300],
    ]
    import time

    for m, stamps in enumerate(batches):
        spark.createDataFrame(
            [(int(t),) for t in stamps], "es long"
        ).selectExpr(
            "timestamp_micros(es * 1000000) AS ts"
        ).coalesce(1).write.parquet(f"{src}/m{m}")
        time.sleep(1.1)  # distinct mtimes pin file->trigger order

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/m*")
    )
    counts = (
        stream.withWatermark("ts", "60 seconds")
        .groupBy(F.window("ts", "60 seconds").alias("w"))
        .count()
        .select(
            F.unix_timestamp("w.start").alias("w_start"),
            "count",
        )
    )
    # file discovery order = write order (oldest mtime first) = the
    # synthesized ARRIVAL order; update mode emits per-trigger counts,
    # max per window = the final state (dropped rows never reach it)
    q = (
        counts.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["w_start"]: r["count"]
        for r in spark.sql(
            "SELECT w_start, max(count) AS count FROM late_counts "
            "GROUP BY w_start"
        ).collect()
    }
    win = lambda t: t - (t % 60)  # epoch-aligned 60 s window start
    # 9 events arrived; only the t=5 straggler is below the watermark
    assert int(sum(got.values())) == 8, got
    # the drop is visible in the engine's own metric too
    assert sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p.get("stateOperators") or [])
    ) == 1
    # the straggler's window holds ONLY the on-time t=0,20 events —
    # its own arrival was dropped
    assert got[win(base + 5)] == 2, got
    # the mildly-late duplicate t=300 WAS counted (window end above
    # the watermark): its window holds t=300, t=320, and the late copy
    assert got[win(base + 300)] == 3, got
