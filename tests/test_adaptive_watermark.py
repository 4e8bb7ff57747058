"""B32 adaptive watermark loop: the pick rule's three branches, and the
wired two-incarnation run — restart on the SAME checkpoint with a
DIFFERENT monitor-recommended delay, exactly-once window counts across
the change.
"""

from __future__ import annotations

import time

from fiveg_spark.operators.lateness import WATERMARK_LADDER
from fiveg_spark.streaming.adaptive_watermark import (
    DEFAULT_WATERMARK_S,
    pick_watermark,
    start_adaptive_counts,
)
from fiveg_spark.streaming.lateness_monitor import foreach_batch_lateness

BASE = 1_700_000_000


def _frame(spark, stamps):
    return spark.createDataFrame(
        [(int(t),) for t in stamps], "es LONG"
    ).selectExpr("timestamp_micros(es * 1000000) AS ts")


def test_pick_defaults_without_store(spark, tmp_path):
    assert pick_watermark(spark, str(tmp_path / "nope")) == \
        DEFAULT_WATERMARK_S


def test_pick_follows_monitor_and_falls_back_when_ladder_short(
    spark, tmp_path
):
    path = str(tmp_path / "store")
    score = foreach_batch_lateness(path)
    # ordered arrivals: every rung clears the 1% target -> smallest
    score(_frame(spark, [BASE + i for i in range(0, 300, 30)]), 0)
    score(_frame(spark, [BASE + 300 + i for i in range(0, 300, 30)]), 1)
    assert pick_watermark(spark, path) == WATERMARK_LADDER[0]

    # bury the frontier, then replay rows >900 s behind it: every rung
    # drops >1% -> monitor returns None -> the LARGEST available delay
    # (max of default and top rung — a smaller default would drop
    # strictly more late data in exactly this degraded regime), and
    # the ladder-exceeded condition is surfaced as a warning
    import warnings

    path2 = str(tmp_path / "store2")
    score2 = foreach_batch_lateness(path2)
    score2(_frame(spark, [BASE + 10000]), 0)
    score2(_frame(spark, [BASE + i for i in range(5)]), 1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert pick_watermark(spark, path2) == \
            max(DEFAULT_WATERMARK_S, WATERMARK_LADDER[-1])
    assert any("ladder" in str(w.message) for w in caught)


def test_restart_adapts_delay_with_exact_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    store_a = str(tmp_path / "ma")
    store_b = str(tmp_path / "mb")

    # monitor A: clean arrivals -> 60 s; monitor B: heavy stragglers
    # at the 60/300 rungs but clean at 900 -> 900 s
    sa = foreach_batch_lateness(store_a)
    sa(_frame(spark, [BASE, BASE + 30]), 0)
    sa(_frame(spark, [BASE + 60, BASE + 90]), 1)
    sb = foreach_batch_lateness(store_b)
    sb(_frame(spark, [BASE + 2000]), 0)
    sb(_frame(spark, [BASE + 2010, BASE + 1400]), 1)  # 600 s behind

    # incarnation 1: files m0 (window 0) then m1 (advances the
    # watermark past window 0's end under w=60)
    _frame(spark, [BASE, BASE + 30]).coalesce(1).write.parquet(f"{src}/m0")
    time.sleep(1.1)
    _frame(spark, [BASE + 900, BASE + 910]).coalesce(1) \
        .write.parquet(f"{src}/m1")
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/m*")
    )
    w1, q1 = start_adaptive_counts(spark, stream, store_a, out, ckpt)
    q1.awaitTermination(120)
    assert w1 == 60
    got = {r["window_start"].timestamp(): r["n_events"]
           for r in spark.read.parquet(out).collect()}
    assert got == {float(BASE - 20): 2}  # 60 s grid: 1.7e9 % 60 = 20
    # (the BASE+900 window is still open in state)

    # incarnation 2: same checkpoint, new file far ahead; the NEW
    # delay comes from monitor B (900 s) and the state-carried window
    # 15 flushes exactly once under it
    time.sleep(1.1)
    _frame(spark, [BASE + 3000]).coalesce(1).write.parquet(f"{src}/m2")
    stream2 = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/m*")
    )
    w2, q2 = start_adaptive_counts(spark, stream2, store_b, out, ckpt)
    q2.awaitTermination(120)
    assert w2 == 900
    got = {r["window_start"].timestamp(): r["n_events"]
           for r in spark.read.parquet(out).collect()}
    assert got == {float(BASE - 20): 2, float(BASE + 880): 2}
    # exactly-once: window 0 was NOT re-emitted by the restart
    assert spark.read.parquet(out).count() == 2
