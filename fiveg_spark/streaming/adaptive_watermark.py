"""Adaptive watermark loop (SURVEY §2 B32): close the B25→B26 circle —
the lateness monitor MEASURES what the watermark should be; this
component FEEDS that recommendation into a restartable windowed
aggregation, so the deployed `withWatermark` delay tracks the arrival
process instead of being hardcoded once (the reference pins 10 s
forever, KafkaKpiPipeline.scala:69-80).

Structured Streaming bakes the watermark delay into the query plan, so
a RUNNING stream cannot change it — but Spark explicitly allows a
DIFFERENT delay across restarts on the SAME checkpoint (it is not part
of offset/commit state).  The adaptation point is therefore the
restart, which production streams hit routinely (deploys, rebalances):

    every restart:  w ← recommended_watermark(monitor_store) or default
                    stream = source.withWatermark(ts, w).window(...).agg
                    start from the SAME checkpoint

Windows the previous incarnation left unflushed (append mode only
emits a window once the watermark passes its end) remain in state and
flush under the NEW delay — counts are exactly-once across the delay
change because the state store, not the watermark, carries them.

Scale: the aggregation is the standard streaming windowed count (state
keyed by window — bounded by the time span); picking the delay reads
only the O(1)-after-compact monitor store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.streaming.lateness_monitor import (
    LATE_TARGET,
    recommended_watermark,
)

DEFAULT_WATERMARK_S = 300
WINDOW = "60 seconds"


def pick_watermark(
    spark: SparkSession,
    monitor_store: str,
    default_s: int = DEFAULT_WATERMARK_S,
    target: float = LATE_TARGET,
) -> int:
    """The restart-time decision: the monitor's smallest safe rung;
    the default when the store doesn't exist yet (first deploy); and
    when NO rung clears the target (the monitor says 'your ladder is
    too short'), the LARGEST available delay — max(default, top rung).
    In that degraded-arrival regime every choice drops late data, and
    the top rung provably drops the least of the options we have;
    falling back to a default SMALLER than the top rung would drop
    strictly more in exactly the scenario the monitor flagged.  The
    ladder-exceeded condition is surfaced via warning so operators
    know the measured tail outran the ladder."""
    try:
        rec = recommended_watermark(spark, monitor_store, target)
    except FileNotFoundError:
        return default_s
    if rec is None:
        import warnings

        from fiveg_spark.operators.lateness import WATERMARK_LADDER

        chosen = max(default_s, WATERMARK_LADDER[-1])
        warnings.warn(
            f"lateness monitor: no ladder rung keeps late share under "
            f"{target} — arrival lateness exceeds the {WATERMARK_LADDER[-1]}s "
            f"ladder; using {chosen}s (the largest available delay)",
            stacklevel=2,
        )
        return chosen
    return rec


def windowed_counts(
    stream: DataFrame, watermark_s: int, ts_col: str = "ts",
    window: str = WINDOW,
) -> DataFrame:
    """The aggregation under adaptation: per-window event counts in
    append mode (only watermark-finalized windows emit)."""
    return (
        stream.withWatermark(ts_col, f"{watermark_s} seconds")
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def start_adaptive_counts(
    spark: SparkSession,
    stream: DataFrame,
    monitor_store: str,
    out_path: str,
    checkpoint: str,
    *,
    ts_col: str = "ts",
    window: str = WINDOW,
    default_s: int = DEFAULT_WATERMARK_S,
    target: float = LATE_TARGET,
):
    """One incarnation of the loop: pick the delay from the monitor,
    run the windowed count availableNow against the shared checkpoint,
    land finalized windows in parquet.  Returns (chosen_watermark_s,
    StreamingQuery) — callers await the query and restart the whole
    function to adapt."""
    w = pick_watermark(spark, monitor_store, default_s, target)
    q = (
        windowed_counts(stream, w, ts_col, window)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return w, q
