"""Stream-stream interval join (SURVEY §2 B33): the last core
Structured Streaming surface the engine didn't exercise — joining TWO
live streams (view→click conversion pairing) with watermarks on BOTH
sides and a time-range condition, the combination Spark requires
before it will age join state out instead of buffering forever.

Semantics: a click joins its user's view if it lands within
ATTRIBUTION_WINDOW_S after the view.  Both sides carry a watermark;
Spark derives the state-retention bound from the watermark delays plus
the range condition (views must be buffered ATTRIBUTION_WINDOW_S
longer than clicks — the asymmetry is the point of the range-condition
analysis), so at 100 TB/day the join state is bounded by the window,
not the stream.

Scale: the join keys on user_id (high cardinality — even spread); the
time-range predicate prunes within each key's state.  Inner join only:
outer stream-stream joins emit on watermark expiry and would make the
one-shot availableNow test time-dependent.

Reference scope: beyond-reference streaming surface (KafkaKpiPipeline
aggregates one stream; it never correlates two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW_S = 600
WATERMARK_S = 120


def interval_join(
    views: DataFrame,
    clicks: DataFrame,
    window_s: int = ATTRIBUTION_WINDOW_S,
    watermark_s: int = WATERMARK_S,
) -> DataFrame:
    """views(ts, user_id, view_id) ⋈ clicks(ts, user_id, click_id):
    every (view, click) pair of the same user with the click inside
    the attribution window after the view."""
    v = (
        views.withWatermark("ts", f"{watermark_s} seconds")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("view_id"),
        )
    )
    c = (
        clicks.withWatermark("ts", f"{watermark_s} seconds")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("click_id"),
        )
    )
    return v.join(
        c,
        F.expr(
            "v_user = c_user AND click_ts >= view_ts AND "
            f"click_ts <= view_ts + INTERVAL {window_s} SECONDS"
        ),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id", "click_id", "view_ts", "click_ts",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts"))
        .cast("double").alias("lag_us"),
    )


def start_interval_join(
    spark: SparkSession,
    views: DataFrame,
    clicks: DataFrame,
    out_path: str,
    checkpoint: str,
    **kwargs,
):
    """Run the join availableNow into parquet; returns the query."""
    return (
        interval_join(views, clicks, **kwargs)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
