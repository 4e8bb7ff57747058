"""Streaming 36-KPI pipeline (SURVEY §2 B6; ref KafkaKpiPipeline.scala:69-176).

Two-stage streaming plan:

1. Per-flow IAT.  The reference uses ``lag`` over a Window — legal only
   in its batch fallback; Structured Streaming rejects non-time window
   functions.  The stream-correct equivalent is keyed state: one state
   row (last event-time seconds) per (slice, flow_id) via
   ``applyInPandasWithState``, emitting each event with its IAT.  State
   is O(#flows) regardless of throughput, partitioned by the group key,
   so at cluster scale state shards with the shuffle.

2. Watermarked tumbling-window aggregation.  Same 36 aggregate
   expressions as the batch flagship, with the two adjustments streaming
   semantics force: exact ``count(DISTINCT)`` and exact ``percentile``
   are not incrementally computable in append mode, so the stream uses
   ``approx_count_distinct`` (HLL) and ``percentile_approx`` — the same
   trade the reference makes with ``percentile_approx`` in its streaming
   path (KafkaKpiPipeline.scala:126).

The batch/stream split mirrors the reference's dual path (streaming
query vs computeBatchKPIs): identical KPI names, shared config.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IAT_SCHEMA = T.StructType(
    [
        T.StructField("slice", T.StringType()),
        T.StructField("flow_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("pkt_len", T.DoubleType()),
        T.StructField("protocol", T.StringType()),
        T.StructField("src_port", T.IntegerType()),
        T.StructField("dst_port", T.IntegerType()),
        T.StructField("win_size", T.IntegerType()),
        T.StructField("tcp_flags", T.IntegerType()),
        T.StructField("iat", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("last_ts_sec", T.DoubleType())])

_EVENT_COLS = [f.name for f in IAT_SCHEMA.fields if f.name != "iat"]


def _iat_with_state(
    key, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(slice, flow) IAT: state carries the last seen event time.

    Within a micro-batch the rows are sorted by event time; across
    batches the state row provides continuity — the streaming analogue
    of ``lag(ts_sec) OVER (PARTITION BY slice, flow_id ORDER BY ts)``.
    """
    last = state.get[0] if state.exists else None
    for pdf in batches:
        pdf = pdf.sort_values("ts_sec", kind="mergesort")
        prev = pdf["ts_sec"].shift(1)
        if last is not None:
            prev.iloc[0] = last
        iat = (pdf["ts_sec"] - prev).fillna(0.0)
        last = float(pdf["ts_sec"].iloc[-1])
        out = pdf[_EVENT_COLS].copy()
        out["iat"] = iat.values
        yield out
    if last is not None:
        state.update((last,))


def with_streaming_iat(packets: DataFrame) -> DataFrame:
    """packet stream → packet stream + ``iat`` column (keyed state)."""
    return packets.groupBy("slice", "flow_id").applyInPandasWithState(
        _iat_with_state,
        outputStructType=IAT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_kpi_aggs(
    idle_threshold: float = 600.0,
    small_pkt: float = 50.0,
    large_pkt: float = 150.0,
    eps: float = 1e-6,
) -> list:
    """The 36 KPIs, streaming-safe (HLL distincts, approx percentile)."""
    from fiveg_spark.functions.stats import pop_kurtosis_sql, pop_skewness_sql

    idle = f"sum(CASE WHEN iat > {idle_threshold} THEN 1 ELSE 0 END)"
    exprs = {
        "Throughput_bps": "sum(pkt_len) * 8",
        "Total_Packets": "count(*)",
        "Total_Bytes": "sum(pkt_len)",
        "Byte_Velocity": f"sum(pkt_len) / (sum(iat) + {eps})",
        "Avg_IAT": "avg(iat)",
        "Jitter": "stddev_samp(iat)",
        # identical power-sum formulas to the batch flagship
        # (functions/stats.py) — sum/count only, so incrementally
        # computable; the stream≡batch claim holds bit-for-bit on the
        # moment KPIs, not just approximately
        "IAT_Skewness": pop_skewness_sql("iat"),
        "IAT_Kurtosis": pop_kurtosis_sql("iat"),
        "Min_IAT": "min(iat)",
        "Max_IAT": "max(iat)",
        "IAT_PAPR": f"max(iat) / (avg(iat) + {eps})",
        "Transmission_Duration": "max(ts_sec) - min(ts_sec)",
        "Idle_Periods": idle,
        "Idle_Rate": f"{idle} / count(*)",
        "IAT_Median": "percentile_approx(iat, 0.5, 100)",
        "Avg_Packet_Size": "avg(pkt_len)",
        "Pkt_Size_StdDev": "stddev_samp(pkt_len)",
        "Pkt_Size_Skewness": pop_skewness_sql("pkt_len"),
        "Pkt_Size_Kurtosis": pop_kurtosis_sql("pkt_len"),
        "Min_Pkt_Size": "min(pkt_len)",
        "Max_Pkt_Size": "max(pkt_len)",
        "Unique_Pkt_Sizes": "approx_count_distinct(pkt_len)",
        "Small_Pkt_Ratio": f"sum(CASE WHEN pkt_len < {small_pkt} THEN 1 ELSE 0 END) / count(*)",
        "Large_Pkt_Ratio": f"sum(CASE WHEN pkt_len > {large_pkt} THEN 1 ELSE 0 END) / count(*)",
        "TCP_Ratio": "sum(CASE WHEN protocol = 'TCP' THEN 1 ELSE 0 END) / count(*)",
        "UDP_Ratio": "sum(CASE WHEN protocol = 'UDP' THEN 1 ELSE 0 END) / count(*)",
        "Protocol_Diversity": "approx_count_distinct(protocol)",
        "Unique_Src_Ports": "approx_count_distinct(src_port)",
        "Avg_Win_Size": "avg(win_size)",
        "Win_Size_StdDev": "stddev_samp(win_size)",
        "Min_Win_Size": "min(win_size)",
        "Max_Win_Size": "max(win_size)",
        "Zero_Win_Count": "sum(CASE WHEN win_size = 0 THEN 1 ELSE 0 END)",
        "RST_Count": "sum(CASE WHEN tcp_flags % 8 >= 4 THEN 1 ELSE 0 END)",
        "Unique_Dst_Ports": "approx_count_distinct(dst_port)",
        "Coeff_Variation_Size": f"stddev_samp(pkt_len) / (avg(pkt_len) + {eps})",
    }
    return [F.expr(e).alias(name) for name, e in exprs.items()]


def streaming_kpi36(
    packets: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window 36-KPI stream (append-mode safe)."""
    iat = with_streaming_iat(packets)
    out = (
        iat.withWatermark("ts", watermark)
        .groupBy(F.col("slice"), F.window("ts", window))
        .agg(*streaming_kpi_aggs())
        # withColumn (not select-star) so `slice` is never duplicated —
        # a duplicate survives a memory sink but poisons a parquet sink
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )
    return out.na.fill(0.0)


def streaming_dedup(
    events: DataFrame, keys: list[str], watermark_col: str, delay: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup bounded by the watermark: duplicates of a
    key are dropped as long as they arrive within ``delay`` of the
    original — state is garbage-collected past the watermark, so memory
    is bounded by (throughput × delay), not by stream history."""
    return events.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)


def streaming_attribution(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours",
    clicks_stream: DataFrame | None = None,
) -> DataFrame:
    """Stream-stream inner join bounded by an event-time interval: each
    'view' joins the 'click's of the same user that land in
    (view_ts, view_ts + within].  Both sides carry watermarks and the
    join condition bounds event time in BOTH directions, so Spark can
    size the join state to (watermark + within) and GC behind it —
    unbounded-state stream joins never reach production.  Self-joining
    one source stream (filtered two ways) is supported; pass
    ``clicks_stream`` to join two PHYSICALLY separate sources (the
    production topology: views and clicks land on different topics and
    advance their watermarks independently).  State shards by user_id
    with the shuffle."""
    click_src = events if clicks_stream is None else clicks_stream
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    clicks = click_src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return (
        views.withWatermark("view_ts", watermark)
        .join(
            clicks.withWatermark("click_ts", watermark),
            F.expr(
                "view_user = click_user"
                " AND click_ts > view_ts"
                f" AND click_ts <= view_ts + INTERVAL {within}"
            ),
        )
        .select("view_user", "view_id", "view_ts", "click_id", "click_ts")
    )


def streaming_enrich(events: DataFrame, dim: DataFrame, on: str = "event_type") -> DataFrame:
    """Stream-static broadcast join: enrich a stream with a small
    dimension table.  The static side is re-read per micro-batch (so
    dimension updates are picked up) and broadcast — no shuffle touches
    the stream, no state is kept, and the join adds zero watermark
    requirements.  This is the scale path for stream × dimension at
    100 TB/day: the stream stays partition-local."""
    return events.join(F.broadcast(dim), on, "left")


def streaming_sessions(
    packets: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-flow session aggregation on a stream via native session
    windows (dynamic-length state windows closed by the watermark)."""
    return (
        packets.withWatermark("ts", watermark)
        .groupBy(F.col("flow_id"), F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("pkt_len").alias("total_bytes"),
        )
        .select(
            "flow_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_bytes",
        )
    )
