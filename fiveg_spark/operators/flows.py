"""Flow-level analytics over the packet-event view.

Per-flow aggregation, top-k talkers, and gap-based sessionization —
the flow dimension of the reference's KPI pipeline (flowId-keyed
processing, PcapKpiExtractor.scala:207,252; KafkaKpiPipeline.scala:86-97).

Scale notes: every query here shuffles on (slice, flow_id) or flow_id —
high-cardinality keys that spread evenly at 100 TB.  top_flows is a
full agg followed by a single-partition top-k of an already-tiny
aggregate (one row per flow), which AQE keeps cheap.
"""

from __future__ import annotations

from fiveg_spark.operators.kpi import IDLE_THRESHOLD_S, flows_cte
from fiveg_spark.plans.registry import Query, cnt, dbl, pct, sql_backed

SESSION_GAP_S = 1800.0  # 30 min inactivity closes a session


def _flow_iat_stats_sql(d: str) -> str:
    return f"""
    {flows_cte(d)}
    SELECT
      slice,
      flow_id,
      {cnt("count(*)", "n_events")},
      {dbl("sum(pkt_len)", "total_bytes")},
      {dbl("avg(iat)", "avg_iat")},
      {dbl("min(iat)", "min_iat")},
      {dbl("max(iat)", "max_iat")},
      {dbl("max(ts_sec) - min(ts_sec)", "duration_s")},
      {cnt(f"sum(CASE WHEN iat > {IDLE_THRESHOLD_S} THEN 1 ELSE 0 END)", "idle_periods")}
    FROM flows
    GROUP BY slice, flow_id
    """


def _idle_periods_sql(d: str) -> str:
    # Exercises a different threshold than the kpi36 default (B5).
    return f"""
    {flows_cte(d)}
    SELECT
      slice,
      {cnt("sum(CASE WHEN iat > 3600.0 THEN 1 ELSE 0 END)", "idle_periods_1h")},
      {dbl("sum(CASE WHEN iat > 3600.0 THEN 1 ELSE 0 END) / count(*)", "idle_rate_1h")},
      {cnt("sum(CASE WHEN iat > 60.0 THEN 1 ELSE 0 END)", "idle_periods_1m")},
      {dbl("sum(CASE WHEN iat > 60.0 THEN 1 ELSE 0 END) / count(*)", "idle_rate_1m")}
    FROM flows
    GROUP BY slice
    """


def _top_flows_sql(d: str) -> str:
    # Deterministic top-k: rank on the ROUNDED measure with unique tiebreak.
    # ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition heap +
    # driver merge, no single-partition window over millions of flows);
    # the rank window then runs over just the 10 surviving rows.
    return f"""
    {flows_cte(d)},
    per_flow AS (
      SELECT
        flow_id,
        slice,
        {dbl("sum(pkt_len)", "total_bytes")},
        {cnt("count(*)", "n_events")}
      FROM flows
      GROUP BY flow_id, slice
    ),
    top AS (
      SELECT * FROM per_flow ORDER BY total_bytes DESC, flow_id LIMIT 10
    )
    SELECT flow_id, slice, total_bytes, n_events,
           CAST(row_number() OVER (ORDER BY total_bytes DESC, flow_id) AS BIGINT) AS rnk
    FROM top
    """


def _sessionize_sql(d: str) -> str:
    # C6: gap-based sessionization = boundary flag -> running sum ->
    # session-level agg.  Two window passes + one agg, all on flow_id.
    return f"""
    {flows_cte(d)},
    flagged AS (
      SELECT *,
        CASE WHEN lag(ts_sec) OVER (PARTITION BY flow_id ORDER BY ts_sec, event_id) IS NULL
               OR ts_sec - lag(ts_sec) OVER (PARTITION BY flow_id ORDER BY ts_sec, event_id)
                   > {SESSION_GAP_S}
             THEN 1 ELSE 0 END AS is_new
      FROM flows
    ),
    numbered AS (
      SELECT *,
        sum(is_new) OVER (PARTITION BY flow_id ORDER BY ts_sec, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT
      flow_id,
      CAST(session_idx AS BIGINT) AS session_idx,
      {cnt("count(*)", "n_events")},
      min(ts) AS session_start,
      {dbl("max(ts_sec) - min(ts_sec)", "duration_s")},
      {dbl("sum(pkt_len)", "total_bytes")}
    FROM numbered
    GROUP BY flow_id, session_idx
    """


def _slice_throughput_hourly_sql(d: str) -> str:
    # B7: the multivariate-time-series construction feed (one row per
    # slice per hour) that train.py consumes.
    return f"""
    {flows_cte(d)}
    SELECT
      slice,
      date_trunc('hour', ts) AS window_start,
      {dbl("sum(pkt_len) * 8", "throughput_bps")},
      {cnt("count(*)", "total_packets")},
      {dbl("sum(pkt_len)", "total_bytes")}
    FROM flows
    GROUP BY slice, date_trunc('hour', ts)
    """


def _session_window_native(spark, sf_dir):
    # C6b: Spark's NATIVE session_window operator (dynamic gap windows in
    # the engine itself) — same semantics as the cumsum construction the
    # oracle uses: a session closes when the next event is >= gap away
    # (session windows are end-exclusive).
    from pyspark.sql import functions as F

    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("events",), sf_dir)
    flows = spark.sql(f"{flows_cte('spark')} SELECT * FROM flows")
    return (
        flows.groupBy(
            "flow_id", F.session_window("ts", f"{int(SESSION_GAP_S)} seconds")
        )
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_events"),
            F.expr(
                "CAST(round(coalesce(sum(pkt_len), 0.0) + 1e-9, 4) + 0.0 AS DOUBLE)"
            ).alias("total_bytes"),
        )
        .select(
            "flow_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_bytes",
        )
    )


def _session_window_oracle() -> str:
    return f"""
    {flows_cte("duckdb")},
    flagged AS (
      SELECT *,
        CASE WHEN lag(ts_sec) OVER (PARTITION BY flow_id ORDER BY ts_sec, event_id) IS NULL
               OR ts_sec - lag(ts_sec) OVER (PARTITION BY flow_id ORDER BY ts_sec, event_id)
                   >= {SESSION_GAP_S}
             THEN 1 ELSE 0 END AS is_new
      FROM flows
    ),
    numbered AS (
      SELECT *,
        sum(is_new) OVER (PARTITION BY flow_id ORDER BY ts_sec, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT
      flow_id,
      min(ts) AS session_start,
      {cnt("count(*)", "n_events")},
      {dbl("sum(pkt_len)", "total_bytes")}
    FROM numbered
    GROUP BY flow_id, session_idx
    """


def _approx_variants_sql(d: str) -> str:
    # Production-scale variants of the exact aggregates: HLL distinct
    # counts and approx percentiles (mergeable sketches -> one pass, no
    # Expand, no exact-distinct shuffle multiplication).
    #
    # Certification design (r3 ADVICE): raw sketch outputs differ across
    # engines by construction, so the query emits what IS comparable —
    # the exact anchors plus in-row tolerance booleans.  Each engine
    # checks ITS OWN sketch against ITS OWN exact value: HLL within 10%
    # relative error (Spark default rsd = 5%), approx percentiles inside
    # the exact ±5-rank-percent bracket (percentile_approx accuracy 1000
    # → ±0.1 rank percent; DuckDB t-digest is comparably tight).  Both
    # engines agree on every exact column and every boolean, so the
    # driver hash-certifies the approx family instead of `no_oracle`.
    if d == "spark":
        hll = "approx_count_distinct({0})"
        apx = "percentile_approx({0}, {1}, 1000)"
    else:
        hll = "approx_count_distinct({0})"
        apx = "approx_quantile({0}, {1})"

    def bracket(col: str, p: float, lo: float, hi: float, alias: str) -> str:
        return (
            f"CAST({apx.format(col, p)} BETWEEN {pct(col, lo, d)} - 1e-9 "
            f"AND {pct(col, hi, d)} + 1e-9 AS BOOLEAN) AS {alias}"
        )

    return f"""
    {flows_cte(d)}
    SELECT
      slice,
      {cnt("count(*)", "n")},
      {cnt("count(DISTINCT flow_id)", "exact_flows")},
      {cnt("count(DISTINCT pkt_len)", "exact_pkt_sizes")},
      CAST(abs({hll.format("flow_id")} - count(DISTINCT flow_id))
           <= 0.1 * count(DISTINCT flow_id) AS BOOLEAN) AS flows_hll_ok,
      CAST(abs({hll.format("pkt_len")} - count(DISTINCT pkt_len))
           <= 0.1 * count(DISTINCT pkt_len) AS BOOLEAN) AS sizes_hll_ok,
      {bracket("iat", 0.5, 0.45, 0.55, "iat_p50_ok")},
      {bracket("pkt_len", 0.5, 0.45, 0.55, "pkt_p50_ok")},
      {bracket("pkt_len", 0.95, 0.90, 0.99, "pkt_p95_ok")},
      {bracket("pkt_len", 0.99, 0.97, 1.0, "pkt_p99_ok")}
    FROM flows
    GROUP BY slice
    """


def _salted_agg_sql(d: str) -> str:
    # C62 — two-phase SALTED aggregation surfaced as a certified query:
    # `slice` has cardinality 3, so a direct groupBy(slice) funnels a
    # third of 100 TB through each of three reducers.  Salting splits
    # every hot key 16 ways (partial agg on (slice, salt) spreads the
    # shuffle), then the tiny 48-row partial frame re-aggregates to the
    # final 3 rows.  Sum/count decompose exactly, so the result is
    # bit-identical to the direct aggregation — which is what the oracle
    # checks (DuckDB runs the same two-phase text; its materialized CTE
    # makes that cheap).
    return f"""
    {flows_cte(d)},
    partials AS (
      SELECT
        slice,
        CAST(flow_id % 16 AS INT) AS salt,
        sum(pkt_len) AS s_bytes,
        count(*) AS c_pkts,
        max(pkt_len) AS m_pkt
      FROM flows
      GROUP BY slice, CAST(flow_id % 16 AS INT)
    )
    SELECT
      slice,
      {dbl("sum(s_bytes)", "total_bytes")},
      {cnt("sum(c_pkts)", "n_packets")},
      {dbl("sum(s_bytes) / sum(c_pkts)", "avg_pkt_len")},
      {dbl("max(m_pkt)", "max_pkt_len")}
    FROM partials
    GROUP BY slice
    """


SLO_TARGET = 0.9  # objective: 90% of packets under the IAT bound
SLI_IAT_BOUND_S = 0.5  # a packet is "good" when its IAT <= 500 ms
BURN_WINDOW_H = 6  # trailing burn-rate window
FAST_BURN = 6.0  # alert threshold (SRE fast-burn convention, scaled)


def _slo_burn_sql(d: str) -> str:
    # B19 — SLO compliance + error-budget burn rate per slice-hour (the
    # SRE monitoring arithmetic — Beyer et al. 2018 ch. 5 — applied to
    # the 5G KPI stream the reference computes raw aggregates for): the
    # SLI is the fraction of packets meeting the IAT bound; the burn
    # rate is (1 − SLI_trailing) / (1 − SLO) over a trailing window —
    # burn 1.0 spends the budget exactly at period end, FAST_BURN
    # drains it in hours and pages.  This is the alerting layer that
    # turns kpi36's measurements into decisions.
    #
    # The trailing window is ROWS-based over the hourly rollup
    # (contiguous in this corpus; a gap-tolerant deployment would
    # RANGE on epoch seconds — same plan family).  good/total counts
    # are integers → SLI and burn are engine-identical ratios; the
    # alert compares the ROUNDED burn.
    #
    # Scale: one fact scan → hourly (slice, good, total) agg, then a
    # bounded window on the tiny rollup.
    return f"""
    {flows_cte(d)},
    hourly AS (
      SELECT
        slice,
        date_trunc('hour', ts) AS h,
        CAST(count(*) AS BIGINT) AS total,
        CAST(sum(CASE WHEN iat <= {SLI_IAT_BOUND_S} THEN 1 ELSE 0 END) AS BIGINT)
          AS good
      FROM flows
      GROUP BY slice, date_trunc('hour', ts)
    ),
    burn_win AS (
      SELECT
        slice,
        h,
        total,
        good,
        sum(total) OVER (
          PARTITION BY slice ORDER BY h
          ROWS BETWEEN {BURN_WINDOW_H - 1} PRECEDING AND CURRENT ROW
        ) AS t_total,
        sum(good) OVER (
          PARTITION BY slice ORDER BY h
          ROWS BETWEEN {BURN_WINDOW_H - 1} PRECEDING AND CURRENT ROW
        ) AS t_good
      FROM hourly
    )
    SELECT
      slice,
      h,
      {cnt("total", "n_packets")},
      {dbl("good / CAST(total AS DOUBLE)", "sli")},
      {dbl(
          f"(1.0 - t_good / CAST(t_total AS DOUBLE)) / (1.0 - {SLO_TARGET})",
          "burn_rate",
      )},
      CAST(round((1.0 - t_good / CAST(t_total AS DOUBLE))
                 / (1.0 - {SLO_TARGET}) + 1e-9, 4) > {FAST_BURN}
        AS BOOLEAN) AS fast_burn_alert
    FROM burn_win
    ORDER BY slice, h
    """


QUERIES = [
    sql_backed("slo_burn_rate", _slo_burn_sql, ("events",)),
    sql_backed("approx_variants", _approx_variants_sql, ("events",)),
    Query("session_window_native", _session_window_native, _session_window_oracle()),
    sql_backed("flow_iat_stats", _flow_iat_stats_sql, ("events",)),
    sql_backed("idle_periods", _idle_periods_sql, ("events",)),
    sql_backed("top_flows", _top_flows_sql, ("events",)),
    sql_backed("sessionize", _sessionize_sql, ("events",)),
    sql_backed("slice_throughput_hourly", _slice_throughput_hourly_sql, ("events",)),
    sql_backed("salted_agg_throughput", _salted_agg_sql, ("events",)),
]
