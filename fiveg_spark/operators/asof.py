"""As-of (most-recent-match) join (SURVEY §2 C16).

The canonical time-series join Spark lacks as a primitive: attach to
each left event the latest right-side record at-or-before its
timestamp, per key.  The reference domain's use case: join each packet
window to the most recent config/scaler update for its slice.

Spark-first implementation — the union + IGNORE NULLS running-last
window trick:

    lefts ∪ rights  (marker column)
      → ONE window shuffle on (key), ordered by (ts, side)
      → last_value(right_cols) IGNORE NULLS  (running, frame-bounded)
      → filter back to left rows

One shuffle total, no join node, no per-row probe: at 100 TB this
scales exactly like any other keyed window (and beats a range-join
O(n·m) explosion by construction).  Rights are pre-aggregated to one
row per (key, ts) so ties are deterministic.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` — same semantics
(match r.ts <= l.ts, greatest such r.ts), which makes this one of the
few operators where the oracle exercises a DIFFERENT algorithm, not
just a different engine.

Demo instance on the testdata: each purchase event joins the latest
signup event in its slice (signup ≈ config-update stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.operators.kpi import flows_cte
from fiveg_spark.plans.registry import Query, cnt, ensure_views


def asof_join(
    lefts: DataFrame,
    rights: DataFrame,
    key: str,
    ts: str,
    right_cols: tuple[str, ...],
) -> DataFrame:
    """Generic as-of join: latest right row with r.ts <= l.ts per key.

    ``rights`` must be unique per (key, ts) — pre-aggregate if not.
    Returns the left rows plus ``right_cols`` (NULL when no prior right).
    """
    l_marked = lefts.withColumn("__side", F.lit(1))
    for c in right_cols:
        if c not in l_marked.columns:
            l_marked = l_marked.withColumn(c, F.lit(None))
    r_marked = rights.select(
        key, ts, *right_cols
    ).withColumn("__side", F.lit(0))
    for c in lefts.columns:
        if c not in r_marked.columns:
            r_marked = r_marked.withColumn(c, F.lit(None))
    unioned = l_marked.select(*l_marked.columns).unionByName(
        r_marked.select(*l_marked.columns)
    )
    # rights (side 0) sort before lefts at equal ts → ties match (r.ts <= l.ts)
    frame = (
        f"OVER (PARTITION BY {key} ORDER BY {ts}, __side "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    carried = [
        F.expr(f"last_value(__r_{c}) IGNORE NULLS {frame}").alias(f"asof_{c}")
        for c in right_cols
    ]
    staged = unioned.select(
        *[c for c in lefts.columns],
        "__side",
        *[
            F.when(F.col("__side") == 0, F.col(c)).alias(f"__r_{c}")
            for c in right_cols
        ],
    )
    out = staged.select(*lefts.columns, "__side", *carried).filter(
        F.col("__side") == 1
    )
    return out.drop("__side")


def _purchases_asof_signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, ("events",), sf_dir)
    flows = spark.sql(f"{flows_cte('spark')} SELECT * FROM flows")
    purchases = flows.filter(F.col("protocol") == "TCP").select(
        "slice", "event_id", "ts_sec"
    )
    signups = (
        flows.filter(F.col("protocol") == "UDP")
        .groupBy("slice", "ts_sec")
        .agg(F.max("flow_id").alias("cfg_flow"))
    )
    joined = asof_join(
        purchases,
        signups.withColumnRenamed("ts_sec", "cfg_ts_pre").selectExpr(
            "slice", "cfg_ts_pre AS ts_sec", "cfg_flow"
        ),
        key="slice",
        ts="ts_sec",
        right_cols=("cfg_flow",),
    )
    # summary surface: exact per-slice stats of the as-of match
    return joined.groupBy("slice").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_lefts"),
        F.expr("CAST(count(asof_cfg_flow) AS BIGINT)").alias("n_matched"),
        F.expr(
            "CAST(round(coalesce(avg(asof_cfg_flow), 0.0) + 1e-9, 4) + 0.0 AS DOUBLE)"
        ).alias("avg_cfg_flow"),
    )


def _asof_oracle_sql() -> str:
    return f"""
    {flows_cte("duckdb")},
    purchases AS (
      SELECT slice, event_id, ts_sec FROM flows WHERE protocol = 'TCP'
    ),
    signups AS (
      SELECT slice, ts_sec, max(flow_id) AS cfg_flow
      FROM flows WHERE protocol = 'UDP'
      GROUP BY slice, ts_sec
    ),
    joined AS (
      SELECT p.slice, p.event_id, s.cfg_flow AS asof_cfg_flow
      FROM purchases p
      ASOF LEFT JOIN signups s
        ON p.slice = s.slice AND p.ts_sec >= s.ts_sec
    )
    SELECT
      slice,
      {cnt("count(*)", "n_lefts")},
      {cnt("count(asof_cfg_flow)", "n_matched")},
      CAST(round(coalesce(avg(asof_cfg_flow), 0.0) + 1e-9, 4) + 0.0 AS DOUBLE) AS avg_cfg_flow
    FROM joined
    GROUP BY slice
    """


QUERIES = [
    Query("asof_join_stats", _purchases_asof_signups, _asof_oracle_sql()),
]
