"""Mergeable-sketch rollups (SURVEY §2 C32).

The 100 TB pattern for COUNT(DISTINCT) rollups: aggregate once into
per-(fine-grain) Datasketches HLL sketches, then merge sketches upward —
re-aggregation without rescanning the fact table, and sketch columns can
be persisted in a rollup table and unioned incrementally as new
partitions land (the classic "distinct users per day → per month"
hypertable rollup).  Exact distincts are carried alongside here so the
contract and tests can bound the estimation error.

Rows-only in the contract (DuckDB has no compatible HLL); pytest bounds
the relative error at the default lgConfigK=12 (<~2% typical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.plans.registry import Query
from fiveg_spark.sources.tables import load_table


def hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user sketches per event_type, merged to per-type totals."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n"),
    )
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_events",
            "approx_users",
            "exact_users",
            F.round(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users"),
                4,
            ).alias("rel_err"),
        )
    )


QUERIES = [
    # rows-only: Datasketches HLL binary format has no DuckDB twin; the
    # in-row exact_users/rel_err columns self-document the error bound.
    Query("hll_rollup_users", hll_rollup, None),
]
