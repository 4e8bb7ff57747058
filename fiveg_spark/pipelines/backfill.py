"""Idempotent partitioned KPI backfill (production pattern for 100 TB).

Daily (slice, day)-partitioned KPI output with DYNAMIC partition
overwrite: re-running a date range replaces exactly the partitions the
job computed and leaves every other partition untouched — the
re-runnable, late-data-tolerant layout for a KPI table that downstream
training jobs read incrementally.

The filter on day is pushed into the events scan (partition/row-group
pruning), so backfilling one day of a year-long table reads one day.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.operators.kpi import kpi36_from_packets, packet_view


def kpi_daily(spark: SparkSession, sf_dir: str, days: list[datetime.date] | None = None) -> DataFrame:
    """36 KPIs per (slice, hour) with a ``day`` partition column,
    optionally restricted to ``days`` (filter pushed to the scan)."""
    packets = packet_view(spark, sf_dir)
    if days:
        packets = packets.filter(F.to_date("ts").isin(days))
    kpis = kpi36_from_packets(packets)
    return kpis.withColumn("day", F.to_date("window_start"))


def backfill(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    days: list[datetime.date] | None = None,
) -> None:
    """Write (or re-write) the selected days' partitions in place."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            kpi_daily(spark, sf_dir, days)
            .write.mode("overwrite")
            .partitionBy("slice", "day")
            .parquet(out_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
