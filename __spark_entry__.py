"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fiveg_spark/``; every query here is declared
in SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fiveg_spark.operators import kpi as _kpi


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 36 KPIs per (slice, hour) on sf0.001 (SURVEY §2 B2)."""
    return _kpi.kpi36(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "kpi36": _kpi.kpi36,
    }
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/aliases)."""
    return {
        "kpi36": _kpi.kpi36_oracle_sql(),
    }
