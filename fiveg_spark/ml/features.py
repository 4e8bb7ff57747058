"""Feature-frame construction + RobustScaler, shared by the ML block.

Mirrors train.py:52-110 (FEATURE_MAP projection, missing→0.0) and
train.py:193-196 (RobustScaler fit on the ordered 70% train split,
transform applied everywhere).  The frame is the hourly slice series —
tiny after the events aggregation (3 slices × ~720 h at any sf), so all
ML steps downstream operate on a reduced DataFrame while the heavy
shuffle happened once in the KPI aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fiveg_spark.operators.timeseries import _feature_vectors_sql
from fiveg_spark.plans.registry import ensure_views

FEATURES = (
    "throughput",
    "packets",
    "jitter",
    "latency",
    "reliability",
    "congestion",
    "complexity",
)


def feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(slice, window_start, 7 feature cols) — train.py's final_df."""
    ensure_views(spark, ("events",), sf_dir)
    return spark.sql(_feature_vectors_sql("spark"))


def with_split(df: DataFrame) -> DataFrame:
    """Ordered 70/15/15 split tag per slice (train.py:186-190)."""
    w = Window.partitionBy("slice").orderBy("window_start")
    wn = Window.partitionBy("slice")
    df = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return df.withColumn(
        "split",
        F.when(F.col("rn") <= F.floor(0.7 * F.col("n")), "train")
        .when(F.col("rn") <= F.floor(0.85 * F.col("n")), "val")
        .otherwise("test"),
    )


def robust_scale(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Fit median/IQR on the train split, transform ALL rows.

    Returns (scaled_frame, params).  sklearn semantics: zero-IQR features
    (the constant 0.0 fillers) divide by 1.0, not 0.
    """
    split_df = with_split(df)
    aggs = []
    for f in FEATURES:
        aggs.append(F.expr(f"percentile({f}, 0.5)").alias(f"{f}_center"))
        aggs.append(
            F.expr(f"percentile({f}, 0.75) - percentile({f}, 0.25)").alias(f"{f}_iqr")
        )
    params = split_df.filter(F.col("split") == "train").groupBy("slice").agg(*aggs)

    scaled = split_df.join(F.broadcast(params), "slice")
    for f in FEATURES:
        scale = F.when(F.col(f"{f}_iqr") > 0, F.col(f"{f}_iqr")).otherwise(F.lit(1.0))
        scaled = scaled.withColumn(f, (F.col(f) - F.col(f"{f}_center")) / scale)
    keep = ["slice", "window_start", "rn", "n", "split", *FEATURES]
    return scaled.select(*keep), params


def as_vector(df: DataFrame, out: str = "x") -> DataFrame:
    """Pack the 7 feature columns into one array<double> column."""
    return df.withColumn(out, F.array(*[F.col(f) for f in FEATURES]))
