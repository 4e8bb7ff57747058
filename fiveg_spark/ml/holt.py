"""Holt linear-trend (double exponential) smoothing per slice (SURVEY
§2 D21).

The reference's forecasting stack (ref train.py: VAR baseline + GRU/TFT
residual model) needs a second classical baseline between seasonal-naive
(D13) and VAR (D6): Holt's method tracks level + trend with two coupled
recursions

    l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

which no window/cumsum identity linearizes (the EWMA trick in C29 only
covers the single-recursion case), so this is genuinely
`applyInPandas` territory: one shuffle on the series key, then a tiny
sequential pass per slice — the same cost shape as any per-key model
fit.  At 100 TB the hourly frame is already reduced (≤ thousands of
rows per key), so the Python stage is microscopic next to the events
scan feeding it.

Rows-only contract surface (iterative recursion isn't SQL-expressible);
the strong check is the pytest equivalence against a pure-Python
recursion on the same series.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ALPHA = 0.5
BETA = 0.3
H_STEPS = 3

_SCHEMA = T.StructType(
    [
        T.StructField("slice", T.StringType()),
        T.StructField("n_hours", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("one_step_mae", T.DoubleType()),
        T.StructField("fc_h1", T.DoubleType()),
        T.StructField("fc_h2", T.DoubleType()),
        T.StructField("fc_h3", T.DoubleType()),
    ]
)


def holt_fit(y, alpha: float = ALPHA, beta: float = BETA):
    """Pure-Python Holt recursion (the single-series reference the
    distributed path must match).  Returns (level, trend, one_step_mae).
    Init: l_0 = y_0, b_0 = y_1 − y_0 (standard textbook initialization);
    the first forecastable point is t = 1."""
    level, trend = float(y[0]), float(y[1]) - float(y[0])
    abs_err_sum, n_err = 0.0, 0
    for t in range(1, len(y)):
        pred = level + trend
        abs_err_sum += abs(float(y[t]) - pred)
        n_err += 1
        new_level = alpha * float(y[t]) + (1.0 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1.0 - beta) * trend
        level = new_level
    return level, trend, abs_err_sum / max(n_err, 1)


def _holt_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("window_start")
    y = pdf["throughput"].to_numpy()
    if len(y) < 2:
        return pd.DataFrame(columns=[f.name for f in _SCHEMA.fields])
    level, trend, mae = holt_fit(y)
    return pd.DataFrame(
        [
            {
                "slice": pdf["slice"].iloc[0],
                "n_hours": len(y),
                "level": round(level, 4),
                "trend": round(trend, 4),
                "one_step_mae": round(mae, 4),
                **{f"fc_h{h}": round(level + h * trend, 4) for h in range(1, H_STEPS + 1)},
            }
        ]
    )


def holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-slice Holt fit over the hourly throughput series + h-step
    linear forecasts (level + h·trend)."""
    from fiveg_spark.ml.features import feature_frame

    frame = feature_frame(spark, sf_dir).select("slice", "window_start", "throughput")
    return (
        frame.groupBy("slice")
        .applyInPandas(_holt_kernel, schema=_SCHEMA)
        .orderBy("slice")
    )
