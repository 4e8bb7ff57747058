"""Streaming EWMA anomaly detection (SURVEY §2 B13).

The online version of the batch z-score operator
(`operators/timeseries.py zscore_anomalies`): per-slice keyed state
carries the exponentially-weighted mean/variance, each arriving
measurement is scored against the state BEFORE it updates it (so an
anomaly can't mask itself), and flags stream out per event — the
NWDAF-style "abnormal behaviour" analytic, detection latency = one
micro-batch.

State is three numbers per slice — thousands of slices cost nothing;
no watermark needed because the recursion never drops state.  Within a
batch rows are processed in event-time order (mergesort = stable for
equal timestamps), so any INTRA-batch disorder is repaired and a
replay with the same batch boundaries is bit-identical — the property
the stream-equals-batch test pins.  Cross-batch disorder is the
source's job (file order / Kafka partition-time), as with every
sequential-state recursion.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALPHA = 0.1
Z_THRESHOLD = 3.0
EPS = 1e-9

OUT_SCHEMA = T.StructType(
    [
        T.StructField("slice", T.StringType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("mu", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def ewma_step(x: float, mu: float, var: float) -> tuple[float, float, float]:
    """One EW update: score x against (mu, var), then fold it in.
    var uses the standard EW recursion var' = (1-α)(var + α·d²)."""
    d = x - mu
    z = d / np.sqrt(var + EPS)
    mu_new = mu + ALPHA * d
    var_new = (1.0 - ALPHA) * (var + ALPHA * d * d)
    return z, mu_new, var_new


def _anomaly_state(
    key, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        mu, var, n = state.get
    else:
        mu, var, n = 0.0, 0.0, 0
    for pdf in batches:
        pdf = pdf.sort_values("ts_sec", kind="mergesort")
        zs = np.empty(len(pdf))
        flags = np.empty(len(pdf), dtype=bool)
        for i, x in enumerate(pdf["value"].to_numpy(dtype=np.float64)):
            if n == 0:
                # first observation seeds the state; not scoreable
                zs[i], flags[i] = 0.0, False
                mu, var = x, 0.0
            else:
                z, mu, var = ewma_step(x, mu, var)
                zs[i] = z
                # variance needs a couple of points before z is meaningful
                flags[i] = bool(n >= 2 and abs(z) > Z_THRESHOLD)
            n += 1
        out = pd.DataFrame(
            {
                "slice": key[0],
                "ts_sec": pdf["ts_sec"].values,
                "value": pdf["value"].values,
                "zscore": np.round(zs, 6),
                "is_anomaly": flags,
            }
        )
        yield out
    state.update((float(mu), float(var), int(n)))


def streaming_ewma_anomaly(measurements: DataFrame) -> DataFrame:
    """(slice, ts_sec, value) stream → scored stream with anomaly flags."""
    return measurements.groupBy("slice").applyInPandasWithState(
        _anomaly_state,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_reference(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas replay of the identical recursion (test oracle)."""
    rows = []
    for slc, grp in pdf.groupby("slice"):
        grp = grp.sort_values("ts_sec", kind="mergesort")
        mu, var, n = 0.0, 0.0, 0
        for _, r in grp.iterrows():
            x = float(r["value"])
            if n == 0:
                z, flag = 0.0, False
                mu, var = x, 0.0
            else:
                z, mu, var = ewma_step(x, mu, var)
                flag = bool(n >= 2 and abs(z) > Z_THRESHOLD)
            n += 1
            rows.append((slc, float(r["ts_sec"]), x, round(float(z), 6), flag))
    return pd.DataFrame(rows, columns=["slice", "ts_sec", "value", "zscore", "is_anomaly"])
