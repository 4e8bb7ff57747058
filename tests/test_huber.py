"""Huber IRLS: distributed fit ≡ local numpy IRLS, and robustness —
planted outliers must bend OLS but barely move the Huber fit."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from fiveg_spark.ml.huber import DELTA, ITERS, huber_fit, scalar_design


def _local_irls(X, y, delta, iters):
    beta = None
    for _ in range(iters):
        if beta is None:
            w = np.ones(len(y))
        else:
            r = y - X @ beta
            a = np.abs(r)
            w = np.where(a <= delta, 1.0, delta / np.maximum(a, 1e-12))
        Xw = X * w[:, None]
        beta = np.linalg.solve(X.T @ Xw + 1e-9 * np.eye(X.shape[1]), Xw.T @ y)
    return beta


def test_distributed_irls_equals_numpy(spark):
    design = scalar_design(spark, SF_DIR).cache()
    got = huber_fit(design)
    rows = design.collect()
    by_slice = {}
    for r in rows:
        by_slice.setdefault(r["slice"], []).append(r)
    for slc, rs in by_slice.items():
        X = np.asarray([list(r["x"]) for r in rs], dtype=np.float64)
        y = np.asarray([r["y_t"] for r in rs], dtype=np.float64)
        expect = _local_irls(X, y, DELTA, ITERS)
        assert np.allclose(got[slc], expect, atol=1e-8), slc
    design.unpersist()


def test_huber_resists_planted_outliers(spark):
    rng = np.random.default_rng(5)
    n = 400
    x1 = rng.normal(0, 1, n)
    y = 2.0 * x1 + rng.normal(0, 0.1, n)
    y[:8] += 80.0  # gross outliers
    rows = [
        ("s", [1.0, float(a)], float(b)) for a, b in zip(x1, y)
    ]
    design = spark.createDataFrame(rows, "slice string, x array<double>, y_t double")
    hub = huber_fit(design, delta=1.0, iters=8)["s"]
    ols = huber_fit(design, delta=1.0, iters=1)["s"]
    assert abs(ols[1] - 2.0) > 0.05 or abs(ols[0]) > 0.5  # OLS got pulled
    assert abs(hub[1] - 2.0) < 0.05
    assert abs(hub[0]) < 0.3
