"""MLlib-native models vs the from-scratch implementations."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fiveg_spark.ml.mllib_models import (
    linear_baseline,
    mllib_ann_topk,
    mllib_minhash_pairs,
)
from tests.conftest import SF_DIR


def test_linear_baseline_matches_closed_form(spark):
    rows = {r["slice"]: r for r in linear_baseline(spark, SF_DIR).collect()}
    assert set(rows) == {"eMBB", "URLLC", "mMTC"}
    from fiveg_spark.operators.timeseries import _var_lag_sql
    from fiveg_spark.sources.tables import load_table

    load_table(spark, "events", SF_DIR).createOrReplaceTempView("events")
    lagged = spark.sql(_var_lag_sql("spark")).filter(F.col("slice") == "eMBB").collect()
    X = np.array([[r["y_l1"], r["y_l2"], r["y_l3"]] for r in lagged])
    y = np.array([r["y"] for r in lagged])
    Xs = X / X.std(0, ddof=1)  # MLlib StandardScaler default: withStd, no centering
    A = np.column_stack([Xs, np.ones(len(y))])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ beta
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert abs(rows["eMBB"]["train_rmse"] - round(rmse, 4)) < 1e-3 * max(rmse, 1)


def test_mllib_minhash_agrees_with_md5_minhash(spark):
    """Both MinHash implementations must surface the SAME true near-dups
    (exact Jaccard ≥ threshold pairs from the oracle-checked operator)."""
    from fiveg_spark.operators.dedup import QUERIES as DEDUP_QUERIES

    exact_q = next(q for q in DEDUP_QUERIES if q.name == "ngram_jaccard_pairs")
    exact_pairs = {
        (r["doc_a"], r["doc_b"]) for r in exact_q.run(spark, SF_DIR).collect()
    }
    mllib_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in mllib_minhash_pairs(spark, SF_DIR, threshold=0.5).collect()
    }
    # exact pairs are blocked by (lang, source); MLlib sees all pairs —
    # so exact ⊆ mllib is the meaningful containment
    missing = exact_pairs - mllib_pairs
    assert not missing, f"MLlib MinHash missed true near-dups: {missing}"


def test_mllib_ann_topk_reasonable(spark):
    got = mllib_ann_topk(spark, SF_DIR, query_vec_id=0, k=10).collect()
    assert len(got) == 10
    dists = [r["euclidean_dist"] for r in got]
    assert dists == sorted(dists)
    # sanity: ANN distances must match exact euclidean on the same ids
    from fiveg_spark.sources.tables import load_table

    emb = {r["vec_id"]: np.array(r["embedding"]) for r in load_table(spark, "embeddings", SF_DIR).collect()}
    q = emb[0]
    for r in got[:5]:
        exact = float(np.linalg.norm(emb[r["vec_id"]] - q))
        assert abs(exact - r["euclidean_dist"]) < 1e-3


def test_pca_explained_variance_matches_numpy(spark):
    from fiveg_spark.ml.mllib_models import pca_explained_variance
    from fiveg_spark.sources.tables import load_table

    got = {
        r["component"]: r["explained_variance"]
        for r in pca_explained_variance(spark, SF_DIR, k=4).collect()
    }
    X = np.array(
        [r["embedding"] for r in load_table(spark, "embeddings", SF_DIR).collect()],
        dtype=np.float64,
    )
    # MLlib divides the Gramian by n (population covariance, uncentered
    # mean handling matches RowMatrix.computeCovariance: centered, /(n-1))
    C = np.cov(X, rowvar=False, ddof=1)
    eig = np.sort(np.linalg.eigvalsh(C))[::-1]
    ratios = eig / eig.sum()
    for i in range(4):
        assert abs(got[i] - ratios[i]) < 1e-4, (i, got[i], ratios[i])
    assert all(got[i] >= got[i + 1] for i in range(3))


def test_isotonic_matches_pava_hand_case(spark):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)], "x double, y double"
    )
    vec = VectorAssembler(inputCols=["x"], outputCol="features").transform(df)
    model = IsotonicRegression(featuresCol="features", labelCol="y").fit(vec)
    got = {
        r["x"]: r["prediction"] for r in model.transform(vec).collect()
    }
    # PAVA pools the (3,2) violation into 2.5
    assert got[1.0] == pytest.approx(1.0)
    assert got[2.0] == pytest.approx(2.5)
    assert got[3.0] == pytest.approx(2.5)
    assert got[4.0] == pytest.approx(4.0)


def test_isotonic_calibration_query_shape(spark):
    from fiveg_spark.ml.mllib_models import isotonic_calibration

    out = isotonic_calibration(spark, SF_DIR).collect()
    assert len(out) >= 2
    cal = [r["calibrated"] for r in sorted(out, key=lambda r: r["fc_boundary"])]
    assert cal == sorted(cal)  # monotone by construction
    assert out[0]["mae_raw"] > 0
