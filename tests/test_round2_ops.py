"""Round-2 operator property tests: transition matrix, RFM bands, KMV
sketch, changepoint, RRF fusion, skew profile.

Oracle parity for each is covered by test_oracle_parity; these pin the
SEMANTICS (probability closure, band ranges, estimator error, planted
changepoint recovery, rank arithmetic) that a hash match alone can't
explain."""

from __future__ import annotations

import datetime as dt

import pytest

from fiveg_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _run(spark, name):
    import __spark_entry__ as contract

    return contract.queries()[name](spark, SF_DIR).toPandas()


def test_transition_matrix_rows_are_distributions(spark):
    pdf = _run(spark, "transition_matrix")
    assert (pdf["n_transitions"] > 0).all()
    sums = pdf.groupby("prev_type")["p_transition"].sum()
    assert ((sums - 1.0).abs() < 1e-3).all()


def test_rfm_segments_cover_all_users(spark):
    pdf = _run(spark, "rfm_segments")
    n_users = load_table(spark, "events", SF_DIR).select("user_id").distinct().count()
    assert pdf["n_users"].sum() == n_users
    for c in ("r_band", "f_band", "m_band"):
        assert pdf[c].between(1, 5).all()


def test_kmv_estimates_bounded(spark):
    from fiveg_spark.operators.rollup_stats import KMV_K

    pdf = _run(spark, "kmv_distinct_rollup")
    # Days (or the merged row) whose distinct count is below k carry the
    # exact value — zero error by construction.
    exact_rows = pdf[pdf["exact_distinct"] < KMV_K]
    assert (exact_rows["rel_err"] < 1e-6).all()
    # Estimation path: KMV with k=16 has σ ≈ 1/√14 ≈ 0.27; 3σ bound.
    assert (pdf["rel_err"] < 0.8).all()
    assert (pdf["kmv_estimate"] > 0).all()


def test_changepoint_recovers_planted_step(spark):
    rows = []
    t0 = dt.datetime(2024, 3, 1)
    for i in range(120):  # 5 days hourly; step at hour 60
        v = 100.0 if i < 60 else 500.0
        rows.append((i, t0 + dt.timedelta(hours=i), i % 7, "view", v, '{"k": 1}'))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    old = spark.table("events") if "events" in [t.name for t in spark.catalog.listTables()] else None
    df.createOrReplaceTempView("events")
    try:
        from fiveg_spark.operators.ts_diagnostics import _changepoint_sql

        out = spark.sql(_changepoint_sql("spark")).toPandas()
        assert len(out) == 1
        # split reported at the last left-segment hour: 59 or 60
        split_idx = (out["split_hour"].iloc[0] - t0).total_seconds() / 3600
        assert split_idx in (59.0, 60.0)
        assert out["var_reduction"].iloc[0] > 0.95
    finally:
        spark.catalog.dropTempView("events")
        if old is not None:
            old.createOrReplaceTempView("events")


def test_changepoint_properties(spark):
    pdf = _run(spark, "best_changepoint")
    assert (pdf["var_reduction"] <= 1.0 + 1e-9).all()
    assert (pdf["sse_split"] <= pdf["sse_nosplit"] + 1e-6).all()
    assert (pdf["left_hours"] >= 24).all()
    assert (pdf["right_hours"] >= 24).all()


def test_rrf_fusion_rank_arithmetic(spark):
    pdf = _run(spark, "rrf_fusion")
    assert len(pdf) == 10
    expected = 1.0 / (60.0 + pdf["rank_cos"]) + 1.0 / (60.0 + pdf["rank_euc"])
    assert ((pdf["rrf_score"] - expected).abs() < 1e-3).all()
    # fused list is sorted by rrf score
    assert (pdf["rrf_score"].diff().dropna() <= 1e-12).all()


def test_skew_profile_consistency(spark):
    pdf = _run(spark, "skew_profile").set_index("key_col")
    n_events = load_table(spark, "events", SF_DIR).count()
    assert (pdf["n_rows"] == n_events).all()
    assert (pdf["top_key_share"] <= 1.0).all()
    assert (pdf["max_key_rows"] >= pdf["p99_key_rows"] - 1e-9).all()
    assert (pdf["p99_key_rows"] >= pdf["p50_key_rows"] - 1e-9).all()
    # event_type has 5 keys → each ~20%: strong "skew" by share ratio
    assert pdf.loc["event_type", "n_keys"] == 5
