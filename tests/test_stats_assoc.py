"""Literal-frame + numpy ground-truth tests for the association /
distribution-shape operators (parity only proves engine agreement)."""

from __future__ import annotations

import numpy as np
import pytest

from fiveg_spark.operators import stats_assoc as sa
from fiveg_spark.operators.timeseries import _hourly_cte


def _docs_view(spark, rows):
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).createOrReplaceTempView("documents")


def _events_view(spark, rows):
    spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, event_type STRING, user_id BIGINT, value DOUBLE, props STRING"
    ).createOrReplaceTempView("events")


def test_ols_trend_matches_numpy(spark):
    import tests.conftest as c
    from fiveg_spark.sources.tables import load_table

    load_table(spark, "events", c.SF_DIR).createOrReplaceTempView("events")
    hourly = spark.sql(
        f"{_hourly_cte('spark')} SELECT slice, h, throughput_bps FROM hourly"
    ).toPandas()
    got = {
        r["slice"]: r.asDict()
        for r in spark.sql(sa._ols_trend_sql("spark")).collect()
    }
    for slc, grp in hourly.groupby("slice"):
        x = (grp["h"].astype("int64") / 1e9 - (grp["h"].astype("int64") / 1e9).min()) / 3600.0
        y = grp["throughput_bps"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert got[slc]["slope_bps_per_hour"] == pytest.approx(slope, rel=1e-3)
        assert got[slc]["intercept_bps"] == pytest.approx(intercept, rel=1e-3)
        assert got[slc]["r2"] == pytest.approx(r * r, abs=1e-3)


def test_gini_hand_computed(spark):
    # source g: token counts 1,1,2 ascending -> G = 2*(1*1+2*1+3*2)/(3*4) - 4/3 = 1/6
    _docs_view(
        spark,
        [
            (0, "a", "en", "g", 0),
            (1, "b", "en", "g", 0),
            (2, "c d", "en", "g", 0),
            (3, "e e e", "en", "u", 0),  # single doc -> G = 2*3/(1*3) - 2 = 0
        ],
    )
    rows = {r["source"]: r.asDict() for r in spark.sql(sa._gini_sql("spark")).collect()}
    assert rows["g"]["n_docs"] == 3
    assert rows["g"]["total_tokens"] == 4
    assert rows["g"]["gini"] == pytest.approx(1 / 6, abs=1e-3)
    assert rows["u"]["gini"] == pytest.approx(0.0, abs=1e-3)


def test_association_independent_is_zero(spark):
    # every (type, band) cell has exactly 2 events -> perfectly independent
    rows = []
    eid = 0
    for t in ("A", "B"):
        for hour in (1, 7, 13, 19):  # one hour in each 6h band
            for _ in range(2):
                rows.append((eid, f"2024-01-01 {hour:02d}:00:00", t, 1, 1.0, "{}"))
                eid += 1
    _events_view(spark, [(i, __import__("datetime").datetime.fromisoformat(ts), t, u, v, p) for i, ts, t, u, v, p in rows])
    got = spark.sql(sa._assoc_sql("spark")).collect()[0].asDict()
    assert got["n_types"] == 2 and got["n_bands"] == 4 and got["n_events"] == 16
    assert got["chi_square"] == pytest.approx(0.0, abs=1e-6)
    assert got["mutual_info_nats"] == pytest.approx(0.0, abs=1e-6)
    assert got["dof"] == 3


def test_association_deterministic_is_maximal(spark):
    # type A only in band 0, type B only in band 2 -> perfect association
    import datetime as dt

    rows = [
        (0, dt.datetime(2024, 1, 1, 2), "A", 1, 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 3), "A", 1, 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 14), "B", 1, 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 15), "B", 1, 1.0, "{}"),
    ]
    _events_view(spark, rows)
    got = spark.sql(sa._assoc_sql("spark")).collect()[0].asDict()
    assert got["cramers_v"] == pytest.approx(1.0, abs=1e-3)
    # MI = H(type) = ln(2) when the mapping is 1:1 and classes are balanced
    assert got["mutual_info_nats"] == pytest.approx(np.log(2), abs=1e-3)


def test_doc_chunks_boundaries(spark):
    _docs_view(
        spark,
        [
            (0, " ".join(["w"] * 300), "en", "s", 0),  # 300 toks -> 2 chunks
            (1, " ".join(["w"] * 10), "en", "s", 0),  # 10 toks -> 1 chunk
            (2, " ".join(["w"] * 256), "en", "s", 0),  # exactly one window
        ],
    )
    out = [
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["end_tok"], r["chunk_tokens"])
        for r in spark.sql(sa._doc_chunks_sql("spark")).collect()
    ]
    assert out == [
        (0, 0, 0, 256, 256),
        (0, 1, 192, 300, 108),
        (1, 0, 0, 10, 10),
        (2, 0, 0, 256, 256),
    ]


def test_benford_digits_hand_computed(spark):
    import math

    from fiveg_spark.operators import quality as q

    totals = [1.5, 10.0, 25.0, 999.0, 0.0, 2.0, 100.0]  # 0 excluded
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(totals)], "o_orderkey BIGINT, o_totalprice DOUBLE"
    ).createOrReplaceTempView("orders")
    rows = {r["digit"]: r.asDict() for r in spark.sql(q._benford_digits_sql("spark")).collect()}
    # digits: 1,1,2,9,-,2,1 -> 1:3, 2:2, 9:1 of 6; the full 1..9 spine
    # must appear — absent digits are the strongest Benford violations
    assert set(rows) == set(range(1, 10))
    assert rows[1]["n_orders"] == 3
    assert rows[2]["n_orders"] == 2
    assert rows[9]["n_orders"] == 1
    assert rows[3]["n_orders"] == 0 and rows[3]["observed_frac"] == 0.0
    assert rows[1]["observed_frac"] == pytest.approx(0.5, abs=1e-3)
    assert rows[1]["expected_frac"] == pytest.approx(math.log10(2), abs=1e-3)
    # count-based Pearson chi2 over ALL nine digits
    counts = {1: 3, 2: 2, 9: 1}
    chi2 = sum(
        (counts.get(d, 0) - 6 * math.log10(1 + 1 / d)) ** 2 / (6 * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert rows[1]["chi2_stat"] == pytest.approx(chi2, abs=2e-2)


def test_benford_digits_edge_cases(spark):
    from fiveg_spark.operators import quality as q

    # float edge: the double just below 10^3 — log10 rounds UP to 3, the
    # ratio floors to 0, and the true first digit is 9 (not a clamp to 1)
    spark.createDataFrame(
        [(0, 999.9999999999999), (1, 500.0)], "o_orderkey BIGINT, o_totalprice DOUBLE"
    ).createOrReplaceTempView("orders")
    rows = {r["digit"]: r.asDict() for r in spark.sql(q._benford_digits_sql("spark")).collect()}
    assert rows[9]["n_orders"] == 1
    assert rows[5]["n_orders"] == 1
    assert rows[1]["n_orders"] == 0

    # empty / all-non-positive input: 9 zero rows, no division error
    spark.createDataFrame(
        [(0, 0.0), (1, -5.0)], "o_orderkey BIGINT, o_totalprice DOUBLE"
    ).createOrReplaceTempView("orders")
    rows = spark.sql(q._benford_digits_sql("spark")).collect()
    assert len(rows) == 9
    assert all(r["n_orders"] == 0 and r["observed_frac"] == 0.0 for r in rows)
    assert all(r["chi2_stat"] == 0.0 for r in rows)


def test_iat_exponential_fit_hand_computed(spark):
    import datetime as dt
    import math

    from fiveg_spark.operators import ts_diagnostics as td
    from fiveg_spark.plans.registry import run_parts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), "click", 7, 1.0, "{}") for i in range(5)
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, event_type STRING, user_id BIGINT, value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")
    out = {r["event_type"]: r.asDict() for r in run_parts(spark, td._iat_exponential_fit_parts).collect()}
    r = out["click"]
    # IATs all exactly 1 s -> mean 1, lambda 1; empirical CDF jumps 0->1
    # at grid j=5, so KS = max(|0 - (1-e^-0.8)|, |1 - (1-e^-1)|)
    assert r["n_iats"] == 4
    assert r["mean_iat_s"] == pytest.approx(1.0, abs=1e-3)
    assert r["lambda_hz"] == pytest.approx(1.0, abs=1e-3)
    assert r["ks_binned"] == pytest.approx(1.0 - math.exp(-0.8), abs=1e-3)


def test_evt_tail_fit_recovers_known_distributions(spark):
    """MoM GPD on planted tails: exponential exceedances (true xi=0)
    must fit |xi| near 0 with sigma near the scale; a bounded-uniform
    tail (true xi=-1) must fit clearly negative xi.  The p=0.001 return
    level must sit above the threshold for the heavy branch."""
    import datetime as dt

    import numpy as np

    rng = np.random.default_rng(11)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 'exp' type: body uniform[0,10] (90%), tail u + Exp(scale=2.0)
    for v in rng.uniform(0, 10, 1800):
        rows.append((eid, t0, 1, "exp", float(v), "{}")); eid += 1
    for v in 10.0 + rng.exponential(2.0, 200):
        rows.append((eid, t0, 1, "exp", float(v), "{}")); eid += 1
    # 'uni' type: all uniform[0,10] -> exceedances over p90 are
    # uniform[0, 1] -> GPD with xi = -1, sigma = b = 1
    for v in rng.uniform(0, 10, 2000):
        rows.append((eid, t0, 1, "uni", float(v), "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")
    from fiveg_spark.operators.stats_assoc import _evt_tail_sql

    got = {r["event_type"]: r.asDict() for r in spark.sql(_evt_tail_sql("spark")).collect()}
    e, u = got["exp"], got["uni"]
    assert abs(e["xi_shape"]) < 0.25          # true 0
    assert 1.2 < e["sigma_scale"] < 3.0       # true 2.0
    assert e["return_level_p001"] > e["threshold_p90"]
    assert u["xi_shape"] < -0.5               # true -1: bounded tail
    assert u["return_level_p001"] <= 11.5     # bounded near the endpoint


def _hourly_events_view(spark, per_slice_values):
    """One event per (slice-as-user? no) — build events so the hourly
    frame reduces to the given per-slice value sequences (value summed
    per hour drives throughput)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for slice_user, seq in per_slice_values.items():
        for i, v in enumerate(seq):
            rows.append(
                (eid, t0 + dt.timedelta(hours=i), slice_user, "view", float(v), "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")


def test_psi_flags_planted_level_shift(spark):
    """A series whose second half jumps to a disjoint value range must
    produce a large PSI; a flat series must produce (floor-level) ~0."""
    from fiveg_spark.operators.ts_diagnostics import _psi_parts
    from fiveg_spark.plans.registry import run_parts

    # ref half must span a real range (a constant ref era hits the
    # degenerate single-bin guard and PSI is pinned ~0 by design)
    shifted = [10.0 + i for i in range(48)] + [1000.0 + i for i in range(48)]
    flat = [10.0 + (i % 48) for i in range(96)]  # same distribution both eras
    _hourly_events_view(spark, {1: shifted, 2: flat})
    got = {r["slice"]: r.asDict() for r in run_parts(spark, _psi_parts).collect()}
    slices = sorted(got)
    drifted = [got[s] for s in slices if got[s]["drifted"]]
    stable = [got[s] for s in slices if not got[s]["drifted"]]
    assert len(drifted) == 1 and len(stable) == 1
    assert drifted[0]["psi"] > 1.0     # disjoint ranges -> huge PSI
    assert stable[0]["psi"] < 0.1


def test_conformal_intervals_cover_on_stationary_series(spark):
    """A noiseless 24-periodic series: seasonal-naive residuals are 0,
    so the q90 radius is 0 and test coverage is exactly 1.0."""
    from fiveg_spark.operators.ts_diagnostics import _conformal_sql

    periodic = [float(10 + (i % 24)) for i in range(24 * 10)]
    _hourly_events_view(spark, {1: periodic})
    rows = spark.sql(_conformal_sql("spark")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["interval_radius"] == 0.0
    assert r["test_coverage"] == 1.0
    assert r["n_val"] > 0 and r["n_test"] > 0


def test_jackknife_ratio_ci_covers_and_degenerates(spark):
    import datetime as dt

    from fiveg_spark.operators.stats_assoc import _jackknife_parts
    from fiveg_spark.plans.registry import run_parts

    # type A: 10 days with per-day means wobbling around 50 -> se > 0
    # and the CI brackets the pooled ratio; type B: single day -> no
    # replicates, se pinned 0 and flagged undefined
    rows = []
    eid = 0
    for day in range(10):
        for i in range(20):
            v = 50.0 + (day - 4.5) * 2.0 + (i % 3)
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + day), "A", i, v, "{}")
            )
            eid += 1
    for i in range(20):
        rows.append((eid, dt.datetime(2024, 1, 1), "B", i, 7.0, "{}"))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, event_type STRING, user_id BIGINT,"
        " value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")
    got = {r["event_type"]: r.asDict()
           for r in run_parts(spark, _jackknife_parts).collect()}
    a = got["A"]
    assert a["n_days"] == 10 and a["se_defined"]
    assert a["jk_se"] > 0
    assert a["ci_lo"] < a["ratio"] < a["ci_hi"]
    # day means span 41..60: the CI must sit inside that envelope
    assert 41 < a["ci_lo"] and a["ci_hi"] < 60
    b = got["B"]
    assert b["n_days"] == 1 and not b["se_defined"]
    assert b["jk_se"] == 0.0 and b["ci_lo"] == b["ratio"] == b["ci_hi"] == 7.0
