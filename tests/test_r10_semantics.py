"""Planted-fixture semantics pins for the round-10w2 operators (the
stats_tests battery): each query's load-bearing branch gets a fixture
where the right answer is known in closed form — a green oracle-parity
run on data that never exercises the branch can't hide a regression.

Slice mapping (kpi.packet_projection): user_id % 3 → 0 = eMBB,
1 = URLLC, 2 = mMTC; hourly throughput_bps = 8 · Σ value per
(slice, hour) — so one event per hour plants the hourly series
directly as 8·value.
"""

from __future__ import annotations

import math

import pytest

from fiveg_spark.plans.registry import run_parts

_EV_SCHEMA = (
    "event_id BIGINT, es BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _events_view(spark, rows):
    """rows: (event_id, epoch_s, user_id, event_type, value)"""
    spark.createDataFrame(
        [(*r, "{}") for r in rows], _EV_SCHEMA
    ).selectExpr(
        "event_id",
        "timestamp_micros(es * 1000000) AS ts",
        "user_id", "event_type", "value", "props",
    ).createOrReplaceTempView("events")


BASE_DAY = 19675  # epoch day of 2023-11-14; (day+3) % 7 = 5 -> weekday
WEEKEND_DAY = 19679  # (19679+3) % 7 = 5 -> Saturday
BASE = BASE_DAY * 86400


def test_kruskal_wallis_untied_closed_form(spark):
    from fiveg_spark.operators.stats_tests import _kruskal_wallis_parts

    # eMBB (user 0) hourly thr {80,160,240}, URLLC (user 1)
    # {320,400,480}: N=6 untied, R_eMBB={1,2,3}, R_URLLC={4,5,6}
    # H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 27/7
    rows = []
    for i, v in enumerate((10.0, 20.0, 30.0)):
        rows.append((i, BASE + 3600 * i, 0, "a", v))
    for i, v in enumerate((40.0, 50.0, 60.0)):
        rows.append((10 + i, BASE + 3600 * i, 1, "a", v))
    _events_view(spark, rows)
    got = {r["slice"]: r.asDict()
           for r in run_parts(spark, _kruskal_wallis_parts).collect()}
    h = 12.0 / 42.0 * (36.0 / 3.0 + 225.0 / 3.0) - 21.0
    assert got["eMBB"]["mean_rank"] == 2.0
    assert got["URLLC"]["mean_rank"] == 5.0
    for r in got.values():
        assert r["h_raw"] == pytest.approx(h, abs=1e-4)
        assert r["h_stat"] == pytest.approx(h, abs=1e-4)  # no ties
        assert r["dof"] == 1
        assert r["epsilon_sq"] == pytest.approx((h - 1.0) / 4.0, abs=1e-4)


def test_kruskal_wallis_all_tied_is_zero(spark):
    from fiveg_spark.operators.stats_tests import _kruskal_wallis_parts

    rows = [(i, BASE + 3600 * i, u, "a", 5.0)
            for i in range(3) for u in (0, 1)]
    rows = [(j, es, u, t, v) for j, (_, es, u, t, v) in enumerate(rows)]
    _events_view(spark, rows)
    for r in run_parts(spark, _kruskal_wallis_parts).collect():
        assert r["h_stat"] == 0.0  # tie correction fully degenerate


def test_friedman_perfect_concordance_hits_supremum(spark):
    from fiveg_spark.operators.stats_tests import _friedman_parts

    # two complete blocks, URLLC above eMBB in BOTH; a third hour with
    # only eMBB is an incomplete block and must be dropped
    _events_view(spark, [
        (0, BASE, 0, "a", 10.0), (1, BASE, 1, "a", 20.0),
        (2, BASE + 3600, 0, "a", 30.0), (3, BASE + 3600, 1, "a", 40.0),
        (4, BASE + 7200, 0, "a", 50.0),  # incomplete block
    ])
    got = {r["slice"]: r.asDict()
           for r in run_parts(spark, _friedman_parts).collect()}
    assert got["eMBB"]["n_blocks"] == 2 and got["URLLC"]["n_blocks"] == 2
    assert got["eMBB"]["mean_rank"] == 1.0
    assert got["URLLC"]["mean_rank"] == 2.0
    for r in got.values():
        # A2 = B2 with positive numerator -> chi2 = n(k-1) = 2, W = 1
        assert r["chi2_f"] == pytest.approx(2.0, abs=1e-4)
        assert r["kendall_w"] == pytest.approx(1.0, abs=1e-4)


def test_friedman_rank_flip_cancels(spark):
    from fiveg_spark.operators.stats_tests import _friedman_parts

    # block 1: eMBB < URLLC; block 2: eMBB > URLLC -> R_j equal,
    # numerator 0, chi2 = 0 through the FORMULA branch (A2 > B2)
    _events_view(spark, [
        (0, BASE, 0, "a", 10.0), (1, BASE, 1, "a", 20.0),
        (2, BASE + 3600, 0, "a", 40.0), (3, BASE + 3600, 1, "a", 30.0),
    ])
    for r in run_parts(spark, _friedman_parts).collect():
        assert r["chi2_f"] == 0.0
        assert r["kendall_w"] == 0.0


def test_levene_brown_forsythe_closed_form(spark):
    from fiveg_spark.operators.stats_tests import _levene_parts

    # eMBB thr {80,160,240}: med 160, z = {80,0,80};
    # URLLC constant 320: z = {0,0,0}
    # between = 3·(80/3 − 160/6)² ·2 groups = 4266.67 = within -> F = 4
    rows = []
    for i, v in enumerate((10.0, 20.0, 30.0)):
        rows.append((i, BASE + 3600 * i, 0, "a", v))
    for i in range(3):
        rows.append((10 + i, BASE + 3600 * i, 1, "a", 40.0))
    _events_view(spark, rows)
    got = {r["slice"]: r.asDict()
           for r in run_parts(spark, _levene_parts).collect()}
    assert got["eMBB"]["median_v"] == 160.0
    assert got["eMBB"]["mean_absdev"] == pytest.approx(160.0 / 3.0, abs=1e-4)
    assert got["URLLC"]["mean_absdev"] == 0.0
    for r in got.values():
        assert r["f_stat"] == pytest.approx(4.0, abs=1e-4)
        assert r["df_between"] == 1 and r["df_within"] == 4


def test_chisq_hour_uniformity_extremes(spark):
    from fiveg_spark.operators.stats_tests import _chisq_hour_uniformity_sql

    # type "flat": one event per hour for 24 hours -> chi2 exactly 0;
    # type "spike": 10 events in one hour -> chi2 = 24·100/10 − 10
    rows = [(i, BASE + 3600 * i, 0, "flat", 1.0) for i in range(24)]
    rows += [(100 + j, BASE + j, 0, "spike", 1.0) for j in range(10)]
    _events_view(spark, rows)
    got = {r["event_type"]: r.asDict()
           for r in spark.sql(_chisq_hour_uniformity_sql("spark")).collect()}
    flat = got["flat"]
    assert flat["chi2"] == 0.0 and flat["cramers_v"] == 0.0
    assert flat["hours_hit"] == 24 and not flat["nonuniform"]
    spike = got["spike"]
    assert spike["chi2"] == pytest.approx(230.0, abs=1e-4)
    assert spike["peak_hour_share"] == 1.0 and spike["nonuniform"]
    assert spike["cramers_v"] == pytest.approx(
        math.sqrt(230.0 / (10 * 23.0)), abs=1e-4)


def test_effect_size_ladder_closed_form(spark):
    from fiveg_spark.operators.stats_tests import _effect_size_ladder_sql

    # weekday {10,10,20,20} vs weekend {30,30,40,40}: equal variances
    # 100/3, shift 20 -> d = Δ = 20/sqrt(100/3), g = d·(1 − 3/23),
    # log variance ratio = ln(1) = 0
    rows = []
    for i, v in enumerate((10.0, 10.0, 20.0, 20.0)):
        rows.append((i, BASE + 60 * i, 0, "a", v))
    for i, v in enumerate((30.0, 30.0, 40.0, 40.0)):
        rows.append((10 + i, WEEKEND_DAY * 86400 + 60 * i, 0, "a", v))
    _events_view(spark, rows)
    r = spark.sql(_effect_size_ladder_sql("spark")).collect()[0].asDict()
    d = 20.0 / math.sqrt(100.0 / 3.0)
    assert r["n_weekday"] == 4 and r["n_weekend"] == 4
    assert r["mean_shift"] == pytest.approx(20.0, abs=1e-4)
    assert r["cohens_d"] == pytest.approx(d, abs=1e-4)
    assert r["hedges_g"] == pytest.approx(d * (1.0 - 3.0 / 23.0), abs=1e-4)
    assert r["glass_delta"] == pytest.approx(d, abs=1e-4)
    assert r["log_var_ratio"] == 0.0


def test_effect_size_single_era_guards(spark):
    from fiveg_spark.operators.stats_tests import _effect_size_ladder_sql

    _events_view(spark, [(0, BASE, 0, "a", 5.0), (1, BASE + 60, 0, "a", 7.0)])
    r = spark.sql(_effect_size_ladder_sql("spark")).collect()[0].asDict()
    assert r["n_weekend"] == 0
    for col in ("mean_shift", "cohens_d", "hedges_g", "glass_delta",
                "log_var_ratio"):
        assert r[col] == 0.0


def test_weibull_fit_matches_independent_numpy(spark):
    import numpy as np

    from fiveg_spark.operators.stats_tests import (
        WEIBULL_LADDER,
        _weibull_iat_parts,
    )

    # one user, IATs 60..1200 s: mirror the ladder fit independently
    iats = [60.0 * (i + 1) for i in range(20)]
    es, rows, t = BASE, [], 0.0
    rows.append((0, BASE, 0, "a", 1.0))
    for i, g in enumerate(iats):
        t += g
        rows.append((i + 1, int(BASE + t), 0, "a", 1.0))
    _events_view(spark, rows)
    r = run_parts(spark, _weibull_iat_parts).collect()[0].asDict()

    q = [round(float(np.percentile(iats, p * 100)), 4) for p in WEIBULL_LADDER]
    x = np.log(q)
    y = np.array([math.log(-math.log(1.0 - p)) for p in WEIBULL_LADDER])
    k = float(np.polyfit(x, y, 1)[0])
    lam = math.exp(float(x.mean()) - float(y.mean()) / k)
    assert r["n_iat"] == 20
    assert r["k_shape"] == pytest.approx(k, abs=1e-3)
    assert r["lambda_scale"] == pytest.approx(lam, rel=1e-3)
    assert r["fitted_median_iat"] == pytest.approx(
        lam * math.log(2.0) ** (1.0 / k), rel=1e-3)


def test_weibull_all_tied_iats_guard(spark):
    from fiveg_spark.operators.stats_tests import _weibull_iat_parts

    # simultaneous events -> every IAT 0 -> every rung filtered -> all
    # fit outputs at the guard value
    _events_view(spark, [(i, BASE, 0, "a", 1.0) for i in range(5)])
    r = run_parts(spark, _weibull_iat_parts).collect()[0].asDict()
    assert r["n_ladder_points"] == 0
    assert r["k_shape"] == 0.0 and r["lambda_scale"] == 0.0


def test_gumbel_maxima_closed_form(spark):
    from fiveg_spark.operators.stats_tests import (
        EULER_MASCHERONI,
        _gumbel_maxima_sql,
    )

    # one event per day -> daily maxima {80,160,240}: m=160, s=80
    _events_view(spark, [
        (i, BASE + 86400 * i, 0, "a", v)
        for i, v in enumerate((10.0, 20.0, 30.0))
    ])
    r = spark.sql(_gumbel_maxima_sql("spark")).collect()[0].asDict()
    beta = 80.0 * math.sqrt(6.0) / math.pi
    mu = 160.0 - EULER_MASCHERONI * beta
    c30 = -math.log(-math.log(1.0 - 1.0 / 30.0))
    c365 = -math.log(-math.log(1.0 - 1.0 / 365.0))
    assert r["n_days"] == 3
    assert r["mean_daily_max"] == 160.0
    assert r["gumbel_beta"] == pytest.approx(beta, abs=1e-3)
    assert r["gumbel_mu"] == pytest.approx(mu, abs=1e-3)
    assert r["return_level_30d"] == pytest.approx(mu + beta * c30, abs=1e-3)
    assert r["return_level_365d"] == pytest.approx(mu + beta * c365, abs=1e-3)


def test_gumbel_single_day_collapses_to_mean(spark):
    from fiveg_spark.operators.stats_tests import _gumbel_maxima_sql

    _events_view(spark, [(0, BASE, 0, "a", 10.0)])
    r = spark.sql(_gumbel_maxima_sql("spark")).collect()[0].asDict()
    assert r["gumbel_beta"] == 0.0
    assert r["gumbel_mu"] == 80.0
    assert r["return_level_30d"] == 80.0 and r["return_level_365d"] == 80.0


# ---- star-schema supply/retail wave (C161-C165) ----


def _ts(day: int) -> str:
    return f"CAST(timestamp_micros({day} * 86400 * 1000000) AS TIMESTAMP)"


def test_net_revenue_retention_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import _nrr_parts

    # 1995: c1=100, c2=200 (total 300); 1996: c1=150 (retained),
    # c3=50 (new) -> NRR = 150/300, new share = 1 - 150/200
    spark.createDataFrame(
        [(1, 1, 100.0, "1995-03-01"), (2, 2, 200.0, "1995-07-01"),
         (3, 1, 150.0, "1996-02-01"), (4, 3, 50.0, "1996-08-01")],
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, d STRING",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice",
        "CAST(d AS TIMESTAMP) AS o_orderdate",
    ).createOrReplaceTempView("orders")
    got = {r["order_year"]: r.asDict()
           for r in run_parts(spark, _nrr_parts).collect()}
    assert got[1995]["net_revenue_retention"] == 0.0  # no prior year
    y96 = got[1996]
    assert y96["n_customers"] == 2 and y96["n_retained"] == 1
    assert y96["retained_rev"] == 150.0
    assert y96["net_revenue_retention"] == pytest.approx(0.5, abs=1e-4)
    assert y96["new_revenue_share"] == pytest.approx(0.25, abs=1e-4)
    assert y96["retained_customer_share"] == pytest.approx(0.5, abs=1e-4)


def test_safety_stock_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import (
        SS_Z_LADDER,
        _safety_stock_sql,
    )

    # weeks 2810/2811 shipped qty {70, 140}; leads {10, 20} days
    spark.createDataFrame(
        [(1, 1, 1, 70.0, 19670), (1, 2, 1, 140.0, 19677)],
        "l_orderkey BIGINT, k BIGINT, l_partkey BIGINT, l_quantity DOUBLE, "
        "sd BIGINT",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_quantity",
        "CAST(timestamp_micros(sd * 86400 * 1000000) AS TIMESTAMP) "
        "AS l_shipdate",
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, 19660)], "o_orderkey BIGINT, od BIGINT"
    ).selectExpr(
        "o_orderkey",
        "CAST(timestamp_micros(od * 86400 * 1000000) AS TIMESTAMP) "
        "AS o_orderdate",
    ).createOrReplaceTempView("orders")
    # both lines belong to order 1 -> leads 10 and 17 days
    spark.createDataFrame(
        [(1, "B1")], "p_partkey BIGINT, p_brand STRING"
    ).createOrReplaceTempView("part")
    r = spark.sql(_safety_stock_sql("spark")).collect()[0].asDict()
    d_bar, var_d = 105.0 / 7.0, 2450.0 / 7.0
    leads = [19670 - 19660, 19677 - 19660]
    l_bar = sum(leads) / 2.0
    var_l = sum((x - l_bar) ** 2 for x in leads)  # n-1 = 1
    term = math.sqrt(l_bar * var_d + d_bar * d_bar * var_l)
    assert r["brand"] == "B1" and r["n_weeks"] == 2 and r["n_lines"] == 2
    assert r["mean_daily_qty"] == pytest.approx(d_bar, abs=1e-4)
    assert r["mean_lead_days"] == pytest.approx(l_bar, abs=1e-4)
    for lvl, z in SS_Z_LADDER:
        assert r[f"safety_stock_z{lvl}"] == pytest.approx(
            z * term, abs=1e-3)
    z95 = SS_Z_LADDER[1][1]
    assert r["reorder_point_z95"] == pytest.approx(
        d_bar * l_bar + z95 * term, abs=1e-3)


def test_bullwhip_ratio_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import _bullwhip_sql

    # order cells {15, 45} (cv2 .5) vs ship cells {25, 35} (cv2 50/900)
    m0, m1 = 19650, 19680  # epoch days on exact 30-day boundaries
    lines = [
        (1, 1, 10.0, m0), (2, 1, 30.0, m1), (3, 1, 5.0, m1), (4, 1, 15.0, m0),
    ]
    # orders: 1,4 placed in m0's month; 2,3 in m1's -> order qty
    # {o-m0: 10+15=25?}: see order table below; ship months from sd
    spark.createDataFrame(
        lines,
        "l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE, sd BIGINT",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_quantity",
        "CAST(timestamp_micros(sd * 86400 * 1000000) AS TIMESTAMP) "
        "AS l_shipdate",
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, m0), (2, m1), (3, m0), (4, m1)],
        "o_orderkey BIGINT, od BIGINT",
    ).selectExpr(
        "o_orderkey",
        "CAST(timestamp_micros(od * 86400 * 1000000) AS TIMESTAMP) "
        "AS o_orderdate",
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [(1, "B1")], "p_partkey BIGINT, p_brand STRING"
    ).createOrReplaceTempView("part")
    r = spark.sql(_bullwhip_sql("spark")).collect()[0].asDict()
    # order cells: m0 gets lines 1+3 = 15, m1 gets 2+4 = 45
    # ship cells:  m0 gets lines 1+4 = 25, m1 gets 2+3 = 35
    cv2_o = ((15 - 30) ** 2 + (45 - 30) ** 2) / 1.0 / 900.0
    cv2_s = ((25 - 30) ** 2 + (35 - 30) ** 2) / 1.0 / 900.0
    assert r["n_order_months"] == 2 and r["n_ship_months"] == 2
    assert r["cv2_orders"] == pytest.approx(cv2_o, abs=1e-4)
    assert r["cv2_shipments"] == pytest.approx(cv2_s, abs=1e-4)
    assert r["bullwhip_ratio"] == pytest.approx(
        round(cv2_o + 1e-9, 4) / round(cv2_s + 1e-9, 4), abs=1e-3)


def test_price_dispersion_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import _price_dispersion_sql

    # part 1: suppliers at unit prices 10 and 20 -> cv = sqrt(50)/15;
    # part 2: single supplier -> dropped by the n_supp >= 2 floor
    spark.createDataFrame(
        [(1, 1, 2.0, 20.0), (1, 2, 1.0, 20.0), (2, 1, 1.0, 5.0)],
        "l_partkey BIGINT, l_suppkey BIGINT, l_quantity DOUBLE, "
        "l_extendedprice DOUBLE",
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, "T1"), (2, "T1")], "p_partkey BIGINT, p_type STRING"
    ).createOrReplaceTempView("part")
    r = spark.sql(_price_dispersion_sql("spark")).collect()[0].asDict()
    cv = math.sqrt(50.0) / 15.0
    assert r["part_type"] == "T1"
    assert r["n_multi_supplier_parts"] == 1
    assert r["avg_price_cv"] == pytest.approx(cv, abs=1e-3)
    assert r["dispersed_share"] == 1.0


def test_nation_kendall_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import _nation_kendall_sql

    # nations (n_cust, rev): (1,100), (2,200), (3,150) ->
    # 2 concordant, 1 discordant, tau-b = 1/3
    custs = [(1, 0), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2)]
    spark.createDataFrame(
        custs, "c_custkey BIGINT, c_nationkey INT"
    ).createOrReplaceTempView("customer")
    spark.createDataFrame(
        [(1, 1, 100.0), (2, 2, 120.0), (3, 3, 80.0),
         (4, 4, 50.0), (5, 5, 100.0)],
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE",
    ).createOrReplaceTempView("orders")
    r = spark.sql(_nation_kendall_sql("spark")).collect()[0].asDict()
    assert r["n_pairs"] == 3
    assert r["concordant"] == 2 and r["discordant"] == 1
    assert r["tied_on_customers"] == 0 and r["tied_on_revenue"] == 0
    assert r["kendall_tau_b"] == pytest.approx(1.0 / 3.0, abs=1e-4)


# ---- embedding geometry (E123-E125) ----


def _emb_view(spark, vecs, labels=None):
    labels = labels or [0] * len(vecs)
    import pandas as pd

    emb = pd.DataFrame({
        "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
        "embedding": [[float(x) for x in v] for v in vecs],
        "label": pd.Series(labels, dtype="int32"),
    })
    spark.createDataFrame(
        emb, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).createOrReplaceTempView("embeddings")


def test_twonn_line_closed_form(spark):
    from fiveg_spark.operators.embedding_geometry import _twonn_parts

    # colinear points at 0,1,2,4: mu = {2, 1, 2, 1.5} by hand
    _emb_view(spark, [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [4.0, 0.0]])
    r = run_parts(spark, _twonn_parts).collect()[0].asDict()
    sum_ln = math.log(2.0) + 0.0 + math.log(2.0) + math.log(1.5)
    assert r["n_points"] == 4 and r["n_degenerate"] == 0
    assert r["mean_mu"] == pytest.approx((2 + 1 + 2 + 1.5) / 4, abs=1e-4)
    assert r["intrinsic_dim_mle"] == pytest.approx(4.0 / sum_ln, abs=1e-3)


def test_twonn_all_duplicates_degenerate(spark):
    from fiveg_spark.operators.embedding_geometry import _twonn_parts

    _emb_view(spark, [[1.0, 1.0]] * 3)
    r = run_parts(spark, _twonn_parts).collect()[0].asDict()
    assert r["n_points"] == 3 and r["n_degenerate"] == 3
    assert r["intrinsic_dim_mle"] == 0.0


def test_hubness_matches_independent_numpy(spark):
    import numpy as np

    from fiveg_spark.operators.embedding_geometry import (
        HUB_K,
        _hubness_parts,
    )

    # deterministic curve: vector i = (i^2/10, i, 1) — uneven spacing
    # makes genuine hubs; mirror the rounded-distance ranking exactly
    vecs = [[i * i / 10.0, float(i), 1.0] for i in range(9)]
    _emb_view(spark, vecs)
    r = run_parts(spark, _hubness_parts).collect()[0].asDict()

    # float32 storage: mirror through np.float32 before the arithmetic
    V = np.array(vecs, dtype=np.float32).astype(np.float64)
    n = len(V)
    nk = np.zeros(n)
    for a in range(n):
        cand = []
        for b in range(n):
            if b == a:
                continue
            d2 = round(float(V[a] @ V[a] + V[b] @ V[b] - 2 * V[a] @ V[b])
                       + 1e-9, 4)
            cand.append((d2, b))
        cand.sort()
        for _d, b in cand[:HUB_K]:
            nk[b] += 1
    m1 = nk.mean()
    var = (nk * nk).mean() - m1 * m1
    mu3 = ((nk - m1) ** 3).mean()
    # query computes mu3 via raw power sums; equivalent algebra
    skew = mu3 / var ** 1.5 if var > 1e-12 else 0.0
    assert r["n_points"] == n
    assert r["mean_k_occurrence"] == pytest.approx(m1, abs=1e-4)
    assert r["hubness_skew"] == pytest.approx(skew, abs=1e-3)
    assert r["max_k_occurrence"] == nk.max()
    assert r["antihub_share"] == pytest.approx((nk == 0).mean(), abs=1e-4)


def test_jl_one_hot_ratio_is_exactly_one(spark):
    from fiveg_spark.operators.embedding_geometry import (
        EMB_DIM,
        _jl_norm_sql,
    )

    # one-hot vectors: ‖Pv‖² = Σ_j s_ji²·c² = k·c² -> ratio exactly 1;
    # the zero vector hits the vsq guard and is counted separately
    one_hot_a = [0.0] * EMB_DIM
    one_hot_a[0] = 3.0
    one_hot_b = [0.0] * EMB_DIM
    one_hot_b[17] = -2.0
    zero = [0.0] * EMB_DIM
    _emb_view(spark, [one_hot_a, one_hot_b, zero], labels=[0, 0, 0])
    r = spark.sql(_jl_norm_sql("spark")).collect()[0].asDict()
    assert r["n_vectors"] == 3 and r["n_zero_vectors"] == 1
    assert r["mean_ratio"] == 1.0
    assert r["min_ratio"] == 1.0 and r["max_ratio"] == 1.0
    assert r["max_abs_log_distortion"] == 0.0
    assert r["within_30pct_share"] == 1.0


# ---- timeseries / behavior wave (C166, C167, D80) ----


def test_linear_interp_closed_form(spark):
    from fiveg_spark.operators.timeseries import _linear_interp_sql

    # eMBB observed at h0 (thr 80) and h3 (thr 320): the two gap
    # hours interpolate to 160 and 240 on the time axis
    _events_view(spark, [
        (0, BASE, 0, "a", 10.0),
        (1, BASE + 3 * 3600, 0, "a", 40.0),
    ])
    rows = spark.sql(_linear_interp_sql("spark")).collect()
    got = [(r["fill_mode"], r["filled_value"]) for r in rows]
    assert got == [
        ("obs", 80.0), ("interp", 160.0), ("interp", 240.0), ("obs", 320.0),
    ]


def test_dormancy_closed_form(spark):
    from fiveg_spark.operators.behavior import _dormancy_parts

    # user 1: 10-day gap (one spell) then 2-day gap; user 2: 1-day gap
    day = 86400
    _events_view(spark, [
        (0, BASE, 1, "a", 1.0),
        (1, BASE + 10 * day, 1, "a", 1.0),
        (2, BASE + 12 * day, 1, "a", 1.0),
        (3, BASE, 2, "a", 1.0),
        (4, BASE + day, 2, "a", 1.0),
    ])
    r = run_parts(spark, _dormancy_parts).collect()[0].asDict()
    assert r["n_users"] == 2 and r["n_users_with_spell"] == 1
    assert r["n_spells"] == 1
    assert r["mean_spell_days"] == 10.0 and r["max_spell_days"] == 10.0
    assert r["resurrection_user_share"] == 0.5


def test_dormancy_no_spells_guards(spark):
    from fiveg_spark.operators.behavior import _dormancy_parts

    _events_view(spark, [(0, BASE, 1, "a", 1.0), (1, BASE + 60, 1, "a", 1.0)])
    r = run_parts(spark, _dormancy_parts).collect()[0].asDict()
    assert r["n_users"] == 1 and r["n_spells"] == 0
    assert r["mean_spell_days"] == 0.0
    assert r["resurrection_user_share"] == 0.0


def test_partial_corr_closed_form(spark):
    from fiveg_spark.operators.ts_advanced import _partial_corr_parts

    # four complete hours: eMBB [1,2,3,4], URLLC 2x eMBB (r_eu = 1),
    # mMTC [1,3,2,4] (r = 0.8 against both) -> partial eu controlling
    # mMTC = (1 - .64)/.36 = 1.0; the other two pairs hit the
    # collinear-control guard (1 - r² = 0 on one factor)
    rows = []
    for i, (e, u, m) in enumerate(
        [(1.0, 2.0, 1.0), (2.0, 4.0, 3.0), (3.0, 6.0, 2.0),
         (4.0, 8.0, 4.0)]
    ):
        rows.append((10 * i, BASE + 3600 * i, 0, "a", e))
        rows.append((10 * i + 1, BASE + 3600 * i, 1, "a", u))
        rows.append((10 * i + 2, BASE + 3600 * i, 2, "a", m))
    _events_view(spark, rows)
    got = {r["slice_pair"]: r.asDict()
           for r in run_parts(spark, _partial_corr_parts).collect()}
    eu = got["eMBB~URLLC"]
    assert eu["n_hours"] == 4
    assert eu["r_raw"] == 1.0
    assert eu["r_partial"] == pytest.approx(1.0, abs=1e-4)
    assert eu["controlling"] == "mMTC"
    em = got["eMBB~mMTC"]
    assert em["r_raw"] == pytest.approx(0.8, abs=1e-4)
    assert em["r_partial"] == 0.0  # r_eu = 1 -> zero denominator guard
    um = got["URLLC~mMTC"]
    assert um["r_raw"] == pytest.approx(0.8, abs=1e-4)
    assert um["r_partial"] == 0.0


# ---- batch 4: hazard, session depth, price index, mix shift, confusion ----


def test_return_hazard_closed_form(spark):
    from fiveg_spark.operators.behavior import _return_hazard_parts

    # one user, gaps 0.5 d and 2.5 d: h(1) = 1/2, h(2) = 0/1, h(3) = 1/1
    day = 86400
    _events_view(spark, [
        (0, BASE, 1, "a", 1.0),
        (1, BASE + day // 2, 1, "a", 1.0),
        (2, BASE + 3 * day, 1, "a", 1.0),
    ])
    got = {r["day_k"]: r.asDict()
           for r in run_parts(spark, _return_hazard_parts).collect()}
    assert got[1]["n_at_risk"] == 2 and got[1]["hazard"] == 0.5
    assert got[2]["n_at_risk"] == 1 and got[2]["hazard"] == 0.0
    assert got[3]["n_at_risk"] == 1 and got[3]["hazard"] == 1.0
    for k in (4, 5, 6, 7):
        assert got[k]["n_at_risk"] == 0 and got[k]["hazard"] == 0.0
    assert got[1]["survival_share"] == 1.0
    assert got[3]["survival_share"] == 0.5


def test_session_depth_closed_form(spark):
    from fiveg_spark.operators.behavior import _session_depth_sql

    # session 1: depths 1,2,3 (values 10,20,30); session 2 (2 h later,
    # past the 30-min gap): depth 1 (value 99)
    _events_view(spark, [
        (0, BASE, 1, "a", 10.0),
        (1, BASE + 60, 1, "a", 20.0),
        (2, BASE + 120, 1, "a", 30.0),
        (3, BASE + 7200 + 120, 1, "a", 99.0),
    ])
    got = {r["depth"]: r.asDict()
           for r in spark.sql(_session_depth_sql("spark")).collect()}
    assert got[1]["n_events"] == 2
    assert got[1]["mean_value"] == pytest.approx(54.5, abs=1e-4)
    assert got[2]["n_events"] == 1 and got[2]["mean_value"] == 20.0
    assert got[3]["n_events"] == 1 and got[3]["mean_value"] == 30.0


def test_price_index_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import _price_index_parts

    m0, m1 = 19650, 19680  # exact 30-day boundaries
    spark.createDataFrame(
        [(1, 5.0, 50.0, m0), (1, 2.0, 40.0, m1), (2, 3.0, 60.0, m1)],
        "l_partkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "sd BIGINT",
    ).selectExpr(
        "l_partkey", "l_quantity", "l_extendedprice",
        "CAST(timestamp_micros(sd * 86400 * 1000000) AS TIMESTAMP) "
        "AS l_shipdate",
    ).createOrReplaceTempView("lineitem")
    got = {r["ship_month"]: r.asDict()
           for r in run_parts(spark, _price_index_parts).collect()}
    base = got[m0 // 30]
    assert base["laspeyres_index"] == 1.0 and base["paasche_index"] == 1.0
    cur = got[m1 // 30]
    # part 1: price 10 -> 20 with base qty 5, current qty 2; part 2
    # has no base month -> dropped, coverage = 40/100
    assert cur["n_matched_parts"] == 1
    assert cur["laspeyres_index"] == 2.0
    assert cur["paasche_index"] == 2.0
    assert cur["fisher_index"] == pytest.approx(2.0, abs=1e-4)
    assert cur["basket_coverage"] == pytest.approx(0.4, abs=1e-4)


def test_value_mix_shift_identical_years_is_zero(spark):
    from fiveg_spark.operators.supply_fulfillment import (
        _value_mix_shift_parts,
    )

    rows = []
    for y, d0 in ((1995, "1995-03-01"), (1996, "1996-03-01")):
        for i, v in enumerate((10.0, 20.0, 30.0, 40.0)):
            rows.append((y * 10 + i, v, d0))
    spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_totalprice DOUBLE, d STRING"
    ).selectExpr(
        "o_orderkey", "o_totalprice", "CAST(d AS TIMESTAMP) AS o_orderdate"
    ).createOrReplaceTempView("orders")
    got = {r["order_year"]: r.asDict()
           for r in run_parts(spark, _value_mix_shift_parts).collect()}
    assert got[1995]["js_divergence_vs_prior"] == 0.0  # first year
    assert got[1996]["js_divergence_vs_prior"] == 0.0  # identical mix


def test_value_mix_shift_flags_real_shift(spark):
    from fiveg_spark.operators.supply_fulfillment import (
        _value_mix_shift_parts,
    )

    rows = [(i, 10.0, "1995-03-01") for i in range(4)]
    rows += [(100 + i, 40.0, "1996-03-01") for i in range(4)]
    spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_totalprice DOUBLE, d STRING"
    ).selectExpr(
        "o_orderkey", "o_totalprice", "CAST(d AS TIMESTAMP) AS o_orderdate"
    ).createOrReplaceTempView("orders")
    got = {r["order_year"]: r.asDict()
           for r in run_parts(spark, _value_mix_shift_parts).collect()}
    assert got[1996]["js_divergence_vs_prior"] > 0.9  # near-total shift


def test_knn_confusion_two_clusters(spark):
    from fiveg_spark.operators.embedding_geometry import _knn_confusion_parts

    # two 2-point clusters far apart; k=5 >= n-1 so every point votes
    # for all others: label-0 anchors cast 2 within + 4 across votes
    _emb_view(
        spark,
        [[0.0, 0.0], [1.0, 0.0], [10.0, 0.0], [11.0, 0.0]],
        labels=[0, 0, 1, 1],
    )
    got = {(r["anchor_label"], r["neighbor_label"]): r.asDict()
           for r in run_parts(spark, _knn_confusion_parts).collect()}
    assert got[(0, 0)]["n_votes"] == 2 and got[(0, 1)]["n_votes"] == 4
    assert got[(0, 0)]["neighbor_share"] == pytest.approx(1 / 3, abs=1e-4)
    assert got[(0, 0)]["is_diagonal"] and not got[(0, 1)]["is_diagonal"]
    # lift: share / base rate = (1/3) / (6/12)
    assert got[(0, 0)]["lift_vs_base_rate"] == pytest.approx(2 / 3, abs=1e-4)
    assert got[(0, 1)]["lift_vs_base_rate"] == pytest.approx(4 / 3, abs=1e-4)


# ---- batch 5: cointegration, position bias, basket tradeoff ----


def test_cointegration_perfect_pair_mean_reverts(spark):
    from fiveg_spark.operators.ts_advanced import _cointegration_parts

    # URLLC = 2x eMBB + alternating ±8 noise, mMTC constant-ish:
    # the eMBB~URLLC residual alternates sign -> gamma ~ -2 bound...
    # alternation gives e_t = -e_{t-1}: gamma = sxy/sxx = -2
    rows, eid = [], 0
    for i in range(8):
        e = 10.0 * (i + 1)
        noise = 1.0 if i % 2 == 0 else -1.0
        rows.append((eid, BASE + 3600 * i, 0, "a", e)); eid += 1
        rows.append((eid, BASE + 3600 * i, 1, "a", 2.0 * e + noise)); eid += 1
        rows.append((eid, BASE + 3600 * i, 2, "a", 5.0)); eid += 1
    _events_view(spark, rows)
    got = {r["slice_pair"]: r.asDict()
           for r in run_parts(spark, _cointegration_parts).collect()}
    eu = got["eMBB~URLLC"]
    assert eu["n_hours"] == 8
    # both series are in throughput units (8x value), so beta ~ 2; the
    # alternating noise tilts the finite-sample fit slightly
    assert eu["hedge_beta"] == pytest.approx(2.0, abs=0.05)
    # alternating residual: e_t ~ -e_{t-1} -> gamma near the -2 bound
    assert eu["adf_gamma"] < -1.5
    assert eu["mean_reverting"] is True


def test_cointegration_constant_residual_guard(spark):
    from fiveg_spark.operators.ts_advanced import _cointegration_parts

    # URLLC exactly 2x eMBB: residuals all 0 -> sxx guard -> gamma 0
    rows, eid = [], 0
    for i in range(5):
        e = 10.0 * (i + 1)
        rows.append((eid, BASE + 3600 * i, 0, "a", e)); eid += 1
        rows.append((eid, BASE + 3600 * i, 1, "a", 2.0 * e)); eid += 1
        rows.append((eid, BASE + 3600 * i, 2, "a", 3.0 * e)); eid += 1
    _events_view(spark, rows)
    got = {r["slice_pair"]: r.asDict()
           for r in run_parts(spark, _cointegration_parts).collect()}
    eu = got["eMBB~URLLC"]
    assert eu["adf_gamma"] == 0.0 and eu["mean_reverting"] is False
    assert eu["half_life_hours"] == 0.0


def test_ngram_position_bias_planted_header(spark):
    from fiveg_spark.operators.text_stats import _ngram_position_parts

    # 12-token docs sharing a 3-token header: the repeated shingle
    # "h1 h2 h3" sits at position 0 of 10 shingles (head = pos < 2)
    body_a = " ".join(f"a{i}" for i in range(9))
    body_b = " ".join(f"b{i}" for i in range(9))
    spark.createDataFrame(
        [(0, f"h1 h2 h3 {body_a}", "en", "s1", 1),
         (1, f"h1 h2 h3 {body_b}", "en", "s1", 1)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    r = run_parts(spark, _ngram_position_parts).collect()[0].asDict()
    # shingles per doc: 10; repeated across docs: "h1 h2 h3" + the two
    # straddling shingles differ (h2 h3 a0 vs h2 h3 b0) -> only 1 each
    assert r["n_shingle_occurrences"] == 20
    assert r["repeated_share"] == pytest.approx(2 / 20, abs=1e-4)
    assert r["repeated_head_share"] == 1.0  # pos 0 < 0.2*10
    assert r["head_lift"] == pytest.approx(1.0 / r["head_baseline_share"],
                                           abs=1e-3)


def test_basket_tradeoff_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import _basket_tradeoff_sql

    # order 1: one line at unit 10; order 2: two lines at units 2, 4
    spark.createDataFrame(
        [(1, 2.0, 20.0), (2, 1.0, 2.0), (2, 3.0, 12.0)],
        "l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE",
    ).createOrReplaceTempView("lineitem")
    got = {r["n_lines_bucket"]: r.asDict()
           for r in spark.sql(_basket_tradeoff_sql("spark")).collect()}
    assert got[1]["n_orders"] == 1 and got[1]["mean_unit_price"] == 10.0
    assert got[2]["n_orders"] == 1 and got[2]["mean_unit_price"] == 3.0
    # two points, larger basket cheaper -> corr exactly -1
    assert got[1]["size_price_corr"] == pytest.approx(-1.0, abs=1e-4)


# ---- batch 6: bootstrap, variance decomposition, turnover, curve ----


def test_poisson_bootstrap_calibrates_and_is_deterministic(spark):
    from fiveg_spark.operators.stats_tests import _poisson_bootstrap_parts

    # 60 events with sd 10: analytic SE = 10/sqrt(60); the md5-driven
    # bootstrap SE must land in a sane band of it AND reproduce
    # exactly across runs (no RNG anywhere)
    import itertools
    vals = list(itertools.islice(itertools.cycle([10.0, 20.0, 30.0]), 60))
    _events_view(spark, [
        (i, BASE + 60 * i, 0, "a", v) for i, v in enumerate(vals)
    ])
    r1 = run_parts(spark, _poisson_bootstrap_parts).collect()[0].asDict()
    r2 = run_parts(spark, _poisson_bootstrap_parts).collect()[0].asDict()
    assert r1 == r2  # deterministic resampling
    assert r1["n_events"] == 60 and r1["n_replicates"] == 20
    assert r1["mean_value"] == pytest.approx(20.0, abs=1e-4)
    assert 0.4 < r1["se_calibration_ratio"] < 2.5  # B=20 is noisy but sane
    assert r1["ci95_lo"] < 20.0 < r1["ci95_hi"]


def test_poisson_bootstrap_constant_values(spark):
    from fiveg_spark.operators.stats_tests import _poisson_bootstrap_parts

    _events_view(spark, [(i, BASE + 60 * i, 0, "a", 7.0) for i in range(10)])
    r = run_parts(spark, _poisson_bootstrap_parts).collect()[0].asDict()
    # every replicate mean is exactly 7 -> both SEs 0, ratio guard 0
    assert r["se_analytic"] == 0.0 and r["se_bootstrap"] == 0.0
    assert r["se_calibration_ratio"] == 0.0
    assert r["ci95_lo"] == 7.0 and r["ci95_hi"] == 7.0


def test_leadtime_vardecomp_pure_priority_effect(spark):
    from fiveg_spark.operators.supply_fulfillment import (
        _leadtime_vardecomp_parts,
    )

    # two priorities with different lead means, identical within: ALL
    # variance between priorities, zero brand/residual shares
    spark.createDataFrame(
        [(1, 1, 19660), (1, 2, 19660), (2, 1, 19680), (2, 2, 19680)],
        "l_orderkey BIGINT, l_partkey BIGINT, sd BIGINT",
    ).selectExpr(
        "l_orderkey", "l_partkey",
        "CAST(timestamp_micros(sd * 86400 * 1000000) AS TIMESTAMP) "
        "AS l_shipdate",
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, "1-URGENT", 19650), (2, "3-MEDIUM", 19650)],
        "o_orderkey BIGINT, o_orderpriority STRING, od BIGINT",
    ).selectExpr(
        "o_orderkey", "o_orderpriority",
        "CAST(timestamp_micros(od * 86400 * 1000000) AS TIMESTAMP) "
        "AS o_orderdate",
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [(1, "B1"), (2, "B2")], "p_partkey BIGINT, p_brand STRING"
    ).createOrReplaceTempView("part")
    got = {r["priority"]: r.asDict()
           for r in run_parts(spark, _leadtime_vardecomp_parts).collect()}
    u = got["1-URGENT"]
    assert u["mean_lead_days"] == 10.0
    assert got["3-MEDIUM"]["mean_lead_days"] == 30.0
    assert u["priority_var_share"] == pytest.approx(1.0, abs=1e-4)
    assert u["brand_within_var_share"] == 0.0
    assert u["residual_var_share"] == 0.0


def test_top_customer_turnover_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import (
        _top_customer_turnover_parts,
    )

    # K=50 > customers, so tops = everyone: 1995 {1,2,3}, 1996 {2,3,4}
    rows = [(i, c, 100.0 * c, "1995-06-01") for i, c in enumerate((1, 2, 3))]
    rows += [(10 + i, c, 50.0 * c, "1996-06-01")
             for i, c in enumerate((2, 3, 4))]
    spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
        "d STRING",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice",
        "CAST(d AS TIMESTAMP) AS o_orderdate",
    ).createOrReplaceTempView("orders")
    r = run_parts(spark, _top_customer_turnover_parts).collect()[0].asDict()
    assert (r["year_from"], r["year_to"]) == (1995, 1996)
    assert r["n_retained"] == 2
    assert r["top_set_jaccard"] == pytest.approx(2 / 4, abs=1e-4)
    assert r["new_entrant_share"] == pytest.approx(1 / 3, abs=1e-4)


def test_cosine_curve_nested_rungs(spark):
    from fiveg_spark.operators.embedding_geometry import (
        _cosine_curve_parts,
    )

    # orthogonal pair + identical pair: cos {0, 1} -> every rung
    # captures exactly the identical pair; removable = 1 doc
    _emb_view(spark, [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    rows = run_parts(spark, _cosine_curve_parts).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_candidate_pairs"] == 1  # only the (0,2) twin pair
        assert r["n_docs_removable"] == 1
        assert r["removal_rate"] == pytest.approx(1 / 3, abs=1e-4)


def test_fk_fanout_closed_form(spark):
    from fiveg_spark.operators.quality import _fk_fanout_sql

    # lineitem: order 1 has 3 lines, order 2 has 1; parts {1,1,1,2};
    # suppliers all 9 -> max skew on the supplier edge
    spark.createDataFrame(
        [(1, 1, 9), (1, 1, 9), (1, 2, 9), (2, 1, 9)],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT",
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, 5), (2, 5), (3, 6)], "o_orderkey BIGINT, o_custkey BIGINT"
    ).createOrReplaceTempView("orders")
    got = {r["edge"]: r.asDict()
           for r in spark.sql(_fk_fanout_sql("spark")).collect()}
    lo = got["lineitem->orders"]
    assert lo["n_parents"] == 2 and lo["n_children"] == 4
    assert lo["mean_fanout"] == 2.0 and lo["max_fanout"] == 3.0
    assert lo["skew_ratio"] == 1.5
    assert got["lineitem->supplier"]["n_parents"] == 1
    assert got["lineitem->supplier"]["max_fanout"] == 4.0
    oc = got["orders->customer"]
    assert oc["n_parents"] == 2 and oc["mean_fanout"] == 1.5


# ---- batch 7: median polish, permutation entropy, NB fit ----


def test_median_polish_additive_grid_recovers_effects(spark):
    from fiveg_spark.operators.stats_tests import _median_polish_parts

    # perfectly additive grid: v(w, h) = 100 + wd_effect + hr_effect
    # over 2 weekdays x 3 hours -> polish recovers effects exactly
    # (thr = 8*value, so plant value = target/8)
    wd_eff = {0: -10.0, 1: 10.0}   # applied via day choice
    hr_eff = {0: -8.0, 1: 0.0, 2: 8.0}
    # days 19675 (Tue, w=1) and 19676 (Wed, w=2)
    rows, eid = [], 0
    for day, we in ((19675, -10.0), (19676, 10.0)):
        for hh, he in hr_eff.items():
            thr = 100.0 + we + he
            rows.append((eid, day * 86400 + 3600 * hh, 0, "a", thr / 8.0))
            eid += 1
    _events_view(spark, rows)
    got = {(r["component"], r["idx"]): r["effect"]
           for r in run_parts(spark, _median_polish_parts).collect()}
    assert got[("grand", 0)] == 100.0
    # weekday idx = (epoch_day + 3) % 7: 19675 -> 1, 19676 -> 2
    assert got[("weekday", 1)] == -10.0
    assert got[("weekday", 2)] == 10.0
    assert got[("hour", 0)] == -8.0
    assert got[("hour", 1)] == 0.0
    assert got[("hour", 2)] == 8.0
    assert got[("residual_mad", 0)] == 0.0  # additive -> clean polish


def test_permutation_entropy_extremes(spark):
    from fiveg_spark.operators.stats_tests import _perm_entropy_parts

    # slice eMBB monotone increasing -> one pattern, H = 0, 5 forbidden
    rows = [(i, BASE + 3600 * i, 0, "a", 10.0 * (i + 1)) for i in range(8)]
    # slice URLLC alternating high/low -> two patterns used
    rows += [(100 + i, BASE + 3600 * i, 1, "a",
              50.0 if i % 2 == 0 else 10.0) for i in range(8)]
    _events_view(spark, rows)
    got = {r["slice"]: r.asDict()
           for r in run_parts(spark, _perm_entropy_parts).collect()}
    e = got["eMBB"]
    assert e["n_triples"] == 6
    assert e["n_patterns_seen"] == 1 and e["n_forbidden_patterns"] == 5
    assert e["perm_entropy_bits"] == 0.0
    u = got["URLLC"]
    assert u["n_patterns_seen"] == 2
    assert u["perm_entropy_normalized"] == pytest.approx(
        1.0 / 2.584962500721156, abs=1e-3)  # two equal patterns -> 1 bit


def test_nb_ordersize_closed_form(spark):
    from fiveg_spark.operators.supply_fulfillment import _nb_ordersize_sql

    # one segment, orders with 1/2/6 lines: mu=3, var=7 ->
    # dispersion 7/3, r = 9/4, p = 3/7
    li = []
    for ok, n in ((1, 1), (2, 2), (3, 6)):
        li += [(ok, i) for i in range(n)]
    spark.createDataFrame(
        li, "l_orderkey BIGINT, l_linenumber BIGINT"
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], "o_orderkey BIGINT, o_custkey BIGINT"
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [(10, "BUILDING")], "c_custkey BIGINT, c_mktsegment STRING"
    ).createOrReplaceTempView("customer")
    r = spark.sql(_nb_ordersize_sql("spark")).collect()[0].asDict()
    assert r["n_orders"] == 3 and r["mean_lines"] == 3.0
    assert r["var_lines"] == 7.0
    assert r["dispersion_index"] == pytest.approx(7 / 3, abs=1e-4)
    assert r["nb_r"] == pytest.approx(9 / 4, abs=1e-4)
    assert r["nb_p"] == pytest.approx(3 / 7, abs=1e-4)
    assert r["overdispersed"] is True
