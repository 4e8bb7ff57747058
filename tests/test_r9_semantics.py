"""Planted-fixture semantics pins for the round-9 operators: each new
query's load-bearing branch gets a fixture where the right answer is
known in closed form, so a green oracle-parity run on data that never
exercises the branch can't hide a regression.
"""

from __future__ import annotations

import pytest

from fiveg_spark.plans.registry import run_parts

_EV_SCHEMA = (
    "event_id BIGINT, es BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _events_view(spark, rows):
    """rows: (event_id, epoch_s, user_id, event_type, value)"""
    spark.createDataFrame(
        [(*r, "{}") for r in rows],
        "event_id BIGINT, es BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id",
        "timestamp_micros(es * 1000000) AS ts",
        "user_id", "event_type", "value", "props",
    ).createOrReplaceTempView("events")


BASE = 1_700_000_000


def test_semi_markov_holding_times_closed_form(spark):
    from fiveg_spark.operators.behavior import _semi_markov_sql

    # one user: a -> b after 100 s, b -> a after 2000 s (cross-session)
    _events_view(spark, [
        (0, BASE, 1, "a", 1.0),
        (1, BASE + 100, 1, "b", 1.0),
        (2, BASE + 2100, 1, "a", 1.0),
    ])
    got = {(r["prev_type"], r["next_type"]): r.asDict()
           for r in spark.sql(_semi_markov_sql("spark")).collect()}
    ab = got[("a", "b")]
    assert ab["n_transitions"] == 1
    assert ab["mean_gap_s"] == 100.0
    assert ab["within_session_share"] == 1.0
    ba = got[("b", "a")]
    assert ba["mean_gap_s"] == 2000.0
    assert ba["within_session_share"] == 0.0


def test_dau_overlap_jaccard_closed_form(spark):
    from fiveg_spark.operators.behavior import _dau_overlap_parts

    # day 0: users {1,2,3}; day 1: users {2,3,4,5} -> inter 2, union 5
    rows, eid = [], 0
    for u in (1, 2, 3):
        rows.append((eid, BASE, u, "a", 1.0)); eid += 1
    for u in (2, 3, 4, 5):
        rows.append((eid, BASE + 86400, u, "a", 1.0)); eid += 1
    _events_view(spark, rows)
    got = run_parts(spark, _dau_overlap_parts).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["n_active"] == 3 and r["n_active_next"] == 4
    assert r["n_retained"] == 2
    assert r["jaccard"] == pytest.approx(2 / 5, abs=1e-4)
    assert r["retention"] == pytest.approx(2 / 3, abs=1e-4)
    assert r["newcomer_share"] == pytest.approx(2 / 4, abs=1e-4)


def test_activity_by_tenure_anchors_on_first_day(spark):
    from fiveg_spark.operators.behavior import _activity_by_tenure_sql

    # user 1 starts day 0 (2 events), returns day 7 (week 1, 1 event);
    # user 2 starts day 7 (1 event) -> week 0 has BOTH users
    _events_view(spark, [
        (0, BASE, 1, "a", 2.0),
        (1, BASE + 10, 1, "a", 4.0),
        (2, BASE + 7 * 86400, 1, "a", 8.0),
        (3, BASE + 7 * 86400, 2, "a", 6.0),
    ])
    got = {r["tenure_week"]: r.asDict()
           for r in spark.sql(_activity_by_tenure_sql("spark")).collect()}
    assert got[0]["n_active_users"] == 2 and got[0]["n_events"] == 3
    assert got[0]["mean_value"] == pytest.approx(4.0, abs=1e-4)
    assert got[1]["n_active_users"] == 1 and got[1]["n_events"] == 1


def test_session_conversion_profile_bands_and_rate(spark):
    from fiveg_spark.operators.behavior import _session_conversion_parts

    # user 1: 1-event session (no purchase); user 2: view->purchase
    # 120 s later (band b_2_3, converted, time-to-purchase 120)
    _events_view(spark, [
        (0, BASE, 1, "view", 1.0),
        (1, BASE, 2, "view", 1.0),
        (2, BASE + 120, 2, "purchase", 1.0),
    ])
    got = {(r["entry_type"], r["length_band"]): r.asDict()
           for r in run_parts(spark, _session_conversion_parts).collect()}
    one = got[("view", "a_1")]
    assert one["n_sessions"] == 1 and one["conversion_rate"] == 0.0
    two = got[("view", "b_2_3")]
    assert two["conversion_rate"] == 1.0
    assert two["mean_s_to_purchase"] == pytest.approx(120.0, abs=1e-4)


def test_second_session_latency_return_rate(spark):
    from fiveg_spark.operators.behavior import _second_session_latency_parts

    # user 1: sessions at t=0 and t=0+3h (returned, 3.0 h latency);
    # user 2: one session only
    _events_view(spark, [
        (0, BASE, 1, "view", 1.0),
        (1, BASE + 3 * 3600, 1, "view", 1.0),
        (2, BASE, 2, "click", 1.0),
    ])
    got = {r["first_type"]: r.asDict()
           for r in run_parts(spark, _second_session_latency_parts).collect()}
    v = got["view"]
    assert v["n_users"] == 1 and v["n_returned"] == 1
    assert v["p50_latency_h"] == pytest.approx(3.0, abs=1e-4)
    assert v["within_1d_share"] == 1.0
    c = got["click"]
    assert c["n_returned"] == 0 and c["return_rate"] == 0.0


def test_user_transfer_entropy_constant_user_is_zero(spark):
    from fiveg_spark.operators.behavior import _user_transfer_entropy_parts

    # 6 contiguous hours; user 1 active EVERY hour (b==1 always: the
    # conditioning adds nothing, TE must be exactly 0); user 2 active
    # only in the 3 high-load hours.  Load alternates low/high via
    # event counts 1 vs 3.
    rows, eid = [], 0
    for h in range(6):
        n = 3 if h % 2 else 1
        for k in range(n):
            rows.append((eid, BASE + h * 3600 + k, 100 + k, "a", 1.0))
            eid += 1
        rows.append((eid, BASE + h * 3600 + 30, 1, "a", 1.0)); eid += 1
        if h % 2:
            rows.append((eid, BASE + h * 3600 + 31, 2, "a", 1.0)); eid += 1
    _events_view(spark, rows)
    got = {r["user_id"]: r.asDict()
           for r in run_parts(spark, _user_transfer_entropy_parts).collect()}
    assert got[1]["n_hour_pairs"] == 5
    assert got[1]["te_bits"] == 0.0  # b is constant -> no information
    # TE is bounded by the conditional entropy for every user
    for r in got.values():
        assert r["te_bits"] <= r["cond_entropy_bits"] + 1e-9
        assert r["te_bits"] >= -1e-4  # numerically >= 0


def test_user_transfer_entropy_perfect_predictor_saturates(spark):
    from fiveg_spark.operators.behavior import _user_transfer_entropy_parts

    # Load follows user 9's PREVIOUS-hour activity exactly (active ->
    # next hour high, inactive -> next hour low), while the load's own
    # history is useless (sequence alternates irregularly).  TE for
    # user 9 must equal the full conditional entropy (te_share ~ 1).
    pattern = [1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 0]  # user-9 activity
    rows, eid = [], 0
    for h in range(len(pattern) + 1):
        # load at hour h mirrors pattern[h-1]
        high = pattern[h - 1] == 1 if h > 0 else False
        n = 4 if high else 1
        for k in range(n):
            rows.append((eid, BASE + h * 3600 + k, 100 + k, "a", 1.0))
            eid += 1
        if h < len(pattern) and pattern[h]:
            rows.append((eid, BASE + h * 3600 + 40, 9, "a", 1.0)); eid += 1
    _events_view(spark, rows)
    got = {r["user_id"]: r.asDict()
           for r in run_parts(spark, _user_transfer_entropy_parts).collect()}
    r9 = got[9]
    assert r9["cond_entropy_bits"] > 0.5  # load history alone can't predict
    assert r9["te_share"] == pytest.approx(1.0, abs=1e-3)


def test_yoy_revenue_growth_closed_form(spark):
    from fiveg_spark.operators.relational_ext import _yoy_revenue_growth_sql

    spark.createDataFrame(
        [(1, 1, 100.0, 0.0), (2, 1, 150.0, 0.0)],
        "l_orderkey BIGINT, dummy BIGINT, l_extendedprice DOUBLE, "
        "l_discount DOUBLE",
    ).selectExpr(
        "l_orderkey",
        "CAST(CASE WHEN l_orderkey = 1 THEN '1995-06-01' ELSE '1996-06-01' END"
        " AS TIMESTAMP) AS l_shipdate",
        "l_extendedprice", "l_discount",
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(1, 10), (2, 10)], "o_orderkey BIGINT, o_custkey BIGINT"
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [(10, 3)], "c_custkey BIGINT, c_nationkey INT"
    ).createOrReplaceTempView("customer")
    spark.createDataFrame(
        [(3, "GERMANY")], "n_nationkey INT, n_name STRING"
    ).createOrReplaceTempView("nation")
    got = {r["ship_year"]: r.asDict()
           for r in spark.sql(_yoy_revenue_growth_sql("spark")).collect()}
    assert got[1995]["yoy_growth"] == 0.0  # first year: no-information 0.0
    assert got[1996]["yoy_growth"] == pytest.approx(0.5, abs=1e-4)


def test_fk_orphan_audit_counts_planted_orphan(spark):
    from fiveg_spark.operators.quality import _fk_orphan_audit_sql

    spark.createDataFrame(
        [(1, 1, 1, 1), (2, 99, 1, 1)],  # orderkey 99 has no parent
        "l_orderkey BIGINT, x BIGINT, l_partkey BIGINT, l_suppkey BIGINT",
    ).selectExpr(
        "x AS l_orderkey", "l_partkey", "l_suppkey"
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame([(1, 5)], "o_orderkey BIGINT, o_custkey BIGINT") \
        .createOrReplaceTempView("orders")
    spark.createDataFrame([(1,)], "p_partkey BIGINT") \
        .createOrReplaceTempView("part")
    spark.createDataFrame([(1, 0)], "s_suppkey BIGINT, s_nationkey INT") \
        .createOrReplaceTempView("supplier")
    spark.createDataFrame([(5, 0)], "c_custkey BIGINT, c_nationkey INT") \
        .createOrReplaceTempView("customer")
    spark.createDataFrame([(0,)], "n_nationkey INT") \
        .createOrReplaceTempView("nation")
    got = {r["fk_edge"]: r.asDict()
           for r in spark.sql(_fk_orphan_audit_sql("spark")).collect()}
    assert got["lineitem->orders"]["n_orphans"] == 1
    assert got["lineitem->orders"]["orphan_rate"] == pytest.approx(0.5)
    assert got["lineitem->part"]["n_orphans"] == 0
    assert got["orders->customer"]["n_orphans"] == 0


def test_pk_uniqueness_audit_flags_planted_duplicate(spark):
    from fiveg_spark.operators.quality import _pk_uniqueness_audit_sql

    for name, schema, rows in [
        ("region", "r_regionkey INT", [(0,)]),
        ("nation", "n_nationkey INT", [(0,)]),
        ("customer", "c_custkey BIGINT", [(1,)]),
        ("supplier", "s_suppkey BIGINT", [(1,)]),
        ("part", "p_partkey BIGINT", [(1,)]),
        ("orders", "o_orderkey BIGINT", [(1,)]),
        ("lineitem", "l_orderkey BIGINT, l_linenumber INT",
         [(1, 1), (1, 2)]),
        ("events", "event_id BIGINT", [(7,), (7,)]),  # planted dup
        ("documents", "doc_id BIGINT", [(1,)]),
        ("embeddings", "vec_id BIGINT", [(1,)]),
    ]:
        spark.createDataFrame(rows, schema).createOrReplaceTempView(name)
    got = {r["table_name"]: r.asDict()
           for r in spark.sql(_pk_uniqueness_audit_sql("spark")).collect()}
    assert got["events"]["n_duplicate_rows"] == 1
    assert got["events"]["unique_ok"] is False
    assert got["lineitem"]["n_duplicate_rows"] == 0  # composite key unique
    assert got["lineitem"]["unique_ok"] is True


def test_bigram_entropy_rate_deterministic_text_is_zero(spark):
    from fiveg_spark.operators.text_stats import _bigram_entropy_rate_sql

    # s1: every token deterministically followed by one token -> H=0;
    # s2: 'a' followed by b/c equally -> H = p(a->*) * 1 bit
    docs = [
        (0, "a b " * 20 + "a b", "en", "s1", 0),
        (1, "a b a c " * 10 + "a b", "en", "s2", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = {r["source"]: r.asDict()
           for r in spark.sql(_bigram_entropy_rate_sql("spark")).collect()}
    assert got["s1"]["cond_entropy_bits"] == 0.0
    assert got["s1"]["cond_perplexity"] == 1.0
    # s2: 42 tokens -> 41 bigrams; 'a' starts 21 with an 11/10 b/c
    # split, every other predecessor deterministic:
    # H = (21/41) * H2(11/21)
    import math

    h2 = -(11 / 21) * math.log2(11 / 21) - (10 / 21) * math.log2(10 / 21)
    assert got["s2"]["cond_entropy_bits"] == pytest.approx(
        21 / 41 * h2, abs=5e-3
    )


def test_sentence_stats_ari_closed_form(spark):
    from fiveg_spark.operators.text import _sentence_stats_sql

    # 2 sentences, 6 words, 24 alnum chars:
    # ARI = 4.71*(24/6) + 0.5*(6/2) - 21.43
    text = "spark runs fast. duck checks results!"
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = spark.sql(_sentence_stats_sql("spark")).collect()[0].asDict()
    alnum = sum(ch.isalnum() for ch in text)
    exp = 4.71 * (alnum / 6) + 0.5 * (6 / 2) - 21.43
    assert got["mean_sentences"] == 2.0
    assert got["mean_words_per_sentence"] == pytest.approx(3.0, abs=1e-4)
    assert got["mean_ari"] == pytest.approx(exp, abs=1e-3)


def test_char_class_profile_crafted_shares(spark):
    from fiveg_spark.operators.text import _char_class_profile_sql

    # "Ab1 !" -> 5 chars: 1 upper, 2 alpha, 1 digit, 1 space, 1 symbol
    spark.createDataFrame(
        [(0, "Ab1 !", "en", "s", 5)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = spark.sql(_char_class_profile_sql("spark")).collect()[0].asDict()
    assert got["total_chars"] == 5
    assert got["digit_share"] == pytest.approx(0.2, abs=1e-4)
    assert got["upper_share"] == pytest.approx(0.2, abs=1e-4)
    assert got["alpha_share"] == pytest.approx(0.4, abs=1e-4)
    assert got["space_share"] == pytest.approx(0.2, abs=1e-4)
    assert got["symbol_share"] == pytest.approx(0.2, abs=1e-4)


def test_url_markup_screen_detects_planted_residue(spark):
    from fiveg_spark.operators.text import _url_markup_screen_sql

    docs = [
        (0, "clean prose only here", "en", "s1", 0),
        (1, "see https://x.io/a and https://y.io/b", "en", "s2", 0),
        (2, "<div>hello</div> &amp; more", "en", "s2", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = {r["source"]: r.asDict()
           for r in spark.sql(_url_markup_screen_sql("spark")).collect()}
    assert got["s1"]["url_doc_share"] == 0.0
    assert got["s1"]["tag_doc_share"] == 0.0
    assert got["s2"]["url_doc_share"] == 0.5
    assert got["s2"]["tag_doc_share"] == 0.5
    assert got["s2"]["entity_doc_share"] == 0.5


def test_label_centroid_matrix_orthogonal_and_identical(spark):
    from fiveg_spark.operators.similarity import _label_centroid_matrix_parts

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),  # orthogonal to label 0
        (3, [2.0, 0.0, 0.0, 0.0], 2),  # same direction as label 0
    ]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).createOrReplaceTempView("embeddings")
    got = {(r["label_a"], r["label_b"]): r.asDict()
           for r in run_parts(spark, _label_centroid_matrix_parts).collect()}
    assert got[(0, 1)]["centroid_cosine"] == 0.0
    assert got[(0, 2)]["centroid_cosine"] == pytest.approx(1.0, abs=1e-4)
    assert got[(0, 1)]["n_vectors_a"] == 2


def test_segment_mix_independent_is_lift_one(spark):
    from fiveg_spark.operators.relational_ext import _segment_mix_by_nation_parts

    # 2 nations x 2 segments, perfectly proportional counts -> every
    # cell has lift 1 and chi2 contribution 0
    cust, ck = [], 0
    for nk, mult in ((0, 1), (1, 2)):
        for seg, base in (("A", 10), ("B", 30)):
            for _ in range(base * mult):
                cust.append((ck, nk, seg)); ck += 1
    spark.createDataFrame(
        cust, "c_custkey BIGINT, c_nationkey INT, c_mktsegment STRING"
    ).createOrReplaceTempView("customer")
    spark.createDataFrame(
        [(0, "FRANCE"), (1, "KENYA")], "n_nationkey INT, n_name STRING"
    ).createOrReplaceTempView("nation")
    for r in run_parts(spark, _segment_mix_by_nation_parts).collect():
        assert r["lift_vs_global"] == pytest.approx(1.0, abs=1e-4)
        assert r["chi2_contribution"] == 0.0


def test_brand_basket_pairs_perfect_cooccurrence_lift(spark):
    from fiveg_spark.operators.relational_ext import _brand_basket_pairs_parts

    # 10 orders; brands X and Y appear together in 5 (P=.5 each,
    # P(XY)=.5 -> lift 2); brand Z in all 10 (lift with X = 1)
    li, pk = [], 0
    parts = []
    brand_of = {}
    for brand in ("X", "Y", "Z"):
        parts.append((pk, brand)); brand_of[brand] = pk; pk += 1
    ln = 0
    for o in range(10):
        li.append((o, brand_of["Z"], ln)); ln += 1
        if o < 5:
            li.append((o, brand_of["X"], ln)); ln += 1
            li.append((o, brand_of["Y"], ln)); ln += 1
    spark.createDataFrame(
        li, "l_orderkey BIGINT, l_partkey BIGINT, l_linenumber INT"
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        parts, "p_partkey BIGINT, p_brand STRING"
    ).createOrReplaceTempView("part")
    got = {(r["brand_a"], r["brand_b"]): r.asDict()
           for r in run_parts(spark, _brand_basket_pairs_parts).collect()}
    assert got[("X", "Y")]["n_baskets_together"] == 5
    assert got[("X", "Y")]["lift"] == pytest.approx(2.0, abs=1e-4)
    assert got[("X", "Z")]["lift"] == pytest.approx(1.0, abs=1e-4)


def test_column_stat_drift_planted_null_regime(spark):
    from fiveg_spark.operators.quality import _column_stat_drift_parts

    # h1: values present; h2: value all-NULL -> null_rate_h2 = 1.0
    rows = [(i, BASE + i, 1, "a", 5.0, "{}") for i in range(10)]
    rows += [(10 + i, BASE + 10_000 + i, 1, "a", None, "{}")
             for i in range(10)]
    spark.createDataFrame(
        rows, _EV_SCHEMA
    ).selectExpr(
        "event_id", "timestamp_micros(es * 1000000) AS ts",
        "user_id", "event_type", "value", "props",
    ).createOrReplaceTempView("events")
    got = {r["column_name"]: r.asDict()
           for r in run_parts(spark, _column_stat_drift_parts).collect()}
    v = got["value"]
    assert v["null_rate_h1"] == 0.0
    assert v["null_rate_h2"] == 1.0


def test_pq_rerank_ladder_monotone_and_floor(spark):
    from fiveg_spark.operators.ann_recall import (
        RERANK_LADDER,
        ann_pq_rerank_ladder,
        rerank_ladder_hits,
    )
    from tests.conftest import SF_DIR

    hits = rerank_ladder_hits(spark, SF_DIR)
    assert [s for s, _ in hits] == list(RERANK_LADDER)
    vals = [h for _, h in hits]
    assert vals == sorted(vals)  # nested prefixes -> monotone
    assert vals[-1] >= 5  # the deepest rung recovers >= the 0.5 floor
    rows = ann_pq_rerank_ladder(spark, SF_DIR).collect()
    assert all(r["monotone_ok"] and r["floor_ok"] for r in rows)


def test_revenue_drawdown_planted_dip(spark):
    from fiveg_spark.operators.relational_ext import _revenue_drawdown_sql

    # daily revenue 100, 100, 50, 100 -> max drawdown (100-50)/100 = 0.5
    import datetime as dt

    rows = []
    for i, rev in enumerate([100.0, 100.0, 50.0, 100.0]):
        rows.append((i, rev, dt.datetime(1995, 1, 1 + i)))
    spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_totalprice DOUBLE, o_orderdate TIMESTAMP"
    ).createOrReplaceTempView("orders")
    got = spark.sql(_revenue_drawdown_sql("spark")).collect()[0].asDict()
    assert got["n_days"] == 4
    assert got["max_drawdown"] == pytest.approx(0.5, abs=1e-4)


def test_customer_hhi_single_customer_is_one(spark):
    from fiveg_spark.operators.relational_ext import _customer_hhi_yearly_sql

    import datetime as dt

    spark.createDataFrame(
        [
            (0, 1, 100.0, dt.datetime(1995, 3, 1)),
            (1, 1, 300.0, dt.datetime(1995, 6, 1)),
            (2, 2, 200.0, dt.datetime(1996, 3, 1)),
            (3, 3, 200.0, dt.datetime(1996, 6, 1)),
        ],
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP",
    ).createOrReplaceTempView("orders")
    got = {r["order_year"]: r.asDict()
           for r in spark.sql(_customer_hhi_yearly_sql("spark")).collect()}
    assert got[1995]["hhi"] == 1.0  # one customer owns the year
    assert got[1995]["effective_n_customers"] == 1.0
    assert got[1996]["hhi"] == pytest.approx(0.5, abs=1e-4)  # 50/50 split
    assert got[1996]["effective_n_customers"] == pytest.approx(2.0, abs=1e-3)


def test_ship_sla_attainment_planted_latencies(spark):
    from fiveg_spark.operators.relational_ext import SHIP_SLA_DAYS, _ship_sla_sql

    import datetime as dt

    od = dt.datetime(1995, 1, 10)
    spark.createDataFrame(
        [(1, od, "1-URGENT")],
        "o_orderkey BIGINT, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [
            (1, od + dt.timedelta(days=10)),   # in SLA
            (1, od + dt.timedelta(days=100)),  # out of SLA
        ],
        "l_orderkey BIGINT, l_shipdate TIMESTAMP",
    ).createOrReplaceTempView("lineitem")
    got = spark.sql(_ship_sla_sql("spark")).collect()[0].asDict()
    assert SHIP_SLA_DAYS == 60.0
    assert got["n_lineitems"] == 2
    assert got["sla_attainment"] == pytest.approx(0.5, abs=1e-4)
    assert got["mean_latency_days"] == pytest.approx(55.0, abs=1e-4)


def test_size_price_correlation_perfect_line(spark):
    from fiveg_spark.operators.stats_assoc import _size_price_corr_sql

    rows = [(i, f"p{i}", "Brand#1", "T1", i + 1, 2.0 * (i + 1))
            for i in range(6)]
    rows += [(10 + i, f"q{i}", "Brand#1", "T2", i + 1, 7.0)
             for i in range(4)]  # constant price -> corr_safe degenerate 0
    spark.createDataFrame(
        rows,
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    ).createOrReplaceTempView("part")
    got = {r["p_type"]: r.asDict()
           for r in spark.sql(_size_price_corr_sql("spark")).collect()}
    assert got["T1"]["size_price_corr"] == pytest.approx(1.0, abs=1e-4)
    assert got["T1"]["price_per_size_unit"] == pytest.approx(2.0, abs=1e-4)
    assert got["T2"]["size_price_corr"] == 0.0
    assert got["T2"]["price_per_size_unit"] == 0.0


def test_error_rate_pchart_flags_planted_spike(spark):
    from fiveg_spark.operators.ts_diagnostics import _error_pchart_sql

    # 9 quiet days at 1/100 errors, one spike day at 50/100
    rows, eid = [], 0
    for day in range(10):
        n_err = 50 if day == 9 else 1
        for k in range(100):
            et = "error" if k < n_err else "view"
            rows.append((eid, BASE + day * 86400 + k, 1, et, 1.0))
            eid += 1
    _events_view(spark, rows)
    got = {int((r["day"] * 86400 - BASE) / 86400) if False else r["day"]: r.asDict()
           for r in spark.sql(_error_pchart_sql("spark")).collect()}
    days = sorted(got)
    spike, quiet = got[days[-1]], got[days[0]]
    assert spike["above_ucl"] is True
    assert quiet["above_ucl"] is False and quiet["below_lcl"] is False
    assert spike["p_hat"] == pytest.approx(0.5, abs=1e-4)


def test_variance_time_curve_alternating_drops_even_scales(spark):
    from fiveg_spark.operators.ts_advanced import _variance_time_sql

    # the flows/slice derivation rides events' json k; craft events so
    # hourly throughput alternates a,b exactly: m=2 block means are
    # constant -> var 0 -> the scale point is dropped and the slope
    # guard (n>=2) kicks in only with the surviving points
    rows, eid = [], 0
    for h in range(16):
        n = 2 if h % 2 else 1  # alternating hourly event count
        for k in range(n):
            rows.append((eid, BASE - (BASE % 3600) + h * 3600 + k, 1, "a", 1.0))
            eid += 1
    _events_view(spark, rows)
    df = spark.sql(_variance_time_sql("spark")).collect()
    assert len(df) >= 1
    for r in df:
        rd = r.asDict()
        # even-scale block means are exactly constant -> var 0 -> point
        # excluded -> reported as the dbl() 0.0 convention
        assert rd["var_2h"] == 0.0
        assert rd["var_1h"] > 0.0


def test_token_length_histogram_tail_pooling(spark):
    from fiveg_spark.operators.text_stats import (
        TOKEN_LEN_CAP,
        _token_length_histogram_sql,
    )

    text = "ab ab " + "x" * 40  # two 2-char tokens + one 40-char token
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = {r["len_bucket"]: r.asDict()
           for r in spark.sql(_token_length_histogram_sql("spark")).collect()}
    assert got[2]["n_tokens"] == 2
    assert got[2]["share"] == pytest.approx(2 / 3, abs=1e-4)
    tail = got[TOKEN_LEN_CAP + 1]
    assert tail["is_tail_bucket"] is True and tail["n_tokens"] == 1


def test_component_moments_constant_vectors_guarded(spark):
    from fiveg_spark.operators.similarity import _component_moments_sql

    rows = [
        (0, [3.0, 3.0, 3.0, 3.0], 0),   # constant: sigma 0 -> guards
        (1, [0.0, 0.0, 0.0, 12.0], 1),  # one outlier component
    ]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).createOrReplaceTempView("embeddings")
    got = {r["label"]: r.asDict()
           for r in spark.sql(_component_moments_sql("spark")).collect()}
    c = got[0]
    assert c["std_component"] == 0.0
    assert c["skewness"] == 0.0 and c["excess_kurtosis"] == 0.0
    o = got[1]
    assert o["mean_component"] == pytest.approx(3.0, abs=1e-4)
    assert o["skewness"] > 0.5  # right-skewed by the outlier
    assert o["max_v"] == 12.0


def test_arrival_inversions_match_python_simulation(spark):
    from fiveg_spark.operators.lateness import _arrival_inversions_sql
    from tests.test_lateness import _delay, _mk_events

    es_by_id = _mk_events(spark, n=300)
    got = {r["event_type"]: r.asDict()
           for r in spark.sql(_arrival_inversions_sql("spark")).collect()}

    arr = {i: es + _delay(i) for i, es in es_by_id.items()}
    import collections

    exp = collections.Counter()
    pairs = collections.Counter()
    for etype in ("a", "b"):
        ids = [i for i in es_by_id if ("a" if i % 2 else "b") == etype]
        by_day = collections.defaultdict(list)
        for i in ids:
            by_day[int(arr[i] // 86400.0)].append(i)
        for day_ids in by_day.values():
            day_ids.sort(key=lambda i: (arr[i], es_by_id[i]))
            for a, b in zip(day_ids, day_ids[1:]):
                pairs[etype] += 1
                if es_by_id[b] < es_by_id[a]:
                    exp[etype] += 1
    for etype in ("a", "b"):
        assert got[etype]["n_adjacent_pairs"] == pairs[etype]
        assert got[etype]["n_inversions"] == exp[etype]
    # the synthesized disorder actually produces inversions
    assert sum(exp.values()) > 0


def test_brand_loyalty_single_brand_customers(spark):
    from fiveg_spark.operators.relational_ext import _brand_loyalty_sql

    # cust 1: 4 items all brand X (hhi 1, loyalist); cust 2: 2+2 split
    # (hhi 0.5); cust 3: single item -> excluded by the >= 2 floor
    li, parts = [], [(0, "X"), (1, "Y")]
    ln = 0
    for o, (cust, brands) in enumerate([(1, "XXXX"), (2, "XXYY"), (3, "X")]):
        for b in brands:
            li.append((o, 0 if b == "X" else 1, ln)); ln += 1
    spark.createDataFrame(
        li, "l_orderkey BIGINT, l_partkey BIGINT, l_linenumber INT"
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "o_orderkey BIGINT, o_custkey BIGINT"
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [(1, "SEG"), (2, "SEG"), (3, "SEG")],
        "c_custkey BIGINT, c_mktsegment STRING",
    ).createOrReplaceTempView("customer")
    spark.createDataFrame(
        [(p, f"Brand#{b}") for p, b in parts],
        "p_partkey BIGINT, p_brand STRING",
    ).createOrReplaceTempView("part")
    got = spark.sql(_brand_loyalty_sql("spark")).collect()[0].asDict()
    assert got["n_customers"] == 2  # the single-item customer dropped
    assert got["mean_brand_hhi"] == pytest.approx(0.75, abs=1e-4)
    assert got["single_brand_share"] == pytest.approx(0.5, abs=1e-4)


def test_value_concentration_uniform_values(spark):
    from fiveg_spark.operators.timeseries import _value_concentration_sql

    # 100 equal-value events: the top-10% threshold equals every value,
    # so the >= capture takes ALL mass (the documented tie behavior)
    _events_view(spark, [(i, BASE + i, 1, "a", 1.0) for i in range(100)])
    got = spark.sql(_value_concentration_sql("spark")).collect()[0].asDict()
    assert got["top10pct_value_share"] == 1.0
    # distinct ramp 1..100: top 10% (>= p90) captures the top decile
    _events_view(spark, [
        (i, BASE + i, 1, "a", float(i + 1)) for i in range(100)
    ])
    got = spark.sql(_value_concentration_sql("spark")).collect()[0].asDict()
    exp = sum(range(91, 101)) / sum(range(1, 101))
    assert got["top10pct_value_share"] == pytest.approx(exp, abs=0.02)


def test_fingerprint_collision_planted_prefix_dupes(spark):
    from fiveg_spark.operators.text import _fingerprint_collision_sql

    # two docs share the 5-token prefix but differ after -> 2 full
    # hashes over 1 prefix hash = collision factor 2
    docs = [
        (0, "a b c d e tail one", "en", "s", 0),
        (1, "a b c d e tail two", "en", "s", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = spark.sql(_fingerprint_collision_sql("spark")).collect()[0].asDict()
    assert got["n_full_hashes"] == 2
    assert got["n_prefix_hashes"] == 1
    assert got["prefix_collision_factor"] == 2.0


def test_priority_mix_proportional_has_zero_chi2(spark):
    from fiveg_spark.operators.relational_ext import _priority_mix_yearly_sql

    import datetime as dt

    rows, ok = [], 0
    for yr, mult in ((1995, 1), (1996, 3)):
        for pr, base in (("1-URGENT", 10), ("3-MEDIUM", 20)):
            for _ in range(base * mult):
                rows.append((ok, dt.datetime(yr, 6, 1), pr)); ok += 1
    spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING",
    ).createOrReplaceTempView("orders")
    for r in spark.sql(_priority_mix_yearly_sql("spark")).collect():
        assert r["chi2_contribution"] == 0.0
        assert r["share_in_year"] == pytest.approx(
            r["pooled_share"], abs=1e-4
        )


def test_load_duration_curve_monotone_exceedance(spark):
    from fiveg_spark.operators.ts_advanced import (
        DURATION_POINTS,
        _load_duration_sql,
    )

    _events_view(spark, [
        (i, BASE + i * 600, 1, "a", 1.0) for i in range(200)
    ])
    for r in spark.sql(_load_duration_sql("spark")).collect():
        rd = r.asDict()
        vals = [rd[f"exceeded_{int(p * 100):02d}pct"] for p in DURATION_POINTS]
        # load exceeded 1% of the time >= load exceeded 99% of the time
        assert vals == sorted(vals, reverse=True), vals
        assert rd["peak_to_base_ratio"] >= 1.0


def test_acf_half_life_ramp_never_decays(spark):
    from fiveg_spark.operators.ts_advanced import (
        ACF_HALF_MAX_LAG,
        _acf_half_life_sql,
    )

    # hourly event counts ramp 1..48 -> strongly persistent series:
    # lag-1 rho ~ 1 and the ACF never falls below 1/e inside 24 lags
    rows, eid = [], 0
    for h in range(48):
        for k in range(h + 1):
            rows.append((eid, BASE - (BASE % 3600) + h * 3600 + k, 1, "a", 1.0))
            eid += 1
    _events_view(spark, rows)
    for r in spark.sql(_acf_half_life_sql("spark")).collect():
        rd = r.asDict()
        assert rd["rho_lag1"] > 0.9
        assert rd["half_life_hours"] == ACF_HALF_MAX_LAG + 1  # capped
        assert rd["decayed_within_window"] is False


def test_nation_rank_stability_identical_and_reversed(spark):
    from fiveg_spark.operators.relational_ext import _nation_rank_stability_sql

    import datetime as dt

    rows, ok = [], 0
    # y1995 -> y1996: same ranking (rho 1); y1996 -> y1997: reversed
    revs = {1995: [300.0, 200.0, 100.0],
            1996: [30.0, 20.0, 10.0],
            1997: [1.0, 2.0, 3.0]}
    for yr, by_nation in revs.items():
        for nk, rev in enumerate(by_nation):
            rows.append((ok, 100 + nk, rev, dt.datetime(yr, 6, 1))); ok += 1
    spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP",
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [(100 + nk, nk) for nk in range(3)],
        "c_custkey BIGINT, c_nationkey INT",
    ).createOrReplaceTempView("customer")
    got = {r["year_from"]: r.asDict()
           for r in spark.sql(_nation_rank_stability_sql("spark")).collect()}
    assert got[1995]["spearman_rho"] == pytest.approx(1.0, abs=1e-4)
    assert got[1995]["top_nation_changed"] is False
    assert got[1996]["spearman_rho"] == pytest.approx(-1.0, abs=1e-4)
    assert got[1996]["top_nation_changed"] is True


def test_order_status_aging_closed_form(spark):
    from fiveg_spark.operators.relational_ext import _order_status_aging_sql

    import datetime as dt

    mx = dt.datetime(1998, 1, 11)
    spark.createDataFrame(
        [
            (0, "O", 100.0, mx - dt.timedelta(days=10)),
            (1, "O", 200.0, mx - dt.timedelta(days=20)),
            (2, "F", 300.0, mx),
        ],
        "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP",
    ).createOrReplaceTempView("orders")
    got = {r["status"]: r.asDict()
           for r in spark.sql(_order_status_aging_sql("spark")).collect()}
    assert got["O"]["mean_age_days"] == pytest.approx(15.0, abs=1e-4)
    assert got["F"]["mean_age_days"] == 0.0


def test_user_specialization_entropy_bands(spark):
    from fiveg_spark.operators.behavior import _user_specialization_sql

    rows, eid = [], 0
    # user 1: 8 events all one type -> H 0 (specialist, light band)
    for _ in range(8):
        rows.append((eid, BASE + eid, 1, "a", 1.0)); eid += 1
    # user 2: 5 events each of 4 types -> H = 2 bits (generalist, regular)
    for t in ("a", "b", "c", "d"):
        for _ in range(5):
            rows.append((eid, BASE + eid, 2, t, 1.0)); eid += 1
    _events_view(spark, rows)
    got = {r["activity_band"]: r.asDict()
           for r in spark.sql(_user_specialization_sql("spark")).collect()}
    light = got["a_light"]
    assert light["mean_entropy_bits"] == 0.0
    assert light["specialist_share"] == 1.0
    reg = got["b_regular"]
    assert reg["mean_entropy_bits"] == pytest.approx(2.0, abs=1e-3)
    assert reg["generalist_share"] == 1.0


def test_dup_ngram_mass_planted_cross_source(spark):
    from fiveg_spark.operators.llm_curation import _dup_ngram_mass_parts

    # s1 doc shares its ONLY 3-gram with s2; s3 is unique
    docs = [
        (0, "a b c", "en", "s1", 0),
        (1, "a b c", "en", "s2", 0),
        (2, "x y z", "en", "s3", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = {r["source"]: r.asDict()
           for r in run_parts(spark, _dup_ngram_mass_parts).collect()}
    assert got["s1"]["cross_source_mass_share"] == 1.0
    assert got["s2"]["cross_source_mass_share"] == 1.0
    assert got["s3"]["cross_source_mass_share"] == 0.0
    assert got["s3"]["cross_source_vocab_share"] == 0.0


def test_tfidf_source_signature_distinctive_terms(spark):
    from fiveg_spark.operators.text_stats import _tfidf_source_signature_parts

    # 'zebra' appears ONLY in s1 (distinctive); 'the' floods every
    # source (idf-crushed) -> zebra must outrank 'the' in s1's top-5
    docs = [
        (0, "the the the zebra zebra", "en", "s1", 0),
        (1, "the the the common words here", "en", "s2", 0),
        (2, "the the other common words", "en", "s3", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = [r.asDict()
           for r in run_parts(spark, _tfidf_source_signature_parts).collect()]
    s1 = [r for r in got if r["source"] == "s1"]
    assert s1[0]["token"] == "zebra"  # rank 1 = the source-unique term


def test_doc_entropy_screen_flags_padding(spark):
    from fiveg_spark.operators.text_stats import _doc_entropy_screen_sql

    docs = [
        (0, " ".join(["pad"] * 30), "en", "s1", 0),          # H = 0
        (1, " ".join(f"w{i}" for i in range(30)), "en", "s2", 0),  # H ~ 4.9
    ]
    spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    got = {r["source"]: r.asDict()
           for r in spark.sql(_doc_entropy_screen_sql("spark")).collect()}
    assert got["s1"]["mean_doc_entropy_bits"] == 0.0
    assert got["s1"]["low_entropy_share"] == 1.0
    assert got["s2"]["low_entropy_share"] == 0.0
    assert got["s2"]["mean_doc_entropy_bits"] > 4.0


def test_weekly_slice_correlation_proportional_series(spark):
    from fiveg_spark.operators.ts_advanced import _weekly_slice_corr_parts

    # slice eMBB (user 0) and URLLC (user 1): URLLC's hourly value is
    # 2x eMBB's varying series -> weekly corr exactly 1 in every week
    rows, eid = [], 0
    for h in range(24 * 9):  # spans two 604800 s weeks
        v = 10.0 + (h % 7) * 3.0
        rows.append((eid, BASE - (BASE % 3600) + h * 3600, 0, "view", v))
        eid += 1
        rows.append((eid, BASE - (BASE % 3600) + h * 3600 + 1, 1, "view", 2 * v))
        eid += 1
    _events_view(spark, rows)
    got = run_parts(spark, _weekly_slice_corr_parts).collect()
    assert len(got) >= 2  # at least two weeks for the pair
    for r in got:
        assert r["weekly_corr"] == pytest.approx(1.0, abs=1e-3)


def test_diurnal_amplitude_growing_trend(spark):
    from fiveg_spark.operators.ts_advanced import _diurnal_amplitude_sql

    # daily swing widens linearly: day k hourly values alternate
    # 100 +/- (5 + 2k) -> relative amplitude grows -> positive slope
    rows, eid = [], 0
    for day in range(6):
        for h in range(24):
            v = 100.0 + (5.0 + 2.0 * day) * (1 if h % 2 else -1)
            rows.append(
                (eid, BASE - (BASE % 86400) + day * 86400 + h * 3600, 0,
                 "view", v))
            eid += 1
    _events_view(spark, rows)
    got = {r["slice"]: r.asDict()
           for r in spark.sql(_diurnal_amplitude_sql("spark")).collect()}
    r = got["eMBB"]
    assert r["n_days"] == 6
    assert r["amplitude_trend_per_day"] > 0.0
    assert r["amplitude_growing"] is True


def test_arrival_burstiness_poisson_vs_batchy(spark):
    from fiveg_spark.operators.lateness import _arrival_burstiness_sql

    # type 'a': one event per minute (Fano ~ 0, never overdispersed);
    # delays shift arrivals but one-per-minute stays ~one-per-minute
    rows, eid = [], 0
    for m in range(120):
        rows.append((eid, BASE + m * 60, 1, "a", 1.0)); eid += 1
    _events_view(spark, rows)
    got = {r["event_type"]: r.asDict()
           for r in spark.sql(_arrival_burstiness_sql("spark")).collect()}
    a = got["a"]
    assert a["fano_factor"] < 1.0
    assert a["overdispersed"] is False


def test_source_embedding_coherence_identical_vs_orthogonal(spark):
    from fiveg_spark.operators.similarity import _source_coherence_parts

    docs, vecs = [], []
    # s1: two identical unit vectors -> mean cosine 1; s2: orthogonal
    # pair -> 0; s3: single vector -> the n<2 convention 0
    for i, (src, v) in enumerate([
        ("s1", [1.0, 0.0, 0.0, 0.0]), ("s1", [2.0, 0.0, 0.0, 0.0]),
        ("s2", [1.0, 0.0, 0.0, 0.0]), ("s2", [0.0, 3.0, 0.0, 0.0]),
        ("s3", [0.0, 0.0, 1.0, 0.0]),
    ]):
        docs.append((i, f"doc {i}", "en", src, 5))
        vecs.append((i, v, 0))
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).createOrReplaceTempView("documents")
    spark.createDataFrame(
        vecs, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).createOrReplaceTempView("embeddings")
    got = {r["source"]: r.asDict()
           for r in run_parts(spark, _source_coherence_parts).collect()}
    assert got["s1"]["mean_within_cosine"] == pytest.approx(1.0, abs=1e-4)
    assert got["s2"]["mean_within_cosine"] == 0.0
    assert got["s3"]["mean_within_cosine"] == 0.0


def test_reciprocity_by_year_planted_graph(spark):
    from fiveg_spark.operators.ts_advanced import _reciprocity_by_year_parts

    import datetime as dt

    # 1995: A supplies B AND B supplies A (reciprocal) plus A->C one-way
    # -> 3 edges... wait: edges are (supplier nation -> customer nation):
    # A->B, B->A, A->C: reciprocity = 2/3
    nations = [(0, "A"), (1, "B"), (2, "C")]
    spark.createDataFrame(
        nations, "n_nationkey INT, n_name STRING"
    ).createOrReplaceTempView("nation")
    # customer nation by custkey, supplier nation by suppkey
    spark.createDataFrame(
        [(10, 1), (11, 0), (12, 2)], "c_custkey BIGINT, c_nationkey INT"
    ).createOrReplaceTempView("customer")  # cust 10 in B, 11 in A, 12 in C
    spark.createDataFrame(
        [(20, 0), (21, 1)], "s_suppkey BIGINT, s_nationkey INT"
    ).createOrReplaceTempView("supplier")  # supp 20 in A, 21 in B
    orders = [(100, 10), (101, 11), (102, 12)]
    spark.createDataFrame(
        [(ok, ck, dt.datetime(1995, 6, 1)) for ok, ck in orders],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderdate TIMESTAMP",
    ).createOrReplaceTempView("orders")
    li = [
        (100, 20, 1),  # A supplies B
        (101, 21, 2),  # B supplies A
        (102, 20, 3),  # A supplies C
    ]
    spark.createDataFrame(
        li, "l_orderkey BIGINT, l_suppkey BIGINT, l_linenumber INT"
    ).createOrReplaceTempView("lineitem")
    got = run_parts(spark, _reciprocity_by_year_parts).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["n_edges"] == 3 and r["n_reciprocal"] == 2
    assert r["reciprocity"] == pytest.approx(2 / 3, abs=1e-4)


def test_order_cadence_clockwork_vs_bursty(spark):
    from fiveg_spark.operators.behavior import _order_cadence_sql

    import datetime as dt

    rows, ok = [], 0
    # cust 1: orders every 30 days exactly (CV 0, clockwork)
    for k in range(5):
        rows.append((ok, 1, dt.datetime(1995, 1, 1) + dt.timedelta(days=30 * k)))
        ok += 1
    # cust 2: gaps 1, 1, 118 days (bursty, CV >> 0.5)
    for dday in (0, 1, 2, 120):
        rows.append((ok, 2, dt.datetime(1995, 1, 1) + dt.timedelta(days=dday)))
        ok += 1
    spark.createDataFrame(
        rows, "o_orderkey BIGINT, o_custkey BIGINT, o_orderdate TIMESTAMP"
    ).createOrReplaceTempView("orders")
    spark.createDataFrame(
        [(1, "SEG"), (2, "SEG")], "c_custkey BIGINT, c_mktsegment STRING"
    ).createOrReplaceTempView("customer")
    got = spark.sql(_order_cadence_sql("spark")).collect()[0].asDict()
    assert got["n_repeat_customers"] == 2
    assert got["clockwork_share"] == pytest.approx(0.5, abs=1e-4)


def test_quantization_clip_eval_outlier_tradeoff(spark):
    from fiveg_spark.operators.similarity import _quant_clip_eval_parts

    # 200 components in [0, 1] + one extreme outlier at 1000: the
    # minmax range wastes its 255 codes on [0, 1000] (bulk error ~2),
    # the p1/p99 clip keeps resolution on the bulk but pays the full
    # clip error on the outlier
    vecs = [(i, [i / 50.0 % 1.0, (i + 7) / 50.0 % 1.0], 0) for i in range(100)]
    vecs.append((100, [1000.0, 0.5], 0))
    spark.createDataFrame(
        vecs, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).createOrReplaceTempView("embeddings")
    got = {r["strategy"]: r.asDict()
           for r in run_parts(spark, _quant_clip_eval_parts).collect()}
    mm, cl = got["a_minmax"], got["b_p1p99_clip"]
    assert mm["clipped_share"] == 0.0
    assert cl["clipped_share"] > 0.0  # the outlier is clipped
    # the clip keeps 255 codes on the bulk: unclipped error collapses
    assert cl["mean_abs_err_unclipped"] < mm["mean_abs_err_unclipped"] / 10
    assert cl["max_abs_err"] > mm["max_abs_err"]  # the outlier pays
