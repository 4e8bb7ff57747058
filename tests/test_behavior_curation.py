"""Literal-frame semantics tests for gaps-and-islands history,
co-occurrence lift, weighted sampling, and SemDeDup."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fiveg_spark.operators import behavior as bh
from fiveg_spark.operators import semdedup as sd


def _events_view(spark, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, event_type STRING, user_id BIGINT, value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")


def test_scd2_runs_collapse_consecutive(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 0 (passes the % 199 filter): A A B A -> runs A(2), B(1), A(1)
    for i, et in enumerate(["A", "A", "B", "A"]):
        rows.append((i, t0 + dt.timedelta(minutes=i), et, 0, 1.0, "{}"))
    # user 199: single run of C
    rows.append((10, t0, "C", 199, 1.0, "{}"))
    rows.append((11, t0 + dt.timedelta(minutes=5), "C", 199, 1.0, "{}"))
    # user 5: filtered out
    rows.append((12, t0, "Z", 5, 1.0, "{}"))
    _events_view(spark, rows)
    out = [
        (r["user_id"], r["run_seq"], r["event_type"], r["n_events"])
        for r in spark.sql(bh._scd2_runs_sql("spark")).collect()
    ]
    assert out == [
        (0, 1, "A", 2),
        (0, 2, "B", 1),
        (0, 3, "A", 1),
        (199, 1, "C", 2),
    ]


def test_cooccurrence_lift_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1)
    # baskets: (u1,d1)={A,B}, (u1,d2)={A}, (u2,d1)={A,B}, (u2,d2)={B}
    rows = [
        (0, t0, "A", 1, 1.0, "{}"),
        (1, t0 + dt.timedelta(hours=1), "B", 1, 1.0, "{}"),
        (2, t0 + dt.timedelta(days=1), "A", 1, 1.0, "{}"),
        (3, t0, "A", 2, 1.0, "{}"),
        (4, t0 + dt.timedelta(hours=2), "B", 2, 1.0, "{}"),
        (5, t0 + dt.timedelta(days=1), "B", 2, 1.0, "{}"),
        # duplicate event in same basket must not double-count
        (6, t0 + dt.timedelta(hours=3), "A", 1, 1.0, "{}"),
    ]
    _events_view(spark, rows)
    from fiveg_spark.plans.registry import run_parts

    got = run_parts(spark, bh._cooccurrence_parts).collect()
    assert len(got) == 1
    r = got[0].asDict()
    # N=4 baskets, c_A=3, c_B=3, c_AB=2 -> lift = 2*4/(3*3)
    assert r["type_a"] == "A" and r["type_b"] == "B"
    assert r["n_cobaskets"] == 2
    assert r["support"] == pytest.approx(0.5, abs=1e-4)
    assert r["confidence_a_to_b"] == pytest.approx(2 / 3, abs=1e-4)
    assert r["lift"] == pytest.approx(8 / 9, abs=1e-4)


def test_kaplan_meier_hand_computed(spark):
    # 4 users: durations 0,1,1,2 days; corpus ends at day 40 so all
    # except user 4 (active till the end) are churned.
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, "a", 1, 1.0, "{}"),  # u1: dur 0, churned
        (1, t0, "a", 2, 1.0, "{}"),
        (2, t0 + dt.timedelta(days=1), "a", 2, 1.0, "{}"),  # u2: dur 1, churned
        (3, t0, "a", 3, 1.0, "{}"),
        (4, t0 + dt.timedelta(days=1, hours=2), "a", 3, 1.0, "{}"),  # u3: dur 1
        (5, t0, "a", 4, 1.0, "{}"),
        (6, t0 + dt.timedelta(days=40), "a", 4, 1.0, "{}"),  # u4: dur 40, censored
    ]
    _events_view(spark, rows)
    got = {r["t_days"]: r.asDict() for r in spark.sql(bh._kaplan_meier_sql("spark")).collect()}
    # t=0: n_risk 4, d 1 -> S = 3/4 ; t=1: n_risk 3, d 2 -> S = 3/4 * 1/3 = 1/4
    assert got[0]["n_risk"] == 4 and got[0]["n_churned"] == 1
    assert got[0]["survival"] == pytest.approx(0.75, abs=1e-4)
    assert got[1]["n_risk"] == 3 and got[1]["n_churned"] == 2
    assert got[1]["survival"] == pytest.approx(0.25, abs=1e-4)
    # censored tail: no churn at t=40, survival flat
    assert got[40]["n_churned"] == 0
    assert got[40]["survival"] == pytest.approx(0.25, abs=1e-4)


def test_weighted_sample_matches_python(spark):
    import tests.conftest as c
    from fiveg_spark.operators.curation import _weighted_sample_sql
    from fiveg_spark.sources.tables import load_table

    docs = load_table(spark, "documents", c.SF_DIR)
    docs.createOrReplaceTempView("documents")
    got = [r["doc_id"] for r in spark.sql(_weighted_sample_sql("spark")).collect()]

    rows = docs.select("doc_id", "n_chars").collect()
    keys = []
    for r in rows:
        h = hashlib.md5(f"wsamp#{r['doc_id']}".encode()).hexdigest()[:8]
        u = sum(int(ch, 16) * 16.0 ** -(i + 1) for i, ch in enumerate(h))
        k = math.log(u + 1e-10) / max(float(r["n_chars"]), 1.0)
        keys.append((-k, r["doc_id"]))
    expect = [d for _, d in sorted(keys)[:20]]
    assert got == expect


def test_semdedup_drops_planted_duplicate(spark):
    import tests.conftest as c
    from fiveg_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", c.SF_DIR).limit(120).cache()
    # plant an exact duplicate of vec 0 with a fresh id
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(999_999).cast("long"))
    corpus = emb.unionByName(dup)
    pairs = sd.semdedup_pairs(spark, corpus).collect()
    planted = [r for r in pairs if r["drop_id"] == 999_999]
    assert len(planted) == 1 and planted[0]["keep_id"] == 0
    assert planted[0]["cosine"] == pytest.approx(1.0, abs=1e-3)
    for r in pairs:
        assert r["cosine"] >= sd.THRESHOLD - 1e-9
        assert r["keep_id"] < r["drop_id"]


def test_semdedup_summary_accounts_all_vectors(spark):
    import tests.conftest as c

    out = sd.semdedup_summary(spark, c.SF_DIR).collect()
    total = sum(r["n_vectors"] for r in out)
    from fiveg_spark.sources.tables import load_table

    n = load_table(spark, "embeddings", c.SF_DIR).count()
    assert total == n
    for r in out:
        assert r["n_dropped"] <= r["n_vectors"]


def test_attribution_models_on_planted_journey(spark):
    import datetime as dt

    from fiveg_spark.operators.behavior import _attribution_parts
    from fiveg_spark.plans.registry import run_parts

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, minute, user, typ):
        return (i, t0 + dt.timedelta(minutes=minute), user, typ, 1.0, "{}")

    rows = [
        # user 1: view -> click -> purchase  (conv 1: first=view, last=click)
        ev(0, 0, 1, "view"),
        ev(1, 1, 1, "click"),
        ev(2, 2, 1, "purchase"),
        # ...then click -> purchase          (conv 2: first=last=click)
        ev(3, 3, 1, "click"),
        ev(4, 4, 1, "purchase"),
        # user 2: view -> view, NO purchase  -> zero credit anywhere
        ev(5, 0, 2, "view"),
        ev(6, 1, 2, "view"),
        # user 3: orphan purchase with no touches -> credits nothing
        ev(7, 0, 3, "purchase"),
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")
    got = {r["channel"]: r.asDict() for r in run_parts(spark, _attribution_parts).collect()}
    assert set(got) == {"view", "click"}  # user 2's unconverted views drop out
    v, c = got["view"], got["click"]
    assert v["first_touch_credit"] == 1.0 and v["last_touch_credit"] == 0.0
    assert c["first_touch_credit"] == 1.0 and c["last_touch_credit"] == 2.0
    # linear: conv1 view 0.5 + click 0.5; conv2 click 1.0
    assert abs(v["linear_credit"] - 0.5) < 1e-9
    assert abs(c["linear_credit"] - 1.5) < 1e-9
    assert v["n_credited_touches"] == 1 and c["n_credited_touches"] == 2
