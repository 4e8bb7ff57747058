"""Histogram-quantile rollup error bound + sweep-line concurrency on a
hand-built interval set."""

from __future__ import annotations

import datetime as dt

from fiveg_spark.operators import rollup_stats as rs
from fiveg_spark.operators.rollup_stats import BIN_W


def _events_view(spark, rows):
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, event_type STRING, user_id BIGINT, value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")


def test_histogram_quantile_bound(spark):
    import tests.conftest as c
    from fiveg_spark.sources.tables import load_table

    load_table(spark, "events", c.SF_DIR).createOrReplaceTempView("events")
    rows = spark.sql(rs._hist_quantile_sql("spark")).collect()
    assert [r["p"] for r in rows] == [0.5, 0.9, 0.99]
    for r in rows:
        assert r["abs_err"] <= BIN_W + 1e-6, r


def test_countmin_never_underestimates(spark):
    import tests.conftest as c
    from fiveg_spark.sources.tables import load_table

    load_table(spark, "documents", c.SF_DIR).createOrReplaceTempView("documents")
    rows = spark.sql(rs._countmin_sql("spark")).collect()
    assert len(rows) == 10
    total = sum(r["exact_count"] for r in rows)
    for r in rows:
        assert r["cm_estimate"] >= r["exact_count"], r
        # depth 4 / width 1024 keeps collisions tame on this corpus
        assert r["overestimate"] <= max(0.05 * total, 50), r


def test_concurrency_sweep_hand_built(spark):
    t0 = dt.datetime(2024, 1, 1, 10)
    mk = lambda m: t0 + dt.timedelta(minutes=m)
    rows = [
        # user 1 active 10:00-10:30, user 2 active 10:10-10:50,
        # user 3 active 10:20-10:25 -> peak 3 within hour 10
        (0, mk(0), "a", 1, 1.0, "{}"),
        (1, mk(30), "a", 1, 1.0, "{}"),
        (2, mk(10), "a", 2, 1.0, "{}"),
        (3, mk(50), "a", 2, 1.0, "{}"),
        (4, mk(20), "a", 3, 1.0, "{}"),
        (5, mk(25), "a", 3, 1.0, "{}"),
        # user 4 alone in hour 12
        (6, mk(120), "a", 4, 1.0, "{}"),
        (7, mk(130), "a", 4, 1.0, "{}"),
    ]
    _events_view(spark, rows)
    got = {
        r["hour"].hour: r["peak_concurrent"]
        for r in spark.sql(rs._concurrency_sql("spark")).collect()
    }
    assert got[10] == 3
    assert got[12] == 1
