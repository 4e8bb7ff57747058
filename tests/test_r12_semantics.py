"""Round-12 semantics: Wilson-Hilferty chi-square survival and the
D88/D89 uniformity decision queries (planted patterns).
"""

from __future__ import annotations

import math

from pyspark.sql import types as T

_EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("es", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

BASE = 19675 * 86400


def _events_view(spark, rows):
    """rows: (event_id, epoch_s, user_id, event_type, value)"""
    spark.createDataFrame(
        [(*r, "{}") for r in rows], _EV_SCHEMA
    ).selectExpr(
        "event_id",
        "timestamp_micros(es * 1000000) AS ts",
        "user_id", "event_type", "value", "props",
    ).createOrReplaceTempView("events")


def test_chi2_sf_wh_accuracy_and_guards(spark):
    """Wilson-Hilferty must track the exact Erlang tail to ~1e-3 at
    even dof (where the exact form exists to compare), hit the
    dof-23 95% critical value at ~0.05, accept RUNTIME dof
    expressions, and read degenerate inputs as survival 1."""
    from fiveg_spark.functions.stats import chi2_sf_wh_sql

    def erlang(x, dof):
        h = x / 2.0
        return math.exp(-h) * math.fsum(
            h**k / math.factorial(k) for k in range(dof // 2)
        )

    # WH error shrinks with dof (~3e-3 at dof 4, ~1e-4 by dof 24);
    # the low-dof consumers are decision thresholds on 6-decimal
    # ROUNDED p with identical SQL both engines, so parity is exact
    # even where the approximation is coarse
    cases = [(4, 2.0), (4, 8.0), (10, 10.0), (10, 20.0), (24, 35.17)]
    sql = ", ".join(
        f"{chi2_sf_wh_sql(str(x), str(dof))} AS c{i}"
        for i, (dof, x) in enumerate(cases)
    )
    row = spark.sql(f"SELECT {sql}").head()
    for i, (dof, x) in enumerate(cases):
        assert abs(row[i] - erlang(x, dof)) < 4e-3, (dof, x, row[i])

    extra = spark.sql(
        "SELECT "
        f"{chi2_sf_wh_sql('35.17', '23')} AS crit23, "
        f"{chi2_sf_wh_sql('-1.0', '23')} AS neg_x, "
        f"{chi2_sf_wh_sql('5.0', '0')} AS zero_dof, "
        # runtime dof: an expression, not a literal
        f"{chi2_sf_wh_sql('20.0', '(2 * 5)')} AS runtime_dof"
    ).head()
    assert abs(extra["crit23"] - 0.05) < 2e-3
    assert extra["neg_x"] == 1.0 and extra["zero_dof"] == 1.0
    assert abs(extra["runtime_dof"] - erlang(20.0, 10)) < 2e-3

    # the WH text must be one shared dialect (DuckDB parses it too)
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {chi2_sf_wh_sql('35.17', '23')}"
    ).fetchone()[0]
    assert abs(got - extra["crit23"]) < 1e-12


def test_hour_uniformity_decisions_planted_spike(spark):
    """A type arriving ONLY at hour 3 must be the BH discovery; a
    type spread evenly over all 24 hours must not."""
    from fiveg_spark.operators.stats_tests import (
        _hour_uniformity_decisions_sql,
    )

    rows, eid = [], 0
    for i in range(240):
        rows.append((eid, BASE + 3 * 3600 + 86400 * (i % 10) + i,
                     0, "spiky", 1.0))
        eid += 1
        rows.append((eid, BASE + (i % 24) * 3600 + 86400 * (i // 24),
                     1, "flat", 1.0))
        eid += 1
    _events_view(spark, rows)
    got = {r["event_type"]: r
           for r in spark.sql(_hour_uniformity_decisions_sql("spark")).collect()}
    assert got["spiky"]["discovery"]
    assert got["spiky"]["p_wh"] < 1e-5
    assert not got["flat"]["discovery"]
    assert got["flat"]["chi2"] == 0.0  # perfectly level census
    assert got["flat"]["p_wh"] == 1.0


def test_weekday_uniformity_decisions_planted_weekender(spark):
    """A (slice, type) cell arriving on one weekday only must be the
    discovery; an even 7-day spread must stay quiet."""
    from fiveg_spark.operators.stats_tests import (
        _weekday_uniformity_decisions_sql,
    )

    rows, eid = [], 0
    for i in range(140):
        # user_id 0 -> eMBB; all arrivals on the same epoch-weekday
        rows.append((eid, BASE + 7 * 86400 * (i % 20) + i, 0,
                     "weekender", 1.0))
        eid += 1
        # user_id 1 -> URLLC; one arrival per day, even 7-day census
        rows.append((eid, BASE + 86400 * (i % 7) + 7 * 86400 * (i // 7),
                     1, "daily", 1.0))
        eid += 1
    _events_view(spark, rows)
    got = {(r["slice"], r["event_type"]): r
           for r in spark.sql(
               _weekday_uniformity_decisions_sql("spark")).collect()}
    w = got[("eMBB", "weekender")]
    assert w["discovery"] and w["p_exact"] < 1e-6
    d = got[("URLLC", "daily")]
    assert not d["discovery"]
    assert d["chi2"] == 0.0 and d["p_exact"] == 1.0
