"""Hampel filter vs pandas, and triangle counting on a hand-built graph."""

from __future__ import annotations

import pandas as pd
import pytest

from fiveg_spark.operators import ts_advanced as tsa
from fiveg_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_arr_median_even_and_odd(spark):
    med = tsa._arr_median("spark", "arr")
    got = spark.sql(
        f"SELECT {med} AS m FROM VALUES (array(3.0, 1.0, 2.0)), (array(4.0, 1.0, 3.0, 2.0)) AS t(arr)"
    ).collect()
    assert [r["m"] for r in got] == [2.0, 2.5]


def test_hampel_matches_pandas(spark):
    for t in ("events",):
        load_table(spark, t, SF_DIR).createOrReplaceTempView(t)
    rows = spark.sql(tsa._hampel_sql("spark")).collect()
    df = pd.DataFrame([r.asDict() for r in rows])
    one = df[df["slice"] == df["slice"].iloc[0]].sort_values("window_start")
    s = one["throughput"].reset_index(drop=True)
    med = s.rolling(7, center=True, min_periods=1).median()
    mad = (
        pd.concat([s, med], axis=1)
        .pipe(lambda d: s.rolling(7, center=True, min_periods=1).apply(
            lambda w: (w - w.median()).abs().median(), raw=False))
    )
    got_med = one["rolling_median"].reset_index(drop=True)
    assert (got_med - med).abs().max() < 1e-3
    got_mad = one["rolling_mad"].reset_index(drop=True)
    assert (got_mad - mad).abs().max() < 1e-3
    # flags consistent with the statistics they derive from
    flag = ((one["throughput"] - one["rolling_median"]).abs()
            > 3 * 1.4826 * one["rolling_mad"]).astype(int)
    assert (one["is_outlier"].reset_index(drop=True) == flag.reset_index(drop=True)).all()


def _trade_views(spark, edges):
    """Build the 5-table star just enough to induce the given
    nation-trade edges (one customer/order/lineitem/supplier per edge)."""
    nations = sorted({n for e in edges for n in e})
    nid = {n: i for i, n in enumerate(nations)}
    spark.createDataFrame(
        [(i, n) for n, i in nid.items()], "n_nationkey INT, n_name STRING"
    ).createOrReplaceTempView("nation")
    cust, orders, items, supp = [], [], [], []
    for k, (cn, sn) in enumerate(edges):
        cust.append((k, nid[cn]))
        orders.append((k, k))
        items.append((k, k, 100.0, 0.0))
        supp.append((k, nid[sn]))
    spark.createDataFrame(cust, "c_custkey INT, c_nationkey INT").createOrReplaceTempView("customer")
    spark.createDataFrame(orders, "o_orderkey INT, o_custkey INT").createOrReplaceTempView("orders")
    spark.createDataFrame(
        items, "l_orderkey INT, l_suppkey INT, l_extendedprice DOUBLE, l_discount DOUBLE"
    ).createOrReplaceTempView("lineitem")
    spark.createDataFrame(supp, "s_suppkey INT, s_nationkey INT").createOrReplaceTempView("supplier")


def test_triangle_count_known_graph(spark):
    # A-B-C triangle plus pendant C-D: one triangle, D in none
    _trade_views(spark, [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D")])
    rows = {r["nation"]: r.asDict() for r in spark.sql(tsa._triangle_count_sql("spark")).collect()}
    assert rows["A"]["n_triangles"] == 1
    assert rows["B"]["n_triangles"] == 1
    assert rows["C"]["n_triangles"] == 1
    assert rows["D"]["n_triangles"] == 0
    assert rows["A"]["clustering_coeff"] == pytest.approx(1.0, abs=1e-3)
    assert rows["C"]["clustering_coeff"] == pytest.approx(1.0 / 3.0, abs=1e-3)
    assert rows["D"]["degree"] == 1
