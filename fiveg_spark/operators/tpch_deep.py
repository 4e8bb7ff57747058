"""Deep relational shapes (TPC-H Q2/Q7-Q11/Q14-Q19/Q21/Q22 adapted).

The remaining optimizer-distinctive TPC-H query shapes, adapted to the
driver star schema (no partsupp/shipmode/commitdate columns -> profit /
supply-cost terms are re-expressed against ``p_retailprice`` and
"late" = shipped after order date).  What each one exercises:

- scalar subqueries (global agg threshold: q11, q22; per-group min: q2)
- correlated scalar subqueries (per-part average: q17)
- nested EXISTS / NOT EXISTS with two-level correlation (q21)
- IN over a grouped HAVING subquery (q18)
- disjunctive multi-bracket predicates (q19 - pushdown + join still OK)
- nation-pair self-join of a dimension (q7), CASE-ratio share (q8, q14)
- equality-on-max via scalar subquery (q15)

Everything is shared-text SQL (``sql_backed``): Spark and DuckDB run the
same statement, so parity is structural.  Scale notes: all dim joins
(part/supplier/nation/region) broadcast; the lineitem-side correlated
subqueries decorrelate into aggregate-then-join plans (Catalyst rewrites
EXISTS -> semi join, scalar-agg subquery -> one extra shuffle over the
same key as the outer join, coalesced by AQE).  Thresholds compare
exact-integer sums or stored (not recomputed) doubles wherever a
predicate could straddle an engine's summation-order noise; the one
fractional threshold (q17's 0.5*avg) gets the shared +1e-9 nudge so an
exactly-integer boundary cannot flip between engines.
"""

from __future__ import annotations

from fiveg_spark.plans.registry import NUDGE, cnt, dbl, epoch, pct, sql_backed


def _ship_latency_sql(d: str) -> str:
    # C82 — order→ship latency distribution per order priority (the
    # operational SLA question TPC-H Q4 only counts violations of):
    # per o_orderpriority, the full latency percentile ladder
    # (p50/p90/p99/max) plus the share of lines shipping within 30
    # days.  Latency in whole days from the exact integer-microsecond
    # epochs (bit-identical doubles both engines).
    #
    # Scale: the one big-big join in this file's family — lineitem ⋈
    # orders on orderkey (AQE-coalesced shuffle join; bucketed layout
    # A15 serves the recurring case), then a 5-group aggregate.
    lat = f"(({epoch('l.l_shipdate', d)} - {epoch('o.o_orderdate', d)}) / 86400.0)"
    # CAST the indicator: a bare 1.0 literal is DECIMAL in Spark, and
    # avg(DECIMAL) HALF_UP-rounds at an intermediate scale (578/1149
    # became 0.50305 -> 0.5031 vs DuckDB's 0.5030)
    within_share = dbl(
        f"avg(CASE WHEN {lat} <= 30.0 THEN CAST(1 AS DOUBLE)"
        " ELSE CAST(0 AS DOUBLE) END)",
        "within_30d_share",
    )
    return f"""
    SELECT
      o.o_orderpriority AS priority,
      {cnt("count(*)", "n_lines")},
      {dbl(f"avg({lat})", "avg_days")},
      {dbl(pct(lat, 0.5, d), "p50_days")},
      {dbl(pct(lat, 0.9, d), "p90_days")},
      {dbl(pct(lat, 0.99, d), "p99_days")},
      {dbl(f"max({lat})", "max_days")},
      {within_share}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """

_REV = "l_extendedprice * (1 - l_discount)"


def _q2_sql(d: str) -> str:
    # Q2 shape: per-group min via correlated scalar subquery.  The
    # equality compares a STORED double against min() of stored doubles
    # (no arithmetic), so it is bit-exact in both engines.
    return f"""
    SELECT p.p_brand, p.p_type, {cnt("p.p_partkey", "p_partkey")},
           {dbl("p.p_retailprice", "min_price")}
    FROM part p
    WHERE p.p_size <= 10
      AND p.p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2
        WHERE p2.p_brand = p.p_brand AND p2.p_type = p.p_type
          AND p2.p_size <= 10
      )
    """


def _q4_sql(d: str) -> str:
    # Q4: order-priority count over orders having at least one late line
    # (EXISTS correlated on the outer order; "late" = shipped after the
    # order date since the driver schema has no commitdate).
    # NOTE: tpch.q4_order_priority is the same shape over a 6-month
    # window; this is the canonical 3-month spec window — both stay
    # registered deliberately (documented twin, not an accident).
    return f"""
    SELECT o.o_orderpriority, {cnt("count(*)", "order_count")}
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """


def _q12_sql(d: str) -> str:
    # Q12 shape: priority-class conditional counts per category (driver
    # schema has no shipmode -> returnflag is the category axis).
    return f"""
    SELECT l.l_returnflag,
           {cnt("sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END)", "high_line_count")},
           {cnt("sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END)", "low_line_count")}
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """


def _q7_sql(d: str) -> str:
    # Q7: volume shipping between two nations; nation dim joined twice
    # (supplier side + customer side), symmetric pair filter, per-year agg.
    return f"""
    SELECT supp_nation, cust_nation, l_year,
           {dbl("sum(volume)", "revenue")}, {cnt("count(*)", "n_items")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             {cnt("year(l.l_shipdate)", "l_year")}, {_REV} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """


def _q8_sql(d: str) -> str:
    # Q8: market share of one supplier-nation inside one region, as a
    # CASE-ratio over the yearly volume.
    return f"""
    SELECT o_year,
           {dbl("sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END)"
                " / sum(volume)", "mkt_share")}
    FROM (
      SELECT {cnt("year(o.o_orderdate)", "o_year")},
             {_REV} AS volume, n1.n_name AS supp_nation
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """


def _q9_sql(d: str) -> str:
    # Q9 shape: product-type profit by nation and year.  No partsupp
    # table -> supply cost re-expressed as 10% of the part list price.
    return f"""
    SELECT nation, o_year, {dbl("sum(amount)", "sum_profit")}
    FROM (
      SELECT n.n_name AS nation, {cnt("year(o.o_orderdate)", "o_year")},
             {_REV} - p.p_retailprice * 0.1 * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """


def _q10_sql(d: str) -> str:
    # Q10: returned-item revenue, deterministic top-20 customers.
    return f"""
    WITH per_cust AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             {dbl(f"sum({_REV.replace('l_', 'l.l_')})", "revenue")},
             {dbl("max(c.c_acctbal)", "c_acctbal")}
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-07-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue, c_acctbal
    FROM per_cust
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """


def _q11_sql(d: str) -> str:
    # Q11 shape: per-part value with a HAVING threshold from a global
    # scalar subquery.  The spec's fraction-of-TOTAL threshold is
    # SF-dependent (each part's share shrinks as 1/n_parts — at sf0.01
    # it certified on an empty result), so the threshold is relative to
    # the MEAN part value instead: 1.4× mean selects the top ~2-4% of
    # parts at every SF (p90 ≈ 1.27×, p99 ≈ 1.53× on this corpus).
    # The sums are exact-integer quantities times stored doubles;
    # cross-engine summation-order noise (~1e-9 relative) cannot
    # realistically land a part inside a 1e-9 window of the boundary.
    return f"""
    WITH part_value AS (
      SELECT l.l_partkey, sum(l.l_quantity * p.p_retailprice) AS val
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY l.l_partkey
    )
    SELECT {cnt("l_partkey", "l_partkey")}, {dbl("val", "part_value")}
    FROM part_value
    WHERE val > (SELECT sum(val) / count(*) * 1.4 FROM part_value)
    """


def _q14_sql(d: str) -> str:
    # Q14: promo-revenue percentage (conditional-agg ratio) for one month.
    return f"""
    SELECT
      {dbl(f"100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV.replace('l_', 'l.l_')} "
           f"ELSE 0.0 END) / sum({_REV.replace('l_', 'l.l_')})", "promo_revenue")},
      {cnt("count(*)", "n_items")}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """


def _q15_sql(d: str) -> str:
    # Q15: top supplier by quarterly revenue, selected by equality against
    # a scalar max subquery over the SAME derived table (each engine
    # compares its own computed doubles, so the equality is internally
    # consistent).
    return f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT {cnt("s.s_suppkey", "s_suppkey")}, s.s_name,
           {dbl("r.total_revenue", "total_revenue")}
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """


def _q16_sql(d: str) -> str:
    # Q16 shape: supplier variety per (brand, type, size) bucket with a
    # NOT EXISTS exclusion list (negative-balance suppliers), count-distinct.
    return f"""
    SELECT p.p_brand, p.p_type, {cnt("p.p_size", "p_size")},
           {cnt("count(DISTINCT l.l_suppkey)", "supplier_cnt")}
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND NOT EXISTS (
        SELECT 1 FROM supplier s
        WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """


def _q17_sql(d: str) -> str:
    # Q17: small-quantity-order revenue; correlated scalar AVG per part.
    # l_quantity is integer-valued, so sum() is exact and avg = sum/count
    # is one IEEE division -> identical in both engines; the shared +NUDGE
    # keeps an exactly-integer 0.5*avg boundary on one side regardless.
    return f"""
    SELECT {dbl("sum(l.l_extendedprice) / 7.0", "avg_yearly")},
           {cnt("count(*)", "n_small")}
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity) + {NUDGE} FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """


def _q18_sql(d: str) -> str:
    # Q18: large-volume orders via IN over a grouped-HAVING subquery.
    # Threshold compares an exact integer-valued sum -> no boundary risk.
    return f"""
    SELECT c.c_name, {cnt("c.c_custkey", "c_custkey")},
           {cnt("o.o_orderkey", "o_orderkey")}, o.o_orderdate,
           {dbl("max(o.o_totalprice)", "o_totalprice")},
           {dbl("sum(l.l_quantity)", "total_qty")}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l2.l_orderkey FROM lineitem l2
      GROUP BY l2.l_orderkey HAVING sum(l2.l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate
    """


def _q19_sql(d: str) -> str:
    # Q19: disjunctive bracket predicates across the join -- checks that
    # the OR-of-ANDs still prunes (common-join-key extraction) instead of
    # degenerating into a cross product.
    return f"""
    SELECT {dbl(f"sum({_REV.replace('l_', 'l.l_')})", "revenue")},
           {cnt("count(*)", "n_items")}
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size <= 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size <= 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """


def _q20_sql(d: str) -> str:
    # Q20 shape: two-level nested IN (supplier <- shipped-lines <- part
    # name filter) with a grouped-HAVING volume threshold; both INs
    # decorrelate to semi joins.  Threshold compares an exact integer sum.
    return f"""
    SELECT s.s_name, {dbl("s.s_acctbal", "s_acctbal")}
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (
          SELECT p.p_partkey FROM part p WHERE p.p_name LIKE '%widget%'
        )
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey HAVING sum(l.l_quantity) > 50
    )
    """


def _q21_sql(d: str) -> str:
    # Q21 shape: suppliers who were the SOLE late shipper on a finished
    # multi-supplier order ("late" = shipped after the order date; the
    # driver schema has no commit/receipt dates).  EXISTS + NOT EXISTS,
    # both correlated on the outer lineitem AND the outer order.
    return f"""
    SELECT s.s_name, {cnt("count(*)", "numwait")}
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate
      )
    GROUP BY s.s_name
    """


def _q22_sql(d: str) -> str:
    # Q22 shape: wealthy-but-idle customers; scalar AVG threshold over
    # stored balances + NOT EXISTS on recent orders, grouped by segment.
    return f"""
    SELECT c.c_mktsegment, {cnt("count(*)", "numcust")},
           {dbl("sum(c.c_acctbal)", "totacctbal")}
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c.c_mktsegment
    """


QUERIES = [
    sql_backed("order_ship_latency", _ship_latency_sql, ("orders", "lineitem")),
    sql_backed("q2_min_cost_part", _q2_sql, ("part",)),
    sql_backed("q4_priority_count", _q4_sql, ("orders", "lineitem")),
    sql_backed("q12_priority_class", _q12_sql, ("orders", "lineitem")),
    sql_backed("q20_excess_suppliers", _q20_sql, ("supplier", "lineitem", "part")),
    sql_backed(
        "q7_volume_shipping",
        _q7_sql,
        ("supplier", "lineitem", "orders", "customer", "nation"),
    ),
    sql_backed(
        "q8_market_share",
        _q8_sql,
        ("supplier", "lineitem", "orders", "customer", "nation", "region"),
    ),
    sql_backed(
        "q9_product_profit", _q9_sql, ("part", "lineitem", "supplier", "orders", "nation")
    ),
    sql_backed(
        "q10_returned_items", _q10_sql, ("customer", "orders", "lineitem", "nation")
    ),
    sql_backed("q11_important_parts", _q11_sql, ("lineitem", "part")),
    sql_backed("q14_promo_revenue", _q14_sql, ("lineitem", "part")),
    sql_backed("q15_top_supplier", _q15_sql, ("lineitem", "supplier")),
    sql_backed("q16_supplier_variety", _q16_sql, ("part", "lineitem", "supplier")),
    sql_backed("q17_small_qty_revenue", _q17_sql, ("lineitem", "part")),
    sql_backed("q18_large_volume", _q18_sql, ("customer", "orders", "lineitem")),
    sql_backed("q19_disjunctive", _q19_sql, ("lineitem", "part")),
    sql_backed("q21_sole_late_supplier", _q21_sql, ("supplier", "lineitem", "orders")),
    sql_backed("q22_idle_balances", _q22_sql, ("customer", "orders")),
]
