"""Bucketed-layout proof: the same fact-fact join that shuffles both
sides from plain parquet plans with ZERO exchanges from co-bucketed
tables (the write-once / join-forever trade at 100 TB)."""

from __future__ import annotations

from fiveg_spark.plans.bucketing import drop_bucketed, is_bucketed_scan, write_bucketed
from fiveg_spark.plans.explain import plan_facts
from fiveg_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_elides_both_shuffles(spark, tmp_path):
    orders = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_quantity")

    write_bucketed(orders, "b_orders", str(tmp_path / "o"), ("o_orderkey",), 4)
    write_bucketed(lineitem, "b_lineitem", str(tmp_path / "l"), ("l_orderkey",), 4)

    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # baseline: the identical join from plain frames shuffles both sides
        plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        plain_facts = plan_facts(plain, execute=True)
        assert plain_facts.n_exchanges >= 2, "baseline should shuffle both sides"

        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        j = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        assert is_bucketed_scan(j), "catalog bucketing not picked up by the scan"
        facts = plan_facts(j, execute=True)
        assert facts.n_exchanges == 0, "bucketed join must not shuffle"
        assert facts.n_broadcasts == 0, "must be a co-located SMJ, not broadcast"

        # same answer as the plain join
        assert j.count() == plain.count()

        # and a follow-up groupBy on the SAME key rides the bucketing too
        agg = (
            bo.join(bl, bo.o_orderkey == bl.l_orderkey)
            .groupBy("o_orderkey")
            .count()
        )
        assert plan_facts(agg, execute=True).n_exchanges == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        drop_bucketed(spark, "b_orders", "b_lineitem")
