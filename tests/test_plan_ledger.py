"""A24 — plan-shape regression ledger (plans/plan_ledger.py).

Covers: fingerprint stability across two plannings of the same query
(expression-id canonicalization), detection of a genuinely changed
plan under the same name (regressed scalar + reshaped hash), the
broken-query path, atomic write/load round-trip, and the diff's
severity ordering.
"""

from __future__ import annotations

import pytest

import tests.conftest as c
from fiveg_spark.plans.plan_ledger import (
    diff_ledgers,
    load_ledger,
    plan_fingerprint,
    record_ledger,
)
from fiveg_spark.sources.tables import load_table


def _agg_query(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").count()


def _join_query(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy("user_id").count()
    return ev.join(agg, "user_id").groupBy("event_type").count()


def test_fingerprint_stable_across_replans(spark):
    f1 = plan_fingerprint(_agg_query(spark, c.SF_DIR))
    f2 = plan_fingerprint(_agg_query(spark, c.SF_DIR))
    # a fresh analysis assigns new expression ids — canonicalization
    # must make the hash identical anyway
    assert f1 == f2
    assert f1["n_exchanges"] >= 1
    assert not f1["has_cartesian"]


def test_record_diff_roundtrip_and_regression(spark, tmp_path):
    p_old = str(tmp_path / "ledger_old.json")
    p_new = str(tmp_path / "ledger_new.json")
    record_ledger({"q": _agg_query}, spark, c.SF_DIR, p_old)
    # same plan recorded again: clean diff
    record_ledger({"q": _agg_query}, spark, c.SF_DIR, p_new)
    assert diff_ledgers(load_ledger(p_old), load_ledger(p_new)) == []
    # the query's plan changes shape under the SAME name: the diff
    # must surface the extra shuffle and scan
    record_ledger({"q": _join_query}, spark, c.SF_DIR, p_new)
    findings = diff_ledgers(load_ledger(p_old), load_ledger(p_new))
    kinds = {(f["kind"], f.get("field")) for f in findings}
    assert ("regressed", "n_exchanges") in kinds
    assert ("regressed", "n_file_scans") in kinds


def test_added_removed_and_broken(spark, tmp_path):
    p_old = str(tmp_path / "old.json")
    p_new = str(tmp_path / "new.json")
    record_ledger({"a": _agg_query}, spark, c.SF_DIR, p_old)

    def broken(spark, sf_dir):
        raise RuntimeError("cannot plan")

    record_ledger({"a": broken, "b": _agg_query}, spark, c.SF_DIR, p_new)
    findings = diff_ledgers(load_ledger(p_old), load_ledger(p_new))
    assert findings[0]["kind"] == "broken" and findings[0]["query"] == "a"
    assert {"kind": "added", "query": "b"} in findings


def test_reshaped_without_scalar_change(spark):
    # two semantically different aggs with identical shape scalars but
    # different trees -> 'reshaped' (hash moved, no scalar finding)
    def v1(spark, sf_dir):
        ev = load_table(spark, "events", sf_dir)
        return ev.groupBy("event_type").count()

    def v2(spark, sf_dir):
        ev = load_table(spark, "events", sf_dir)
        return ev.groupBy("user_id").count()

    old = {"version": 1, "queries": {"q": plan_fingerprint(v1(spark, c.SF_DIR))}}
    new = {"version": 1, "queries": {"q": plan_fingerprint(v2(spark, c.SF_DIR))}}
    findings = diff_ledgers(old, new)
    assert [f["kind"] for f in findings] == ["reshaped"]

    # cross-version diff: hashes are incomparable — ONE version finding,
    # zero spurious per-query 'reshaped' noise
    findings = diff_ledgers(old, {**new, "version": 2})
    assert len(findings) == 1
    assert findings[0]["field"] == "version"


def test_cli_ledger_record_and_diff(spark, tmp_path, capsys, monkeypatch):
    # the real registry includes queries that FIT models at plan-build
    # time (the advisor sweep's skip_build list), so the CLI path is
    # exercised on a small registry; full-registry recording is the
    # production `python -m fiveg_spark ledger` invocation
    import __spark_entry__ as contract

    from fiveg_spark.__main__ import main

    monkeypatch.setattr(
        contract, "queries", lambda: {"agg": _agg_query, "join": _join_query}
    )
    out1 = str(tmp_path / "l1.json")
    out2 = str(tmp_path / "l2.json")
    rc = main(["ledger", out1, "--sf-dir", c.SF_DIR], spark=spark)
    assert rc == 0
    rc = main(["ledger", out2, "--sf-dir", c.SF_DIR, "--diff", out1],
              spark=spark)
    assert rc == 0  # same session, same plans -> no regressions
    led = load_ledger(out2)
    assert set(led["queries"]) == {"agg", "join"}
    assert all("plan_hash" in f for f in led["queries"].values())
    assert "no shape changes" in capsys.readouterr().out


def test_fingerprint_stable_under_session_churn(spark):
    """v2 canonicalization: multi-distinct aggregates print grouping
    keys / Expand groups / output lists in session expression-id order
    — two sessions with different id counters printed semantically
    identical kpi36 plans with shuffled key lists (the r10w2 ledger
    incident: 18 wide untouched plans 'reshaped').  The fingerprint
    must survive running OTHER queries first."""
    import __spark_entry__ as contract
    import tests.conftest as c

    q = contract.queries()
    h1 = plan_fingerprint(q["kpi36"](spark, c.SF_DIR))["plan_hash"]
    for name in ("q1_pricing_summary", "window_entropy"):
        q[name](spark, c.SF_DIR).collect()  # advance the id counter
    h2 = plan_fingerprint(q["kpi36"](spark, c.SF_DIR))["plan_hash"]
    assert h1 == h2


def test_canonical_sorts_are_nesting_aware():
    from fiveg_spark.plans.plan_ledger import canonical_plan

    a = ("HashAggregate(keys=[a#1, CASE WHEN (x, y) THEN 1 ELSE 0 END#3, "
         "b#2], functions=[f(a#1), g(b#2)])")
    b = ("HashAggregate(keys=[b#9, a#8, CASE WHEN (x, y) THEN 1 ELSE 0 "
         "END#7], functions=[g(b#9), f(a#8)])")
    assert canonical_plan(a) == canonical_plan(b)
    # rangepartitioning keeps its order — sort keys ARE semantics
    r1 = "Exchange rangepartitioning(a#1 ASC, b#2 ASC, 200)"
    r2 = "Exchange rangepartitioning(b#2 ASC, a#1 ASC, 200)"
    assert canonical_plan(r1) != canonical_plan(r2)
    # Expand: gid literals normalize, groups and slots sort, and the
    # trailing output list sorts
    e1 = "Expand [[a#1, null, 0], [null, b#2, 1]], [a#1, b#2, gid#3]"
    e2 = "Expand [[b#5, null, 0], [null, a#4, 1]], [b#5, a#4, gid#6]"
    assert canonical_plan(e1) == canonical_plan(e2)


def test_partition_counts_strip_despite_key_sort():
    """Review catch (r10w2): sorting hashpartitioning's key list moved
    the trailing partition count to the list head, out of reach of the
    `, \\d+)` strip — a dev-box ledger (shuffle.partitions=8) would
    diff dirty against CI (200) on every exchange.  The strip now runs
    BEFORE the sort; two configs must hash identically."""
    from fiveg_spark.plans.plan_ledger import canonical_plan

    dev = "Exchange hashpartitioning(user_id#123, event_type#7, 8), E"
    ci = "Exchange hashpartitioning(event_type#9, user_id#44, 200), E"
    assert canonical_plan(dev) == canonical_plan(ci)
    assert "200" not in canonical_plan(ci) and "8" not in canonical_plan(dev)


def test_truncated_filter_tails_normalize():
    """Spark cuts long filter strings at a character budget BEFORE ids
    collapse, so the cut position shifts with id width and the partial
    tail hashed differently across sessions (theilsen, r10w2)."""
    from fiveg_spark.plans.plan_ledger import canonical_plan

    a = "DataFilters: [isnotnull((cast(x#4 as double)..., Format: P"
    b = "DataFilters: [isnotnull((cast(x#4567 as double..., Format: P"
    assert canonical_plan(a) == canonical_plan(b)


def test_post_build_plannable_fingerprinted_and_diff_flags_change(
    spark, tmp_path, monkeypatch
):
    """r12: the ANN/ML blind-spot fix.  A skip-listed query whose
    build executes but whose final plan is REAL gets a post_build
    fingerprint in the default (include_fits=False) pass, and a
    planted plan change under its name IS flagged by the diff; a
    skip-listed query returning a collected frame stays skipped."""
    import fiveg_spark.plans.plan_ledger as pl

    monkeypatch.setattr(
        pl, "PLAN_BUILD_EXECUTES",
        frozenset({"fitq", "collectq"}),
    )
    monkeypatch.setattr(
        pl, "PLAN_BUILD_EXECUTES_PLANNABLE", frozenset({"fitq"}),
    )

    def collectq(spark, sf_dir):
        rows = [tuple(r) for r in _agg_query(spark, sf_dir).collect()]
        return spark.createDataFrame(rows, "event_type STRING, count LONG")

    p_old = str(tmp_path / "old.json")
    p_new = str(tmp_path / "new.json")
    pl.record_ledger(
        {"fitq": _agg_query, "collectq": collectq}, spark, c.SF_DIR, p_old)
    old = load_ledger(p_old)
    assert old["queries"]["fitq"]["post_build"] is True
    assert old["queries"]["fitq"]["n_file_scans"] >= 1
    assert "skipped" in old["queries"]["collectq"]

    # planted ANN-class regression: the same name's plan gains a join
    pl.record_ledger(
        {"fitq": _join_query, "collectq": collectq}, spark, c.SF_DIR, p_new)
    findings = diff_ledgers(old, load_ledger(p_new))
    assert any(
        f["query"] == "fitq" and f["kind"] == "regressed"
        for f in findings
    ), findings
    assert not any(f["query"] == "collectq" for f in findings)


def test_recursive_plan_fingerprint_stable(spark):
    """C166's UnionLoop plan must canonicalize stably: two fresh
    builds (fresh expression ids, fresh loop/CTE ids) hash identically,
    or every future ledger diff shows a spurious 'reshaped' on the
    recursive query."""
    from fiveg_spark.operators.graph import trade_reach_hops

    f1 = plan_fingerprint(trade_reach_hops(spark, c.SF_DIR))
    f2 = plan_fingerprint(trade_reach_hops(spark, c.SF_DIR))
    assert f1 == f2
    assert not f1["has_cartesian"]


@pytest.mark.slow  # double whole-contract ledger pass (~1.7 min) — default run excludes it (r14, driver budget)
def test_fingerprint_survives_expression_id_churn(spark):
    """The r13 q2/q3 incident: FileScan metadata truncates at a
    CHARACTER budget, so wider expression ids (#45678 after session
    churn) pushed a borderline DataFilters render over the edge and
    the hash flipped.  v3 raises spark.sql.maxMetadataStringLength to
    10000 in the session factory; this pins (a) the conf is live and
    (b) a filter-heavy scan hashes identically across a ~40k-id burn."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.maxMetadataStringLength") == "10000"

    def filter_heavy(s):
        li = load_table(s, "lineitem", c.SF_DIR)
        return li.filter(
            (F.col("l_quantity") > 5)
            & (F.col("l_discount") < 0.08)
            & (F.col("l_shipdate").isNotNull())
            & (F.col("l_returnflag") != "R")
            & (F.col("l_extendedprice") > 100.0)
        ).groupBy("l_linestatus").count()

    f1 = plan_fingerprint(filter_heavy(spark))
    # burn ~40k expression ids (each selected column expression takes
    # fresh NamedExpression ids at analysis)
    ev = load_table(spark, "events", c.SF_DIR)
    for _ in range(40):
        ev.select(
            *[(F.col("value") + i).alias(f"c{i}") for i in range(500)]
        ).schema  # analysis only — no execution
    f2 = plan_fingerprint(filter_heavy(spark))
    assert f1 == f2
