"""Planted-fixture semantics pins for round-8 operators — especially
the r8 self-review fixes (dense chi-square grids, keeper semantics,
estimator calibration, the Spearman degenerate guard), so none of them
can silently regress behind a green oracle-parity run on data that
never exercises the fixed branch.
"""

from __future__ import annotations

from fiveg_spark.plans.registry import run_parts

_DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def _docs_view(spark, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).createOrReplaceTempView(
        "documents"
    )


def _words(lo: int, hi: int) -> str:
    return " ".join(f"w{i}" for i in range(lo, hi))


def test_line_dedup_keeper_and_removed_fraction(spark):
    from fiveg_spark.operators.dedup import _line_dedup_sql

    # A: 20 tokens = two 10-token lines; B: exact copy (loses BOTH
    # lines to A's keeper occurrences); C: unrelated 20 tokens
    rows = [
        (0, _words(0, 20), "en", "s1", 0),
        (1, _words(0, 20), "en", "s2", 0),
        (2, _words(100, 120), "en", "s1", 0),
    ]
    _docs_view(spark, rows)
    got = {r["doc_id"]: r.asDict()
           for r in spark.sql(_line_dedup_sql("spark")).collect()}
    assert got[0]["n_lines"] == 2 and got[0]["n_removed_lines"] == 0
    assert got[1]["n_removed_lines"] == 2
    assert got[1]["removed_tokens"] == 20
    assert got[1]["removed_frac"] == 1.0
    assert got[2]["n_removed_lines"] == 0


def test_line_dedup_short_tail_never_a_candidate(spark):
    from fiveg_spark.operators.dedup import _line_dedup_sql

    # 13 tokens: one full line + a 3-token tail; the tail text repeats
    # across docs but stays under MIN_LINE_TOKENS -> never removed
    rows = [
        (0, _words(0, 10) + " tail tail tail", "en", "s", 0),
        (1, _words(20, 30) + " tail tail tail", "en", "s", 0),
    ]
    _docs_view(spark, rows)
    got = {r["doc_id"]: r.asDict()
           for r in spark.sql(_line_dedup_sql("spark")).collect()}
    assert got[0]["n_removed_lines"] == 0
    assert got[1]["n_removed_lines"] == 0


def test_markov_stationarity_emits_vanished_transition_cells(spark):
    import datetime as dt

    from fiveg_spark.operators.behavior import _markov_stationarity_parts

    base = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, uid, typ):
        return (eid, base + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    # user 1 transitions A->B early (h1); user 2 transitions A->C late
    # (h2): each transition VANISHES in the other era, and the r8 fix
    # requires those zero cells to exist with positive expected mass
    rows = [
        ev(0, 0, 1, "A"), ev(1, 1, 1, "B"),
        ev(2, 100, 2, "A"), ev(3, 101, 2, "C"),
    ]
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    ).createOrReplaceTempView("events")
    got = {(r["prev_type"], r["next_type"], r["era"]): r.asDict()
           for r in run_parts(spark, _markov_stationarity_parts).collect()}
    # DENSE grid: 2 observed pairs x 2 eras = 4 rows
    assert len(got) == 4
    assert got[("A", "B", "h1")]["n_transitions"] == 1
    assert got[("A", "B", "h2")]["n_transitions"] == 0
    # the vanished cell carries its (0-E)^2/E = E mass: row_total(A,h2)
    # = 1, pooled share A->B = 1/2 -> E = 0.5
    assert got[("A", "B", "h2")]["chi2_contribution"] == 0.5
    assert got[("A", "C", "h1")]["chi2_contribution"] == 0.5


def test_returnflag_shift_emits_vanished_flag_cells(spark):
    import datetime as dt

    from fiveg_spark.operators.relational_ext import _returnflag_shift_parts

    # quarter 0: only flag R; quarter 1: R and A -> the (q0, A) zero
    # cell must exist with expected > 0
    d0 = dt.datetime(1995, 1, 10)
    d1 = dt.datetime(1995, 7, 10)  # ~two quarters later
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "R", "O", d0),
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "R", "O", d1),
        (3, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "A", "O", d1),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate TIMESTAMP",
    ).createOrReplaceTempView("lineitem")
    rows_out = run_parts(spark, _returnflag_shift_parts).collect()
    got = {(r["quarter_idx"], r["flag"]): r.asDict() for r in rows_out}
    assert len(got) == 4  # 2 quarters x 2 flags, dense
    q0 = min(q for q, _f in got)
    assert got[(q0, "A")]["n_items"] == 0
    assert got[(q0, "A")]["expected"] > 0.0
    assert got[(q0, "A")]["chi2_contribution"] > 0.0


def test_survivorship_cross_source_attribution(spark):
    from fiveg_spark.operators.dedup import _survivorship_parts
    from fiveg_spark.plans.registry import run_parts

    rows = [
        (0, "shared text body here", "s1", "en", 0),
        (1, "shared text body here", "s2", "en", 0),
        (2, "unique to s2 entirely", "s2", "en", 0),
    ]
    # schema order: doc_id, text, lang, source, n_chars
    rows = [(r[0], r[1], r[3], r[2], r[4]) for r in rows]
    _docs_view(spark, rows)
    got = {r["source"]: r.asDict()
           for r in run_parts(spark, _survivorship_parts).collect()}
    assert got["s1"]["n_removed"] == 0
    assert got["s2"]["n_removed"] == 1
    # the surviving copy lives in s1 -> s2's loss is CROSS-source
    assert got["s2"]["n_lost_cross_source"] == 1
    assert got["s2"]["cross_source_loss_rate"] == 0.5


def test_minhash_estimate_exact_duplicates_calibrate_at_one(spark):
    from fiveg_spark.operators.dedup import _minhash_estimate_parts

    text = _words(0, 12)  # 12 tokens -> 10 shingles, identical sets
    rows = [
        (0, text, "en", "s", 0),
        (1, text, "en", "s", 0),
    ]
    _docs_view(spark, rows)
    got = run_parts(spark, _minhash_estimate_parts).collect()
    assert len(got) == 1
    r = got[0].asDict()
    # identical shingle sets: every lane agrees, exact J = 1.0
    assert r["n_lane_match"] == 8
    assert r["est_jaccard"] == 1.0
    assert r["exact_jaccard"] == 1.0
    assert r["abs_err"] == 0.0
    assert r["calibration_ok"] is True


def test_rank_agreement_single_neighbor_guard(spark):
    from fiveg_spark.operators.similarity import _rank_agreement_sql

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.5, 0.5, 0.0, 0.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).createOrReplaceTempView("embeddings")
    got = spark.sql(_rank_agreement_sql("spark")).collect()
    # one probe (vec_id 0), one neighbor: n(n^2-1) = 0 -> the r8 guard
    # must yield rho 0.0 (dbl convention), not an ANSI crash
    assert len(got) == 1
    r = got[0].asDict()
    assert r["n_ranked"] == 1
    assert r["spearman_rho"] == 0.0
    assert r["top1_agree"] is True
