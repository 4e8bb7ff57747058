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


def test_kmv_set_ops_discriminates_planted_overlaps(spark):
    # A: users 0..99; B: users 50..149 (|A∩B|=50, |A∪B|=150, J=1/3);
    # C: users 200..299 (disjoint from both).  k=64 sketches must
    # estimate within the in-row bounds AND discriminate the planted
    # structure: J(A,B) well above 0, J(A,C)=J(B,C)=0 exactly (no
    # shared hash can enter both sketches).
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for typ, lo, hi in (("A", 0, 100), ("B", 50, 150), ("C", 200, 300)):
        for u in range(lo, hi):
            rows.append((eid, t0, typ, u, 1.0, "{}"))
            eid += 1
    _events_view(spark, rows)
    from fiveg_spark.plans.registry import run_parts

    got = {
        (r["type_a"], r["type_b"]): r.asDict()
        for r in run_parts(spark, rs._kmv_set_ops_parts).collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert ab["exact_union"] == 150 and ab["exact_inter"] == 50
    assert ab["union_ok"] and ab["inter_ok"] and ab["jaccard_ok"]
    assert ab["est_jaccard"] > 0.15  # clearly nonzero
    for pair in (("A", "C"), ("B", "C")):
        r = got[pair]
        assert r["exact_inter"] == 0
        assert r["est_jaccard"] == 0.0  # disjoint sets share no hashes
        assert r["union_ok"] and r["inter_ok"] and r["jaccard_ok"]


def test_theta_sketch_overlap_discriminates_planted_overlaps(spark):
    # Token ranges make shingle sets exactly controllable: a doc of
    # tokens w_lo..w_hi contributes 3-gram shingles starting at
    # lo..hi-2.  s1 covers tokens 0..399, s2 covers 200..599 (planted
    # ~50% overlap, both > THETA_K distinct shingles so the ESTIMATION
    # branch runs, not the under-k exact fallback), s3 covers
    # 1000..1399 (disjoint).
    def doc_text(lo, hi):
        return " ".join(f"w{i}" for i in range(lo, hi))

    rows = []
    did = 0
    for src, lo, hi in (("s1", 0, 400), ("s2", 200, 600), ("s3", 1000, 1400)):
        # split each range into 4 docs with 2-token seams so the shingle
        # set is exactly the per-doc union (seam shingles are absent)
        step = (hi - lo) // 4
        for j in range(4):
            text = doc_text(lo + j * step, lo + (j + 1) * step)
            rows.append((did, text, "en", src, len(text)))
            did += 1
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).createOrReplaceTempView("documents")
    from fiveg_spark.plans.registry import run_parts

    got = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in run_parts(spark, rs._theta_overlap_parts).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    ab = got[("s1", "s2")]
    # each source: 4 docs x (100-token chunk -> 98 shingles) = 392;
    # s1 n s2 = chunk-level shared shingles of tokens 200..399 = 196
    assert ab["exact_inter"] == 196 and ab["exact_union"] == 2 * 392 - 196
    assert ab["union_ok"] and ab["inter_ok"] and ab["jaccard_ok"]
    assert ab["est_jaccard"] > 0.1  # clearly nonzero
    for pair in (("s1", "s3"), ("s2", "s3")):
        r = got[pair]
        assert r["exact_inter"] == 0
        assert r["est_inter"] == 0.0  # disjoint sets share no hashes
        assert r["union_ok"] and r["inter_ok"] and r["jaccard_ok"]


def test_hll_sliding_actives_window_semantics(spark, tmp_path):
    # users rotate daily: day d has users {d, d+1}.  The trailing-7-day
    # actives at day d must be |union of {i, i+1} for i in d-6..d| =
    # 8 for full windows, and partial early windows shrink accordingly.
    import pandas as pd

    rows = []
    eid = 0
    for d in range(10):
        for u in (d, d + 1):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + d), "click", u, 1.0, "{}")
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "event_type", "user_id", "value", "props"]
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from fiveg_spark.operators.sketches import hll_sliding_actives

    got = {
        r["window_day"]: r.asDict()
        for r in hll_sliding_actives(spark, str(tmp_path)).collect()
    }
    days = sorted(got)
    assert len(days) == 10
    first, last = got[days[0]], got[days[-1]]
    assert first["n_days_present"] == 1 and first["exact_users"] == 2
    assert last["n_days_present"] == 7
    # union of {3..9} x {d, d+1} = users 3..10 -> 8 distinct
    assert last["exact_users"] == 8
    assert all(r["hll_ok"] for r in got.values())
    mid = got[days[6]]  # first FULL window: days 0..6 -> users 0..7
    assert mid["n_days_present"] == 7 and mid["exact_users"] == 8


def test_bloom_membership_no_false_negatives_and_estimate(spark):
    # two types with disjoint user ranges: every present probe must be
    # claimed (no-FN theorem), absent negative ids almost surely are
    # not, and the fill-ratio estimate tracks the exact count.
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for typ, lo, hi in (("A", 0, 200), ("B", 500, 520)):
        for u in range(lo, hi):
            rows.append((eid, t0, typ, u, 1.0, "{}"))
            eid += 1
    _events_view(spark, rows)
    from fiveg_spark.plans.registry import run_parts
    from fiveg_spark.operators.sketches import _bloom_parts

    got = {r["event_type"]: r.asDict()
           for r in run_parts(spark, _bloom_parts).collect()}
    assert set(got) == {"A", "B"}
    for r in got.values():
        assert r["no_false_negatives"] and r["est_ok"], r
        assert r["n_claimed"] >= r["n_members"]
    assert got["A"]["n_exact"] == 200 and got["B"]["n_exact"] == 20
    # probes from A's range are absent in B's filter: with 20·3 bits in
    # 4096 the per-probe FP chance is ~3e-6, so zero FPs expected
    assert got["B"]["fp_count"] == 0


def test_littles_law_two_paths_agree_and_invalids_drop(spark):
    import datetime as dt

    from fiveg_spark.operators.rollup_stats import _littles_law_parts
    from fiveg_spark.plans.registry import run_parts

    t0 = dt.datetime(2024, 1, 1)

    def day(n):
        return t0 + dt.timedelta(days=n)

    orders = [
        (1, day(0)),   # ships day 10: sojourn 10d
        (2, day(1)),   # ships day 5:  sojourn 4d
        (3, day(2)),   # ships day 2:  zero-length -> invalid, dropped
        (4, day(3)),   # ships day 1:  inverted -> invalid, dropped
    ]
    spark.createDataFrame(
        [(k, 0, "O", 1.0, d, "1-URGENT") for k, d in orders],
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).createOrReplaceTempView("orders")
    ships = {1: day(10), 2: day(5), 3: day(2), 4: day(1)}
    spark.createDataFrame(
        [(k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", s)
         for k, s in ships.items()],
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
        " l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,"
        " l_linestatus STRING, l_shipdate TIMESTAMP",
    ).createOrReplaceTempView("lineitem")

    (r,) = run_parts(spark, _littles_law_parts).collect()
    assert r["n_orders"] == 2 and r["n_invalid_intervals"] == 2
    assert r["span_days"] == 10.0
    # lambda = 2/10, W = (10+4)/2 = 7 -> L = 1.4 from the sojourn sum
    assert r["lambda_per_day"] == 0.2 and r["w_days"] == 7.0
    assert r["l_direct"] == 1.4
    # sweep integral: WIP 1 on [0,1), 2 on [1,5), 1 on [5,10) -> 14/10
    assert r["l_sweep"] == 1.4
    assert r["littles_law_ok"] is True
