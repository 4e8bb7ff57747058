"""Curation-operator semantics: determinism, rate accuracy, funnel math."""

from __future__ import annotations

import hashlib

from fiveg_spark.operators.curation import _RATES, QUERIES

import tests.conftest as c

_Q = {q.name: q for q in QUERIES}


def _run(spark, name):
    return _Q[name].run(spark, c.SF_DIR).toPandas()


def test_stratified_sample_rates_and_determinism(spark, duck):
    out = _run(spark, "stratified_sample")
    again = _run(spark, "stratified_sample")
    assert out.sort_values("source").equals(again.sort_values("source"))
    for _, row in out.iterrows():
        rate = _RATES[row["source"]]
        # binomial tolerance on small per-source counts
        assert abs(row["realized_rate"] - rate) < 0.35


def test_stratified_sample_matches_python_md5(spark, duck):
    # independently recompute membership for every doc in one source
    docs = duck.execute("SELECT doc_id, source FROM documents").df()
    expected = 0
    for _, r in docs[docs["source"] == "src0"].iterrows():
        h = hashlib.md5(f"mix#{r['doc_id']}".encode()).hexdigest()[:8]
        expected += h < format(int(_RATES["src0"] * 16**8), "08x")
    out = _run(spark, "stratified_sample")
    assert out[out["source"] == "src0"]["n_sampled"].iloc[0] == expected


def test_hash_split_partitions_corpus(spark, duck):
    out = _run(spark, "hash_split")
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert out["n_docs"].sum() == n_docs
    shares = out.groupby("split")["n_docs"].sum() / n_docs
    assert shares["train"] > 0.8
    assert shares.get("val", 0) < 0.15
    assert shares.get("test", 0) < 0.15


def test_curation_funnel_conserves_docs(spark, duck):
    out = _run(spark, "curation_funnel")
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert out["n_docs"].sum() == n_docs
    stages = out[["n_dropped_dup", "n_dropped_len", "n_dropped_quality", "n_kept"]]
    assert (stages.sum(axis=1) == out["n_docs"]).all()
    assert out["n_kept"].sum() > 0


def test_topk_sample_matches_python_md5(spark, duck):
    docs = duck.execute("SELECT doc_id, source FROM documents").df()
    sub = docs[docs["source"] == "src0"]
    ranked = sorted(
        (hashlib.md5(f"topk#{int(r['doc_id'])}".encode()).hexdigest()[:8], int(r["doc_id"]))
        for _, r in sub.iterrows()
    )
    expected_ids = sorted(doc_id for _, doc_id in ranked[:5])
    out = _run(spark, "per_source_topk_sample")
    row = out[out["source"] == "src0"].iloc[0]
    assert row["n_sampled"] == min(5, len(sub))
    assert row["sample_id_sum"] == sum(expected_ids)
    assert row["sample_id_min"] == expected_ids[0]
    assert row["sample_id_max"] == expected_ids[-1]


def test_snapshot_diff_classes_are_exhaustive_and_correct(spark):
    from fiveg_spark.operators.curation import _snapshot_diff_sql

    rows = [
        # doc_id 0: %5=0 AND %7=0 AND %11=0 -> in neither snapshot (absent)
        (0, "zero doc", "en", "s1", 0),
        (5, "added later", "en", "s1", 0),     # %5=0 -> added
        (11, "removed in v1", "en", "s1", 0),  # %11=0 -> removed
        (7, "edited text", "en", "s1", 0),     # %7=0 -> changed
        (1, "stable text", "en", "s1", 0),     # unchanged
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.createOrReplaceTempView("documents")
    got = {r["source"]: r.asDict() for r in spark.sql(_snapshot_diff_sql("spark")).collect()}
    s = got["s1"]
    assert s["n_old"] == 3 and s["n_new"] == 3
    assert s["n_added"] == 1 and s["n_removed"] == 1
    assert s["n_changed"] == 1 and s["n_unchanged"] == 1
    # churn = (1+1+1)/3
    assert abs(s["churn_rate"] - 1.0) < 1e-3
    import hashlib

    assert s["changed_ids_hash"] == hashlib.md5(b"7").hexdigest()


def test_quality_prune_keeps_per_source_top_quartile(spark):
    from fiveg_spark.operators.curation import _quality_prune_sql

    # source s1: four docs with strictly increasing quality (varying
    # stopword ratio at fixed 20+ token length); p75 cutoff keeps the
    # best one (plus any tie).  source s2: uniform quality -> cutoff
    # equals every score -> ALL kept (tie-at-cutoff rule).
    def doc(n_stop, n_plain):
        return " ".join(["the"] * n_stop + ["word"] * n_plain)

    rows = [
        (0, doc(12, 8), "en", "s1", 0),   # stopword-heavy -> lowest q
        (1, doc(8, 12), "en", "s1", 0),
        (2, doc(4, 16), "en", "s1", 0),
        (3, doc(0, 20), "en", "s1", 0),   # cleanest -> highest q
        (4, doc(5, 15), "en", "s2", 0),
        (5, doc(5, 15), "en", "s2", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.createOrReplaceTempView("documents")
    got = {r["source"]: r.asDict() for r in spark.sql(_quality_prune_sql("spark")).collect()}
    import hashlib

    s1 = got["s1"]
    assert s1["n_docs"] == 4 and s1["n_kept"] == 1
    assert s1["kept_ids_hash"] == hashlib.md5(b"3").hexdigest()
    s2 = got["s2"]
    assert s2["n_kept"] == 2  # uniform source: everything ties the cutoff
    assert abs(s2["kept_rate"] - 1.0) < 1e-9


def test_dup_audit_group_sampling_unbiased_row_sampling_low(spark):
    # 100 distinct docs, 50 of them duplicated 3x -> 200 docs total,
    # exact dup rate = (200-100)/200 = 0.5.  The content-hash sample
    # keeps whole duplicate groups (estimator lands near 0.5); the
    # doc_id sample splits groups and must come in LOW.
    from fiveg_spark.operators.curation import _dup_audit_sql

    rows = []
    did = 0
    for i in range(50):  # unique docs
        rows.append((did, f"unique text number {i}", "en", "s1", 20))
        did += 1
    for i in range(50):  # each duplicated 3x
        for _ in range(3):
            rows.append((did, f"duplicated text number {i}", "en", "s1", 24))
            did += 1
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).createOrReplaceTempView("documents")
    (r,) = spark.sql(_dup_audit_sql("spark")).collect()
    assert r["n_docs"] == 200
    assert abs(r["dup_rate_exact"] - 0.5) < 1e-9
    assert r["group_est_ok"]
    assert abs(r["dup_rate_group_est"] - 0.5) < 0.2
    # row sampling splits groups: biased LOW on this corpus
    assert r["dup_rate_row_est"] < r["dup_rate_group_est"]


def test_quality_dup_calibration_planted_low_quality_dups(spark):
    # duplicated docs are stopword-soup (low quality score); unique docs
    # are clean: the low-quality buckets must carry all the lift
    from fiveg_spark.operators.curation import _quality_dup_calibration_parts
    from fiveg_spark.plans.registry import run_parts

    rows = []
    did = 0
    junk = " ".join(["the a of and"] * 8)  # stopword-heavy -> low score
    for i in range(30):  # duplicated junk, 2 copies each
        for _ in range(2):
            rows.append((did, junk, "en", "s1", len(junk)))
            did += 1
    for i in range(60):  # unique clean docs
        text = " ".join(f"token{i}w{j}" for j in range(30))
        rows.append((did, text, "en", "s1", len(text)))
        did += 1
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).createOrReplaceTempView("documents")
    got = [r.asDict()
           for r in run_parts(spark, _quality_dup_calibration_parts).collect()]
    assert sum(r["n_docs"] for r in got) == 120
    lows = [r for r in got if r["avg_quality"] < 0.3]
    highs = [r for r in got if r["avg_quality"] > 0.7]
    assert lows and highs
    assert all(r["dup_rate"] == 1.0 for r in lows)  # junk is all dups
    assert all(r["dup_rate"] == 0.0 for r in highs)
    assert all(r["lift_vs_base"] > 1.5 for r in lows)
