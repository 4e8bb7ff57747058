"""Postings-index artifact: pushed-down term lookups and exact
equivalence of index-scored BM25 with the certified corpus-scan query."""

from __future__ import annotations

from fiveg_spark.sources.postings import (
    bm25_from_postings,
    lookup_terms,
    write_postings,
)
from fiveg_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_term_lookup_is_pushed_down(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_postings(spark, load_table(spark, "documents", SF_DIR), path)
    plan = lookup_terms(spark, path, ["spark", "table"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters: [In(term" in plan, plan


def test_bm25_from_postings_matches_corpus_scan_exactly(spark, tmp_path):
    from fiveg_spark.operators.text import BM25_QUERIES, _bm25_parts
    from fiveg_spark.plans.registry import ensure_views, run_parts

    path = str(tmp_path / "idx")
    docs = load_table(spark, "documents", SF_DIR)
    write_postings(spark, docs, path)

    ensure_views(spark, ("documents",), SF_DIR)
    want = [tuple(r) for r in run_parts(spark, _bm25_parts).collect()]
    got = [tuple(r) for r in bm25_from_postings(spark, path, BM25_QUERIES).collect()]
    assert got == want  # the index is a layout change, not semantics


def test_postings_lists_are_docid_sorted_and_df_consistent(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_postings(spark, load_table(spark, "documents", SF_DIR), path)
    rows = spark.read.parquet(f"{path}/postings").collect()
    assert rows
    for r in rows:
        ids = [p["doc_id"] for p in r["postings"]]
        assert ids == sorted(ids)
        assert r["df"] == len(ids)


def test_index_parity_survives_edge_whitespace_docs(spark, tmp_path):
    """Regression (r7 self-review): write_postings used to F.trim()
    where the certified chain does not, so a doc with leading or
    trailing whitespace shifted dl/avgdl between the two paths and
    broke row-for-row parity.  Plant exactly that corpus."""
    from pyspark.sql import functions as F

    from fiveg_spark.operators.text import BM25_QUERIES, _bm25_parts
    from fiveg_spark.plans.registry import run_parts

    rows = [
        (0, " spark join shuffle ", "en", "s", 20),   # edge whitespace
        (1, "spark join window functions", "en", "s", 27),
        (2, "filter merge stream batch", "en", "s", 25),
    ] + [(3 + i, "filler body text padding words", "en", "s2", 30)
         for i in range(7)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.createOrReplaceTempView("documents")
    path = str(tmp_path / "idx")
    write_postings(spark, df, path)
    want = [tuple(r) for r in run_parts(spark, _bm25_parts).collect()]
    got = [tuple(r) for r in bm25_from_postings(spark, path, BM25_QUERIES).collect()]
    assert got == want
