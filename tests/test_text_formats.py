"""JSONL/CSV ingestion: round-trip + corrupt-line quarantine, and the
HLL mergeable-rollup error bound."""

from __future__ import annotations

from pyspark.sql import types as T

from fiveg_spark.operators.sketches import hll_rollup
from fiveg_spark.sources.text_formats import read_csv, read_jsonl, write_jsonl
from tests.conftest import SF_DIR

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, partitions=2)

    # inject malformed lines alongside the clean part-files
    bad = tmp_path / "docs_jsonl" / "part-badlines.json"
    bad.write_text(
        '{"doc_id": 999999991, "text": "ok", "lang": "en"}\n{broken json\nnot json at all\n'
    )

    clean, quarantine = read_jsonl(spark, out, DOC_SCHEMA)
    assert clean.count() == docs.count() + 1
    assert quarantine.count() == 2
    # round-trip fidelity on a sample row
    orig = {r["doc_id"]: r["text"] for r in docs.limit(50).collect()}
    got = {
        r["doc_id"]: r["text"]
        for r in clean.filter(clean.doc_id.isin(*orig.keys())).collect()
    }
    assert {k: v for k, v in got.items() if k in orig} == orig


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    out = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", "true").csv(out)
    bad = tmp_path / "docs_csv" / "part-badlines.csv"
    bad.write_text("doc_id,lang,n_chars\nnot_a_number,en,xyz\n")

    clean, quarantine = read_csv(spark, out, schema)
    assert clean.count() == docs.count()
    assert quarantine.count() == 1


def test_hll_rollup_error_bound(spark):
    out = hll_rollup(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert r["rel_err"] < 0.05, (r["event_type"], r["rel_err"])
        assert r["n_days"] > 1  # the merge actually merged multiple sketches
