"""Misra-Gries heavy hitters: the merge-level error bound must hold
against exact counts, and a planted dominant term must surface."""

from __future__ import annotations

import tests.conftest as c
from fiveg_spark.operators.sketches import heavy_hitters


def test_mg_bound_holds_on_corpus(spark):
    rows = heavy_hitters(spark, c.SF_DIR, k=15, capacity=64).collect()
    assert len(rows) == 15
    for r in rows:
        assert r["est_count"] <= r["exact_count"] <= r["est_count"] + r["max_err"], r
    # descending by estimate
    ests = [r["est_count"] for r in rows]
    assert ests == sorted(ests, reverse=True)


def test_mg_finds_planted_heavy_term(spark, tmp_path):
    # corpus where 'zzz' is 30% of all tokens, rest are near-unique
    docs = spark.createDataFrame(
        [(i, ("zzz " * 3 + f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g").strip(), "en", "s", 0) for i in range(300)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(path)
    rows = heavy_hitters(spark, str(tmp_path), k=5, capacity=32).collect()
    assert rows[0]["term"] == "zzz"
    assert rows[0]["exact_count"] == 900
    assert rows[0]["est_count"] <= 900 <= rows[0]["est_count"] + rows[0]["max_err"]
