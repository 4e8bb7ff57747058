"""Literal-frame tests proving the token statistics compute what they
claim (the parity run only proves engine agreement)."""

from __future__ import annotations

import math

import pytest

from fiveg_spark.operators import text_stats as ts


def _docs_view(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.createOrReplaceTempView("documents")


def test_bpe_pairs_count_and_pmi(spark):
    # corpus: "a b a b" + "a b c" -> pairs: (a b)x3, (b a)x1, (b c)x1
    _docs_view(
        spark,
        [
            (0, "a b a b", "en", "s", 0),
            (1, "a b c", "en", "s", 0),
            (2, "solo", "en", "s", 0),  # <2 tokens -> no pairs, no crash
        ],
    )
    from fiveg_spark.plans.registry import run_parts

    rows = {r["pair"]: r.asDict() for r in run_parts(spark, ts._bpe_pair_stats_parts).collect()}
    assert rows["a b"]["pair_count"] == 3
    assert rows["a b"]["left_count"] == 3  # unigram a appears 3x
    assert rows["a b"]["right_count"] == 3
    assert rows["b a"]["pair_count"] == 1
    # pmi(a,b) = ln(c_ab * T^2 / (N * c_a * c_b)); T=8 tokens, N=5 pairs
    expect = math.log(3 * 8 * 8 / (5 * 3 * 3))
    assert rows["a b"]["pmi"] == pytest.approx(expect, abs=1e-3)


def test_vocab_growth_heaps(spark):
    _docs_view(
        spark,
        [
            (0, "x x x y", "en", "s1", 0),  # T=4, V=2, hapax={y}
            (1, "p q r", "en", "s2", 0),  # T=3, V=3, all hapax
        ],
    )
    rows = {r["source"]: r.asDict() for r in spark.sql(ts._vocab_growth_sql("spark")).collect()}
    assert rows["s1"]["total_tokens"] == 4
    assert rows["s1"]["vocab_size"] == 2
    assert rows["s1"]["hapax_terms"] == 1
    assert rows["s1"]["type_token_ratio"] == pytest.approx(0.5, abs=1e-3)
    assert rows["s1"]["heaps_exponent"] == pytest.approx(math.log(2) / math.log(4), abs=1e-3)
    assert rows["s2"]["hapax_frac"] == pytest.approx(1.0, abs=1e-3)


def test_zipf_slope_recovers_exact_power_law(spark):
    # counts 12/6/4/3 = 12/rank for ranks 1..4 -> ln c = ln 12 - 1*ln r:
    # a perfect Zipf line, so the OLS fit must recover slope -1, r2 = 1.
    _docs_view(
        spark,
        [
            (0, " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3), "en", "s1", 0),
            (1, "p p q", "en", "s2", 0),  # 2 terms: fit is exact through 2 pts
        ],
    )
    rows = {r["source"]: r.asDict() for r in spark.sql(ts._zipf_slope_sql("spark")).collect()}
    assert rows["s1"]["n_terms"] == 4
    assert rows["s1"]["zipf_slope"] == pytest.approx(-1.0, abs=1e-3)
    assert rows["s1"]["intercept"] == pytest.approx(math.log(12), abs=1e-3)
    assert rows["s1"]["r2"] == pytest.approx(1.0, abs=1e-3)
    # two points: slope = (ln1 - ln2)/(ln2 - ln1) with c = 2,1 -> -1 exactly
    assert rows["s2"]["n_terms"] == 2
    assert rows["s2"]["zipf_slope"] == pytest.approx(-1.0, abs=1e-3)


def test_zipf_slope_degenerate_sources_no_nan(spark):
    # single-term source (x variance exactly 0) and equal-count source
    # (y variance 0): both must yield finite guarded values, never NaN
    _docs_view(
        spark,
        [
            (0, "solo solo solo", "en", "one_term", 0),
            (1, "p q r s", "en", "flat", 0),  # all counts 1 -> y constant
        ],
    )
    rows = {r["source"]: r.asDict() for r in spark.sql(ts._zipf_slope_sql("spark")).collect()}
    import math as _m

    one = rows["one_term"]
    assert one["n_terms"] == 1
    assert one["zipf_slope"] == 0.0 and one["r2"] == 0.0
    assert one["intercept"] == pytest.approx(_m.log(3), abs=1e-3)  # mean y
    flat = rows["flat"]
    assert flat["zipf_slope"] == pytest.approx(0.0, abs=1e-3)
    assert flat["r2"] == 0.0
    for r in rows.values():
        for col in ("zipf_slope", "intercept", "r2"):
            assert not _m.isnan(r[col]), (r["source"], col)


def test_unigram_ppl_hand_computed(spark):
    _docs_view(
        spark,
        [
            (0, "a a b", "en", "s", 0),
            (1, "c", "en", "s", 0),
        ],
    )
    from fiveg_spark.plans.registry import run_parts

    rows = {
        r["doc_id"]: r.asDict()
        for r in run_parts(spark, ts._unigram_ppl_parts).collect()
    }
    # T=4: p(a)=1/2, p(b)=1/4, p(c)=1/4
    nll0 = -(math.log(0.5) * 2 + math.log(0.25)) / 3
    nll1 = -math.log(0.25)
    assert rows[0]["avg_nll"] == pytest.approx(nll0, abs=1e-3)
    assert rows[1]["avg_nll"] == pytest.approx(nll1, abs=1e-3)
    assert rows[1]["ppl"] == pytest.approx(4.0, abs=1e-3)
    # rare-token doc is MORE surprising than common-token doc
    assert rows[1]["avg_nll"] > rows[0]["avg_nll"]


def test_bm25_ranks_full_matches_above_partial_and_rare_terms_higher(spark):
    from fiveg_spark.operators.text import BM25_TOPK, _bm25_parts
    from fiveg_spark.plans.registry import run_parts

    # doc 0 holds all three q_stream terms, doc 1 two, doc 2 one; docs
    # 3-9 are query-free filler that shapes idf (every query term stays
    # rare) without entering any ranking
    rows = [
        (0, "spark stream window runs fine", "en", "s1", 29),
        (1, "spark stream only here", "en", "s1", 22),
        (2, "spark alone in this doc", "en", "s1", 23),
    ] + [
        (3 + i, "filler words padding text body", "en", "s2", 30)
        for i in range(7)
    ]
    _docs_view(spark, rows)
    got = [
        r.asDict()
        for r in run_parts(spark, _bm25_parts).collect()
        if r["query_id"] == "q_stream"
    ]
    assert [r["doc_id"] for r in got[:3]] == [0, 1, 2]
    assert [r["n_terms_matched"] for r in got[:3]] == [3, 2, 1]
    assert got[0]["bm25"] > got[1]["bm25"] > got[2]["bm25"] > 0
    assert len(got) <= BM25_TOPK


def test_retrieval_eval_perfect_ranking_gets_ndcg_1(spark):
    from fiveg_spark.operators.text import _retrieval_eval_parts
    from fiveg_spark.plans.registry import run_parts

    # q_stream docs: BM25 ranks the 3-term match above 2-term above
    # 1-term (idf-uniform filler), which IS the ideal overlap ordering
    # -> nDCG = 1.0 and MRR = 1.0 (first hit matches >= 2 terms)
    rows = [
        (0, "spark stream window runs fine", "en", "s1", 29),
        (1, "spark stream only here", "en", "s1", 22),
        (2, "spark alone in this doc", "en", "s1", 23),
    ] + [
        (3 + i, "filler words padding text body", "en", "s2", 30)
        for i in range(7)
    ]
    _docs_view(spark, rows)
    got = {r["query_id"]: r.asDict()
           for r in run_parts(spark, _retrieval_eval_parts).collect()}
    q = got["q_stream"]
    assert q["ndcg"] == 1.0
    assert q["mrr"] == 1.0
    assert q["dcg"] == q["idcg"] > 0


def test_ngram_novelty_separates_template_from_unique(spark):
    # docs 0/1 share the SAME template text -> every shingle has df = 2
    # -> novelty 0, avg_df 2.  doc 2 is wholly original -> novelty 1.
    # doc 3 has < 3 tokens -> no shingles -> absent.
    _docs_view(
        spark,
        [
            (0, "the quick brown fox jumps over the lazy dog", "en", "s", 0),
            (1, "the quick brown fox jumps over the lazy dog", "en", "s", 0),
            (2, "entirely original content with unique wording here", "en", "s", 0),
            (3, "too short", "en", "s", 0),
        ],
    )
    got = {r["doc_id"]: r.asDict()
           for r in spark.sql(ts._ngram_novelty_sql("spark")).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["novelty"] == 0.0 and got[0]["avg_df"] == 2.0
    assert got[1]["novelty"] == 0.0
    assert got[2]["novelty"] == 1.0 and got[2]["avg_df"] == 1.0
    assert got[2]["n_unique"] == got[2]["n_shingles"]


def test_hybrid_fusion_merges_lexical_and_dense_rankings(spark):
    from fiveg_spark.operators.similarity import _hybrid_fusion_parts
    from fiveg_spark.plans.registry import run_parts

    # doc 0 is q_stream's lexical winner; doc 5 never matches a query
    # term but its embedding is nearly doc 0's -> it must enter the
    # fused list through the dense modality alone (rank_lex = 0)
    rows = [
        (0, "spark stream window runs fine", "en", "s1", 29),
        (1, "spark stream only here", "en", "s1", 22),
        (2, "spark alone in this doc", "en", "s1", 23),
    ] + [
        (3 + i, "filler words padding text body", "en", "s2", 30)
        for i in range(7)
    ]
    _docs_view(spark, rows)
    import math

    embs = []
    for i in range(10):
        if i == 0:
            v = [1.0, 0.0, 0.0, 0.0]
        elif i == 5:
            v = [0.99, 0.141, 0.0, 0.0]  # cosine ~0.99 with doc 0
        else:
            a = 2.0 + i
            v = [0.0, 0.0, math.cos(a), math.sin(a)]  # orthogonal to doc 0
        embs.append((i, v, i % 3))
    spark.createDataFrame(
        embs, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).createOrReplaceTempView("embeddings")
    got = [
        r.asDict()
        for r in run_parts(spark, _hybrid_fusion_parts).collect()
        if r["query_id"] == "q_stream"
    ]
    assert got[0]["doc_id"] == 0
    assert got[0]["in_both"] is True
    assert got[0]["rank_lex"] == 1 and got[0]["rank_dense"] == 1
    dense_only = next(r for r in got if r["doc_id"] == 5)
    assert dense_only["rank_lex"] == 0 and dense_only["rank_dense"] == 2
    assert abs(dense_only["rrf_score"] - 1.0 / 62.0) < 1e-3
    scores = [r["rrf_score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_stopword_divergence_pins_planted_register_drift(spark):
    from fiveg_spark.operators.text_stats import (
        _SW_PROFILE,
        _stopword_divergence_parts,
    )
    from fiveg_spark.plans.registry import run_parts

    # source "drift" speaks only 'the' (a degenerate function-word
    # register); source "base" uses the whole 12-word profile evenly.
    base_text = " ".join(_SW_PROFILE)
    _docs_view(
        spark,
        [(i, "the the the the the", "en", "drift", 19) for i in range(4)]
        + [(10 + i, base_text, "en", "base", len(base_text)) for i in range(10)],
    )
    got = {r["source"]: r.asDict()
           for r in run_parts(spark, _stopword_divergence_parts).collect()}

    # replicate the exact PSI-discipline arithmetic: floor 1e-4,
    # round 6 dp, THEN ln
    drift_total, base_total = 4 * 5, 10 * 12
    corpus_total = drift_total + base_total
    corpus = {w: 10 for w in _SW_PROFILE}
    corpus["the"] += drift_total

    def share(n, total):
        return round(max(n / total, 1e-4), 6)

    kl_drift = sum(
        share(drift_total if w == "the" else 0, drift_total)
        * math.log(share(drift_total if w == "the" else 0, drift_total)
                   / share(corpus[w], corpus_total))
        for w in _SW_PROFILE
    )
    assert got["drift"]["n_stop_tokens"] == drift_total
    assert abs(got["drift"]["kl_divergence"] - round(kl_drift, 4)) < 1e-3
    assert got["drift"]["top_word"] == "the"
    assert got["drift"]["kl_divergence"] > 3 * got["base"]["kl_divergence"]


def test_token_fertility_pins_repeated_shingle_compression(spark):
    # "x x x x x": 5 tokens, 3 shingles, 1 distinct -> compression 1/3
    # = 1/(n-2); the 2-token doc has no shingles -> convention 1.0
    _docs_view(
        spark,
        [
            (0, "x x x x x", "en", "rep", 9),
            (1, "a b", "en", "tiny", 3),
        ],
    )
    got = {r["source"]: r.asDict()
           for r in spark.sql(ts._token_fertility_sql("spark")).collect()}
    rep = got["rep"]
    assert rep["n_docs"] == 1 and rep["total_tokens"] == 5
    assert abs(rep["shingle_compression"] - 1.0 / 3.0) < 1e-4
    assert abs(rep["chars_per_token"] - 9.0 / 5.0) < 1e-9
    assert rep["tokens_per_doc"] == 5.0
    tiny = got["tiny"]
    assert tiny["total_tokens"] == 2
    assert tiny["shingle_compression"] == 1.0
    assert tiny["chars_per_token"] == 1.5


def test_oov_rate_separates_junk_source_from_common_speech(spark):
    from fiveg_spark.operators.text_stats import VOCAB_K, _oov_rate_parts
    from fiveg_spark.plans.registry import run_parts

    # "common": 30 docs drawn from a tiny shared vocabulary -> its 8
    # types win the frequency race into the vocab, OOV rate 0.
    # "junk": 320 singleton gibberish types; only 256-8 = 248 fit the
    # top-K vocabulary (singleton ties break alphabetically), so
    # exactly 320-248 types — and the same number of tokens — are OOV.
    common_text = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common_text, "en", "common", len(common_text))
            for i in range(30)]
    junk_docs, toks_per = 40, 8
    for j in range(junk_docs):
        text = " ".join(f"zzq{j:03d}x{t}" for t in range(toks_per))
        rows.append((100 + j, text, "en", "junk", len(text)))
    _docs_view(spark, rows)
    got = {r["source"]: r.asDict()
           for r in run_parts(spark, _oov_rate_parts).collect()}

    common = got["common"]
    assert common["oov_token_rate"] == 0.0 and common["n_oov"] == 0
    assert common["n_types"] == 8  # 'the' repeats

    junk = got["junk"]
    n_junk_types = junk_docs * toks_per
    assert n_junk_types > VOCAB_K  # the test must overflow the vocab
    expected_oov = n_junk_types - (VOCAB_K - 8)
    assert junk["n_tokens"] == junk["n_types"] == n_junk_types
    assert junk["n_oov"] == junk["n_oov_types"] == expected_oov
    assert junk["oov_token_rate"] == round(expected_oov / n_junk_types, 4)
