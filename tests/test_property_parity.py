"""Property-based ENGINE parity: hypothesis-generated corpora, not the
fixed testdata, through both engines with the driver's comparator.

The fixed-SF oracle gate proves agreement on ONE data distribution; the
degenerate shapes it never contains (single-term sources, equal-count
vocabularies, empty/short texts, float-edge prices, empty tables) are
exactly where 0/0, NaN-vs-NULL, and clamp bugs hide — two such bugs
survived to review in round 5 (zipf NaN, benford digit-0).  This gate
feeds those shapes in on purpose, forever.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

# slow layer (r14): the hypothesis fuzz gate is the heaviest file in the
# suite (~11 min) — excluded from the default driver-budget run, run in
# full locally with -m 'slow or not slow'.
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fiveg_spark.operators.dedup import (
    _dedup_exact_sql,
    _incremental_dedup_sql,
    _incremental_minhash_sql,
    _minhash_lsh_sql,
    _ngram_jaccard_sql,
)
from fiveg_spark.operators.llm_curation import (
    _curriculum_cut_sql,
    _doc_chunk_sql,
    _domain_reweight_sql,
    _gopher_quality_sql,
    _mixture_weights_sql,
)
from fiveg_spark.operators.engagement_ext import _token_case_profile_sql
from fiveg_spark.operators.lateness import _source_ingestion_burstiness_sql
from fiveg_spark.operators.quality import _benford_digits_sql
from fiveg_spark.operators.text import _text_normalize_sql, _text_quality_sql
from fiveg_spark.operators.text_stats import (
    _ppl_buckets_parts,
    _unigram_ppl_parts,
    _vocab_growth_sql,
    _zipf_slope_sql,
)
from tests.test_oracle_parity import _rows

# small alphabet -> high collision probability -> duplicate/degenerate
# sources are common, not rare
_WORDS = ["a", "bb", "the", "data", "spark", "x"]

_DOC_SQL = {
    "zipf_slope": _zipf_slope_sql,
    "vocab_growth": _vocab_growth_sql,
    "text_quality": _text_quality_sql,
    "incremental_dedup": _incremental_dedup_sql,
    "gopher_quality": _gopher_quality_sql,
    "mixture_weights": _mixture_weights_sql,
    "domain_mixture_weights": _domain_reweight_sql,
    "text_normalize": _text_normalize_sql,
    # alphabetic-token casing shares: the tiny-word corpus is all
    # lowercase, pinning lower_share at 1.0 and the rest at 0
    "doc_token_case_profile": _token_case_profile_sql,
    # dedup family: tiny-vocab corpora make collisions and ties the
    # common case, exactly where bucketing/tiebreak bugs live
    "dedup_exact": _dedup_exact_sql,
    "minhash_lsh_pairs": _minhash_lsh_sql,
    "ngram_jaccard_pairs": _ngram_jaccard_sql,
    "incremental_minhash_pairs": _incremental_minhash_sql,
    # r11: md5-derived arrival axis + closed-form Fano over the full
    # 1440-minute day; single-doc sources pin active_minutes=1 and the
    # peak/mean ratio at 1440/n_docs — zero-variance guards live here
    "source_ingestion_burstiness": _source_ingestion_burstiness_sql,
    # r12: sliding-window chunking — the tiny corpus makes every doc a
    # single truncated chunk (stride > length), pinning the substring
    # boundary and the nullif-guarded expansion ratio
    "doc_chunk_stats": _doc_chunk_sql,
    # r13: quantile-threshold curriculum — all-equal scores put the cut
    # AT every score (everything admits, share 1.0); single-doc corpora
    # pin the quantile to the lone score
    "quality_curriculum_cut": _curriculum_cut_sql,
}


def _more_doc_sql_fns():
    from fiveg_spark.operators.curation import (
        _curation_sql,
        _dup_audit_sql,
        _hash_split_sql,
        _quality_prune_sql,
        _snapshot_diff_sql,
        _stratified_sample_sql,
        _topk_sample_sql,
        _training_order_sql,
        _weighted_sample_sql,
    )
    from fiveg_spark.operators.llm_curation import (
        _boilerplate_ngrams_sql,
        _pii_luhn_sql,
        _pii_redact_sql,
        _pii_scan_sql,
        _repeated_ngrams_sql,
        _sequence_packing_sql,
    )
    from fiveg_spark.operators.text import (
        _code_detect_sql,
        _doc_fingerprint_sql,
        _lang_id_sql,
        _token_counts_sql,
    )
    from fiveg_spark.operators.curation import _frontier_sql, _quality_trend_sql
    from fiveg_spark.operators.dedup import _line_dedup_sql
    from fiveg_spark.operators.llm_curation import _pii_density_sql
    from fiveg_spark.operators.stats_assoc import _chunk_audit_sql
    from fiveg_spark.operators.text_stats import (
        _coverage_curve_sql,
        _hapax_sql,
        _token_entropy_sql,
    )
    from fiveg_spark.operators.text import (
        _char_class_profile_sql,
        _fingerprint_collision_sql,
        _lang_confusion_sql,
        _sentence_stats_sql,
        _url_markup_screen_sql,
    )
    from fiveg_spark.operators.text_stats import (
        _bigram_entropy_rate_sql,
        _doc_entropy_screen_sql,
        _lognormal_fit_sql,
        _readability_sql,
        _token_length_histogram_sql,
        _yule_k_sql,
    )
    from fiveg_spark.operators.text_stats import (
        _bigram_ppl_sql,
        _ngram_novelty_sql,
        _token_fertility_sql,
    )

    return {
        "boilerplate_ngrams": _boilerplate_ngrams_sql,
        "repeated_ngrams": _repeated_ngrams_sql,
        "bigram_ppl": _bigram_ppl_sql,
        "lang_id": _lang_id_sql,
        "token_counts": _token_counts_sql,
        "doc_fingerprint": _doc_fingerprint_sql,
        "pii_scan": _pii_scan_sql,
        "pii_luhn": _pii_luhn_sql,
        "pii_redact": _pii_redact_sql,
        "sequence_packing": _sequence_packing_sql,
        "stratified_sample": _stratified_sample_sql,
        "hash_split": _hash_split_sql,
        "weighted_sample": _weighted_sample_sql,
        "per_source_topk_sample": _topk_sample_sql,
        "curation_funnel": _curation_sql,
        "training_order": _training_order_sql,
        # interpolated-percentile cutoff + tie-at-cutoff keep sets
        "quality_prune": _quality_prune_sql,
        # empty-group string_agg vs collect_list id-hash + churn ratio
        "snapshot_diff": _snapshot_diff_sql,
        # empty-sample guards + count-distinct-over-CASE ratios
        "dup_rate_sample_audit": _dup_audit_sql,
        # df-window ratios; under-3-token docs vanish, single-doc
        # corpora are all-unique (novelty = 1)
        "ngram_novelty": _ngram_novelty_sql,
        # char-count subtraction arithmetic + the empty-doc
        # greatest(n,1) guard and rounded-threshold flag
        "code_like_score": _code_detect_sql,
        # chars/token + shingle-compression ratios: zero-token docs hit
        # the greatest() guard, under-3-token docs the CASE 0 branch,
        # shingle-free sources the compression = 1.0 convention
        "token_fertility": _token_fertility_sql,
        # removed-token ratio + ceil-block arithmetic: under-10-token
        # docs are a single short line (never a dedup candidate),
        # identical tiny docs exercise the (doc_id,pos) keeper packing
        "line_dedup": _line_dedup_sql,
        # per-version conditional means: sparse sources can be EMPTY in
        # early snapshots (NULL q_v -> dbl 0.0) and the 4-point slope
        # runs on whatever versions exist
        "quality_trend_by_source": _quality_trend_sql,
        # strict-dominance RANGE window: all-same-length sources make
        # every doc frontier-eligible (no strictly-longer peer), ties
        # in rounded scores never dominate each other
        "quality_length_frontier": _frontier_sql,
        # per-1k nullif ratios: zero-token sources hit the NULL->0.0
        # convention, digit-free corpora pin densities at exact 0
        "pii_density_by_source": _pii_density_sql,
        # row/col-normalized cells: single-lang corpora give a 1-cell
        # matrix with recall = precision = 1.0
        "lang_confusion_matrix": _lang_confusion_sql,
        # ln/exp moment math: single-doc sources (var_samp NULL ->
        # coalesce 0) make implied = geometric = actual only when
        # counts are equal; the >= 1-token filter drops empty docs
        "lognormal_length_fit": _lognormal_fit_sql,
        # chunk-geometry identities: empty docs give one zero-width
        # chunk (overlap ratio 0/0 -> NULL -> dbl 0.0), sub-256-token
        # docs a single exact-cover chunk
        "chunk_overlap_audit": _chunk_audit_sql,
        # running-share ranks: under-k vocabularies pin every ladder
        # point at 1.0, tie-heavy tiny vocabs exercise the (c, token)
        # rank determinism
        "ngram_coverage_curve": _coverage_curve_sql,
        # type/token share ratios: single-use-everything tiny corpora
        # pin hapax_type_share at 1.0, repeated-word ones at 0.0
        "hapax_ratio": _hapax_sql,
        # round-before-log2 shares (E75 discipline): single-type
        # corpora give H = 0 with the v > 1 efficiency guard
        "token_entropy": _token_entropy_sql,
        # nullif(words/sents, 0) ARI guards: empty and 1-word docs
        "sentence_stats": _sentence_stats_sql,
        # per-source share window + tail-bucket pooling on tiny vocabs
        "token_length_histogram": _token_length_histogram_sql,
        # length-difference class counts: all-space and all-symbol
        # docs pin shares at exact 0/1 via the nullif(total) guard
        "char_class_profile": _char_class_profile_sql,
        # regexp flags on tiny texts: no-match corpora give exact 0
        # shares; per-1k density hits the nullif(chars) guard
        "url_markup_screen": _url_markup_screen_sql,
        # round-before-log2 conditional shares: deterministic bigram
        # chains give H exactly 0 (perplexity 1)
        "bigram_entropy_rate": _bigram_entropy_rate_sql,
        # distinct/distinct ratio with nullif: tiny-vocab corpora make
        # prefix collisions the common case
        "fingerprint_collision_audit": _fingerprint_collision_sql,
        # per-doc round-before-log2 entropy + the >=10-token screen:
        # single-word docs pin H = 0 below the length floor
        "doc_entropy_screen": _doc_entropy_screen_sql,
        # ratio-of-sums Flesch with nullif(sents/words): the tiny-word
        # corpus has zero sentence enders (every doc 0-sent -> NULLs)
        "readability_scores": _readability_sql,
        # frequency-spectrum ratios: single-use-everything corpora pin
        # K at 0 (m2 = n) and hapax share at 1.0; n<2 hits the D guard
        "yule_k_profile": _yule_k_sql,
    }


_DOC_SQL.update(_more_doc_sql_fns())

_DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _assert_parity(spark, pdf: pd.DataFrame, view: str, schema: str, sql_fn, name):
    sdf = spark.createDataFrame(pdf, schema) if len(pdf) else spark.createDataFrame([], schema)
    sdf.createOrReplaceTempView(view)
    got = spark.sql(sql_fn("spark"))
    spark_rows = _rows(got.columns, got.collect())

    con = duckdb.connect()
    try:
        con.register(view, pdf)
        res = con.execute(sql_fn("duckdb"))
        duck_cols = [d[0] for d in res.description]
        duck_rows = _rows(duck_cols, res.fetchall())
    finally:
        con.close()

    assert sorted(got.columns) == sorted(duck_cols), name
    assert spark_rows == duck_rows, f"{name}: engines disagree on generated input"


@pytest.mark.parametrize("name", sorted(_DOC_SQL))
def test_document_queries_on_random_corpora(spark, name):
    sql_fn = _DOC_SQL[name]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        docs=st.lists(
            st.tuples(
                st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
                st.sampled_from(["s1", "s2"]),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def check(docs):
        pdf = pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(docs)), dtype="int64"),
                "text": [" ".join(words) for words, _src in docs],
                "lang": ["en"] * len(docs),
                "source": [src for _words, src in docs],
                "n_chars": pd.Series(
                    [len(" ".join(w)) for w, _ in docs], dtype="int64"
                ),
            }
        )
        _assert_parity(spark, pdf, "documents", _DOC_SCHEMA, sql_fn, name)

    check()


def test_benford_on_random_prices(spark):
    edge_prices = [
        999.9999999999999,  # log10 rounds UP -> true digit 9
        1.0,
        10.0,
        100.0,
        0.0,  # excluded by the > 0 filter
        -3.5,  # excluded
        1e-7,
        9.999999999999998,
        123.456,
    ]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        prices=st.lists(
            st.one_of(
                st.sampled_from(edge_prices),
                st.floats(
                    min_value=1e-6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            min_size=0,
            max_size=12,
        )
    )
    def check(prices):
        pdf = pd.DataFrame(
            {
                "o_orderkey": pd.Series(range(len(prices)), dtype="int64"),
                "o_totalprice": pd.Series(prices, dtype="float64"),
            }
        )
        _assert_parity(
            spark,
            pdf,
            "orders",
            "o_orderkey BIGINT, o_totalprice DOUBLE",
            _benford_digits_sql,
            "benford_digits",
        )

    check()


def _events_pdf(rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return pd.DataFrame(
        {
            "event_id": pd.Series(range(len(rows)), dtype="int64"),
            "ts": pd.Series(
                [base + dt.timedelta(hours=h, minutes=m) for h, m, *_ in rows],
                dtype="datetime64[us]",
            ),
            "user_id": pd.Series([u for _h, _m, u, *_ in rows], dtype="int64"),
            "event_type": [t for *_x, t, _v in rows],
            "value": pd.Series([v for *_x, v in rows], dtype="float64"),
            "props": ['{"k": 1}'] * len(rows),
        }
    )


_EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _event_sql_fns():
    from fiveg_spark.operators.analytics_ext import _zscore_sql
    from fiveg_spark.operators.behavior import _lorenz_sql
    from fiveg_spark.operators.quality import (
        _dq_trend_sql,
        _partition_completeness_sql,
    )
    from fiveg_spark.operators.analytics_ext import _load_imbalance_sql
    from fiveg_spark.operators.ts_diagnostics import (
        _jarque_bera_sql,
        _kl_weekly_mix_sql,
        _poisson_dispersion_sql,
        _runs_test_sql,
        _theils_u_sql,
        _wilcoxon_sql,
    )
    from fiveg_spark.operators.ts_diagnostics import (
        _arch_lm_sql,
        _pacf_sql,
        _quantile_drift_sql,
    )
    from fiveg_spark.operators.stats_assoc import (
        _anova_sql,
        _assoc_sql,
        _evt_tail_sql,
        _ols_trend_sql,
    )
    from fiveg_spark.operators.timeseries import (
        _feature_correlations_sql,
        _heatmap_sql,
        _peak_to_mean_sql,
        _value_concentration_sql,
        _window_entropy_sql,
    )
    from fiveg_spark.operators.ts_diagnostics import (
        _acf_sql,
        _calendar_outlier_sql,
        _conformal_sweep_sql,
        _diebold_mariano_sql,
        _iat_burstiness_sql,
        _ljung_box_sql,
        _page_hinkley_sql,
        _welch_sql,
    )
    from fiveg_spark.operators.timeseries import (
        _collated_mix_sql,
        _funnel_ci_sql,
        _pipe_syntax_sql,
    )
    from fiveg_spark.operators.engine_native import (
        _listagg_paths_sql,
        _variant_explode_sql,
        _xml_ingest_sql,
    )

    from fiveg_spark.operators.analytics_ext import _mode_sql
    from fiveg_spark.operators.behavior import (
        _activity_by_tenure_sql,
        _session_depth_sql,
        _growth_accounting_sql,
        _semi_markov_sql,
        _session_paths_sql,
        _session_stats_sql,
        _transition_matrix_sql,
    )
    from fiveg_spark.operators.lateness import (
        _arrival_burstiness_sql,
        _arrival_inversions_sql,
    )
    from fiveg_spark.operators.stats_tests import (
        _bh_screen_sql,
        _chisq_hour_uniformity_sql,
        _effect_size_ladder_sql,
        _gumbel_maxima_sql,
        _hour_uniformity_decisions_sql,
        _weekday_uniformity_decisions_sql,
    )
    from fiveg_spark.operators.engagement_ext import (
        _drop_value_cost_sql,
        _ltv_by_acquisition_sql,
        _new_vs_returning_sql,
        _offpeak_contrast_sql,
        _phase_shift_sql,
        _session_gap_sensitivity_sql,
        _transition_asymmetry_sql,
    )
    from fiveg_spark.operators.ts_advanced import (
        _acf_half_life_sql,
        _diurnal_amplitude_sql,
        _load_duration_sql,
        _variance_time_sql,
    )
    from fiveg_spark.operators.behavior import _user_specialization_sql
    from fiveg_spark.operators.ts_diagnostics import _error_pchart_sql
    from fiveg_spark.operators.rollup_stats import _concurrency_sql
    from fiveg_spark.operators.timeseries import (
        _cohort_retention_sql,
        _funnel_sql,
        _linear_interp_sql,
        _time_to_convert_sql,
    )

    from fiveg_spark.operators.flows import (
        _flow_iat_stats_sql,
        _idle_periods_sql,
        _sessionize_sql,
        _slo_burn_sql,
        _top_flows_sql,
    )
    from fiveg_spark.operators.timeseries import (
        _event_type_mix_sql,
        _resample_gapfill_sql,
        _value_histogram_sql,
        _value_percentiles_sql,
    )
    from fiveg_spark.operators.ts_advanced import (
        _dominant_period_sql,
        _hopping_window_sql,
        _hurst_sql,
        _seasonal_strength_sql,
        _spectral_entropy_sql,
    )

    from fiveg_spark.operators.timeseries import (
        _quantile_transform_sql,
        _twap_sql,
    )

    return {
        "zscore_anomalies": _zscore_sql,
        "window_entropy": _window_entropy_sql,
        # max/avg ratio with nullif + deterministic peak-hour rank;
        # single-hour days give pmr exactly 1.0
        "peak_to_mean_daily": _peak_to_mean_sql,
        # grid z-scores with the n<=1 variance guard + deterministic
        # peak rank; single-cell streams give z 0 and peak TRUE
        "weekday_hour_heatmap": _heatmap_sql,
        # var/mean ratio with the nullif(mu,0) guard: all-zero-count
        # spines and single-hour slices (n<2 filtered) live here
        "poisson_dispersion": _poisson_dispersion_sql,
        # per-transition gap percentiles: single-event users emit no
        # transitions; tied timestamps give zero gaps (within-session)
        "semi_markov_holding_times": _semi_markov_sql,
        # first-day anchor join: single-instant streams put everything
        # in tenure week 0 with distinct-count ratios
        "activity_by_tenure": _activity_by_tenure_sql,
        # hash-delay lag windows: single-arrival type-days emit no
        # adjacent pairs (nullif(count) guard, empty-avg -> dbl 0.0)
        "arrival_order_inversions": _arrival_inversions_sql,
        # full-block filtering + ln over positive variances only:
        # constant/periodic series drop scale points (n>=2 slope guard)
        "variance_time_curve": _variance_time_sql,
        # binomial 3sigma limits with rounded-boolean flags: all-error
        # and error-free streams pin pbar at 1/0 (sigma 0)
        "error_rate_pchart": _error_pchart_sql,
        # broadcast-percentile boundary compare: tie-heavy tiny value
        # alphabets make the >= capture approximate from above in both
        # engines identically; zero-value types hit nullif(sum)
        "value_concentration_by_type": _value_concentration_sql,
        # exceedance-ladder exact percentiles + nullif base ratio
        "load_duration_curve": _load_duration_sql,
        # 24 corr_safe lags from one shifted self-join: short/constant
        # series hit the degenerate-corr cutoff and the coalesce cap
        "acf_half_life": _acf_half_life_sql,
        # per-user entropy with round-before-log2: single-type users
        # pin H = 0 (specialists), tiny streams land in one band
        "user_specialization": _user_specialization_sql,
        # Fano var/mean with nullif: single-arrival minutes everywhere
        # give var 0 (never overdispersed), 1-minute streams var NULL
        "arrival_burstiness": _arrival_burstiness_sql,
        # gap-threshold session curve: nullif(session count) and the
        # per-user lag window; single-event users are always starts
        "session_gap_sensitivity": _session_gap_sensitivity_sql,
        # four IGNORE NULLS anchors: sparse grids exercise the
        # time-weighted interp; dense ones are all 'obs'
        "linear_interp_gapfill": _linear_interp_sql,
        # two nested per-user windows + the DEPTH_CAP tail pool;
        # tied timestamps exercise the (ts, event_id) tiebreak
        "session_depth_value_curve": _session_depth_sql,
        # single-agg GOF identity 24·Σc²/n − n: single-hour types pin
        # peak_hour_share at 1.0 and chi2 at 23n (max nonuniformity)
        "chisq_hour_uniformity": _chisq_hour_uniformity_sql,
        # weekend-free tiny streams leave n2 = 0 (every effect-size
        # guard fires); constant values hit the pooled-variance cutoff
        "effect_size_ladder": _effect_size_ladder_sql,
        # n<2 day slices pin sd = 0 (β, return levels collapse to the
        # mean); decomposable-sum SD + Python-inlined ln constants
        "gumbel_maxima_fit": _gumbel_maxima_sql,
        # r11: Welch z + erf-free p + BH step-up — a cell that IS the
        # whole corpus (or a 1-event complement) must guard to z=0/p=1,
        # and tied rounded p-values exercise the deterministic rank
        "bh_screened_mean_shifts": _bh_screen_sql,
        # r12: WH p-values over the same GOF identity — single-hour
        # types drive chi2 to 23n (WH deep-tail underflow clamp) and
        # one-event types to the n=1 degenerate; tied p6 exercise the
        # deterministic BH rank on both decision queries
        "hour_uniformity_decisions": _hour_uniformity_decisions_sql,
        "weekday_uniformity_decisions": _weekday_uniformity_decisions_sql,
        # r12 engine-native surface on degenerate streams: exact-ts
        # ties exercise the listagg total order, single-event users the
        # 1-element path, tiny ints the variant/xml casts, and the
        # coarse type alphabet the collated grouping + pipe HAVING
        "collated_type_mix": _collated_mix_sql,
        "pipe_syntax_daily_mix": _pipe_syntax_sql,
        "listagg_user_paths": _listagg_paths_sql,
        "variant_explode_kv": _variant_explode_sql,
        "xml_ingest_mix": _xml_ingest_sql,
        # value-mass drop shares: nullif(sum(value)) hits on all-zero
        # value streams; one-minute streams have no frontier at all
        "watermark_drop_value_cost": _drop_value_cost_sql,
        # NULL-guarded off/peak ratio: single-band streams leave one
        # avg NULL (dbl coalesces to the 0.0 no-information value)
        "offpeak_value_contrast": _offpeak_contrast_sql,
        # first-event attribution + per-user value/event ratios
        "ltv_by_acquisition_type": _ltv_by_acquisition_sql,
        # within-user midpoint split: span-zero users are all-early,
        # making the late avg NULL and the shift ratio guarded
        "user_phase_value_shift": _phase_shift_sql,
        # first-day share: single-user streams pin the share at 1.0
        "daily_new_vs_returning": _new_vs_returning_sql,
        # net-flow asymmetry with nullif(n_ab + n_ba): self-loops are
        # excluded, single-type streams emit no pairs at all
        "type_transition_asymmetry": _transition_asymmetry_sql,
        # OLS slope over per-day amplitudes with the >=12-hour day
        # filter: sparse random streams drop most days (n<2 guard)
        "diurnal_amplitude_trend": _diurnal_amplitude_sql,
        # centered power sums: constant series hit the s2>0 guards,
        # n<4 slices are filtered
        "jarque_bera": _jarque_bera_sql,
        # run-count variance guard: constant series (n1 or n0 = 0)
        # give var_runs = 0 -> NULL z -> dbl 0.0
        "runs_test": _runs_test_sql,
        # floored/rounded shares before ln (E75 discipline); single-
        # type streams give KL = 0 with the type as top
        "kl_weekly_mix": _kl_weekly_mix_sql,
        # decile bucketing on deterministic ranks + rank-formula gini;
        # single-user streams give one decile with share 1.0
        "lorenz_curve_users": _lorenz_sql,
        # calendar-spine zeros + nullif parse ratio on silent days
        "dq_trend_daily": _dq_trend_sql,
        # MPE/MAPE nullif(v,0) guards + the RMSE-ratio nullif; series
        # shorter than 25 hours have no seasonal pred -> zero rows
        "theils_u_eval": _theils_u_sql,
        # n*R2 over guarded OLS sums; constant residuals hit the
        # zero-variance branches, <3-point slices are filtered
        "arch_lm_test": _arch_lm_sql,
        # Durbin-Levinson ratio recursion on rounded rhos: constant
        # series hit every denominator guard, <5-hour slices filter
        "pacf_lags": _pacf_sql,
        # weekly-vs-reference percentile ratios with nullif guards;
        # single-week streams pin every ratio at 1.0
        "quantile_band_drift": _quantile_drift_sql,
        # paired midranks + tie-corrected variance: all-equal pairs
        # drop (d = 0), single-pair slices hit tiny-n variance math
        "wilcoxon_signed_rank": _wilcoxon_sql,
        # cv/p99-ratio nullif guards; single-user hours give cv 0 and
        # top share 1.0
        "hourly_load_imbalance": _load_imbalance_sql,
        # LOCF interval weights: exact-tie timestamps -> zero-width
        # intervals, single-reading days -> full-day weight
        "twap_value_daily": _twap_sql,
        # cos/sin + ss>0 guard: constant series (ss = 0) and 1-row
        # series land here; rank ties resolve on rounded scores
        "dominant_period": _dominant_period_sql,
        # p·ln p over rounded power shares; zero-total-power (constant
        # series) takes the H = 0 branch
        "spectral_entropy": _spectral_entropy_sql,
        # var ratio clamp on rounded values; zero-variance series take
        # the 0.0 branch
        "seasonal_strength": _seasonal_strength_sql,
        # tiny streams have NO complete R/S block at any size -> empty
        # fit (0 rows) and the n_pts < 2 fallback to H = 0.5
        "hurst_exponent": _hurst_sql,
        # midrank ECDF ratios + the n_train = 0 guard (series shorter
        # than the split floor leave the train era empty)
        "quantile_transform": _quantile_transform_sql,

        "acf_throughput": _acf_sql,
        "ols_trend_per_slice": _ols_trend_sql,
        # m^2/v ratio + xi-branch + power(): tiny tied-value corpora
        # hit the relative variance guard and the exponential branch
        "evt_tail_fit": _evt_tail_sql,
        "event_time_association": _assoc_sql,
        "feature_correlations": _feature_correlations_sql,
        # behavior block: tie-handling + window logic on tiny streams
        "transition_matrix": _transition_matrix_sql,
        # (σ−μ)/(σ+μ) ratio with the σ+μ=0 guard (all-tied IATs) and
        # corr_safe over flow-lagged pairs
        "iat_burstiness": _iat_burstiness_sql,
        # running-mean recursion + rounded-threshold alarm flags;
        # constant series give sd = 0 -> thresholds collapse to 0
        "page_hinkley_drift": _page_hinkley_sql,
        # SSB/SSW ratio guards: single-slice (k<2), one-hour-per-slice
        # (n<=k) and zero-within-variance corpora all land here
        "anova_slice_means": _anova_sql,
        # span/gap integer-epoch arithmetic; single-hour days give
        # span 1 with the coalesced max_gap = 1.0 branch
        "partition_completeness": _partition_completeness_sql,
        # percentile-column unpivot (stack vs UNION dual) + short
        # series with empty val/test eras
        "conformal_alpha_sweep": _conformal_sweep_sql,
        "cohort_retention": _cohort_retention_sql,
        "funnel_stages": _funnel_sql,
        # rho ratios over a shared ss denominator + the n<=m+1 / ss=0
        # guards (tiny and constant series land here)
        "ljung_box": _ljung_box_sql,
        # Welch ratio/sqrt math + the n<2-per-era row drop and the
        # zero-variance t=0/df=0 guards
        "welch_weekend_contrast": _welch_sql,
        # Wilson sqrt/ratio math at p = 0 and p = 1 boundaries and the
        # n_from = 0 no-information branch
        "funnel_conversion_ci": _funnel_ci_sql,
        "time_to_convert": _time_to_convert_sql,
        "daily_modal_type": _mode_sql,
        "concurrency_profile": _concurrency_sql,
        # windowing/bucketing family: tied timestamps + tiny-alphabet
        # values exercise bin edges, gap-fill bounds, and rank ties
        "value_histogram": _value_histogram_sql,
        "value_percentiles": _value_percentiles_sql,
        "event_type_mix": _event_type_mix_sql,
        "resample_gapfill": _resample_gapfill_sql,
        "hopping_window_volume": _hopping_window_sql,
        "flow_iat_stats": _flow_iat_stats_sql,
        "idle_periods": _idle_periods_sql,
        # integer good/total ratios + trailing ROWS window on sparse
        # single-packet hours (first-packet iat = 0 counts good)
        "slo_burn_rate": _slo_burn_sql,
        "top_flows": _top_flows_sql,
        "sessionize": _sessionize_sql,
        # trigram-path mining: tied timestamps inside a session break
        # on event_id; under-3-event sessions emit nothing (lead NULL
        # guard) -> empty frames on most tiny streams
        "session_paths": _session_paths_sql,
        # per-user duration/gap averages + medians: single-session
        # users contribute NULL gaps (avg-skip parity), all-single
        # corpora hit the global NULL -> 0.0 convention, DECIMAL
        # indicator landmine on the single-session share
        "session_stats": _session_stats_sql,
        # ledger identity + quick-ratio: churn-free weeks hit the
        # NULL -> 0.0 convention, single-week streams have no lag row,
        # calendar gaps exercise the missing-week churn guard
        "growth_accounting": _growth_accounting_sql,
        # LOO weekday-mean ratio: single-sample weekdays hit the
        # dow_n >= 2 null guard, rounded ratio at the 0.5/2.0 edges
        "calendar_outlier_days": _calendar_outlier_sql,
        # loss-differential ratios: under-25-hour series drop every
        # row (both lags null), constant differentials hit the
        # zero-variance sentinel branch, near-zero dbar the tie guard
        "diebold_mariano": _diebold_mariano_sql,
        **_hourly_family_sql_fns(),
    }


def _hourly_family_sql_fns():
    # the hourly-frame time-series family: tiny random streams produce
    # near-empty hourly series — window frames, lag chains, and split
    # arithmetic all run at their boundary conditions
    from fiveg_spark.operators.timeseries import (
        _eval_metrics_sql,
        _ffill_sql,
        _moving_avg_sql,
        _pinball_eval_sql,
        _train_split_sql,
    )
    from fiveg_spark.operators.ts_advanced import (
        _hampel_sql,
        _rolling_origin_cv_sql,
        _seasonal_decomposition_sql,
    )
    from fiveg_spark.operators.ts_diagnostics import (
        _changepoint_sql,
        _conformal_sql,
        _cusum_sql,
        _rolling_median_sql,
        _seasonal_naive_sql,
        _seasonal_profile_sql,
    )

    return {
        "moving_avg_throughput": _moving_avg_sql,
        "ffill_features": _ffill_sql,
        "train_split_bounds": _train_split_sql,
        "eval_metrics": _eval_metrics_sql,
        "pinball_eval": _pinball_eval_sql,
        "seasonal_decomposition": _seasonal_decomposition_sql,
        "hampel_outliers": _hampel_sql,
        "rolling_origin_cv": _rolling_origin_cv_sql,
        "cusum_drift": _cusum_sql,
        "seasonal_naive_eval": _seasonal_naive_sql,
        "seasonal_profile": _seasonal_profile_sql,
        "rolling_median_throughput": _rolling_median_sql,
        "best_changepoint": _changepoint_sql,
        # conformal: near-empty val/test splits after the lag-24 cut
        "conformal_intervals": _conformal_sql,
    }


def _assert_parity_parts(spark, pdf, view, schema, parts_fn, name):
    """Parity for materialized_backed queries: materialize each named
    part as a temp view in BOTH engines, then compare the tail."""
    sdf = spark.createDataFrame(pdf, schema) if len(pdf) else spark.createDataFrame([], schema)
    sdf.createOrReplaceTempView(view)
    parts, tail = parts_fn("spark")
    for vname, vsql in parts:
        # localCheckpoint like the production run_parts: parts exist to
        # be MATERIALIZED (plain nested views re-inline the whole chain
        # per tail reference, which both defeats the point and trips a
        # Spark 4.1 InlineCTE/DeduplicateRelations INTERNAL_ERROR on
        # multiply-referenced view stacks)
        spark.sql(vsql).localCheckpoint().createOrReplaceTempView(vname)
    got = spark.sql(tail)
    spark_rows = _rows(got.columns, got.collect())

    con = duckdb.connect()
    try:
        con.register(view, pdf)
        d_parts, d_tail = parts_fn("duckdb")
        for vname, vsql in d_parts:
            con.execute(f"CREATE TEMP VIEW {vname} AS {vsql}")
        res = con.execute(d_tail)
        duck_cols = [d[0] for d in res.description]
        duck_rows = _rows(duck_cols, res.fetchall())
    finally:
        con.close()

    assert sorted(got.columns) == sorted(duck_cols), name
    assert spark_rows == duck_rows, f"{name}: engines disagree on generated input"


def _doc_parts_fns():
    from fiveg_spark.operators.dedup import (
        _band_curve_parts,
        _minhash_recall_parts,
        _substring_dedup_parts,
    )
    from fiveg_spark.operators.llm_curation import (
        _contamination_matrix_parts,
        _dsir_parts,
        _dup_ngram_mass_parts,
    )
    from fiveg_spark.operators.curation import _quality_dup_calibration_parts
    from fiveg_spark.operators.text_stats import _tfidf_source_signature_parts
    from fiveg_spark.operators.dedup import (
        _dup_pressure_parts,
        _dup_spectrum_parts,
        _minhash_estimate_parts,
        _survivorship_parts,
    )
    from fiveg_spark.operators.chunk_dedup import (
        _chunk_minhash_parts,
        _chunk_recall_parts,
    )
    from fiveg_spark.operators.engagement_ext import _source_lang_mix_parts
    from fiveg_spark.operators.rollup_stats import _theta_overlap_parts
    from fiveg_spark.operators.text import _bm25_parts, _retrieval_eval_parts
    from fiveg_spark.operators.text_stats import (
        _ngram_position_parts,
        _oov_rate_parts,
        _stopword_divergence_parts,
        _vocab_jaccard_parts,
    )

    return {
        # posting-explode pair math: single-source corpora emit zero
        # pairs, identical sources give jaccard = containment = 1.0
        "vocab_jaccard_matrix": _vocab_jaccard_parts,
        # short docs (< SPAN_K tokens), whole-corpus duplicates, and
        # single-word vocab collisions all land here; clean_hash pins
        # the full token-level reconstruction across engines
        "substring_dedup": _substring_dedup_parts,
        "contamination_matrix": _contamination_matrix_parts,
        # occurrence-mass vs vocab shares with nullif guards: sub-3-
        # token docs vanish from the gram frame, single-source corpora
        # pin both cross shares at exact 0
        "dup_ngram_mass_by_source": _dup_ngram_mass_parts,
        # rounded tf-idf rank windows: single-source corpora make idf
        # constant (score ties break on token), shared-everything
        # vocabularies crush every score to the same value
        "tfidf_source_signature": _tfidf_source_signature_parts,
        # posexplode/subscripts positional shingles: under-3-token
        # docs emit none; single-doc corpora have no repeats (every
        # share guard fires); all-same-docs put repeated_share at 1.0
        "ngram_position_bias": _ngram_position_parts,
        "ppl_buckets": _ppl_buckets_parts,
        # dense source x lang spine: single-lang corpora pin every share
        # at 1.0 and chi2 at 0; the nullif margins guard empty cells
        # (r13: parts — spine derives from the materialized cells)
        "source_lang_mix": _source_lang_mix_parts,
        "minhash_recall_vs_exact": _minhash_recall_parts,
        # est/exact/3-sigma tolerance math: duplicate-heavy tiny
        # corpora make every candidate exact-J 1.0 (est must agree),
        # shingle-free docs never reach the candidate frame
        "minhash_jaccard_estimate": _minhash_estimate_parts,
        # S-curve power() math + empty ground-truth (expected = 1.0
        # coalesce) and empty-candidate branches per config
        "minhash_band_curve": _band_curve_parts,
        "unigram_ppl": _unigram_ppl_parts,
        # pair-frame rollup ratios: duplicate-free corpora keep every
        # source at the coalesce(0) zero rates, whole-corpus clones
        # exercise both within/cross flags on the same doc
        "dup_pressure_by_source": _dup_pressure_parts,
        # floored+rounded-before-ln KL shares (PSI discipline); tiny
        # corpora leave most profile words at the 1e-4 floor on both
        # sides (contrib ~0), sources with zero profile tokens vanish
        "stopword_divergence": _stopword_divergence_parts,
        # OOV ratios with greatest() floors; tiny corpora keep every
        # type in-vocab (rates pinned 0.0), empty-token docs vanish
        # from the exploded frame
        "oov_rate": _oov_rate_parts,
        # log-ratio model math + missing-target-source degenerate case
        "dsir_importance": _dsir_parts,
        # under-k sketches (theta = 1.0 exact fallback), shingle-free
        # short docs, single-source corpora (no pairs -> 0 rows), and
        # est/theta ratio math
        "theta_sketch_overlap": _theta_overlap_parts,
        # idf ln-ratio + dl/avgdl ratio math; corpora with no query-term
        # hits (0 rows) and all-identical docs (rank ties -> doc_id
        # tiebreak on the rounded score) land here
        "bm25_retrieval": _bm25_parts,
        # percentile boundary ties (all-equal scores collapse buckets)
        # + zero-base-rate lift guard
        "quality_dup_calibration": _quality_dup_calibration_parts,
        # 2^rel gains + log2 discounts + idcg=0 guard on no-hit corpora
        "retrieval_eval_lexical": _retrieval_eval_parts,
        # histogram shares + log-log regression: duplicate-free tiny
        # corpora give ONE spectrum point (k < 3 -> slope 0), whole-
        # corpus clones give a single non-1 size class (r13: parts)
        "dup_cluster_spectrum": _dup_spectrum_parts,
        # keeper-rule joins: duplicate-free corpora keep everything
        # (rates 0), whole-corpus clones lose all but one doc with the
        # cross-source split deciding where (r13: parts)
        "dedup_survivorship_by_source": _survivorship_parts,
        # r13 chunk-grain minhash: sub-3-token chunks emit no shingles
        # (signature-less reps vanish), duplicate-heavy tiny corpora
        # collapse to ONE representative (no pairs -> empty census /
        # recall 1.0 coalesce), same-doc stride overlaps dominate
        "chunk_minhash_pairs": _chunk_minhash_parts,
        "chunk_minhash_recall": _chunk_recall_parts,
    }


@pytest.mark.parametrize("name", sorted(_doc_parts_fns()))
def test_document_parts_queries_on_random_corpora(spark, name):
    parts_fn = _doc_parts_fns()[name]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        docs=st.lists(
            st.tuples(
                st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
                st.sampled_from(["s1", "s2"]),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def check(docs):
        pdf = pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(docs)), dtype="int64"),
                "text": [" ".join(words) for words, _src in docs],
                "lang": ["en"] * len(docs),
                "source": [src for _words, src in docs],
                "n_chars": pd.Series(
                    [len(" ".join(w)) for w, _ in docs], dtype="int64"
                ),
            }
        )
        _assert_parity_parts(spark, pdf, "documents", _DOC_SCHEMA, parts_fn, name)

    check()


def _event_parts_fns():
    from fiveg_spark.operators.behavior import (
        _affinity_parts,
        _attribution_parts,
        _markov_stationarity_parts,
        _migration_parts,
        _stickiness_parts,
    )
    from fiveg_spark.operators.rollup_stats import _kmv_set_ops_parts
    from fiveg_spark.operators.sketches import _bloom_parts
    from fiveg_spark.operators.behavior import _entropy_rate_parts
    from fiveg_spark.operators.timeseries import (
        _retention_halflife_parts,
        _trending_parts,
    )
    from fiveg_spark.operators.ts_diagnostics import _seasonal_mk_parts
    from fiveg_spark.operators.ts_advanced import (
        _anomaly_consensus_parts,
        _ccf_parts,
        _transfer_entropy_parts,
    )
    from fiveg_spark.operators.behavior import (
        _dau_overlap_parts,
        _second_session_latency_parts,
        _session_conversion_parts,
        _user_transfer_entropy_parts,
    )
    from fiveg_spark.operators.lateness import _lateness_profile_parts
    from fiveg_spark.operators.quality import _column_stat_drift_parts
    from fiveg_spark.operators.ts_advanced import _weekly_slice_corr_parts
    from fiveg_spark.operators.engagement_ext import (
        _hour_entropy_by_band_parts,
    )
    from fiveg_spark.operators.stats_assoc import _jackknife_parts
    from fiveg_spark.operators.ts_diagnostics import (
        _cvm_parts,
        _theilsen_parts,
        _iat_exponential_fit_parts,
        _ks_parts,
        _mann_kendall_parts,
        _model_router_parts,
        _mw_parts,
        _psi_parts,
    )
    from fiveg_spark.operators.stats_tests import (
        _friedman_parts,
        _kruskal_wallis_parts,
        _levene_parts,
        _median_polish_parts,
        _perm_entropy_parts,
        _poisson_bootstrap_parts,
        _weibull_iat_parts,
    )
    from fiveg_spark.operators.behavior import (
        _dormancy_parts,
        _return_hazard_parts,
    )
    from fiveg_spark.operators.ts_advanced import (
        _cointegration_parts,
        _partial_corr_parts,
    )

    return {
        # tie-heavy journeys: simultaneous touch/purchase timestamps
        "attribution_credit": _attribution_parts,
        # day+1 self-join: single-day streams emit ZERO rows; full
        # churn gives retained 0 with the union denominator
        "dau_overlap_jaccard": _dau_overlap_parts,
        # session reduce + band CASE: purchase-free streams pin
        # conversion 0 with mean_s_to_purchase NULL -> dbl 0.0
        "session_conversion_profile": _session_conversion_parts,
        # session-2 LEFT JOIN: single-session users hit the NULL
        # latency branch (count(latency) = 0, pct over empty -> 0.0)
        "second_session_latency": _second_session_latency_parts,
        # sparse-cell TE identity: constant-load streams give a 1-cell
        # census (H = 0, te_share guard); always-active users give
        # c0 = 0 everywhere
        "user_transfer_entropy": _user_transfer_entropy_parts,
        # half-split conditional stats: single-instant streams leave
        # h2 EMPTY (nullif count guards, NULL means -> dbl 0.0)
        "column_stat_drift": _column_stat_drift_parts,
        # weekly corr_safe over the epoch-keyed self-join: constant
        # and single-hour weeks hit the degenerate cutoff / n>=24 gate
        "weekly_slice_correlation": _weekly_slice_corr_parts,
        # hash-delay synthesis + running-max watermark: single-minute
        # streams have NULL wm everywhere (late shares exactly 0)
        "watermark_lateness_profile": _lateness_profile_parts,
        # trailing-window fanout + nullif(mau,0) ratios on sparse days
        "stickiness_ratio": _stickiness_parts,
        # per-era ntile + FULL OUTER absent rows; single-instant
        # streams put every user in h1 with h2 all-absent
        "customer_migration_matrix": _migration_parts,
        # pooled-expectation chi-square over the DENSE era grid;
        # single-era streams (all events at one instant) put every
        # transition in h1 with h2 rows at the contribution-0 guard
        "markov_stationarity": _markov_stationarity_parts,
        # decile-rank ceil arithmetic + lift ratios; single-user
        # streams put everything in decile 10 at lift 1.0
        "user_type_affinity": _affinity_parts,
        # three rounded-threshold votes; constant series suppress all
        # detectors (zero-spread guards) -> zero rows
        "anomaly_consensus": _anomaly_consensus_parts,
        # round-before-ln retention + censoring join; single-week
        # corpora leave < 2 fit points -> halflife 0
        "retention_halflife": _retention_halflife_parts,
        # ln(p/q) with share floors + degenerate single-bin ranges
        "feature_drift_psi": _psi_parts,
        # tied timestamps per (user, type) -> zero IATs -> mean_iat = 0:
        # the lambda_hz guard and the grid-point NUDGE both exercise here
        "iat_exponential_fit": _iat_exponential_fit_parts,
        # tiny user alphabet -> full-overlap and singleton-type pairs;
        # under-k sketches take the exact-fallback branch everywhere
        "kmv_set_ops": _kmv_set_ops_parts,
        # ECDF RANGE-window tie mass + empty-era guard (all rows on one
        # side of the median cut)
        "ks_two_sample": _ks_parts,
        # squared-gap ECDF integral: same tie/empty-era classes as KS
        # plus the ratio normalization n·m/N²
        "cramer_von_mises": _cvm_parts,
        # fill-ratio ln() + modulo hashing on negative probe ids; tiny
        # streams keep every type under-filled
        "bloom_membership": _bloom_parts,
        # per-user hour entropy with percentile-bound bands: single-
        # hour users have entropy exactly 0; ties cluster band bounds
        # (r13: parts — the (user, hour) cell frame materializes once)
        "user_hour_entropy_by_band": _hour_entropy_by_band_parts,
        # leave-one-out ratio arithmetic + single-block se degenerate
        # (r13: parts — the daily partial frame materializes once)
        "jackknife_ratio_ci": _jackknife_parts,
        # pairwise-slope ratios on tied timestamps (1-row series ->
        # zero pairs -> no fit row)
        # (r13: parts — the hourly series materializes once)
        "theilsen_trend": _theilsen_parts,
        # midrank tie arithmetic + the all-tied var_u = 0 -> z = 0 guard
        "mann_whitney_shift": _mw_parts,
        # GLOBAL midranks: all-tied hourly frames zero the tie
        # correction (h_stat 0); single-slice streams give dof 0
        "kruskal_wallis_slices": _kruskal_wallis_parts,
        # 72-hour tiny streams rarely gap >7 days: the empty spell
        # frame pins every distribution column at the NULL->0.0 path
        "dormancy_spell_profile": _dormancy_parts,
        # complete-case pivot: streams missing a slice-hour leave the
        # frame empty (n_hours 0, every corr at the degenerate 0)
        "partial_corr_slices": _partial_corr_parts,
        # rung unpivot from the 1-row sum frame: single-event users
        # contribute no gaps (at_risk 0 -> hazard guard on every rung)
        "return_hazard_ladder": _return_hazard_parts,
        # two-stage OLS on the complete-case pivot: missing-slice
        # streams empty the frame; constant residuals hit sxx <= 1e-12
        "cointegration_screen": _cointegration_parts,
        # md5 Poisson weights: tiny streams make all-zero-weight
        # replicates common (nullif(w) -> NULL mean, dropped from SE)
        "poisson_bootstrap_ci": _poisson_bootstrap_parts,
        # rounded median sweeps on tiny grids: single-cell streams
        # pin every effect at 0 with the grand at the cell value
        "median_polish_hourweek": _median_polish_parts,
        # <=2-hour slices emit no triples; tie-heavy tiny alphabets
        # exercise the <= pattern convention; constant series -> one
        # pattern (entropy 0, 5 forbidden)
        "permutation_entropy": _perm_entropy_parts,
        # complete-block census: single-slice streams make every hour
        # complete (ranks all 1); identical rank patterns hit A2 = B2
        "friedman_slices": _friedman_parts,
        # constant slices give within_ss = 0 (F guard); rounded median
        # centers keep |v − med| identical across engines
        "levene_variance_homogeneity": _levene_parts,
        # tied timestamps -> zero IATs -> q <= 1e-9 rungs filtered ->
        # < 2 ladder points -> slope 0 -> λ/median guards
        "weibull_iat_fit": _weibull_iat_parts,
        # corr_safe on constant/misaligned eras; single-slice corpora
        # produce zero pairs
        "cross_correlation": _ccf_parts,
        # log₂ sums of exact-integer cell ratios: constant series put
        # everything in one cell (TE = H = 0 -> te_share guard), gap
        # hours drop triples, single-slice streams emit zero pairs
        "transfer_entropy": _transfer_entropy_parts,
        # p·ln(p) sums over integer ratios; single-transition and
        # single-type streams hit the deterministic h=0 rows
        "sequence_entropy_rate": _entropy_rate_parts,
        # lift ratio with the 1-event/week baseline floor; single-day
        # streams put everything in the current window (baseline 0 ->
        # floored lift), rounded-threshold trending flag
        "trending_types": _trending_parts,
        # rounded Q / F_s thresholds; tiny streams hit the n <= m+1
        # and zero-SS white guards (-> 'mean') and the zero-variance
        # F_s = 0 branch
        "model_router": _model_router_parts,
        # sign-pair sums + tie-corrected variance: constant series
        # (all ties) hit the var_s <= 0 guard, single-hour slices the
        # empty-pair branch, continuity correction at tiny |S|
        "mann_kendall_trend": _mann_kendall_parts,
        # per-season pair sums: tiny streams leave most hour-of-day
        # seasons with a single point (zero pairs, variance from the
        # n_g ladder only), all-tied seasons hit the var guard
        "seasonal_mann_kendall": _seasonal_mk_parts,
    }


@pytest.mark.parametrize("name", sorted(_event_parts_fns()))
def test_event_parts_queries_on_random_streams(spark, name):
    parts_fn = _event_parts_fns()[name]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 72),
                st.sampled_from([0, 30]),  # coarse minutes -> exact ties
                st.integers(0, 3),
                st.sampled_from(["view", "click", "purchase"]),
                st.sampled_from([1.0, 2.5, 7.25]),
            ),
            min_size=1,
            max_size=15,
        )
    )
    def check(rows):
        _assert_parity_parts(
            spark, _events_pdf(rows), "events", _EVENTS_SCHEMA, parts_fn, name
        )

    check()


@pytest.mark.parametrize("name", sorted(_event_sql_fns()))
def test_event_queries_on_random_streams(spark, name):
    sql_fn = _event_sql_fns()[name]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(0, 72),            # hour offset
                st.sampled_from([0, 30]),      # minute: coarse -> frequent
                                               # EXACT-timestamp ties
                st.integers(0, 3),             # user_id
                st.sampled_from(["view", "click", "purchase"]),
                # tiny value alphabet -> constant per-type series are
                # COMMON, triggering zero-variance std/corr paths
                st.sampled_from([1.0, 2.5, 7.25]),
            ),
            min_size=1,
            max_size=15,
        )
    )
    def check(rows):
        _assert_parity(spark, _events_pdf(rows), "events", _EVENTS_SCHEMA, sql_fn, name)

    check()


# ---- multi-table relational queries on random star fragments ----

def _assert_parity_tables(spark, frames: dict, sql_fn, name):
    """_assert_parity for queries reading several relations: every
    frame registers as a temp view on the Spark side AND as a DuckDB
    relation, then the two dialects compare with the driver's rows."""
    for view, (pdf, schema) in frames.items():
        sdf = (
            spark.createDataFrame(pdf, schema)
            if len(pdf)
            else spark.createDataFrame([], schema)
        )
        sdf.createOrReplaceTempView(view)
    got = spark.sql(sql_fn("spark"))
    spark_rows = _rows(got.columns, got.collect())

    con = duckdb.connect()
    try:
        for view, (pdf, _schema) in frames.items():
            con.register(view, pdf)
        res = con.execute(sql_fn("duckdb"))
        duck_cols = [d[0] for d in res.description]
        duck_rows = _rows(duck_cols, res.fetchall())
    finally:
        con.close()

    assert sorted(got.columns) == sorted(duck_cols), name
    assert spark_rows == duck_rows, f"{name}: engines disagree on generated input"


def _folded_parts(parts_fn):
    """Fold a materialized_backed parts query into a single-WITH sql_fn
    for the parity runners (both engines inline; the parity gate tests
    the shared SQL math, not Spark's materialization)."""

    def sql_fn(d: str) -> str:
        ctes, tail = parts_fn(d)
        with_clause = ",\n".join(f"{rel} AS ({sql})" for rel, sql in ctes)
        stripped = tail.lstrip()
        if stripped[:5].upper() == "WITH ":
            return f"WITH {with_clause},\n{stripped[5:]}"
        return f"WITH {with_clause}\n{tail}"

    return sql_fn


def _star_sql_fns():
    from fiveg_spark.operators.behavior import _order_cadence_sql
    from fiveg_spark.operators.engagement_ext import _partner_turnover_parts
    from fiveg_spark.operators.supply_fulfillment import (
        _debtor_contrast_sql,
        _discount_depth_sql,
        _nation_brand_affinity_sql,
        _part_name_tokens_sql,
        _balance_order_corr_sql,
        _balance_value_matrix_sql,
        _brand_diversity_sql,
        _business_days_latency_sql,
        _linenumber_profile_sql,
        _order_reconciliation_sql,
        _order_seasonality_sql,
        _order_span_profile_sql,
        _suppliers_per_part_sql,
        _supplier_balance_volume_sql,
        _tax_discount_joint_sql,
        _weekday_mix_sql,
    )
    from fiveg_spark.operators.quality import (
        _fk_fanout_sql,
        _fk_orphan_audit_sql,
    )
    from fiveg_spark.operators.supply_fulfillment import (
        _bullwhip_sql,
        _nation_kendall_sql,
        _nb_ordersize_sql,
        _nrr_parts,
        _price_dispersion_sql,
        _price_index_parts,
        _basket_tradeoff_sql,
        _leadtime_vardecomp_parts,
        _safety_stock_sql,
        _top_customer_turnover_parts,
        _value_mix_shift_parts,
    )
    from fiveg_spark.operators.relational_ext import (
        _brand_loyalty_sql,
        _nation_rank_stability_sql,
        _order_status_aging_sql,
        _brand_price_realization_sql,
        _customer_hhi_yearly_sql,
        _priority_mix_yearly_sql,
        _order_linecount_profile_sql,
        _revenue_drawdown_sql,
        _ship_sla_sql,
        _shipment_span_profile_sql,
        _yoy_revenue_growth_sql,
    )

    return {
        # lag-window growth with nullif(prev, 0): single-year nations
        # emit the 0.0 no-information first row; zero-revenue years
        # (all-1.0 discounts) hit the NULL division
        "yoy_revenue_growth": _yoy_revenue_growth_sql,
        # per-line nullif(quantity) + ratio-of-avgs: zero-quantity
        # lines and orphan-brand joins (inner join drops them)
        "brand_price_realization": _brand_price_realization_sql,
        # two-level agg + priority-partitioned share window
        "order_linecount_profile": _order_linecount_profile_sql,
        # min=max spans (single-shipment orders) pin the share at 1.0
        "shipment_span_profile": _shipment_span_profile_sql,
        # LEFT JOIN orphan rates: random small key ranges make both
        # clean and orphaned edges common
        "fk_orphan_audit": _fk_orphan_audit_sql,
        # running-peak drawdown + nullif(lag) log returns: single-day
        # years have no returns (stddev NULL -> 0.0), zero-revenue
        # days hit both nullif guards
        "revenue_drawdown": _revenue_drawdown_sql,
        # epoch-difference SLA booleans cast through DOUBLE
        "ship_sla_attainment": _ship_sla_sql,
        # ratio-of-sums HHI: single-customer years pin hhi at 1.0
        "customer_hhi_yearly": _customer_hhi_yearly_sql,
        # tie-free Spearman closed form: single-nation years pin the
        # n>=2 guard, missing next-year nations drop from the pair
        "nation_rank_stability": _nation_rank_stability_sql,
        # horizon broadcast + exact percentiles per status
        "order_status_aging": _order_status_aging_sql,
        # margin windows over the bounded cell frame: single-year /
        # single-priority fragments pin every share at 1.0, chi2 at 0
        "priority_mix_yearly": _priority_mix_yearly_sql,
        # per-customer HHI with the >= 2 items floor: single-line
        # customers drop; whole-fragment single-brand pins hhi 1.0
        "brand_loyalty_index": _brand_loyalty_sql,
        # per-customer CV with the >=2-gaps floor and nullif(mu):
        # single-order customers drop, tied order dates give zero gaps
        "order_cadence_regularity": _order_cadence_sql,
        # corr_safe over an outer join: zero-order customers keep a
        # 0-count row; constant balances hit the degenerate guard
        "balance_order_correlation": _balance_order_corr_sql,
        # closed-form weekday-prefix arithmetic incl. negative spans
        # (ship before order) and weekend-only spans
        "business_days_ship_latency": _business_days_latency_sql,
        # distinct-count rollup joined to part; orphan partkeys drop
        "suppliers_per_part_profile": _suppliers_per_part_sql,
        "linenumber_position_profile": _linenumber_profile_sql,
        # conditional quarter shares + greatest/least amplitude
        "nation_order_seasonality": _order_seasonality_sql,
        # percentile-bound quartiles + margin-window lift: fragments
        # with one distinct balance put every bound on one value
        "balance_value_quartile_matrix": _balance_value_matrix_sql,
        # header/lines ratio with nullif(linesum): all-1.0-discount
        # zero-revenue orders hit the guard
        "order_total_reconciliation": _order_reconciliation_sql,
        "tax_discount_joint_multiplier": _tax_discount_joint_sql,
        # span ratios with the n_orders > 1 floor: one-shot-only
        # segments leave the span avg NULL (coalesced 0.0)
        "customer_order_span_profile": _order_span_profile_sql,
        # revenue-share HHI: zero-revenue types hit the share division
        # only through type_rev > 0 rows (all-zero -> NULL -> 0.0)
        "part_type_brand_diversity": _brand_diversity_sql,
        # corr_safe over supplier LEFT JOIN: no-volume suppliers keep
        # coalesced 0.0 revenue rows
        "supplier_balance_volume_corr": _supplier_balance_volume_sql,
        "order_weekday_mix_by_segment": _weekday_mix_sql,
        # year-over-year partner-set Jaccard: single-year graphs emit
        # no pairs; identical consecutive years pin jaccard at 1.0
        # (parts query folded to one WITH chain — the parity gate
        # checks the MATH; materialization is a Spark-only concern)
        "trade_partner_turnover": _folded_parts(_partner_turnover_parts),
        # percentile-bound price quartiles: constant-price fragments
        # put every bound on one value; zero-discount corpora leave
        # the depth avg NULL (coalesced 0.0)
        "discount_depth_by_price_quartile": _discount_depth_sql,
        # dense nation x brand spine with nullif margins: single-cell
        # fragments pin lift at 1.0 and chi2 at 0
        "nation_brand_affinity": _nation_brand_affinity_sql,
        # debtor/creditor conditional avgs: all-creditor segments
        # leave every debtor column NULL (coalesced 0.0)
        "debtor_activity_contrast": _debtor_contrast_sql,
        # one-row vocabulary profile with a scalar subquery
        "part_name_token_stats": _part_name_tokens_sql,
        # year-1 self-join: single-year fragments leave the prior total
        # NULL (nrr -> dbl 0.0); zero-revenue years hit both nullifs
        "net_revenue_retention": _folded_parts(_nrr_parts),
        # n>=2 guards on both moment frames: single-week brands and
        # single-line lead-time sets zero every z rung
        "safety_stock_parameters": _safety_stock_sql,
        # GROUPING SETS dual-axis cells: single-month sides give cv2 0
        # and the rounded-nullif ratio 0.0; zero-qty months hit s>0
        "bullwhip_variance_ratio": _bullwhip_sql,
        # qty>0 filter + n_supp>=2 floor: single-supplier fragments
        # emit no rows; constant unit prices pin cv at exactly 0
        "part_price_dispersion": _price_dispersion_sql,
        # exact-integer pair census on ROUNDED revenue: all-tied
        # customer counts zero the tau-b denominator
        "nation_metric_kendall": _nation_kendall_sql,
        # GROUPING SETS edge census: exact integer fan-outs, the
        # all-same-key fragment pins skew_ratio at n/mean
        "fk_fanout_profile": _fk_fanout_sql,
        # matched-basket indices: single-month fragments make base =
        # current (all indices 1.0); parts absent from the base month
        # drop and show up as basket_coverage < 1
        "laspeyres_price_index": _folded_parts(_price_index_parts),
        # qty>0 filter + corr_safe on the per-order frame: single-order
        # fragments hit the degenerate-corr cutoff; 7+ lines pool
        "basket_size_price_tradeoff": _basket_tradeoff_sql,
        # rounded cell/group means before squared diffs; single-cell
        # fragments put the whole SS in the residual (nullif guard)
        "leadtime_variance_decomposition": _folded_parts(_leadtime_vardecomp_parts),
        # per-year rank cut + consecutive-year set arithmetic: single-
        # year fragments emit no pairs; full churn pins jaccard 0
        "top_customer_turnover": _folded_parts(_top_customer_turnover_parts),
        # single-line-per-order fragments give var 0 (every NB guard
        # fires, overdispersed FALSE); orphan joins drop orders
        "nb_ordersize_fit": _nb_ordersize_sql,
        # dense year x quartile spine with floored shares: collapsed
        # bounds put everything in one cell; first year pins JSD 0.0
        "value_mix_shift_yearly": _folded_parts(_value_mix_shift_parts),
    }


@pytest.mark.parametrize("name", sorted(_star_sql_fns()))
def test_star_queries_on_random_fragments(spark, name):
    sql_fn = _star_sql_fns()[name]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        lines=st.lists(
            st.tuples(
                st.integers(0, 5),                     # l_orderkey
                st.integers(0, 3),                     # l_partkey
                st.sampled_from([0.0, 1.0, 5.0]),      # l_quantity (0 -> guard)
                st.sampled_from([0.0, 100.0, 9.99]),   # l_extendedprice
                st.sampled_from([0.0, 0.1, 1.0]),      # l_discount (1 -> zero rev)
                st.integers(0, 3),                     # ship year offset
                st.integers(0, 2),                     # l_suppkey
            ),
            min_size=1,
            max_size=14,
        ),
        n_orders=st.integers(1, 5),
    )
    def check(lines, n_orders):
        import datetime as dt

        li = pd.DataFrame(
            {
                "l_orderkey": pd.Series([l[0] for l in lines], dtype="int64"),
                "l_partkey": pd.Series([l[1] for l in lines], dtype="int64"),
                "l_suppkey": pd.Series([l[6] for l in lines], dtype="int64"),
                "l_linenumber": pd.Series(range(len(lines)), dtype="int32"),
                "l_quantity": pd.Series([l[2] for l in lines], dtype="float64"),
                "l_extendedprice": pd.Series([l[3] for l in lines], dtype="float64"),
                "l_discount": pd.Series([l[4] for l in lines], dtype="float64"),
                "l_tax": pd.Series([0.05] * len(lines), dtype="float64"),
                "l_returnflag": ["N"] * len(lines),
                "l_linestatus": ["O"] * len(lines),
                "l_shipdate": pd.Series(
                    [dt.datetime(1995 + l[5], 6, 1 + l[0]) for l in lines],
                    dtype="datetime64[us]",
                ),
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": pd.Series(range(n_orders), dtype="int64"),
                "o_custkey": pd.Series(
                    [k % 3 for k in range(n_orders)], dtype="int64"
                ),
                "o_orderstatus": ["O"] * n_orders,
                "o_totalprice": pd.Series(
                    [100.0 * (k + 1) for k in range(n_orders)], dtype="float64"
                ),
                "o_orderdate": pd.Series(
                    [dt.datetime(1995, 1, 1 + k) for k in range(n_orders)],
                    dtype="datetime64[us]",
                ),
                "o_orderpriority": [
                    ("1-URGENT" if k % 2 else "3-MEDIUM") for k in range(n_orders)
                ],
            }
        )
        customer = pd.DataFrame(
            {
                "c_custkey": pd.Series([0, 1, 2], dtype="int64"),
                "c_name": ["c0", "c1", "c2"],
                "c_nationkey": pd.Series([0, 0, 1], dtype="int32"),
                "c_acctbal": pd.Series([10.0, 20.0, 30.0], dtype="float64"),
                "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING"],
            }
        )
        nation = pd.DataFrame(
            {
                "n_nationkey": pd.Series([0, 1], dtype="int32"),
                "n_name": ["FRANCE", "KENYA"],
                "n_regionkey": pd.Series([0, 0], dtype="int32"),
            }
        )
        part = pd.DataFrame(
            {
                "p_partkey": pd.Series([0, 1, 2], dtype="int64"),  # key 3 orphans
                "p_name": ["pa", "pb", "pc"],
                "p_brand": ["Brand#1", "Brand#2", "Brand#1"],
                "p_type": ["T1", "T2", "T1"],
                "p_size": pd.Series([1, 2, 3], dtype="int32"),
                "p_retailprice": pd.Series([10.0, 0.0, 7.5], dtype="float64"),
            }
        )
        supplier = pd.DataFrame(
            {
                "s_suppkey": pd.Series([0, 1], dtype="int64"),  # key 2 orphans
                "s_name": ["sa", "sb"],
                "s_nationkey": pd.Series([0, 1], dtype="int32"),
                "s_acctbal": pd.Series([5.0, 6.0], dtype="float64"),
            }
        )
        frames = {
            "lineitem": (li, "l_orderkey BIGINT, l_partkey BIGINT, "
                         "l_suppkey BIGINT, l_linenumber INT, "
                         "l_quantity DOUBLE, l_extendedprice DOUBLE, "
                         "l_discount DOUBLE, l_tax DOUBLE, "
                         "l_returnflag STRING, l_linestatus STRING, "
                         "l_shipdate TIMESTAMP"),
            "orders": (orders, "o_orderkey BIGINT, o_custkey BIGINT, "
                       "o_orderstatus STRING, o_totalprice DOUBLE, "
                       "o_orderdate TIMESTAMP, o_orderpriority STRING"),
            "customer": (customer, "c_custkey BIGINT, c_name STRING, "
                         "c_nationkey INT, c_acctbal DOUBLE, "
                         "c_mktsegment STRING"),
            "nation": (nation, "n_nationkey INT, n_name STRING, "
                       "n_regionkey INT"),
            "part": (part, "p_partkey BIGINT, p_name STRING, p_brand STRING, "
                     "p_type STRING, p_size INT, p_retailprice DOUBLE"),
            "supplier": (supplier, "s_suppkey BIGINT, s_name STRING, "
                         "s_nationkey INT, s_acctbal DOUBLE"),
        }
        _assert_parity_tables(spark, frames, sql_fn, name)

    check()


def test_size_price_correlation_on_random_parts(spark):
    from fiveg_spark.operators.stats_assoc import _size_price_corr_sql

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        parts=st.lists(
            st.tuples(
                st.sampled_from(["T1", "T2"]),
                st.integers(1, 4),
                # tiny price alphabet -> constant-price types are
                # common, exercising corr_safe's degenerate cutoff
                st.sampled_from([0.0, 5.0, 5.0, 12.5]),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def check(parts):
        pdf = pd.DataFrame(
            {
                "p_partkey": pd.Series(range(len(parts)), dtype="int64"),
                "p_name": [f"p{i}" for i in range(len(parts))],
                "p_brand": ["Brand#1"] * len(parts),
                "p_type": [t for t, _s, _p in parts],
                "p_size": pd.Series([s for _t, s, _p in parts], dtype="int32"),
                "p_retailprice": pd.Series(
                    [p for _t, _s, p in parts], dtype="float64"
                ),
            }
        )
        _assert_parity(
            spark, pdf, "part",
            "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
            "p_size INT, p_retailprice DOUBLE",
            _size_price_corr_sql, "size_price_correlation",
        )

    check()


def test_component_moments_on_random_embeddings(spark):
    from fiveg_spark.operators.similarity import _component_moments_sql

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        vecs=st.lists(
            st.tuples(
                st.integers(0, 2),  # label
                # constant vectors (all one value) are COMMON -> the
                # sigma=0 skew/kurtosis guards exercise every run
                st.lists(
                    st.sampled_from([0.0, 1.0, -2.5]), min_size=4, max_size=4
                ),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def check(vecs):
        pdf = pd.DataFrame(
            {
                "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
                "embedding": [[float(x) for x in v] for _l, v in vecs],
                "label": pd.Series([l for l, _v in vecs], dtype="int32"),
            }
        )
        _assert_parity(
            spark, pdf, "embeddings",
            "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
            _component_moments_sql, "embedding_component_moments",
        )

    check()


def test_source_coherence_on_random_joined_frames(spark):
    from fiveg_spark.operators.similarity import _source_coherence_parts
    from fiveg_spark.plans.registry import run_parts as _rp

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        vecs=st.lists(
            st.tuples(
                st.sampled_from(["s1", "s2"]),
                # zero vectors (dropped by the norm guard) and repeated
                # directions (cosine exactly 1) are both common
                st.lists(
                    st.sampled_from([0.0, 1.0, -1.0]), min_size=3, max_size=3
                ),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def check(vecs):
        docs = pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(vecs)), dtype="int64"),
                "text": [f"doc {i}" for i in range(len(vecs))],
                "lang": ["en"] * len(vecs),
                "source": [s for s, _v in vecs],
                "n_chars": pd.Series([5] * len(vecs), dtype="int64"),
            }
        )
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
                "embedding": [[float(x) for x in v] for _s, v in vecs],
                "label": pd.Series([0] * len(vecs), dtype="int32"),
            }
        )
        # Spark side
        spark.createDataFrame(docs, _DOC_SCHEMA).createOrReplaceTempView(
            "documents"
        )
        spark.createDataFrame(
            emb, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
        ).createOrReplaceTempView("embeddings")
        got = _rp(spark, _source_coherence_parts)
        spark_rows = _rows(got.columns, got.collect())
        # DuckDB side (fold the materialized CTE into one WITH chain)
        from fiveg_spark.plans.registry import materialized_backed

        oracle = materialized_backed(
            "_tmp_coh", _source_coherence_parts, ("documents", "embeddings")
        ).oracle
        con = duckdb.connect()
        try:
            con.register("documents", docs)
            con.register("embeddings", emb)
            res = con.execute(oracle)
            duck_cols = [d0[0] for d0 in res.description]
            duck_rows = _rows(duck_cols, res.fetchall())
        finally:
            con.close()
        assert sorted(got.columns) == sorted(duck_cols)
        assert spark_rows == duck_rows

    check()


@pytest.mark.parametrize("parts_name", ["global_clip", "component_clip"])
def test_embedding_parts_queries_on_random_vectors(spark, parts_name):
    """Parts-based embeddings queries through both engines on random
    tiny vector sets (constant vectors, repeated directions, zero
    vectors — the degenerate shapes the guards exist for; the r11
    per-component variant adds the degenerate PER-INDEX range, where
    a constant component pins its step to the nullif guard)."""
    from fiveg_spark.operators.similarity import (
        _quant_clip_eval_parts,
        _quant_component_clip_parts,
    )
    from fiveg_spark.plans.registry import materialized_backed
    from fiveg_spark.plans.registry import run_parts as _rp

    _quant_parts = {
        "global_clip": _quant_clip_eval_parts,
        "component_clip": _quant_component_clip_parts,
    }[parts_name]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        vecs=st.lists(
            st.lists(
                st.sampled_from([0.0, 0.25, 1.0, -2.5]), min_size=3, max_size=3
            ),
            min_size=1,
            max_size=8,
        )
    )
    def check(vecs):
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
                "embedding": [[float(x) for x in v] for v in vecs],
                "label": pd.Series([0] * len(vecs), dtype="int32"),
            }
        )
        spark.createDataFrame(
            emb, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
        ).createOrReplaceTempView("embeddings")
        got = _rp(spark, _quant_parts)
        spark_rows = _rows(got.columns, got.collect())
        oracle = materialized_backed(
            "_tmp_qce", _quant_parts, ("embeddings",)
        ).oracle
        con = duckdb.connect()
        try:
            con.register("embeddings", emb)
            res = con.execute(oracle)
            duck_cols = [d0[0] for d0 in res.description]
            duck_rows = _rows(duck_cols, res.fetchall())
        finally:
            con.close()
        assert sorted(got.columns) == sorted(duck_cols)
        assert spark_rows == duck_rows

    check()


def test_reciprocity_by_year_on_random_graphs(spark):
    from fiveg_spark.operators.ts_advanced import _reciprocity_by_year_parts
    from fiveg_spark.plans.registry import materialized_backed
    from fiveg_spark.plans.registry import run_parts as _rp

    import datetime as dt

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        li=st.lists(
            st.tuples(
                st.integers(0, 3),  # orderkey (-> custkey -> cust nation)
                st.integers(0, 2),  # suppkey (-> supp nation)
                st.integers(0, 1),  # year offset
            ),
            min_size=1,
            max_size=12,
        )
    )
    def check(li):
        nation = pd.DataFrame(
            {"n_nationkey": pd.Series([0, 1, 2], dtype="int32"),
             "n_name": ["A", "B", "C"],
             "n_regionkey": pd.Series([0, 0, 0], dtype="int32")}
        )
        customer = pd.DataFrame(
            {"c_custkey": pd.Series([0, 1, 2, 3], dtype="int64"),
             "c_nationkey": pd.Series([0, 1, 2, 0], dtype="int32")}
        )
        supplier = pd.DataFrame(
            {"s_suppkey": pd.Series([0, 1, 2], dtype="int64"),
             "s_nationkey": pd.Series([1, 2, 0], dtype="int32")}
        )
        orders = pd.DataFrame(
            {"o_orderkey": pd.Series(range(8), dtype="int64"),
             "o_custkey": pd.Series([k % 4 for k in range(8)], dtype="int64"),
             "o_orderdate": pd.Series(
                 [dt.datetime(1995 + (k % 2), 6, 1) for k in range(8)],
                 dtype="datetime64[us]")}
        )
        lineitem = pd.DataFrame(
            {"l_orderkey": pd.Series([x[0] for x in li], dtype="int64"),
             "l_suppkey": pd.Series([x[1] for x in li], dtype="int64"),
             "l_linenumber": pd.Series(range(len(li)), dtype="int32")}
        )
        frames = {
            "nation": (nation, "n_nationkey INT, n_name STRING, n_regionkey INT"),
            "customer": (customer, "c_custkey BIGINT, c_nationkey INT"),
            "supplier": (supplier, "s_suppkey BIGINT, s_nationkey INT"),
            "orders": (orders, "o_orderkey BIGINT, o_custkey BIGINT, "
                       "o_orderdate TIMESTAMP"),
            "lineitem": (lineitem, "l_orderkey BIGINT, l_suppkey BIGINT, "
                         "l_linenumber INT"),
        }
        for view, (pdf, schema) in frames.items():
            spark.createDataFrame(pdf, schema).createOrReplaceTempView(view)
        got = _rp(spark, _reciprocity_by_year_parts)
        spark_rows = _rows(got.columns, got.collect())
        oracle = materialized_backed(
            "_tmp_rby", _reciprocity_by_year_parts, tuple(frames)
        ).oracle
        con = duckdb.connect()
        try:
            for view, (pdf, _schema) in frames.items():
                con.register(view, pdf)
            res = con.execute(oracle)
            duck_cols = [d0[0] for d0 in res.description]
            duck_rows = _rows(duck_cols, res.fetchall())
        finally:
            con.close()
        assert sorted(got.columns) == sorted(duck_cols)
        assert spark_rows == duck_rows

    check()


def test_embedding_smoothness_on_random_vectors(spark):
    from fiveg_spark.operators.engagement_ext import _emb_smoothness_sql

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        vecs=st.lists(
            st.tuples(
                st.integers(0, 2),  # label
                # constant vectors make every step 0; sign flips make
                # the max-step fold dominate
                st.lists(
                    st.sampled_from([0.0, 1.0, -2.5]), min_size=2, max_size=5
                ),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def check(vecs):
        pdf = pd.DataFrame(
            {
                "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
                "embedding": [[float(x) for x in v] for _l, v in vecs],
                "label": pd.Series([l for l, _v in vecs], dtype="int32"),
            }
        )
        _assert_parity(
            spark, pdf, "embeddings",
            "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
            _emb_smoothness_sql, "embedding_smoothness",
        )

    check()


def _embgeo_parts_fns():
    from fiveg_spark.operators.embedding_geometry import (
        _cosine_curve_parts,
        _hubness_parts,
        _knn_confusion_parts,
        _twonn_parts,
    )

    return {
        # duplicate vectors round d1 to 0 -> degenerate anchors drop
        # from the MLE; single-vector corpora have an EMPTY pair frame
        "intrinsic_dimension_2nn": _twonn_parts,
        # n=1 corpora pin nk=0 everywhere (skew guard, antihub 1.0);
        # duplicate-heavy sets make rank ties common (vec_id tiebreak)
        "knn_hubness_profile": _hubness_parts,
        # margin windows over the <=|labels|² cell frame; single-label
        # corpora emit one all-diagonal cell at lift exactly 1.0
        "knn_label_confusion": _knn_confusion_parts,
        # multi-distinct rung census on the half pair frame: single-
        # vector corpora have zero pairs (every nullif share fires)
        "cosine_threshold_curve": _cosine_curve_parts,
    }


@pytest.mark.parametrize("name", sorted(_embgeo_parts_fns()))
def test_embedding_geometry_on_random_vectors(spark, name):
    from fiveg_spark.plans.registry import materialized_backed
    from fiveg_spark.plans.registry import run_parts as _rp

    parts_fn = _embgeo_parts_fns()[name]

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        vecs=st.lists(
            st.lists(
                st.sampled_from([0.0, 0.25, 1.0, -2.5]), min_size=3, max_size=3
            ),
            min_size=1,
            max_size=8,
        ),
    )
    def check(vecs):
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
                "embedding": [[float(x) for x in v] for v in vecs],
                "label": pd.Series(
                    [i % 2 for i in range(len(vecs))], dtype="int32"
                ),
            }
        )
        spark.createDataFrame(
            emb, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
        ).createOrReplaceTempView("embeddings")
        got = _rp(spark, parts_fn)
        spark_rows = _rows(got.columns, got.collect())
        oracle = materialized_backed(
            "_tmp_eg", parts_fn, ("embeddings",)
        ).oracle
        con = duckdb.connect()
        try:
            con.register("embeddings", emb)
            res = con.execute(oracle)
            duck_cols = [d0[0] for d0 in res.description]
            duck_rows = _rows(duck_cols, res.fetchall())
        finally:
            con.close()
        assert sorted(got.columns) == sorted(duck_cols), name
        assert spark_rows == duck_rows, name

    check()


def test_jl_norm_preservation_on_random_64d(spark):
    """JL audit parity on random full-width vectors (zero vectors hit
    the vsq guard; element_at needs all 64 positions present, so the
    generator emits full-dimension vectors)."""
    from fiveg_spark.operators.embedding_geometry import EMB_DIM, _jl_norm_sql

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        vecs=st.lists(
            st.lists(
                st.sampled_from([0.0, 1.0, -2.5]),
                min_size=EMB_DIM,
                max_size=EMB_DIM,
            ),
            min_size=1,
            max_size=6,
        ),
    )
    def check(vecs):
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
                "embedding": [[float(x) for x in v] for v in vecs],
                "label": pd.Series(
                    [i % 2 for i in range(len(vecs))], dtype="int32"
                ),
            }
        )
        _assert_parity(
            spark, emb, "embeddings",
            "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
            _jl_norm_sql, "jl_norm_preservation",
        )

    check()
