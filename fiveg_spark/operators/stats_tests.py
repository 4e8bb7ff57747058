"""Classical statistical-test battery over the KPI hourly frame and the
event stream (SURVEY §2 D73-D79): Kruskal-Wallis, Friedman,
Brown-Forsythe, chi-square GOF, standardized effect sizes, Weibull and
Gumbel distribution fits.

The existing inference family tests PAIRS (Welch D39, Mann-Whitney D33)
or single series (Mann-Kendall D48); these close the k-SAMPLE and
DISTRIBUTION-FIT gaps: "do the k slices differ at all?" (KW = rank
ANOVA, Friedman = blocked rank ANOVA, Brown-Forsythe = variance
homogeneity — the assumption check BEFORE trusting anova_slice_means),
"is load uniform over the clock?" (chi-square GOF), "how big is the
weekend shift?" (Cohen/Hedges/Glass ladder), and "what law do the
tails follow?" (Weibull IATs, Gumbel block maxima).

Scale doctrine: every rank window rides the HOURLY rollup (bounded by
calendar x |slices|, not data volume — the D33 precedent); raw-event
queries are single-scan decomposable sums; the Weibull fit replaces the
empirical-CDF rank window with a 9-point exact-percentile ladder (one
hash-agg) + OLS on the tiny ladder frame.

Reference scope: beyond-reference analytics breadth (the reference's
train.py consumes the KPI frame without ever validating distributional
assumptions; these are the checks its VAR/GRU pipeline should run).
"""

from __future__ import annotations

from fiveg_spark.operators.timeseries import _hourly_cte
from fiveg_spark.plans.registry import (
    NUDGE,
    cnt,
    dbl,
    epoch,
    materialized_backed,
    ols_slope,
    pct,
    sql_backed,
)


def _hourly_part(d: str, prefix: str) -> tuple[str, str]:
    """Materialized (slice, h, v) hourly frame — the _era_split_parts
    recipe without the era tag; rank/median consumers reference it 2-3
    times and Spark would re-run the events scan per reference."""
    sql = f"""
      WITH {_hourly_cte(d).lstrip().removeprefix("WITH ")}
      SELECT slice, h, throughput_bps AS v FROM hourly
    """
    return (f"_mz_{prefix}_hourly", sql)


def _kruskal_wallis_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # D73 — Kruskal-Wallis rank one-way ANOVA across slices on hourly
    # throughput (Kruskal & Wallis 1952): the nonparametric companion
    # to D38 anova_slice_means — valid under non-normal load (the norm
    # for traffic), immune to monotone transforms.  H = 12/(N(N+1))
    # Σ R_j²/n_j − 3(N+1), tie-corrected by 1 − Σ(t³−t)/(N³−N);
    # epsilon² = (H−k+1)/(N−k) is the effect size (Tomczak 2014).
    #
    # Midranks are the D33 integer window arithmetic — exact and
    # engine-identical — but GLOBAL (one ranking across all slices):
    # the window rides the hourly rollup, ≤ |hours|·|slices| rows
    # bounded by calendar, allow-listed in POST_AGG_GLOBAL_WINDOWS.
    parts = [_hourly_part(d, "kw")]
    tail = f"""
    WITH ranked AS (
      SELECT slice,
        sum(1.0) OVER (
          ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
        - count(*) OVER (PARTITION BY v)
        + (count(*) OVER (PARTITION BY v) + 1.0) / 2.0 AS midrank
      FROM _mz_kw_hourly
    ),
    grp AS (
      SELECT slice, CAST(count(*) AS DOUBLE) AS n_j, sum(midrank) AS r_j
      FROM ranked GROUP BY slice
    ),
    ties AS (
      SELECT coalesce(sum(t * t * t - t), 0.0) AS tie_cubes
      FROM (
        SELECT CAST(count(*) AS DOUBLE) AS t
        FROM _mz_kw_hourly GROUP BY v
      ) g
    ),
    tot AS (
      SELECT sum(n_j) AS n, CAST(count(*) AS DOUBLE) AS k,
             sum(r_j * r_j / n_j) AS s
      FROM grp
    ),
    stat AS (
      SELECT
        t.n, t.k,
        CASE WHEN t.n >= 2.0
             THEN 12.0 / (t.n * (t.n + 1.0)) * t.s - 3.0 * (t.n + 1.0)
             ELSE 0.0 END AS h_raw,
        CASE WHEN t.n >= 2.0
                  AND 1.0 - x.tie_cubes / (t.n * t.n * t.n - t.n) > 1e-12
             THEN (12.0 / (t.n * (t.n + 1.0)) * t.s - 3.0 * (t.n + 1.0))
                  / (1.0 - x.tie_cubes / (t.n * t.n * t.n - t.n))
             ELSE 0.0 END AS h_stat
      FROM tot t CROSS JOIN ties x
    )
    SELECT
      g.slice,
      {cnt("g.n_j", "n_hours")},
      {dbl("g.r_j / g.n_j", "mean_rank")},
      {dbl("s.h_raw", "h_raw")},
      {dbl("s.h_stat", "h_stat")},
      {cnt("s.k - 1", "dof")},
      {dbl(
          "CASE WHEN s.n > s.k "
          "THEN (s.h_stat - s.k + 1.0) / (s.n - s.k) ELSE 0.0 END",
          "epsilon_sq",
      )}
    FROM grp g CROSS JOIN stat s
    ORDER BY g.slice
    """
    return parts, tail


def _friedman_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # D74 — Friedman blocked rank test (Friedman 1937, Conover 1999
    # tie-robust form): each hour is a BLOCK, slices are ranked within
    # it, so a diurnal load swing that hits every slice equally cancels
    # out — KW (D73) pools hours and would read shared seasonality as
    # slice difference; Friedman is the paired design.  Only COMPLETE
    # blocks (all k slices present) enter, the textbook requirement.
    #
    #   A2 = Σ r_ij²,  B2 = (1/n) Σ_j R_j²,
    #   T  = (k−1)(B2 − nk(k+1)²/4) / (A2 − B2)   ~ χ²_{k−1}
    #   W  = T / (n(k−1))                         (Kendall's W)
    #
    # A2 = B2 has TWO degenerate readings Conover's ratio conflates:
    # every block all-tied (numerator 0 too → no discrimination, T = 0)
    # vs PERFECT untied concordance (identical rankings in every block
    # → the supremum T = n(k−1), W = 1); the CASE below separates them
    # on the numerator's sign.
    #
    # Ranks are per-hour windows (≤ k rows each); the complete-block
    # census and the rank pass both read the materialized hourly frame.
    parts = [_hourly_part(d, "fr")]
    tail = f"""
    WITH k AS (
      SELECT CAST(count(DISTINCT slice) AS DOUBLE) AS k FROM _mz_fr_hourly
    ),
    complete AS (
      SELECT h.slice, h.h, h.v
      FROM _mz_fr_hourly h
      JOIN (
        SELECT h FROM _mz_fr_hourly CROSS JOIN k
        GROUP BY h, k.k HAVING count(*) = k.k
      ) b ON b.h = h.h
    ),
    ranked AS (
      SELECT slice,
        sum(1.0) OVER (
          PARTITION BY h
          ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
        - count(*) OVER (PARTITION BY h, v)
        + (count(*) OVER (PARTITION BY h, v) + 1.0) / 2.0 AS midrank
      FROM complete
    ),
    grp AS (
      SELECT slice, CAST(count(*) AS DOUBLE) AS n_blocks,
             sum(midrank) AS r_j, sum(midrank * midrank) AS rr_j
      FROM ranked GROUP BY slice
    ),
    tot AS (
      SELECT max(n_blocks) AS n, CAST(count(*) AS DOUBLE) AS k,
             sum(rr_j) AS a2, sum(r_j * r_j) AS b2_num
      FROM grp
    ),
    stat AS (
      SELECT n, k,
        CASE WHEN n >= 1.0 AND a2 - b2_num / n > 1e-12
             THEN (k - 1.0)
                  * (b2_num / n - n * k * (k + 1.0) * (k + 1.0) / 4.0)
                  / (a2 - b2_num / n)
             WHEN n >= 1.0
                  AND b2_num / n - n * k * (k + 1.0) * (k + 1.0) / 4.0
                      > 1e-12
             THEN n * (k - 1.0)
             ELSE 0.0 END AS chi2_f
      FROM tot
    )
    SELECT
      g.slice,
      {cnt("g.n_blocks", "n_blocks")},
      {dbl("g.r_j", "rank_sum")},
      {dbl("g.r_j / g.n_blocks", "mean_rank")},
      {dbl("s.chi2_f", "chi2_f")},
      {cnt("s.k - 1", "dof")},
      {dbl(
          "CASE WHEN s.n >= 1.0 AND s.k > 1.0 "
          "THEN s.chi2_f / (s.n * (s.k - 1.0)) ELSE 0.0 END",
          "kendall_w",
      )}
    FROM grp g CROSS JOIN stat s
    ORDER BY g.slice
    """
    return parts, tail


def _levene_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # D75 — Brown-Forsythe variance-homogeneity test across slices
    # (Brown & Forsythe 1974: Levene's test with the MEDIAN center,
    # robust to heavy tails): the assumption audit BEFORE trusting
    # D38's pooled-variance ANOVA — unequal slice variances silently
    # inflate its F.  z_ij = |v_ij − med_j|, then one-way ANOVA on z:
    #
    #   F = [(N−k)/(k−1)] · Σ n_j(z̄_j − z̄)² / Σ_ij (z_ij − z̄_j)²
    #
    # Medians are exact percentiles per slice (tiny frame) broadcast
    # back onto the hourly rollup; everything after is decomposable
    # sums.  The rounded median (era-split discipline) keeps both
    # engines subtracting the same center.
    parts = [_hourly_part(d, "lv")]
    tail = f"""
    WITH med AS (
      SELECT slice, round({pct("v", 0.5, d)} + {NUDGE}, 4) + 0.0 AS med
      FROM _mz_lv_hourly GROUP BY slice
    ),
    z AS (
      SELECT h.slice, abs(h.v - m.med) AS z, m.med
      FROM _mz_lv_hourly h JOIN med m ON m.slice = h.slice
    ),
    grp AS (
      SELECT slice, CAST(count(*) AS DOUBLE) AS n_j,
             sum(z) AS s_j, sum(z * z) AS ss_j, max(med) AS med
      FROM z GROUP BY slice
    ),
    tot AS (
      SELECT sum(n_j) AS n, CAST(count(*) AS DOUBLE) AS k,
             sum(s_j) AS s,
             sum(s_j * s_j / n_j) AS sb,
             sum(ss_j) AS ss
      FROM grp
    ),
    stat AS (
      SELECT n, k,
        sb - s * s / n AS between_ss,
        ss - sb AS within_ss,
        CASE WHEN k > 1.0 AND n > k AND ss - sb > 1e-12
             THEN ((n - k) / (k - 1.0)) * (sb - s * s / n) / (ss - sb)
             ELSE 0.0 END AS f_stat
      FROM tot
    )
    SELECT
      g.slice,
      {cnt("g.n_j", "n_hours")},
      {dbl("g.med", "median_v")},
      {dbl("g.s_j / g.n_j", "mean_absdev")},
      {dbl("s.f_stat", "f_stat")},
      {cnt("s.k - 1", "df_between")},
      {cnt("s.n - s.k", "df_within")},
      {dbl("CASE WHEN s.n > 0 THEN s.between_ss / s.n ELSE 0.0 END",
           "between_ms_per_row")}
    FROM grp g CROSS JOIN stat s
    ORDER BY g.slice
    """
    return parts, tail


def _chisq_hour_uniformity_sql(d: str) -> str:
    # D76 — chi-square goodness-of-fit of the hour-of-day arrival
    # profile against the uniform clock, per event type: the formal
    # test behind the seasonal_profile/weekday_hour_heatmap pictures
    # ("is this type's diurnal pattern real or sampling noise?").
    # With E = n/24 the statistic collapses to the single-agg identity
    # χ² = 24·Σc²/n − n (missing hours contribute E = their (0−E)²/E
    # automatically), so one scan + one ≤|types|·24 rollup; Cramér's
    # V-analog sqrt(χ²/(n·23)) normalizes across types of different
    # volume.  Exact integer counts — zero float drift before the
    # final divisions.
    es = epoch("ts", d)
    hour = f"(CAST(floor({es} / 3600.0) AS BIGINT) % 24)"
    return f"""
    WITH cells AS (
      SELECT event_type, {hour} AS hr, count(*) AS c
      FROM events
      GROUP BY event_type, {hour}
    ),
    per_type AS (
      SELECT event_type,
        CAST(sum(c) AS DOUBLE) AS n,
        CAST(sum(c * c) AS DOUBLE) AS cc,
        CAST(count(*) AS BIGINT) AS hours_hit,
        CAST(max(c) AS DOUBLE) AS peak_c
      FROM cells GROUP BY event_type
    )
    SELECT
      event_type,
      {cnt("n", "n_events")},
      {cnt("hours_hit", "hours_hit")},
      {dbl("24.0 * cc / n - n", "chi2")},
      {cnt("23", "dof")},
      {dbl("CASE WHEN n > 0 THEN sqrt((24.0 * cc / n - n) / (n * 23.0)) "
           "ELSE 0.0 END", "cramers_v")},
      {dbl("peak_c / n", "peak_hour_share")},
      CAST(24.0 * cc / n - n > 35.17 AS BOOLEAN) AS nonuniform
    FROM per_type
    ORDER BY event_type
    """
    # 35.17 = χ²_{23, 0.95}: the fixed 95% critical value, a constant
    # comparison on the exact-integer statistic (no p-value machinery).


def _effect_size_ladder_sql(d: str) -> str:
    # D77 — standardized weekend-vs-weekday effect sizes per event
    # type: D39 (Welch) answers "is there a shift?"; this answers "how
    # BIG is it?" — the report number that survives sample-size growth
    # (at 100 TB every t-test is significant; effect sizes are what
    # still mean something).  Cohen's d (pooled SD), Hedges' g (the
    # small-sample J correction), Glass's Δ (weekday-SD denominator,
    # for unequal variances), and the log variance ratio (the
    # dispersion effect d/g/Δ are blind to).  One scan, decomposable
    # sums; the variance ratio is rounded before ln (round-before-log
    # discipline).
    iso = f"((CAST(floor({epoch('ts', d)} / 86400.0) AS BIGINT) + 3) % 7)"
    var = (
        "CASE WHEN {n} >= 2.0 THEN ({ss} - {s} * {s} / {n}) / ({n} - 1.0) "
        "ELSE 0.0 END"
    )
    v1 = var.format(n="n1", s="s1", ss="ss1")
    v2 = var.format(n="n2", s="s2", ss="ss2")
    pooled = (
        f"CASE WHEN n1 + n2 > 2.0 "
        f"THEN ((n1 - 1.0) * {v1} + (n2 - 1.0) * {v2}) / (n1 + n2 - 2.0) "
        f"ELSE 0.0 END"
    )
    diff = "(s2 / n2 - s1 / n1)"
    cohens = (
        f"CASE WHEN n1 >= 2.0 AND n2 >= 2.0 AND {pooled} > 1e-12 "
        f"THEN {diff} / sqrt({pooled}) ELSE 0.0 END"
    )
    hedges_j = "(1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))"
    return f"""
    WITH tagged AS (
      SELECT event_type, value AS v,
        CASE WHEN {iso} >= 5 THEN 1 ELSE 0 END AS wk
      FROM events
    ),
    grp AS (
      SELECT event_type,
        sum(CASE WHEN wk = 0 THEN 1.0 ELSE 0.0 END) AS n1,
        sum(CASE WHEN wk = 0 THEN v ELSE 0.0 END) AS s1,
        sum(CASE WHEN wk = 0 THEN v * v ELSE 0.0 END) AS ss1,
        sum(CASE WHEN wk = 1 THEN 1.0 ELSE 0.0 END) AS n2,
        sum(CASE WHEN wk = 1 THEN v ELSE 0.0 END) AS s2,
        sum(CASE WHEN wk = 1 THEN v * v ELSE 0.0 END) AS ss2
      FROM tagged GROUP BY event_type
    )
    SELECT
      event_type,
      {cnt("n1", "n_weekday")},
      {cnt("n2", "n_weekend")},
      {dbl(f"CASE WHEN n1 > 0 AND n2 > 0 THEN {diff} ELSE 0.0 END",
           "mean_shift")},
      {dbl(cohens, "cohens_d")},
      {dbl(f"CASE WHEN n1 + n2 > 2.25 THEN ({cohens}) * {hedges_j} "
           "ELSE 0.0 END", "hedges_g")},
      {dbl(f"CASE WHEN n1 >= 2.0 AND n2 >= 2.0 AND {v1} > 1e-12 "
           f"THEN {diff} / sqrt({v1}) ELSE 0.0 END", "glass_delta")},
      {dbl(f"CASE WHEN {v1} > 1e-12 AND {v2} > 1e-12 "
           f"AND round({v2} / ({v1}) + {NUDGE}, 4) + 0.0 > 0.0 "
           f"THEN ln(round({v2} / ({v1}) + {NUDGE}, 4) + 0.0) "
           "ELSE 0.0 END", "log_var_ratio")}
    FROM grp
    ORDER BY event_type
    """


WEIBULL_LADDER = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def _weibull_iat_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # D78 — Weibull fit of per-user inter-arrival times per event type
    # (the two-parameter generalization of D24's exponential: shape
    # k < 1 = bursty/clustered arrivals, k = 1 = Poisson, k > 1 =
    # regular/pacemaker).  Weibull CDF linearizes as
    #   ln(−ln(1−p)) = k·ln(q_p) − k·ln(λ),
    # so OLS over a 9-point EXACT-percentile ladder recovers (k, λ)
    # without the textbook empirical-CDF rank window — the D24 scale
    # move: one hash-agg for the ladder, OLS on a ≤|types|·9 frame.
    #
    # ONLY the ladder materializes: it is UNPIVOTED via 9 UNION ALL
    # branches, which Spark would otherwise inline into 9 re-runs of
    # the percentile aggregation.  The events-sized IAT frame has
    # exactly one consumer (the ladder agg) so it rides INSIDE that
    # job (r13 fold — the old shape checkpointed every IAT row for a
    # single read).
    quant_cols = ",\n        ".join(
        f"{dbl(pct('iat', p, d), f'q{i}')}"
        for i, p in enumerate(WEIBULL_LADDER, start=1)
    )
    quants_sql = f"""
      WITH seq AS (
        SELECT
          event_type,
          {epoch("ts", d)} AS t,
          lag({epoch("ts", d)}) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id
          ) AS prev_t
        FROM events
      ),
      iat AS (
        SELECT event_type, t - prev_t AS iat
        FROM seq
        WHERE prev_t IS NOT NULL
      )
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        {quant_cols}
      FROM iat
      GROUP BY event_type
    """
    branches = "\n      UNION ALL ".join(
        f"SELECT event_type, n, {p} AS p, q{i} AS q FROM _mz_wb_quants"
        for i, p in enumerate(WEIBULL_LADDER, start=1)
    )
    # x = ln(q_p) on the 4dp-rounded ladder (round-before-log), y is a
    # constant per rung — exact in both engines.
    slope = ols_slope("ln(q)", "ln(-ln(1.0 - p))")
    tail = f"""
    WITH ladder AS (
      {branches}
    ),
    pts AS (
      SELECT event_type, p, q FROM ladder WHERE q > 1e-9
    ),
    fit AS (
      SELECT event_type,
        CAST(count(*) AS DOUBLE) AS n_pts,
        {slope} AS k_shape,
        avg(ln(q)) AS xbar,
        avg(ln(-ln(1.0 - p))) AS ybar
      FROM pts GROUP BY event_type
    )
    SELECT
      b.event_type,
      {cnt("b.n", "n_iat")},
      {cnt("coalesce(f.n_pts, 0.0)", "n_ladder_points")},
      {dbl("f.k_shape", "k_shape")},
      {dbl(
          "CASE WHEN f.k_shape > 1e-12 "
          "THEN exp(f.xbar - f.ybar / f.k_shape) ELSE 0.0 END",
          "lambda_scale",
      )},
      {dbl(
          "CASE WHEN f.k_shape > 1e-12 "
          "THEN exp(f.xbar - f.ybar / f.k_shape) "
          "     * exp(ln(ln(2.0)) / f.k_shape) ELSE 0.0 END",
          "fitted_median_iat",
      )}
    FROM _mz_wb_quants b LEFT JOIN fit f ON f.event_type = b.event_type
    ORDER BY b.event_type
    """
    # an all-tied type (every rung filtered) keeps its row with the
    # guard zeros instead of silently vanishing from the profile
    return [("_mz_wb_quants", quants_sql)], tail


EULER_MASCHERONI = 0.5772156649015329


def _gumbel_maxima_sql(d: str) -> str:
    # D79 — Gumbel fit of daily MAXIMA of hourly throughput per slice
    # (Fisher-Tippett block-maxima route; the capacity-planning
    # complement to D29's evt_tail_fit, which fits threshold
    # EXCEEDANCES): method-of-moments β = s√6/π, μ = m − γβ, then the
    # T-day return levels μ − β·ln(−ln(1−1/T)) — "the hourly peak you
    # should provision for per month/year".  Two nested rollups
    # (hour → day-max → moments), no windows, no joins.
    #
    # The sample SD comes from decomposable sums (the Welch/corr_safe
    # discipline), NOT the native stddev_samp: the engines' one-pass
    # implementations disagreed by ~4e-3 on 30 daily maxima at sf0.01
    # — amplified ~2.8x into the return levels, through the 4dp nudge.
    day = f"CAST(floor({epoch('h', d)} / 86400.0) AS BIGINT)"
    beta = "CASE WHEN n >= 2.0 THEN sd * 0.7796968012336761 ELSE 0.0 END"
    mu = f"(m - {EULER_MASCHERONI} * ({beta}))"
    # Return-level coefficients −ln(−ln(1−1/T)) are inlined as Python
    # doubles: written as SQL literals, Spark folds `1.0 − 1.0/T` in
    # DECIMAL (scale-limited) while DuckDB folds in DOUBLE — the
    # constants came out 1e-5 apart and β amplified the gap ~6x (the
    # semi_markov decimal-literal landmine, round 9).
    import math

    c30 = repr(-math.log(-math.log(1.0 - 1.0 / 30.0)))
    c365 = repr(-math.log(-math.log(1.0 - 1.0 / 365.0)))
    ret = "({mu} + ({beta}) * {c})"
    return f"""
    {_hourly_cte(d)},
    daily AS (
      SELECT slice, {day} AS day, max(throughput_bps) AS mx
      FROM hourly GROUP BY slice, {day}
    ),
    sums AS (
      SELECT slice,
        CAST(count(*) AS DOUBLE) AS n,
        sum(mx) AS s, sum(mx * mx) AS ss
      FROM daily GROUP BY slice
    ),
    fit AS (
      SELECT slice, n, s / n AS m,
        CASE WHEN n >= 2.0 AND ss - s * s / n > 0.0
             THEN sqrt((ss - s * s / n) / (n - 1.0)) ELSE 0.0 END AS sd
      FROM sums
    )
    SELECT
      slice,
      {cnt("n", "n_days")},
      {dbl("m", "mean_daily_max")},
      {dbl(beta, "gumbel_beta")},
      {dbl(mu, "gumbel_mu")},
      {dbl(ret.format(mu=mu, beta=beta, c=c30), "return_level_30d")},
      {dbl(ret.format(mu=mu, beta=beta, c=c365), "return_level_365d")}
    FROM fit
    ORDER BY slice
    """
    # 0.7796968012336761 = √6/π.


QUERIES = [
    materialized_backed("kruskal_wallis_slices", _kruskal_wallis_parts,
                        ("events",)),
    materialized_backed("friedman_slices", _friedman_parts,
                        ("events",)),
    materialized_backed("levene_variance_homogeneity", _levene_parts,
                        ("events",)),
    sql_backed("chisq_hour_uniformity", _chisq_hour_uniformity_sql,
               ("events",)),
    sql_backed("effect_size_ladder", _effect_size_ladder_sql,
               ("events",)),
    materialized_backed("weibull_iat_fit", _weibull_iat_parts,
                        ("events",)),
    sql_backed("gumbel_maxima_fit", _gumbel_maxima_sql,
               ("events",)),
]


BOOTSTRAP_B = 20
# Poisson(1) inverse-CDF ladder (cumulative probabilities), Python
# doubles inlined (the D79 DECIMAL-literal lesson)
_POIS1_CDF = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
              0.9810118431238462, 0.9963401531726563, 0.9994058151824183)


def _boot_u(b: int) -> str:
    """Uniform-(0,1] from md5 digit arithmetic keyed (replicate,
    event_id) — the B25/_u recipe, engine-exact."""
    h = f"md5(concat('boot{b}#', CAST(event_id AS STRING)))"
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
        f" * {16.0 ** -i!r}"
        for i in range(1, 9)
    )
    return f"({digits} + 1e-10)"


def _poisson_bootstrap_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # D82 — Poisson bootstrap CI for the per-type mean value (Chamandy
    # et al. 2012, "Estimating Uncertainty for Massive Data Streams" —
    # THE distributed bootstrap): classical resampling needs n draws
    # from n rows (a shuffle per replicate); the Poisson trick gives
    # each row an independent Poisson(1) weight per replicate, so ALL
    # B resamples ride ONE scan as 2B conditional sums — map-side
    # partials, no shuffle beyond the type rollup, unchanged at 100 TB.
    # Weights come from md5 inverse-CDF draws (deterministic,
    # engine-exact); the replicate-mean spread is the bootstrap SE,
    # reported next to the analytic sd/√n so the CALIBRATION is the
    # readout (ratio ~ 1 validates both; a gap flags heavy tails or
    # weight bugs).
    w_cols, wv_cols = [], []
    for b in range(1, BOOTSTRAP_B + 1):
        u = _boot_u(b)
        ladder = " ".join(
            f"WHEN {u} < {c!r} THEN {k}.0"
            for k, c in enumerate(_POIS1_CDF)
        )
        w = f"(CASE {ladder} ELSE 6.0 END)"
        w_cols.append(f"sum({w}) AS w{b}")
        wv_cols.append(f"sum({w} * value) AS wv{b}")
    sums_sql = f"""
      SELECT event_type,
        CAST(count(*) AS DOUBLE) AS n,
        sum(value) AS s,
        sum(value * value) AS ss,
        {", ".join(w_cols)},
        {", ".join(wv_cols)}
      FROM events
      GROUP BY event_type
    """
    branches = "\n      UNION ALL ".join(
        f"SELECT event_type, n, s, ss, "
        f"round(wv{b} / nullif(w{b}, 0.0) + {NUDGE}, 4) + 0.0 AS m "
        f"FROM _mz_boot_sums"
        for b in range(1, BOOTSTRAP_B + 1)
    )
    tail = f"""
    WITH reps AS (
      {branches}
    ),
    agg AS (
      SELECT event_type,
        max(n) AS n, max(s) AS s, max(ss) AS ss,
        CAST(count(m) AS DOUBLE) AS n_reps,
        sum(coalesce(m, 0.0)) AS sm,
        sum(coalesce(m * m, 0.0)) AS smm
      FROM reps GROUP BY event_type
    ),
    stat AS (
      SELECT event_type, n, n_reps,
        s / n AS mean_v,
        CASE WHEN n >= 2.0 AND ss - s * s / n > 0.0
             THEN sqrt((ss - s * s / n) / (n - 1.0)) / sqrt(n)
             ELSE 0.0 END AS se_analytic,
        CASE WHEN n_reps >= 2.0 AND smm - sm * sm / n_reps > 0.0
             THEN sqrt((smm - sm * sm / n_reps) / (n_reps - 1.0))
             ELSE 0.0 END AS se_boot
      FROM agg
    )
    SELECT
      event_type,
      {cnt("n", "n_events")},
      {cnt("n_reps", "n_replicates")},
      {dbl("mean_v", "mean_value")},
      {dbl("se_analytic", "se_analytic")},
      {dbl("se_boot", "se_bootstrap")},
      {dbl("CASE WHEN se_analytic > 1e-12 THEN se_boot / se_analytic "
           "ELSE 0.0 END", "se_calibration_ratio")},
      {dbl("mean_v - 1.96 * se_boot", "ci95_lo")},
      {dbl("mean_v + 1.96 * se_boot", "ci95_hi")}
    FROM stat
    ORDER BY event_type
    """
    return [("_mz_boot_sums", sums_sql)], tail


QUERIES.extend([
    materialized_backed("poisson_bootstrap_ci", _poisson_bootstrap_parts,
                        ("events",)),
])


def _median_polish_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # D84 — two-sweep Tukey median polish of the (weekday × hour) load
    # grid per slice (EDA ch. 11): the ROBUST two-way decomposition —
    # B11's mean-based seasonal profile lets one outage hour drag its
    # whole row; median polish doesn't.  Two full sweeps (row medians
    # removed, then column medians, twice) then the residual MAD;
    # output is LONG (slice, component, idx, effect) so weekday
    # effects, hour effects, the grand level, and the residual scale
    # ride one frame.
    #
    # Scale: the 7×24 cell grid per slice is calendar-bounded; every
    # sweep is a percentile agg over ≤|slices|·168 rows reading the
    # ONE materialized cell frame.  Medians round between sweeps so
    # both engines subtract identical doubles (reuse discipline).
    dow = f"((CAST(floor({epoch('h', d)} / 86400.0) AS BIGINT) + 3) % 7)"
    hr = "hour(h)"
    # the 7x24-per-slice cell grid has exactly one consumer (the
    # polish chain below) so it rides INSIDE that job as a CTE (r13
    # fold — a separate eager materialization paid a job for nothing)
    cells_cte = f"""
      WITH {_hourly_cte(d).lstrip().removeprefix("WITH ")},
      cells AS (
        SELECT slice, {dow} AS w, CAST({hr} AS BIGINT) AS hh,
          round(avg(throughput_bps) + {NUDGE}, 4) + 0.0 AS v
        FROM hourly
        GROUP BY slice, {dow}, CAST({hr} AS BIGINT)
      )
    """
    med = lambda x: f"round({pct(x, 0.5, d)} + {NUDGE}, 4) + 0.0"
    # r13 opt: the sweeps ride WINDOW medians layered over ONE pass of
    # the cell frame instead of the old groupBy-median + join-back CTE
    # chain (g→c0→r1→c1→h1→c2→r2→c3→h2→resid).  Every CTE there was
    # referenced twice (next sweep + final output), and Spark inlines
    # CTEs, so the subtree DOUBLED per sweep — the r13 ledger showed 123
    # exchanges.  A window median over PARTITION BY (slice[, w|hh]) is
    # the same median over the same rows, and every subtraction rounds
    # through the same R(x) = round(x + NUDGE, 4) + 0.0 in the same
    # order, so the effects are bit-identical; the polished frame
    # materializes once and the four output branches are cheap aggs of
    # constant-within-group columns (min() picks the one value).
    medw = lambda x, part: (
        f"round({pct(x, 0.5, d)} OVER (PARTITION BY {part}) + {NUDGE}, 4) + 0.0"
    )
    polished_sql = f"""
      {cells_cte}
      SELECT slice, w, hh, g, e_r1, e_h1, e_r2, e_h2,
        round(abs(v3 - e_h2) + {NUDGE}, 4) + 0.0 AS absr
      FROM (
        SELECT *, {medw("v3", "slice, hh")} AS e_h2
        FROM (
          SELECT slice, w, hh, g, e_r1, e_h1, e_r2,
            round(v2 - e_r2 + {NUDGE}, 4) + 0.0 AS v3
          FROM (
            SELECT *, {medw("v2", "slice, w")} AS e_r2
            FROM (
              SELECT slice, w, hh, g, e_r1, e_h1,
                round(v1 - e_h1 + {NUDGE}, 4) + 0.0 AS v2
              FROM (
                SELECT *, {medw("v1", "slice, hh")} AS e_h1
                FROM (
                  SELECT slice, w, hh, g, e_r1,
                    round(v0 - e_r1 + {NUDGE}, 4) + 0.0 AS v1
                  FROM (
                    SELECT *, {medw("v0", "slice, w")} AS e_r1
                    FROM (
                      SELECT slice, w, hh, g,
                        round(v - g + {NUDGE}, 4) + 0.0 AS v0
                      FROM (
                        SELECT *, {medw("v", "slice")} AS g
                        FROM cells
                      ) lg
                    ) lv0
                  ) lr1
                ) lv1
              ) lh1
            ) lv2
          ) lr2
        ) lv3
      ) lh2
    """
    tail = f"""
    SELECT slice, component, idx, {dbl("effect", "effect")}
    FROM (
      SELECT slice, 'grand' AS component, CAST(0 AS BIGINT) AS idx,
             min(g) AS effect
      FROM _mz_mp_polished GROUP BY slice
      UNION ALL
      SELECT slice, 'weekday', w, min(e_r1) + min(e_r2)
      FROM _mz_mp_polished GROUP BY slice, w
      UNION ALL
      SELECT slice, 'hour', hh, min(e_h1) + min(e_h2)
      FROM _mz_mp_polished GROUP BY slice, hh
      UNION ALL
      SELECT slice, 'residual_mad', CAST(0 AS BIGINT), {med("absr")}
      FROM _mz_mp_polished GROUP BY slice
    ) long_frame
    ORDER BY slice, component, idx
    """
    return [("_mz_mp_polished", polished_sql)], tail


def _perm_entropy_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # D85 — permutation entropy of the hourly series per slice (Bandt
    # & Pompe 2002, order m=3): entropy of the ORDINAL-pattern
    # distribution — complexity that ignores amplitude entirely, so it
    # complements D43's spectral entropy (a monotone re-scaling of the
    # load changes spectra but not ordinal patterns).  Normalized by
    # log2(6); forbidden patterns (count 0) are the determinism signal
    # — pure noise uses all 6, a deterministic map leaves holes.
    # Ties break toward the EARLIER sample (<=, the standard
    # convention), on 4dp-rounded values, identically in both engines.
    pat = (
        "CASE "
        "WHEN v0 <= v1 AND v1 <= v2 THEN 0 "
        "WHEN v0 <= v2 AND v2 < v1 THEN 1 "
        "WHEN v1 < v0 AND v0 <= v2 THEN 2 "
        "WHEN v2 < v0 AND v0 <= v1 THEN 3 "
        "WHEN v1 <= v2 AND v2 < v0 THEN 4 "
        "ELSE 5 END"
    )
    cells_sql = f"""
      WITH {_hourly_cte(d).lstrip().removeprefix("WITH ")},
      lagged AS (
        SELECT slice,
          throughput_bps AS v2,
          lag(throughput_bps, 1) OVER (PARTITION BY slice ORDER BY h)
            AS v1,
          lag(throughput_bps, 2) OVER (PARTITION BY slice ORDER BY h)
            AS v0
        FROM hourly
      )
      SELECT slice, {pat} AS pattern, count(*) AS c
      FROM lagged WHERE v0 IS NOT NULL
      GROUP BY slice, {pat}
    """
    p_term = f"round(CAST(c AS DOUBLE) / tot + {NUDGE}, 4) + 0.0"
    tail = f"""
    WITH tot AS (
      SELECT slice, CAST(sum(c) AS DOUBLE) AS tot,
        CAST(count(*) AS BIGINT) AS n_patterns
      FROM _mz_pe_cells GROUP BY slice
    ),
    ent AS (
      SELECT c.slice, t.tot, t.n_patterns,
        sum(CASE WHEN {p_term} > 0.0
                 THEN -({p_term}) * log2({p_term}) ELSE 0.0 END) AS h
      FROM _mz_pe_cells c JOIN tot t ON t.slice = c.slice
      GROUP BY c.slice, t.tot, t.n_patterns
    )
    SELECT
      slice,
      {cnt("tot", "n_triples")},
      {cnt("n_patterns", "n_patterns_seen")},
      {cnt("6 - n_patterns", "n_forbidden_patterns")},
      {dbl("h", "perm_entropy_bits")},
      {dbl("h / 2.5849625007211562", "perm_entropy_normalized")}
    FROM ent
    ORDER BY slice
    """
    # 2.584962... = log2(6), a Python double (DECIMAL-fold lesson).
    return [("_mz_pe_cells", cells_sql)], tail


QUERIES.extend([
    materialized_backed("median_polish_hourweek", _median_polish_parts,
                        ("events",)),
    materialized_backed("permutation_entropy", _perm_entropy_parts,
                        ("events",)),
])


def _bh_screen_sql(d: str) -> str:
    # D86 — Benjamini-Hochberg screened mean-shift scan over every
    # (slice, event_type) cell (Benjamini & Hochberg 1995): the layer
    # that turns the battery's statistics into DECISIONS.  Each cell
    # gets a Welch z of its mean value against the complement of the
    # corpus, a two-sided p via the shared erf-free normal CDF
    # (functions/stats.py A&S 26.2.17 — same SQL text both engines, so
    # p-values get oracle parity by construction), then one BH step-up
    # across the m cells controls FDR at 5% — the multiple-comparison
    # correction that separates "18 tests, 2 nominally significant"
    # noise from discoveries that survive screening.
    #
    # Decisions compare ROUNDED p to ROUNDED critical (the established
    # verdict-on-rounded discipline), so the booleans are engine-
    # deterministic.  One scan -> |slices x types| cells; every window
    # rides that bounded post-agg frame.
    from fiveg_spark.functions.stats import two_sided_p_sql

    slice_case = (
        "CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'eMBB' "
        "WHEN 1 THEN 'URLLC' ELSE 'mMTC' END"
    )
    var1 = "CASE WHEN n1 >= 2 THEN (ss1 - s1 * s1 / n1) / (n1 - 1) ELSE 0.0 END"
    var2 = (
        "CASE WHEN n - n1 >= 2 THEN "
        "((ss - ss1) - (s - s1) * (s - s1) / (n - n1)) / (n - n1 - 1) "
        "ELSE 0.0 END"
    )
    # degenerate-cell guard: a cell (or complement) with fewer than 2
    # events has no variance to test against — z = 0, p = 1, never a
    # discovery (and never a divide-by-zero: Spark yields NULL for
    # double/0 where DuckDB yields inf; Welch needs n >= 2 per side)
    z = (
        f"CASE WHEN n1 < 2 OR n - n1 < 2 THEN 0.0e0 ELSE "
        f"(s1 / n1 - (s - s1) / (n - n1)) / "
        f"sqrt(({var1}) / n1 + ({var2}) / (n - n1) + 1e-12) END"
    )
    return f"""
    WITH cells AS (
      SELECT {slice_case} AS slice, event_type,
        CAST(count(*) AS DOUBLE) AS n1,
        sum(value) AS s1,
        sum(value * value) AS ss1
      FROM events
      GROUP BY {slice_case}, event_type
    ),
    -- corpus totals as a GLOBAL WINDOW over the bounded cell rollup
    -- (decomposable sums): a `tot` CTE would inline in Spark and
    -- re-run the events scan — the window keeps the fact table read
    -- ONCE, and it rides the <= |slices x types| post-agg frame the
    -- query's other global windows already ride
    enriched AS (
      SELECT *,
        sum(n1) OVER () AS n,
        sum(s1) OVER () AS s,
        sum(ss1) OVER () AS ss
      FROM cells
    ),
    zed AS (
      SELECT slice, event_type, n1, {z} AS z
      FROM enriched
    ),
    pvals AS (
      SELECT slice, event_type, n1, z,
        round({two_sided_p_sql("z")} + {NUDGE}, 6) AS p6
      FROM zed
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (ORDER BY p6, slice, event_type) AS rk,
        CAST(count(*) OVER () AS DOUBLE) AS m
      FROM pvals
    ),
    crit AS (
      SELECT *, round(rk * 0.05 / m + {NUDGE}, 6) AS bh_crit6
      FROM ranked
    ),
    stepped AS (
      SELECT *,
        max(CASE WHEN p6 <= bh_crit6 THEN rk ELSE 0 END) OVER () AS k_max
      FROM crit
    )
    SELECT
      slice,
      event_type,
      {cnt("n1", "n_events")},
      {dbl("z", "welch_z")},
      CAST(p6 + 0.0 AS DOUBLE) AS p_two_sided,
      {cnt("rk", "p_rank")},
      CAST(bh_crit6 + 0.0 AS DOUBLE) AS bh_critical,
      CAST(rk <= k_max AS BOOLEAN) AS discovery
    FROM stepped
    ORDER BY slice, event_type
    """


QUERIES.append(
    sql_backed("bh_screened_mean_shifts", _bh_screen_sql, ("events",))
)


def _hour_uniformity_decisions_sql(d: str) -> str:
    # D88 — D76's hour-of-day GOF upgraded from a fixed-critical-value
    # boolean to real DECISIONS: Wilson-Hilferty p-values (dof 23 is
    # ODD — the exact Erlang closed form D87 uses is even-dof only, so
    # this is chi2_sf_wh_sql's unlock; functions/stats.py) + one BH
    # step-up across the |types| family at 5% FDR, the same screening
    # layer D86/D87 established.  Same single-agg identity
    # χ² = 24·Σc²/n − n (exact integers until the final divisions);
    # decisions compare ROUNDED p to ROUNDED critical (engine-
    # deterministic verdicts).  One scan → ≤|types|·24 cells → global
    # windows on the bounded post-agg frame (allow-listed).
    from fiveg_spark.functions.stats import chi2_sf_wh_sql

    es = epoch("ts", d)
    hour = f"(CAST(floor({es} / 3600.0) AS BIGINT) % 24)"
    return f"""
    WITH cells AS (
      SELECT event_type, {hour} AS hr, count(*) AS c
      FROM events
      GROUP BY event_type, {hour}
    ),
    per_type AS (
      SELECT event_type,
        CAST(sum(c) AS DOUBLE) AS n,
        CAST(sum(c * c) AS DOUBLE) AS cc
      FROM cells GROUP BY event_type
    ),
    stat AS (
      SELECT event_type, n,
        CASE WHEN n > 0 THEN 24.0e0 * cc / n - n ELSE 0.0e0 END AS chi2
      FROM per_type
    ),
    pvals AS (
      SELECT event_type, n, chi2,
        round({chi2_sf_wh_sql("chi2", "23")} + {NUDGE}, 6) AS p6
      FROM stat
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (ORDER BY p6, event_type) AS rk,
        CAST(count(*) OVER () AS DOUBLE) AS m
      FROM pvals
    ),
    crit AS (
      SELECT *, round(rk * 0.05 / m + {NUDGE}, 6) AS bh_crit6
      FROM ranked
    ),
    stepped AS (
      SELECT *,
        max(CASE WHEN p6 <= bh_crit6 THEN rk ELSE 0 END) OVER () AS k_max
      FROM crit
    )
    SELECT
      event_type,
      {cnt("n", "n_events")},
      {dbl("chi2", "chi2")},
      {cnt("23", "dof")},
      CAST(p6 + 0.0 AS DOUBLE) AS p_wh,
      {cnt("rk", "p_rank")},
      CAST(bh_crit6 + 0.0 AS DOUBLE) AS bh_critical,
      CAST(rk <= k_max AS BOOLEAN) AS discovery
    FROM stepped
    ORDER BY event_type
    """


def _weekday_uniformity_decisions_sql(d: str) -> str:
    # D89 — the weekday twin at (slice × type) grain: χ² GOF of the
    # day-of-week arrival profile against uniform-7 per cell, EXACT
    # even-dof p-values (dof 6 → chi2_sf_sql's Erlang closed form) +
    # BH across the ≤|slices|·|types| family.  Day classes are epoch
    # days mod 7 — a consistent 7-way clock on both engines (the
    # uniform null makes the class labeling irrelevant).  Same
    # χ² = 7·Σc²/n − n single-agg identity; the D86 slice convention.
    from fiveg_spark.functions.stats import chi2_sf_sql

    es = epoch("ts", d)
    dow = f"(CAST(floor({es} / 86400.0) AS BIGINT) % 7)"
    slice_case = (
        "CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'eMBB' "
        "WHEN 1 THEN 'URLLC' ELSE 'mMTC' END"
    )
    return f"""
    WITH cells AS (
      SELECT {slice_case} AS slice, event_type, {dow} AS dw, count(*) AS c
      FROM events
      GROUP BY {slice_case}, event_type, {dow}
    ),
    per_cell AS (
      SELECT slice, event_type,
        CAST(sum(c) AS DOUBLE) AS n,
        CAST(sum(c * c) AS DOUBLE) AS cc
      FROM cells GROUP BY slice, event_type
    ),
    stat AS (
      SELECT slice, event_type, n,
        CASE WHEN n > 0 THEN 7.0e0 * cc / n - n ELSE 0.0e0 END AS chi2
      FROM per_cell
    ),
    pvals AS (
      SELECT slice, event_type, n, chi2,
        round({chi2_sf_sql("chi2", 6)} + {NUDGE}, 6) AS p6
      FROM stat
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (ORDER BY p6, slice, event_type) AS rk,
        CAST(count(*) OVER () AS DOUBLE) AS m
      FROM pvals
    ),
    crit AS (
      SELECT *, round(rk * 0.05 / m + {NUDGE}, 6) AS bh_crit6
      FROM ranked
    ),
    stepped AS (
      SELECT *,
        max(CASE WHEN p6 <= bh_crit6 THEN rk ELSE 0 END) OVER () AS k_max
      FROM crit
    )
    SELECT
      slice,
      event_type,
      {cnt("n", "n_events")},
      {dbl("chi2", "chi2")},
      {cnt("6", "dof")},
      CAST(p6 + 0.0 AS DOUBLE) AS p_exact,
      {cnt("rk", "p_rank")},
      CAST(bh_crit6 + 0.0 AS DOUBLE) AS bh_critical,
      CAST(rk <= k_max AS BOOLEAN) AS discovery
    FROM stepped
    ORDER BY slice, event_type
    """


QUERIES.extend([
    sql_backed("hour_uniformity_decisions",
               _hour_uniformity_decisions_sql, ("events",)),
    sql_backed("weekday_uniformity_decisions",
               _weekday_uniformity_decisions_sql, ("events",)),
])
