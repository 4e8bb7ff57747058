"""Spark 4.1 engine-native SQL surface, certified against classical
recomputations (SURVEY §2 C177-C179, né C171-C173): ordered LISTAGG, the
``variant_explode`` table-valued function over VARIANT payloads, and
``from_xml`` schema-on-read ingestion.

Same doctrine as C180-C183 (né C167-C170) (collation / pipe syntax / native
sketches): every NEW engine mechanism earns an oracle row where DuckDB
reaches the identical result through the classical mechanism —
``string_agg`` with ORDER BY, plain JSON path extraction, and a
closed-form recomputation from the columns the XML was synthesized
from.  A mechanism nobody certified is a mechanism nobody should trust
in a 100 TB pipeline.

Scale notes: LISTAGG concatenates per-group strings — bounded here by
the leading-k row_number cut (k=3), the per-user path census pattern
(paths explode without a cut; the cut IS the operator's scale story).
variant_explode fans out |keys| rows per document (2 here) — linear,
map-side.  from_xml is a per-row parse in the JVM (no Python), one
scan.
"""

from __future__ import annotations

from fiveg_spark.plans.registry import (
    NUDGE,
    Query,
    cnt,
    dbl,
    epoch,
    sql_backed,
)


def _listagg_paths_sql(d: str) -> str:
    # C171 — per-user leading event paths via ordered string
    # aggregation: Spark's LISTAGG ... WITHIN GROUP (ORDER BY ...) vs
    # DuckDB's string_agg(x, sep ORDER BY ...) — the engines' two
    # spellings of SQL:2016 listagg must build identical path strings
    # under the identical (ts, event_id) total order, or the path
    # census diverges.  Leading-3 cut bounds the string length (the
    # session_paths discipline) and keeps |distinct prefixes| ≤ |types|³
    # = 125, so shared paths exist at every SF (a 0-row census would
    # certify nothing).
    es = epoch("ts", d)
    if d == "spark":
        agg = ("listagg(event_type, '>') WITHIN GROUP"
               " (ORDER BY es, event_id)")
    else:
        agg = "string_agg(event_type, '>' ORDER BY es, event_id)"
    return f"""
    WITH ordered AS (
      SELECT user_id, event_type, {es} AS es, event_id,
        row_number() OVER (
          PARTITION BY user_id ORDER BY {es}, event_id
        ) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, {agg} AS path
      FROM ordered WHERE rn <= 3
      GROUP BY user_id
    )
    SELECT
      path,
      {cnt("count(*)", "n_users")}
    FROM paths
    GROUP BY path
    HAVING count(*) >= 2
    ORDER BY n_users DESC, path
    """


def _variant_explode_sql(d: str) -> str:
    # C178 (né C172) — the variant_explode TVF: a two-key VARIANT object is
    # synthesized from integer columns ('u' = user_id, 'e' = event_id),
    # exploded into (pos, key, value) rows by the engine's variant
    # traversal, and re-aggregated per key.  The oracle recomputes the
    # same numbers straight from the columns — the explode path (key
    # enumeration order, variant→BIGINT cast) is what's under test;
    # DuckDB never parses a byte of JSON.
    if d == "spark":
        return """
        WITH v AS (
          SELECT parse_json(
            '{"u": ' || CAST(user_id AS STRING) ||
            ', "e": ' || CAST(event_id AS STRING) || '}'
          ) AS payload
          FROM events
        ),
        kv AS (
          SELECT e.key AS k, CAST(e.value AS BIGINT) AS val
          FROM v, LATERAL variant_explode(payload) e
        )
        SELECT
          k,
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(val) AS BIGINT) AS sum_val,
          CAST(min(val) AS BIGINT) AS min_val,
          CAST(max(val) AS BIGINT) AS max_val
        FROM kv
        GROUP BY k
        ORDER BY k
        """
    return """
    WITH kv AS (
      SELECT 'e' AS k, event_id AS val FROM events
      UNION ALL
      SELECT 'u' AS k, user_id AS val FROM events
    )
    SELECT
      k,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(val) AS BIGINT) AS sum_val,
      CAST(min(val) AS BIGINT) AS min_val,
      CAST(max(val) AS BIGINT) AS max_val
    FROM kv
    GROUP BY k
    ORDER BY k
    """


def _xml_ingest_sql(d: str) -> str:
    # C179 (né C173) — from_xml schema-on-read: XML documents synthesized from
    # the event columns round-trip through Spark's XML parser (element
    # extraction, typed fields, a MISSING element reading as NULL for
    # odd event_ids) and re-aggregate to the closed form the oracle
    # computes from the raw columns.  Covers the one mainstream ingest
    # format the A10 matrix lacks an engine parser for elsewhere.
    if d == "spark":
        return f"""
        WITH xml AS (
          SELECT from_xml(
            '<rec><u>' || CAST(user_id AS STRING) || '</u>' ||
            CASE WHEN event_id % 2 = 0
                 THEN '<t>' || event_type || '</t>' ELSE '' END ||
            '<v>' || CAST(round(value + {NUDGE}, 2) AS STRING) ||
            '</v></rec>',
            'u BIGINT, t STRING, v DOUBLE'
          ) AS r
          FROM events
        )
        SELECT
          coalesce(r.t, '(missing)') AS event_type,
          {cnt("count(*)", "n_events")},
          {cnt("count(DISTINCT r.u)", "n_users")},
          {dbl("sum(r.v)", "sum_value")}
        FROM xml
        GROUP BY r.t
        ORDER BY event_type
        """
    return f"""
    SELECT
      CASE WHEN event_id % 2 = 0 THEN event_type
           ELSE '(missing)' END AS event_type,
      {cnt("count(*)", "n_events")},
      {cnt("count(DISTINCT user_id)", "n_users")},
      {dbl("sum(round(value + {0}, 2))".format(NUDGE), "sum_value")}
    FROM events
    GROUP BY CASE WHEN event_id % 2 = 0 THEN event_type
                  ELSE '(missing)' END
    ORDER BY event_type
    """


QUERIES = [
    sql_backed("listagg_user_paths", _listagg_paths_sql, ("events",)),
    sql_backed("variant_explode_kv", _variant_explode_sql, ("events",)),
    sql_backed("xml_ingest_mix", _xml_ingest_sql, ("events",)),
]


def _sql_udf_pvalue_run(spark, sf_dir):
    """C176 (né C174): SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN
    expr`) certified through the p-value layer — Φ is DECLARED ONCE as
    a named SQL UDF (the erf-free A&S 26.2.17 text from
    functions/stats.py) and every per-type mean-shift p-value resolves
    through the function-catalog path; the oracle inlines the identical
    formula, so a divergence isolates the UDF resolution/inlining
    mechanism itself.  The UDF body is pure expression SQL — Catalyst
    inlines it, so the plan stays WholeStageCodegen with no UDF-call
    overhead at scale."""
    from fiveg_spark.functions.stats import normal_cdf_sql
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("events",), sf_dir)
    spark.sql(f"""
        CREATE OR REPLACE TEMPORARY FUNCTION fiveg_phi(x DOUBLE)
        RETURNS DOUBLE RETURN {normal_cdf_sql('x')}
    """)
    return spark.sql(_sql_udf_pvalue_body("fiveg_phi(", ")"))


def _sql_udf_pvalue_body(phi_open: str, phi_close: str) -> str:
    # shared statistical body; Φ enters via the UDF (Spark) or fully
    # inlined (oracle) — everything else is character-identical
    z = "((s / n - mean_g) / sqrt(var_g / n + 1e-12))"
    p = (f"least(1.0e0, greatest(0.0e0, 2.0e0 * (1.0e0 - "
         f"{phi_open}abs({z}){phi_close})))")
    return f"""
    WITH cells AS (
      SELECT event_type,
        CAST(count(*) AS DOUBLE) AS n,
        sum(value) AS s,
        sum(value * value) AS ss
      FROM events GROUP BY event_type
    ),
    enriched AS (
      SELECT *,
        sum(s) OVER () / sum(n) OVER () AS mean_g,
        sum(ss) OVER () / sum(n) OVER ()
          - power(sum(s) OVER () / sum(n) OVER (), 2) AS var_g
      FROM cells
    )
    SELECT
      event_type,
      {cnt("n", "n_events")},
      {dbl("s / n", "mean_value")},
      {dbl(z, "z_shift")},
      CAST(round({p} + {NUDGE}, 6) + 0.0 AS DOUBLE) AS p_two_sided
    FROM enriched
    ORDER BY event_type
    """


def _sql_udf_pvalue_oracle() -> str:
    from fiveg_spark.functions.stats import normal_cdf_sql

    # inline Φ the classical way: normal_cdf_sql references its
    # argument many times, so compute |z| once as a CTE column and
    # inline Φ(az) on the alias — semantically exactly what the UDF
    # receives on the Spark side
    z = "((s / n - mean_g) / sqrt(var_g / n + 1e-12))"
    phi_az = normal_cdf_sql("az")
    return f"""
    WITH cells AS (
      SELECT event_type,
        CAST(count(*) AS DOUBLE) AS n,
        sum(value) AS s,
        sum(value * value) AS ss
      FROM events GROUP BY event_type
    ),
    enriched AS (
      SELECT *,
        sum(s) OVER () / sum(n) OVER () AS mean_g,
        sum(ss) OVER () / sum(n) OVER ()
          - power(sum(s) OVER () / sum(n) OVER (), 2) AS var_g
      FROM cells
    ),
    zed AS (
      SELECT event_type, n, s, {z} AS z, abs({z}) AS az
      FROM enriched
    )
    SELECT
      event_type,
      {cnt("n", "n_events")},
      {dbl("s / n", "mean_value")},
      {dbl("z", "z_shift")},
      CAST(round(
        least(1.0e0, greatest(0.0e0, 2.0e0 * (1.0e0 - {phi_az})))
        + {NUDGE}, 6) + 0.0 AS DOUBLE) AS p_two_sided
    FROM zed
    ORDER BY event_type
    """


QUERIES.append(
    Query("sql_udf_pvalue_mix", _sql_udf_pvalue_run,
          _sql_udf_pvalue_oracle())
)


def _regr_family_spark_sql() -> str:
    # C185 — the SQL:2003 linear-regression aggregate family as Spark
    # natives: regr_slope/intercept/r2/count/avgx/avgy of value vs
    # hour-of-day per event type, every column resolved through the
    # engine's own one-pass co-moment aggregates.
    return f"""
    WITH xy AS (
      SELECT event_type,
        CAST(extract(HOUR FROM ts) AS DOUBLE) AS x,
        value AS y
      FROM events
    )
    SELECT
      event_type,
      {cnt("regr_count(y, x)", "n")},
      {dbl("regr_avgx(y, x)", "avg_x")},
      {dbl("regr_avgy(y, x)", "avg_y")},
      {dbl("regr_slope(y, x)", "slope")},
      {dbl("regr_intercept(y, x)", "intercept")},
      {dbl("regr_r2(y, x)", "r2")}
    FROM xy
    GROUP BY event_type
    ORDER BY event_type
    """


def _regr_family_oracle() -> str:
    # the classical recomputation: decomposable sums only (no co-moment
    # builtin on the oracle side — that is the point: two mechanisms,
    # one certified answer).  r2 for simple linear regression is the
    # squared Pearson correlation; degenerate variance guards mirror
    # the natives' NULL -> 0.0 coalescing inside dbl().
    sxx = "(n * sxx - sx * sx)"
    syy = "(n * syy - sy * sy)"
    sxy = "(n * sxy - sx * sy)"
    return f"""
    WITH xy AS (
      SELECT event_type,
        CAST(extract(HOUR FROM ts) AS DOUBLE) AS x,
        value AS y
      FROM events
    ),
    sums AS (
      SELECT event_type,
        CAST(count(*) AS DOUBLE) AS n,
        sum(x) AS sx, sum(y) AS sy,
        sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM xy GROUP BY event_type
    )
    SELECT
      event_type,
      CAST(n AS BIGINT) AS n,
      {dbl("sx / n", "avg_x")},
      {dbl("sy / n", "avg_y")},
      {dbl(f"CASE WHEN {sxx} = 0 THEN NULL ELSE {sxy} / {sxx} END",
           "slope")},
      {dbl(f"CASE WHEN {sxx} = 0 THEN NULL ELSE"
           f" (sy - sx * {sxy} / {sxx}) / n END", "intercept")},
      {dbl(f"CASE WHEN {sxx} = 0 OR {syy} = 0 THEN NULL ELSE"
           f" ({sxy} * {sxy}) / ({sxx} * {syy}) END", "r2")}
    FROM sums
    ORDER BY event_type
    """


def _regr_family_run(spark, sf_dir):
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("events",), sf_dir)
    return spark.sql(_regr_family_spark_sql())


QUERIES.append(
    Query("native_regr_family", _regr_family_run, _regr_family_oracle())
)


def _median_try_spark_sql() -> str:
    # C186 — Spark's native `median` aggregate plus the try_* error-
    # suppressing arithmetic family (`try_divide`, `try_add`) certified
    # semantically: under the session's default ANSI mode a plain
    # divide-by-zero THROWS, so try_divide's NULL-on-zero is a real
    # semantic branch (not sugar), and try_add must pass finite sums
    # through untouched.  The per-type zero-denominator census counts
    # value-bucket collisions where (value - avg-bucket) nets zero.
    return f"""
    WITH base AS (
      SELECT event_type, value,
        CAST(user_id % 5 AS DOUBLE) - 2.0 AS denom
      FROM events
    )
    SELECT
      event_type,
      {cnt("count(*)", "n")},
      {dbl("median(value)", "med_value")},
      {cnt("count(try_divide(value, denom))", "n_divisible")},
      {cnt("sum(CASE WHEN try_divide(value, denom) IS NULL"
           " THEN 1 ELSE 0 END)", "n_div_by_zero")},
      {dbl("sum(try_add(value, 1.0)) / count(*)", "avg_plus_one")}
    FROM base
    GROUP BY event_type
    ORDER BY event_type
    """


def _median_try_oracle() -> str:
    # classical recomputation: continuous median via percentile_cont,
    # the try_* branches as explicit CASE guards
    return f"""
    WITH base AS (
      SELECT event_type, value,
        CAST(user_id % 5 AS DOUBLE) - 2.0 AS denom
      FROM events
    )
    SELECT
      event_type,
      CAST(count(*) AS BIGINT) AS n,
      {dbl("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)",
           "med_value")},
      CAST(sum(CASE WHEN denom <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_divisible,
      CAST(sum(CASE WHEN denom = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_div_by_zero,
      {dbl("sum(value + 1.0) / count(*)", "avg_plus_one")}
    FROM base
    GROUP BY event_type
    ORDER BY event_type
    """


def _median_try_run(spark, sf_dir):
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("events",), sf_dir)
    return spark.sql(_median_try_spark_sql())


QUERIES.append(
    Query("native_median_try_ops", _median_try_run, _median_try_oracle())
)


SESSION_GAP_S = 1800  # native session_window gap (30 min)


def _session_window_spark_sql() -> str:
    # C187 — Spark's NATIVE session_window aggregate (dynamic-gap
    # session assignment inside the hash aggregate itself — the engine
    # twin of C6's classical lag→flag→cumsum sessionization, which
    # needs two window passes): per-user sessions at a 30-minute gap,
    # rolled up per user band.  The per-user GROUP BY keeps the
    # session merge key-local (the same partitioning C6 shuffles on);
    # the band rollup is the bounded second agg.
    return f"""
    SELECT CAST(user_id % 10 AS BIGINT) AS band,
      {cnt("count(*)", "n_sessions")},
      {cnt("sum(n)", "n_events")},
      {cnt("max(n)", "max_session_events")},
      {dbl("sum(span_s)", "sum_span_s")}
    FROM (
      SELECT user_id, session_window(ts, '{SESSION_GAP_S} seconds') AS w,
             count(*) AS n,
             CAST(max(unix_micros(ts)) - min(unix_micros(ts)) AS DOUBLE)
               / 1e6 AS span_s
      FROM events
      GROUP BY user_id, session_window(ts, '{SESSION_GAP_S} seconds')
    ) s
    GROUP BY user_id % 10
    ORDER BY band
    """


def _session_window_oracle() -> str:
    # the classical mechanism: lag → new-session flag → running sum →
    # session agg.  Spark's session windows are END-EXCLUSIVE (a gap of
    # EXACTLY the threshold starts a new session), so the flag is >=,
    # not C6's strictly-greater convention.
    return f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    flagged AS (
      SELECT user_id, us,
        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
               IS NULL
              OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                 >= {SESSION_GAP_S}000000
             THEN 1 ELSE 0 END AS is_new
      FROM e
    ),
    numbered AS (
      SELECT user_id, us,
        sum(is_new) OVER (PARTITION BY user_id ORDER BY us
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    sess AS (
      SELECT user_id, sid, count(*) AS n,
        (max(us) - min(us)) / 1000000.0 AS span_s
      FROM numbered GROUP BY user_id, sid
    )
    SELECT CAST(user_id % 10 AS BIGINT) AS band,
      CAST(count(*) AS BIGINT) AS n_sessions,
      CAST(sum(n) AS BIGINT) AS n_events,
      CAST(max(n) AS BIGINT) AS max_session_events,
      {dbl("sum(span_s)", "sum_span_s")}
    FROM sess GROUP BY user_id % 10
    ORDER BY band
    """


def _session_window_run(spark, sf_dir):
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("events",), sf_dir)
    return spark.sql(_session_window_spark_sql())


QUERIES.append(
    Query("native_session_window", _session_window_run,
          _session_window_oracle())
)


def _native_hll_run(spark, sf_dir):
    """C188: the Apache-DataSketches HLL family as built-ins —
    per-type `hll_sketch_agg(user_id)` estimates merged corpus-wide
    with `hll_union_agg` (the engine twin of C32's PORTABLE HLL rollup
    and the sibling of C182's theta path).  approx_variants doctrine:
    exact anchors hash-compare, each estimate bounds itself in-row
    (HLL rse at lgK 12 is ~1.6%; 5%/±2 ≈ 3σ)."""
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("events",), sf_dir)
    return spark.sql("""
        WITH per_type AS (
          SELECT event_type,
                 count(DISTINCT user_id) AS n_exact,
                 hll_sketch_agg(user_id) AS sk
          FROM events GROUP BY event_type
        ),
        est AS (
          SELECT event_type, n_exact,
                 hll_sketch_estimate(sk) AS n_est
          FROM per_type
        ),
        glob AS (
          SELECT hll_sketch_estimate(hll_union_agg(sk)) AS g_est
          FROM per_type
        ),
        g_exact AS (
          SELECT count(DISTINCT user_id) AS g FROM events
        )
        SELECT
          e.event_type,
          CAST(e.n_exact AS BIGINT) AS n_users_exact,
          CAST(g.g AS BIGINT) AS n_users_global,
          abs(e.n_est - e.n_exact) <= greatest(2.0, 0.05 * e.n_exact)
            AS hll_within_bound,
          abs(gl.g_est - g.g) <= greatest(2.0, 0.05 * g.g)
            AS union_within_bound
        FROM est e CROSS JOIN glob gl CROSS JOIN g_exact g
        ORDER BY e.event_type
    """)


_NATIVE_HLL_ORACLE = """
    WITH g AS (SELECT count(DISTINCT user_id) AS g FROM events)
    SELECT
      event_type,
      CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
      CAST(max(g.g) AS BIGINT) AS n_users_global,
      TRUE AS hll_within_bound,
      TRUE AS union_within_bound
    FROM events CROSS JOIN g
    GROUP BY event_type
    ORDER BY event_type
"""


QUERIES.append(
    Query("native_hll_users", _native_hll_run, _NATIVE_HLL_ORACLE)
)


def _unpivot_spark_sql() -> str:
    # C189 — SQL UNPIVOT as an engine construct: a wide per-type
    # aggregate relationally rotated to long (metric, value) rows by
    # the engine's own unpivot operator; the oracle reaches the same
    # long frame the pre-UNPIVOT way (UNION ALL of one SELECT per
    # metric).  Wide→long is the last step of every metrics export —
    # certifying the operator beats hand-rolling stack() expressions.
    return f"""
    SELECT event_type, metric,
      {dbl("val", "value")}
    FROM (
      SELECT event_type,
        sum(value) AS total_value,
        avg(value) AS mean_value,
        min(value) AS min_value,
        max(value) AS max_value
      FROM events GROUP BY event_type
    ) wide
    UNPIVOT (val FOR metric IN (
      total_value, mean_value, min_value, max_value))
    ORDER BY event_type, metric
    """


def _unpivot_oracle() -> str:
    rows = []
    for m in ("total_value", "mean_value", "min_value", "max_value"):
        agg = {
            "total_value": "sum(value)", "mean_value": "avg(value)",
            "min_value": "min(value)", "max_value": "max(value)",
        }[m]
        rows.append(
            f"SELECT event_type, '{m}' AS metric, {dbl(agg, 'value')}"
            " FROM events GROUP BY event_type"
        )
    return "\n    UNION ALL\n    ".join(rows) + "\n    ORDER BY event_type, metric"


def _unpivot_run(spark, sf_dir):
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("events",), sf_dir)
    return spark.sql(_unpivot_spark_sql())


QUERIES.append(
    Query("unpivot_metrics_long", _unpivot_run, _unpivot_oracle())
)
