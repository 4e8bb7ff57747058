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
