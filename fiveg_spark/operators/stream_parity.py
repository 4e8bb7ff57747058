"""Stream-store parity certifications (SURVEY §2 B29-family): the
foreachBatch sink stores (B15/B16/B18/B20/B23/B26, A8) certified
against the DuckDB oracle END-TO-END — replay deterministic event-time
batches through the REAL sink function, then answer a question from
the STORE ALONE and prove the answer equals a direct recomputation
over the raw tables.

Until now the sink family was pytest-verified (stream ≡ batch behavior
tests) but outside the driver's oracle gate, because a sink's output
lives in a store directory rather than a DataFrame expression.  These
queries close that gap: each one

  1. partitions a fact table into deterministic event-time batches
     (epoch weeks for events, crawl waves ``doc_id % 4`` for
     documents — at 100 TB these ARE the partition keys a replay
     harness would iterate, so the per-batch filter is partition
     pruning, not a rescan);
  2. feeds the batches IN ORDER to the sink's real ``foreach_batch_*``
     function (the exact code a checkpointed stream runs), including a
     REPLAYED batch so the store's high-water/idempotence guard is
     exercised on the certified path, and a ``compact`` where the sink
     has one, so merge-on-read over compacted state is certified too;
  3. reads the store back through the sink's reader and emits a small
     result frame whose every value the DuckDB oracle recomputes
     independently from the raw table.

The stores land in a per-run scratch directory and the result frame is
collected (bounded: |keys| × |batches| rows at most) before the
scratch is removed — the returned frame owns its rows, never the
deleted files.

Scale: the replay loop is the certification HARNESS, not the
production path (that is the checkpointed stream each sink's
``attach_*`` wires); per batch, every sink here does one bounded
aggregate + one append, which is the shape that survives 100 TB — see
each sink module's header for its own scale argument.

Reference scope: beyond-reference production surface (the reference's
streaming job hardcodes one pipeline, KafkaKpiPipeline.scala:227-300;
this certifies the reusable sink family around the same foreachBatch
mechanism).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.operators.sketches import BLOOM_K, BLOOM_M, bloom_bucket_expr
from fiveg_spark.plans.registry import Query, ensure_views

WEEK_S = 604800  # epoch weeks: 86400 * 7, so a day never spans batches


def _scratch() -> str:
    return tempfile.mkdtemp(prefix="fiveg_stream_parity_")


def _week_batches(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, DataFrame]]:
    """(batch_id, frame) per epoch week of ``events``, in week order.
    The per-batch filter is the harness's partition pruning: at scale
    the week IS the partition key, so batch i reads week i's files."""
    ensure_views(spark, ("events",), sf_dir)
    ev = spark.sql(
        "SELECT *, CAST(floor(CAST(unix_micros(ts) AS DOUBLE) / 1000000.0"
        f" / {WEEK_S}.0) AS BIGINT) AS wk FROM events"
    )
    weeks = sorted(
        r["wk"] for r in ev.select("wk").distinct().collect()
    )
    return [
        (i, ev.filter(F.col("wk") == w).drop("wk"))
        for i, w in enumerate(weeks)
    ]


def _collected(spark: SparkSession, df: DataFrame, schema: str) -> DataFrame:
    """Materialize a bounded result frame so the scratch store can be
    deleted before returning (the ml/certify tiny-frame doctrine)."""
    from fiveg_spark.plans.plan_ledger import note_precollect

    note_precollect(df)  # ledger capture of the distributed pre-collect plan
    rows = [tuple(r) for r in df.collect()]
    return spark.createDataFrame(rows, schema)


def _store_or_empty(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """A monitor store that never received a scorable batch (e.g. a
    single-week corpus leaves CUSUM/PSI with no week >= 1) reads as an
    EMPTY frame, matching the oracle's zero rows — not a read error."""
    from fiveg_spark.streaming.store_guard import has_parquet

    if not has_parquet(path):
        return spark.createDataFrame([], schema)
    return spark.read.parquet(path)


# --------------------------------------------------------------------------
# B23 — streaming Bloom store vs the exact bit set
# --------------------------------------------------------------------------

_ABSENT_PROBES = tuple(range(-1, -21, -1))  # ids guaranteed off-corpus


def _bloom_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay weeks through foreach_batch_bloom (replaying week 0 once
    more to hit the watermark guard), compact, then certify: the
    store's per-type bit count, the false-positive count over 20
    guaranteed-absent probes, the Swamidass-Baldi estimate, and the
    exact distinct-user count the estimate targets — every column
    recomputable by the oracle because the bit positions come from the
    dialect-portable C71 bucket builder."""
    from fiveg_spark.streaming import bloom_sink

    store = _scratch()
    try:
        batches = _week_batches(spark, sf_dir)
        sink = bloom_sink.foreach_batch_bloom(store)
        for i, frame in batches:
            sink(frame, i)
        sink(batches[0][1], 0)  # crash/retry replay: high-water no-op
        bloom_sink.compact(spark, store)

        bits = bloom_sink.read_bits(spark, store)
        filled = bits.groupBy("event_type").agg(
            F.count("*").alias("n_bits_set")
        )
        types = [r["event_type"] for r in filled.select("event_type").collect()]
        probes = [(t, int(p)) for t in types for p in _ABSENT_PROBES]
        fp = (
            bloom_sink.check_membership(spark, store, probes)
            .groupBy("event_type")
            .agg(
                F.sum(F.col("maybe_present").cast("long")).alias(
                    "n_absent_fp"
                )
            )
        )
        est = bloom_sink.estimate_cardinality(spark, store).select(
            "event_type",
            F.round(F.col("est_distinct") + 1e-9, 4).alias("est_distinct"),
        )
        exact = spark.sql(
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)"
            " AS n_exact_distinct FROM events GROUP BY event_type"
        )
        out = (
            filled.join(fp, "event_type")
            .join(est, "event_type")
            .join(exact, "event_type")
            .select(
                "event_type",
                F.col("n_bits_set").cast("long"),
                F.col("n_absent_fp").cast("long"),
                "est_distinct",
                "n_exact_distinct",
            )
            .orderBy("event_type")
        )
        return _collected(
            spark,
            out,
            "event_type STRING, n_bits_set LONG, n_absent_fp LONG,"
            " est_distinct DOUBLE, n_exact_distinct LONG",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _bloom_store_oracle() -> str:
    js = ", ".join(str(j) for j in range(BLOOM_K))
    probes = ", ".join(f"({p})" for p in _ABSENT_PROBES)
    bucket_user = bloom_bucket_expr("e.user_id", "j.j")
    bucket_probe = bloom_bucket_expr("p.probe_id", "j.j")
    return f"""
    WITH js AS (SELECT unnest([{js}]) AS j),
    bits AS (
      SELECT DISTINCT e.event_type, {bucket_user} AS bit
      FROM (SELECT DISTINCT event_type, user_id FROM events) e
      CROSS JOIN js j
    ),
    filled AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_bits_set
      FROM bits GROUP BY event_type
    ),
    probe_bits AS (
      SELECT t.event_type, p.probe_id, {bucket_probe} AS bit
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest([{probes}]) AS probe_id) p
      CROSS JOIN js j
    ),
    fp AS (
      SELECT pb.event_type, pb.probe_id,
             CAST(count(b.bit) AS BIGINT) AS n_hit
      FROM probe_bits pb
      LEFT JOIN bits b
        ON b.event_type = pb.event_type AND b.bit = pb.bit
      GROUP BY pb.event_type, pb.probe_id
    ),
    fp_agg AS (
      SELECT event_type,
             CAST(sum(CASE WHEN n_hit = {BLOOM_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_absent_fp
      FROM fp GROUP BY event_type
    ),
    exact AS (
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT
      f.event_type,
      f.n_bits_set,
      fa.n_absent_fp,
      round(-({BLOOM_M}.0 / {BLOOM_K}.0)
            * ln(1.0 - CAST(f.n_bits_set AS DOUBLE) / {BLOOM_M}.0)
            + 1e-9, 4) AS est_distinct,
      x.n_exact_distinct
    FROM filled f
    JOIN fp_agg fa ON fa.event_type = f.event_type
    JOIN exact x ON x.event_type = f.event_type
    ORDER BY f.event_type
    """


# --------------------------------------------------------------------------
# B15 — streaming ingestion-dedup store vs the rank-1 acceptance rule
# --------------------------------------------------------------------------

N_WAVES = 4


def _dedup_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay CUMULATIVE crawl waves (wave b re-delivers every doc with
    doc_id % 4 <= b — a re-crawl always contains the old corpus) through
    foreach_batch_dedup, then re-deliver the final wave once more (the
    store-as-state self-healing no-op).  Accepted docs per wave must
    equal the oracle's closed form: a doc is accepted iff it is the
    min-doc_id representative of its content hash within the FIRST wave
    where the hash appears — which for cumulative waves is the hash's
    global min doc_id, accepted at wave (min_doc_id % 4)."""
    from fiveg_spark.streaming import dedup_sink

    store = _scratch()
    try:
        ensure_views(spark, ("documents",), sf_dir)
        docs = spark.sql("SELECT doc_id, text, source FROM documents")
        sink = dedup_sink.foreach_batch_dedup(store)
        for b in range(N_WAVES):
            sink(docs.filter(F.col("doc_id") % N_WAVES <= b), b)
        sink(docs, N_WAVES)  # full re-crawl: every hash present, 0 new

        accepted = spark.read.parquet(store)
        out = (
            docs.withColumn("wave", F.col("doc_id") % N_WAVES)
            .groupBy("wave")
            .agg(F.count("*").alias("n_wave_docs"))
            .join(
                accepted.withColumn("wave", F.col("doc_id") % N_WAVES)
                .groupBy("wave")
                .agg(
                    F.count("*").alias("n_accepted"),
                    F.countDistinct("h").alias("n_hashes"),
                ),
                "wave",
            )
            .select(
                F.col("wave").cast("long"),
                F.col("n_wave_docs").cast("long"),
                F.col("n_accepted").cast("long"),
                F.col("n_hashes").cast("long"),
            )
            .orderBy("wave")
        )
        return _collected(
            spark,
            out,
            "wave LONG, n_wave_docs LONG, n_accepted LONG, n_hashes LONG",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _dedup_store_oracle() -> str:
    return f"""
    WITH hashed AS (
      SELECT doc_id, doc_id % {N_WAVES} AS wave, md5(lower(text)) AS h
      FROM documents
    ),
    firsts AS (
      SELECT h, min(doc_id) AS keeper_id
      FROM hashed GROUP BY h
    ),
    accepted AS (
      SELECT f.keeper_id % {N_WAVES} AS wave, f.h
      FROM firsts f
    )
    SELECT
      CAST(w.wave AS BIGINT) AS wave,
      CAST(count(*) AS BIGINT) AS n_wave_docs,
      CAST(a.n_accepted AS BIGINT) AS n_accepted,
      CAST(a.n_hashes AS BIGINT) AS n_hashes
    FROM hashed w
    JOIN (
      SELECT wave, count(*) AS n_accepted, count(DISTINCT h) AS n_hashes
      FROM accepted GROUP BY wave
    ) a ON a.wave = w.wave
    GROUP BY w.wave, a.n_accepted, a.n_hashes
    ORDER BY w.wave
    """


# --------------------------------------------------------------------------
# B20 — streaming heavy-hitters store vs the SQL merge of exact partials
# --------------------------------------------------------------------------

HH_TOPK = 5


def _heavy_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay weeks through foreach_batch_heavy (m=16 per-type
    candidates per batch), replay week 0 (watermark no-op), compact,
    then read the merged top-5 per type with its uncertainty band.
    Every column is deterministic (exact per-batch counts, user_id tie
    break) so the oracle recomputes the whole merge-on-read in SQL —
    including ``upper_count``, whose slack term sums the per-batch
    truncation maxima."""
    from fiveg_spark.streaming import heavy_sink

    store = _scratch()
    try:
        batches = _week_batches(spark, sf_dir)
        sink = heavy_sink.foreach_batch_heavy(store)
        for i, frame in batches:
            sink(frame, i)
        sink(batches[0][1], 0)  # replay guard
        heavy_sink.compact(spark, store)

        out = heavy_sink.read_heavy_hitters(spark, store, k=HH_TOPK).select(
            "event_type",
            "rnk",
            "user_id",
            "est_count",
            "upper_count",
            "n_total",
            F.round(F.col("est_share") + 1e-9, 4).alias("est_share"),
        )
        return _collected(
            spark,
            out,
            "event_type STRING, rnk LONG, user_id LONG, est_count LONG,"
            " upper_count LONG, n_total LONG, est_share DOUBLE",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _heavy_store_oracle() -> str:
    from fiveg_spark.streaming.heavy_sink import HH_M

    return f"""
    WITH batched AS (
      SELECT event_type, user_id,
             CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
                        / {WEEK_S}.0) AS BIGINT) AS wk
      FROM events
    ),
    counts AS (
      SELECT wk, event_type, user_id, count(*) AS cnt
      FROM batched GROUP BY wk, event_type, user_id
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY wk, event_type
               ORDER BY cnt DESC, user_id ASC
             ) AS rk
      FROM counts
    ),
    cand AS (
      SELECT event_type, user_id, sum(cnt) AS est_count
      FROM ranked WHERE rk <= {HH_M}
      GROUP BY event_type, user_id
    ),
    meta AS (
      SELECT event_type,
             sum(cnt) AS n_total,
             sum(batch_dropped) AS slack
      FROM (
        SELECT wk, event_type, sum(cnt) AS cnt,
               coalesce(max(CASE WHEN rk > {HH_M} THEN cnt END), 0)
                 AS batch_dropped
        FROM ranked GROUP BY wk, event_type
      ) GROUP BY event_type
    ),
    merged AS (
      SELECT c.event_type, c.user_id, c.est_count, m.n_total, m.slack,
             row_number() OVER (
               PARTITION BY c.event_type
               ORDER BY c.est_count DESC, c.user_id ASC
             ) AS rnk
      FROM cand c JOIN meta m ON m.event_type = c.event_type
    )
    SELECT
      event_type,
      CAST(rnk AS BIGINT) AS rnk,
      CAST(user_id AS BIGINT) AS user_id,
      CAST(est_count AS BIGINT) AS est_count,
      CAST(est_count + slack AS BIGINT) AS upper_count,
      CAST(n_total AS BIGINT) AS n_total,
      round(CAST(est_count AS DOUBLE) / CAST(n_total AS DOUBLE)
            + 1e-9, 4) AS est_share
    FROM merged
    WHERE rnk <= {HH_TOPK}
    ORDER BY event_type, rnk
    """


QUERIES = [
    Query("stream_bloom_store_parity", _bloom_store_run,
          _bloom_store_oracle()),
    Query("stream_dedup_store_parity", _dedup_store_run,
          _dedup_store_oracle()),
    Query("stream_heavy_store_parity", _heavy_store_run,
          _heavy_store_oracle()),
]


# --------------------------------------------------------------------------
# B26 — streaming lateness-monitor store vs the closed-form frontier SQL
# --------------------------------------------------------------------------


def _lateness_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the B25 synthesized-disorder arrivals in ARRIVAL-week
    batches through foreach_batch_lateness, compacting mid-stream and
    restarting the scorer (a fresh closure must reload the compacted
    frontier/high-water), with one replayed batch (no-op).  The pooled
    summary must match the oracle's closed form: per batch the frontier
    is the max event time of all PRIOR arrival weeks, and the pooled
    late share per ladder rung is the n-weighted mean of per-batch
    shares (first batch forced 0.0 — no frontier exists yet)."""
    from fiveg_spark.operators.lateness import delay_expr
    from fiveg_spark.streaming import lateness_monitor

    store = _scratch()
    try:
        ensure_views(spark, ("events",), sf_dir)
        es = "(CAST(unix_micros(ts) AS DOUBLE) / 1000000.0)"
        arr = spark.sql(
            f"SELECT ts, CAST(floor(({es} + ({delay_expr()})) / {WEEK_S}.0)"
            " AS BIGINT) AS arr_wk FROM events"
        )
        weeks = sorted(r["arr_wk"] for r in arr.select("arr_wk").distinct().collect())
        batches = [
            (i, arr.filter(F.col("arr_wk") == w).select("ts"))
            for i, w in enumerate(weeks)
        ]
        score = lateness_monitor.foreach_batch_lateness(store)
        for i, frame in batches[:3]:
            score(frame, i)
        lateness_monitor.compact(spark, store)
        restarted = lateness_monitor.foreach_batch_lateness(store)
        if len(batches) > 2:
            restarted(batches[2][1], 2)  # replay below high-water: no-op
        for i, frame in batches[3:]:
            restarted(frame, i)

        out = lateness_monitor.lateness_summary(spark, store).select(
            F.col("watermark_s").cast("long"),
            F.round(F.col("pooled_late_share") + 1e-9, 4).alias(
                "pooled_late_share"
            ),
            F.col("n_rows").cast("long"),
            F.round(F.col("frontier_es") + 1e-9, 4).alias("frontier_es"),
            F.col("high_water_batch").cast("long"),
        )
        return _collected(
            spark,
            out,
            "watermark_s LONG, pooled_late_share DOUBLE, n_rows LONG,"
            " frontier_es DOUBLE, high_water_batch LONG",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _lateness_store_oracle() -> str:
    from fiveg_spark.operators.lateness import WATERMARK_LADDER, delay_expr

    es = "(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0)"
    rungs = "\n      UNION ALL\n".join(
        f"      SELECT {w} AS watermark_s" for w in WATERMARK_LADDER
    )
    return f"""
    WITH arr AS (
      SELECT {es} AS es,
             CAST(floor(({es} + ({delay_expr()})) / {WEEK_S}.0) AS BIGINT)
               AS arr_wk
      FROM events
    ),
    wk_ord AS (
      SELECT arr_wk,
             max(es) AS mx,
             row_number() OVER (ORDER BY arr_wk) - 1 AS b
      FROM arr GROUP BY arr_wk
    ),
    fronted AS (
      SELECT arr_wk, b,
             max(mx) OVER (
               ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS frontier
      FROM wk_ord
    ),
    per_batch AS (
      SELECT f.b,
             count(*) AS n,
             {", ".join(
                 f"avg(CAST(CASE WHEN f.frontier IS NOT NULL"
                 f" AND a.es < f.frontier - {w}.0 THEN 1 ELSE 0 END"
                 f" AS DOUBLE)) AS share_{w}"
                 for w in WATERMARK_LADDER
             )}
      FROM arr a JOIN fronted f ON f.arr_wk = a.arr_wk
      GROUP BY f.b
    ),
    pooled AS (
      SELECT
        {", ".join(
            f"sum(share_{w} * n) / sum(CAST(n AS DOUBLE)) AS pooled_{w}"
            for w in WATERMARK_LADDER
        )},
        CAST(sum(n) AS BIGINT) AS n_rows,
        CAST(max(b) AS BIGINT) AS high_water_batch
      FROM per_batch
    ),
    frontier_all AS (SELECT max(es) AS f FROM arr)
    SELECT
      CAST(r.watermark_s AS BIGINT) AS watermark_s,
      round(CASE {" ".join(
          f"WHEN r.watermark_s = {w} THEN p.pooled_{w}"
          for w in WATERMARK_LADDER
      )} END + 1e-9, 4) AS pooled_late_share,
      p.n_rows,
      round(fa.f + 1e-9, 4) AS frontier_es,
      p.high_water_batch
    FROM (
{rungs}
    ) r CROSS JOIN pooled p CROSS JOIN frontier_all fa
    ORDER BY r.watermark_s
    """


# --------------------------------------------------------------------------
# B18 — streaming CUSUM state/metrics store vs a WITH RECURSIVE oracle
# --------------------------------------------------------------------------


def _cusum_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week 0 fits the frozen per-type (mu, sigma) reference; weeks 1-4
    stream through foreach_batch_cusum (one replayed batch no-op,
    state compacted at the end).  The metrics store — z, both
    accumulators, the alarm — must match a WITH RECURSIVE oracle
    replaying Page's recursion over the per-week means, INCLUDING the
    post-alarm reset (the recursion carries post-reset state forward
    but emits the pre-reset values, exactly like the sink)."""
    from fiveg_spark.streaming import cusum_monitor

    store = _scratch()
    try:
        batches = _week_batches(spark, sf_dir)
        ref = cusum_monitor.fit_reference_stats(
            batches[0][1], "event_type", "value"
        )
        step = cusum_monitor.foreach_batch_cusum(
            store, ref, "event_type", "value"
        )
        for i, frame in batches[1:]:
            step(frame, i)
        if len(batches) > 2:
            step(batches[2][1], 2)  # replay below high-water: no-op
        from fiveg_spark.streaming.store_guard import has_parquet
        if has_parquet(f"{store}/state"):
            cusum_monitor.compact_state(spark, store)

        metrics = _store_or_empty(
            spark,
            f"{store}/metrics",
            "batch_id LONG, key STRING, n_rows LONG, z DOUBLE,"
            " s_pos DOUBLE, s_neg DOUBLE, alarm BOOLEAN",
        )
        out = (
            metrics
            .select(
                F.col("batch_id").cast("long"),
                F.col("key").alias("event_type"),
                F.col("n_rows").cast("long"),
                F.round(F.col("z") + 1e-9, 4).alias("z"),
                F.round(F.col("s_pos") + 1e-9, 4).alias("s_pos"),
                F.round(F.col("s_neg") + 1e-9, 4).alias("s_neg"),
                "alarm",
            )
            .orderBy("batch_id", "event_type")
        )
        return _collected(
            spark,
            out,
            "batch_id LONG, event_type STRING, n_rows LONG, z DOUBLE,"
            " s_pos DOUBLE, s_neg DOUBLE, alarm BOOLEAN",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _cusum_store_oracle() -> str:
    from fiveg_spark.streaming.cusum_monitor import H_DECISION, K_SLACK

    return f"""
    WITH RECURSIVE batched AS (
      SELECT event_type, value,
             CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
                        / {WEEK_S}.0) AS BIGINT) AS wk
      FROM events
    ),
    wk_ord AS (
      SELECT wk, row_number() OVER (ORDER BY wk) - 1 AS b
      FROM (SELECT DISTINCT wk FROM batched)
    ),
    ref AS (
      SELECT b.event_type,
             avg(b.value) AS mu,
             greatest(coalesce(stddev_samp(b.value), 0.0), 1e-9) AS sd
      FROM batched b JOIN wk_ord w ON w.wk = b.wk
      WHERE w.b = 0
      GROUP BY b.event_type
    ),
    zt AS (
      SELECT w.b, t.event_type, CAST(count(*) AS BIGINT) AS n,
             (avg(t.value) - r.mu) / r.sd * sqrt(count(*)) AS z
      FROM batched t
      JOIN wk_ord w ON w.wk = t.wk
      JOIN ref r ON r.event_type = t.event_type
      WHERE w.b >= 1
      GROUP BY w.b, t.event_type, r.mu, r.sd
    ),
    cusum AS (
      SELECT b, event_type, n, z,
             greatest(0.0, z - {K_SLACK}) AS s_pos,
             greatest(0.0, -z - {K_SLACK}) AS s_neg
      FROM zt WHERE b = 1
      UNION ALL
      SELECT z.b, z.event_type, z.n, z.z,
             greatest(0.0,
               (CASE WHEN c.s_pos > {H_DECISION} OR c.s_neg > {H_DECISION}
                     THEN 0.0 ELSE c.s_pos END) + z.z - {K_SLACK}),
             greatest(0.0,
               (CASE WHEN c.s_pos > {H_DECISION} OR c.s_neg > {H_DECISION}
                     THEN 0.0 ELSE c.s_neg END) - z.z - {K_SLACK})
      FROM zt z JOIN cusum c
        ON c.event_type = z.event_type AND z.b = c.b + 1
    )
    SELECT
      CAST(b AS BIGINT) AS batch_id,
      event_type,
      n AS n_rows,
      round(z + 1e-9, 4) AS z,
      round(s_pos + 1e-9, 4) AS s_pos,
      round(s_neg + 1e-9, 4) AS s_neg,
      (s_pos > {H_DECISION} OR s_neg > {H_DECISION}) AS alarm
    FROM cusum
    ORDER BY batch_id, event_type
    """


# --------------------------------------------------------------------------
# B16 — streaming PSI drift store vs the closed-form binned oracle
# --------------------------------------------------------------------------


def _psi_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week 0 fits the frozen per-type binned reference; weeks 1-4
    stream through foreach_batch_psi.  Every stored PSI decomposes into
    exact integer bin counts and the shared floor/log formula, so the
    oracle recomputes the full score — including the dense 10-bin
    iteration where empty bins contribute at the 1e-4 floor."""
    from fiveg_spark.streaming import drift_monitor

    store = _scratch()
    try:
        batches = _week_batches(spark, sf_dir)
        ref = drift_monitor.fit_reference(
            batches[0][1], "event_type", "value"
        )
        score = drift_monitor.foreach_batch_psi(
            ref, store, "event_type", "value"
        )
        for i, frame in batches[1:]:
            score(frame, i)

        out = _store_or_empty(
            spark,
            store,
            "batch_id LONG, key STRING, psi DOUBLE, n_rows LONG,"
            " drifted BOOLEAN",
        ).select(
            F.col("batch_id").cast("long"),
            F.col("key").alias("event_type"),
            F.round(F.col("psi") + 1e-9, 4).alias("psi"),
            F.col("n_rows").cast("long"),
            "drifted",
        ).orderBy("batch_id", "event_type")
        return _collected(
            spark,
            out,
            "batch_id LONG, event_type STRING, psi DOUBLE, n_rows LONG,"
            " drifted BOOLEAN",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _psi_store_oracle() -> str:
    from fiveg_spark.streaming.drift_monitor import FLOOR, N_BINS, PSI_ALERT

    return f"""
    WITH batched AS (
      SELECT event_type, value,
             CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0
                        / {WEEK_S}.0) AS BIGINT) AS wk
      FROM events
    ),
    wk_ord AS (
      SELECT wk, row_number() OVER (ORDER BY wk) - 1 AS b
      FROM (SELECT DISTINCT wk FROM batched)
    ),
    edges AS (
      SELECT t.event_type, min(t.value) AS lo, max(t.value) AS hi
      FROM batched t JOIN wk_ord w ON w.wk = t.wk
      WHERE w.b = 0
      GROUP BY t.event_type
    ),
    bins AS (SELECT unnest(range({N_BINS})) AS bin),
    spine AS (
      SELECT w.b, e.event_type, e.lo, e.hi, bins.bin
      FROM (SELECT b FROM wk_ord WHERE b >= 1) w
      CROSS JOIN edges e CROSS JOIN bins
    ),
    binned AS (
      SELECT w.b, t.event_type,
             CASE WHEN e.hi - e.lo <= 0 THEN 0
                  ELSE least({N_BINS - 1}, greatest(0,
                    CAST(floor((t.value - e.lo)
                               / ((e.hi - e.lo) / {N_BINS})) AS INT)))
             END AS bin,
             count(*) AS c
      FROM batched t
      JOIN wk_ord w ON w.wk = t.wk
      JOIN edges e ON e.event_type = t.event_type
      WHERE w.b >= 1
      GROUP BY 1, 2, 3
    ),
    ref_binned AS (
      SELECT t.event_type,
             CASE WHEN e.hi - e.lo <= 0 THEN 0
                  ELSE least({N_BINS - 1}, greatest(0,
                    CAST(floor((t.value - e.lo)
                               / ((e.hi - e.lo) / {N_BINS})) AS INT)))
             END AS bin,
             count(*) AS c
      FROM batched t
      JOIN wk_ord w ON w.wk = t.wk
      JOIN edges e ON e.event_type = t.event_type
      WHERE w.b = 0
      GROUP BY 1, 2
    ),
    ref_tot AS (
      SELECT event_type, greatest(CAST(sum(c) AS DOUBLE), 1.0) AS tot
      FROM ref_binned GROUP BY event_type
    ),
    bat_tot AS (
      SELECT b, event_type, greatest(CAST(sum(c) AS DOUBLE), 1.0) AS tot,
             CAST(sum(c) AS BIGINT) AS n_rows
      FROM binned GROUP BY b, event_type
    ),
    cells AS (
      SELECT s.b, s.event_type, s.bin,
             greatest(CAST(coalesce(r.c, 0) AS DOUBLE) / rt.tot, {FLOOR})
               AS p,
             greatest(CAST(coalesce(q.c, 0) AS DOUBLE) / bt.tot, {FLOOR})
               AS q
      FROM spine s
      JOIN ref_tot rt ON rt.event_type = s.event_type
      JOIN bat_tot bt ON bt.event_type = s.event_type AND bt.b = s.b
      LEFT JOIN ref_binned r
        ON r.event_type = s.event_type AND r.bin = s.bin
      LEFT JOIN binned q
        ON q.event_type = s.event_type AND q.b = s.b AND q.bin = s.bin
    ),
    scored AS (
      SELECT b, event_type, sum((p - q) * ln(p / q)) AS psi
      FROM cells GROUP BY b, event_type
    )
    SELECT
      CAST(s.b AS BIGINT) AS batch_id,
      s.event_type,
      round(s.psi + 1e-9, 4) AS psi,
      bt.n_rows,
      s.psi > {PSI_ALERT} AS drifted
    FROM scored s
    JOIN bat_tot bt ON bt.event_type = s.event_type AND bt.b = s.b
    ORDER BY batch_id, s.event_type
    """


# --------------------------------------------------------------------------
# A8 — foreachBatch upsert store vs the direct weekly aggregation
# --------------------------------------------------------------------------

CHUNK_S = 6 * 86400  # 6-day chunks: deliberately misaligned with weeks


def _upsert_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update-mode emulation over 6-day arrival chunks upserting WEEKLY
    aggregates: because chunks and weeks are misaligned, most weeks are
    REVISED by a later chunk, exercising dynamic partition overwrite as
    a merge (not just write-once).  Chunk c recomputes every week it
    touches from all data in chunks <= c (exactly what update-mode
    streaming state would hold), and the engine-replay of the FINAL
    chunk is re-delivered (idempotent rewrite).  The final store must
    equal the direct full-data weekly aggregation."""
    from fiveg_spark.streaming import merge_sink

    store = _scratch()
    try:
        ensure_views(spark, ("events",), sf_dir)
        es = "(CAST(unix_micros(ts) AS DOUBLE) / 1000000.0)"
        ev = spark.sql(
            f"SELECT event_type, value, user_id,"
            f" CAST(floor({es} / {WEEK_S}.0) AS BIGINT) AS wk,"
            f" CAST(floor({es} / {CHUNK_S}.0) AS BIGINT) AS ck"
            " FROM events"
        ).localCheckpoint()  # one scan feeds every chunk recompute
        chunks = sorted(r["ck"] for r in ev.select("ck").distinct().collect())
        merge = merge_sink.foreach_batch_upsert(
            store, partition_by=("event_type", "wk")
        )

        def chunk_frame(i: int) -> DataFrame:
            c = chunks[i]
            touched = ev.filter(F.col("ck") == c).select("wk").distinct()
            return (
                ev.filter(F.col("ck") <= c)
                .join(touched, "wk")
                .groupBy("event_type", "wk")
                .agg(
                    F.count("*").alias("n_events"),
                    F.countDistinct("user_id").alias("n_users"),
                    F.sum("value").alias("sum_value"),
                )
            )

        for i in range(len(chunks)):
            merge(chunk_frame(i), i)
        merge(chunk_frame(len(chunks) - 1), len(chunks) - 1)  # replay

        out = spark.read.parquet(store).select(
            "event_type",
            F.col("wk").cast("long"),
            F.col("n_events").cast("long"),
            F.col("n_users").cast("long"),
            F.round(F.col("sum_value") + 1e-9, 4).alias("sum_value"),
        ).orderBy("event_type", "wk")
        return _collected(
            spark,
            out,
            "event_type STRING, wk LONG, n_events LONG, n_users LONG,"
            " sum_value DOUBLE",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _upsert_store_oracle() -> str:
    return f"""
    SELECT
      event_type,
      CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 / {WEEK_S}.0)
           AS BIGINT) AS wk,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      round(sum(value) + 1e-9, 4) AS sum_value
    FROM events
    GROUP BY event_type, wk
    ORDER BY event_type, wk
    """


QUERIES.extend([
    Query("stream_lateness_store_parity", _lateness_store_run,
          _lateness_store_oracle()),
    Query("stream_cusum_store_parity", _cusum_store_run,
          _cusum_store_oracle()),
    Query("stream_psi_store_parity", _psi_store_run,
          _psi_store_oracle()),
    Query("stream_upsert_store_parity", _upsert_store_run,
          _upsert_store_oracle()),
])


# --------------------------------------------------------------------------
# B21 — streaming t-digest store: exact counts + band-certified estimates
# --------------------------------------------------------------------------


def _tdigest_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay weeks through foreach_batch_tdigest (replay + compact on
    the certified path), then answer daily quantiles from CENTROID ROWS
    ONLY.  The C64 certification discipline: the oracle recomputes the
    exact per-(type, day) row count, while the p50/p95/p99 estimates —
    which have no DuckDB twin — certify as booleans bounding Spark's
    own estimates inside exact interpolated percentile BANDS computed
    on the same data (p50 in [p40, p60], p95 in [p90, max], p99 in
    [p90, max]); a digest outside its band is a real quality break."""
    from fiveg_spark.streaming import tdigest_sink

    store = _scratch()
    try:
        batches = _week_batches(spark, sf_dir)
        sink = tdigest_sink.foreach_batch_tdigest(store)
        for i, frame in batches:
            sink(frame, i)
        sink(batches[0][1], 0)  # replay below high-water: no-op
        tdigest_sink.compact(spark, store)

        merged = tdigest_sink.read_daily_quantiles(spark, store).select(
            "event_type",
            F.floor(
                F.unix_micros("day").cast("double") / 1e6 / 86400.0
            ).cast("long").alias("day"),
            "n_events",
            "est_p50",
            "est_p95",
            "est_p99",
        )
        exact = spark.sql(
            "SELECT event_type,"
            " CAST(floor(CAST(unix_micros(ts) AS DOUBLE) / 1000000.0"
            " / 86400.0) AS BIGINT) AS day,"
            " percentile(value, 0.40) AS p40,"
            " percentile(value, 0.60) AS p60,"
            " percentile(value, 0.90) AS p90,"
            " max(value) AS vmax"
            " FROM events GROUP BY event_type, day"
        )
        out = merged.join(exact, ["event_type", "day"]).select(
            "event_type",
            "day",
            F.col("n_events").cast("long"),
            ((F.col("est_p50") >= F.col("p40"))
             & (F.col("est_p50") <= F.col("p60"))).alias("p50_in_band"),
            ((F.col("est_p95") >= F.col("p90"))
             & (F.col("est_p95") <= F.col("vmax"))).alias("p95_in_band"),
            ((F.col("est_p99") >= F.col("p90"))
             & (F.col("est_p99") <= F.col("vmax"))).alias("p99_in_band"),
        ).orderBy("event_type", "day")
        return _collected(
            spark,
            out,
            "event_type STRING, day LONG, n_events LONG,"
            " p50_in_band BOOLEAN, p95_in_band BOOLEAN,"
            " p99_in_band BOOLEAN",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _tdigest_store_oracle() -> str:
    return """
    SELECT
      event_type,
      CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 / 86400.0)
           AS BIGINT) AS day,
      CAST(count(*) AS BIGINT) AS n_events,
      TRUE AS p50_in_band,
      TRUE AS p95_in_band,
      TRUE AS p99_in_band
    FROM events
    GROUP BY event_type, day
    ORDER BY event_type, day
    """


QUERIES.append(
    Query("stream_tdigest_store_parity", _tdigest_store_run,
          _tdigest_store_oracle())
)


# --------------------------------------------------------------------------
# r11 pre-fill (flags dropped at r11 start; in the r11 certification window)
# --------------------------------------------------------------------------


def _hll_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 — the streaming HLL sketch store certified with the C21
    approx-variants discipline: exact per-(type, day) event counts
    recomputed by the oracle, plus booleans bounding the store's
    DISTINCT-USER estimates (which have no DuckDB twin) within ±15% of
    the exact distinct counts carried in-row — replay no-op and compact
    on the certified path, estimates answered from sketch rows only."""
    from fiveg_spark.streaming import sketch_sink

    store = _scratch()
    try:
        batches = _week_batches(spark, sf_dir)
        sink = sketch_sink.foreach_batch_sketch(store)
        for i, frame in batches:
            sink(frame, i)
        sink(batches[0][1], 0)  # replay below high-water: no-op
        sketch_sink.compact(spark, store)

        merged = sketch_sink.read_daily_sketches(spark, store).select(
            "event_type",
            F.floor(
                F.unix_micros("day").cast("double") / 1e6 / 86400.0
            ).cast("long").alias("day"),
            "n_events",
            "est_users",
        )
        exact = spark.sql(
            "SELECT event_type,"
            " CAST(floor(CAST(unix_micros(ts) AS DOUBLE) / 1000000.0"
            " / 86400.0) AS BIGINT) AS day,"
            " CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users"
            " FROM events GROUP BY event_type, day"
        )
        out = merged.join(exact, ["event_type", "day"]).select(
            "event_type",
            "day",
            F.col("n_events").cast("long"),
            "n_exact_users",
            (
                F.abs(F.col("est_users") - F.col("n_exact_users"))
                <= 0.15 * F.col("n_exact_users")
            ).alias("est_within_15pct"),
        ).orderBy("event_type", "day")
        return _collected(
            spark,
            out,
            "event_type STRING, day LONG, n_events LONG,"
            " n_exact_users LONG, est_within_15pct BOOLEAN",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _hll_store_oracle() -> str:
    return """
    SELECT
      event_type,
      CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 / 86400.0)
           AS BIGINT) AS day,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
      TRUE AS est_within_15pct
    FROM events
    GROUP BY event_type, day
    ORDER BY event_type, day
    """


def _reservoir_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 — the streaming bottom-k reservoir certified for its
    INVARIANTS: the merged PER-TYPE sample holds exactly min(k, n_type)
    rows, every
    sampled event exists in the corpus (anti-join emptiness), and the
    sample is duplicate-free — the hash order itself (xxhash64) has no
    DuckDB twin, so content certifies by membership, not by value."""
    from fiveg_spark.streaming import reservoir_sink

    store = _scratch()
    try:
        batches = _week_batches(spark, sf_dir)
        sink = reservoir_sink.foreach_batch_reservoir(store)
        for i, frame in batches:
            sink(frame, i)
        sink(batches[0][1], 0)  # replay below high-water: no-op
        reservoir_sink.compact(spark, store)

        sample = reservoir_sink.read_sample(spark, store)
        k = reservoir_sink.DEFAULT_K
        per_type = sample.groupBy("event_type").agg(
            F.count("*").alias("n_sample"),
            F.countDistinct("event_id").alias("n_distinct"),
        )
        orphans = (
            sample.select("event_type", "event_id")
            .join(
                spark.sql("SELECT event_type, event_id FROM events"),
                ["event_type", "event_id"],
                "left_anti",
            )
            .groupBy("event_type")
            .agg(F.count("*").alias("n_orphans"))
        )
        totals = spark.sql(
            "SELECT event_type, count(*) AS n_type FROM events"
            " GROUP BY event_type"
        )
        out = (
            totals.join(per_type, "event_type", "left")
            .join(orphans, "event_type", "left")
            .select(
                "event_type",
                F.least(F.lit(k), F.col("n_type")).cast("long").alias(
                    "expected_k"
                ),
                F.coalesce(F.col("n_sample"), F.lit(0)).cast("long").alias(
                    "n_sample"
                ),
                (
                    F.coalesce(F.col("n_sample"), F.lit(0))
                    == F.least(F.lit(k), F.col("n_type"))
                ).alias("size_exact"),
                (
                    F.coalesce(F.col("n_distinct"), F.lit(0))
                    == F.coalesce(F.col("n_sample"), F.lit(0))
                ).alias("duplicate_free"),
                (F.coalesce(F.col("n_orphans"), F.lit(0)) == 0).alias(
                    "all_members_exist"
                ),
            )
            .orderBy("event_type")
        )
        return _collected(
            spark,
            out,
            "event_type STRING, expected_k LONG, n_sample LONG,"
            " size_exact BOOLEAN, duplicate_free BOOLEAN,"
            " all_members_exist BOOLEAN",
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _reservoir_store_oracle() -> str:
    from fiveg_spark.streaming.reservoir_sink import DEFAULT_K

    return f"""
    SELECT
      event_type,
      CAST(least({DEFAULT_K}, count(*)) AS BIGINT) AS expected_k,
      CAST(least({DEFAULT_K}, count(*)) AS BIGINT) AS n_sample,
      TRUE AS size_exact,
      TRUE AS duplicate_free,
      TRUE AS all_members_exist
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """


QUERIES.extend([
    Query("stream_hll_store_parity", _hll_store_run,
          _hll_store_oracle()),
    Query("stream_reservoir_store_parity", _reservoir_store_run,
          _reservoir_store_oracle()),
])


# --------------------------------------------------------------------------
# B6 — streaming 36-KPI vs the batch flagship (the reference's own
# stream≡batch claim, KafkaKpiPipeline.scala:69-176 vs :398-465)
# --------------------------------------------------------------------------

# KPIs whose streaming aggregate is EXACTLY the batch formula (31 of 36;
# the other 5 are the approximate trades streaming semantics force —
# HLL distincts + percentile_approx, KafkaKpiPipeline.scala:126 makes
# the same trade — certified below via envelope booleans; see the run
# docstring for which of the two bounds is hard vs statistical).
_APPROX_KPIS = ("Unique_Pkt_Sizes", "Protocol_Diversity",
                "Unique_Src_Ports", "Unique_Dst_Ports", "IAT_Median")
_CNT_KPIS = ("Total_Packets", "Idle_Periods", "Zero_Win_Count", "RST_Count")


def _exact_kpi_aliases() -> list[str]:
    from fiveg_spark.operators.kpi import kpi_aggregates

    out = []
    for expr in kpi_aggregates(dialect="duckdb"):
        alias = expr.rsplit(" AS ", 1)[1]
        if alias not in _APPROX_KPIS:
            out.append(alias)
    return out


def _stream_kpi36_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events-mapped packet view through the REAL streaming
    plan — per-week parquet files consumed one micro-batch each
    (maxFilesPerTrigger=1, mtime-ordered) through the stateful-IAT
    `applyInPandasWithState` operator and the watermarked tumbling
    window, parquet sink + checkpoint — then certify the emitted
    windows against a DuckDB recomputation of the batch flagship.

    Two SENTINEL files (far-future event time, same hour window) land
    last: the first advances the watermark past every real window end,
    the second triggers the batch in which they all flush — so the
    emitted set is deterministically ALL real windows, independent of
    whether availableNow runs a trailing no-data batch (the sentinel's
    own window is excluded in-plan by the cutoff literal either way).

    31 KPIs stream with formulas identical to the batch flagship and
    certify by VALUE; the 5 approximation-forced KPIs certify by
    envelope booleans of two different strengths (r11 ADVICE wording
    fix).  The percentile envelope is a HARD bound: percentile_approx
    at accuracy 100 returns a raw element within ±1% rank of the
    median, so |approx − exact median| ≤ IQR deterministically.  The
    15%/±2 HLL envelope is a HIGH-CONFIDENCE STATISTICAL bound, not a
    guarantee: approx_count_distinct's default rsd is 5% ONE-sigma, so
    15% is ~3 sigma — a different scale factor or corpus could in
    principle land outside it without any regression; a red here means
    "investigate the sketch", not "the stream is wrong".
    """
    import os

    from fiveg_spark.operators.kpi import packet_view, with_iat
    from fiveg_spark.streaming.kpi_stream import IAT_SCHEMA, streaming_kpi36

    in_cols = [f.name for f in IAT_SCHEMA.fields if f.name != "iat"]
    scratch = _scratch()
    src = os.path.join(scratch, "src")
    out = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    os.makedirs(src)
    try:
        ensure_views(spark, ("events",), sf_dir)
        pv = packet_view(spark, sf_dir).select("event_id", *in_cols)
        wk = F.floor(F.col("ts_sec") / WEEK_S).cast("long")
        weeks = sorted(
            r[0] for r in pv.select(wk.alias("wk")).distinct().collect()
        )
        max_sec = pv.agg(F.max("ts_sec")).head()[0]
        # sentinel pair: +100 days, 1 s apart → same hour window
        sent_secs = [max_sec + 8_640_000.0, max_sec + 8_640_001.0]
        cutoff_sec = max_sec + 1_000_000.0  # past every real window end

        def land(df: DataFrame, seq: int) -> None:
            _land_file(df, scratch, src, seq)

        for i, w in enumerate(weeks):
            land(pv.filter(wk == w).drop("event_id"), i)
        for j, s in enumerate(sent_secs):
            land(
                spark.range(1).select(
                    F.lit("eMBB").alias("slice"),
                    F.lit(-1).cast("long").alias("flow_id"),
                    F.timestamp_seconds(F.lit(s)).alias("ts"),
                    F.lit(s).alias("ts_sec"),
                    F.lit(1.0).alias("pkt_len"),
                    F.lit("TCP").alias("protocol"),
                    F.lit(0).alias("src_port"),
                    F.lit(0).alias("dst_port"),
                    F.lit(0).alias("win_size"),
                    F.lit(0).alias("tcp_flags"),
                ),
                len(weeks) + j,
            )

        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_kpi36(stream, window="1 hour", watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("availableNow replay did not finish in "
                               "600s; refusing to read a partial sink")

        streamed = spark.read.parquet(out).filter(
            F.col("window_end") <= F.timestamp_seconds(F.lit(cutoff_sec))
        )
        exact = (
            with_iat(packet_view(spark, sf_dir))
            .withColumn("window_start", F.date_trunc("hour", F.col("ts")))
            .groupBy("slice", "window_start")
            .agg(
                F.countDistinct("pkt_len").alias("x_upk"),
                F.countDistinct("protocol").alias("x_pd"),
                F.countDistinct("src_port").alias("x_usp"),
                F.countDistinct("dst_port").alias("x_udp"),
                F.expr("percentile(iat, 0.25)").alias("p25"),
                F.expr("percentile(iat, 0.50)").alias("p50"),
                F.expr("percentile(iat, 0.75)").alias("p75"),
            )
        )

        def ok(approx: str, ex: str) -> F.Column:
            return (
                F.abs(F.col(approx) - F.col(ex))
                <= F.greatest(F.lit(2.0), 0.15 * F.col(ex))
            )

        rounded = [
            F.expr(
                f"CAST(round(coalesce({a}, 0.0) + 1e-9, 4) + 0.0 AS DOUBLE)"
                if a not in _CNT_KPIS else f"CAST({a} AS BIGINT)"
            ).alias(a)
            for a in _exact_kpi_aliases()
        ]
        result = (
            streamed.join(exact, ["slice", "window_start"], "inner")
            .select(
                "slice",
                "window_start",
                *rounded,
                ok("Unique_Pkt_Sizes", "x_upk").alias("uniq_pkt_ok"),
                ok("Protocol_Diversity", "x_pd").alias("proto_div_ok"),
                ok("Unique_Src_Ports", "x_usp").alias("uniq_src_ok"),
                ok("Unique_Dst_Ports", "x_udp").alias("uniq_dst_ok"),
                # percentile_approx returns a raw ELEMENT with rank
                # within ±1% of the median (accuracy 100), never an
                # interpolation — for an n=2 window that's the lower
                # element while exact percentile() interpolates the
                # midpoint, so the honest guaranteed bound is
                # |approx − exact median| ≤ IQR (both live between the
                # quartiles for every n; boundary-exact at n=2, hence
                # the multiplicative slack)
                (
                    F.abs(F.col("IAT_Median") - F.col("p50"))
                    <= (F.col("p75") - F.col("p25")) * (1 + 1e-9) + 1e-6
                ).alias("median_in_band"),
            )
        )
        schema = ", ".join(
            ["slice STRING", "window_start TIMESTAMP"]
            + [
                f"{a} {'LONG' if a in _CNT_KPIS else 'DOUBLE'}"
                for a in _exact_kpi_aliases()
            ]
            + [f"{b} BOOLEAN" for b in ("uniq_pkt_ok", "proto_div_ok",
                                        "uniq_src_ok", "uniq_dst_ok",
                                        "median_in_band")]
        )
        return _collected(spark, result, schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _stream_kpi36_oracle() -> str:
    from fiveg_spark.operators.kpi import flows_cte, kpi_aggregates

    aggs = ",\n      ".join(
        e for e in kpi_aggregates(dialect="duckdb")
        if e.rsplit(" AS ", 1)[1] not in _APPROX_KPIS
    )
    bools = ",\n      ".join(
        f"TRUE AS {b}" for b in ("uniq_pkt_ok", "proto_div_ok",
                                 "uniq_src_ok", "uniq_dst_ok",
                                 "median_in_band")
    )
    return f"""
    {flows_cte("duckdb")}
    SELECT
      slice,
      date_trunc('hour', ts) AS window_start,
      {aggs},
      {bools}
    FROM flows
    GROUP BY slice, date_trunc('hour', ts)
    """


QUERIES.append(
    Query("stream_kpi36_parity", _stream_kpi36_run, _stream_kpi36_oracle())
)


# --------------------------------------------------------------------------
# B10 — stream-stream interval join vs the batch interval join
# --------------------------------------------------------------------------


def _land_file(df: DataFrame, scratch: str, src: str, seq: int) -> None:
    """Write df as ONE parquet file `src/{seq}.parquet` with an
    mtime that orders it after every lower seq (the file-source
    replay discipline stream_kpi36 established)."""
    import os

    tmp = os.path.join(scratch, f"land{os.path.basename(src)}{seq}")
    df.coalesce(1).write.parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.makedirs(src, exist_ok=True)
    dst = os.path.join(src, f"{seq:04d}.parquet")
    os.rename(os.path.join(tmp, part), dst)
    os.utime(dst, (1_700_000_000 + seq, 1_700_000_000 + seq))


def _stream_attribution_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay views and clicks as two PHYSICALLY separate week-file
    sources (independent watermark advancement — the production
    topology) through the REAL streaming_attribution interval join,
    then certify the pair set against DuckDB's batch interval join.

    Inner stream-stream joins emit each qualifying pair exactly once,
    in the micro-batch where the LATER side arrives (state holds the
    earlier side until the opposite watermark passes the interval
    bound), so the emitted pair set is deterministically COMPLETE when
    availableNow drains both sources — no sentinels needed.  The
    certified frame is the per-slice rollup of the pairs (count,
    distinct views/clicks matched, rounded mean click delay)."""
    import os

    from fiveg_spark.streaming.kpi_stream import streaming_attribution

    scratch = _scratch()
    src_v = os.path.join(scratch, "views")
    src_c = os.path.join(scratch, "clicks")
    out = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    try:
        ensure_views(spark, ("events",), sf_dir)
        ev = spark.sql(
            "SELECT ts, user_id, event_id, event_type FROM events"
            " WHERE event_type IN ('view', 'click')"
        )
        wk = F.floor(
            F.col("ts").cast("double") / WEEK_S
        ).cast("long")
        weeks = sorted(
            r[0] for r in ev.select(wk.alias("wk")).distinct().collect()
        )
        for i, w in enumerate(weeks):
            batch = ev.filter(wk == w)
            _land_file(
                batch.filter(F.col("event_type") == "view"),
                scratch, src_v, i,
            )
            _land_file(
                batch.filter(F.col("event_type") == "click"),
                scratch, src_c, i,
            )

        schema = spark.read.parquet(src_v).schema

        def stream(src: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

        q = (
            streaming_attribution(
                stream(src_v), within="1 hour", watermark="2 hours",
                clicks_stream=stream(src_c),
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("availableNow replay did not finish in "
                               "600s; refusing to read a partial sink")

        pairs = spark.read.parquet(out)
        rollup = (
            pairs.withColumn(
                "slice",
                F.expr(
                    "CASE CAST(view_user % 3 AS INT) WHEN 0 THEN 'eMBB'"
                    " WHEN 1 THEN 'URLLC' ELSE 'mMTC' END"
                ),
            )
            .groupBy("slice")
            .agg(
                F.expr("CAST(count(*) AS BIGINT)").alias("n_pairs"),
                F.expr("CAST(count(DISTINCT view_id) AS BIGINT)").alias(
                    "n_views_matched"
                ),
                F.expr("CAST(count(DISTINCT click_id) AS BIGINT)").alias(
                    "n_clicks_matched"
                ),
                F.expr(
                    "CAST(round(coalesce(avg(CAST(unix_micros(click_ts)"
                    " - unix_micros(view_ts) AS DOUBLE) / 1000000.0), 0.0)"
                    " + 1e-9, 4) + 0.0 AS DOUBLE)"
                ).alias("mean_delay_s"),
            )
            .orderBy("slice")
        )
        return _collected(
            spark, rollup,
            "slice STRING, n_pairs LONG, n_views_matched LONG,"
            " n_clicks_matched LONG, mean_delay_s DOUBLE",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _stream_attribution_oracle() -> str:
    return """
    WITH pairs AS (
      SELECT v.user_id AS view_user, v.event_id AS view_id,
             v.ts AS view_ts, c.event_id AS click_id, c.ts AS click_ts
      FROM events v
      JOIN events c
        ON v.event_type = 'view' AND c.event_type = 'click'
       AND v.user_id = c.user_id
       AND c.ts > v.ts
       AND c.ts <= v.ts + INTERVAL 1 HOUR
    )
    SELECT
      CASE CAST(view_user % 3 AS INT) WHEN 0 THEN 'eMBB'
           WHEN 1 THEN 'URLLC' ELSE 'mMTC' END AS slice,
      CAST(count(*) AS BIGINT) AS n_pairs,
      CAST(count(DISTINCT view_id) AS BIGINT) AS n_views_matched,
      CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks_matched,
      CAST(round(coalesce(avg(CAST(epoch_us(click_ts)
           - epoch_us(view_ts) AS DOUBLE) / 1000000.0), 0.0)
           + 1e-9, 4) + 0.0 AS DOUBLE) AS mean_delay_s
    FROM pairs
    GROUP BY 1
    ORDER BY 1
    """


QUERIES.append(
    Query("stream_attribution_parity", _stream_attribution_run,
          _stream_attribution_oracle())
)


# --------------------------------------------------------------------------
# A3 — Kafka wire round-trip vs the raw packet view
# --------------------------------------------------------------------------


def _kafka_wire_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broker-free certification of the reference wire protocol (ref
    PcapKpiExtractor.scala:233-273 publish, KafkaKpiPipeline.scala:
    245-261 subscribe): the canonical packet view serializes through
    the REAL ``to_kafka_records`` (flowId-keyed JSON in the reference's
    field names) into binary (key, value) records, deserializes back
    through the REAL ``parse_packet_json``, and the per-slice rollup of
    the PARSED records must equal the oracle's direct recomputation
    from events — JSON double/long/string round-trip fidelity on the
    certified path, not just in pytest."""
    from fiveg_spark.operators.kpi import packet_view
    from fiveg_spark.sources.kafka import parse_packet_json, to_kafka_records

    ensure_views(spark, ("events",), sf_dir)
    wire_cols = [
        F.col("slice").alias("sliceType"),
        F.col("ts_sec").alias("timestamp"),
        (F.col("ts_sec") * 1000).cast("long").alias("timestampMs"),
        F.col("pkt_len").cast("int").alias("packetLen"),
        "protocol",
        F.col("src_port").alias("srcPort"),
        F.col("dst_port").alias("dstPort"),
        F.col("flow_id").cast("string").alias("flowId"),
        F.col("tcp_flags").alias("tcpFlags"),
        F.col("win_size").alias("windowSize"),
        F.col("event_id").alias("seqNumber"),
    ]
    records = to_kafka_records(
        packet_view(spark, sf_dir).select(*wire_cols), key_col="flowId"
    ).select(F.col("key").cast("binary"), F.col("value").cast("binary"))
    parsed = parse_packet_json(records)
    return (
        parsed.groupBy(F.col("sliceType").alias("slice"))
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_records"),
            F.expr("CAST(count(DISTINCT flowId) AS BIGINT)").alias("n_flows"),
            F.expr("CAST(sum(packetLen) AS BIGINT)").alias("sum_pkt_len"),
            F.expr("CAST(min(timestampMs) AS BIGINT)").alias("min_ts_ms"),
            F.expr("CAST(max(timestampMs) AS BIGINT)").alias("max_ts_ms"),
            F.expr(
                "CAST(sum(CASE WHEN protocol = 'TCP' THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_tcp"),
            F.expr("CAST(sum(seqNumber) AS BIGINT)").alias("sum_seq"),
            # the DOUBLE field survives JSON: shortest-roundtrip
            # serialization is exact, so the rounded mean matches the
            # oracle computing from the raw epoch arithmetic
            F.expr(
                "CAST(round(coalesce(avg(timestamp), 0.0) / 1e6 + 1e-9, 4)"
                " + 0.0 AS DOUBLE)"
            ).alias("mean_ts_megasec"),
        )
        .orderBy("slice")
    )


def _kafka_wire_oracle() -> str:
    from fiveg_spark.operators.kpi import json_k_expr, packet_projection

    proj = ",\n      ".join(packet_projection("duckdb"))
    return f"""
    WITH events_k AS (
      SELECT *, {json_k_expr("duckdb")} AS k FROM events
    ), packets AS (
      SELECT
      {proj}
      FROM events_k
    )
    SELECT
      slice,
      CAST(count(*) AS BIGINT) AS n_records,
      CAST(count(DISTINCT CAST(flow_id AS VARCHAR)) AS BIGINT) AS n_flows,
      -- Spark's double->int CAST truncates toward zero; DuckDB's
      -- ROUNDS -- floor() (values are positive) pins both to the
      -- Spark wire semantics
      CAST(sum(CAST(floor(pkt_len) AS BIGINT)) AS BIGINT) AS sum_pkt_len,
      CAST(min(CAST(floor(ts_sec * 1000) AS BIGINT)) AS BIGINT) AS min_ts_ms,
      CAST(max(CAST(floor(ts_sec * 1000) AS BIGINT)) AS BIGINT) AS max_ts_ms,
      CAST(sum(CASE WHEN protocol = 'TCP' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_tcp,
      CAST(sum(event_id) AS BIGINT) AS sum_seq,
      CAST(round(coalesce(avg(ts_sec), 0.0) / 1e6 + 1e-9, 4) + 0.0
           AS DOUBLE) AS mean_ts_megasec
    FROM packets
    GROUP BY slice
    ORDER BY slice
    """


QUERIES.append(
    Query("kafka_wire_parity", _kafka_wire_run, _kafka_wire_oracle())
)


# --------------------------------------------------------------------------
# B24 — streaming vector-index maintenance vs the closed-form assignment
# --------------------------------------------------------------------------

_IDX_K = 8  # one-hot centroids on dims 0..7


def _index_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay embedding waves (vec_id % 4) through the REAL
    foreach_batch_index against FROZEN one-hot centroids — with a
    replayed batch (watermark no-op) and a re-ingested wave under a
    higher batch_id (supersession collapses to one posting per
    vec_id) — then compact and certify index_health off the store.

    One-hot unit centroids make the assignment CLOSED-FORM: the
    argmax-cosine list is the argmax of the vector's first k raw
    components (normalization is monotonic), and the assignment cosine
    is that component over the vector norm — both exactly recomputable
    by the oracle, with the kernel's first-max tie rule mirrored as
    (v DESC, list_id ASC)."""
    import numpy as np

    from fiveg_spark.operators.ann_ivf import save_centroids
    from fiveg_spark.streaming import index_sink

    scratch = _scratch()
    store = scratch + "/postings"
    cpath = scratch + "/centroids"
    try:
        ensure_views(spark, ("embeddings",), sf_dir)
        dim = len(
            spark.sql("SELECT embedding FROM embeddings LIMIT 1")
            .head()["embedding"]
        )
        C = np.zeros((_IDX_K, dim))
        C[np.arange(_IDX_K), np.arange(_IDX_K)] = 1.0
        save_centroids(spark, C, cpath)

        emb = spark.sql("SELECT vec_id, label, embedding FROM embeddings")
        sink = index_sink.foreach_batch_index(store, cpath)
        for b in range(4):
            sink(emb.filter(F.col("vec_id") % 4 == b), b)
        sink(emb.filter(F.col("vec_id") % 4 == 1), 1)  # replay: no-op
        sink(emb.filter(F.col("vec_id") % 4 == 0), 4)  # re-ingest: supersede
        index_sink.compact(spark, store)

        health = index_sink.index_health(spark, store).select(
            F.col("list_id").cast("long").alias("list_id"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.expr(
                "CAST(round(coalesce(mean_cos, 0.0) + 1e-9, 4) + 0.0"
                " AS DOUBLE)"
            ).alias("mean_cos"),
            F.expr(
                "CAST(round(coalesce(imbalance_ratio, 0.0) + 1e-9, 4)"
                " + 0.0 AS DOUBLE)"
            ).alias("imbalance_ratio"),
        ).orderBy("list_id")
        return _collected(
            spark, health,
            "list_id LONG, n_vectors LONG, mean_cos DOUBLE,"
            " imbalance_ratio DOUBLE",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _index_store_oracle() -> str:
    from fiveg_spark.plans.registry import pct

    return f"""
    WITH comps AS (
      SELECT e.vec_id,
        CAST(i - 1 AS BIGINT) AS list_id,
        CAST(embedding[i] AS DOUBLE) AS v,
        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> x * x))) AS nrm
      FROM embeddings e
      CROSS JOIN (SELECT unnest(generate_series(1, {_IDX_K})) AS i) g
    ),
    assigned AS (
      SELECT vec_id, list_id, v / (nrm + 1e-12) AS cos,
        row_number() OVER (PARTITION BY vec_id
                           ORDER BY v DESC, list_id ASC) AS rk
      FROM comps
    ),
    lists AS (
      SELECT list_id,
        CAST(count(*) AS BIGINT) AS n_vectors,
        round(coalesce(avg(cos), 0.0) + 1e-9, 4) + 0.0 AS mean_cos
      FROM assigned WHERE rk = 1
      GROUP BY list_id
    ),
    stats AS (
      SELECT max(n_vectors) AS mx,
        {pct("n_vectors", 0.5, "duckdb")} AS med
      FROM lists
    )
    SELECT l.list_id, l.n_vectors,
      CAST(l.mean_cos AS DOUBLE) AS mean_cos,
      CAST(round(l2.mx / greatest(l2.med, 1.0) + 1e-9, 4) + 0.0
           AS DOUBLE) AS imbalance_ratio
    FROM lists l CROSS JOIN stats l2
    ORDER BY l.list_id
    """


QUERIES.append(
    Query("stream_index_store_parity", _index_store_run,
          _index_store_oracle())
)


# --------------------------------------------------------------------------
# B13 — streaming EWMA anomaly vs the unrolled recursion
# --------------------------------------------------------------------------

_EWMA_BASE = 1_700_000_000.0


def _ewma_series() -> list[tuple[str, float, float]]:
    """Planted 3-slice series, 12 points each: a flat line with one
    20x spike (must flag), a deterministic ramp (documents the EW
    WARM-UP transient: with variance still near zero the first ramp
    steps score >3 sigma and flag, then var converges to (1-alpha)*d^2
    and z settles near 1/sqrt(1-alpha) ~ 1.05 — quiet), and a constant
    (z exactly 0 forever)."""
    rows = []
    for i in range(12):
        rows.append(("spiky", _EWMA_BASE + 60 * i,
                     200.0 if i == 7 else 10.0))
        rows.append(("ramp", _EWMA_BASE + 60 * i, 50.0 + 2.0 * i))
        rows.append(("flat", _EWMA_BASE + 60 * i, 5.0))
    return rows


def _ewma_expected() -> list[tuple]:
    """The recursion unrolled sequentially (the same pure ewma_step the
    operator folds per row) — what the DISTRIBUTED stateful execution
    must reproduce across micro-batch boundaries."""
    from fiveg_spark.streaming.anomaly import Z_THRESHOLD, ewma_step

    out = []
    by_slice: dict[str, list] = {}
    for slc, ts, v in _ewma_series():
        by_slice.setdefault(slc, []).append((ts, v))
    for slc, pts in by_slice.items():
        mu, var, n = 0.0, 0.0, 0
        for ts, x in sorted(pts):
            if n == 0:
                z, flag = 0.0, False
                mu, var = x, 0.0
            else:
                z, mu, var = ewma_step(x, mu, var)
                flag = bool(n >= 2 and abs(z) > Z_THRESHOLD)
            n += 1
            out.append((slc, ts, x, float(round(float(z), 6)), flag))
    return out


def _ewma_store_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planted series replays through the REAL
    `streaming_ewma_anomaly` plan — four micro-batches of three points
    per slice (maxFilesPerTrigger=1, mtime-ordered), so the keyed
    state carries (mu, var, n) across batch boundaries — into a
    checkpointed parquet sink; every scored row must equal the
    sequential recursion (including the ramp's warm-up transient
    flags — a REAL detector property this certification documents,
    not a defect of the fixture)."""
    import os

    from fiveg_spark.streaming.anomaly import streaming_ewma_anomaly

    scratch = _scratch()
    src = os.path.join(scratch, "src")
    out = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")
    try:
        rows = sorted(_ewma_series(), key=lambda r: r[1])
        for b in range(4):
            _land_file(
                spark.createDataFrame(
                    rows[b * 9:(b + 1) * 9],
                    "slice STRING, ts_sec DOUBLE, value DOUBLE",
                ),
                scratch, src, b,
            )
        stream = (
            spark.readStream.schema("slice STRING, ts_sec DOUBLE, value DOUBLE")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_ewma_anomaly(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("availableNow replay did not finish in "
                               "600s; refusing to read a partial sink")
        scored = spark.read.parquet(out).select(
            "slice", "ts_sec", "value",
            F.expr("CAST(round(zscore + 1e-9, 4) + 0.0 AS DOUBLE)")
            .alias("zscore"),
            "is_anomaly",
        )
        return _collected(
            spark, scored,
            "slice STRING, ts_sec DOUBLE, value DOUBLE, zscore DOUBLE,"
            " is_anomaly BOOLEAN",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _ewma_store_oracle() -> str:
    vals = ",\n      ".join(
        f"('{s}', {ts!r}, {v!r}, {round(z + 1e-9, 4)!r},"
        f" {'TRUE' if f else 'FALSE'})"
        for s, ts, v, z, f in _ewma_expected()
    )
    return f"""
    SELECT slice, CAST(ts_sec AS DOUBLE) AS ts_sec,
      CAST(value AS DOUBLE) AS value,
      CAST(zscore AS DOUBLE) AS zscore, is_anomaly
    FROM (VALUES
      {vals}
    ) AS t(slice, ts_sec, value, zscore, is_anomaly)
    ORDER BY slice, ts_sec
    """


QUERIES.append(
    Query("stream_ewma_anomaly_parity", _ewma_store_run,
          _ewma_store_oracle())
)


# --------------------------------------------------------------------------
# B37 — the state store itself on the oracle path: Spark 4's
# `statestore` reader certified against a DuckDB recomputation
# --------------------------------------------------------------------------


def _state_read_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37 certified: run a complete-mode streaming aggregation over
    the events corpus (availableNow, checkpointed), then read the
    OPERATOR STATE back through `spark.read.format("statestore")` —
    the running (sum, count) per event_type that the state store
    physically holds — and certify those state rows against a direct
    DuckDB aggregation of the same corpus.  What's under test is the
    state-reader path itself (key/value struct flattening, operator
    resolution, committed-batch pinning); the streaming agg is the
    vehicle.  state-metadata booleans ride along: exactly one stateful
    operator, committed batch range [0, 0] for the single-batch
    availableNow run."""
    import os
    import uuid as _uuid

    from fiveg_spark.streaming.state_inspect import (
        read_operator_state,
        state_metadata,
    )

    scratch = _scratch()
    ckpt = os.path.join(scratch, "ckpt")
    qname = f"state_parity_{_uuid.uuid4().hex[:8]}"
    try:
        ensure_views(spark, ("events",), sf_dir)
        # the file stream source needs a DIRECTORY; the corpus is one
        # parquet file — stage a copy in scratch
        src = os.path.join(scratch, "src")
        os.makedirs(src)
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(src, "events.parquet"),
        )
        stream = (
            spark.readStream.schema(
                "event_id LONG, ts TIMESTAMP, user_id LONG,"
                " event_type STRING, value DOUBLE, props STRING"
            )
            .parquet(src)
        )
        q = (
            stream.groupBy("event_type")
            .agg(F.sum("value").alias("s"), F.count("*").alias("c"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        meta = state_metadata(spark, ckpt).collect()
        meta_ok = (
            len(meta) == 1
            and int(meta[0]["minBatchId"]) == 0
            and int(meta[0]["maxBatchId"]) == 0
        )
        st = read_operator_state(spark, ckpt, operator_id=0)
        # key/value struct fields flatten positionally:
        # [event_type, <sum>, <count>, partition_id]
        cols = st.columns
        out = (
            st.select(
                F.col(cols[0]).alias("event_type"),
                F.col(cols[1]).alias("s"),
                F.col(cols[2]).alias("c"),
            )
            .groupBy("event_type")
            .agg(
                F.expr(
                    "CAST(round(sum(s) + 1e-9, 4) + 0.0 AS DOUBLE)"
                ).alias("sum_value"),
                F.expr("CAST(sum(c) AS BIGINT)").alias("n_events"),
            )
            .withColumn("meta_ok", F.lit(bool(meta_ok)))
            .orderBy("event_type")
        )
        from fiveg_spark.plans.plan_ledger import note_precollect
        note_precollect(out)
        rows = [tuple(r) for r in out.collect()]
        return spark.createDataFrame(
            rows,
            "event_type STRING, sum_value DOUBLE, n_events LONG,"
            " meta_ok BOOLEAN",
        )
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(scratch, ignore_errors=True)


def _state_read_oracle() -> str:
    return """
    SELECT
      event_type,
      CAST(round(sum(value) + 1e-9, 4) + 0.0 AS DOUBLE) AS sum_value,
      CAST(count(*) AS BIGINT) AS n_events,
      TRUE AS meta_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """


QUERIES.append(
    Query("state_store_read_parity", _state_read_run, _state_read_oracle())
)


def _state_dedup_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38 certified: the statestore reader over a SECOND store type —
    streaming dropDuplicates state (bare key rows, NULL value struct;
    B37 covered the aggregation store).  The dedup keys physically
    retained by the state store after an availableNow pass over the
    corpus must equal DuckDB's distinct census — certifying the
    reader's key-struct flattening on a valueless store.  Keys are
    (event_type, user band); no watermark is set, so within the single
    replay batch every key survives and the census is exact."""
    import os
    import uuid as _uuid

    from pyspark.sql import functions as _F

    from fiveg_spark.streaming.state_inspect import read_operator_state

    scratch = _scratch()
    ckpt = os.path.join(scratch, "ckpt")
    qname = f"state_dedup_{_uuid.uuid4().hex[:8]}"
    try:
        ensure_views(spark, ("events",), sf_dir)
        src = os.path.join(scratch, "src")
        os.makedirs(src)
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(src, "events.parquet"),
        )
        stream = (
            spark.readStream.schema(
                "event_id LONG, ts TIMESTAMP, user_id LONG,"
                " event_type STRING, value DOUBLE, props STRING"
            )
            .parquet(src)
            .withColumn("band", _F.pmod(_F.col("user_id"), _F.lit(10)))
            .select("event_type", "band")
        )
        q = (
            stream.dropDuplicates(["event_type", "band"])
            .writeStream.format("memory").queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        st = read_operator_state(spark, ckpt, operator_id=0)
        out = (
            st.groupBy("event_type")
            .agg(
                _F.expr("CAST(count(*) AS BIGINT)").alias("n_bands"),
                _F.expr("CAST(min(band) AS BIGINT)").alias("min_band"),
                _F.expr("CAST(max(band) AS BIGINT)").alias("max_band"),
            )
            .orderBy("event_type")
        )
        from fiveg_spark.plans.plan_ledger import note_precollect
        note_precollect(out)
        rows = [tuple(r) for r in out.collect()]
        return spark.createDataFrame(
            rows,
            "event_type STRING, n_bands LONG, min_band LONG, max_band LONG",
        )
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(scratch, ignore_errors=True)


def _state_dedup_oracle() -> str:
    return """
    WITH pairs AS (
      SELECT DISTINCT event_type, user_id % 10 AS band FROM events
    )
    SELECT
      event_type,
      CAST(count(*) AS BIGINT) AS n_bands,
      CAST(min(band) AS BIGINT) AS min_band,
      CAST(max(band) AS BIGINT) AS max_band
    FROM pairs
    GROUP BY event_type
    ORDER BY event_type
    """


QUERIES.append(
    Query("state_dedup_read_parity", _state_dedup_run,
          _state_dedup_oracle())
)


def _stream_chunk_dedup_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39 certified (r12 verdict item 2d): STREAMING chunk dedup —
    the corpus streams through the E133 stride explode, chunks key by
    (source, md5) and dedup via ``dropDuplicatesWithinWatermark`` (the
    Spark 3.5+ operator whose state GC is driven by the watermark
    instead of growing forever like plain dropDuplicates), and BOTH
    visible surfaces must equal DuckDB's distinct-chunk census:

    - the EMITTED rows (one per first-seen key — the dedup output), and
    - the PHYSICAL state rows read back through the B38 statestore
      reader (key struct + expiresAtMicros value — the third store
      type the reader is certified on: aggregation B37, bare-key
      dedup B38, now keyed-expiry dedup).

    A constant event time far inside the 1-day delay keeps every key
    live through the single availableNow pass, so the census is exact;
    the WATERMARK semantics themselves (expiry GC across batches) are
    pinned by tests/test_state_inspect.py at controlled timestamps."""
    import os
    import uuid as _uuid

    from fiveg_spark.streaming.state_inspect import read_operator_state

    scratch = _scratch()
    ckpt = os.path.join(scratch, "ckpt")
    qname = f"chunk_dedup_{_uuid.uuid4().hex[:8]}"
    try:
        ensure_views(spark, ("documents",), sf_dir)
        src = os.path.join(scratch, "src")
        os.makedirs(src)
        shutil.copy(
            os.path.join(sf_dir, "documents.parquet"),
            os.path.join(src, "documents.parquet"),
        )
        schema = spark.read.parquet(
            os.path.join(src, "documents.parquet")
        ).schema
        stream = (
            spark.readStream.schema(schema).parquet(src)
            .selectExpr(
                "source", "text",
                "explode(sequence(1, CAST(greatest(length(text), 1)"
                " AS INT), 150)) AS start",
            )
            .selectExpr(
                "source", "md5(substring(text, start, 200)) AS h",
                "timestamp'2026-01-01 00:00:00' AS ts",
            )
            .withWatermark("ts", "1 day")
        )
        q = (
            stream.dropDuplicatesWithinWatermark(["source", "h"])
            .writeStream.format("memory").queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        emitted = (
            spark.table(qname)
            .groupBy("source")
            .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_emitted"))
        )
        state = (
            read_operator_state(spark, ckpt, operator_id=0)
            .groupBy("source")
            .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_state_keys"))
        )
        out = emitted.join(state, "source").orderBy("source")
        from fiveg_spark.plans.plan_ledger import note_precollect
        note_precollect(out)
        rows = [tuple(r) for r in out.collect()]
        return spark.createDataFrame(
            rows, "source STRING, n_emitted LONG, n_state_keys LONG"
        )
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(scratch, ignore_errors=True)


def _stream_chunk_dedup_oracle() -> str:
    return """
    WITH cells AS (
      SELECT DISTINCT source,
        md5(substring(text, start, 200)) AS h
      FROM (
        SELECT source, text,
          unnest(generate_series(1, greatest(length(text), 1), 150))
            AS start
        FROM documents
      ) s
    )
    SELECT
      source,
      CAST(count(*) AS BIGINT) AS n_emitted,
      CAST(count(*) AS BIGINT) AS n_state_keys
    FROM cells
    GROUP BY source
    ORDER BY source
    """


QUERIES.append(
    Query("stream_chunk_dedup_parity", _stream_chunk_dedup_run,
          _stream_chunk_dedup_oracle())
)
