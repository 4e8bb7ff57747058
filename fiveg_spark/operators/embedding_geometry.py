"""Embedding-geometry diagnostics (SURVEY §2 E123-E125): intrinsic
dimension (TwoNN), kNN hubness, and a Johnson-Lindenstrauss
random-projection distortion audit.

The existing E-family measures embeddings as VECTORS (norms E100,
moments E110, anisotropy E101, truncation E109, quantization E27);
these measure them as a METRIC SPACE — the properties that decide
whether ANN indexing (E7/E37/E38) will work at all: a high intrinsic
dimension kills LSH recall, heavy hubness biases every kNN consumer,
and the JL ratio says how few projected dims a sketch can afford.

Scale doctrine: the two neighbor queries share the exact O(n²) pair
join of E5/E6 — the small-corpus exact tool; at 1e9 vectors the same
statistics run over E37's IVF-blocked candidate pairs (the
embedding_dedup_ivf precedent) since both need only each point's
nearest few neighbors, not the full matrix.  The JL audit is MAP-ONLY
(literal ±1 coefficients, no joins at any scale).

Reference scope: beyond-reference embedding-pipeline breadth.
"""

from __future__ import annotations

import hashlib

from fiveg_spark.operators.similarity import _cos as _cos_expr
from fiveg_spark.operators.similarity import _dot

from fiveg_spark.plans.registry import (
    NUDGE,
    cnt,
    dbl,
    materialized_backed,
    sql_backed,
)

EMB_DIM = 64
JL_DIM = 16
HUB_K = 5


def _l2sq(d: str, a: str, b: str) -> str:
    """Squared euclidean via the dot identity ‖a‖²+‖b‖²−2a·b on
    similarity._dot (the certified engine-paired fold — text-identity
    asserted at review r10w2, now a single shared primitive): each dot
    folds identically in both engines, so the combined double matches
    bit-for-bit before the 4dp rounding (a direct (x−y)² fold has no
    DuckDB twin with guaranteed struct layout)."""
    return (
        f"({_dot(d, a, a)} + {_dot(d, b, b)} - 2.0 * {_dot(d, a, b)})"
    )


def _ranked_pairs_ctes(d: str) -> str:
    """`scored AS (…), ranked AS (…)` WITH-chain fragment: per-anchor
    neighbor ranks over the exact pair join (rounded distance + vec_id
    tiebreak keeps the cut deterministic).  Each consumer query reads
    `ranked` exactly ONCE, so it rides lazily in the consumer's tail
    (r13 fold: the old per-query materialization checkpointed the
    O(n²) frame for a single read; lazy, the `rn <= k` filter sits
    next to the window and Spark's WindowGroupLimit prunes the rank)."""
    dist = _l2sq(d, "a.embedding", "b.embedding")
    return f"""scored AS (
      SELECT
        a.vec_id AS anchor,
        b.vec_id AS neighbor,
        round({dist} + {NUDGE}, 4) + 0.0 AS d2
      FROM embeddings a
      JOIN embeddings b ON b.vec_id <> a.vec_id
    ),
    ranked AS (
      SELECT anchor, neighbor, d2,
        row_number() OVER (
          PARTITION BY anchor ORDER BY d2, neighbor
        ) AS rn
      FROM scored
    )"""


def _twonn_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # E123 — TwoNN intrinsic-dimension estimate (Facco et al. 2018):
    # per point, μ = d2/d1 (1st/2nd neighbor DISTANCES); under a
    # locally uniform density μ is Pareto(id) and the MLE is
    # id = n / Σ ln μ.  THE capacity number for ANN tuning: LSH/IVF
    # recall curves depend on intrinsic, not ambient, dimension.
    # Anchors whose d1 rounds to 0 (near-duplicate twins) are excluded
    # from the MLE and reported — their μ is infinite by construction.
    # μ uses the ROUNDED distance ratio, rounded again before ln
    # (round-before-log discipline).
    tail = f"""
    WITH {_ranked_pairs_ctes(d)},
    two AS (
      SELECT anchor,
        max(CASE WHEN rn = 1 THEN d2 ELSE NULL END) AS d1sq,
        max(CASE WHEN rn = 2 THEN d2 ELSE NULL END) AS d2sq
      FROM ranked WHERE rn <= 2 GROUP BY anchor
    ),
    mu AS (
      SELECT anchor,
        CASE WHEN d1sq > 0.0 AND d2sq IS NOT NULL
             THEN round(sqrt(d2sq / d1sq) + {NUDGE}, 4) + 0.0
             ELSE NULL END AS mu
      FROM two
    ),
    fit AS (
      SELECT
        CAST(count(*) AS DOUBLE) AS n_points,
        CAST(count(mu) AS DOUBLE) AS n_valid,
        sum(CASE WHEN mu IS NOT NULL AND mu > 1.0 THEN ln(mu)
                 ELSE 0.0 END) AS sum_ln_mu,
        avg(mu) AS mean_mu,
        max(mu) AS max_mu
      FROM mu
    )
    SELECT
      {cnt("n_points", "n_points")},
      {cnt("n_points - n_valid", "n_degenerate")},
      {dbl("mean_mu", "mean_mu")},
      {dbl("max_mu", "max_mu")},
      {dbl(
          "CASE WHEN sum_ln_mu > 1e-12 THEN n_valid / sum_ln_mu "
          "ELSE 0.0 END",
          "intrinsic_dim_mle",
      )},
      {cnt(str(EMB_DIM), "ambient_dim")}
    FROM fit
    """
    return [], tail


def _hubness_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # E124 — k-occurrence hubness profile (Radovanović et al. 2010):
    # N_k(x) = how many OTHER points list x in their top-k.  In high
    # intrinsic dimension N_k skews right — a few hubs appear in
    # "everyone's" neighbor lists and silently dominate kNN label
    # propagation (E47), dedup verdicts (E5), and retrieval (E63).
    # Reports the skewness of N_k (the standard hubness score), the
    # top-hub share, and the anti-hub share (N_k = 0: unreachable
    # points an ANN index will never return).
    #
    # Every point keeps a row via the LEFT JOIN from the id frame —
    # anti-hubs are exactly the points the occurrence rollup misses.
    tail = f"""
    WITH {_ranked_pairs_ctes(d)},
    occ AS (
      SELECT neighbor, CAST(count(*) AS DOUBLE) AS nk
      FROM ranked WHERE rn <= {HUB_K}
      GROUP BY neighbor
    ),
    full_occ AS (
      SELECT e.vec_id, coalesce(o.nk, 0.0) AS nk
      FROM embeddings e LEFT JOIN occ o ON o.neighbor = e.vec_id
    ),
    moments AS (
      SELECT
        CAST(count(*) AS DOUBLE) AS n,
        sum(nk) AS s1, sum(nk * nk) AS s2, sum(nk * nk * nk) AS s3,
        max(nk) AS max_nk,
        sum(CASE WHEN nk = 0.0 THEN 1.0 ELSE 0.0 END) AS n_antihub
      FROM full_occ
    ),
    stat AS (
      SELECT n, max_nk, n_antihub,
        s1 / n AS m1,
        s2 / n - (s1 / n) * (s1 / n) AS var_nk,
        (s3 - 3.0 * (s1 / n) * s2 + 2.0 * n * (s1 / n) * (s1 / n)
         * (s1 / n)) / n AS mu3
      FROM moments
    )
    SELECT
      {cnt("n", "n_points")},
      {cnt(str(HUB_K), "k")},
      {dbl("m1", "mean_k_occurrence")},
      {dbl(
          "CASE WHEN var_nk > 1e-12 "
          "THEN mu3 / (sqrt(var_nk) * sqrt(var_nk) * sqrt(var_nk)) "
          "ELSE 0.0 END",
          "hubness_skew",
      )},
      {dbl("max_nk", "max_k_occurrence")},
      {dbl("CASE WHEN n > 0.0 AND m1 > 0.0 THEN max_nk / (n * m1) "
           "ELSE 0.0 END", "top_hub_share")},
      {dbl("n_antihub / n", "antihub_share")}
    FROM stat
    """
    return [], tail


def _jl_signs() -> list[list[float]]:
    """Deterministic Rademacher ±1 matrix [JL_DIM][EMB_DIM] from md5
    parity — no RNG, identical on every run and machine."""
    signs = []
    for j in range(JL_DIM):
        row = []
        for i in range(EMB_DIM):
            h = hashlib.md5(f"jl#{j}#{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        signs.append(row)
    return signs


def _elem(d: str, i: int) -> str:
    if d == "spark":
        return f"CAST(element_at(embedding, {i}) AS DOUBLE)"
    return f"CAST(embedding[{i}] AS DOUBLE)"


def _jl_norm_sql(d: str) -> str:
    # E125 — Johnson-Lindenstrauss norm-preservation audit: project
    # every vector to JL_DIM dims with a FIXED Rademacher matrix
    # (literal ±1 coefficients, md5-derived in Python so both dialects
    # compile the same constants — the D79 lesson pre-applied) and
    # measure r = ‖Pv‖²/(k·‖v‖²), whose concentration around 1
    # (Achlioptas 2003) is what makes an 8-byte-per-dim sketch usable
    # for E27/E38-style distance work.  Per-label ratio stats flag
    # label clusters whose geometry a k-dim sketch would distort.
    #
    # Scale: map-only — one projection per row from literal
    # coefficients, no joins, no windows; the rollup is ≤|labels| rows.
    signs = _jl_signs()
    es = ",\n        ".join(f"{_elem(d, i + 1)} AS e{i + 1}"
                            for i in range(EMB_DIM))
    projs = []
    for j, row in enumerate(signs):
        terms = " ".join(
            (f"- e{i + 1}" if c < 0 else f"+ e{i + 1}")
            for i, c in enumerate(row)
        )
        projs.append(f"(0.0 {terms}) AS p{j + 1}")
    proj_cols = ",\n        ".join(projs)
    pnorm = " + ".join(f"p{j + 1} * p{j + 1}" for j in range(JL_DIM))
    vnorm = " + ".join(f"e{i + 1} * e{i + 1}" for i in range(EMB_DIM))
    return f"""
    WITH elems AS (
      SELECT vec_id, label,
        {es}
      FROM embeddings
    ),
    proj AS (
      SELECT vec_id, label,
        {proj_cols},
        {vnorm} AS vsq
      FROM elems
    ),
    ratio AS (
      SELECT label,
        CASE WHEN vsq > 1e-12
             THEN round(({pnorm}) / ({JL_DIM}.0 * vsq) + {NUDGE}, 4) + 0.0
             ELSE NULL END AS r
      FROM proj
    )
    SELECT
      label,
      {cnt("count(*)", "n_vectors")},
      {cnt("count(*) - count(r)", "n_zero_vectors")},
      {dbl("avg(r)", "mean_ratio")},
      {dbl("min(r)", "min_ratio")},
      {dbl("max(r)", "max_ratio")},
      {dbl(
          "max(CASE WHEN r > 0.0 THEN abs(ln(r)) ELSE 0.0 END)",
          "max_abs_log_distortion",
      )},
      {dbl("avg(CAST(CASE WHEN r IS NULL THEN NULL "
           "WHEN r >= 0.7 AND r <= 1.3 THEN 1 ELSE 0 END AS DOUBLE))",
           "within_30pct_share")}
    FROM ratio
    GROUP BY label
    ORDER BY label
    """


QUERIES = [
    materialized_backed("intrinsic_dimension_2nn", _twonn_parts,
                        ("embeddings",)),
    materialized_backed("knn_hubness_profile", _hubness_parts,
                        ("embeddings",)),
    sql_backed("jl_norm_preservation", _jl_norm_sql, ("embeddings",)),
]


def _knn_confusion_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # E126 — kNN label-confusion matrix: WHERE does neighbor voting
    # bleed?  E47's knn_label_consistency reports per-label purity (a
    # diagonal-only readout); retrieval/labeling debugging needs the
    # off-diagonal structure — which label pairs actually confuse.
    # From the top-k rank frame: per (anchor label, neighbor label)
    # cell, neighbor share within the anchor label + the lift against
    # the neighbor label's base rate (a cell can be large just because
    # the label is common; lift > 1 is real attraction).
    #
    # The labels ride THROUGH the O(n²) self-join (vec_id is unique, so
    # selecting a.label/b.label here is row-identical to the old
    # join-back of topk against embeddings twice) — that keeps the
    # query at the self-join's 2 scans instead of 4 and drops both
    # label joins.  Same rank window as _ranked_pairs_ctes: rounded
    # distance + vec_id tiebreak, rn <= k next to the window so
    # WindowGroupLimit prunes the per-anchor sort.
    dist = _l2sq(d, "a.embedding", "b.embedding")
    tail = f"""
    WITH scored AS (
      SELECT
        a.label AS anchor_label,
        b.label AS neighbor_label,
        a.vec_id AS anchor,
        b.vec_id AS neighbor,
        round({dist} + {NUDGE}, 4) + 0.0 AS d2
      FROM embeddings a
      JOIN embeddings b ON b.vec_id <> a.vec_id
    ),
    ranked AS (
      SELECT anchor_label, neighbor_label,
        row_number() OVER (
          PARTITION BY anchor ORDER BY d2, neighbor
        ) AS rn
      FROM scored
    ),
    labeled AS (
      SELECT anchor_label, neighbor_label
      FROM ranked WHERE rn <= {HUB_K}
    ),
    cells AS (
      SELECT anchor_label, neighbor_label, count(*) AS n
      FROM labeled GROUP BY anchor_label, neighbor_label
    ),
    margins AS (
      SELECT anchor_label, neighbor_label, n,
        CAST(sum(n) OVER (PARTITION BY anchor_label) AS DOUBLE)
          AS row_tot,
        CAST(sum(n) OVER (PARTITION BY neighbor_label) AS DOUBLE)
          AS col_tot,
        CAST(sum(n) OVER () AS DOUBLE) AS tot
      FROM cells
    )
    SELECT
      CAST(anchor_label AS BIGINT) AS anchor_label,
      CAST(neighbor_label AS BIGINT) AS neighbor_label,
      {cnt("n", "n_votes")},
      {dbl("n / row_tot", "neighbor_share")},
      {dbl("CASE WHEN col_tot > 0.0 "
           "THEN (n / row_tot) / (col_tot / tot) ELSE 0.0 END",
           "lift_vs_base_rate")},
      CAST(anchor_label = neighbor_label AS BOOLEAN) AS is_diagonal
    FROM margins
    ORDER BY anchor_label, neighbor_label
    """
    return [], tail


QUERIES.append(
    materialized_backed("knn_label_confusion", _knn_confusion_parts,
                        ("embeddings",))
)


DUP_THRESHOLD_LADDER = (0.20, 0.25, 0.30, 0.35, 0.40)


def _cosine_curve_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # E128 — cosine dedup-threshold sensitivity curve (the E71 tuning
    # table for the EMBEDDING dedup family: E5 ships ONE threshold;
    # the deployment question is the whole curve): per ladder rung,
    # candidate-pair count and the GREEDY keep-first removal count —
    # distinct vectors appearing as the HIGHER id of a qualifying pair
    # (exactly the docs a keep-lowest-id dedup pass drops, no cluster
    # graph needed).
    #
    # ONE exact pair scan (the E5/E6 small-corpus tool; IVF-blocked at
    # scale) feeds a single multi-distinct agg; the rung table
    # unpivots from that materialized 1-row frame.
    cos = _cos_expr(d, "a.embedding", "b.embedding")
    rung_cols = []
    for i, t in enumerate(DUP_THRESHOLD_LADDER, start=1):
        rung_cols.append(
            f"sum(CASE WHEN cosine >= {t!r} THEN 1.0 ELSE 0.0 END) AS np{i}"
        )
        rung_cols.append(
            f"count(DISTINCT CASE WHEN cosine >= {t!r} THEN vec_b END) "
            f"AS nr{i}"
        )
    sums_sql = f"""
      WITH pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          round({cos} + {NUDGE}, 4) + 0.0 AS cosine
        FROM embeddings a
        JOIN embeddings b ON b.vec_id > a.vec_id
      )
      SELECT
        CAST(count(*) AS DOUBLE) AS n_pairs_total,
        (SELECT CAST(count(*) AS DOUBLE) FROM embeddings) AS n_vecs,
        {", ".join(rung_cols)}
      FROM pairs
    """
    branches = "\n      UNION ALL ".join(
        f"SELECT {t!r} AS threshold, n_pairs_total, n_vecs, "
        f"np{i} AS n_pairs, CAST(nr{i} AS DOUBLE) AS n_removable "
        f"FROM _mz_cc_sums"
        for i, t in enumerate(DUP_THRESHOLD_LADDER, start=1)
    )
    tail = f"""
    WITH rungs AS (
      {branches}
    )
    SELECT
      {dbl("threshold", "threshold")},
      {cnt("n_pairs", "n_candidate_pairs")},
      {dbl("n_pairs / nullif(n_pairs_total, 0.0)", "pair_share")},
      {cnt("n_removable", "n_docs_removable")},
      {dbl("n_removable / nullif(n_vecs, 0.0)", "removal_rate")}
    FROM rungs
    ORDER BY threshold
    """
    return [("_mz_cc_sums", sums_sql)], tail


QUERIES.append(
    materialized_backed("cosine_threshold_curve", _cosine_curve_parts,
                        ("embeddings",))
)
