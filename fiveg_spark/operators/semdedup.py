"""Semantic deduplication over embeddings (SemDeDup, Abbas et al. 2023).

Exact pairwise cosine dedup is O(n²); SemDeDup's observation is that
semantic near-dups land in the SAME k-means cluster, so it suffices to
compare WITHIN clusters: cost drops to O(Σ|cluster|²) — with balanced
clusters, n²/k.  Reuses the IVF building blocks (`operators/ann_ivf.py`):
sampled cosine-k-means fit, broadcast centroids, map-only assignment.

Pair generation is a self-join ON list_id (each side shuffles once on
the cluster key; no broadcast of the corpus); within-cluster pairwise
cosine runs as JVM array HOFs.  At 1e9 vectors, raise N_LISTS so each
cluster's pair count stays bounded — the paper uses k ≈ √n·c.

Keep-policy: within each near-dup pair, drop the larger vec_id (stable
keep-lowest, like the exact-dedup keeper rule).

Rows-only in the contract (k-means is iterative); pytest pins the
semantics: planted exact duplicates are dropped, survivors have no
over-threshold pair inside any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.operators.ann_ivf import assign_lists, fit_centroids
from fiveg_spark.plans.registry import Query
from fiveg_spark.sources.tables import load_table

THRESHOLD = 0.95


def semdedup_pairs(
    spark: SparkSession, emb: DataFrame, threshold: float = THRESHOLD
) -> DataFrame:
    """(keep_id, drop_id, list_id, cosine) for within-cluster pairs with
    cosine ≥ threshold."""
    centroids_bc = spark.sparkContext.broadcast(fit_centroids(spark, emb))
    assigned = assign_lists(emb, centroids_bc).select("vec_id", "list_id")
    return _pairs_within(emb, assigned, threshold)


def _pairs_within(emb: DataFrame, assigned: DataFrame, threshold: float) -> DataFrame:
    e = emb.select("vec_id", "embedding")
    a = assigned.alias("a")
    b = assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.list_id") == F.col("b.list_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("keep_id"),
        F.col("b.vec_id").alias("drop_id"),
        F.col("a.list_id").alias("list_id"),
    )
    ea = e.select(F.col("vec_id").alias("keep_id"), F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("drop_id"), F.col("embedding").alias("emb_b"))
    scored = (
        pairs.join(ea, "keep_id")
        .join(eb, "drop_id")
        .withColumn(
            "cosine",
            F.expr(
                "aggregate(zip_with(CAST(emb_a AS ARRAY<DOUBLE>), CAST(emb_b AS ARRAY<DOUBLE>),"
                " (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
                " / (sqrt(aggregate(CAST(emb_a AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
                " * sqrt(aggregate(CAST(emb_b AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
                " + 1e-12)"
            ),
        )
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        "keep_id",
        "drop_id",
        "list_id",
        F.expr("CAST(round(cosine + 1e-9, 4) + 0.0 AS DOUBLE)").alias("cosine"),
    )


def semdedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract entry: per-cluster dedup accounting — cluster size,
    candidate near-dup pairs, distinct dropped vectors."""
    emb = load_table(spark, "embeddings", sf_dir)
    centroids_bc = spark.sparkContext.broadcast(fit_centroids(spark, emb))
    # r13 opt: the assignment frame is referenced 3× below (both sides
    # of the within-cluster self-join + the cluster-size agg) — left
    # lazy, the scan+broadcast-assign map re-ran per reference (the
    # ledger showed 22 file scans).  (vec_id, list_id) is narrow; at
    # production scale this materialization IS the IVF index build.
    assigned = (
        assign_lists(emb, centroids_bc)
        .select("vec_id", "list_id")
        .localCheckpoint()
    )
    pairs = _pairs_within(emb, assigned, THRESHOLD)
    sizes = assigned.groupBy("list_id").agg(F.count("*").alias("n_vectors"))
    drops = pairs.groupBy("list_id").agg(
        F.count("*").alias("n_dup_pairs"),
        F.countDistinct("drop_id").alias("n_dropped"),
    )
    return (
        sizes.join(drops, "list_id", "left")
        .na.fill(0, ["n_dup_pairs", "n_dropped"])
        .select("list_id", "n_vectors", "n_dup_pairs", "n_dropped")
        .orderBy("list_id")
    )


N_PLANT = 20
_PLANT_OFFSET = 1_000_000


def semdedup_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract entry (tolerance-boolean oracle): the planted-duplicate
    pytest lifted to driver scale.  The corpus has no natural ≥ 0.95
    pairs (within-label p99 cosine ≈ 0.295), so certifying on the raw
    table would be vacuous (0 == 0).  Instead BOTH engines plant exact
    copies of the first {N_PLANT} vectors (deterministic id offset) and
    the row certifies the paper's actual claim — strong dups co-cluster,
    so within-cluster comparison finds EXACTLY the exact-dup pair set:

      n_exact_pairs     exact all-pairs count at ≥ 0.95 (the anchor;
                        cheap at certification scale, and the thing
                        SemDeDup exists to avoid at production scale)
      n_semdedup_pairs  what within-cluster comparison found
      planted_recall_ok every planted (i, i+offset) pair recovered
      matches_exact_ok  found set size == exact set size
    """
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "label", "embedding")
    planted = emb.filter(F.col("vec_id") < N_PLANT).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"), "label", "embedding"
    )
    # r13 opt: materialize the planted union once (it feeds the k-means
    # fit, the assignment, both exact-pair sides and the count — ~6
    # rescans of the union when lazy) and the within-cluster pair set
    # (referenced by the planted filter + its own count).
    corpus = emb.unionByName(planted).localCheckpoint()
    pairs = semdedup_pairs(spark, corpus, THRESHOLD).localCheckpoint()
    planted_found = pairs.filter(
        (F.col("drop_id") == F.col("keep_id") + _PLANT_OFFSET)
        & (F.col("keep_id") < N_PLANT)
    )
    e = corpus.selectExpr("vec_id AS ida", "CAST(embedding AS ARRAY<DOUBLE>) AS va")
    f = corpus.selectExpr("vec_id AS idb", "CAST(embedding AS ARRAY<DOUBLE>) AS vb")
    cos = (
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        " / (sqrt(aggregate(va, 0D, (acc, x) -> acc + x * x))"
        " * sqrt(aggregate(vb, 0D, (acc, x) -> acc + x * x)) + 1e-12)"
    )
    exact = (
        e.join(f, F.col("ida") < F.col("idb"))
        .withColumn("c", F.expr(cos))
        .filter(F.col("c") >= THRESHOLD)
    )
    return (
        corpus.agg(F.count("*").alias("n_vectors"))
        .crossJoin(exact.agg(F.count("*").alias("n_exact_pairs")))
        .crossJoin(pairs.agg(F.count("*").alias("n_semdedup_pairs")))
        .crossJoin(planted_found.agg(F.count("*").alias("n_planted_found")))
        .select(
            "n_vectors",
            F.lit(N_PLANT).cast("long").alias("n_planted"),
            "n_exact_pairs",
            "n_semdedup_pairs",
            (F.col("n_planted_found") == N_PLANT).alias("planted_recall_ok"),
            (F.col("n_semdedup_pairs") == F.col("n_exact_pairs")).alias(
                "matches_exact_ok"
            ),
        )
    )


def _semdedup_oracle() -> str:
    return f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + {_PLANT_OFFSET}, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id < {N_PLANT}
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v)) + 1e-12) >= {THRESHOLD}
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_vectors,
      CAST({N_PLANT} AS BIGINT) AS n_planted,
      n_exact_pairs,
      n_exact_pairs AS n_semdedup_pairs,
      TRUE AS planted_recall_ok,
      TRUE AS matches_exact_ok
    FROM exact
    """


QUERIES = [
    # tolerance-boolean oracle over a deterministic planted-duplicate
    # corpus — certifies strong-dup recall AND exact-set equality at
    # driver scale; the per-cluster accounting (semdedup_summary) stays
    # available for tests/users but is k-means-id-specific, so the
    # certified surface is this global row.
    Query("semdedup_summary", semdedup_certified, _semdedup_oracle()),
]
