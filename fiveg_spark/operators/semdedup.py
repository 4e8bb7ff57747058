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
    assigned = assign_lists(emb, centroids_bc).select("vec_id", "list_id")
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


QUERIES = [
    # rows-only: iterative k-means fit is not SQL-expressible (strong
    # check = planted-duplicate pytest below)
    Query("semdedup_summary", semdedup_summary, None),
]
