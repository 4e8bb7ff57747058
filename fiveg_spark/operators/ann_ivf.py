"""IVF (inverted-file) approximate nearest neighbours (SURVEY §2 E20).

The other standard ANN scale path next to hyperplane LSH
(`operators/ann_lsh.py`): partition the vector space with k-means
centroids, index each vector under its nearest centroid (the "inverted
list"), and probe only the `nprobe` lists closest to the query.

Scale shape (1e9+ vectors):
  - centroid fit runs on a SAMPLE (MLlib KMeans; centroids are tiny and
    broadcast everywhere after);
  - list assignment is map-only (one argmin over k centroids per vector,
    vectorized per Arrow batch);
  - the probe prunes the scan to ~nprobe/k of the corpus BEFORE any
    exact distance work — the candidate fraction is tunable, unlike
    LSH's collision-probability knob;
  - exact cosine re-rank only on the probed lists, then TakeOrdered k.

Rows-only in the contract (k-means fit is iterative, not SQL); pytest
checks recall vs brute force and that assignment ≡ numpy argmin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fiveg_spark.plans.registry import Query
from fiveg_spark.sources.tables import load_table

N_LISTS = 16
# nprobe trades recall for scan fraction: on this corpus 6/16 lists ≈ 36%
# of vectors scanned for ~0.9 top-10 recall (2 lists → 11% scan, 0.2-0.6
# recall).  At 1e9 vectors raise N_LISTS (√n is the usual rule) so each
# probe stays small.
N_PROBE = 6
SEED = 11

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("list_id", T.IntegerType()),
    ]
)


def fit_centroids(spark: SparkSession, emb: DataFrame) -> np.ndarray:
    """(N_LISTS × dim) k-means centroids via MLlib on (a sample of) the
    corpus.  At 1e9 vectors, `emb` would be `.sample(0.001)` — the
    centroid quality barely moves, the fit cost drops 1000×."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # L2-normalize first: with unit vectors, euclidean k-means lists align
    # with cosine neighbourhoods (spherical-kmeans approximation) — unnormalized
    # IVF over cosine queries probes the wrong lists.
    norm = (
        "sqrt(aggregate(CAST(embedding AS ARRAY<DOUBLE>), 0D,"
        " (acc, x) -> acc + x * x)) + 1e-12"
    )
    unit = F.expr(
        f"transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x / ({norm}))"
    )
    vecs = emb.select(array_to_vector(unit).alias("features"))
    # cosine k-means: euclidean k-means|| on this corpus collapses into
    # wildly imbalanced lists (sizes 2..76 of 500) and ~0.3 recall
    model = KMeans(k=N_LISTS, seed=SEED, maxIter=25, distanceMeasure="cosine").fit(vecs)
    C = np.stack([np.asarray(c) for c in model.clusterCenters()])
    # unit-normalize centroids so euclidean argmin over unit vectors is
    # exactly cosine argmax in assignment and probing
    return C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)


def assign_lists(emb: DataFrame, centroids_bc) -> DataFrame:
    """Map-only nearest-centroid assignment, one matmul per Arrow batch
    (the n_assign=1 case of the multi-probe kernel — one copy of the
    normalize/argmin discipline to keep in sync)."""
    return assign_lists_multi(emb, centroids_bc, n_assign=1)


def assign_lists_multi(emb: DataFrame, centroids_bc, n_assign: int = 2) -> DataFrame:
    """Map-only assignment to the ``n_assign`` NEAREST centroids (multi-
    probe indexing): a vector sitting on a cluster boundary lands in both
    neighbouring lists, so near-dup pairs that straddle the boundary
    still share a block.  Output (vec_id, label, list_id), n_assign rows
    per vector."""

    def assign(batches):
        C = centroids_bc.value  # (k, dim)
        c_norms = (C**2).sum(axis=1)
        k = len(C)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
            # argmin ||x - c||² = argmin (||c||² - 2x·c)
            d2 = c_norms[None, :] - 2.0 * (X @ C.T)
            n_keep = min(n_assign, k)  # guard: can't probe more lists than exist
            top = np.argsort(d2, axis=1)[:, :n_keep]  # (n, n_keep)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].values, n_keep),
                    "label": np.repeat(pdf["label"].values, n_keep),
                    "list_id": top.reshape(-1).astype(np.int32),
                }
            )

    return emb.mapInPandas(assign, schema=_ASSIGN_SCHEMA)


def ann_ivf(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k by cosine among the nprobe nearest inverted lists."""
    emb = load_table(spark, "embeddings", sf_dir)
    centroids = fit_centroids(spark, emb)
    centroids_bc = spark.sparkContext.broadcast(centroids)
    assigned = assign_lists(emb, centroids_bc)

    # nprobe lists nearest to the QUERY VECTOR (driver-side: k×dim floats)
    q_emb = np.asarray(
        emb.filter(F.col("vec_id") == query_vec_id).select("embedding").head()[0],
        dtype=np.float64,
    )
    q_emb = q_emb / (np.linalg.norm(q_emb) + 1e-12)
    d2 = (centroids**2).sum(axis=1) - 2.0 * (centroids @ q_emb)
    probe_lists = [int(i) for i in np.argsort(d2)[:N_PROBE]]

    candidates = assigned.filter(
        F.col("list_id").isin(probe_lists) & (F.col("vec_id") != query_vec_id)
    ).select("vec_id")

    cos = (
        "aggregate(zip_with(CAST(e.embedding AS ARRAY<DOUBLE>), "
        "CAST(q.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        " / (sqrt(aggregate(CAST(e.embedding AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
        " * sqrt(aggregate(CAST(q.embedding AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
        " + 1e-12)"
    )
    emb.createOrReplaceTempView("emb_ivf")
    candidates.createOrReplaceTempView("ivf_candidates")
    scored = spark.sql(
        f"""
        WITH q AS (SELECT embedding FROM emb_ivf WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label,
               CAST(round({cos} + 1e-9, 4) + 0.0 AS DOUBLE) AS cosine
        FROM emb_ivf e
        JOIN ivf_candidates c ON e.vec_id = c.vec_id
        CROSS JOIN q
        """
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


# contract surface moved to ann_recall.py (ann_ivf_recall): the
# iterative k-means fit is not SQL-expressible, so the driver certifies
# the recall row; the top-k stays pinned by the recall-vs-bruteforce +
# argmin-parity pytests.
QUERIES: list[Query] = []


def save_centroids(spark: SparkSession, centroids: np.ndarray, path: str) -> None:
    """Persist fitted IVF centroids as parquet (list_id, vector) — the
    index half a SERVING deployment reloads instead of refitting: the
    k-means fit samples the corpus (expensive at 100 TB), the centroids
    are N_LISTS × dim doubles (KBs).  Pairs with ml/train.py's D23
    weight persistence: every fitted artifact in the engine round-trips
    through the lake, bit-exact."""
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(rows, "list_id int, centroid array<double>").write.mode(
        "overwrite"
    ).parquet(path)


def load_centroids(spark: SparkSession, path: str) -> np.ndarray:
    """Reload persisted centroids in list_id order, bit-exact."""
    rows = spark.read.parquet(path).orderBy("list_id").collect()
    return np.asarray([r["centroid"] for r in rows], dtype=np.float64)
