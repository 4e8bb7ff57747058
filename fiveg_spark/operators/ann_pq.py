"""Product-quantization ANN with asymmetric distance (SURVEY §2 E38).

The third standard ANN scale path next to hyperplane LSH (`ann_lsh.py`)
and IVF (`ann_ivf.py`): compress each vector to M sub-space codebook
codes (Jégou et al. 2011, "Product quantization for nearest neighbor
search").  Where IVF prunes WHICH vectors to scan, PQ shrinks WHAT a
scan reads: M bytes per vector instead of 4·dim — at 1e9 vectors the
code table is ~16 GB instead of ~1.5 TB, so the whole index fits in
cluster memory.

Scale shape:
  - codebooks fit on a driver-side SAMPLE (M tiny Lloyd k-means over
    dim/M-dimensional sub-vectors; codebooks are KB-sized, broadcast);
  - encoding is map-only (argmin per sub-space, vectorized per Arrow
    batch);
  - a query builds an (M × k) lookup table of sub-distances ONCE, then
    every vector scores with M table lookups + a sum (ADC — no float
    vector is ever touched);
  - top-(4k) ADC candidates re-rank by exact cosine on the full
    vectors (one broadcast-semi-join back to the corpus).

Rows-only in the contract (iterative k-means); pytest pins encoding
≡ numpy argmin and ADC recall vs brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fiveg_spark.plans.registry import Query
from fiveg_spark.sources.tables import load_table

# the canonical PQ setting (Jégou 2011): 8 sub-spaces × 8-bit codebooks
# = 8 bytes/vector.  K clamps to the fit-sample size on tiny corpora.
M_SUBSPACES = 8
K_CODES = 256
SEED = 23
LLOYD_ITERS = 12


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)


def _lloyd(X: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Plain deterministic Lloyd k-means (numpy, driver-side sample)."""
    k = min(k, len(X))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(LLOYD_ITERS):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def fit_codebooks(sample: np.ndarray) -> np.ndarray:
    """(M, K_CODES, dim/M) codebooks from an L2-normalized sample."""
    X = _normalize(sample.astype(np.float64))
    subs = np.array_split(X, M_SUBSPACES, axis=1)
    return np.stack([_lloyd(s, K_CODES, SEED + m) for m, s in enumerate(subs)])


def encode(emb: DataFrame, codebooks_bc) -> DataFrame:
    """Map-only PQ encoding: vec_id → M codebook codes."""

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def enc(batches):
        CB = codebooks_bc.value  # (M, k, sub_dim)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _normalize(
                np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            )
            subs = np.array_split(X, M_SUBSPACES, axis=1)
            codes = np.stack(
                [
                    ((s[:, None, :] - CB[m][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
                    for m, s in enumerate(subs)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "codes": list(codes.astype(np.int32))}
            )

    return emb.mapInPandas(enc, schema=out_schema)


def adc_scores(codes_df: DataFrame, lut_bc) -> DataFrame:
    """Approx squared distance per vector: M lookups + a sum."""

    def score(batches):
        L = lut_bc.value  # (M, k)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["codes"].values)  # (n, M)
            d = L[np.arange(M_SUBSPACES)[None, :], C].sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "adc_d2": d})

    return codes_df.mapInPandas(score, schema="vec_id LONG, adc_d2 DOUBLE")


def pq_query_adc(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0
) -> DataFrame:
    """THE shared fit→encode→query-LUT pipeline: sampled codebook fit,
    corpus encode, ADC scores against the query vector (query row
    excluded).  ann_pq's rerank and the E107 shortlist ladder BOTH
    read this, so a sampling/seed/normalization change moves the
    certified method and its ladder together (the r8 DRY doctrine —
    a forked copy here would let the ladder silently measure a
    different index than the E38-certified method)."""
    emb = load_table(spark, "embeddings", sf_dir)
    # sampled codebook fit — at 1e9 vectors this is .sample(1e-4)
    sample = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.select("embedding").limit(2000).collect()
        ]
    )
    codebooks = fit_codebooks(sample)
    cb_bc = spark.sparkContext.broadcast(codebooks)
    codes = encode(emb, cb_bc)

    q = _normalize(
        np.asarray(
            emb.filter(F.col("vec_id") == query_vec_id).select("embedding").head()[0],
            dtype=np.float64,
        )[None, :]
    )[0]
    q_subs = np.array_split(q, M_SUBSPACES)
    lut = np.stack(
        [((codebooks[m] - q_subs[m][None, :]) ** 2).sum(axis=1) for m in range(M_SUBSPACES)]
    )
    lut_bc = spark.sparkContext.broadcast(lut)
    return adc_scores(codes.filter(F.col("vec_id") != query_vec_id), lut_bc)


def ann_pq(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cand = (
        pq_query_adc(spark, sf_dir, query_vec_id)
        .orderBy(F.asc("adc_d2"), F.asc("vec_id"))
        .limit(4 * k)
    )

    cos = (
        "aggregate(zip_with(CAST(e.embedding AS ARRAY<DOUBLE>), "
        "CAST(q.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        " / (sqrt(aggregate(CAST(e.embedding AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
        " * sqrt(aggregate(CAST(q.embedding AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
        " + 1e-12)"
    )
    emb.createOrReplaceTempView("emb_pq")
    cand.createOrReplaceTempView("pq_candidates")
    scored = spark.sql(
        f"""
        WITH q AS (SELECT embedding FROM emb_pq WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label,
               CAST(round({cos} + 1e-9, 4) + 0.0 AS DOUBLE) AS cosine
        FROM emb_pq e
        JOIN pq_candidates c ON e.vec_id = c.vec_id
        CROSS JOIN q
        """
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


# contract surface moved to ann_recall.py (ann_pq_recall): the
# iterative k-means codebook fit is not SQL-expressible, so the driver
# certifies the recall row; the top-k stays pinned by the
# encoding-parity + recall pytests.
QUERIES: list[Query] = []
