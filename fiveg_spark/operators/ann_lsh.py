"""LSH-bucketed approximate nearest neighbours (SURVEY §2 E7).

Random-hyperplane (cosine) LSH: vectors hash to an n-bit signature via
the signs of dot products with deterministic seeded hyperplanes; each of
L independent tables blocks the candidate space to same-bucket vectors,
then exact cosine runs only on candidates.

Scale shape (1e9+ vectors):
  - bucketing is map-only (one numpy matmul per Arrow batch against the
    broadcast plane matrix — (batch × dim) @ (dim × L·bits));
  - the candidate join is a broadcast of the query's L bucket ids;
  - exact re-ranking touches only the candidate set: the full-scan
    cosine (knn_bruteforce) is the fallback, this is the pruned path.

Rows-only in the contract; pytest measures recall against the exact
brute-force top-k and checks bucket determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fiveg_spark.plans.registry import Query
from fiveg_spark.sources.tables import load_table

# bits/tables trade off recall vs candidate-set size: collision prob per
# table is p^bits with p = 1 - θ/π.  The synthetic corpus's true
# neighbours sit near cosine 0.3 (p ≈ 0.6), so 4 bits × 16 tables gives
# ~0.89 recall; denser corpora (p ≈ 0.9) would use 12-16 bits.  At 1e9+
# vectors raise N_BITS so buckets stay small — both are tuning knobs.
N_BITS = 4
N_TABLES = 16
DIM = 64
SEED = 7


def hyperplanes(seed: int = SEED, dim: int = DIM) -> np.ndarray:
    """(L·bits × dim) deterministic Gaussian hyperplanes."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((N_TABLES * N_BITS, dim)).astype(np.float64)


_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)


def bucketize(embeddings: DataFrame, planes_bc) -> DataFrame:
    """Map-only: one row per (vector, table) with its bucket id."""

    def assign(batches):
        P = planes_bc.value  # (L*bits, dim)
        weights = 1 << np.arange(N_BITS - 1, -1, -1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            signs = (X @ P.T) > 0  # (n, L*bits)
            out = []
            for t in range(N_TABLES):
                chunk = signs[:, t * N_BITS : (t + 1) * N_BITS]
                buckets = (chunk * weights).sum(axis=1).astype(np.int32)
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].values,
                            "label": pdf["label"].values,
                            "table": t,
                            "bucket": buckets,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return embeddings.mapInPandas(assign, schema=_BUCKET_SCHEMA)


def ann_lsh(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k by cosine among LSH candidates of the query vector."""
    emb = load_table(spark, "embeddings", sf_dir)
    planes_bc = spark.sparkContext.broadcast(hyperplanes())
    # localCheckpoint: the probe side derives from buckets, so without
    # materialization the hash pipeline (scan + Arrow hyperplane batch)
    # re-executes for BOTH sides of the self-join (advisor repeated-scan)
    buckets = bucketize(emb, planes_bc).localCheckpoint()

    # Rename the probe side before the self-join: q_buckets derives from
    # buckets, so an unrenamed `table == table` resolves to one attribute
    # (trivially true) and the per-table pruning silently disappears.
    q_buckets = buckets.filter(F.col("vec_id") == query_vec_id).select(
        F.col("table").alias("q_table"), F.col("bucket").alias("q_bucket")
    )
    candidates = (
        buckets.join(
            F.broadcast(q_buckets),
            (F.col("table") == F.col("q_table"))
            & (F.col("bucket") == F.col("q_bucket")),
        )
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )

    cos = (
        "aggregate(zip_with(CAST(e.embedding AS ARRAY<DOUBLE>), "
        "CAST(q.embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        " / (sqrt(aggregate(CAST(e.embedding AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
        " * sqrt(aggregate(CAST(q.embedding AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))"
        " + 1e-12)"
    )
    emb.createOrReplaceTempView("emb_ann")
    candidates.createOrReplaceTempView("ann_candidates")
    scored = spark.sql(
        f"""
        WITH q AS (SELECT embedding FROM emb_ann WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label,
               CAST(round({cos} + 1e-9, 4) + 0.0 AS DOUBLE) AS cosine
        FROM emb_ann e
        JOIN ann_candidates c ON e.vec_id = c.vec_id
        CROSS JOIN q
        """
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition heap +
    # driver merge of k rows) — no single-partition window shuffle.
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


# contract surface moved to ann_recall.py (ann_lsh_recall): the raw
# top-k is not SQL-expressible (hyperplane bucketing is a numpy
# kernel), so the driver certifies the recall row instead; the top-k
# itself stays pinned by the recall-vs-bruteforce pytest.
QUERIES: list[Query] = []
