"""Driver-certified ANN recall matrix (SURVEY §2 E45).

The ANN ladder (E7 LSH → E20 IVF → E38 PQ → D12 MLlib BRP) returns
approximate top-k lists that no SQL oracle can reproduce — those
queries stay rows-only, pinned by recall-vs-bruteforce pytests at
sf0.001.  This query lifts that evidence to DRIVER scale: it runs
every ANN method AND the exact brute-force top-k in one plan, computes
each method's recall against the exact id set, and emits one row per
method with the tolerance-boolean the driver can hash-certify
(the approx_variants pattern: Spark checks ITS OWN approximation, the
oracle states the invariant).

recall_ok threshold = 0.5, the same bound the pytests enforce; measured
recalls on this corpus are 0.6-1.0 across methods and scale factors, so
a regression below the bound is a real quality break, not noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.plans.registry import Query

K = 10
RECALL_FLOOR = 0.5


def ann_recall_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fiveg_spark.ml.mllib_models import QUERIES as _MLLIB_QUERIES
    from fiveg_spark.operators.ann_ivf import ann_ivf
    from fiveg_spark.operators.ann_lsh import ann_lsh
    from fiveg_spark.operators.ann_pq import ann_pq
    from fiveg_spark.operators.similarity import _knn_sql
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("embeddings",), sf_dir)
    exact = spark.sql(_knn_sql("spark")).select("vec_id")

    mllib_ann = next(q.run for q in _MLLIB_QUERIES if q.name == "mllib_ann_topk")
    methods = {
        "ivf": ann_ivf,
        "lsh": ann_lsh,
        "mllib_brp": mllib_ann,
        "pq": ann_pq,
    }
    summaries = []
    for name, fn in methods.items():
        approx = fn(spark, sf_dir).select("vec_id")
        hits = approx.join(F.broadcast(exact), "vec_id")
        summaries.append(
            approx.agg(
                F.lit(name).alias("method"),
                F.lit(K).cast("long").alias("k"),
                F.count("*").alias("n_returned"),
            ).crossJoin(hits.agg(F.count("*").alias("n_hits")))
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.select(
        "method",
        "k",
        "n_returned",
        (F.col("n_hits") / F.col("k") >= RECALL_FLOOR).alias("recall_ok"),
    ).orderBy("method")


_ANN_RECALL_ORACLE = f"""
SELECT * FROM (VALUES
  ('ivf', CAST({K} AS BIGINT), CAST({K} AS BIGINT), TRUE),
  ('lsh', CAST({K} AS BIGINT), CAST({K} AS BIGINT), TRUE),
  ('mllib_brp', CAST({K} AS BIGINT), CAST({K} AS BIGINT), TRUE),
  ('pq', CAST({K} AS BIGINT), CAST({K} AS BIGINT), TRUE)
) AS t(method, k, n_returned, recall_ok)
ORDER BY method
"""

QUERIES = [
    Query("ann_recall_matrix", ann_recall_matrix, _ANN_RECALL_ORACLE),
]
