"""Inverted-index (postings-list) artifact for lexical retrieval
(SURVEY §2 A17): the physical index behind E64's BM25 scoring, the
lexical sibling of the persisted IVF centroids (D23/E20).

Layout under ``<path>/``:
  postings/  one row per term: (term, df, postings ARRAY<STRUCT<doc_id,
             tf>> sorted by doc_id) — range-partitioned AND sorted by
             term, so a term lookup prunes to one file and its row
             groups (min/max term statistics), never a full scan;
  doclens/   (doc_id, dl) — the BM25 length normalizer;
  stats/     a single row (n_docs, avgdl).

Queries then score WITHOUT touching the corpus: posting rows for the
query's terms (a pushed-down IN filter over the term-sorted files)
explode back to (doc_id, tf) and join the tiny doclens side.  At
100 TB the corpus is cold storage and THIS artifact is what serving
reads — the same asymmetry as the sketch store.

`bm25_from_postings` must reproduce the certified corpus-scan
`bm25_retrieval` row-for-row (pytest-asserted) — the index is a layout
change, not a semantics change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_postings(spark: SparkSession, docs: DataFrame, path: str,
                   n_files: int = 4) -> None:
    """Build the postings artifact from a documents frame."""
    # tokenization must match the certified BM25 chain EXACTLY
    # (text._tok = split(lower(text), ' +'), NO trim): a trim here
    # changed dl/avgdl on edge-whitespace docs and silently broke the
    # row-for-row index-vs-scan parity contract (r7 self-review)
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " +")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    postings = (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf"))
            ).alias("postings"),
        )
        .repartitionByRange(n_files, "term")
        .sortWithinPartitions("term")
    )
    postings.write.mode("overwrite").parquet(f"{path}/postings")

    doclens = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")
    doclens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).write.mode("overwrite").parquet(f"{path}/stats")


def lookup_terms(spark: SparkSession, path: str, terms: list[str]) -> DataFrame:
    """Posting rows for a term set — the IN filter pushes to the
    term-sorted parquet (row-group min/max pruning)."""
    return spark.read.parquet(f"{path}/postings").filter(
        F.col("term").isin(list(terms))
    )


def bm25_from_postings(
    spark: SparkSession,
    path: str,
    queries: tuple[tuple[str, tuple[str, ...]], ...],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 5,
) -> DataFrame:
    """BM25 top-k per query scored from the index alone (no corpus
    access).  Same formula, rounding, and tie rules as the certified
    corpus-scan query (operators/text.py:_bm25_parts)."""
    from pyspark.sql.window import Window

    qrows = [(qid, t) for qid, ts in queries for t in ts]
    qterms = spark.createDataFrame(qrows, "query_id STRING, term STRING")
    stats = spark.read.parquet(f"{path}/stats")
    hits = (
        lookup_terms(spark, path, sorted({t for _, t in qrows}))
        .join(F.broadcast(qterms), "term")
        .select(
            "query_id", "term", "df", F.explode("postings").alias("p")
        )
        .select("query_id", "term", "df", F.col("p.doc_id").alias("doc_id"),
                F.col("p.tf").alias("tf"))
        .join(spark.read.parquet(f"{path}/doclens"), "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    scored = hits.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        (
            F.round(
                F.sum(
                    F.log(
                        1.0
                        + (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    )
                    * F.col("tf")
                    * (k1 + 1.0)
                    / (
                        F.col("tf")
                        + k1
                        * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                    )
                )
                + 1e-9,
                4,
            )
            + 0.0
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select(
            "query_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_terms_matched").cast("long").alias("n_terms_matched"),
            F.col("score").cast("double").alias("bm25"),
        )
        .orderBy("query_id", "rnk")
    )
