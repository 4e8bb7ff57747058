"""Mergeable-sketch rollups (SURVEY §2 C32).

The 100 TB pattern for COUNT(DISTINCT) rollups: aggregate once into
per-(fine-grain) Datasketches HLL sketches, then merge sketches upward —
re-aggregation without rescanning the fact table, and sketch columns can
be persisted in a rollup table and unioned incrementally as new
partitions land (the classic "distinct users per day → per month"
hypertable rollup).  Exact distincts are carried alongside here so the
contract and tests can bound the estimation error.

Rows-only in the contract (DuckDB has no compatible HLL); pytest bounds
the relative error at the default lgConfigK=12 (<~2% typical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.plans.registry import Query
from fiveg_spark.sources.tables import load_table


def hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user sketches per event_type, merged to per-type totals."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n"),
    )
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_events",
            "approx_users",
            "exact_users",
            F.round(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users"),
                4,
            ).alias("rel_err"),
        )
    )


def heavy_hitters(
    spark: SparkSession, sf_dir: str, k: int = 20, capacity: int = 64
) -> DataFrame:
    """E37 — Misra-Gries heavy hitters over document tokens, the
    bounded-memory alternative to a full term-count shuffle.

    Each partition keeps at most ``capacity`` counters (classic MG:
    decrement-all when full); per-partition summaries MERGE by summing
    counts, and the guarantee survives the merge:

        est ≤ true ≤ est + Σ_p dec_p

    (dec_p = decrement rounds in partition p).  Only the tiny summaries
    shuffle — at 100 TB the full-fidelity groupBy moves the whole token
    multiset, this moves capacity × n_partitions rows.  Exact counts for
    the reported terms ride along (broadcast semi-join) so the contract
    row itself shows the bound holding."""
    import pandas as pd

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(F.split(F.lower("text"), " +")).alias("term"))

    def mg(batches):
        counters: dict[str, int] = {}
        dec = 0
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    dec += 1
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        # marker row (term="") carries this partition's decrement count,
        # so the global bound includes partitions where a term died out.
        yield pd.DataFrame(
            {
                "term": list(counters) + [""],
                "est": list(counters.values()) + [0],
                "dec": [0] * len(counters) + [dec],
            }
        )

    summaries = toks.mapInPandas(
        mg, schema="term STRING, est LONG, dec LONG"
    ).cache()
    total_err = summaries.agg(F.sum("dec").alias("max_err"))
    top = (
        summaries.filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.sum("est").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("term"))
        .limit(k)
    )
    exact = (
        toks.join(F.broadcast(top.select("term")), "term")
        .groupBy("term")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        top.join(exact, "term")
        .crossJoin(F.broadcast(total_err))
        .select("term", "est_count", "exact_count", "max_err")
        .orderBy(F.desc("est_count"), F.asc("term"))
    )


QUERIES = [
    # rows-only: Datasketches HLL binary format has no DuckDB twin; the
    # in-row exact_users/rel_err columns self-document the error bound.
    Query("hll_rollup_users", hll_rollup, None),
    # rows-only: the sketch is stateful per-partition Python; in-row
    # exact_count self-documents est ≤ exact ≤ est + max_err.
    Query("heavy_hitters", heavy_hitters, None),
]
