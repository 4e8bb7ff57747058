"""Streaming state-store inspection (SURVEY §2 B37): Spark 4's
``statestore`` / ``state-metadata`` DataFrame readers wrapped as the
operational surface every production stream needs — "what state is my
query carrying, is it skewed, is it leaking?" answered with ordinary
DataFrame queries against the CHECKPOINT, no debugger and no code in
the streaming job itself.

The readers are first-class sources (SPARK-45511), so everything here
is one `spark.read.format(...)` plus plain relational ops:

- ``state_metadata``: the stateful operators in a checkpoint and their
  committed batch range — the entry point (which operatorId to read).
- ``read_operator_state``: the flattened (key..., value..., partition)
  frame for one operator at the latest (or a pinned) batch — the
  running aggregates / dedup sets / join buffers themselves.
- ``state_health``: per-partition row counts + the max/mean skew ratio
  — the "one hot key is eating a partition" and "state grows without
  bound" early-warning numbers.

Scale: the readers scan only the checkpoint's state files (columnar,
per-partition); nothing touches the source tables.  Reading state N
partitions wide is an N-task scan — at production state sizes this is
exactly the debugging path Spark ships it for.

Reference scope: beyond-reference operational surface (the reference's
streaming job, KafkaKpiPipeline.scala, exposes no state at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Stateful operators committed in ``checkpoint``: operatorId/name,
    store name, partition count, [minBatchId, maxBatchId]."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_operator_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """The state rows of one operator, keys and values flattened to
    top-level columns (``key``/``value`` struct fields keep their
    engine-assigned names; callers alias positionally for stable
    schemas).  ``batch_id`` pins a historical snapshot — state time
    travel — and defaults to the latest committed batch."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    st = reader.load(checkpoint)
    return st.select("key.*", "value.*", "partition_id")


def state_health(
    spark: SparkSession, checkpoint: str, operator_id: int = 0,
) -> DataFrame:
    """Per-partition state census + skew: (partition_id, n_rows) rows
    plus max/mean ratio computed over the bounded per-partition frame
    (#partitions rows — a config constant, never data volume)."""
    st = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .load(checkpoint)
    )
    from pyspark.sql import Window

    per_part = st.groupBy("partition_id").agg(
        F.count("*").alias("n_rows")
    )
    # global window over the #partitions-row frame (bounded by config)
    w = Window.partitionBy()
    return per_part.select(
        "partition_id",
        "n_rows",
        (F.max("n_rows").over(w) / F.avg("n_rows").over(w)).alias(
            "skew_ratio"
        ),
    ).orderBy("partition_id")
