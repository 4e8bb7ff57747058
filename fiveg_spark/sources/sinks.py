"""Parquet sinks, batch + streaming (SURVEY §2 A5; ref
KafkaKpiPipeline.scala:293-300 — checkpointed parquet partitioned by
slice).

Partitioning by the low-cardinality analysis key (slice) gives
partition-pruned reads downstream; within each partition Spark writes
one file per task, so pair with AQE coalescing (session default) to
avoid small files at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("slice",),
    mode: str = "overwrite",
) -> None:
    """Batch parquet sink partitioned by the analysis key."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: tuple[str, ...],
    n_buckets: int,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: pre-shuffles on the join key so
    repeated joins/aggregations on ``bucket_by`` read co-located data
    with NO exchange (SURVEY §3 'co-located joins via bucketing').

    Bucketed layout only exists for tables (it needs the metastore to
    record bucket spec), hence ``saveAsTable`` rather than a path write.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def streaming_parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = ("slice",),
    output_mode: str = "append",
) -> DataStreamWriter:
    """Checkpointed streaming parquet sink (caller starts it).

    Append output mode + watermark upstream means each window's row is
    written exactly once, after the watermark passes — the reference's
    ``outputMode("append")`` + checkpointLocation layout.
    """
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_by)
        .outputMode(output_mode)
    )
