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


def write_format(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Format-agnostic batch sink (parquet/orc/json/csv — every format
    Spark ships without extra jars).  ORC matters for interop with
    Hive-era warehouses: columnar + predicate pushdown + partition
    pruning behave like parquet; JSON/CSV are interchange-only (no
    stats, no pruning beyond partitions) and belong at the edges of a
    pipeline, never in the hot path."""
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_format(spark, path: str, fmt: str = "parquet", schema=None):
    """Companion reader; pass the writer's schema for the text formats
    (JSON/CSV carry no types — schema-on-read keeps the round trip
    lossless and skips the inference scan)."""
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


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


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: tuple[str, ...],
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Sorted-within-file parquet for DATA SKIPPING: clustering rows by
    the dominant filter keys makes parquet row-group min/max stats
    selective, so later scans skip whole row groups the predicate can't
    match (the poor man's z-order; for one-dimensional range filters it
    IS the optimal layout).  `sortWithinPartitions` keeps the sort local
    — no global sort shuffle."""
    out = df.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_by: tuple[str, ...] = (),
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~target_file_mb files (the maintenance job every long-lived ingest
    directory needs — streaming sinks and incremental backfills strew
    small files, and at 100 TB file-open overhead + lost row-group
    locality dominate scan time).  Returns the new file count.

    Sizing reads the directory footprint from the filesystem, not a
    count() pass.  Writes to a sibling temp dir then swaps, so a crash
    mid-compact never leaves the directory half-rewritten."""
    import math
    import os
    import shutil

    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


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
