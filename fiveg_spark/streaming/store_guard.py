"""Shared store-watermark helpers for the foreachBatch sink family
(B15-B24).  Every sink follows the same transactional recipe — append
partials, guard replays by the store's max batch_id, merge on read,
compact preserving the watermark — and every sink used to carry its
own copy of the two lines below; a guard fix now lands once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    )


def is_replay(spark: SparkSession, path: str, batch_id: int) -> bool:
    """True when ``batch_id`` is at or below the store's high-water
    mark — foreachBatch re-delivers a batch with the SAME id after a
    crash, and batch ids are monotonic under one checkpoint.  Reads
    one tiny column."""
    if not has_parquet(path):
        return False
    top = (
        spark.read.parquet(path).agg(F.max("batch_id").alias("m")).head()["m"]
    )
    return top is not None and batch_id <= top
