"""Row-level CDC apply — SCD-1 merge with deletes over a bucketed
parquet store (SURVEY §2 A35): the MERGE INTO surface Delta/Iceberg
provide, rebuilt Spark-first for plain parquet (the reference writes
bare parquet with no merge path at all, train.py:49-56; the A8 upsert
sink merges at PARTITION grain — this is the complementary ROW grain).

Model: the base table lives bucketed by key — ``bucket=K/`` dirs, K =
``pmod(hash(key), n_buckets)`` (Spark's own hash, so bucket routing is
engine-native and stable).  A changelog batch carries (key, seq, op,
payload) rows, op ∈ {'I','U','D'} with a total per-key order on seq.
Applying a batch:

  1. reduce the batch to ONE winner per key (max seq — last writer
     wins; the winner's op decides insert/update vs delete);
  2. route winners to buckets; ONLY the touched buckets are read back
     (merge cost is O(batch + touched-bucket bytes), independent of
     table size — the merge-on-write recipe every lakehouse uses);
  3. per touched bucket: survivors = base rows whose key has no
     winner, plus winners with op != 'D'; rewrite the bucket dir
     atomically (write to ``_tmp``, swap).

Idempotence on replay is structural: re-applying a batch routes the
same winners to the same buckets and rewrites them to the same
content (deterministic union + the same last-writer reduction), so a
crash/retry between apply and checkpoint advances no duplicate state.

At 100 TB: buckets shard the rewrite so one batch touches a bounded
slice of the store; the winner reduction and the join are keyed on
``key`` (one shuffle each at batch scale, never table scale); the
read-back is a file-source scan of only the touched bucket dirs with
ordinary column pruning.

Schema discipline: the store holds payload columns + ``key``; ``seq``
is retained as ``_cdc_seq`` so late replays of an OLDER batch cannot
regress a newer row (the max-seq guard compares against the stored
sequence, the Debezium/Delta CDF convention).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEQ_COL = "_cdc_seq"


def _bucket_expr(key: str, n_buckets: int) -> F.Column:
    return F.pmod(F.hash(F.col(key)), F.lit(n_buckets))


def _bucket_dir(path: str, b: int) -> str:
    return os.path.join(path, f"bucket={b}")


def init_store(
    spark: SparkSession, path: str, base: DataFrame, key: str,
    n_buckets: int = 16,
) -> None:
    """Seed the bucketed store from a base frame (seq 0 for every
    row).  One shuffle on the bucket key; each bucket dir is written
    by its own task set."""
    (
        base.withColumn(SEQ_COL, F.lit(0).cast("long"))
        .withColumn("bucket", _bucket_expr(key, n_buckets))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("errorifexists")
        .parquet(path)
    )


def read_store(spark: SparkSession, path: str) -> DataFrame:
    """The merged current state (payload + key; bookkeeping dropped)."""
    return spark.read.parquet(path).drop(SEQ_COL, "bucket")


def apply_changelog(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    n_buckets: int = 16,
) -> dict:
    """Apply one changelog batch.  ``changes`` must carry ``key``, a
    LONG ``seq``, a STRING ``op`` in {'I','U','D'}, and every payload
    column of the store.  Returns {touched_buckets, upserts, deletes}.

    Per-key winner = the row with the greatest seq, op-ascending
    tiebreak ('D' < 'I' < 'U', so a delete and an upsert carrying the
    SAME seq resolve to the delete — loudly conservative and
    deterministic).  A winner older than the stored
    ``_cdc_seq`` for its key loses to the store (late replay of an
    old batch cannot regress a newer row).
    """
    bad = changes.filter(~F.col("op").isin("I", "U", "D")).limit(1).collect()
    if bad:
        raise ValueError(f"unknown CDC op {bad[0]['op']!r}")

    winners = (
        changes.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    F.col("seq").desc(), F.col("op").asc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("bucket", _bucket_expr(key, n_buckets))
        .localCheckpoint()  # the plan below reads winners 3x
    )
    touched = sorted(
        r["bucket"] for r in winners.select("bucket").distinct().collect()
    )
    if not touched:
        return {"touched_buckets": [], "upserts": 0, "deletes": 0}

    payload_cols = [
        c for c in winners.columns if c not in ("seq", "op", "bucket")
    ]  # includes key
    store_cols = [*payload_cols, SEQ_COL, "bucket"]

    existing = [
        b for b in touched
        if os.path.isdir(_bucket_dir(path, b))
        and any(f.endswith(".parquet") for f in os.listdir(_bucket_dir(path, b)))
    ]
    if existing:
        base = (
            spark.read.option("basePath", path)
            .parquet(*[_bucket_dir(path, b) for b in existing])
        )
    else:
        base = spark.read.parquet(path).filter(F.lit(False))

    w = winners.select(
        F.col(key).alias("_w_key"),
        F.col("seq").alias("_w_seq"),
        F.col("op").alias("_w_op"),
    )
    # base rows keep their slot unless a NEWER winner claims the key
    survivors = (
        base.join(w, base[key] == w["_w_key"], "left")
        .filter(F.col("_w_key").isNull() | (F.col(SEQ_COL) >= F.col("_w_seq")))
        .select(*store_cols)
    )
    # winners land unless they are deletes or stale vs the stored seq
    stored_seq = base.groupBy(F.col(key).alias("_s_key")).agg(
        F.max(SEQ_COL).alias("_s_seq")
    )
    landing = (
        winners.join(stored_seq, winners[key] == stored_seq["_s_key"], "left")
        .filter(F.col("_s_seq").isNull() | (F.col("seq") > F.col("_s_seq")))
        .filter(F.col("op") != "D")
        .select(*[F.col(c) for c in payload_cols],
                F.col("seq").alias(SEQ_COL), F.col("bucket"))
    )
    merged = survivors.unionByName(landing)

    tmp = path + "__cdc_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        merged.repartition("bucket")
        .write.partitionBy("bucket")
        .parquet(tmp)
    )
    n_up = landing.count()
    n_del = (
        winners.join(stored_seq, winners[key] == stored_seq["_s_key"], "left")
        .filter(F.col("_s_seq").isNull() | (F.col("seq") > F.col("_s_seq")))
        .filter(F.col("op") == "D")
        .count()
    )
    # swap ONLY the touched bucket dirs (atomic per bucket; untouched
    # buckets are never read or written)
    for b in touched:
        src = os.path.join(tmp, f"bucket={b}")
        dst = _bucket_dir(path, b)
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            shutil.move(src, dst)
        else:
            # bucket emptied by deletes: land a 0-row schema-anchor
            # file so the store stays readable even if EVERY bucket
            # empties (schema inference needs at least one footer)
            (
                merged.filter(F.lit(False)).drop("bucket")
                .coalesce(1).write.mode("overwrite").parquet(dst)
            )
    shutil.rmtree(tmp, ignore_errors=True)
    return {"touched_buckets": touched, "upserts": n_up, "deletes": n_del}
