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
     wins; the winner's op decides upsert vs delete);
  2. route winners to buckets; ONLY the touched buckets are read back
     (merge cost is O(batch + touched-bucket bytes), independent of
     table size — the merge-on-write recipe every lakehouse uses);
  3. per touched bucket: survivors = base rows whose key has no newer
     winner; fresh winners land as live rows or TOMBSTONES; the bucket
     dir is swapped in with crash recovery (below).

Deletes are TOMBSTONES, not physical removal: a deleted key stays in
the store as a ``_cdc_del = true`` row carrying its ``_cdc_seq``, so a
late replay of an OLDER batch finds the newer tombstone and loses —
without tombstones a delete would erase the very sequence number the
stale-replay guard needs (the Cassandra/Delta-CDF lesson).
``read_store`` filters tombstones out; ``vacuum_tombstones`` reclaims
them once the replay horizon has passed (the retention-window
rationale every tombstone system shares).

Crash safety of the swap: the old bucket moves ASIDE to a trash dir
outside the store root, the new bucket moves in, then trash drops.  A
crash between the two moves leaves the bucket missing but its content
intact in trash — the next ``apply_changelog`` (or ``recover_store``)
restores it before doing anything else.  Replay idempotence is
structural: re-applying a batch routes the same winners to the same
buckets and rewrites the same content.

At 100 TB: buckets shard the rewrite so one batch touches a bounded
slice of the store; the winner reduction and the join are keyed on
``key`` (one shuffle each at batch scale, never table scale); the
read-back is a file-source scan of only the touched bucket dirs with
ordinary column pruning.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEQ_COL = "_cdc_seq"
DEL_COL = "_cdc_del"
META_FILE = "_cdc_meta.json"


def _bucket_expr(key: str, n_buckets: int) -> F.Column:
    return F.pmod(F.hash(F.col(key)), F.lit(n_buckets))


def _write_meta(path: str, key: str, n_buckets: int) -> None:
    import json

    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)


def _resolve_meta(path: str, key: str, n_buckets: int | None) -> int:
    """The bucket layout is a property of the STORE, not of the call:
    routing a batch with a different n_buckets than the store was laid
    out with silently lands keys in the wrong bucket (the stale-replay
    guard then reads the wrong slot — duplication, not an error).  So
    the layout is persisted at init and every maintenance entry point
    resolves it here: pass n_buckets=None to use the stored value, or
    an explicit value that MUST match.  Legacy stores (pre-metadata)
    get the caller's value stamped once, loudly requiring it."""
    import json

    meta_path = os.path.join(path, META_FILE)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("key") != key:
            raise ValueError(
                f"CDC store at {path} is keyed on {meta.get('key')!r}, "
                f"not {key!r}"
            )
        stored = int(meta["n_buckets"])
        if n_buckets is not None and n_buckets != stored:
            raise ValueError(
                f"CDC store at {path} was laid out with n_buckets="
                f"{stored}; refusing the caller's n_buckets={n_buckets} "
                "(bucket routing would silently corrupt the store)"
            )
        return stored
    if n_buckets is None:
        raise ValueError(
            f"CDC store at {path} has no {META_FILE} and no n_buckets "
            "was given; pass the layout's n_buckets once to migrate"
        )
    _write_meta(path, key, n_buckets)  # one-time legacy migration
    return n_buckets


def _bucket_dir(path: str, b: int) -> str:
    return os.path.join(path, f"bucket={b}")


def _trash_dir(path: str) -> str:
    return path.rstrip("/") + "__cdc_trash"


def init_store(
    spark: SparkSession, path: str, base: DataFrame, key: str,
    n_buckets: int = 16,
) -> None:
    """Seed the bucketed store from a base frame (seq 0, live rows).
    One shuffle on the bucket key; each bucket dir is written by its
    own task set."""
    (
        base.withColumn(SEQ_COL, F.lit(0).cast("long"))
        .withColumn(DEL_COL, F.lit(False))
        .withColumn("bucket", _bucket_expr(key, n_buckets))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("errorifexists")
        .parquet(path)
    )
    _write_meta(path, key, n_buckets)


def read_store(spark: SparkSession, path: str) -> DataFrame:
    """The merged current state: tombstones filtered, bookkeeping
    dropped."""
    recover_store(path)
    return (
        spark.read.parquet(path)
        .filter(~F.col(DEL_COL))
        .drop(SEQ_COL, DEL_COL, "bucket")
    )


def recover_store(path: str) -> list[int]:
    """Crash recovery for the bucket swap: any bucket sitting in the
    trash dir whose store slot is MISSING was interrupted between
    move-aside and move-in — restore it.  A trash bucket whose store
    slot exists means the move-in succeeded; drop it.  Returns the
    restored bucket ids."""
    trash = _trash_dir(path)
    restored: list[int] = []
    if not os.path.isdir(trash):
        return restored
    for name in os.listdir(trash):
        if not name.startswith("bucket="):
            continue
        b = int(name.split("=", 1)[1])
        dst = _bucket_dir(path, b)
        if not os.path.isdir(dst):
            shutil.move(os.path.join(trash, name), dst)
            restored.append(b)
    shutil.rmtree(trash, ignore_errors=True)
    return restored


def vacuum_tombstones(
    spark: SparkSession, path: str, horizon_seq: int, key: str,
    n_buckets: int | None = None,
) -> int:
    """Physically drop tombstones with ``_cdc_seq <= horizon_seq`` —
    safe once no batch at or below the horizon can replay (the
    caller's retention contract).  Rewrites every bucket; returns the
    number of tombstones reclaimed.  ``n_buckets`` defaults to the
    store's persisted layout; an explicit mismatch raises."""
    recover_store(path)
    n_buckets = _resolve_meta(path, key, n_buckets)
    all_rows = spark.read.parquet(path)
    doomed = all_rows.filter(
        F.col(DEL_COL) & (F.col(SEQ_COL) <= horizon_seq)
    )
    n = doomed.count()
    if n == 0:
        return 0
    kept = all_rows.filter(
        ~(F.col(DEL_COL) & (F.col(SEQ_COL) <= horizon_seq))
    )
    _swap_buckets(
        spark, path, kept, list(range(n_buckets)),
    )
    return n


def _swap_buckets(
    spark: SparkSession, path: str, merged: DataFrame, touched: list[int],
) -> None:
    """Write ``merged`` (must carry ``bucket``) to a staging dir, then
    swap the touched bucket dirs in with the move-aside recovery
    protocol documented in the module header."""
    tmp = path.rstrip("/") + "__cdc_tmp"
    trash = _trash_dir(path)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    merged.repartition("bucket").write.partitionBy("bucket").parquet(tmp)
    os.makedirs(trash, exist_ok=True)
    for b in touched:
        src = os.path.join(tmp, f"bucket={b}")
        dst = _bucket_dir(path, b)
        if not os.path.isdir(src):
            # nothing survived for this bucket: land a 0-row
            # schema-anchor file so the store stays readable even if
            # EVERY bucket empties (schema inference needs a footer)
            (
                merged.filter(F.lit(False)).drop("bucket")
                .coalesce(1).write.parquet(src)
            )
        if os.path.isdir(dst):
            shutil.move(dst, os.path.join(trash, f"bucket={b}"))
        shutil.move(src, dst)
    shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def apply_changelog(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    n_buckets: int | None = None,
) -> dict:
    """Apply one changelog batch.  ``changes`` must carry ``key``, a
    LONG ``seq``, a STRING ``op`` in {'I','U','D'}, and every payload
    column of the store.  Returns {touched_buckets, upserts, deletes}.

    Per-key winner = the row with the greatest seq, op-ascending
    tiebreak ('D' < 'I' < 'U', so a delete and an upsert carrying the
    SAME seq resolve to the delete — loudly conservative and
    deterministic).  A winner at-or-below the stored ``_cdc_seq`` for
    its key loses to the store — including a stored TOMBSTONE, so a
    late replay of an old batch cannot resurrect a deleted row.
    """
    bad = (
        changes.filter(
            (~F.col("op").isin("I", "U", "D")) | F.col("op").isNull()
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(f"unknown CDC op {bad[0]['op']!r}")
    recover_store(path)
    n_buckets = _resolve_meta(path, key, n_buckets)

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
        .localCheckpoint()  # read by the plans below + the counters
    )
    touched = sorted(
        r["bucket"] for r in winners.select("bucket").distinct().collect()
    )
    if not touched:
        return {"touched_buckets": [], "upserts": 0, "deletes": 0}

    payload_cols = [
        c for c in winners.columns if c not in ("seq", "op", "bucket")
    ]  # includes key
    store_cols = [*payload_cols, SEQ_COL, DEL_COL, "bucket"]

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

    # fresh winners: newer than whatever the store holds for the key
    # (live row OR tombstone — tombstones carry their delete seq, so a
    # stale pre-delete update loses here).  Tiny (≤ batch keys), and
    # read three times below (landing, both counters) → checkpoint.
    stored_seq = base.groupBy(F.col(key).alias("_s_key")).agg(
        F.max(SEQ_COL).alias("_s_seq")
    )
    fresh = (
        winners.join(stored_seq, winners[key] == stored_seq["_s_key"], "left")
        .filter(F.col("_s_seq").isNull() | (F.col("seq") > F.col("_s_seq")))
        .localCheckpoint()
    )
    counts = fresh.agg(
        F.sum((F.col("op") != "D").cast("long")).alias("up"),
        F.sum((F.col("op") == "D").cast("long")).alias("de"),
    ).head()

    w = fresh.select(
        F.col(key).alias("_w_key"), F.col("seq").alias("_w_seq")
    )
    # base rows keep their slot unless a FRESH winner claims the key
    survivors = (
        base.join(w, base[key] == w["_w_key"], "left")
        .filter(F.col("_w_key").isNull())
        .select(*store_cols)
    )
    # fresh winners land as live rows or tombstones
    landing = fresh.select(
        *[F.col(c) for c in payload_cols],
        F.col("seq").alias(SEQ_COL),
        (F.col("op") == "D").alias(DEL_COL),
        F.col("bucket"),
    )
    merged = survivors.unionByName(landing)
    _swap_buckets(spark, path, merged, touched)
    return {
        "touched_buckets": touched,
        "upserts": int(counts["up"] or 0),
        "deletes": int(counts["de"] or 0),
    }
