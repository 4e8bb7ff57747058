"""Query result-cache artifact (SURVEY §2 A18): parquet reuse keyed by
(canonicalized logical plan, input snapshot).

The 100 TB problem this solves: dashboards and schedulers re-issue the
same aggregate queries against data that changes a few times a day.
Re-running a full fact scan for an unchanged (query, data) pair is
pure waste; caching by QUERY TEXT alone is wrong (two textually
different plans can be the same query, and the same text over new data
must miss).  The key here is semantic and snapshot-aware:

- plan identity: Catalyst's CANONICALIZED analyzed plan (alias ids and
  cosmetic differences normalized away) — the same identity Spark's
  own exchange/subquery reuse machinery keys on;
- data identity: the ``df.inputFiles()`` listing plus each file's
  (size, mtime) — any append, compaction, or overwrite of an input
  changes the key, so staleness is structural, not TTL-guesswork.

A hit reads ONLY the cached parquet (no fact access — pytest asserts
the returned frame's input files all live under the cache dir); a miss
computes once and persists via a PER-WRITER temp dir + atomic
``os.replace`` — racing writers each own a private temp (a shared
temp name would let writer B rmtree writer A's just-finished output
mid-rename and install a half-written entry forever), the first
rename wins, the loser detects the installed entry and discards its
copy; identical results by construction either way.  Crashed-writer
temp leftovers are bounded garbage that ``evict`` sweeps.

This composes with the rest of the repo's artifact doctrine (E20's
persisted IVF centroids, A17's postings index): derived data is a
file-backed artifact with an explicit invalidation rule, never a
per-job refit.  Bounded maintenance: ``evict`` keeps the newest N
entries by last-use mtime.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _plan_identity(df: DataFrame) -> str:
    """Canonicalized analyzed-plan string: alias/expr-id differences
    normalized by Catalyst itself."""
    return (
        df._jdf.queryExecution().analyzed().canonicalized().toString()
    )


def _snapshot_identity(df: DataFrame) -> list[str]:
    """Input listing with size+mtime per file — any data change flips
    the key.  Non-local URIs fall back to the path string alone."""
    out = []
    for uri in sorted(df.inputFiles()):
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            st = os.stat(path)
            out.append(f"{uri}|{st.st_size}|{st.st_mtime_ns}")
        except OSError:
            out.append(uri)
    return out


def fingerprint(df: DataFrame) -> str:
    """Cache key for a DataFrame: md5 over the canonicalized plan and
    the input-file snapshot."""
    h = hashlib.md5()
    h.update(_plan_identity(df).encode())
    for line in _snapshot_identity(df):
        h.update(b"\n")
        h.update(line.encode())
    return h.hexdigest()


def _entry_dir(store: str, fp: str) -> str:
    return os.path.join(store, fp)


def cached(spark: SparkSession, df: DataFrame, store: str) -> DataFrame:
    """Return ``df``'s result, serving it from the store when the same
    (plan, snapshot) was materialized before."""
    fp = fingerprint(df)
    path = _entry_dir(store, fp)
    if os.path.isdir(path):
        os.utime(path)  # LRU touch for evict()
        return spark.read.parquet(path)
    # per-writer temp: racing writers must never share a temp name
    tmp = f"{path}.{uuid.uuid4().hex}.inprogress"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.replace(tmp, path)  # atomic: first rename installs
    except OSError:
        # a concurrent writer installed the entry first: discard ours
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(path):
            raise
    return spark.read.parquet(path)


def is_cached(df: DataFrame, store: str) -> bool:
    return os.path.isdir(_entry_dir(store, fingerprint(df)))


def evict(store: str, keep: int) -> int:
    """Drop all but the ``keep`` most-recently-used entries; returns
    the number evicted."""
    if not os.path.isdir(store):
        return 0
    entries = []
    for name in os.listdir(store):
        full = os.path.join(store, name)
        if not os.path.isdir(full):
            continue
        if name.endswith(".inprogress"):
            # crashed-writer leftover: sweep it (active writers hold
            # fresh temps only for the duration of one job)
            shutil.rmtree(full, ignore_errors=True)
            continue
        entries.append((os.path.getmtime(full), name))
    entries.sort(reverse=True)
    victims = entries[keep:]
    for _, name in victims:
        shutil.rmtree(os.path.join(store, name), ignore_errors=True)
    return len(victims)
