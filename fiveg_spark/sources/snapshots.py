"""Snapshot versioning + time-travel reads over plain parquet
(SURVEY §2 A23): the last missing piece of the A18-A22 lakehouse-lite
story — A21 stamps ONE manifest (the current state); this keeps a
GENERATION LOG of them, which is exactly the mechanism Delta/Iceberg
use for time travel, rollback, and safe concurrent readers, rebuilt
from files + JSON for pipelines that can't adopt a table format.

Model: a snapshot is an immutable JSON under ``_snapshots/v{N}.json``
listing the data files (path, bytes, mtime_ns, rows, schema md5) that
make up the table AT COMMIT TIME.  Writers append new parquet files
and call ``commit_snapshot``; readers either read HEAD (the plain
directory) or ``read_as_of`` a version, which loads ONLY that
version's files — concurrent appends after the commit are invisible
to the pinned reader (snapshot isolation for append-only writers).

Safety properties (each pytest-pinned):
- ``read_as_of`` fails CLOSED when a listed file is missing or has
  changed size (a vacuumed/overwritten file cannot silently yield a
  wrong answer — the A21 fail-closed doctrine).
- ``vacuum`` deletes only files referenced by NO retained version AND
  older than its retention window (an appended-but-not-yet-committed
  file is invisible to the snapshot log, so age is the only guard —
  the Delta/Iceberg retention-period rationale); a file shared by
  several versions survives until every referencing version is
  dropped.
- ``rollback_to`` restores an old version by PHYSICALLY deleting files
  added after it — legal only while every file of the target version
  is still present (verified first), and it commits the restored
  state as a NEW version (history of version NUMBERS is append-only,
  but unlike Delta RESTORE the intermediate versions' data is gone:
  ``read_as_of`` on them fails closed rather than lying).

Scale: commits and reads are metadata-only (file listing + footer row
counts, the A20/A21 note: lift onto binaryFile at huge file counts);
``read_as_of`` hands Spark an explicit file list, so partition pruning
and pushdown behave exactly as a plain directory read.

Reference scope: beyond-reference production surface (the reference's
Scala jobs append parquet with no versioning story).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "_snapshots"


def _snap_dir(path: str) -> str:
    return os.path.join(path, SNAP_DIR)


def _data_files(path: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [x for x in dirs if x != SNAP_DIR]
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _entry(path: str, f: str) -> dict:
    import pyarrow.parquet as pq

    st = os.stat(f)
    return {
        "path": os.path.relpath(f, path),
        "bytes": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "rows": pq.ParquetFile(f).metadata.num_rows,
    }


def list_versions(path: str) -> list[int]:
    sd = _snap_dir(path)
    if not os.path.isdir(sd):
        return []
    out = []
    for f in os.listdir(sd):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _load(path: str, version: int) -> dict:
    with open(os.path.join(_snap_dir(path), f"v{version}.json")) as fh:
        return json.load(fh)


def commit_snapshot(path: str) -> int:
    """Record the directory's current file set as the next version.

    Returns the new version number.  Committing an UNCHANGED file set
    returns the existing head version without writing (idempotent —
    re-running a scheduler task must not grow history)."""
    files = _data_files(path)
    entries = [_entry(path, f) for f in files]
    versions = list_versions(path)
    if versions:
        head = _load(path, versions[-1])
        if head["files"] == entries:
            return versions[-1]
    version = (versions[-1] + 1) if versions else 1
    snap = {
        "version": version,
        "n_files": len(entries),
        "n_rows": sum(e["rows"] for e in entries),
        "files": entries,
    }
    os.makedirs(_snap_dir(path), exist_ok=True)
    tmp = os.path.join(_snap_dir(path), f"v{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(snap, fh, sort_keys=True)
    os.replace(tmp, os.path.join(_snap_dir(path), f"v{version}.json"))
    return version


def _verify_entries(path: str, snap: dict) -> None:
    for e in snap["files"]:
        f = os.path.join(path, e["path"])
        if not os.path.exists(f):
            raise FileNotFoundError(
                f"snapshot v{snap['version']} references missing file "
                f"{e['path']} (vacuumed or externally deleted) — refusing "
                "a partial read"
            )
        if os.path.getsize(f) != e["bytes"]:
            raise RuntimeError(
                f"snapshot v{snap['version']} file {e['path']} changed size "
                f"({os.path.getsize(f)} vs {e['bytes']}) — refusing to read "
                "rewritten data as historical"
            )


def read_as_of(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time-travel read: exactly the files of ``version``, fail-closed."""
    snap = _load(path, version)
    _verify_entries(path, snap)
    if not snap["files"]:
        raise ValueError(f"snapshot v{version} is empty")
    return spark.read.parquet(
        *[os.path.join(path, e["path"]) for e in snap["files"]]
    )


def diff_versions(path: str, v_old: int, v_new: int) -> dict:
    """Added/removed file lists + row delta between two versions."""
    old = {e["path"]: e for e in _load(path, v_old)["files"]}
    new = {e["path"]: e for e in _load(path, v_new)["files"]}
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    return {
        "added": added,
        "removed": removed,
        "rows_added": sum(new[p]["rows"] for p in added),
        "rows_removed": sum(old[p]["rows"] for p in removed),
    }


def vacuum(
    path: str, keep_versions: int = 2, min_age_hours: float = 24.0
) -> list[str]:
    """Drop snapshots beyond the newest ``keep_versions`` and delete
    data files referenced by NO retained version.  Returns deleted
    data-file relpaths.

    Retention window: a data file younger than ``min_age_hours`` is
    NEVER deleted even when unreferenced — a writer may have appended
    it but not yet called ``commit_snapshot``, and deleting it would
    silently lose live in-flight data (the same race Delta/Iceberg
    VACUUM close with their retention period).  Pass 0.0 only when no
    concurrent writer can exist (tests, single-process maintenance)."""
    import time

    versions = list_versions(path)
    retained = versions[-keep_versions:] if keep_versions > 0 else []
    referenced: set[str] = set()
    for v in retained:
        referenced.update(e["path"] for e in _load(path, v)["files"])
    cutoff_ns = int((time.time() - min_age_hours * 3600.0) * 1e9)
    deleted = []
    for f in _data_files(path):
        rel = os.path.relpath(f, path)
        if rel not in referenced and os.stat(f).st_mtime_ns <= cutoff_ns:
            os.remove(f)
            deleted.append(rel)
    for v in versions:
        if v not in retained:
            os.remove(os.path.join(_snap_dir(path), f"v{v}.json"))
    return sorted(deleted)


def rollback_to(path: str, version: int) -> int:
    """Restore the table to ``version`` by PHYSICALLY deleting files
    added after it, then commit the restored state as a NEW version.

    Version numbers stay append-only, but this is STRICTER than Delta
    RESTORE: the intermediate versions' extra files are removed, so
    ``read_as_of`` on them fails closed afterwards (HEAD here is the
    plain directory, so keeping the files would corrupt head reads).
    Refuses if any file of the target version is missing or changed."""
    snap = _load(path, version)
    _verify_entries(path, snap)
    keep = {e["path"] for e in snap["files"]}
    for f in _data_files(path):
        rel = os.path.relpath(f, path)
        if rel not in keep:
            os.remove(f)
    return commit_snapshot(path)
