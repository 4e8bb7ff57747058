"""A23 — snapshot versioning + time-travel (sources/snapshots.py).

Covers: commit/version numbering + idempotent re-commit, pinned
time-travel reads under later appends (snapshot isolation), the two
fail-closed read guards (missing file, changed size), version diffs,
vacuum's reference-counting (shared files survive), rollback-as-new-
version semantics, and the interaction with A22 compaction (compacted
table commits a new version; the old version is readable until
vacuumed, then fails closed).
"""

from __future__ import annotations

import os

import pytest

from fiveg_spark.sources.snapshots import (
    commit_snapshot,
    diff_versions,
    list_versions,
    read_as_of,
    rollback_to,
    vacuum,
)


def _append(spark, path: str, lo: int, hi: int) -> None:
    spark.range(lo, hi).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _ids(df) -> list[int]:
    return sorted(r.id for r in df.collect())


def test_commit_versions_and_idempotence(spark, tmp_path):
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    assert commit_snapshot(path) == 1
    # unchanged file set -> same version, no new history entry
    assert commit_snapshot(path) == 1
    assert list_versions(path) == [1]
    _append(spark, path, 10, 20)
    assert commit_snapshot(path) == 2
    assert list_versions(path) == [1, 2]


def test_time_travel_pins_old_version(spark, tmp_path):
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    v1 = commit_snapshot(path)
    _append(spark, path, 10, 25)
    v2 = commit_snapshot(path)
    assert _ids(read_as_of(spark, path, v1)) == list(range(10))
    assert _ids(read_as_of(spark, path, v2)) == list(range(25))
    # HEAD read sees everything regardless
    assert _ids(spark.read.parquet(path)) == list(range(25))


def test_read_fails_closed_on_missing_and_changed_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    v1 = commit_snapshot(path)
    snap_files = [
        f for f in os.listdir(path) if f.endswith(".parquet")
    ]
    victim = os.path.join(path, snap_files[0])
    blob = open(victim, "rb").read()
    os.remove(victim)
    with pytest.raises(FileNotFoundError, match="missing file"):
        read_as_of(spark, path, v1)
    # restore with EXTRA bytes -> size mismatch
    with open(victim, "wb") as fh:
        fh.write(blob + b"x")
    with pytest.raises(RuntimeError, match="changed size"):
        read_as_of(spark, path, v1)


def test_diff_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    v1 = commit_snapshot(path)
    _append(spark, path, 10, 30)
    v2 = commit_snapshot(path)
    d = diff_versions(path, v1, v2)
    assert d["removed"] == []
    assert d["rows_added"] == 20
    assert len(d["added"]) >= 1


def test_vacuum_respects_retained_references(spark, tmp_path):
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    v1 = commit_snapshot(path)
    _append(spark, path, 10, 20)
    v2 = commit_snapshot(path)
    _append(spark, path, 20, 30)
    v3 = commit_snapshot(path)
    # keep v2+v3: v1's files are ALSO v2/v3 files (append-only) ->
    # nothing deletable
    assert vacuum(path, keep_versions=2) == []
    assert list_versions(path) == [v2, v3]
    assert _ids(read_as_of(spark, path, v2)) == list(range(20))


def test_rollback_is_a_new_version(spark, tmp_path):
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    v1 = commit_snapshot(path)
    _append(spark, path, 10, 20)
    v2 = commit_snapshot(path)
    v3 = rollback_to(path, v1)
    assert v3 == v2 + 1
    # head state = v1 data; history retains all three versions
    assert _ids(spark.read.parquet(path)) == list(range(10))
    assert list_versions(path) == [v1, v2, v3]
    # v2 now references deleted files -> fails closed
    with pytest.raises(FileNotFoundError):
        read_as_of(spark, path, v2)


def test_compaction_interop(spark, tmp_path):
    from fiveg_spark.plans.compaction import execute_compaction, plan_compaction

    path = str(tmp_path / "t")
    for i in range(4):
        _append(spark, path, i * 10, (i + 1) * 10)
    v1 = commit_snapshot(path)
    execute_compaction(
        spark, plan_compaction(path, target_bytes=1 << 30),
        restamp_manifest=False,
    )
    v2 = commit_snapshot(path)
    assert v2 == v1 + 1
    assert _ids(read_as_of(spark, path, v2)) == list(range(40))
    # the compaction rewrote v1's files away -> v1 reads fail closed
    with pytest.raises(FileNotFoundError):
        read_as_of(spark, path, v1)
    # and vacuum retires it cleanly
    vacuum(path, keep_versions=1)
    assert list_versions(path) == [v2]


def test_vacuum_retention_spares_uncommitted_appends(spark, tmp_path):
    # An appended-but-not-yet-committed file is unknown to the snapshot
    # log; the retention window must spare it (the Delta VACUUM race).
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    commit_snapshot(path)
    _append(spark, path, 10, 20)  # in-flight: no commit_snapshot yet
    assert vacuum(path, keep_versions=1) == []  # default 24h retention
    assert _ids(spark.read.parquet(path)) == list(range(20))
    v2 = commit_snapshot(path)
    assert _ids(read_as_of(spark, path, v2)) == list(range(20))


def test_vacuum_zero_retention_deletes_unreferenced(spark, tmp_path):
    path = str(tmp_path / "t")
    _append(spark, path, 0, 10)
    commit_snapshot(path)
    _append(spark, path, 10, 20)  # uncommitted
    deleted = vacuum(path, keep_versions=1, min_age_hours=0.0)
    assert len(deleted) >= 1  # explicit opt-out removes the orphan
    assert _ids(spark.read.parquet(path)) == list(range(10))
