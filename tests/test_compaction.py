"""A22 — small-file compaction executor (plans/compaction.py).

Covers: the metadata-only plan (bin-packing, single-file-group drop,
healthy-table empty plan), the rewrite (file count collapses, data
row-for-row identical, big files byte-identical), partition-directory
preservation, idempotence (second run no-ops), the row-conservation
guard, and the A21 manifest re-stamp gate.
"""

from __future__ import annotations

import os

import pytest

from fiveg_spark.plans.compaction import (
    _parquet_files,
    execute_compaction,
    plan_compaction,
)
from fiveg_spark.sources.manifest import verify_manifest


def _write_small_files(spark, path: str, n_files: int, rows_per: int) -> None:
    for i in range(n_files):
        spark.range(i * rows_per, (i + 1) * rows_per).selectExpr(
            "id", "id * 2 AS v"
        ).coalesce(1).write.mode("append").parquet(path)


def _collect_ids(spark, path: str) -> list[int]:
    return sorted(r.id for r in spark.read.parquet(path).collect())


def test_plan_packs_small_files_and_drops_singletons(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, path, n_files=6, rows_per=100)
    plan = plan_compaction(path, target_bytes=1 << 30)
    # all six tiny files pack into ONE group under a huge target
    assert len(plan.groups) == 1
    assert plan.n_inputs == 6
    assert plan.expected_rows == 600
    assert plan.untouched == []


def test_plan_empty_on_healthy_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, path, n_files=2, rows_per=100)
    # small_bytes below every file size -> nothing qualifies as small
    plan = plan_compaction(path, target_bytes=1 << 30, small_bytes=1)
    assert plan.groups == []
    summary = execute_compaction(spark, plan)
    assert summary["compacted"] is False


def test_execute_collapses_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, path, n_files=8, rows_per=50)
    before_ids = _collect_ids(spark, path)
    assert len(_parquet_files(path)) == 8
    plan = plan_compaction(path, target_bytes=1 << 30)
    summary = execute_compaction(spark, plan)
    assert summary["compacted"] is True
    assert summary["files_before"] == 8
    assert summary["files_after"] == 1
    assert _collect_ids(spark, path) == before_ids
    ok, msg = verify_manifest(path)
    assert ok, msg


def test_second_run_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, path, n_files=5, rows_per=50)
    execute_compaction(spark, plan_compaction(path, target_bytes=1 << 30))
    files_once = _parquet_files(path)
    # the single compacted file forms no >=2-file group
    plan2 = plan_compaction(path, target_bytes=1 << 30)
    assert plan2.groups == []
    summary = execute_compaction(spark, plan2)
    assert summary["compacted"] is False
    assert _parquet_files(path) == files_once


def test_partition_dirs_compact_independently(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(400).selectExpr("id", "id % 2 AS part", "id * 3 AS v")
    # 4 files per partition directory
    df.repartition(4).write.partitionBy("part").mode("overwrite").parquet(path)
    before = sorted(
        (r.id, r.part) for r in spark.read.parquet(path).collect()
    )
    plan = plan_compaction(path, target_bytes=1 << 30)
    # groups never span partition directories
    for g in plan.groups:
        parents = {os.path.dirname(f) for f in g.files}
        assert len(parents) == 1
    execute_compaction(spark, plan, restamp_manifest=False)
    # one file per partition directory afterwards
    by_parent: dict[str, int] = {}
    for f in _parquet_files(path):
        by_parent[os.path.dirname(f)] = by_parent.get(os.path.dirname(f), 0) + 1
    assert set(by_parent.values()) == {1}
    after = sorted((r.id, r.part) for r in spark.read.parquet(path).collect())
    assert after == before


def test_untouched_big_files_stay_byte_identical(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, path, n_files=4, rows_per=50)
    # mark the largest file as "big" by setting small_bytes just above
    # the smallest three
    sizes = sorted(os.path.getsize(f) for f in _parquet_files(path))
    small_bytes = sizes[-1]  # largest file is NOT small
    big = [
        f for f in _parquet_files(path)
        if os.path.getsize(f) >= small_bytes
    ]
    big_bytes = {f: open(f, "rb").read() for f in big}
    plan = plan_compaction(path, target_bytes=1 << 30, small_bytes=small_bytes)
    assert sorted(plan.untouched) == sorted(big)
    execute_compaction(spark, plan, restamp_manifest=False)
    for f, blob in big_bytes.items():
        assert open(f, "rb").read() == blob


def test_row_conservation_guard_aborts_without_install(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_small_files(spark, path, n_files=3, rows_per=50)
    before_files = _parquet_files(path)
    plan = plan_compaction(path, target_bytes=1 << 30)
    plan.groups[0].rows += 1  # corrupt the expectation
    with pytest.raises(RuntimeError, match="row-conservation"):
        execute_compaction(spark, plan)
    # original table untouched
    assert _parquet_files(path) == before_files
    assert len(_collect_ids(spark, path)) == 150


def test_failed_install_restores_original_table(spark, tmp_path, monkeypatch):
    # If the second rename of the atomic install fails, the original
    # table must be put back at `path` — never left stranded under the
    # .pre-compact-* recovery name with staging rmtree'd.
    path = str(tmp_path / "t")
    _write_small_files(spark, path, n_files=4, rows_per=100)
    before = _collect_ids(spark, path)
    plan = plan_compaction(path, target_bytes=1 << 30)
    assert plan.groups

    real_replace = os.replace

    def failing_replace(src, dst):
        if dst == path and ".compact-" in src and ".pre-compact-" not in src:
            raise OSError("simulated crash installing staging")
        return real_replace(src, dst)

    import fiveg_spark.plans.compaction as comp

    monkeypatch.setattr(comp.os, "replace", failing_replace)
    with pytest.raises(OSError, match="simulated crash"):
        execute_compaction(spark, plan, restamp_manifest=False)
    monkeypatch.undo()
    # table is back in place, byte-for-byte readable, nothing stranded
    assert _collect_ids(spark, path) == before
    leftovers = [
        d for d in os.listdir(tmp_path)
        if ".pre-compact-" in d or ".compact-" in d
    ]
    assert leftovers == []
