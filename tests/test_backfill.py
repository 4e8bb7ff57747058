"""Dynamic-partition backfill: re-running one day touches only that
day's partitions."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from fiveg_spark.pipelines.backfill import backfill, kpi_daily
from tests.conftest import SF_DIR


def _partition_mtimes(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                rel = os.path.relpath(dirpath, root)
                p = os.path.join(dirpath, f)
                out[rel] = max(out.get(rel, 0.0), os.path.getmtime(p))
    return out


def test_backfill_overwrites_only_selected_day(spark, tmp_path):
    out = str(tmp_path / "kpi_daily")
    backfill(spark, SF_DIR, out)  # full build
    full = spark.read.parquet(out)
    total_before = full.count()
    days = sorted(r["day"] for r in full.select("day").distinct().collect())
    assert len(days) > 5
    before = _partition_mtimes(out)

    target = days[2]
    backfill(spark, SF_DIR, out, days=[target])  # re-run ONE day

    after = _partition_mtimes(out)
    changed = {p for p in after if after[p] != before.get(p)}
    untouched = {p for p in after if after[p] == before.get(p)}
    assert changed and all(f"day={target}" in p for p in changed), changed
    assert untouched, "everything rewritten — dynamic overwrite not in effect"

    back = spark.read.parquet(out)
    assert back.count() == total_before  # idempotent
    # partition pruning on the partitioned output
    one_day = back.filter((F.col("day") == target) & (F.col("slice") == "eMBB"))
    # sparse at sf0.001: only hours with traffic appear, but within a day
    assert 1 <= one_day.count() <= 24


def test_kpi_daily_day_filter_prunes_scan(spark):
    days = [datetime.date(2024, 1, 3)]
    df = kpi_daily(spark, SF_DIR, days)
    rows = df.select("day").distinct().collect()
    assert [r["day"] for r in rows] == days
