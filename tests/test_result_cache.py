"""Result-cache artifact: semantic plan keys (alias-insensitive hit,
different-query miss), snapshot invalidation on data change, hits that
never touch the fact files, atomic-writer crash leftovers, and LRU
eviction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fiveg_spark.plans.result_cache import (
    cached,
    evict,
    fingerprint,
    is_cached,
)


def _write_events(spark, path, n, start=0):
    spark.range(start, start + n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
    ).write.mode("append").parquet(path)


def _agg(spark, src):
    return (
        spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
    )


def test_cache_hit_serves_from_store_not_facts(spark, tmp_path):
    src = str(tmp_path / "events")
    store = str(tmp_path / "cache")
    _write_events(spark, src, 1000)

    first = cached(spark, _agg(spark, src), store)
    expected = {r["event_type"]: r.asDict() for r in first.collect()}
    assert is_cached(_agg(spark, src), store)

    hit = cached(spark, _agg(spark, src), store)
    got = {r["event_type"]: r.asDict() for r in hit.collect()}
    assert got == expected
    # the hit's lineage reads ONLY cache files — zero fact access
    assert hit.inputFiles()
    for f in hit.inputFiles():
        assert store in f, f
        assert "events" not in f, f


def test_cache_key_is_semantic_not_textual(spark, tmp_path):
    src = str(tmp_path / "events")
    store = str(tmp_path / "cache")
    _write_events(spark, src, 200)

    base = _agg(spark, src)
    # alias-renamed but semantically identical plan -> same key
    twin = (
        spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
    )
    assert fingerprint(base) == fingerprint(twin)
    # a genuinely different query -> different key
    other = (
        spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.avg("value").alias("total"), F.count("*").alias("n"))
    )
    assert fingerprint(base) != fingerprint(other)


def test_cache_invalidates_when_data_changes(spark, tmp_path):
    src = str(tmp_path / "events")
    store = str(tmp_path / "cache")
    _write_events(spark, src, 500)
    first = cached(spark, _agg(spark, src), store)
    n_before = sum(r["n"] for r in first.collect())
    assert n_before == 500

    # append new data: the old entry must NOT serve
    _write_events(spark, src, 250, start=500)
    assert not is_cached(_agg(spark, src), store)
    second = cached(spark, _agg(spark, src), store)
    assert sum(r["n"] for r in second.collect()) == 750
    # both snapshots coexist as separate entries
    assert len(os.listdir(store)) == 2


def test_cache_recovers_from_crashed_writer_leftover(spark, tmp_path):
    src = str(tmp_path / "events")
    store = str(tmp_path / "cache")
    _write_events(spark, src, 100)
    df = _agg(spark, src)
    # a crashed writer left a stale per-writer temp dir for this key:
    # it must not block the entry, and evict() sweeps it
    stale = os.path.join(store, fingerprint(df) + ".dead0.inprogress")
    os.makedirs(stale)
    open(os.path.join(stale, "junk"), "w").write("x")

    out = cached(spark, df, store)
    assert sum(r["n"] for r in out.collect()) == 100
    assert os.path.isdir(stale)  # untouched by the writer...
    evict(store, keep=10)
    assert not os.path.isdir(stale)  # ...swept by maintenance


def test_evict_keeps_most_recently_used(spark, tmp_path):
    src = str(tmp_path / "events")
    store = str(tmp_path / "cache")
    _write_events(spark, src, 100)

    df1 = _agg(spark, src)
    df2 = spark.read.parquet(src).groupBy("event_type").agg(
        F.max("value").alias("mx")
    )
    df3 = spark.read.parquet(src).agg(F.count("*").alias("n"))
    for df in (df1, df2, df3):
        cached(spark, df, store)
    assert len(os.listdir(store)) == 3

    # touch df1 (a hit bumps its mtime), then keep the 2 newest
    os.utime(os.path.join(store, fingerprint(df2)), (1, 1))
    assert evict(store, keep=2) == 1
    assert is_cached(df1, store) and is_cached(df3, store)
    assert not is_cached(df2, store)
