"""B33 stream-stream interval join: exact pair semantics on planted
streams, the window cut in both directions, and exactly-once across a
checkpointed restart with new files.
"""

from __future__ import annotations

import time

from fiveg_spark.streaming.stream_join import (
    ATTRIBUTION_WINDOW_S,
    start_interval_join,
)

BASE = 1_700_000_000


def _write(spark, path, rows, id_col):
    spark.createDataFrame(
        [(int(t), int(u), int(i)) for t, u, i in rows],
        f"es LONG, user_id LONG, {id_col} LONG",
    ).selectExpr(
        "timestamp_micros(es * 1000000) AS ts", "user_id", id_col
    ).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, path, id_col):
    return (
        spark.readStream.schema(f"ts timestamp, user_id long, {id_col} long")
        .parquet(path)
    )


def test_interval_join_exact_pairs(spark, tmp_path):
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(spark, vdir, [(BASE, 1, 100), (BASE, 2, 200)], "view_id")
    _write(spark, cdir, [
        (BASE + 60, 1, 11),                        # in window -> pair
        (BASE + ATTRIBUTION_WINDOW_S + 100, 1, 12),  # too late -> drop
        (BASE - 10, 2, 21),                        # BEFORE the view -> drop
        (BASE + 300, 2, 22),                       # in window -> pair
        (BASE + 30, 99, 31),                       # no view -> drop
    ], "click_id")
    q = start_interval_join(
        spark, _stream(spark, vdir, "view_id"),
        _stream(spark, cdir, "click_id"), out, ckpt,
    )
    q.awaitTermination(120)
    got = {(r["view_id"], r["click_id"]): r["lag_us"]
           for r in spark.read.parquet(out).collect()}
    assert got == {(100, 11): 60e6, (200, 22): 300e6}


def test_interval_join_restart_is_exactly_once(spark, tmp_path):
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(spark, vdir, [(BASE, 1, 100)], "view_id")
    _write(spark, cdir, [(BASE + 60, 1, 11)], "click_id")
    vs, cs = _stream(spark, vdir, "view_id"), _stream(spark, cdir, "click_id")
    start_interval_join(spark, vs, cs, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == 1

    # restart with one NEW click for the buffered view: only the new
    # pair lands (the old one is not re-emitted from state/replay)
    time.sleep(1.1)
    _write(spark, cdir, [(BASE + 90, 1, 12)], "click_id")
    vs2, cs2 = _stream(spark, vdir, "view_id"), _stream(spark, cdir, "click_id")
    start_interval_join(spark, vs2, cs2, out, ckpt).awaitTermination(120)
    got = sorted(r["click_id"] for r in spark.read.parquet(out).collect())
    assert got == [11, 12]
