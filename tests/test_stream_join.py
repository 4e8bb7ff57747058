"""B10 stream-stream interval join, hardened (r10w2): the existing
stream≡batch equivalence test never pinned CLOSED-FORM pair semantics,
never ran two PHYSICALLY separate sources (independent watermark
advancement — the production topology), and never crossed a
checkpointed restart.  These do, against the same
``streaming_attribution`` component.
"""

from __future__ import annotations

import time

from fiveg_spark.streaming.kpi_stream import streaming_attribution

BASE = 1_700_000_000


def _write(spark, path, rows):
    """rows: (epoch_s, user_id, event_id, event_type)"""
    spark.createDataFrame(
        [(int(t), int(u), int(i), ty) for t, u, i, ty in rows],
        "es LONG, user_id LONG, event_id LONG, event_type STRING",
    ).selectExpr(
        "timestamp_micros(es * 1000000) AS ts",
        "user_id", "event_id", "event_type",
    ).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, path):
    return spark.readStream.schema(
        "ts timestamp, user_id long, event_id long, event_type string"
    ).parquet(path)


def _start(spark, vdir, cdir, out, ckpt):
    return (
        streaming_attribution(
            _stream(spark, vdir), within="10 minutes",
            clicks_stream=_stream(spark, cdir),
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def test_two_source_join_exact_pairs(spark, tmp_path):
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(spark, vdir, [(BASE, 1, 100, "view"), (BASE, 2, 200, "view")])
    _write(spark, cdir, [
        (BASE + 60, 1, 11, "click"),    # in window -> pair
        (BASE + 700, 1, 12, "click"),   # past 10 min -> drop
        (BASE - 10, 2, 21, "click"),    # BEFORE the view -> drop
        (BASE + 300, 2, 22, "click"),   # in window -> pair
        (BASE + 30, 99, 31, "click"),   # no view -> drop
    ])
    q = _start(spark, vdir, cdir, out, ckpt)
    q.awaitTermination(120)
    got = {(r["view_id"], r["click_id"])
           for r in spark.read.parquet(out).collect()}
    assert got == {(100, 11), (200, 22)}


def test_two_source_restart_is_exactly_once(spark, tmp_path):
    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(spark, vdir, [(BASE, 1, 100, "view")])
    _write(spark, cdir, [(BASE + 60, 1, 11, "click")])
    _start(spark, vdir, cdir, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == 1

    # restart on the SAME checkpoint with one NEW click for the
    # state-buffered view: only the new pair lands
    time.sleep(1.1)
    _write(spark, cdir, [(BASE + 90, 1, 12, "click")])
    _start(spark, vdir, cdir, out, ckpt).awaitTermination(120)
    got = sorted(r["click_id"] for r in spark.read.parquet(out).collect())
    assert got == [11, 12]
