"""Multimodal decode on the oracle path (SURVEY §2 E13 certification
closer — the pcap_read_parity move applied to the media surface): the
REAL binary-column pipeline — MEDIA_SCHEMA frame → Arrow-batched
``mapInPandas`` feature extraction through ``stdlib_decoder``'s actual
byte-level decoders (netpbm, PNG inflate+unfilter, PCM WAV) — certified
against a closed-form VALUES oracle.

The query synthesizes deterministic media blobs in-plan with stdlib
encoders (a P5 gray and P6 RGB netpbm, a filter-0 gray PNG, a PCM16
WAV), each carrying a planted pixel/sample PATTERN whose feature vector
has a closed form from the construction parameters alone.  The oracle
never sees a decoder: its literals are the pattern arithmetic evaluated
through the same float32 feature layout, so parity proves the zlib
inflate, netpbm header walk, WAV PCM normalization, and the feature
arithmetic reproduce the construction exactly — end-to-end through the
distributed mapInPandas plumbing (schema, batching, sha/bytes
bookkeeping), not a unit test.

Scale: certification runs on four tiny blobs; the production path's
argument lives in operators/multimodal.py (bounded inner batches,
binaryFile ingestion, content never leaves the executor).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.plans.registry import Query

# ---- deterministic constructions -----------------------------------------


def _p5_image() -> tuple[bytes, np.ndarray]:
    w, h = 8, 5
    arr = np.fromfunction(lambda y, x: (3 * x + 7 * y) % 256, (h, w)).astype(
        np.uint8
    )
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes(), arr


def _p6_image() -> tuple[bytes, np.ndarray]:
    w, h = 6, 4
    arr = np.fromfunction(
        lambda y, x, c: x + y + 50 * c, (h, w, 3)
    ).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes(), arr


def _png_image() -> tuple[bytes, np.ndarray]:
    w, h = 5, 3
    arr = np.fromfunction(lambda y, x: 10 * x + y, (h, w)).astype(np.uint8)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, depth 8
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    return blob, arr


def _wav_audio() -> tuple[bytes, np.ndarray]:
    sr, n = 8000, 4000
    x = np.tile(np.array([8192, -8192], dtype=np.int16), n // 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())
    return buf.getvalue(), x.astype(np.float64) / 32768.0


def _image_vec(arr: np.ndarray) -> list[float]:
    """stdlib_decoder's image feature layout, evaluated on the pattern
    array the CONSTRUCTION defines (the decoder is never consulted)."""
    chans = (
        arr.reshape(-1, 3).mean(axis=0)
        if arr.ndim == 3
        else np.repeat(arr.mean(), 3)
    )
    h, w = arr.shape[:2]
    return [
        2.0, w / 4096.0, h / 4096.0,
        3.0 if arr.ndim == 3 else 1.0,
        float(arr.mean()) / 255.0, float(arr.std()) / 255.0,
        *(float(c) / 255.0 for c in chans),
    ]


def _audio_vec(x: np.ndarray, sr: int) -> list[float]:
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x)))))
    return [
        1.0, len(x) / sr, sr / 48000.0,
        float(np.sqrt(np.mean(x**2))),
        float(np.max(np.abs(x))),
        zcr, float(x.mean()), float(x.std()), 0.0,
    ]


def _cases() -> list[tuple[int, str, str, bytes, list[float]]]:
    p5, a5 = _p5_image()
    p6, a6 = _p6_image()
    png, apng = _png_image()
    wav, xw = _wav_audio()
    return [
        (1, "image", "pgm", p5, _image_vec(a5)),
        (2, "image", "ppm", p6, _image_vec(a6)),
        (3, "image", "png", png, _image_vec(apng)),
        (4, "audio", "wav", wav, _audio_vec(xw, 8000)),
    ]


_NF = 9  # feature slots the certified frame reads


def _media_decode_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fiveg_spark.operators.multimodal import (
        extract_features,
        stdlib_decoder,
    )

    media = spark.createDataFrame(
        [
            (mid, kind, fmt, bytearray(blob),
             (None, None, None, None))
            for mid, kind, fmt, blob, _vec in _cases()
        ],
        "media_id LONG, kind STRING, format STRING, content BINARY,"
        " meta STRUCT<width:INT, height:INT, duration_ms:INT,"
        " sample_rate:INT>",
    )
    feats = extract_features(media, decoder=stdlib_decoder)
    cols = [
        F.expr(
            f"CAST(round(CAST(features[{i}] AS DOUBLE) + 1e-9, 4) + 0.0"
            f" AS DOUBLE)"
        ).alias(f"f{i}")
        for i in range(_NF)
    ]
    return feats.select("media_id", "kind", "n_bytes", "content_sha",
                        *cols).orderBy("media_id")


def _media_decode_oracle() -> str:
    rows = []
    for mid, kind, _fmt, blob, vec in _cases():
        # the Spark side stores features as float32 then widens to
        # double: reproduce that exact widening before rounding
        f32 = [float(np.float32(v)) for v in (vec + [0.0] * _NF)[:_NF]]
        vals = ", ".join(f"{round(v + 1e-9, 4)!r}" for v in f32)
        sha = hashlib.sha256(blob).hexdigest()
        rows.append(
            f"({mid}, '{kind}', {len(blob)}, '{sha}', {vals})"
        )
    fcols = ", ".join(f"f{i}" for i in range(_NF))
    fcast = ", ".join(
        f"CAST(f{i} AS DOUBLE) AS f{i}" for i in range(_NF)
    )
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id, kind,
      CAST(n_bytes AS BIGINT) AS n_bytes, content_sha, {fcast}
    FROM (VALUES
      {",".join(rows)}
    ) AS t(media_id, kind, n_bytes, content_sha, {fcols})
    ORDER BY media_id
    """


QUERIES = [
    Query("media_decode_parity", _media_decode_run, _media_decode_oracle(),
          deferred=True),
]
