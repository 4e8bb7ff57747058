"""Multimodal (image/audio/video) column plumbing (SURVEY §2 E13).

Treats media as opaque ``binary`` columns + typed metadata structs —
the lakehouse-standard layout for multimodal training data.  All the
Spark-side machinery is real and tested: schema, binaryFile ingestion,
partition-friendly metadata extraction, Arrow-batched ``mapInPandas``
decode/transform with bounded batch sizes.

The pixel/sample decode itself requires codec libraries that are NOT in
this environment, so the decode kernel is pluggable: the default
``deterministic_fake_decoder`` derives a small feature vector from the
raw bytes (stable, testable); ``codec_decoder`` raises
``NotImplementedError`` with the dependency it would use.  Swapping in
a real decoder changes ONE function — none of the distributed plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | ...
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def deterministic_fake_decoder(content: bytes, kind: str) -> np.ndarray:
    """Stand-in decode: stable FEATURE_DIM-vector from the byte stream.

    Deterministic so tests can assert exact values; replaced by a real
    codec decoder (PIL/librosa/av) where those libraries exist.
    """
    digest = hashlib.sha256(content + kind.encode()).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0).astype(np.float32)


def codec_decoder(content: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    """Real decode path — requires media libraries absent from this env."""
    raise NotImplementedError(
        "media decode needs PIL (image) / soundfile (audio) / av (video); "
        "install one and plug it in here — the Spark plumbing is decoder-agnostic"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = deterministic_fake_decoder,
    batch_rows: int = 64,
) -> DataFrame:
    """binary column → feature vectors via Arrow-batched mapInPandas.

    ``batch_rows`` bounds how many blobs are decoded per inner batch so
    executor memory stays flat however large the media files are.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                part = pdf.iloc[lo : lo + batch_rows]
                feats, shas, sizes = [], [], []
                for content, kind in zip(part["content"], part["kind"]):
                    blob = bytes(content)
                    feats.append(decoder(blob, kind).tolist())
                    shas.append(hashlib.sha256(blob).hexdigest())
                    sizes.append(len(blob))
                yield pd.DataFrame(
                    {
                        "media_id": part["media_id"].values,
                        "kind": part["kind"].values,
                        "n_bytes": sizes,
                        "content_sha": shas,
                        "features": feats,
                    }
                )

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


def read_media_dir(spark: SparkSession, path: str, kind: str, glob: str = "*") -> DataFrame:
    """Directory of media files → MEDIA_SCHEMA frame (binaryFile source)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return files.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lower(F.element_at(F.split("path", "\\."), -1)).alias("format"),
        "content",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (same shape as text E1)."""
    return features.groupBy("content_sha").agg(
        F.min("media_id").alias("keeper_media_id"),
        F.count("*").alias("n_copies"),
    )
