"""Multimodal column plumbing (SURVEY.md §2.11 'Multimodal columns').

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct; heavy per-item work (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched ``mapInPandas`` so each Python
worker touches a whole batch at a time. Real codecs (PIL/librosa/ffmpeg)
are NOT in this container, so the decode core is stubbed behind
``import``-try with a deterministic fake — the Spark-side contract
(schema, batch iteration, partitioning) is real and tested.

At 100 TB blobs travel by reference where possible: keep a ``uri``
column and only materialize bytes inside the mapInPandas stage, so the
shuffle moves metadata, never media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..shipping import ensure_shipped

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("uri", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Derive a deterministic fake media table from `documents` (the
    container has no real media); payload = utf-8 bytes of the text."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("synthetic://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("uri"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _decode(payload: bytes, media_type: str) -> list[float]:
    """Decode + featurize one payload. Real decoders are not available
    in this container; fall back to a deterministic digest-based fake
    feature so the pipeline shape is fully exercised."""
    try:  # pragma: no cover - decoders absent by design
        if media_type == "image":
            from PIL import Image  # noqa: F401

            raise NotImplementedError("real image decode wired when PIL present")
        if media_type == "audio":
            import librosa  # noqa: F401

            raise NotImplementedError("real audio decode wired when librosa present")
    except ImportError:
        pass
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:16]]


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [
                        _decode(b, t) for b, t in zip(payloads, pdf["media_type"])
                    ],
                }
            )

    ensure_shipped(media.sparkSession)
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: expand each row into
    frame timestamps (decode itself stubbed). Pure built-ins — the
    expansion is `sequence` + `explode`, no Python."""
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "uri", "frame_ms")
    )
