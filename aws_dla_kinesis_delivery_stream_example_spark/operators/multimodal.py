"""Multimodal column plumbing (SURVEY.md §2.11 'Multimodal columns').

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct; heavy per-item work (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched ``mapInPandas`` so each Python
worker touches a whole batch at a time. Decode is REAL for three
formats parsed with stdlib+numpy: uncompressed 24-bit BMP and PCM-16
WAV (.codecs) and baseline JPEG incl. 4:2:0 (.jpeg) — features are
content-derived pixel / sample statistics. Remaining codecs (MP3/video
— librosa/ffmpeg absent from this container) fall back to a
deterministic digest feature, keeping the pipeline shape exercised
either way; malformed payloads of ANY format take the same fallback
instead of failing the job.

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
    """Decode + featurize one payload.

    Feature layouts (first element tags the decode path so mixed-format
    batches stay interpretable):
    - BMP image:  [1.0, width, height, mean_r, mean_g, mean_b,
                   std_r, std_g, std_b] (channel stats in [0, 1])
    - WAV audio:  [2.0, duration_s, rms, peak, zero_crossing_rate]
    - JPEG image: [3.0, width, height, mean_r, mean_g, mean_b,
                   std_r, std_g, std_b] (baseline decode, .jpeg module)
    - fallback:   [0.0] + 16 digest bytes / 255 (deterministic; used
                  for formats whose codecs aren't in this container)
    """
    import struct as _struct

    import numpy as np

    from . import codecs, jpeg

    def _img_stats(px: "np.ndarray", tag: float) -> list[float]:
        scaled = px.astype(np.float64) / 255.0
        h, w = scaled.shape[0], scaled.shape[1]
        means, stds = scaled.mean(axis=(0, 1)), scaled.std(axis=(0, 1))
        out = [tag, float(w), float(h), *map(float, means), *map(float, stds)]
        if not all(np.isfinite(v) for v in out):
            raise ValueError("non-finite image stats")
        return out

    data = payload or b""
    # codecs raise ValueError on malformed payloads by contract, but a
    # hostile/corrupt byte stream can still surface struct/Index errors
    # from parsing — ALL of them must hit the digest fallback rather
    # than crash the Spark job on one bad record.
    try:
        if data[:2] == b"BM":
            return _img_stats(codecs.decode_bmp(data), 1.0)
        if data[:2] == b"\xff\xd8":
            return _img_stats(jpeg.decode_jpeg(data), 3.0)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            rate, samples = codecs.decode_wav(data)
            dur = len(samples) / rate if rate else 0.0
            rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
            peak = float(np.max(np.abs(samples))) if len(samples) else 0.0
            zcr = (
                float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8)))))
                if len(samples) > 1
                else 0.0
            )
            out = [2.0, float(dur), rms, peak, zcr]
            if all(np.isfinite(v) for v in out):
                return out
    except (ValueError, _struct.error, IndexError):
        pass  # malformed/unsupported variant -> digest fallback
    digest = hashlib.sha256(data).digest()
    return [0.0] + [b / 255.0 for b in digest[:16]]


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


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real resize for BMP and JPEG payloads (nearest-neighbor,
    re-encoded in the source format); other payloads pass through
    untouched. Arrow-batched — the per-image numpy work happens once
    per batch partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        from . import codecs, jpeg

        def one(b):
            if b is None:
                return None
            raw = bytes(b)
            try:
                if raw[:2] == b"BM":
                    return codecs.encode_bmp(
                        codecs.resize_nearest(codecs.decode_bmp(raw), out_w, out_h)
                    )
                if raw[:2] == b"\xff\xd8":
                    return jpeg.encode_jpeg(
                        codecs.resize_nearest(jpeg.decode_jpeg(raw), out_w, out_h)
                    )
            except (ValueError, _struct.error, IndexError):
                pass  # malformed: pass through untouched
            return raw

        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(one)
            yield out

    ensure_shipped(media.sparkSession)
    return media.mapInPandas(run, schema=media.schema)


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
