"""Multimodal columns (SURVEY extension: LLM-training-data pipeline):
image / audio / video as opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` operators.

Data model: one row per media object —
``(media_id long, kind string, payload binary, meta struct<...>)``.
The payload is bytes in ``meta.format``; nothing outside the decode
function ever interprets it, so swapping a codec never touches the
Spark plan.

STUB BOUNDARY (clearly marked): this container has no image/audio
codec libraries (no PIL, librosa, av), so only the RAW formats are
decodable — ``rgb8_raw`` (H×W×C uint8 buffer) and ``pcm16``
(little-endian int16 mono), both decoded for real with numpy.
Compressed formats (jpeg/png/mp3/...) raise ``NotImplementedError``
from ``decode_image``/``decode_audio``; on a real cluster those two
functions grow a PIL/librosa branch and NOTHING else changes — the
schemas, batch shapes, and plans below are production-real.

Scale shape: ``mapInPandas`` streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so executor memory
is per-batch not per-partition; payload columns never pass through a
shuffle in these operators (narrow map transforms), and frame
sampling explodes AFTER the per-row slice, so only sampled bytes are
emitted. Repartition upstream by size (bytes per row × rows per task)
to keep tasks even.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RAW_IMAGE_FORMAT = "rgb8_raw"  # height*width*channels uint8, row-major
RAW_AUDIO_FORMAT = "pcm16"  # little-endian int16, mono
RAW_VIDEO_FORMAT = "rgb8_frames"  # n_frames * height*width*channels uint8

MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)


def decode_image(payload: bytes, meta) -> np.ndarray:
    """payload -> (H, W, C) uint8 array. Real decode for rgb8_raw;
    compressed codecs are the STUB boundary (no PIL in container)."""
    fmt = meta["format"]
    if fmt == RAW_IMAGE_FORMAT:
        h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
        return np.frombuffer(payload, dtype=np.uint8, count=h * w * c).reshape(h, w, c)
    raise NotImplementedError(
        f"image codec {fmt!r}: decoder library not installed in this "
        "environment — STUB; add a PIL branch here on a real cluster"
    )


def decode_audio(payload: bytes, meta) -> np.ndarray:
    """payload -> float64 samples in [-1, 1]. Real decode for pcm16."""
    fmt = meta["format"]
    if fmt == RAW_AUDIO_FORMAT:
        return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    raise NotImplementedError(
        f"audio codec {fmt!r}: decoder library not installed in this "
        "environment — STUB; add a librosa/soundfile branch here"
    )


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "mean_intensity double, std_intensity double, min_intensity int, "
    "max_intensity int"
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + per-image intensity statistics (the feature-extract
    stage of an image-dedup/quality pipeline). Narrow transform: one
    Arrow batch in, one stats frame out, payloads dropped on emit."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                img = decode_image(row["payload"], row["meta"])
                out.append(
                    (
                        row["media_id"],
                        img.shape[1],
                        img.shape[0],
                        img.shape[2],
                        float(img.mean()),
                        float(img.std()),
                        int(img.min()),
                        int(img.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "channels",
                    "mean_intensity",
                    "std_intensity",
                    "min_intensity",
                    "max_intensity",
                ],
            )

    return media.filter("kind = 'image'").mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize, re-emitted as rgb8_raw payloads with
    updated meta — the thumbnailing stage. The index math is the real
    algorithm (what PIL NEAREST does); only the codec is stubbed."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = decode_image(row["payload"], row["meta"])
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized = img[yi][:, xi]
                meta = dict(row["meta"])
                meta.update(width=out_w, height=out_h, format=RAW_IMAGE_FORMAT)
                rows.append(
                    (row["media_id"], row["kind"], resized.tobytes(), meta)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return media.filter("kind = 'image'").mapInPandas(resize, MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples long, duration_sec double, rms double, "
    "zero_crossing_rate double"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + RMS energy / zero-crossing rate / duration — the audio
    quality-filter features."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                x = decode_audio(row["payload"], row["meta"])
                sr = int(row["meta"]["sample_rate"])
                zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                out.append(
                    (
                        row["media_id"],
                        len(x),
                        len(x) / sr if sr else 0.0,
                        float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_samples",
                    "duration_sec",
                    "rms",
                    "zero_crossing_rate",
                ],
            )

    return media.filter("kind = 'audio'").mapInPandas(
        extract, AUDIO_FEATURES_SCHEMA
    )


FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame binary"
)


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Every-Nth-frame sampling from rgb8_frames payloads: per row,
    slice the frame stride out of the byte buffer and emit one row per
    kept frame — only sampled bytes leave the operator (the
    frame-sample stage of a video pipeline)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                if meta["format"] != RAW_VIDEO_FORMAT:
                    raise NotImplementedError(
                        f"video codec {meta['format']!r}: decoder library "
                        "not installed — STUB; add an av branch here"
                    )
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                n = int(meta["n_frames"])
                stride = h * w * c
                buf = row["payload"]
                for i in range(0, n, every_n):
                    out.append(
                        (row["media_id"], i, buf[i * stride:(i + 1) * stride])
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.filter("kind = 'video'").mapInPandas(sample, FRAME_SCHEMA)
