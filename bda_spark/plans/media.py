"""Multimodal-path queries for the driver contract: document text
bytes re-typed as raw grayscale images exercise the REAL mapInPandas
decode/feature plumbing (operators.multimodal) end-to-end, and —
because the corpus is ASCII — DuckDB can recompute the same features
from character codes, giving the binary path a full CORRECTNESS
oracle instead of a rows-only check.

(std_intensity is deliberately not compared: numpy's two-pass moment
and DuckDB's online variance round differently at the 6th decimal;
mean/min/max are exact-integer-sum arithmetic on both engines.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import RAW_IMAGE_FORMAT, RAW_VIDEO_FORMAT
from .registry import query, r6, t

_W, _H = 8, 5  # 40-byte grayscale "image" per document


def _as_image_media(d):
    return d.filter(F.length("text") >= _W * _H).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.substring("text", 1, _W * _H).cast("binary").alias("payload"),
        F.struct(
            F.lit(RAW_IMAGE_FORMAT).alias("format"),
            F.lit(_W).cast("int").alias("width"),
            F.lit(_H).cast("int").alias("height"),
            F.lit(1).cast("int").alias("channels"),
            F.lit(0).cast("int").alias("sample_rate"),
            F.lit(0).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


@query(
    "media_image_features",
    f"""
    WITH codes AS (
      SELECT doc_id,
             unnest(list_transform(split(substring(text, 1, {_W * _H}), ''),
                                   x -> ascii(x))) AS code
      FROM documents WHERE length(text) >= {_W * _H}
    )
    SELECT doc_id AS media_id,
           round(avg(code), 6) AS mean_intensity,
           min(code) AS min_intensity,
           max(code) AS max_intensity
    FROM codes GROUP BY doc_id
    """,
)
def media_image_features(spark, sf_dir):
    """Binary-column decode + feature extraction through the Arrow
    batch path; the oracle recomputes intensity stats from the ASCII
    codes of the same bytes."""
    from ..operators.multimodal import image_features

    media = _as_image_media(t(spark, sf_dir, "documents"))
    return image_features(media).select(
        "media_id",
        r6(F.col("mean_intensity")).alias("mean_intensity"),
        "min_intensity",
        "max_intensity",
    )


_FRAME = _W * _H  # bytes per 1-channel frame


@query(
    "media_video_frame_sample",
    f"""
    SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
           md5(substring(text, 1, {_FRAME})) AS frame_md5,
           CAST({_FRAME} AS INTEGER) AS frame_bytes
    FROM documents WHERE length(text) >= {3 * _FRAME}
    UNION ALL
    SELECT doc_id, CAST(2 AS INTEGER),
           md5(substring(text, {2 * _FRAME + 1}, {_FRAME})),
           CAST({_FRAME} AS INTEGER)
    FROM documents WHERE length(text) >= {3 * _FRAME}
    """,
)
def media_video_frame_sample(spark, sf_dir):
    """Every-2nd-frame sampling over synthesized 3-frame rgb8 video
    payloads (first 3*_FRAME bytes of each long document): frames 0 and
    2 survive, frame 1 is skipped — the stride logic is what the oracle
    checks. Because the corpus is ASCII, DuckDB recomputes each sampled
    frame from the matching substring and both engines compare md5 of
    the frame bytes (the image query's ASCII-bytes trick applied to the
    video path; byte-level slicing is additionally pinned by
    tests/test_multimodal.py)."""
    from ..operators.multimodal import sample_video_frames

    d = t(spark, sf_dir, "documents").filter(F.length("text") >= 3 * _FRAME)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.substring("text", 1, 3 * _FRAME).cast("binary").alias("payload"),
        F.struct(
            F.lit(RAW_VIDEO_FORMAT).alias("format"),
            F.lit(_W).cast("int").alias("width"),
            F.lit(_H).cast("int").alias("height"),
            F.lit(1).cast("int").alias("channels"),
            F.lit(0).cast("int").alias("sample_rate"),
            F.lit(3).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    frames = sample_video_frames(media, every_n=2)
    return frames.select(
        "media_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").alias("frame_bytes"),
    )
