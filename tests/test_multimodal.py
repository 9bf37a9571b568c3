"""Multimodal plumbing tests: raw-format decode is real numpy, so
every expectation is hand-computable; compressed codecs must raise the
marked stub error, not silently fake an answer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from bda_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    RAW_AUDIO_FORMAT,
    RAW_IMAGE_FORMAT,
    RAW_VIDEO_FORMAT,
    audio_features,
    image_features,
    resize_images,
    sample_video_frames,
)


def _meta(fmt, w=0, h=0, c=0, sr=0, nf=0):
    return Row(
        format=fmt, width=w, height=h, channels=c, sample_rate=sr, n_frames=nf
    )


def _media(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_exact(spark):
    img = np.array([[[0], [100]], [[200], [255]]], dtype=np.uint8)  # 2x2x1
    df = _media(
        spark,
        [
            Row(
                media_id=1,
                kind="image",
                payload=bytearray(img.tobytes()),
                meta=_meta(RAW_IMAGE_FORMAT, w=2, h=2, c=1),
            )
        ],
    )
    r = image_features(df).collect()[0]
    assert (r.width, r.height, r.channels) == (2, 2, 1)
    assert r.mean_intensity == pytest.approx(138.75)
    assert r.std_intensity == pytest.approx(np.array([0, 100, 200, 255]).std())
    assert (r.min_intensity, r.max_intensity) == (0, 255)


def test_resize_nearest_neighbor_exact(spark):
    # 4x4 gradient -> 2x2 nearest picks rows/cols 0 and 2
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    df = _media(
        spark,
        [
            Row(
                media_id=1,
                kind="image",
                payload=bytearray(img.tobytes()),
                meta=_meta(RAW_IMAGE_FORMAT, w=4, h=4, c=1),
            )
        ],
    )
    out = resize_images(df, 2, 2).collect()[0]
    got = np.frombuffer(out.payload, dtype=np.uint8).reshape(2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]
    assert out.meta.width == 2 and out.meta.height == 2
    # round-trip: resized rows feed image_features again
    feats = image_features(_media(spark, [out])).collect()[0]
    assert feats.mean_intensity == pytest.approx((0 + 2 + 8 + 10) / 4)


def test_audio_features_exact(spark):
    # alternating +/- full-scale square wave: rms ~ 1.0, zcr ~ 1.0
    samples = np.array([32767, -32768] * 500, dtype="<i2")
    df = _media(
        spark,
        [
            Row(
                media_id=7,
                kind="audio",
                payload=bytearray(samples.tobytes()),
                meta=_meta(RAW_AUDIO_FORMAT, sr=1000),
            )
        ],
    )
    r = audio_features(df).collect()[0]
    assert r.n_samples == 1000
    assert r.duration_sec == pytest.approx(1.0)
    assert r.rms == pytest.approx(1.0, abs=1e-4)
    assert r.zero_crossing_rate == pytest.approx(1.0)


def test_video_frame_sampling_slices_bytes(spark):
    # 4 frames of 2x1x1: frame i filled with byte i*10
    frames = np.stack(
        [np.full((2, 1, 1), i * 10, dtype=np.uint8) for i in range(4)]
    )
    df = _media(
        spark,
        [
            Row(
                media_id=3,
                kind="video",
                payload=bytearray(frames.tobytes()),
                meta=_meta(RAW_VIDEO_FORMAT, w=1, h=2, c=1, nf=4),
            )
        ],
    )
    got = {
        r.frame_idx: bytes(r.frame)
        for r in sample_video_frames(df, every_n=2).collect()
    }
    assert set(got) == {0, 2}
    assert got[0] == b"\x00\x00" and got[2] == b"\x14\x14"


def test_compressed_codec_raises_stub_error(spark):
    df = _media(
        spark,
        [
            Row(
                media_id=9,
                kind="image",
                payload=bytearray(b"\xff\xd8\xff"),
                meta=_meta("jpeg", w=1, h=1, c=3),
            )
        ],
    )
    with pytest.raises(Exception, match="STUB|NotImplemented"):
        image_features(df).collect()


def test_mixed_kinds_filtered_per_operator(spark):
    img = np.zeros((1, 1, 1), dtype=np.uint8)
    pcm = np.zeros(10, dtype="<i2")
    df = _media(
        spark,
        [
            Row(media_id=1, kind="image", payload=bytearray(img.tobytes()),
                meta=_meta(RAW_IMAGE_FORMAT, w=1, h=1, c=1)),
            Row(media_id=2, kind="audio", payload=bytearray(pcm.tobytes()),
                meta=_meta(RAW_AUDIO_FORMAT, sr=10)),
        ],
    )
    assert image_features(df).count() == 1
    assert audio_features(df).count() == 1
