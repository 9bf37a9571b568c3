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


def test_compressed_codec_without_library_names_the_package(spark):
    """The env boundary must be explicit: where pillow is absent, a
    compressed image row raises NotImplementedError naming the package
    (never a shape-mismatch crash or silent garbage stats)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed here — the decode path is live")
    except ImportError:
        pass
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
    with pytest.raises(Exception, match="pillow"):
        image_features(df).collect()


def test_wav_codec_decodes_for_real_everywhere(spark):
    """The stdlib-decodable container: a 16-bit WAV clip must produce
    EXACTLY the features of its raw pcm16 twin — same samples, same
    rms/zcr/duration — with no external library."""
    import io
    import wave

    rng = np.random.default_rng(7)
    pcm = (rng.integers(-30000, 30000, size=400)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(100)
        wf.writeframes(pcm.tobytes())
    df = _media(
        spark,
        [
            Row(media_id=1, kind="audio", payload=bytearray(pcm.tobytes()),
                meta=_meta(RAW_AUDIO_FORMAT, sr=100)),
            Row(media_id=2, kind="audio", payload=bytearray(buf.getvalue()),
                meta=_meta("wav", sr=100)),
        ],
    )
    rows = {r["media_id"]: r for r in audio_features(df).collect()}
    raw, wav = rows[1], rows[2]
    assert wav["n_samples"] == raw["n_samples"] == 400
    assert wav["duration_sec"] == raw["duration_sec"] == 4.0
    assert abs(wav["rms"] - raw["rms"]) < 1e-12
    assert abs(wav["zero_crossing_rate"] - raw["zero_crossing_rate"]) < 1e-12


def test_pil_png_round_trip_matches_raw_features(spark):
    """Env-gated (pillow): decode(encode(raw)) ≡ raw — a PNG-compressed
    image must yield byte-identical pixels and identical feature rows
    to its rgb8_raw twin (PNG is lossless). Skips where pillow is
    absent; verifies the live branch wherever it exists."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from bda_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(img, mode="RGB").save(buf, format="PNG")
    png = buf.getvalue()
    assert np.array_equal(decode_image(png, {"format": "png"}), img)
    df = _media(
        spark,
        [
            Row(media_id=1, kind="image", payload=bytearray(img.tobytes()),
                meta=_meta(RAW_IMAGE_FORMAT, w=7, h=5, c=3)),
            Row(media_id=2, kind="image", payload=bytearray(png),
                meta=_meta("png", w=7, h=5, c=3)),
        ],
    )
    rows = {r["media_id"]: r for r in image_features(df).collect()}
    raw, comp = rows[1], rows[2]
    for col in ("width", "height", "channels", "mean_intensity",
                "std_intensity", "min_intensity", "max_intensity"):
        assert comp[col] == raw[col], col


def test_soundfile_flac_round_trip_matches_raw_features(spark):
    """Env-gated (soundfile): a FLAC-compressed clip (lossless) must
    match its pcm16 twin's features."""
    sf = pytest.importorskip("soundfile")
    import io

    rng = np.random.default_rng(13)
    pcm = (rng.integers(-30000, 30000, size=300)).astype("<i2")
    buf = io.BytesIO()
    sf.write(buf, pcm, 100, format="FLAC", subtype="PCM_16")
    df = _media(
        spark,
        [
            Row(media_id=1, kind="audio", payload=bytearray(pcm.tobytes()),
                meta=_meta(RAW_AUDIO_FORMAT, sr=100)),
            Row(media_id=2, kind="audio", payload=bytearray(buf.getvalue()),
                meta=_meta("flac", sr=100)),
        ],
    )
    rows = {r["media_id"]: r for r in audio_features(df).collect()}
    assert rows[2]["n_samples"] == rows[1]["n_samples"]
    assert abs(rows[2]["rms"] - rows[1]["rms"]) < 1e-9


def test_av_video_round_trip_samples_frames(spark):
    """Env-gated (av): an encoded video container must sample the same
    frame indices as its rgb8_frames twin."""
    av = pytest.importorskip("av")
    import io

    h, w, n_frames = 8, 8, 6
    frames = [
        np.full((h, w, 3), 10 * i, dtype=np.uint8) for i in range(n_frames)
    ]
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = w, h, "yuv420p"
        for f in frames:
            frame = av.VideoFrame.from_ndarray(f, format="rgb24")
            container.mux(stream.encode(frame))
        container.mux(stream.encode())
    df = _media(
        spark,
        [
            Row(media_id=1, kind="video", payload=bytearray(buf.getvalue()),
                meta=_meta("mp4", w=w, h=h, c=3, nf=n_frames)),
        ],
    )
    got = sample_video_frames(df, every_n=2).collect()
    assert [r["frame_idx"] for r in sorted(got, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    for r in got:
        assert len(r["frame"]) == h * w * 3


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


def test_corrupt_compressed_rows_quarantine_not_crash(spark):
    """ADVICE r8: a corrupt compressed buffer (or a null payload
    substituted as b\"\") must get the same quarantine discipline the
    raw branches give malformed rows — sentinel stats / zero frames,
    never a dead task — while healthy rows in the same batch still
    produce real stats. Env-gated on pillow like the codec round-trip
    (without the library the same rows hit the NotImplementedError
    boundary instead, which is the documented env contract)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(img, mode="RGB").save(buf, format="PNG")
    df = _media(
        spark,
        [
            Row(media_id=1, kind="image", payload=bytearray(buf.getvalue()),
                meta=_meta("png", w=7, h=5, c=3)),
            Row(media_id=2, kind="image", payload=bytearray(b"not a png"),
                meta=_meta("png", w=7, h=5, c=3)),
            Row(media_id=3, kind="image", payload=None,
                meta=_meta("png", w=7, h=5, c=3)),
        ],
    )
    rows = {r["media_id"]: r for r in image_features(df).collect()}
    assert len(rows) == 3
    assert rows[1]["mean_intensity"] > 0  # healthy row unaffected
    for mid in (2, 3):  # quarantined: sentinel stats
        assert rows[mid]["mean_intensity"] == 0.0
        assert rows[mid]["std_intensity"] == 0.0
        assert rows[mid]["max_intensity"] == 0
