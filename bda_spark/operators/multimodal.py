"""Multimodal columns (SURVEY extension: LLM-training-data pipeline):
image / audio / video as opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` operators.

Data model: one row per media object —
``(media_id long, kind string, payload binary, meta struct<...>)``.
The payload is bytes in ``meta.format``; nothing outside the decode
function ever interprets it, so swapping a codec never touches the
Spark plan.

CODEC BOUNDARY (env-gated, the Kafka-source pattern): the RAW formats
— ``rgb8_raw`` (H×W×C uint8 buffer) and ``pcm16`` (little-endian int16
mono) — decode for real with numpy everywhere; ``wav`` decodes for
real with the stdlib ``wave`` module everywhere. Compressed codecs
decode for real WHEREVER THE LIBRARY EXISTS — pillow for jpeg/png/...
images, soundfile for flac/ogg/... audio, av for video containers —
via a try-import branch, and raise ``NotImplementedError`` naming the
missing package otherwise (this test container ships none of the
three; the env-gated round-trip tests in tests/test_multimodal.py
verify decode(encode(raw)) ≡ raw features wherever they appear, the
same posture as the live-broker Kafka test). Swapping or adding a
codec never touches the Spark plans — schemas, batch shapes, and
operators below are production-real either way.

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
    """payload -> (H, W, C) uint8 array. Real numpy decode for
    rgb8_raw everywhere; compressed codecs (png/jpeg/webp/...) decode
    through pillow where it is installed (env-gated — the container
    boundary, not a semantic stub: the env-gated round-trip test
    asserts decode(encode(raw)) ≡ raw wherever pillow exists)."""
    fmt = meta["format"]
    if fmt == RAW_IMAGE_FORMAT:
        h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
        return np.frombuffer(payload, dtype=np.uint8, count=h * w * c).reshape(h, w, c)
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            f"image codec {fmt!r} needs the 'pillow' package, which is "
            f"not installed in this environment"
        ) from None
    import io

    arr = np.asarray(Image.open(io.BytesIO(payload)))
    if arr.ndim == 2:  # grayscale -> (H, W, 1)
        arr = arr[:, :, None]
    return np.ascontiguousarray(arr, dtype=np.uint8)


def decode_audio(payload: bytes, meta) -> np.ndarray:
    """payload -> float64 mono samples in [-1, 1]. Real decode for
    pcm16 (numpy) and wav (stdlib ``wave``) everywhere; other codecs
    (flac/ogg/...) decode through soundfile where installed
    (env-gated). Multi-channel audio mixes down by channel mean."""
    fmt = meta["format"]
    if fmt == RAW_AUDIO_FORMAT:
        return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    if fmt == "wav":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as wf:
            if wf.getsampwidth() != 2:
                raise ValueError(
                    f"wav decode: only 16-bit PCM supported, got "
                    f"{8 * wf.getsampwidth()}-bit"
                )
            frames = wf.readframes(wf.getnframes())
            ch = wf.getnchannels()
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
        if ch > 1:
            samples = samples.reshape(-1, ch).mean(axis=1)
        return samples
    try:
        import soundfile as sf
    except ImportError:
        raise NotImplementedError(
            f"audio codec {fmt!r} needs the 'soundfile' package, which "
            f"is not installed in this environment"
        ) from None
    import io

    data, _sr = sf.read(io.BytesIO(payload), dtype="float64")
    if data.ndim == 2:
        data = data.mean(axis=1)
    return data


def decode_video_frames(payload: bytes, meta) -> Iterator[np.ndarray]:
    """payload -> iterator of (H, W, 3) uint8 frames. Real slicing for
    rgb8_frames everywhere; container formats (mp4/mkv/...) decode
    through av where installed (env-gated)."""
    fmt = meta["format"]
    if fmt == RAW_VIDEO_FORMAT:
        h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
        stride = h * w * c
        n = min(int(meta["n_frames"]), len(payload) // stride) if stride else 0
        for i in range(n):
            yield np.frombuffer(
                payload, dtype=np.uint8, count=stride, offset=i * stride
            ).reshape(h, w, c)
        return
    try:
        import av
    except ImportError:
        raise NotImplementedError(
            f"video codec {fmt!r} needs the 'av' package, which is not "
            f"installed in this environment"
        ) from None
    import io

    with av.open(io.BytesIO(payload)) as container:
        for frame in container.decode(video=0):
            yield frame.to_ndarray(format="rgb24")


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "mean_intensity double, std_intensity double, min_intensity int, "
    "max_intensity int"
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + per-image intensity statistics (the feature-extract
    stage of an image-dedup/quality pipeline). Narrow transform: one
    Arrow batch in, one stats frame out, payloads dropped on emit.

    Vectorized per batch: rows are grouped by (format, shape), each
    group's raw buffers concatenated into ONE (n, h*w*c) uint8 matrix
    with a single ``np.frombuffer`` reshape, and all four stats come
    from axis-1 numpy reductions — no per-row Python loop over pixels
    (the per-row branch remains only for buffers of unexpected size)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            cols = {
                "media_id": np.empty(n_rows, dtype=np.int64),
                "width": np.empty(n_rows, dtype=np.int32),
                "height": np.empty(n_rows, dtype=np.int32),
                "channels": np.empty(n_rows, dtype=np.int32),
                "mean_intensity": np.empty(n_rows, dtype=np.float64),
                "std_intensity": np.empty(n_rows, dtype=np.float64),
                "min_intensity": np.empty(n_rows, dtype=np.int64),
                "max_intensity": np.empty(n_rows, dtype=np.int64),
            }
            groups: dict[tuple, list[int]] = {}
            metas = pdf["meta"].tolist()
            # a null payload is a malformed row, not a task killer
            payloads = [
                p if p is not None else b"" for p in pdf["payload"].tolist()
            ]
            for i, meta in enumerate(metas):
                # compressed rows may carry null dims (the codec is the
                # source of truth there); 0 keeps them groupable
                key = (meta["format"], int(meta["height"] or 0),
                       int(meta["width"] or 0), int(meta["channels"] or 0))
                groups.setdefault(key, []).append(i)
            for (fmt, h, w, c), idxs in groups.items():
                if fmt != RAW_IMAGE_FORMAT:
                    # compressed codec: the library IS the decode cost,
                    # so per-image stats loop over decoded arrays (or
                    # NotImplementedError where the codec lib is absent
                    # — the env boundary, identical to decode_image's).
                    # A CORRUPT buffer (or a null payload substituted
                    # as b"") gets the same quarantine the raw branches
                    # give under-length buffers: sentinel stats, never
                    # a task killer — only the missing-library boundary
                    # propagates.
                    for i in idxs:
                        try:
                            img = decode_image(payloads[i], metas[i])
                        except NotImplementedError:
                            raise
                        except Exception:
                            cols["mean_intensity"][i] = 0.0
                            cols["std_intensity"][i] = 0.0
                            cols["min_intensity"][i] = 0
                            cols["max_intensity"][i] = 0
                            cols["height"][i], cols["width"][i] = h, w
                            cols["channels"][i] = c
                            continue
                        cols["mean_intensity"][i] = img.mean()
                        cols["std_intensity"][i] = img.std()
                        cols["min_intensity"][i] = img.min()
                        cols["max_intensity"][i] = img.max()
                        dh, dw, dc = img.shape
                        cols["height"][i], cols["width"][i] = dh, dw
                        cols["channels"][i] = dc
                    continue
                sz = h * w * c
                if sz == 0:
                    # zero-area metadata: sentinel stats instead of a
                    # zero-size numpy reduction crashing the stage
                    iz = np.asarray(idxs)
                    cols["mean_intensity"][iz] = 0.0
                    cols["std_intensity"][iz] = 0.0
                    cols["min_intensity"][iz] = 0
                    cols["max_intensity"][iz] = 0
                    cols["height"][iz], cols["width"][iz], cols["channels"][iz] = h, w, c
                    continue
                exact = [i for i in idxs if len(payloads[i]) == sz]
                # under-length buffers cannot decode: sentinel stats
                # (quarantine-grade rows), never a task failure
                short = [i for i in idxs if len(payloads[i]) < sz]
                odd = [
                    i for i in idxs if len(payloads[i]) > sz
                ]
                for i in short:
                    cols["mean_intensity"][i] = 0.0
                    cols["std_intensity"][i] = 0.0
                    cols["min_intensity"][i] = 0
                    cols["max_intensity"][i] = 0
                if exact:
                    mat = np.frombuffer(
                        b"".join(payloads[i] for i in exact), dtype=np.uint8
                    ).reshape(len(exact), sz)
                    ix = np.asarray(exact)
                    cols["mean_intensity"][ix] = mat.mean(axis=1)
                    cols["std_intensity"][ix] = mat.std(axis=1)
                    cols["min_intensity"][ix] = mat.min(axis=1)
                    cols["max_intensity"][ix] = mat.max(axis=1)
                for i in odd:  # over-long buffers: slice like decode_image
                    img = decode_image(payloads[i], metas[i])
                    cols["mean_intensity"][i] = img.mean()
                    cols["std_intensity"][i] = img.std()
                    cols["min_intensity"][i] = img.min()
                    cols["max_intensity"][i] = img.max()
                ia = np.asarray(idxs)
                cols["height"][ia], cols["width"][ia], cols["channels"][ia] = h, w, c
            cols["media_id"][:] = pdf["media_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(cols)

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
            for media_id, kind, payload, rmeta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                img = decode_image(payload, rmeta)
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized = img[yi][:, xi]
                meta = dict(rmeta)
                meta.update(width=out_w, height=out_h, format=RAW_IMAGE_FORMAT)
                rows.append((media_id, kind, resized.tobytes(), meta))
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
    quality-filter features.

    Vectorized per batch: clips of equal length are stacked into ONE
    (n, samples) float matrix with a single ``np.frombuffer`` and the
    stats are axis-1 reductions (variable-length clips each form their
    own group; the common fixed-chunk ingest layout is one group)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            cols = {
                "media_id": np.empty(n_rows, dtype=np.int64),
                "n_samples": np.zeros(n_rows, dtype=np.int64),
                "duration_sec": np.zeros(n_rows, dtype=np.float64),
                "rms": np.zeros(n_rows, dtype=np.float64),
                "zero_crossing_rate": np.zeros(n_rows, dtype=np.float64),
            }
            metas = pdf["meta"].tolist()
            payloads = [
                p if p is not None else b"" for p in pdf["payload"].tolist()
            ]
            groups: dict[tuple, list[int]] = {}
            for i, meta in enumerate(metas):
                groups.setdefault(
                    (meta["format"], len(payloads[i])), []
                ).append(i)
            for (fmt, nbytes), idxs in groups.items():
                if fmt != RAW_AUDIO_FORMAT:
                    # container/compressed codec: decode each clip
                    # (stdlib wav everywhere; soundfile where present).
                    # Corrupt/null payloads quarantine to the zeroed
                    # sentinel stats the columns start with — only the
                    # missing-library boundary propagates.
                    for i in idxs:
                        try:
                            samples = decode_audio(payloads[i], metas[i])
                        except NotImplementedError:
                            raise
                        except Exception:
                            continue
                        ns = len(samples)
                        cols["n_samples"][i] = ns
                        sr = int(metas[i]["sample_rate"] or 0)
                        cols["duration_sec"][i] = ns / sr if sr > 0 else 0.0
                        if ns:
                            cols["rms"][i] = float(np.sqrt(np.mean(samples**2)))
                        if ns > 1:
                            flips = np.signbit(samples[1:]) != np.signbit(
                                samples[:-1]
                            )
                            cols["zero_crossing_rate"][i] = float(flips.mean())
                    continue
                n = nbytes // 2  # int16 samples
                ix = np.asarray(idxs)
                cols["n_samples"][ix] = n
                srs = np.asarray(
                    [int(metas[i]["sample_rate"]) for i in idxs], dtype=np.float64
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    cols["duration_sec"][ix] = np.where(srs > 0, n / srs, 0.0)
                if n == 0:
                    continue
                # an odd trailing byte cannot be an int16 sample — slice
                # to the whole-sample prefix so frombuffer/reshape agree
                # with n instead of raising on the malformed clip
                mat = (
                    np.frombuffer(
                        b"".join(payloads[i][: n * 2] for i in idxs),
                        dtype="<i2",
                    )
                    .astype(np.float64)
                    .reshape(len(idxs), n)
                    / 32768.0
                )
                cols["rms"][ix] = np.sqrt(np.mean(mat**2, axis=1))
                if n > 1:
                    flips = np.signbit(mat[:, 1:]) != np.signbit(mat[:, :-1])
                    cols["zero_crossing_rate"][ix] = flips.mean(axis=1)
            cols["media_id"][:] = pdf["media_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(cols)

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
            for media_id, buf, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["format"] != RAW_VIDEO_FORMAT:
                    # container format: av-gated frame decode (env
                    # boundary as decode_video_frames); only sampled
                    # frames are rendered to bytes. A corrupt container
                    # quarantines to zero frames — the same contract as
                    # a truncated raw payload — keeping any frames
                    # decoded before the corruption point; only the
                    # missing-library boundary propagates.
                    try:
                        for i, frame in enumerate(
                            decode_video_frames(
                                buf if buf is not None else b"", meta
                            )
                        ):
                            if i % every_n == 0:
                                out.append((media_id, i, frame.tobytes()))
                    except NotImplementedError:
                        raise
                    except Exception:
                        pass
                    continue
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                stride = h * w * c
                buf = buf if buf is not None else b""
                # never trust meta.n_frames past the actual payload:
                # only COMPLETE frames are emitted, so a truncated
                # upload yields fewer frames, not silently corrupt ones
                n = min(int(meta["n_frames"]), len(buf) // stride) if stride else 0
                for i in range(0, n, every_n):
                    out.append((media_id, i, buf[i * stride:(i + 1) * stride]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.filter("kind = 'video'").mapInPandas(sample, FRAME_SCHEMA)
