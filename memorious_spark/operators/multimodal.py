"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
partition flow, deterministic partitioning by content hash) is real
and tested. ``decode_image`` REALLY decodes the headerful
uncompressed image formats (BMP BI_RGB, PPM P6) and ``decode_wav``
the uncompressed audio one (RIFF PCM WAV, 8/16-bit) in pure
python/numpy — feature extraction over those is genuine pixel/signal
math; compressed codecs (JPEG/PNG/MP3/video) still raise
NotImplementedError because their libraries (Pillow/ffmpeg/librosa)
are not in this container, and ``fake_image_features`` stands in so
mixed corpora keep flowing through the one Arrow-batched UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_meta",
    "decode_image",
    "decode_wav",
    "encode_ppm",
    "resize_image",
    "decode_video",
    "fake_image_features",
    "image_features",
    "audio_features",
    "extract_features",
    "resize_images",
    "sample_frames",
]

# binary payload + typed metadata — the multimodal table contract
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

_FEATURE_DIM = 8


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Content-hash + size metadata, JVM-side (no UDF)."""
    return df.withColumn("content_hash", F.sha1(F.col(payload_col))).withColumn(
        "n_bytes", F.length(F.col(payload_col)).cast("long")
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Pure-python image decode → HWC uint8 RGB.

    Real decoders for the two headerful uncompressed formats parseable
    without an imaging library:
    - BMP (BI_RGB 24/32-bit, bottom-up or top-down rows, 4-byte row
      padding),
    - PPM binary (P6, maxval 255).
    Compressed formats (JPEG/PNG/…) still raise — their codecs are not
    in this container; the mapInPandas plumbing downstream is format-
    agnostic, so a library decoder slots into this one function.
    """
    import struct

    buf = bytes(payload)
    if buf[:2] == b"BM":
        data_off = struct.unpack_from("<I", buf, 10)[0]
        width, height = struct.unpack_from("<ii", buf, 18)
        bpp = struct.unpack_from("<H", buf, 28)[0]
        compression = struct.unpack_from("<I", buf, 30)[0]
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError(
                f"BMP variant not supported: bpp={bpp} compression={compression}"
            )
        top_down = height < 0
        height = abs(height)
        nchan = bpp // 8
        row_size = ((bpp * width + 31) // 32) * 4
        rows = []
        for r in range(height):
            off = data_off + r * row_size
            row = np.frombuffer(buf, dtype=np.uint8, count=width * nchan, offset=off)
            # BGR(A) → RGB
            rows.append(row.reshape(width, nchan)[:, :3][:, ::-1])
        img = np.stack(rows)
        return img if top_down else img[::-1]
    if buf[:2] == b"P6":
        img, _ = _parse_ppm(buf, 0)
        return img
    raise NotImplementedError(
        "only BMP (BI_RGB) and PPM (P6) decode without an imaging library"
    )


def _parse_ppm(buf: bytes, pos: int) -> tuple["np.ndarray", int]:
    """Parse one P6 frame at ``pos`` → ``(HWC uint8 image, offset past
    the frame)`` — the offset return is what lets frames concatenate
    into the :func:`decode_video` container."""
    if buf[pos : pos + 2] != b"P6":
        raise ValueError(f"no P6 magic at offset {pos}")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data
    i, vals = pos + 2, []
    while len(vals) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":  # comment line
            i = buf.index(b"\n", i) + 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        vals.append(int(buf[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = vals
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    n = width * height * 3
    if i + n > len(buf):
        raise ValueError("truncated PPM frame")
    img = (
        np.frombuffer(buf, dtype=np.uint8, count=n, offset=i)
        .reshape(height, width, 3)
        .copy()
    )
    return img, i + n


def encode_ppm(img: "np.ndarray") -> bytes:
    """HWC uint8 RGB → binary PPM (P6, maxval 255) — the inverse of
    the P6 branch of :func:`decode_image`, byte-for-byte stable."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img[:, :, :3], dtype=np.uint8
    ).tobytes()


def resize_image(img: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize (half-pixel centers: source index
    ``floor((i + 0.5) · src/dst)``) — pure integer index math, so the
    result is deterministic across numpy versions; the standard NN
    convention (what OpenCV INTER_NEAREST approximates)."""
    sh, sw = img.shape[0], img.shape[1]
    rows = np.minimum(
        ((np.arange(height) + 0.5) * sh / height).astype(np.int64), sh - 1
    )
    cols = np.minimum(
        ((np.arange(width) + 0.5) * sw / width).astype(np.int64), sw - 1
    )
    return img[rows][:, cols]


def decode_video(payload: bytes) -> list["np.ndarray"]:
    """Pure-python video decode → list of HWC uint8 frames.

    The parseable-without-codecs container is a raw CONCATENATED-PPM
    stream (back-to-back P6 frames — the uncompressed video analogue
    of the BMP/WAV choices above; yuv4mpeg/raw-RGB pipes are the same
    idea). Real containers (MP4 ``ftyp``, AVI ``RIFF``, Matroska)
    raise — their codecs (ffmpeg) are not in this container; the
    frame-sampling plumbing downstream is container-agnostic, so a
    library decoder slots into this one function."""
    buf = bytes(payload)
    if buf[4:8] == b"ftyp":
        raise NotImplementedError("MP4 needs ffmpeg (not in container)")
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        raise NotImplementedError("AVI needs ffmpeg (not in container)")
    if buf[:4] == b"\x1a\x45\xdf\xa3":
        raise NotImplementedError("Matroska/WebM needs ffmpeg")
    if buf[:2] != b"P6":
        raise NotImplementedError("not a concatenated-PPM stream")
    frames, pos = [], 0
    while pos < len(buf):
        img, pos = _parse_ppm(buf, pos)
        frames.append(img)
    return frames


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Pure-python WAV decode → ``(sample_rate, samples)`` with
    ``samples`` shaped ``(n_frames, n_channels)`` as float64 in
    native units (int16 counts or uint8 counts re-centered to ±127).

    RIFF/WAVE is the uncompressed audio analogue of BMP: a chunked
    container (``fmt `` declares PCM layout, ``data`` carries raw
    samples) parseable with struct+numpy alone — a REAL decoder, like
    the BMP/PPM paths above. Non-PCM encodings (format tag != 1) and
    bit depths other than 8/16 raise: compressed audio needs codecs
    this container doesn't ship.
    """
    import struct

    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV format tag {audio_format}")
    if bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2
        ).astype(np.float64)
    elif bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        )
    else:
        raise NotImplementedError(f"unsupported WAV bit depth {bits}")
    frames = len(samples) // channels
    return sample_rate, samples[: frames * channels].reshape(
        frames, channels
    )


def fake_image_features(payload: bytes | None) -> list[float]:
    """Deterministic stand-in 'decoder': 8 floats derived from the md5
    of the payload bytes. Same signature/shape as a real embedder."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    digest = hashlib.md5(bytes(payload)).digest()
    return [digest[i] / 255.0 for i in range(_FEATURE_DIM)]


def image_features(payload: bytes | None) -> list[float]:
    """Feature vector per media row: REAL pixel statistics when the
    payload decodes (BMP/PPM via :func:`decode_image`), the md5
    stand-in otherwise — so mixed corpora flow through one UDF.

    Decoded features: [w/4096, h/4096, mean_r/255, mean_g/255,
    mean_b/255, std/255, aspect, 1.0] (last element flags a real
    decode)."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    try:
        img = decode_image(payload)
    except Exception:
        # unsupported format OR magic-byte coincidence on non-image
        # bytes (struct/index errors) → the md5 stand-in path
        return fake_image_features(payload)
    h, w = img.shape[0], img.shape[1]
    flat = img.astype(np.float64)
    return [
        w / 4096.0,
        h / 4096.0,
        float(flat[:, :, 0].mean()) / 255.0,
        float(flat[:, :, 1].mean()) / 255.0,
        float(flat[:, :, 2].mean()) / 255.0,
        float(flat.std()) / 255.0,
        w / h,
        1.0,
    ]


def audio_features(payload: bytes | None) -> list[float]:
    """Feature vector per audio row: REAL signal statistics when the
    payload decodes (PCM WAV via :func:`decode_wav`), the md5
    stand-in otherwise.

    Decoded features: [sample_rate/48000, duration_s, rms/32768,
    zero_crossing_rate, peak/32768, mean/32768, n_channels, 1.0]
    (last element flags a real decode; zcr = sign transitions over
    frames-1, first channel)."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    try:
        sr, samples = decode_wav(payload)
    except Exception:
        return fake_image_features(payload)
    frames, channels = samples.shape
    ch0 = samples[:, 0]
    flips = np.sum(ch0[1:] * ch0[:-1] < 0) if frames > 1 else 0
    return [
        sr / 48000.0,
        frames / sr,
        float(np.sqrt(np.mean(samples**2))) / 32768.0,
        float(flips) / max(frames - 1, 1),
        float(np.abs(samples).max()) / 32768.0,
        float(samples.mean()) / 32768.0,
        float(channels),
        1.0,
    ]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    feature_fn=image_features,
) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, schema-stable,
    partition-parallel — the real scale plumbing around the codec
    (``feature_fn``: :func:`image_features` or
    :func:`audio_features`)."""
    # double, not float: keeps the feature values bit-comparable to a
    # float64 oracle (f32 truncation shifts the 6th decimal)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[payload_col].map(feature_fn)
            yield pdf

    return df.mapInPandas(gen, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    out_col: str = "resized",
) -> DataFrame:
    """mapInPandas image resize: decode (BMP/PPM) → nearest-neighbor
    resize → re-encode as PPM. Adds ``(out_col binary, orig_w int,
    orig_h int)``; payloads that don't decode get NULLs (mixed
    corpora keep flowing — the honest-fail stays in
    :func:`decode_image` for callers who want it loud). Arrow-batched,
    partition-parallel; per-row work is pure numpy."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} binary, orig_w int, orig_h int"

    def one(payload):
        if payload is None:
            return None, None, None
        try:
            img = decode_image(payload)
        except Exception:
            return None, None, None
        return (
            encode_ppm(resize_image(img, width, height)),
            img.shape[1],
            img.shape[0],
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            cols = pdf[payload_col].map(one)
            pdf[out_col] = cols.map(lambda t: t[0])
            pdf["orig_w"] = cols.map(lambda t: t[1]).astype("Int32")
            pdf["orig_h"] = cols.map(lambda t: t[2]).astype("Int32")
            yield pdf

    return df.mapInPandas(gen, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas frame sampling — the EXPLODE-shaped multimodal op:
    one output row per kept frame ``(id_col, frame_idx, frame binary
    PPM, width int, height int)``, keeping frames ``0, every_n,
    2·every_n, …`` of each video. Payloads that don't decode emit
    zero rows (count them upstream via ``decode_video`` if loudness
    is wanted). The Arrow batch shape fans out rows — exactly how a
    real ffmpeg-backed sampler would sit in the pipeline."""
    if every_n < 1:
        raise ValueError(f"every_n must be ≥ 1, got {every_n}")
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, frame_idx int, "
        "frame binary, width int, height int"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, ws, hs = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    fr = decode_video(payload)
                except Exception:
                    continue
                for i in range(0, len(fr), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(encode_ppm(fr[i]))
                    ws.append(fr[i].shape[1])
                    hs.append(fr[i].shape[0])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return df.mapInPandas(gen, out_schema)
