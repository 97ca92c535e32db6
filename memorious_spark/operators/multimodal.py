"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
partition flow, deterministic partitioning by content hash) is real
and tested; the codec work itself is STUBBED — the decode libraries
(Pillow/ffmpeg/librosa) are not in this container. ``decode_image``
raises NotImplementedError by design; ``fake_image_features`` is the
deterministic stand-in that exercises the identical plumbing
(bytes → fixed-length float vector) so swapping in a real decoder is
a one-function change.
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
    "fake_image_features",
    "extract_features",
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
    """Real image decode — STUB: no imaging library in this container.

    The production implementation decodes ``payload`` to HWC uint8;
    everything downstream (feature UDF signature, batch shape,
    schema) is already wired for it.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use fake_image_features for plumbing tests"
    )


def fake_image_features(payload: bytes | None) -> list[float]:
    """Deterministic stand-in 'decoder': 8 floats derived from the md5
    of the payload bytes. Same signature/shape as a real embedder."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    digest = hashlib.md5(bytes(payload)).digest()
    return [digest[i] / 255.0 for i in range(_FEATURE_DIM)]


def extract_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "features"
) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, schema-stable,
    partition-parallel — the real scale plumbing around the stubbed
    codec."""
    # double, not float: keeps the feature values bit-comparable to a
    # float64 oracle (f32 truncation shifts the 6th decimal)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[payload_col].map(fake_image_features)
            yield pdf

    return df.mapInPandas(gen, out_schema)
