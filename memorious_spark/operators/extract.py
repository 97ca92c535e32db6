"""Archive extraction: zip/tar payloads → one row per member file.

The ``extract`` op of memorious/operations/extract.py:69-97
(mime-dispatched unpack :11-28, zip/tar extractors :31-66; 7z needs an
external binary — out of scope here, gated with a clear error). The
Spark shape: a pandas UDF returning ``array<struct<...>>`` + explode,
so a 100-partition archive column unpacks fully parallel with no
driver involvement.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from fnmatch import fnmatch

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, LongType, StringType, StructField, StructType,
)

__all__ = ["extract_members", "extract_stage"]

_MEMBER_TYPE = ArrayType(
    StructType(
        [
            StructField("file_name", StringType()),
            StructField("n_bytes", LongType()),
            StructField("content", BinaryType()),
        ]
    )
)


def extract_members(payload: bytes | None, wildcard: str | None = None) -> list[dict]:
    """Pure unpack kernel: zip or tar(.gz) by sniffing magic bytes;
    optional shell-wildcard member filter (extract.py:75-80 shape)."""
    if payload is None:
        return []
    if bytes(payload[:6]) == b"7z\xbc\xaf\x27\x1c":
        # the reference shells out to the `7z` binary for these
        # (operations/extract.py:59); no such binary here — fail loud
        # instead of silently yielding zero members
        raise NotImplementedError(
            "7z archives need the external `7z` binary (reference "
            "operations/extract.py:59) — not available in this build; "
            "zip and tar(.gz) are supported"
        )
    out = []
    buf = io.BytesIO(bytes(payload))
    try:
        if bytes(payload[:4]) == b"PK\x03\x04":
            with zipfile.ZipFile(buf) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    if wildcard and not fnmatch(info.filename, wildcard):
                        continue
                    content = zf.read(info)
                    out.append(
                        dict(
                            file_name=info.filename,
                            n_bytes=len(content),
                            content=content,
                        )
                    )
        else:
            with tarfile.open(fileobj=buf, mode="r:*") as tf:
                for member in tf.getmembers():
                    if not member.isfile():
                        continue
                    if wildcard and not fnmatch(member.name, wildcard):
                        continue
                    content = tf.extractfile(member).read()
                    out.append(
                        dict(
                            file_name=member.name,
                            n_bytes=len(content),
                            content=content,
                        )
                    )
    except (zipfile.BadZipFile, tarfile.TarError, OSError):
        return []
    return out


def extract_stage(
    df: DataFrame, payload_col: str = "payload", wildcard: str | None = None
) -> DataFrame:
    """Explode archive members: each input row → one row per member,
    keeping all input columns."""

    @F.pandas_udf(_MEMBER_TYPE)
    def _unpack(payload: pd.Series) -> pd.Series:  # pragma: no cover (executor)
        return payload.map(lambda p: extract_members(p, wildcard))

    exploded = df.withColumn("_member", F.explode(_unpack(F.col(payload_col))))
    return exploded.select(
        *[c for c in df.columns if c != payload_col],
        F.col("_member.file_name").alias("file_name"),
        F.col("_member.n_bytes").alias("n_bytes"),
        F.col("_member.content").alias("content"),
    )
