"""WARC read/write — the web-archive interchange format (ISO 28500).

Common Crawl, Internet Archive, and every large webtext corpus ship
as WARC: a concatenation of records, each a ``WARC/1.0`` header block
(CRLF-separated ``Name: value`` lines, ``Content-Length`` giving the
payload size) followed by the payload bytes and a blank-line
separator. The reference engine stores fetched pages as loose
blob+JSON pairs (memorious/logic/archive.py); WARC is what a crawl
at scale actually has to emit and what a training-data pipeline has
to ingest, so the engine supports both directions.

Scale posture:

- **Write**: one ``.warc`` file per Spark partition, streamed through
  ``pyarrow.fs`` (works on object storage exactly like
  ``directory_sink``). The writer is ``mapInPandas`` over the full
  partition iterator — one open file handle per task, Arrow batches
  in, bytes out, one summary row back. No driver involvement, no
  collect.
- **Read**: WARC is not splittable mid-stream without a sidecar index
  (records are length-prefixed, not delimited — you cannot seek into
  the middle; this is why Common Crawl ships ``.warc.paths`` +
  ``cdx`` indexes). Parallelism is therefore per-FILE: ``binaryFile``
  scan → ``mapInPandas`` record parser. Shard your archives at the
  ~1 GiB the ecosystem uses and a 1000-executor cluster reads 100 TB
  with every core busy; one giant file would serialize — documented,
  not hidden.
- Determinism: ``WARC-Record-ID`` is derived from sha1(uri, payload),
  ``WARC-Date`` comes from the caller's timestamp column — no wall
  clock, no uuid4 — so write → read round-trips are bit-stable and
  oracle-checkable.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["write_warc", "read_warc", "WARC_RECORD_SCHEMA"]

_CRLF = b"\r\n"

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("warc_file", StringType()),
    ]
)

_WRITE_SUMMARY_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("n_records", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fs_for(path: str):
    # same driver-side URI normalization as directory_sink: relative
    # paths become absolute file:// before pyarrow sees them
    import os

    from pyarrow import fs as pafs

    if "://" not in path:
        path = "file://" + os.path.abspath(path)
    return pafs.FileSystem.from_uri(path)


def _record_bytes(
    uri: str, date: str, ctype: str, payload: bytes, warc_type: str
) -> bytes:
    rid = hashlib.sha1(
        uri.encode("utf-8") + b"\x00" + payload
    ).hexdigest()
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: <urn:sha1:" + rid.encode() + b">",
        b"WARC-Date: " + date.encode(),
        b"WARC-Target-URI: " + uri.encode("utf-8"),
        b"Content-Type: " + ctype.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return _CRLF.join(head) + _CRLF * 2 + payload + _CRLF * 2


def write_warc(
    df: DataFrame,
    path: str,
    uri_col: str = "uri",
    payload_col: str = "payload",
    date_col: str | None = None,
    content_type_col: str | None = None,
    warc_type: str = "resource",
    prefix: str = "part",
) -> DataFrame:
    """Write one ``<prefix>-NNNNN.warc`` file per partition of ``df``
    under ``path`` (any ``pyarrow.fs`` URI). Returns the per-file
    summary DataFrame ``(warc_file, n_records, n_bytes)`` — an ACTION
    has not run yet; the caller materializes it.

    ``date_col``/``content_type_col`` default to constant
    ``1970-01-01T00:00:00Z`` / ``application/octet-stream`` when
    absent, keeping output a pure function of the data."""
    fs, root = _fs_for(path)
    fs.create_dir(root, recursive=True)
    sel = [
        F.col(uri_col).cast("string").alias("uri"),
        F.col(payload_col).cast("binary").alias("payload"),
        (
            F.col(date_col) if date_col else F.lit("1970-01-01T00:00:00Z")
        ).cast("string").alias("date"),
        (
            F.col(content_type_col)
            if content_type_col
            else F.lit("application/octet-stream")
        ).cast("string").alias("ctype"),
    ]

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"{root}/{prefix}-{pid:05d}.warc"
        wfs, wroot = _fs_for(path)
        n = 0
        total = 0
        out = wfs.open_output_stream(f"{wroot}/{prefix}-{pid:05d}.warc")
        try:
            for b in batches:
                for uri, payload, date, ctype in zip(
                    b["uri"], b["payload"], b["date"], b["ctype"]
                ):
                    rec = _record_bytes(
                        uri, date, ctype, bytes(payload), warc_type
                    )
                    out.write(rec)
                    n += 1
                    total += len(rec)
        finally:
            out.close()
        if n == 0:
            wfs.delete_file(f"{wroot}/{prefix}-{pid:05d}.warc")
            return
        yield pd.DataFrame(
            {"warc_file": [fname], "n_records": [n], "n_bytes": [total]}
        )

    return df.select(*sel).mapInPandas(_write, _WRITE_SUMMARY_SCHEMA)


def _parse_warc_bytes(blob: bytes, fname: str) -> Iterator[dict]:
    buf = io.BytesIO(blob)
    while True:
        line = buf.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"{fname}: expected WARC version line, got {line[:40]!r}"
            )
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if h in (_CRLF, b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        payload = buf.read(length)
        if len(payload) != length:
            raise ValueError(
                f"{fname}: truncated record (want {length} bytes, "
                f"got {len(payload)})"
            )
        yield {
            "uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "content_type": headers.get("content-type"),
            "payload": payload,
            "warc_file": fname,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``path`` (glob ok) for ``.warc`` files and return one row
    per record with :data:`WARC_RECORD_SCHEMA`. File-level
    parallelism (see module docstring); malformed records raise with
    the file name — a corrupt archive fails loud, never truncates
    silently."""
    files = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for fpath, blob in zip(b["path"], b["content"]):
                rows = list(_parse_warc_bytes(bytes(blob), fpath))
                if rows:
                    yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        _parse, WARC_RECORD_SCHEMA
    )
