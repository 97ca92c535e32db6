"""Directory-listing sources: the ftp_fetch / dav_index pattern.

The reference ops walk remote trees one task at a time —
``dav_index`` PROPFINDs a collection and re-emits itself per
sub-folder (memorious/operations/webdav.py:14-38), ``ftp_fetch``
RETRs a path with an NLST directory-listing fallback that re-emits
per entry (memorious/operations/ftp.py:13-51). Neither transport
exists in this sandbox, so — like the REST source/sink — the
transport is injectable and the RECURSION is the engine's:

- :func:`listing_source` drains the folder frontier breadth-first
  through ``list_dir(path) -> [{name, is_dir, size}]`` (the iterated-
  explode mapping SURVEY §2.1 gave these connectors), yielding one
  row per FILE with its depth and parent — a plain DataFrame feeding
  the normal pipeline. The listing walk is inherently sequential
  (each PROPFIND/NLST answer decides what to list next), but the
  accumulated rows need not live in driver memory: pass ``spool_dir``
  and file rows stream to parquet in batches, returned as an
  out-of-core DataFrame — the same escape the REST source has;
- :func:`retrieve_files` fetches file bodies executor-parallel via
  ``retrieve(path) -> bytes`` in ``mapInPandas`` (the RETR half of
  ftp_fetch), returning payload + sha1 + size columns.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["listing_source", "retrieve_files"]

LISTING_SCHEMA = "path string, parent string, depth int, size long"


def listing_source(
    spark: SparkSession,
    list_dir: Callable[[str], list[dict]],
    roots: list[str],
    max_depth: int = 32,
    max_entries: int = 1_000_000,
    spool_dir: str | None = None,
    spool_batch: int = 100_000,
) -> DataFrame:
    """BFS over folders; one row per file. Each folder is listed
    exactly once (cycle-safe on listings that repeat entries).

    ``spool_dir`` bounds driver memory: every ``spool_batch`` file
    rows flush to a parquet part there and the return value reads the
    spool back — a 10^8-file tree costs O(batch) driver memory instead
    of O(files). (The folder seen-set stays in memory: folders are
    orders of magnitude fewer than files.)"""
    rows: list[tuple] = []
    seen: set[str] = set()
    n_total = 0
    n_parts = 0

    def _flush() -> None:
        nonlocal rows, n_parts
        if not rows or spool_dir is None:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pathlib import Path

        p = Path(spool_dir)
        p.mkdir(parents=True, exist_ok=True)
        schema = pa.schema(
            [
                ("path", pa.string()), ("parent", pa.string()),
                ("depth", pa.int32()), ("size", pa.int64()),
            ]
        )
        pq.write_table(
            pa.Table.from_pylist(
                [
                    dict(path=a, parent=b, depth=c, size=d)
                    for a, b, c, d in rows
                ],
                schema=schema,
            ),
            p / f"part-{n_parts:05d}.parquet",
        )
        n_parts += 1
        rows = []

    frontier = [(r.rstrip("/"), 0) for r in roots]
    while frontier and n_total < max_entries:
        path, depth = frontier.pop(0)
        if path in seen or depth > max_depth:
            continue
        seen.add(path)
        for entry in list_dir(path):
            child = f"{path}/{entry['name']}"
            if entry.get("is_dir"):
                frontier.append((child, depth + 1))
            else:
                rows.append((child, path, depth, int(entry.get("size") or 0)))
                n_total += 1
        if spool_dir is not None and len(rows) >= spool_batch:
            _flush()
    if spool_dir is not None:
        _flush()
        if n_parts == 0:
            # zero files listed (empty tree / all over max_depth): no
            # parquet part was ever spooled, so reading the dir would
            # raise PATH_NOT_FOUND — match the in-memory path's empty DF
            return spark.createDataFrame([], LISTING_SCHEMA)
        return spark.read.schema(LISTING_SCHEMA).parquet(spool_dir)
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def retrieve_files(
    listed: DataFrame,
    retrieve: Callable[[str], bytes],
    path_col: str = "path",
) -> DataFrame:
    """Fetch each listed file's bytes executor-parallel (ftp.py RETR);
    a retrieval error yields a null payload (the reference emits a
    warning and moves on)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in listed.schema.fields
    ) + ", payload binary, content_hash string, n_bytes long"

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads, hashes, sizes = [], [], []
            for p in pdf[path_col]:
                try:
                    body = retrieve(p)
                except Exception:
                    body = None
                payloads.append(body)
                hashes.append(
                    hashlib.sha1(body).hexdigest() if body is not None else None
                )
                sizes.append(len(body) if body is not None else None)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["content_hash"] = hashes
            pdf["n_bytes"] = sizes
            yield pdf

    return listed.mapInPandas(fetch, out_schema)
