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
  the normal pipeline;
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
) -> DataFrame:
    """BFS over folders; one row per file. Each folder is listed
    exactly once (cycle-safe on listings that repeat entries)."""
    rows: list[tuple] = []
    seen: set[str] = set()
    frontier = [(r.rstrip("/"), 0) for r in roots]
    while frontier and len(rows) < max_entries:
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
