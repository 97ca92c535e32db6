"""Sinks: directory store and the db upsert.

- ``directory_sink`` reproduces the blob + JSON-sidecar layout of
  memorious/operations/store.py:42-70 (`<path>/<crawler>/
  <content_hash>.data` + `<content_hash>.json`) via foreachPartition —
  executor-side writes, no driver collect. File-per-blob is a fidelity
  shape for small runs; at corpus scale results stay relational
  (parquet round snapshots in RunStore).
- ``merge_upsert`` is the ``db`` op (memorious/operations/db.py:9-22):
  update-by-unique-keys else insert, stamping ``__first_seen`` /
  ``__last_seen``. Expressed as a full-outer-shaped DataFrame merge
  (Iceberg MERGE INTO on a real catalog); timestamps passed in, never
  wall-clock, for determinism.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

__all__ = ["directory_sink", "merge_upsert"]


def directory_sink(
    results: DataFrame, path: str, crawler: str, text_col: str = "text"
) -> int:
    """Write one ``<content_hash>.data`` + ``<content_hash>.json`` per
    row under ``<path>/<crawler>/`` (store.py:42-70 layout). Returns
    rows written. Executor-side foreachPartition — the driver never
    sees row data."""
    out_dir = os.path.join(path, crawler)
    os.makedirs(out_dir, exist_ok=True)
    cols = [c for c in results.columns if c not in ("html",)]
    slim = results.select(*cols).filter(F.col("content_hash").isNotNull())

    def write_partition(rows):
        for row in rows:
            d = row.asDict(recursive=True)
            ch = d["content_hash"]
            text = d.get(text_col)
            with open(os.path.join(out_dir, f"{ch}.data"), "w") as fh:
                fh.write(text or "")
            meta = {
                k: (v.isoformat() if hasattr(v, "isoformat") else v)
                for k, v in d.items()
                if k != text_col
            }
            with open(os.path.join(out_dir, f"{ch}.json"), "w") as fh:
                json.dump(meta, fh, sort_keys=True)

    slim.foreachPartition(write_partition)
    return slim.count()


def merge_upsert(
    existing: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    now: str,
) -> DataFrame:
    """Upsert ``batch`` into ``existing`` on ``keys`` with
    first/last-seen stamping (db.py:9-22 semantics):

    - new key → insert, ``__first_seen = __last_seen = now``
    - existing key → non-key columns take the batch values,
      ``__last_seen = now``, ``__first_seen`` preserved.

    On an Iceberg catalog this compiles to MERGE INTO; the
    parquet-fallback implementation below is the same logical plan
    (anti-join survivors ∪ refreshed matches) and shuffles only on
    the merge keys.
    """
    ts = F.to_timestamp(F.lit(now))
    batch = batch.dropDuplicates(keys)
    if existing is None:
        return batch.withColumn("__first_seen", ts).withColumn("__last_seen", ts)
    data_cols = [c for c in batch.columns if c not in keys]
    b = batch.select(
        *keys, *[F.col(c).alias(f"_new_{c}") for c in data_cols]
    ).withColumn("_matched", F.lit(True))
    joined = existing.join(b, keys, "left")
    refreshed = joined.select(
        *keys,
        *[
            F.when(F.col("_matched"), F.col(f"_new_{c}")).otherwise(F.col(c)).alias(c)
            for c in data_cols
        ],
        F.col("__first_seen"),
        F.when(F.col("_matched"), ts).otherwise(F.col("__last_seen")).alias(
            "__last_seen"
        ),
    )
    inserts = (
        batch.join(existing.select(*keys), keys, "left_anti")
        .withColumn("__first_seen", ts)
        .withColumn("__last_seen", ts)
    )
    return refreshed.unionByName(inserts)
