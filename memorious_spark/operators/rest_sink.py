"""External-API sinks: the aleph_* upload pattern as a partition-
parallel REST emitter with an injectable transport.

The reference ops (memorious/operations/aleph.py:54-136,
documentcloud.py:107-121) upload each stored row to a remote API with
(a) a tag-cached skip for already-uploaded (foreign_id, content_hash)
pairs, (b) bounded retries with exponential backoff on transient
errors, (c) a global rate limit. Re-expressed Spark-side:

- the skip cache is a batch ANTI-JOIN against the crawler's uploaded
  table (the per-url ``get_tag`` probe of aleph.py:63-66, vectorized),
- the upload loop runs in ``mapInPandas`` — executor-parallel, one
  transport call per row, retry/backoff per row (aleph.py:83-102) —
  and RETURNS an outcome row per attempt-set, so the upload results
  land as a DataFrame (appendable to the uploaded table, completing
  the set_tag half of the cycle),
- the rate limit becomes rows-per-partition-batch pacing: the caller
  bounds the input (politeness budget upstream) instead of sleeping
  executors.

There is no live Aleph in this environment, so the TRANSPORT is a
parameter: any picklable ``send(meta: dict) -> dict`` (returning at
least ``{"id": ...}``; raising ``TransientApiError`` triggers the
retry path, any other exception fails the row). The tests inject a
filesystem-backed fake; a real deployment injects an HTTP client.
This is the pattern SURVEY §2.5 mapped the aleph ops to
("foreachPartition REST client") — with mapInPandas so outcomes stay
relational.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "TransientApiError", "rest_emit", "rest_emit_waves",
    "aleph_emit_documents",
    "aleph_folders", "aleph_emit_entities",
]

UPLOAD_OUT_SCHEMA = (
    "foreign_id string, content_hash string, remote_id string, "
    "status string, attempts int"
)


class TransientApiError(Exception):
    """Retryable API failure (AlephException.transient analogue)."""


def rest_emit(
    rows: DataFrame,
    send: Callable[[dict], dict],
    retries: int = 3,
    backoff_base: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
    key_cols: tuple[str, ...] = ("foreign_id", "content_hash"),
) -> DataFrame:
    """Emit every row to ``send`` with per-row retry/backoff
    (aleph.py:83-102: ``2**attempt`` seconds between transient
    failures); returns one outcome row per input row, keyed by
    ``key_cols`` (documents key on (foreign_id, content_hash),
    entities on (foreign_id, entity_id), folders on foreign_id)."""
    keys = list(key_cols)
    out_schema = ", ".join(f"{c} string" for c in keys) + (
        ", remote_id string, status string, attempts int"
    )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                attempts = 0
                status, remote_id = "error", None
                while attempts <= retries:
                    attempts += 1
                    try:
                        res = send(rec)
                        remote_id = str(res.get("id"))
                        status = "uploaded"
                        break
                    except TransientApiError:
                        if attempts > retries:
                            status = "transient_exhausted"
                            break
                        sleep(backoff_base ** attempts)
                    except Exception:
                        status = "error"
                        break
                out.append(
                    {
                        **{c: rec.get(c) for c in keys},
                        "remote_id": remote_id,
                        "status": status,
                        "attempts": attempts,
                    }
                )
            yield pd.DataFrame(
                out, columns=keys + ["remote_id", "status", "attempts"]
            )

    return rows.mapInPandas(emit, out_schema)


def rest_emit_waves(
    rows: DataFrame,
    send: Callable[[dict], dict],
    retries: int = 3,
    backoff_base: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
    key_cols: tuple[str, ...] = ("foreign_id", "content_hash"),
) -> DataFrame:
    """:func:`rest_emit` with the engine's no-executor-sleeps posture:
    each WAVE emits every pending row exactly once (zero in-executor
    retries), transiently-failed rows are re-joined into the next
    wave, and the ``2**attempt`` backoff (aleph.py:83-102) is slept
    ONCE on the driver between waves — executor slots stay free for
    other work instead of blocking per-row. Outcome contract matches
    :func:`rest_emit` (``attempts`` = waves the row participated in);
    rows still transient after ``retries`` waves return
    ``transient_exhausted``, exactly like the in-executor loop."""
    keys = list(key_cols)
    pending = rows
    done: list[DataFrame] = []
    wave = 0
    while True:
        wave += 1
        out = rest_emit(
            pending, send, retries=0, backoff_base=backoff_base,
            sleep=sleep, key_cols=key_cols,
        ).withColumn("attempts", F.lit(wave)).persist()
        out.count()
        settled = out.filter(F.col("status") != "transient_exhausted")
        parked = out.filter(F.col("status") == "transient_exhausted")
        if wave > retries or not parked.head(1):
            done.append(out)  # final wave: leftover transients surface
            break
        done.append(settled)
        pending = pending.join(parked.select(*keys), keys, "left_semi")
        sleep(backoff_base ** wave)  # driver-side, not an executor slot
    result = done[0]
    for d in done[1:]:
        result = result.unionByName(d)
    return result


def aleph_emit_documents(
    spark: SparkSession,
    store,
    results: DataFrame,
    send: Callable[[dict], dict],
    collection: str,
    retries: int = 3,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """The aleph_emit_document cycle over a stored-results batch:

    1. foreign_id = url (aleph.py:60-61), metadata projected from the
       result row (title/mime/source_url, _create_meta_object shape);
    2. rows whose (foreign_id, content_hash) already live in the
       crawler's ``uploaded_<collection>`` table SKIP the API call
       (the get_tag cache probe, aleph.py:63-70) — batch anti-join;
    3. the rest upload via :func:`rest_emit`;
    4. successful outcomes append to ``uploaded_<collection>`` (the
       set_tag half, aleph.py:92-93).
    Returns the outcome DataFrame (uploaded + skipped rows).
    """
    table = f"uploaded_{collection}"
    meta_rows = results.select(
        F.coalesce(F.col("url")).alias("foreign_id"),
        "content_hash",
        F.struct("title", "content_type", F.col("url").alias("source_url")).alias(
            "_meta"
        ),
    ).filter(F.col("content_hash").isNotNull())

    uploaded = store.read_shared(spark, table)
    if uploaded is not None:
        seen_keys = uploaded.select("foreign_id", "content_hash").distinct()
        fresh = meta_rows.join(
            seen_keys.hint("shuffle_hash"), ["foreign_id", "content_hash"],
            "left_anti",
        )
        skipped = meta_rows.join(
            seen_keys.hint("shuffle_hash"), ["foreign_id", "content_hash"],
            "left_semi",
        ).select(
            "foreign_id", "content_hash",
            F.lit(None).cast("string").alias("remote_id"),
            F.lit("skipped_cached").alias("status"),
            F.lit(0).alias("attempts"),
        )
    else:
        fresh, skipped = meta_rows, None

    outcomes = rest_emit(
        fresh.select("foreign_id", "content_hash", "_meta.*"),
        send, retries=retries, sleep=sleep,
    ).persist()
    ok = outcomes.filter(F.col("status") == "uploaded").select(
        "foreign_id", "content_hash", "remote_id"
    )
    store.append_shared(table, ok)
    return outcomes if skipped is None else outcomes.unionByName(skipped)


def aleph_folders(
    spark: SparkSession,
    store,
    folders: DataFrame,
    send: Callable[[dict], dict],
    collection: str,
    retries: int = 3,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """``aleph_folder`` (aleph.py:105-137) as a distinct payload shape:
    one FOLDER document per ``foreign_id`` row — metadata only, no
    content hash, ``sync`` semantics — whose returned id is the
    ``aleph_folder_id`` children later parent against
    (``meta["parent"] = {"id": …}``, aleph.py:44-45).

    Cache key is the bare foreign_id (set_tag(make_key(collection,
    foreign_id)), aleph.py:128): already-created folders skip the API
    and replay their cached folder id, so children can still parent
    against them. Returns outcomes keyed (foreign_id) with
    ``remote_id`` = folder id.
    """
    table = f"uploaded_folders_{collection}"
    cols = set(folders.columns)
    rows = folders.select(
        "foreign_id",
        *[
            (F.col(c) if c in cols else F.lit(None).cast("string")).alias(c)
            for c in ("title", "file_name", "source_url")
        ],
        F.lit(True).alias("folder"),
    ).filter(F.col("foreign_id").isNotNull())

    cached = store.read_shared(spark, table)
    if cached is not None:
        keys = cached.select("foreign_id", "remote_id").distinct()
        fresh = rows.join(
            keys.select("foreign_id").hint("shuffle_hash"),
            "foreign_id", "left_anti",
        )
        skipped = rows.join(
            F.broadcast(keys), "foreign_id", "inner"
        ).select(
            "foreign_id",
            F.col("remote_id"),  # cached folder id — replayed, not re-made
            F.lit("skipped_cached").alias("status"),
            F.lit(0).alias("attempts"),
        )
    else:
        fresh, skipped = rows, None

    outcomes = rest_emit(
        fresh, send, retries=retries, sleep=sleep, key_cols=("foreign_id",)
    ).persist()
    ok = outcomes.filter(F.col("status") == "uploaded").select(
        "foreign_id", "remote_id"
    )
    store.append_shared(table, ok)
    return outcomes if skipped is None else outcomes.unionByName(skipped)


def aleph_emit_entities(
    spark: SparkSession,
    store,
    entities: DataFrame,
    send: Callable[[dict], dict],
    collection: str,
    retries: int = 3,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """``aleph_emit_entity`` (aleph.py:139-190) as a distinct payload
    shape: FollowTheMoney entities ``{"schema", "properties"}`` written
    under ``entity_id``; cache key (foreign_id, entity_id) — cached
    entities skip with their stored remote id (aleph.py:151-159).

    ``entities`` needs (entity_id, foreign_id, schema,
    properties map<string,array<string>>). Returns outcomes keyed
    (foreign_id, entity_id).
    """
    table = f"uploaded_entities_{collection}"
    rows = entities.select(
        "foreign_id", "entity_id", "schema", "properties"
    ).filter(F.col("entity_id").isNotNull())

    cached = store.read_shared(spark, table)
    if cached is not None:
        keys = cached.select("foreign_id", "entity_id", "remote_id").distinct()
        fresh = rows.join(
            keys.select("foreign_id", "entity_id").hint("shuffle_hash"),
            ["foreign_id", "entity_id"], "left_anti",
        )
        skipped = rows.join(
            F.broadcast(keys), ["foreign_id", "entity_id"], "inner"
        ).select(
            "foreign_id", "entity_id", "remote_id",
            F.lit("skipped_cached").alias("status"),
            F.lit(0).alias("attempts"),
        )
    else:
        fresh, skipped = rows, None

    outcomes = rest_emit(
        fresh, send, retries=retries, sleep=sleep,
        key_cols=("foreign_id", "entity_id"),
    ).persist()
    ok = outcomes.filter(F.col("status") == "uploaded").select(
        "foreign_id", "entity_id", "remote_id"
    )
    store.append_shared(table, ok)
    return outcomes if skipped is None else outcomes.unionByName(skipped)
