"""Frontier initializers — the generator operators of the reference
(memorious/operations/initializers.py), as DataFrame sources.

The reference emits one task dict per item, optionally recursing with
a delay (sequence :35-75, dates :78-109); batch semantics collapse
each recursion into a single generated DataFrame. ``tee`` (:29-32) is
DAG fan-out — reuse one DataFrame for several downstream writes.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["seed", "enumerate_items", "sequence", "dates", "tee"]


def seed(spark: SparkSession, urls: list[str], data: dict | None = None) -> DataFrame:
    """Emit {"url": u} per configured URL; %-style templates are
    formatted against ``data`` (initializers.py:5-18)."""
    if data:
        urls = [u % data for u in urls]
    return spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, seq long"
    )


def enumerate_items(spark: SparkSession, items: list) -> DataFrame:
    """Each configured item as a row (initializers.py:21-26)."""
    return spark.createDataFrame(
        [(str(x), i) for i, x in enumerate(items)], "item string, seq long"
    )


def sequence(
    spark: SparkSession,
    start: int = 1,
    stop: int | None = None,
    step: int = 1,
    tag: str | None = None,
    store=None,
) -> DataFrame:
    """Number generator (initializers.py:35-75). The reference's
    one-by-one delayed recursion collapses into ``spark.range``.

    ``tag`` + ``store`` (a RunStore) give the cross-run once-only
    semantics of initializers.py:49-65: each emitted number is tagged
    ``<tag>:<number>`` crawler-scoped; numbers already tagged by an
    earlier run are skipped. The fresh batch is materialized BEFORE
    the tag append (the anti-join snapshot must not see its own
    write)."""
    assert stop is not None, "stop required in batch mode"
    out = spark.range(start, stop, step).select(F.col("id").alias("number"))
    if tag is not None and store is not None:
        existing = store.read_shared(spark, f"seq_{tag}", "number long")
        if existing is not None:
            out = out.join(existing.hint("shuffle_hash"), "number", "left_anti")
        out = out.persist()
        out.count()
        store.append_shared(f"seq_{tag}", out)
    return out


def dates(
    spark: SparkSession,
    begin: str | date | datetime,
    end: str | date | datetime,
    days: int = 1,
    weeks: int = 0,
) -> DataFrame:
    """Backwards date sequence from ``end`` to ``begin``
    (initializers.py:78-109): emits date + ISO string, newest first."""
    step_days = days + 7 * weeks
    assert step_days > 0
    return (
        spark.sql(
            f"""
            SELECT explode(sequence(
                to_timestamp('{end}'), to_timestamp('{begin}'),
                interval -{step_days} days)) AS date
            """
        )
        .select("date", F.date_format("date", "yyyy-MM-dd").alias("date_iso"))
    )


def tee(df: DataFrame) -> DataFrame:
    """Fan-out: same rows to every handler (initializers.py:29-32) —
    persist so each downstream branch reuses one computation."""
    return df.persist()
