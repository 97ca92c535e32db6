"""Paginated external-API source: the documentcloud_query pattern.

The reference op (memorious/operations/documentcloud.py:38-104) walks
a search API page by page (self-recursion with ``page + 1`` while
results keep coming), emits one task per document, and in incremental
mode skips documents whose ``(foreign_id, content_hash)`` tag exists;
``documentcloud_mark_processed`` (:107-121) sets that tag after
downstream processing.

Spark re-expression (the connector pattern SURVEY §2.1 mapped these
to): pagination is inherently sequential driver-side I/O — each page
is fetched once through an injectable transport, lands as rows, and
the INCREMENTAL SKIP is the batch anti-join against the crawler's
``processed`` tags (operators.tags) rather than a per-document KV
probe. For sources too large for driver memory the page loop writes
page-sized parquet appends instead of accumulating (``spool_dir``);
either way the result is a plain DataFrame feeding the normal
pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from memorious_spark.operators.tags import check_tags, set_tags

__all__ = ["paginated_source", "skip_processed", "mark_processed"]


def paginated_source(
    spark: SparkSession,
    fetch_page: Callable[[int], list[dict]],
    schema: str,
    start_page: int = 1,
    max_pages: int = 10_000,
    spool_dir: str | None = None,
) -> DataFrame:
    """Drain ``fetch_page(page)`` until it returns no rows (the
    ``recurse``-with-``page+1`` loop of documentcloud.py:96-103),
    producing one DataFrame. With ``spool_dir`` each page appends to
    parquet immediately — constant driver memory for arbitrarily long
    result sets — and the return value reads the spool."""
    page = start_page
    rows: list[dict] = []
    wrote = False
    while page < start_page + max_pages:
        batch = fetch_page(page)
        if not batch:
            break
        if spool_dir is not None:
            spark.createDataFrame(batch, schema).write.mode("append").parquet(
                spool_dir
            )
            wrote = True
        else:
            rows.extend(batch)
        page += 1
    if spool_dir is not None:
        if not wrote:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(spool_dir)
    return spark.createDataFrame(rows, schema)


def skip_processed(
    spark: SparkSession,
    store,
    docs: DataFrame,
    crawler: str,
    key_cols: tuple[str, str] = ("foreign_id", "content_hash"),
    now_ts: str | None = None,
) -> DataFrame:
    """Incremental skip (documentcloud.py:63-67): drop documents whose
    processed tag exists and is unexpired."""
    keyed = docs.withColumn(
        "_pkey", F.concat_ws(":", *[F.col(c) for c in key_cols])
    )
    flagged = check_tags(
        spark, store, keyed, crawler, "processed", key_col="_pkey",
        now_ts=now_ts,
    )
    return flagged.filter(~F.col("tagged")).drop("tagged", "_pkey")


def mark_processed(
    spark: SparkSession,
    store,
    docs: DataFrame,
    crawler: str,
    key_cols: tuple[str, str] = ("foreign_id", "content_hash"),
    run_id: str = "run",
    expire_days: int | None = None,
    now_ts: str = "2024-01-01 00:00:00",
) -> None:
    """documentcloud_mark_processed (:107-121): persist the processed
    tag for every row, so later incremental runs skip them."""
    keyed = docs.select(
        F.concat_ws(":", *[F.col(c) for c in key_cols]).alias("_pkey")
    ).distinct()
    set_tags(
        store, keyed, crawler, "processed", key_col="_pkey",
        run_id=run_id, expire_days=expire_days, now_ts=now_ts,
    )
