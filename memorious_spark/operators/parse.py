"""Parse stage: vectorized HTML extraction over the fetched batch.

One Arrow-batched pandas UDF per parse config replaces the per-task
lxml work of memorious/operations/parse.py:105-119 (title + links +
meta + FTM properties) and the text decode of
memorious/logic/http.py:315-336. The UDF body delegates to the pure
kernel :mod:`memorious_spark.functions.htmlkit` — the SAME functions
the reference-faithful oracle runs, which is what makes the per-URL
extracted text byte-identical by construction.

NON_HTML mimes (memorious/logic/mime.py shape) are never DOM-parsed
(the reference's ``.html`` returns None for them,
http.py:323-336) — their text is still the decoded body.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, MapType, StringType, StructField, StructType,
)

from memorious_spark.functions import htmlkit
from memorious_spark.functions.mime import NON_HTML

__all__ = ["ParseConfig", "parse_stage", "extract_links_df"]


@dataclass(frozen=True)
class ParseConfig:
    """Driver-side parse parameters (the YAML ``params`` of a parse
    stage: meta/meta_date xpaths parse.py:72-92, schema+properties
    parse.py:95-102, include_paths/link titles parse.py:36-44)."""

    meta: dict[str, list[str]] = field(default_factory=dict)
    properties: dict[str, str] = field(default_factory=dict)
    include_paths: tuple[str, ...] | None = None
    link_titles: bool = True
    schema: str | None = None


_PARSED_TYPE = StructType(
    [
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
        StructField(
            "properties", MapType(StringType(), ArrayType(StringType()))
        ),
        StructField(
            "links",
            ArrayType(
                StructType(
                    [
                        StructField("url", StringType()),
                        StructField("link_title", StringType()),
                        StructField("idx", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def _make_parse_udf(config: ParseConfig):
    meta_paths = dict(config.meta)
    properties = dict(config.properties)
    include = list(config.include_paths) if config.include_paths else None
    link_titles = config.link_titles

    def parse_batch(
        url: pd.Series, html: pd.Series, content_type_raw: pd.Series
    ) -> pd.DataFrame:
        out = {"title": [], "text": [], "meta": [], "properties": [], "links": []}
        for u, body, ct in zip(url, html, content_type_raw):
            body = bytes(body) if body is not None else None
            text = htmlkit.extract_text(body, ct)
            mime = (ct or "").split(";", 1)[0].strip().lower()
            root = (
                htmlkit.parse_html(text)
                if text is not None and mime not in NON_HTML
                else None
            )
            out["title"].append(htmlkit.page_title(root))
            out["text"].append(text)
            out["meta"].append(htmlkit.extract_meta(root, meta_paths))
            out["properties"].append(
                htmlkit.extract_properties(root, properties)
            )
            out["links"].append(
                [
                    {"url": lu, "link_title": lt, "idx": idx}
                    for lu, lt, idx in htmlkit.extract_links(
                        root, u, include, link_titles
                    )
                ]
            )
        return pd.DataFrame(out)

    return F.pandas_udf(parse_batch, _PARSED_TYPE)


def parse_stage(fetched: DataFrame, config: ParseConfig | None = None) -> DataFrame:
    """Add ``parsed`` struct (title/text/meta/properties/links) and
    flatten it; input needs ``final_url``, ``html``,
    ``content_type_raw`` columns (fetch_stage output)."""
    config = config or ParseConfig()
    udf = _make_parse_udf(config)
    parsed = fetched.withColumn(
        "parsed", udf(F.col("final_url"), F.col("html"), F.col("content_type_raw"))
    )
    out = parsed.select(
        "*",
        F.col("parsed.title").alias("title"),
        F.col("parsed.text").alias("text"),
        F.col("parsed.meta").alias("meta"),
        F.col("parsed.properties").alias("properties"),
        F.col("parsed.links").alias("links"),
    ).drop("parsed")
    if config.schema is not None:
        out = out.withColumn("schema", F.lit(config.schema))
    return out


def clean_html_udf(remove_paths: list[str]):
    """clean_html op (memorious/operations/clean.py:11-26): drop DOM
    subtrees matching remove_paths, re-serialize. Returns a
    (html binary, content_type_raw string) → cleaned html string UDF."""
    paths = list(remove_paths)

    @F.pandas_udf(StringType())
    def _clean(html: pd.Series, ct: pd.Series) -> pd.Series:  # pragma: no cover
        return pd.Series(
            [
                htmlkit.clean_html(
                    htmlkit.extract_text(
                        bytes(b) if b is not None else None, c
                    ),
                    paths,
                )
                for b, c in zip(html, ct)
            ]
        )

    return _clean


def extract_links_df(parsed: DataFrame) -> DataFrame:
    """Explode outbound links → candidate rows for the next frontier
    round. Base-URL resolution already happened inside the UDF
    (urljoin against the post-redirect final_url, as the reference
    resolves against response.url, parse.py:45)."""
    return parsed.select(
        F.col("final_url").alias("src_url"),
        F.col("emit_seq").alias("src_emit_seq"),
        (F.col("depth") + 1).alias("depth"),
        F.explode("links").alias("link"),
    ).select(
        F.col("link.url").alias("url"),
        F.col("link.link_title").alias("link_title"),
        F.col("link.idx").alias("link_idx"),
        "src_url",
        "src_emit_seq",
        "depth",
    )
