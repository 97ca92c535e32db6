"""Deterministic synthetic web corpus (the "web" the engine crawls).

The corpus stands in for live HTTP (memorious/operations/fetch.py:8-42)
per the BASELINE input hint: a table of Common-Crawl-style pages
``(url, warc_ts, html binary, text, lang)`` plus a ``page_meta``
sidecar ``(url, content_type, status_code, redirect_to)``.

Everything is a pure function of ``(doc_id, n_docs)`` — no RNG, no
wall clock — so that:

1. the Spark generator (``mapInPandas`` over the driver-provided
   ``documents`` table) and the driver-side oracle build literally the
   same bytes, and
2. the link graph is arithmetic (`LINK_STRIDES`), making the full BFS
   crawl SQL-expressible as a DuckDB recursive CTE — the strongest
   end-to-end correctness oracle the driver can run.

Page taxonomy (priority order, all mod-rules on ``doc_id``):
- ``% 23 == 0`` → 404, empty body
- ``% 19 == 0`` → 301 redirect to ``(doc_id+1) % n`` (never chains:
  19 ∤ doc_id+1 when 19 | doc_id)
- ``% 17 == 0`` → application/pdf body (NON_HTML → parsed to no links)
- else         → 200 text/html with links/meta/title

HTML pages link to ``(7·d + s) % n`` for strides ``s ∈ {1, 12, 23}``
via ``<a>``, plus an ``<img>`` to ``(7·d + 34) % n`` and (every 2nd
page) an ``<iframe>`` to ``(7·d + 45) % n``; every 4th page has a
``<link href="/assets/style.css">`` that resolves to a URL **absent
from the corpus** (exercises fetch-miss retry/drop). The first anchor
is duplicated (exercises per-page first-wins dedup) and is relative
when the target lives on the same host. Charsets rotate
utf-8/utf-16/iso-8859-1 to exercise decode fidelity
(memorious/logic/http.py:261-268).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memorious_spark.functions.htmlkit import extract_text

__all__ = [
    "N_HOSTS",
    "LINK_STRIDES",
    "doc_host",
    "doc_url",
    "page_record",
    "build_corpus",
    "seed_urls",
]

N_HOSTS = 7
LINK_STRIDES = (1, 12, 23)  # <a> anchors
IMG_STRIDE = 34
IFRAME_STRIDE = 45
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def doc_host(doc_id: int, hot_mod: int | None = None) -> str:
    """Host for a doc. ``hot_mod=k`` routes every k-th doc to one hot
    host (skew/salting tests); default is uniform over N_HOSTS."""
    if hot_mod is not None and doc_id % hot_mod == 0:
        return "hot.example.com"
    return f"h{doc_id % N_HOSTS}.example.com"


def doc_url(doc_id: int, hot_mod: int | None = None) -> str:
    return f"https://{doc_host(doc_id, hot_mod)}/doc/{doc_id}"


def _charset(doc_id: int) -> str:
    m = doc_id % 5
    if m == 3:
        return "utf-16"
    if m == 4:
        return "iso-8859-1"
    return "utf-8"


def page_record(
    doc_id: int,
    n_docs: int,
    text: str | None,
    lang: str | None,
    hot_mod: int | None = None,
    redirects: bool = True,
) -> dict:
    """Build one corpus row (pages ∪ page_meta columns) deterministically.

    ``redirects=False`` turns the %19 redirect rows into plain HTML —
    used by oracles that need an order-independent frontier set
    (whether a redirect target gets its own frontier row depends on
    emit order, which plain SQL can't express)."""
    url = doc_url(doc_id, hot_mod)
    warc_ts = EPOCH + timedelta(seconds=doc_id)
    base = dict(url=url, warc_ts=warc_ts, lang=lang)
    if doc_id % 23 == 0:
        return dict(
            **base, html=None, text=None,
            content_type="text/html", status_code=404, redirect_to=None,
        )
    if redirects and doc_id % 19 == 0:
        return dict(
            **base, html=None, text=None,
            content_type="text/html", status_code=301,
            redirect_to=doc_url((doc_id + 1) % n_docs, hot_mod),
        )
    if doc_id % 17 == 0:
        body = ("%PDF-1.4\n" + (text or "")).encode("utf-8", errors="replace")
        return dict(
            **base, html=body,
            text=extract_text(body, "application/pdf"),
            content_type="application/pdf", status_code=200, redirect_to=None,
        )
    cs = _charset(doc_id)
    host = doc_host(doc_id, hot_mod)
    anchors = []
    for k, stride in enumerate(LINK_STRIDES):
        nb = (7 * doc_id + stride) % n_docs
        nb_url = doc_url(nb, hot_mod)
        href = f"/doc/{nb}" if doc_host(nb, hot_mod) == host else nb_url
        anchors.append(f'<a href="{href}">to {nb}</a>')
        if k == 0:  # duplicate first anchor → per-page dedup exercise
            anchors.append(f'<a href="{href}">dup {nb}</a>')
    img = f'<img src="{doc_url((7 * doc_id + IMG_STRIDE) % n_docs, hot_mod)}"/>'
    iframe = (
        f'<iframe src="{doc_url((7 * doc_id + IFRAME_STRIDE) % n_docs, hot_mod)}">'
        "</iframe>"
        if doc_id % 2 == 0
        else ""
    )
    css = '<link href="/assets/style.css" rel="stylesheet"/>' if doc_id % 4 == 0 else ""
    html_text = (
        f'<html><head><meta charset="{cs}"/>'
        f"<title>Doc {doc_id} — {host}</title>"
        f'<meta name="author" content="Author {doc_id % 13}"/>'
        f'<meta property="og:title" content="OG {doc_id}"/>'
        f"{css}</head><body><h1>Doc {doc_id}</h1>"
        f"<p>{text or ''}</p>{''.join(anchors)}{img}{iframe}</body></html>"
    )
    body = html_text.encode(cs, errors="replace")
    content_type_raw = f"text/html; charset={cs}"
    return dict(
        **base, html=body,
        text=extract_text(body, content_type_raw),
        content_type=content_type_raw, status_code=200, redirect_to=None,
    )


_CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "content_type string, status_code int, redirect_to string"
)
_COLS = [
    "url", "warc_ts", "html", "text", "lang",
    "content_type", "status_code", "redirect_to",
]


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    n_docs: int,
    hot_mod: int | None = None,
    replicate: int = 1,
    redirects: bool = True,
) -> DataFrame:
    """Corpus DataFrame from a ``documents``-shaped input (doc_id, text, lang).

    ``replicate=K`` scales the corpus K× deterministically
    (doc_id' = doc_id + k·n) for bench runs — the link arithmetic then
    spans the full K·n id space. Generation is ``mapInPandas``
    (Arrow-batched, no per-row Python at the Spark API layer), fully
    parallel across partitions.
    """
    total = n_docs * replicate
    src = docs.select("doc_id", "text", "lang")
    if replicate > 1:
        rep = spark.range(replicate).select(F.col("id").alias("rep"))
        src = src.crossJoin(rep).select(
            (F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("doc_id"),
            "text",
            "lang",
        )
    # a small-sf documents.parquet is a single split and broadcast
    # crossJoin preserves partitioning — without this respread, every
    # downstream mapInPandas (and the fetch-join output feeding parse)
    # runs on 1-2 partitions, i.e. nearly single-threaded
    n_parts = max(
        spark.sparkContext.defaultParallelism, (total + 49_999) // 50_000
    )
    src = src.repartition(n_parts, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                page_record(int(r.doc_id), total, r.text, r.lang, hot_mod, redirects)
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(rows, columns=_COLS)

    return src.mapInPandas(gen, _CORPUS_SCHEMA)


def seed_urls(n_seeds: int = 3, hot_mod: int | None = None) -> list[str]:
    """Deterministic seed list: the first ``n_seeds`` doc URLs."""
    return [doc_url(i, hot_mod) for i in range(n_seeds)]
