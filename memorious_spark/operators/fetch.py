"""Fetch stage: the corpus join.

The live ``requests.get`` of memorious (memorious/operations/fetch.py:
8-42, memorious/logic/http.py:180-203) becomes a join of the frontier
against the page-corpus table — same economy as the reference's
pass-content-hash-not-body handoff (SURVEY.md §3.3), but batched.

Join strategy (the 100 TB design point): Spark cannot broadcast the
left side of a LEFT OUTER join, so a naive ``frontier LEFT JOIN
corpus`` degrades to a full corpus shuffle. Instead:

- hits   = ``corpus INNER JOIN broadcast(frontier)`` — a broadcast
  hash join: ONE scan of the corpus, zero shuffle, and Spark 4's
  runtime bloom/DPP machinery can prune corpus files by the
  broadcast side's key set.
- misses = ``frontier LEFT ANTI broadcast(hit_keys)`` — the hit-key
  set is ≤ the politeness budget, always broadcastable.

Past ``_BROADCAST_MAX_ROWS`` the frontier side falls back to a
key-partitioned shuffle join (AQE handles skew); on a real deployment
the corpus is bucketed by url so even that path avoids re-shuffling
the 100 TB side.

Outcome taxonomy:
- corpus row with 2xx/3xx/4xx → emitted downstream (rules gate what
  proceeds, as in fetch.py:17-20); ``ok`` = HTTP 200.
- single-hop redirect (301/302 + redirect_to) → re-joined to the
  target row; BOTH urls enter the seen set (the reference tags
  redirect targets, fetch.py:31-33).
- missing corpus row / 5xx → transient failure → re-enqueued into the
  next round with ``attempt+1`` (the exponential-backoff retry loop of
  fetch.py:36-42 discretized to rounds), dropped after ``retries``.

``F.sha1(html)`` reproduces the reference's content hash
(memorious/logic/http.py:190-199).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["fetch_stage", "FRONTIER_COLS"]

_BROADCAST_MAX_ROWS = 2_000_000

FRONTIER_COLS = [
    "url", "url_norm", "url_hash", "host", "depth", "priority",
    "src_url", "link_idx", "emit_seq", "attempt",
]

_CORPUS_COLS = {
    "url": "f_url",
    "warc_ts": "f_warc_ts",
    "html": "f_html",
    "lang": "f_lang",
    "content_type": "f_content_type_raw",
    "status_code": "f_status",
    "redirect_to": "f_redirect_to",
}


def _prefixed(corpus: DataFrame) -> DataFrame:
    return corpus.select(*[F.col(c).alias(a) for c, a in _CORPUS_COLS.items()])


def _finalize(joined: DataFrame, redirected_from: bool) -> DataFrame:
    from_col = (
        F.col("_redir_src") if redirected_from else F.lit(None).cast("string")
    )
    return joined.select(
        *FRONTIER_COLS,
        F.col("f_url").alias("final_url"),
        from_col.alias("redirected_from"),
        F.col("f_status").alias("status_code"),
        F.lower(F.trim(F.split(F.col("f_content_type_raw"), ";").getItem(0))).alias(
            "content_type"
        ),
        F.col("f_content_type_raw").alias("content_type_raw"),
        F.col("f_warc_ts").alias("warc_ts"),
        F.col("f_lang").alias("lang"),
        F.col("f_html").alias("html"),
        F.when(F.col("f_html").isNotNull(), F.sha1(F.col("f_html"))).alias(
            "content_hash"
        ),
        (F.col("f_status") == 200).alias("ok"),
    )


def fetch_stage(
    selected: DataFrame,
    corpus: DataFrame,
    retries: int = 3,
    broadcast_frontier: bool | None = None,
    selected_count: int | None = None,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """Join the budget-selected frontier rows against the corpus.

    Returns ``(fetched, retry, persisted)``: fetched rows carry
    content + response metadata (redirects resolved); retry rows are
    frontier-shaped with ``attempt+1``; ``persisted`` DataFrames must
    be unpersisted by the caller once the round is materialized.
    """
    if broadcast_frontier is None:
        broadcast_frontier = (
            selected_count is not None and selected_count <= _BROADCAST_MAX_ROWS
        )
    maybe_bc = F.broadcast if broadcast_frontier else (lambda df: df)

    pc = _prefixed(corpus)
    hits = pc.join(
        maybe_bc(selected), pc["f_url"] == selected["url_norm"], "inner"
    )
    # NOT persisted: caching 10^5-10^6 rows of html measurably beats up
    # storage memory at high core counts; a broadcast hash join over the
    # (cached) corpus re-executes in seconds and keeps memory flat. The
    # downstream parse output IS persisted (it's 10× smaller, no html).
    hit_keys = hits.select("url_norm").distinct()
    missing = selected.join(F.broadcast(hit_keys), "url_norm", "left_anti").select(
        *FRONTIER_COLS
    )
    transient = hits.filter(F.col("f_status") >= 500).select(*FRONTIER_COLS)
    retry = (
        missing.unionByName(transient)
        .withColumn("attempt", F.col("attempt") + 1)
        .filter(F.col("attempt") <= retries)
    )

    present = hits.filter(F.col("f_status") < 500)
    direct = present.filter(
        ~F.col("f_status").isin(301, 302) | F.col("f_redirect_to").isNull()
    )
    fetched_direct = _finalize(direct, redirected_from=False)

    # Single-hop redirect resolution: one more broadcast-inner scan,
    # only for the (typically tiny) redirect subset.
    redirects = present.filter(
        F.col("f_status").isin(301, 302) & F.col("f_redirect_to").isNotNull()
    ).select(
        *FRONTIER_COLS,
        F.col("url").alias("_redir_src"),
        F.col("f_redirect_to").alias("_target"),
    )
    pc2 = _prefixed(corpus)
    rjoined = pc2.join(
        F.broadcast(redirects), pc2["f_url"] == F.col("_target"), "inner"
    )  # dangling redirects drop out of the inner join
    fetched_redirected = _finalize(rjoined, redirected_from=True)

    return fetched_direct.unionByName(fetched_redirected), retry, []
