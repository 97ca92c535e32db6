"""Paginated REST source + processed-tag incremental skip
(documentcloud_query / documentcloud_mark_processed pattern,
memorious/operations/documentcloud.py:38-121)."""

from memorious_spark.plans.storage import RunStore
from memorious_spark.sources.rest_source import (
    mark_processed, paginated_source, skip_processed,
)

SCHEMA = "foreign_id string, content_hash string, title string"


def _pager(pages):
    calls = []

    def fetch(page):
        calls.append(page)
        return pages.get(page, [])

    return fetch, calls


def test_paginated_source_drains_until_empty(spark):
    pages = {
        1: [{"foreign_id": "d1", "content_hash": "h1", "title": "A"}],
        2: [{"foreign_id": "d2", "content_hash": "h2", "title": "B"},
            {"foreign_id": "d3", "content_hash": "h3", "title": "C"}],
    }
    fetch, calls = _pager(pages)
    df = paginated_source(spark, fetch, SCHEMA)
    assert sorted(r["foreign_id"] for r in df.collect()) == ["d1", "d2", "d3"]
    assert calls == [1, 2, 3]  # stopped on the first empty page


def test_spooled_source_and_incremental_skip(spark, tmp_path):
    pages = {
        1: [{"foreign_id": f"d{i}", "content_hash": f"h{i}", "title": "t"}
            for i in range(4)],
    }
    fetch, _ = _pager(pages)
    df = paginated_source(
        spark, fetch, SCHEMA, spool_dir=str(tmp_path / "spool")
    )
    assert df.count() == 4

    store = RunStore(tmp_path, "dc", "r1")
    # run 1 processes d0,d1 and marks them
    first = skip_processed(spark, store, df, "dc")
    assert first.count() == 4  # nothing marked yet
    mark_processed(
        spark, store, df.filter("foreign_id in ('d0','d1')"), "dc",
        run_id="r1", now_ts="2024-01-02 00:00:00",
    )
    # run 2: only the unprocessed two remain; changed content re-emits
    pages2 = {
        1: [{"foreign_id": "d0", "content_hash": "h0", "title": "t"},   # marked
            {"foreign_id": "d1", "content_hash": "h1x", "title": "t"},  # content changed
            {"foreign_id": "d2", "content_hash": "h2", "title": "t"}],
    }
    fetch2, _ = _pager(pages2)
    df2 = paginated_source(spark, fetch2, SCHEMA)
    fresh = skip_processed(spark, store, df2, "dc")
    assert sorted(r["foreign_id"] for r in fresh.collect()) == ["d1", "d2"]
