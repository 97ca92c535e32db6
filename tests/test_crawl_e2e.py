"""End-to-end engine ↔ oracle equivalence — the correctness gate of
BASELINE.json: same seed list, unlimited politeness budget →
identical URL-seen set, identical crawl (emit) order, identical
stored rows, byte-identical extracted text per url (sha256)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from memorious_spark.functions.urls import py_norm
from memorious_spark.operators.parse import ParseConfig
from memorious_spark.oracle import run_oracle
from memorious_spark.plans.pipeline import CrawlConfig
from memorious_spark.plans.runner import CrawlRunner
from memorious_spark.plans.storage import RunStore
from memorious_spark.sources.corpus import build_corpus, seed_urls

N_DOCS = 120


def _docs(spark, n=N_DOCS):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word"), F.col("id") % 11, F.lit(" text body ")).alias("text"),
        F.lit("en").alias("lang"),
    )


@pytest.fixture(scope="module")
def corpus(spark):
    df = build_corpus(spark, _docs(spark), N_DOCS).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def corpus_dict(corpus):
    return {
        py_norm(r["url"]): {
            "html": bytes(r["html"]) if r["html"] is not None else None,
            "content_type": r["content_type"],
            "status_code": r["status_code"],
            "redirect_to": r["redirect_to"],
        }
        for r in corpus.collect()
    }


CFG = CrawlConfig(
    name="e2e",
    seeds=tuple(seed_urls(3)),
    fetch_rules={"mime_group": "web"},
    store_rules={"and": [{"mime_type": "text/html"}, {"pattern": r"https://h\d"}]},
    parse=ParseConfig(
        meta={
            "author": [".//meta[@name='author']/@content"],
            "og_title": [".//meta[@property='og:title']/@content"],
        },
        properties={"headings": ".//h1"},
    ),
    max_rounds=40,
)


@pytest.fixture(scope="module")
def engine_run(spark, corpus, tmp_path_factory):
    store = RunStore(tmp_path_factory.mktemp("runs"), "e2e", "run1")
    result = CrawlRunner(spark, CFG, store).run(corpus)
    return store, result


@pytest.fixture(scope="module")
def oracle_run(corpus_dict):
    return run_oracle(CFG, corpus_dict)


def _engine_frontier_rows(spark, store, max_round=60):
    dfs = []
    for r in range(max_round):
        df = store.read_round(spark, "frontier", r)
        if df is None:
            break
        dfs.append(df)
    allf = dfs[0]
    for d in dfs[1:]:
        allf = allf.unionByName(d)
    return allf.dropDuplicates(["emit_seq"])


def test_crawl_terminates(engine_run):
    _, result = engine_run
    assert result.status == "done"
    assert result.pages_fetched > 50
    assert result.pages_stored > 0


def test_seen_set_matches_oracle(spark, engine_run, oracle_run):
    store, _ = engine_run
    seen = store.read_all(spark, "seen", 60)
    engine_hashes = {r["key_hash"] for r in seen.select("key_hash").distinct().collect()}
    oracle_urls = sorted(oracle_run.seen)
    odf = spark.createDataFrame([(u,) for u in oracle_urls], "u string")
    oracle_hashes = {
        r["h"] for r in odf.select(F.xxhash64("u").alias("h")).collect()
    }
    assert engine_hashes == oracle_hashes


def test_crawl_order_matches_oracle(spark, engine_run, oracle_run):
    store, _ = engine_run
    rows = _engine_frontier_rows(spark, store).select("emit_seq", "url").collect()
    engine_order = sorted((r["emit_seq"], r["url"]) for r in rows)
    oracle_order = sorted(oracle_run.order)
    assert engine_order == oracle_order


def test_stored_rows_match_oracle(spark, engine_run, oracle_run):
    store, _ = engine_run
    stored = store.read_all(spark, "results", 60)
    engine = {
        r["final_url"]: r
        for r in stored.select(
            "final_url", "title", "text", "meta", "properties", "status_code"
        ).collect()
    }
    oracle = {s["final_url"]: s for s in oracle_run.stored}
    assert set(engine) == set(oracle)
    for url, o in oracle.items():
        e = engine[url]
        assert e["title"] == o["title"], url
        assert e["text"] == o["text"], url
        assert dict(e["meta"] or {}) == o["meta"], url
        assert {k: list(v) for k, v in (e["properties"] or {}).items()} == o[
            "properties"
        ], url


def test_text_byte_identity(spark, engine_run, oracle_run):
    """sha256 over extracted text per url — the per-row invariant of
    BASELINE.json input_hint."""
    store, _ = engine_run
    stored = store.read_all(spark, "results", 60)
    engine = {
        r["final_url"]: hashlib.sha256(r["text"].encode("utf-8")).hexdigest()
        for r in stored.select("final_url", "text").collect()
        if r["text"] is not None
    }
    assert engine  # non-trivial
    for url, h in engine.items():
        o = oracle_run.text_by_url.get(url)
        assert o is not None, url
        assert hashlib.sha256(o.encode("utf-8")).hexdigest() == h, url


def test_kill_resume_matches_uninterrupted(
    spark, corpus, tmp_path_factory, engine_run
):
    """Kill after round 2, resume → final seen set + stored rows equal
    the uninterrupted run (BASELINE north rule: resumable from
    checkpoint). Regression guard for the frontier/round=r+1 cutoff in
    RunStore.truncate_after (round r writes its NEXT frontier)."""
    import dataclasses

    store = RunStore(tmp_path_factory.mktemp("runs_resume"), "e2e", "runR")
    killed = CrawlRunner(
        spark, dataclasses.replace(CFG, max_rounds=3), store
    ).run(corpus)
    assert killed.rounds == 3
    resumed = CrawlRunner(spark, CFG, store).run(corpus, resume=True)
    assert resumed.status == "done" and resumed.rounds > 0

    ref_store, _ = engine_run
    seen = {
        r["key_hash"]
        for r in store.read_all(spark, "seen", 60).select("key_hash").collect()
    }
    ref_seen = {
        r["key_hash"]
        for r in ref_store.read_all(spark, "seen", 60).select("key_hash").collect()
    }
    assert seen == ref_seen
    assert (
        store.read_all(spark, "results", 60).count()
        == ref_store.read_all(spark, "results", 60).count()
    )


def test_budgeted_crawl_matches_budgeted_oracle(
    spark, corpus, corpus_dict, tmp_path_factory
):
    """Politeness under CONTENTION, exactly: engine with
    budget_per_host=4 vs the round-discretized budgeted oracle —
    same seen set, same emit order (carryover + retry slot dynamics
    included), same stored rows, and the ≤ budget/host/round invariant
    on every round's fetched output."""
    import dataclasses

    budget = 4
    cfg = dataclasses.replace(CFG, budget_per_host=budget)
    store = RunStore(tmp_path_factory.mktemp("runs_budget"), "e2e", "runB")
    result = CrawlRunner(spark, cfg, store).run(corpus)
    oracle = run_oracle(cfg, corpus_dict, budget=budget)

    # identical seen set
    seen = store.read_all(spark, "seen", 60)
    engine_hashes = {r["key_hash"] for r in seen.select("key_hash").collect()}
    odf = spark.createDataFrame([(u,) for u in sorted(oracle.seen)], "u string")
    oracle_hashes = {r["h"] for r in odf.select(F.xxhash64("u").alias("h")).collect()}
    assert engine_hashes == oracle_hashes

    # identical emit order under contention
    rows = _engine_frontier_rows(spark, store).select("emit_seq", "url").collect()
    assert sorted((r["emit_seq"], r["url"]) for r in rows) == sorted(oracle.order)

    # identical stored rows
    stored = store.read_all(spark, "results", 60)
    assert {r["final_url"] for r in stored.select("final_url").collect()} == {
        s["final_url"] for s in oracle.stored
    }
    assert result.rounds == len(oracle.rounds)

    # ≤ budget fetches per host per round, every round
    for rnd in range(result.rounds):
        df = store.read_round(spark, "results", rnd)
        if df is None:
            continue
        mx = df.groupBy("host").count().agg(F.max("count")).first()[0]
        assert mx is None or mx <= budget, (rnd, mx)


def test_domain_grouped_budget_caps_whole_corpus_domain(
    spark, corpus, tmp_path_factory
):
    """politeness_group='domain': every corpus host is
    ``h*.example.com``, so the registrable-domain budget caps the
    ENTIRE round at ``budget`` fetches (host mode would grant budget
    × n_hosts); the crawl still drains to completion — parked rows
    carry over FIFO."""
    import dataclasses

    budget = 4
    cfg = dataclasses.replace(
        CFG, budget_per_host=budget, politeness_group="domain",
        max_rounds=80,
    )
    store = RunStore(tmp_path_factory.mktemp("runs_dom"), "e2e", "runD")
    result = CrawlRunner(spark, cfg, store).run(corpus)
    assert result.status == "done" and result.pages_stored > 0
    total = 0
    for rnd in range(result.rounds):
        df = store.read_round(spark, "results", rnd)
        if df is None:
            continue
        n = df.count()
        assert n <= budget, (rnd, n)
        total += n
    # same stored coverage as an unbudgeted run would reach (drained)
    store_u = RunStore(tmp_path_factory.mktemp("runs_dom_u"), "e2e", "runU")
    unbudgeted = CrawlRunner(spark, CFG, store_u).run(corpus)
    assert total == unbudgeted.pages_stored


def test_error_backoff_snoozes_bursting_host(spark, tmp_path_factory):
    """error_backoff {threshold: 3, rounds: 2}: a host that returns
    ≥3 HTTP errors in one round is snoozed — its NEXT url parks
    untouched for exactly 2 rounds, then fetches; without backoff the
    same url fetches immediately. Unaffected hosts never park."""
    import dataclasses
    from datetime import datetime

    def page(url, links=(), status=200):
        anchors = "".join(f'<a href="{u}">x</a>' for u in links)
        html = f"<html><body>{anchors}</body></html>".encode()
        return (
            url, datetime(2024, 1, 1), html, "body", "en",
            "text/html", status, None,
        )

    bad = [f"https://bad.test/e{i}" for i in range(3)]
    corpus = spark.createDataFrame(
        [
            page("https://good.test/seed",
                 bad + ["https://bad.test/ok", "https://good.test/g2"]),
            *[page(u, status=500) for u in bad],
            page("https://bad.test/ok", ["https://bad.test/next"]),
            page("https://good.test/g2"),
            page("https://bad.test/next"),
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_type string, status_code int, "
        "redirect_to string",
    )
    base = CrawlConfig(
        name="backoff", seeds=("https://good.test/seed",), max_rounds=10,
    )

    def rounds_of(cfg, tag):
        store = RunStore(tmp_path_factory.mktemp(f"runs_{tag}"), "bo", tag)
        res = CrawlRunner(spark, cfg, store).run(corpus)
        assert res.status == "done"
        where = {}
        for r in range(res.rounds):
            df = store.read_round(spark, "results", r)
            if df is not None:
                for x in df.select("url").collect():
                    where[x["url"]] = r
        return where

    plain = rounds_of(base, "off")
    # without backoff: next is discovered in round 1, fetched round 2
    assert plain["https://bad.test/next"] == 2
    backed = rounds_of(
        dataclasses.replace(base, backoff_threshold=3, backoff_rounds=2),
        "on",
    )
    # round 1 fetches the 3 errors -> bad.test snoozed rounds 2 and 3;
    # /next (discovered round 1) parks twice and fetches round 4
    assert backed["https://bad.test/next"] == 4
    # the good host was never parked
    assert backed["https://good.test/g2"] == plain["https://good.test/g2"]
    # same final coverage either way
    assert set(backed) == set(plain)


def test_max_pages_budget_stops_then_resumes_to_full_crawl(
    spark, corpus, tmp_path_factory
):
    """max_pages: the run stops after the first COMPLETE round at
    which stored ≥ budget (status 'budget_exhausted', frontier
    checkpoint intact, aggregator never fires); resuming with the
    budget lifted drains to exactly the unbudgeted crawl."""
    import dataclasses

    cfg = dataclasses.replace(CFG, max_pages=10)
    store = RunStore(tmp_path_factory.mktemp("runs_mp"), "e2e", "runM")
    res = CrawlRunner(spark, cfg, store).run(corpus)
    assert res.status == "budget_exhausted"
    assert res.pages_stored >= 10
    res2 = CrawlRunner(
        spark, dataclasses.replace(CFG, max_pages=None), store
    ).run(corpus, resume=True)
    assert res2.status == "done"
    store_f = RunStore(tmp_path_factory.mktemp("runs_mpf"), "e2e", "runF")
    full = CrawlRunner(spark, CFG, store_f).run(corpus)
    assert res2.pages_stored == full.pages_stored
    got = {
        r["url"]
        for r in store.read_all(spark, "results", 60).select("url").collect()
    }
    want = {
        r["url"]
        for r in store_f.read_all(spark, "results", 60).select("url").collect()
    }
    assert got == want


def test_aggressive_canonicalize_collapses_tracking_variants(
    spark, tmp_path_factory
):
    """canonicalize='aggressive': three /p variants that differ only
    in param order / tracking params collapse to ONE seen entry (the
    first emitter wins, FIFO), while the conservative default fetches
    all three. The fetch key (url_norm) is untouched — the winning
    variant is fetched under its REAL url."""
    import dataclasses
    from datetime import datetime

    def page(url, links=()):
        anchors = "".join(f'<a href="{u}">x</a>' for u in links)
        html = f"<html><body>{anchors}</body></html>".encode()
        return (
            url, datetime(2024, 1, 1), html, "body", "en",
            "text/html", 200, None,
        )

    variants = [
        "https://x.test/p?b=2&a=1&utm_source=mail",
        "https://x.test/p?a=1&b=2",
        "https://x.test/p?a=1&b=2&fbclid=77",
    ]
    corpus = spark.createDataFrame(
        [
            page("https://x.test/a", [variants[0], "https://x.test/q"]),
            page("https://x.test/b", [variants[1], variants[2]]),
            page(variants[0]),
            page(variants[1]),
            page(variants[2]),
            page("https://x.test/q"),
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_type string, status_code int, "
        "redirect_to string",
    )
    base = CrawlConfig(
        name="canon", seeds=("https://x.test/a", "https://x.test/b"),
        max_rounds=6,
    )

    def run(cfg, tag):
        store = RunStore(tmp_path_factory.mktemp(f"runs_{tag}"), "canon", tag)
        res = CrawlRunner(spark, cfg, store).run(corpus)
        assert res.status == "done"
        urls = {
            r["url"]
            for r in store.read_all(spark, "results", 10)
            .select("url").collect()
        }
        return urls

    cons = run(base, "cons")
    aggr = run(
        dataclasses.replace(base, canonicalize="aggressive"), "aggr"
    )
    assert {v for v in variants} <= cons  # conservative fetches all 3
    # aggressive: exactly one /p variant survives — the FIRST emitted
    # (seed a's link, emit order before seed b's links)
    assert aggr & set(variants) == {variants[0]}
    assert "https://x.test/q" in aggr  # unrelated links unaffected


def test_hot_host_budgeted_crawl_matches_oracle(spark, tmp_path_factory):
    """Skew: every 2nd doc lives on ONE hot host (hot_mod=2). The
    salted two-phase politeness must still produce the exact budgeted
    semantics — same seen set and emit order as the sequential oracle —
    while the mega-host queues through rounds."""
    import dataclasses

    from memorious_spark.functions.urls import py_norm

    hot_docs = _docs(spark, 80)
    corpus = build_corpus(spark, hot_docs, 80, hot_mod=2).persist()
    corpus.count()
    corpus_dict = {
        py_norm(r["url"]): {
            "html": bytes(r["html"]) if r["html"] is not None else None,
            "content_type": r["content_type"],
            "status_code": r["status_code"],
            "redirect_to": r["redirect_to"],
        }
        for r in corpus.collect()
    }
    cfg = dataclasses.replace(
        CFG,
        seeds=tuple(seed_urls(3, hot_mod=2)),
        budget_per_host=3,
        max_rounds=60,
    )
    store = RunStore(tmp_path_factory.mktemp("runs_hot"), "e2e", "runH")
    result = CrawlRunner(spark, cfg, store).run(corpus)
    oracle = run_oracle(cfg, corpus_dict, budget=3)

    seen = store.read_all(spark, "seen", 80)
    engine_hashes = {r["key_hash"] for r in seen.select("key_hash").collect()}
    odf = spark.createDataFrame([(u,) for u in sorted(oracle.seen)], "u string")
    assert engine_hashes == {
        r["h"] for r in odf.select(F.xxhash64("u").alias("h")).collect()
    }
    rows = _engine_frontier_rows(spark, store, max_round=80).select(
        "emit_seq", "url"
    ).collect()
    assert sorted((r["emit_seq"], r["url"]) for r in rows) == sorted(oracle.order)
    assert result.rounds == len(oracle.rounds) > 5  # the hot host queues
    corpus.unpersist()


def test_forced_shuffle_join_matches_broadcast_crawl(
    spark, corpus, engine_run, tmp_path_factory, monkeypatch
):
    """The 10^10-frontier fallback path (frontier past the broadcast
    ceiling → SHUFFLE_HASH corpus join, fetch.py) must produce the
    byte-same crawl as the broadcast path — exercised end-to-end, not
    just plan-asserted."""
    monkeypatch.setenv("MEMSPARK_FORCE_SHUFFLE_JOIN", "1")
    store_f = RunStore(tmp_path_factory.mktemp("runs_sj"), "e2e", "runSJ")
    result_f = CrawlRunner(spark, CFG, store_f).run(corpus)
    monkeypatch.delenv("MEMSPARK_FORCE_SHUFFLE_JOIN")

    store_b, result_b = engine_run
    assert (result_f.pages_fetched, result_f.pages_stored, result_f.urls_seen) == (
        result_b.pages_fetched, result_b.pages_stored, result_b.urls_seen,
    )
    rows_f = sorted(
        (r["emit_seq"], r["url"], r["content_hash"])
        for r in store_f.read_all(spark, "results", 60)
        .select("emit_seq", "url", "content_hash").collect()
    )
    rows_b = sorted(
        (r["emit_seq"], r["url"], r["content_hash"])
        for r in store_b.read_all(spark, "results", 60)
        .select("emit_seq", "url", "content_hash").collect()
    )
    assert rows_f == rows_b


def test_content_hash_is_sha1_of_body(spark, engine_run, corpus_dict):
    store, _ = engine_run
    stored = store.read_all(spark, "results", 60)
    row = stored.filter(F.col("content_hash").isNotNull()).first()
    body = corpus_dict[py_norm(row["final_url"])]["html"]
    assert row["content_hash"] == hashlib.sha1(body).hexdigest()
