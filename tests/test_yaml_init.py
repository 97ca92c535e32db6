"""Every YAML method load_config accepts observably executes (round-3
fail-fast contract): generator init stages (sequence/dates/enumerate)
compile into the round-0 frontier, tee fan-out unions its seed
branches in handler order, and a clean_html stage re-writes + re-hashes
stored rows. Reference semantics: memorious/operations/initializers.py
(emit order), operations/clean.py:11-26 (re-hash)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from memorious_spark.functions import htmlkit
from memorious_spark.operators.initializers import compile_initial_frontier
from memorious_spark.plans.pipeline import load_yaml
from memorious_spark.plans.runner import CrawlRunner
from memorious_spark.plans.storage import RunStore
from memorious_spark.sources.corpus import build_corpus, seed_urls

N_DOCS = 120


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word"), F.col("id") % 11, F.lit(" body")).alias("text"),
        F.lit("en").alias("lang"),
    )
    df = build_corpus(spark, docs, N_DOCS).persist()
    df.count()
    yield df
    df.unpersist()


def _yaml(init_block: str, store_block: str = "", extra: str = "") -> str:
    return f"""
name: init_crawl
max_rounds: 30
{extra}
pipeline:
{init_block}
  fetch:
    method: fetch
    params: {{retry: 1, rules: {{mime_group: web}}}}
    handle: {{pass: parse}}
  parse:
    method: parse
    params:
      store: {{mime_type: "text/html"}}
    handle: {{store: store, fetch: fetch}}
{store_block or '''  store:
    method: directory
    params: {}
'''}
"""


SEQ_INIT = """  init:
    method: sequence
    params: {start: 0, stop: 3, step: 1}
    handle: {pass: urls}
  urls:
    method: seed
    params:
      urls: ["https://h%(number)d.example.com/doc/%(number)d"]
    handle: {pass: fetch}
"""

SEED_INIT = """  init:
    method: seed
    params:
      urls: ["https://h0.example.com/doc/0", "https://h1.example.com/doc/1", "https://h2.example.com/doc/2"]
    handle: {pass: fetch}
"""


def test_sequence_init_crawls_like_literal_seeds(spark, corpus, tmp_path):
    # numbers 0..2 template into exactly seed_urls(3) (doc i lives on
    # host h{i%7}) — the sequence-seeded crawl must equal the literal one
    cfg_seq = load_yaml(_yaml(SEQ_INIT))
    cfg_lit = load_yaml(_yaml(SEED_INIT))
    assert cfg_seq.init_method == "sequence"
    assert cfg_seq.seed_templates == (
        "https://h%(number)d.example.com/doc/%(number)d",
    )
    front = compile_initial_frontier(spark, cfg_seq)
    rows = sorted(front.collect(), key=lambda r: r["emit_seq"])
    assert [r["url"] for r in rows] == seed_urls(3)
    assert [r["emit_seq"] for r in rows] == [0, 1, 2]

    res_seq = CrawlRunner(
        spark, cfg_seq, RunStore(tmp_path / "a", "c", "r1")
    ).run(corpus)
    res_lit = CrawlRunner(
        spark, cfg_lit, RunStore(tmp_path / "b", "c", "r1")
    ).run(corpus)
    assert res_seq.pages_fetched == res_lit.pages_fetched > 0
    assert res_seq.urls_seen == res_lit.urls_seen


def test_sequence_tag_once_only_across_runs(spark, tmp_path):
    yaml_txt = _yaml(SEQ_INIT).replace(
        "{start: 0, stop: 3, step: 1}",
        "{start: 0, stop: 3, step: 1, tag: pages}",
    )
    cfg = load_yaml(yaml_txt)
    store = RunStore(tmp_path, "c", "r1")
    first = compile_initial_frontier(spark, cfg, store)
    assert first.count() == 3
    second = compile_initial_frontier(spark, cfg, RunStore(tmp_path, "c", "r2"))
    assert second.count() == 0  # all numbers already tagged


def test_dates_init_frontier_newest_first(spark):
    cfg = load_yaml(_yaml("""  init:
    method: dates
    params: {begin: "2024-01-01", end: "2024-01-10", days: 3}
    handle: {pass: urls}
  urls:
    method: seed
    params:
      urls: ["https://archive.example.com/%(date)s", "https://alt.example.com/%(date_iso)s"]
    handle: {pass: fetch}
"""))
    rows = sorted(
        compile_initial_frontier(spark, cfg).collect(),
        key=lambda r: r["emit_seq"],
    )
    # newest first, two templates per item, handler/list order
    assert [r["url"] for r in rows[:4]] == [
        "https://archive.example.com/2024-01-10",
        "https://alt.example.com/2024-01-10T00:00:00",
        "https://archive.example.com/2024-01-07",
        "https://alt.example.com/2024-01-07T00:00:00",
    ]
    assert [r["emit_seq"] for r in rows] == list(range(8))


def test_enumerate_tee_fanout_order(spark):
    cfg = load_yaml(_yaml("""  init:
    method: enumerate
    params: {items: [alpha, beta]}
    handle: {pass: fan}
  fan:
    method: tee
    handle: {x: sx, y: sy}
  sx:
    method: seed
    params: {urls: ["https://a.example.com/%(item)s"]}
    handle: {pass: fetch}
  sy:
    method: seed
    params: {urls: ["https://b.example.com/%(item)s"]}
    handle: {pass: fetch}
"""))
    rows = sorted(
        compile_initial_frontier(spark, cfg).collect(),
        key=lambda r: r["emit_seq"],
    )
    # per item, branches in tee handler order (initializers.py:29-32)
    assert [r["url"] for r in rows] == [
        "https://a.example.com/alpha", "https://b.example.com/alpha",
        "https://a.example.com/beta", "https://b.example.com/beta",
    ]


def test_tee_init_literal_seed_union(spark):
    cfg = load_yaml(_yaml("""  init:
    method: tee
    handle: {one: s1, two: s2}
  s1:
    method: seed
    params: {urls: ["https://h0.example.com/doc/0"]}
    handle: {pass: fetch}
  s2:
    method: seed
    params: {urls: ["https://h1.example.com/doc/1", "https://h2.example.com/doc/2"]}
    handle: {pass: fetch}
"""))
    assert cfg.seeds == (
        "https://h0.example.com/doc/0",
        "https://h1.example.com/doc/1",
        "https://h2.example.com/doc/2",
    )


def test_load_rejects_unwired_shapes():
    # generator outside the init chain would silently never run
    with pytest.raises(ValueError, match="outside the init chain"):
        load_yaml(_yaml(SEED_INIT + """  stray:
    method: sequence
    params: {start: 0, stop: 5}
    handle: {pass: fetch}
"""))
    # sequence without stop can generate nothing in batch mode
    with pytest.raises(ValueError, match="stop"):
        load_yaml(_yaml(SEQ_INIT.replace(
            "{start: 0, stop: 3, step: 1}", "{start: 0}"
        )))
    # dates without an explicit end would be wall-clock-dependent
    with pytest.raises(ValueError, match="end"):
        load_yaml(_yaml("""  init:
    method: dates
    params: {days: 3}
    handle: {pass: urls}
  urls:
    method: seed
    params: {urls: ["https://x.example.com/%(date)s"]}
    handle: {pass: fetch}
"""))
    # templated seed with no generator to fill it
    with pytest.raises(ValueError, match="template"):
        load_yaml(_yaml("""  init:
    method: seed
    params: {urls: ["https://x.example.com/%(number)d"]}
    handle: {pass: fetch}
"""))
    # generator init that feeds no seed stage crawls nothing
    with pytest.raises(ValueError, match="seed"):
        load_yaml(_yaml("""  init:
    method: sequence
    params: {start: 0, stop: 3}
    handle: {pass: fetch}
"""))


def test_template_unknown_field_fails_at_compile(spark):
    cfg = load_yaml(_yaml(SEQ_INIT.replace("%(number)d", "%(nope)s")))
    with pytest.raises(KeyError, match="nope"):
        compile_initial_frontier(spark, cfg)


def test_clean_html_stage_rewrites_and_rehashes(spark, corpus, tmp_path):
    cfg = load_yaml(_yaml(SEED_INIT, store_block="""  clean:
    method: clean_html
    params: {remove_paths: [".//img"]}
    handle: {pass: store}
  store:
    method: directory
    params: {}
""").replace(
        "handle: {store: store, fetch: fetch}",
        "handle: {store: clean, fetch: fetch}",
    ))
    assert cfg.clean_html_paths == (".//img",)
    store = RunStore(tmp_path, "c", "r1")
    res = CrawlRunner(spark, cfg, store).run(corpus)
    assert res.pages_stored > 10
    stored = {
        r["url"]: r
        for r in store.read_all(spark, "results", res.rounds).collect()
    }
    raw = {r["url"]: r for r in corpus.collect()}
    checked = 0
    for url, row in stored.items():
        src = raw[row["final_url"]] if row["final_url"] in raw else raw.get(url)
        if src is None or src["html"] is None:
            continue
        expected = htmlkit.clean_html(
            htmlkit.extract_text(bytes(src["html"]), src["content_type"]),
            [".//img"],
        )
        assert row["text"] == expected
        assert row["content_hash"] == hashlib.sha1(
            expected.encode("utf-8")
        ).hexdigest()
        # the hash genuinely changed vs the raw body's sha1
        assert row["content_hash"] != hashlib.sha1(bytes(src["html"])).hexdigest()
        assert "<img" not in row["text"]
        checked += 1
    assert checked > 10


def test_prioritize_yaml_wiring_and_equivalent_seen_set(spark, corpus, tmp_path):
    """`fetch.params.prioritize: pagerank` parses, an unknown scheme is
    rejected at load, and a budgeted prioritized crawl reaches exactly
    the same URL-seen set as FIFO (prioritization reorders dequeue,
    never changes reachability) while actually engaging (some frontier
    row carries a negative link-authority priority)."""
    import dataclasses

    from memorious_spark.plans.pipeline import load_config

    y = _yaml(SEED_INIT, extra="")
    import yaml as _y

    spec = _y.safe_load(y)
    spec["pipeline"]["fetch"]["params"]["prioritize"] = "pagerank"
    spec["pipeline"]["fetch"]["params"]["rank_iters"] = 2
    cfg = load_config(spec)
    assert cfg.prioritize == "pagerank" and cfg.rank_iters == 2

    spec["pipeline"]["fetch"]["params"]["prioritize"] = "hilbert"
    with pytest.raises(ValueError, match="prioritize"):
        load_config(spec)

    cfg_b = dataclasses.replace(cfg, budget_per_host=2, max_rounds=60)
    store_p = RunStore(tmp_path / "runs_p", "init_crawl", "runP")
    res_p = CrawlRunner(spark, cfg_b, store_p).run(corpus)
    store_f = RunStore(tmp_path / "runs_f", "init_crawl", "runF")
    res_f = CrawlRunner(
        spark, dataclasses.replace(cfg_b, prioritize=None), store_f
    ).run(corpus)
    assert res_p.status == res_f.status == "done"

    def seen(store):
        urls = set()
        for r in range(60):
            df = store.read_round(spark, "frontier", r)
            if df is None:
                break
            urls |= {x.url for x in df.select("url").collect()}
        return urls

    assert seen(store_p) == seen(store_f)
    # ranking engaged: some parked/selected row got a negative priority
    pri = []
    for r in range(2, 60):
        df = store_p.read_round(spark, "frontier", r)
        if df is None:
            break
        pri.extend(x.priority for x in df.select("priority").collect())
    assert any(p < 0 for p in pri), "pagerank priority never engaged"


def test_politeness_group_yaml_wiring(spark):
    """`fetch.params.politeness_group: domain` parses into the config;
    an unknown grouping is rejected at load."""
    import yaml as _y

    from memorious_spark.plans.pipeline import load_config

    spec = _y.safe_load(_yaml(SEED_INIT, extra=""))
    assert load_config(spec).politeness_group == "host"
    spec["pipeline"]["fetch"]["params"]["politeness_group"] = "domain"
    assert load_config(spec).politeness_group == "domain"
    spec["pipeline"]["fetch"]["params"]["politeness_group"] = "tld"
    with pytest.raises(ValueError, match="politeness_group"):
        load_config(spec)
    spec["pipeline"]["fetch"]["params"]["politeness_group"] = "host"
    assert load_config(spec).canonicalize == "conservative"
    spec["pipeline"]["fetch"]["params"]["canonicalize"] = "aggressive"
    assert load_config(spec).canonicalize == "aggressive"
    spec["pipeline"]["fetch"]["params"]["canonicalize"] = "surt"
    with pytest.raises(ValueError, match="canonicalize"):
        load_config(spec)
    spec["pipeline"]["fetch"]["params"]["canonicalize"] = "aggressive"
    assert load_config(spec).max_pages is None
    spec["max_pages"] = 500
    assert load_config(spec).max_pages == 500
    assert load_config(spec).backoff_threshold is None
    spec["pipeline"]["fetch"]["params"]["error_backoff"] = {
        "threshold": 5, "rounds": 3,
    }
    cfg_eb = load_config(spec)
    assert (cfg_eb.backoff_threshold, cfg_eb.backoff_rounds) == (5, 3)
    spec["pipeline"]["fetch"]["params"]["error_backoff"] = {"rounds": 3}
    with pytest.raises(ValueError, match="error_backoff"):
        load_config(spec)
    spec["pipeline"]["fetch"]["params"]["error_backoff"] = {"threshold": 0}
    with pytest.raises(ValueError, match="error_backoff"):
        load_config(spec)


def test_trap_filter_gates_frontier(spark, tmp_path):
    """`fetch.params.traps: true` drops pathological links before they
    enter the frontier: the trap page is never fetched, every clean
    page still is, and with the gate off the same crawl walks into the
    trap (proving the corpus would have served it)."""
    import datetime

    from memorious_spark.plans.pipeline import load_yaml

    trap_url = "https://t.example.com/cal/cal/cal/2026"

    def page(url, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (
            url, datetime.datetime(2026, 1, 1),
            bytearray(f"<html><body>{body}</body></html>".encode()),
            "t", "en", "text/html", 200, None,
        )

    corpus = spark.createDataFrame(
        [
            page("https://t.example.com/doc/1",
                 ["https://t.example.com/doc/2", trap_url]),
            page("https://t.example.com/doc/2", []),
            page(trap_url, []),
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_type string, status_code int, "
        "redirect_to string",
    )

    def run(traps, tag):
        y = f"""
name: trapdemo
max_rounds: 10
pipeline:
  init:
    method: seed
    params: {{urls: ["https://t.example.com/doc/1"]}}
    handle: {{pass: fetch}}
  fetch:
    method: fetch
    params: {{retry: 1, traps: {str(traps).lower()}, rules: {{mime_group: web}}}}
    handle: {{pass: parse}}
  parse:
    method: parse
    params:
      store: {{mime_type: "text/html"}}
    handle: {{store: store, fetch: fetch}}
  store:
    method: directory
    params: {{}}
"""
        cfg = load_yaml(y)
        assert cfg.trap_filter is traps
        store = RunStore(tmp_path / f"runs_{tag}", "trapdemo", "r1")
        res = CrawlRunner(spark, cfg, store).run(corpus)
        assert res.status == "done"
        urls = set()
        for r in range(10):
            df = store.read_round(spark, "frontier", r)
            if df is None:
                break
            urls |= {x.url for x in df.select("url").collect()}
        return urls

    with_gate = run(True, "on")
    without_gate = run(False, "off")
    assert trap_url in without_gate
    assert trap_url not in with_gate
    assert with_gate == without_gate - {trap_url}


def test_robots_sitemap_discovery_feeds_frontier(spark, tmp_path):
    """`robots_sitemaps: true`: the sitemap URL advertised by a host's
    robots.txt joins the round-0 frontier after the seeds, and with
    `parse.params.sitemaps: true` its urlset pages are crawled; with
    the flag off the same crawl never discovers them."""
    import datetime

    from memorious_spark.plans.pipeline import load_yaml

    def page(url, body, ctype, text=None):
        return (
            url, datetime.datetime(2026, 1, 1), bytearray(body.encode()),
            text, "en", ctype, 200, None,
        )

    robots = (
        "User-agent: *\nDisallow:\n"
        "Sitemap: https://r.example.com/pages.xml\n"
    )
    urlset = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              "<url><loc>https://r.example.com/p/1</loc></url>"
              "<url><loc>https://r.example.com/p/2</loc></url></urlset>")
    corpus = spark.createDataFrame(
        [
            page("https://r.example.com/robots.txt", robots, "text/plain"),
            page("https://r.example.com/pages.xml", urlset,
                 "application/xml"),
            page("https://r.example.com/", "<html><body>home</body></html>",
                 "text/html", "home"),
            page("https://r.example.com/p/1",
                 "<html><body>one</body></html>", "text/html", "one"),
            page("https://r.example.com/p/2",
                 "<html><body>two</body></html>", "text/html", "two"),
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_type string, status_code int, "
        "redirect_to string",
    )

    def run(flag, tag):
        y = f"""
name: robosmap
max_rounds: 8
robots_sitemaps: {str(flag).lower()}
pipeline:
  init:
    method: seed
    params: {{urls: ["https://r.example.com/"]}}
    handle: {{pass: fetch}}
  fetch:
    method: fetch
    params: {{retry: 1, rules: {{mime_group: web}}}}
    handle: {{pass: parse}}
  parse:
    method: parse
    params:
      sitemaps: true
      store: {{mime_type: "text/html"}}
    handle: {{store: store, fetch: fetch}}
  store:
    method: db
"""
        cfg = load_yaml(y)
        assert cfg.robots_sitemaps is flag
        store = RunStore(tmp_path / f"runs_rs_{tag}", "robosmap", "r1")
        res = CrawlRunner(spark, cfg, store).run(corpus)
        assert res.status == "done"
        stored = set()
        for r in range(8):
            df = store.read_round(spark, "results", r)
            if df is not None:
                stored |= {x.url for x in df.select("url").collect()}
        return stored

    on = run(True, "on")
    assert {"https://r.example.com/p/1", "https://r.example.com/p/2"} <= on
    off = run(False, "off")
    assert off == {"https://r.example.com/"}

    # ADVICE r4: emit_seq is an ORDER KEY with gaps (sequence-tag
    # skips), so the sitemap offset must ride max(emit_seq)+1, not
    # count() — a gapped frontier (2 rows, max 100) used to let
    # sitemap rows collide with / sort before the seeds.
    cfg = load_yaml(
        """
name: robosmap
max_rounds: 2
robots_sitemaps: true
pipeline:
  init:
    method: seed
    params: {urls: ["https://r.example.com/"]}
    handle: {pass: fetch}
  fetch:
    method: fetch
    handle: {pass: parse}
  parse:
    method: parse
    handle: {store: store, fetch: fetch}
  store:
    method: db
"""
    )
    gapped = spark.createDataFrame(
        [("https://r.example.com/", 0), ("https://r.example.com/p/1", 100)],
        "url string, emit_seq long",
    )
    store = RunStore(tmp_path / "runs_rs_gap", "robosmap", "r1")
    CrawlRunner(spark, cfg, store).run(corpus, initial_frontier=gapped)
    f0 = {
        r["url"]: r["emit_seq"]
        for r in store.read_round(spark, "frontier", 0).collect()
    }
    assert f0["https://r.example.com/"] == 0
    assert f0["https://r.example.com/p/1"] == 100
    assert f0["https://r.example.com/pages.xml"] > 100


def test_sitemap_feeds_frontier(spark, tmp_path):
    """`parse.params.sitemaps: true`: a seeded sitemap.xml (urlset →
    sitemapindex chain) feeds its <loc> URLs into the frontier and the
    listed pages get fetched and stored; with the flag off the same
    crawl stops at the sitemap (XML carries no anchors)."""
    import datetime

    from memorious_spark.plans.pipeline import load_yaml

    def xml_page(url, body):
        return (
            url, datetime.datetime(2026, 1, 1), bytearray(body.encode()),
            None, "en", "application/xml", 200, None,
        )

    def html_page(url):
        return (
            url, datetime.datetime(2026, 1, 1),
            bytearray(b"<html><body>hello</body></html>"),
            "hello", "en", "text/html", 200, None,
        )

    idx = ("<sitemapindex><sitemap><loc>https://s.example.com/maps/pages.xml"
           "</loc></sitemap></sitemapindex>")
    urlset = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              "<url><loc>https://s.example.com/p/1</loc></url>"
              "<url><loc>https://s.example.com/p/2</loc></url></urlset>")
    corpus = spark.createDataFrame(
        [
            xml_page("https://s.example.com/sitemap.xml", idx),
            xml_page("https://s.example.com/maps/pages.xml", urlset),
            html_page("https://s.example.com/p/1"),
            html_page("https://s.example.com/p/2"),
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_type string, status_code int, "
        "redirect_to string",
    )

    def run(flag, tag):
        y = f"""
name: mapdemo
max_rounds: 10
pipeline:
  init:
    method: seed
    params: {{urls: ["https://s.example.com/sitemap.xml"]}}
    handle: {{pass: fetch}}
  fetch:
    method: fetch
    params: {{retry: 1, rules: {{mime_group: web}}}}
    handle: {{pass: parse}}
  parse:
    method: parse
    params:
      sitemaps: {str(flag).lower()}
      store: {{mime_type: "text/html"}}
    handle: {{store: store, fetch: fetch}}
  store:
    method: directory
    params: {{}}
"""
        cfg = load_yaml(y)
        assert cfg.parse.sitemaps is flag
        store = RunStore(tmp_path / f"runs_{tag}", "mapdemo", "r1")
        res = CrawlRunner(spark, cfg, store).run(corpus)
        assert res.status == "done"
        stored, seen = set(), set()
        for r in range(10):
            df = store.read_round(spark, "results", r)
            if df is not None:
                stored |= {x.url for x in df.select("url").collect()}
            fr = store.read_round(spark, "frontier", r)
            if fr is not None:
                seen |= {x.url for x in fr.select("url").collect()}
        return stored, seen

    stored_on, seen_on = run(True, "on")
    assert seen_on >= {
        "https://s.example.com/sitemap.xml",
        "https://s.example.com/maps/pages.xml",
        "https://s.example.com/p/1",
        "https://s.example.com/p/2",
    }
    assert stored_on == {
        "https://s.example.com/p/1", "https://s.example.com/p/2",
    }
    stored_off, seen_off = run(False, "off")
    assert stored_off == set()
    assert seen_off == {"https://s.example.com/sitemap.xml"}
