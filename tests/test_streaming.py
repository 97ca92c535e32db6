"""Streaming face: micro-batch seed ingest through the shared stage
operators, idempotent via the seen-set anti-join; face parity with
the batch engine's politeness + http-cache semantics."""

from pyspark.sql import functions as F

from memorious_spark.plans.storage import RunStore
from memorious_spark.sources.corpus import build_corpus, doc_url
from memorious_spark.streaming.frontier_stream import (
    run_streaming_crawl, stream_seed_source,
)


def test_streaming_seed_ingest(spark, tmp_path):
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"), F.lit("en").alias("lang")
    )
    corpus = build_corpus(spark, docs, 60).persist()
    corpus.count()

    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # first micro-batch: 3 urls (one duplicated → seen-set no-op on 2nd file)
    batch1 = spark.createDataFrame(
        [(doc_url(1), 0), (doc_url(2), 1), (doc_url(4), 2)],
        "url string, emit_seq long",
    )
    batch1.write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    q = run_streaming_crawl(spark, stream, corpus, out_dir, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{out_dir}/batch=*")
    urls1 = {r["final_url"] for r in got.select("final_url").collect()}
    assert urls1 == {doc_url(1), doc_url(2), doc_url(4)}

    # second drop re-sends url 1 (dedup) and adds url 5
    batch2 = spark.createDataFrame(
        [(doc_url(1), 3), (doc_url(5), 4)], "url string, emit_seq long"
    )
    batch2.write.parquet(str(seeds_dir / "b2"))
    q2 = run_streaming_crawl(spark, stream, corpus, out_dir, ckpt)
    q2.awaitTermination(120)

    got2 = spark.read.parquet(f"{out_dir}/batch=*")
    urls2 = [r["final_url"] for r in got2.select("final_url").collect()]
    assert sorted(urls2) == sorted(urls1 | {doc_url(5)})  # url 1 NOT refetched
    corpus.unpersist()


def test_streaming_crawl_politeness_parks_hot_host(spark, tmp_path):
    """Face parity: the keyed-state politeness operator wired INTO the
    streaming crawl — a hot host's overflow parks across triggers while
    other hosts proceed."""
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"), F.lit("en").alias("lang")
    )
    corpus = build_corpus(spark, docs, 60).persist()
    corpus.count()
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # doc ids 1, 8, 15 all live on h1 (id % 7 == 1); id 2 on h2
    spark.createDataFrame(
        [(doc_url(1), 0), (doc_url(8), 1), (doc_url(15), 2), (doc_url(2), 3)],
        "url string, emit_seq long",
    ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    q = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt, politeness_budget=2
    )
    q.awaitTermination(120)
    urls1 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    # FIFO: h1 released 1 and 8 (15 parked in state), h2 unaffected
    assert urls1 == {doc_url(1), doc_url(8), doc_url(2)}

    # the next h1 arrival wakes the host: parked 15 drains FIFO first
    spark.createDataFrame(
        [(doc_url(22), 10)], "url string, emit_seq long"
    ).coalesce(1).write.parquet(str(seeds_dir / "b2"))
    q2 = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt, politeness_budget=2
    )
    q2.awaitTermination(120)
    urls2 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    assert urls2 == urls1 | {doc_url(15), doc_url(22)}
    corpus.unpersist()


def test_streaming_domain_grouped_politeness(spark, tmp_path):
    """politeness_group='domain' keys the park/release state by
    registrable domain: h1 and h2 are both *.example.com, so a budget
    of 2 releases only the first two urls ACROSS hosts (host mode
    would have released all three); unknown grouping rejected."""
    import pytest as _pytest

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = build_corpus(spark, docs, 60).persist()
    corpus.count()
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(doc_url(1), 0), (doc_url(8), 1), (doc_url(2), 2)],
        "url string, emit_seq long",
    ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    with _pytest.raises(ValueError, match="politeness_group"):
        run_streaming_crawl(
            spark, stream, corpus, out_dir, ckpt,
            politeness_budget=2, politeness_group="tld",
        )
    q = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt,
        politeness_budget=2, politeness_group="domain",
    )
    q.awaitTermination(120)
    urls1 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    assert urls1 == {doc_url(1), doc_url(8)}
    corpus.unpersist()


def test_streaming_robots_gate_and_crawl_delay_override(spark, tmp_path):
    """Face parity for robots on the stream: a disallowed path is
    dropped BEFORE politeness (never fetched, never consumes budget)
    and a host's crawl-delay budget overrides the global one in the
    keyed state — h1 drains 1/trigger while h2 gets the global 2."""
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = build_corpus(spark, docs, 60).persist()
    corpus.count()
    robots = spark.createDataFrame(
        [("h1.example.com", ["/doc/15"], 1)],
        "host string, disallow_prefixes array<string>, "
        "crawl_delay_budget int",
    )
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # doc ids 1, 8, 15 live on h1 (id % 7 == 1); 15 is disallowed
    spark.createDataFrame(
        [(doc_url(1), 0), (doc_url(8), 1), (doc_url(15), 2), (doc_url(2), 3)],
        "url string, emit_seq long",
    ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    q = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt,
        politeness_budget=2, robots=robots,
    )
    q.awaitTermination(120)
    urls1 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    # h1: crawl-delay budget 1 -> only doc 1; 15 gated out; h2 fine
    assert urls1 == {doc_url(1), doc_url(2)}
    # next trigger: parked doc 8 drains FIFO under the override
    spark.createDataFrame(
        [(doc_url(22), 10)], "url string, emit_seq long"
    ).coalesce(1).write.parquet(str(seeds_dir / "b2"))
    q2 = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt,
        politeness_budget=2, robots=robots,
    )
    q2.awaitTermination(120)
    urls2 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    assert urls2 == urls1 | {doc_url(8)}
    assert doc_url(15) not in urls2
    corpus.unpersist()


def test_streaming_crawl_delay_applies_without_global_budget(
    spark, tmp_path
):
    """ADVICE r4: robots crawl-delay budgets must gate the stream even
    when no global politeness_budget is set (batch-face parity:
    no_politeness requires robots is None). Before the fix the
    overrides were computed and silently never applied — h1 drained
    all three urls in one trigger."""
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = build_corpus(spark, docs, 60).persist()
    corpus.count()
    robots = spark.createDataFrame(
        [("h1.example.com", [], 1)],
        "host string, disallow_prefixes array<string>, "
        "crawl_delay_budget int",
    )
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # doc ids 1, 8, 15 all live on h1 (id % 7 == 1); 2 on h2
    spark.createDataFrame(
        [(doc_url(1), 0), (doc_url(8), 1), (doc_url(15), 2), (doc_url(2), 3)],
        "url string, emit_seq long",
    ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    q = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt,
        politeness_budget=None, robots=robots,
    )
    q.awaitTermination(120)
    urls1 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    # h1 capped at its crawl-delay budget of 1; h2 unthrottled
    assert urls1 == {doc_url(1), doc_url(2)}
    # parked h1 rows drain FIFO (budget 1/trigger) when the h1 key
    # next fires: doc 8 (emit_seq 1) before 15 before the new 22
    spark.createDataFrame(
        [(doc_url(22), 10)], "url string, emit_seq long"
    ).coalesce(1).write.parquet(str(seeds_dir / "b2"))
    q2 = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt,
        politeness_budget=None, robots=robots,
    )
    q2.awaitTermination(120)
    urls2 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    assert urls2 == urls1 | {doc_url(8)}
    corpus.unpersist()


def test_streaming_aggressive_canonicalize_collapses_variants(
    spark, tmp_path
):
    """canonicalize='aggressive' on the stream face: a later trigger's
    tracking-param variant of an already-crawled url is deduped by the
    canon-keyed seen hash (conservative mode would fetch it again)."""
    import datetime

    def page(url):
        return (
            url, datetime.datetime(2024, 1, 1),
            bytearray(b"<html><body>x</body></html>"), "x", "en",
            "text/html", 200, None,
        )

    u1 = "https://c.test/p?b=2&a=1&utm_source=m"
    u2 = "https://c.test/p?a=1&b=2"
    corpus = spark.createDataFrame(
        [page(u1), page(u2)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_type string, status_code int, "
        "redirect_to string",
    ).persist()
    corpus.count()
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(u1, 0)], "url string, emit_seq long"
    ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    q = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt, canonicalize="aggressive"
    )
    q.awaitTermination(120)
    spark.createDataFrame(
        [(u2, 1)], "url string, emit_seq long"
    ).coalesce(1).write.parquet(str(seeds_dir / "b2"))
    q2 = run_streaming_crawl(
        spark, stream, corpus, out_dir, ckpt, canonicalize="aggressive"
    )
    q2.awaitTermination(120)
    urls = {
        r["url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    assert urls == {u1}  # the canon twin never re-fetched
    corpus.unpersist()


def test_streaming_cache_replay_across_runs(spark, tmp_path):
    """Face parity: the streaming crawl probes + feeds the SAME
    crawler-scoped http_cache the batch face uses — a second streaming
    run over an unchanged corpus replays cached hashes instead of
    re-hashing, and appends cache rows only for genuinely new pages."""
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"), F.lit("en").alias("lang")
    )
    corpus = build_corpus(spark, docs, 60).persist()
    corpus.count()
    store = RunStore(tmp_path / "cstore", "scrawl", "s1")

    def run_once(tag, urls, run_id, now_ts):
        seeds_dir = tmp_path / f"seeds_{tag}"
        seeds_dir.mkdir()
        out_dir = str(tmp_path / f"out_{tag}")
        spark.createDataFrame(
            [(u, i) for i, u in enumerate(urls)], "url string, emit_seq long"
        ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
        q = run_streaming_crawl(
            spark,
            stream_seed_source(spark, str(seeds_dir) + "/*"),
            corpus,
            out_dir,
            str(tmp_path / f"ckpt_{tag}"),
            cache_store=store,
            run_id=run_id,
            now_ts=now_ts,
        )
        q.awaitTermination(120)
        return spark.read.parquet(f"{out_dir}/batch=*")

    first = run_once(
        "r1", [doc_url(1), doc_url(2), doc_url(4)], "s1",
        "2024-01-02 00:00:00",
    )
    hashes1 = {r["final_url"]: r["content_hash"] for r in first.collect()}
    cache = store.read_shared(spark, "http_cache")
    assert cache.count() == 3  # every ok page cached

    # run 2 (fresh seen/out, same cache): unchanged pages replay
    second = run_once(
        "r2", [doc_url(1), doc_url(2), doc_url(5)], "s2",
        "2024-01-03 00:00:00",
    )
    rows2 = {r["final_url"]: r for r in second.collect()}
    for u in (doc_url(1), doc_url(2)):
        assert rows2[u]["replayed"] is True
        assert rows2[u]["content_hash"] == hashes1[u]
    assert not rows2[doc_url(5)]["replayed"]
    by_run = {
        r["run_id"]: r["n"]
        for r in store.read_shared(spark, "http_cache")
        .groupBy("run_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_run == {"s1": 3, "s2": 1}  # only the new page re-cached
    corpus.unpersist()


def test_stateful_politeness_release(spark, tmp_path):
    """applyInPandasWithState per-host budget: batch 1 parks the
    overflow in keyed state, batch 2 releases it FIFO — the parked
    queue of memorious/model/queue.py:30-37 living in Spark's state
    store."""
    from memorious_spark.streaming.stateful import politeness_release

    src = tmp_path / "cands"
    src.mkdir()
    out = str(tmp_path / "released")
    ckpt = str(tmp_path / "ck")

    spark.createDataFrame(
        [("h1", f"https://h1/doc/{i}", i) for i in range(5)]
        + [("h2", "https://h2/doc/0", 100)],
        "host string, url string, emit_seq long",
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(
        "host string, url string, emit_seq long"
    ).parquet(str(src) + "/*")
    q = (
        politeness_release(stream, budget=2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got1 = spark.read.parquet(out)
    released1 = sorted(
        (r["host"], r["emit_seq"]) for r in got1.collect()
    )
    # ≤2 per host, FIFO: h1 released 0,1 (2,3,4 parked), h2 released 100
    assert released1 == [("h1", 0), ("h1", 1), ("h2", 100)]

    # a second drop wakes h1 (new url seq=50) → releases parked 2,3
    # (FIFO beats the newcomer)
    spark.createDataFrame(
        [("h1", "https://h1/doc/50", 50)],
        "host string, url string, emit_seq long",
    ).coalesce(1).write.parquet(str(src / "b2"))
    q2 = (
        politeness_release(stream, budget=2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = sorted(
        (r["host"], r["emit_seq"]) for r in spark.read.parquet(out).collect()
    )
    assert got2 == [
        ("h1", 0), ("h1", 1), ("h1", 2), ("h1", 3), ("h2", 100)
    ]


def test_streaming_corpus_miss_retries_on_later_trigger(spark, tmp_path):
    """Retry parity with the batch face: a seed url that joins NO
    corpus row must not vanish — it parks in the retry source with
    attempt+1 and succeeds on a later trigger once the corpus has
    gained the row; attempts beyond max_retries land in the
    dead-letter dir."""
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus_small = build_corpus(spark, docs, 30).persist()
    corpus_small.count()
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    retry_dir = str(tmp_path / "retry")

    # doc 35 is NOT in the 30-doc corpus yet
    spark.createDataFrame(
        [(doc_url(1), 0), (doc_url(35), 1)], "url string, emit_seq long"
    ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    q = run_streaming_crawl(
        spark, stream, corpus_small, out_dir, ckpt, retry_dir=retry_dir
    )
    q.awaitTermination(120)
    urls1 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    assert urls1 == {doc_url(1)}
    parked = spark.read.option("recursiveFileLookup", "true").schema(
        "url string, emit_seq long, attempt int"
    ).parquet(retry_dir).collect()
    assert [(r["url"], r["attempt"]) for r in parked] == [(doc_url(35), 1)]

    # the corpus gains the row → the parked url succeeds on trigger 2
    docs2 = spark.range(40).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus_big = build_corpus(spark, docs2, 40).persist()
    corpus_big.count()
    q2 = run_streaming_crawl(
        spark, stream, corpus_big, out_dir, ckpt, retry_dir=retry_dir
    )
    q2.awaitTermination(120)
    urls2 = {
        r["final_url"]
        for r in spark.read.parquet(f"{out_dir}/batch=*").collect()
    }
    assert doc_url(35) in urls2
    corpus_small.unpersist()
    corpus_big.unpersist()


def test_streaming_retry_exhaustion_dead_letters(spark, tmp_path):
    """A url the corpus never gains cycles retry triggers and lands in
    the dead-letter dir after max_retries — never a silent drop."""
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("txt").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = build_corpus(spark, docs, 10).persist()
    corpus.count()
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    retry_dir = str(tmp_path / "retry")

    spark.createDataFrame(
        [("https://h0.example.com/doc/99", 0)], "url string, emit_seq long"
    ).coalesce(1).write.parquet(str(seeds_dir / "b1"))
    stream = stream_seed_source(spark, str(seeds_dir) + "/*")
    for _ in range(3):  # trigger: initial + 2 retries at max_retries=2
        q = run_streaming_crawl(
            spark, stream, corpus, out_dir, ckpt,
            retry_dir=retry_dir, max_retries=2,
        )
        q.awaitTermination(120)
    dead = spark.read.option("recursiveFileLookup", "true").schema(
        "url string, emit_seq long, attempt int"
    ).parquet(retry_dir + "_dead").collect()
    assert [(r["url"], r["attempt"]) for r in dead] == [
        ("https://h0.example.com/doc/99", 3)
    ]
    corpus.unpersist()


def test_streaming_trap_filter_parity(spark, tmp_path):
    """Face parity for the crawler-trap gate: a pathological seed URL
    (segment run of 3) present IN the corpus is dropped before the
    seen probe when trap_filter=True — never fetched, never marked
    seen — while clean seeds flow."""
    import datetime

    trap_url = "https://t.example.com/cal/cal/cal/2026"
    corpus = spark.createDataFrame(
        [
            ("https://t.example.com/doc/1", datetime.datetime(2026, 1, 1),
             bytearray(b"<html><body>ok</body></html>"), "ok", "en",
             "text/html", 200, None),
            (trap_url, datetime.datetime(2026, 1, 1),
             bytearray(b"<html><body>trap</body></html>"), "trap", "en",
             "text/html", 200, None),
        ],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_type string, status_code int, "
        "redirect_to string",
    ).persist()
    corpus.count()

    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(
        [("https://t.example.com/doc/1", 0), (trap_url, 1)],
        "url string, emit_seq long",
    ).write.parquet(str(seeds_dir / "b1"))
    q = run_streaming_crawl(
        spark, stream_seed_source(spark, str(seeds_dir) + "/*"), corpus,
        out_dir, str(tmp_path / "ckpt"), trap_filter=True,
    )
    q.awaitTermination(120)
    got = {r["final_url"] for r in
           spark.read.parquet(f"{out_dir}/batch=*").select("final_url").collect()}
    assert got == {"https://t.example.com/doc/1"}
    from memorious_spark.functions.urls import hash_col, norm_col

    trap_hash = spark.createDataFrame([(trap_url,)], "url string").select(
        hash_col(norm_col(F.col("url"))).alias("h")
    ).collect()[0].h
    seen = {r["url_hash"] for r in
            spark.read.parquet(f"{out_dir}/_seen").select("url_hash").collect()}
    assert trap_hash not in seen and len(seen) == 1
    corpus.unpersist()
