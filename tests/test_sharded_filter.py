"""Executor-resident sharded seen-filter (operators/sharded_filter.py).

The scale posture under test: filter maintenance must move ZERO filter
bytes through the driver (the broadcast bloom's bitmap round-trip is
the driver bottleneck at a 10^10-URL frontier), while keeping the
exactness contract of ``seen.dedup_new`` — the probe only prunes, the
final left_anti decides.
"""

import dataclasses

import pytest
from pyspark.sql import functions as F

import memorious_spark.plans.runner as runner_mod
from memorious_spark.operators.sharded_filter import (
    build_sharded_bloom, dedup_new_sharded, update_sharded,
)
from memorious_spark.plans.pipeline import CrawlConfig, load_yaml
from memorious_spark.plans.runner import CrawlRunner
from memorious_spark.plans.storage import RunStore


def test_dedup_new_sharded_exactness(spark):
    """Sharded probe == plain anti-join, including with a deliberately
    under-sized filter (lots of false positives) and NULL keys."""
    seen = spark.range(0, 1000, 2).select(F.col("id").alias("url_hash"))
    cands = spark.range(1000).select(F.col("id").alias("url_hash")).unionByName(
        spark.createDataFrame([(None,)], "url_hash long")
    )
    for expected in (4000, 8):  # right-sized and absurdly under-sized
        filt = build_sharded_bloom(seen, "url_hash", expected=expected, shards=4)
        out = dedup_new_sharded(cands, seen, filt)
        got = sorted(
            r["url_hash"] for r in out.collect() if r["url_hash"] is not None
        )
        assert got == list(range(1, 1000, 2))
        assert out.filter(F.col("url_hash").isNull()).count() == 1
        filt.df.unpersist()


def test_sharded_update_incremental(spark):
    """A round's additions OR into their shards without a rebuild; the
    next probe sees them (no false negatives — the one hazard)."""
    seen0 = spark.range(0, 1000, 2).select(F.col("id").alias("url_hash"))
    filt = build_sharded_bloom(seen0, "url_hash", expected=4000, shards=4)
    add = spark.range(5000, 5100).select(F.col("id").alias("url_hash"))
    filt = update_sharded(filt, add)
    seen_all = seen0.unionByName(add)
    cands = spark.range(1000).select(F.col("id").alias("url_hash")).unionByName(
        spark.range(5000, 5200).select(F.col("id").alias("url_hash"))
    )
    got = sorted(
        r["url_hash"] for r in dedup_new_sharded(cands, seen_all, filt).collect()
    )
    assert got == list(range(1, 1000, 2)) + list(range(5100, 5200))
    filt.df.unpersist()


def test_sharded_zero_false_negatives(spark):
    """Every seen key must flag maybe_seen: a false negative would skip
    the exact anti-join and wrongly re-emit a seen URL — the one
    correctness hazard of the prefilter design. Probing the seen set
    against itself returns nothing ONLY if no key was lost (flagged
    rows are caught by the anti-join; unflagged rows bypass it)."""
    seen = spark.range(0, 4000, 2).select(F.col("id").alias("url_hash"))
    filt = build_sharded_bloom(seen, "url_hash", expected=16000, shards=4)
    assert dedup_new_sharded(seen, seen, filt).count() == 0
    # and after an incremental update, the new keys are covered too
    add = spark.range(7000, 7500).select(F.col("id").alias("url_hash"))
    filt = update_sharded(filt, add)
    both = seen.unionByName(add)
    assert dedup_new_sharded(both, both, filt).count() == 0
    filt.df.unpersist()


def test_sharded_save_load_roundtrip(spark, tmp_path):
    """RunStore checkpoint: distributed parquet + pointer JSON; a
    second save supersedes (and drops) the first version dir; the
    reloaded filter probes identically."""
    store = RunStore(tmp_path, "c", "run1")
    store.dir.mkdir(parents=True, exist_ok=True)
    seen = spark.range(0, 500, 2).select(F.col("id").alias("url_hash"))
    filt = build_sharded_bloom(seen, "url_hash", expected=2000, shards=4)
    store.save_sharded(filt)
    assert (store.dir / "sharded_bloom.json").exists()
    assert (store.dir / "sharded_bloom.v1").is_dir()

    loaded = store.load_sharded(spark)
    assert (loaded.shards, loaded.m, loaded.k, loaded.capacity) == (
        filt.shards, filt.m, filt.k, filt.capacity,
    )
    cands = spark.range(500).select(F.col("id").alias("url_hash"))
    got = sorted(
        r["url_hash"] for r in dedup_new_sharded(cands, seen, loaded).collect()
    )
    assert got == list(range(1, 500, 2))

    # version rotation: save again, v1 is gone, v2 is live
    filt2 = update_sharded(
        loaded, spark.range(9000, 9010).select(F.col("id").alias("url_hash"))
    )
    store.save_sharded(filt2)
    assert not (store.dir / "sharded_bloom.v1").exists()
    assert (store.dir / "sharded_bloom.v2").is_dir()
    assert store.load_sharded(spark) is not None
    filt.df.unpersist()
    filt2.df.unpersist()


def test_yaml_seen_filter_wiring():
    yml = """
name: shardedcrawl
pipeline:
  init: {method: seed, params: {urls: ["https://h0.example.com/doc/0"]},
         handle: {pass: fetch}}
  fetch: {method: fetch, params: {seen_filter: sharded}, handle: {pass: parse}}
  parse: {method: parse}
"""
    cfg = load_yaml(yml)
    assert cfg.seen_filter == "sharded"
    with pytest.raises(ValueError, match="seen_filter"):
        load_yaml(yml.replace("sharded", "redis"))


def test_crawl_sharded_matches_plain(spark, tmp_path):
    """E2e: a crawl under the sharded posture stores exactly the plain
    run's rows; kill/resume reloads the checkpointed shard table
    (never rebuilds from the seen scan); the metrics ledger shows
    filter_driver_bytes == 0 every round (the O(P) claim, as a
    recorded number)."""
    from memorious_spark.sources.corpus import build_corpus, seed_urls

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("body words").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = build_corpus(spark, docs, 100).persist()
    corpus.count()
    cfg = CrawlConfig(name="shardcrawl", seeds=tuple(seed_urls(3)))
    cfg_sharded = dataclasses.replace(cfg, seen_filter="sharded")

    def rows(store, rounds):
        return sorted(map(tuple, store.read_all(spark, "results", rounds)
                          .select("url", "emit_seq", "content_hash").collect()))

    plain_store = RunStore(tmp_path, "shardcrawl", "plain")
    res_plain = CrawlRunner(spark, cfg, plain_store).run(corpus)

    orig_min = runner_mod._BLOOM_MIN_ROWS
    orig_build = runner_mod.build_sharded_bloom
    builds = []

    def counting_build(*a, **kw):
        builds.append(1)
        return orig_build(*a, **kw)

    runner_mod._BLOOM_MIN_ROWS = 1
    runner_mod.build_sharded_bloom = counting_build
    try:
        sh_store = RunStore(tmp_path, "shardcrawl", "sharded")
        res_sh = CrawlRunner(spark, cfg_sharded, sh_store).run(corpus)
        assert rows(sh_store, res_sh.rounds) == rows(plain_store, res_plain.rounds)
        assert (res_sh.pages_fetched, res_sh.urls_seen) == (
            res_plain.pages_fetched, res_plain.urls_seen,
        )
        # engages once, plus at most one capacity regrow (the 4×
        # headroom sizing under the patched-tiny threshold); every
        # other round maintains incrementally
        assert 1 <= len(builds) <= 2
        # the O(P) evidence: zero filter bytes through the driver
        metrics = sh_store.read_all(spark, "metrics", res_sh.rounds)
        fdb = metrics.filter(F.col("stage") == "filter_driver_bytes")
        assert fdb.count() > 0
        assert fdb.agg(F.max("rows")).first()[0] == 0

        # kill/resume: the checkpoint is reloaded, never rebuilt
        killed = RunStore(tmp_path, "shardcrawl", "killed")
        CrawlRunner(
            spark, dataclasses.replace(cfg_sharded, max_rounds=3), killed
        ).run(corpus)
        assert (killed.dir / "sharded_bloom.json").exists()
        builds.clear()
        resumed = CrawlRunner(spark, cfg_sharded, killed).run(
            corpus, resume=True
        )
        assert resumed.status == "done"
        assert builds == []  # resume loaded the parquet checkpoint
        assert rows(killed, 60) == rows(plain_store, res_plain.rounds)
    finally:
        runner_mod._BLOOM_MIN_ROWS = orig_min
        runner_mod.build_sharded_bloom = orig_build
    corpus.unpersist()


def test_bloom_mode_reports_driver_bytes(spark, tmp_path):
    """Contrast row: under the (default) broadcast-bloom posture the
    same ledger reports the bitmap-sized driver transfer — the number
    the sharded posture exists to zero out."""
    from memorious_spark.sources.corpus import build_corpus, seed_urls

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.lit("body words").alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = build_corpus(spark, docs, 60).persist()
    corpus.count()
    cfg = CrawlConfig(name="bloombytes", seeds=tuple(seed_urls(2)))
    orig_min = runner_mod._BLOOM_MIN_ROWS
    runner_mod._BLOOM_MIN_ROWS = 1
    try:
        store = RunStore(tmp_path, "bloombytes", "r1")
        res = CrawlRunner(spark, cfg, store).run(corpus)
        metrics = store.read_all(spark, "metrics", res.rounds)
        fdb = metrics.filter(F.col("stage") == "filter_driver_bytes")
        assert fdb.agg(F.max("rows")).first()[0] > 0
    finally:
        runner_mod._BLOOM_MIN_ROWS = orig_min
    corpus.unpersist()


# ---- executor-resident sharded cuckoo (the deletable twin) -------------


def test_sharded_cuckoo_exactness_and_delete(spark):
    """Build → probe == plain anti-join; DELETE (the operation the
    bloom lacks) makes expired keys crawlable again — all shard-local
    cogrouped jobs, no driver filter bytes."""
    from memorious_spark.operators.sharded_filter import (
        build_sharded_cuckoo, dedup_new_sharded_cuckoo,
        delete_sharded_cuckoo, update_sharded_cuckoo,
    )

    seen0 = spark.range(0, 1000, 2).select(F.col("id").alias("url_hash"))
    filt = build_sharded_cuckoo(seen0, "url_hash", expected=4000, shards=4)
    cands = spark.range(1000).select(F.col("id").alias("url_hash")).unionByName(
        spark.createDataFrame([(None,)], "url_hash long")
    )
    out = dedup_new_sharded_cuckoo(cands, seen0, filt)
    got = sorted(
        r["url_hash"] for r in out.collect() if r["url_hash"] is not None
    )
    assert got == list(range(1, 1000, 2))
    assert out.filter(F.col("url_hash").isNull()).count() == 1

    # incremental insert
    add = spark.range(5000, 5100).select(F.col("id").alias("url_hash"))
    filt = update_sharded_cuckoo(filt, add)
    seen_all = seen0.unionByName(add)
    both = seen_all.unionByName(seen_all)  # probing seen against itself
    assert dedup_new_sharded_cuckoo(
        seen_all, seen_all, filt
    ).count() == 0  # zero false negatives after the update

    # delete expired: every 6th key leaves; it must come back crawlable
    expired = spark.range(0, 1000, 6).select(F.col("id").alias("url_hash"))
    filt, removed = delete_sharded_cuckoo(filt, expired)
    assert removed == expired.count()
    live = seen_all.join(expired, "url_hash", "left_anti")
    out2 = dedup_new_sharded_cuckoo(
        cands.filter(F.col("url_hash").isNotNull()), live, filt
    )
    want = sorted(
        set(range(1, 1000, 2)) | set(range(0, 1000, 6))
    )
    assert sorted(r["url_hash"] for r in out2.collect()) == want
    filt.df.unpersist()


def test_sharded_cuckoo_matches_driver_cuckoo(spark):
    """The executor-resident filter stores EXACTLY the fingerprints
    the driver CuckooFilter stores (shared kernel, shared routing) —
    probing any candidate set gives identical maybe/new splits."""
    from memorious_spark.operators.cuckoo import build_cuckoo
    from memorious_spark.operators.sharded_filter import (
        build_sharded_cuckoo, dedup_new_sharded_cuckoo,
    )
    from memorious_spark.operators.seen import dedup_new

    seen = spark.range(0, 2000, 3).select(F.col("id").alias("url_hash"))
    driver_f = build_cuckoo(seen, "url_hash", expected=4000, n_shards=4)
    sharded_f = build_sharded_cuckoo(seen, "url_hash", expected=4000, shards=4)
    assert (sharded_f.shards, sharded_f.nb) == (driver_f.n_shards, driver_f.nb)
    cands = spark.range(0, 2500).select(F.col("id").alias("url_hash"))
    a = sorted(
        r["url_hash"]
        for r in dedup_new(cands, seen, cuckoo=driver_f).collect()
    )
    b = sorted(
        r["url_hash"]
        for r in dedup_new_sharded_cuckoo(cands, seen, sharded_f).collect()
    )
    assert a == b
    sharded_f.df.unpersist()


def test_sharded_cuckoo_overfull_fails_loud(spark):
    """An over-full shard must raise (in its task), never drop a key —
    a dropped insert would be a false negative at probe time."""
    from memorious_spark.operators.sharded_filter import build_sharded_cuckoo

    keys = spark.range(5000).select(F.col("id").alias("url_hash"))
    with pytest.raises(Exception, match="over-full"):
        build_sharded_cuckoo(keys, "url_hash", expected=64, shards=2)
