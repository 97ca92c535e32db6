"""Streaming face: micro-batch seed ingest through the shared stage
operators, idempotent via the seen-set anti-join."""

from pyspark.sql import functions as F

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
