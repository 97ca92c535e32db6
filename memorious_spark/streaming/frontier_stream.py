"""Structured-Streaming face of the engine (optional per SURVEY.md §7).

Memorious's own execution is a finite FIFO drain, which the batch
round loop reproduces exactly; this module is the continuous-ingest
variant a production frontier needs: new seed URLs (or re-crawl
schedule rows) arrive as a stream, each micro-batch flows through the
SAME stage operators (canonicalize → dedup vs the persistent seen set
→ fetch join → parse), and results append to the run tables. The
stage logic is shared with the batch runner — ``foreachBatch``
delegates to the identical DataFrame functions, so semantics can't
drift between the two faces.

Checkpointing: Spark's streaming checkpoint handles the source
offsets; the engine's own seen/results tables stay the source of
truth (idempotent via anti-join, so at-least-once delivery from the
source is fine — the seen set makes re-delivered URLs no-ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from memorious_spark.functions.urls import hash_col, host_col, norm_col, scheme_ok_col
from memorious_spark.operators.fetch import fetch_stage
from memorious_spark.operators.parse import ParseConfig, parse_stage
from memorious_spark.operators.seen import dedup_new

__all__ = ["stream_seed_source", "run_streaming_crawl"]


def stream_seed_source(
    spark: SparkSession, path: str, schema: str = "url string, emit_seq long"
) -> DataFrame:
    """File-based streaming seed source: drop parquet files of
    ``(url, emit_seq)`` into ``path`` and each becomes a micro-batch.
    (On a real deployment this is a Kafka/queue source — same shape.)"""
    return spark.readStream.schema(schema).parquet(path)


def run_streaming_crawl(
    spark: SparkSession,
    seeds_stream: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    parse_config: ParseConfig | None = None,
    seen_dir: str | None = None,
):
    """Continuous crawl ingest: every micro-batch of seed URLs is
    canonicalized, deduped against the persistent seen table, fetched
    (corpus join) and parsed; parsed rows append to ``out_dir`` and
    their hashes to the seen table. Returns the StreamingQuery."""
    parse_config = parse_config or ParseConfig()
    seen_path = seen_dir or f"{out_dir}/_seen"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        frontier = (
            batch_df.filter(scheme_ok_col(F.col("url")))
            .withColumn("url_norm", norm_col(F.col("url")))
            .withColumn("url_hash", hash_col(F.col("url_norm")))
            .withColumn("host", host_col(F.col("url")))
            .withColumn("depth", F.lit(0))
            .withColumn("priority", F.lit(0.0))
            .withColumn("src_url", F.lit(None).cast("string"))
            .withColumn("link_idx", F.lit(None).cast("int"))
            .withColumn("attempt", F.lit(0))
        )
        try:
            seen = spark.read.parquet(seen_path)
        except Exception:
            seen = None
        fresh = dedup_new(frontier, seen).persist()
        # Idempotent replay order: results land in a batch-id-keyed dir
        # with OVERWRITE (a retried batch replaces its own output —
        # never duplicates, never loses rows), and only then do the
        # hashes append to seen (duplicate hashes from a replayed
        # append are harmless: the seen probe is set-membership).
        # The reverse order would lose data: seen-first makes a retry's
        # anti-join drop the batch before its results ever landed.
        fetched = fetch_stage(fresh, corpus)
        parsed = parse_stage(fetched, parse_config)
        parsed.drop("link_titles").write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        fresh.select("url_hash").write.mode("append").parquet(seen_path)
        fresh.unpersist()

    return (
        seeds_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
