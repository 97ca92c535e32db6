"""The crawl runner: batched BFS frontier rounds.

One round = one generation of memorious's FIFO drain (SURVEY.md §3.1):

    frontier → rule gate → politeness dequeue → fetch (corpus join)
             → parse (Arrow UDF) → store sink
             → link explode → within-round dedup → seen anti-join
             → emit_seq assignment → next frontier

Round-discretization contract (documented deviations are part of the
engine's spec, SURVEY.md §4.3):
- all round-r fetch-time seen tags (redirect targets,
  memorious/operations/fetch.py:31-33) apply before round-r parse
  emissions;
- "k req per rate interval per host" (memorious/logic/http.py:209-214)
  becomes "k rows per host per round";
- crawl order equals the reference's single-threaded FIFO order via
  the dense ``emit_seq`` (parents' emit order × link index), without
  any global sort in the hot path.

State (frontier / seen / results / metrics) is checkpointed per round
through :class:`RunStore`; a killed run resumes from the last complete
round. Metrics carry per-partition lineage rows
(``spark_partition_id`` granularity) per the north rule.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from memorious_spark.functions.urls import hash_col, host_col, norm_col, scheme_ok_col
from memorious_spark.operators.fetch import fetch_stage
from memorious_spark.operators.frontier import (
    assign_emit_seq, dedup_within_round, politeness_dequeue, salt_partitions,
)
from memorious_spark.operators.parse import extract_links_df, parse_stage
from memorious_spark.operators.seen import dedup_new, seen_entries
from memorious_spark.plans.pipeline import CrawlConfig
from memorious_spark.plans.storage import RunStore

__all__ = ["CrawlRunner", "RunResult"]

_RESULT_COLS = [
    "url", "final_url", "host", "depth", "emit_seq", "status_code",
    "content_type", "content_hash", "retrieved_at", "title", "text",
    "meta", "properties", "src_url",
]


_TIMING = os.environ.get("MEMSPARK_TIMING") == "1"


class _Phase:
    """Opt-in per-phase wall-clock tracing (MEMSPARK_TIMING=1)."""

    def __init__(self, rnd: int):
        self.rnd = rnd
        self.t = time.time()

    def mark(self, label: str) -> None:
        if _TIMING:
            now = time.time()
            print(f"  [round {self.rnd}] {label}: {now - self.t:.1f}s", flush=True)
            self.t = now


@dataclass
class RunResult:
    run_id: str
    rounds: int
    pages_fetched: int
    pages_stored: int
    urls_seen: int
    status: str


class CrawlRunner:
    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        store: RunStore,
        robots: DataFrame | None = None,
    ):
        self.spark = spark
        self.config = config
        self.store = store
        self.robots = robots
        from memorious_spark.plans.rules import uses_text

        self._fetch_rule_needs_text = uses_text(config.fetch_rules)

    # ---- frontier construction -------------------------------------
    def _seed_frontier(self) -> DataFrame:
        """Seed emit order = list order (memorious/operations/
        initializers.py:5-18 emits sequentially)."""
        rows = [(u, i) for i, u in enumerate(self.config.seeds)]
        df = self.spark.createDataFrame(rows, "url string, emit_seq long")
        return self._frontier_shape(df, depth=F.lit(0))

    @staticmethod
    def _frontier_shape(df: DataFrame, depth) -> DataFrame:
        url_norm = norm_col(F.col("url"))
        return df.select(
            "url",
            url_norm.alias("url_norm"),
            hash_col(url_norm).alias("url_hash"),
            host_col(F.col("url")).alias("host"),
            depth.cast("int").alias("depth"),
            F.lit(0.0).alias("priority"),
            (df["src_url"] if "src_url" in df.columns else F.lit(None).cast("string")).alias("src_url"),
            (df["link_idx"] if "link_idx" in df.columns else F.lit(None).cast("int")).alias("link_idx"),
            F.col("emit_seq").cast("long").alias("emit_seq"),
            F.lit(0).alias("attempt"),
        )

    # ---- main loop ---------------------------------------------------
    def run(
        self,
        corpus: DataFrame,
        resume: bool = False,
        initial_frontier: DataFrame | None = None,
    ) -> RunResult:
        """``initial_frontier`` (url string, emit_seq long) seeds round 0
        from a DataFrame instead of the config's literal seed list —
        the scale path for huge seed sets (a billion-URL frontier never
        goes through the driver)."""
        cfg, store, spark = self.config, self.store, self.spark
        fetch_rule = cfg.fetch_rule_col()
        store_rule = cfg.store_rule_col()

        if resume and (m := store.read_manifest()) is not None:
            start_round = m["last_complete_round"] + 1
            next_seq = m["rounds"][-1]["next_seq"]
            seen_count = m["rounds"][-1]["urls_seen"]
            totals = {
                "fetched": sum(r["fetched"] for r in m["rounds"]),
                "stored": sum(r["stored"] for r in m["rounds"]),
            }
            store.truncate_after(start_round)  # drop partial writes
        else:
            if initial_frontier is not None:
                frontier0 = self._frontier_shape(initial_frontier, depth=F.lit(0))
                n_seeds = frontier0.count()
            else:
                frontier0 = self._seed_frontier()
                n_seeds = len(cfg.seeds)
            start_round, next_seq, seen_count = 0, n_seeds, 0
            totals = {"fetched": 0, "stored": 0}
            store.write_round("frontier", 0, frontier0)

        rnd = start_round
        status = "done"
        while rnd < cfg.max_rounds:
            if store.abort_requested():
                status = "aborted"
                break
            ph = _Phase(rnd)
            frontier = store.read_round(spark, "frontier", rnd)
            if frontier is None or not frontier.head(1):
                break
            ph.mark("read frontier")

            seen = store.read_all(spark, "seen", rnd - 1)

            # politeness budget + hot-host salting. No configured rate
            # limit and no robots → no parking semantics to enforce →
            # skip the per-host window entirely (one less shuffle; the
            # reference only parks stages when a limit exists,
            # memorious/model/queue.py:30-37).
            if cfg.budget_per_host >= 1_000_000_000 and self.robots is None:
                selected, carryover = frontier, None
            else:
                selected, carryover = politeness_dequeue(
                    frontier, cfg.budget_per_host, self.robots
                )
            selected = salt_partitions(selected).persist()
            n_selected = selected.count()
            ph.mark(f"politeness+salt ({n_selected})")

            # fetch = corpus join (broadcast frontier side when small)
            fetched, retry, fetch_persisted = fetch_stage(
                selected, corpus, cfg.retries, selected_count=n_selected
            )
            # rules that don't touch the body gate BEFORE parse (the
            # lazy-fetch economy of memorious/operations/fetch.py:16);
            # xpath rules need the decoded text → gate after parse
            if self._fetch_rule_needs_text:
                parsed = parse_stage(fetched, cfg.parse).filter(fetch_rule)
            else:
                parsed = parse_stage(fetched.filter(fetch_rule), cfg.parse)
            parsed = parsed.withColumn("retrieved_at", F.col("warc_ts"))
            # serialized persist: deserialized caching of row objects with
            # long text columns causes GC/storage contention at high core
            # counts (local[32] measured SLOWER than local[8] without this)
            from pyspark.storagelevel import StorageLevel as _SL
            parsed = parsed.persist(_SL.MEMORY_AND_DISK)
            n_fetched = parsed.count()
            ph.mark(f"fetch+parse ({n_fetched})")

            stored = parsed.filter(store_rule).select(*_RESULT_COLS)
            store.write_round("results", rnd, stored)
            n_stored = stored.count()  # cheap: parsed is persisted
            ph.mark(f"results write ({n_stored})")

            # fetch-time seen tags: redirect targets (fetch.py:31-33).
            # tagger_seq preserves the sequential-interleaving contract:
            # in the single-threaded reference, a redirect tag placed by
            # the task with emit_seq s blocks link emissions only from
            # tasks processed AFTER s — not from earlier ones whose
            # emits already happened.
            redirect_tags = (
                parsed.filter(F.col("redirected_from").isNotNull())
                .select(
                    norm_col(F.col("final_url")).alias("url_norm"),
                    F.col("emit_seq").alias("tagger_seq"),
                )
                .withColumn("url_hash", hash_col(F.col("url_norm")))
                .groupBy("url_hash", "url_norm")
                .agg(F.min("tagger_seq").alias("tagger_seq"))
            )

            # link candidates → within-round dedup → seen anti-join
            cands = extract_links_df(parsed).filter(
                scheme_ok_col(F.col("url"))
            )
            if cfg.max_depth is not None:
                cands = cands.filter(F.col("depth") <= cfg.max_depth)
            cands = cands.withColumn("url_norm", norm_col(F.col("url"))).withColumn(
                "url_hash", hash_col(F.col("url_norm"))
            )
            cands = dedup_within_round(cands, ["src_emit_seq", "link_idx"])
            # same-round redirect tags block only later emitters
            cands = (
                cands.join(
                    F.broadcast(redirect_tags.select("url_hash", "tagger_seq")),
                    "url_hash",
                    "left",
                )
                .filter(
                    F.col("tagger_seq").isNull()
                    | (F.col("tagger_seq") > F.col("src_emit_seq"))
                )
                .drop("tagger_seq")
            )
            seen_keys = (
                seen.select(F.col("key_hash").alias("url_hash"))
                if seen is not None
                else None
            )
            # materialize the dedup chain ONCE before sequence
            # assignment — assign_emit_seq's internal size-collect would
            # otherwise re-execute the whole explode/window/anti-join
            new0 = dedup_new(cands, seen_keys, seen_count=seen_count + 1).persist()
            n_new = new0.count()
            if n_new:
                new_links = assign_emit_seq(
                    new0, ["src_emit_seq", "link_idx"], start=next_seq
                ).persist()
                new_links.count()
            else:
                new_links = new0.withColumn(
                    "emit_seq", F.lit(None).cast("long")
                )
            ph.mark(f"dedup+emit_seq ({n_new})")
            next_seq += n_new

            new_frontier_rows = new_links.select(
                "url", "url_norm", "url_hash",
                host_col(F.col("url")).alias("host"),
                F.col("depth").cast("int"),
                F.lit(0.0).alias("priority"),
                "src_url",
                F.col("link_idx").cast("int"),
                "emit_seq",
                F.lit(0).alias("attempt"),
            )
            next_frontier = retry.unionByName(new_frontier_rows)
            if carryover is not None:
                next_frontier = carryover.unionByName(next_frontier)
            store.write_round("frontier", rnd + 1, next_frontier)
            ph.mark("frontier write")

            # seen append: emitted links + redirect targets
            seen_rows = seen_entries(
                new_links, cfg.name, store.dir.name, "link",
                value="url_norm", expire_days=cfg.expire_days,
            ).unionByName(
                seen_entries(
                    redirect_tags, cfg.name, store.dir.name,
                    "redirect", value="url_norm", expire_days=cfg.expire_days,
                )
            )
            store.write_round("seen", rnd, seen_rows)
            ph.mark("seen write")
            seen_count = seen_count + n_new  # redirect tags are few; bloom sizing only

            # metrics: round summary + per-partition lineage
            # per-partition lineage: collect the (tiny) partition
            # histogram, write ONE local 1-partition parquet — a
            # distributed union-write of 36 rows costs several whole
            # Spark jobs of scheduling latency per round
            lineage_rows = (
                selected.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count("*").alias("rows"))
                .collect()
            )
            metrics_rows = [
                dict(round=rnd, stage="fetch_input",
                     partition_id=int(r["pid"]), rows=int(r["rows"]))
                for r in lineage_rows
            ] + [
                dict(round=rnd, stage=stage, partition_id=-1, rows=n)
                for stage, n in [
                    ("round_summary", n_selected), ("fetched", n_fetched),
                    ("stored", n_stored), ("new_links", n_new),
                ]
            ]
            store.write_round_local("metrics", rnd, metrics_rows)
            ph.mark("metrics write")

            totals["fetched"] += n_fetched
            totals["stored"] += n_stored
            store.commit_round(
                rnd,
                {
                    "selected": n_selected,
                    "fetched": n_fetched,
                    "stored": n_stored,
                    "new_links": n_new,
                    "next_seq": next_seq,
                    "urls_seen": seen_count,
                },
            )
            ph.mark("commit")
            selected.unpersist()
            parsed.unpersist()
            new0.unpersist()
            new_links.unpersist()
            for df in fetch_persisted:
                df.unpersist()
            ph.mark("unpersist")
            rnd += 1

        store.finish(status)
        return RunResult(
            run_id=store.dir.name,
            rounds=rnd - start_round,
            pages_fetched=totals["fetched"],
            pages_stored=totals["stored"],
            urls_seen=seen_count,
            status=status,
        )
