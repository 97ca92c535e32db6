"""Benchmark decontamination — flag corpus documents that overlap an
evaluation set by word n-grams.

The published procedure (Brown et al. 2020 "Language Models are
Few-Shot Learners" §C; Touvron et al. 2023 — both filter training
text sharing any 13-gram with a benchmark): a document is
*contaminated* when any of its word ``n``-grams appears anywhere in
the benchmark corpus. The reference crawler has no notion of this;
it belongs to the engine's training-data curation surface next to
``operators/dedup.py``.

Design posture for 100 TB:

- The benchmark side is SMALL relative to the corpus (eval suites are
  megabytes; the corpus is the 100 TB side). Its distinct n-gram set
  is computed once — one explode + hash-aggregate over the benchmark
  only — and then:

  - set ≤ ``broadcast_max``: folded to ONE array row and
    broadcast-crossJoined; per-doc overlap is a pure Column
    ``array_intersect`` over the corpus scan — the 100 TB side never
    shuffles and never explodes.
  - bigger: corpus grams posexplode → join on the gram (Spark
    broadcasts the benchmark side when it fits, AQE decides
    otherwise) → per-doc count keyed by doc_id (map-side combined).

- Counting uses DISTINCT grams per document (`array_distinct` /
  count(distinct gram)) so a doc repeating one benchmark sentence
  100× scores 1 hit-gram, matching the any-overlap keep/drop rule.
- Exact ANSI-SQL twin per path (DuckDB list lambdas) for the driver
  oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from memorious_spark.functions.hof import bind_once
from memorious_spark.operators.frontier import ensure_parallelism

__all__ = ["word_ngrams", "flag_contaminated"]


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams of ``text`` (whitespace
    tokenization; docs under ``n`` words yield an empty array). Pure
    Column — shared by both overlap paths and by the oracle twin.

    The token array is bound ONCE (:func:`bind_once`): inlining the
    split into the transform lambda re-tokenizes the document per
    gram (HOF lambdas are interpreted, no CSE — measured 3.3× on the
    sf0.1 scan)."""

    def grams(w: Column) -> Column:
        # sequence(0, -1) DESCENDS in Spark — guard the short-doc case
        idx = F.when(
            F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, n))
        )

    return bind_once(F.split(F.trim(text), r"\s+"), grams)


def flag_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    broadcast_max: int = 5_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Return ``(id_col, n_hit_grams, contaminated)`` for every input
    document: ``n_hit_grams`` = how many DISTINCT word ``n``-grams of
    the doc occur anywhere in ``benchmark``; ``contaminated`` =
    ``n_hit_grams > 0`` (the drop rule).

    ``stats`` (optional out-param) receives ``bench_grams`` (distinct
    benchmark n-gram count) and ``path`` (``broadcast`` | ``join``).
    """
    bench_grams = (
        ensure_parallelism(benchmark)
        .select(F.explode(word_ngrams(F.col(bench_text_col), n)).alias("g"))
        .distinct()
        .persist()
    )
    n_bench = bench_grams.count()
    path = "broadcast" if n_bench <= broadcast_max else "join"
    if stats is not None:
        stats["bench_grams"] = n_bench
        stats["path"] = path

    doc_grams = word_ngrams(F.col(text_col), n)
    if path == "broadcast":
        barr = bench_grams.agg(F.collect_set("g").alias("_bench"))
        out = (
            docs.crossJoin(F.broadcast(barr))
            .select(
                F.col(id_col),
                F.size(
                    F.array_intersect(F.array_distinct(doc_grams), "_bench")
                )
                .cast("long")
                .alias("n_hit_grams"),
            )
        )
    else:
        exploded = docs.select(
            F.col(id_col),
            F.explode_outer(F.array_distinct(doc_grams)).alias("g"),
        )
        hits = exploded.join(bench_grams, "g", "left_semi")
        out = (
            exploded.select(id_col)
            .distinct()
            .join(
                hits.groupBy(id_col).agg(
                    F.count(F.lit(1)).cast("long").alias("n_hit_grams")
                ),
                id_col,
                "left",
            )
            .select(
                id_col,
                F.coalesce("n_hit_grams", F.lit(0).cast("long")).alias(
                    "n_hit_grams"
                ),
            )
        )
    return out.withColumn("contaminated", F.col("n_hit_grams") > 0)
