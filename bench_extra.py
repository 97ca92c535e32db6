#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4/§1.5/§7.2).

NOT the frozen driver bench — ``bench.py`` stays the measured contract.
This harness exists for the optimization loop:

- times each declared bench query in isolation (same action shapes as
  ``bench.py``'s lambdas, min of N repeats) with the job labelled via
  ``setJobDescription``;
- optionally re-times the computation through a ``noop`` sink so the
  timing excludes collect/driver transfer;
- dumps ``.explain("formatted")`` for every query to ``plans/r06/``.

Usage:
  python bench_extra.py [--queries substr[,substr...]] [--n 3]
      [--plans-dir plans/r06] [--suffix _before] [--no-time]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_queries(spark, docs, emb, qvec, n_docs):
    """(name -> (df_fn, action)) mirroring bench.py's lambdas.

    df_fn returns the DataFrame whose plan we capture; action executes
    the same terminal action bench.py times ('count' | 'collect' |
    callable)."""
    from pyspark.sql import functions as F

    from memorious_spark.functions import privacy, quality, textops
    from memorious_spark.operators import (
        contamination, dedup, packing, sampling, selection, similarity,
    )

    q = {
        "exact_dedup": (lambda: dedup.exact_dedup(docs), "count"),
        "minhash_lsh_dedup": (lambda: dedup.minhash_lsh_pairs(docs), "count"),
        "ngram_jaccard_dedup": (
            lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.8), "count"
        ),
        "simhash_dedup": (lambda: dedup.simhash_pairs(docs), "count"),
        "embedding_knn": (
            lambda: similarity.knn_brute_force(emb, qvec, k=10), "collect"
        ),
        "ann_lsh_knn": (lambda: similarity.knn_lsh(emb, qvec, k=10), "collect"),
        "ann_ivf_knn": (
            lambda: similarity.knn_ivf(
                emb, qvec, k=10, n_centroids=8, nprobe=2, spacing=37
            ),
            "collect",
        ),
        "ann_pq_knn": (
            lambda: similarity.knn_pq(
                emb, qvec, k=10, m=4, n_codes=16, spacing=31, refine=4
            ),
            "collect",
        ),
        "ann_ivfpq_knn": (
            lambda: similarity.knn_ivfpq(
                emb, qvec, k=10, n_centroids=8, nprobe=2, spacing=37,
                m=4, n_codes=16, pq_spacing=31, refine=4,
            ),
            "collect",
        ),
        "dedup_components": (
            lambda: dedup.dedup_components(dedup.minhash_lsh_pairs(docs)),
            "count",
        ),
        "corpus_dedup": (lambda: dedup.corpus_dedup(docs), "count"),
        "text_quality": (
            lambda: docs.select(
                textops.quality_score(F.col("text")).alias("q")
            ).agg(F.avg("q")),
            "collect",
        ),
        "lang_id": (
            lambda: docs.select(
                textops.lang_guess(F.col("text")).alias("l")
            ).groupBy("l").count(),
            "collect",
        ),
        "gopher_quality": (
            lambda: docs.filter(
                quality.gopher_keep(F.col("text"), min_words=10)
            ),
            "count",
        ),
        "ngram_repetition": (
            lambda: quality.top_ngram_char_frac(docs), "count"
        ),
        "strip_boilerplate": (
            lambda: dedup.strip_boilerplate_lines(
                docs.select("doc_id", "text")
            ).agg(F.sum(F.length("text"))),
            "collect",
        ),
        "decontaminate": (
            lambda: contamination.flag_contaminated(
                docs, docs.filter(F.col("doc_id") % 50 == 0), n=8
            ).filter("contaminated"),
            "count",
        ),
        "token_shards": (
            lambda: packing.pack_token_shards(
                docs.select(
                    "doc_id",
                    textops.token_count(F.col("text")).alias("tokens"),
                ),
                budget=2000,
            ).agg(F.max("shard")),
            "collect",
        ),
        "quota_sample": (
            lambda: sampling.quota_sample(
                docs.select("doc_id", "lang"), "lang", quota=n_docs // 20
            ),
            "count",
        ),
        "temperature_mix": (
            lambda: sampling.temperature_mix(
                docs.select("doc_id", "lang"), "lang", tau=0.5
            ).agg(F.sum("copies")),
            "collect",
        ),
        "pii_scrub": (
            lambda: docs.select(
                privacy.pii_scrub(F.col("text")).alias("s")
            ).agg(F.sum(F.length("s"))),
            "collect",
        ),
        "semantic_dedup": (
            lambda: dedup.semantic_dedup(emb, threshold=0.35).filter(
                "reason = 'semantic'"
            ),
            "count",
        ),
        "hash_split": (
            lambda: sampling.hash_split(
                docs.select("doc_id"),
                {"train": 0.9, "val": 0.05, "test": 0.05},
            ).groupBy("split").count(),
            "collect",
        ),
        "dsir_weights": (
            lambda: selection.importance_weights(
                docs, docs.filter(F.col("doc_id") % 20 == 0)
            ).agg(F.avg("logw")),
            "collect",
        ),
        "span_dup_frac": (
            lambda: dedup.duplicate_span_fraction(docs, k=5).agg(
                F.avg("dup_frac")
            ),
            "collect",
        ),
        "paragraph_dedup": (
            lambda: dedup.paragraph_dedup(
                docs.select(
                    "doc_id",
                    F.concat(
                        F.substring("text", 1, 60), F.lit("\n"),
                        F.lit("shared para "),
                        (F.col("doc_id") % 7).cast("string"),
                        F.lit("\n"), F.expr("substring(text, 61)"),
                    ).alias("text"),
                )
            ).agg(F.sum("n_kept")),
            "collect",
        ),
        "span_dedup_rewrite": (
            lambda: dedup.remove_duplicate_spans(docs, k=5).agg(
                F.sum("n_removed")
            ),
            "collect",
        ),
    }
    return q


def main() -> None:
    sys.path.insert(0, str(REPO))
    argv = sys.argv[1:]

    def opt(name, default=None):
        if name in argv:
            return argv[argv.index(name) + 1]
        return default

    subs = opt("--queries")
    n_rep = int(opt("--n", "3"))
    plans_dir = Path(opt("--plans-dir", str(REPO / "plans" / "r06")))
    suffix = opt("--suffix", "")
    do_time = "--no-time" not in argv
    do_plans = "--no-plans" not in argv

    from pyspark.sql import functions as F

    from memorious_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]", app_name="bench-extra",
        shuffle_partitions=CPUS,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    emb.count()
    qrow = emb.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in qrow["embedding"]]

    queries = build_queries(spark, docs, emb, qvec, n_docs)
    if subs:
        pats = subs.split(",")
        queries = {
            k: v for k, v in queries.items() if any(p in k for p in pats)
        }

    # JIT/codegen warmup — not timed (same as bench.py)
    from memorious_spark.operators import dedup as _d

    _d.exact_dedup(docs).count()

    if do_plans:
        plans_dir.mkdir(parents=True, exist_ok=True)

    def run_action(df, action):
        if action == "count":
            df.count()
        elif action == "collect":
            df.collect()
        else:
            action(df)

    results: dict[str, float] = {}
    noop: dict[str, float] = {}
    for name, (df_fn, action) in queries.items():
        if do_plans:
            df = df_fn()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{name}{suffix}.txt").write_text(plan)
        if not do_time:
            continue
        spark.sparkContext.setJobDescription(f"bx:{name}")
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.time()
            run_action(df_fn(), action)
            best = min(best, time.time() - t0)
        results[name] = round(best, 3)
        # noop-sink isolation: computation only, no driver transfer
        best_n = float("inf")
        for _ in range(max(1, n_rep - 1)):
            df = df_fn()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best_n = min(best_n, time.time() - t0)
        noop[name] = round(best_n, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: {results[name]}s (noop {noop[name]}s)", flush=True)

    if do_time:
        print("BX_JSON:" + json.dumps({"queries": results, "noop": noop}))
    spark.stop()


if __name__ == "__main__":
    main()
