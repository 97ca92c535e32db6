"""Interleaved A/B micro-bench for the r3->r4 regression bisect.

Usage: python tools/bisect_bench.py <repo_path> [cpus]
Runs exact_dedup / minhash_lsh_pairs / simhash_pairs at
$SPARK_GRAFT_SF_DIR (default sf0.1) on a fresh JVM, min-of-3 each,
plus a short pure-CPU ceiling probe, and prints one JSON line.
Run alternately against two checkouts in the same hardware window so
host-steal noise cancels.
"""

import json
import os
import sys
import time


def cpu_probe(seconds: float = 2.0) -> float:
    t_end = time.time() + seconds
    x = n = 0
    while time.time() < t_end:
        for i in range(500_000):
            x += i * i
        n += 1
    return n / seconds


def main() -> None:
    repo = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from memorious_spark.operators import dedup
    from memorious_spark.session import get_spark

    ceiling0 = cpu_probe()
    spark = get_spark(
        master=f"local[{cpus}]", app_name="bisect", shuffle_partitions=cpus
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    dedup.exact_dedup(docs).count()  # warmup codegen + python workers

    def timed(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t = time.time()
            fn()
            best = min(best, time.time() - t)
        return round(best, 3)

    out = {
        "repo": repo,
        "exact": timed(lambda: dedup.exact_dedup(docs).count()),
        "minhash": timed(lambda: dedup.minhash_lsh_pairs(docs).count()),
        "simhash": timed(lambda: dedup.simhash_pairs(docs).count()),
        "ceiling_before": round(ceiling0, 1),
        "ceiling_after": round(cpu_probe(), 1),
    }
    spark.stop()
    print("BISECT " + json.dumps(out))


if __name__ == "__main__":
    main()
