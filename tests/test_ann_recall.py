"""Recall@k floors for the ANN ladder at its DEFAULT serve params.

VERDICT r4 #8: IVF/PQ proved only full-probe == brute force; the
accuracy/cost trade of the shipped defaults must be a recorded number.
Everything here is deterministic (seed centroids, seed codebooks,
fixed sf0.01 embeddings, 6-dp rounded candidate cuts), so the floors
are measured values with no flake margin needed — they move only if
the algorithm or the defaults move, which is exactly when this test
SHOULD fail.

Measured on /root/testdata/sf0.01 embeddings (500 × 64-dim, near-
uniform synthetic — the hard case for ANN; clustered real corpora
recall higher at the same knobs), recall@10 over 8 spread queries:

| config                      | min  | mean  |
|-----------------------------|------|-------|
| IVF default (8 cells, np=2) | 0.30 | 0.500 |
| IVF nprobe=4                | 0.50 | 0.713 |
| IVF nprobe=8 (full probe)   | 1.00 | 1.000 |
| PQ default (m=4, refine=4)  | 0.20 | 0.325 |
| PQ refine=16                | 0.40 | 0.662 |
| IVF-PQ default              | 0.20 | 0.350 |
| LSH default (multiprobe)    | 0.20 | 0.388 |

The defaults scan ~nprobe/K of the corpus (IVF) or re-rank k·refine
rows (PQ): recall ≈ the scanned fraction on uniform data, i.e. the
knobs buy exactly what they cost — raising nprobe 2→4 doubles the
scan and lifts mean recall 0.50→0.71.
"""

import os
import statistics

import pytest
from pyspark.sql import functions as F

from memorious_spark.operators import similarity as sim

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
EMB = os.path.join(SF_DIR, "embeddings.parquet")
K = 10
QIDS = [0, 63, 127, 199, 254, 311, 402, 477]


@pytest.fixture(scope="module")
def emb_and_truth(spark):
    if not os.path.exists(EMB):
        pytest.skip(f"no test embeddings at {EMB}")
    emb = spark.read.parquet(EMB).persist()
    emb.count()
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(QIDS)).collect()
    }
    truth = {
        qid: {r["vec_id"] for r in sim.knn_brute_force(emb, q, k=K).collect()}
        for qid, q in qvecs.items()
    }
    yield emb, qvecs, truth
    emb.unpersist()


def _recalls(fn, qvecs, truth):
    out = []
    for qid, q in qvecs.items():
        got = {r["vec_id"] for r in fn(q).collect()}
        out.append(len(truth[qid] & got) / K)
    return min(out), statistics.mean(out)


def test_ivf_default_recall_floor(emb_and_truth):
    emb, qvecs, truth = emb_and_truth
    mn, mean = _recalls(lambda q: sim.knn_ivf(emb, q, k=K), qvecs, truth)
    assert mn >= 0.30 and mean >= 0.50, (mn, mean)


def test_ivf_nprobe_buys_recall(emb_and_truth):
    """The cost knob is honest: nprobe=4 doubles the scanned fraction
    and must clear a strictly higher floor; full probe is exact."""
    emb, qvecs, truth = emb_and_truth
    mn4, mean4 = _recalls(
        lambda q: sim.knn_ivf(emb, q, k=K, nprobe=4), qvecs, truth
    )
    assert mn4 >= 0.50 and mean4 >= 0.70, (mn4, mean4)
    mn8, mean8 = _recalls(
        lambda q: sim.knn_ivf(emb, q, k=K, nprobe=8), qvecs, truth
    )
    assert (mn8, mean8) == (1.0, 1.0)


def test_pq_default_recall_floor(emb_and_truth):
    emb, qvecs, truth = emb_and_truth
    mn, mean = _recalls(lambda q: sim.knn_pq(emb, q, k=K), qvecs, truth)
    assert mn >= 0.20 and mean >= 0.32, (mn, mean)


def test_pq_refine_buys_recall(emb_and_truth):
    emb, qvecs, truth = emb_and_truth
    mn, mean = _recalls(
        lambda q: sim.knn_pq(emb, q, k=K, refine=16), qvecs, truth
    )
    assert mn >= 0.40 and mean >= 0.65, (mn, mean)


def test_ivfpq_default_recall_floor(emb_and_truth):
    emb, qvecs, truth = emb_and_truth
    mn, mean = _recalls(lambda q: sim.knn_ivfpq(emb, q, k=K), qvecs, truth)
    assert mn >= 0.20 and mean >= 0.34, (mn, mean)


def test_lsh_default_recall_floor(emb_and_truth):
    emb, qvecs, truth = emb_and_truth
    mn, mean = _recalls(lambda q: sim.knn_lsh(emb, q, k=K), qvecs, truth)
    assert mn >= 0.20 and mean >= 0.38, (mn, mean)
