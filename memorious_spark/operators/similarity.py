"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (one pass, JVM-side
``zip_with``/``aggregate`` arithmetic — no UDF); the LSH-bucketed
variant is the scale path: deterministic hyperplane signs bucket
vectors so queries only scan their bucket (candidate set ~n/2^bits),
re-ranked exactly within the bucket.

No RNG at runtime: hyperplane h[i][j] = ±1 from the parity of
md5(i:j) — reproducible across engines and runs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "cosine_sim", "knn_brute_force", "lsh_bucket_col", "knn_lsh",
    "query_probe_buckets",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_brute_force(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector. One scan, one
    small top-k sort (orderBy+limit compiles to TakeOrdered — no full
    sort shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _plane_sign(plane: int, dim: int) -> float:
    """Deterministic ±1 from md5 parity — the 'random' hyperplanes."""
    digest = hashlib.md5(f"{plane}:{dim}".encode()).digest()
    return 1.0 if digest[0] % 2 == 0 else -1.0


def lsh_bucket_col(
    vec_col: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """Sign-LSH bucket id: bit i = sign(v · h_{offset+i}) for
    deterministic hyperplanes h ∈ {±1}^dim. Pure Column arithmetic,
    no UDF. ``plane_offset`` selects an independent plane family per
    band (banded pair-LSH in dedup.embedding_dup_pairs_lsh)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        signs = F.array(
            *[F.lit(_plane_sign(plane_offset + p, d)) for d in range(dim)]
        )
        bit = (_dot(vec_col, signs) > 0).cast("int")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def query_probe_buckets(
    query_vec: list[float], n_planes: int = 6, multiprobe: bool = True
) -> list[int]:
    """The query's LSH bucket plus (``multiprobe``) every hamming-1
    neighbor bucket — a near neighbor whose projection flips exactly
    one plane sign lands one bit away, so single-probe has a recall
    cliff precisely at the decision boundaries; probing the
    ``n_planes + 1`` adjacent buckets removes it at a candidate
    volume of ~(planes+1)·n/2^planes."""
    dim = len(query_vec)
    qsig = 0
    for p in range(n_planes):
        dot = sum(
            float(query_vec[d]) * _plane_sign(p, d) for d in range(dim)
        )
        if dot > 0:
            qsig |= 1 << p
    if not multiprobe:
        return [qsig]
    return [qsig] + [qsig ^ (1 << p) for p in range(n_planes)]


def knn_lsh(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket and (default)
    its hamming-1 neighbors, exact cosine re-rank inside the candidate
    set. At scale the bucket column is precomputed + partitioned-by,
    so a multiprobe query touches ~(planes+1)/2^planes of the rows
    (partition-pruned scans on a bucketed table); here it's derived on
    the fly. ``multiprobe=False`` restores the single-bucket probe."""
    dim = len(query_vec)
    probes = query_probe_buckets(query_vec, n_planes, multiprobe)
    bucketed = emb.withColumn(
        "_bucket", lsh_bucket_col(F.col(vec_col), dim, n_planes)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(F.col("_bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
