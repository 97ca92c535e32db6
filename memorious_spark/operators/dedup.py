"""Corpus deduplication operators — exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine.

These are the training-data-pipeline extensions of the engine (the
reference's only dedup is the URL-seen tag set; these deduplicate
*content* at corpus scale). Design posture for 100 TB:

- exact dedup: one hash-groupBy, map-side partial aggregation free.
- MinHash+LSH: signature → band → one shuffle on (band, band_hash) —
  the classic O(n·bands) candidate generation instead of O(n²)
  self-join; only bucket-mates are pair-joined.
- n-gram Jaccard: inverted-index style shingle explode + self-join on
  shingle, counts per pair → Jaccard; prunes by shared-shingle ≥ 1.
- SimHash: 64-bit vectorized signature via a pandas UDF (numpy,
  Arrow-batched), hamming-distance banding for candidates.
- embedding near-dup: cosine ≥ τ via exact pair join at test scale;
  the LSH-bucketed path is in similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from memorious_spark.functions.textops import fingerprint, minhash_signature, shingles
from memorious_spark.operators.frontier import ensure_parallelism

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_col",
    "simhash_pairs",
    "embedding_dup_pairs",
]


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id representative per exact (fingerprinted)
    text; returns (doc_id, fingerprint, dup_count)."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .select(id_col, "fingerprint", "dup_count")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 16,
    bands: int = 4,
    k_shingle: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding.

    signature[0:r], [r:2r], ... (r = n_perm/bands) hashed per band;
    docs sharing any band bucket become a candidate pair (a < b).
    One explode + one groupBy-join shuffle keyed on (band, key) —
    bucket sizes bound the pair blow-up, so this survives scale-out
    where an O(n²) crossJoin cannot.
    """
    assert n_perm % bands == 0
    r = n_perm // bands
    # materialize the shingle array ONCE — inlining it into the
    # signature expression makes Catalyst re-evaluate split/slice per
    # permutation (16× blowup, measured 57s → ~2s at 500 docs)
    sig = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k_shingle).alias("sh"),
    ).select("id", minhash_signature(F.col("sh"), n_perm).alias("sig"))
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws("|", F.slice(F.col("sig"), b * r + 1, r))
                    ).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count shared per pair, Jaccard = shared/(|A|+|B|-shared).
    Shuffles on the shingle key (frequency-bounded), never crossJoins.
    """
    sh = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), k_shingle)).alias("sh"),
    ).withColumn("n", F.size("sh"))
    exploded = sh.select("id", "n", F.explode("sh").alias("s"))
    l, r = exploded.alias("l"), exploded.alias("r")
    shared = (
        l.join(r, (F.col("l.s") == F.col("r.s")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.n").alias("n_a"),
            F.col("r.n").alias("n_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    return shared.select(
        "id_a",
        "id_b",
        F.round(
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def simhash_col(text_col: str = "text", bits: int = 64):
    """64-bit SimHash as a vectorized pandas UDF (numpy bit-count math,
    Arrow-batched — no per-row Python at the Spark layer)."""

    @F.pandas_udf("long")
    def _simhash(text: pd.Series) -> pd.Series:  # pragma: no cover (executor)
        import hashlib

        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            if not t:
                continue
            acc = np.zeros(bits, dtype=np.int64)
            for tok in t.lower().split():
                # deterministic 64-bit token hash (Python's hash() is
                # per-process salted — never use it on executors)
                h = int.from_bytes(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], "little"
                )
                hbits = (np.uint64(h) >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(hbits.astype(bool), 1, -1)
            sig = np.uint64(0)
            for b in range(bits):
                if acc[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return _simhash(F.col(text_col))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup candidates by SimHash banding: docs sharing any 16-bit
    band of the 64-bit signature (≤ 3-bit hamming guarantee by the
    pigeonhole principle when bands=4)."""
    sig = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), simhash_col(text_col).alias("sig")
    )
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    # shiftright needs a literal shift → unroll bands driver-side
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig"))).alias("hamming"),
        )
        .distinct()
    )


def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine-similarity pairs ≥ threshold (test-scale baseline;
    the LSH-bucketed scale path lives in similarity.lsh_buckets)."""
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    v = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("nrm")
    )
    l, r = v.alias("l"), v.alias("r")
    dot = F.aggregate(
        F.zip_with(
            F.col("l.v"), F.col("r.v"), lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        l.join(r, F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(dot / (F.col("l.nrm") * F.col("r.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
