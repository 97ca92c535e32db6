"""Corpus deduplication operators — exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine.

These are the training-data-pipeline extensions of the engine (the
reference's only dedup is the URL-seen tag set; these deduplicate
*content* at corpus scale). Design posture for 100 TB:

- exact dedup: one hash-groupBy, map-side partial aggregation free.
- MinHash+LSH: signature → band → one shuffle on (band, band_hash) —
  the classic O(n·bands) candidate generation instead of O(n²)
  self-join; only bucket-mates are pair-joined.
- n-gram Jaccard: inverted-index shingle explode + self-join on the
  shingle; ``max_df`` prefix-filtering drops shingles shared by more
  than ``max_df`` docs (one hot shingle otherwise costs O(df²) pairs).
- SimHash: 64-bit signature computed ENTIRELY JVM-side (token explode
  → md5 word-hash bits → 64 conditional sums → bit assembly; no
  Python anywhere), candidates by 16-bit banding, pairs kept only at
  ``hamming ≤ max_hamming`` — the ≤3-bit pigeonhole guarantee the
  banding provides.
- embedding near-dup: EXACT pairs via the block-grid self-join (each
  row replicated to its block row/column; every pair meets in exactly
  one equi-join bucket — an AQE-splittable shuffle join, never a
  BroadcastNestedLoopJoin); the sub-quadratic approximate path is
  :func:`embedding_dup_pairs_lsh` (banded sign-LSH + exact re-rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from memorious_spark.functions.textops import fingerprint, minhash_signature, shingles
from memorious_spark.operators.frontier import ensure_parallelism

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_signature_cols",
    "simhash_col",
    "simhash_pairs",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "dedup_components",
    "corpus_dedup",
    "curate_corpus",
    "strip_boilerplate_lines",
    "semantic_dedup",
    "duplicate_span_fraction",
    "paragraph_dedup",
    "remove_duplicate_spans",
]


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
    label_rounds: int = 4,
) -> DataFrame:
    """Connected components over dup-pair edges → ``(id, component)``
    with ``component`` = the smallest id in the cluster (the canonical
    representative a training-data pipeline KEEPS; everything else in
    the component is a near-duplicate to drop).

    Pair generators (minhash/simhash/embedding LSH) emit EDGES; near-
    duplication is transitive only through its clusters, so this is
    the standard second half of corpus dedup. HYBRID implementation,
    measured both ways at sf0.1:

    - Phase 1 — **min-label propagation** for up to ``label_rounds``
      rounds: one edges⋈labels shuffle join + one map-side-combined
      min aggregate per round, convergence riding the materializing
      action as an Observation (NO separate count job). Near-dup
      clusters are shallow (diameter ≲ 4), so this phase almost always
      finishes — at roughly half the per-round cost of a star round.
    - Phase 2 — only if phase 1 did not converge (chain-shaped
      graphs): CONTRACT the graph by the current labels (each
      label-class becomes one node — clusters already collapsed in
      phase 1 vanish) and run the alternating **large-star/small-star**
      algorithm (Kiveris et al., SoCC'14; the GraphFrames formulation)
      on the contracted edges — O(log n) rounds on any shape. Final
      labels compose: component(v) = star_component(label(v)).

    Both phases ``localCheckpoint`` per round: the iteration's unions/
    joins reference the previous round several times, so without
    lineage TRUNCATION the logical plan grows geometrically and the
    driver dies building plan strings long before the data is big. A
    512-node path graph converges in ≤ 3·log2(n)+5 total rounds
    (pytest-asserted); ``stats`` (optional dict) receives
    ``{"iterations": k}``.
    """
    from pyspark.sql import Observation

    # materialize the CANONICAL edges first, symmetrize from the
    # checkpoint: a union of pairs ∪ swap(pairs) before materializing
    # would execute the caller's pair-generation chain (minhash band
    # join etc.) TWICE inside one job — measured as the whole
    # difference between 13s and 8s at sf0.1
    e0 = (
        pairs.select(
            F.least(
                F.col(id_a).cast("long"), F.col(id_b).cast("long")
            ).alias("src"),
            F.greatest(
                F.col(id_a).cast("long"), F.col(id_b).cast("long")
            ).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e0.unionByName(
        e0.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    labels = None
    iters = 0
    converged = False
    for _ in range(min(label_rounds, max_iter)):
        iters += 1
        if labels is None:
            # round 1 FOLDED: with identity initial labels, one round
            # of min-label propagation is min(src over in-neighbors ∪
            # self) — computable straight off the checkpointed edge
            # set (every node appears as a src of sym), skipping both
            # the labels-init distinct+checkpoint job and round 1's
            # edges⋈labels join (two fewer jobs/shuffles per call).
            # _old (the change detector's previous label) is the id
            # itself, carried by the self rows (min skips the NULLs).
            merged = sym.select(
                F.col("src").alias("id"),
                F.col("src").alias("label"),
                F.col("src").alias("_old"),
            ).unionByName(
                sym.select(
                    F.col("dst").alias("id"),
                    F.col("src").alias("label"),
                    F.lit(None).cast("long").alias("_old"),
                )
            )
        else:
            prop = sym.join(labels, sym["src"] == labels["id"]).select(
                F.col("dst").alias("id"), "label",
                F.lit(None).cast("long").alias("_old"),
            )
            merged = labels.select(
                "id", "label", F.col("label").alias("_old")
            ).unionByName(prop)
        obs = Observation()
        new_labels = (
            merged
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("_old").alias("_old"))
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("_old"), 1).otherwise(0)
                ).alias("changed"),
            )
            .select("id", "label")
            .localCheckpoint(eager=True)  # metrics ride this action
        )
        if labels is not None:
            labels.unpersist()
        labels = new_labels
        if int(obs.get["changed"] or 0) == 0:
            converged = True
            break
    if labels is None:  # label_rounds == 0: identity labels for phase 2
        labels = (
            sym.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint(eager=True)
        )
    if not converged:
        # contract by current labels (collapses everything phase 1
        # already solved), then the O(log n) star algorithm finishes
        la, lb = labels.alias("la"), labels.alias("lb")
        contracted = (
            sym.join(la, sym["src"] == F.col("la.id"))
            .join(lb, sym["dst"] == F.col("lb.id"))
            .select(
                F.col("la.label").alias("id_a"),
                F.col("lb.label").alias("id_b"),
            )
        )
        star, star_iters = _star_components(
            contracted, max_iter=max_iter - iters
        )
        iters += star_iters
        out = (
            labels.join(star, labels["label"] == star["sid"], "left")
            .select(
                "id", F.coalesce("scomp", "label").alias("component")
            )
        )
    else:
        out = labels.select("id", F.col("label").alias("component"))
    if stats is not None:
        stats["iterations"] = iters
    return out


def _star_components(
    pairs: DataFrame, max_iter: int = 50
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components over an
    (id_a, id_b) edge DF → ((sid, scomp) labels, rounds used).

    Each half-round is one window aggregation over the node's
    neighborhood (a single hash-shuffle on the node id, map-side
    combined) re-pointing edges at the neighborhood minimum —
    **O(log n) rounds even on chain-shaped graphs**. Convergence
    detection costs ZERO extra jobs: edge count, label sum, and an
    xxhash64 edge-set fingerprint ride the per-round materializing
    action as Observation metrics (decimal sum + ``bit_xor`` because
    ANSI mode would overflow ``sum(long)`` at 10^10 edges); the loop
    stops when all three are stable across a full round — the label
    sum is monotonically non-increasing (GraphFrames' own convergence
    metric), the 64-bit fingerprint is the belt-and-braces check.
    """
    from pyspark.sql import Observation, Window

    # canonical directed edges: larger id → smaller id, no self-loops
    e = (
        pairs.select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias("src"),
            F.least(F.col("id_a"), F.col("id_b")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = (None, None, None)
    iters = 0
    converged = False
    for _ in range(max_iter):
        iters += 1
        # LARGE-STAR: over symmetric neighborhoods, connect every
        # strictly-larger neighbor v of u to m = min(Γ(u) ∪ {u});
        # window min = one hash-shuffle on u, no join
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        wu = Window.partitionBy("src")
        large = (
            sym.withColumn(
                "_m", F.least(F.min("dst").over(wu), F.col("src"))
            )
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .distinct()
        )
        # SMALL-STAR: on the (larger→smaller) edges, re-point every
        # smaller neighbor (and u itself) at m = min(N(u) ∪ {u})
        small_m = F.min("dst").over(Window.partitionBy("src"))
        pointed = large.withColumn("_m", small_m)
        new_e = (
            pointed.filter(F.col("dst") > F.col("_m"))
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .unionByName(
                pointed.select("src", F.col("_m").alias("dst"))
            )
            .distinct()
        )
        obs = Observation()
        new_e = new_e.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("dst").cast("decimal(38,0)")).alias("lsum"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("fp"),
        ).localCheckpoint(eager=True)  # the one materializing action
        e.unpersist()
        e = new_e
        got = obs.get
        cur = (got["n"], got["lsum"], got["fp"])
        if cur == prev or cur[0] == 0:
            converged = True
            break
        prev = cur
    if not converged:
        # at a non-fixpoint a node can still point at several targets —
        # emitting labels from it would silently duplicate/mislabel
        raise RuntimeError(
            f"_star_components: no fixpoint after {iters} star rounds "
            f"(O(log n) expected — raise max_iter only if the graph "
            f"really has >2^{max_iter // 2} nodes)"
        )
    # at the star-forest fixpoint every edge is (member → root); roots
    # and isolated input nodes label themselves
    nodes = (
        pairs.select(F.col("id_a").alias("sid"))
        .unionByName(pairs.select(F.col("id_b").alias("sid")))
        .distinct()
    )
    out = nodes.join(
        e.select(F.col("src").alias("sid"), F.col("dst").alias("_c")),
        "sid",
        "left",
    ).select("sid", F.coalesce("_c", "sid").alias("scomp"))
    return out, iters


def corpus_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 16,
    bands: int = 4,
    k_shingle: int = 3,
    max_iter: int = 50,
    stats: dict | None = None,
    normalize: bool = False,
) -> DataFrame:
    """One-call corpus deduplication — the composition a training-data
    pipeline actually runs: **exact → MinHash-LSH pairs over the exact
    survivors → connected components → canonical keep-list**.

    ``normalize=True`` canonicalizes the text FIRST
    (``functions.textops.normalize_text_udf``: NFC + space/control
    classes) so unicode twins — NFD vs NFC accents, NBSP vs space —
    fingerprint and shingle together (the CCNet ordering: normalize,
    then dedup). Off by default: the driver oracle pins the
    non-normalized path, and normalization crosses Arrow once.

    Returns the full drop manifest, one row per input doc:
    ``(doc_id, canonical_id, reason)`` with ``reason ∈ {'kept',
    'exact', 'near'}``; the deduplicated corpus is
    ``manifest.filter(reason == 'kept')`` joined back on id (or an
    anti-join of the drops). ``canonical_id`` is the FINAL
    representative: an exact-dropped doc whose exact canonical was
    itself near-dropped resolves through to the component minimum.

    Scale shape: the exact stage is a map-side-combined
    groupBy(fingerprint).min(id) joined back on the fingerprint — the
    same shape as :func:`exact_dedup`, NEVER a window over the
    fingerprint: a hot fingerprint (empty/boilerplate text — billions
    of rows at 100 TB) would pin an unpartitionable window on one
    task, while the aggregate combines map-side and the join-back is
    AQE-skew-splittable. Then minhash banding over only the exact
    survivors (the expensive stage sees the shrunk corpus), O(log n)
    star rounds for components, and two slim id-keyed joins to stitch
    the manifest — no step is quadratic in the corpus.
    """
    text_in = F.col(text_col)
    if normalize:
        from memorious_spark.functions.textops import normalize_text_udf

        text_in = normalize_text_udf()(text_in)
    base = docs.select(
        F.col(id_col).cast("long").alias("id"), text_in.alias("_t")
    )
    # exact stage: canonical = min id per normalized-text fingerprint,
    # computed as aggregate + join-back (skew-safe), not a window.
    # NULL text fingerprints NULL (md5(NULL)); coalesce to a sentinel
    # (no md5 hex is 8 chars) so the inner join-back keeps NULL-text
    # docs in one group — the oracle's window groups NULLs together,
    # and the manifest contract is one row per input doc (ADVICE r5).
    fp = base.withColumn(
        "_fp", F.coalesce(fingerprint(F.col("_t")), F.lit("__null__"))
    )
    canon_by_fp = fp.groupBy("_fp").agg(F.min("id").alias("ecanon"))
    ecanon = fp.join(canon_by_fp, "_fp").drop("_fp").persist()
    survivors = ecanon.filter(F.col("id") == F.col("ecanon"))
    # pre-distinct band pairs: dedup_components canonicalizes with
    # least/greatest + distinct anyway, so the public
    # minhash_lsh_pairs' trailing distinct would be a pure extra
    # shuffle+aggregate of the pair stream here
    pairs = _minhash_band_pairs(
        survivors, id_col="id", text_col="_t",
        n_perm=n_perm, bands=bands, k_shingle=k_shingle,
    )
    comp = dedup_components(
        pairs, id_a="id_a", id_b="id_b", max_iter=max_iter, stats=stats
    )
    # near canonical over survivors (docs in no component keep themselves)
    near = (
        survivors.select("id")
        .join(comp, "id", "left")
        .select(
            F.col("id").alias("_sid"),
            F.coalesce("component", "id").alias("ncanon"),
        )
    )
    out = (
        ecanon.select("id", "ecanon")
        .join(near, F.col("ecanon") == F.col("_sid"))
        .select(
            F.col("id").alias(id_col),
            F.col("ncanon").alias("canonical_id"),
            F.when(F.col("id") != F.col("ecanon"), F.lit("exact"))
            .when(F.col("id") != F.col("ncanon"), F.lit("near"))
            .otherwise(F.lit("kept"))
            .alias("reason"),
        )
    )
    return out


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_filter: Column | None = None,
    n_perm: int = 16,
    bands: int = 4,
    k_shingle: int = 3,
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """The full curation composition a training-data pipeline runs:
    **quality gate → exact dedup → MinHash-LSH → components →
    manifest**. One row per input doc: ``(id_col, canonical_id,
    reason ∈ {'kept', 'exact', 'near', 'low_quality'})``.

    The quality gate (default: :func:`functions.quality.gopher_keep`
    at the paper's thresholds; pass any boolean Column to override)
    runs FIRST — it's a pure-Column filter fused into the corpus scan,
    so the expensive stages (shingling, signature banding, the pair
    join) only ever see the survivors. Dropped docs appear in the
    manifest as ``low_quality`` with themselves as canonical (they
    have no representative — they're cut, not merged).

    Ordering note: quality-then-dedup also matches the published
    pipelines (C4, Gopher, RefinedWeb all filter before dedup) —
    boilerplate-heavy junk otherwise dominates the near-dup clusters.
    """
    from memorious_spark.functions.quality import gopher_keep

    keep = (
        quality_filter
        if quality_filter is not None
        else gopher_keep(F.col(text_col))
    )
    base = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(text_col).alias(text_col),
        keep.alias("_q"),
    )
    man = corpus_dedup(
        base.filter(F.col("_q")).drop("_q"),
        id_col=id_col, text_col=text_col,
        n_perm=n_perm, bands=bands, k_shingle=k_shingle,
        max_iter=max_iter, stats=stats,
    )
    low = base.filter(~F.col("_q")).select(
        F.col(id_col),
        F.col(id_col).alias("canonical_id"),
        F.lit("low_quality").alias("reason"),
    )
    return man.unionByName(low)


def strip_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    broadcast_max: int = 200_000,
    stats: dict | None = None,
) -> DataFrame:
    """Corpus-level line deduplication (the RefinedWeb / CCNet
    boilerplate cut): a non-empty line whose trimmed form appears in
    ``min_docs`` or more documents is boilerplate — nav bars, cookie
    banners, footers — and is removed from EVERY document. Returns the
    input columns with ``text_col`` rewritten (blank lines and line
    order preserved).

    Plan: one line-explode + hash-aggregate finds the hot set (the
    only unavoidable shuffle — line frequency is a corpus-global
    fact). Removal then auto-routes:

    - hot set ≤ ``broadcast_max``: the set is folded to ONE array row
      and broadcast-crossJoined, so the rewrite is a pure Column
      ``filter``/``array_join`` over the original scan — document
      bodies never shuffle.
    - bigger: posexplode → broadcast-less anti-join on the line key →
      regroup by id (bodies cross the wire once; correct at any hot
      size).

    NO SILENT CAP: the hot-line count and the postings they cover are
    logged and surfaced via ``stats`` (``hot_lines``,
    ``hot_postings``, ``path``).
    """
    trimmed_lines = F.filter(
        F.transform(
            F.split(F.col(text_col), "\n"), lambda l: F.trim(l)
        ),
        lambda t: t != "",
    )
    lines = ensure_parallelism(docs).select(
        F.explode(F.array_distinct(trimmed_lines)).alias("k")
    )
    hot = (
        lines.groupBy("k")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_docs)
        .persist()
    )
    agg = hot.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("df"), F.lit(0)).alias("postings"),
    ).head()
    n_hot = int(agg["n"])
    if stats is not None:
        stats["hot_lines"] = n_hot
        stats["hot_postings"] = int(agg["postings"])
        stats["path"] = "broadcast" if n_hot <= broadcast_max else "regroup"
    if n_hot:
        import logging

        logging.getLogger(__name__).warning(
            "strip_boilerplate_lines: %d line(s) appear in >= %d docs "
            "(%d postings) — stripping corpus-wide",
            n_hot, min_docs, int(agg["postings"]),
        )
    cols = docs.columns
    if n_hot <= broadcast_max:
        hotarr = hot.agg(F.collect_set("k").alias("_hot"))
        out = (
            docs.crossJoin(F.broadcast(hotarr))
            .withColumn(
                text_col,
                F.array_join(
                    F.filter(
                        F.split(F.col(text_col), "\n"),
                        lambda l: (F.trim(l) == F.lit(""))
                        | ~F.array_contains(F.col("_hot"), F.trim(l)),
                    ),
                    "\n",
                ),
            )
            .select(*cols)
        )
    else:
        pos = docs.select(
            F.col(id_col).alias("_sid"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "_pos", "_line"
            ),
        )
        kept = pos.join(
            hot.select("k"), F.trim(pos["_line"]) == F.col("k"), "left_anti"
        )
        rebuilt = kept.groupBy("_sid").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("_clean")
        )
        out = (
            docs.join(rebuilt, docs[id_col] == rebuilt["_sid"], "left")
            .withColumn(text_col, F.coalesce("_clean", F.lit("")))
            .select(*cols)
        )
    return out


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
    return _minhash_band_pairs(
        docs, id_col, text_col, n_perm, bands, k_shingle
    ).distinct()


def _minhash_band_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 16,
    bands: int = 4,
    k_shingle: int = 3,
) -> DataFrame:
    """:func:`minhash_lsh_pairs` WITHOUT the trailing ``distinct`` —
    for compositions (``corpus_dedup`` → ``dedup_components``) whose
    next stage canonicalizes and distincts the edges anyway."""
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
    # SHUFFLE_HASH, not broadcast: a broadcast self-join evaluates the
    # signature stage (the dominant cost — shingles × n_perm hashes)
    # TWICE, once per side; forcing both sides through the same
    # (band, key) exchange lets the runtime reuse ONE materialization
    # of it (measured 3.2s → 1.9s at sf0.1). At 100 TB a broadcast of
    # the banded table is impossible anyway — this is also the only
    # plan that scales.
    right = banded.hint("shuffle_hash").alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count shared per pair, Jaccard = shared/(|A|+|B|-shared).
    Shuffles on the shingle key, never crossJoins.

    ``max_df`` is the scale guard (standard prefix filtering): a
    shingle shared by f docs contributes O(f²) join rows, so one
    boilerplate shingle at f=10^5 detonates the self-join. Shingles
    with document frequency > max_df are dropped from the inverted
    index; set sizes |A|,|B| keep the full shingle sets, so pairs
    supported by surviving shingles score their true Jaccard — pairs
    similar ONLY through dropped ubiquitous shingles are
    (deliberately) not reported. With max_df above the corpus's true
    max df the result is exact.

    NO SILENT CAP: when ``max_df`` engages, the number of dropped
    shingles and of affected (id, shingle) postings is counted off the
    already-materialized hot set, logged at WARNING, and written into
    ``stats`` (``dropped_shingles``, ``dropped_postings``) when a dict
    is passed.
    """
    sh = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), k_shingle)).alias("sh"),
    ).withColumn("n", F.size("sh"))
    exploded = sh.select("id", "n", F.explode("sh").alias("s"))
    if max_df is not None:
        hot = (
            exploded.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("s", "df")
            .persist()
        )
        drop = hot.agg(
            F.count(F.lit(1)).alias("shingles"),
            F.coalesce(F.sum("df"), F.lit(0)).alias("postings"),
        ).head()
        if stats is not None:
            stats["dropped_shingles"] = int(drop["shingles"])
            stats["dropped_postings"] = int(drop["postings"])
        if drop["shingles"]:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: max_df=%d dropped %d hot shingle(s) "
                "covering %d postings — pairs supported only by these "
                "shingles will not be reported",
                max_df, drop["shingles"], drop["postings"],
            )
        # the hot set is tiny by construction (few shingles can exceed
        # a large df) → broadcast anti-join
        exploded = exploded.join(
            F.broadcast(hot.select("s")), "s", "left_anti"
        )
    # shuffle-hash self-join: both sides ride ONE materialization of
    # the exploded shingle index (a broadcast side would re-run the
    # shingle explode — the dominant cost — a second time), and at
    # corpus scale the index can't broadcast anyway
    l, r = exploded.alias("l"), exploded.hint("shuffle_hash").alias("r")
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


# ---- SimHash (pure Column expressions, no UDF) ------------------------------

def _word_bits(tok: Column) -> tuple[Column, Column]:
    """Deterministic 64-bit token hash as two 32-bit words from the
    md5 hex (chars 1-8 → low word, 9-16 → high word) — bit-for-bit
    reproducible in any engine with md5 (the DuckDB oracle computes
    the identical signature)."""
    h = F.md5(tok)
    lo = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    hi = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return lo, hi


def simhash_signature_cols(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc as two 32-bit halves (sig_lo, sig_hi).

    Entirely JVM-side: lower+split tokens → explode → per-bit ±1 sums
    (64 conditional aggregates, map-side partials) → majority bits
    assembled with shifts. Linear in total tokens, no Python, no UDF —
    this is the vectorization fix for the per-token Python loop the
    round-1 review flagged. Docs with no tokens get signature 0.
    """
    toks = F.array_compact(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        )
    )
    ex = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), F.explode_outer(toks).alias("tok")
    )
    lo, hi = _word_bits(F.col("tok"))
    ex = ex.select("id", lo.alias("w_lo"), hi.alias("w_hi"))

    # per bit: count of set bits only (sum skips the explode_outer
    # NULL of an empty doc), plus ONE token count — the former ±1
    # conditional sums spent two `when` branches per bit per token
    # (128 conditionals/row); a plain shift-and-mask halves the
    # expression work in the hot partial-aggregate projection.
    # Majority identity: sum(±1) > 0  ⇔  2·(#set) > #tokens.
    def bit_sum(word: Column, b: int, name: str) -> Column:
        return F.sum(F.shiftright(word, b).bitwiseAND(F.lit(1))).alias(name)

    aggs = (
        [bit_sum(F.col("w_lo"), b, f"s{b}") for b in range(32)]
        + [bit_sum(F.col("w_hi"), b, f"s{32 + b}") for b in range(32)]
        + [F.count("w_lo").alias("n_tok")]
    )
    summed = ex.groupBy("id").agg(*aggs)

    def assemble(base: int) -> Column:
        out = F.lit(0).cast("long")
        for b in range(32):
            out = out + F.when(
                F.coalesce(F.col(f"s{base + b}"), F.lit(0)) * 2
                > F.col("n_tok"),
                F.lit(1 << b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        return out

    return summed.select(
        "id", assemble(0).alias("sig_lo"), assemble(32).alias("sig_hi")
    )


def simhash_col(docs_or_text=None, **_kw):  # pragma: no cover - thin shim
    raise NotImplementedError(
        "simhash_col(text_col) was the round-1 Python-UDF path; use "
        "simhash_signature_cols(docs) — the JVM-side replacement."
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash banding + hamming threshold.

    Docs sharing any ``band_bits``-bit band of the 64-bit signature
    become candidates (with 4 bands, any pair at hamming ≤ 3 shares a
    band by pigeonhole — zero false negatives up to the threshold);
    candidates are then FILTERED to ``hamming ≤ max_hamming`` — the
    round-1 version returned raw band collisions, which is a candidate
    generator, not a dedup operator."""
    assert 64 % band_bits == 0
    sig = simhash_signature_cols(docs, id_col, text_col)
    mask = (1 << band_bits) - 1
    per_word = 32 // band_bits
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("sig_lo", b * band_bits).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(per_word)
    ] + [
        F.struct(
            F.lit(per_word + b).alias("band"),
            F.shiftright("sig_hi", b * band_bits).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(per_word)
    ]
    banded = sig.select(
        "id", "sig_lo", "sig_hi", F.explode(F.array(*bands)).alias("bk")
    ).select("id", "sig_lo", "sig_hi", "bk.band", "bk.key")
    # shuffle-hash: one materialization of the signature aggregation
    # for both sides (minhash_lsh_pairs has the measured rationale)
    l, r = banded.alias("l"), banded.hint("shuffle_hash").alias("r")
    hamming = F.bit_count(
        F.col("l.sig_lo").bitwiseXOR(F.col("r.sig_lo"))
    ) + F.bit_count(F.col("l.sig_hi").bitwiseXOR(F.col("r.sig_hi")))
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
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---- embedding near-dup ------------------------------------------------------

def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 8,
) -> DataFrame:
    """EXACT cosine-similarity pairs ≥ threshold via the block-grid
    self-join.

    Every row gets block ``b = xxhash64(id) % B``; a row joins as the
    LEFT of block-pairs ``(b, q≥b)`` and as the RIGHT of ``(p≤b, b)``,
    so each unordered pair meets in exactly ONE equi-join bucket (the
    ``id_a < id_b`` predicate resolves the same-block double-match).
    Replication factor ~B per side, B² balanced buckets — a plain
    shuffled equi-join AQE can split, where the round-1 ``l.id < r.id``
    non-equi join planned a BroadcastNestedLoopJoin (single broadcast
    of the whole table + O(n²) on one executor's threads). Exact
    all-pairs compute is inherently O(n²) — for sub-quadratic scale
    use :func:`embedding_dup_pairs_lsh`."""
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("b"),
    )
    l = v.withColumn(
        "q", F.explode(F.sequence(F.col("b"), F.lit(n_blocks - 1)))
    ).select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("nrm").alias("nrm_a"), F.col("b").alias("p"), "q",
    )
    r = v.withColumn(
        "p", F.explode(F.sequence(F.lit(0), F.col("b")))
    ).select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("nrm").alias("nrm_b"), "p", F.col("b").alias("q"),
    )
    dot = _dot(F.col("v_a"), F.col("v_b"))
    # a cross-block pair meets exactly once (its min-block row as left,
    # max-block row as right) regardless of id order → normalize ids
    # with least/greatest; same-block pairs (p == q) match in both
    # orientations plus self-pairs → keep only id_a < id_b there
    return (
        l.join(r, ["p", "q"])
        .filter((F.col("p") != F.col("q")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("pid_a"),
            F.greatest("id_a", "id_b").alias("pid_b"),
            F.round(dot / (F.col("nrm_a") * F.col("nrm_b")), 6).alias("cosine"),
        )
        .withColumnsRenamed({"pid_a": "id_a", "pid_b": "id_b"})
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bands: int = 4,
    planes_per_band: int = 4,
) -> DataFrame:
    """Approximate near-dup pairs: banded sign-LSH bucketing + exact
    cosine re-rank inside buckets — the sub-quadratic scale path.

    Each band hashes the vector with ``planes_per_band`` deterministic
    hyperplanes (md5-parity signs, similarity.py); vectors sharing any
    band bucket are candidates, re-checked exactly. Candidate volume ~
    n·bands·E[bucket]/2 — one equi-join shuffle on (band, bucket).
    Recall follows the standard banding curve (1-(1-s^r)^b for sign-
    collision prob s); pairs missed by every band are not reported."""
    from memorious_spark.operators.similarity import lsh_bucket_col

    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
        *[
            lsh_bucket_col(
                F.col(vec_col), dim, planes_per_band, plane_offset=b * planes_per_band
            ).alias(f"bucket{b}")
            for b in range(bands)
        ],
    )
    banded = v.select(
        "id", "v", "nrm",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"bucket{b}").alias("key"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "v", "nrm", "bk.band", "bk.key")
    # shuffle-hash: one materialization of the bucketed vectors for
    # both sides (minhash_lsh_pairs has the measured rationale)
    l, r = banded.alias("l"), banded.hint("shuffle_hash").alias("r")
    dot = _dot(F.col("l.v"), F.col("r.v"))
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
            F.round(dot / (F.col("l.nrm") * F.col("r.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_centroids: int = 8,
    spacing: int = 37,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_blocks: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding space into K cells with
    a coarse quantizer, then drop near-duplicates WITHIN each cell —
    the sub-quadratic trick is that the O(m²) pair scan runs per cell
    (m ≈ n/K), never across the corpus.

    Keep rule (deterministic, no RNG): within a cell, vectors are
    ranked by priority = (distance² to the cell centroid DESC,
    id ASC) — the paper keeps the example LEAST like the cluster
    center. A vector is dropped iff some higher-priority cell-mate has
    cosine ≥ ``threshold`` with it; its ``canonical_id`` is the
    highest-priority such dominator (one hop — chains are not chased;
    for transitive canonical resolution compose with
    :func:`dedup_components` the way :func:`corpus_dedup` does).
    Identical vectors that land in different cells are NOT compared —
    the known SemDeDup blind spot; run :func:`exact_dedup` first.

    Returns ``(id_col, cell int, canonical_id, reason ∈
    kept|semantic)`` — one row per input vector.

    Scale posture: centroid assignment auto-routes by K exactly like
    the IVF ANN family (literal Column ≤ 16 centroids, Arrow-batched
    numpy matmul beyond — K ≈ 10³-10⁵ at 100 TB). The within-cell
    pair scan joins on ``(cell, block-row, block-col)`` — the same
    block-grid as :func:`embedding_dup_pairs`, nested inside the cell
    — so a fat cell splits into B² balanced join buckets instead of
    one task (keying on ``cell`` alone put the whole corpus on K
    tasks: unusable when K < cores, a skew cliff when a cell runs
    hot). Roles are assigned AFTER the join (block position, not
    priority, decides which side a row enters on): each unordered
    pair meets exactly once, then a conditional select routes the
    higher-priority member to the dominator role. d2 is always
    computed with the JVM-side ``_dist2`` (broadcast centroid join on
    the UDF path), so the priority order is engine-reproducible
    bit-for-bit.
    """
    from memorious_spark.operators.similarity import (
        _IVF_LITERAL_MAX_K,
        _dist2,
        ivf_assign_udf,
        ivf_seed_centroids,
    )

    cents = centroids or ivf_seed_centroids(
        emb, n_centroids, spacing, id_col, vec_col
    )
    # respread a few-partition input BEFORE the CPU-heavy assignment
    # and pair stages: a small parquet arrives as one split, the tiny
    # right side then broadcasts, and the whole interpreted-cosine
    # pair scan would run narrow on a single core
    base = ensure_parallelism(emb).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    if len(cents) <= _IVF_LITERAL_MAX_K:
        dists = F.array(
            *[
                _dist2(F.col("v"), F.array(*[F.lit(float(x)) for x in c]))
                for _cid, c in cents
            ]
        )
        assigned = base.select(
            "id", "v", "nrm",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int").alias("cell"),
            F.array_min(dists).alias("d2"),
        )
    else:
        spark = emb.sparkSession
        cents_df = spark.createDataFrame(
            [(cid, [float(x) for x in c]) for cid, c in cents],
            "cell int, centroid array<double>",
        )
        assigned = (
            base.withColumn("cell", ivf_assign_udf(cents)(F.col("v")))
            .join(F.broadcast(cents_df), "cell")
            .select(
                "id", "v", "nrm", "cell",
                _dist2(F.col("v"), F.col("centroid")).alias("d2"),
            )
        )
    assigned = assigned.withColumn(
        "b", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    ).persist()

    # block-grid within the cell (embedding_dup_pairs' meeting rule,
    # keyed (cell, p, q)): a cross-block pair meets once with its
    # min-block row on the left; same-block pairs are id-ordered
    l = assigned.withColumn(
        "q", F.explode(F.sequence(F.col("b"), F.lit(n_blocks - 1)))
    ).select(
        F.col("id").alias("id_l"), F.col("v").alias("v_l"),
        F.col("nrm").alias("nrm_l"), F.col("d2").alias("d2_l"),
        "cell", F.col("b").alias("p"), "q",
    )
    r = assigned.withColumn(
        "p", F.explode(F.sequence(F.lit(0), F.col("b")))
    ).select(
        F.col("id").alias("id_r"), F.col("v").alias("v_r"),
        F.col("nrm").alias("nrm_r"), F.col("d2").alias("d2_r"),
        "cell", "p", F.col("b").alias("q"),
    )
    cos = _dot(F.col("v_l"), F.col("v_r")) / (F.col("nrm_l") * F.col("nrm_r"))
    # dominance is a strict total order, so every distinct pair has
    # exactly one dominator — roles are decided AFTER the join
    l_dom = (F.col("d2_l") > F.col("d2_r")) | (
        (F.col("d2_l") == F.col("d2_r")) & (F.col("id_l") < F.col("id_r"))
    )
    dropped = (
        l.join(r, ["cell", "p", "q"])
        .filter((F.col("p") != F.col("q")) | (F.col("id_l") < F.col("id_r")))
        # round-6 before the threshold compare: the engine-parity
        # convention of the whole embedding family (a raw-double
        # boundary compare is the one place two engines may disagree)
        .filter(F.round(cos, 6) >= F.lit(threshold))
        .select(
            F.when(l_dom, F.col("id_r")).otherwise(F.col("id_l")).alias("id"),
            F.when(l_dom, F.col("id_l")).otherwise(F.col("id_r"))
            .alias("dom_id"),
            F.when(l_dom, F.col("d2_l")).otherwise(F.col("d2_r"))
            .alias("dom_d2"),
        )
        .groupBy("id")
        .agg(
            F.max_by(
                F.col("dom_id"), F.struct(F.col("dom_d2"), -F.col("dom_id"))
            ).alias("dom_id")
        )
    )
    return (
        assigned.join(dropped, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.coalesce(F.col("dom_id"), F.col("id")).alias("canonical_id"),
            F.when(F.col("dom_id").isNull(), F.lit("kept"))
            .otherwise(F.lit("semantic")).alias("reason"),
        )
    )


def duplicate_span_fraction(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-span fraction — the practical form of
    exact-substring deduplication (Lee et al. 2021, arXiv:2107.06499,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, the fraction of its k-token windows that occur
    verbatim in at least one OTHER document. A high fraction means the
    document is largely assembled from text that exists elsewhere in
    the corpus (mirrors, quotations, licence blocks) even when no
    single whole-document near-dup pair fires — the gap MinHash and
    exact dedup both miss. Filter on the returned ``dup_frac`` (the
    paper removes the spans; flagging the document is the Dolma-style
    batch variant).

    Returns ``(id_col, n_spans, dup_frac double)`` — one row per
    document; ``dup_frac`` counts window occurrences WITH multiplicity
    (a document that repeats a shared span twice has both windows
    flagged). Windows use the corpus-wide shingle convention
    (``split(trim(text), ' ')``, texts shorter than k yield one
    truncated window), so the DuckDB twin is exact.

    Scale posture: this is the method whose exact form needs a suffix
    array on one machine — here it is two shuffles, both keyed by the
    span hash: (1) distinct (doc, span) → groupBy span counting
    DISTINCT docs (map-side combined; the hash key is md5 so skew is
    data-borne repetition itself, which is precisely what AQE's skew
    split absorbs), (2) the multiplicity-carrying window stream joins
    that document-frequency table on the span hash. Volume is
    O(total tokens) rows of slim (hash, id) pairs — inherent to
    substring-level dedup at any engine; nothing is driver-side.
    """
    spans = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), k)).alias("s"),
    ).select("id", F.md5(F.col("s")).alias("h"))
    # ONE evaluation of the explode+hash stream: aggregate to
    # (id, h, multiplicity) first. The (id, h) exchange under this
    # aggregate is IDENTICAL in the df-table branch and the join
    # branch, so ReusedExchange ships the heavy stream once — the
    # former spans / spans.distinct() pair evaluated the shingle
    # explode + md5 twice (guide §2.4: duplicated subtrees). The
    # multiplicity-weighted ratio below is bit-identical to the old
    # per-occurrence avg (both divide the same exact integers as
    # doubles).
    per = spans.groupBy("id", "h").agg(F.count(F.lit(1)).alias("cnt"))
    df_tbl = per.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (
        per.join(df_tbl, "h")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_spans"),
            F.round(
                F.sum(
                    F.when(F.col("df") >= 2, F.col("cnt")).otherwise(
                        F.lit(0).cast("long")
                    )
                ).cast("double")
                / F.sum("cnt").cast("double"),
                6,
            ).alias("dup_frac"),
        )
        .select(F.col("id").alias(id_col), "n_spans", "dup_frac")
    )

def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet paragraph-level deduplication (Wenzek et al. 2020,
    arXiv:1911.00359 §3.1): hash every normalized paragraph and keep
    exactly ONE copy corpus-wide — the first occurrence in
    ``(id, paragraph_index)`` order; later copies are removed from
    their documents. This is the dedup BETWEEN whole-document near-dup
    (MinHash) and line-frequency boilerplate
    (:func:`strip_boilerplate_lines`, which cuts hot lines from every
    doc including the first): mirrored article bodies, syndicated
    press paragraphs, quoted licence blocks keep one canonical copy.

    Paragraphs are newline-separated segments; the dedup key is the
    fingerprint normalization (lower → collapse whitespace → trim —
    :func:`~memorious_spark.functions.textops.fingerprint`) so
    reflowed copies collide. Empty/whitespace-only paragraphs are
    dropped. Returns ``(id_col, text_col, n_paras, n_kept)`` with the
    kept paragraphs re-joined by ``\\n`` in original order; a document
    whose every paragraph was seen earlier (or was blank) falls out of
    the result entirely — the CCNet drop.

    Scale posture: the keeper per hash is a ``min(struct(id, idx))``
    AGGREGATE (map-side combined — a paragraph duplicated 10^6×
    collapses to one row per map task), never a window sort (a hot
    hash would pin one task; AQE can split a skewed join but not a
    skewed window partition). Two key shuffles total: postings⋈keepers
    on the hash, then the regroup by id.
    """
    para_norm = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("_para")), r"\s+", " "))
    )
    paras = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "_idx", "_para"
            ),
        )
        .filter(F.trim(F.col("_para")) != "")
        .withColumn("_h", para_norm)
    )
    keepers = paras.groupBy("_h").agg(
        F.min(F.struct("_id", "_idx")).alias("_kp")
    )
    # every paragraph (inner-)joins its hash's keeper row, so ONE
    # regroup by doc yields totals, kept counts, AND the rebuilt text
    # — the former three-branch shape evaluated the posexplode+md5
    # stream a third time for the per-doc totals and paid an extra
    # rebuilt⋈counts join+shuffle. A doc whose every paragraph was
    # seen earlier regroups to n_kept = 0 and is dropped (the CCNet
    # drop, previously expressed by the inner counts join).
    joined = paras.join(keepers, "_h").withColumn(
        "_keep", F.struct("_id", "_idx") == F.col("_kp")
    )
    rebuilt = joined.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("_idx", "_para", "_keep"))
                    ),
                    lambda s: s["_keep"],
                ),
                lambda s: s["_para"],
            ),
            "\n",
        ).alias(text_col),
        F.count(F.when(F.col("_keep"), 1)).alias("n_kept"),
        F.count(F.lit(1)).alias("n_paras"),
    )
    return rebuilt.filter(F.col("n_kept") > 0).select(
        F.col("_id").alias(id_col), text_col, "n_paras", "n_kept"
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring span REMOVAL (Lee et al. 2021,
    arXiv:2107.06499 §4: delete repeated substrings, keep one
    occurrence) — the surgical sibling of
    :func:`duplicate_span_fraction`, which only scores. Every k-token
    window whose text occurs more than once in the corpus (with
    multiplicity, same-document repeats included) is removed EXCEPT
    its first occurrence in ``(id, window_position)`` order; a
    document's surviving tokens are re-joined by a single space.

    Windows use the corpus shingle convention (``split(trim(text),
    ' ')``; texts shorter than k yield one truncated window), so the
    DuckDB twin is exact. Returns the full document list —
    ``(id_col, text_col, n_tokens, n_removed)``; a document that was
    entirely assembled from elsewhere-kept spans comes back with
    ``text = ''`` (the caller drops or flags it), never silently
    vanishes.

    Scale posture (the paper's method needs a single-machine suffix
    array; this is all bucketed shuffles): (1) window stream →
    ``groupBy(hash)`` computing ``(count, min(struct(id, pos)))`` —
    map-side combined, hot spans collapse per task; (2) windows ⋈ that
    table on the span hash — skew is data-borne repetition, exactly
    what AQE's skew split absorbs; (3) covered-index explode is
    O(k · removed windows) slim int pairs, distinct + anti-join + the
    final regroup all shuffle on the id — co-partitioned by AQE.
    Nothing driver-side.
    """
    toks_arr = F.split(F.trim(F.col(text_col)), " ")
    base = ensure_parallelism(docs).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    )
    toks = base.select(
        "_id",
        F.posexplode(F.split(F.trim(F.col("_text")), " ")).alias(
            "_idx", "_tok"
        ),
    )
    wins = base.select(
        "_id",
        F.size(F.split(F.trim(F.col("_text")), " ")).alias("_n"),
        F.posexplode(shingles(F.col("_text"), k)).alias("_j", "_s"),
    ).select("_id", "_n", "_j", F.md5(F.col("_s")).alias("_h"))
    span_tbl = wins.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(F.struct("_id", "_j")).alias("_kp"),
    )
    removed = (
        wins.join(span_tbl, "_h")
        .filter(
            (F.col("_cnt") >= 2)
            & (F.struct("_id", "_j") != F.col("_kp"))
        )
        .select(
            "_id",
            F.explode(
                F.sequence(
                    F.col("_j"),
                    F.least(F.col("_j") + F.lit(k - 1), F.col("_n") - 1),
                )
            ).alias("_idx"),
        )
        .distinct()
    )
    survivors = toks.join(removed, ["_id", "_idx"], "left_anti")
    rebuilt = survivors.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(toks_arr).alias("n_tokens"),
        )
        .join(rebuilt, F.col(id_col) == rebuilt["_id"], "left")
        .select(
            id_col,
            F.coalesce("_clean", F.lit("")).alias(text_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
