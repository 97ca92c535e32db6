"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship crawl; ``queries()`` exposes
each implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) as a (spark, sf_dir) → DataFrame callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one. The crawl queries run the REAL engine (frontier
rounds, seen anti-join, politeness, parse UDFs) and are checked
against a recursive-CTE reachability oracle over the corpus's
arithmetic link graph — an independent whole-crawl correctness gate.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memorious_spark.session import ship_package

# ----------------------------------------------------------------------
# shared helpers
# ----------------------------------------------------------------------

# the single source of truth for the language-ID marker table lives in
# textops; the DuckDB oracle is generated from the same dict so the
# two engines can never drift
from memorious_spark.functions.textops import _LANG_MARKERS as _MARKERS
from memorious_spark.operators.sampling import split_bounds as _split_bounds
_STOPWORDS = (" the ", " a ", " and ", " of ", " to ")
N_PERM, N_BANDS = 16, 4
KNN_PLANES = 6
EMB_DIM = 64
IVF_K, IVF_NPROBE, IVF_SPACING = 8, 2, 37
PQ_M, PQ_NC, PQ_SPACING = 4, 16, 31  # 16-dim subspaces over dim 64
SEMDEDUP_THR = 0.35
SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}
DSIR_BUCKETS = 8192
SPAN_K = 5
PR_STRIDES = (1, 12, 23)  # corpus.LINK_STRIDES (anchor graph)
PR_ITERS = 5
PR_UNIT = 10**6
LSH_BANDS, LSH_PPB = 4, 4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _corpus(spark: SparkSession, sf_dir: str):
    from memorious_spark.sources.corpus import build_corpus

    docs = _docs(spark, sf_dir)
    n = docs.count()
    return build_corpus(spark, docs, n), n


def _run_crawl(spark: SparkSession, sf_dir: str, redirects: bool = True):
    """Run the full engine over the documents-derived corpus; returns
    the RunStore of a completed run (fresh temp dir per call)."""
    from memorious_spark.plans.pipeline import CrawlConfig
    from memorious_spark.plans.runner import CrawlRunner
    from memorious_spark.plans.storage import RunStore
    from memorious_spark.sources.corpus import build_corpus, seed_urls

    ship_package(spark)
    docs = _docs(spark, sf_dir)
    corpus = build_corpus(spark, docs, docs.count(), redirects=redirects)
    corpus = corpus.persist()
    # retries=1: the only fetch-misses in this corpus are the synthetic
    # missing-css urls, whose retry outcome never changes — fewer
    # trailing drain rounds, identical final state
    cfg = CrawlConfig(
        name="entry", seeds=tuple(seed_urls(3)), max_rounds=40, retries=1
    )
    store = RunStore(tempfile.mkdtemp(prefix="msrun_"), "entry", "r1")
    CrawlRunner(spark, cfg, store).run(corpus)
    corpus.unpersist()
    return store


# The corpus taxonomy / link arithmetic, shared by every crawl oracle
# (mirrors memorious_spark/sources/corpus.py — keep in lockstep).
_RESOLVE = """
    SELECT f.d AS d, f.depth AS depth,
           CASE WHEN f.d % 23 = 0 THEN NULL
                WHEN f.d % 19 = 0 THEN (f.d + 1) % (SELECT count(*) FROM documents)
                ELSE f.d END AS c,
           (SELECT count(*) FROM documents) AS n
    FROM reach f
"""

_TARGETS = """
    SELECT unnest(CASE WHEN rc.c IS NOT NULL AND rc.c % 23 <> 0
                        AND rc.c % 19 <> 0 AND rc.c % 17 <> 0
      THEN list_concat(
        [(7*rc.c+1) % rc.n, (7*rc.c+12) % rc.n, (7*rc.c+23) % rc.n,
         (7*rc.c+34) % rc.n],
        CASE WHEN rc.c % 2 = 0 THEN [(7*rc.c+45) % rc.n] ELSE [] END)
      ELSE [] END) AS t
"""

_REACH_CTE = f"""
WITH RECURSIVE reach(d, depth) AS (
  SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0), (1, 0), (2, 0)) v(d, depth)
  UNION
  SELECT u.t, rc.depth + 1
  FROM ({_RESOLVE}) rc, LATERAL ({_TARGETS}) u
  WHERE rc.depth < 35
),
resolved AS (
  SELECT d, min(depth) AS depth,
         CASE WHEN d % 23 = 0 THEN NULL
              WHEN d % 19 = 0 THEN (d + 1) % (SELECT count(*) FROM documents)
              ELSE d END AS c,
         (SELECT count(*) FROM documents) AS n
  FROM reach GROUP BY d
)
"""

_DOC_URL = "'https://h' || ({x} % 7) || '.example.com/doc/' || {x}"
_CSS_URL = "'https://h' || ({x} % 7) || '.example.com/assets/style.css'"
_HTML_COND = "rc.c IS NOT NULL AND rc.c % 23 <> 0 AND rc.c % 19 <> 0 AND rc.c % 17 <> 0"


def _minhash_sql_mins() -> str:
    cols = ", ".join(
        f"min(md5('{i}:' || s)) AS h{i}" for i in range(N_PERM)
    )
    return f"SELECT doc_id, {cols} FROM sh GROUP BY doc_id"


def _minhash_sql_bands() -> str:
    r = N_PERM // N_BANDS
    cols = ", ".join(
        "md5(" + " || '|' || ".join(f"h{b * r + j}" for j in range(r)) + f") AS b{b}"
        for b in range(N_BANDS)
    )
    return f"SELECT doc_id, {cols} FROM mins"


_SHINGLES_CTE = """
t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2] AS s
  FROM t, LATERAL unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS u(j)
)
"""


def _simhash_sql() -> str:
    """DuckDB twin of dedup.simhash_signature_cols + simhash_pairs:
    identical md5 word-hash bit math, 64 ±1 sums, 16-bit banding,
    hamming ≤ 3 filter."""
    lo_sums = ", ".join(
        f"sum(CASE WHEN ((w_lo >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    )
    hi_sums = ", ".join(
        f"sum(CASE WHEN ((w_hi >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{32 + b}"
        for b in range(32)
    )
    sig_lo = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(32)
    )
    sig_hi = " + ".join(
        f"(CASE WHEN s{32 + b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(32)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, t.tok FROM documents,
      LATERAL unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    words AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS w_lo,
             CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS w_hi
      FROM toks
    ),
    sums AS (SELECT doc_id, {lo_sums}, {hi_sums} FROM words GROUP BY doc_id),
    sigs0 AS (SELECT doc_id, {sig_lo} AS sig_lo, {sig_hi} AS sig_hi FROM sums),
    sigs AS (
      SELECT d.doc_id, coalesce(s.sig_lo, 0) AS sig_lo,
             coalesce(s.sig_hi, 0) AS sig_hi
      FROM documents d LEFT JOIN sigs0 s USING (doc_id)
    ),
    bands AS (
      SELECT doc_id, sig_lo, sig_hi, b.band,
             CASE b.band WHEN 0 THEN sig_lo & 65535
                         WHEN 1 THEN (sig_lo >> 16) & 65535
                         WHEN 2 THEN sig_hi & 65535
                         ELSE (sig_hi >> 16) & 65535 END AS key
      FROM sigs, LATERAL unnest([0, 1, 2, 3]) AS b(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig_lo, b.sig_lo))
                + bit_count(xor(a.sig_hi, b.sig_hi)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig_lo, b.sig_lo))
          + bit_count(xor(a.sig_hi, b.sig_hi)) <= 3
    """


def _plane_signs(plane: int, dim: int = EMB_DIM) -> list[float]:
    from memorious_spark.operators.similarity import _plane_sign

    return [_plane_sign(plane, d) for d in range(dim)]


def _emb_lsh_pairs_sql(threshold: float = 0.35) -> str:
    """DuckDB twin of dedup.embedding_dup_pairs_lsh: same md5-parity
    hyperplanes (global plane index band·ppb + j), banded buckets,
    exact cosine re-rank."""
    def bucket_expr(band: int) -> str:
        arrays = [
            "[" + ", ".join(str(s) for s in _plane_signs(band * LSH_PPB + j)) + "]"
            for j in range(LSH_PPB)
        ]
        return " + ".join(
            f"(CASE WHEN {_F64_DOT.format(a='e.embedding', b=arrays[j], dim=EMB_DIM)} > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(LSH_PPB)
        )

    buckets = ", ".join(
        f"({bucket_expr(b)}) AS bucket{b}" for b in range(LSH_BANDS)
    )
    band_joins = "\nUNION\n".join(
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM bk a "
        f"JOIN bk b ON a.bucket{band} = b.bucket{band} AND a.vec_id < b.vec_id"
        for band in range(LSH_BANDS)
    )
    return f"""
    WITH bk AS (SELECT e.vec_id, e.embedding, {buckets} FROM embeddings e),
    cand AS (SELECT DISTINCT id_a, id_b FROM ({band_joins}))
    SELECT c.id_a, c.id_b,
           round({_cosine_sql('x.embedding', 'y.embedding')}, 6) AS cosine
    FROM cand c
    JOIN embeddings x ON x.vec_id = c.id_a
    JOIN embeddings y ON y.vec_id = c.id_b
    WHERE round({_cosine_sql('x.embedding', 'y.embedding')}, 6) >= {threshold}
    """


_F64_DOT = (
    "(SELECT sum(({a})[j]::DOUBLE * ({b})[j]::DOUBLE) "
    "FROM unnest(generate_series(1, {dim})) t(j))"
)

_F64_DIST2 = (
    "(SELECT sum((({a})[j]::DOUBLE - ({b})[j]::DOUBLE) "
    "* (({a})[j]::DOUBLE - ({b})[j]::DOUBLE)) "
    "FROM unnest(generate_series(1, {dim})) t(j))"
)


def _cosine_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    dot = _F64_DOT.format(a=a, b=b, dim=dim)
    na = _F64_DOT.format(a=a, b=a, dim=dim)
    nb = _F64_DOT.format(a=b, b=b, dim=dim)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def _lang_sql() -> str:
    # token-set membership counts, the exact twin of textops.lang_guess
    # (tokenize once, one list_filter per language); scores land in a
    # CTE so each is computed once, then the argmax-with-earlier-wins
    # fold reads the named columns
    score_cols = ", ".join(
        "len(list_filter(toks, x -> x IN ("
        + ", ".join(f"'{m.strip()}'" for m in ms)
        + f"))) AS s_{lang}"
        for lang, ms in _MARKERS.items()
    )
    expr = "CASE "
    order = list(_MARKERS)
    for i, lang in enumerate(order):
        strictly_beats = [f"s_{lang} > s_{o}" for o in order[:i]]
        at_least = [f"s_{lang} >= s_{o}" for o in order[i + 1:]]
        conds = [f"s_{lang} > 0"] + strictly_beats + at_least
        expr += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    expr += "ELSE 'und' END"
    return f"""
    WITH t_ AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents
    ),
    s_ AS (SELECT doc_id, {score_cols} FROM t_)
    SELECT doc_id, {expr} AS lang_guess FROM s_
    """


def _stop_sql() -> str:
    terms = " + ".join(
        f"(length(p) - length(replace(p, '{w}', ''))) / {len(w)}"
        for w in _STOPWORDS
    )
    return f"({terms})"


def _pagerank_sql(
    n_iter: int = PR_ITERS, unit: int = PR_UNIT, dnum: int = 17, dden: int = 20
) -> str:
    """DuckDB twin of linkrank.pagerank over the corpus anchor graph:
    the fixed iterations UNROLL as chained CTEs (a recursive CTE may
    reference itself only once, but each round needs the previous
    ranks twice — dangling mass + in-sums). All-integer arithmetic
    (`//` here, `div` in Spark — identical on non-negative values),
    so the match is bit-exact, not round-trip-lucky."""
    base = ((dden - dnum) * unit) // dden
    strides = ", ".join(f"(7 * doc_id + {s}) % nn.n" for s in PR_STRIDES)
    rounds = []
    for t in range(1, n_iter + 1):
        rounds.append(f"""
pr{t} AS (
  SELECT nd.node, nd.dangling, nd.deg,
         CAST({base} + ({dnum} * (COALESCE(s.insum, 0) + d.share))
              // {dden} AS BIGINT) AS units
  FROM nd
  CROSS JOIN (SELECT COALESCE(sum(units), 0) // (SELECT N FROM nc) AS share
              FROM pr{t - 1} WHERE dangling) d
  LEFT JOIN (SELECT e.dst AS node, sum(p.units // p.deg) AS insum
             FROM pr{t - 1} p JOIN edges e ON e.src = p.node
             GROUP BY e.dst) s ON s.node = nd.node
)""")
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, unnest([{strides}]) AS dst
    FROM documents, nn
    WHERE doc_id % 23 <> 0 AND doc_id % 19 <> 0 AND doc_id % 17 <> 0)
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT node FROM (
  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges)),
nd AS (SELECT n.node, d.deg, d.deg IS NULL AS dangling
       FROM nodes n LEFT JOIN deg d ON d.src = n.node),
nc AS (SELECT count(*) AS N FROM nodes),
pr0 AS (SELECT node, dangling, deg, CAST({unit} AS BIGINT) AS units FROM nd),
{",".join(rounds)}
SELECT node, units AS rank_units, units / {float(unit)} AS rank
FROM pr{n_iter}
"""


def _lm_perplexity_sql() -> str:
    """DuckDB twin of selection.lm_bigram_scores: same split/bigram
    conventions as the DSIR oracle, per-bigram round-6 decimal
    quantization, documents without bigrams fall out of the explode
    and re-enter as (0, 0.0) through the final left join."""
    return """
WITH rtok AS (SELECT string_split(lower(trim(text)), ' ') AS toks
              FROM documents WHERE doc_id % 10 = 0),
rbig AS (SELECT toks[j] AS w1, toks[j + 1] AS w2
         FROM rtok, LATERAL unnest(generate_series(1, len(toks) - 1)) u(j)),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM rbig GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
v AS (SELECT count(DISTINCT t) AS V
      FROM (SELECT unnest(toks) AS t FROM rtok)),
dtok AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
         FROM documents),
dbig AS (SELECT doc_id, toks[j] AS w1, toks[j + 1] AS w2
         FROM dtok, LATERAL unnest(generate_series(1, len(toks) - 1)) u(j)),
scored AS (
  SELECT doc_id,
         CAST(round(ln((COALESCE(c2.c2, 0) + 1)::DOUBLE
                       / (COALESCE(c1.c1, 0) + v.V)::DOUBLE), 6)
              AS DECIMAL(18,6)) AS logp
  FROM dbig LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1), v),
agg AS (SELECT doc_id, count(*) AS nb,
               CAST(sum(logp) AS DOUBLE) / count(*) AS avg_lp
        FROM scored GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(a.nb, 0) AS BIGINT) AS n_bigrams,
       COALESCE(a.avg_lp, 0.0) AS avg_logp
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ----------------------------------------------------------------------
# entry / queries / oracle_sql
# ----------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full frontier crawl of the sf0.001 synthetic web,
    returning the stored page rows."""
    store = _run_crawl(spark, "/root/testdata/sf0.001")
    results = store.read_all(spark, "results", 60)
    return results.select(
        "url", "final_url", "host", "depth", "status_code", "content_type",
        "content_hash", "title",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from memorious_spark.functions import checks, textops
    from memorious_spark.functions.urls import host_col, norm_col
    from memorious_spark.operators import dedup, similarity
    from memorious_spark.operators.frontier import politeness_dequeue
    from memorious_spark.operators.initializers import (
        dates, enumerate_items, seed, sequence,
    )
    from memorious_spark.operators.seen import dedup_new
    from memorious_spark.operators.sinks import merge_upsert
    from memorious_spark.plans.rules import compile_rule

    # -- crawl engine ---------------------------------------------------
    def crawl_bfs_seen(spark, sf_dir):
        store = _run_crawl(spark, sf_dir)
        seen = store.read_all(spark, "seen", 60)
        return seen.select(F.col("value").alias("url")).distinct()

    def crawl_min_depth(spark, sf_dir):
        # redirect-free corpus: frontier membership is then
        # order-independent and exactly SQL-expressible (see corpus.py)
        store = _run_crawl(spark, sf_dir, redirects=False)
        dfs = []
        for r in range(60):
            df = store.read_round(spark, "frontier", r)
            if df is None:
                break
            dfs.append(df.select("url", "depth"))
        allf = dfs[0]
        for d in dfs[1:]:
            allf = allf.unionByName(d)
        return allf.groupBy("url").agg(F.min("depth").cast("int").alias("min_depth"))

    def politeness_budget(spark, sf_dir):
        ev = _events(spark, sf_dir)
        frontier = ev.select(
            F.col("event_id"),
            F.col("user_id").cast("string").alias("host"),
            F.lit(0.0).alias("priority"),
            F.col("event_id").alias("emit_seq"),
        )
        selected, _carry = politeness_dequeue(frontier, budget=5)
        return selected.select("event_id", "host")

    def robots_politeness(spark, sf_dir):
        """robots.txt gating end-to-end: synthesize per-host robots
        documents (JVM-side), parse them with the REAL robots_table
        mapInPandas kernel, and run the REAL politeness dequeue —
        disallowed paths dropped, per-host budgets from Crawl-delay."""
        from memorious_spark.functions.robots import robots_table
        from memorious_spark.operators.frontier import politeness_dequeue

        ship_package(spark)
        hosts = spark.range(7).select(F.col("id").alias("h"))
        robots_corpus = hosts.select(
            F.concat(
                F.lit("https://h"), F.col("h"),
                F.lit(".example.com/robots.txt"),
            ).alias("url"),
            F.encode(
                F.concat(
                    F.lit("User-agent: *\nDisallow: /doc/priv\nCrawl-delay: "),
                    (F.col("h") + 10).cast("string"),
                    F.lit("\n"),
                ),
                "utf-8",
            ).alias("html"),
        )
        gate = robots_table(robots_corpus, agent="memorious", round_seconds=60.0)

        ev = _events(spark, sf_dir)
        host = F.concat(F.lit("h"), F.col("user_id") % 7, F.lit(".example.com"))
        url = F.concat(
            F.lit("https://"), host,
            F.when(F.col("event_id") % 13 == 0, F.lit("/doc/priv/")).otherwise(
                F.lit("/doc/")
            ),
            F.col("event_id"),
        )
        frontier = ev.select(
            "event_id",
            host.alias("host"),
            url.alias("url"),
            F.lit(0.0).alias("priority"),
            F.col("event_id").alias("emit_seq"),
        )
        sel, _carry = politeness_dequeue(frontier, budget=1_000, robots=gate)
        return sel.select("event_id", "host", "url")

    def dedup_anti_join(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        cands = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://h"), F.col("doc_id") % 7,
                F.lit(".example.com/doc/"), F.col("doc_id"),
            ).alias("url"),
        ).withColumn("url_hash", F.xxhash64("url"))
        seen = (
            cands.filter(F.col("doc_id") % 3 == 0)
            .select(F.col("url_hash"))
        )
        return dedup_new(cands, seen).select("doc_id", "url")

    def dedup_cuckoo(spark, sf_dir):
        """The deletable seen-filter (operators/cuckoo.py): build the
        sharded cuckoo filter over the seen hashes, DELETE the expired
        subset (the operation the bloom structurally lacks), and
        prefilter the anti-join with it. Exactness contract identical
        to dedup_anti_join: the final left_anti decides."""
        from memorious_spark.operators.cuckoo import (
            build_cuckoo, delete_cuckoo,
        )

        docs = _docs(spark, sf_dir)
        cands = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://h"), F.col("doc_id") % 7,
                F.lit(".example.com/doc/"), F.col("doc_id"),
            ).alias("url"),
        ).withColumn("url_hash", F.xxhash64("url"))
        seen_all = cands.filter(F.col("doc_id") % 3 == 0)
        filt = build_cuckoo(
            seen_all, "url_hash",
            expected=max(64, seen_all.count()), n_shards=8,
        )
        expired = seen_all.filter(F.col("doc_id") % 6 == 0)
        delete_cuckoo(filt, expired)
        live = seen_all.filter(F.col("doc_id") % 6 != 0).select("url_hash")
        return dedup_new(cands, live, cuckoo=filt).select("doc_id", "url")

    def dedup_sharded(spark, sf_dir):
        """The executor-resident seen-filter (operators/
        sharded_filter.py): the filter is a (shard, bitmap) DataFrame
        maintained by cogrouped Arrow jobs — zero filter bytes through
        the driver, the posture that survives a 10^10-URL frontier.
        Build over the seen hashes, incrementally OR in a second
        batch, probe shard-local. Exactness contract identical to
        dedup_anti_join: the final left_anti decides."""
        from memorious_spark.operators.sharded_filter import (
            build_sharded_bloom, dedup_new_sharded, update_sharded,
        )

        docs = _docs(spark, sf_dir)
        cands = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://h"), F.col("doc_id") % 7,
                F.lit(".example.com/doc/"), F.col("doc_id"),
            ).alias("url"),
        ).withColumn("url_hash", F.xxhash64("url"))
        seen0 = cands.filter(F.col("doc_id") % 3 == 0)
        filt = build_sharded_bloom(
            seen0, "url_hash",
            expected=max(64, seen0.count()), shards=8,
        )
        add = cands.filter(F.col("doc_id") % 5 == 0)
        filt = update_sharded(filt, add, key="url_hash")
        seen_all = (
            seen0.select("url_hash").unionByName(add.select("url_hash"))
        )
        return dedup_new_sharded(cands, seen_all, filt).select(
            "doc_id", "url"
        )

    def dedup_sharded_cuckoo(spark, sf_dir):
        """The deletable seen-filter gone executor-resident
        (operators/sharded_filter.py ShardedCuckoo): shard tables live
        as a DataFrame, insert/DELETE/probe are cogrouped Arrow jobs —
        delete support without driver residency. Same scenario as
        dedup_cuckoo: build over seen, delete the expired subset,
        prefilter the anti-join; the final left_anti decides."""
        from memorious_spark.operators.sharded_filter import (
            build_sharded_cuckoo, dedup_new_sharded_cuckoo,
            delete_sharded_cuckoo,
        )

        docs = _docs(spark, sf_dir)
        cands = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://h"), F.col("doc_id") % 7,
                F.lit(".example.com/doc/"), F.col("doc_id"),
            ).alias("url"),
        ).withColumn("url_hash", F.xxhash64("url"))
        seen_all = cands.filter(F.col("doc_id") % 3 == 0)
        filt = build_sharded_cuckoo(
            seen_all, "url_hash",
            expected=max(64, seen_all.count()), shards=8,
        )
        expired = seen_all.filter(F.col("doc_id") % 6 == 0)
        filt, _removed = delete_sharded_cuckoo(filt, expired)
        live = seen_all.filter(F.col("doc_id") % 6 != 0).select("url_hash")
        return dedup_new_sharded_cuckoo(cands, live, filt).select(
            "doc_id", "url"
        )

    def incremental_skip(spark, sf_dir):
        ev = _events(spark, sf_dir)
        now = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
        seen = (
            ev.filter(F.col("event_type") == "signup")
            .select(
                "user_id",
                (F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias("expires_at"),
            )
            .filter(F.col("expires_at") > now)
            .select("user_id")
            .distinct()
        )
        cands = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id"
        )
        return cands.join(seen, "user_id", "left_anti").select("event_id", "user_id")

    def merge_first_last_seen(spark, sf_dir):
        ev = _events(spark, sf_dir)
        cutoff = F.to_timestamp(F.lit("2024-01-08 00:00:00"))
        stamp = F.to_timestamp(F.lit("2024-01-05 00:00:00"))
        existing = (
            ev.filter(F.col("ts") < cutoff)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
            .withColumn("__first_seen", stamp)
            .withColumn("__last_seen", stamp)
        )
        batch = (
            ev.filter(F.col("ts") >= cutoff)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
        )
        return merge_upsert(existing, batch, ["user_id"], now="2024-02-01 00:00:00")

    # -- http cache / incremental re-run ---------------------------------
    def http_cache_replay(spark, sf_dir):
        """Run-2 conditional fetch over a corpus where doc_id%5==0
        pages changed (new warc_ts): probes a run-1 http_cache, joins
        the corpus through the REAL fetch stage, and replays 304s —
        cached hash + original retrieved_at for unchanged pages."""
        from memorious_spark.operators.cache import apply_replay, cache_probe
        from memorious_spark.operators.fetch import fetch_stage
        from memorious_spark.sources.corpus import build_corpus

        docs = _docs(spark, sf_dir)
        n = docs.count()
        doc_id = F.split(F.col("url"), "/doc/").getItem(1).cast("long")
        corpus2 = build_corpus(spark, docs, n).withColumn(
            "warc_ts",
            F.when(
                doc_id % 5 == 0, F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
            ).otherwise(F.col("warc_ts")),
        )
        url = F.concat(
            F.lit("https://h"), F.col("doc_id") % 7,
            F.lit(".example.com/doc/"), F.col("doc_id"),
        )
        warc0 = F.expr(
            "timestampadd(SECOND, doc_id, TIMESTAMP '2024-01-01 00:00:00')"
        )
        # run-1 cache = every ok (non-404, non-redirect) page, as the
        # reference caches only ok bodies (http.py:199-201)
        cache = docs.filter(
            (F.col("doc_id") % 23 != 0) & (F.col("doc_id") % 19 != 0)
        ).select(
            F.xxhash64(url).alias("url_hash"),
            url.alias("url_norm"),
            warc0.alias("warc_ts"),
            F.concat(F.lit("h-"), F.col("doc_id")).alias("content_hash"),
            F.to_timestamp(F.lit("2024-01-05 00:00:00")).alias("retrieved_at"),
            F.lit("r1").alias("run_id"),
            F.to_timestamp(F.lit("2024-01-05 00:00:00")).alias("created_at"),
            F.lit(None).cast("timestamp").alias("expires_at"),
        )
        frontier = corpus2.select(
            "url",
            F.col("url").alias("url_norm"),
            F.xxhash64("url").alias("url_hash"),
            F.lit("h").alias("host"),
            F.lit(0).alias("depth"),
            F.lit(0.0).alias("priority"),
            F.lit(None).cast("string").alias("src_url"),
            F.lit(None).cast("int").alias("link_idx"),
            F.xxhash64("url").alias("emit_seq"),
            F.lit(0).alias("attempt"),
        )
        probed = cache_probe(frontier, cache, now_ts="2024-01-06 00:00:00")
        rep = apply_replay(fetch_stage(probed, corpus2))
        return rep.select(
            "url",
            "replayed",
            F.when(F.col("replayed"), F.col("content_hash")).alias("hash_src"),
            F.unix_timestamp(
                F.coalesce(F.col("retrieved_at_cached"), F.col("warc_ts"))
            ).alias("retrieved_s"),
        )

    def incremental_second_run(spark, sf_dir):
        """skip_incremental at the store stage (context.py:127-148):
        run-2 stores only rows whose (url, content_hash) inc tag is
        absent, changed, or expired."""
        from memorious_spark.operators.cache import skip_unchanged

        docs = _docs(spark, sf_dir)
        url = F.concat(
            F.lit("https://h"), F.col("doc_id") % 7,
            F.lit(".example.com/doc/"), F.col("doc_id"),
        )
        version = F.when(F.col("doc_id") % 7 == 3, "v2").otherwise("v1")
        stored = docs.select(
            "doc_id",
            url.alias("url"),
            F.xxhash64(url).alias("url_hash"),
            F.concat(F.lit("c-"), F.col("doc_id"), F.lit("-"), version).alias(
                "content_hash"
            ),
        )
        inc_tags = docs.filter(F.col("doc_id") % 11 != 5).select(
            F.xxhash64(url).alias("url_hash"),
            F.concat(F.lit("c-"), F.col("doc_id"), F.lit("-v1")).alias(
                "content_hash"
            ),
            F.lit("r1").alias("run_id"),
            F.to_timestamp(F.lit("2024-01-05 00:00:00")).alias("created_at"),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.to_timestamp(F.lit("2024-02-01 00:00:00")),
            ).alias("expires_at"),
        )
        out = skip_unchanged(stored, inc_tags, now_ts="2024-06-01 00:00:00")
        return out.select("doc_id", "url", "content_hash")

    def tags_kv(spark, sf_dir):
        """set_tag / get_tag / check_tag as batch joins (context.py:
        114-125): run 1 tags even doc keys, run 2 overwrites multiples
        of 3 — membership and latest-value semantics checked on every
        key, using the REAL operators over the shared tags table."""
        import tempfile

        from memorious_spark.operators import tags as T
        from memorious_spark.plans.storage import RunStore

        docs = _docs(spark, sf_dir)
        keyed = docs.select(
            "doc_id",
            F.concat(F.lit("u"), F.col("doc_id")).alias("key"),
        )
        store = RunStore(tempfile.mkdtemp(prefix="tags_"), "tg", "r1")
        T.set_tags(
            store,
            keyed.filter(F.col("doc_id") % 2 == 0).withColumn(
                "val", F.concat(F.lit("v1-"), F.col("doc_id"))
            ),
            "tg", "tag", value_col="val", run_id="r1",
            now_ts="2024-01-01 00:00:00",
        )
        T.set_tags(
            store,
            keyed.filter(F.col("doc_id") % 3 == 0).withColumn(
                "val", F.concat(F.lit("v2-"), F.col("doc_id"))
            ),
            "tg", "tag", value_col="val", run_id="r2",
            now_ts="2024-02-01 00:00:00",
        )
        out = T.check_tags(spark, store, keyed, "tg", "tag")
        out = T.get_tags(spark, store, out, "tg", "tag")
        return out.select("doc_id", "key", "tagged", "tag_value")

    def db_nested_upsert(spark, sf_dir):
        """The db sink's recursive upsert (operations/db.py:25-54) over
        two runs: run 1 loads the even doc_ids, run 2 upserts all rows
        with changed data — parent table keeps __first_seen of the
        first run for surviving keys, children land in the suffixed
        table with inherited parent columns."""
        import tempfile

        from memorious_spark.operators.sinks import db_sink_run
        from memorious_spark.plans.storage import RunStore

        docs = _docs(spark, sf_dir)
        url = F.concat(
            F.lit("https://h"), F.col("doc_id") % 7,
            F.lit(".example.com/doc/"), F.col("doc_id"),
        )
        def results(bump):
            return docs.select(
                url.alias("url"),
                "doc_id",
                (F.col("n_chars") + bump).alias("n_chars"),
                F.map_from_arrays(
                    F.array(F.lit("tags")),
                    F.array(F.array(F.col("source"), F.col("lang"))),
                ).alias("properties"),
            )

        params = {
            "table": "t", "unique": ["url"],
            "children": [{
                "key": "tags", "table_suffix": "tags",
                "inherit": {"page_url": "url"},
                "unique": ["page_url", "value"],
            }],
        }
        store = RunStore(tempfile.mkdtemp(prefix="dbq_"), "dbq", "r1")
        db_sink_run(
            spark, store, results(0).filter(F.col("doc_id") % 2 == 0),
            params, "dbq", "2024-01-02 00:00:00",
        )
        db_sink_run(spark, store, results(1), params, "dbq",
                    "2024-01-05 00:00:00")
        parent = store.read_shared(spark, "db_t")
        child = store.read_shared(spark, "db_t_tags")
        tags = child.groupBy(F.col("page_url").alias("url")).agg(
            F.count("*").alias("n_tags"),
            F.sort_array(F.collect_set("value")).alias("tag_values"),
        )
        return parent.join(tags, "url").select(
            "url", "doc_id", "n_chars",
            F.date_format("__first_seen", "yyyy-MM-dd").alias("first_seen"),
            F.date_format("__last_seen", "yyyy-MM-dd").alias("last_seen"),
            "n_tags",
            F.concat_ws("|", "tag_values").alias("tags"),
        )

    # -- initializers ----------------------------------------------------
    def seed_gen(spark, sf_dir):
        return seed(
            spark,
            ["https://h0.example.com/doc/%(num)s", "https://h1.example.com/"],
            {"num": 7},
        )

    def enumerate_gen(spark, sf_dir):
        return enumerate_items(spark, ["alpha", "beta", "gamma"])

    def sequence_gen(spark, sf_dir):
        return sequence(spark, start=10, stop=5000, step=7)

    def dates_gen(spark, sf_dir):
        return dates(spark, "2024-01-01", "2024-01-31", days=3)

    def init_frontier_dates(spark, sf_dir):
        """YAML-compiled generator init (round-3 wiring): a dates init
        stage feeding two %-templated seed urls materializes into the
        round-0 frontier with the reference's per-item FIFO emit order
        (memorious/operations/initializers.py:78-109 + 5-18)."""
        from memorious_spark.operators.initializers import (
            compile_initial_frontier,
        )
        from memorious_spark.plans.pipeline import load_yaml

        cfg = load_yaml("""
name: dates_init
pipeline:
  init:
    method: dates
    params: {begin: "2024-01-01", end: "2024-03-01", days: 2}
    handle: {pass: urls}
  urls:
    method: seed
    params:
      urls:
        - "https://archive.example.com/%(date)s"
        - "https://mirror.example.com/%(date_iso)s"
    handle: {pass: fetch}
  fetch:
    method: fetch
    handle: {pass: parse}
  parse:
    method: parse
    handle: {store: store}
  store:
    method: directory
""")
        return compile_initial_frontier(spark, cfg)

    # -- scalar kernels ---------------------------------------------------
    def url_kernel(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        messy = docs.select(
            "doc_id",
            F.concat(
                F.lit("HTTPS://H"), F.col("doc_id") % 7,
                F.lit(".Example.COM:443/doc/"), F.col("doc_id"),
                F.lit("?q="), F.col("doc_id") % 3, F.lit("#frag"),
            ).alias("url"),
        )
        return messy.select(
            "doc_id",
            norm_col(F.col("url")).alias("url_norm"),
            host_col(F.col("url")).alias("host"),
        )

    def domain_kernel(spark, sf_dir):
        """Registrable-domain extraction (PSL-lite): hosts are
        synthesized across plain, two-level-suffix and deep-subdomain
        shapes; the oracle recomputes the domain closed-form from the
        generated layout, pinning the Column suffix logic."""
        from memorious_spark.functions.urls import registrable_domain_col

        docs = _docs(spark, sf_dir)
        suffix = F.element_at(
            F.array(
                F.lit("com"), F.lit("co.uk"), F.lit("com.au"),
                F.lit("org"), F.lit("gov.uk"),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        )
        sub = F.element_at(
            F.array(F.lit("a.b."), F.lit("www."), F.lit("")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        )
        host = F.concat(
            sub, F.lit("site"), F.col("doc_id") % 50, F.lit("."), suffix
        )
        return docs.select(
            "doc_id",
            host.alias("host"),
            registrable_domain_col(host).alias("domain"),
        )

    def url_canon(spark, sf_dir):
        """Aggressive canonicalization for dedup: query params sorted,
        utm_*/click-id params stripped, empty query dropped — on top
        of the conservative norm (lowercase, default port). The oracle
        rebuilds the canonical string closed-form per query shape."""
        from memorious_spark.functions.urls import canon_col

        docs = _docs(spark, sf_dir)
        query = (
            F.when(F.col("doc_id") % 3 == 0, "?b=2&a=1&utm_source=x")
            .when(F.col("doc_id") % 3 == 1, "?utm_campaign=z&gclid=1")
            .otherwise("?z=9")
        )
        url = F.concat(
            F.lit("https://H"), F.col("doc_id") % 7,
            F.lit(".Example.COM:443/p/"), F.col("doc_id"), query,
        )
        return docs.select(
            "doc_id", canon_col(url).alias("url_canon")
        )

    def make_id(spark, sf_dir):
        """make_key text (oracle-exact) + make_id digest shape; the
        digest is reference-faithful sha1(make_key) (helpers/key.py:
        6-10) whose byte-exactness is pinned against hashlib in
        pytest — DuckDB has no sha1 function to oracle it here."""
        from memorious_spark.functions.keys import make_id as mkid, make_key

        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        parts = (F.lit("crawler"), F.col("n_name"))
        return nation.select(
            "n_nationkey",
            make_key(*parts).alias("key"),
            F.length(mkid(*parts)).cast("int").alias("id_len"),
        )

    def rule_filter(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        rows = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                F.col("doc_id"),
            ).alias("url"),
            F.when(F.col("lang") == "en", "text/html")
            .when(F.col("lang") == "es", "application/pdf")
            .otherwise("image/png")
            .alias("content_type"),
            F.lit(None).cast("string").alias("text"),
        )
        rule = {
            "and": [
                {"domain": "example.com"},
                {"not": {"mime_group": "images"}},
                {"or": [
                    {"mime_type": "text/html"},
                    {"pattern": r"https://src[0-2]\."},
                ]},
            ]
        }
        return rows.filter(compile_rule(rule)).select("doc_id", "url", "content_type")

    def metrics_rollup(spark, sf_dir):
        ev = _events(spark, sf_dir)
        return ev.groupBy("event_type").agg(
            F.count("*").alias("n_ops"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )

    def check_validators(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return docs.select(
            "doc_id",
            checks.is_not_empty(F.col("text")).alias("nonempty"),
            checks.is_integer(F.col("n_chars")).alias("int_ok"),
            checks.match_regexp(F.col("lang"), "^[a-z]{2}$").alias("lang_ok"),
            checks.has_length(F.col("lang"), 2).alias("len_ok"),
            checks.must_contain(F.col("source"), "src").alias("src_ok"),
        )

    # -- dedup family -----------------------------------------------------
    def exact_dedup(spark, sf_dir):
        return dedup.exact_dedup(_docs(spark, sf_dir))

    def minhash_lsh_dedup(spark, sf_dir):
        return dedup.minhash_lsh_pairs(
            _docs(spark, sf_dir), n_perm=N_PERM, bands=N_BANDS
        )

    def ngram_jaccard_dedup(spark, sf_dir):
        return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)

    def simhash_dedup(spark, sf_dir):
        return dedup.simhash_pairs(_docs(spark, sf_dir))

    def embedding_dup_pairs(spark, sf_dir):
        return dedup.embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.35)

    def embedding_dup_pairs_lsh(spark, sf_dir):
        return dedup.embedding_dup_pairs_lsh(
            _emb(spark, sf_dir), dim=EMB_DIM, threshold=0.35,
            bands=LSH_BANDS, planes_per_band=LSH_PPB,
        )

    # -- similarity search --------------------------------------------------
    def _query_vec(spark, sf_dir):
        row = _emb(spark, sf_dir).filter(F.col("vec_id") == 0).first()
        return [float(x) for x in row["embedding"]]

    def embedding_knn(spark, sf_dir):
        return similarity.knn_brute_force(
            _emb(spark, sf_dir), _query_vec(spark, sf_dir), k=10
        )

    def ann_lsh_knn(spark, sf_dir):
        return similarity.knn_lsh(
            _emb(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
            n_planes=KNN_PLANES,
        )

    def ann_ivf_knn(spark, sf_dir):
        """IVF ANN (round-3): deterministic strided seed centroids,
        nearest-centroid posting lists, nprobe=2 probe + exact cosine
        re-rank — the coarse-quantizer scale path next to the LSH one."""
        return similarity.knn_ivf(
            _emb(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
            n_centroids=IVF_K, nprobe=IVF_NPROBE, spacing=IVF_SPACING,
        )

    def ann_pq_knn(spark, sf_dir):
        """Product-quantization ADC top-k (Jégou et al. 2011): the
        corpus is encoded to m=4 codes (deterministic strided-seed
        codebooks), every vector scored by the query's asymmetric-
        distance LUT WITHOUT touching raw vectors, the k·refine best
        approximate candidates exact-cosine re-ranked. Completes the
        ANN ladder brute → LSH → IVF → PQ."""
        return similarity.knn_pq(
            _emb(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
            m=PQ_M, n_codes=PQ_NC, spacing=PQ_SPACING, refine=4,
        )

    def ann_ivfpq_knn(spark, sf_dir):
        """IVF + PQ composed (non-residual IVFPQ): coarse cells prune
        the scan to nprobe posting lists, the ADC LUT scores only
        those cells' codes, exact re-rank on the k·refine best. Per
        query ~nprobe/K of the code table is touched — the production
        serve cost model."""
        return similarity.knn_ivfpq(
            _emb(spark, sf_dir), _query_vec(spark, sf_dir), k=10,
            n_centroids=IVF_K, nprobe=IVF_NPROBE, spacing=IVF_SPACING,
            m=PQ_M, n_codes=PQ_NC, pq_spacing=PQ_SPACING, refine=4,
        )

    def dedup_components_op(spark, sf_dir):
        """Connected components over the minhash candidate pairs —
        cluster id = min doc_id of the component (the canonical doc a
        dedup pipeline keeps)."""
        pairs = dedup.minhash_lsh_pairs(_docs(spark, sf_dir))
        return dedup.dedup_components(pairs)

    def corpus_dedup_op(spark, sf_dir):
        """END-TO-END corpus dedup (round-4): ONE pipeline-facing call
        — exact fingerprint dedup → MinHash-LSH pairs over the exact
        survivors → connected components → final canonical manifest
        (doc_id, canonical_id, reason ∈ kept|exact|near). What a
        training-data pipeline invokes instead of stitching the four
        operators itself."""
        return dedup.corpus_dedup(
            _docs(spark, sf_dir), n_perm=N_PERM, bands=N_BANDS
        )

    def corpus_curate_op(spark, sf_dir):
        """The FULL curation composition: Gopher quality gate (fused
        into the corpus scan) → exact dedup → MinHash-LSH → components
        → manifest with reason ∈ kept|exact|near|low_quality. Gate
        thresholds tuned to the synthetic vocabulary (only 'the' of
        the Gopher stopword list occurs → min_stop_hits=1)."""
        from memorious_spark.functions.quality import gopher_keep

        return dedup.curate_corpus(
            _docs(spark, sf_dir),
            quality_filter=gopher_keep(
                F.col("text"), min_words=10, min_stop_hits=1
            ),
            n_perm=N_PERM, bands=N_BANDS,
        )

    # -- text analysis -----------------------------------------------------
    def lang_id(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", textops.lang_guess(F.col("text")).alias("lang_guess")
        )

    def text_normalize(spark, sf_dir):
        """Unicode canonicalization (the pre-dedup normal form): each
        doc's text gets a messy suffix — NFD 'e'+combining-acute, NBSP,
        a control char, an em-space — and the Arrow-batched kernel must
        produce exactly DuckDB's nfc_normalize + the same explicit
        space/control character classes."""
        from memorious_spark.functions.textops import normalize_text_udf

        ship_package(spark)
        docs = _docs(spark, sf_dir)
        messy = F.concat(
            F.col("text"),
            F.lit(" cafe\u0301\u00a0x\u0007y\u2003z"),
        )
        return docs.select(
            "doc_id", normalize_text_udf()(messy).alias("norm_text")
        )

    def text_quality(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return docs.select(
            "doc_id",
            textops.token_count(F.col("text")).alias("tokens"),
            F.round(textops.alpha_ratio(F.col("text")), 6).alias("alpha_ratio"),
            textops.quality_score(F.col("text")).alias("quality"),
        )

    def doc_fingerprint(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id", textops.fingerprint(F.col("text")).alias("fingerprint")
        )

    def strip_boilerplate(spark, sf_dir):
        """Corpus-level line dedup: lines appearing in >= 2 docs are
        boilerplate, stripped from every doc in one broadcast pass."""
        return dedup.strip_boilerplate_lines(
            _docs(spark, sf_dir).select("doc_id", "text"), min_docs=2
        )

    def token_stats(spark, sf_dir):
        """Whitespace + BPE-ish (GPT-2 pre-tokenizer) token counts —
        the two standard budget units of a training-data pipeline,
        both single codegen'd expressions over one scan."""
        return _docs(spark, sf_dir).select(
            "doc_id",
            textops.token_count(F.col("text")).alias("ws_tokens"),
            textops.bpe_token_count(F.col("text")).alias("bpe_tokens"),
        )

    def pii_scrub_op(spark, sf_dir):
        """PII redaction over the corpus. The synthetic docs carry no
        PII, so deterministic addresses/IPs/phones are appended by
        doc_id residue (same construction in the oracle) and the REAL
        scrub kernel (three codegen'd regexp passes) runs over it."""
        from memorious_spark.functions.privacy import pii_metrics, pii_scrub

        d = _docs(spark, sf_dir)
        did = F.col("doc_id")
        raw = F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"),
                         F.lit("@example.org")),
            ).otherwise(F.lit("")),
            F.when(
                did % 4 == 0,
                F.concat(F.lit(" from 10.0."), (did % 256).cast("string"),
                         F.lit(".7")),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" call +1 555 01"),
                         F.lpad((did % 100).cast("string"), 2, "0"),
                         F.lit(" 44")),
            ).otherwise(F.lit("")),
        )
        m = pii_metrics(raw)
        return d.select(
            "doc_id",
            m["n_emails"].alias("n_emails"),
            m["n_ipv4"].alias("n_ipv4"),
            m["n_phones"].alias("n_phones"),
            pii_scrub(raw).alias("scrubbed"),
        )

    def decontaminate(spark, sf_dir):
        """Benchmark decontamination: every 50th doc stands in for the
        eval set; docs sharing any word 8-gram with it are flagged
        (broadcast semi-join path — the benchmark side is the small one)."""
        from memorious_spark.operators.contamination import flag_contaminated

        d = _docs(spark, sf_dir)
        bench = d.filter(F.col("doc_id") % 50 == 0)
        return flag_contaminated(d, bench, n=8)

    def token_shards(spark, sf_dir):
        """Concat-and-chunk shard layout: global exclusive prefix sum
        of token counts in doc_id order via the two-phase distributed
        scan (NOT a single-partition window), shard = floor(offset /
        2000)."""
        from memorious_spark.operators.packing import pack_token_shards

        d = _docs(spark, sf_dir).select(
            "doc_id", textops.token_count(F.col("text")).alias("tokens")
        )
        return pack_token_shards(d, budget=2000)

    def quota_sample_lang(spark, sf_dir):
        """Deterministic stratified sampling: at most 60 docs per
        language, selected by (md5(doc_id), doc_id) — prune-then-exact
        (the window only sees ~2×quota candidates, never the full
        stratum)."""
        from memorious_spark.operators.sampling import quota_sample

        return quota_sample(
            _docs(spark, sf_dir).select("doc_id", "lang"), "lang", quota=60
        )

    def temperature_mix_lang(spark, sf_dir):
        """Temperature-based corpus mixing (Pile/multilingual-LM
        resampling): per-language shares flattened by tau=0.5 into a
        deterministic per-document `copies` column — heads downsample
        (copies 0/1), tails upsample (copies >= 1) — engine-
        reproducible arithmetic (decimal weight sums, 6-dp rounded
        targets, md5 selection order)."""
        from memorious_spark.operators.sampling import temperature_mix

        return temperature_mix(
            _docs(spark, sf_dir).select("doc_id", "lang"), "lang", tau=0.5
        )

    def warc_roundtrip(spark, sf_dir):
        """WARC sink → source round trip: the corpus is written as
        ISO-28500 records (one file per partition through pyarrow.fs)
        and read back via the binaryFile-scan parser; returns each
        record's uri-derived doc_id and payload md5 — equality with
        the oracle's md5(text) proves byte-exact archival."""
        import shutil
        import tempfile

        from memorious_spark.sources.warc import read_warc, write_warc

        ship_package(spark)
        d = _docs(spark, sf_dir).select(
            F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("uri"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
        tmp = tempfile.mkdtemp(prefix="warc_")
        shutil.rmtree(tmp, ignore_errors=True)
        write_warc(d.repartition(8), tmp).collect()
        back = read_warc(spark, f"{tmp}/*.warc")
        return back.select(
            F.substring_index("uri", ":", -1).cast("long").alias("doc_id"),
            F.md5("payload").alias("payload_md5"),
        )

    def warc_cdx_fetch(spark, sf_dir):
        """CDX-indexed WARC random access end-to-end: the corpus is
        archived as member-per-record ``.warc.gz`` plus CDXJ sidecars,
        the INDEX alone (thousands of times smaller than the archives)
        is filtered to every 7th document, and ``read_warc_records``
        range-fetches exactly those gzip members — seek, read
        ``length`` bytes, gunzip, parse. Equality of urlkey / payload
        md5 / byte length with the oracle's closed-form recomputation
        proves offsets, member boundaries, SURT keys and payload bytes
        all at once."""
        import shutil
        import tempfile

        from memorious_spark.sources.warc import (
            read_cdx, read_warc_records, write_warc,
        )

        ship_package(spark)
        d = _docs(spark, sf_dir).select(
            F.concat(
                F.lit("http://docs.example.org/d/"), F.col("doc_id")
            ).alias("uri"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
        tmp = tempfile.mkdtemp(prefix="warc_cdx_")
        shutil.rmtree(tmp, ignore_errors=True)
        write_warc(
            d.repartition(8), tmp, compress=True, index=True
        ).collect()
        cdx = read_cdx(spark, f"{tmp}/*.cdx").withColumn(
            "doc_id", F.substring_index("url", "/", -1).cast("long")
        )
        picked = cdx.filter(F.col("doc_id") % 7 == 0)
        recs = read_warc_records(picked)
        return recs.select(
            F.substring_index("uri", "/", -1).cast("long").alias("doc_id"),
            F.md5("payload").alias("payload_md5"),
            F.length("payload").cast("long").alias("payload_len"),
        ).join(picked.select("doc_id", "urlkey"), "doc_id")

    # -- multimodal + archives ----------------------------------------------
    def media_features(spark, sf_dir):
        from memorious_spark.operators.multimodal import (
            attach_media_meta, extract_features,
        )

        ship_package(spark)
        docs = _docs(spark, sf_dir).select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
        feats = extract_features(attach_media_meta(docs))
        return feats.select(
            "media_id",
            "n_bytes",
            F.round(F.element_at("features", 1).cast("double"), 6).alias("feat0"),
            F.round(F.element_at("features", 2).cast("double"), 6).alias("feat1"),
        )

    def media_decode_wav(spark, sf_dir):
        """REAL audio decode: deterministic 16-bit PCM WAVs are
        synthesized per doc (stdlib ``wave`` writer — also a second
        witness for the RIFF parser), decoded by the pure-numpy
        ``decode_wav``, and reduced to signal stats the oracle
        recomputes from the closed-form sample formula."""
        from memorious_spark.operators.multimodal import (
            audio_features, extract_features,
        )

        ship_package(spark)
        ids = _docs(spark, sf_dir).select("doc_id")

        def synth(batches):
            import io
            import wave

            import numpy as np
            import pandas as pd

            for b in batches:
                payloads = []
                for did in b["doc_id"]:
                    n = 800 + (int(did) % 5) * 40
                    s = (
                        (int(did) * 31 + np.arange(n) * 7) % 2001 - 1000
                    ).astype("<i2")
                    bio = io.BytesIO()
                    w = wave.open(bio, "wb")
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(s.tobytes())
                    w.close()
                    payloads.append(bio.getvalue())
                yield pd.DataFrame(
                    {"doc_id": b["doc_id"], "payload": payloads}
                )

        media = ids.mapInPandas(synth, "doc_id long, payload binary")
        feats = extract_features(media, feature_fn=audio_features)
        return feats.select(
            "doc_id",
            F.round(F.element_at("features", 2), 6).alias("duration_s"),
            F.round(F.element_at("features", 3), 6).alias("rms_norm"),
            F.round(F.element_at("features", 4), 6).alias("zcr_rate"),
        )

    def meta_dates(spark, sf_dir):
        """The fuzzy parse_date/iso_date kernel (helpers/dates.py:6-31
        stand-in) over four wrapper styles websites use — runs the
        REAL Arrow-batched UDF the parse stage's meta_date path uses."""
        from memorious_spark.functions.dates import iso_date_udf

        ship_package(spark)
        docs = _docs(spark, sf_dir)
        day = (F.col("doc_id") % 28 + 1).cast("string")
        qty = (F.col("doc_id") % 7 + 1).cast("string")
        raw = (
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.lit("2024-01-"), F.lpad(day, 2, "0")))
            .when(F.col("doc_id") % 5 == 1,
                  F.concat(F.lit("[2023-06-"), F.lpad(day, 2, "0"), F.lit("]")))
            .when(F.col("doc_id") % 5 == 2,
                  F.concat(F.lit("Published on March "), day,
                           F.lit(", 2021 by staff")))
            .when(F.col("doc_id") % 5 == 3,
                  # de/fr/es month-name shapes (round-3 dateparser-
                  # locale breadth), rotating by doc_id
                  F.when(F.col("doc_id") % 3 == 0,
                         F.concat(day, F.lit(". Januar 2024")))
                  .when(F.col("doc_id") % 3 == 1,
                        F.concat(F.lit("le "), day, F.lit(" janvier 2024")))
                  .otherwise(F.concat(day, F.lit(" de enero de 2024"))))
            .when(F.col("doc_id") % 10 == 4,
                  # relative shapes (round-4 dateparser breadth) —
                  # resolved against the INJECTED base below, rotating
                  # language by doc_id
                  F.when(F.col("doc_id") % 4 == 0,
                         F.concat(qty, F.lit(" days ago")))
                  .when(F.col("doc_id") % 4 == 1,
                        F.concat(F.lit("vor "), qty, F.lit(" Tagen")))
                  .when(F.col("doc_id") % 4 == 2,
                        F.concat(F.lit("il y a "), qty, F.lit(" jours")))
                  .otherwise(F.concat(F.lit("hace "), qty, F.lit(" días"))))
            .otherwise(F.lit("no date here"))
        )
        iso = iso_date_udf(now="2024-03-15T12:00:00")
        return docs.select(
            "doc_id", raw.alias("raw"), iso(raw).alias("iso")
        )

    def media_decode_bmp(spark, sf_dir):
        """REAL image decode: synthesize a solid-color 24-bit BMP per
        doc, decode it with the pure-python BMP parser, and return
        pixel statistics — exact SQL oracle because the color is
        arithmetic in doc_id."""
        import struct

        import pandas as pd

        from memorious_spark.operators.multimodal import extract_features

        ship_package(spark)
        W, H = 4, 2

        def make_bmps(batches):
            row_size = ((24 * W + 31) // 32) * 4
            for pdf in batches:
                payloads = []
                for d in pdf["doc_id"]:
                    r, g, b = int(d) % 256, (int(d) * 7) % 256, (int(d) * 13) % 256
                    px = bytes([b, g, r]) * W + b"\x00" * (row_size - 3 * W)
                    data = px * H
                    header = b"BM" + struct.pack(
                        "<IHHI", 54 + len(data), 0, 0, 54
                    ) + struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0,
                                    len(data), 2835, 2835, 0, 0)
                    payloads.append(header + data)
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        docs = _docs(spark, sf_dir).select("doc_id")
        bmps = docs.mapInPandas(make_bmps, "doc_id long, payload binary")
        feats = extract_features(bmps)
        f = lambda i: F.round(F.element_at("features", i).cast("double"), 6)
        return feats.select(
            "doc_id",
            f(1).alias("w_n"), f(2).alias("h_n"),
            f(3).alias("mean_r"), f(4).alias("mean_g"), f(5).alias("mean_b"),
            f(8).alias("decoded"),
        )

    def extract_archive(spark, sf_dir):
        import io
        import zipfile

        import pandas as pd

        from memorious_spark.operators.extract import extract_stage

        ship_package(spark)
        docs = _docs(spark, sf_dir).select("doc_id", "text")

        def make_zip(batches):
            for pdf in batches:
                payloads = []
                for r in pdf.itertuples():
                    buf = io.BytesIO()
                    with zipfile.ZipFile(buf, "w") as zf:
                        info = zipfile.ZipInfo(
                            f"doc_{r.doc_id}.txt", date_time=(1980, 1, 1, 0, 0, 0)
                        )
                        zf.writestr(info, r.text or "")
                    payloads.append(buf.getvalue())
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        zips = docs.mapInPandas(make_zip, "doc_id long, payload binary")
        members = extract_stage(zips, "payload")
        return members.select("doc_id", "file_name", "n_bytes")

    # -- quality filtering (Gopher / C4 — the published curation rules) --
    def gopher_quality(spark, sf_dir):
        """Gopher word-rule metrics + the full keep conjunction (Rae
        et al. 2021 §A1.1) — all pure-Column, one corpus scan."""
        from memorious_spark.functions import quality as Q

        docs = _docs(spark, sf_dir)
        wm = Q.word_metrics(F.col("text"))
        return docs.select(
            "doc_id",
            *[v.alias(k) for k, v in wm.items()],
            Q.gopher_keep(F.col("text"), min_words=10).alias("keep"),
        )

    def c4_line_filter(spark, sf_dir):
        """C4 line cleaning (Raffel et al. 2020 §2.2) over a
        deterministic multi-line synthesis (the corpus text is
        single-line): unpunctuated header and short/banned lines must
        drop, the punctuated body line survives; Gopher line metrics
        ride the same pass."""
        from memorious_spark.functions import quality as Q

        docs = _docs(spark, sf_dir)
        mtext = F.concat_ws(
            "\n",
            F.lit("All about the corpus"),
            F.concat(F.col("text"), F.lit(".")),
            F.substring(F.col("text"), 1, 20),
            F.lit("Click here to enable javascript."),
            F.lit("Too short."),
        )
        lm = Q.line_metrics(mtext)
        return docs.select(
            "doc_id",
            Q.c4_clean_lines(mtext).alias("cleaned"),
            *[v.alias(k) for k, v in lm.items()],
        )

    def ngram_repetition(spark, sf_dir):
        """Gopher's top-2-gram repetition fraction; the one quality
        metric needing a groupBy — keyed (doc, gram), map-side
        combined."""
        from memorious_spark.functions.quality import top_ngram_char_frac

        return top_ngram_char_frac(_docs(spark, sf_dir), n=2)

    def semantic_dedup_op(spark, sf_dir):
        """SemDeDup (Abbas et al. 2023): IVF-cell partition of the
        embedding space, within-cell cosine dominance — drop a vector
        when a cell-mate FARTHER from the centroid (the paper's
        keep-the-outlier rule) is ≥ threshold similar. Sub-quadratic:
        the O(m²) pair scan runs per cell, never across the corpus."""
        return dedup.semantic_dedup(
            _emb(spark, sf_dir), threshold=SEMDEDUP_THR,
            n_centroids=IVF_K, spacing=IVF_SPACING,
        )

    def hash_split_op(spark, sf_dir):
        """Deterministic train/val/test split: md5(doc_id) against
        fixed hex boundaries — reproducible across engines, stable
        under corpus growth (no randomSplit reshuffling), leakage-free
        by construction. Pure projection, no shuffle."""
        from memorious_spark.operators.sampling import hash_split

        return hash_split(
            _docs(spark, sf_dir).select("doc_id"), SPLIT_WEIGHTS
        )

    def dsir_weights(spark, sf_dir):
        """DSIR importance weights (Xie et al. 2023): hashed
        unigram+bigram log-likelihood ratio of every document against
        a target sample (every 20th doc), md5-bucketed so both
        engines hash identically, per-feature log-ratios quantized to
        DECIMAL(18,6) so the per-doc sum is aggregation-order-exact."""
        from memorious_spark.operators.selection import importance_weights

        docs = _docs(spark, sf_dir)
        return importance_weights(
            docs, docs.filter("doc_id % 20 = 0"), n_buckets=DSIR_BUCKETS
        )

    def span_dup_frac(spark, sf_dir):
        """Exact-substring dedup signal (Lee et al. 2021): per doc,
        the multiplicity-weighted fraction of its k-token windows
        occurring verbatim in ≥1 other document — catches assembled/
        mirrored text that whole-doc MinHash misses."""
        return dedup.duplicate_span_fraction(_docs(spark, sf_dir), k=SPAN_K)

    def paragraph_dedup_op(spark, sf_dir):
        """CCNet paragraph dedup (Wenzek et al. 2020): one corpus-wide
        copy per normalized paragraph, first (doc, idx) occurrence
        wins. The flat synthetic docs carry no newlines, so paragraphs
        are synthesized deterministically (same construction in the
        oracle): head-60-chars ⏎ a shared-by-residue paragraph ⏎ the
        tail — the shared paragraph must survive only in its first
        host document."""
        d = _docs(spark, sf_dir).select(
            "doc_id",
            F.concat(
                F.substring("text", 1, 60),
                F.lit("\n"),
                F.lit("shared para "),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("\n"),
                F.expr("substring(text, 61)"),
            ).alias("text"),
        )
        return dedup.paragraph_dedup(d)

    def span_dedup_rewrite(spark, sf_dir):
        """Exact-substring span REMOVAL (Lee et al. 2021): every
        duplicated k-token window keeps its corpus-first copy, covered
        tokens are cut everywhere else, documents come back rewritten
        (never dropped) with removal counts."""
        return dedup.remove_duplicate_spans(_docs(spark, sf_dir), k=SPAN_K)

    def url_traps(spark, sf_dir):
        """Crawler-trap decide rules (Heritrix pathological-path /
        too-many-segments / query-blowup / length): URLs synthesized
        by doc_id residue (clean, segment-run, deep-path, query-bomb,
        over-long — same construction in the oracle), scored by the
        pure-Column trap signals that gate the frontier under
        `fetch.params.traps: true`."""
        from memorious_spark.functions.urls import is_trap_col, trap_signals

        m = F.col("doc_id") % 5
        did = F.col("doc_id").cast("string")
        base = F.concat(
            F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com"),
        )
        url = (
            F.when(m == 0, F.concat(base, F.lit("/doc/"), did))
            .when(m == 1, F.concat(base, F.lit("/cal/cal/cal/"), did))
            .when(m == 2, F.concat(
                base, F.lit("/"), F.expr("repeat('d/', 21)"), did))
            .when(m == 3, F.concat(
                base, F.lit("/p?"),
                F.expr("repeat('k=v&', 16)"), F.lit("k=v")))
            .otherwise(F.concat(
                base, F.lit("/"), F.expr("repeat('x', 2050)")))
        )
        d = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
        s = trap_signals(F.col("url"))
        return d.select(
            "doc_id",
            s["n_segments"].alias("n_segments"),
            s["max_seg_run"].alias("max_seg_run"),
            s["n_qparams"].alias("n_qparams"),
            s["url_len"].alias("url_len"),
            is_trap_col(F.col("url")).alias("is_trap"),
        )

    def sitemap_locs(spark, sf_dir):
        """Sitemap ingestion (sitemaps.org): a namespaced urlset XML is
        synthesized per document, routed through the REAL stdlib XML
        parse (htmlkit.parse_sitemap, Arrow-batched), locs exploded in
        document order. The oracle recomputes the locs closed-form —
        the media_decode_wav pattern: engine runs the decoder, oracle
        knows the generator."""
        import pandas as pd

        from memorious_spark.functions.htmlkit import parse_sitemap
        from memorious_spark.session import ship_package

        ship_package(spark)
        did = F.col("doc_id").cast("string")
        host = F.concat(
            F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com"),
        )
        n_locs = (F.col("doc_id") % 3 + 1).cast("int")
        xml = F.concat(
            F.lit('<?xml version="1.0"?><urlset xmlns='
                  '"http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.aggregate(
                F.sequence(F.lit(0), n_locs - 1),
                F.lit(""),
                lambda acc, i: F.concat(
                    acc, F.lit("<url><loc> "), host, F.lit("/p/"), did,
                    F.lit("/"), i.cast("string"), F.lit(" </loc></url>"),
                ),
            ),
            F.lit("</urlset>"),
        )
        d = _docs(spark, sf_dir).select("doc_id", xml.alias("xml"))

        def gen(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "locs": pdf["xml"].map(parse_sitemap),
                    }
                )

        return (
            d.mapInPandas(gen, "doc_id long, locs array<string>")
            .select(
                "doc_id",
                F.posexplode("locs").alias("loc_idx", "loc"),
            )
            .select("doc_id", F.col("loc_idx").cast("int"), "loc")
        )

    def recrawl_schedule(spark, sf_dir):
        """Freshness scheduling (Cho & Garcia-Molina 2003): the events
        stream becomes a fetch history (url per user, content hash
        flips with event_type), folded into per-URL change counts and
        the bias-reduced Poisson rate; priority = rate x staleness at
        the pinned clock. One map-side-combined groupBy, no window."""
        from memorious_spark.operators.recrawl import recrawl_priority

        ev = _events(spark, sf_dir).select(
            F.concat(
                F.lit("https://h"), (F.col("user_id") % 7).cast("string"),
                F.lit(".example.com/doc/"), F.col("user_id").cast("string"),
            ).alias("url"),
            F.col("ts").alias("fetch_ts"),
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("/"),
                           F.col("event_type"))).alias("content_hash"),
        )
        return recrawl_priority(ev, now_ts="2026-06-01 00:00:00")

    def clean_html_op(spark, sf_dir):
        """Rows-only check: clean_html over corpus pages, new hash."""
        from memorious_spark.operators.parse import clean_html_udf

        ship_package(spark)
        corpus, _ = _corpus(spark, sf_dir)
        pages = corpus.filter(
            F.col("status_code") == 200
        ).filter(F.col("content_type").startswith("text/html"))
        cleaner = clean_html_udf([".//img", ".//iframe"])
        return pages.select(
            "url",
            F.sha1(F.encode(cleaner(F.col("html"), F.col("content_type")), "utf-8"))
            .alias("clean_hash"),
        )

    def link_pagerank(spark, sf_dir):
        """Frontier priority from link authority: fixed-point-integer
        PageRank (5 rounds, d = 17/20) over the corpus anchor graph
        (html page d → (7d+s) % n for the LINK_STRIDES) — bit-exact
        across engines because the whole iteration is integer
        arithmetic (see operators/linkrank.py)."""
        from memorious_spark.operators.linkrank import pagerank

        docs = _docs(spark, sf_dir)
        n = docs.count()
        srcs = docs.filter(
            "doc_id % 23 != 0 and doc_id % 19 != 0 and doc_id % 17 != 0"
        )
        edges = srcs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        (F.col("doc_id") * 7 + F.lit(s)) % n
                        for s in PR_STRIDES
                    ]
                )
            ).alias("dst"),
        )
        return pagerank(edges, n_iter=PR_ITERS)

    def lm_perplexity(spark, sf_dir):
        """CCNet-style fluency gate (Wenzek et al. 2020): add-one
        bigram LM trained on the every-10th-doc reference slice,
        every document scored by mean bigram log-prob (decimal-
        quantized per bigram — the DSIR order-exactness contract)."""
        from memorious_spark.operators.selection import lm_bigram_scores

        docs = _docs(spark, sf_dir)
        return lm_bigram_scores(docs, docs.filter("doc_id % 10 = 0"))

    # ---- DRIVER-WINDOW ORDER (VERDICT r4 #2) -------------------------
    # The driver's correctness gate checks the FIRST 50 entries only.
    # Rotation policy (recorded in ROUND_NOTES): positions 1-50 hold
    # (a) every operator that is new or changed this round, (b) every
    # query that has never had a driver row (the r4 sweep-only set),
    # and (c) every SURVEY §2-mapped query; multi-round driver-green
    # LLM-pipeline veterans park past the window (each still verified
    # every round by tools/oracle_check.py's full sweep).
    return {
        # new/changed this round, least proven first
        "token_shards": token_shards,          # r4's one red row — fixed
        "dedup_sharded": dedup_sharded,        # new r5 operator
        "corpus_dedup": corpus_dedup_op,       # exact stage reshaped r5
        "corpus_curate": corpus_curate_op,     # rides corpus_dedup
        "domain_kernel": domain_kernel,        # full-PSL semantics r5
        "meta_dates": meta_dates,              # locale breadth r5
        "db_nested_upsert": db_nested_upsert,  # catalog seam routing r5
        "merge_first_last_seen": merge_first_last_seen,
        # never driver-checked before (r4 sweep-only set)
        "span_dup_frac": span_dup_frac,
        "paragraph_dedup": paragraph_dedup_op,
        "span_dedup_rewrite": span_dedup_rewrite,
        "url_traps": url_traps,
        "sitemap_locs": sitemap_locs,
        "recrawl_schedule": recrawl_schedule,
        "warc_roundtrip": warc_roundtrip,
        "warc_cdx_fetch": warc_cdx_fetch,
        "media_decode_wav": media_decode_wav,
        "doc_fingerprint": doc_fingerprint,
        "media_features": media_features,
        "media_decode_bmp": media_decode_bmp,
        "extract_archive": extract_archive,
        "gopher_quality": gopher_quality,
        "c4_line_filter": c4_line_filter,
        "ngram_repetition": ngram_repetition,
        "link_pagerank": link_pagerank,
        "lm_perplexity": lm_perplexity,
        "clean_html_op": clean_html_op,        # rows-only by design
        # new r5 operators
        "temperature_mix_lang": temperature_mix_lang,
        "dedup_sharded_cuckoo": dedup_sharded_cuckoo,
        # SURVEY §2-mapped crawl surface
        "crawl_bfs_seen": crawl_bfs_seen,
        "crawl_min_depth": crawl_min_depth,
        "politeness_budget": politeness_budget,
        "robots_politeness": robots_politeness,
        "dedup_anti_join": dedup_anti_join,
        "dedup_cuckoo": dedup_cuckoo,
        "incremental_skip": incremental_skip,
        "http_cache_replay": http_cache_replay,
        "incremental_second_run": incremental_second_run,
        "tags_kv": tags_kv,
        "seed_gen": seed_gen,
        "enumerate_gen": enumerate_gen,
        "sequence_gen": sequence_gen,
        "dates_gen": dates_gen,
        "init_frontier_dates": init_frontier_dates,
        "url_kernel": url_kernel,
        "url_canon": url_canon,
        "make_id": make_id,
        "rule_filter": rule_filter,
        "metrics_rollup": metrics_rollup,
        "check_validators": check_validators,
        # ---- position 50 ends the driver window ----------------------
        # veterans parked past the window (every one verified each
        # round by the full oracle sweep). ann_ivfpq_knn/semantic_dedup/
        # ann_pq_knn/text_normalize are single-round r4-green but
        # unchanged since; the r5-new operators displaced them — the
        # window is 50 and never-checked beats checked-once.
        "ann_ivfpq_knn": ann_ivfpq_knn,
        "semantic_dedup": semantic_dedup_op,
        "exact_dedup": exact_dedup,
        "minhash_lsh_dedup": minhash_lsh_dedup,
        "ngram_jaccard_dedup": ngram_jaccard_dedup,
        "simhash_dedup": simhash_dedup,
        "embedding_dup_pairs": embedding_dup_pairs,
        "embedding_dup_pairs_lsh": embedding_dup_pairs_lsh,
        "embedding_knn": embedding_knn,
        "ann_lsh_knn": ann_lsh_knn,
        "ann_ivf_knn": ann_ivf_knn,
        "ann_pq_knn": ann_pq_knn,
        "dedup_components": dedup_components_op,
        "lang_id": lang_id,
        "text_normalize": text_normalize,
        "text_quality": text_quality,
        "token_stats": token_stats,
        "strip_boilerplate": strip_boilerplate,
        "pii_scrub": pii_scrub_op,
        "decontaminate": decontaminate,
        "quota_sample_lang": quota_sample_lang,
        "hash_split": hash_split_op,
        "dsir_weights": dsir_weights,
    }


def oracle_sql() -> dict[str, str]:
    from memorious_spark.functions.privacy import EMAIL_RE, IPV4_RE, PHONE_RE

    r = N_PERM // N_BANDS
    band_joins = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a "
        f"JOIN bands b ON a.b{b} = b.b{b} AND a.doc_id < b.doc_id"
        for b in range(N_BANDS)
    )
    plane_arrays = [
        "[" + ", ".join(str(s) for s in _plane_signs(p)) + "]"
        for p in range(KNN_PLANES)
    ]
    bucket_bits = " + ".join(
        f"(CASE WHEN {_F64_DOT.format(a='e.embedding', b=plane_arrays[p], dim=EMB_DIM)} > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(KNN_PLANES)
    )
    q_bucket_bits = " + ".join(
        f"(CASE WHEN {_F64_DOT.format(a='q.qv', b=plane_arrays[p], dim=EMB_DIM)} > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(KNN_PLANES)
    )

    return {
        "crawl_bfs_seen": f"""
            {_REACH_CTE},
            seen_urls AS (
              SELECT {_DOC_URL.format(x='u.t')} AS url
              FROM resolved rc, LATERAL ({_TARGETS}) u
              UNION
              SELECT {_CSS_URL.format(x='rc.c')}
              FROM resolved rc
              WHERE {_HTML_COND} AND rc.c % 4 = 0
              UNION
              -- fetch tags the redirect SOURCE url post-gates
              -- (memorious/operations/fetch.py:30-33): only when the
              -- resolved target is ok (not the %23 404s)
              SELECT {_DOC_URL.format(x='rc.d')}
              FROM resolved rc
              WHERE rc.d % 23 <> 0 AND rc.d % 19 = 0 AND rc.c % 23 <> 0
            )
            SELECT DISTINCT url FROM seen_urls
        """,
        # no-redirect corpus: kind = gone(%23) / pdf(%17) / html
        "crawl_min_depth": f"""
            WITH RECURSIVE reach(d, depth) AS (
              SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0), (1, 0), (2, 0)) v(d, depth)
              UNION
              SELECT u.t, rc.depth + 1
              FROM (
                SELECT f.d AS c, f.depth AS depth,
                       (SELECT count(*) FROM documents) AS n
                FROM reach f
                WHERE f.d % 23 <> 0 AND f.d % 17 <> 0
              ) rc,
              LATERAL (
                SELECT unnest(list_concat(
                  [(7*rc.c+1) % rc.n, (7*rc.c+12) % rc.n, (7*rc.c+23) % rc.n,
                   (7*rc.c+34) % rc.n],
                  CASE WHEN rc.c % 2 = 0 THEN [(7*rc.c+45) % rc.n] ELSE [] END)) AS t
              ) u
              WHERE rc.depth < 35
            ),
            doc_depth AS (
              SELECT {_DOC_URL.format(x='d')} AS url, min(depth) AS min_depth
              FROM reach GROUP BY d
            ),
            css_depth AS (
              SELECT {_CSS_URL.format(x='d')} AS url, min(depth) + 1 AS min_depth
              FROM reach
              WHERE d % 23 <> 0 AND d % 17 <> 0 AND d % 4 = 0
              GROUP BY d % 7
            )
            SELECT url, CAST(min(min_depth) AS INT) AS min_depth
            FROM (SELECT * FROM doc_depth UNION ALL SELECT * FROM css_depth)
            GROUP BY url
        """,
        "politeness_budget": """
            SELECT event_id, CAST(user_id AS VARCHAR) AS host
            FROM (
              SELECT event_id, user_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id) rn
              FROM events
            ) WHERE rn <= 5
        """,
        "robots_politeness": """
            WITH f AS (
              SELECT event_id,
                     'h' || (user_id % 7) || '.example.com' AS host,
                     user_id % 7 AS h,
                     'https://h' || (user_id % 7) || '.example.com' ||
                       (CASE WHEN event_id % 13 = 0 THEN '/doc/priv/'
                             ELSE '/doc/' END) || event_id AS url
              FROM events
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY host ORDER BY event_id) AS rn
              FROM f WHERE event_id % 13 <> 0
            )
            SELECT event_id, host, url FROM ranked
            WHERE rn <= CAST(floor(60.0 / (10 + h)) AS INT)
        """,
        "dedup_anti_join": """
            SELECT doc_id,
                   'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id AS url
            FROM documents WHERE doc_id % 3 <> 0
        """,
        "dedup_cuckoo": """
            SELECT doc_id,
                   'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id AS url
            FROM documents WHERE doc_id % 3 <> 0 OR doc_id % 6 = 0
        """,
        "dedup_sharded": """
            SELECT doc_id,
                   'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id AS url
            FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0
        """,
        "dedup_sharded_cuckoo": """
            SELECT doc_id,
                   'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id AS url
            FROM documents WHERE doc_id % 3 <> 0 OR doc_id % 6 = 0
        """,
        "incremental_skip": """
            SELECT e.event_id, e.user_id
            FROM events e
            WHERE e.event_type = 'click'
              AND NOT EXISTS (
                SELECT 1 FROM events s
                WHERE s.event_type = 'signup' AND s.user_id = e.user_id
                  AND s.ts + INTERVAL 2 DAY > TIMESTAMP '2024-01-15 00:00:00'
              )
        """,
        "http_cache_replay": """
            WITH n_ AS (SELECT count(*) AS n FROM documents),
            d AS (
              SELECT doc_id,
                     'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id AS url,
                     TIMESTAMP '2024-01-01 00:00:00'
                       + doc_id * INTERVAL 1 SECOND
                       + (CASE WHEN doc_id % 5 = 0 THEN INTERVAL 1 DAY
                               ELSE INTERVAL 0 DAY END) AS warc2
              FROM documents
            )
            SELECT s.url AS url,
                   (s.doc_id % 23 <> 0 AND s.doc_id % 19 <> 0
                    AND s.doc_id % 5 <> 0) AS replayed,
                   CASE WHEN s.doc_id % 23 <> 0 AND s.doc_id % 19 <> 0
                             AND s.doc_id % 5 <> 0
                        THEN 'h-' || s.doc_id END AS hash_src,
                   CAST(epoch(
                     CASE WHEN s.doc_id % 23 <> 0 AND s.doc_id % 19 <> 0
                               AND s.doc_id % 5 <> 0
                          THEN TIMESTAMP '2024-01-05 00:00:00'
                          WHEN s.doc_id % 23 <> 0 AND s.doc_id % 19 = 0
                          THEN t.warc2
                          ELSE s.warc2 END) AS BIGINT) AS retrieved_s
            FROM d s
            CROSS JOIN n_
            LEFT JOIN d t ON t.doc_id = (s.doc_id + 1) % n_.n
        """,
        "incremental_second_run": """
            SELECT doc_id,
                   'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id AS url,
                   'c-' || doc_id || '-' ||
                     (CASE WHEN doc_id % 7 = 3 THEN 'v2' ELSE 'v1' END) AS content_hash
            FROM documents
            WHERE doc_id % 7 = 3 OR doc_id % 11 = 5 OR doc_id % 13 = 0
        """,
        "tags_kv": """
            SELECT doc_id, 'u' || doc_id AS key,
                   (doc_id % 2 = 0 OR doc_id % 3 = 0) AS tagged,
                   CASE WHEN doc_id % 3 = 0 THEN 'v2-' || doc_id
                        WHEN doc_id % 2 = 0 THEN 'v1-' || doc_id
                        END AS tag_value
            FROM documents
        """,
        "db_nested_upsert": """
            SELECT 'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id AS url,
                   doc_id,
                   n_chars + 1 AS n_chars,
                   CASE WHEN doc_id % 2 = 0 THEN '2024-01-02'
                        ELSE '2024-01-05' END AS first_seen,
                   '2024-01-05' AS last_seen,
                   (CASE WHEN source = lang THEN 1 ELSE 2 END) AS n_tags,
                   CASE WHEN source < lang THEN source || '|' || lang
                        WHEN source = lang THEN source
                        ELSE lang || '|' || source END AS tags
            FROM documents
        """,
        "merge_first_last_seen": """
            WITH pre AS (
              SELECT user_id, count(*) AS n FROM events
              WHERE ts < TIMESTAMP '2024-01-08 00:00:00' GROUP BY user_id
            ),
            post AS (
              SELECT user_id, count(*) AS n FROM events
              WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' GROUP BY user_id
            )
            SELECT coalesce(pre.user_id, post.user_id) AS user_id,
                   coalesce(post.n, pre.n) AS n_events,
                   CASE WHEN pre.user_id IS NULL
                        THEN TIMESTAMP '2024-02-01 00:00:00'
                        ELSE TIMESTAMP '2024-01-05 00:00:00' END AS __first_seen,
                   CASE WHEN post.user_id IS NULL
                        THEN TIMESTAMP '2024-01-05 00:00:00'
                        ELSE TIMESTAMP '2024-02-01 00:00:00' END AS __last_seen
            FROM pre FULL OUTER JOIN post ON pre.user_id = post.user_id
        """,
        "seed_gen": """
            SELECT * FROM (VALUES
              ('https://h0.example.com/doc/7', CAST(0 AS BIGINT)),
              ('https://h1.example.com/', 1)) t(url, seq)
        """,
        "enumerate_gen": """
            SELECT * FROM (VALUES
              ('alpha', CAST(0 AS BIGINT)), ('beta', 1), ('gamma', 2)) t(item, seq)
        """,
        "sequence_gen": "SELECT i AS number FROM range(10, 5000, 7) t(i)",
        "dates_gen": """
            SELECT d AS date, strftime(d, '%Y-%m-%d') AS date_iso
            FROM (SELECT unnest(generate_series(
              TIMESTAMP '2024-01-31', TIMESTAMP '2024-01-01',
              INTERVAL '-3' DAY)) AS d)
        """,
        "init_frontier_dates": """
            WITH g AS (
              SELECT CAST(d AS DATE) AS d,
                     CAST(date_diff('day', CAST(d AS DATE), DATE '2024-03-01') / 2
                          AS BIGINT) AS i
              FROM (SELECT unnest(generate_series(
                TIMESTAMP '2024-03-01', TIMESTAMP '2024-01-01',
                INTERVAL '-2' DAY)) AS d)
            )
            SELECT 'https://archive.example.com/' || strftime(d, '%Y-%m-%d')
                     AS url,
                   i * 2 + 0 AS emit_seq
            FROM g
            UNION ALL
            SELECT 'https://mirror.example.com/'
                     || strftime(d, '%Y-%m-%dT%H:%M:%S') AS url,
                   i * 2 + 1 AS emit_seq
            FROM g
        """,
        "url_kernel": """
            SELECT doc_id,
                   'https://h' || (doc_id % 7) || '.example.com/doc/' || doc_id
                     || '?q=' || (doc_id % 3) AS url_norm,
                   'h' || (doc_id % 7) || '.example.com' AS host
            FROM documents
        """,
        # registrable domain recomputed closed-form from the generated
        # (sub, name, suffix) layout — the suffix list is two-level for
        # co.uk/com.au/gov.uk and one-level for com/org
        "domain_kernel": """
            WITH h AS (
              SELECT doc_id,
                     (['a.b.', 'www.', ''])[(doc_id % 3) + 1] AS sub,
                     'site' || (doc_id % 50) AS name,
                     (['com', 'co.uk', 'com.au', 'org', 'gov.uk'])
                       [(doc_id % 5) + 1] AS suffix
              FROM documents
            )
            SELECT doc_id,
                   sub || name || '.' || suffix AS host,
                   name || '.' || suffix AS domain
            FROM h
        """,
        # canonical string rebuilt per query shape: params sorted,
        # tracking params stripped, all-tracking query dropped
        "url_canon": """
            SELECT doc_id,
                   'https://h' || (doc_id % 7) || '.example.com/p/'
                     || doc_id
                     || CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2'
                             WHEN doc_id % 3 = 1 THEN ''
                             ELSE '?z=9' END AS url_canon
            FROM documents
        """,
        "make_id": """
            SELECT n_nationkey, 'crawler:' || n_name AS key,
                   40 AS id_len FROM nation
        """,
        "rule_filter": """
            SELECT doc_id,
                   'https://' || source || '.example.com/doc/' || doc_id AS url,
                   CASE WHEN lang = 'en' THEN 'text/html'
                        WHEN lang = 'es' THEN 'application/pdf'
                        ELSE 'image/png' END AS content_type
            FROM documents
            WHERE (CASE WHEN lang = 'en' THEN 'text/html'
                        WHEN lang = 'es' THEN 'application/pdf'
                        ELSE 'image/png' END) NOT LIKE 'image/%'
              AND (lang = 'en'
                   OR regexp_matches(
                        'https://' || source || '.example.com/doc/' || doc_id,
                        '^(?:https://src[0-2]\\.)'))
        """,
        "metrics_rollup": """
            SELECT event_type, count(*) AS n_ops,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY event_type
        """,
        "check_validators": """
            SELECT doc_id,
                   (text IS NOT NULL AND length(trim(text)) > 0) AS nonempty,
                   regexp_matches(CAST(n_chars AS VARCHAR), '^-?[0-9]+$') AS int_ok,
                   regexp_matches(lang, '^[a-z]{2}$') AS lang_ok,
                   (length(lang) = 2) AS len_ok,
                   contains(source, 'src') AS src_ok
            FROM documents
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
                   count(*) AS dup_count
            FROM documents GROUP BY 2
        """,
        "minhash_lsh_dedup": f"""
            WITH {_SHINGLES_CTE},
            mins AS ({_minhash_sql_mins()}),
            bands AS ({_minhash_sql_bands()})
            SELECT DISTINCT id_a, id_b FROM ({band_joins})
        """,
        "ngram_jaccard_dedup": f"""
            WITH {_SHINGLES_CTE},
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            shared AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(shared / (na.n + nb.n - shared), 6) AS jaccard
            FROM shared
            JOIN sizes na ON na.doc_id = id_a
            JOIN sizes nb ON nb.doc_id = id_b
            WHERE round(shared / (na.n + nb.n - shared), 6) >= 0.8
        """,
        "embedding_dup_pairs": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round({_cosine_sql('a.embedding', 'b.embedding')}, 6) >= 0.35
        """,
        "simhash_dedup": _simhash_sql(),
        "embedding_dup_pairs_lsh": _emb_lsh_pairs_sql(),
        "embedding_knn": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round({_cosine_sql('e.embedding', 'q.qv')}, 6) AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "ann_lsh_knn": f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            qb AS (SELECT ({q_bucket_bits}) AS qbucket FROM q),
            b AS (
              SELECT e.vec_id, e.embedding, ({bucket_bits}) AS bucket
              FROM embeddings e
            )
            SELECT b.vec_id,
                   round({_cosine_sql('b.embedding', 'q.qv')}, 6) AS cosine
            FROM b, q, qb
            WHERE xor(b.bucket::BIGINT, qb.qbucket::BIGINT)
                  IN ({", ".join(["0"] + [str(1 << p) for p in range(KNN_PLANES)])})
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "ann_ivf_knn": f"""
            WITH cent AS (
              SELECT CAST(vec_id / {IVF_SPACING} AS INT) AS cid,
                     embedding AS cv
              FROM embeddings
              WHERE vec_id % {IVF_SPACING} = 0
                AND vec_id < {IVF_K * IVF_SPACING}
            ),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            qd AS (
              SELECT c.cid,
                     {_F64_DIST2.format(a='q.qv', b='c.cv', dim=EMB_DIM)} AS d
              FROM cent c, q
            ),
            probes AS (SELECT cid FROM qd ORDER BY d, cid LIMIT {IVF_NPROBE}),
            assign AS (
              SELECT e.vec_id, e.embedding, c.cid,
                     ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_F64_DIST2.format(a='e.embedding', b='c.cv', dim=EMB_DIM)}, c.cid
                     ) AS rn
              FROM embeddings e CROSS JOIN cent c
            )
            SELECT b.vec_id,
                   round({_cosine_sql('b.embedding', 'q.qv')}, 6) AS cosine
            FROM assign b, q
            WHERE b.rn = 1 AND b.cid IN (SELECT cid FROM probes)
            ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        # PQ-ADC: codebooks rebuilt closed-form from the strided seed
        # rows, per-subspace argmin encode (rn=1), LUT-summed approx
        # distance rounded to 6 dp (the engine rounds identically
        # before ranking), k·refine candidate cut, exact cosine re-rank
        "ann_pq_knn": f"""
            WITH cb AS (
              SELECT CAST(vec_id / {PQ_SPACING} AS INT) AS code,
                     embedding AS cv
              FROM embeddings
              WHERE vec_id % {PQ_SPACING} = 0
                AND vec_id < {PQ_NC * PQ_SPACING}
            ),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            sub AS (
              SELECT j FROM unnest(generate_series(0, {PQ_M - 1})) t(j)
            ),
            enc AS (
              SELECT e.vec_id, s.j, c.code,
                     ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id, s.j
                       ORDER BY
                         (SELECT sum(
                            (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE)
                          * (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE))
                          FROM unnest(generate_series(
                            s.j*{EMB_DIM // PQ_M}+1,
                            s.j*{EMB_DIM // PQ_M}+{EMB_DIM // PQ_M})) t(i)),
                         c.code
                     ) AS rn
              FROM embeddings e CROSS JOIN sub s CROSS JOIN cb c
            ),
            lut AS (
              SELECT s.j, c.code,
                     (SELECT sum(
                        (q.qv[i]::DOUBLE - c.cv[i]::DOUBLE)
                      * (q.qv[i]::DOUBLE - c.cv[i]::DOUBLE))
                      FROM unnest(generate_series(
                        s.j*{EMB_DIM // PQ_M}+1,
                        s.j*{EMB_DIM // PQ_M}+{EMB_DIM // PQ_M})) t(i)) AS d
              FROM sub s CROSS JOIN cb c, q
            ),
            approx AS (
              SELECT e.vec_id, round(sum(l.d), 6) AS ad
              FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
              WHERE e.rn = 1 GROUP BY e.vec_id
            ),
            cand AS (
              SELECT vec_id FROM approx ORDER BY ad, vec_id LIMIT 40
            )
            SELECT b.vec_id,
                   round({_cosine_sql('b.embedding', 'q.qv')}, 6) AS cosine
            FROM embeddings b JOIN cand USING (vec_id), q
            ORDER BY cosine DESC, b.vec_id LIMIT 10
        """,
        # IVF+PQ composed: the IVF oracle's probe/assign CTEs restrict
        # the PQ oracle's ADC to the probed cells' vectors
        "ann_ivfpq_knn": f"""
            WITH cent AS (
              SELECT CAST(vec_id / {IVF_SPACING} AS INT) AS cid,
                     embedding AS cv
              FROM embeddings
              WHERE vec_id % {IVF_SPACING} = 0
                AND vec_id < {IVF_K * IVF_SPACING}
            ),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            qd AS (
              SELECT c.cid,
                     {_F64_DIST2.format(a='q.qv', b='c.cv', dim=EMB_DIM)} AS d
              FROM cent c, q
            ),
            probes AS (SELECT cid FROM qd ORDER BY d, cid LIMIT {IVF_NPROBE}),
            assign AS (
              SELECT e.vec_id, c.cid,
                     ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_F64_DIST2.format(a='e.embedding', b='c.cv', dim=EMB_DIM)}, c.cid
                     ) AS rn
              FROM embeddings e CROSS JOIN cent c
            ),
            cells AS (
              SELECT vec_id FROM assign
              WHERE rn = 1 AND cid IN (SELECT cid FROM probes)
            ),
            cb AS (
              SELECT CAST(vec_id / {PQ_SPACING} AS INT) AS code,
                     embedding AS cv
              FROM embeddings
              WHERE vec_id % {PQ_SPACING} = 0
                AND vec_id < {PQ_NC * PQ_SPACING}
            ),
            sub AS (
              SELECT j FROM unnest(generate_series(0, {PQ_M - 1})) t(j)
            ),
            enc AS (
              SELECT e.vec_id, s.j, c.code,
                     ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id, s.j
                       ORDER BY
                         (SELECT sum(
                            (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE)
                          * (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE))
                          FROM unnest(generate_series(
                            s.j*{EMB_DIM // PQ_M}+1,
                            s.j*{EMB_DIM // PQ_M}+{EMB_DIM // PQ_M})) t(i)),
                         c.code
                     ) AS rn
              FROM embeddings e CROSS JOIN sub s CROSS JOIN cb c
              WHERE e.vec_id IN (SELECT vec_id FROM cells)
            ),
            lut AS (
              SELECT s.j, c.code,
                     (SELECT sum(
                        (q.qv[i]::DOUBLE - c.cv[i]::DOUBLE)
                      * (q.qv[i]::DOUBLE - c.cv[i]::DOUBLE))
                      FROM unnest(generate_series(
                        s.j*{EMB_DIM // PQ_M}+1,
                        s.j*{EMB_DIM // PQ_M}+{EMB_DIM // PQ_M})) t(i)) AS d
              FROM sub s CROSS JOIN cb c, q
            ),
            approx AS (
              SELECT e.vec_id, round(sum(l.d), 6) AS ad
              FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
              WHERE e.rn = 1 GROUP BY e.vec_id
            ),
            cand AS (
              SELECT vec_id FROM approx ORDER BY ad, vec_id LIMIT 40
            )
            SELECT b.vec_id,
                   round({_cosine_sql('b.embedding', 'q.qv')}, 6) AS cosine
            FROM embeddings b JOIN cand USING (vec_id), q
            ORDER BY cosine DESC, b.vec_id LIMIT 10
        """,
        "dedup_components": f"""
            WITH RECURSIVE {_SHINGLES_CTE.lstrip().rstrip()},
            mins AS ({_minhash_sql_mins()}),
            bands AS ({_minhash_sql_bands()}),
            prs AS (SELECT DISTINCT id_a, id_b FROM ({band_joins})),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM prs
              UNION
              SELECT id_b, id_a FROM prs
            ),
            reach(id, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
            )
            SELECT id, min(label) AS component FROM reach GROUP BY id
        """,
        "corpus_dedup": f"""
            WITH RECURSIVE
            fp AS (
              SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
              FROM documents
            ),
            ec AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS ecanon FROM fp
            ),
            surv AS (SELECT doc_id FROM ec WHERE doc_id = ecanon),
            t AS (
              SELECT d.doc_id, string_split(trim(d.text), ' ') AS toks
              FROM documents d JOIN surv sv ON sv.doc_id = d.doc_id
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2] AS s
              FROM t, LATERAL unnest(
                generate_series(1, greatest(len(toks) - 2, 1))) AS u(j)
            ),
            mins AS ({_minhash_sql_mins()}),
            bands AS ({_minhash_sql_bands()}),
            prs AS (SELECT DISTINCT id_a, id_b FROM ({band_joins})),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM prs
              UNION
              SELECT id_b, id_a FROM prs
            ),
            reach(id, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
            near AS (
              SELECT sv.doc_id AS sid,
                     coalesce(c.component, sv.doc_id) AS ncanon
              FROM surv sv LEFT JOIN comp c ON c.id = sv.doc_id
            )
            SELECT e.doc_id AS doc_id, n.ncanon AS canonical_id,
                   CASE WHEN e.doc_id <> e.ecanon THEN 'exact'
                        WHEN e.doc_id <> n.ncanon THEN 'near'
                        ELSE 'kept' END AS reason
            FROM ec e JOIN near n ON n.sid = e.ecanon
        """,
        # corpus_dedup's pipeline fed by the Gopher quality gate
        # (functions/quality.py thresholds as the Spark query pins
        # them), low-quality docs appended as their own manifest rows
        "corpus_curate": f"""
            WITH RECURSIVE
            qw AS (
              SELECT doc_id, text,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM documents
            ),
            q AS (
              SELECT doc_id, text,
                 (CAST(len(w) AS BIGINT) BETWEEN 10 AND 100000)
                 AND (round(list_aggregate(list_transform(w, x -> length(x)), 'sum')
                        / CAST(len(w) AS DOUBLE), 6) BETWEEN 3.0 AND 10.0)
                 AND (round(((length(text) - length(replace(text,'#','')))
                         + (length(text) - length(replace(text,'...','')))/3)
                        / CAST(len(w) AS DOUBLE), 6) <= 0.1)
                 AND (round(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                        / CAST(len(w) AS DOUBLE), 6) >= 0.8)
                 AND (len(list_filter(
                        ['the','be','to','of','and','that','have','with'],
                        s -> list_contains(w, s))) >= 1)
                 AND (NOT regexp_matches(text, '^\\s*[-*•]'))
                 AND (NOT regexp_matches(text, '(\\.\\.\\.|…)\\s*$')) AS keep
              FROM qw
            ),
            good AS (SELECT doc_id, text FROM q WHERE keep),
            fp AS (
              SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
              FROM good
            ),
            ec AS (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS ecanon FROM fp
            ),
            surv AS (SELECT doc_id FROM ec WHERE doc_id = ecanon),
            t AS (
              SELECT d.doc_id, string_split(trim(d.text), ' ') AS toks
              FROM good d JOIN surv sv ON sv.doc_id = d.doc_id
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2] AS s
              FROM t, LATERAL unnest(
                generate_series(1, greatest(len(toks) - 2, 1))) AS u(j)
            ),
            mins AS ({_minhash_sql_mins()}),
            bands AS ({_minhash_sql_bands()}),
            prs AS (SELECT DISTINCT id_a, id_b FROM ({band_joins})),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM prs
              UNION
              SELECT id_b, id_a FROM prs
            ),
            reach(id, label) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
            near AS (
              SELECT sv.doc_id AS sid,
                     coalesce(c.component, sv.doc_id) AS ncanon
              FROM surv sv LEFT JOIN comp c ON c.id = sv.doc_id
            )
            SELECT e.doc_id AS doc_id, n.ncanon AS canonical_id,
                   CASE WHEN e.doc_id <> e.ecanon THEN 'exact'
                        WHEN e.doc_id <> n.ncanon THEN 'near'
                        ELSE 'kept' END AS reason
            FROM ec e JOIN near n ON n.sid = e.ecanon
            UNION ALL
            SELECT doc_id, doc_id AS canonical_id, 'low_quality' AS reason
            FROM q WHERE NOT keep
        """,
        "lang_id": _lang_sql(),
        # NFC + explicit Zs/control classes — the same enumerated
        # characters as functions/textops.py (NOT \\p{{Zs}}, so engine
        # and oracle agree across Unicode table versions). Plain (non-f)
        # string: the RE2 \\x{{...}} braces must survive verbatim.
        "text_normalize": r"""
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       nfc_normalize(text || ' cafe' || chr(769)
                         || chr(160) || 'x' || chr(7) || 'y'
                         || chr(8195) || 'z'),
                       '[\x{00a0}\x{1680}\x{2000}-\x{200a}\x{202f}\x{205f}\x{3000}]',
                       ' ', 'g'),
                     '[\x{0000}-\x{0008}\x{000b}-\x{001f}\x{007f}-\x{009f}]',
                     '', 'g') AS norm_text
            FROM documents
        """,
        "text_quality": f"""
            WITH base AS (
              SELECT doc_id, text,
                     ' ' || text || ' ' AS p,
                     (length(text) - length(replace(text, ' ', '')) + 1) AS tokens
              FROM documents
            )
            SELECT doc_id, tokens,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         / length(text), 6) AS alpha_ratio,
                   round(
                     length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                       / length(text) * 0.5
                     + least(tokens / 100.0, 1.0) * 0.3
                     + least({_stop_sql()} / tokens, 1.0) * 0.2, 6) AS quality
            FROM base
        """,
        # corpus-global line frequency -> hot list folded to one row
        # (the SQL twin of the broadcast-array rewrite path)
        "strip_boilerplate": """
            WITH l AS (
              SELECT DISTINCT doc_id, trim(x) AS k
              FROM documents,
                   LATERAL unnest(string_split(text, chr(10))) AS u(x)
              WHERE trim(x) <> ''
            ),
            hot AS (SELECT k FROM l GROUP BY k HAVING count(*) >= 2),
            hotl AS (SELECT coalesce(list(k), []) AS ks FROM hot)
            SELECT d.doc_id,
                   array_to_string(
                     list_filter(string_split(d.text, chr(10)),
                       x -> trim(x) = '' OR NOT list_contains(h.ks, trim(x))),
                     chr(10)) AS text
            FROM documents d CROSS JOIN hotl h
        """,
        # same RE2/java.util.regex-portable pre-tokenizer pattern as
        # textops._BPE_PRETOKEN_RE ('' = escaped apostrophe in SQL)
        "token_stats": r"""
            SELECT doc_id,
                   (length(text) - length(replace(text, ' ', '')) + 1)
                     AS ws_tokens,
                   len(regexp_extract_all(text,
                     '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                     AS bpe_tokens
            FROM documents
        """,
        # same java/RE2-portable patterns as functions/privacy.py,
        # substituted from the module constants so they cannot drift
        "pii_scrub": r"""
            WITH raw AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id %% 3 = 0 THEN ' contact user'
                          || doc_id || '@example.org' ELSE '' END
                     || CASE WHEN doc_id %% 4 = 0 THEN ' from 10.0.'
                          || (doc_id %% 256) || '.7' ELSE '' END
                     || CASE WHEN doc_id %% 5 = 0 THEN ' call +1 555 01'
                          || lpad((doc_id %% 100)::varchar, 2, '0')
                          || ' 44' ELSE '' END AS t
              FROM documents
            ),
            s1 AS (SELECT doc_id, t,
                          regexp_replace(t, '%(email)s', '<EMAIL>', 'g') AS a
                   FROM raw),
            s2 AS (SELECT doc_id, t, a,
                          regexp_replace(a, '%(ip)s', '<IP>', 'g') AS c
                   FROM s1)
            SELECT doc_id,
                   len(regexp_extract_all(t, '%(email)s')) AS n_emails,
                   len(regexp_extract_all(a, '%(ip)s')) AS n_ipv4,
                   len(regexp_extract_all(c, '%(phone)s')) AS n_phones,
                   regexp_replace(c, '%(phone)s', '<PHONE>', 'g') AS scrubbed
            FROM s2
        """ % {"email": EMAIL_RE, "ip": IPV4_RE, "phone": PHONE_RE},
        # distinct word 8-grams vs the every-50th-doc benchmark set,
        # folded to one list (the SQL twin of the broadcast-array path)
        "decontaminate": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS w
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(w) - 8 + 2, 1)),
                       i -> array_to_string(
                              list_slice(w, i::int, (i + 7)::int), ' ')
                     )) AS grams
              FROM d
            ),
            b AS (SELECT DISTINCT unnest(grams) AS gm FROM g
                  WHERE doc_id % 50 = 0),
            bl AS (SELECT coalesce(list(gm), []) AS ks FROM b)
            SELECT g.doc_id,
                   len(list_filter(g.grams,
                       x -> list_contains(bl.ks, x)))::bigint AS n_hit_grams,
                   len(list_filter(g.grams,
                       x -> list_contains(bl.ks, x))) > 0 AS contaminated
            FROM g CROSS JOIN bl
        """,
        # the single-partition global window the Spark side must EQUAL
        # (but never executes — it runs the two-phase distributed scan)
        "token_shards": """
            WITH t AS (
              SELECT doc_id,
                     (length(text) - length(replace(text, ' ', '')) + 1)
                       AS tokens
              FROM documents
            )
            SELECT doc_id, tokens,
                   coalesce(sum(tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS "offset",
                   floor(coalesce(sum(tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     / 2000)::bigint AS shard
            FROM t
        """,
        "quota_sample_lang": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY md5(doc_id::varchar), doc_id) AS rn
              FROM documents
            ) WHERE rn <= 60
        """,
        # temperature mix: per-group target t = floor(round(w*N/W, 6))
        # with w = round((n/N)^tau, 9) summed as DECIMAL (exact,
        # order-independent — double sums are neither); copies =
        # t div n everywhere + 1 for the t mod n first docs in md5
        # order. DuckDB is case-insensitive, hence nt/wsum names.
        "temperature_mix_lang": """
            WITH g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
                 tot AS (SELECT count(*) AS nt FROM documents),
                 w AS (SELECT lang, n,
                       CAST(round(pow(n * 1.0 / nt, 0.5), 9)
                            AS DECIMAL(38,9)) AS w
                       FROM g, tot),
                 ws AS (SELECT sum(w) AS wsum FROM w),
                 t AS (SELECT lang, n,
                       CAST(floor(round(CAST(w AS DOUBLE)
                            * (SELECT nt FROM tot)
                            / CAST(wsum AS DOUBLE), 6)) AS BIGINT) AS t
                       FROM w, ws),
                 r AS (SELECT d.doc_id, d.lang,
                       row_number() OVER (PARTITION BY d.lang
                         ORDER BY md5(d.doc_id::varchar), d.doc_id) AS rn,
                       t.t, t.n
                       FROM documents d JOIN t USING (lang))
            SELECT doc_id, lang,
                   CAST(t // n + CASE WHEN rn <= t % n THEN 1 ELSE 0 END
                        AS INT) AS copies
            FROM r
            WHERE t // n + CASE WHEN rn <= t % n THEN 1 ELSE 0 END > 0
        """,
        # SemDeDup: same strided seed centroids as the IVF oracle,
        # then within-cell cosine dominance (farther-from-centroid
        # wins, ties to the lower id); canonical = highest-priority
        # dominator, one hop
        "semantic_dedup": f"""
            WITH cent AS (
              SELECT CAST(vec_id / {IVF_SPACING} AS INT) AS cid,
                     embedding AS cv
              FROM embeddings
              WHERE vec_id % {IVF_SPACING} = 0
                AND vec_id < {IVF_K * IVF_SPACING}
            ),
            assign AS (
              SELECT e.vec_id, e.embedding, c.cid,
                     {_F64_DIST2.format(a='e.embedding', b='c.cv', dim=EMB_DIM)} AS d2,
                     ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_F64_DIST2.format(a='e.embedding', b='c.cv', dim=EMB_DIM)}, c.cid
                     ) AS rn
              FROM embeddings e CROSS JOIN cent c
            ),
            a AS (SELECT vec_id, embedding, cid, d2 FROM assign WHERE rn = 1),
            dom AS (
              SELECT r.vec_id, l.vec_id AS dom_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY r.vec_id
                       ORDER BY l.d2 DESC, l.vec_id
                     ) AS rk
              FROM a l JOIN a r
                ON l.cid = r.cid
               AND (l.d2 > r.d2 OR (l.d2 = r.d2 AND l.vec_id < r.vec_id))
               AND round({_cosine_sql('l.embedding', 'r.embedding')}, 6)
                   >= {SEMDEDUP_THR}
            ),
            d1 AS (SELECT vec_id, dom_id FROM dom WHERE rk = 1)
            SELECT a.vec_id, a.cid AS cell,
                   coalesce(d1.dom_id, a.vec_id) AS canonical_id,
                   CASE WHEN d1.dom_id IS NULL THEN 'kept'
                        ELSE 'semantic' END AS reason
            FROM a LEFT JOIN d1 USING (vec_id)
        """,
        # hash split: identical md5-prefix string compare against the
        # SAME hex boundary literals the Spark op embeds (split_bounds
        # is the single source of the float arithmetic)
        "hash_split": f"""
            SELECT doc_id,
                   CASE
                     WHEN substr(md5(doc_id::varchar), 1, 15)
                          < '{_split_bounds(SPLIT_WEIGHTS)[0]}'
                       THEN 'train'
                     WHEN substr(md5(doc_id::varchar), 1, 15)
                          < '{_split_bounds(SPLIT_WEIGHTS)[1]}'
                       THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM documents
        """,
        # DSIR: same md5 feature buckets, same all-integer ratio
        # inside one ln, same DECIMAL(18,6) order-exact sum
        "link_pagerank": _pagerank_sql(),
        "lm_perplexity": _lm_perplexity_sql(),
        "dsir_weights": f"""
            WITH tok AS (
              SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
              FROM documents
            ),
            feats AS (
              SELECT doc_id, unnest(toks) AS f FROM tok
              UNION ALL
              SELECT doc_id, toks[j] || ' ' || toks[j+1] AS f
              FROM tok,
                   LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(j)
            ),
            fb AS (
              SELECT doc_id,
                     ('0x' || substr(md5(f), 1, 8))::BIGINT % {DSIR_BUCKETS}
                       AS bucket
              FROM feats
            ),
            p AS (SELECT bucket, count(*) AS cc FROM fb GROUP BY bucket),
            q AS (SELECT bucket, count(*) AS ct FROM fb
                  WHERE doc_id % 20 = 0 GROUP BY bucket),
            tot AS (SELECT (SELECT coalesce(sum(cc), 0) FROM p) AS Tc,
                           (SELECT coalesce(sum(ct), 0) FROM q) AS Tt),
            ratios AS (
              SELECT coalesce(p.bucket, q.bucket) AS bucket,
                     CAST(round(ln(
                       ((coalesce(ct, 0) + 1) * (Tc + {DSIR_BUCKETS}))::DOUBLE
                       / ((coalesce(cc, 0) + 1) * (Tt + {DSIR_BUCKETS}))::DOUBLE
                     ), 6) AS DECIMAL(18,6)) AS logr
              FROM p FULL OUTER JOIN q ON p.bucket = q.bucket, tot
            )
            SELECT fb.doc_id,
                   CAST(coalesce(sum(logr), 0) AS DOUBLE) AS logw
            FROM fb LEFT JOIN ratios USING (bucket)
            GROUP BY fb.doc_id
        """,
        # exact-substring signal: same truncating k-window convention
        # as textops.shingles; df = distinct docs per window hash; the
        # 0/1 avg is an integer sum in double, so order-exact
        "span_dup_frac": f"""
            WITH tok AS (
              SELECT doc_id, string_split(trim(text), ' ') AS toks
              FROM documents
            ),
            sp AS (
              SELECT doc_id,
                     md5(array_to_string(
                       list_slice(toks, j, j + {SPAN_K - 1}), ' ')) AS h
              FROM tok, LATERAL unnest(
                generate_series(1, greatest(len(toks) - {SPAN_K - 1}, 1))
              ) AS u(j)
            ),
            dfq AS (
              SELECT h, count(DISTINCT doc_id) AS df FROM sp GROUP BY h
            )
            SELECT sp.doc_id, count(*) AS n_spans,
                   round(avg(CASE WHEN df >= 2 THEN 1.0::DOUBLE
                             ELSE 0.0::DOUBLE END), 6) AS dup_frac
            FROM sp JOIN dfq USING (h)
            GROUP BY sp.doc_id
        """,
        # CCNet paragraph dedup over the synthesized 3-paragraph text:
        # fingerprint-normalized hash, row_number-first keeper in
        # (doc_id, idx) order, docs with zero kept paragraphs fall out
        "paragraph_dedup": """
            WITH d AS (
              SELECT doc_id,
                     substr(text, 1, 60) || chr(10) || 'shared para ' ||
                     (doc_id % 7) || chr(10) || substr(text, 61) AS text
              FROM documents
            ),
            parts AS (
              SELECT doc_id, string_split(text, chr(10)) AS ps FROM d
            ),
            p AS (
              SELECT doc_id, i - 1 AS idx, ps[i] AS para,
                     md5(trim(regexp_replace(lower(ps[i]), '\\s+', ' ', 'g')))
                       AS h
              FROM parts, LATERAL unnest(generate_series(1, len(ps))) AS u(i)
              WHERE trim(ps[i]) <> ''
            ),
            r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY h
                                        ORDER BY doc_id, idx) AS rn,
                     count(*) OVER (PARTITION BY doc_id) AS n_paras
              FROM p
            )
            SELECT doc_id,
                   string_agg(para, chr(10) ORDER BY idx) AS text,
                   any_value(n_paras) AS n_paras,
                   count(*) AS n_kept
            FROM r WHERE rn = 1
            GROUP BY doc_id
        """,
        # span removal: same truncating k-window convention as
        # span_dup_frac; count with multiplicity, (doc, pos)-first copy
        # survives, covered token indices union, text rebuilt in order
        "span_dedup_rewrite": f"""
            WITH tok AS (
              SELECT doc_id, string_split(trim(text), ' ') AS toks
              FROM documents
            ),
            t AS (
              SELECT doc_id, i - 1 AS idx, toks[i] AS tk
              FROM tok, LATERAL unnest(generate_series(1, len(toks))) AS u(i)
            ),
            w AS (
              SELECT doc_id, j - 1 AS j0, len(toks) AS n,
                     md5(array_to_string(
                       list_slice(toks, j, j + {SPAN_K - 1}), ' ')) AS h
              FROM tok, LATERAL unnest(
                generate_series(1, greatest(len(toks) - {SPAN_K - 1}, 1))
              ) AS u(j)
            ),
            w2 AS (
              SELECT *,
                     count(*) OVER (PARTITION BY h) AS cnt,
                     row_number() OVER (PARTITION BY h
                                        ORDER BY doc_id, j0) AS rn
              FROM w
            ),
            cov AS (
              SELECT DISTINCT doc_id, g.idx
              FROM w2, LATERAL unnest(
                generate_series(j0, least(j0 + {SPAN_K - 1}, n - 1))
              ) AS g(idx)
              WHERE cnt >= 2 AND rn > 1
            ),
            kept AS (
              SELECT t.doc_id, t.idx, t.tk
              FROM t LEFT JOIN cov
                ON t.doc_id = cov.doc_id AND t.idx = cov.idx
              WHERE cov.idx IS NULL
            ),
            reb AS (
              SELECT doc_id, string_agg(tk, ' ' ORDER BY idx) AS text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.text, '') AS text,
                   len(string_split(trim(d.text), ' ')) AS n_tokens,
                   len(string_split(trim(d.text), ' '))
                     - coalesce(r.n_kept, 0) AS n_removed
            FROM documents d LEFT JOIN reb r USING (doc_id)
        """,
        # Cho & Garcia-Molina λ̂ via a lag window (oracle-side only —
        # the engine folds per-URL arrays, histories are small); the
        # consecutive order is (ts, hash), matching array_sort on the
        # struct; epoch floored to whole seconds on both engines
        "recrawl_schedule": """
            WITH h AS (
              SELECT 'https://h' || (user_id % 7) || '.example.com/doc/'
                       || user_id AS url,
                     ts AS fetch_ts,
                     md5(user_id || '/' || event_type) AS content_hash
              FROM events
            ),
            o AS (
              SELECT url, fetch_ts, content_hash,
                     lag(content_hash) OVER (
                       PARTITION BY url
                       ORDER BY fetch_ts, content_hash) AS prev_h
              FROM h
            ),
            s AS (
              SELECT url,
                     count(*) AS n_fetches,
                     count(*) - 1 AS n_intervals,
                     sum(CASE WHEN prev_h IS NOT NULL
                              AND content_hash <> prev_h
                              THEN 1 ELSE 0 END) AS n_changes,
                     CAST(floor(epoch(max(fetch_ts))) AS BIGINT)
                       - CAST(floor(epoch(min(fetch_ts))) AS BIGINT)
                       AS span_seconds,
                     CAST(floor(epoch(max(fetch_ts))) AS BIGINT) AS last_s
              FROM o GROUP BY url
            )
            SELECT url,
                   CAST(n_fetches AS INT) AS n_fetches,
                   CAST(n_changes AS INT) AS n_changes,
                   CASE WHEN n_intervals >= 1 AND span_seconds > 0 THEN
                     round(-ln((n_intervals - n_changes + 0.5)
                               / (n_intervals + 0.5))
                           / (span_seconds::DOUBLE / n_intervals), 12)
                   END AS lambda_hat,
                   CASE WHEN n_intervals >= 1 AND span_seconds > 0 THEN
                     round(round(-ln((n_intervals - n_changes + 0.5)
                                     / (n_intervals + 0.5))
                                 / (span_seconds::DOUBLE / n_intervals), 12)
                           * (CAST(floor(epoch(
                                TIMESTAMP '2026-06-01 00:00:00')) AS BIGINT)
                              - last_s), 6)
                   ELSE 0.0 END AS priority
            FROM s
        """,
        # closed-form twin of the sitemap generator: the engine parses
        # real XML, the oracle recomputes the loc layout directly
        "sitemap_locs": """
            SELECT doc_id, CAST(i AS INT) AS loc_idx,
                   'https://h' || (doc_id % 7) || '.example.com/p/' ||
                   doc_id || '/' || i AS loc
            FROM documents,
                 LATERAL unnest(generate_series(0, doc_id % 3)) AS t(i)
        """,
        # crawler-trap decide rules over the same synthesized URL mix;
        # max_seg_run via gaps-and-islands (RE2 has no backreferences,
        # so the run-length is list logic on both engines)
        "url_traps": """
            WITH u AS (
              SELECT doc_id,
                CASE doc_id % 5
                  WHEN 0 THEN '/doc/' || doc_id
                  WHEN 1 THEN '/cal/cal/cal/' || doc_id
                  WHEN 2 THEN '/' || repeat('d/', 21) || doc_id
                  WHEN 3 THEN '/p'
                  ELSE '/' || repeat('x', 2050)
                END AS path,
                CASE doc_id % 5
                  WHEN 3 THEN repeat('k=v&', 16) || 'k=v'
                  ELSE NULL
                END AS q,
                'https://h' || (doc_id % 7) || '.example.com' AS base
              FROM documents
            ),
            full_u AS (
              SELECT doc_id, base || path ||
                     coalesce('?' || q, '') AS url, path, q
              FROM u
            ),
            sg AS (
              SELECT doc_id,
                     list_filter(string_split(path, '/'),
                                 x -> x <> '') AS sl
              FROM full_u
            ),
            segs AS (
              SELECT doc_id, sl[i] AS seg, i
              FROM sg, LATERAL unnest(
                generate_series(1, len(sl))) AS t(i)
            ),
            isl AS (
              SELECT doc_id, seg, i,
                     i - row_number() OVER (
                       PARTITION BY doc_id, seg ORDER BY i) AS grp
              FROM segs
            ),
            runs AS (
              SELECT doc_id, max(cnt) AS max_run, count(DISTINCT i) AS nseg
              FROM (
                SELECT doc_id, seg, grp, count(*) AS cnt,
                       min(i) AS i
                FROM isl GROUP BY doc_id, seg, grp
              ) g2
              GROUP BY doc_id
            ),
            sig AS (
              SELECT f.doc_id,
                     coalesce((SELECT count(*) FROM segs s
                               WHERE s.doc_id = f.doc_id), 0) AS n_segments,
                     coalesce(r.max_run, 0) AS max_seg_run,
                     CASE WHEN q IS NULL OR q = '' THEN 0
                          ELSE len(string_split(q, '&')) END AS n_qparams,
                     length(url) AS url_len
              FROM full_u f LEFT JOIN runs r USING (doc_id)
            )
            SELECT doc_id,
                   CAST(n_segments AS INT) AS n_segments,
                   CAST(max_seg_run AS INT) AS max_seg_run,
                   CAST(n_qparams AS INT) AS n_qparams,
                   CAST(url_len AS INT) AS url_len,
                   (n_segments > 20 OR max_seg_run > 2
                    OR n_qparams > 16 OR url_len > 2048) AS is_trap
            FROM sig
        """,
        # byte-exact archival: md5 of the utf-8 payload the WARC round
        # trip must reproduce
        "warc_roundtrip": """
            SELECT doc_id, md5(text) AS payload_md5 FROM documents
        """,
        # CDX random access: urlkey is the closed-form SURT of the
        # generated URL layout; md5/byte-length recompute the payload
        # the ranged gzip-member fetch must reproduce
        "warc_cdx_fetch": """
            SELECT doc_id,
                   md5(text) AS payload_md5,
                   CAST(octet_length(encode(text)) AS BIGINT)
                     AS payload_len,
                   'org,example,docs)/d/' || doc_id AS urlkey
            FROM documents WHERE doc_id % 7 = 0
        """,
        # closed-form recomputation of the synthesized PCM signal the
        # Spark side routes through wave-writer -> decode_wav
        "media_decode_wav": """
            WITH s AS (
              SELECT d.doc_id, r.i,
                     ((d.doc_id * 31 + r.i * 7) % 2001) - 1000 AS v
              FROM documents d, range(0, 960) AS r(i)
              WHERE r.i < 800 + (d.doc_id % 5) * 40
            ),
            s2 AS (
              SELECT doc_id, v,
                     lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
              FROM s
            ),
            a AS (
              SELECT doc_id, count(*) AS n,
                     sqrt(avg(v::double * v)) AS rms,
                     sum(CASE WHEN pv IS NOT NULL AND v * pv < 0
                         THEN 1 ELSE 0 END) AS flips
              FROM s2 GROUP BY doc_id
            )
            SELECT doc_id,
                   round(n / 8000.0, 6) AS duration_s,
                   round(rms / 32768.0, 6) AS rms_norm,
                   round(flips::double / (n - 1), 6) AS zcr_rate
            FROM a
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "media_features": """
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS n_bytes,
                   round(CAST(('0x' || substr(md5(text), 1, 2)) AS INT) / 255.0, 6) AS feat0,
                   round(CAST(('0x' || substr(md5(text), 3, 2)) AS INT) / 255.0, 6) AS feat1
            FROM documents
        """,
        "media_decode_bmp": """
            SELECT doc_id,
                   round(4 / 4096.0, 6) AS w_n,
                   round(2 / 4096.0, 6) AS h_n,
                   round((doc_id % 256) / 255.0, 6) AS mean_r,
                   round(((doc_id * 7) % 256) / 255.0, 6) AS mean_g,
                   round(((doc_id * 13) % 256) / 255.0, 6) AS mean_b,
                   1.0 AS decoded
            FROM documents
        """,
        "meta_dates": """
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                        THEN '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                        WHEN doc_id % 5 = 1
                        THEN '[2023-06-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || ']'
                        WHEN doc_id % 5 = 2
                        THEN 'Published on March ' || (doc_id % 28 + 1) || ', 2021 by staff'
                        WHEN doc_id % 5 = 3
                        THEN CASE WHEN doc_id % 3 = 0
                                  THEN (doc_id % 28 + 1) || '. Januar 2024'
                                  WHEN doc_id % 3 = 1
                                  THEN 'le ' || (doc_id % 28 + 1) || ' janvier 2024'
                                  ELSE (doc_id % 28 + 1) || ' de enero de 2024' END
                        WHEN doc_id % 10 = 4
                        THEN CASE WHEN doc_id % 4 = 0
                                  THEN (doc_id % 7 + 1) || ' days ago'
                                  WHEN doc_id % 4 = 1
                                  THEN 'vor ' || (doc_id % 7 + 1) || ' Tagen'
                                  WHEN doc_id % 4 = 2
                                  THEN 'il y a ' || (doc_id % 7 + 1) || ' jours'
                                  ELSE 'hace ' || (doc_id % 7 + 1) || ' días' END
                        ELSE 'no date here' END AS raw,
                   CASE WHEN doc_id % 5 = 0
                        THEN '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T00:00:00'
                        WHEN doc_id % 5 = 1
                        THEN '2023-06-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T00:00:00'
                        WHEN doc_id % 5 = 2
                        THEN '2021-03-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T00:00:00'
                        WHEN doc_id % 5 = 3
                        THEN '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T00:00:00'
                        WHEN doc_id % 10 = 4
                        THEN '2024-03-' || lpad(CAST(15 - (doc_id % 7 + 1) AS VARCHAR), 2, '0') || 'T12:00:00'
                        ELSE NULL END AS iso
            FROM documents
        """,
        "extract_archive": """
            SELECT doc_id, 'doc_' || doc_id || '.txt' AS file_name,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        """,
        # Gopher word rules + keep conjunction (functions/quality.py);
        # single-line corpus text → the line terms reduce to one
        # regexp each and dup_line_char_frac to 0 (omitted: 0 ≤ 0.2
        # always holds)
        "gopher_quality": r"""
            WITH base AS (
              SELECT doc_id, text,
                     regexp_split_to_array(trim(text), '\s+') AS w
              FROM documents
            ), m AS (
              SELECT doc_id,
                 CAST(len(w) AS BIGINT) AS n_words,
                 round(list_aggregate(list_transform(w, x -> length(x)), 'sum')
                       / CAST(len(w) AS DOUBLE), 6) AS mean_word_len,
                 round(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                       / CAST(len(w) AS DOUBLE), 6) AS frac_alpha_words,
                 round(((length(text) - length(replace(text,'#','')))
                        + (length(text) - length(replace(text,'...','')))/3)
                       / CAST(len(w) AS DOUBLE), 6) AS symbol_word_ratio,
                 CAST(len(list_filter(
                     ['the','be','to','of','and','that','have','with'],
                     s -> list_contains(w, s))) AS BIGINT) AS stop_hits,
                 regexp_matches(text, '^\s*[-*•]') AS bullet1,
                 regexp_matches(text, '(\.\.\.|…)\s*$') AS ell1
              FROM base
            )
            SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
                   symbol_word_ratio, stop_hits,
               (n_words BETWEEN 10 AND 100000)
               AND (mean_word_len BETWEEN 3.0 AND 10.0)
               AND (symbol_word_ratio <= 0.1)
               AND (frac_alpha_words >= 0.8) AND (stop_hits >= 2)
               AND (NOT bullet1) AND (NOT ell1) AS keep
            FROM m
        """,
        # C4 line filter + Gopher line metrics over the same
        # deterministic multi-line synthesis as the Spark query
        "c4_line_filter": r"""
            WITH base AS (
              SELECT doc_id,
                'All about the corpus' || chr(10) || text || '.'
                  || chr(10) || substr(text, 1, 20)
                  || chr(10) || 'Click here to enable javascript.'
                  || chr(10) || 'Too short.' AS mt
              FROM documents
            ), f AS (
              SELECT doc_id, string_split(mt, chr(10)) AS lines FROM base
            )
            SELECT doc_id,
              array_to_string(list_filter(lines, l ->
                 regexp_matches(l, '[.!?"]\s*$')
                 AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
                 AND NOT contains(lower(l), 'javascript')
                 AND NOT contains(lower(l), '{')), chr(10)) AS cleaned,
              round(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))
                    / CAST(len(lines) AS DOUBLE), 6) AS frac_bullet_lines,
              round(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                    / CAST(len(lines) AS DOUBLE), 6) AS frac_ellipsis_lines,
              round((list_aggregate(list_transform(lines, x -> length(x)), 'sum')
                     - list_aggregate(list_transform(list_distinct(lines), x -> length(x)), 'sum'))
                    / CAST(greatest(list_aggregate(list_transform(lines, x -> length(x)), 'sum'), 1)
                           AS DOUBLE), 6) AS dup_line_char_frac
            FROM f
        """,
        # top-2-gram repetition; tie-break (count DESC, gram DESC)
        # mirrors Spark's max(struct(c, gram)) — ASCII corpus words, so
        # byte order == UTF-16 order
        "ngram_repetition": r"""
            WITH d AS (
              SELECT doc_id, length(text) AS tlen,
                     regexp_split_to_array(trim(text), '\s+') AS w
              FROM documents
            ), i AS (
              SELECT doc_id, tlen, w, unnest(range(len(w) - 1)) AS i
              FROM d WHERE len(w) >= 2
            ), ng AS (
              SELECT doc_id, tlen,
                     w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS gram
              FROM i
            ), c AS (
              SELECT doc_id, tlen, gram, count(*) AS c
              FROM ng GROUP BY doc_id, tlen, gram
            ), r AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY c DESC, gram DESC) AS rn
              FROM c
            )
            SELECT doc_id, gram AS top_gram, CAST(c AS BIGINT) AS top_gram_count,
                   round(c * length(gram) / CAST(tlen AS DOUBLE), 6) AS top_gram_char_frac
            FROM r WHERE rn = 1
        """,
        # clean_html_op: non-SQL-expressible (DOM surgery) → rows-only
        # check by design.
    }
