"""Link-graph authority scoring for frontier prioritization.

The north rule's frontier is a PRIORITY queue; the reference drains
FIFO because a single-process crawler has no global view of the link
graph. At 10^10 URLs the standard priority signal is link authority
(PageRank over the hyperlink graph — Page et al. 1999; OPIC and
friends are its online approximations), so crawl budget goes to the
pages the web itself points at.

Engine-reproducibility contract (what makes the DuckDB oracle exact):

- ranks are INTEGER rank units (each node starts with ``unit`` =
  10^6), and every step is integer arithmetic: per-edge contribution
  is ``units div outdeg`` (truncating division — all values are
  non-negative, so Spark's ``div`` and DuckDB's ``//`` agree), the
  damping ``d = dnum/dden`` is applied as ``(dnum·x) div dden``.
  There is NO floating point anywhere in the iteration, so the result
  is independent of aggregation order and bit-identical across
  engines. Truncation leaks ≤ 1 unit per edge per round out of the
  mass total — ranking-irrelevant at unit = 10^6 and exactly mirrored
  by the oracle.
- the fixed-point bound: intermediate sums stay ≤ dnum·N·unit, so
  int64 is safe while ``N·unit < 5·10^17`` — at the 10^10-node target
  frontier use ``unit = 10^6`` (5·10^16) as here.

Scale posture (per iteration, at 10^10 edges):

- ONE shuffle join (edges⋈ranks on src — edges are pre-partitioned by
  src and checkpointed once, so only the slim (node, units) side
  moves) + ONE map-side-combined sum by dst + ONE co-partitioned left
  join back to the static node table. Dangling mass rides the
  round's materializing action as an :class:`Observation` — no
  separate aggregation job (the ``dedup_components`` doctrine,
  ``operators/dedup.py``).
- ``localCheckpoint`` per round truncates the lineage (the plan
  otherwise grows geometrically with iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "rank_priority"]

UNIT = 10**6


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    dnum: int = 17,
    dden: int = 20,
    unit: int = UNIT,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration integer PageRank → ``(node, rank_units, rank)``.

    ``edges`` is a directed (src, dst) edge list (deduplicated here —
    multigraph edges count once, matching a link-dedup'd parse). The
    node universe is every id appearing as src or dst. Per round, for
    damping ``d = dnum/dden`` (default 17/20 = 0.85)::

        units'(v) = ((dden-dnum)·unit) div dden
                  + (dnum · (Σ_{u→v} units(u) div outdeg(u)
                             + dangling_mass div N)) div dden

    Dangling nodes (no out-links) spread their mass uniformly, the
    standard correction. Returns one row per node; ``rank`` is the
    readability double ``units / unit`` (a single IEEE division of
    identical integers — engine-stable).
    """
    # node ids stay whatever type the caller uses (doc ids OR raw
    # urls — the crawl face keys the graph by url)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static per-edge fanout table, partitioned by the per-round join
    # key so only the rank side of the iteration join ever shuffles
    edeg = (
        e.join(deg, "src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            deg.select(F.col("src").alias("node"), "deg"), "node", "left"
        )
        .withColumn("dangling", F.col("deg").isNull())
        .repartition("node")
        .localCheckpoint(eager=True)
    )
    n_nodes, dang_mass = (
        nodes.agg(
            F.count(F.lit(1)),
            F.coalesce(
                F.sum(F.when(F.col("dangling"), F.lit(unit))), F.lit(0)
            ),
        ).first()
    )
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_units"),
            F.lit(0.0).alias("rank"),
        )
    if n_nodes * unit >= 5 * 10**17:
        raise ValueError(
            f"pagerank fixed-point overflow: N·unit = {n_nodes * unit} "
            "≥ 5e17; lower `unit`"
        )

    base = ((dden - dnum) * unit) // dden
    ranks = nodes.select(
        "node", "dangling", F.lit(unit).cast("long").alias("units")
    ).localCheckpoint(eager=True)

    from pyspark.sql import Observation

    for _ in range(n_iter):
        dang_share = int(dang_mass) // int(n_nodes)
        insum = (
            edeg.join(
                ranks.select(F.col("node").alias("src"), "units"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("units div deg")).alias("insum"))
        )
        nxt = nodes.select("node", "dangling").join(
            insum, "node", "left"
        ).select(
            "node",
            "dangling",
            (
                F.lit(base)
                + F.expr(
                    f"({dnum} * (coalesce(insum, 0) + {dang_share})) "
                    f"div {dden}"
                )
            ).cast("long").alias("units"),
        )
        # next round's dangling mass rides this round's checkpoint job
        obs = Observation()
        ranks = nxt.observe(
            obs,
            F.coalesce(
                F.sum(F.when(F.col("dangling"), F.col("units"))), F.lit(0)
            ).alias("dang"),
        ).localCheckpoint(eager=True)
        dang_mass = obs.get["dang"]

    return ranks.select(
        "node",
        F.col("units").alias("rank_units"),
        (F.col("units") / F.lit(float(unit))).alias("rank"),
    )


def rank_priority(
    frontier: DataFrame,
    ranks: DataFrame,
    id_col: str = "doc_id",
    node_col: str = "node",
) -> DataFrame:
    """Overwrite the frontier's ``priority`` from link authority:
    higher rank → smaller priority value → dequeued first by
    :func:`frontier.politeness_dequeue` (order is ``(priority,
    emit_seq)``, so FIFO stays the tiebreak within a rank). Unranked
    rows (not yet in the graph) keep priority 0 — a discovered-first
    bias, the behavior a fresh-URL queue wants. The rank table is a
    per-node slim projection; AQE broadcasts it when it fits, else
    this is one key-shuffle join. Priority is DOUBLE — the engine's
    frontier schema (frontier.py FRONTIER_SCHEMA); rank_units < 2^53
    by the fixed-point bound, so the negation stays exact."""
    r = ranks.select(
        F.col(node_col).alias(id_col),
        F.col("rank_units").alias("_ru"),
    )
    return (
        frontier.join(r, id_col, "left")
        .withColumn(
            "priority",
            F.coalesce(-F.col("_ru"), F.lit(0)).cast("double"),
        )
        .drop("_ru")
    )
