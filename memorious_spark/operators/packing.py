"""Token-budget shard assignment — the concat-and-chunk layout step
of a pretraining pipeline.

After curation, a corpus is laid out as a deterministic sequence of
documents, token counts are prefix-summed, and each document is
assigned to the fixed-token-budget shard in which it STARTS (the
GPT-style concat-then-chunk layout: shard = floor(exclusive_prefix /
budget)). Downstream loaders read one shard per worker; the
assignment must therefore be a pure function of the corpus, not of
Spark's partitioning.

The naive Spark formulation — ``sum(tokens) OVER (ORDER BY id)`` with
no PARTITION BY — collapses the whole corpus into ONE task (Spark
executes an unpartitioned window on a single partition): correct at
test scale, dead at 100 TB. This module computes the same global
exclusive prefix sum with the classic two-phase scan:

1. range-repartition by the order column (one shuffle — the only
   one), so partition p holds a contiguous key range;
2. per-partition token totals → tiny P-row aggregate collected to the
   driver → exclusive partition offsets broadcast back;
3. partition-LOCAL window (PARTITION BY partition id ORDER BY key)
   adds the local exclusive cumsum to the partition offset.

Every stage is parallel; the collect moves P longs, not data. The
result is bit-identical to the single-partition window (the SQL twin
the driver oracle runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pack_token_shards"]


def pack_token_shards(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to its token-budget shard.

    Input must carry a UNIQUE orderable ``id_col`` (the layout order)
    and a ``tokens_col`` count. Returns ``(id_col, tokens_col,
    offset, shard)`` where ``offset`` is the exclusive prefix sum of
    tokens in ``id_col`` order and ``shard = floor(offset /
    budget)``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    p = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    parts = docs.select(id_col, tokens_col).repartitionByRange(
        p, F.col(id_col)
    )
    # spark_partition_id() is NONDETERMINISTIC across re-executions:
    # repartitionByRange samples its boundaries per job, so the frame
    # must be materialized ONCE and read by both consumers (the totals
    # collect below and the final window+join). localCheckpoint cuts
    # the lineage so a recompute is impossible — the slim 2-column
    # projection is what lands on executor memory/disk, not the corpus.
    with_pid = (
        parts.withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Phase 2: P-row rollup; the collect ships P (pid, total, min_key)
    # longs to the driver — independent of data volume.
    totals = (
        with_pid.groupBy("_pid")
        .agg(
            F.sum(tokens_col).alias("_tot"),
            F.min(id_col).alias("_lo"),
        )
        .collect()
    )
    # Partition ids are ordered by key range (repartitionByRange
    # contract), but sort by the observed min key so correctness
    # never rests on that internal numbering.
    running = 0
    offsets = []
    for row in sorted(totals, key=lambda r: r["_lo"]):
        offsets.append((int(row["_pid"]), running))
        running += int(row["_tot"] or 0)
    off_df = with_pid.sparkSession.createDataFrame(
        offsets, "_pid int, _part_off long"
    )
    local = Window.partitionBy("_pid").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        with_pid.join(F.broadcast(off_df), "_pid")
        .select(
            id_col,
            tokens_col,
            (
                F.col("_part_off")
                + F.coalesce(F.sum(tokens_col).over(local), F.lit(0))
            ).alias("offset"),
        )
        .withColumn(
            "shard", F.floor(F.col("offset") / F.lit(budget)).cast("long")
        )
    )
