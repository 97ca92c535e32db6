"""Executor-resident sharded Bloom seen-filter.

The broadcast bloom (:mod:`memorious_spark.operators.seen`) and the
driver cuckoo (:mod:`memorious_spark.operators.cuckoo`) both keep the
filter ON THE DRIVER: the bitmap (or shard dict) is built/updated by
collecting state to the driver and re-broadcast for every probe. At
the north-rule scale (10^10-URL frontier) that is ~12-20 GB of
driver-resident filter plus an O(new URLs) or O(bitmap) driver
transfer per round — the driver becomes the memory and bandwidth
bottleneck of exactly the stage the filter exists to scale.

This module keeps the filter WHERE THE DATA IS: a DataFrame of
``(shard int, bm binary)`` rows living on executors (localCheckpoint
storage), with ``shard = pmod(url_hash, S)``. All three operations are
cogrouped Arrow jobs that move ZERO filter bytes through the driver:

- **update**: cogroup(filter-by-shard, new-hashes-by-shard) → each
  task ORs its shard's new hashes into its shard's bitmap. Driver
  traffic is task metadata — O(P), independent of how many URLs the
  round discovered.
- **probe**: cogroup(candidates-by-shard, filter-by-shard) → each
  task probes its candidates against the ONE bitmap it owns. Costs
  one shuffle of the candidates on the shard key (the broadcast probe
  is shuffle-free, but only while the whole bitmap still fits in — and
  is re-shipped through — driver memory; past that regime this shuffle
  IS the scalable shape).
- **exactness**: identical contract to :func:`seen.dedup_new` — the
  probe only prunes; every ``maybe_seen`` candidate goes through the
  exact ``left_anti`` join, so a false positive is kept and a wrongly
  dropped URL is impossible.

Checkpoint/resume: the filter is already a DataFrame — the run store
writes it as a parquet table (``RunStore.save_sharded`` /
``load_sharded``), which is also what a real deployment would pin to
the Iceberg catalog next to the seen table.

Reference semantics replaced: memorious's Redis ``tags`` membership
checks (memorious/logic/context.py:114-148), one round-trip per URL.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from memorious_spark.operators.seen import (
    _MASK, _MULT, _bloom_params, _or_hashes,
)

__all__ = [
    "ShardedBloom",
    "build_sharded_bloom",
    "update_sharded",
    "dedup_new_sharded",
]

_FILTER_SCHEMA = "shard int, bm binary"


@dataclass
class ShardedBloom:
    """Handle to an executor-resident sharded bloom: the shard table
    plus the (driver-known, constant) geometry. ``df`` rows exist only
    for shards that have ever seen a key — an absent shard reads as
    all-zeros."""

    df: DataFrame
    shards: int
    m: int  # bits per shard
    k: int  # probes per key
    capacity: int  # designed total key capacity (resize trigger)


def _shard_col(key: str, shards: int):
    return F.pmod(F.col(key), F.lit(shards)).cast("int")


def build_sharded_bloom(
    df: DataFrame,
    key: str,
    expected: int,
    shards: int | None = None,
    fpp: float = 0.01,
) -> ShardedBloom:
    """Distributed build: size each shard's bitmap for
    ``expected / shards`` keys (xxhash64 routing is uniform), then run
    one :func:`update_sharded` pass over ``df``. Nothing but task
    statuses reaches the driver."""
    spark = df.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    m, k = _bloom_params(max(1, expected // shards), fpp)
    empty = ShardedBloom(
        df=spark.createDataFrame([], _FILTER_SCHEMA),
        shards=shards, m=m, k=k, capacity=max(expected, 1),
    )
    return update_sharded(empty, df, key=key)


def update_sharded(
    bloom: ShardedBloom, new_df: DataFrame, key: str = "url_hash"
) -> ShardedBloom:
    """OR a round's new hashes into their shards — entirely on
    executors (cogrouped Arrow tasks), O(P) driver bytes. The returned
    shard table is eagerly localCheckpoint'ed: the update must be a
    MATERIALIZED fact before the next round probes it (and the
    lineage must not re-run a nondeterministic upstream), exactly the
    :func:`seen.update_bloom` false-negative contract."""
    m, k = bloom.m, bloom.k
    keys = (
        new_df.select(F.col(key).alias("_h"))
        .where(F.col("_h").isNotNull())
        .withColumn("_shard", _shard_col("_h", bloom.shards))
    )

    def orin(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left: 0/1 existing filter rows; right: the shard's new keys
        if left.empty or left["bm"].iloc[0] is None:
            arr = np.zeros((m + 7) // 8, dtype=np.uint8)
            shard = int(right["_shard"].iloc[0])
        else:
            arr = np.frombuffer(left["bm"].iloc[0], dtype=np.uint8).copy()
            shard = int(left["shard"].iloc[0])
        if not right.empty:
            hv = right["_h"].to_numpy(dtype=np.uint64, na_value=0)
            _or_hashes(arr, hv, m, k)
        return pd.DataFrame({"shard": [shard], "bm": [arr.tobytes()]})

    df = (
        bloom.df.groupby("shard")
        .cogroup(keys.groupby("_shard"))
        .applyInPandas(orin, _FILTER_SCHEMA)
        .localCheckpoint(eager=True)
    )
    old = bloom.df
    out = ShardedBloom(
        df=df, shards=bloom.shards, m=m, k=k, capacity=bloom.capacity
    )
    try:  # release the superseded checkpoint's executor storage
        old.unpersist()
    except Exception:
        pass
    return out


def dedup_new_sharded(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: ShardedBloom,
    key: str = "url_hash",
) -> DataFrame:
    """Rows of ``candidates`` whose ``key`` is not in ``seen`` — the
    sharded-probe twin of :func:`seen.dedup_new`: probe each shard's
    candidates against that shard's bitmap in its own task, then send
    only the ``maybe_seen`` survivors through the exact anti-join.
    NULL-key rows probe as not-seen (the anti-join keeps them too)."""
    if seen is None:
        return candidates
    m, k = bloom.m, bloom.k
    cands = candidates.withColumn("_shard", _shard_col(key, bloom.shards))
    out_schema = StructType(
        cands.schema.fields + [StructField("_maybe_seen", BooleanType())]
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left: the shard's candidates; right: 0/1 filter rows
        left = left.copy()
        if left.empty:
            left["_maybe_seen"] = pd.Series([], dtype=bool)
            return left
        if right.empty or right["bm"].iloc[0] is None:
            left["_maybe_seen"] = False
            return left
        arr = np.frombuffer(right["bm"].iloc[0], dtype=np.uint8)
        h = left[key]
        hv = h.to_numpy(dtype=np.uint64, na_value=0)
        hit = np.ones(len(hv), dtype=bool)
        h2 = ((hv * np.uint64(_MULT)) & np.uint64(_MASK)) | np.uint64(1)
        for i in range(k):
            idx = (hv + np.uint64(i) * h2) % np.uint64(m)
            hit &= (
                arr[(idx >> np.uint64(3)).astype(np.int64)]
                & (1 << (idx & np.uint64(7))).astype(np.uint8)
            ) != 0
        left["_maybe_seen"] = hit & h.notna().to_numpy()
        return left

    probed = (
        cands.groupby("_shard")
        .cogroup(bloom.df.groupby("shard"))
        .applyInPandas(probe, out_schema)
    )
    definitely_new = probed.filter(~F.col("_maybe_seen")).drop(
        "_maybe_seen", "_shard"
    )
    maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen", "_shard")
    seen_keys = seen.select(key).distinct()
    confirmed_new = maybe.join(seen_keys.hint("shuffle_hash"), key, "left_anti")
    return definitely_new.unionByName(confirmed_new)
