"""The URL-seen set: bloom pre-filter + exact anti-join dedup.

Replaces memorious's Redis/SQL ``tags`` lookups (one round-trip per
URL, memorious/logic/context.py:114-148; run-scoped link dedup
memorious/operations/parse.py:55-58) with one distributed anti-join
per frontier round — the scalability pivot of this graft.

Scale design (10^10-URL frontier):
- Candidates are pre-hashed (``url_hash = xxhash64(url_norm)``); the
  seen table stores only hashes + scope columns, bucketable by
  ``url_hash`` so the anti-join co-partitions without a re-shuffle.
- A broadcast Bloom filter (``df.stat.bloomFilter``) built over the
  *seen* side prunes the candidate shuffle before the exact anti-join.
  The bloom is a bandwidth optimization only: false positives are
  caught (kept) by the exact anti-join that follows, so no URL is ever
  wrongly dropped. Build cost is one scan of the seen side; skip it
  when the seen side is small enough to broadcast-anti-join directly.
- Expiry (`expires_at`) reproduces the reference's ``expire × 84600``
  quirk (sic, not 86400 — memorious/logic/crawler.py:50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["EXPIRE_QUIRK_SECONDS", "dedup_new", "seen_entries"]

# The reference multiplies `expire` (days) by 84600 — a long-standing
# off-by-1800 quirk we reproduce for parity (memorious/logic/crawler.py:50).
EXPIRE_QUIRK_SECONDS = 84600

# Below this many distinct seen hashes, skip the bloom and let Spark
# broadcast the anti-join side directly.
_BLOOM_MIN_ROWS = 4_000_000
_BLOOM_FPP = 0.01


def dedup_new(
    candidates: DataFrame,
    seen: DataFrame | None,
    key: str = "url_hash",
    seen_count: int | None = None,
) -> DataFrame:
    """Rows of ``candidates`` whose ``key`` is not in ``seen``.

    Exactness is guaranteed by the final ``left_anti`` join; the bloom
    probe (only engaged for large seen sides) just cuts shuffle volume.
    ``seen_count`` — if the caller tracked it from round metrics —
    picks the strategy without an extra count job.
    """
    if seen is None:
        return candidates
    seen_keys = seen.select(key).distinct()
    if seen_count is not None and seen_count >= _BLOOM_MIN_ROWS:
        bloom = seen_keys.stat.bloomFilter(key, seen_count, _BLOOM_FPP)
        bloom_bc = candidates.sparkSession.sparkContext.broadcast(bloom)

        @F.udf("boolean")
        def _maybe_seen(h):  # pragma: no cover (executor)
            return h is not None and bloom_bc.value.mightContain(h)

        definitely_new = candidates.filter(~_maybe_seen(F.col(key)))
        maybe = candidates.filter(_maybe_seen(F.col(key)))
        confirmed_new = maybe.join(seen_keys, key, "left_anti")
        return definitely_new.unionByName(confirmed_new)
    return candidates.join(seen_keys, key, "left_anti")


def seen_entries(
    df: DataFrame,
    crawler: str,
    run_id: str,
    kind: str,
    key: str = "url_hash",
    expire_days: int | None = None,
    now_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Project rows into the seen-table schema (FIXTURES.md §4)."""
    created = F.to_timestamp(F.lit(now_ts))
    expires = (
        created + F.expr(f"INTERVAL {expire_days * EXPIRE_QUIRK_SECONDS} SECONDS")
        if expire_days
        else F.lit(None).cast("timestamp")
    )
    return df.select(
        F.col(key).alias("key_hash"),
        F.lit(crawler).alias("crawler"),
        F.lit(run_id).alias("run_id"),
        F.lit(kind).alias("kind"),
        F.lit(None).cast("string").alias("value"),
        created.alias("created_at"),
        expires.alias("expires_at"),
    )
