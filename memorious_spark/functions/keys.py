"""Key helpers: make_key / make_id.

``make_key`` is servicelayer's ``:``-joined key builder (used at every
tag site, e.g. memorious/logic/context.py:116); ``make_id`` is
**sha1**(make_key) exactly as memorious/helpers/key.py:6-10 — the
round-1 engine used sha2-256 here, which was self-consistent but not
reference-faithful. DuckDB has no sha1, so the driver oracle checks
the key text + digest shape; byte-exactness vs hashlib.sha1 is pinned
in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["make_key", "make_id"]


def make_key(*parts: Column) -> Column:
    """``:``-joined key; null parts collapse like servicelayer's
    skip-None behaviour (concat_ws skips nulls)."""
    return F.concat_ws(":", *parts)


def make_id(*parts: Column) -> Column:
    """sha1 hex digest of make_key (memorious/helpers/key.py:6-10)."""
    return F.sha1(F.encode(make_key(*parts), "utf-8"))
