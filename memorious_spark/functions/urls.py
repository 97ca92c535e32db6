"""URL kernel: vectorized canonicalization, host extraction, hashing.

Two faces of the same contract:

- Column expressions (``*_col``) — pure ``pyspark.sql.functions``,
  JVM-side, whole-stage-codegen friendly; used in the hot crawl loop.
- Pure-Python mirrors (``py_*``) — used by the single-threaded oracle
  and by tests to pin the Column expressions to stdlib behavior.

Reference parity: rate-limit resource = ``urlparse(url).netloc``
(memorious/logic/http.py:210-211); the run-scoped dedup key is the
emitted URL string itself (memorious/operations/parse.py:55-58). We
additionally canonicalize (lowercase scheme+host, strip fragments,
drop default ports) before hashing — the dedup improvement a frontier
at 10^10 URLs needs; the canonicalizer is the SAME function on both
faces so the seen-set contract stays exact.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "host_col",
    "norm_col",
    "hash_col",
    "scheme_ok_col",
    "py_host",
    "py_norm",
]


def host_col(url: Column) -> Column:
    """Lowercased hostname of a URL column (no port)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def scheme_ok_col(url: Column) -> Column:
    """http/https scheme gate (memorious/operations/fetch.py:10-13)."""
    return F.lower(F.parse_url(url, F.lit("PROTOCOL"))).isin("http", "https")


def norm_col(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, drop fragment, drop default
    port, ensure non-empty path. Mirrors :func:`py_norm` exactly
    (property-tested in tests/test_urls.py)."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    # parse_url(.., 'HOST') excludes the port; recover it from AUTHORITY.
    authority = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    hostport = F.when(default_port, host).otherwise(F.concat(host, F.lit(":"), port))
    path = F.parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.parse_url(url, F.lit("QUERY"))
    tail = F.when(query.isNull(), path).otherwise(F.concat(path, F.lit("?"), query))
    return F.concat(scheme, F.lit("://"), hostport, tail)


def hash_col(url_norm: Column) -> Column:
    """64-bit frontier key: xxhash64 of the canonical URL."""
    return F.xxhash64(url_norm)


def py_host(url: str) -> str | None:
    """Pure-Python mirror of :func:`host_col`."""
    try:
        host = urlsplit(url).hostname
    except ValueError:
        return None
    return host.lower() if host else None


def py_norm(url: str) -> str | None:
    """Pure-Python mirror of :func:`norm_col` (oracle-side)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if not scheme or not host:
        return None
    try:
        port = parts.port
    except ValueError:
        port = None
    default = {"http": 80, "https": 443}.get(scheme)
    hostport = host if port in (None, default) else f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, hostport, path, parts.query, ""))
