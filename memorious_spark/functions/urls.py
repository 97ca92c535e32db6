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

from memorious_spark.functions.hof import bind_once

__all__ = [
    "host_col",
    "norm_col",
    "hash_col",
    "scheme_ok_col",
    "py_host",
    "py_norm",
    "trap_signals",
    "is_trap_col",
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


def trap_signals(url: Column) -> dict[str, Column]:
    """Crawler-trap signals for a URL column — the standard decide-rule
    family every production crawler gates its frontier with (Heritrix's
    PathologicalPathDecideRule / TooManyPathSegmentsDecideRule /
    TooLongDecideRule; the reference has no frontier so it never needed
    them, but a 10^10-URL frontier fills with calendar pages and
    session-id loops without these).

    Returns pure-Column signals (all codegen-friendly, shareable
    through one bound segment array):

    - ``n_segments``   — path segments (empty segments from ``//`` and
      the leading ``/`` excluded)
    - ``max_seg_run``  — longest CONSECUTIVE run of one repeated path
      segment (``/a/b/a/b`` is fine; ``/a/a/a`` is a run of 3 — the
      pathological-path signal; backreference-free so the DuckDB twin
      is exact, RE2 has no backrefs)
    - ``n_qparams``    — query parameters (``&``-separated)
    - ``url_len``      — total URL string length
    """
    path = F.parse_url(url, F.lit("PATH"))
    segs = F.filter(
        F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != ""
    )
    query = F.parse_url(url, F.lit("QUERY"))

    def run_len(s: Column) -> Column:
        n = F.size(s)
        # longest run ending at i, folded left to right: the aggregate
        # state is (current_run, best_run); one pass, no re-split
        state = F.aggregate(
            F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
            F.struct(
                F.lit(1).alias("cur"),
                F.least(n, F.lit(1)).alias("best"),
            ),
            lambda acc, i: F.when(
                (i <= n)
                & (F.element_at(s, i) == F.element_at(s, i - 1)),
                F.struct(
                    (acc["cur"] + 1).alias("cur"),
                    F.greatest(acc["cur"] + 1, acc["best"]).alias("best"),
                ),
            ).otherwise(
                F.struct(F.lit(1).alias("cur"), acc["best"].alias("best"))
            ),
        )
        return state["best"]

    return {
        "n_segments": bind_once(segs, F.size),
        "max_seg_run": bind_once(segs, run_len),
        "n_qparams": F.when(query.isNull() | (query == ""), F.lit(0)).otherwise(
            F.size(F.split(query, "&"))
        ),
        "url_len": F.length(url),
    }


def is_trap_col(
    url: Column,
    max_segments: int = 20,
    max_seg_run: int = 2,
    max_qparams: int = 16,
    max_len: int = 2048,
) -> Column:
    """True when any trap signal fires — the frontier gate. Defaults
    follow Heritrix's shipped decide-rules: >20 path segments, a path
    segment repeated ≥3× consecutively, plus query-blowup and raw
    length caps for session-id/calendar loops."""
    s = trap_signals(url)
    return (
        (s["n_segments"] > max_segments)
        | (s["max_seg_run"] > max_seg_run)
        | (s["n_qparams"] > max_qparams)
        | (s["url_len"] > max_len)
    )
