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
    "registrable_domain_col",
    "py_registrable_domain",
    "PSLRules",
    "load_psl",
    "canon_col",
    "py_canon",
    "TWO_LEVEL_SUFFIXES",
    "TRACKING_PARAMS",
]

# PSL-lite: the high-traffic two-level public suffixes (a curated,
# deterministic subset of publicsuffix.org — the full list is a data
# file, not an algorithm; at production swap this frozenset for a
# broadcast table built from a pinned PSL snapshot, the call sites
# below are the seam). Sorted for reproducible plan literals.
TWO_LEVEL_SUFFIXES = tuple(sorted({
    "ac.id", "ac.il", "ac.in", "ac.jp", "ac.kr", "ac.nz", "ac.th",
    "ac.uk", "ac.za", "co.id", "co.il", "co.in", "co.jp", "co.kr",
    "co.nz", "co.th", "co.uk", "co.za", "com.ar", "com.au", "com.bd",
    "com.br", "com.cn", "com.co", "com.ec", "com.eg", "com.hk",
    "com.mx", "com.my", "com.pe", "com.ph", "com.pk", "com.pl",
    "com.sa", "com.sg", "com.tr", "com.tw", "com.ua", "com.uy",
    "com.vn", "edu.au", "edu.cn", "edu.mx", "gen.in", "go.jp",
    "go.kr", "go.th", "gob.mx", "gov.au", "gov.br", "gov.cn",
    "gov.il", "gov.in", "gov.tr", "gov.ua", "gov.uk", "gov.za",
    "govt.nz", "ne.jp", "ne.kr", "net.au", "net.br", "net.cn",
    "net.in", "net.nz", "net.pl", "net.tr", "net.uk", "net.za",
    "or.id", "or.jp", "or.kr", "or.th", "org.au", "org.br",
    "org.cn", "org.il", "org.in", "org.mx", "org.nz", "org.pl",
    "org.tr", "org.uk", "org.za", "sch.uk", "web.id", "web.za",
}))

# Click-tracking query params every production canonicalizer strips
# (exact names; utm_* is matched as a prefix).
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid")


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


class PSLRules:
    """Parsed Public Suffix List rules, grouped by label count so the
    Column expression probes one hash set per depth:

    - ``exact[k]``: k-label rules (``co.uk`` → exact[2])
    - ``wild[k]``: wildcard BASES with k labels (``*.ck`` → wild[1] =
      {"ck"}; the public suffixes it declares have k+1 labels)
    - ``exc[k]``: k-label exception names (``!www.ck`` → exc[2])

    PSL semantics (publicsuffix.org/list/): the prevailing rule is the
    exception if any matches, else the longest matching rule, else the
    implicit ``*`` (every unlisted TLD is a public suffix). The
    registrable domain is the public suffix plus one label."""

    __slots__ = ("exact", "wild", "exc", "max_labels")

    def __init__(self, rules):
        self.exact: dict[int, frozenset] = {}
        self.wild: dict[int, frozenset] = {}
        self.exc: dict[int, frozenset] = {}
        ex, wi, xc = {}, {}, {}
        for rule in rules:
            if rule.startswith("!"):
                name = rule[1:]
                xc.setdefault(name.count(".") + 1, set()).add(name)
            elif rule.startswith("*."):
                base = rule[2:]
                wi.setdefault(base.count(".") + 1, set()).add(base)
            else:
                ex.setdefault(rule.count(".") + 1, set()).add(rule)
        self.exact = {k: frozenset(v) for k, v in ex.items()}
        self.wild = {k: frozenset(v) for k, v in wi.items()}
        self.exc = {k: frozenset(v) for k, v in xc.items()}
        self.max_labels = max(
            [*self.exact, *(k + 1 for k in self.wild), *self.exc, 1]
        )


def load_psl(path: str | None = None, include_private: bool = True) -> PSLRules:
    """Parse a publicsuffix.org-format list file. ``None`` loads the
    vendored snapshot (``memorious_spark/data/
    public_suffix_snapshot.dat`` — a pinned SUBSET of the public list;
    swap the file for the full ``public_suffix_list.dat`` at
    production, the format is identical).

    ``include_private=False`` keeps only the ICANN section (the real
    file's ``===BEGIN PRIVATE DOMAINS===`` marker starts the private
    one). The PRIVATE section lists platform registries (github.io,
    blogspot.com) where each subdomain is an independent REGISTRANT —
    right for eTLD+1/cookie semantics, wrong for politeness, which
    groups by origin INFRASTRUCTURE (all of *.blogspot.com is one
    server farm and should share one budget)."""
    import pathlib

    if path is None:
        path = str(
            pathlib.Path(__file__).resolve().parent.parent
            / "data" / "public_suffix_snapshot.dat"
        )
    rules = []
    in_private = False
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("//"):
                if "BEGIN PRIVATE DOMAINS" in line:
                    in_private = True
                elif "END PRIVATE DOMAINS" in line:
                    in_private = False
                continue
            if not line or (in_private and not include_private):
                continue
            rules.append(line.split()[0].lower())
    return PSLRules(rules)


_PSL_CACHE: dict[bool, PSLRules] = {}


def _default_psl(include_private: bool = True) -> PSLRules:
    """The vendored snapshot, parsed once per driver per section
    choice; falls back to :data:`TWO_LEVEL_SUFFIXES` if the data file
    is missing (a stripped install) so politeness grouping degrades,
    never crashes."""
    if include_private not in _PSL_CACHE:
        try:
            _PSL_CACHE[include_private] = load_psl(
                include_private=include_private
            )
        except OSError:
            _PSL_CACHE[include_private] = PSLRules(TWO_LEVEL_SUFFIXES)
    return _PSL_CACHE[include_private]


def registrable_domain_col(
    host: Column,
    rules: PSLRules | None = None,
    include_private: bool = True,
) -> Column:
    """Registrable domain of a (lowercased) hostname: the label left
    of the public suffix — ``news.bbc.co.uk`` → ``bbc.co.uk``,
    ``a.b.example.com`` → ``example.com``, ``alice.github.io`` →
    ``alice.github.io`` (private-section registry).

    Two consumers, two section choices (``include_private``, ignored
    when explicit ``rules`` are passed): eTLD+1 semantics (dedup
    keys, cookie-style scoping) want the FULL list — each github.io
    site is its own registrant. POLITENESS wants ICANN-only
    (``include_private=False``): ten thousand ``*.blogspot.com``
    subdomains resolve to ONE origin infrastructure, and a
    per-registrant budget would multiply the configured rate by the
    subdomain count — exactly what domain grouping exists to stop.

    Full PSL semantics over the vendored snapshot (:func:`load_psl`):
    longest-rule match with wildcard (``*.ck``) and exception
    (``!www.ck``) rules; unlisted TLDs take the implicit ``*`` rule.
    Pure Column — the rule sets compile to per-depth InSet hash
    probes, JVM-side and codegen-friendly (the full 15k-rule public
    list stays a few-hundred-KB plan literal; past that, the same
    per-depth sets would ship as a broadcast join on the suffix key).
    Hosts that ARE a public suffix, 1-label hosts, and IPv4 literals
    pass through unchanged."""
    rules = rules or _default_psl(include_private)
    parts = F.split(host, r"\.")
    n = F.size(parts)

    def lastk(k: int) -> Column:
        # try_element_at: a shorter host yields NULLs, concat_ws skips
        # them, and the (n >= k) guard rejects the row anyway — while
        # plain element_at would THROW under ANSI even inside a guarded
        # branch (subexpression elimination hoists it out of the when)
        return F.concat_ws(
            ".", *[F.try_element_at(parts, F.lit(-i)) for i in range(k, 0, -1)]
        )

    # precedence: exceptions (longest first) beat every rule; then the
    # longest matching exact/wildcard rule; implicit "*" default → 1
    ps = None
    for k in sorted(rules.exc, reverse=True):
        cond = (n >= k) & lastk(k).isin(*rules.exc[k])
        ps = F.when(cond, k - 1) if ps is None else ps.when(cond, k - 1)
    for k in range(rules.max_labels, 1, -1):
        cond = None
        if k in rules.exact:
            cond = (n >= k) & lastk(k).isin(*rules.exact[k])
        if (k - 1) in rules.wild:
            wcond = (n >= k) & lastk(k - 1).isin(*rules.wild[k - 1])
            cond = wcond if cond is None else (cond | wcond)
        if cond is not None:
            ps = F.when(cond, k) if ps is None else ps.when(cond, k)
    ps = F.lit(1) if ps is None else ps.otherwise(1)

    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return (
        F.when(is_ip | (n <= ps), host)
        .otherwise(F.concat_ws(".", F.slice(parts, n - ps, ps + 1)))
    )


def py_registrable_domain(
    host: str,
    rules: PSLRules | None = None,
    include_private: bool = True,
) -> str:
    """Pure-Python mirror of :func:`registrable_domain_col` (oracle/
    test face) — identical precedence: exception > longest rule > the
    implicit ``*``."""
    import re

    rules = rules or _default_psl(include_private)
    if re.fullmatch(r"\d+\.\d+\.\d+\.\d+", host):
        return host
    parts = host.split(".")
    n = len(parts)
    ps = None
    for k in sorted(rules.exc, reverse=True):
        if n >= k and ".".join(parts[-k:]) in rules.exc[k]:
            ps = k - 1
            break
    if ps is None:
        for k in range(rules.max_labels, 1, -1):
            if k in rules.exact and n >= k and ".".join(parts[-k:]) in rules.exact[k]:
                ps = k
                break
            if (
                (k - 1) in rules.wild and n >= k
                and ".".join(parts[-(k - 1):]) in rules.wild[k - 1]
            ):
                ps = k
                break
    if ps is None:
        ps = 1
    if n <= ps:
        return host
    return ".".join(parts[-(ps + 1):])


def py_canon(url: str) -> str | None:
    """Pure-Python mirror of :func:`canon_col` (oracle/test face)."""
    base = py_norm(url)
    if base is None:
        return None
    try:
        query = urlsplit(url).query
    except ValueError:
        return None
    path_part = base.split("?", 1)[0]
    kept = sorted(
        p
        for p in query.split("&")
        if p != ""
        and not p.startswith("utm_")
        and p.split("=", 1)[0] not in TRACKING_PARAMS
    )
    return path_part + ("?" + "&".join(kept) if kept else "")


def canon_col(url: Column) -> Column:
    """Aggressive canonical form for DEDUP (not for fetching): the
    :func:`norm_col` canonicalization plus query-param SORTING and
    tracking-param removal (``utm_*`` prefix + :data:`TRACKING_PARAMS`).
    ``?b=2&a=1&utm_source=x`` and ``?a=1&b=2`` collapse to one frontier
    key. Kept SEPARATE from ``norm_col`` on purpose: the reference's
    seen-set contract (crawl ordering, url_norm equality) is defined
    over the conservative form; this stricter key is the opt-in
    duplicate-collapse a 10^10-URL frontier wants. Pure Column —
    split/filter/sort/join, no UDF."""
    base = norm_col(url)
    q = F.parse_url(url, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~F.substring_index(p, "=", 1).isin(*TRACKING_PARAMS),
        )
    )
    path_part = F.substring_index(base, "?", 1)
    return F.when(
        q.isNull() | (F.size(kept) == 0), path_part
    ).otherwise(
        F.concat(path_part, F.lit("?"), F.array_join(kept, "&"))
    )
