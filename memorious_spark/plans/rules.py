"""Rule DSL compiler: YAML rule spec → Spark ``Column`` predicate.

The reference dispatches single-key nested dicts to rule classes at
task time (memorious/helpers/rule.py:22-35, registry :156-167); we
compile the same spec shape ONCE, driver-side, into a boolean Column
that Catalyst folds into scans — URL-only rules never touch the
``html``/``text`` columns (the lazy-fetch economy of
memorious/operations/fetch.py:16 becomes plain column pruning).

Semantics table (each ↔ reference helpers/rule.py lines):
- ``or``/``any`` :51-58, ``and``/``all`` :61-68, ``not`` :71-78,
  ``match_all`` :81-85
- ``mime_type`` :88-93 — equality on normalized mime
- ``mime_group`` :96-100 — ``group/`` prefix OR membership
- ``domain`` :103-128 — host equals or dot-suffix match
- ``pattern`` :131-140 — ``re.match`` (anchored at position 0!),
  case-insensitive → ``rlike('(?i)^...')``
- ``xpath`` :143-153 — the reference checks ``xpath(...) is not
  None``, and lxml xpath returns ``[]`` (non-None) for every parsed
  doc, so the rule is effectively "document parses as HTML". We
  reproduce that quirk faithfully: true iff ``text`` parses.

A pure-Python twin (:func:`compile_py`) evaluates the same spec over
a plain dict row — the oracle crawler uses it so the Spark engine and
the reference-faithful loop gate with literally the same spec.
"""

from __future__ import annotations

import re
from functools import reduce
from operator import and_, or_
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from memorious_spark.functions import htmlkit
from memorious_spark.functions.mime import GROUPS, normalize_mimetype
from memorious_spark.functions.urls import host_col, py_host

__all__ = ["RuleError", "compile_rule", "compile_py", "uses_text"]


def uses_text(spec: dict | None) -> bool:
    """True if the rule tree contains an xpath leaf (the only rule
    needing the decoded body) — callers use this to decide whether the
    gate can run before text extraction (lazy-fetch economy) or must
    run after."""
    if not isinstance(spec, dict):
        return False
    [(name, value)] = spec.items() if len(spec) == 1 else [(None, None)]
    if name == "xpath":
        return True
    if name in ("or", "any", "and", "all"):
        return any(uses_text(c) for c in value)
    if name == "not":
        return uses_text(value)
    return False


class RuleError(ValueError):
    """Raised on ambiguous or unknown rule specs."""


_COMBINATORS = {"or", "any", "and", "all", "not"}
_LEAVES = {"match_all", "mime_type", "mime_group", "domain", "pattern", "xpath"}


def _unpack(spec: dict) -> tuple[str, Any]:
    if not isinstance(spec, dict) or len(spec) != 1:
        raise RuleError(f"ambiguous rule spec (need exactly one key): {spec!r}")
    [(name, value)] = spec.items()
    if name not in _COMBINATORS | _LEAVES:
        raise RuleError(f"unknown rule: {name!r}")
    return name, value


def _clean_domain(value: str) -> str:
    value = value.strip().lower()
    value = re.sub(r"^https?://", "", value)
    return value.strip(".").split("/", 1)[0]


@F.pandas_udf(BooleanType())
def _parses_as_html(text: pd.Series) -> pd.Series:  # pragma: no cover (executor)
    return text.map(lambda t: t is not None and htmlkit.parse_html(t) is not None)


def compile_rule(
    spec: dict | None,
    url: str = "url",
    content_type: str = "content_type",
    text: str = "text",
) -> Column:
    """Compile a rule spec into a boolean Column over the given columns.

    ``None`` spec → always-true (the reference defaults to MatchAllRule
    when no rules are configured, memorious/operations/fetch.py:17-20).
    """
    if spec is None:
        return F.lit(True)
    name, value = _unpack(spec)
    if name in ("or", "any"):
        return reduce(or_, (compile_rule(c, url, content_type, text) for c in value))
    if name in ("and", "all"):
        return reduce(and_, (compile_rule(c, url, content_type, text) for c in value))
    if name == "not":
        return ~compile_rule(value, url, content_type, text)
    if name == "match_all":
        return F.lit(True)
    if name == "mime_type":
        return F.col(content_type) == F.lit(normalize_mimetype(value))
    if name == "mime_group":
        group = str(value).lower()
        members = GROUPS.get(group, [])
        return F.col(content_type).startswith(group + "/") | F.col(
            content_type
        ).isin(members)
    if name == "domain":
        domain = _clean_domain(value)
        host = host_col(F.col(url))
        return (host == F.lit(domain)) | host.endswith("." + domain)
    if name == "pattern":
        return F.col(url).rlike("(?i)^(?:" + str(value) + ")")
    if name == "xpath":
        # Faithful quirk: true iff the document parses (see module doc).
        return _parses_as_html(F.col(text))
    raise RuleError(name)  # unreachable


def compile_py(spec: dict | None) -> Callable[[dict], bool]:
    """Pure-Python twin of :func:`compile_rule` over dict rows.

    Rows use keys ``url``, ``content_type``, ``text``. Used by the
    oracle crawler so both engines evaluate the identical spec.
    """
    if spec is None:
        return lambda row: True
    name, value = _unpack(spec)
    if name in ("or", "any"):
        children = [compile_py(c) for c in value]
        return lambda row: any(c(row) for c in children)
    if name in ("and", "all"):
        children = [compile_py(c) for c in value]
        return lambda row: all(c(row) for c in children)
    if name == "not":
        child = compile_py(value)
        return lambda row: not child(row)
    if name == "match_all":
        return lambda row: True
    if name == "mime_type":
        want = normalize_mimetype(value)
        return lambda row: row.get("content_type") == want
    if name == "mime_group":
        group = str(value).lower()
        members = set(GROUPS.get(group, []))
        return lambda row: (ct := row.get("content_type")) is not None and (
            ct.startswith(group + "/") or ct in members
        )
    if name == "domain":
        domain = _clean_domain(value)
        suffix = "." + domain

        def _domain(row: dict) -> bool:
            host = py_host(row.get("url") or "")
            return host is not None and (host == domain or host.endswith(suffix))

        return _domain
    if name == "pattern":
        rx = re.compile(str(value), re.I | re.U)
        return lambda row: rx.match(row.get("url") or "") is not None
    if name == "xpath":
        return lambda row: row.get("text") is not None and htmlkit.parse_html(
            row["text"]
        ) is not None
    raise RuleError(name)  # unreachable
