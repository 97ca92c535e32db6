"""PII detection and redaction for webtext corpora.

Training-data pipelines scrub personally-identifiable strings before
tokenization (the BigScience ROOTS / BigCode StarCoder preprocessing
step: regex-class redaction of emails, IPs and phone-like numbers,
each class replaced by a stable placeholder token so downstream dedup
and token counts stay deterministic). The reference crawler stores
raw pages (memorious/operations/store.py) and has no curation layer;
this extends the engine's corpus-curation surface alongside
``functions/quality.py``.

Design posture for 100 TB:

- Detection and redaction are pure Column expressions — three
  ``regexp_*`` passes inside whole-stage codegen, zero Python, zero
  shuffles. A full-corpus scrub is exactly one scan.
- Patterns are deliberately restricted to the syntax subset on which
  ``java.util.regex`` (Spark) and RE2 (DuckDB) agree — no lookaround,
  no backreferences — so every count and every replaced byte has an
  exact ANSI-SQL twin for the driver oracle.
- Redaction order is pinned (email → IPv4 → phone): placeholder
  tokens contain no digits or ``@``, so later passes can never match
  inside an earlier replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "EMAIL_RE",
    "IPV4_RE",
    "PHONE_RE",
    "pii_metrics",
    "pii_scrub",
]

# RFC-5322-lite: the practical address shape (the full grammar needs
# quoting/comments no corpus scrubber attempts).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# Dotted quad with word boundaries. Deliberately allows 999.0.0.1 —
# octet-range narrowing needs alternations both engines order
# identically; the standard scrub over-matches here by design.
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# Phone-like: optional +, then a 9..18-char span of digits riding
# separators (space dot dash parens), digit-anchored on both ends.
# The bound is on the SPAN (separators included — "+1 (555) 123-4567"
# is 15 interior chars), chosen so every national format fits while
# 4-digit years and short codes stay out; greedy bounded repetition
# with no lookaround matches identically in java.util.regex and RE2.
PHONE_RE = r"\+?[0-9](?:[0-9().\-\s]{7,16})[0-9]"


def pii_metrics(text: Column) -> dict[str, Column]:
    """Per-document PII hit counts as named pure-Column expressions:
    ``n_emails``, ``n_ipv4``, ``n_phones``. Returned as a dict so
    unused counts are pruned by Catalyst, not computed.

    Counts are taken in redaction order on the progressively
    scrubbed text (phones counted AFTER emails/IPs are cut), so
    ``n_phones`` never double-counts the digits of an IP and the
    counts always equal the number of placeholders ``pii_scrub``
    would emit."""
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)).cast("long"),
        "n_ipv4": F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long"),
        "n_phones": F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long"),
    }


def pii_scrub(text: Column) -> Column:
    """Redacted text: emails → ``<EMAIL>``, IPv4s → ``<IP>``,
    phone-like digit runs → ``<PHONE>``, in that pinned order. One
    codegen'd expression (three chained ``regexp_replace``)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")
