"""Fuzzy date parsing — the ``parse_date`` / ``iso_date`` helpers of
memorious/helpers/dates.py:6-31, as a pure-Python kernel shared by the
parse UDF and the reference-faithful oracle (same import, same bytes).

The reference delegates fuzzy parsing to ``dateparser`` (not available
in this environment); this stand-in covers the formats web pages
actually wrap dates in — ISO, slashed/dotted numerics, English month
names, and German/French/Spanish month names ("5. Januar 2024",
"le 5 janvier 2024", "5 de enero de 2024" — the corpus's non-English
languages), embedded in surrounding prose — via a pinned format list
+ candidate extraction. ``format_hint`` takes the exact
``datetime.strptime`` path of the reference. Timezone-aware results
normalize to naive UTC (``naive_datetime``, dates.py:25-31).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import pandas as pd

__all__ = ["py_parse_date", "py_iso_date", "iso_date_udf"]

# tried in order; first success wins (pinned so engine == oracle)
_FORMATS = [
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%d.%m.%Y",
    "%d/%m/%Y",
    "%B %d, %Y",
    "%b %d, %Y",
    "%d %B %Y",
    "%d %b %Y",
]

# substrings worth trying when the whole string isn't a date
_CANDIDATE_RES = [
    re.compile(r"\d{4}-\d{2}-\d{2}(?:[T ]\d{2}:\d{2}:\d{2}(?:[+-]\d{2}:?\d{2})?)?"),
    re.compile(r"\d{1,2}[./]\d{1,2}[./]\d{4}"),
    re.compile(
        r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|"
        r"Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|"
        r"Dec(?:ember)?)\.?\s+\d{1,2},?\s+\d{4}",
        re.IGNORECASE,
    ),
    re.compile(
        r"\d{1,2}\s+(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
        r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
        r"Nov(?:ember)?|Dec(?:ember)?)\.?\s+\d{4}",
        re.IGNORECASE,
    ),
]


# non-English month names (the dateparser-locale subset the corpus's
# languages need: de/fr/es; lowercase, accent variants included)
_MONTHS_I18N = {
    "januar": 1, "februar": 2, "märz": 3, "maerz": 3, "april": 4,
    "mai": 5, "juni": 6, "juli": 7, "august": 8, "september": 9,
    "oktober": 10, "november": 11, "dezember": 12,
    "janvier": 1, "février": 2, "fevrier": 2, "mars": 3, "avril": 4,
    "juin": 6, "juillet": 7, "août": 8, "aout": 8, "septembre": 9,
    "octobre": 10, "novembre": 11, "décembre": 12, "decembre": 12,
    "enero": 1, "febrero": 2, "marzo": 3, "abril": 4, "mayo": 5,
    "junio": 6, "julio": 7, "agosto": 8, "septiembre": 9,
    "octubre": 10, "noviembre": 11, "diciembre": 12,
}

# "5. Januar 2024" / "le 5 janvier 2024" / "5 de enero de 2024"
_I18N_RE = re.compile(
    r"(\d{1,2})\.?(?:\s+de)?\s+([a-zA-ZäöüßéèêûàâôîÀ-ÿ]+)\.?(?:\s+de)?\s+(\d{4})"
)


def _naive(dt: datetime | None) -> datetime | None:
    """tz-aware → naive UTC (helpers/dates.py:25-31)."""
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _try_formats(text: str) -> datetime | None:
    for fmt in _FORMATS:
        try:
            return datetime.strptime(text, fmt)
        except ValueError:
            continue
    return None


def py_parse_date(text: str | None, format_hint: str | None = None):
    if text is None:
        return None
    if format_hint is not None:
        try:
            return _naive(datetime.strptime(text, format_hint))
        except ValueError:
            return None
    cleaned = str(text).strip("[] ")
    parsed = _try_formats(cleaned)
    if parsed is None:
        # fuzzy path: pull a date-shaped substring out of prose, the
        # way dateparser's search does
        for rx in _CANDIDATE_RES:
            m = rx.search(cleaned)
            if m:
                cand = m.group(0).replace(",", ", ").replace(",  ", ", ")
                cand = re.sub(r"\s+", " ", cand)
                # normalize a +HHMM offset without colon for %z
                parsed = _try_formats(cand) or _try_formats(
                    cand.replace(".", "", 1) if cand[:1].isalpha() else cand
                )
                if parsed is not None:
                    break
    if parsed is None:
        # de/fr/es month-name shapes (dateparser-locale stand-in)
        for m in _I18N_RE.finditer(cleaned):
            month = _MONTHS_I18N.get(m.group(2).lower())
            if month is None:
                continue
            try:
                parsed = datetime(int(m.group(3)), month, int(m.group(1)))
                break
            except ValueError:
                continue
    return _naive(parsed)


def py_iso_date(text: str | None, format_hint: str | None = None) -> str | None:
    """isoformat of the parsed date, None when unparseable
    (helpers/dates.py:19-23)."""
    parsed = py_parse_date(text, format_hint)
    return parsed.isoformat() if parsed is not None else None


def iso_date_udf():
    """Arrow-batched column form of :func:`py_iso_date`."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _iso(s: pd.Series) -> pd.Series:  # pragma: no cover (executor)
        return s.map(py_iso_date)

    return _iso
