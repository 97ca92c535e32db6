"""Fuzzy date parsing — the ``parse_date`` / ``iso_date`` helpers of
memorious/helpers/dates.py:6-31, as a pure-Python kernel shared by the
parse UDF and the reference-faithful oracle (same import, same bytes).

The reference delegates fuzzy parsing to ``dateparser`` (not available
in this environment); this stand-in covers the formats web pages
actually wrap dates in — ISO, slashed/dotted numerics, English month
names, and de/fr/es/it/pt/nl/pl month names ("5. Januar 2024",
"le 5 janvier 2024", "5 de enero de 2024", "5 gennaio 2024",
"5 de janeiro de 2024", "5 stycznia 2024"), embedded in surrounding
prose — via a pinned format list
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


# non-English month names (the dateparser-locale subset the engine's
# corpus languages need: de/fr/es/it/pt/nl/pl; lowercase, accent and
# ASCII-fallback variants included; overlapping spellings across
# languages — marzo/agosto/juni/november/… — all map to the same
# month, so the union is collision-free)
_MONTHS_I18N = {
    # de
    "januar": 1, "februar": 2, "märz": 3, "maerz": 3, "april": 4,
    "mai": 5, "juni": 6, "juli": 7, "august": 8, "september": 9,
    "oktober": 10, "november": 11, "dezember": 12,
    # fr
    "janvier": 1, "février": 2, "fevrier": 2, "mars": 3, "avril": 4,
    "juin": 6, "juillet": 7, "août": 8, "aout": 8, "septembre": 9,
    "octobre": 10, "novembre": 11, "décembre": 12, "decembre": 12,
    # es
    "enero": 1, "febrero": 2, "marzo": 3, "abril": 4, "mayo": 5,
    "junio": 6, "julio": 7, "agosto": 8, "septiembre": 9,
    "octubre": 10, "noviembre": 11, "diciembre": 12,
    # it
    "gennaio": 1, "febbraio": 2, "aprile": 4, "maggio": 5,
    "giugno": 6, "luglio": 7, "settembre": 9, "ottobre": 10,
    "dicembre": 12,
    # pt
    "janeiro": 1, "fevereiro": 2, "março": 3, "marco": 3, "maio": 5,
    "junho": 6, "julho": 7, "setembro": 9, "outubro": 10,
    "novembro": 11, "dezembro": 12,
    # nl
    "januari": 1, "februari": 2, "maart": 3, "mei": 5,
    "augustus": 8, "december": 12,
    # pl (dates use the genitive: "5 stycznia 2024"; nominative and
    # ASCII fallbacks included)
    "styczeń": 1, "styczen": 1, "stycznia": 1,
    "luty": 2, "lutego": 2,
    "marzec": 3, "marca": 3,
    "kwiecień": 4, "kwiecien": 4, "kwietnia": 4,
    "maj": 5, "maja": 5,
    "czerwiec": 6, "czerwca": 6,
    "lipiec": 7, "lipca": 7,
    "sierpień": 8, "sierpien": 8, "sierpnia": 8,
    "wrzesień": 9, "wrzesien": 9, "września": 9, "wrzesnia": 9,
    "październik": 10, "pazdziernik": 10,
    "października": 10, "pazdziernika": 10,
    "listopad": 11, "listopada": 11,
    "grudzień": 12, "grudzien": 12, "grudnia": 12,
}

# "5. Januar 2024" / "le 5 janvier 2024" / "5 de enero de 2024" /
# "5 de janeiro de 2024" / "5 gennaio 2024" / "5 stycznia 2024" —
# the word class covers Latin-1 accents (À-ÿ) AND Latin Extended-A
# (Ā-ſ: Polish ś/ż/ń/ę/ą, etc.)
_I18N_RE = re.compile(
    r"(\d{1,2})\.?(?:\s+de)?\s+"
    r"([a-zA-ZäöüßéèêûàâôîÀ-ÿĀ-ſ]+)\.?(?:\s+de)?\s+(\d{4})"
)


# ---- relative dates (dateparser's other big family) -----------------
# "3 days ago" / "vor 3 Tagen" / "il y a 3 jours" / "hace 3 días",
# plus yesterday/today/tomorrow in the same four languages. dateparser
# resolves these against datetime.now() per call — nondeterministic
# and executor-local; here the base is INJECTED (``now``), pinned once
# on the driver so a whole distributed run resolves "yesterday" to the
# same instant on every executor (and the DuckDB oracle, which imports
# this very kernel, agrees byte-for-byte).

_REL_UNITS = {
    # en
    "second": "seconds", "seconds": "seconds", "minute": "minutes",
    "minutes": "minutes", "hour": "hours", "hours": "hours",
    "day": "days", "days": "days", "week": "weeks", "weeks": "weeks",
    "month": "months", "months": "months", "year": "years",
    "years": "years",
    # de (vor 3 Tagen / vor einer Stunde)
    "sekunde": "seconds", "sekunden": "seconds", "minuten": "minutes",
    "stunde": "hours", "stunden": "hours", "tag": "days",
    "tagen": "days", "woche": "weeks", "wochen": "weeks",
    "monat": "months", "monaten": "months", "jahr": "years",
    "jahren": "years",
    # fr (il y a 3 jours)
    "seconde": "seconds", "secondes": "seconds",
    "heure": "hours", "heures": "hours", "jour": "days",
    "jours": "days", "semaine": "weeks", "semaines": "weeks",
    "mois": "months", "an": "years", "ans": "years",
    "année": "years", "années": "years", "annee": "years",
    "annees": "years",
    # es (hace 3 días) — segundo/minuto/hora/dia/semana/mes/ano forms
    # are shared letter-for-letter with pt, one mapping covers both
    "segundo": "seconds", "segundos": "seconds", "minuto": "minutes",
    "minutos": "minutes", "hora": "hours", "horas": "hours",
    "día": "days", "días": "days", "dia": "days", "dias": "days",
    "semana": "weeks", "semanas": "weeks", "mes": "months",
    "meses": "months", "año": "years", "años": "years",
    "ano": "years", "anos": "years",
    # pt extras (há 3 dias — "mês" is the only spelling es lacks)
    "mês": "months",
    # it (3 giorni fa)
    "secondi": "seconds", "minuti": "minutes", "ora": "hours",
    "ore": "hours", "giorno": "days", "giorni": "days",
    "settimana": "weeks", "settimane": "weeks", "mese": "months",
    "mesi": "months", "anno": "years", "anni": "years",
    # nl (3 dagen geleden)
    "seconden": "seconds", "minuut": "minutes", "uur": "hours",
    "uren": "hours", "dag": "days", "dagen": "days",
    "weken": "weeks", "maand": "months", "maanden": "months",
    "jaar": "years", "jaren": "years",
    # pl (3 dni temu) — counted nouns decline; all case forms listed
    "sekunda": "seconds", "sekundy": "seconds", "sekund": "seconds",
    "minuta": "minutes", "minuty": "minutes", "minut": "minutes",
    "godzina": "hours", "godziny": "hours", "godzin": "hours",
    "dzień": "days", "dzien": "days", "dni": "days",
    "tydzień": "weeks", "tydzien": "weeks", "tygodnie": "weeks",
    "tygodni": "weeks",
    "miesiąc": "months", "miesiac": "months", "miesiące": "months",
    "miesiace": "months", "miesięcy": "months", "miesiecy": "months",
    "rok": "years", "lata": "years", "lat": "years",
}
# fr/es share "minute(s)" spellings with en; de "minuten" added above.
_REL_UNITS.setdefault("minute", "minutes")

_WORD_NUMS = {
    "a": 1, "an": 1, "one": 1, "ein": 1, "eine": 1, "einer": 1,
    "einem": 1, "un": 1, "une": 1, "uno": 1, "una": 1,
    "um": 1, "uma": 1, "een": 1, "jeden": 1, "jedna": 1,
}

_UNIT_ALT = "|".join(sorted(_REL_UNITS, key=len, reverse=True))
_REL_RES = [
    # en: "3 days ago"
    re.compile(rf"\b(\d+|\w+)\s+({_UNIT_ALT})\s+ago\b", re.IGNORECASE),
    # de: "vor 3 Tagen"
    re.compile(rf"\bvor\s+(\d+|\w+)\s+({_UNIT_ALT})\b", re.IGNORECASE),
    # fr: "il y a 3 jours"
    re.compile(rf"\bil\s+y\s+a\s+(\d+|\w+)\s+({_UNIT_ALT})\b", re.IGNORECASE),
    # es: "hace 3 días"
    re.compile(rf"\bhace\s+(\d+|\w+)\s+({_UNIT_ALT})\b", re.IGNORECASE),
    # pt: "há 3 dias"
    re.compile(rf"\bh[áa]\s+(\d+|\w+)\s+({_UNIT_ALT})\b", re.IGNORECASE),
    # it: "3 giorni fa"
    re.compile(rf"\b(\d+|\w+)\s+({_UNIT_ALT})\s+fa\b", re.IGNORECASE),
    # nl: "3 dagen geleden"
    re.compile(
        rf"\b(\d+|\w+)\s+({_UNIT_ALT})\s+geleden\b", re.IGNORECASE
    ),
    # pl: "3 dni temu"
    re.compile(rf"\b(\d+|\w+)\s+({_UNIT_ALT})\s+temu\b", re.IGNORECASE),
]

_DAY_WORDS = {
    # en/de/fr/es/it/pt/nl/pl → day offset; midnight of that day, the
    # way dateparser renders bare day words with PREFER_DATES_FROM
    # default ("morgen" is +1 in BOTH de and nl — no conflict)
    "yesterday": -1, "today": 0, "tomorrow": 1,
    "gestern": -1, "heute": 0, "morgen": 1,
    "hier": -1, "aujourd'hui": 0, "demain": 1,
    "ayer": -1, "hoy": 0, "mañana": 1, "manana": 1,
    "ieri": -1, "oggi": 0, "domani": 1,
    "ontem": -1, "hoje": 0, "amanhã": 1, "amanha": 1,
    "gisteren": -1, "vandaag": 0,
    "wczoraj": -1, "dzisiaj": 0, "dziś": 0, "dzis": 0, "jutro": 1,
}
_DAY_WORDS_RE = re.compile(
    r"(?<![\w'])(" + "|".join(re.escape(w) for w in _DAY_WORDS) + r")(?![\w'])",
    re.IGNORECASE,
)


def _shift_months(base: datetime, months: int) -> datetime:
    """Calendar-month subtraction with end-of-month clamping (what
    dateparser's relativedelta does for "3 months ago")."""
    import calendar

    total = base.year * 12 + (base.month - 1) - months
    y, m = divmod(total, 12)
    m += 1
    day = min(base.day, calendar.monthrange(y, m)[1])
    return base.replace(year=y, month=m, day=day)


def _try_relative(cleaned: str, now: datetime) -> datetime | None:
    from datetime import timedelta

    for rx in _REL_RES:
        m = rx.search(cleaned)
        if m is None:
            continue
        qty_raw = m.group(1).lower()
        qty = int(qty_raw) if qty_raw.isdigit() else _WORD_NUMS.get(qty_raw)
        unit = _REL_UNITS.get(m.group(2).lower())
        if qty is None or unit is None:
            continue
        if unit == "months":
            return _shift_months(now, qty)
        if unit == "years":
            return _shift_months(now, 12 * qty)
        return now - timedelta(**{unit: qty})
    m = _DAY_WORDS_RE.search(cleaned)
    if m is not None:
        base = now.replace(hour=0, minute=0, second=0, microsecond=0)
        return base + timedelta(days=_DAY_WORDS[m.group(1).lower()])
    return None


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


def py_parse_date(
    text: str | None,
    format_hint: str | None = None,
    now: datetime | None = None,
):
    """``now`` enables the relative-date family ("3 days ago",
    "vor 3 Tagen", "il y a 3 jours", "hace 3 días", "há 3 dias",
    "3 giorni fa", "3 dagen geleden", "3 dni temu", yesterday/today/
    tomorrow in en/de/fr/es/it/pt/nl/pl) against a deterministic
    base. Left None,
    relative shapes stay unparsed — a distributed engine must NOT call
    ``datetime.now()`` per executor the way dateparser does (two
    executors would disagree about "yesterday"); the driver pins one
    base per run and ships it in the UDF closure."""
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
        # de/fr/es/it/pt/nl/pl month-name shapes (dateparser-locale
        # stand-in)
        for m in _I18N_RE.finditer(cleaned):
            month = _MONTHS_I18N.get(m.group(2).lower())
            if month is None:
                continue
            try:
                parsed = datetime(int(m.group(3)), month, int(m.group(1)))
                break
            except ValueError:
                continue
    if parsed is None and now is not None:
        parsed = _try_relative(cleaned, now)
    return _naive(parsed)


def py_iso_date(
    text: str | None,
    format_hint: str | None = None,
    now: datetime | None = None,
) -> str | None:
    """isoformat of the parsed date, None when unparseable
    (helpers/dates.py:19-23)."""
    parsed = py_parse_date(text, format_hint, now=now)
    return parsed.isoformat() if parsed is not None else None


def iso_date_udf(now: datetime | str | None = None):
    """Arrow-batched column form of :func:`py_iso_date`.

    ``now`` (datetime or ISO string) is resolved ON THE DRIVER and
    shipped in the closure: every executor — and every retry of a lost
    task — resolves "yesterday" against the same base."""
    from pyspark.sql import functions as F

    if isinstance(now, str):
        now = datetime.fromisoformat(now)

    @F.pandas_udf("string")
    def _iso(s: pd.Series) -> pd.Series:  # pragma: no cover (executor)
        return s.map(lambda t: py_iso_date(t, now=now))

    return _iso
