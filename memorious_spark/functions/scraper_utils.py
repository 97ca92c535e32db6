"""Niche scraper helpers (memorious/helpers/__init__.py:10-47) —
pure-python kernels usable driver-side or inside parse UDFs.

Re-derived from the documented semantics, not transcribed: the
reference delegates to ``stringcase``/``normality`` (absent here), so
``convert_snakecase`` pins the same observable behaviour (camelCase /
TitleCase / arbitrary text → lower snake_case slug) with stdlib
regexes; ``soviet_checksum`` is the public OKPO weighted-mod-11 check
digit; the ``search_results_*`` pair navigates a parsed DOM exactly
like the reference (findall + text/anchor probing) against this
engine's htmlkit ElementTree nodes.
"""

from __future__ import annotations

import re
import unicodedata

from memorious_spark.functions.htmlkit import _findall, _text_content

__all__ = [
    "convert_snakecase",
    "soviet_checksum",
    "search_results_total",
    "search_results_last_url",
]


def convert_snakecase(name: str) -> str:
    """``CamelCaseName`` / ``Title Case Name`` → ``camel_case_name``
    (helpers/__init__.py:10-13: titlecase-if-mixed-case, then a
    ``_``-separated slug of ascii word characters)."""
    if name.upper() != name:
        # split camel humps before slugging, as titlecase() does
        name = re.sub(r"(?<=[a-z0-9])([A-Z])", r" \1", name)
    norm = unicodedata.normalize("NFKD", name)
    norm = norm.encode("ascii", "ignore").decode("ascii")
    return re.sub(r"[^a-z0-9]+", "_", norm.lower()).strip("_")


def soviet_checksum(code: str) -> str:
    """OKPO-style weighted mod-11 check digit append
    (helpers/__init__.py:16-31): Σ digit·weight mod 11; a result of 10
    retries with weights starting at 3, and a second 10 yields 0."""

    def check_digit(offset: int) -> int:
        total = sum(
            int(d) * i for d, i in zip(code[:7], range(offset, offset + 7))
        )
        return total % 11

    check = check_digit(1)
    if check == 10:
        check = check_digit(3)
        if check == 10:
            return code + "0"
    return code + str(check)


def search_results_total(html, xpath: str, check: str, delimiter: str):
    """Total result count from a search index DOM (helpers:34-40):
    the first ``xpath`` hit whose text contains ``check`` yields
    ``int(text.split(delimiter)[-1])``."""
    if html is None:
        return None
    for container in _findall(html, xpath):
        text = container if isinstance(container, str) else _text_content(container)
        if text and check in text:
            return int(text.split(delimiter)[-1].strip())
    return None


def search_results_last_url(html, xpath: str, label: str):
    """href of the pagination button whose text equals ``label``
    (helpers:43-47)."""
    if html is None:
        return None
    for container in _findall(html, xpath):
        if isinstance(container, str):
            continue
        if (_text_content(container) or "").strip() == label:
            for a in container.iter("a"):
                return a.get("href")
    return None
