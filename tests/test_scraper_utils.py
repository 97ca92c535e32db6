"""Niche scraper helpers (memorious/helpers/__init__.py:10-47)."""

from memorious_spark.functions.htmlkit import parse_html
from memorious_spark.functions.scraper_utils import (
    convert_snakecase, search_results_last_url, search_results_total,
    soviet_checksum,
)


def test_convert_snakecase():
    assert convert_snakecase("CamelCaseName") == "camel_case_name"
    assert convert_snakecase("Title Case Name") == "title_case_name"
    assert convert_snakecase("ALLCAPS") == "allcaps"
    assert convert_snakecase("weird--SepÆrätor!") == "weird_seprator"


def test_soviet_checksum():
    # Σ d_i·i (i=1..7) mod 11 appended; e.g. 0000001 → weight 7 on the 1
    assert soviet_checksum("0000001") == "00000017"
    assert soviet_checksum("1234567") == (
        "1234567" + str(sum((i + 1) * d for i, d in enumerate(range(1, 8))) % 11)
    )


def test_search_results_helpers():
    html = parse_html(
        "<html><body>"
        '<div class="count">Results found: 1234</div>'
        '<ul><li><a href="/p/1">1</a></li>'
        '<li class="nav"><a href="/p/99">Last</a></li></ul>'
        "</body></html>"
    )
    assert search_results_total(html, ".//div", "Results found", ":") == 1234
    assert search_results_total(html, ".//div", "No match", ":") is None
    assert search_results_last_url(html, ".//li", "Last") == "/p/99"
    assert search_results_last_url(html, ".//li", "Next") is None
