"""Rule DSL tests — same spec cases as the reference's test_rule.py
(nested combinators, ambiguous-spec rejection, domain/pattern/mime
application), asserted on BOTH the Column compiler and its pure-Python
twin so the oracle and engine provably gate alike."""

import pytest
from pyspark.sql import functions as F

from memorious_spark.plans.rules import RuleError, compile_py, compile_rule

ROWS = [
    # url, content_type, text
    ("https://occrp.org/articles/1", "text/html", "<html><body>x</body></html>"),
    ("https://sub.occrp.org/a", "application/pdf", None),
    ("https://example.com/img.png", "image/png", None),
    ("http://example.com/page", "text/html", "<p>hi</p>"),
]

NESTED = {
    "and": [
        {"domain": "occrp.org"},
        {"not": {"mime_group": "images"}},
        {"or": [{"mime_type": "text/html"}, {"mime_type": "application/pdf"}]},
    ]
}


def _spark_eval(spark, spec):
    df = spark.createDataFrame(ROWS, "url string, content_type string, text string")
    return [
        r["m"] for r in df.select(compile_rule(spec).alias("m")).collect()
    ]


def _py_eval(spec):
    rule = compile_py(spec)
    return [
        rule({"url": u, "content_type": c, "text": t}) for u, c, t in ROWS
    ]


@pytest.mark.parametrize(
    "spec,expected",
    [
        (NESTED, [True, True, False, False]),
        ({"match_all": {}}, [True] * 4),
        (None, [True] * 4),
        ({"domain": "occrp.org"}, [True, True, False, False]),
        ({"domain": "https://occrp.org/"}, [True, True, False, False]),
        ({"mime_type": "text/HTML; charset=utf-8"}, [True, False, False, True]),
        ({"mime_group": "images"}, [False, False, True, False]),
        ({"mime_group": "web"}, [True, False, False, True]),
        # pattern is re.match — anchored at position 0, case-insensitive
        ({"pattern": "https://.*occrp"}, [True, True, False, False]),
        ({"pattern": "occrp"}, [False, False, False, False]),
        ({"pattern": "HTTPS://OCCRP.*"}, [True, False, False, False]),
        ({"not": {"pattern": "https://"}}, [False, False, False, True]),
        # xpath quirk: true iff text parses as HTML (always for non-None)
        ({"xpath": ".//body"}, [True, False, False, True]),
    ],
)
def test_rule_semantics(spark, spec, expected):
    assert _py_eval(spec) == expected
    assert _spark_eval(spark, spec) == expected


def test_ambiguous_spec_rejected():
    with pytest.raises(RuleError):
        compile_py({"domain": "a.com", "pattern": "x"})
    with pytest.raises(RuleError):
        compile_rule({"nonsense_rule": 1})
    with pytest.raises(RuleError):
        compile_py({})
