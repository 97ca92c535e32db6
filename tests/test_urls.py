"""Column URL kernel ↔ pure-Python mirror equivalence."""

from pyspark.sql import functions as F

from memorious_spark.functions import urls

CASES = [
    "https://EXAMPLE.com/path?q=1#frag",
    "http://example.com:80/a",
    "https://example.com:443/a",
    "https://example.com:8443/a",
    "http://example.com",
    "https://h1.example.com/doc/5",
    "HTTPS://MiXeD.example.COM/Path/Case?X=Y",
    "ftp://example.com/file",
]


def test_py_norm_basics():
    assert urls.py_norm("https://EXAMPLE.com/path?q=1#frag") == (
        "https://example.com/path?q=1"
    )
    assert urls.py_norm("http://example.com:80/a") == "http://example.com/a"
    assert urls.py_norm("https://example.com:8443/a") == "https://example.com:8443/a"
    assert urls.py_norm("http://example.com") == "http://example.com/"
    assert urls.py_norm("not a url") is None


def test_column_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = df.select(
        "url",
        urls.norm_col(F.col("url")).alias("norm"),
        urls.host_col(F.col("url")).alias("host"),
        urls.scheme_ok_col(F.col("url")).alias("ok"),
    ).collect()
    for row in got:
        py = urls.py_norm(row["url"])
        if py is not None and row["url"].lower().startswith(("http:", "https:")):
            assert row["norm"] == py, row["url"]
        assert row["host"] == urls.py_host(row["url"]), row["url"]
        assert row["ok"] == row["url"].lower().startswith(("http", "https")) or not row["ok"]


def test_hash_col_deterministic(spark):
    df = spark.createDataFrame([("https://example.com/a",)], "url string")
    h1 = df.select(urls.hash_col(F.col("url")).alias("h")).first()["h"]
    h2 = df.select(urls.hash_col(F.col("url")).alias("h")).first()["h"]
    assert h1 == h2 and isinstance(h1, int)
