"""URL canonicalization golden tests + idempotence + plan purity."""

from __future__ import annotations


from name_deduplication_python_spark.functions.urlnorm import canonicalize_urls

GOLDEN = [
    # (input, canonical)
    ("HTTP://Example.ORG/Path/", "http://example.org/Path"),
    ("https://example.org:443/a", "https://example.org/a"),
    ("http://example.org:80/a", "http://example.org/a"),
    ("http://example.org:8080/a", "http://example.org:8080/a"),
    ("https://example.org/a//b///c/", "https://example.org/a/b/c"),
    ("https://example.org/", "https://example.org/"),
    # bare-host converges with root-slash (the most common trivial pair)
    ("https://example.org", "https://example.org/"),
    ("https://example.org?b=2&a=1", "https://example.org/?a=1&b=2"),
    ("https://example.org/page#section-2", "https://example.org/page"),
    (
        "https://example.org/p?utm_source=x&b=2&a=1&fbclid=zzz",
        "https://example.org/p?a=1&b=2",
    ),
    ("https://example.org/p?utm_campaign=only", "https://example.org/p"),
    ("https://example.org/p?z=9&a=1", "https://example.org/p?a=1&z=9"),
    # non-http(s)/unparseable: pass through
    ("ftp://example.org/file", "ftp://example.org/file"),
    ("not a url at all", "not a url at all"),
]


def test_canonical_url_golden(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], "url string")
    got = {
        r.url: r.canonical_url for r in canonicalize_urls(df).collect()
    }
    for u, want in GOLDEN:
        assert got[u] == want, (u, got[u], want)


def test_canonicalization_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], "url string")
    once = canonicalize_urls(df).select(
        "canonical_url"
    ).withColumnRenamed("canonical_url", "url")
    twice = canonicalize_urls(once).collect()
    assert all(r.url == r.canonical_url for r in twice)


def test_canonicalization_plan_is_native(spark):
    """No Python anywhere: the expression must stay inside codegen."""
    df = spark.createDataFrame([("https://a.example/x",)], "url string")
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
