"""URL-level corpus filtering (functions/urlfilter.py): host parsing,
public-suffix-lite registrable domains, keyword/digit scoring, blocklist
forms, and the plan shape (python-free; broadcast anti for DataFrame
blocklists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from name_deduplication_python_spark.functions.urlfilter import (
    filter_urls,
    host_of,
    registered_domain,
    url_quality_flags,
)

_PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython", "PythonUDF")


def _one(spark, url: str) -> dict:
    df = spark.createDataFrame([(url,)], "url string")
    flags = url_quality_flags(F.col("url"))
    return df.select(*(v.alias(k) for k, v in flags.items())).collect()[0].asDict()


def test_host_and_registered_domain_forms(spark):
    cases = {
        "https://www.Example.COM/a?b=c": ("www.example.com", "example.com"),
        "http://user:pw@sub.shop.co.uk:8080/x": ("sub.shop.co.uk", "shop.co.uk"),
        "ftp://a.b.c.example.org/f": ("a.b.c.example.org", "example.org"),
        "example.net/path": ("example.net", "example.net"),  # schemeless
        "https://localhost/": ("localhost", "localhost"),
        "https://co.uk/": ("co.uk", "co.uk"),  # bare suffix host
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    out = df.select(
        "url",
        host_of(F.col("url")).alias("h"),
        registered_domain(host_of(F.col("url"))).alias("d"),
    ).collect()
    for r in out:
        assert (r["h"], r["d"]) == cases[r["url"]], r["url"]


def test_url_quality_flag_values(spark):
    r = _one(spark, "https://best-casino.com/poker?ref=viagra")
    assert r["kw_hits"] == 3
    assert r["domain"] == "best-casino.com"
    r2 = _one(spark, "https://12345678.net/a")
    assert r2["digit_ratio"] == round(8 / 12, 4)
    r3 = _one(spark, "https://clean.example.org/docs")
    assert r3["kw_hits"] == 0 and r3["digit_ratio"] == 0.0


def test_filter_urls_thresholds_and_blocklists(spark):
    rows = [
        (1, "https://good.example.com/a"),
        (2, "https://spam.example.com/casino-bonus"),       # keyword
        (3, "https://99887766554433.biz/x"),                # digit farm
        (4, "https://evil.co.uk/fine-path"),                # blocklisted
        (5, "https://good2.example.org/" + "q" * 3000),     # absurd length
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {r["doc_id"] for r in filter_urls(df, blocklist=["evil.co.uk"]).collect()}
    assert kept == {1}
    # DataFrame blocklist form (broadcast anti) must agree
    bl = spark.createDataFrame([("evil.co.uk",)], "domain string")
    kept_df = {r["doc_id"] for r in filter_urls(df, blocklist=bl).collect()}
    assert kept_df == {1}
    # audit mode keeps the scoring columns
    flags = filter_urls(df, blocklist=bl, keep_flags=True).columns
    assert {"host", "domain", "kw_hits", "digit_ratio", "url_len"} <= set(flags)
    # pure filter mode restores the input schema
    assert filter_urls(df, blocklist=bl).columns == ["doc_id", "url"]


def test_filter_urls_plan_shape(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    bl = spark.createDataFrame([("b.com",)], "domain string")
    plan = filter_urls(df, blocklist=bl)._jdf.queryExecution().executedPlan().toString()
    for m in _PY_MARKERS:
        assert m not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
