"""Byte-identity tests for html -> text extraction (BASELINE.json
input_hint: 'byte-identical extracted text per url')."""

from __future__ import annotations

import pandas as pd

from name_deduplication_python_spark.functions.text_extract import (
    extract_series,
    extract_text_oracle,
    wrap_html,
)
from name_deduplication_python_spark.operators.extract import extract_stage
from name_deduplication_python_spark.sources.corpus import corpus_to_spark, generate_corpus


def test_wrap_roundtrip_unicode():
    cases = [
        "hello world foo bar",
        "café naïve — übergroß straße",
        "日本語のテキスト 中文文本 한국어",
        "emoji \U0001f600 rocket \U0001f680 & ampersand < lt > gt \"q\" 'a'",
        "a" * 5000 + " tail",
    ]
    for t in cases:
        html = wrap_html(t, title="t")
        assert extract_text_oracle(html) == t


def test_series_matches_oracle():
    texts = ["x y z", "café & <b>bold</b>", "multi  space input"]
    htmls = [wrap_html(t) for t in texts] + [None, b"<p>a</p><p>b</p>"]
    s = pd.Series(htmls, dtype=object)
    got = extract_series(s)
    want = [extract_text_oracle(h) for h in htmls]
    assert list(got) == want
    assert want[-1] == "a b"  # tag boundary becomes a space


def test_entity_ordering():
    # &amp;lt; must unescape to literal '&lt;', never to '<'
    assert extract_text_oracle(b"x &amp;lt; y") == "x &lt; y"
    assert extract_text_oracle(b"x &lt; y &nbsp;z") == "x < y z"


def test_adversarial_html():
    cases = [
        # nested/unclosed script: non-greedy block kill, then tag strip
        (b"<script>a<script>b</script>text<p>x</p>", "text x"),
        # malformed lone '<' without closing '>': spec treats rest as tag
        # only up to next '>', a trailing lone '<' survives as text
        (b"a < b", "a < b"),
        (b"a <b", "a <b"),
        # case-insensitive tags, attributes with '>' in quotes are NOT
        # special-cased (spec: tag ends at first '>')
        (b'<SCRIPT TYPE="x">junk</SCRIPT>ok', "ok"),
        # entity torture
        (b"&amp;amp; &lt;p&gt; &nbsp;&nbsp;", "&amp; <p>"),
        # invalid utf-8 -> replacement char, deterministic
        (b"caf\xc3 ok", "caf� ok"),
        # style with newlines
        (b"<style>\nbody {}\n</style>done", "done"),
        (b"", ""),
    ]
    for html, want in cases:
        got = extract_text_oracle(html)
        assert got == want, (html, got, want)
        got_vec = extract_series(pd.Series([html], dtype=object))[0]
        assert got_vec == want, (html, got_vec)


def test_extract_stage_byte_identity(spark):
    pages, _ = generate_corpus(n_base=60, seed=7, null_text_frac=1.0)
    df = corpus_to_spark(spark, pages)
    out = extract_stage(df).toPandas().set_index("url")["text"]
    for _, row in pages.iterrows():
        want = extract_text_oracle(row["html"])
        assert out[row["url"]] == want, row["url"]


def test_extract_stage_preserves_existing_text(spark):
    pages, _ = generate_corpus(n_base=30, seed=9, null_text_frac=0.0)
    df = corpus_to_spark(spark, pages)
    out = extract_stage(df).toPandas().set_index("url")["text"]
    for _, row in pages.iterrows():
        assert out[row["url"]] == row["text"]


def test_extract_udf_only_on_null_text_branch(spark, tmp_path):
    """The extract UDF must not execute on rows that already carry text
    (round-1 plan audit: a when/otherwise projection evaluated the
    ArrowEvalPython node unconditionally). The populated branch must be a
    pure native projection that never reads the html column."""
    pages, _ = generate_corpus(n_base=30, seed=11, null_text_frac=0.3)
    path = str(tmp_path / "pages.parquet")
    corpus_to_spark(spark, pages).write.parquet(path)
    plan = extract_stage(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    # exactly one Python-UDF eval node, on the isnull(text) side only
    assert plan.count("ArrowEvalPython") == 1, plan
    # two scans: the populated side's ReadSchema must exclude html
    read_schemas = [
        seg.split("ReadSchema:", 1)[1].splitlines()[0]
        for seg in plan.split("FileScan parquet")[1:]
        if "ReadSchema:" in seg
    ]
    assert any("html" not in rs for rs in read_schemas), read_schemas


def test_extract_udf_absent_when_text_fully_populated(spark, tmp_path):
    """With text non-null everywhere the UDF side is empty at runtime; the
    no-null side must not carry the html column through its projection."""
    pages, _ = generate_corpus(n_base=20, seed=12, null_text_frac=0.0)
    path = str(tmp_path / "pages2.parquet")
    corpus_to_spark(spark, pages).write.parquet(path)
    df = extract_stage(spark.read.parquet(path))
    assert df.count() == len(pages)
    assert "html" not in df.columns
