"""WARC ingest tests: synthetic archives (plain + gzip), record walking
by Content-Length, HTTP header stripping, and a pipeline feed smoke."""

from __future__ import annotations

import gzip


from name_deduplication_python_spark.sources.warc import read_warc


def _warc_record(rtype: str, url: str, date: str, payload: bytes) -> bytes:
    headers = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {rtype}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
    )
    return headers + payload + b"\r\n\r\n"


def _http_response(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )


def _build_warc() -> bytes:
    html1 = b"<html><body><p>hello warc world</p></body></html>"
    # binary-ish body containing CRLFCRLF (must not confuse the walker)
    html2 = b"<html>\xff\xfe\r\n\r\nbinary soup</html>"
    return (
        _warc_record(
            "warcinfo", "ignored:none", "2024-01-01T00:00:00Z", b"software: test"
        )
        + _warc_record(
            "response",
            "https://example.org/a",
            "2024-01-02T03:04:05Z",
            _http_response(html1),
        )
        + _warc_record(
            "request", "https://example.org/a", "2024-01-02T03:04:05Z", b"GET /a"
        )
        + _warc_record(
            "response",
            "https://example.org/b",
            "2024-02-03T04:05:06Z",
            _http_response(html2),
        )
        + _warc_record(
            "conversion",
            "https://example.org/c",
            "2024-03-04T05:06:07Z",
            "pre extracted text çontent".encode(),
        )
    )


def test_read_warc_plain_and_gzip(spark, tmp_path):
    raw = _build_warc()
    (tmp_path / "a.warc").write_bytes(raw)
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(raw))
    df = read_warc(spark, str(tmp_path)).cache()
    rows = {(r.url, str(r.warc_ts)): r for r in df.collect()}
    # both archives parsed: 3 kept records each (warcinfo/request skipped)
    assert df.count() == 6
    a = rows[("https://example.org/a", "2024-01-02 03:04:05")]
    assert bytes(a.html) == b"<html><body><p>hello warc world</p></body></html>"
    assert a.text is None
    b = rows[("https://example.org/b", "2024-02-03 04:05:06")]
    assert bytes(b.html) == b"<html>\xff\xfe\r\n\r\nbinary soup</html>"
    c = rows[("https://example.org/c", "2024-03-04 05:06:07")]
    assert c.html is None and c.text == "pre extracted text çontent"


def test_warc_feeds_the_pipeline(spark, tmp_path):
    """WARC -> extract -> signatures smoke: the ingest output is a valid
    web_pages table for the engine."""
    from name_deduplication_python_spark.operators.extract import extract_stage
    from name_deduplication_python_spark.operators.signatures import (
        signature_stage,
    )

    (tmp_path / "c.warc").write_bytes(_build_warc())
    pages = read_warc(spark, str(tmp_path / "c.warc"))
    sigs = signature_stage(extract_stage(pages))
    got = {r.url: r.n_shingles for r in sigs.collect()}
    assert set(got) == {
        "https://example.org/a",
        "https://example.org/b",
        "https://example.org/c",
    }
    assert got["https://example.org/c"] >= 1  # conversion text signed
