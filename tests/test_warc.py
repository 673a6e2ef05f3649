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


def test_warc_malformed_record_is_skipped_and_stream_resyncs(spark, tmp_path):
    """A record with an unparseable Content-Length cannot be walked past
    exactly; the reader must drop it, resync at the next blank-line +
    'WARC/' boundary, and keep every well-formed record — not fail the
    whole archive task."""
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://example.org/bad\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: oops\r\n"
        b"\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nWARC/ looks like a header mid-payload\r\n"
        b"\r\n\r\n"
    )
    good_tail = _warc_record(
        "response",
        "https://example.org/good",
        "2024-05-06T07:08:09Z",
        _http_response(b"<html>still here</html>"),
    )
    raw = _build_warc() + bad + good_tail
    (tmp_path / "m.warc").write_bytes(raw)
    (tmp_path / "m.warc.gz").write_bytes(gzip.compress(raw))
    df = read_warc(spark, str(tmp_path)).cache()
    urls = [r.url for r in df.collect()]
    assert urls.count("https://example.org/bad") == 0
    # all 4 good records survive, in both plain and gzip archives
    assert urls.count("https://example.org/good") == 2
    assert df.count() == 8


def test_warc_streaming_memory_is_bounded():
    """The record walker must consume the gzip stream incrementally —
    never materialize the whole decompressed archive (ADVICE r3: a ~1 GB
    .gz member yields multi-GB bytes). Proxy assertion: records arrive
    from a stream whose read calls are bounded by record size."""
    import gzip as _gz
    import io

    from name_deduplication_python_spark.sources.warc import _iter_warc_stream

    raw = _build_warc()

    class MaxReadTracker(io.BufferedReader):
        max_read = 0

        def read(self, n=-1):
            assert n >= 0, "unbounded read() materializes the archive"
            MaxReadTracker.max_read = max(MaxReadTracker.max_read, n)
            return super().read(n)

    fobj = MaxReadTracker(_gz.GzipFile(fileobj=io.BytesIO(_gz.compress(raw))))
    recs = list(_iter_warc_stream(fobj))
    assert len(recs) == 5
    largest = max(
        int(h["content-length"]) for h, _ in recs
    )
    assert MaxReadTracker.max_read <= largest
