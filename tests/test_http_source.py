"""S4 analog: distributed HTTP source with ETag conditional-GET caching,
tested against a real localhost http.server implementing ETag semantics
(no external network)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from name_deduplication_python_spark.sources.http_source import (
    HTTP_ERROR,
    NETWORK_ERROR,
    UP_TO_DATE,
    UPDATED,
    fetch_url,
    http_source,
)


class _EtagHandler(BaseHTTPRequestHandler):
    docs: dict[str, tuple[bytes, str]] = {}

    def do_GET(self):  # noqa: N802 (stdlib naming)
        doc = self.docs.get(self.path)
        if doc is None:
            self.send_response(404)
            self.end_headers()
            return
        body, etag = doc
        if self.headers.get("If-None-Match") == etag:
            self.send_response(304)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("ETag", etag)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    _EtagHandler.docs = {
        "/d1": (b"alpha document body", "v1-d1"),
        "/d2": (b"beta document body", "v1-d2"),
    }
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _EtagHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _frontier(spark, base, paths):
    return spark.createDataFrame(
        pd.DataFrame({"url": [base + p for p in paths]})
    )


def test_http_source_etag_lifecycle(spark, tmp_path, server):
    cache = str(tmp_path / "httpcache")
    frontier = _frontier(spark, server, ["/d1", "/d2", "/missing"])

    # epoch 0: cold fetch
    r0 = {r.url: r for r in http_source(spark, frontier, cache, epoch=0).collect()}
    assert r0[server + "/d1"].status == UPDATED
    assert bytes(r0[server + "/d1"].content) == b"alpha document body"
    assert r0[server + "/d1"].etag == "v1-d1"
    assert r0[server + "/missing"].status == HTTP_ERROR
    assert r0[server + "/missing"].content is None

    # epoch 1: nothing changed -> 304s, content reused from cache
    r1 = {r.url: r for r in http_source(spark, frontier, cache, epoch=1).collect()}
    assert r1[server + "/d1"].status == UP_TO_DATE
    assert bytes(r1[server + "/d1"].content) == b"alpha document body"
    assert r1[server + "/d2"].status == UP_TO_DATE

    # server-side change to d2 -> only d2 re-downloads
    _EtagHandler.docs["/d2"] = (b"beta v2 body", "v2-d2")
    r2 = {r.url: r for r in http_source(spark, frontier, cache, epoch=2).collect()}
    assert r2[server + "/d1"].status == UP_TO_DATE
    assert r2[server + "/d2"].status == UPDATED
    assert bytes(r2[server + "/d2"].content) == b"beta v2 body"
    assert r2[server + "/d2"].etag == "v2-d2"

    # the changed-page set feeding incremental dedup is exactly d2
    changed = [u for u, r in r2.items() if r.status == UPDATED]
    assert changed == [server + "/d2"]


def test_fetch_url_error_statuses(server):
    status, body, etag = fetch_url(server + "/nope")
    assert (status, body, etag) == (HTTP_ERROR, None, None)
    status, body, etag = fetch_url("http://127.0.0.1:9/unreachable", timeout=0.5)
    assert (status, body, etag) == (NETWORK_ERROR, None, None)


def test_network_error_keeps_cached_content(spark, tmp_path):
    """A flaky epoch never evicts cached documents: the errored url keeps
    its last good content + etag under the error status."""
    _EtagHandler.docs = {"/x": (b"payload", "vx")}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _EtagHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    cache = str(tmp_path / "flaky")
    frontier = _frontier(spark, base, ["/x"])
    r0 = http_source(spark, frontier, cache, epoch=0).collect()[0]
    assert r0.status == UPDATED
    srv.shutdown()  # server gone: next epoch is a network error
    r1 = http_source(spark, frontier, cache, epoch=1, timeout=0.5).collect()[0]
    assert r1.status == NETWORK_ERROR
    assert bytes(r1.content) == b"payload"
    assert r1.etag == "vx"
