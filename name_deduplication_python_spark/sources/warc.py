"""WARC ingest: Common-Crawl-style archives -> the web_pages table.

The engine's input table (url, warc_ts, html, text, lang — BASELINE.json
input_hint) originates from WARC archives on a real crawl; this reader
closes that gap as a first-class source (S-ops family; the reference's
closest analog is its permissive user-file loader, /root/reference/
main.py:634-640 — re-imagined for the crawl format the north star names).

Distribution model: Common Crawl WARCs are ~1 GB gzip members, NON-
splittable — the standard Spark pattern is one task per archive file
(parallelism comes from the file count: a crawl snapshot is ~72k files).
`spark.read.format("binaryFile")` assigns files to tasks; a mapInPandas
iterator parses records with the stdlib (gzip + byte slicing by
Content-Length — the only robust way to walk WARC records, since payloads
are raw bytes that may contain any delimiter). No per-row Python: one
python invocation per FILE, emitting Arrow record batches.

Record semantics:
  * WARC-Type: response (and `conversion`, which some pipelines emit for
    pre-extracted text) are kept; request/metadata/warcinfo are skipped.
  * url      <- WARC-Target-URI
  * warc_ts  <- WARC-Date (ISO-8601, UTC)
  * html     <- the HTTP response BODY (status line + headers stripped at
    the first CRLFCRLF) for response records; conversion records carry
    their payload as `text` directly.
  * text/lang are left null for response records — extract_stage fills
    text (byte-deterministic), lang-id runs downstream.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_KEEP_TYPES = {"response", "conversion"}


def _iter_warc_stream(fobj) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record from a FILE-LIKE stream,
    walking by Content-Length — memory is O(largest record), never
    O(archive) (a ~1 GB .gz member decompresses to multi-GB; the round-3
    reader materialized all of it per task).

    Robustness: a record with a missing/unparseable Content-Length cannot
    be skipped exactly (its payload end is unknown), so the walker drops
    it and RESYNCs at the next blank-line + 'WARC/' boundary instead of
    failing the whole archive task; a truncated final record ends the
    stream."""
    at_boundary = True
    while True:
        line = fobj.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            at_boundary = True
            continue
        if not (at_boundary and line.startswith(b"WARC/")):
            # payload garbage after a dropped record: keep scanning
            at_boundary = False
            continue
        headers: dict[str, str] = {}
        while True:
            hl = fobj.readline()
            if not hl or hl in (b"\r\n", b"\n"):
                break
            k, sep, v = hl.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            at_boundary = False  # unskippable: resync scan
            continue
        payload = fobj.read(clen)
        if len(payload) < clen:
            return  # truncated archive tail
        yield headers, payload
        at_boundary = False  # next record follows the \r\n\r\n separator


def _iter_warc_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record from archive bytes.

    Handles multi-member gzip (each record its own member — the Common
    Crawl layout; GzipFile walks concatenated members and decompresses
    INCREMENTALLY as the stream is read) and plain WARC bytes."""
    if raw[:2] == b"\x1f\x8b":
        fobj = io.BufferedReader(gzip.GzipFile(fileobj=io.BytesIO(raw)))
    else:
        fobj = io.BytesIO(raw)
    yield from _iter_warc_stream(fobj)


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP status line + headers from a response payload."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def _parse_warc_date(s: str):
    try:
        return (
            datetime.fromisoformat(s.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive(s) -> web_pages-shaped DataFrame.

    path: file/dir/glob of .warc or .warc.gz. One task per archive
    (binaryFile source); records stream out as Arrow batches.
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                urls, tss, htmls, texts = [], [], [], []
                for headers, payload in _iter_warc_records(row["content"]):
                    rtype = headers.get("warc-type", "")
                    if rtype not in _KEEP_TYPES:
                        continue
                    url = headers.get("warc-target-uri")
                    if not url:
                        continue
                    urls.append(url)
                    tss.append(_parse_warc_date(headers.get("warc-date", "")))
                    if rtype == "response":
                        htmls.append(_http_body(payload))
                        texts.append(None)
                    else:  # conversion: payload IS the extracted text
                        htmls.append(None)
                        texts.append(payload.decode("utf-8", "replace"))
                if urls:
                    yield pd.DataFrame(
                        {
                            "url": urls,
                            "warc_ts": tss,
                            "html": htmls,
                            "text": texts,
                            "lang": [None] * len(urls),
                        }
                    )

    return files.mapInPandas(
        gen,
        schema=(
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string"
        ),
    )
