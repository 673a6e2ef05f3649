"""HTTP source with ETag conditional-GET caching (reference S4 analog:
`/root/reference/data_utils.py:351-375` `smart_download_pat` — per-url
If-None-Match, 304 = cache hit, 200 = refresh content + etag, errors
surfaced as status strings; the reference's local-file encryption wrap is
the S3 deployment detail and stays out of engine scope).

Spark-first shape: the reference downloads ONE file per call on a
desktop; a crawl-scale engine fetches a URL FRONTIER. The frontier is a
DataFrame, the ETag cache is a parquet table (url, etag, content,
status, fetched_epoch), and the fetch is a mapInPandas stage: each
partition walks its urls sequentially with urllib (stdlib; politeness =
per-partition serialism, parallelism = repartition(n) — the idiomatic
Spark crawl shape where executors own disjoint url slices). 304 answers
reuse the cached binary without re-downloading; only changed docs ship
bytes. The refreshed cache table is written back per epoch like the
streaming signature store — the WARC reader (sources/warc.py) covers
bulk archive ingest; this covers the incremental re-crawl frontier.

In-sandbox the unit tests run a localhost http.server with real ETag
semantics — no external network is touched.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HTTP_CACHE_DDL = (
    "url string, status string, content binary, etag string, fetched_epoch int"
)

# reference status vocabulary (data_utils.py:361-375), verbatim
UPDATED = "UPDATED"
UP_TO_DATE = "UP_TO_DATE"
HTTP_ERROR = "HTTP_ERROR"
NETWORK_ERROR = "NETWORK_ERROR"


def fetch_url(
    url: str,
    etag: str | None = None,
    timeout: float = 10.0,
    headers: dict | None = None,
) -> tuple[str, bytes | None, str | None]:
    """One conditional GET: returns (status, content, new_etag).
    304 -> (UP_TO_DATE, None, etag): caller keeps its cached copy.
    200 -> (UPDATED, body, response etag). Other HTTP codes -> HTTP_ERROR,
    transport failures -> NETWORK_ERROR (reference semantics)."""
    req_headers = dict(headers or {})
    if etag:
        req_headers["If-None-Match"] = etag
    req = urllib.request.Request(url, headers=req_headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            if r.status == 200:
                return UPDATED, r.read(), r.headers.get("ETag")
            return HTTP_ERROR, None, None
    except urllib.error.HTTPError as e:
        if e.code == 304:
            return UP_TO_DATE, None, etag
        return HTTP_ERROR, None, None
    except (urllib.error.URLError, OSError, TimeoutError):
        return NETWORK_ERROR, None, None


def http_fetch_stage(
    frontier: DataFrame,
    cache: DataFrame | None = None,
    epoch: int = 0,
    timeout: float = 10.0,
) -> DataFrame:
    """Distributed conditional-GET over a url frontier.

    frontier: DataFrame with a `url` column (anything else is dropped —
    the fetch result is keyed by url). cache: previous epoch's cache
    table (HTTP_CACHE_DDL) or None for a cold start. The left join seeds
    each url with its cached etag + content so a 304 reuses the cached
    binary locally in the worker — no driver round-trip, no re-download.
    Errored urls keep their last good content (and etag) with the error
    status, so one flaky epoch never evicts a cached document.

    Scale shape: the join shuffles only (url, etag, content) for frontier
    urls — O(frontier), not O(cache); fetch parallelism = frontier
    partitions (repartition upstream to the politeness budget); the HTTP
    work itself is per-partition sequential stdlib urllib in the Arrow
    batch loop."""
    cols = ["url", "_etag", "_content"]
    if cache is not None:
        seeded = frontier.select("url").join(
            cache.select(
                "url",
                F.col("etag").alias("_etag"),
                F.col("content").alias("_content"),
            ),
            "url",
            "left",
        )
    else:
        seeded = frontier.select(
            "url",
            F.lit(None).cast("string").alias("_etag"),
            F.lit(None).cast("binary").alias("_content"),
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, etag, cached in zip(
                pdf["url"], pdf["_etag"], pdf["_content"]
            ):
                etag = None if pd.isna(etag) else str(etag)
                status, body, new_etag = fetch_url(url, etag, timeout=timeout)
                if status == UPDATED:
                    rows.append((url, status, body, new_etag, epoch))
                elif status == UP_TO_DATE:
                    rows.append((url, status, cached, etag, epoch))
                else:  # errors keep last good content, surface the status
                    rows.append((url, status, cached, etag, epoch))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["url", "status", "content", "etag", "fetched_epoch"],
                )

    return seeded.select(*cols).mapInPandas(gen, schema=HTTP_CACHE_DDL)


def http_source(
    spark: SparkSession,
    frontier: DataFrame,
    cache_dir: str,
    epoch: int = 0,
    timeout: float = 10.0,
) -> DataFrame:
    """Fetch a frontier against the persistent ETag cache table at
    cache_dir and write the refreshed cache back (epoch=N subdir, same
    idempotent layout as the streaming stores). Returns the refreshed
    rows; feed `status == 'UPDATED'` downstream as the changed-page set
    (the incremental-dedup batch input)."""
    latest = _read_cache(spark, cache_dir)
    fetched = http_fetch_stage(frontier, latest, epoch=epoch, timeout=timeout)
    out = os.path.join(cache_dir, f"epoch={epoch}")
    fetched.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def _read_cache(spark: SparkSession, cache_dir: str) -> DataFrame | None:
    """Latest cache row per url across epoch subdirs (latest-epoch-wins,
    mirroring streaming/incremental semantics)."""
    try:
        df = spark.read.parquet(cache_dir)
    except Exception:
        return None
    if "fetched_epoch" not in df.columns:
        return None
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.col("epoch").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "epoch")
    )
