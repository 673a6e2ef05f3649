"""URL canonicalization (web-dedup companion to text dedup).

Crawls see the same page under many URLs (tracking params, fragments,
case-variant hosts, trailing slashes); canonicalizing BEFORE url-keyed
dedup merges those rows without touching page content. The reference's
closest analog is its key-normalization pass (C-ops family); this is the
web-native counterpart, built entirely from native expressions
(try_parse_url + regexp/array ops — whole-stage codegen, no UDF):

  * scheme + host lowercased; explicit default ports dropped (:80 http,
    :443 https)
  * fragment removed (try_parse_url PATH/QUERY never include it)
  * path: duplicate slashes collapsed, trailing slash dropped (root
    kept); empty path normalized to '/' so bare-host and root-slash
    forms converge
  * query: tracking params removed (utm_*, fbclid, gclid, msclkid,
    mc_eid, igshid, ref_src), remaining params SORTED for order-
    insensitive equality; empty query dropped

Deterministic and idempotent: canon(canon(u)) == canon(u) (tested).
Non-http(s) or unparseable urls pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)="


def canonical_url_expr(url) -> Column:
    """Column expression: canonical form of ``url`` (falls back to the
    original value for non-http(s)/unparseable input)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    # parse_url HOST excludes the port; fish it out of the authority
    authority = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    hostport = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)

    raw_path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    collapsed = F.regexp_replace(raw_path, r"/{2,}", "/")
    path = F.when(
        (F.length(collapsed) > 1) & collapsed.endswith("/"),
        collapsed.substr(F.lit(1), F.length(collapsed) - 1),
    ).otherwise(collapsed)
    # bare-host ('http://host', empty path) and root-slash ('http://host/')
    # are the most common trivial URL variant pair — converge both on '/'
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qnorm = F.array_join(F.sort_array(kept), "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )
    ok = scheme.isin("http", "https") & host.isNotNull() & (host != "")
    return F.when(ok, canon).otherwise(u)


def canonicalize_urls(
    pages: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """pages + canonical_url column (see canonical_url_expr)."""
    return pages.withColumn(out_col, canonical_url_expr(url_col))
