"""Link-graph quality weighting: outlink extraction and a fixed-iteration
PageRank over the host graph.

Pretraining curation uses host-level link authority as a quality prior
(Common Crawl publishes host/domain ranks; CCNet/RefinedWeb-style
pipelines consume them to weight or gate sources). This module derives
that signal from the corpus itself: pull hrefs out of the raw html
(input_hint's ``html: binary``), collapse to a distinct host->host edge
set, and run PageRank (Brin & Page 1998) for a fixed iteration count —
the second iterative-algorithm operator in the engine after connected
components (operators/components.py), built on the same discipline:
keyed joins, localCheckpoint per iteration to cap lineage, only scalar
counts ever reach the driver.

Semantics (fixed, engine-replayable):
  r_0(v)     = 1/N                       over all hosts in the edge set
  r_{i+1}(v) = (1-d)/N + d * sum_{(u,v) in E} r_i(u) / out(u)
Dangling mass is NOT redistributed by default (ranks sum to < 1 when
sinks exist); this keeps every iteration a pure join+aggregate that
replays exactly in any SQL engine — the ORDERING, which is what curation
consumes, matches the redistributing variant on graphs whose sinks are
not rank-dominant. ``pagerank(redistribute_dangling=True)`` opts into
the classic correction (ranks sum to exactly 1, comparable across
graphs) with one extra 1-row aggregate + broadcast join per iteration.

Scale shape at 10^12 docs / ~10^8 hosts:
  * extraction is map-only (decode + regexp_extract_all + explode);
  * the host edge set is one distinct aggregate, map-combined, keyed on
    an 8-byte host pair at most ~10^9-10^10 rows — small next to the
    corpus;
  * each PageRank iteration is ONE join shuffle keyed on src plus ONE
    aggregate keyed on dst; repartition the edge set on src once and
    every iteration reuses the exchange. 10-20 iterations suffice for
    curation-grade ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urlnorm import canonical_url_expr

_HREF_PATTERN = r'href="(https?://[^"]+)"'


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) for every absolute http(s) href in the page
    html, both sides canonicalized (functions/urlnorm.py — fragments
    stripped there, so fragment-bearing cross-site hrefs keep their
    edge), self-links dropped.

    Map-only — duplicate pairs are NOT removed here (a url-pair distinct
    is a corpus-wide shuffle over the largest intermediate in the
    pipeline; host_graph distincts AFTER collapsing to host pairs, ~3
    orders of magnitude smaller). The html bytes go through
    cast(binary as string), which interprets bytes as UTF-8 WITHOUT
    validation — real crawls are full of Latin-1/GBK/truncated pages
    (the WARC reader stores the raw HTTP body), and an ANSI decode()
    would abort the stage on the first one; the ASCII href pattern is
    unaffected by mojibake in the surrounding text."""
    hrefs = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(_HREF_PATTERN), 1
    )
    links = pages.select(
        canonical_url_expr(F.col(url_col)).alias("src_url"),
        F.explode(hrefs).alias("_raw"),
    ).select("src_url", canonical_url_expr(F.col("_raw")).alias("dst_url"))
    return links.where(F.col("src_url") != F.col("dst_url"))


def host_of(url: Column) -> Column:
    """Host component of a url (empty string when absent or malformed —
    try_parse_url, not parse_url: under ANSI one bad url would abort
    the job, the same pitfall functions/urlnorm.py documents)."""
    return F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit(""))


def host_graph(links: DataFrame) -> DataFrame:
    """Distinct host->host edges from a (src_url, dst_url) link table,
    intra-host edges dropped."""
    edges = links.select(
        host_of(F.col("src_url")).alias("src"),
        host_of(F.col("dst_url")).alias("dst"),
    )
    return (
        edges.where(
            (F.col("src") != F.col("dst"))
            & (F.col("src") != "")
            & (F.col("dst") != "")
        )
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a distinct edge DataFrame: returns
    (node, pagerank) for every node appearing as src or dst, pagerank
    rounded to 6 places (cross-engine float drift from summation order
    lives far below that).

    redistribute_dangling=False (default, the oracle-replayable variant):
    dangling mass is dropped — every iteration is a pure join+aggregate
    (the module docstring's semantics). True adds the classic correction
    (Brin & Page 1998): each iteration spreads the total rank sitting on
    out-degree-0 nodes uniformly,

        r_{i+1}(v) = (1-d)/N + d * (sum_{(u,v)} r_i(u)/out(u) + D_i/N),
        D_i = sum over dangling u of r_i(u)

    so ranks sum to exactly 1 and are comparable ACROSS graphs (curation
    consumers weighting several crawls need that calibration; within one
    graph the ordering rarely differs unless sinks are rank-dominant).
    The dangling mass stays distributed: D_i is a 1-row aggregate joined
    back by broadcast crossJoin — nothing new reaches the driver.

    Two scalars reach the driver (the node count; plus localCheckpoint's
    materialization per iteration) — ranks and edges stay distributed
    end-to-end, the CC discipline (components.py _checksum note).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        # checkpoint BEFORE count: the count materializes it, and every
        # iteration's left join then reuses the result instead of
        # re-scanning the edge set for the union+distinct each time
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("_out"))
    contrib_edges = e.join(outdeg, "src").localCheckpoint()
    dangling_nodes = None
    if redistribute_dangling:
        # out-degree-0 nodes, computed once (iterations only re-aggregate
        # their current rank mass — one tiny semi join + 1-row agg each)
        dangling_nodes = (
            nodes.join(outdeg, nodes.node == outdeg.src, "anti")
            .select("node")
            .localCheckpoint()
        )
    base = damping  # teleport term uses (1-d)/N
    ranks = nodes.select("node", F.lit(1.0 / n).alias("_r"))
    for _ in range(iterations):
        contrib = (
            ranks.join(contrib_edges, ranks.node == contrib_edges.src)
            .groupBy("dst")
            .agg(F.sum(F.col("_r") / F.col("_out")).alias("_c"))
        )
        nxt = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if redistribute_dangling:
            dm = (
                ranks.join(dangling_nodes, "node", "semi")
                .agg(F.coalesce(F.sum("_r"), F.lit(0.0)).alias("_dm"))
            )
            nxt = nxt.crossJoin(F.broadcast(dm)).select(
                "node",
                (
                    F.lit((1.0 - base) / n)
                    + F.lit(base)
                    * (F.coalesce("_c", F.lit(0.0)) + F.col("_dm") / n)
                ).alias("_r"),
            )
        else:
            nxt = nxt.select(
                "node",
                (
                    F.lit((1.0 - base) / n)
                    + F.lit(base) * F.coalesce("_c", F.lit(0.0))
                ).alias("_r"),
            )
        ranks = nxt.localCheckpoint()
    return ranks.select("node", F.round("_r", 6).alias("pagerank"))
