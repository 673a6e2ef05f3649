"""Corpus-analytics tour over the synthetic crawl:

    python examples/corpus_analytics.py [n_base]

Generates a small deterministic Common-Crawl-style corpus, injects a
re-crawl epoch and cross-host links, then runs the round-5 analytics
operators end-to-end:

  1. KMV sketches     — distinct-shingle estimates + lang-slice overlap
  2. revisit diffs    — how much each re-crawled url changed
  3. link graph       — outlinks -> host graph -> PageRank
  4. mixture weights  — temperature-2 source-sampling shares
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from name_deduplication_python_spark.operators.kmv import (
    group_overlap_kmv,
    kmv_sketch,
)
from name_deduplication_python_spark.operators.linkgraph import (
    extract_outlinks,
    host_graph,
    pagerank,
)
from name_deduplication_python_spark.operators.revisit import revisit_diffs
from name_deduplication_python_spark.operators.sampler import mixture_weights
from name_deduplication_python_spark.session import get_spark
from name_deduplication_python_spark.sources.corpus import (
    corpus_to_spark,
    generate_corpus,
)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    spark = get_spark(app_name="corpus_analytics", cores=8)
    pages_pd, _truth = generate_corpus(n_base=n_base, seed=42)
    pages = corpus_to_spark(spark, pages_pd).where(F.col("text").isNotNull())

    # -- 1. KMV: distinct 5-shingle estimates per lang + slice overlap --
    shingles = pages.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.size(F.split(F.trim("text"), " ")) - 4, F.lit(0)
                    ),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split(F.trim("text"), " "), i, 5)
                ),
            )
        ).alias("shingle"),
    )
    print("== KMV distinct-shingle estimates per lang ==")
    kmv_sketch(shingles, ["lang"], "shingle", k=256).select(
        "lang", "n_distinct_est"
    ).orderBy("lang").show()
    print("== lang-slice shingle overlap (KMV estimate) ==")
    group_overlap_kmv(shingles, "lang", "shingle", k=256).orderBy(
        "src_group", "dst_group"
    ).show()

    # -- 2. revisit diffs: re-crawl every 7th url with a small edit --
    recrawl = (
        pages.where(F.xxhash64("url") % 7 == 0)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 DAYS"))
        .withColumn("text", F.concat(F.lit("updated banner "), "text"))
    )
    two_epochs = pages.unionByName(recrawl)
    print("== revisit diffs (re-crawled urls, 30 days apart) ==")
    revisit_diffs(two_epochs).orderBy("jaccard").show(5, truncate=60)

    # -- 3. link graph: inject cross-host links, rank hosts --
    linked = pages.withColumn(
        "html",
        F.concat(
            F.col("html").cast("string"),
            F.concat(
                F.lit('<a href="http://hub'),
                F.pmod(F.xxhash64("url"), F.lit(3)).cast("string"),
                F.lit('.example/">hub</a>'),
            ),
        ).cast("binary"),
    )
    ranks = pagerank(host_graph(extract_outlinks(linked)), iterations=8)
    print("== host PageRank (3 injected hubs dominate) ==")
    ranks.orderBy(F.desc("pagerank")).show(6)

    # -- 4. mixture weights: temperature-2 sampling shares per lang --
    per_doc = pages.select(
        F.col("lang").alias("source"),
        F.size(F.split(F.trim("text"), " ")).alias("n_tokens"),
    )
    print("== temperature-2 mixture weights per lang ==")
    mixture_weights(
        per_doc, "source", "n_tokens", alpha=0.5, budget_tokens=1_000_000
    ).orderBy("source").show()

    spark.stop()


if __name__ == "__main__":
    main()
