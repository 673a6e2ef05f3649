"""Round-6 curation tour: the full crawl-to-trainset path with the
round-6 controls on:

    python examples/curate_crawl.py [n_base]

  1. URL gate       — full Public Suffix List registrable domains
                      (functions/psl.py) + blocklist + URL scoring
  2. strict dedup   — the funnel under strict_config() (hamming-only
                      edges must also clear the estimator floor)
  3. repetition     — Gopher repetition rules (dup lines/paragraphs,
                      top/dup n-gram char fractions)
  4. BPE budgets    — a merges table trained on the corpus itself;
                      token budgets/shards counted in BPE tokens
  5. chain SemDeDup — transitive semantic groups over embeddings
                      (tiers.tiered_dedup(semantic_mode='chain'))
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from name_deduplication_python_spark import strict_config
from name_deduplication_python_spark.functions.bpe import (
    token_counter,
    train_bpe_merges,
)
from name_deduplication_python_spark.functions.psl import load_psl
from name_deduplication_python_spark.functions.urlfilter import filter_urls
from name_deduplication_python_spark.operators.extract import extract_stage
from name_deduplication_python_spark.session import get_spark
from name_deduplication_python_spark.sources.corpus import (
    corpus_to_spark,
    generate_corpus,
)
from name_deduplication_python_spark.trainset import build_training_set


def main(n_base: int = 150) -> None:
    spark = get_spark(app_name="curate-crawl", cores=8)
    pages, _ = generate_corpus(n_base=n_base, seed=42)
    docs = extract_stage(corpus_to_spark(spark, pages))

    # 1. URL gate under the real PSL (blocklists built from registrable
    # domains only match com.sg/co.nz/wildcard hosts under PSL rules).
    psl = load_psl()
    gated = filter_urls(docs, blocklist=["tracker.example.com"], psl=psl)
    print(f"url gate: {docs.count()} -> {gated.count()}")

    # 2-4. the funnel: strict precision tier, repetition rules on, and
    # budgets counted in BPE tokens from a corpus-trained merges table.
    sample_texts = [
        r["text"] for r in gated.select("text").limit(200).collect()
    ]
    merges = train_bpe_merges(sample_texts, num_merges=200)
    # the synthetic corpus is stopword-free token soup, which the Gopher
    # stopword floor correctly rejects — salt a few English stopwords in
    # (uniformly, so dedup relations are unchanged) to make the example
    # corpus quality-eligible the way real crawl text is
    funnel_docs = gated.select(
        F.abs(F.xxhash64("url")).alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("the and of "), F.col("text")).alias("text"),
    )
    shards, stats = build_training_set(
        spark,
        funnel_docs,
        config=strict_config(),
        gopher_repetition=True,
        budget_tokens=200_000,
        tokens_per_shard=20_000,
        token_counter=token_counter(merges),
    )
    print("funnel:", stats)
    print("sample shard rows:")
    shards.select("doc_id", "lang", "n_tokens", "shard_id").show(5)

    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 150)
