"""Eval-set decontamination: flag training documents that share any
token n-gram with a held-out evaluation set.

Beyond-reference LLM-pipeline operator (the reference engine has no
analog; its nearest shape is the P5 already-matched anti-join,
/root/reference/analysis_engine.py:545). The algorithm is the published
GPT-3 / PaLM decontamination recipe: Brown et al. 2020 (NeurIPS),
Appendix C — mark a training document "dirty" when any of its 13-token
n-grams also occurs in an evaluation benchmark.

Scale shape (the 100 TB plan):
  - The EVAL side is a benchmark suite — thousands of documents, at
    most a few million distinct n-grams. It is tokenized, hashed to
    8-byte xxhash64 keys, deduplicated, and BROADCAST.
  - The TRAINING side streams map-only: tokenize -> per-doc distinct
    n-gram hashes -> explode -> broadcast hash-join against the eval
    set -> per-doc overlap count. The only wide exchange is the final
    per-doc count aggregation, which combines map-side (partial
    counts); the 100 TB text itself never shuffles on a gram key.
  - Gram hashing keeps the broadcast table and the exploded stream at
    8 bytes/gram instead of ~80-byte strings; an xxhash64 collision
    only ever inflates an overlap count (never misses one), with
    probability ~ |eval grams| / 2^64 per training gram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_ngram_hashes(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, gram_hashes array<bigint>) — DISTINCT xxhash64 hashes of all
    n-token grams per document. Documents with fewer than n tokens have
    no n-gram and contribute an empty array (they cannot be
    contaminated at width n — the Brown et al. convention)."""
    toks = F.split(F.trim(F.col(text_col)), " ")
    grams = F.when(
        F.size(toks) < n, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
        )
    )
    return docs.select(
        F.col(id_col).alias("id"), F.array_distinct(grams).alias("gram_hashes")
    )


def eval_ngram_set(
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (gram_hash) over the evaluation set — the small,
    broadcastable side."""
    g = doc_ngram_hashes(eval_docs, n=n, id_col=id_col, text_col=text_col)
    return g.select(F.explode("gram_hashes").alias("gram_hash")).distinct()


def flag_contaminated(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per training document: total distinct n-grams, how many also
    occur in the eval set, and the dirty flag (any overlap).

    Returns (id_col, n_grams, n_overlap, is_contaminated) covering
    EVERY training document (zero-overlap docs included) — the caller
    filters `is_contaminated = 0` to take the clean corpus.

    Single pass, no cache: gram counts and overlap hits ride ONE
    explode -> broadcast-left-join -> groupBy(id) aggregate
    (explode_outer keeps zero-gram docs; unmatched grams sum to null ->
    0). An earlier shape persisted the gram frame to feed two separate
    branches and never unpersisted it — corpus-sized state pinned in
    executor storage for the session lifetime."""
    g = doc_ngram_hashes(train_docs, n=n, id_col=id_col, text_col=text_col)
    exploded = g.select(
        "id",
        F.size("gram_hashes").alias("n_grams"),
        F.explode_outer("gram_hashes").alias("gram_hash"),
    )
    ev = eval_ngram_set(
        eval_docs, n=n, text_col=text_col, id_col=id_col
    ).withColumn("_hit", F.lit(1))
    return (
        exploded.join(F.broadcast(ev), "gram_hash", "left")
        .groupBy("id", "n_grams")
        .agg(F.sum("_hit").alias("_n_overlap"))
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            F.coalesce("_n_overlap", F.lit(0)).cast("int").alias("n_overlap"),
            (F.coalesce("_n_overlap", F.lit(0)) > 0).cast("int").alias(
                "is_contaminated"
            ),
        )
    )
