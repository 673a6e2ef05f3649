"""Build a training set from the driver testdata in one call:

    python examples/build_trainset.py [sf_dir]

Runs the full funnel (near-dup dedup -> best-quality representative ->
Gopher filter -> 13-gram decontamination against a held-out split ->
DSIR selection toward a second held-out "target" split -> PII scrub ->
per-language token budget -> shard packing) over `documents.parquet`
and prints the funnel stats plus a shard sample.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from name_deduplication_python_spark.session import get_spark
from name_deduplication_python_spark.trainset import build_training_set


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="build_trainset", cores=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    # deterministic held-out splits: a "benchmark" to scrub against and
    # a "target" corpus for DSIR to steer the mixture toward
    ev = docs.where(F.col("doc_id") % 23 == 0)
    tgt = docs.where((F.col("doc_id") % 23 != 0) & (F.col("doc_id") % 19 == 0))
    tr = docs.where((F.col("doc_id") % 23 != 0) & (F.col("doc_id") % 19 != 0))
    shards, stats = build_training_set(
        spark,
        tr,
        eval_docs=ev,
        budget_tokens=50_000,
        tokens_per_shard=10_000,
        target_docs=tgt,
        dsir_top_k=300,
    )
    print(stats)
    shards.orderBy("lang", "shard_id", "doc_id").show(10)
    spark.stop()


if __name__ == "__main__":
    main()
