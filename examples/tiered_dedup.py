"""Run the tier-dedup composition over the driver testdata:

    python examples/tiered_dedup.py [sf_dir]

Applies exact -> near -> semantic -> line-rewrite -> span-rewrite over
`documents.parquet` (semantic tier joins `embeddings.parquet`) and
prints the per-tier stats plus a survivor sample.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from name_deduplication_python_spark.session import get_spark
from name_deduplication_python_spark.tiers import tiered_dedup


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="tiered_dedup", cores=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"), "text", "lang"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("string").alias("url"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    survivors, stats = tiered_dedup(
        docs,
        tiers=("exact", "near", "semantic", "lines", "spans"),
        embeddings=emb,
        cos_threshold=0.99,
    )
    print(stats)
    survivors.orderBy("url").show(5, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
