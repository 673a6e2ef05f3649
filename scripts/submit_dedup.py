#!/usr/bin/env python
"""spark-submit job entry for the dedup pipeline (north_rule submission
mode: ``spark-submit --py-files``).

Usage (local sandbox; on a real cluster swap --master and add executor
confs — the job code is identical):

    cd /root/repo && zip -qr /tmp/name_dedup.zip name_deduplication_python_spark
    spark-submit --master 'local[32]' \
        --py-files /tmp/name_dedup.zip \
        scripts/submit_dedup.py \
        --input <pages parquet or iceberg table> \
        --workdir <stage output dir> \
        [--bands 25 --rows 5 --num-hashes 128 --shingle-k 5]

Reads web_pages (url, warc_ts, html, text, lang), runs
extract -> sign -> LSH join -> verify -> CC with checkpointed stages, and
prints the cluster summary JSON on stdout.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--bands", type=int, default=25)
    ap.add_argument("--rows", type=int, default=5)
    ap.add_argument("--num-hashes", type=int, default=128)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--jaccard-threshold", type=float, default=0.80)
    ap.add_argument("--bucket-cap", type=int, default=64)
    ap.add_argument(
        "--fuse-stages",
        action="store_true",
        help="3-job layout (extract fused into signatures, pairs into "
        "verify) — less resume granularity, fewer materializations",
    )
    ap.add_argument(
        "--no-exact-collapse",
        action="store_true",
        help="disable the identical-signature representative collapse",
    )
    args = ap.parse_args()

    # Session comes from spark-submit confs; only ensure AQE/Arrow here.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("name_dedup_submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from name_deduplication_python_spark.pipeline import DedupConfig, DedupPipeline

    cfg = DedupConfig(
        bands=args.bands,
        rows_per_band=args.rows,
        num_hashes=args.num_hashes,
        shingle_k=args.shingle_k,
        jaccard_threshold=args.jaccard_threshold,
        bucket_cap=args.bucket_cap,
        fuse_stages=args.fuse_stages,
        exact_collapse=not args.no_exact_collapse,
    )
    pages = spark.read.parquet(args.input)
    pipe = DedupPipeline(spark, args.workdir, cfg)
    pipe.run(pages)
    print(json.dumps({"summary": pipe.summary(), "stage_seconds": pipe.stage_seconds}))
    spark.stop()


if __name__ == "__main__":
    main()
