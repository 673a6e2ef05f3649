#!/usr/bin/env python
"""One-off profiling: fused vs staged pipeline wall-clock at a given
corpus/cores, plus a breakdown of the clusters stage. Usage:
  python scripts/profile_fused.py <cores> <corpus_dir> [fused|staged]
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
corpus = sys.argv[2]
mode = sys.argv[3] if len(sys.argv) > 3 else "fused"

from name_deduplication_python_spark.pipeline import DedupConfig, DedupPipeline
from name_deduplication_python_spark.session import get_spark

spark = get_spark(app_name=f"profile_{mode}", cores=cores,
                  shuffle_partitions=max(4 * cores, 16))
pages = spark.read.parquet(corpus)
workdir = os.path.join(REPO, ".bench_cache", f"profile_{mode}_c{cores}")
shutil.rmtree(workdir, ignore_errors=True)

t0 = time.time()
pipe = DedupPipeline(spark, workdir, DedupConfig(fuse_stages=(mode == "fused")))
clusters = pipe.run(pages)
e2e = time.time() - t0
n_clusters = clusters.select("cluster_id").distinct().count()
print(json.dumps({
    "mode": mode, "cores": cores, "e2e": round(e2e, 2),
    "stages": {k: round(v, 2) for k, v in pipe.stage_seconds.items()},
    "n_clusters": n_clusters,
}))
spark.stop()
