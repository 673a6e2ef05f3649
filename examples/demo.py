#!/usr/bin/env python
"""End-to-end walkthrough of the engine's main APIs on a small synthetic
corpus. Run: python examples/demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from name_deduplication_python_spark.operators.ann import embedding_near_dup_pairs  # noqa: E402
from name_deduplication_python_spark.operators.audit import audit_edges  # noqa: E402
from name_deduplication_python_spark.operators.report import (  # noqa: E402
    cluster_report,
    summary_stats,
)
from name_deduplication_python_spark.operators.substring import substring_pairs  # noqa: E402
from name_deduplication_python_spark.pipeline import DedupConfig, DedupPipeline  # noqa: E402
from name_deduplication_python_spark.session import get_spark  # noqa: E402
from name_deduplication_python_spark.sources.corpus import (  # noqa: E402
    corpus_to_spark,
    generate_corpus,
)


def main() -> None:
    spark = get_spark(app_name="demo", cores=8)

    # 1) synthetic Common-Crawl-style corpus with planted duplicate families
    pages, truth = generate_corpus(n_base=150, seed=42)
    df = corpus_to_spark(spark, pages)
    print(f"corpus: {len(pages)} pages, {len(truth)} planted dup pairs")

    # 2) the full near-dup pipeline (checkpointed stages; re-run resumes)
    workdir = tempfile.mkdtemp(prefix="dedup_demo_")
    pipe = DedupPipeline(spark, workdir, DedupConfig(extra={"audit": True}))
    clusters = pipe.run(df)
    print("summary:", pipe.summary())
    print("stage seconds:", {k: round(v, 2) for k, v in pipe.stage_seconds.items()})

    # 3) cluster report with remarks/categories/group ids
    edges = spark.read.parquet(os.path.join(workdir, "edges"))
    rep = cluster_report(clusters, edges)
    rep.show(8, truncate=False)
    print("report stats:", summary_stats(rep))

    # 4) audit: re-verify kept edges against exact Jaccard
    extracted = spark.read.parquet(os.path.join(workdir, "extracted"))
    flagged = audit_edges(edges, extracted)
    print("audit flags:", flagged.count())

    # 5) exact long-repeat (substring) pass
    subs = substring_pairs(extracted)
    print("long-repeat pairs:", subs.count())

    # 6) embedding near-dup (hyperplane LSH + exact cosine verify)
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(0)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(50)]
    rows += [(100 + i, (base[i] + 0.01 * rng.standard_normal(16).astype(np.float32)).tolist()) for i in range(5)]
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        "vec_id bigint, embedding array<float>",
    )
    dups = embedding_near_dup_pairs(emb, cos_threshold=0.95)
    print("embedding near-dups:", sorted((r["src"], r["dst"]) for r in dups.collect()))

    spark.stop()


if __name__ == "__main__":
    main()
