#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times each declared query with
the noop sink against $SPARK_GRAFT_SF_DIR, optionally capturing
.explain("formatted") output per query. bench.py stays FROZEN for the
driver; this file exists so optimization rounds can cite per-query
before/after numbers and plan shapes without touching the measured file.

Usage:
  python bench_extra.py [query ...]          # time the named queries (default: all headline)
  PLANS_DIR=plans/r07 SUFFIX=_before python bench_extra.py --plans q1 q2
  REPEAT=2 python bench_extra.py q1          # best-of-N per query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from name_deduplication_python_spark.plans.queries import QUERIES
    from name_deduplication_python_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    capture_plans = "--plans" in sys.argv
    plans_dir = os.environ.get("PLANS_DIR", os.path.join(REPO, "plans", "r07"))
    suffix = os.environ.get("SUFFIX", "")
    repeat = int(os.environ.get("REPEAT", "1"))

    import bench as _bench

    names = args or _bench.HEADLINE_QUERIES
    spark = get_spark(
        app_name="bench_extra", cores=CPUS, shuffle_partitions=max(4 * CPUS, 16)
    )
    timings: dict[str, float] = {}
    for name in names:
        samples = []
        for r in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra: {name} [{r}]")
            t = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t, 3))
        timings[name] = min(samples)
        if repeat > 1:
            timings[f"{name}__samples"] = samples
        if capture_plans:
            os.makedirs(plans_dir, exist_ok=True)
            df = QUERIES[name](spark, SF_DIR)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
