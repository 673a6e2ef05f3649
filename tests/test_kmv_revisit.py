"""KMV bottom-k sketches (operators/kmv.py) and re-crawl revisit diffs
(operators/revisit.py)."""

from __future__ import annotations

import hashlib

import pytest

from name_deduplication_python_spark.operators.kmv import (
    group_overlap_exact,
    group_overlap_kmv,
    kmv_sketch,
)
from name_deduplication_python_spark.operators.revisit import revisit_diffs


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- KMV ----


def test_kmv_sketch_is_bottom_k_of_distinct_hashes(spark):
    vals = [f"w{i}" for i in range(300)]
    rows = [("g", v) for v in vals] + [("g", v) for v in vals[:50]]  # dupes
    df = spark.createDataFrame(rows, "grp string, v string")
    got = kmv_sketch(df, ["grp"], "v", k=16).collect()[0]
    expected = sorted(_md5(v) for v in set(vals))[:16]
    assert got["sketch"] == expected


def test_kmv_null_values_do_not_poison_sketch(spark):
    # a NULL value hashes to NULL; it must neither occupy a bottom-k
    # slot nor shrink the sketch into a fake "exact" count
    rows = [("g", f"w{i}") for i in range(300)] + [("g", None)]
    df = spark.createDataFrame(rows, "grp string, v string")
    got = kmv_sketch(df, ["grp"], "v", k=16).collect()[0]
    expected = sorted(_md5(f"w{i}") for i in range(300))[:16]
    assert got["sketch"] == expected


def test_kmv_exact_count_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"w{i}") for i in range(7)], "grp string, v string"
    )
    row = kmv_sketch(df, ["grp"], "v", k=64).collect()[0]
    assert len(row["sketch"]) == 7
    assert row["n_distinct_est"] == 7.0


def test_kmv_distinct_estimate_close(spark):
    n = 5000
    df = spark.createDataFrame(
        [("g", f"word-{i}") for i in range(n)], "grp string, v string"
    )
    est = kmv_sketch(df, ["grp"], "v", k=256).collect()[0]["n_distinct_est"]
    # KMV stderr ~ D/sqrt(k-2) -> ~6.3% at k=256; allow 4 sigma
    assert abs(est - n) / n < 0.25


def test_kmv_jaccard_exact_when_union_fits_in_k(spark):
    a = {f"a{i}" for i in range(30)}
    shared = {f"s{i}" for i in range(20)}
    b = {f"b{i}" for i in range(10)}
    rows = [("A", v) for v in a | shared] + [("B", v) for v in b | shared]
    df = spark.createDataFrame(rows, "grp string, v string")
    got = group_overlap_kmv(df, "grp", "v", k=128).collect()[0]
    true_j = len(shared) / len(a | shared | b)
    assert got["src_group"] == "A" and got["dst_group"] == "B"
    assert got["jaccard_est"] == pytest.approx(true_j, abs=1e-6)


def test_kmv_two_phase_matches_single_sort(spark):
    # salted two-phase bottom-k must equal the trivial bottom-k for any
    # salt_buckets (the phase-1 cut keeps k per salt, a superset of the
    # true bottom-k)
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(500)], "grp string, v string"
    )
    one = kmv_sketch(df, ["grp"], "v", k=32, salt_buckets=1).collect()[0]
    many = kmv_sketch(df, ["grp"], "v", k=32, salt_buckets=64).collect()[0]
    assert one["sketch"] == many["sketch"]


def test_group_overlap_exact_counts(spark):
    rows = (
        [("A", v) for v in ["x", "y", "z", "w"]]
        + [("B", v) for v in ["y", "z", "q"]]
        + [("B", "y")]  # duplicate must not inflate counts
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    got = group_overlap_exact(df, "grp", "v").collect()[0]
    assert (got["n_src"], got["n_dst"], got["n_inter"]) == (4, 3, 2)
    assert got["jaccard"] == pytest.approx(2 / 5, abs=1e-6)


def test_kmv_plans_are_python_free(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(50)], "grp string, v string"
    )
    for frame in (
        kmv_sketch(df, ["grp"], "v", k=8),
        group_overlap_kmv(df, "grp", "v", k=8),
        group_overlap_exact(df, "grp", "v"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


# ------------------------------------------------------------- revisit ----


def _pages(spark):
    rows = [
        ("u1", 1, "the cat sat on the mat"),
        ("u1", 2, "the cat sat on the mat"),          # re-serve: J=1
        ("u1", 3, "a dog ran through the park now"),  # full rewrite
        ("u2", 5, "alpha beta gamma"),
        ("u2", 9, "alpha beta gamma delta"),          # small edit
        ("u3", 4, "only crawled once"),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts long, text string")


def test_revisit_pairs_consecutive_versions(spark):
    got = {
        (r["url"], r["prev_version"], r["version"]): r
        for r in revisit_diffs(
            _pages(spark), version_col="warc_ts"
        ).collect()
    }
    # one row per revisit; single-crawl urls absent
    assert set(got) == {("u1", 1, 2), ("u1", 2, 3), ("u2", 5, 9)}
    assert got[("u1", 1, 2)]["jaccard"] == 1.0
    assert got[("u1", 1, 2)]["is_changed"] == 0
    # rewrite shares only 'the': |inter|=1, |union|=11
    assert got[("u1", 2, 3)]["jaccard"] == pytest.approx(1 / 11, abs=1e-4)
    assert got[("u1", 2, 3)]["is_changed"] == 1
    assert got[("u2", 5, 9)]["jaccard"] == pytest.approx(3 / 4, abs=1e-6)


def test_revisit_orders_by_version_not_arrival(spark):
    rows = [("u", 20, "b b b"), ("u", 10, "a a a")]  # arrival != version
    df = spark.createDataFrame(rows, "url string, warc_ts long, text string")
    got = revisit_diffs(df, version_col="warc_ts").collect()
    assert len(got) == 1
    assert (got[0]["prev_version"], got[0]["version"]) == (10, 20)
    assert got[0]["jaccard"] == 0.0


def test_revisit_plan_is_python_free_single_exchange(spark):
    frame = revisit_diffs(_pages(spark), version_col="warc_ts")
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # ONE keyed exchange: the url-partitioned window sort
    assert plan.count("Exchange hashpartitioning") == 1
