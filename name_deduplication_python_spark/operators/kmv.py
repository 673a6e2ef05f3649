"""KMV (k-minimum-values) bottom-k sketches: distinct counts and set
overlap between corpus slices at constant memory per group.

"How many distinct 5-gram shingles does each snapshot hold, and how much
does snapshot A overlap snapshot B?" is the corpus-level question behind
dedup planning (expected collapse rate before running the pipeline) and
crawl curation (is this source new material or a re-crawl of another?).
Exact answers need a distinct-aggregate over every gram — fine at test
scale, unaffordable as a routine report at 10^12 docs. The KMV sketch
(Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007 "On synopses for
distinct-value estimation") keeps only the k smallest hash values per
group:

  distinct estimate  D̂ = (k-1) / h_(k)      (h_(k) = k-th smallest hash,
                                              normalized to [0,1))
  overlap estimate   Ĵ = |L ∩ S_A ∩ S_B| / |L|,  L = bottom-k of S_A ∪ S_B
                                              (Beyer et al. §4: L is a
                                              uniform sample of the union)

Sketches are mergeable (union = bottom-k of concatenation), so per-slice
sketches computed once serve every pairwise question afterwards — the
report over S slices costs O(S² k), not another corpus pass.

Spark-first shape — no UDF:
  * hash = md5 hex prefix (default; bit-replayable in any engine with
    md5 — the driver-oracle setting, same discipline as dsir._bucket_expr)
    or xxhash64-hex for the faster scale setting.
  * distinct (group, hash) is ONE map-combined hash aggregate.
  * bottom-k per group runs TWO-PHASE: row_number within (group, salt)
    keeps ≤ salt_buckets·k survivors per group, then a second window
    over the survivors takes the true bottom-k. A single window over
    (group) would sort every distinct hash of a group in one task —
    exactly the single-partition sort that dies when one source holds
    billions of grams; the salted phase bounds every task at
    |distinct|/salt_buckets rows. (Same two-level shape as the dense
    renumbering pass, report.py A9.)
  * estimates/merges are array expressions over k-element arrays —
    whole-stage codegen, nothing driver-side.

The hex STRING order is the hash order (fixed-width lowercase hex), so
sketches compare bit-identically across engines; estimates use the first
12 hex chars as a 48-bit integer normalized by 2^48.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX48_DENOM = float(1 << 48)


def _hash_hex(value: Column, hash_fn: str = "md5") -> Column:
    """Fixed-width lowercase-hex hash whose STRING order is the hash
    order. md5 (default) replays bit-identically in DuckDB et al.;
    xxh64 is the faster scale setting (hex(xxhash64) zero-padded to 16)."""
    if hash_fn == "md5":
        return F.md5(value)
    if hash_fn == "xxh64":
        return F.lower(F.lpad(F.hex(F.xxhash64(value)), 16, "0"))
    raise ValueError(f"hash_fn must be 'md5' or 'xxh64', got {hash_fn!r}")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 128,
    hash_fn: str = "md5",
    salt_buckets: int = 32,
) -> DataFrame:
    """Bottom-k sketch per group: (*group_cols, sketch array<string>
    sorted ascending, n_distinct_est double).

    ``value_col`` rows need not be pre-deduplicated — the sketch is over
    DISTINCT values by construction. Groups with fewer than k distinct
    values get an exact count (their sketch IS the full hash set).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = list(group_cols)
    hashed = (
        df.select(*groups, _hash_hex(F.col(value_col), hash_fn).alias("_h"))
        # a NULL value hashes to NULL, sorts FIRST (asc_nulls_first) and
        # would consume a row_number slot in both windows while
        # collect_list silently drops it — a k-1 sketch then reads as an
        # "exact" count of k-1. NULLs carry no distinct-value meaning;
        # drop them before they can poison the sketch.
        .where(F.col("_h").isNotNull())
        .distinct()
    )
    # phase 1: bottom-k within (group, salt) — bounds every sort task
    salt = F.pmod(F.xxhash64("_h"), F.lit(salt_buckets)).alias("_s")
    w1 = Window.partitionBy(*groups, "_s").orderBy("_h")
    survivors = (
        hashed.select(*groups, "_h", salt)
        .withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("_r", "_s")
    )
    # phase 2: true bottom-k over the <= salt_buckets*k survivors
    w2 = Window.partitionBy(*groups).orderBy("_h")
    bottom = (
        survivors.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= k)
        .drop("_r")
    )
    sketch = bottom.groupBy(*groups).agg(
        F.array_sort(F.collect_list("_h")).alias("sketch")
    )
    return sketch.withColumn(
        "n_distinct_est", F.round(_distinct_estimate(F.col("sketch"), k), 4)
    )


def _distinct_estimate(sketch: Column, k: int) -> Column:
    """(k-1)/h_(k) on the normalized 48-bit prefix; exact size when the
    group had fewer than k distinct values."""
    kth = F.element_at(sketch, k)
    frac = (
        F.conv(F.substring(kth, 1, 12), 16, 10).cast("bigint")
        / F.lit(_HEX48_DENOM)
    )
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)


def kmv_jaccard(sketch_a: Column, sketch_b: Column, k: int) -> Column:
    """Beyer et al. §4 overlap estimate from two bottom-k sketches:
    L = bottom-k of the union, Ĵ = |{x in L : x in A and x in B}| / |L|.
    EXACT (equal to the true distinct-set Jaccard) whenever the union
    holds <= k values, i.e. both sketches are complete."""
    union_bottom = F.slice(F.array_sort(F.array_union(sketch_a, sketch_b)), 1, k)
    both = F.size(
        F.array_intersect(F.array_intersect(union_bottom, sketch_a), sketch_b)
    )
    return both / F.size(union_bottom)


def group_overlap_kmv(
    docs: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 128,
    hash_fn: str = "md5",
) -> DataFrame:
    """Pairwise overlap estimates between all groups: (src_group,
    dst_group, jaccard_est) for src < dst. One corpus pass builds the
    per-group sketches; the pairwise stage touches only S sketch rows of
    k strings each (broadcast-joined — S is slices/snapshots, never
    docs)."""
    # checkpoint before the self-join: the a-side and the broadcast
    # b-side otherwise EACH re-execute the full sketch build (the
    # dominant cost — a broadcast exchange doesn't reuse the probe
    # side's plan)
    sk = kmv_sketch(
        docs, [group_col], value_col, k=k, hash_fn=hash_fn
    ).localCheckpoint()
    a = sk.select(
        F.col(group_col).alias("src_group"), F.col("sketch").alias("_ska")
    )
    b = sk.select(
        F.col(group_col).alias("dst_group"), F.col("sketch").alias("_skb")
    )
    pairs = a.join(F.broadcast(b), F.col("src_group") < F.col("dst_group"))
    return pairs.select(
        "src_group",
        "dst_group",
        F.round(kmv_jaccard(F.col("_ska"), F.col("_skb"), k), 6).alias(
            "jaccard_est"
        ),
    )


def group_overlap_exact(
    docs: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The exact twin (oracle baseline at test scale): pairwise
    distinct-value Jaccard between groups via one distinct aggregate and
    a self-join on the value. Correct at any scale but the self-join
    carries every distinct (group, value) row — use the KMV path for
    routine 10^12-scale reports and this for audits of a slice."""
    # checkpoint: sizes + both join sides would otherwise re-run the
    # corpus-wide distinct three times
    vals = docs.select(group_col, value_col).distinct().localCheckpoint()
    sizes = vals.groupBy(group_col).agg(F.count("*").alias("_sz"))
    a = vals.select(
        F.col(group_col).alias("src_group"), F.col(value_col).alias("_v")
    )
    b = vals.select(
        F.col(group_col).alias("dst_group"), F.col(value_col).alias("_v")
    )
    inter = (
        a.join(b, "_v")
        .where(F.col("src_group") < F.col("dst_group"))
        .groupBy("src_group", "dst_group")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(
        F.col(group_col).alias("src_group"), F.col("_sz").alias("n_src")
    )
    sb = sizes.select(
        F.col(group_col).alias("dst_group"), F.col("_sz").alias("n_dst")
    )
    return (
        inter.join(F.broadcast(sa), "src_group")
        .join(F.broadcast(sb), "dst_group")
        .select(
            "src_group",
            "dst_group",
            "n_src",
            "n_dst",
            "n_inter",
            F.round(
                F.col("n_inter")
                / (F.col("n_src") + F.col("n_dst") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
