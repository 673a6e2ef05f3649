"""Cluster reporting: remarks, classification precedence, renumbering,
member lineage — the reference's report-generation semantics re-expressed
as DataFrame aggregates.

Reference analogs (SURVEY §2.5):
  A2  group remark      any fuzzy edge in cluster -> "Fuzzy Match"
                        (/root/reference/analysis_engine.py:584)
  A3  classification    precedence linked > duplicate > unique
                        (:585-620; officials tier doesn't exist for web
                        corpora — cross-corpus linkage takes its slot)
  A4  group ordering    class rank, remark rank, min member
  A9  renumbering       dense_rank to 1..N (:635)
  A5  summary stats     set-difference counts (:649-663)
  A10 row category      label joined back to members (:933-938)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_report(
    clusters: DataFrame,
    edges: DataFrame,
    corpus_of=None,
) -> DataFrame:
    """(url, cluster_id) x (src,dst,status) -> member rows with group_id,
    remark, category, and lineage columns.

    corpus_of: optional Column expr url -> corpus label (e.g. parsing a
    source prefix); clusters spanning >1 corpus are classified 'Linked
    Records' (J3/A3 analog), else 'Duplicate' (size>1) or 'Unique'.
    """
    # A2: cluster remark — any non-exact edge makes the cluster fuzzy
    edge_clusters = edges.join(
        clusters.select(F.col("url").alias("src"), "cluster_id"), "src"
    )
    remarks = edge_clusters.groupBy("cluster_id").agg(
        F.when(
            F.max((F.col("status") != "Exact Match").cast("int")) > 0,
            F.lit("Fuzzy Match"),
        )
        .otherwise(F.lit("Exact Match"))
        .alias("remark")
    )

    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"), F.min("url").alias("min_member")
    )

    base = clusters.join(sizes, "cluster_id").join(remarks, "cluster_id", "left")
    if corpus_of is not None:
        n_corpora = (
            clusters.withColumn("corpus", corpus_of(F.col("url")))
            .groupBy("cluster_id")
            .agg(F.countDistinct("corpus").alias("n_corpora"))
        )
        base = base.join(n_corpora, "cluster_id")
    else:
        base = base.withColumn("n_corpora", F.lit(1))

    # A3 precedence: Linked > Duplicate > Unique
    category = (
        F.when(F.col("n_corpora") > 1, F.lit("Linked Records"))
        .when(F.col("cluster_size") > 1, F.lit("Duplicate"))
        .otherwise(F.lit("Unique"))
    )
    cat_rank = (
        F.when(F.col("category") == "Linked Records", 0)
        .when(F.col("category") == "Duplicate", 1)
        .otherwise(2)
    )
    remark_rank = F.when(F.col("remark") == "Exact Match", 0).otherwise(1)

    labeled = base.withColumn("category", category).withColumn(
        "remark", F.coalesce("remark", F.lit("Exact Match"))
    )

    # A4 + A9: order clusters by (class, remark, min member), dense 1..N.
    # dense_rank over an UNPARTITIONED window funnels the whole member
    # table through one task (round-1 scale flag); instead rank the
    # cluster-level keys (one row per cluster) with a two-pass scheme —
    # range-partition on the sort key, local row_number, then add
    # per-partition offsets (a driver-side scalar list) — and join the
    # group ids back to members. Same output as the old dense_rank.
    keys = (
        labeled.select(
            "cluster_id",
            cat_rank.alias("cr"),
            remark_rank.alias("rr"),
            "min_member",
        )
        .distinct()
        .repartitionByRange(
            F.col("cr"), F.col("rr"), F.col("min_member"), F.col("cluster_id")
        )
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("pid").orderBy(
        "cr", "rr", F.col("min_member"), F.col("cluster_id")
    )
    local = keys.withColumn("lrn", F.row_number().over(w_local)).localCheckpoint()
    # per-partition counts: one tiny row per partition (range partitions
    # are ordered by partition id, so cumulative counts are the offsets)
    counts = {
        r["pid"]: r["n"]
        for r in local.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    group_ids = local.select(
        "cluster_id", (off_map[F.col("pid")] + F.col("lrn")).alias("group_id")
    )
    return (
        labeled.join(group_ids, "cluster_id")
        .select(
            "group_id",
            "url",
            "cluster_id",
            "category",
            "remark",
            "cluster_size",
        )
        .orderBy("group_id", "url")
    )


def summary_stats(report: DataFrame) -> dict:
    """A5 analog: disjoint category counts + totals."""
    row = (
        report.agg(
            F.count("*").alias("total_rows"),
            F.countDistinct("group_id").alias("n_groups"),
            F.sum((F.col("category") == "Linked Records").cast("int")).alias(
                "linked_rows"
            ),
            F.sum((F.col("category") == "Duplicate").cast("int")).alias("dup_rows"),
            F.sum((F.col("category") == "Unique").cast("int")).alias("unique_rows"),
            F.sum((F.col("remark") == "Fuzzy Match").cast("int")).alias("fuzzy_rows"),
        )
        .collect()[0]
        .asDict()
    )
    return {k: int(v) for k, v in row.items()}


def top_k_by(df: DataFrame, col: str, k: int = 5) -> DataFrame:
    """A7 analog (top-5 cities): top-k values of a column by frequency,
    deterministic tiebreak."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
        .limit(k)
    )


def best_member_per_cluster(
    members: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Quality-aware representative selection: per cluster keep the
    member with the highest score, ties broken by smallest id — the
    training-data policy ("keep the best copy, drop the rest") that
    replaces the pipeline's default min-url representative when a
    quality signal exists.

    One map-combined aggregate (min over a (-score, id) struct — the
    lexicographic min IS argmax-score-with-min-id-tiebreak), no window,
    no per-cluster sort: at 10^12 docs this is a single combine-heavy
    shuffle keyed by cluster_id, the same key the CC output already
    carries. The ordering is inverted on the NUMERIC score (negation),
    never on the id, so ids keep their native type — the pipeline's
    canonical string urls work unchanged (negating a string id would
    raise CAST_INVALID_INPUT under ANSI mode). Returns (cluster_col,
    rep_<id_col>, rep_<score_col>, n_members)."""
    m = F.min(
        F.struct(
            (-F.col(score_col)).alias("ns"), F.col(id_col).alias("i")
        )
    ).alias("m")
    return (
        members.groupBy(cluster_col)
        .agg(m, F.count("*").alias("n_members"))
        .select(
            cluster_col,
            F.col("m.i").alias(f"rep_{id_col}"),
            (-F.col("m.ns")).alias(f"rep_{score_col}"),
            "n_members",
        )
    )
