"""Tiered deduplication: the engine's dedup operators composed as one
escalating pass over a corpus — each tier is cheaper per byte than the
next and shrinks the input the next tier sees.

    exact     hash-identical texts collapse to the min-id keeper
              (one hash aggregate — the cheapest tier always runs first)
    near      MinHash/LSH + SimHash verify + connected components
              (the DedupPipeline spine; keeps each cluster's min id)
    semantic  SemDeDup cosine prune over an embedding column
              (operators/ann.semantic_assign + semantic_dedup)
    lines     CCNet-style repeated-line boilerplate REWRITE
              (operators/linededup.dedup_lines — drops no documents)
    spans     winnowing long-repeat span REWRITE, keep-first
              (operators/substring.dedup_spans — drops no documents)

This is a composition, not a new algorithm: every tier routes through
the operators the driver oracles already verify, in the order a
training-data pipeline runs them (the rewrite tiers run AFTER document
dropping so they never rewrite text that is about to be discarded, and
near-dup signatures are computed on post-exact survivors only). The
returned stats dict counts documents in/out (and rewrites) per tier.

Execution discipline mirrors trainset.build_training_set: each
document-dropping tier's survivor frame is persisted before its count
so no tier's lineage re-executes upstream tiers, and every cache except
the returned frame is released before returning. A 10^12-doc run
stages each tier boundary to a table instead (DedupPipeline's
stage/resume machinery is that path; tier order and semantics are
identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import DEFAULT_CONFIG
from .operators.linededup import dedup_lines
from .operators.substring import dedup_spans
from .trainset import near_dup_clusters

TIER_ORDER = ("exact", "near", "semantic", "lines", "spans")


def _keep_min_per_group(
    docs: DataFrame, groups: DataFrame, id_col: str
) -> DataFrame:
    """Survivors = docs whose id is its group's min id. groups is
    (id_col, gid); one hash aggregate + one semi join, both on the
    group key — no window, no SinglePartition."""
    keepers = groups.groupBy("gid").agg(F.min(id_col).alias(id_col))
    return docs.join(keepers.select(id_col), id_col, "semi")


def tiered_dedup(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    tiers: tuple = ("exact", "near", "lines", "spans"),
    embeddings: DataFrame | None = None,
    vec_col: str = "embedding",
    config: dict | None = None,
    cos_threshold: float = 0.95,
    n_lists: int = 16,
    semantic_mode: str = "prune",
) -> tuple[DataFrame, dict]:
    """Run the requested tiers (any subset of TIER_ORDER, always applied
    in canonical order) over docs (id_col, text_col, ...). The
    'semantic' tier requires `embeddings` (id_col, vec_col);
    semantic_mode picks its keep rule — 'prune' (SemDeDup smaller-id
    NOT-EXISTS, the oracle-mirrorable default) or 'chain' (connected
    components over the similarity edges: one survivor per TRANSITIVE
    semantic group — see operators/ann.semantic_dedup). Returns
    (survivors, stats): survivors carries the input columns with
    text_col rewritten by the line/span tiers; stats records
    n_input, per-tier n_out (and n_rewritten for rewrite tiers), and
    n_output."""
    unknown = set(tiers) - set(TIER_ORDER)
    if unknown:
        raise ValueError(f"unknown tiers {sorted(unknown)}; pick from {TIER_ORDER}")
    if "semantic" in tiers and embeddings is None:
        raise ValueError("the semantic tier needs the embeddings frame")
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)

    cur = docs
    cached: list[DataFrame] = []
    stats: dict = {"tiers": [t for t in TIER_ORDER if t in tiers]}
    stats["n_input"] = n = docs.count()

    if "exact" in tiers:
        groups = cur.select(
            F.col(id_col), F.xxhash64(F.col(text_col)).alias("gid")
        )
        cur = _keep_min_per_group(cur, groups, id_col).persist()
        cached.append(cur)
        stats["exact_n_out"] = n = cur.count()

    if "near" in tiers:
        spine = cur.select(F.col(id_col).alias("url"), F.col(text_col).alias("text"))
        clusters = near_dup_clusters(spine, cfg)
        groups = clusters.select(
            F.col("url").alias(id_col), F.col("cluster_id").alias("gid")
        )
        cur = _keep_min_per_group(cur, groups, id_col).persist()
        cached.append(cur)
        stats["near_n_out"] = n = cur.count()

    if "semantic" in tiers:
        from .operators.ann import semantic_assign, semantic_dedup

        assigned = semantic_assign(
            embeddings.join(cur.select(id_col), id_col, "semi"),
            id_col=id_col,
            vec_col=vec_col,
            n_lists=n_lists,
            seed=cfg["seed"],
        ).persist()  # coverage count + prune lineage share one pass
        cached.append(assigned)
        # drop ONLY documents the prune explicitly rejected: a doc with
        # no embedding row never reaches `assigned`, cannot be judged,
        # and must survive this tier (a semi join on kept ids would
        # silently delete every uncovered doc and misattribute the loss
        # to semantic dedup). Coverage is reported so a thin embeddings
        # table is visible in the stats.
        dropped = semantic_dedup(
            assigned,
            id_col=id_col,
            cos_threshold=cos_threshold,
            mode=semantic_mode,
        ).where(F.col("is_kept") == 0)
        stats["semantic_n_covered"] = assigned.count()
        cur = cur.join(dropped.select(id_col), id_col, "left_anti").persist()
        cached.append(cur)
        stats["semantic_n_out"] = n = cur.count()

    # rewrite tiers: document set is now final — rewrite survivors only.
    # Each rewrite involves a shuffle (line/span grouping), so persist
    # before the stats count or the next consumer re-runs it.
    if "lines" in tiers:
        rewritten = dedup_lines(
            cur, id_col=id_col, text_col=text_col, out_col="_t2"
        ).persist()
        cached.append(rewritten)
        stats["lines_n_rewritten"] = rewritten.where(
            F.col("_t2") != F.col(text_col)
        ).count()
        cur = rewritten.withColumn(text_col, F.col("_t2")).drop("_t2")

    if "spans" in tiers:
        rewritten = dedup_spans(
            cur, id_col=id_col, text_col=text_col, out_col="_t3"
        ).persist()
        cached.append(rewritten)
        stats["spans_n_rewritten"] = rewritten.where(
            F.col("_t3") != F.col(text_col)
        ).count()
        cur = rewritten.withColumn(text_col, F.col("_t3")).drop("_t3")

    stats["n_output"] = n
    out = cur.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    return out, stats
