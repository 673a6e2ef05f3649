"""Deterministic token-budget corpus sampling — take documents per
stratum (e.g. language) in a fixed pseudo-random priority order until a
token budget is filled.

Beyond-reference LLM-pipeline operator: data-mixture construction
(C4/Pile/LLaMA-style "N tokens of language X") needs a sampler that is
(a) deterministic across runs and cluster sizes, (b) uniform (no bias
toward file order), and (c) free of any per-stratum global sort. The
priority key is md5(doc_id) — reproducible everywhere, including the
DuckDB oracle.

Scale shape (the 100 TB plan): a naive
  sum(tokens) OVER (PARTITION BY lang ORDER BY key)
funnels each language through ONE reducer — a single task would sort
tens of TB for a web-scale English stratum. Instead the cumulative sum
is computed in two passes over uniform hash-range buckets (the md5
key's leading hex byte):

  pass 1: per (stratum, bucket) token partials — one map-combined
          groupBy producing exactly 256 x |strata| rows regardless of
          data size; bucket offsets come from a window over that tiny
          table (size-independent).
  pass 2: per (stratum, bucket) intra-bucket running sum — the window
          partitions by (stratum, bucket), so the sort is 1/256th of a
          stratum per task; global cum = broadcast offset + intra.

Because md5 is uniform, bucket skew is ~1/256 of a stratum with tight
concentration. The result equals the single-window cumulative sum
exactly (bucket ranges are contiguous in key order) — the oracle states
it as the naive window and hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_tokens(
    docs: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, stratum, n_tokens, cum_tokens): the exact per-stratum
    running token total in md5(id) priority order, computed with the
    two-pass bucketed plan described in the module docstring. Shared
    kernel of token_budget_sample and assign_shards.

    tokens_col: a PRECOMPUTED per-document token-count column to use
    instead of the whitespace split — the hand-off for real-tokenizer
    accounting (functions/bpe.bpe_token_counts adds such a column;
    budgets then mean BPE tokens, not whitespace tokens)."""
    toks = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(F.split(F.trim(F.col(text_col)), " "))
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).alias("stratum"),
        toks.cast("int").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("k"),
    ).withColumn("bucket", F.substring("k", 1, 2))

    # pass 1: 256 x |strata| partial sums; offsets via a window over the
    # tiny partials table (row count independent of corpus size).
    partials = base.groupBy("stratum", "bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_off = (
        Window.partitionBy("stratum")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        "stratum",
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0)).alias("offset"),
    )

    # pass 2: intra-bucket running sum; cum = offset + intra.
    w_in = (
        Window.partitionBy("stratum", "bucket")
        .orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), ["stratum", "bucket"])
        .withColumn(
            "cum_tokens",
            (F.col("offset") + F.sum("n_tokens").over(w_in)).cast("long"),
        )
        .select("id", "stratum", "n_tokens", "cum_tokens")
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int | None,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    budgets: DataFrame | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Documents whose running token total (in md5(id) priority order
    within each stratum) stays within the stratum's budget.

    ``budget_tokens`` applies one cap to EVERY stratum; ``budgets``
    (exactly one of the two) gives per-stratum caps as a tiny
    (strata_col, budget_tokens) frame — S rows, broadcast-joined — the
    mixture-weighting hand-off (mixture_weights(...budget_tokens=B)
    renames expected_tokens to budget_tokens and plugs in here).

    Returns (id_col, strata_col, n_tokens, cum_tokens) for the selected
    documents. A document that would cross its cap is excluded (hard
    cap, not nearest-target); strata absent from ``budgets`` are
    dropped entirely (cap 0 semantics)."""
    if (budget_tokens is None) == (budgets is None):
        raise ValueError(
            "pass exactly one of budget_tokens (global) or budgets "
            "(per-stratum frame)"
        )
    cum = cumulative_tokens(
        docs, strata_col=strata_col, id_col=id_col, text_col=text_col,
        tokens_col=tokens_col,
    )
    if budgets is None:
        kept = cum.where(F.col("cum_tokens") <= budget_tokens)
    else:
        caps = F.broadcast(
            budgets.select(
                F.col(strata_col).alias("stratum"),
                F.col("budget_tokens").alias("_cap"),
            )
        )
        kept = cum.join(caps, "stratum").where(
            F.col("cum_tokens") <= F.col("_cap")
        )
    return kept.select(
        F.col("id").alias(id_col),
        F.col("stratum").alias(strata_col),
        "n_tokens",
        "cum_tokens",
    )


def assign_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy shard packing for a training data loader: documents fill
    per-stratum shards of ~`tokens_per_shard` tokens in md5(id) priority
    order; a document belongs to the shard where it STARTS (documents
    never split, so a shard overflows by at most one document — the
    standard loader contract).

    Returns (id_col, strata_col, n_tokens, shard_id) with shard_id
    dense from 0 within each stratum. Same two-pass cumulative-sum
    plan as token_budget_sample — no per-stratum global sort.
    tokens_col: precomputed token counts (see cumulative_tokens)."""
    cum = cumulative_tokens(
        docs, strata_col=strata_col, id_col=id_col, text_col=text_col,
        tokens_col=tokens_col,
    )
    return cum.select(
        F.col("id").alias(id_col),
        F.col("stratum").alias(strata_col),
        "n_tokens",
        # integer div keeps the assignment exact at any corpus size
        # (no double rounding at 10^14-token cumulative counts)
        F.expr(f"(cum_tokens - n_tokens) div {int(tokens_per_shard)}")
        .cast("long")
        .alias("shard_id"),
    )


def mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    alpha: float = 0.5,
    budget_tokens: int | None = None,
) -> DataFrame:
    """Temperature-based source mixing weights (the Pile / ROOTS /
    multilingual-LM recipe): each group's sampling weight is its token
    mass raised to ``alpha``, normalized — alpha=1 reproduces natural
    proportions, alpha<1 flattens the mixture toward low-resource
    groups (alpha=0.5 is "temperature 2" sampling).

    Returns (group_col, group_tokens, weight) — plus expected_tokens
    when ``budget_tokens`` is given (the group's share of the training
    budget, computed from the UNROUNDED ratio). One map-combined
    aggregate reduces the corpus to S group rows (sources/snapshots,
    never documents); the normalizing window runs over those S rows
    only.

    Cross-engine exactness: alpha=0.5 uses sqrt (correctly rounded per
    IEEE 754 — bit-identical in any engine) and alpha=1.0 is exact;
    other alphas go through pow(), whose last bit may differ between
    libm implementations — fine in production, avoid under a
    value-hashing oracle.
    """
    mass = docs.groupBy(group_col).agg(
        F.sum(tokens_col).cast("bigint").alias("group_tokens")
    )
    if alpha == 0.5:
        raw = F.sqrt("group_tokens")
    elif alpha == 1.0:
        raw = F.col("group_tokens").cast("double")
    else:
        raw = F.pow("group_tokens", F.lit(alpha))
    scored = mass.select(group_col, "group_tokens", raw.alias("_raw"))
    total = F.sum("_raw").over(Window.partitionBy())
    out = scored.select(
        group_col,
        "group_tokens",
        F.round(F.col("_raw") / total, 6).alias("weight"),
        (F.col("_raw") / total).alias("_w"),
    )
    if budget_tokens is None:
        return out.drop("_w")
    return out.select(
        group_col,
        "group_tokens",
        "weight",
        F.round(F.lit(float(budget_tokens)) * F.col("_w"), 0)
        .cast("bigint")
        .alias("expected_tokens"),
    )
