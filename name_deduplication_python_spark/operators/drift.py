"""Source-distribution drift: per-group KL divergence of the hashed
token distribution against the whole corpus.

Mixture design (sampler.mixture_weights) weights sources by token MASS;
this operator measures how DIFFERENT each source's content is — the
other axis a data-mixing decision needs (a tiny source that is
distributionally far from the corpus carries more novelty per token
than a large one that mirrors it; conversely a high-KL source can flag
contamination/boilerplate). The same hashed-unigram bucketization as
DSIR/LM-quality (operators/dsir._bucket_expr — md5-prefix, bit-exact in
DuckDB) keeps the whole computation value-auditable.

    P_s(b) = (c_sb + 1) / (N_s + B)      Laplace-smoothed source dist
    Q(b)   = (C_b  + 1) / (N  + B)       smoothed corpus dist
    KL(s)  = sum over ALL B buckets of P_s(b) * ln(P_s(b) / Q(b))

The sum runs over the FULL bucket range (unobserved buckets contribute
their smoothed mass), so the value is a true KL between the smoothed
distributions — no truncation to disclose. Scale shape: one explode +
one map-combined (group, bucket) count collapses the corpus to at most
S*B rows (B=4096 default — thousands, not billions); the dense grid is
S*B rows built from a sequence literal; everything after the first
aggregate is size-independent of the corpus. ln is IEEE-correctly
computed in both engines to well below the rounded precision
(ccnet_lm_ppl precedent).

Reference analog: A5/A6 summary statistics (/root/reference/
analysis_engine.py report heart) — corpus-level composition reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import _bucket_expr


def source_token_kl(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    buckets: int = 4096,
    hash_fn: str = "md5",
) -> DataFrame:
    """(group_col, n_tokens, kl_vs_corpus) per group — KL of the group's
    smoothed hashed-unigram distribution against the whole corpus',
    rounded to 4 places. Null-text docs contribute nothing."""
    tok = docs.where(F.col(text_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("_t"),
    )
    bucketed = tok.select(
        "grp", _bucket_expr(F.col("_t"), buckets, hash_fn=hash_fn).alias("b")
    )
    # corpus collapses to <= S*B count rows in ONE map-combined aggregate
    # eager + tiny (<= S*B rows): four consumers read it without
    # re-running the corpus explode, and lineage is truncated
    cnt = bucketed.groupBy("grp", "b").agg(F.count("*").alias("c")).localCheckpoint()
    grp_tot = cnt.groupBy("grp").agg(F.sum("c").alias("n_s"))
    glob = cnt.groupBy("b").agg(F.sum("c").alias("cb"))
    n_total = cnt.agg(F.sum("c").alias("n")).select("n")

    # dense S x B grid: every (group, bucket) pair, observed or not
    grid = (
        grp_tot.select("grp", "n_s")
        .crossJoin(
            F.broadcast(
                docs.sparkSession.range(buckets).select(
                    F.col("id").cast("int").alias("b")
                )
            )
        )
        .join(cnt, ["grp", "b"], "left")
        .join(F.broadcast(glob), "b", "left")
        .crossJoin(F.broadcast(n_total))
    )
    p = (F.coalesce("c", F.lit(0)) + 1) / (F.col("n_s") + buckets)
    q = (F.coalesce("cb", F.lit(0)) + 1) / (F.col("n") + buckets)
    out = (
        grid.select("grp", "n_s", (p * F.log(p / q)).alias("_term"))
        .groupBy("grp", "n_s")
        .agg(F.round(F.sum("_term"), 4).alias("kl_vs_corpus"))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_s").cast("bigint").alias("n_tokens"),
            "kl_vs_corpus",
        )
    )
    return out
