"""Post-hoc audit: adversarial re-verification of emitted match edges.

Reference analog: the auditor tool re-checks every reported pair with
independent similarity floors and consistency rules (R1-R5,
/root/reference/auditor.py:229-277). New-engine analog per SURVEY §2.9
R4: recompute EXACT shingle-Jaccard on a sample of verified edges and
flag estimate/exact divergences (LSH/MinHash false positives) and
"Exact Match" edges whose texts differ.

The exact-Jaccard recompute is a grouped Arrow-batch kernel over sampled
pairs only — audit is off the hot path by design (the reference's auditor
is likewise a separate post-run tool).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact_jaccard_batch(
    src_texts: pd.Series, dst_texts: pd.Series, k: int
) -> pd.Series:
    def shingles(t: str) -> frozenset:
        toks = (t or "").split(" ")
        if len(toks) < k:
            return frozenset([tuple(toks)]) if t else frozenset()
        return frozenset(tuple(toks[i : i + k]) for i in range(len(toks) - k + 1))

    out = []
    for a, b in zip(src_texts, dst_texts):
        sa, sb = shingles(a), shingles(b)
        u = len(sa | sb)
        out.append(len(sa & sb) / u if u else 0.0)
    return pd.Series(out)


def audit_edges(
    edges: DataFrame,
    extracted: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    shingle_k: int = 5,
    sample_fraction: float = 1.0,
    est_tolerance: float = 0.15,
    jaccard_threshold: float = 0.80,
    seed: int = 42,
) -> DataFrame:
    """Returns flagged rows: (src, dst, status, est_jaccard, exact_jaccard,
    issue). Empty result = audit clean."""
    sampled = edges if sample_fraction >= 1.0 else edges.sample(
        fraction=sample_fraction, seed=seed
    )
    texts = extracted.select(F.col(id_col), F.col(text_col))
    joined = (
        sampled.join(
            texts.select(
                F.col(id_col).alias("src"), F.col(text_col).alias("text_a")
            ),
            "src",
        )
        .join(
            texts.select(
                F.col(id_col).alias("dst"), F.col(text_col).alias("text_b")
            ),
            "dst",
        )
    )

    out_schema = (
        "src string, dst string, status string, est_jaccard double, "
        "exact_jaccard double"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ex = _exact_jaccard_batch(pdf["text_a"], pdf["text_b"], shingle_k)
            yield pd.DataFrame(
                {
                    "src": pdf["src"].astype(str),
                    "dst": pdf["dst"].astype(str),
                    "status": pdf["status"],
                    "est_jaccard": pdf["est_jaccard"],
                    "exact_jaccard": ex,
                }
            )

    scored = joined.select(
        "src", "dst", "status", "est_jaccard", "text_a", "text_b"
    ).mapInPandas(gen, schema=out_schema)

    # R4-style rules: estimate drift, exact-status inconsistency, and
    # pairs kept only by SimHash whose true Jaccard is far below threshold.
    # NOTE "Exact Match" is the signature-resolution tier (all 128
    # minhashes agree — which a true-J=0.99 pair passes with p=0.28), the
    # analog of the reference's score>198 tier, NOT byte equality; the
    # audit flags it only when the true Jaccard shows a real false
    # positive (< 0.95).
    issue = (
        F.when(
            (F.col("status") == "Exact Match") & (F.col("exact_jaccard") < 0.95),
            F.lit("exact-status-but-texts-differ"),
        )
        .when(
            F.abs(F.col("est_jaccard") - F.col("exact_jaccard")) > est_tolerance,
            F.lit("estimate-drift"),
        )
        .when(
            (F.col("status") == "Fuzzy Match")
            & (F.col("exact_jaccard") < jaccard_threshold * 0.5),
            F.lit("low-true-similarity"),
        )
        .otherwise(F.lit(None))
    )
    return (
        scored.withColumn("issue", issue)
        .where(F.col("issue").isNotNull())
        .select("src", "dst", "status", "est_jaccard", "exact_jaccard", "issue")
    )
