"""Exact token-set similarity join with the AllPairs/PPJoin prefix filter.

Reference analog: the blocked candidate self-join J2
(/root/reference/analysis_engine.py:430-437) in its exact-Jaccard form.
The naive inverted-index join keys on EVERY distinct token, so a token
shared by m documents yields m^2 join rows — quadratic hot-token buckets
(the round-1 scale-killer in token_jaccard_pairs / linkage_pairs).

The prefix filter (Bayardo et al., "Scaling Up All Pairs Similarity
Search", WWW'07 — public) is provably lossless at threshold theta: order
each document's tokens by ascending global frequency (rarest first,
deterministic tiebreak on the token itself); keep only the first
|d| - ceil(theta*|d|) + 1 tokens as join keys. If J(A,B) >= theta then
the globally-smallest common token must sit inside BOTH prefixes (were it
outside A's prefix, every common token would be in A's suffix, giving
|A∩B| <= ceil(theta*|A|) - 1 < theta*|A∪B|, contradiction). Hot tokens
sort LAST, so they are exactly the ones the prefix drops — the same
skew-mitigation slot the north_rule's "salted band-bucket shuffles" names,
achieved here without salting because the filter removes the hot keys
outright. Verification is exact: one hash join per side to pull the full
token arrays, then a native array_intersect — no explosion.

Lossless-ness is property-tested against the naive join
(tests/test_properties.py) and the oracle queries stay value-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# queries compare round(J, 6) >= theta, which admits true J marginally
# below theta (0.4999997 rounds to 0.5); prune at a slightly looser bound
# so rounding-boundary pairs survive candidate generation
_ROUND_SLACK = 1e-6


def _prefix_rows(
    toks: DataFrame, freq: DataFrame, theta: float, id_col: str
) -> DataFrame:
    """(id, tok) -> the prefix token rows of each document."""
    w = Window.partitionBy(id_col).orderBy("tf", "tok")
    sz = F.count("*").over(Window.partitionBy(id_col))
    return (
        toks.join(freq, "tok")
        .select(
            id_col,
            "tok",
            F.row_number().over(w).alias("pos"),
            sz.alias("sz"),
        )
        .where(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(theta - _ROUND_SLACK) * F.col("sz")) + 1
        )
        .select(id_col, "tok")
    )


def set_similarity_join(
    docs_a: DataFrame,
    theta: float,
    docs_b: DataFrame | None = None,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    round_digits: int = 6,
) -> DataFrame:
    """Exact Jaccard >= theta pairs over array-of-distinct-token columns.

    Self-join when docs_b is None (canonical src < dst); otherwise a
    two-relation linkage (src from docs_a, dst from docs_b, J3 analog).
    Output: (src, dst, jaccard) with jaccard rounded and the predicate
    applied on the ROUNDED value — identical semantics to the naive join.
    """
    a_tok = docs_a.select(
        F.col(id_col).alias("_id"), F.explode(toks_col).alias("tok")
    )
    self_join = docs_b is None
    if self_join:
        all_tok = a_tok
    else:
        b_tok = docs_b.select(
            F.col(id_col).alias("_id"), F.explode(toks_col).alias("tok")
        )
        all_tok = a_tok.unionByName(b_tok)
    freq = all_tok.groupBy("tok").agg(F.count("*").alias("tf"))

    pa = _prefix_rows(a_tok, freq, theta, "_id")
    pb = pa if self_join else _prefix_rows(b_tok, freq, theta, "_id")

    cand = pa.select("tok", F.col("_id").alias("src")).join(
        pb.select("tok", F.col("_id").alias("dst")), "tok"
    )
    if self_join:
        cand = cand.where(F.col("src") < F.col("dst"))
    cand = cand.select("src", "dst").distinct()

    arrays_a = docs_a.select(
        F.col(id_col).alias("src"),
        F.col(toks_col).alias("ta"),
        F.size(toks_col).alias("sz_a"),
    )
    arrays_b = (docs_a if self_join else docs_b).select(
        F.col(id_col).alias("dst"),
        F.col(toks_col).alias("tb"),
        F.size(toks_col).alias("sz_b"),
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    jac = F.round(
        inter / (F.col("sz_a") + F.col("sz_b") - inter), round_digits
    )
    return (
        cand.join(arrays_a, "src")
        .join(arrays_b, "dst")
        .select("src", "dst", jac.alias("jaccard"))
        .where(F.col("jaccard") >= theta)
    )
