"""Gopher repetition filters: the in-document repetition half of the
Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Appendix A —
the half functions/text_stats.gopher_flags does NOT cover; that module
holds the outlier rules: word count, mean word length, alpha fraction,
bullet/ellipsis lines, stopwords).

Signals, per document (the published thresholds in GOPHER_REP_THRESHOLDS):

  dup_line_frac         fraction of non-blank LINES whose text occurs
                        more than once in the document        (<= 0.30)
  dup_line_char_frac    fraction of line characters sitting in such
                        duplicated lines                      (<= 0.20)
  dup_para_frac         same pair over PARAGRAPHS (blank-line-separated
                        blocks), when paragraphs=True         (<= 0.30)
  dup_para_char_frac                                          (<= 0.20)
  top_{2,3,4}gram_char_frac   fraction of text characters covered by
                        occurrences of the single most frequent word
                        n-gram                 (<= 0.20 / 0.18 / 0.16)
  dup_{5..10}gram_char_frac   fraction of text characters covered by
                        word n-grams occurring more than once
                        (<= 0.15 / 0.14 / 0.13 / 0.12 / 0.11 / 0.10)

Closed-form variant, stated precisely so any engine replays it: words
are the single-space split (the engine-wide tokenization); an n-gram's
character length is sum(len(word)) + (n-1) separators; occurrence
character mass is count * len; fractions divide by the document's text
length and are CAPPED at 1.0. Overlapping occurrences are counted
per-occurrence (not as a merged character span) — an overlap-insensitive
upper bound on the true covered-span fraction, which makes the rule
STRICTER than span-marking implementations on pathological repeats and
identical on the common case (the paper does not specify span merging;
DuckDB mirrors this arithmetic exactly, which is what makes the driver
oracle possible). Blank lines are excluded from the line rules
(paragraph structure, same contract as operators/linededup.py).

Scale shape at 10^12 docs: one explode per requested n plus one per-
(doc, gram) hash aggregate — every shuffle is keyed by (doc_id, gram),
map-side combined, and collapses back to one row per document before
the join; nothing is corpus-global, no window over full text, no
driver collect. The n-gram explodes dominate (sum over n of ~tokens
rows); callers trim `ns` to the subset they act on (C4/RefinedWeb
pipelines commonly run {2,3,4} + {5..10} exactly as defaulted here).

Reference analog: P6 hard-reject predicates (/root/reference/
analysis_engine.py:355) — cheap per-record rejection before scoring;
SURVEY §2 F-family threshold discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the published Appendix A thresholds (document REMOVED when exceeded)
GOPHER_REP_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_frac": 0.30,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def _gram_rows(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram_len, cnt) for every distinct word n-gram of the doc —
    grams built with element_at over the token index range (the
    concat_ws-over-slice shape corrupts under the Spark 4.1.2 vectorized
    parquet reader when hashed; element_at concat is the audited-safe
    shape, operators/dsir.py) and counted by one map-combined aggregate
    keyed (id, gram)."""
    toks = F.split(F.trim(F.col(text_col)), " ")
    # condition the INPUT index array, not the transform output — and
    # never sequence(1, 0): with stop < start Spark generates a
    # DESCENDING sequence, not an empty one
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .groupBy("id", "g")
        .agg(F.count("*").alias("cnt"))
        .select("id", F.length("g").alias("glen"), "cnt")
    )


def repetition_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = TOP_NS,
    dup_ns: tuple = DUP_NS,
    paragraphs: bool = False,
) -> DataFrame:
    """(id_col, <signal columns>, passes_gopher_repetition) for every
    input document. Signals and thresholds per the module docstring;
    `passes_gopher_repetition` is the conjunction over the REQUESTED
    subset (untested signals don't gate). paragraphs=True adds the
    dup-paragraph pair (paragraph = maximal block between blank lines,
    the Gopher formulation; single-paragraph docs trivially pass).
    Fractions rounded to 4 places (cross-engine float hygiene, same as
    the other stats ops)."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("_chars"),
        F.col(text_col).alias("_t"),
    )

    def _block_fracs(split_pat: str, kind: str):
        """Per-doc dup fractions over text blocks (lines or paragraphs):
        per-(doc, block) counts -> one row per doc."""
        return (
            base.select(
                "id", F.explode(F.split("_t", split_pat)).alias("blk")
            )
            .where(F.trim("blk") != "")
            .groupBy("id", "blk")
            .agg(F.count("*").alias("cnt"))
            .groupBy("id")
            .agg(
                F.sum("cnt").alias("_n"),
                F.sum(
                    F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)
                ).alias("_n_dup"),
                F.sum(F.length("blk") * F.col("cnt")).alias("_bchars"),
                F.sum(
                    F.when(
                        F.col("cnt") > 1, F.length("blk") * F.col("cnt")
                    ).otherwise(0)
                ).alias("_dup_bchars"),
            )
            .select(
                "id",
                F.round(F.col("_n_dup") / F.col("_n"), 4).alias(
                    f"dup_{kind}_frac"
                ),
                F.round(
                    F.col("_dup_bchars")
                    / F.greatest(F.col("_bchars"), F.lit(1)),
                    4,
                ).alias(f"dup_{kind}_char_frac"),
            )
        )

    out = base.select("id", "_chars").join(
        _block_fracs(r"\r?\n", "line"), "id", "left"
    )
    if paragraphs:
        out = out.join(
            _block_fracs(r"(\r?\n)(\r?\n)+", "para"), "id", "left"
        )
    cols = {}
    for n in top_ns:
        g = (
            _gram_rows(base.select("id", F.col("_t")), "id", "_t", n)
            .groupBy("id")
            .agg(F.max(F.struct(F.col("cnt"), F.col("glen"))).alias("_m"))
            .select(
                "id",
                (F.col("_m.cnt") * F.col("_m.glen")).alias(f"_top{n}"),
            )
        )
        out = out.join(g, "id", "left")
        cols[f"top_{n}gram_char_frac"] = f"_top{n}"
    for n in dup_ns:
        g = (
            _gram_rows(base.select("id", F.col("_t")), "id", "_t", n)
            .where(F.col("cnt") > 1)
            .groupBy("id")
            .agg(F.sum(F.col("cnt") * F.col("glen")).alias(f"_dup{n}"))
        )
        out = out.join(g, "id", "left")
        cols[f"dup_{n}gram_char_frac"] = f"_dup{n}"

    block_kinds = ["line"] + (["para"] if paragraphs else [])
    sel = [F.col("id").alias(id_col)]
    gates = []
    for kind in block_kinds:
        for col in (f"dup_{kind}_frac", f"dup_{kind}_char_frac"):
            sel.append(F.coalesce(col, F.lit(0.0)).alias(col))
            gates.append(F.col(col) <= GOPHER_REP_THRESHOLDS[col])
    for name, raw in cols.items():
        frac = F.round(
            F.least(
                F.coalesce(F.col(raw), F.lit(0)).cast("double")
                / F.greatest(F.col("_chars"), F.lit(1)),
                F.lit(1.0),
            ),
            4,
        )
        sel.append(frac.alias(name))
        gates.append(F.col(name) <= GOPHER_REP_THRESHOLDS[name])
    passes = gates[0]
    for g in gates[1:]:
        passes = passes & g
    return out.select(*sel).withColumn(
        "passes_gopher_repetition", passes.cast("int")
    )


def filter_repetitive(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw
) -> DataFrame:
    """Keep only documents passing the repetition conjunction — the
    pipeline-facing form (one semi join back to the full rows)."""
    keep = repetition_flags(docs, id_col=id_col, text_col=text_col, **kw)
    return docs.join(
        keep.where(F.col("passes_gopher_repetition") == 1).select(id_col),
        id_col,
        "semi",
    )
