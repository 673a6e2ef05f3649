"""Text-analysis column expressions (training-data pipeline ops): all
native Column builders so Catalyst keeps them inside codegen and DuckDB
oracles can mirror them exactly (plans/queries.py uses the same rules).

  - token counting (whitespace + a BPE-ish subword regex estimate)
  - language-ID heuristic (closed stopword lists + script detection)
  - quality scoring (length / punctuation / stopword / alpha ratios)
  - rolling-hash document fingerprint (xxhash64 over normalized text)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKENS = lambda c: F.split(F.trim(c), r"\s+")  # noqa: E731

# BPE-ish: word pieces = runs of letters, digits, or single punctuation —
# the regex shape of GPT-2's tokenizer pre-split (public), as a token-count
# ESTIMATE (no vocab merge step).
_BPE_PIECE = r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "un", "est"],
}


def token_count(c) -> Column:
    return F.size(TOKENS(c))


def bpe_token_estimate(c) -> Column:
    """Subword-piece count via regexp extraction (vectorized, JVM-side)."""
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_PIECE), 0))


def stopword_hits(c, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(TOKENS(F.lower(c)), lambda t: F.array_contains(arr, t)))


def lang_id(c) -> Column:
    """Heuristic language-ID: CJK script detection, else argmax stopword
    hits over closed lists, else 'und'. Deterministic closed rules (the
    oracle mirrors them in SQL)."""
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿぀-ヿ가-힯]", ""))
    hits = {lang: stopword_hits(c, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(cjk > 0, F.lit("zh/ja/ko"))
    # deterministic tiebreak: language order en, es, de, fr
    for lang in ("en", "es", "de", "fr"):
        expr = expr.when((best > 0) & (hits[lang] == best), F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(c, n_chars=None) -> Column:
    """Composite 0-1 quality heuristic: length band, alpha ratio, stopword
    presence, punctuation ratio. Weights fixed and documented."""
    n = F.length(c) if n_chars is None else F.coalesce(n_chars, F.length(c))
    toks = token_count(c)
    alpha_ratio = F.length(F.regexp_replace(c, r"[^a-zA-Z]", "")) / F.greatest(n, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")) / F.greatest(n, F.lit(1))
    stop_ratio = stopword_hits(c, "en") / F.greatest(toks, F.lit(1))
    len_band = (
        F.when((toks >= 50) & (toks <= 10000), 1.0)
        .when(toks >= 20, 0.5)
        .otherwise(0.0)
    )
    return F.round(
        0.35 * len_band
        + 0.30 * F.least(alpha_ratio * 1.25, F.lit(1.0))
        + 0.20 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.15 * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))),
        4,
    )


def doc_fingerprint(c) -> Column:
    """64-bit deterministic fingerprint of whitespace-normalized text."""
    return F.xxhash64(F.regexp_replace(F.trim(c), r"\s+", " "))


def gopher_flags(c) -> dict[str, Column]:
    """Gopher-style document-quality filter signals (Rae et al. 2021,
    Appendix A — the closed, SQL-mirrorable subset): word count band,
    mean word length band, fraction of words containing a letter,
    bullet-/ellipsis-line fractions, and a distinct-stopword floor.
    Returns named Columns (all native — one codegen stage, no shuffle);
    `passes_gopher` is the conjunction at the published thresholds
    (50 <= words <= 100k, 3 <= mean len <= 10, alpha words >= 0.8,
    bullet lines <= 0.9, ellipsis lines <= 0.3, >= 2 distinct
    stopwords). Tokenization is the single-space split the other
    text-stats oracles use, so DuckDB mirrors every rule exactly
    (plans/queries.q_gopher_quality_flags)."""
    toks = F.split(F.trim(c), " ")
    n_words = F.size(toks)
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n_words, 4
    )
    # [A-Za-z], not [a-z]: the published rule is "contains at least one
    # alphabetic character" — an acronym-heavy but legitimate document
    # ('NASA', 'USA', capitalized headings) must not fail the 0.8 floor.
    frac_alpha = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n_words, 4
    )
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    frac_bullet = F.round(
        F.size(F.filter(lines, lambda l: l.rlike("^ *[-*]"))) / n_lines, 4
    )
    frac_ellipsis = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))) / n_lines, 4
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    passes = (
        n_words.between(50, 100000)
        & mean_wl.between(3, 10)
        & (frac_alpha >= 0.8)
        & (frac_bullet <= 0.9)
        & (frac_ellipsis <= 0.3)
        & (n_stop >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "frac_alpha_words": frac_alpha,
        "frac_bullet_lines": frac_bullet,
        "frac_ellipsis_lines": frac_ellipsis,
        "n_stop_distinct": n_stop,
        "passes_gopher": passes.cast("int"),
    }


def filter_documents(df, text_col: str = "text"):
    """Keep only documents passing the Gopher quality conjunction — the
    pipeline-facing form of gopher_flags (pure filter, pushes down past
    column pruning; no shuffle)."""
    return df.where(gopher_flags(F.col(text_col))["passes_gopher"] == 1)


# C4's page-level blockers (Raffel et al. 2020 §2.2): the published
# pipeline uses the full "bad words" blocklist; the rule (word-boundary
# match anywhere on the lowercased page) is what matters — this default
# carries a small spam-marker subset and is configurable.
C4_BADWORDS = ("porn", "xxx", "viagra", "casino bonus")


def c4_clean_cols(
    c, min_words_per_line: int = 5, badwords: tuple = C4_BADWORDS
) -> dict[str, Column]:
    """C4-style cleaning (Raffel et al. 2020 §2.2 — the closed,
    SQL-mirrorable subset): line-level filtering REWRITES the document,
    page-level rules flag it.

    Line rules (a line survives iff all hold): ends in a terminal
    punctuation mark (. ! ? optionally followed by a closing quote),
    has >= min_words_per_line whitespace words, and does not contain
    the word 'javascript' (case-insensitive). Page rules: >= 3
    sentences IN THE RETAINED TEXT (sentence = terminal-mark count),
    no 'lorem ipsum', no curly brace, no blocklist word (word-boundary,
    lowercased). The three-sentence-span dedup step of the paper is the
    span-removal operator's job (operators/substring.dedup_spans), not
    repeated here.

    All native Columns — one codegen stage, no shuffle, no UDF; every
    rule mirrors 1:1 into DuckDB (plans/queries.SQL_C4_CLEAN_DOCS).
    Line split is '\\r?\\n' and the terminal-punctuation anchor is \\z
    (true end-of-string) so CRLF corpora clean identically on Spark
    (Java regex, where a bare $ would match before a trailing \\r) and
    in the RE2 oracle."""
    lines = F.split(c, r"\r?\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?]["\']? *\\z')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_kept = F.size(kept)
    n_sentences = F.size(F.split(clean, "[.!?]")) - 1
    low = F.lower(c)
    has_lorem = low.contains("lorem ipsum")
    has_brace = c.contains("{")
    bad_re = "|".join(re.escape(b) for b in badwords)
    has_bad = low.rlike(rf"\b({bad_re})\b")
    passes = (
        (n_sentences >= 3) & ~has_lorem & ~has_brace & ~has_bad
    )
    return {
        "clean_text": clean,
        "n_lines_kept": n_kept,
        "n_lines_dropped": F.size(lines) - n_kept,
        "n_sentences": n_sentences,
        "has_lorem_ipsum": has_lorem.cast("int"),
        "has_brace": has_brace.cast("int"),
        "has_badword": has_bad.cast("int"),
        "passes_c4": passes.cast("int"),
    }


def c4_clean_documents(
    df,
    text_col: str = "text",
    min_words_per_line: int = 5,
    badwords: tuple = C4_BADWORDS,
):
    """Pipeline form: drop failing pages, replace text with the
    line-filtered rewrite (map-only; the filter pushes down). badwords
    swaps in a real blocklist (the default is a small spam-marker
    subset)."""
    cols = c4_clean_cols(F.col(text_col), min_words_per_line, badwords)
    return (
        df.withColumn("_c4_pass", cols["passes_c4"])
        .where(F.col("_c4_pass") == 1)
        .withColumn(text_col, cols["clean_text"])
        .drop("_c4_pass")
    )
