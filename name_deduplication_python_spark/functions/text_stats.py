"""Text-analysis column expressions (training-data pipeline ops): all
native Column builders so Catalyst keeps them inside codegen and DuckDB
oracles can mirror them exactly (plans/queries.py uses the same rules).

  - token counting (whitespace + a BPE-ish subword regex estimate)
  - language-ID heuristic (closed stopword lists + script detection)
  - quality scoring (length / punctuation / stopword / alpha ratios)
  - rolling-hash document fingerprint (xxhash64 over normalized text)
"""

from __future__ import annotations

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
