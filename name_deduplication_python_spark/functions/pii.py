"""PII redaction for web-scale training text — emails, NANP-style phone
numbers, IPv4 addresses replaced with typed placeholder tokens.

Beyond-reference LLM-pipeline operator (the reference desktop tool
holds names/PII as first-class *match* columns; a training-data engine
must instead SCRUB them — the standard C4/RefinedWeb-style regex pass).

All patterns are chosen to parse identically under Java regex (Spark,
JVM-side, whole-stage codegen) and RE2 (DuckDB oracle): character
classes, bounded quantifiers, and \\b word boundaries only — no
backreferences, no lookaround. Everything here is native
`regexp_replace` / `regexp_count`: map-only, zero shuffle, zero Python.
At 100 TB this pass fuses into the same WholeStageCodegen span as
extraction and costs one scan.

Counts are taken BEFORE replacement so they report what was found in
the input; replacement order (email -> phone -> ipv4) guarantees the
dotted/digit tails of an email are gone before the looser numeric
patterns run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — order is the replacement order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    (
        "phone",
        r"\b\d{3}-\d{3}-\d{4}\b",
        "[PHONE]",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """{'n_emails': ..., 'n_phones': ..., 'n_ipv4s': ...} match counts
    on the UNredacted text."""
    return {
        f"n_{name}s": F.regexp_count(col, F.lit(pat)).cast("int")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column) -> Column:
    """Text with every PII match replaced by its placeholder token.
    Idempotent: placeholders contain no '@' or digit runs, so a second
    pass matches nothing."""
    out = col
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def redact_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs with `text_col` redacted in place plus per-kind match-count
    columns (n_emails, n_phones, n_ipv4s)."""
    c = F.col(text_col)
    counts = pii_counts(c)
    out = docs
    for name, expr in counts.items():
        out = out.withColumn(name, expr)
    return out.withColumn(text_col, redact_pii(c))
