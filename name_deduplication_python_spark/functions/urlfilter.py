"""URL-level corpus filtering: blocklist domains + URL quality scoring.

Beyond-reference LLM-pipeline operator (the reference engine has no
analog; its nearest shape is the P6 hard-reject predicate,
/root/reference/analysis_engine.py:355 — a cheap pre-score rejection).
The recipe is the published RefinedWeb / CCNet front-of-pipeline URL
filter (Penedo et al. 2023 §3.1: curated blocklist of ~4.6M domains +
word-based URL scoring; the public UT1 blocklist is its usual source):
reject documents by where they came from BEFORE paying for text
processing.

Everything here is a native-expression map-side projection — no
shuffle, no Python, fused into the scan — plus, when the blocklist is a
DataFrame, one broadcast semi-join on the registered domain (a domain
blocklist is millions of rows ~ tens of MB: comfortably broadcastable;
the corpus side never shuffles). At 10^12 docs this stage deletes
30-50% of raw crawl before signatures are ever computed, which is the
cheapest compute you will ever save.

Registered-domain extraction has two modes (round 6): pass
functions.psl.load_psl() as `psl` for the REAL Public Suffix List
algorithm (longest-rule match, wildcards, exceptions) compiled from the
shipped curated snapshot — or any full upstream public_suffix_list.dat
— into native isin/InSet predicates (still map-only, no join); leave it
None for the original public-suffix-lite fallback (MULTIPART_TLDS picks
label count 3 vs 2). The driver query replays every expression —
including the full PSL CASE — in DuckDB, so the whole filter is
value-auditable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common multi-part public suffixes (public-suffix-lite; see module doc).
MULTIPART_TLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za",
)

# Curated URL-token list in the UT1/RefinedWeb adult+fraud+spam spirit
# (indicative, not exhaustive — real deployments load category lists as
# side tables via `blocklist`).
BLOCK_KEYWORDS = (
    "casino", "poker", "betting", "jackpot",
    "porn", "xxx", "escort", "camgirl",
    "viagra", "cialis",
    "warez", "keygen", "crack-download",
    "free-money", "fast-cash", "get-rich",
)

_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]+)"


def host_of(url: Column) -> Column:
    """Lowercased host: scheme and userinfo stripped, port dropped."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain(host: Column, psl=None) -> Column:
    """Registrable domain of a (lowercased) host.

    psl: a functions/psl.PslRules — the REAL Public Suffix List
    algorithm (longest rule, wildcards, exceptions) compiled to a
    native expression; pass functions.psl.load_psl() for the shipped
    curated snapshot or load_psl(path) for a full upstream list.
    None keeps the original public-suffix-lite fallback: last 2 labels,
    or last 3 when the last 2 form a known multi-part TLD
    (MULTIPART_TLDS) — the zero-asset approximation."""
    if psl is not None:
        from .psl import registered_domain_expr

        return registered_domain_expr(host, psl)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(*MULTIPART_TLDS)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def url_quality_flags(
    url: Column, psl=None, host: Column | None = None
) -> dict[str, Column]:
    """Per-URL native scoring columns (RefinedWeb §3.1 word-based URL
    scoring shape):

      host          lowercased host
      domain        registrable domain (PSL when `psl` rules are given,
                    public-suffix-lite otherwise — see registered_domain)
      kw_hits       how many curated BLOCK_KEYWORDS occur in the URL
      digit_ratio   digits / length of the host (DGA/spam farms are
                    digit-heavy; round 4 so any engine replays it)
      url_len       total URL length (mile-long tracking URLs)
    """
    # host: pass a pre-projected COLUMN to avoid replicating the
    # regexp-extract subtree into every consumer (the PSL domain CASE
    # alone references the host ~50x; with the inline expression the
    # analyzer/codegen walked the full host tree at every reference)
    host = host_of(url) if host is None else host
    lower = F.lower(url)
    kw = sum(
        (F.when(lower.contains(k), 1).otherwise(0) for k in BLOCK_KEYWORDS),
        F.lit(0),
    )
    digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    ratio = F.round(
        digits.cast("double") / F.greatest(F.length(host), F.lit(1)), 4
    )
    return {
        "host": host,
        "domain": registered_domain(host, psl=psl),
        "kw_hits": kw.cast("int"),
        "digit_ratio": ratio,
        "url_len": F.length(url).cast("int"),
    }


def filter_urls(
    docs: DataFrame,
    url_col: str = "url",
    blocklist: DataFrame | list[str] | None = None,
    max_kw_hits: int = 0,
    max_digit_ratio: float = 0.5,
    max_url_len: int = 2048,
    keep_flags: bool = False,
    psl=None,
) -> DataFrame:
    """Drop documents whose URL fails the blocklist or the score bands.

    blocklist: registrable domains to reject — a list (becomes a literal
    isin; fine to a few thousand) or a 1-column DataFrame (broadcast
    LEFT ANTI join on `domain`; the shape for the multi-million-row UT1
    lists). keep_flags=True keeps the scoring columns on the survivors
    (audit mode); default drops them so the stage is a pure filter.
    psl: PslRules for real Public-Suffix-List domain extraction (see
    registered_domain) — blocklists built from registrable domains
    (UT1 and friends) match correctly on co.nz/com.sg/wildcard hosts
    only under PSL rules.
    """
    # two-step projection (round 7): materialize `host` as a plain
    # column first, then score off it — CollapseProject keeps the split
    # because the non-cheap host expression is multiply referenced, so
    # the domain CASE and the digit ratio reference an AttributeReference
    # instead of inlining the regexp tree (per-execution planning/codegen
    # cost of url_filtered_docs dropped ~4 s -> ~1 s; values unchanged)
    staged = docs.select("*", host_of(F.col(url_col)).alias("host"))
    flags = url_quality_flags(
        F.col(url_col), psl=psl, host=F.col("host")
    )
    scored = staged.select(
        "*", *(v.alias(k) for k, v in flags.items() if k != "host")
    ).where(
        (F.col("kw_hits") <= max_kw_hits)
        & (F.col("digit_ratio") <= max_digit_ratio)
        & (F.col("url_len") <= max_url_len)
    )
    if blocklist is not None:
        if isinstance(blocklist, DataFrame):
            bl = blocklist.toDF("domain")
            scored = scored.join(F.broadcast(bl), "domain", "left_anti")
        elif blocklist:
            scored = scored.where(~F.col("domain").isin(*list(blocklist)))
    if keep_flags:
        return scored
    return scored.drop("host", "domain", "kw_hits", "digit_ratio", "url_len")
