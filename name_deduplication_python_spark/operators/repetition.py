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

Scale shape at 10^12 docs (round-7 rewrite, guide §2.4/§4.2): every
signal is a PER-DOCUMENT aggregate, so nothing needs a shuffle at all —
one ``mapInPandas`` pass tokenizes/splits each document and emits exact
INTEGER counts (line/para totals and dup masses, per-n top/dup gram
character masses) computed with vectorized numpy (batch-level token
factorize + one np.unique over (doc, gram-codes) rows per n). The
round-6 shape ran one explode -> (doc, gram)-keyed hash-aggregate
shuffle PER n (9 shuffles at defaults; 62 s at sf1.0 for the driver's
3-signal query) and shipped full gram STRINGS through every exchange.
The fractions/rounding stay in Spark SQL on the exact integers, so the
output is bit-identical to the aggregate form (same division, same
F.round), which the DuckDB oracle and the pure-python reference test
both pin. No driver collect, no corpus-global state; memory is one
Arrow batch of documents per task.

Reference analog: P6 hard-reject predicates (/root/reference/
analysis_engine.py:355) — cheap per-record rejection before scoring;
SURVEY §2 F-family threshold discipline.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
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

# the Spark-side patterns the round-6 aggregates split on (F.split uses
# java.util.regex with limit -1, keeping trailing empties); the python
# twins below are match-identical — groups made non-capturing because
# re.split, unlike java's split, would interleave captured groups
_LINE_RE = re.compile(r"\r?\n")
_PARA_RE = re.compile(r"(?:\r?\n)(?:\r?\n)+")


def _dup_block_counts(
    texts: list[str], pattern: re.Pattern
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc exact dup-block counts over non-blank text blocks:
    (n_blocks, n_dup_blocks, block_chars, dup_block_chars) as int64
    arrays. Blank = trims to '' under the engine's space-only trim."""
    n_docs = len(texts)
    blocks: list[str] = []
    doc_of: list[int] = []
    for d, t in enumerate(texts):
        if not t:
            continue
        for b in pattern.split(t):
            if b.strip(" "):
                blocks.append(b)
                doc_of.append(d)
    n = np.zeros(n_docs, dtype=np.int64)
    ndup = np.zeros(n_docs, dtype=np.int64)
    bchars = np.zeros(n_docs, dtype=np.int64)
    dchars = np.zeros(n_docs, dtype=np.int64)
    if not blocks:
        return n, ndup, bchars, dchars
    d = np.asarray(doc_of, dtype=np.int64)
    codes, uniques = pd.factorize(pd.Series(blocks, dtype=object))
    lens = np.fromiter((len(b) for b in uniques), dtype=np.int64, count=len(uniques))
    blens = lens[codes]
    # count per (doc, block-code) via one sort + run-length pass
    order = np.lexsort((codes, d))
    ds, cs = d[order], codes[order]
    new_run = np.ones(len(ds), dtype=bool)
    new_run[1:] = (ds[1:] != ds[:-1]) | (cs[1:] != cs[:-1])
    run_id = np.cumsum(new_run) - 1
    cnt = np.bincount(run_id)
    run_doc = ds[new_run]
    run_len = lens[cs[new_run]]
    np.add.at(n, d, 1)
    np.add.at(bchars, d, blens)
    dup = cnt > 1
    np.add.at(ndup, run_doc[dup], cnt[dup])
    np.add.at(dchars, run_doc[dup], (cnt[dup] * run_len[dup]))
    return n, ndup, bchars, dchars


def _gram_masses(
    tok_codes: np.ndarray,
    tok_lens: np.ndarray,
    starts: np.ndarray,
    n: int,
    n_docs: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (top_mass, dup_mass) for word n-grams, exact integers:
    top_mass = cnt*len of the lexicographic max (cnt, len) gram;
    dup_mass = sum cnt*len over grams with cnt > 1. Grams are identified
    by their exact token-code sequence (batch-level factorize), never a
    lossy hash."""
    top = np.zeros(n_docs, dtype=np.int64)
    dup = np.zeros(n_docs, dtype=np.int64)
    total = len(tok_codes)
    if total == 0:
        return top, dup
    lengths = np.diff(starts)
    # valid gram start positions: within-doc windows of n tokens
    valid = np.ones(total, dtype=bool)
    ends = starts[1:]
    for j in range(1, n):
        pos = ends - j
        sel = pos >= starts[:-1]
        valid[pos[sel]] = False
    vi = np.flatnonzero(valid)
    if len(vi) == 0:
        return top, dup
    doc_of_pos = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    # gram char length = sum token lens + (n-1) separators
    cl = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(tok_lens, out=cl[1:])
    glen = cl[vi + n] - cl[vi] + (n - 1)
    # exact gram identity rows: (doc, code_0..code_{n-1})
    m = np.empty((len(vi), n + 1), dtype=np.int64)
    m[:, 0] = doc_of_pos[vi]
    for j in range(n):
        m[:, 1 + j] = tok_codes[vi + j]
    order = np.lexsort(m.T[::-1])
    ms = m[order]
    new_run = np.ones(len(ms), dtype=bool)
    new_run[1:] = (ms[1:] != ms[:-1]).any(axis=1)
    run_id = np.cumsum(new_run) - 1
    cnt = np.bincount(run_id)
    run_doc = ms[new_run, 0]
    run_glen = glen[order][new_run]
    mass = cnt * run_glen
    # top: per doc the max over (cnt, glen) lexicographic — encode as one
    # int64 (glen < 2^31 always: it is bounded by the doc's char count)
    combo = cnt * (1 << 31) + run_glen
    np.maximum.at(top, run_doc, combo)
    has = np.zeros(n_docs, dtype=bool)
    has[run_doc] = True
    tc, tl = top >> 31, top & ((1 << 31) - 1)
    top = np.where(has, tc * tl, 0)
    d = cnt > 1
    np.add.at(dup, run_doc[d], mass[d])
    return top, dup


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
    the other stats ops).

    One map-only pass: the kernel emits exact integer counts per doc;
    every division/round happens in Spark SQL below with the same
    expressions the round-6 aggregate form used — outputs identical."""
    id_type = docs.schema[id_col].dataType.simpleString()
    top_ns, dup_ns = tuple(top_ns), tuple(dup_ns)
    gram_ns = sorted(set(top_ns) | set(dup_ns))
    fields = [f"id {id_type}", "chars long"]
    for kind in ["line"] + (["para"] if paragraphs else []):
        fields += [
            f"{kind}_n long",
            f"{kind}_ndup long",
            f"{kind}_bchars long",
            f"{kind}_dupbchars long",
        ]
    for n in gram_ns:
        fields += [f"top{n}_mass long", f"dup{n}_mass long"]
    out_schema = ", ".join(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_docs = len(pdf)
            if n_docs == 0:
                continue
            texts = ["" if t is None else t for t in pdf[text_col]]
            out = {"id": pdf[id_col].to_numpy()}
            out["chars"] = np.fromiter(
                (len(t) for t in texts), dtype=np.int64, count=n_docs
            )
            for kind, pat in (("line", _LINE_RE),) + (
                (("para", _PARA_RE),) if paragraphs else ()
            ):
                bn, bd, bc, bdc = _dup_block_counts(texts, pat)
                out[f"{kind}_n"] = bn
                out[f"{kind}_ndup"] = bd
                out[f"{kind}_bchars"] = bc
                out[f"{kind}_dupbchars"] = bdc
            if gram_ns:
                toks: list[str] = []
                lengths = np.zeros(n_docs, dtype=np.int64)
                for d, t in enumerate(texts):
                    s = t.strip(" ")
                    if not s:
                        # engine tokenization: split(trim(text), ' ') on
                        # empty text yields [''] — one empty token, which
                        # can never form an n>=2 gram; 0 tokens is
                        # equivalent for every requested n
                        continue
                    ts = s.split(" ")
                    lengths[d] = len(ts)
                    toks.extend(ts)
                starts = np.zeros(n_docs + 1, dtype=np.int64)
                np.cumsum(lengths, out=starts[1:])
                if toks:
                    codes, uniques = pd.factorize(pd.Series(toks, dtype=object))
                    codes = codes.astype(np.int64)
                    ulens = np.fromiter(
                        (len(u) for u in uniques),
                        dtype=np.int64,
                        count=len(uniques),
                    )
                    tok_lens = ulens[codes]
                else:
                    codes = np.zeros(0, dtype=np.int64)
                    tok_lens = np.zeros(0, dtype=np.int64)
                for n in gram_ns:
                    top, dup = _gram_masses(
                        codes, tok_lens, starts, n, n_docs
                    )
                    out[f"top{n}_mass"] = top
                    out[f"dup{n}_mass"] = dup
            yield pd.DataFrame(out)

    stats = docs.select(id_col, text_col).mapInPandas(gen, schema=out_schema)

    block_kinds = ["line"] + (["para"] if paragraphs else [])
    sel = [F.col("id").alias(id_col)]
    gates = []
    for kind in block_kinds:
        frac = F.when(
            F.col(f"{kind}_n") > 0,
            F.round(F.col(f"{kind}_ndup") / F.col(f"{kind}_n"), 4),
        ).otherwise(F.lit(0.0))
        cfrac = F.when(
            F.col(f"{kind}_n") > 0,
            F.round(
                F.col(f"{kind}_dupbchars")
                / F.greatest(F.col(f"{kind}_bchars"), F.lit(1)),
                4,
            ),
        ).otherwise(F.lit(0.0))
        for col, expr in (
            (f"dup_{kind}_frac", frac),
            (f"dup_{kind}_char_frac", cfrac),
        ):
            sel.append(expr.alias(col))
            gates.append(expr <= GOPHER_REP_THRESHOLDS[col])
    raws = {}
    for n in top_ns:
        raws[f"top_{n}gram_char_frac"] = f"top{n}_mass"
    for n in dup_ns:
        raws[f"dup_{n}gram_char_frac"] = f"dup{n}_mass"
    for name, raw in raws.items():
        frac = F.round(
            F.least(
                F.col(raw).cast("double") / F.greatest(F.col("chars"), F.lit(1)),
                F.lit(1.0),
            ),
            4,
        )
        sel.append(frac.alias(name))
        gates.append(frac <= GOPHER_REP_THRESHOLDS[name])
    passes = gates[0]
    for g in gates[1:]:
        passes = passes & g
    return stats.select(*sel, passes.cast("int").alias("passes_gopher_repetition"))


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
