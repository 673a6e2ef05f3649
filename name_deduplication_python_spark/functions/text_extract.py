"""Deterministic HTML -> text extraction (byte-identical per url).

This is the engine's analog of the reference's normalizer chain
(/root/reference/data_utils.py:54-273 normalize_name/city/date applied
once per row before matching): a per-row deterministic canonicalization
that everything downstream keys on. BASELINE.json's input_hint makes the
invariant explicit: *byte-identical extracted text per url*.

Extraction spec (THE contract, mirrored by the pure-python oracle in
``extract_text_oracle`` and tested byte-for-byte):

  1. decode bytes as UTF-8 with errors='replace'
  2. replace <script>...</script> / <style>...</style> /
     <title>...</title> blocks with a space — ONE leftmost-first
     alternation pass (case-insensitive, dot-matches-newline, non-greedy;
     on pathological cross-nested blocks the leftmost opening tag wins)
  3. replace every remaining tag ``<...>`` with a space
  4. unescape the closed entity set, in this order:
     &lt; -> <   &gt; -> >   &quot; -> "   &#39; -> '   &nbsp; -> space
     and finally &amp; -> &   (last, so &amp;lt; -> &lt; stays literal)
  5. collapse runs of [ \\t\\r\\n] to one space and strip ends

Two implementations:
  * ``extract_series``  — pandas-vectorized (cython str ops, Arrow batch)
    used inside the mapInArrow/pandas-UDF stage. No per-row Python.
  * ``extract_text_oracle`` — independent plain-Python reference used by
    tests to assert byte identity.
"""

from __future__ import annotations

import re

import pandas as pd

# one leftmost-first alternation pass for all three block kinds (spec
# step 2): a third of the full-document regex scans of three sequential
# passes; oracle and vectorized path share this exact regex so the
# byte-identity contract holds by construction
_BLOCK_RE = re.compile(
    r"<(script|style|title)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n]+")

# (pattern, replacement) — &amp; MUST be last (step 4 of the spec).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text_oracle(html: bytes | None) -> str | None:
    """Plain-Python oracle for the extraction spec (tests only)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _BLOCK_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for pat, rep in _ENTITIES:
        s = s.replace(pat, rep)
    s = _WS_RE.sub(" ", s).strip()
    return s


def extract_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over an Arrow batch of html bytes.

    pandas .str ops run in C per batch — this is the hot path used by the
    extraction pandas UDF; zero per-row Python.
    """
    mask = html.notna()
    s = html[mask].str.decode("utf-8", errors="replace")
    s = s.str.replace(_BLOCK_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for pat, rep in _ENTITIES:
        s = s.str.replace(pat, rep, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    out = pd.Series([None] * len(html), index=html.index, dtype=object)
    out[mask] = s
    return out


def wrap_html(text: str, title: str = "", lang: str = "en") -> bytes:
    """Inverse-ish of the spec used by the synthetic corpus generator:
    extract_text_oracle(wrap_html(t)) == t for single-spaced t."""
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # split into paragraph-ish chunks so tags appear mid-document
    words = esc.split(" ")
    paras, step = [], 40
    for i in range(0, len(words), step):
        paras.append("<p>" + " ".join(words[i : i + step]) + "</p>")
    body = "\n".join(paras)
    doc = (
        f'<html lang="{lang}"><head><title>{title}</title>'
        f"<style>body {{ color: #000; }}</style>"
        f'<script type="text/javascript">var x = 1 < 2; console.log("junk");</script>'
        f"</head><body>\n{body}\n</body></html>"
    )
    return doc.encode("utf-8")
