"""Gopher repetition rules (operators/repetition.py) vs an independent
pure-python reference of the documented closed-form semantics."""

from __future__ import annotations

import pytest

from name_deduplication_python_spark.operators.repetition import (
    DUP_NS,
    GOPHER_REP_THRESHOLDS,
    TOP_NS,
    filter_repetitive,
    repetition_flags,
)


def _ref_flags(text: str, top_ns=TOP_NS, dup_ns=DUP_NS) -> dict:
    out = {}
    chars = len(text)
    lines = [l for l in text.replace("\r\n", "\n").split("\n") if l.strip()]
    if lines:
        from collections import Counter

        c = Counter(lines)
        n_dup = sum(v for v in c.values() if v > 1)
        line_chars = sum(len(l) for l in lines)
        dup_chars = sum(len(l) * v for l, v in c.items() if v > 1)
        out["dup_line_frac"] = round(n_dup / len(lines), 4)
        out["dup_line_char_frac"] = round(dup_chars / max(line_chars, 1), 4)
    else:
        out["dup_line_frac"] = 0.0
        out["dup_line_char_frac"] = 0.0
    toks = text.strip().split(" ")

    def grams(n):
        from collections import Counter

        return Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    for n in top_ns:
        g = grams(n)
        if g:
            top = max((cnt, len(w)) for w, cnt in g.items())
            frac = min(top[0] * top[1] / max(chars, 1), 1.0)
        else:
            frac = 0.0
        out[f"top_{n}gram_char_frac"] = round(frac, 4)
    for n in dup_ns:
        g = grams(n)
        mass = sum(cnt * len(w) for w, cnt in g.items() if cnt > 1)
        out[f"dup_{n}gram_char_frac"] = round(min(mass / max(chars, 1), 1.0), 4)
    out["passes_gopher_repetition"] = int(
        all(out[k] <= v for k, v in GOPHER_REP_THRESHOLDS.items() if k in out)
    )
    return out


_DOCS = [
    # clean prose: passes everything (long enough that one n-gram
    # occurrence is a small char fraction — the published thresholds
    # assume docs the >=50-word outlier rule lets through)
    (1, "the quick brown fox jumps over one lazy dog near a very old "
        "green river bank while birds sing softly above tall trees and "
        "children walk slowly home from school carrying heavy books "
        "about distant lands where sailors cross wide oceans under "
        "bright stars to trade spices silk and silver with merchants "
        "who travel by camel through deserts toward ancient cities"),
    # heavy 2-gram repetition with UNIQUE separators: every 5-gram is
    # distinct, so ONLY the top-2gram rule fires
    (2, " ".join(f"buy now w{i}" for i in range(30))),
    # duplicated lines (3 of 5 lines identical)
    (3, "buy now\nunique first line\nbuy now\nanother line\nbuy now"),
    # repeated 5-gram block
    (4, ("alpha beta gamma delta epsilon " * 4) + "tail words here"),
    # blank-ish and tiny docs: never crash, never gate
    (5, ""),
    (6, "word"),
    (7, "a\n\n\na"),
]


@pytest.fixture(scope="module")
def flags(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    rows = {r["doc_id"]: r.asDict() for r in repetition_flags(df).collect()}
    assert set(rows) == {d for d, _ in _DOCS}
    return rows


def test_matches_reference_on_every_signal(flags):
    for did, text in _DOCS:
        want = _ref_flags(text)
        got = flags[did]
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-4), (did, k, got[k], v)


def test_planted_failures_gate_as_published(flags):
    assert flags[1]["passes_gopher_repetition"] == 1
    assert flags[2]["passes_gopher_repetition"] == 0      # top-2gram
    assert flags[2]["top_2gram_char_frac"] > 0.20
    assert flags[3]["passes_gopher_repetition"] == 0      # dup lines
    assert flags[3]["dup_line_frac"] == 0.6
    assert flags[4]["passes_gopher_repetition"] == 0      # dup 5-grams
    assert flags[4]["dup_5gram_char_frac"] > 0.15
    for d in (5, 6):
        assert flags[d]["passes_gopher_repetition"] == 1
    # doc 7's two non-blank lines are identical -> dup_line_frac = 1.0:
    # tiny, but the published rule legitimately gates it
    assert flags[7]["passes_gopher_repetition"] == 0
    assert flags[7]["dup_line_frac"] == 1.0


def test_filter_repetitive_keeps_survivors(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    kept = {r["doc_id"] for r in filter_repetitive(df).collect()}
    assert kept == {1, 5, 6}


def test_subset_selection_gates_only_requested(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_flags(df, top_ns=(), dup_ns=(5,)).collect()
    }
    # doc 2 fails only the (untested) top-2gram rule -> passes here
    assert out[2]["passes_gopher_repetition"] == 1
    assert out[4]["passes_gopher_repetition"] == 0
    assert "top_2gram_char_frac" not in out[2]


def test_paragraph_rules(spark):
    """paragraphs=True adds the dup-paragraph pair: blocks between blank
    lines compared whole (internal single newlines stay inside their
    paragraph)."""
    import re
    from collections import Counter

    para_dup = (
        "first para line one\nfirst para line two\n\n"
        "repeated block\n\nmiddle unique paragraph\n\nrepeated block"
    )
    docs = spark.createDataFrame(
        [(1, para_dup), (2, "single paragraph only\nwith two lines")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_flags(
            docs, top_ns=(), dup_ns=(), paragraphs=True
        ).collect()
    }

    def ref_para(text):
        paras = [p for p in re.split(r"(?:\r?\n){2,}", text) if p.strip()]
        c = Counter(paras)
        n_dup = sum(v for v in c.values() if v > 1)
        chars = sum(len(p) * v for p, v in c.items() if v > 1)
        tot = sum(len(p) * v for p, v in c.items())
        return round(n_dup / len(paras), 4), round(chars / max(tot, 1), 4)

    for did, text in [(1, para_dup), (2, "single paragraph only\nwith two lines")]:
        f, cf = ref_para(text)
        assert got[did]["dup_para_frac"] == pytest.approx(f, abs=1e-4), did
        assert got[did]["dup_para_char_frac"] == pytest.approx(cf, abs=1e-4), did
    # doc 1: 4 paragraphs, 'repeated block' twice -> 0.5 > 0.30 gate
    assert got[1]["dup_para_frac"] == 0.5
    assert got[1]["passes_gopher_repetition"] == 0
    assert got[2]["passes_gopher_repetition"] == 1
    # paragraphs off: the columns don't exist and don't gate
    off = repetition_flags(docs, top_ns=(), dup_ns=()).collect()[0].asDict()
    assert "dup_para_frac" not in off
