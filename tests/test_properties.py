"""Property-based tests (hypothesis) for the pure kernels — no Spark,
hundreds of generated cases per property."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from name_deduplication_python_spark.functions.text_extract import (
    extract_text_oracle,
    wrap_html,
)
from name_deduplication_python_spark.operators.signatures import (
    _POLY_C,
    compute_signatures_np,
    token_hash_oracle,
)
from name_deduplication_python_spark.operators.substring import (
    winnow_fingerprints_np,
)

# tokens: letters/digits/accents/CJK — no whitespace or control chars
_token = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd", "Lo"), max_codepoint=0x9FFF
    ),
    min_size=1,
    max_size=12,
)
_text = st.lists(_token, min_size=0, max_size=60).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_extraction_roundtrip_property(t):
    assert extract_text_oracle(wrap_html(t)) == t


@settings(max_examples=100, deadline=None)
@given(_text, _text)
def test_extraction_idempotent_on_concat(a, b):
    # extraction output re-wrapped extracts to itself (fixed point)
    once = extract_text_oracle(wrap_html((a + " " + b).strip()))
    assert extract_text_oracle(wrap_html(once)) == once


def _naive_shingle_minhash(text, num_hashes, k, seed):
    from name_deduplication_python_spark.operators.signatures import _hash_params

    toks = text.split(" ") if text else []
    if not toks or text.strip() == "":
        return None
    th = np.array([token_hash_oracle(t) for t in toks], dtype=np.uint64)
    with np.errstate(over="ignore"):
        if len(toks) >= k:
            shingles = []
            for i in range(len(toks) - k + 1):
                v = np.uint64(0)
                for t in th[i : i + k]:
                    v = v * _POLY_C + t
                shingles.append(v)
        else:
            v = np.uint64(0)
            for t in th:
                v = v * _POLY_C + t
            shingles = [v]
        a, b = _hash_params(num_hashes, seed)
        # uint32 multiply-shift over the shingle's high 32 bits
        return np.array(
            [
                min(a[i] * np.uint32(int(s) >> 32) + b[i] for s in shingles)
                for i in range(num_hashes)
            ],
            dtype=np.uint32,
        ).view(np.int32)


@settings(max_examples=60, deadline=None)
@given(st.lists(_text, min_size=1, max_size=8))
def test_minhash_batch_matches_naive_oracle(texts):
    mh, _, ns = compute_signatures_np(pd.Series(texts), num_hashes=16, shingle_k=3)
    for i, t in enumerate(texts):
        want = _naive_shingle_minhash(t.strip(), 16, 3, 42)
        if want is None:
            assert ns[i] == 0
        else:
            assert (mh[i] == want).all(), (i, t)


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="ab ", min_size=0, max_size=400),
    st.text(alphabet="ab ", min_size=0, max_size=400),
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=300), min_size=120, max_size=200),
)
def test_winnowing_guarantee_property(prefix, suffix, shared):
    # any two texts sharing a run >= g+w-1 chars share a fingerprint
    t1, t2 = prefix + shared, shared + suffix
    f1 = set(winnow_fingerprints_np(t1, gram_chars=64, window=32))
    f2 = set(winnow_fingerprints_np(t2, gram_chars=64, window=32))
    assert f1 & f2


@settings(max_examples=40, deadline=None)
@given(st.lists(_token, min_size=30, max_size=80, unique=True), st.integers(0, 10))
def test_minhash_estimate_within_bound(tokens, n_sub):
    base = " ".join(tokens)
    toks = list(tokens)
    for i in range(min(n_sub, len(toks))):
        toks[i] = toks[i] + "XSUB"
    var = " ".join(toks)
    mh, _, _ = compute_signatures_np(pd.Series([base, var]), num_hashes=128, shingle_k=3)
    est = float((mh[0] == mh[1]).mean())

    def sh(ts):
        tl = ts.split(" ")
        return {tuple(tl[i : i + 3]) for i in range(len(tl) - 2)}

    s1, s2 = sh(base), sh(var)
    true = len(s1 & s2) / len(s1 | s2)
    # 128 hashes: sampling std <= 0.5/sqrt(128) ~ 0.045; allow 5 sigma
    assert abs(est - true) <= 0.23, (est, true)


# ---------------------------------------------------------------------------
# Prefix-filter losslessness: the AllPairs prefix join must return EXACTLY
# the naive all-pairs Jaccard result, including rounding-boundary pairs and
# hot tokens shared by every doc.
# ---------------------------------------------------------------------------

def _naive_jaccard_pairs(doc_toks: dict, theta: float):
    out = set()
    ids = sorted(doc_toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = set(doc_toks[a]), set(doc_toks[b])
            u = len(sa | sb)
            if u == 0:
                continue
            j = round(len(sa & sb) / u, 6)
            if j >= theta:
                out.add((a, b, j))
    return out


def test_prefix_filter_join_lossless(spark):
    from pyspark.sql import functions as F

    from name_deduplication_python_spark.operators.setsim import (
        set_similarity_join,
    )

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(40)]
    doc_toks = {}
    for d in range(120):
        n = int(rng.integers(2, 14))
        toks = list(rng.choice(vocab, size=n, replace=False))
        toks.append("hot")  # a token shared by EVERY doc (worst-case skew)
        doc_toks[d] = toks
    # planted rounding-boundary pair: |A|=|B|=4, inter=2 -> J = 2/6 = 0.333333
    doc_toks[200] = ["x1", "x2", "x3", "x4"]
    doc_toks[201] = ["x1", "x2", "y3", "y4"]

    rows = [(d, sorted(set(t))) for d, t in doc_toks.items()]
    docs = spark.createDataFrame(rows, "doc_id bigint, toks array<string>")
    for theta in (1 / 3, 0.5, 0.8):
        got = {
            (r.src, r.dst, r.jaccard)
            for r in set_similarity_join(docs, theta=theta).collect()
        }
        want = _naive_jaccard_pairs(doc_toks, theta)
        assert got == want, (theta, got ^ want)


def test_prefix_filter_two_table_lossless(spark):
    from name_deduplication_python_spark.operators.setsim import (
        set_similarity_join,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    a_toks = {i: list(rng.choice(vocab, size=int(rng.integers(2, 10)), replace=False)) for i in range(40)}
    b_toks = {1000 + i: list(rng.choice(vocab, size=int(rng.integers(2, 10)), replace=False)) for i in range(40)}
    da = spark.createDataFrame(
        [(d, sorted(set(t))) for d, t in a_toks.items()], "doc_id bigint, toks array<string>"
    )
    db = spark.createDataFrame(
        [(d, sorted(set(t))) for d, t in b_toks.items()], "doc_id bigint, toks array<string>"
    )
    got = {
        (r.src, r.dst, r.jaccard)
        for r in set_similarity_join(da, theta=0.5, docs_b=db).collect()
    }
    want = set()
    for s, st_ in a_toks.items():
        for d, dt in b_toks.items():
            sa, sb = set(st_), set(dt)
            j = round(len(sa & sb) / len(sa | sb), 6)
            if j >= 0.5:
                want.add((s, d, j))
    assert got == want
