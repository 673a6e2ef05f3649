"""MinHash/SimHash kernel tests: determinism, pure-python oracle parity,
Jaccard-estimate accuracy (SURVEY §5 item 1)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from name_deduplication_python_spark.operators.signatures import (
    _POLY_C,
    _hash_params,
    compute_signatures_np,
    signature_stage,
)


def _oracle_minhash(text: str, num_hashes: int, k: int, seed: int) -> np.ndarray:
    from name_deduplication_python_spark.operators.signatures import (
        token_hash_oracle,
    )

    toks = text.split(" ")
    th = np.array([token_hash_oracle(t) for t in toks], dtype=np.uint64)
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
    with np.errstate(over="ignore"):
        # uint32 multiply-shift over the shingle's high 32 bits
        return np.array(
            [
                min(
                    a[i] * np.uint32(int(s) >> 32) + b[i]
                    for s in shingles
                )
                for i in range(num_hashes)
            ],
            dtype=np.uint32,
        ).view(np.int32)


def _true_jaccard(t1: str, t2: str, k: int = 5) -> float:
    def sh(t):
        toks = t.split(" ")
        if len(toks) < k:
            return {tuple(toks)}
        return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    s1, s2 = sh(t1), sh(t2)
    return len(s1 & s2) / len(s1 | s2)


def test_kernel_matches_oracle():
    texts = pd.Series(
        [
            "the quick brown fox jumps over the lazy dog today",
            "a b",
            "single",
            "x y z w v u t s r q p o n m",
        ]
    )
    mh, sh, ns = compute_signatures_np(texts, num_hashes=32, shingle_k=5, seed=42)
    assert list(ns) == [6, 1, 1, 10]
    for i, t in enumerate(texts):
        want = _oracle_minhash(t, 32, 5, 42)
        assert (mh[i] == want).all(), f"doc {i}"


def test_determinism_and_batch_independence():
    texts = pd.Series([f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5} common suffix here ok" for i in range(20)])
    mh1, sh1, _ = compute_signatures_np(texts, num_hashes=64)
    # different batch split must give identical signatures
    mh2a, sh2a, _ = compute_signatures_np(texts[:7], num_hashes=64)
    mh2b, sh2b, _ = compute_signatures_np(texts[7:].reset_index(drop=True), num_hashes=64)
    assert (np.vstack([mh2a, mh2b]) == mh1).all()
    assert (np.concatenate([sh2a, sh2b]) == sh1).all()


def test_exact_duplicates_identical_signatures():
    texts = pd.Series(["alpha beta gamma delta epsilon zeta eta theta"] * 2 + ["other doc entirely different words here now"])
    mh, sh, _ = compute_signatures_np(texts)
    assert (mh[0] == mh[1]).all() and sh[0] == sh[1]
    assert (mh[0] != mh[2]).any()


def test_jaccard_estimate_accuracy():
    rng = np.random.default_rng(1)
    vocab = [f"tok{i}" for i in range(500)]
    base = list(rng.choice(vocab, size=300))
    variants = []
    for frac in (0.01, 0.05, 0.2):
        v = base.copy()
        idx = rng.choice(300, size=int(300 * frac), replace=False)
        for i in idx:
            v[i] = "sub" + str(i)
        variants.append(" ".join(v))
    texts = pd.Series([" ".join(base)] + variants)
    mh, _, _ = compute_signatures_np(texts, num_hashes=128)
    for i, frac in enumerate((0.01, 0.05, 0.2), start=1):
        est = (mh[0] == mh[i]).mean()
        true = _true_jaccard(texts[0], texts[i])
        assert abs(est - true) < 0.12, (frac, est, true)


def test_simhash_hamming_tracks_similarity():
    rng = np.random.default_rng(2)
    vocab = [f"tok{i}" for i in range(500)]
    base = list(rng.choice(vocab, size=300))
    near = base.copy()
    for i in rng.choice(300, size=6, replace=False):
        near[i] = "zzz" + str(i)
    far = list(rng.choice(vocab, size=300))
    texts = pd.Series([" ".join(base), " ".join(near), " ".join(far)])
    _, sh, _ = compute_signatures_np(texts)
    h_near = bin(int(sh[0]) ^ int(sh[1])).count("1")
    h_far = bin(int(sh[0]) ^ int(sh[2])).count("1")
    assert h_near < h_far
    assert h_near <= 6


def test_signature_stage_spark(spark):
    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(10)],
            "text": [f"word{i} alpha beta gamma delta epsilon {i}" for i in range(10)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = signature_stage(df, num_hashes=16).toPandas().sort_values("url").reset_index(drop=True)
    mh, sh, ns = compute_signatures_np(pdf["text"], num_hashes=16)
    assert len(out) == 10
    for i in range(10):
        row = out[out["url"] == f"u{i}"].iloc[0]
        assert list(row["minhash"]) == list(mh[i])
        assert row["simhash"] == sh[i]
        assert row["n_shingles"] == ns[i]
