"""Signature stage: text -> (MinHash[num_hashes], SimHash64, n_shingles).

Replaces the reference's blocking-key generator + fuzzy scorer features
(_get_blocking_keys_optimized /root/reference/analysis_engine.py:418-428;
_precompute_dataframe :90-106). Where the reference derives FL/soundex/
birthdate keys per record, we derive k-shingle MinHash signatures (LSH
banding turns them into candidate-join keys) and a 64-bit SimHash (the
Hamming-ball verifier replacing the rapidfuzz pairwise loop, SURVEY §2.4).

All math is numpy over concatenated token arrays with per-doc offsets —
``np.minimum.reduceat`` / ``np.add.reduceat`` keep the whole Arrow batch
in flat vectorized kernels; the only Python loops are over the 128 hash
functions / 64 bits, never over rows.

Hashing:
  * token hash  = pd.util.hash_array (deterministic 64-bit, cython)
  * shingle hash = degree-k polynomial over token hashes mod 2^64
  * MinHash_i   = min over shingles of (A_i * sh + B_i mod 2^64),
                  A_i odd — multiply-shift universal family
  * SimHash bit b = sign of sum over tokens of (2*bit_b(token_hash)-1)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_POLY_C = np.uint64(1099511628211)  # FNV-ish odd multiplier for shingle combine


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def _tokenize_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat token array, start-offset per doc incl. end sentinel).

    Empty/null/whitespace-only texts get ZERO tokens (and thus zero
    shingles) — they are excluded from dedup, the analog of the
    reference's drop-all-null-rows filter (P4, /root/reference/main.py:638).
    """
    s = texts.fillna("").str.strip()
    token_lists = s.str.split(" ")
    empty = (s.str.len() == 0).to_numpy()
    lengths = token_lists.str.len().to_numpy(dtype=np.int64)
    lengths[empty] = 0
    parts = [
        np.asarray(t, dtype=object)
        for t, e in zip(token_lists, empty)
        if not e
    ]
    flat = np.concatenate(parts) if parts else np.array([], dtype=object)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    return flat, starts


def _shingle_hashes(
    token_hashes: np.ndarray, starts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Degree-k rolling polynomial over token hashes, not crossing docs.

    Returns (flat shingle-hash array, per-doc shingle start offsets).
    Docs with < k tokens get ONE shingle = polynomial over all their tokens.
    """
    n_docs = len(starts) - 1
    lengths = np.diff(starts)
    n_sh = np.maximum(lengths - (k - 1), 1)
    n_sh[lengths == 0] = 0
    sh_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=sh_starts[1:])
    total = int(sh_starts[-1])
    out = np.zeros(total, dtype=np.uint64)
    if total == 0:
        return out, sh_starts

    # vectorized rolling combine for full-length shingles
    acc = np.zeros(len(token_hashes), dtype=np.uint64)
    for j in range(k):
        shifted = np.empty_like(acc)
        if j == 0:
            shifted[:] = token_hashes
        else:
            shifted[:-j] = token_hashes[j:]
            shifted[-j:] = 0
        acc = acc * _POLY_C + shifted

    # copy valid windows per doc (mask-based, no per-row loop)
    pos = np.arange(len(token_hashes), dtype=np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    valid = (pos - starts[doc_of]) < np.maximum(lengths[doc_of] - (k - 1), 0)
    long_vals = acc[valid]

    # short docs (0 < len < k): polynomial over all tokens, zero-padded to k
    short = (lengths > 0) & (lengths < k)
    if short.any():
        short_idx = np.flatnonzero(short)
        short_vals = np.zeros(len(short_idx), dtype=np.uint64)
        for r, d in enumerate(short_idx):  # rare path; docs < k tokens only
            v = np.uint64(0)
            for t in token_hashes[starts[d] : starts[d + 1]]:
                v = v * _POLY_C + t
            short_vals[r] = v

    # assemble in doc order
    w = 0
    is_long = lengths >= k
    long_counts = np.where(is_long, n_sh, 0)
    long_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(long_counts, out=long_offsets[1:])
    for d in range(n_docs):  # per-doc slice copy (memcpy, not per-row math)
        c = int(n_sh[d])
        if c == 0:
            continue
        if is_long[d]:
            out[w : w + c] = long_vals[long_offsets[d] : long_offsets[d + 1]]
        else:
            out[w] = short_vals[np.searchsorted(short_idx, d)]
        w += c
    return out, sh_starts


def compute_signatures_np(
    texts: pd.Series,
    num_hashes: int = 128,
    shingle_k: int = 5,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch kernel: returns (minhash[n_docs, num_hashes] int64,
    simhash[n_docs] int64, n_shingles[n_docs] int32)."""
    flat_tokens, starts = _tokenize_batch(texts)
    n_docs = len(starts) - 1
    th = (
        pd.util.hash_array(flat_tokens)
        if len(flat_tokens)
        else np.array([], dtype=np.uint64)
    )
    sh, sh_starts = _shingle_hashes(th, starts, shingle_k)
    n_sh = np.diff(sh_starts).astype(np.int32)

    a, b = _hash_params(num_hashes, seed)
    minhash = np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = n_sh > 0
    if sh.size:
        red_starts = sh_starts[:-1][nonempty]
        for i in range(num_hashes):  # loop over hash fns, vector over shingles
            hv = a[i] * sh + b[i]
            minhash[nonempty, i] = np.minimum.reduceat(hv, red_starts)

    simhash = np.zeros(n_docs, dtype=np.uint64)
    if th.size:
        tok_lens = np.diff(starts)
        tok_nonempty = tok_lens > 0
        tred = starts[:-1][tok_nonempty]
        acc_bits = np.zeros(int(tok_nonempty.sum()), dtype=np.uint64)
        for bit in range(64):  # loop over bits, vector over tokens
            pm = (((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int32) * 2) - 1
            sums = np.add.reduceat(pm, tred)
            acc_bits |= (sums > 0).astype(np.uint64) << np.uint64(bit)
        simhash[tok_nonempty] = acc_bits

    return minhash.view(np.int64), simhash.view(np.int64), n_sh


def signature_stage(
    extracted: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    num_hashes: int = 128,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """extracted(id, text, ...) -> (id, minhash array<long>, simhash long,
    n_shingles int). mapInPandas over Arrow batches."""
    out_schema = (
        f"{id_col} string, minhash array<bigint>, simhash bigint, n_shingles int"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mh, sh, ns = compute_signatures_np(
                pdf[text_col], num_hashes=num_hashes, shingle_k=shingle_k, seed=seed
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str).to_numpy(),
                    "minhash": list(mh),
                    "simhash": sh,
                    "n_shingles": ns,
                }
            )

    cols = [id_col, text_col]
    return extracted.select(*cols).mapInPandas(gen, schema=out_schema)
