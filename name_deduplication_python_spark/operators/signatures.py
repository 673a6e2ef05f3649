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
    """Return (flat token-hash array, start-offset per doc incl. sentinel).

    Tokens are split on single spaces (the extraction spec guarantees
    single-spaced text); hashes via pd.util.hash_array (deterministic
    64-bit cython). A byte-level prefix-product hasher was tried and
    REVERTED: it needs six per-byte uint64 arrays (~40x the token count
    in bytes) and lost 3.5x to page-fault/bandwidth costs.

    Empty/null/whitespace-only texts get ZERO tokens (and thus zero
    shingles) — excluded from dedup, the analog of the reference's
    drop-all-null-rows filter (P4, /root/reference/main.py:638).
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
    th = (
        pd.util.hash_array(flat) if len(flat) else np.array([], dtype=np.uint64)
    )
    return th, starts


def token_hash_oracle(token: str) -> int:
    """Pure-python reference of the token hash (tests)."""
    return int(pd.util.hash_array(np.array([token], dtype=object))[0])


def _rolling_poly(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """acc[t] = degree-k polynomial over token_hashes[t : t+k] (mod 2^64);
    positions within k-1 of the array end mix the zero pad."""
    acc = np.zeros(len(token_hashes), dtype=np.uint64)
    for j in range(k):
        shifted = np.empty_like(acc)
        if j == 0:
            shifted[:] = token_hashes
        else:
            shifted[:-j] = token_hashes[j:]
            shifted[-j:] = 0
        acc = acc * _POLY_C + shifted
    return acc


def _shingle_hashes(
    token_hashes: np.ndarray, starts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Degree-k rolling polynomial over token hashes, not crossing docs.

    Returns (flat shingle-hash array, per-doc shingle start offsets).
    Docs with < k tokens get ONE shingle = polynomial over all their tokens.
    Assembly is a single boolean-mask gather plus scatter for short docs —
    no per-doc loops (profile showed the old repeat/arange mask + per-doc
    copy loop costing ~40% of the kernel).
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

    acc = _rolling_poly(token_hashes, k)

    # valid-window mask without repeat/arange: every position is valid
    # except the trailing min(k-1, len) positions of each doc
    valid = np.ones(len(token_hashes), dtype=bool)
    ends = starts[1:]
    for j in range(1, k):
        pos = ends - j
        sel = pos >= starts[:-1]
        valid[pos[sel]] = False

    is_long = lengths >= k
    short = (lengths > 0) & ~is_long

    # destination mask: which output slots belong to long-doc windows
    if short.any():
        # long-doc windows map 1:1 onto output positions except the single
        # slots reserved for short docs
        dest_short = sh_starts[:-1][short]
        long_mask = np.ones(total, dtype=bool)
        long_mask[dest_short] = False
        out[long_mask] = acc[valid]
        # short docs: polynomial over all tokens = acc at doc start,
        # degree len-1 < k — matches a zero-padded fold of their tokens
        # only when the doc is the array tail; compute exactly instead:
        short_idx = np.flatnonzero(short)
        short_vals = np.zeros(len(short_idx), dtype=np.uint64)
        with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
            for r, d in enumerate(short_idx):  # rare path (docs < k tokens)
                v = np.uint64(0)
                for t in token_hashes[starts[d] : starts[d + 1]]:
                    v = v * _POLY_C + t
                short_vals[r] = v
        out[dest_short] = short_vals
    else:
        out[:] = acc[valid]
    return out, sh_starts


def compute_signatures_np(
    texts: pd.Series,
    num_hashes: int = 128,
    shingle_k: int = 5,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch kernel: returns (minhash[n_docs, num_hashes] int64,
    simhash[n_docs] int64, n_shingles[n_docs] int32)."""
    th, starts = _tokenize_batch(texts)
    n_docs = len(starts) - 1
    sh, sh_starts = _shingle_hashes(th, starts, shingle_k)
    n_sh = np.diff(sh_starts).astype(np.int32)

    a, b = _hash_params(num_hashes, seed)
    minhash = np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = n_sh > 0
    if sh.size:
        # cache-blocked: chunk doc groups so a chunk's shingles stay L2-
        # resident across all num_hashes passes — the naive loop streams
        # the full array 128x from DRAM and saturates memory bandwidth
        # (measured: multi-core scaling capped at ~2.5x on 4->16 cores).
        ne_idx = np.flatnonzero(nonempty)
        ne_starts = sh_starts[:-1][nonempty]
        ne_ends = sh_starts[1:][nonempty]
        CHUNK = 1 << 16  # shingles per block (~512KB of uint64)
        d0 = 0
        while d0 < len(ne_idx):
            d1 = d0 + 1
            while d1 < len(ne_idx) and ne_ends[d1 - 1] - ne_starts[d0] < CHUNK:
                d1 += 1
            s0, s1 = int(ne_starts[d0]), int(ne_ends[d1 - 1])
            shc = sh[s0:s1]
            local_starts = ne_starts[d0:d1] - s0
            rows = ne_idx[d0:d1]
            for i in range(num_hashes):  # all hash fns over the hot chunk
                hv = a[i] * shc + b[i]
                minhash[rows, i] = np.minimum.reduceat(hv, local_starts)
            d0 = d1

    simhash = np.zeros(n_docs, dtype=np.uint64)
    if th.size:
        tok_lens = np.diff(starts)
        tok_nonempty = tok_lens > 0
        tne_idx = np.flatnonzero(tok_nonempty)
        tne_starts = starts[:-1][tok_nonempty]
        tne_ends = starts[1:][tok_nonempty]
        acc_bits = np.zeros(len(tne_idx), dtype=np.uint64)
        CHUNK = 1 << 16
        d0 = 0
        while d0 < len(tne_idx):
            d1 = d0 + 1
            while d1 < len(tne_idx) and tne_ends[d1 - 1] - tne_starts[d0] < CHUNK:
                d1 += 1
            t0, t1 = int(tne_starts[d0]), int(tne_ends[d1 - 1])
            thc = th[t0:t1]
            local_starts = tne_starts[d0:d1] - t0
            acc = np.zeros(d1 - d0, dtype=np.uint64)
            for bit in range(64):  # all bits over the hot chunk
                pm = (((thc >> np.uint64(bit)) & np.uint64(1)).astype(np.int32) * 2) - 1
                sums = np.add.reduceat(pm, local_starts)
                acc |= (sums > 0).astype(np.uint64) << np.uint64(bit)
            acc_bits[d0:d1] = acc
            d0 = d1
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
