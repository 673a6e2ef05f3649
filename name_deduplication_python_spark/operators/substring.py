"""Exact long-repeat (substring) pass via rolling-hash winnowing.

North-star stage "suffix-array substring pass for exact long repeats":
the goal is detecting pairs of pages sharing an exact character run of
length >= L (boilerplate, licensing blocks, mirrored articles). A global
suffix array is hostile to distribution (shard-local arrays + boundary
stitching, SURVEY §7.5); the equivalent pair-detection semantics are
obtained with the public winnowing scheme (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03),
also used for web-scale dedup in "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2022, substring dedup):

  1. Rabin-Karp rolling hash of every g-char gram (numpy, batched —
     reuses the polynomial kernel shape of the MinHash stage);
  2. winnowing: keep the minimum hash in every window of w consecutive
     gram hashes -> any shared substring of length >= g + w - 1 chars is
     GUARANTEED to share at least one selected fingerprint (64-bit hash
     collisions aside);
  3. fingerprints become join keys: groupBy fingerprint, pair members
     (same skew-guarded bucket machinery as the LSH band join).

Default g=64, w=32 -> detects shared runs >= 95 chars.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lsh import candidate_pairs

_B = np.uint64(1099511628211)


def winnow_fingerprints_np(
    text: str, gram_chars: int = 64, window: int = 32
) -> np.ndarray:
    """Distinct winnowed fingerprints (uint64) of one text."""
    codes = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(codes)
    if n == 0:
        return np.array([], dtype=np.uint64)
    g = min(gram_chars, n)
    # rolling polynomial hash of every g-gram: acc over g shifted adds
    acc = np.zeros(n - g + 1, dtype=np.uint64)
    for j in range(g):
        acc = acc * _B + codes[j : j + n - g + 1]
    if len(acc) <= window:
        return np.unique(acc.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(acc, window)
    return np.unique(sw.min(axis=1))


def fingerprint_stage(
    extracted: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    gram_chars: int = 64,
    window: int = 32,
) -> DataFrame:
    """(id, text) -> (id, fp) — one row per distinct winnowed fingerprint.

    mapInPandas over Arrow batches; numpy inner kernels per doc (docs are
    short relative to batches; the per-doc loop is slice arithmetic)."""
    out_schema = f"{id_col} string, fp bigint"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[str] = []
            fps: list[np.ndarray] = []
            for i, t in zip(pdf[id_col].astype(str), pdf[text_col]):
                if not t:
                    continue
                f = winnow_fingerprints_np(t, gram_chars, window)
                if len(f):
                    ids.extend([i] * len(f))
                    fps.append(f)
            if not ids:
                continue
            yield pd.DataFrame(
                {id_col: ids, "fp": np.concatenate(fps).view(np.int64)}
            )

    return extracted.select(id_col, text_col).mapInPandas(gen, schema=out_schema)


def substring_pairs(
    extracted: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    gram_chars: int = 64,
    window: int = 32,
    bucket_cap: int = 64,
    min_shared_fps: int = 1,
) -> DataFrame:
    """Pairs of docs sharing an exact run >= gram_chars + window - 1 chars.

    Returns (src, dst, n_shared_fps). Reuses the skew-guarded bucket
    pairing from the LSH stage by treating (fp) as the band key.
    """
    fps = fingerprint_stage(extracted, id_col, text_col, gram_chars, window)
    keys = fps.select(id_col, F.col("fp").alias("bh"))
    pairs, _ = candidate_pairs(keys, id_col=id_col, bucket_cap=bucket_cap, with_stats=False)
    # count shared fingerprints per pair for ranking/auditing
    a = fps.select(F.col(id_col).alias("src"), "fp")
    b = fps.select(F.col(id_col).alias("dst"), "fp")
    shared = (
        pairs.join(a, "src").join(b, ["dst", "fp"])
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_shared_fps"))
        .where(F.col("n_shared_fps") >= min_shared_fps)
    )
    return shared
