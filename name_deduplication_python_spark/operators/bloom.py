"""Distributed Bloom filter as a DataFrame: membership prefiltering.

Beyond-reference LLM-pipeline operator (the reference's nearest shape
is the P5 already-matched filter, /root/reference/analysis_engine.py:
217 — an exact anti-join against prior results; here the same "skip
what we've seen" intent is served by a probabilistic structure that
fits 10^12 keys where the exact side-table cannot be joined cheaply).

The filter IS a DataFrame — (word_idx bigint, bits bigint), one row
per set 64-bit word of the bitmap — so it builds with one map-combined
``bit_or`` aggregation, persists as an ordinary parquet/Iceberg stage
table, unions incrementally (re-aggregate ``bit_or`` over old + new
words), and probes with a join instead of a driver-side bitmap:

  - BUILD: each key contributes k bit positions (k rows after a
    bounded explode), positions hash-partition by word index, and the
    map-side combine collapses most duplicates before the exchange.
    The result has at most n_bits/64 rows regardless of key count.
  - PROBE: explode the batch's k positions, join the word table on
    word_idx (broadcast when the filter is small; a plain shuffle-hash
    join co-partitioned on word_idx at scale), and AND the per-key
    verdicts: a key is ``maybe_seen`` only if ALL k bits are set.
    False positives happen at the configured rate; false NEGATIVES
    never do — "definitely new" is exact, which is the contract a
    crawl-frontier / incremental-dedup prefilter needs (a maybe-seen
    key falls through to the exact store join; a definitely-new key
    skips it).

Position hashing defaults to the auditable md5-prefix (DuckDB replays
it bit-identically — same discipline as operators/dsir.py); pass
hash_fn="xxh64" for the cheaper scale setting. Build and probe must
use the same (n_bits, k, hash_fn).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """Classic sizing: n_bits = ceil(-n ln p / ln^2 2) rounded up to a
    multiple of 64, k = round(n_bits/n * ln 2) clamped to >= 1."""
    if n_keys <= 0:
        raise ValueError("n_keys must be positive")
    if not 0 < fpr < 1:
        raise ValueError("fpr must be in (0, 1)")
    n_bits = math.ceil(-n_keys * math.log(fpr) / (math.log(2) ** 2))
    n_bits = ((n_bits + 63) // 64) * 64
    k = max(1, round(n_bits / n_keys * math.log(2)))
    return n_bits, k


def _positions(key: Column, n_bits: int, k: int, hash_fn: str) -> Column:
    """array<bigint> of k bit positions in [0, n_bits) for one key.

    Each position hashes the key with a distinct salt suffix through
    dsir._bucket_expr — the single shared hash-to-range expression whose
    md5 path the DuckDB oracles replay bit-identically (bigint output:
    n_bits exceeds int32 at 10^12-key sizing)."""
    from .dsir import _bucket_expr

    if hash_fn not in ("md5", "xxh64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxh64', got {hash_fn!r}")
    return F.array(
        *[
            _bucket_expr(
                F.concat(key.cast("string"), F.lit(f"#b{i}")),
                n_bits,
                hash_fn,
                cast_to="bigint",
            )
            for i in range(k)
        ]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int,
    k: int,
    hash_fn: str = "md5",
) -> DataFrame:
    """(word_idx bigint, bits bigint) — the set words of the bitmap.

    One explode (k rows per key) + one map-combined bit_or aggregation;
    output is <= n_bits/64 rows no matter how many keys went in. Union
    two filters by re-aggregating bit_or over their concatenated word
    tables (see bloom_union)."""
    if n_bits <= 0 or n_bits % 64:
        raise ValueError("n_bits must be a positive multiple of 64")
    if k <= 0:
        raise ValueError("k must be positive")
    pos = keys.select(
        F.explode(
            _positions(F.col(key_col), n_bits, k, hash_fn)
        ).alias("pos")
    )
    # pos is non-negative, so shiftright/& are exact floor-div/mod (no
    # ANSI sign or double-division hazards); expr-strings because the
    # PySpark shift wrappers only take literal shift amounts
    return (
        pos.selectExpr(
            "shiftright(pos, 6) AS word_idx",
            "shiftleft(cast(1 AS bigint), cast(pos & 63 AS int)) AS bit",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two word tables built with identical (n_bits, k, hash_fn)."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bloom_maybe_contains(
    batch: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int,
    k: int,
    hash_fn: str = "md5",
    broadcast_filter: bool = True,
) -> DataFrame:
    """Append ``maybe_seen`` (boolean) to ``batch``.

    maybe_seen=false is EXACT (the key was never added); maybe_seen=
    true is probabilistic at the filter's fpr. Set
    broadcast_filter=False when the word table exceeds broadcast size
    — the probe then shuffle-joins co-partitioned on word_idx."""
    probe = batch.select(
        F.col(key_col).alias("__bk"),
        F.explode(_positions(F.col(key_col), n_bits, k, hash_fn)).alias("pos"),
    ).selectExpr(
        "__bk",
        "shiftright(pos, 6) AS word_idx",
        "cast(pos & 63 AS int) AS bit",
    )
    words = F.broadcast(bloom) if broadcast_filter else bloom
    hits = (
        probe.join(words, "word_idx", "left")
        .select(
            "__bk",
            (
                # arithmetic shift then &1 reads the addressed bit even
                # when bit 63 (the sign bit) is set
                F.coalesce(
                    F.expr("shiftright(bits, bit) & cast(1 AS bigint)"),
                    F.lit(0).cast("bigint"),
                )
                == 1
            ).alias("bit_set"),
        )
        .groupBy("__bk")
        .agg(F.min("bit_set").alias("maybe_seen"))
    )
    return batch.join(
        hits.withColumnRenamed("__bk", key_col), key_col, "left"
    ).fillna({"maybe_seen": False})
