"""SimHash Hamming-ball pair generation via pigeonhole block banding.

Reference analog: the pairwise fuzzy-ratio loop
(/root/reference/analysis_engine.py:108-135) re-imagined as SimHash
Hamming-distance matching (north_star). The naive form is an all-pairs
compare — O(n^2), a scale-killer. The standard pigeonhole trick makes it
an equi-join: split the b-bit signature into (radius+1) blocks; any two
signatures within Hamming distance ``radius`` must agree exactly on at
least one block (at most ``radius`` blocks can contain a differing bit).
Equi-join on (block_idx, block_value) then verify with the exact
``bit_count(xor)`` — provably lossless, all native expressions.

Block-join fan-out is governed by block width: radius 3 over 64 bits
gives 4 x 16-bit blocks, so random collisions within a block are ~2^-16
per band — near-duplicate corpora cluster, everything else stays in
singleton buckets that the count prefilter drops before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def simhash_block_keys(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    radius: int = 3,
    sig_bits: int = 64,
) -> DataFrame:
    """(id, simhash) -> (id, simhash, blk, bv): one row per block.

    radius+1 blocks; the final block absorbs the remainder bits when
    sig_bits isn't divisible. shiftrightunsigned keeps negative (two's-
    complement) simhashes correct.
    """
    n_blocks = radius + 1
    width = sig_bits // n_blocks
    cols = []
    for i in range(n_blocks):
        lo = i * width
        w = sig_bits - lo if i == n_blocks - 1 else width
        mask = (1 << w) - 1
        cols.append(
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(F.col(sim_col), lo)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
        )
    return sigs.select(
        F.col(id_col), F.col(sim_col), F.explode(F.array(*cols)).alias("b")
    ).select(id_col, sim_col, F.col("b.blk").alias("blk"), F.col("b.bv").alias("bv"))


def simhash_hamming_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    radius: int = 3,
    sig_bits: int = 64,
) -> DataFrame:
    """All pairs within Hamming ``radius``: (src, dst, hamming), src < dst.

    Same singleton-bucket prefilter as the MinHash LSH join (a window
    count on the block key costs one shuffle and drops the web-scale
    majority of rows before the self-join).
    """
    keys = simhash_block_keys(sigs, id_col, sim_col, radius, sig_bits)
    wp = Window.partitionBy("blk", "bv")
    multi = keys.withColumn("n", F.count("*").over(wp)).where(F.col("n") > 1).drop("n")
    a = multi.select(
        "blk", "bv", F.col(id_col).alias("src"), F.col(sim_col).alias("sim_a")
    )
    b = multi.select(
        "blk", "bv", F.col(id_col).alias("dst"), F.col(sim_col).alias("sim_b")
    )
    return (
        a.join(b, ["blk", "bv"])
        .where(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= radius)
        .distinct()  # a pair may agree on several blocks; hamming is functional in (src,dst)
    )
