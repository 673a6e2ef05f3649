"""LSH banding + candidate-pair generation (the blocked self-join).

Reference semantics: J1 blocking-key generator + J2 inverted-index
self-join (/root/reference/analysis_engine.py:418-437) — every record
emits blocking keys, all C(n,2) pairs within a bucket become candidates.
Here the keys are MinHash band hashes and the bucket pairing is an
equi-self-join with explicit skew handling (the reference is single-
process and has no skew story, SURVEY §4.2):

  * singleton buckets are dropped BEFORE the join (a semi-join against
    bucket counts) — at web scale most buckets are singletons;
  * buckets <= bucket_cap get full C(n,2) pairing (exact, quadratic);
  * hot buckets (> cap, boilerplate pages) get linear star+chain pairing:
    every member pairs with the bucket minimum AND with its successor in
    id order. Connectivity within the bucket is preserved (the chain),
    so downstream connected components see the same clusters as full
    pairing would WHEN the verifier keeps chain edges; recall impact is
    measured in tests (tests/test_recall.py) and bucket stats are
    returned for the metrics table.

Everything is native DataFrame ops — band hashes via xxhash64 over
signature slices, no UDFs at all in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def band_keys(
    sigs: DataFrame,
    id_col: str = "url",
    bands: int = 25,
    rows_per_band: int = 5,
) -> DataFrame:
    """sigs(id, minhash) -> (id, band, bh) — one row per (doc, band).

    Band hash = xxhash64(band, sig[band*r : (band+1)*r]) computed natively.
    Default 25 bands x 5 rows: P(candidate | J=0.8) = 1-(1-0.8^5)^25 =
    0.99995 >= the 0.99 recall gate (16x8 would give only 0.947).
    """
    cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.lit(b), F.slice("minhash", b * rows_per_band + 1, rows_per_band)).alias(
                "bh"
            ),
        )
        for b in range(bands)
    ]
    return (
        sigs.where(F.col("n_shingles") > 0)
        .select(id_col, F.explode(F.array(*cols)).alias("bk"))
        .select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    )


def candidate_pairs(
    keys: DataFrame,
    id_col: str = "url",
    bucket_cap: int = 64,
    materialize: bool = True,
    total_keys: int | None = None,
    hot_strategy: str = "star_chain",
) -> tuple[DataFrame, DataFrame]:
    """(id, band, bh) -> canonical candidate pair DataFrame (src < dst).

    Returns (pairs, bucket_stats). pairs is distinct across bands.

    materialize: localCheckpoint the counted key set before branching —
    the small/hot/self-join branches would otherwise each recompute the
    upstream scan + window shuffle (observed in .explain: no exchange
    reuse across the three branches).

    total_keys: total (id, band, bh) rows INCLUDING singleton buckets —
    lets bucket_stats report singleton counts without re-aggregating the
    full key set (the caller usually knows it: nonempty_docs * bands).
    Stats derive from the already-checkpointed multi-bucket rows: each
    row contributes 1/n, so sum(1/n) counts buckets exactly.

    hot_strategy: how buckets ABOVE bucket_cap pair up (both preserve
    within-bucket connectivity, so downstream CC sees the same clusters;
    recall under forced hot buckets is gate-tested for both):
      * "star_chain" (default): every member pairs with the bucket min
        AND its successor — 2n rows, the cheapest connectivity-preserving
        form.
      * "salted": the DESIGN.md §Skew item-4 scheme — members split into
        ceil(n/cap) salt sub-buckets by pmod(xxhash64(id), s); each
        sub-bucket pairs fully (~cap^2/2 rows, task-bounded), plus a
        chain across sub-bucket minima reconnects the bucket. More pairs
        than star_chain (denser verification inside hot families) at the
        same per-task bound — use when hot buckets are real duplicate
        families rather than boilerplate noise.
    """
    # single shuffle on (band, bh): window count replaces groupBy+join-back
    wp = Window.partitionBy("band", "bh")
    keyed = keys.withColumn("n", F.count("*").over(wp)).where(F.col("n") > 1)
    if materialize:
        keyed = keyed.localCheckpoint()

    tk = F.lit(total_keys) if total_keys is not None else F.lit(None).cast("long")
    bucket_stats = keyed.groupBy().agg(
        F.coalesce(F.round(F.sum(1.0 / F.col("n"))).cast("long"), F.lit(0)).alias(
            "n_multi_buckets"
        ),
        F.count("*").alias("n_multi_rows"),
        F.coalesce(
            F.round(
                F.sum(
                    F.when(F.col("n") > bucket_cap, 1.0 / F.col("n")).otherwise(0.0)
                )
            ).cast("long"),
            F.lit(0),
        ).alias("n_hot"),
        F.coalesce(F.max("n"), F.lit(0)).alias("max_bucket"),
        F.coalesce(F.round(F.sum((F.col("n") - 1) / 2.0), 1), F.lit(0.0)).alias(
            "full_pairing_cost"
        ),
    ).select(
        (tk - F.col("n_multi_rows") + F.col("n_multi_buckets")).alias("n_buckets"),
        (tk - F.col("n_multi_rows")).alias("n_singleton"),
        "n_hot",
        "max_bucket",
        "full_pairing_cost",
    )

    small = keyed.where(F.col("n") <= bucket_cap).drop("n")
    hot = keyed.where(F.col("n") > bucket_cap).drop("n")

    # full C(n,2) pairing for small buckets: equi-self-join on (band, bh)
    a = small.select("band", "bh", F.col(id_col).alias("src"))
    b = small.select("band", "bh", F.col(id_col).alias("dst"))
    small_pairs = a.join(b, ["band", "bh"]).where(F.col("src") < F.col("dst"))

    if hot_strategy == "salted":
        # DESIGN §Skew item 4: per-bucket salt count s = ceil(n/cap), full
        # pairing within each (band, bh, salt) sub-bucket (~cap members),
        # chain across sub-bucket minima for connectivity
        salted = keyed.where(F.col("n") > bucket_cap).select(
            "band",
            "bh",
            F.col(id_col),
            F.pmod(
                F.xxhash64(F.col(id_col)), F.ceil(F.col("n") / bucket_cap)
            ).alias("salt"),
        )
        sa = salted.select("band", "bh", "salt", F.col(id_col).alias("src"))
        sb = salted.select("band", "bh", "salt", F.col(id_col).alias("dst"))
        sub_pairs = sa.join(sb, ["band", "bh", "salt"]).where(
            F.col("src") < F.col("dst")
        )
        mins = salted.groupBy("band", "bh", "salt").agg(
            F.min(id_col).alias("m")
        )
        wchain = Window.partitionBy("band", "bh").orderBy("salt")
        cross = (
            mins.withColumn("nxt", F.lead("m").over(wchain))
            .where(F.col("nxt").isNotNull())
            .select(F.col("m").alias("src"), F.col("nxt").alias("dst"))
        )
        hot_pairs = sub_pairs.select("src", "dst").unionByName(cross)
    else:
        # linear star (to bucket min) + chain (to successor); same
        # (band, bh) partitioning as the count window -> exchange reuse
        w = wp.orderBy(id_col)
        ranked = hot.select(
            "band",
            "bh",
            F.col(id_col),
            F.min(id_col).over(wp).alias("bmin"),
            F.lead(id_col).over(w).alias("nxt"),
        )
        star = ranked.where(F.col(id_col) > F.col("bmin")).select(
            "band", "bh", F.col("bmin").alias("src"), F.col(id_col).alias("dst")
        )
        chain = ranked.where(
            F.col("nxt").isNotNull() & (F.col(id_col) > F.col("bmin"))
        ).select("band", "bh", F.col(id_col).alias("src"), F.col("nxt").alias("dst"))
        hot_pairs = star.select("src", "dst").unionByName(chain.select("src", "dst"))

    pairs = (
        small_pairs.select("src", "dst")
        .unionByName(hot_pairs)
        .select(
            F.least("src", "dst").alias("src"),  # canonical edge (O4 analog)
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    return pairs, bucket_stats


def candidate_pairs_two_table(
    keys_a: DataFrame,
    keys_b: DataFrame,
    id_col: str = "url",
) -> DataFrame:
    """Two-relation linkage analog of J3
    (/root/reference/analysis_engine.py:439-449): candidates across two
    corpora sharing a band bucket. No i<j constraint — sides are distinct."""
    a = keys_a.select("band", "bh", F.col(id_col).alias("src"))
    b = keys_b.select("band", "bh", F.col(id_col).alias("dst"))
    return a.join(b, ["band", "bh"]).select("src", "dst").distinct()
