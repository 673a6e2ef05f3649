"""Round-7 kernel equivalence tests: the optimization rewrites must be
value-identical to the shapes they replaced.

  * semantic_dedup impl='kernel' == impl='join' for both modes and every
    pairing strategy, including ABOVE the bucket cap (the capped salted /
    star_chain pair sets are reproduced exactly);
  * doc_ngram_hashes' rolling-poly gram kernel counts DISTINCT n-grams
    exactly like a pure-python string reference on edge-case texts.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _emb_df(spark, n=60, dim=8, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, [float(x) for x in base]))
        if i % 4 == 0:  # planted near-duplicates -> real edges
            rows.append(
                (1000 + i, [float(x + rng.gauss(0, 0.01)) for x in base])
            )
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


@pytest.mark.parametrize("mode", ["prune", "chain"])
@pytest.mark.parametrize(
    "cap,strategy", [(1000, "salted"), (7, "salted"), (7, "star_chain")]
)
def test_semantic_kernel_matches_join_impl(spark, mode, cap, strategy):
    from name_deduplication_python_spark.operators.ann import (
        semantic_assign,
        semantic_dedup,
    )

    assigned = semantic_assign(
        _emb_df(spark), n_lists=4, seed=42, dim=8
    ).localCheckpoint()

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    k = canon(
        semantic_dedup(
            assigned, cos_threshold=0.9, bucket_cap=cap,
            hot_strategy=strategy, mode=mode, impl="kernel",
        )
    )
    j = canon(
        semantic_dedup(
            assigned, cos_threshold=0.9, bucket_cap=cap,
            hot_strategy=strategy, mode=mode, impl="join",
        )
    )
    assert k == j and len(k) > 0
    if cap >= 1000:
        # uncapped: the planted near-dups must produce real drops (the
        # capped settings legitimately skip cross-chunk pairs — the same
        # disclosed residual as the join form, which is what k == j pins)
        assert any(r[2] == 0 for r in k)


def test_gram_kernel_matches_string_reference(spark):
    from name_deduplication_python_spark.operators.decontaminate import (
        doc_ngram_hashes,
    )

    texts = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "only four tokens here"),
        (4, "a b c d e f g h i j k l m"),          # exactly 13 tokens
        (5, "a b c d e f g h i j k l m n o p q"),  # several grams
        (6, "x  y " + "w " * 20),                   # empty tokens kept
        (7, ("r s t u v w x y z a b c d " * 3)),    # repeated grams -> distinct
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        r["id"]: sorted(r["gram_hashes"])
        for r in doc_ngram_hashes(df, n=13).collect()
    }

    def ref_n_grams(t):
        if t is None:
            return 0
        toks = t.strip(" ").split(" ")
        if len(toks) < 13:
            return 0
        return len({" ".join(toks[i : i + 13]) for i in range(len(toks) - 12)})

    for did, t in texts:
        assert len(got[did]) == ref_n_grams(t), (did, t)
        # distinctness holds on the hash side too
        assert len(set(got[did])) == len(got[did])
