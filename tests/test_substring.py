"""Substring (long-repeat) pass tests: winnowing guarantee + corpus
boilerplate detection (SURVEY §7.2 step 8)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from name_deduplication_python_spark.operators.substring import (
    substring_pairs,
    winnow_fingerprints_np,
)


def test_winnow_shared_long_run_guarantee():
    rng = np.random.default_rng(3)
    letters = "abcdefghijklmnopqrstuvwxyz "
    block = "".join(rng.choice(list(letters), size=200))  # >= 95-char run
    t1 = "".join(rng.choice(list(letters), size=300)) + block
    t2 = block + "".join(rng.choice(list(letters), size=300))
    f1 = set(winnow_fingerprints_np(t1))
    f2 = set(winnow_fingerprints_np(t2))
    assert f1 & f2, "shared 200-char run must share a fingerprint"


def test_winnow_disjoint_texts_no_overlap():
    rng = np.random.default_rng(4)
    a = "".join(rng.choice(list("abcdef "), size=500))
    b = "".join(rng.choice(list("uvwxyz "), size=500))
    assert not (set(winnow_fingerprints_np(a)) & set(winnow_fingerprints_np(b)))


def test_winnow_determinism_and_short_text():
    t = "short text"
    f1, f2 = winnow_fingerprints_np(t), winnow_fingerprints_np(t)
    assert (f1 == f2).all() and len(f1) == 1
    assert len(winnow_fingerprints_np("")) == 0


def test_substring_pairs_spark(spark):
    rng = np.random.default_rng(6)
    letters = list("abcdefghijklmnopqrstuvwxyz ")
    shared = "".join(rng.choice(letters, size=300))

    def rnd(n):
        return "".join(rng.choice(letters, size=n))

    pdf = pd.DataFrame(
        {
            "url": ["p1", "p2", "p3", "q1", "q2"],
            "text": [
                rnd(400) + shared,
                shared + rnd(400),
                rnd(200) + shared + rnd(200),
                rnd(600),
                rnd(600),
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["src"], r["dst"])
        for r in substring_pairs(df).collect()
    }
    assert {("p1", "p2"), ("p1", "p3"), ("p2", "p3")} <= got
    assert all("q" not in a + b for a, b in got), got
