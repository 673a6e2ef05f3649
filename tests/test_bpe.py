"""Loadable BPE tokenizer (functions/bpe.py): golden token counts on a
hand-derivable merges table, the published merges-file format, the
Arrow-batched Spark count column, and the funnel hook."""

from __future__ import annotations

import pytest

from name_deduplication_python_spark.functions.bpe import (
    BpeEncoder,
    bpe_token_counts,
    load_merges,
    save_merges,
    token_counter,
    train_bpe_merges,
    whitespace_token_counter,
)

# The Sennrich et al. (2016) running example: {low, lower, newest,
# widest} with these frequencies learns merges in a provable order.
_SENNRICH = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def test_train_bpe_merges_sennrich_order():
    merges = train_bpe_merges([" ".join(_SENNRICH)], num_merges=4)
    # counts: (e,s)=9 and (s,t</w>)=9 tie -> lexicographic ('e','s') first;
    # then (es,t</w>)=9; then (l,o)=7; then a 6-way tie between (n,e),
    # (e,w), (w,est</w>) from 'newest' -> lexicographic ('e','w').
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    assert merges[2] == ("l", "o")
    assert merges[3] == ("e", "w")


def test_encoder_golden_counts():
    """Hand-checked subword splits under a 4-merge table."""
    merges = [("e", "s"), ("es", "t</w>"), ("l", "o"), ("lo", "w</w>")]
    enc = BpeEncoder(merges)
    # 'newest' -> n e w est</w>  (e+s, es+t</w>)
    assert enc.encode("newest") == ["n", "e", "w", "est</w>"]
    # 'low' -> low</w> (l+o, lo+w</w>)
    assert enc.encode("low") == ["low</w>"]
    # 'lower' -> lo w e r</w> (l+o only; w</w> needs word-final w)
    assert enc.encode("lower") == ["lo", "w", "e", "r</w>"]
    # unseen word: character fallback
    assert enc.encode("ab") == ["a", "b</w>"]
    assert enc.count("newest low lower") == 4 + 1 + 4
    assert enc.count("") == 0 and enc.count(None) == 0
    # multiple spaces collapse like the engine's whitespace split
    assert enc.count("low  low") == 2


def test_merges_file_roundtrip_and_format(tmp_path):
    merges = train_bpe_merges([" ".join(_SENNRICH)], num_merges=6)
    p = str(tmp_path / "merges.txt")
    save_merges(merges, p)
    with open(p) as f:
        first = f.readline()
    assert first.startswith("#version")  # the public header convention
    assert load_merges(p) == merges
    bad = str(tmp_path / "bad.txt")
    with open(bad, "w") as f:
        f.write("a b c\n")
    with pytest.raises(ValueError):
        load_merges(bad)


def test_spark_counts_match_encoder(spark):
    merges = train_bpe_merges([" ".join(_SENNRICH)], num_merges=4)
    enc = BpeEncoder(merges)
    rows = [
        (1, "newest low lower"),
        (2, "the widest rivers"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(df, merges).collect()
    }
    want = {i: enc.count(t) for i, t in rows}
    assert got == want
    with pytest.raises(ValueError):
        bpe_token_counts(df.withColumn("n_bpe_tokens", df.doc_id), merges)


def test_funnel_accepts_custom_token_counter(spark):
    """VERDICT r5 #5 acceptance: build_training_set(token_counter=...)
    budgets/shards in BPE tokens — total_tokens must equal the
    encoder's count of the surviving text, not the whitespace count."""
    from name_deduplication_python_spark.trainset import build_training_set

    base = (
        "the quick brown fox jumps over the lazy dog and runs to the "
        "green hills where the small birds sing songs of summer in the "
        "warm wind and rest by the quiet water under tall trees today "
    ) * 2
    docs = spark.createDataFrame(
        [(1, "en", base + "ending one")], ["doc_id", "lang", "text"]
    )
    merges = train_bpe_merges([base], num_merges=30)
    enc = BpeEncoder(merges)

    shards, stats = build_training_set(
        spark, docs, token_counter=token_counter(merges)
    )
    rows = shards.collect()
    assert len(rows) == 1
    assert stats["total_tokens"] == enc.count(rows[0].text)
    assert rows[0].n_tokens == enc.count(rows[0].text)
    # and the unit differs from whitespace (subword fertility > 1 here
    # because the merges table is tiny)
    assert stats["total_tokens"] > len(rows[0].text.split())

    # the explicit whitespace counter reproduces the default exactly
    _, stats_ws = build_training_set(
        spark, docs, token_counter=whitespace_token_counter()
    )
    _, stats_def = build_training_set(spark, docs)
    assert stats_ws["total_tokens"] == stats_def["total_tokens"]
