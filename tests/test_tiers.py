"""Tiered dedup composition (tiers.tiered_dedup): exact -> near ->
semantic -> line-rewrite -> span-rewrite, each tier verified to act on
its planted family and leave the others to their own tier."""

from __future__ import annotations

import pytest

from name_deduplication_python_spark.tiers import tiered_dedup

# ~60-word base for the near-dup pair (J >> 0.8 after a 2-word change)
_NEAR = (
    "the quick brown fox jumps over the lazy dog and runs to the green "
    "hills where the small birds sing songs of summer in the warm wind "
    "while the river flows gently past the old mill and the miller waves "
) * 2

# a >=95-char run shared mid-line between two otherwise-different docs
_SPAN = (
    "this exact shared passage of considerable length repeats verbatim "
    "across two documents and must be cut from the second"
)

_BOILER = "subscribe to our newsletter for more updates every week"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            # exact-dup pair -> keep d1
            ("d1", "alpha beta gamma delta identical text body here"),
            ("d2", "alpha beta gamma delta identical text body here"),
            # near-dup pair -> keep d3
            ("d3", _NEAR + "ending one"),
            ("d4", _NEAR + "ending two words"),
            # shared boilerplate line in two docs -> line removed from both
            ("d5", "unique first story about harbors and ships\n" + _BOILER),
            ("d6", "second tale of mountains and snow\n" + _BOILER),
            # shared long span mid-line -> cut from d8 only (keep-first)
            ("d7", "intro seven before " + _SPAN + " outro seven after"),
            ("d8", "prelude eight starts " + _SPAN + " coda eight closes"),
            # untouched control
            ("d9", "a lone clean document nothing else resembles at all"),
        ],
        "url string, text string",
    )
    survivors, stats = tiered_dedup(docs)
    return {r.url: r.text for r in survivors.collect()}, stats


def test_tier_counts(corpus):
    texts, stats = corpus
    assert stats["n_input"] == 9
    assert stats["exact_n_out"] == 8      # d2 collapsed
    assert stats["near_n_out"] == 7       # d4 clustered away
    assert stats["n_output"] == 7
    assert stats["lines_n_rewritten"] == 2   # d5 and d6
    assert stats["spans_n_rewritten"] == 1   # d8 only (keep-first)
    assert stats["tiers"] == ["exact", "near", "lines", "spans"]


def test_each_tier_hits_its_family(corpus):
    texts, _ = corpus
    assert set(texts) == {"d1", "d3", "d5", "d6", "d7", "d8", "d9"}
    # boilerplate line gone from both carriers, story lines intact
    assert _BOILER not in texts["d5"] and _BOILER not in texts["d6"]
    assert "harbors and ships" in texts["d5"]
    # span kept in the min-id carrier, cut from the other
    assert _SPAN in texts["d7"]
    assert _SPAN not in texts["d8"]
    assert "prelude eight starts" in texts["d8"]
    # control byte-identical
    assert texts["d9"].startswith("a lone clean document")


def test_semantic_tier_prunes_cosine_neighbors(spark):
    docs = spark.createDataFrame(
        [(f"e{i}", f"document number {i} with its own words entirely") for i in range(4)],
        "url string, text string",
    )
    emb = spark.createDataFrame(
        [
            ("e0", [1.0, 0.0, 0.0]),
            ("e1", [0.999, 0.04, 0.0]),   # cosine ~1 with e0 -> dropped
            ("e2", [0.0, 1.0, 0.0]),
            ("e3", [0.0, 0.0, 1.0]),
        ],
        "url string, embedding array<double>",
    )
    survivors, stats = tiered_dedup(
        docs, tiers=("exact", "semantic"), embeddings=emb, n_lists=1
    )
    kept = {r.url for r in survivors.collect()}
    assert kept == {"e0", "e2", "e3"}
    assert stats["semantic_n_out"] == 3
    assert stats["tiers"] == ["exact", "semantic"]


def test_bad_arguments_fail_loud(spark):
    docs = spark.createDataFrame([("x", "y")], "url string, text string")
    with pytest.raises(ValueError, match="unknown tiers"):
        tiered_dedup(docs, tiers=("exact", "fuzzy"))
    with pytest.raises(ValueError, match="embeddings"):
        tiered_dedup(docs, tiers=("semantic",))


def test_semantic_tier_keeps_docs_without_embeddings(spark):
    """A document with no embedding row cannot be judged by the semantic
    prune and must SURVIVE the tier (not be silently dropped by a
    kept-ids join); coverage is reported in the stats."""
    docs = spark.createDataFrame(
        [(f"u{i}", f"text body number {i} all different words") for i in range(4)],
        "url string, text string",
    )
    emb = spark.createDataFrame(
        [
            ("u0", [1.0, 0.0, 0.0]),
            ("u1", [0.999, 0.04, 0.0]),  # duplicate of u0 -> dropped
            # u2, u3 uncovered
        ],
        "url string, embedding array<double>",
    )
    survivors, stats = tiered_dedup(
        docs, tiers=("semantic",), embeddings=emb, n_lists=1
    )
    assert {r.url for r in survivors.collect()} == {"u0", "u2", "u3"}
    assert stats["semantic_n_covered"] == 2
    assert stats["semantic_n_out"] == 3
