"""End-to-end recall gate: dup-pair recall >= 0.99 vs a brute-force
all-pairs shingle-Jaccard oracle (BASELINE.json metric; SURVEY §5 item 2).

The oracle is independent of the engine's hashing: true Jaccard over
exact k-shingle sets of the actual texts. A pair is a true dup iff
J >= jaccard_threshold; the engine must place >= 99% of such pairs in
the same cluster at the identical (k, num_hashes, bands, rows) config.
"""

from __future__ import annotations

from itertools import combinations

import pytest

from name_deduplication_python_spark import DEFAULT_CONFIG
from name_deduplication_python_spark.operators.components import (
    components_with_singletons,
)
from name_deduplication_python_spark.operators.extract import extract_stage
from name_deduplication_python_spark.operators.lsh import band_keys, candidate_pairs
from name_deduplication_python_spark.operators.signatures import signature_stage
from name_deduplication_python_spark.operators.verify import verify_stage
from name_deduplication_python_spark.sources.corpus import (
    corpus_to_spark,
    generate_corpus,
)
from name_deduplication_python_spark.functions.text_extract import extract_text_oracle


def _shingle_set(text: str, k: int) -> frozenset:
    toks = text.split(" ")
    if len(toks) < k:
        return frozenset([tuple(toks)])
    return frozenset(tuple(toks[i : i + k]) for i in range(len(toks) - k + 1))


def _oracle_pairs(texts: dict[str, str], k: int, theta: float) -> set[tuple[str, str]]:
    shs = {u: _shingle_set(t, k) for u, t in texts.items() if t}
    out = set()
    for a, b in combinations(sorted(shs), 2):
        sa, sb = shs[a], shs[b]
        inter = len(sa & sb)
        if inter == 0:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        if j >= theta:
            out.add((a, b))
    return out


@pytest.fixture(scope="module")
def corpus():
    pages, truth = generate_corpus(n_base=250, seed=42)
    texts = {
        r["url"]: (r["text"] if r["text"] is not None else extract_text_oracle(r["html"]))
        for _, r in pages.iterrows()
    }
    return pages, truth, texts


def test_recall_vs_bruteforce_oracle(spark, corpus):
    pages, truth, texts = corpus
    cfg = DEFAULT_CONFIG
    theta = cfg["jaccard_threshold"]
    want = _oracle_pairs(texts, cfg["shingle_k"], theta)
    assert len(want) >= 80, f"oracle found only {len(want)} true dup pairs"

    df = corpus_to_spark(spark, pages)
    extracted = extract_stage(df).cache()
    sigs = signature_stage(
        extracted,
        num_hashes=cfg["num_hashes"],
        shingle_k=cfg["shingle_k"],
        seed=cfg["seed"],
    ).cache()
    keys = band_keys(sigs, bands=cfg["bands"], rows_per_band=cfg["rows_per_band"])
    pairs, _ = candidate_pairs(keys, bucket_cap=cfg["bucket_cap"])
    edges = verify_stage(
        pairs,
        sigs,
        num_hashes=cfg["num_hashes"],
        jaccard_threshold=cfg["jaccard_threshold"],
        simhash_radius=cfg["simhash_radius"],
    )
    clusters = components_with_singletons(edges.select("src", "dst"), extracted, "url")
    lab = {r["url"]: r["cluster_id"] for r in clusters.collect()}

    hit = sum(1 for a, b in want if lab[a] == lab[b])
    recall = hit / len(want)
    assert recall >= 0.99, f"recall {recall:.4f} ({hit}/{len(want)})"


def test_recall_survives_hot_bucket_capping(spark):
    """Skew mitigation must not cost recall (SURVEY §7.5): a large family
    of identical/near-identical docs makes every one of its band buckets
    hot; with a tiny bucket_cap the star+chain path must still keep the
    family fully clustered, and unrelated docs out."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(400)]
    base = " ".join(rng.choice(vocab, size=200))
    rows = [("hot%03d" % i, base) for i in range(40)]  # 40 exact copies
    for i in range(5):  # near-dups of the family
        toks = base.split(" ")
        toks[10 * i] = "sub%d" % i
        rows.append(("near%02d" % i, " ".join(toks)))
    for i in range(30):  # unrelated
        rows.append(("uniq%02d" % i, " ".join(rng.choice(vocab, size=200))))
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    texts = dict(rows)

    cfg = DEFAULT_CONFIG
    want = _oracle_pairs(texts, cfg["shingle_k"], cfg["jaccard_threshold"])
    assert len(want) >= 900  # C(45,2) family pairs

    extracted = spark.createDataFrame(pdf).cache()
    sigs = signature_stage(
        extracted, num_hashes=cfg["num_hashes"], shingle_k=cfg["shingle_k"],
        seed=cfg["seed"],
    ).cache()
    keys = band_keys(sigs, bands=cfg["bands"], rows_per_band=cfg["rows_per_band"])
    pairs, obs = candidate_pairs(keys, bucket_cap=4)  # force capped path
    pairs = pairs.localCheckpoint()  # action populates the observation
    assert obs.get["n_hot"] > 0, "fixture must produce hot buckets"
    edges = verify_stage(
        pairs, sigs, num_hashes=cfg["num_hashes"],
        jaccard_threshold=cfg["jaccard_threshold"],
        simhash_radius=cfg["simhash_radius"],
    )
    clusters = components_with_singletons(edges.select("src", "dst"), extracted, "url")
    lab = {r["url"]: r["cluster_id"] for r in clusters.collect()}
    hit = sum(1 for a, b in want if lab[a] == lab[b])
    recall = hit / len(want)
    assert recall >= 0.99, f"capped-path recall {recall:.4f} ({hit}/{len(want)})"


def test_extraction_byte_identity_e2e(spark, corpus):
    pages, _, texts = corpus
    df = corpus_to_spark(spark, pages)
    got = {r["url"]: r["text"] for r in extract_stage(df).collect()}
    assert got == texts


def test_precision_of_widened_estimator_band(spark, corpus):
    """ADVICE r2: the fuzzy tier accepts at est >= theta - 2.33*sigma
    (~0.718) for the 0.99 RECALL gate; this is the matching PRECISION
    gate. Every emitted edge is recomputed against exact shingle Jaccard:
    edges admitted by the ESTIMATOR band (hamming > radius, so simhash
    did not admit them) must never sit far below threshold — the
    symmetric tail only reaches ~theta - 2z*sigma. And no truth-planted
    near50 pair (J~0.5) may be admitted by ANY tier."""
    from name_deduplication_python_spark import DEFAULT_CONFIG as cfg
    from name_deduplication_python_spark.operators.extract import extract_stage
    from name_deduplication_python_spark.operators.lsh import band_keys, candidate_pairs
    from name_deduplication_python_spark.operators.signatures import signature_stage
    from name_deduplication_python_spark.operators.verify import verify_stage

    pages, truth, texts = corpus
    df = corpus_to_spark(spark, pages)
    extracted = extract_stage(df)
    sigs = signature_stage(
        extracted, num_hashes=cfg["num_hashes"], shingle_k=cfg["shingle_k"],
        seed=cfg["seed"],
    )
    keys = band_keys(sigs, bands=cfg["bands"], rows_per_band=cfg["rows_per_band"])
    pairs, _ = candidate_pairs(keys, bucket_cap=cfg["bucket_cap"])
    edges = verify_stage(
        pairs, sigs, num_hashes=cfg["num_hashes"],
        jaccard_threshold=cfg["jaccard_threshold"],
        simhash_radius=cfg["simhash_radius"],
    ).collect()
    assert edges

    k, theta = cfg["shingle_k"], cfg["jaccard_threshold"]
    sigma = (theta * (1 - theta) / cfg["num_hashes"]) ** 0.5
    floor = theta - 2 * 2.33 * sigma  # symmetric tail bound (~0.635)

    def exact_j(a, b):
        sa, sb = _shingle_set(texts[a], k), _shingle_set(texts[b], k)
        inter = len(sa & sb)
        return inter / (len(sa) + len(sb) - inter) if inter else 0.0

    est_admitted = [e for e in edges if e.hamming > cfg["simhash_radius"]]
    assert est_admitted, "fixture must exercise the estimator band"
    worst = min(exact_j(e.src, e.dst) for e in est_admitted)
    assert worst >= floor, f"estimator band admitted exact J={worst:.3f}"

    # near50 (J~0.5) pairs must never enter through the ESTIMATOR tier —
    # P(est >= 0.718 | J=0.5) ~ 5e-7. (The SimHash Hamming-ball tier is a
    # deliberately independent similarity criterion — token-frequency
    # near-duplicates with low shingle-J MAY enter there, per the
    # north-star's 'SimHash Hamming-ball matching for near-dup scoring'.)
    est_pairs = {tuple(sorted((e.src, e.dst))) for e in est_admitted}
    far = truth[truth.kind == "near50"]
    assert len(far) > 0
    for a, b in zip(far.src, far.dst):
        assert tuple(sorted((a, b))) not in est_pairs, (
            "near50 pair admitted via the estimator band"
        )


def test_hamming_precision_tier_strict_floor(spark, corpus):
    """VERDICT r4 #1 gate: under the STRICT knob (hamming_est_floor =
    operators.verify.hamming_floor()), planted near-J~0.5 families must
    false-merge at <= 0.02 while J>=0.8 recall stays >= 0.99; under the
    DEFAULT knob (None) the same corpus documents the disclosed
    hamming-tier leak. Every edge must carry a correct `via` tier label
    under both settings."""
    from name_deduplication_python_spark import DEFAULT_CONFIG as cfg
    from name_deduplication_python_spark.operators.verify import hamming_floor

    pages, truth, texts = corpus
    theta = cfg["jaccard_threshold"]
    want = _oracle_pairs(texts, cfg["shingle_k"], theta)
    near50 = [tuple(sorted((a, b))) for a, b in zip(
        truth[truth.kind == "near50"].src, truth[truth.kind == "near50"].dst
    )]
    assert near50

    df = corpus_to_spark(spark, pages)
    extracted = extract_stage(df).cache()
    sigs = signature_stage(
        extracted, num_hashes=cfg["num_hashes"], shingle_k=cfg["shingle_k"],
        seed=cfg["seed"],
    ).cache()
    keys = band_keys(sigs, bands=cfg["bands"], rows_per_band=cfg["rows_per_band"])
    pairs, _ = candidate_pairs(keys, bucket_cap=cfg["bucket_cap"])
    pairs = pairs.localCheckpoint()  # reused under both knobs

    def run(floor):
        edges = verify_stage(
            pairs, sigs, num_hashes=cfg["num_hashes"],
            jaccard_threshold=theta, simhash_radius=cfg["simhash_radius"],
            hamming_est_floor=floor,
        )
        rows = edges.collect()
        clusters = components_with_singletons(
            edges.select("src", "dst"), extracted, "url"
        )
        lab = {r["url"]: r["cluster_id"] for r in clusters.collect()}
        return rows, lab

    floor = hamming_floor(theta, cfg["num_hashes"])
    sigma = (theta * (1 - theta) / cfg["num_hashes"]) ** 0.5
    slack = 2.33 * sigma

    for knob in (None, floor):
        rows, lab = run(knob)
        # tier labels are consistent with the score columns
        for e in rows:
            est_ok = e.est_jaccard >= theta - slack
            ham_ok = e.hamming <= cfg["simhash_radius"] and (
                knob is None or e.est_jaccard >= knob
            )
            expect = (
                "both" if est_ok and ham_ok
                else "estimator" if est_ok else "hamming"
            )
            assert e.via == expect, (e, expect)
            assert est_ok or ham_ok  # no edge survives with neither tier
        # recall gate holds under BOTH settings
        hit = sum(1 for a, b in want if lab[a] == lab[b])
        assert hit / len(want) >= 0.99, f"recall broke under floor={knob}"
        merged50 = sum(1 for a, b in near50 if lab.get(a) == lab.get(b))
        rate = merged50 / len(near50)
        if knob is not None:
            assert rate <= 0.02, f"strict near50 false-merge rate {rate:.3f}"

    # the strict edge set is exactly the default set minus hamming-only
    # edges below the floor (pure tightening, no new edges)
    default_edges = {(e.src, e.dst) for e in run(None)[0]}
    strict_edges = {(e.src, e.dst) for e in run(floor)[0]}
    assert strict_edges <= default_edges
