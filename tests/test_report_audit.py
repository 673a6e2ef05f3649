"""Cluster report (A2-A10 analogs) and audit (R1-R5 analogs) tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from name_deduplication_python_spark.operators.audit import audit_edges
from name_deduplication_python_spark.operators.report import (
    cluster_report,
    summary_stats,
    top_k_by,
)


def _fixture(spark):
    clusters = spark.createDataFrame(
        [
            ("a1", "a1"), ("a2", "a1"),            # exact dup cluster
            ("b1", "b1"), ("b2", "b1"), ("b3", "b1"),  # fuzzy cluster
            ("c1", "c1"),                           # unique
            ("x1", "x1"), ("y2", "x1"),             # cross-corpus (x/y)
        ],
        "url string, cluster_id string",
    )
    edges = spark.createDataFrame(
        [
            ("a1", "a2", "Exact Match"),
            ("b1", "b2", "Fuzzy Match"),
            ("b2", "b3", "Exact Match"),
            ("x1", "y2", "Exact Match"),
        ],
        "src string, dst string, status string",
    )
    return clusters, edges


def test_cluster_report_semantics(spark):
    clusters, edges = _fixture(spark)
    rep = cluster_report(
        clusters, edges, corpus_of=lambda u: F.substring(u, 1, 1)
    ).toPandas()

    by_url = rep.set_index("url")
    # A2: any fuzzy edge -> whole cluster fuzzy
    assert by_url.loc["b1", "remark"] == "Fuzzy Match"
    assert by_url.loc["b3", "remark"] == "Fuzzy Match"
    assert by_url.loc["a1", "remark"] == "Exact Match"
    # A3 precedence: cross-corpus cluster is Linked Records and ranks first
    assert by_url.loc["x1", "category"] == "Linked Records"
    assert by_url.loc["x1", "group_id"] == 1
    assert by_url.loc["a1", "category"] == "Duplicate"
    assert by_url.loc["c1", "category"] == "Unique"
    # A9: dense group ids 1..N
    assert sorted(rep["group_id"].unique()) == [1, 2, 3, 4]
    # exact-before-fuzzy within Duplicate class (A4)
    assert by_url.loc["a1", "group_id"] < by_url.loc["b1", "group_id"]

    s = summary_stats(spark.createDataFrame(rep))
    assert s["total_rows"] == 8 and s["n_groups"] == 4
    assert s["linked_rows"] == 2 and s["dup_rows"] == 5 and s["unique_rows"] == 1


def test_cluster_report_no_single_partition_window(spark):
    """A9 renumbering must not funnel the member table through one task
    (round-1 flag: unpartitioned Window.orderBy = Exchange SinglePartition
    on the full table). The two-pass offset scheme keeps every exchange
    hash- or range-partitioned."""
    clusters, edges = _fixture(spark)
    rep = cluster_report(clusters, edges, corpus_of=lambda u: F.substring(u, 1, 1))
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_cluster_report_group_ids_match_dense_rank_oracle(spark):
    """Two-pass renumbering output == the reference dense_rank semantics
    on a larger random fixture (many clusters across partitions)."""
    import random

    rng = random.Random(5)
    rows, edge_rows = [], []
    for c in range(200):
        size = rng.randint(1, 4)
        members = [f"u{c:03d}_{m}" for m in range(size)]
        rows += [(m, members[0]) for m in members]
        edge_rows += [
            (members[0], m, rng.choice(["Exact Match", "Fuzzy Match"]))
            for m in members[1:]
        ]
    clusters = spark.createDataFrame(rows, "url string, cluster_id string")
    edges = spark.createDataFrame(edge_rows, "src string, dst string, status string")
    rep = cluster_report(clusters, edges).toPandas()
    # oracle: sort distinct cluster keys, assign 1..N
    keys = (
        rep.groupby("cluster_id")
        .agg(
            cr=("category", lambda s: {"Linked Records": 0, "Duplicate": 1, "Unique": 2}[s.iloc[0]]),
            rr=("remark", lambda s: 0 if s.iloc[0] == "Exact Match" else 1),
            mm=("url", "min"),
        )
        .reset_index()
        .sort_values(["cr", "rr", "mm", "cluster_id"])
        .reset_index(drop=True)
    )
    keys["want_gid"] = keys.index + 1
    merged = rep.merge(keys[["cluster_id", "want_gid"]], on="cluster_id")
    assert (merged["group_id"] == merged["want_gid"]).all()


def test_top_k_by(spark):
    df = spark.createDataFrame(
        [("en",)] * 5 + [("de",)] * 3 + [("fr",)] * 3 + [("es",)],
        "lang string",
    )
    got = top_k_by(df, "lang", k=2).toPandas()
    assert list(got["lang"]) == ["en", "de"]  # tie de/fr broken by name


def test_audit_flags_planted_inconsistencies(spark):
    texts = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["p1", "p2", "q1", "q2"],
                "text": [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon zeta",   # true exact
                    "one two three four five six seven",
                    "totally different words entirely here now",  # NOT similar
                ],
            }
        )
    )
    edges = spark.createDataFrame(
        [
            ("p1", "p2", 1.0, 0, "Exact Match"),      # consistent -> clean
            ("q1", "q2", 0.9, 1, "Exact Match"),       # planted false positive
        ],
        "src string, dst string, est_jaccard double, hamming int, status string",
    )
    flagged = audit_edges(edges, texts).toPandas()
    assert set(flagged["src"]) == {"q1"}
    assert flagged.iloc[0]["issue"] == "exact-status-but-texts-differ"


def test_audit_clean_on_honest_edges(spark):
    texts = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["p1", "p2"],
                "text": ["w1 w2 w3 w4 w5 w6 w7 w8", "w1 w2 w3 w4 w5 w6 w7 w8"],
            }
        )
    )
    edges = spark.createDataFrame(
        [("p1", "p2", 1.0, 0, "Exact Match")],
        "src string, dst string, est_jaccard double, hamming int, status string",
    )
    assert audit_edges(edges, texts).count() == 0


def test_audit_name_pairs_flags_planted_issues(spark):
    """R1/R3 names-domain audit (auditor.py:229-277 analog): planted bad
    pairs must be flagged with the right rules; honest pairs stay clean."""
    import pandas as pd

    from name_deduplication_python_spark.operators.audit import audit_name_pairs
    from name_deduplication_python_spark.operators.names import (
        normalize_records,
        remap_columns,
    )

    rows = [
        dict(rid="n1", first_name="Jose", last_name="Mercado", middle_name="Santos",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        dict(rid="n2", first_name="Jose", last_name="Mercado", middle_name="Santos",
             birthdate="1991-02-02", city="Boac", sex="M", suffix=""),   # bdate mismatch
        dict(rid="n3", first_name="Jose", last_name="Mercado", middle_name="Santos",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),   # clean twin of n1
        dict(rid="n4", first_name="Rodrigo", last_name="Mercado", middle_name="Bautista",
             birthdate="", city="Gasan", sex="", suffix=""),             # name-only side
        dict(rid="n5", first_name="Jovita", last_name="Mercado", middle_name="Cruz",
             birthdate="", city="Boac", sex="", suffix=""),              # name-only side
    ]
    feats = normalize_records(
        remap_columns(spark.createDataFrame(pd.DataFrame(rows)), keep=["rid"])
    )
    edges = spark.createDataFrame(
        [
            ("n1", "n2", "Fuzzy Match"),   # birthdate mismatch
            ("n1", "n3", "Exact Match"),   # honest exact pair
            ("n4", "n5", "Fuzzy Match"),   # name-only: far names + city differ
        ],
        "src string, dst string, status string",
    )
    got = audit_name_pairs(edges, feats).toPandas()
    issues = {
        (r.src, r.dst): set()
        for r in got.itertuples()
    }
    for r in got.itertuples():
        issues[(r.src, r.dst)].add(r.issue)

    assert "birthdate-mismatch" in issues[("n1", "n2")]
    assert ("n1", "n3") not in issues, "honest exact pair must be clean"
    flagged_45 = issues[("n4", "n5")]
    assert "city-differs-name-only" in flagged_45          # R3 guard
    assert "first-name-low-sim" in flagged_45              # R1 floor
    assert "fuzzy-remark-low-wratio" in flagged_45         # R4 consistency


def test_r5_group_expansion_audits_never_scored_pairs(spark):
    """R5 (auditor.py:306-347 analog): a transitively-merged group holds
    pairs NO scorer emitted; the group-expansion audit must re-expand and
    flag them. Fixture: a-b and b-c were scored edges, a-c never was —
    and a vs c violates the last<85 floor."""
    import pandas as pd

    from name_deduplication_python_spark.operators.audit import (
        audit_report_groups,
        expand_group_pairs,
    )
    from name_deduplication_python_spark.operators.names import (
        normalize_records,
        remap_columns,
    )

    rows = [
        dict(rid="a", first_name="Jose", last_name="Mercado", middle_name="",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        dict(rid="b", first_name="Jose", last_name="Mercado", middle_name="",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        # c bridged in via b but with a very different last name
        dict(rid="c", first_name="Jose", last_name="Villanueva", middle_name="",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        dict(rid="z", first_name="Zenaida", last_name="Ocampo", middle_name="",
             birthdate="1975-09-09", city="Torrijos", sex="F", suffix=""),
    ]
    feats = normalize_records(
        remap_columns(spark.createDataFrame(pd.DataFrame(rows)), keep=["rid"])
    )
    clusters = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("c", "g1"), ("z", "z")],
        "rid string, cluster_id string",
    )
    edges = spark.createDataFrame(
        [("a", "b", "Exact Match"), ("b", "c", "Fuzzy Match")],
        "src string, dst string, status string",
    )

    # expansion covers ALL intra-group pairs, singleton groups skipped
    pairs = {(r.src, r.dst) for r in expand_group_pairs(clusters).collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}

    got = audit_report_groups(clusters, feats, edges=edges).toPandas()
    by_pair = {}
    for r in got.itertuples():
        by_pair.setdefault((r.src, r.dst), set()).add((r.status, r.issue))
    # the never-scored a-c pair is audited and flagged on the last<85 floor
    assert ("a", "c") in by_pair
    assert ("Transitive (unscored)", "last-name-low-sim") in by_pair[("a", "c")]
    # the honest scored pair stays clean; b-c is flagged on the same floor
    assert ("a", "b") not in by_pair
    assert any(i == "last-name-low-sim" for _, i in by_pair[("b", "c")])
    # scored pairs keep their emitted status in the audit rows
    assert all(s == "Fuzzy Match" for s, _ in by_pair[("b", "c")])


def test_r5_mega_group_expansion_is_bounded(spark):
    """A transitively-chained mega-component (CC's job is to build these;
    the LSH bucket_cap does NOT bound component size) must not expand to
    C(n,2) audit pairs: above member_cap the expansion goes chunked —
    O(n*cap) pairs, every member still covered."""
    from pyspark.sql import functions as F

    from name_deduplication_python_spark.operators.audit import (
        expand_group_pairs,
    )

    n, cap = 5000, 50
    clusters = spark.range(n).select(
        F.format_string("m%05d", F.col("id")).alias("rid"),
        F.lit("mega").alias("cluster_id"),
    )
    pairs = expand_group_pairs(clusters, member_cap=cap).localCheckpoint()
    n_chunks = -(-n // cap)
    full_chunks, rem = divmod(n, cap)
    expected = (
        full_chunks * cap * (cap - 1) // 2
        + rem * (rem - 1) // 2
        + (n_chunks - 1)
    )
    got = pairs.count()
    assert got == expected, (got, expected)
    assert got < n * (n - 1) // 2 / 50, "must be far below quadratic"
    members = pairs.select(F.col("src").alias("m")).union(
        pairs.select(F.col("dst").alias("m"))
    )
    assert members.distinct().count() == n, "every member audited"


def test_r5_audit_joins_surrogate_canonicalized_edges(spark):
    """Pipeline edges are canonicalized by xxhash64(url) surrogate order
    before relabeling to urls, so a scored edge may arrive (dst, src) in
    url order. The R5 join must still attach its status instead of
    mislabeling the pair 'Transitive (unscored)'."""
    import pandas as pd

    from name_deduplication_python_spark.operators.audit import (
        audit_report_groups,
    )
    from name_deduplication_python_spark.operators.names import (
        normalize_records,
        remap_columns,
    )

    rows = [
        dict(rid="a", first_name="Jose", last_name="Mercado", middle_name="",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        dict(rid="b", first_name="Jose", last_name="Villanueva", middle_name="",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
    ]
    feats = normalize_records(
        remap_columns(spark.createDataFrame(pd.DataFrame(rows)), keep=["rid"])
    )
    clusters = spark.createDataFrame(
        [("a", "g1"), ("b", "g1")], "rid string, cluster_id string"
    )
    # scored edge arrives REVERSED relative to url sort order
    edges = spark.createDataFrame(
        [("b", "a", "Fuzzy Match")], "src string, dst string, status string"
    )
    got = audit_report_groups(clusters, feats, edges=edges).toPandas()
    statuses = {r.status for r in got.itertuples() if (r.src, r.dst) == ("a", "b")}
    assert statuses == {"Fuzzy Match"}, statuses


def test_audit_tier_stratified_sampling_catches_hamming_channel(spark):
    """VERDICT r4 #8: hamming-only edges are the false-merge channel, so
    audit sampling must over-represent them. 10 planted hamming-only
    low-true-similarity edges + 20 clean estimator edges, sampled at
    sample_fraction=0.1 with the default 10x hamming oversample: the
    hamming stratum is sampled at min(1, 0.1*10) = 1.0, so EVERY planted
    bad edge is audited and flagged — and every flag carries its tier."""
    shared = "alpha beta gamma delta epsilon "
    rows, edge_rows = [], []
    for i in range(10):
        a, b = f"h{i}a", f"h{i}b"
        # shingle-J far below threshold/2 -> 'low-true-similarity'
        rows.append((a, shared + f"uniq{i} " + "x y z w v u t s r q " * 2))
        rows.append((b, shared + f"other{i} " + "m n o p k j i g f e " * 2))
        edge_rows.append((a, b, 0.30, 2, "Fuzzy Match", "hamming"))
    for i in range(20):
        a, b = f"e{i}a", f"e{i}b"
        t = f"same words for the estimator pair number {i} " * 3
        rows.append((a, t))
        rows.append((b, t))
        edge_rows.append((a, b, 1.0, 0, "Fuzzy Match", "estimator"))
    texts = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    edges = spark.createDataFrame(
        edge_rows,
        "src string, dst string, est_jaccard double, hamming int, "
        "status string, via string",
    )
    flagged = audit_edges(edges, texts, sample_fraction=0.1).toPandas()
    assert set(flagged["via"]) == {"hamming"}, flagged
    assert set(flagged["src"]) == {f"h{i}a" for i in range(10)}, (
        "every hamming-only edge must be audited (stratum fraction = 1.0)"
    )
    assert set(flagged["issue"]) <= {"low-true-similarity", "estimate-drift"}


def test_expansion_coverage_closed_form(spark):
    """expansion_coverage's closed form matches the actual pair counts
    expand_group_pairs emits, capped and uncapped."""
    from name_deduplication_python_spark.operators.audit import (
        expand_group_pairs,
        expansion_coverage,
    )

    rows = [(f"m{i:03d}", "g1") for i in range(10)] + [
        (f"n{i:03d}", "g2") for i in range(3)
    ]
    clusters = spark.createDataFrame(rows, "rid string, cluster_id string")
    for cap in (4, None):
        got = expand_group_pairs(clusters, member_cap=cap).count()
        cov = {
            r["cluster_id"]: r
            for r in expansion_coverage(clusters, member_cap=cap).collect()
        }
        assert got == sum(r["n_pairs_audited"] for r in cov.values())
        assert cov["g1"]["n_pairs_full"] == 45
        assert cov["g2"]["n_pairs_full"] == 3
        if cap is None:
            assert all(r["n_pairs_dropped"] == 0 for r in cov.values())
        else:
            assert cov["g2"]["n_pairs_dropped"] == 0  # under the cap
            assert cov["g1"]["n_pairs_dropped"] > 0
