"""Physical-plan regression tests: the optimizations we rely on must be
visible in .explain output (SURVEY §4 / task brief: pushdown, broadcast,
codegen, no stray recomputation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from name_deduplication_python_spark.plans.queries import (
    q_quality_scores,
    q_top_customers,
    q_orders_by_region,
)

SF = "/root/testdata/sf0.01"


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_parquet_filter_pushdown(spark):
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: text (the wide column) must NOT be read
    assert "text" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_column_pruning_quality_scores(spark):
    plan = _formatted(q_quality_scores(spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_broadcast_joins_chosen(spark):
    assert "BroadcastHashJoin" in _formatted(q_top_customers(spark, SF))
    plan = _formatted(q_orders_by_region(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region dims


def test_whole_stage_codegen_in_verify(spark):
    """Verification scoring must stay JVM-side (no Python eval nodes)."""
    from name_deduplication_python_spark.operators.verify import score_pairs

    sigs = spark.createDataFrame(
        [("a", [1, 2], 3), ("b", [1, 2], 5)],
        "url string, minhash array<bigint>, simhash bigint",
    )
    pairs = spark.createDataFrame([("a", "b")], "src string, dst string")
    plan = _formatted(score_pairs(pairs, sigs, num_hashes=2))
    # AQE hides WholeStageCodegen spans until the final plan; the load-
    # bearing assertion is that NO Python evaluation node appears — the
    # whole scorer must be JVM expressions.
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "mapInPandas"):
        assert marker not in plan, marker


def test_extract_stage_prunes_html_when_text_present(spark):
    """Extraction reads only needed columns from the source."""
    from name_deduplication_python_spark.operators.extract import extract_stage

    pages = spark.createDataFrame(
        [("u", None, None, "t", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_stage(pages)
    assert set(out.columns) == {"url", "warc_ts", "text", "lang"}


def test_simhash_query_has_no_cartesian(spark):
    """Round-1 regression: q_simhash_near_pairs was a crossJoin over all
    documents. The pigeonhole block-banded form must never plan a
    cartesian/nested-loop product."""
    from name_deduplication_python_spark.plans.queries import (
        q_simhash_hamming_pairs_sql,
        q_simhash_near_pairs,
    )

    for q in (q_simhash_near_pairs, q_simhash_hamming_pairs_sql):
        plan = _formatted(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__


def test_simhash_banding_equals_bruteforce(spark):
    """Pigeonhole block banding is lossless: banded pairs == brute-force
    all-pairs at the same radius, on the engine's real signatures."""
    from name_deduplication_python_spark.operators.signatures import signature_stage
    from name_deduplication_python_spark.operators.simhash import (
        simhash_hamming_pairs,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(300)
        .select(F.col("doc_id").cast("string").alias("url"), "text")
    )
    sigs = signature_stage(docs).select(
        F.col("url").cast("bigint").alias("doc_id"), "simhash"
    ).localCheckpoint()
    banded = {
        (r.src, r.dst, r.hamming)
        for r in simhash_hamming_pairs(sigs, radius=3).collect()
    }
    a = sigs.select(F.col("doc_id").alias("src"), F.col("simhash").alias("ha"))
    b = sigs.select(F.col("doc_id").alias("dst"), F.col("simhash").alias("hb"))
    brute = {
        (r.src, r.dst, r.hamming)
        for r in a.crossJoin(b)
        .where(F.col("src") < F.col("dst"))
        .select(
            "src",
            "dst",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    assert brute, "fixture must contain at least one near pair"


def test_simhash_hot_block_is_capped_and_connected(spark):
    """A boilerplate family of IDENTICAL simhashes (the non-random hot
    bucket the 2^-16 random-collision argument does not cover) must not go
    m^2: above bucket_cap the pair count is bounded ~cap*n/2, every emitted
    pair is exactly verified (hamming 0 here), and the family remains ONE
    connected component."""
    from name_deduplication_python_spark.operators.simhash import (
        simhash_hamming_pairs,
    )

    n, cap = 1000, 16
    sigs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(-4242424242424242).alias("simhash")
    )
    pairs = simhash_hamming_pairs(sigs, radius=3, bucket_cap=cap).collect()
    assert all(r.hamming == 0 for r in pairs)
    # salted chunking: <= n/cap chunks * C(cap,2) + chains, far below C(n,2)
    assert 0 < len(pairs) <= n * cap  # vs C(1000,2) = 499500 uncapped
    # connectivity: union-find over emitted pairs -> single component
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        parent[find(int(r.src))] = find(int(r.dst))
    assert len({find(i) for i in range(n)}) == 1
