"""Structured-streaming incremental dedup tests."""

from __future__ import annotations

import os


from name_deduplication_python_spark.sources.corpus import (
    corpus_to_spark,
    generate_corpus,
)
from name_deduplication_python_spark.streaming.incremental import (
    IncrementalDedup,
    windowed_event_counts,
)


def test_incremental_batches_find_cross_batch_dups(spark, tmp_path):
    pages, truth = generate_corpus(n_base=80, seed=21)
    df = corpus_to_spark(spark, pages).cache()
    # even/odd split: planted pairs have consecutive ids, so every exact
    # pair lands across the two batches
    urls_sorted = sorted(pages["url"])
    evens = set(urls_sorted[::2])
    first = df.where(df.url.isin(list(evens)))
    second = df.where(~df.url.isin(list(evens)))

    inc = IncrementalDedup(spark, str(tmp_path / "store"))
    inc.process_batch(first, 0)
    inc.process_batch(second, 1)

    got = {(r["src"], r["dst"]) for r in inc.edges().select("src", "dst").collect()}
    got |= {(b, a) for a, b in got}
    exact = truth[truth.kind == "exact"]
    cross = [
        (a, b) for a, b in zip(exact.src, exact.dst) if (a in evens) != (b in evens)
    ]
    assert cross, "fixture must split at least one exact pair across batches"
    for a, b in cross:
        assert (a, b) in got, f"cross-batch exact dup {a},{b} missed"


def test_band_key_store_is_append_only(spark, tmp_path):
    """Per-epoch work must not grow with history: band keys are persisted
    per epoch and PRIOR epochs are never recomputed or rewritten (round-1
    re-keyed the entire signature store every micro-batch). Evidence:
    each epoch dir holds exactly that batch's keys, and epoch-0 files are
    byte-stable (same mtimes) after two more epochs."""
    from name_deduplication_python_spark import DEFAULT_CONFIG

    pages, _ = generate_corpus(n_base=60, seed=31)
    df = corpus_to_spark(spark, pages).cache()
    urls = sorted(pages["url"])
    thirds = [set(urls[i::3]) for i in range(3)]
    store = str(tmp_path / "store")
    inc = IncrementalDedup(spark, store)

    inc.process_batch(df.where(df.url.isin(list(thirds[0]))), 0)
    bk0 = os.path.join(store, "band_keys", "epoch=0")
    mtimes0 = {f: os.path.getmtime(os.path.join(bk0, f)) for f in os.listdir(bk0)}

    inc.process_batch(df.where(df.url.isin(list(thirds[1]))), 1)
    inc.process_batch(df.where(df.url.isin(list(thirds[2]))), 2)

    # epoch-0 key files untouched by later epochs
    assert mtimes0 == {
        f: os.path.getmtime(os.path.join(bk0, f)) for f in os.listdir(bk0)
    }
    # each epoch dir holds exactly its batch's keys: nonempty docs x bands
    for e in range(3):
        keys = spark.read.parquet(os.path.join(store, "band_keys", f"epoch={e}"))
        sigs = spark.read.parquet(os.path.join(store, "signatures", f"epoch={e}"))
        n_nonempty = sigs.where("n_shingles > 0").count()
        assert keys.count() == n_nonempty * DEFAULT_CONFIG["bands"], e


def test_incremental_equals_full_batch_edges(spark, tmp_path):
    """Union of per-epoch edge sets == the single-batch pipeline's edges
    on the same corpus (incremental correctness, order-insensitive)."""
    from name_deduplication_python_spark import DEFAULT_CONFIG as C
    from name_deduplication_python_spark.operators.extract import extract_stage
    from name_deduplication_python_spark.operators.lsh import band_keys, candidate_pairs
    from name_deduplication_python_spark.operators.signatures import signature_stage
    from name_deduplication_python_spark.operators.verify import verify_stage

    pages, _ = generate_corpus(n_base=50, seed=33)
    df = corpus_to_spark(spark, pages).cache()
    urls = sorted(pages["url"])
    half = set(urls[: len(urls) // 2])
    inc = IncrementalDedup(spark, str(tmp_path / "store"))
    inc.process_batch(df.where(df.url.isin(list(half))), 0)
    inc.process_batch(df.where(~df.url.isin(list(half))), 1)
    got = {
        tuple(sorted((r.src, r.dst)))
        for r in inc.edges().select("src", "dst").collect()
    }

    sigs = signature_stage(
        extract_stage(df), num_hashes=C["num_hashes"], shingle_k=C["shingle_k"],
        seed=C["seed"],
    )
    keys = band_keys(sigs, bands=C["bands"], rows_per_band=C["rows_per_band"])
    pairs, _ = candidate_pairs(keys, bucket_cap=C["bucket_cap"])
    edges = verify_stage(
        pairs, sigs, num_hashes=C["num_hashes"],
        jaccard_threshold=C["jaccard_threshold"],
        simhash_radius=C["simhash_radius"],
    )
    want = {
        tuple(sorted((r.src, r.dst)))
        for r in edges.select("src", "dst").collect()
    }
    assert got == want


def test_epoch_replay_is_idempotent(spark, tmp_path):
    pages, _ = generate_corpus(n_base=30, seed=22)
    df = corpus_to_spark(spark, pages)
    inc = IncrementalDedup(spark, str(tmp_path / "store"))
    inc.process_batch(df, 0)
    n1 = inc.edges().count()
    inc.process_batch(df, 0)  # replay same epoch (restart semantics)
    assert inc.edges().count() == n1


def test_crash_replay_after_partial_epoch_write_is_exact(spark, tmp_path):
    """Crash window: band_keys/epoch=N written, signatures/epoch=N not
    (the idempotence marker). The replay must read ONLY epoch < N store
    state — an unfiltered read would cross-join the batch against its own
    keys, emitting self-edges (src==dst) and duplicate intra-batch pairs."""
    import shutil

    pages, _ = generate_corpus(n_base=40, seed=27)
    df = corpus_to_spark(spark, pages).cache()
    urls = sorted(pages["url"])
    half = set(urls[: len(urls) // 2])
    store = str(tmp_path / "store")
    inc = IncrementalDedup(spark, store)
    inc.process_batch(df.where(df.url.isin(list(half))), 0)
    inc.process_batch(df.where(~df.url.isin(list(half))), 1)
    clean = {
        (r.src, r.dst, r.status)
        for r in inc.edges().select("src", "dst", "status").collect()
    }
    assert all(s != d for s, d, _ in clean)

    # simulate the crash: epoch-1 signatures (marker) gone, band keys left
    shutil.rmtree(os.path.join(store, "signatures", "epoch=1"))
    inc.process_batch(df.where(~df.url.isin(list(half))), 1)  # replay
    replayed = {
        (r.src, r.dst, r.status)
        for r in inc.edges().select("src", "dst", "status").collect()
    }
    assert replayed == clean  # no self-edges, no duplicates, same edges


def test_store_verify_join_is_pruned_to_touched_docs(spark, tmp_path):
    """Per-epoch verify cost must be O(batch + touched docs), not
    O(corpus): the signature store feeds the verify join only for ids
    that appear in this epoch's candidate pairs (semi-join prune)."""
    from pyspark.sql import functions as F

    pages, _ = generate_corpus(n_base=60, seed=29)
    df = corpus_to_spark(spark, pages).cache()
    urls = sorted(pages["url"])
    half = set(urls[: len(urls) // 2])
    store = str(tmp_path / "store")
    inc = IncrementalDedup(spark, store)
    inc.process_batch(df.where(df.url.isin(list(half))), 0)

    old_sigs = spark.read.parquet(os.path.join(store, "signatures"))
    n_store = old_sigs.count()
    # a synthetic pair set touching exactly 2 store docs
    touched = urls[0], urls[2]
    pairs = spark.createDataFrame(
        [("new-doc-a", touched[0]), ("new-doc-b", touched[1])], ["src", "dst"]
    )
    pruned = IncrementalDedup._pruned_store_sigs(old_sigs, pairs)
    assert pruned.count() == 2 < n_store
    got = {r.url for r in pruned.select("url").collect()}
    assert got == set(touched)
    # and the pruned frame carries full signature payloads
    assert {"url", "minhash", "simhash"} <= set(pruned.columns)
    # empty pairs -> zero store rows shuffle
    empty = spark.createDataFrame([], "src string, dst string")
    assert IncrementalDedup._pruned_store_sigs(old_sigs, empty).count() == 0
    _ = F  # keep import local to the test's intent


def test_streaming_end_to_end_available_now(spark, tmp_path):
    pages, _ = generate_corpus(n_base=40, seed=23)
    src = str(tmp_path / "src")
    corpus_to_spark(spark, pages).repartition(4).write.parquet(src)
    inc = IncrementalDedup(spark, str(tmp_path / "store"))
    q = inc.start(src, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert inc.edges().count() > 0
    sigs = spark.read.parquet(os.path.join(str(tmp_path / "store"), "signatures"))
    assert sigs.count() == len(pages) - spark.read.parquet(src).where(
        "text is null and html is null"
    ).count()


def test_windowed_event_counts_streaming_plan(spark, tmp_path):
    # batch parity: streaming plan over the same data yields the batch agg
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = windowed_event_counts(ev).toPandas()
    assert (batch["n_events"] > 0).all()

    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = windowed_event_counts(stream, watermark="10 minutes")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from wincounts").toPandas()
    # append mode emits only watermark-closed windows; all must match batch
    merged = got.merge(
        batch, on=["window_start", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_store_key_join_is_pruned_to_touched_buckets(spark, tmp_path):
    """Key-side O(touched) contract (the round-3 gap: the verify PAYLOAD
    join was pruned but the KEY join still shuffled the entire store per
    epoch): the store read must (1) partition-prune to the batch's
    bp = pmod(bh, N) set at file-listing time, (2) semi-join-filter rows
    inside the scan via a broadcast of the batch's bh set — never
    shuffling the store."""
    from pyspark.sql import functions as F

    pages, _ = generate_corpus(n_base=60, seed=37)
    df = corpus_to_spark(spark, pages).cache()
    store = str(tmp_path / "store")
    inc = IncrementalDedup(spark, store)
    inc.process_batch(df, 0)

    old_keys = spark.read.parquet(os.path.join(store, "band_keys"))
    n_store = old_keys.count()
    # a synthetic batch whose keys hit exactly 3 store buckets
    some_bh = [r.bh for r in old_keys.select("bh").distinct().limit(3).collect()]
    new_keys = spark.createDataFrame(
        [(f"new-{i}", bh) for i, bh in enumerate(some_bh)], ["url", "bh"]
    )
    pruned = inc._pruned_store_keys(old_keys, new_keys)
    got = pruned.collect()
    assert {r.bh for r in got} == set(some_bh)
    want = old_keys.where(F.col("bh").isin(some_bh)).count()
    assert len(got) == want < n_store
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition pruning reached the file listing
    assert "PartitionFilters" in plan and "bp#" in plan.split("PartitionFilters", 1)[1][:200]
    # the store side is filtered in-scan via a broadcast semi join — the
    # ONLY hash exchange allowed is the batch-side distinct feeding the
    # BroadcastExchange (O(batch)); the store subtree must reach the join
    # shuffle-free
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    bx = plan.index("BroadcastExchange")
    assert all(
        i > bx
        for i in range(len(plan))
        if plan.startswith("Exchange hashpartitioning", i)
    ), plan


def test_legacy_flat_band_key_store_keeps_working(spark, tmp_path):
    """A store whose band-key epochs were written FLAT by pre-bp code must
    keep working after upgrade: the reader skips partition pruning (row-
    level semi-join pruning only) and new epochs stay flat — mixing flat
    and bp-partitioned epoch dirs would break partition discovery."""
    import shutil

    pages, truth = generate_corpus(n_base=60, seed=21)
    df = corpus_to_spark(spark, pages).cache()
    urls_sorted = sorted(pages["url"])
    evens = set(urls_sorted[::2])
    first = df.where(df.url.isin(list(evens)))
    second = df.where(~df.url.isin(list(evens)))
    store = str(tmp_path / "store")

    inc = IncrementalDedup(spark, store)
    inc.process_batch(first, 0)
    # rewrite epoch 0 into the legacy flat layout
    bk0 = os.path.join(store, "band_keys", "epoch=0")
    pdf = spark.read.parquet(bk0).select("url", "bh").toPandas()
    shutil.rmtree(bk0)
    spark.createDataFrame(pdf).write.parquet(bk0)

    inc2 = IncrementalDedup(spark, store)
    assert inc2._bp_layout is False
    inc2.process_batch(second, 1)
    # cross-batch exact dups still found through the legacy store
    got = {(r["src"], r["dst"]) for r in inc2.edges().select("src", "dst").collect()}
    got |= {(b, a) for a, b in got}
    exact = truth[truth.kind == "exact"]
    cross = [
        (a, b) for a, b in zip(exact.src, exact.dst) if (a in evens) != (b in evens)
    ]
    assert cross
    for a, b in cross:
        assert (a, b) in got, (a, b)
    # the new epoch stayed flat (no bp= subdirs)
    bk1 = os.path.join(store, "band_keys", "epoch=1")
    assert not any(n.startswith("bp=") for n in os.listdir(bk1))


def _pages(spark, rows):
    """rows: [(url, text)] -> web_pages DataFrame (pre-extracted text)."""
    from name_deduplication_python_spark.schemas import WEB_PAGES

    return spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows], schema=WEB_PAGES
    )


def test_recrawl_latest_epoch_wins(spark, tmp_path):
    """VERDICT r4 #4 (re-crawl semantics): the same url crawled in two
    epochs with CHANGED text must behave as ONE document at its latest
    version — stale-version signatures/band-keys never pair, current-only
    edge reads drop edges that scored superseded text, and epoch replay
    stays exact."""
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]

    def doc(seed_off, mutate=0):
        r = np.random.default_rng(100 + seed_off)
        toks = list(r.choice(vocab, size=220))
        for i in range(mutate):
            toks[7 * i] = f"m{seed_off}_{i}"
        return " ".join(toks)

    X, Xp = doc(1), doc(1, mutate=2)   # near-identical pair
    Y, Yp = doc(2), doc(2, mutate=2)   # unrelated to X, near-identical pair
    store = str(tmp_path / "store")
    inc = IncrementalDedup(spark, store)

    # epoch 0: u1=X pairs with u2=X'
    inc.process_batch(_pages(spark, [("u1", X), ("u2", Xp)]), 0)
    e0 = {(r.src, r.dst) for r in inc.edges(current_only=False).collect()}
    assert {tuple(sorted(p)) for p in e0} == {("u1", "u2")}

    # epoch 1: u1 RE-CRAWLED with text Y; u3=Y' arrives -> (u1,u3) pairs
    inc.process_batch(_pages(spark, [("u1", Y), ("u3", Yp)]), 1)

    raw = {tuple(sorted((r.src, r.dst))) for r in inc.edges(current_only=False).collect()}
    assert ("u1", "u2") in raw and ("u1", "u3") in raw  # append-only log keeps both
    cur = {tuple(sorted((r.src, r.dst))) for r in inc.edges().collect()}
    assert ("u1", "u3") in cur
    assert ("u1", "u2") not in cur, "stale edge (u1 was re-crawled) must drop"

    # epoch 2: u4 ~ X must pair with u2 (current) but NOT with u1, whose
    # X-era band keys are stale (current u1 text is Y)
    inc.process_batch(_pages(spark, [("u4", doc(1, mutate=3))]), 2)
    cur2 = {tuple(sorted((r.src, r.dst))) for r in inc.edges().collect()}
    assert ("u2", "u4") in cur2
    assert ("u1", "u4") not in cur2, "stale-version band keys paired a re-crawled url"

    # replay: re-running a committed epoch is a no-op (idempotence marker)
    before = sorted(
        {(r.src, r.dst, r.epoch) for r in inc.edges(current_only=False).collect()}
    )
    inc.process_batch(_pages(spark, [("u4", doc(1, mutate=3))]), 2)
    after = sorted(
        {(r.src, r.dst, r.epoch) for r in inc.edges(current_only=False).collect()}
    )
    assert before == after


def test_compact_store_drops_stale_versions_preserving_semantics(spark, tmp_path):
    """compact_store physically drops superseded version rows (re-crawled
    urls' older epochs) while preserving every read/replay contract:
    current-only edges identical before/after, committed-epoch markers
    survive (replay stays a no-op), and a subsequent epoch on the
    compacted store produces exactly the edges an uncompacted control
    store produces."""
    import numpy as np

    vocab = [f"w{i}" for i in range(500)]

    def doc(seed_off, mutate=0):
        r = np.random.default_rng(100 + seed_off)
        toks = list(r.choice(vocab, size=220))
        for i in range(mutate):
            toks[7 * i] = f"m{seed_off}_{i}"
        return " ".join(toks)

    batches = [
        (0, [("u1", doc(1)), ("u2", doc(1, mutate=2))]),     # u1 ~ u2
        (1, [("u1", doc(2)), ("u3", doc(2, mutate=2))]),     # u1 RE-CRAWLED -> ~ u3
    ]
    stores = {}
    for name in ("a", "b"):
        inc = IncrementalDedup(spark, str(tmp_path / name))
        for epoch, rows in batches:
            inc.process_batch(_pages(spark, rows), epoch)
        stores[name] = inc
    inc, control = stores["a"], stores["b"]

    before_edges = {
        tuple(sorted((r.src, r.dst))) for r in inc.edges().collect()
    }
    stats = inc.compact_store()
    # u1's epoch-0 version rows are gone: 4 sig rows -> 3
    assert stats["signatures_rows_before"] == 4
    assert stats["signatures_rows_after"] == 3
    assert stats["band_keys_rows_after"] < stats["band_keys_rows_before"]
    # markers intact for every committed epoch
    for e in (0, 1):
        assert os.path.exists(
            os.path.join(inc.store, "signatures", f"epoch={e}", "_SUCCESS")
        )
    # read contracts unchanged
    after_edges = {
        tuple(sorted((r.src, r.dst))) for r in inc.edges().collect()
    }
    assert after_edges == before_edges
    # replay of a committed epoch is still a no-op
    raw_before = sorted(
        (r.src, r.dst, r.epoch) for r in inc.edges(current_only=False).collect()
    )
    inc.process_batch(_pages(spark, batches[1][1]), 1)
    raw_after = sorted(
        (r.src, r.dst, r.epoch) for r in inc.edges(current_only=False).collect()
    )
    assert raw_before == raw_after
    # a new epoch behaves identically on compacted vs uncompacted stores
    new_batch = [("u4", doc(2, mutate=3))]  # ~ current u1 text and u3
    inc.process_batch(_pages(spark, new_batch), 2)
    control.process_batch(_pages(spark, new_batch), 2)
    got = {tuple(sorted((r.src, r.dst))) for r in inc.edges().collect()}
    want = {tuple(sorted((r.src, r.dst))) for r in control.edges().collect()}
    assert got == want
    assert ("u1", "u4") in got and ("u3", "u4") in got


def test_compact_store_crash_mid_swap_recovers_not_cold(spark, tmp_path):
    """A crash between compact_store's two renames must NOT read as a cold
    store on restart (the round-4 verdict failure mode: __init__ recreated
    an empty band_keys/, _read_store returned None, and every later epoch
    silently skipped all cross pairs). Recovery must roll the completed
    rewrite forward and preserve edge semantics; a stray __compact with no
    swap in flight is discarded."""
    import shutil

    import numpy as np

    vocab = [f"w{i}" for i in range(500)]

    def doc(seed_off, mutate=0):
        r = np.random.default_rng(300 + seed_off)
        toks = list(r.choice(vocab, size=220))
        for i in range(mutate):
            toks[7 * i] = f"m{seed_off}_{i}"
        return " ".join(toks)

    store = str(tmp_path / "s")
    inc = IncrementalDedup(spark, store)
    inc.process_batch(_pages(spark, [("u1", doc(1)), ("u2", doc(1, mutate=2))]), 0)

    # Simulate each crash state by re-creating it from a healthy store.
    # State A: crashed between rename(root -> __old) and rename(__compact
    # -> root): root missing, original parked at __old, complete rewrite
    # at __compact (per protocol the markers are inside tmp pre-swap).
    for sub in ("signatures", "band_keys"):
        root = os.path.join(store, sub)
        shutil.copytree(root, root + "__compact")
        os.rename(root, root + "__old")

    inc2 = IncrementalDedup(spark, store)  # restart triggers recovery
    for sub in ("signatures", "band_keys"):
        root = os.path.join(store, sub)
        assert os.path.isdir(root)
        assert not os.path.isdir(root + "__old")
        assert not os.path.isdir(root + "__compact")
    assert inc2._read_store("band_keys") is not None  # NOT cold
    # cross-epoch pairing against the recovered store still works
    inc2.process_batch(_pages(spark, [("u3", doc(1, mutate=3))]), 1)
    edges = {tuple(sorted((r.src, r.dst))) for r in inc2.edges().collect()}
    assert ("u1", "u3") in edges and ("u2", "u3") in edges

    # State B: crashed after the rewrite but before any rename: root
    # intact, stray __compact only -> discarded, store untouched.
    sig_root = os.path.join(store, "signatures")
    shutil.copytree(sig_root, sig_root + "__compact")
    inc3 = IncrementalDedup(spark, store)
    assert not os.path.isdir(sig_root + "__compact")
    assert inc3._read_store("signatures") is not None

    # State C: crashed during rmtree(__old): live root is the rewrite,
    # part-deleted __old is garbage -> dropped.
    os.makedirs(os.path.join(sig_root + "__old", "epoch=0"))
    inc4 = IncrementalDedup(spark, store)
    assert not os.path.isdir(sig_root + "__old")
    assert inc4._read_store("signatures") is not None


def test_bloom_prefilter_identical_edges_and_epoch_tables(spark, tmp_path):
    """cfg['bloom_prefilter'] must be a pure pruning knob: same corpus,
    same split, same edges with it on or off (maybe_seen=false is exact,
    so no candidate the unfiltered path finds can be dropped)."""
    pages, _ = generate_corpus(n_base=80, seed=21)
    df = corpus_to_spark(spark, pages).cache()
    urls_sorted = sorted(pages["url"])
    evens = set(urls_sorted[::2])
    first = df.where(df.url.isin(list(evens)))
    second = df.where(~df.url.isin(list(evens)))

    def run(store, cfg):
        inc = IncrementalDedup(spark, store, cfg)
        inc.process_batch(first, 0)
        inc.process_batch(second, 1)
        return {
            (r["src"], r["dst"])
            for r in inc.edges().select("src", "dst").collect()
        }

    base = run(str(tmp_path / "off"), None)
    bloomed = run(str(tmp_path / "on"), {"bloom_prefilter": True})
    assert bloomed == base and base
    # per-epoch word tables exist and are tiny (<= bloom_bits/64 rows)
    for e in (0, 1):
        p = os.path.join(str(tmp_path / "on"), "bloom", f"epoch={e}")
        assert os.path.isdir(p)
    words = spark.read.parquet(os.path.join(str(tmp_path / "on"), "bloom"))
    from name_deduplication_python_spark import DEFAULT_CONFIG

    assert words.count() <= 2 * DEFAULT_CONFIG["bloom_bits"] // 64


def test_bloom_prefilter_declines_without_full_coverage(spark, tmp_path):
    """Enabling the knob on a store whose earlier epochs predate it must
    NOT drop candidates: coverage check declines the prefilter (returns
    None) until every band-key epoch has a Bloom table."""
    pages, _ = generate_corpus(n_base=60, seed=23)
    df = corpus_to_spark(spark, pages).cache()
    urls_sorted = sorted(pages["url"])
    evens = set(urls_sorted[::2])
    store = str(tmp_path / "store")

    inc_off = IncrementalDedup(spark, store)  # epoch 0 without bloom
    inc_off.process_batch(df.where(df.url.isin(list(evens))), 0)

    inc_on = IncrementalDedup(spark, store, {"bloom_prefilter": True})
    from name_deduplication_python_spark.operators.lsh import band_keys
    from name_deduplication_python_spark.operators.signatures import (
        signature_stage,
    )
    from name_deduplication_python_spark.operators.extract import extract_stage

    cfg = inc_on.cfg
    second = df.where(~df.url.isin(list(evens)))
    nk = band_keys(
        signature_stage(
            extract_stage(second),
            num_hashes=cfg["num_hashes"],
            shingle_k=cfg["shingle_k"],
            seed=cfg["seed"],
        ),
        bands=cfg["bands"],
        rows_per_band=cfg["rows_per_band"],
    )
    assert inc_on._bloom_filter_batch_bh(nk, 1) is None
    # the batch still processes correctly through the unfiltered path
    inc_on.process_batch(second, 1)
    assert inc_on.edges().count() > 0


def test_bloom_prefilter_novel_batch_prunes_store_read(spark, tmp_path):
    """A batch sharing no band hash with the store must reduce to a
    (near-)empty maybe-seen bh set — the definitely-new fast path that
    skips store partitions entirely at crawl scale."""
    pages, _ = generate_corpus(n_base=60, seed=29)
    df = corpus_to_spark(spark, pages).cache()
    store = str(tmp_path / "store")
    inc = IncrementalDedup(spark, store, {"bloom_prefilter": True})
    inc.process_batch(df, 0)

    # synthetic keys guaranteed absent from the store's bh space
    novel = spark.createDataFrame(
        [(f"novel-{i}", -(10**17) - i) for i in range(400)], ["url", "bh"]
    )
    kept = inc._bloom_filter_batch_bh(novel, 1)
    assert kept is not None
    n_kept = kept.count()
    # theoretical fpr at n_store~60*25 keys, m=2^20, k=4 is ~1e-11;
    # anything beyond a couple of rows means the filter is broken
    assert n_kept <= 2, n_kept


def test_bloom_backfill_activates_and_param_drift_raises(spark, tmp_path):
    """backfill_bloom() closes the coverage gap for epochs predating the
    knob (review finding: one uncovered epoch kept the gate declining
    forever); persisted _meta.json params win over a drifted live cfg
    (probing with changed n_bits/k would silently false-negative)."""
    import pytest as _pytest

    pages, _ = generate_corpus(n_base=60, seed=23)
    df = corpus_to_spark(spark, pages).cache()
    store = str(tmp_path / "store")
    IncrementalDedup(spark, store).process_batch(df, 0)  # knob off

    inc_on = IncrementalDedup(spark, store, {"bloom_prefilter": True})
    nk = spark.read.parquet(os.path.join(store, "band_keys")).select(
        "url", "bh"
    )
    assert inc_on._bloom_filter_batch_bh(nk, 1) is None  # uncovered
    assert inc_on.backfill_bloom() == 1
    kept = inc_on._bloom_filter_batch_bh(nk, 1)
    assert kept is not None
    # the store's own keys must all be maybe-seen (no false negatives)
    assert kept.count() == nk.select("bh").distinct().count()
    # a partial (crashed, markerless) bloom epoch must not count
    import shutil

    part = os.path.join(store, "bloom", "epoch=9")
    os.makedirs(part)
    assert "epoch=9" not in inc_on._bloom_epochs_done()
    shutil.rmtree(part)
    # explicit conflicting params raise instead of corrupting results
    drift = IncrementalDedup(
        spark, store, {"bloom_prefilter": True, "bloom_bits": 1 << 21}
    )
    with _pytest.raises(ValueError, match="re-key"):
        drift._bloom_params()
