"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Stands in for the reference's shipped fixtures
(/root/reference/Data/testdata_file.csv — 255 rows with seeded near-dup
name pairs): a seeded web_pages table with planted

  (a) exact-duplicate pairs        (identical text, different url/warc_ts)
  (b) near-duplicate families      at token-substitution rates targeting
                                   shingle-Jaccard ~0.95 / 0.90 / 0.80 / 0.50
  (c) long shared substrings       (>=256 chars) across distinct pages
  (d) boilerplate headers/footers  shared by many pages (hot LSH buckets)
  (e) unicode-edge pages           (accents, CJK, entities) for byte tests

All randomness from numpy.random.Generator(PCG64(seed)) — same seed, same
corpus, any machine. No external data.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..functions.text_extract import wrap_html

_LANGS = ["en", "es", "de", "fr", "tl", "zh"]

_UNICODE_SNIPPETS = [
    "café naïve façade — übergroß straße",
    "日本語のテキスト 中文文本 한국어",
    "emoji \U0001f600 \U0001f680 test & <tag> \"quoted\" 'single'",
    "ñandú piñata jalapeño",
]


def _make_vocab(rng: np.random.Generator, n: int = 2000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 10, size=n)
    words = ["".join(rng.choice(letters, size=ln)) for ln in lens]
    return np.array(sorted(set(words)))


def _base_text(rng: np.random.Generator, vocab: np.ndarray, n_tokens: int) -> str:
    # zipf-ish: mix of head-heavy and uniform draws
    head = vocab[: max(50, len(vocab) // 20)]
    k_head = n_tokens // 2
    toks = np.concatenate(
        [rng.choice(head, size=k_head), rng.choice(vocab, size=n_tokens - k_head)]
    )
    rng.shuffle(toks)
    return " ".join(toks)


def _substitute(
    rng: np.random.Generator, text: str, vocab: np.ndarray, frac: float
) -> str:
    toks = text.split(" ")
    n_sub = max(1, int(len(toks) * frac))
    idx = rng.choice(len(toks), size=n_sub, replace=False)
    repl = rng.choice(vocab, size=n_sub)
    for i, r in zip(idx, repl):
        toks[i] = str(r)
    return " ".join(toks)


def generate_corpus(
    n_base: int = 200,
    seed: int = 42,
    with_html: bool = True,
    null_text_frac: float = 0.5,
    min_tokens: int = 80,
    max_tokens: int = 400,
    url_offset: int = 0,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (pages, truth_pairs).

    pages: url, warc_ts, html(bytes|None), text(str|None), lang — html is
      always present when with_html; text is nulled for ~null_text_frac of
      rows (the engine must extract it and match byte-exactly).
    truth_pairs: src, dst, kind in {exact, near95, near90, near80, near50,
      substring, boilerplate} — seeded ground truth (recall is additionally
      measured against a brute-force Jaccard oracle over the actual texts).
    """
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    boiler_header = "site navigation home about contact " + _base_text(rng, vocab, 30)
    boiler_footer = "copyright all rights reserved " + _base_text(rng, vocab, 20)
    shared_block = _base_text(rng, vocab, 60)  # >= 256 chars of shared substring

    rows: list[dict] = []
    pairs: list[tuple[str, str, str]] = []
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def url_of(i: int) -> str:
        return f"https://example.org/doc/{i:09d}"

    next_id = url_offset

    def add(text: str, lang: str) -> str:
        nonlocal next_id
        u = url_of(next_id)
        rows.append(
            {
                "url": u,
                "warc_ts": t0 + dt.timedelta(seconds=int(rng.integers(0, 10_000_000))),
                "text": text,
                "lang": lang,
            }
        )
        next_id += 1
        return u

    # token-substitution fractions tuned for 5-shingle Jaccard: one sub
    # kills ~k shingles, so J ~= (1-5f)/(1+5f) -> f = (1-J)/(5(1+J))
    near_levels = [("near95", 0.005), ("near90", 0.0105), ("near80", 0.022), ("near50", 0.067)]
    for b in range(n_base):
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        n_tokens = int(rng.integers(min_tokens, max_tokens))
        text = _base_text(rng, vocab, n_tokens)
        if b % 17 == 0:  # (e) unicode edges
            text = _UNICODE_SNIPPETS[b // 17 % len(_UNICODE_SNIPPETS)] + " " + text
        if b % 11 == 0:  # (d) boilerplate-heavy: hot LSH buckets
            text = boiler_header + " " + text + " " + boiler_footer
        if b % 23 == 0:  # (c) long shared substring in otherwise-distinct pages
            toks = text.split(" ")
            cut = len(toks) // 2
            text = " ".join(toks[:cut]) + " " + shared_block + " " + " ".join(toks[cut:])
        base_url = add(text, lang)

        r = b % 10
        if r == 0:  # (a) exact duplicate
            pairs.append((base_url, add(text, lang), "exact"))
        elif r in (1, 2, 3, 4):  # (b) near-dup family
            kind, frac = near_levels[r - 1]
            pairs.append((base_url, add(_substitute(rng, text, vocab, frac), lang), kind))
        elif r == 5:  # near-dup chain of 3 (tests transitive clustering)
            v1 = add(_substitute(rng, text, vocab, 0.005), lang)
            v2 = add(_substitute(rng, text, vocab, 0.0105), lang)
            pairs.append((base_url, v1, "near95"))
            pairs.append((base_url, v2, "near90"))
        # r in 6..9: unique page, no planted dup

    pages = pd.DataFrame(rows)
    if with_html:
        pages["html"] = [
            wrap_html(t, title=f"page {i}", lang=lg)
            for i, (t, lg) in enumerate(zip(pages["text"], pages["lang"]))
        ]
        # null out text for ~half the rows: the engine must extract it
        null_mask = rng.random(len(pages)) < null_text_frac
        pages.loc[null_mask, "text"] = None
    else:
        pages["html"] = None
    pages = pages[["url", "warc_ts", "html", "text", "lang"]]
    truth = pd.DataFrame(pairs, columns=["src", "dst", "kind"])
    return pages, truth


def corpus_to_spark(spark, pages: pd.DataFrame):
    from ..schemas import WEB_PAGES

    return spark.createDataFrame(pages, schema=WEB_PAGES)


def corpus_truth_pairs(
    n_base: int,
    seed: int = 42,
    chunk_base: int = 25000,
    min_tokens: int = 80,
    max_tokens: int = 400,
    processes: int | None = None,
) -> pd.DataFrame:
    """Regenerate ONLY the planted truth pairs of a build_corpus_parquet
    corpus (same chunk seeds/offsets), without materializing html or
    pages — the rng draws that decide pair structure all happen before
    the html pass, so with_html=False reproduces identical pairs. Chunks
    run in a process pool (truth backfill for a 2.7M-page corpus is a
    one-time cache fill)."""
    import multiprocessing as mp

    n_chunks = (n_base + chunk_base - 1) // chunk_base
    args = [
        (min(chunk_base, n_base - i * chunk_base), seed + i,
         i * chunk_base * 2, min_tokens, max_tokens)
        for i in range(n_chunks)
    ]
    if n_chunks == 1:
        return _truth_chunk(args[0])
    with mp.Pool(processes or min(16, n_chunks)) as pool:
        parts = pool.map(_truth_chunk, args)
    return pd.concat(parts, ignore_index=True)


def _truth_chunk(a) -> pd.DataFrame:
    nb, seed, off, lo, hi = a
    _, truth = generate_corpus(
        n_base=nb, seed=seed, url_offset=off, with_html=False,
        min_tokens=lo, max_tokens=hi,
    )
    return truth


def build_corpus_parquet(
    spark,
    path: str,
    n_base: int,
    seed: int = 42,
    chunk_base: int = 25000,
    min_tokens: int = 80,
    max_tokens: int = 400,
    partitions_per_chunk: int = 8,
) -> int:
    """Write a large corpus to parquet in deterministic chunks (bounded
    driver memory): chunk i uses seed+i and a disjoint url range. Returns
    total pages written."""
    import os

    from ..schemas import WEB_PAGES

    total = 0
    mode = "overwrite"
    n_chunks = (n_base + chunk_base - 1) // chunk_base
    for i in range(n_chunks):
        nb = min(chunk_base, n_base - i * chunk_base)
        pages, _ = generate_corpus(
            n_base=nb,
            seed=seed + i,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            url_offset=i * chunk_base * 2,  # disjoint url ranges (<2x fanout)
        )
        spark.createDataFrame(pages, schema=WEB_PAGES).repartition(
            partitions_per_chunk
        ).write.mode(mode).parquet(path)
        mode = "append"
        total += len(pages)
    # atomicity marker for cache checks
    open(os.path.join(path, "_BUILD_DONE"), "w").write(str(total))
    return total
