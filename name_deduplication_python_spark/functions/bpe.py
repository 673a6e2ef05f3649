"""Loadable byte-pair-encoding tokenizer for token accounting.

The funnel's default token unit is the whitespace token (cheap, native,
oracle-replayable) — but a training run consumes TOKENIZER tokens, so
budgets/mixtures stated in whitespace tokens are off by the corpus'
subword fertility (~1.3-1.6x for English BPE vocabularies). This module
makes token budgets match what the trainer will actually see: a classic
merges-table-driven BPE (Sennrich et al. 2016, arXiv:1508.07909 — the
GPT-2/RoBERTa file format) applied over Arrow batches.

Pieces:
  * train_bpe_merges  — learn a merges table from fixture/corpus text
    (driver-side; deterministic: count ties break lexicographically)
  * save_merges / load_merges — the public one-merge-per-line format
    (``#version``-style comment headers tolerated), so a real
    tokenizer's merges.txt drops in unchanged
  * BpeEncoder        — pure-python encoder with an LRU word cache
    (web text repeats words heavily; the cache turns per-word merge
    scanning into a dict hit)
  * bpe_token_counts  — the Spark surface: mapInPandas over Arrow
    batches, one encoder per task, word-level split consistent with
    the engine's whitespace tokenization (each whitespace word encodes
    independently, end-of-word marker </w> per word)
  * token_counter     — factory producing the funnel hook
    (trainset.build_training_set(token_counter=...)); sampler ops take
    the precomputed count via their ``tokens_col`` parameter

Scale shape: the merges table (50k merges ~ 1 MB) ships in the task
closure (a full vocab is still far below broadcast thresholds); the
count pass is map-only over Arrow batches — no shuffle, no driver
collect; downstream budget/shard math is unchanged (it just reads the
precomputed column). BPE encoding is genuinely per-word Python — that
is what BPE IS — so the op is opt-in; the whitespace default stays the
zero-cost path and the oracle-hashed driver queries keep using it.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _word_symbols(word: str) -> tuple:
    """A word as its initial symbol sequence: chars, with the end-of-word
    marker fused onto the last char (the Sennrich formulation, so 'low'
    in 'low' and in 'lower' are distinguishable)."""
    if not word:
        return ()
    syms = list(word)
    syms[-1] = syms[-1] + _EOW
    return tuple(syms)


def train_bpe_merges(
    texts: Iterable[str], num_merges: int, lowercase: bool = False
) -> list:
    """Learn `num_merges` merges from `texts` (driver-side — meant for
    fixture-sized corpora and tests; production uses a real tokenizer's
    published merges file via load_merges). Deterministic: the most
    frequent pair wins, count ties broken by lexicographic pair order.

    Returns [(left, right), ...] in merge order (rank = index)."""
    vocab: dict = {}
    for t in texts:
        if t is None:
            continue
        if lowercase:
            t = t.lower()
        for w in t.split(" "):
            if not w:
                continue
            syms = _word_symbols(w)
            vocab[syms] = vocab.get(syms, 0) + 1

    merges: list = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def save_merges(merges: list, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list:
    """Parse a merges file (one 'left right' pair per line, rank = line
    order; '#...' comment/version headers skipped) — the format GPT-2 /
    RoBERTa / most HF tokenizers publish."""
    merges = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(f"malformed merges line: {line!r}")
            merges.append((parts[0], parts[1]))
    return merges


class BpeEncoder:
    """Greedy lowest-rank-first BPE application (the standard decode-time
    algorithm: repeatedly merge the pair with the smallest rank present
    in the word until none remains)."""

    def __init__(self, merges: list, lowercase: bool = False):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.lowercase = lowercase
        # per-instance cache (an lru_cache on a method would keep the
        # encoder alive globally; tasks are short-lived)
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_raw)

    def _encode_word_raw(self, word: str) -> tuple:
        syms = list(_word_symbols(word))
        if len(syms) < 2:
            return tuple(syms)
        ranks = self.ranks
        while True:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                return tuple(syms)
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            if len(syms) == 1:
                return tuple(syms)

    def encode(self, text: str) -> list:
        """Subword tokens of `text` (whitespace words encoded
        independently, matching the engine's tokenization)."""
        if text is None:
            return []
        if self.lowercase:
            text = text.lower()
        out = []
        for w in text.split(" "):
            if w:
                out.extend(self._encode_word(w))
        return out

    def count(self, text: str) -> int:
        if text is None:
            return 0
        if self.lowercase:
            text = text.lower()
        n = 0
        for w in text.split(" "):
            if w:
                n += len(self._encode_word(w))
        return n


def bpe_token_counts(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    lowercase: bool = False,
) -> DataFrame:
    """docs + an integer `out_col` holding the BPE token count of
    `text_col` under `merges`. mapInPandas over Arrow batches — map-only
    (fuses with the scan), one encoder + word cache per task."""
    from pyspark.sql import types as T

    fields = list(docs.schema.fields)
    if out_col in [f.name for f in fields]:
        raise ValueError(f"column {out_col!r} already exists")
    # fresh StructType — StructType.add MUTATES in place, and df.schema
    # is a cached object on the DataFrame
    out_schema = T.StructType(
        fields + [T.StructField(out_col, T.IntegerType())]
    )

    def count_batches(batches: Iterator) -> Iterator:
        enc = BpeEncoder(merges, lowercase=lowercase)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = (
                pdf[text_col]
                .map(lambda t: enc.count(t) if isinstance(t, str) else 0)
                .astype("int32")
            )
            yield pdf

    return docs.mapInPandas(count_batches, schema=out_schema)


def token_counter(merges: list, lowercase: bool = False):
    """Funnel hook factory: returns f(docs, text_col, out_col) -> docs
    with `out_col` counted by BPE — the shape
    trainset.build_training_set(token_counter=...) expects."""

    def _counter(docs: DataFrame, text_col: str, out_col: str) -> DataFrame:
        return bpe_token_counts(
            docs, merges, text_col=text_col, out_col=out_col,
            lowercase=lowercase,
        )

    return _counter


def whitespace_token_counter():
    """The default token accounting as an explicit counter (native
    expression, no Python) — lets callers treat the two interchangeably."""

    def _counter(docs: DataFrame, text_col: str, out_col: str) -> DataFrame:
        return docs.withColumn(
            out_col,
            F.size(F.split(F.trim(F.col(text_col)), " ")).cast("int"),
        )

    return _counter
