"""Nickname generation (SURVEY §2.8 N1-N6): formal name -> candidate
nicknames, as a native-ish column pipeline producing array<string> that
explodes into the J4 side table.

Rule families mirror the reference's generator semantics
(/root/reference/nickname_generator.py:167-370) re-expressed as data +
vectorized expressions (no copied tables — a compact curated set):
  N1 prefix nicknames (3-letter, 2-letter for a closed set)
  N2 conservative suffix/core parts (bert/berto/lito/lyn...)
  N3 curated lookup table (well-known formal->nicks)
  N4 phonetic variants (ch->k, th->t, ph->p, jh->j)
  N5 full pipeline: Ma.->Maria, multi-word = whole tokens, single-word =
     prefix+parts+phonetic, filter (>=2 alpha chars, != base)
  N6 overrides side-input (highest priority)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# N3: compact curated formal -> nicknames table
CURATED = {
    "jose": ["joey", "pepe", "joe"],
    "josefa": ["sefa", "pepa"],
    "maria": ["mary", "ria"],
    "antonio": ["tony", "anton", "tonio"],
    "roberto": ["bert", "berto", "bob"],
    "elizabeth": ["beth", "liza", "eliza"],
    "teresa": ["tess", "tessie"],
    "francisco": ["kiko", "frank", "paco"],
    "eduardo": ["ed", "eddie", "dodong"],
    "miguel": ["mike", "migs"],
    "ricardo": ["ric", "ricky", "cardo"],
    "gregorio": ["greg", "goyo"],
    "leonardo": ["leo", "nardo"],
    "victoria": ["vicky", "toya"],
    "magdalena": ["magda", "lena"],
}

_TWO_LETTER_PREFIX = {"al", "jo", "el"}

_PART_RULES = [  # N2: (suffix-of-name, nickname)
    ("berto", "berto"),
    ("bert", "bert"),
    ("renzo", "renzo"),
    ("nald", "nald"),
    ("lito", "lito"),
    ("lyn", "lyn"),
    ("lynn", "lyn"),
    ("mel", "mel"),
]

_PHONETIC = [("ch", "k"), ("th", "t"), ("ph", "p"), ("jh", "j")]


def generate_nicknames_py(name: str) -> list[str]:
    """N5 pipeline for one formal name (pure python; used inside the
    Arrow-batched UDF and directly by tests as its own oracle spec)."""
    base = " ".join(name.strip().lower().split())
    if not base:
        return []
    if base.startswith("ma.") or base.startswith("ma "):
        base = "maria " + base.split(" ", 1)[1] if " " in base else "maria"
    out: set[str] = set()
    tokens = base.split(" ")
    if len(tokens) > 1:
        # multi-word: whole tokens only
        for t in tokens:
            out.add(t)
    else:
        w = tokens[0]
        out.update(CURATED.get(w, []))
        # N1 prefix
        pref = 2 if w[:2] in _TWO_LETTER_PREFIX else 3
        if len(w) > pref:
            out.add(w[:pref])
        # N2 parts
        for suf, nick in _PART_RULES:
            if w.endswith(suf) and len(w) > len(suf):
                out.add(nick)
        # N4 phonetic
        v = w
        for a, b in _PHONETIC:
            v = v.replace(a, b)
        if v != w:
            out.add(v)
    # filter: >= 2 alpha chars, != base
    return sorted(
        n for n in out if n != base and sum(c.isalpha() for c in n) >= 2
    )


def nickname_generation(
    df: DataFrame, name_col: str = "formal_name"
) -> DataFrame:
    """(formal_name, ...) -> exploded (nickname, formal_name) side table
    (the shape consumed by names.nickname_canonical). mapInPandas batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, nicks = [], []
            for n in pdf[name_col].fillna(""):
                for k in generate_nicknames_py(n):
                    names.append(" ".join(n.strip().lower().split()))
                    nicks.append(k)
            if names:
                yield pd.DataFrame({"nickname": nicks, "formal_name": names})

    return df.select(name_col).mapInPandas(
        gen, schema="nickname string, formal_name string"
    )


def apply_overrides(
    generated: DataFrame, overrides: DataFrame | None
) -> DataFrame:
    """N6: curated per-name overrides replace generated rows entirely for
    the names they cover (highest priority, broadcast anti-join)."""
    if overrides is None:
        return generated
    keep = generated.join(
        F.broadcast(overrides.select("formal_name").distinct()),
        "formal_name",
        "left_anti",
    )
    return keep.unionByName(overrides.select("nickname", "formal_name"))
