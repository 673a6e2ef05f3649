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
    ("mel", "mel"),
    ("chard", "chard"),  # Richard -> Chard
]

# N2 core/prefix families (/root/reference/nickname_generator.py:203-231):
# names STARTING with these yield the core as a nickname
_PREFIX_CORES = ["leo", "vic", "rom", "mar", "noel", "cel", "eli", "sha"]
# names CONTAINING these yield the core
_INFIX_CORES = ["ric", "greg", "ben"]

_PHONETIC = [("ch", "k"), ("th", "t"), ("ph", "p"), ("jh", "j")]


def generate_nicknames_py(name: str) -> list[str]:
    """N5 pipeline for one formal name (pure python; used inside the
    Arrow-batched UDF and directly by tests as its own oracle spec).

    Mirrors /root/reference/nickname_generator.py:267-370 semantics:
      multi-word -> whole tokens, Ma.->Maria, and 'X Ann/Anne/An' -> 'Xn'
      single-word -> curated + 3-letter prefix + suffix/core parts +
                     -lyn/-lynn split + maria*-split + phonetic variant
      filter: alphabetic, >= 2 chars, != the base name
    """
    base = " ".join(name.strip().lower().split())
    if not base:
        return []
    if base.startswith("ma.") or base.startswith("ma "):
        base = "maria " + base.split(" ", 1)[1] if " " in base else "maria"
    out: set[str] = set()
    tokens = base.split(" ")
    if len(tokens) > 1:
        # multi-word: whole tokens only, plus the Ann-contraction
        for t in tokens:
            out.add(t)
        if tokens[1] in ("ann", "anne", "an"):
            out.add(tokens[0] + "n")  # Lovely Ann -> Lovelyn
    else:
        w = tokens[0]
        out.update(CURATED.get(w, []))
        # N1 prefix
        pref = 2 if w[:2] in _TWO_LETTER_PREFIX else 3
        if len(w) > pref:
            out.add(w[:pref])
        # N2 suffix parts
        for suf, nick in _PART_RULES:
            if w.endswith(suf) and len(w) > len(suf):
                out.add(nick)
        # N2: -lyn/-lynn -> 'lyn' plus the stem when long enough
        if w.endswith("lyn") or w.endswith("lynn"):
            out.add("lyn")
            stem = w[:-3] if w.endswith("lyn") else w[:-4]
            if len(stem) >= 4:
                out.add(stem)
        # N2 core/prefix families
        for core in _PREFIX_CORES:
            if w.startswith(core) and w != core:
                out.add(core)
        for core in _INFIX_CORES:
            if core in w and w != core:
                out.add(core)
        if w.startswith("rowena"):
            out.add("wena")
        # N5: maria-prefixed single word splits (Mariafe -> maria, fe)
        if w.startswith("maria") and len(w) > 5:
            out.add("maria")
            rem = w[5:]
            if len(rem) >= 2:
                out.add(rem)
        # N4 phonetic
        v = w
        for a, b in _PHONETIC:
            v = v.replace(a, b)
        if v != w:
            out.add(v)
    # filter: alphabetic, >= 2 chars, != base
    return sorted(
        n for n in out if n != base and len(n) >= 2 and n.isalpha()
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
