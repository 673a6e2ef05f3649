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

# N3: curated formal -> nicknames table. Re-curated (NOT copied) from
# common knowledge of Filipino/Spanish/English naming practice to coverage
# comparable with the reference's ~100-entry table
# (/root/reference/nickname_generator.py:54-155 — different keys/values;
# the overlap is the well-known-nickname facts themselves).
CURATED = {
    # -- Spanish/Filipino male formals --------------------------------------
    "jose": ["joey", "pepe", "joe", "sep"],
    "juan": ["johnny", "juanito"],
    "antonio": ["tony", "anton", "tonio", "tonyo"],
    "francisco": ["kiko", "frank", "paco", "frankie"],
    "eduardo": ["ed", "eddie", "dodong", "edu"],
    "ricardo": ["ric", "ricky", "cardo"],
    "roberto": ["bert", "berto", "bob", "obet"],
    "alberto": ["bert", "berting", "al"],
    "gilberto": ["gil", "bert"],
    "norberto": ["norbie", "bert"],
    "rodrigo": ["rod", "digong", "rudy"],
    "rodolfo": ["rudy", "rodel", "dolfo"],
    "reynaldo": ["rey", "naldo"],
    "ronaldo": ["ron", "ronnie", "naldo"],
    "arnoldo": ["arnold", "noldo"],
    "leonardo": ["leo", "nardo", "leon"],
    "gregorio": ["greg", "goyo", "goryo"],
    "miguel": ["mike", "migs", "miguelito"],
    "manuel": ["manny", "manolo", "maning"],
    "emmanuel": ["manny", "eman", "noel"],
    "rafael": ["rafa", "paeng", "raffy"],
    "gabriel": ["gab", "gabo"],
    "vicente": ["vic", "enteng", "vince"],
    "fernando": ["fernan", "nando", "ferdie"],
    "ferdinand": ["ferdie", "nanding"],
    "salvador": ["badong", "sal", "dodong"],
    "santiago": ["santi", "iago"],
    "sebastian": ["baste", "seb"],
    "teodoro": ["teddy", "doro", "teo"],
    "domingo": ["doming", "ingo"],
    "lorenzo": ["enzo", "loren", "insoy"],
    "mariano": ["mar", "anoy"],
    "pedro": ["pete", "pedring", "pidoy"],
    "pablo": ["pabs", "ambo"],
    "ramon": ["mon", "monching", "ray"],
    "raymundo": ["ray", "mundo"],
    "ernesto": ["ernie", "esto"],
    "arturo": ["art", "turo", "arthur"],
    "augusto": ["gus", "toto"],
    "agustin": ["agos", "tinoy"],
    "felipe": ["phil", "ipe", "pipoy"],
    "guillermo": ["gimo", "willy", "memo"],
    "enrique": ["ricky", "ike", "quique"],
    "joaquin": ["jack", "kinoy", "wacky"],
    "julio": ["jul", "julito"],
    "cesar": ["sarge", "aying"],
    "rogelio": ["roger", "gelio"],
    "virgilio": ["ver", "gilio"],
    "danilo": ["danny", "nilo"],
    "reynato": ["rey", "nato"],
    "renato": ["rene", "nato"],
    "ruben": ["ben", "rubencito"],
    "benjamin": ["ben", "benjie", "jamin"],
    "bienvenido": ["ben", "bien"],
    "alfredo": ["fred", "alfred", "edong"],
    "federico": ["fred", "ico", "dikoy"],
    "alejandro": ["alex", "andoy", "jandro"],
    "alexander": ["alex", "xander", "sandy"],
    "christopher": ["chris", "topher", "kit"],
    "cristobal": ["cris", "toba"],
    "nicolas": ["nick", "nico", "kulas"],
    "patricio": ["pat", "isyo"],
    "patrick": ["pat", "ricky"],
    "william": ["will", "bill", "liam", "willy"],
    "anthony": ["tony", "anton"],
    "michael": ["mike", "mickey", "mick"],
    "joseph": ["joe", "joey", "seph"],
    "john": ["jack", "johnny"],
    "james": ["jim", "jimmy", "jamie"],
    "robert": ["rob", "bob", "bobby", "bert"],
    "richard": ["rich", "rick", "dick", "chard"],
    "charles": ["charlie", "chuck", "chaz"],
    "edward": ["ed", "eddie", "ted", "ned"],
    "thomas": ["tom", "tommy"],
    "daniel": ["dan", "danny"],
    "david": ["dave", "davy"],
    "samuel": ["sam", "sammy"],
    "benedicto": ["ben", "dick", "bendo"],
    # -- female formals ------------------------------------------------------
    "maria": ["mary", "ria", "maring", "mariya"],
    "josefa": ["sefa", "pepa", "sepa"],
    "josefina": ["fina", "pening", "josie"],
    "elizabeth": ["beth", "liza", "eliza", "betty", "elsa"],
    "teresa": ["tess", "tessie", "tere"],
    "teresita": ["tessie", "sita", "tess"],
    "victoria": ["vicky", "toya", "toyang"],
    "magdalena": ["magda", "lena", "dalen"],
    "corazon": ["cora", "azon", "cory"],
    "concepcion": ["connie", "conching", "chona"],
    "consolacion": ["consuelo", "chelo", "solacion"],
    "esperanza": ["espie", "anzing", "hope"],
    "remedios": ["remy", "medyos"],
    "rosario": ["charo", "saring", "rose"],
    "rosalinda": ["rosa", "linda", "saly"],
    "margarita": ["margie", "rita", "maggie"],
    "margaret": ["maggie", "peg", "megan", "meg"],
    "katherine": ["kate", "kathy", "katie"],
    "catalina": ["cathy", "lina", "catali"],
    "cristina": ["tina", "ina", "cristy"],
    "christina": ["tina", "christy"],
    "carolina": ["carol", "ina", "carling"],
    "dolores": ["lola", "loleng", "dolly"],
    "soledad": ["sol", "choleng"],
    "natividad": ["nati", "tibang"],
    "felicidad": ["fely", "cidad"],
    "milagros": ["mila", "lagring"],
    "guadalupe": ["lupe", "adaling"],
    "leonora": ["nora", "leonie"],
    "eleonora": ["nora", "elea"],
    "veronica": ["vernie", "nika", "roni"],
    "virginia": ["virgie", "ginia", "ginny"],
    "patricia": ["pat", "patty", "tricia", "trisha"],
    "jennifer": ["jen", "jenny"],
    "jessica": ["jess", "jessie"],
    "angelica": ["angel", "angge", "gelica"],
    "angelina": ["angel", "angie", "lina"],
    "gabriela": ["gabby", "ela"],
    "isabella": ["bella", "isa", "sabel"],
    "isabel": ["sabel", "bel", "issa"],
    "francisca": ["kikay", "paquita", "frances"],
    "antonia": ["tonya", "antoneta", "toni"],
    "juana": ["juaning", "waning"],
    "luzviminda": ["luz", "minda", "vim"],
    "lourdes": ["lulu", "odeng", "des"],
    "emerenciana": ["emy", "enciana"],
    "perpetua": ["petua", "perping"],
    "crisanta": ["santa", "crising"],
    "florencia": ["flor", "encia", "florence"],
    "florencio": ["flor", "encio"],
    "susana": ["susan", "sue", "sana"],
    "marilou": ["malou", "lou"],
    "marites": ["tes", "maritess"],
    "imelda": ["meldy", "ime"],
    "norma": ["normie", "mamang"],
    "gloria": ["glo", "oya", "glory"],
    "estrella": ["esther", "star", "elya"],
    "carmencita": ["carmen", "menchie", "sita"],
    "carmelita": ["carmen", "lita", "mely"],
    "pacita": ["pacing", "sita"],
    "erlinda": ["linda", "erly"],
    "adelaida": ["adel", "aida", "laida"],
    "evangelina": ["vangie", "lina", "eva"],
    "emily": ["em", "emz", "mily"],
    "nicole": ["nikki", "cole"],
    "stephanie": ["steph", "annie"],
    "michelle": ["mitch", "chelle", "shelly"],
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


def load_overrides(spark, path: str) -> DataFrame:
    """N6 file workflow (the reference ships a CSV override loader,
    /root/reference/nickname_generator.py:472-578 — re-expressed over the
    tolerant S1 reader): read a user-maintained overrides file into the
    (nickname, formal_name) shape apply_overrides consumes.

    Accepted layouts (header required):
      formal_name,nickname            one pair per row
      formal_name,nicknames           multi-valued, ';' '|' or ',' inside
                                      a quoted field
    Names are normalized (trim, lowercase, collapsed whitespace); empty
    nicknames and nickname==formal rows are dropped."""
    from ..sources.readers import read_table

    raw = read_table(spark, path)
    cols = {c.lower(): c for c in raw.columns}
    formal = cols.get("formal_name") or cols.get("formal") or raw.columns[0]
    nick = (
        cols.get("nickname")
        or cols.get("nicknames")
        or cols.get("nick")
        or raw.columns[1]
    )
    norm = lambda c: F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")  # noqa: E731
    return (
        raw.select(
            norm(F.col(formal)).alias("formal_name"),
            F.explode(F.split(F.col(nick), r"[;|,]")).alias("nickname"),
        )
        .select("formal_name", norm(F.col("nickname")).alias("nickname"))
        .where(
            (F.col("nickname") != "")
            & (F.col("formal_name") != "")
            & (F.col("nickname") != F.col("formal_name"))
        )
        .distinct()
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
