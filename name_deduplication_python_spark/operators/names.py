"""Reference-parity name-record dedup/linkage pipeline (native Spark).

The web-text engine re-imagines the reference's pipeline; THIS module
keeps its original domain — beneficiary name records — so the engine can
run the reference's own workload end-to-end (SURVEY §5 item 3: parity on
name-shaped rows). Every stage cites its reference analog:

  P1 alias remap        /root/reference/data_utils.py:289-314, config.py:293-330
  P2 FullName split     /root/reference/data_utils.py:316-335
  C2-C10 normalizers    /root/reference/data_utils.py:50-106, analysis_engine.py:92-105
  J1 blocking keys      /root/reference/analysis_engine.py:418-428
  J2/J3 key joins       /root/reference/analysis_engine.py:430-449
  J4 nickname closure   /root/reference/analysis_engine.py:502-507
  F1-F3 scoring         /root/reference/analysis_engine.py:108-135, config.py:108-124
  F4 multi-pass         /root/reference/analysis_engine.py:514-552
  A1 clustering         /root/reference/analysis_engine.py:555-580

Scoring note: the reference uses rapidfuzz kernels; this engine defines
its similarity as ratio(a,b) = 100 * (1 - levenshtein(a,b)/max(|a|,|b|))
computed NATIVELY (F.levenshtein inside codegen) — same shape, fully
JVM-side, and exactly reproduced by the pure-python oracle in tests.
All other rules (hard rejects, birthdate/city bonuses, thresholds
exact>198 / fuzzy>110) follow the reference's constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .components import connected_components

# ---- P1: alias-based column remap -----------------------------------------

INTENDED_COLS = [
    "first_name",
    "middle_name",
    "last_name",
    "suffix",
    "birthdate",
    "city",
    "sex",
    "contact_number",
]

COLUMN_ALIASES = {
    "first_name": ["firstname", "fname", "first", "givenname"],
    "middle_name": ["middlename", "mname", "middle", "middleinitial"],
    "last_name": ["lastname", "lname", "surname", "familyname", "last"],
    "suffix": ["suffix", "ext", "extension", "extname", "nameext"],
    "birthdate": ["birthdate", "dob", "birthday", "dateofbirth", "bdate"],
    "city": ["city", "municipality", "citymunicipality", "muncipality", "town"],
    "sex": ["sex", "gender"],
    "contact_number": ["contactnumber", "cellphoneno", "mobile", "phone", "contactno"],
    "full_name": ["fullname", "name", "completename"],
}


def _norm_header(h: str) -> str:
    return h.strip().replace("_", "").replace(" ", "").replace("/", "").lower()


def remap_columns(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Normalize arbitrary input headers onto the fixed schema; missing
    columns materialize as '' (P1). ``keep`` columns pass through
    untouched (lineage ids)."""
    keep = keep or []
    resolved: dict[str, str] = {}
    for col in df.columns:
        if col in keep:
            continue
        n = _norm_header(col)
        for target, aliases in COLUMN_ALIASES.items():
            if n == _norm_header(target) or n in aliases:
                resolved.setdefault(target, col)
    out = []
    for target in INTENDED_COLS:
        if target in resolved:
            out.append(F.coalesce(F.col(resolved[target]), F.lit("")).alias(target))
        else:
            out.append(F.lit("").alias(target))
    kept = [F.col(k) for k in keep]
    if "full_name" in resolved and "first_name" not in resolved:
        return split_full_name(
            df.select(F.col(resolved["full_name"]).alias("full_name"), *out, *kept)
        )
    return df.select(*out, *kept)


# ---- P2: FullName splitter -------------------------------------------------

_SUFFIXES = ["jr", "sr", "i", "ii", "iii", "iv", "v"]


def split_full_name(df: DataFrame) -> DataFrame:
    """'Last, First Middle [Suffix]' or 'First [Middle] Last [Suffix]' ->
    four columns (P2). Native split/when chain; struct projection, the
    UDTF-shaped 1-row->4-col op of SURVEY §2.2."""
    fn = F.trim(F.col("full_name"))
    has_comma = F.instr(fn, ",") > 0
    last_c = F.trim(F.substring_index(fn, ",", 1))
    rest_c = F.split(F.trim(F.substring_index(fn, ",", -1)), " +")
    toks = F.split(fn, " +")
    n = F.size(toks)
    last_tok = F.lower(F.element_at(toks, -1))
    has_suffix = F.array_contains(
        F.array(*[F.lit(s) for s in _SUFFIXES]), F.regexp_replace(last_tok, r"\.", "")
    )
    # comma form: Last, First Middle... [Suffix]
    c_rest_n = F.size(rest_c)
    c_last_rest = F.lower(F.element_at(rest_c, -1))
    c_has_suffix = F.array_contains(
        F.array(*[F.lit(s) for s in _SUFFIXES]),
        F.regexp_replace(c_last_rest, r"\.", ""),
    )
    first_c = F.element_at(rest_c, 1)
    mid_c = F.when(
        c_rest_n - c_has_suffix.cast("int") > 1,
        F.array_join(
            F.slice(rest_c, 2, F.greatest(c_rest_n - 1 - c_has_suffix.cast("int"), F.lit(0))),
            " ",
        ),
    ).otherwise(F.lit(""))
    suf_c = F.when(c_has_suffix, F.element_at(rest_c, -1)).otherwise(F.lit(""))
    # space form: First [Middle...] Last [Suffix]
    eff_n = n - has_suffix.cast("int")
    first_s = F.element_at(toks, 1)
    last_s = F.when(eff_n >= 2, F.element_at(toks, eff_n)).otherwise(F.lit(""))
    mid_s = F.when(
        eff_n > 2, F.array_join(F.slice(toks, 2, F.greatest(eff_n - 2, F.lit(0))), " ")
    ).otherwise(F.lit(""))
    suf_s = F.when(has_suffix, F.element_at(toks, -1)).otherwise(F.lit(""))

    return df.select(
        F.when(has_comma, first_c).otherwise(first_s).alias("first_name"),
        F.when(has_comma, mid_c).otherwise(mid_s).alias("middle_name"),
        F.when(has_comma, last_c).otherwise(last_s).alias("last_name"),
        F.when(has_comma, suf_c).otherwise(suf_s).alias("suffix"),
        *[c for c in df.columns if c not in ("full_name", "first_name", "middle_name", "last_name", "suffix")],
    )


# ---- C2-C10: normalizers (all native) ---------------------------------------

_SUFFIX_MAP = {
    "jr": "jr", "jr.": "jr", "junior": "jr",
    "sr": "sr", "sr.": "sr", "senior": "sr",
    "1st": "i", "1": "i", "i": "i",
    "2nd": "ii", "2": "ii", "ii": "ii",
    "3rd": "iii", "3": "iii", "iii": "iii",
    "4th": "iv", "4": "iv", "iv": "iv",
    "5th": "v", "5": "v", "v": "v",
}

_DATE_FORMATS = ["yyyy-MM-dd", "MM/dd/yyyy", "dd/MM/yyyy", "yyyy/MM/dd", "MMM d, yyyy", "MMMM d, yyyy"]


def normalize_records(df: DataFrame) -> DataFrame:
    """Apply the reference's per-row canonicalization once (the
    _precompute_dataframe analog): cleaned/standardized match features."""
    clean = lambda c: F.lower(F.trim(F.col(c)))  # C2  # noqa: E731
    # C8+C9: Ma./Ma -> maria, drop dots & internal spaces
    fname = F.regexp_replace(clean("first_name"), r"^ma\.?(\s|$)", "maria ")
    fname = F.regexp_replace(F.regexp_replace(fname, r"\.", ""), r"\s+", " ")
    fname = F.trim(fname)
    lname = F.trim(F.regexp_replace(clean("last_name"), r"\.", ""))
    mname = F.trim(F.regexp_replace(clean("middle_name"), r"\.", ""))
    # C10: closed suffix map with identity fallback
    suffix_map = F.create_map(
        *[F.lit(x) for kv in _SUFFIX_MAP.items() for x in kv]
    )
    suffix = F.coalesce(suffix_map[clean("suffix")], clean("suffix"))
    # C4: multi-format date -> ISO string, '' on failure
    raw_date = F.regexp_replace(F.trim(F.col("birthdate")), r"[T ]\d{1,2}:\d{2}.*$", "")
    parsed = F.coalesce(
        *[F.try_to_timestamp(raw_date, F.lit(fmt)) for fmt in _DATE_FORMATS]
    )
    bdate = F.coalesce(F.date_format(parsed, "yyyy-MM-dd"), F.lit(""))
    # C5: sex prefix m/f
    sex = (
        F.when(clean("sex").startswith("m"), "male")
        .when(clean("sex").startswith("f"), "female")
        .otherwise("")
    )
    # C6 (lite): drop city/municipality/of tokens, collapse
    city = F.trim(
        F.regexp_replace(
            F.regexp_replace(clean("city"), r"\b(city|municipality|mun|of)\b", " "),
            r"[\s,./-]+",
            " ",
        )
    )
    return df.select(
        "*",
        fname.alias("_fn"),
        mname.alias("_mn"),
        lname.alias("_ln"),
        suffix.alias("_sfx"),
        bdate.alias("_bd"),
        sex.alias("_sex"),
        city.alias("_city"),
    )


# ---- J4: nickname equivalence ----------------------------------------------

BUILTIN_NICKNAMES = [
    ("joey", "jose"), ("pepe", "jose"), ("joseph", "jose"),
    ("beth", "elizabeth"), ("liza", "elizabeth"),
    ("tony", "antonio"), ("anton", "antonio"),
    ("bob", "robert"), ("bert", "roberto"), ("berto", "roberto"),
    ("mike", "michael"), ("miguelito", "miguel"),
    ("tess", "teresa"), ("tessie", "teresa"),
    ("nene", "nenita"), ("jun", "junior"),
]


def nickname_canonical(
    spark: SparkSession, nicknames: list[tuple[str, str]] | None = None
) -> DataFrame:
    """nickname equivalence -> canonical name per member via transitive
    closure (the reference builds a symmetric map; closure over chains is
    exactly tiny connected components — reuse the CC operator)."""
    rows = nicknames or BUILTIN_NICKNAMES
    edges = spark.createDataFrame(rows, "src string, dst string")
    comp = connected_components(edges)
    return comp.select(
        F.col("url").alias("name"), F.col("cluster_id").alias("canon")
    )


# ---- J1/J2/J3: blocking keys + candidate joins ------------------------------

def blocking_keys(df: DataFrame, id_col: str, canon: DataFrame | None = None) -> DataFrame:
    """Per record emit blocking keys (J1): FL_first_last, SDX_soundex
    pair, LNBD_last_birthdate — plus FL keys for nickname-canonical first
    names when a canon map is given."""
    base = df.select(
        F.col(id_col).alias("rid"), "_fn", "_ln", "_bd"
    )
    keys = base.select(
        "rid",
        F.explode(
            F.array(
                F.concat_ws("_", F.lit("FL"), "_fn", "_ln"),
                F.concat_ws("_", F.lit("SDX"), F.soundex("_fn"), F.soundex("_ln")),
                F.when(
                    F.col("_bd") != "", F.concat_ws("_", F.lit("LNBD"), "_ln", "_bd")
                ).otherwise(F.concat_ws("_", F.lit("FL"), "_fn", "_ln")),
            )
        ).alias("key"),
    )
    if canon is not None:
        # every record keys on its nickname-canonical first name (identity
        # for names outside the equivalence map) — J4 as a broadcast join
        nick_keys = (
            base.join(F.broadcast(canon), base["_fn"] == canon["name"], "left")
            .select(
                "rid",
                F.concat_ws(
                    "_", F.lit("FLC"), F.coalesce("canon", "_fn"), "_ln"
                ).alias("key"),
            )
        )
        keys = keys.unionByName(nick_keys)
    return keys.distinct()


def candidate_pairs_names(keys: DataFrame) -> DataFrame:
    """J2: self-join on blocking key, i<j canonical pairs, distinct."""
    a = keys.select("key", F.col("rid").alias("src"))
    b = keys.select("key", F.col("rid").alias("dst"))
    return (
        a.join(b, "key")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def candidate_pairs_two_tables_names(keys_a: DataFrame, keys_b: DataFrame) -> DataFrame:
    """J3: candidates across two relations sharing a blocking key."""
    a = keys_a.select("key", F.col("rid").alias("src"))
    b = keys_b.select("key", F.col("rid").alias("dst"))
    return a.join(b, "key").select("src", "dst").distinct()


# ---- F1-F3: scoring + thresholds (native) -----------------------------------

THRESH_EXACT = 198   # config.py:119-123
THRESH_FUZZY = 110


def _ratio(a, b):
    """100 * (1 - lev/max(len)) — native levenshtein similarity; 100 when
    both empty."""
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, F.lit(100.0)).otherwise(
        100.0 * (1.0 - F.levenshtein(a, b) / mx)
    )


def score_name_pairs(
    pairs: DataFrame, feats: DataFrame, id_col: str = "rid",
    canon: DataFrame | None = None,
) -> DataFrame:
    """Composite confidence score per candidate pair (F1 analog):
      hard rejects: sex conflict / suffix conflict -> -1000
      base: 0.6*first_ratio + 0.4*middle_ratio + token-ish full ratio
      bonuses: soundex(first)+soundex(last) equal & first>80 -> +40
               birthdate equal -> +100, conflict -> -150
               city differ (both non-empty) -> -30
               middle initial mismatch -> -60
    """
    f = feats.select(
        F.col(id_col), "_fn", "_mn", "_ln", "_sfx", "_bd", "_sex", "_city"
    )
    if canon is not None:
        f = (
            f.join(F.broadcast(canon), f["_fn"] == canon["name"], "left")
            .withColumn("_fnc", F.coalesce("canon", "_fn"))
            .drop("name", "canon")
        )
    else:
        f = f.withColumn("_fnc", F.col("_fn"))
    a = f.select(
        F.col(id_col).alias("src"), *[F.col(c).alias(c + "_a") for c in f.columns if c != id_col]
    )
    b = f.select(
        F.col(id_col).alias("dst"), *[F.col(c).alias(c + "_b") for c in f.columns if c != id_col]
    )
    j = pairs.join(a, "src").join(b, "dst")

    fn_r = F.greatest(_ratio(F.col("_fn_a"), F.col("_fn_b")), _ratio(F.col("_fnc_a"), F.col("_fnc_b")))
    ln_r = _ratio(F.col("_ln_a"), F.col("_ln_b"))
    mn_r = _ratio(F.col("_mn_a"), F.col("_mn_b"))
    full_a = F.concat_ws(" ", "_fn_a", "_mn_a", "_ln_a")
    full_b = F.concat_ws(" ", "_fn_b", "_mn_b", "_ln_b")
    full_r = _ratio(full_a, full_b)

    sex_conflict = (
        (F.col("_sex_a") != "") & (F.col("_sex_b") != "") & (F.col("_sex_a") != F.col("_sex_b"))
    )
    sfx_conflict = (
        (F.col("_sfx_a") != "") & (F.col("_sfx_b") != "") & (F.col("_sfx_a") != F.col("_sfx_b"))
    )
    sdx_bonus = F.when(
        (F.soundex("_fn_a") == F.soundex("_fn_b"))
        & (F.soundex("_ln_a") == F.soundex("_ln_b"))
        & (fn_r > 80),
        40.0,
    ).otherwise(0.0)
    bd_term = (
        F.when((F.col("_bd_a") != "") & (F.col("_bd_a") == F.col("_bd_b")), 100.0)
        .when(
            (F.col("_bd_a") != "") & (F.col("_bd_b") != "") & (F.col("_bd_a") != F.col("_bd_b")),
            -150.0,
        )
        .otherwise(0.0)
    )
    city_term = F.when(
        (F.col("_city_a") != "") & (F.col("_city_b") != "") & (F.col("_city_a") != F.col("_city_b")),
        -30.0,
    ).otherwise(0.0)
    mid_term = F.when(
        (F.col("_mn_a") != "")
        & (F.col("_mn_b") != "")
        & (F.substring("_mn_a", 1, 1) != F.substring("_mn_b", 1, 1)),
        -60.0,
    ).otherwise(0.0)

    base = 0.6 * fn_r + 0.4 * mn_r + 0.5 * ln_r + 0.5 * full_r
    score = F.when(sex_conflict | sfx_conflict, F.lit(-1000.0)).otherwise(
        F.round(base + sdx_bonus + bd_term + city_term + mid_term, 4)
    )
    status = (
        F.when(score > THRESH_EXACT, "Exact Match")
        .when(score > THRESH_FUZZY, "Fuzzy Match")
        .otherwise(F.lit(None))
    )
    return j.select("src", "dst", score.alias("score"), status.alias("status")).where(
        F.col("status").isNotNull()
    )


# ---- end-to-end -------------------------------------------------------------

def dedupe_names(
    spark: SparkSession,
    records: DataFrame,
    id_col: str = "rid",
    use_nicknames: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full name-record dedup: remap -> normalize -> block -> score -> CC.
    Returns (edges, clusters). records must already carry a unique id."""
    feats = normalize_records(remap_columns(records, keep=[id_col]))
    canon = nickname_canonical(spark) if use_nicknames else None
    keys = blocking_keys(feats, id_col, canon)
    pairs = candidate_pairs_names(keys)
    edges = score_name_pairs(pairs, feats, id_col, canon)
    clusters = connected_components(edges.select("src", "dst"))
    return edges, clusters
