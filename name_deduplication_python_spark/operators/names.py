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

# informational columns the officials table additionally projects
# (/root/reference/data_utils.py:297,311 — Position, Barangay ride the
# intended schema when is_officials_file; they carry through matching
# untouched and surface in report output)
OFFICIALS_COLS = ["position", "barangay"]

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
    "position": ["position", "designation"],
    "barangay": ["barangay", "brgy"],
}


def _norm_header(h: str) -> str:
    return h.strip().replace("_", "").replace(" ", "").replace("/", "").lower()


def remap_columns(
    df: DataFrame, keep: list[str] | None = None, officials: bool = False
) -> DataFrame:
    """Normalize arbitrary input headers onto the fixed schema; missing
    columns materialize as '' (P1). ``keep`` columns pass through
    untouched (lineage ids). ``officials=True`` additionally projects the
    officials table's informational columns (position, barangay — the
    reference's is_officials_file branch)."""
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
    targets = INTENDED_COLS + (OFFICIALS_COLS if officials else [])
    for target in targets:
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

# ---- C6: city canonicalization (full reference semantics,
#      /root/reference/data_utils.py:108-273) ---------------------------------

# word-level abbreviation expansion (the reference's `abbreviations` dict)
_CITY_ABBREV = {
    "st": "saint",
    "sto": "santo",
    "sta": "santa",
    "mt": "mount",
    "n": "north",
    "e": "east",
    "s": "south",
    "w": "west",
}

# special-case canonical map: joined-word / province-suffixed variants of
# common Filipino city names -> canonical form. Re-curated compact set
# (same rule FAMILIES as the reference's ~90-entry table, not a copy):
# each entry demonstrates one variant family the scorer's -30 city-conflict
# term depends on.
_CITY_SPECIAL = {
    "sanjose": "san jose",
    "san jose romblon": "san jose",
    "sanjuan": "san juan",
    "sanantonio": "san antonio",
    "sanmiguel": "san miguel",
    "sanpedro": "san pedro",
    "sanpablo": "san pablo",
    "sancarlos": "san carlos",
    "sanrafael": "san rafael",
    "sanluis": "san luis",
    "sanagustin": "san agustin",
    "sanandres": "san andres",
    "sanfernando": "san fernando",
    "sanvicente": "san vicente",
    "santacruz": "santa cruz",
    "santa cruz marinduque": "santa cruz",
    "santafe": "santa fe",
    "santamaria": "santa maria",
    "santotomas": "santo tomas",
    "calapancity": "calapan",
    "calapan city": "calapan",
    "puerto princesa city": "puerto princesa",
    "elnido": "el nido",
    "brookespoint": "brookes point",
    "looc romblon": "looc",
    "magsaysay palawan": "magsaysay",
    "quezon palawan": "quezon",
    "rizal palawan": "rizal",
    "roxas palawan": "roxas",
}


def normalize_city_expr(col) -> "F.Column":
    """Native city canonicalizer mirroring the reference's normalize_city
    (/root/reference/data_utils.py:108-273), lowercase canon (the engine
    keeps everything lowercase; the reference Title-cases for display then
    lowercases again before comparing):
      1 drop descriptor words (city/municipality/municipal/town/mun/
        barangay/brgy/bgy/lgu)
      2 collapse separators
      3 word-wise abbreviation expansion (st->saint, sto->santo, ...)
      4 strip leading 'of ' (left by 'City of X')
      5 drop parenthetical descriptors
      6 special-case canonical map
    """
    c = F.lower(F.trim(col))
    c = F.regexp_replace(
        c, r"\b(city|municipality|municipal|town|mun\.?|barangay|brgy|bgy|lgu)\b", ""
    )
    c = F.trim(F.regexp_replace(c, r"[,\-_.\s]+", " "))
    abbrev_map = F.create_map(
        *[F.lit(x) for kv in _CITY_ABBREV.items() for x in kv]
    )
    c = F.array_join(
        F.transform(F.split(c, " "), lambda w: F.coalesce(abbrev_map[w], w)), " "
    )
    c = F.regexp_replace(c, r"^of\s+", "")
    c = F.regexp_replace(c, r"\s*\([^)]*\)\s*", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    special_map = F.create_map(
        *[F.lit(x) for kv in _CITY_SPECIAL.items() for x in kv]
    )
    return F.coalesce(special_map[c], c)


def display_name_expr(col) -> "F.Column":
    """C3 presentation form (/root/reference/data_utils.py:54-60): comma
    to space, whitespace collapse, numeric-float collapse (``1990.0`` ->
    ``1990``), then per-word Capitalize with the ``Ma.`` exception kept
    verbatim. The ENGINE canon stays lowercase (normalize_records); this
    is the report-facing formatter."""
    c = F.trim(F.regexp_replace(F.regexp_replace(col, ",", " "), r"\s+", " "))
    # "1990.0" -> "1990" (the reference's float->int collapse)
    c = F.when(c.rlike(r"^\d+\.0+$"), F.regexp_replace(c, r"\.0+$", "")).otherwise(c)
    word = (
        lambda w: F.when(F.lower(w) == "ma.", F.lit("Ma.")).otherwise(  # noqa: E731
            F.concat(F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, 2147483647)))
        )
    )
    return F.array_join(
        F.transform(F.split(c, " "), word), " "
    )


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
    # C6: full city canonicalization (abbrev expansion + special cases)
    city = normalize_city_expr(F.col("city"))
    return df.select(
        "*",
        fname.alias("_fn"),
        mname.alias("_mn"),
        lname.alias("_ln"),
        suffix.alias("_sfx"),
        bdate.alias("_bd"),
        # raw (pre-parse) birthdate presence drives the F2 adaptive gate:
        # an unparseable-but-present birthdate keeps the base algorithm
        # (/root/reference/analysis_engine.py:149-156 has_birthdate_raw)
        F.trim(F.col("birthdate")).alias("_bd_raw"),
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
    """Per record emit blocking keys (J1, mirroring
    /root/reference/analysis_engine.py:418-428):
      FL_first_last        when both present (space-stripped)
      SDX_sdx(first)_sdx(last)  when both present
      LNBD_last_birthdate  when both present
      SSDX_sorted soundexes of the non-empty name parts (catches swapped
                           first/last) when >= 2 parts
      FLC_canonical_last   nickname-canonical first (J4, broadcast join)
    Null keys are filtered post-explode (conditional emission)."""
    base = df.select(F.col(id_col).alias("rid"), "_fn", "_mn", "_ln", "_bd")
    has_fl = (F.col("_fn") != "") & (F.col("_ln") != "")
    fl_key = F.concat_ws(
        "_",
        F.lit("FL"),
        F.regexp_replace("_fn", " ", ""),
        F.regexp_replace("_ln", " ", ""),
    )
    parts = F.filter(F.array("_fn", "_mn", "_ln"), lambda p: p != "")
    ssdx = F.concat_ws(
        "_",
        F.lit("SSDX"),
        F.array_join(F.array_sort(F.transform(parts, F.soundex)), "_"),
    )
    keys = base.select(
        "rid",
        F.explode(
            F.array(
                F.when(has_fl, fl_key),
                F.when(
                    has_fl,
                    F.concat_ws(
                        "_", F.lit("SDX"), F.soundex("_fn"), F.soundex("_ln")
                    ),
                ),
                F.when(
                    (F.col("_ln") != "") & (F.col("_bd") != ""),
                    F.concat_ws("_", F.lit("LNBD"), "_ln", "_bd"),
                ),
                F.when(F.size(parts) > 1, ssdx),
            )
        ).alias("key"),
    ).where(F.col("key").isNotNull())
    if canon is not None:
        # every record keys on its nickname-canonical first name (identity
        # for names outside the equivalence map) — J4 as a broadcast join
        nick_keys = (
            base.where(has_fl)
            .join(F.broadcast(canon), base["_fn"] == canon["name"], "left")
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


# ---- F1-F3: scoring + thresholds (native, reference constants) --------------
#
# Constants from /root/reference/config.py:108-124 and the scoring rules of
# /root/reference/analysis_engine.py:111-191. The reference's rapidfuzz
# kernels (fuzz.ratio / token_set_ratio / WRatio) are replaced by NATIVE
# analogs built on one levenshtein similarity (F.levenshtein inside
# codegen); the pure-python oracle in tests/test_names.py implements the
# SAME kernels, so cluster-assignment parity is testable end to end.

THRESH_EXACT = 198    # strict_threshold, config.py:121
THRESH_FUZZY = 110    # standard_threshold, config.py:122
THRESH_LENIENT = 95   # lenient_threshold, config.py:123
ADJ_FUZZY_NAME_ONLY = -20    # standard_adjustment, config.py:114
ADJ_LENIENT_NAME_ONLY = -5   # lenient_adjustment, config.py:115
# analysis_engine.py:121-133 bonuses / penalties
BONUS_PHONETIC = 40.0
BONUS_WRATIO = 30.0
WRATIO_GATE = 95
BDATE_EQ = 100.0
BDATE_NEQ = -150.0
CITY_CONFLICT = -30.0
MIDDLE_FAR = -80.0      # both middle names len>1 and ratio < 65
MIDDLE_INITIAL = -60.0  # middle initials differ
# analysis_engine.py:163-188 adaptive (name-only) gates
ADAPTIVE_FN_MIN = 60
ADAPTIVE_LN_MIN = 85
ADAPTIVE_MN_MIN = 80
ADAPTIVE_FULL_MIN = 75
ADAPTIVE_PENALTY = 0.9


def _ratio(a, b):
    """100 * (1 - lev/max(len)) — native levenshtein similarity; 100 when
    both empty (the engine's fuzz.ratio analog, same shape/range)."""
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, F.lit(100.0)).otherwise(
        100.0 * (1.0 - F.levenshtein(a, b) / mx)
    )


def _full_name(fn, mn, ln):
    """Full name from NON-EMPTY parts (the reference's
    f'{fn} {mn} {ln}'.strip().replace('  ',' ') — concat_ws alone keeps
    empty strings and produces double spaces that skew the ratio)."""
    return F.array_join(
        F.filter(F.array(fn, mn, ln), lambda x: x != ""), " "
    )


def _tokens_of(c):
    return F.filter(F.split(c, " "), lambda x: x != "")


def _token_set_ratio(full_a, full_b):
    """Native token_set_ratio (rapidfuzz structure): compare the sorted
    token intersection against each side's intersection+difference string;
    best of the three pairings. All array/levenshtein expressions."""
    ta = F.array_sort(F.array_distinct(_tokens_of(full_a)))
    tb = F.array_sort(F.array_distinct(_tokens_of(full_b)))
    inter = F.array_join(F.array_sort(F.array_intersect(ta, tb)), " ")
    d_ab = F.array_join(F.array_sort(F.array_except(ta, tb)), " ")
    d_ba = F.array_join(F.array_sort(F.array_except(tb, ta)), " ")
    s1 = F.trim(F.concat_ws(" ", inter, d_ab))
    s2 = F.trim(F.concat_ws(" ", inter, d_ba))
    return F.greatest(_ratio(inter, s1), _ratio(inter, s2), _ratio(s1, s2))


def _token_sort_ratio(full_a, full_b):
    sa = F.array_join(F.array_sort(_tokens_of(full_a)), " ")
    sb = F.array_join(F.array_sort(_tokens_of(full_b)), " ")
    return _ratio(sa, sb)


def _wratio(full_a, full_b):
    """Native WRatio analog: best of plain / token-sort / token-set ratio
    (rapidfuzz's WRatio is a weighted max over the same kernel family;
    used only as the >95 bonus gate and the audit floors, where the max
    form is the conservative substitute)."""
    return F.greatest(
        _ratio(full_a, full_b),
        _token_sort_ratio(full_a, full_b),
        _token_set_ratio(full_a, full_b),
    )


def score_name_pairs(
    pairs: DataFrame,
    feats: DataFrame,
    id_col: str = "rid",
    canon: DataFrame | None = None,
    lenient: bool = False,
    adaptive: bool = True,
    keep_unmatched: bool = False,
) -> DataFrame:
    """Confidence score per candidate pair — the reference formula
    (_calculate_match_confidence_optimized, analysis_engine.py:111-135):

      sex conflict / suffix conflict              -> -1000 hard reject
      nickname-equivalent first names             -> treated as identical
                                                     (canonical substitution,
                                                     also inside full name)
      base score  = token_set_ratio(full_a, full_b)
      +40 when soundex(first)+soundex(last) agree and first_ratio > 80
      +30 when WRatio(full) > 95
      +100 / -150 birthdate equal / conflict (both present)
      -30 city conflict (both present)
      -80 both middle names len>1 with ratio < 65, else -60 on initial
          mismatch (both present)

    adaptive=True layers the F2 name-only gates
    (_calculate_match_confidence_adaptive, :137-191): when NEITHER record
    pair side has a birthdate (raw or parsed), require fn>=60-or-equal,
    ln>=85-or-equal, compatible middles, full>=75, then scale by 0.9
    (int-truncated like the reference).

    Status tiers (compare_records_*_configurable, :312-414): score>198 ->
    Exact, >110 -> Fuzzy (>95 when lenient=True, the user_official third
    pass); for name-only pairs (no birthdate, sex, or city) the fuzzy/
    lenient thresholds shift by -20/-5 to 90.
    """
    f = feats.select(
        F.col(id_col), "_fn", "_mn", "_ln", "_sfx", "_bd", "_bd_raw", "_sex", "_city"
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

    # nickname substitution: equivalent first names become the SAME
    # canonical token, both in the first-name ratio and the full name
    # (the reference replaces fn1/fn2 with the common formal name)
    same_canon = F.col("_fnc_a") == F.col("_fnc_b")
    fn_a_eff = F.when(same_canon, F.col("_fnc_a")).otherwise(F.col("_fn_a"))
    fn_b_eff = F.when(same_canon, F.col("_fnc_b")).otherwise(F.col("_fn_b"))

    fn_r = _ratio(fn_a_eff, fn_b_eff)
    mn_r = _ratio(F.col("_mn_a"), F.col("_mn_b"))
    full_a = _full_name(fn_a_eff, F.col("_mn_a"), F.col("_ln_a"))
    full_b = _full_name(fn_b_eff, F.col("_mn_b"), F.col("_ln_b"))

    sex_conflict = (
        (F.col("_sex_a") != "") & (F.col("_sex_b") != "") & (F.col("_sex_a") != F.col("_sex_b"))
    )
    sfx_conflict = (
        (F.col("_sfx_a") != "") & (F.col("_sfx_b") != "") & (F.col("_sfx_a") != F.col("_sfx_b"))
    )
    phonetic_bonus = F.when(
        (F.soundex(fn_a_eff) == F.soundex(fn_b_eff))
        & (F.soundex("_ln_a") == F.soundex("_ln_b"))
        & (fn_r > 80),
        BONUS_PHONETIC,
    ).otherwise(0.0)
    wratio_bonus = F.when(
        _wratio(full_a, full_b) > WRATIO_GATE, BONUS_WRATIO
    ).otherwise(0.0)
    bd_term = (
        F.when((F.col("_bd_a") != "") & (F.col("_bd_a") == F.col("_bd_b")), BDATE_EQ)
        .when(
            (F.col("_bd_a") != "") & (F.col("_bd_b") != "") & (F.col("_bd_a") != F.col("_bd_b")),
            BDATE_NEQ,
        )
        .otherwise(0.0)
    )
    city_term = F.when(
        (F.col("_city_a") != "") & (F.col("_city_b") != "") & (F.col("_city_a") != F.col("_city_b")),
        CITY_CONFLICT,
    ).otherwise(0.0)
    both_mid = (F.col("_mn_a") != "") & (F.col("_mn_b") != "")
    mid_term = (
        F.when(
            both_mid
            & (F.length("_mn_a") > 1)
            & (F.length("_mn_b") > 1)
            & (mn_r < 65),
            MIDDLE_FAR,
        )
        .when(
            both_mid
            & (F.substring("_mn_a", 1, 1) != F.substring("_mn_b", 1, 1)),
            MIDDLE_INITIAL,
        )
        .otherwise(0.0)
    )

    base = F.round(
        _token_set_ratio(full_a, full_b)
        + phonetic_bonus
        + wratio_bonus
        + bd_term
        + city_term
        + mid_term,
        4,
    )
    score = F.when(sex_conflict | sfx_conflict, F.lit(-1000.0)).otherwise(base)

    has_bd = (
        ((F.col("_bd_raw_a") != "") & (F.col("_bd_raw_b") != ""))
        | ((F.col("_bd_a") != "") & (F.col("_bd_b") != ""))
    )
    if adaptive:
        # F2 name-only strict gates — the UNsubstituted first names, per
        # the reference (adaptive rules read _opt_fname_exp directly)
        fn_sim = _ratio(F.col("_fn_a"), F.col("_fn_b"))
        ln_sim = _ratio(F.col("_ln_a"), F.col("_ln_b"))
        full_sim = _ratio(
            _full_name(F.col("_fn_a"), F.col("_mn_a"), F.col("_ln_a")),
            _full_name(F.col("_fn_b"), F.col("_mn_b"), F.col("_ln_b")),
        )
        mid_incompatible = (
            both_mid
            & (F.length("_mn_a") > 1)
            & (F.length("_mn_b") > 1)
            & (mn_r < ADAPTIVE_MN_MIN)
            & (F.substring("_mn_a", 1, 1) != F.substring("_mn_b", 1, 1))
        )
        gate_reject = (
            ((fn_sim < ADAPTIVE_FN_MIN) & (F.col("_fn_a") != F.col("_fn_b")))
            | ((ln_sim < ADAPTIVE_LN_MIN) & (F.col("_ln_a") != F.col("_ln_b")))
            | mid_incompatible
            | (full_sim < ADAPTIVE_FULL_MIN)
        )
        adaptive_score = F.when(gate_reject, F.lit(-1000.0)).otherwise(
            # int() truncation toward zero, as the reference
            (score * ADAPTIVE_PENALTY).cast("int").cast("double")
        )
        score = F.when(
            (score <= -1000.0) | has_bd, score
        ).otherwise(adaptive_score)

    # per-pair threshold adjustment: name-only pairs (no birthdate, sex,
    # or city on either side) shift the fuzzy/lenient thresholds
    name_only = (
        ~has_bd
        & ~((F.col("_sex_a") != "") & (F.col("_sex_b") != ""))
        & ~((F.col("_city_a") != "") & (F.col("_city_b") != ""))
    )
    fuzzy_t = F.when(
        name_only, F.lit(THRESH_FUZZY + ADJ_FUZZY_NAME_ONLY)
    ).otherwise(F.lit(THRESH_FUZZY))
    lenient_t = F.when(
        name_only, F.lit(THRESH_LENIENT + ADJ_LENIENT_NAME_ONLY)
    ).otherwise(F.lit(THRESH_LENIENT))
    status = F.when(score > THRESH_EXACT, "Exact Match").when(
        score > fuzzy_t, "Fuzzy Match"
    )
    if lenient:
        status = status.when(score > lenient_t, "Fuzzy Match")
    status = status.otherwise(F.lit(None))
    out = j.select("src", "dst", score.alias("score"), status.alias("status"))
    if keep_unmatched:
        return out  # diagnostics (F5 pair tester)
    return out.where(F.col("status").isNotNull())


def test_name_pair(
    spark: SparkSession,
    first1: str,
    last1: str,
    first2: str,
    last2: str,
    middle1: str = "",
    middle2: str = "",
    **fields,
) -> tuple[float, str | None]:
    """F5 pair tester (/root/reference/analysis_engine.py:198-231): would
    these two names match under the current rules? Returns (score,
    status). Extra record fields (birthdate1/2, sex1/2, city1/2,
    suffix1/2) pass through. A diagnostic helper, not a hot-path op."""
    def rec(i: int) -> dict:
        return {
            "rid": f"r{i}",
            "first_name": (first1, first2)[i],
            "last_name": (last1, last2)[i],
            "middle_name": (middle1, middle2)[i],
            "birthdate": fields.get(f"birthdate{i + 1}", ""),
            "sex": fields.get(f"sex{i + 1}", ""),
            "city": fields.get(f"city{i + 1}", ""),
            "suffix": fields.get(f"suffix{i + 1}", ""),
        }

    df = spark.createDataFrame([rec(0), rec(1)])
    feats = normalize_records(remap_columns(df, keep=["rid"]))
    pairs = spark.createDataFrame([("r0", "r1")], "src string, dst string")
    canon = nickname_canonical(spark)
    out = score_name_pairs(
        pairs, feats, "rid", canon, lenient=True, keep_unmatched=True
    ).collect()
    return (float(out[0]["score"]), out[0]["status"])


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


def link_tables(
    spark: SparkSession,
    user: DataFrame,
    master: DataFrame | None = None,
    officials: DataFrame | None = None,
    id_col: str = "rid",
    use_nicknames: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """F4 multi-pass orchestration (_perform_matching,
    /root/reference/analysis_engine.py:515-552): three candidate pools
    with their pass pipelines —

      user x officials  strict + standard + LENIENT   (lenient=True)
      user x master     strict + standard
      user x user       strict + standard

    The reference runs the tiers as sequential passes with an
    already-matched anti-join (P5); because every tier shares ONE scorer
    and the thresholds are nested (198 > 110 > 95), a single scored pass
    per pool with the pool's lowest tier enabled emits the identical edge
    set with the identical status labels, so the anti-join is subsumed
    (SURVEY §4.1). Ids across tables must be globally unique (the
    reference prefixes user_/master_/official_; callers do the same).

    Returns (edges with pair_type, clusters over ALL edges).
    """
    canon = nickname_canonical(spark) if use_nicknames else None
    fu = normalize_records(remap_columns(user, keep=[id_col]))
    ku = blocking_keys(fu, id_col, canon)
    edges = None

    def add(e: DataFrame, tag: str):
        nonlocal edges
        e = e.withColumn("pair_type", F.lit(tag))
        edges = e if edges is None else edges.unionByName(e)

    if officials is not None:
        # officials carry position/barangay through matching untouched
        # (ref data_utils.py:297,311); the user side gets them as nulls
        # in the union so the feature schema stays aligned
        fo = normalize_records(
            remap_columns(officials, keep=[id_col], officials=True)
        )
        pairs = candidate_pairs_two_tables_names(
            ku, blocking_keys(fo, id_col, canon)
        )
        add(
            score_name_pairs(
                pairs,
                fu.unionByName(fo, allowMissingColumns=True),
                id_col,
                canon,
                lenient=True,
            ),
            "user_official",
        )
    if master is not None:
        fm = normalize_records(remap_columns(master, keep=[id_col]))
        pairs = candidate_pairs_two_tables_names(
            ku, blocking_keys(fm, id_col, canon)
        )
        add(
            score_name_pairs(pairs, fu.unionByName(fm), id_col, canon),
            "user_master",
        )
    add(score_name_pairs(candidate_pairs_names(ku), fu, id_col, canon), "user_user")
    clusters = connected_components(edges.select("src", "dst"))
    return edges, clusters
