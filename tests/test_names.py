"""Reference-parity name pipeline tests (SURVEY §5 item 3): Spark
implementation vs an independent pure-python oracle of the same spec, on
fixtures seeded per FIXTURES.md §2 (nickname swaps, Ma.->Maria, same name
+ different birthdate must NOT cluster, sex-conflict hard reject, alias
headers, FullName-only input)."""

from __future__ import annotations

import pandas as pd
import pytest

from name_deduplication_python_spark.operators.names import (
    BUILTIN_NICKNAMES,
    THRESH_FUZZY,
    dedupe_names,
    remap_columns,
    split_full_name,
)


# ---- pure-python oracle (independent reimplementation of the spec) ----------

def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ratio(a: str, b: str) -> float:
    m = max(len(a), len(b))
    return 100.0 if m == 0 else 100.0 * (1 - _lev(a, b) / m)


def _soundex(s: str) -> str:
    if not s:
        return ""
    codes = {**{c: "1" for c in "bfpv"}, **{c: "2" for c in "cgjkqsxz"},
             **{c: "3" for c in "dt"}, "l": "4", **{c: "5" for c in "mn"}, "r": "6"}
    s = s.lower()
    out = s[0].upper()
    prev = codes.get(s[0], "")
    for ch in s[1:]:
        c = codes.get(ch, "")
        if c and c != prev:
            out += c
        if ch not in "hw":
            prev = c
    return (out + "000")[:4]


def _canon_map() -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in BUILTIN_NICKNAMES:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _norm_city(val: str) -> str:
    """Python mirror of names.normalize_city_expr (C6)."""
    import re

    from name_deduplication_python_spark.operators.names import (
        _CITY_ABBREV,
        _CITY_SPECIAL,
    )

    c = val.strip().lower()
    c = re.sub(
        r"\b(city|municipality|municipal|town|mun\.?|barangay|brgy|bgy|lgu)\b", "", c
    )
    c = re.sub(r"[,\-_.\s]+", " ", c).strip()
    c = " ".join(_CITY_ABBREV.get(w, w) for w in c.split(" "))
    c = re.sub(r"^of\s+", "", c)
    c = re.sub(r"\s*\([^)]*\)\s*", " ", c)
    c = re.sub(r"\s+", " ", c).strip()
    return _CITY_SPECIAL.get(c, c)


def _norm_row(r: dict) -> dict:
    import re

    fn = r.get("first_name", "").strip().lower()
    fn = re.sub(r"^ma\.?(\s|$)", "maria ", fn)
    fn = re.sub(r"\s+", " ", fn.replace(".", "")).strip()
    ln = r.get("last_name", "").strip().lower().replace(".", "").strip()
    mn = r.get("middle_name", "").strip().lower().replace(".", "").strip()
    sfx_map = {"jr": "jr", "jr.": "jr", "junior": "jr", "sr": "sr", "senior": "sr",
               "2nd": "ii", "2": "ii", "ii": "ii", "iii": "iii", "3rd": "iii"}
    sfx = r.get("suffix", "").strip().lower()
    sfx = sfx_map.get(sfx, sfx)
    bd_raw = r.get("birthdate", "").strip()
    bd = bd_raw
    # fixture dates are already yyyy-MM-dd or MM/dd/yyyy
    if "/" in bd:
        m, d, y = bd.split("/")
        bd = f"{y}-{int(m):02d}-{int(d):02d}"
    sex = r.get("sex", "").strip().lower()
    sex = "male" if sex.startswith("m") else ("female" if sex.startswith("f") else "")
    city = _norm_city(r.get("city", ""))
    return dict(fn=fn, ln=ln, mn=mn, sfx=sfx, bd=bd, bd_raw=bd_raw, sex=sex, city=city)


# ---- oracle kernels: same structure as the engine's native expressions ------

def _full(fn: str, mn: str, ln: str) -> str:
    return " ".join(x for x in (fn, mn, ln) if x)


def _token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    s0 = " ".join(sorted(ta & tb))
    s1 = f"{s0} {' '.join(sorted(ta - tb))}".strip()
    s2 = f"{s0} {' '.join(sorted(tb - ta))}".strip()
    return max(_ratio(s0, s1), _ratio(s0, s2), _ratio(s1, s2))


def _token_sort_ratio(a: str, b: str) -> float:
    return _ratio(" ".join(sorted(a.split())), " ".join(sorted(b.split())))


def _wratio(a: str, b: str) -> float:
    return max(_ratio(a, b), _token_sort_ratio(a, b), _token_set_ratio(a, b))


def _has_bd(a: dict, b: dict) -> bool:
    return bool((a["bd_raw"] and b["bd_raw"]) or (a["bd"] and b["bd"]))


def _score(a: dict, b: dict, canon: dict[str, str]) -> float:
    """Reference formula (_calculate_match_confidence_optimized +
    _calculate_adaptive_match_confidence, analysis_engine.py:111-191) on
    the engine's native ratio kernels."""
    if a["sex"] and b["sex"] and a["sex"] != b["sex"]:
        return -1000.0
    if a["sfx"] and b["sfx"] and a["sfx"] != b["sfx"]:
        return -1000.0
    fnc_a, fnc_b = canon.get(a["fn"], a["fn"]), canon.get(b["fn"], b["fn"])
    same_canon = fnc_a == fnc_b
    fa = fnc_a if same_canon else a["fn"]
    fb = fnc_b if same_canon else b["fn"]
    fn_r = _ratio(fa, fb)
    mn_r = _ratio(a["mn"], b["mn"])
    full_a, full_b = _full(fa, a["mn"], a["ln"]), _full(fb, b["mn"], b["ln"])
    score = _token_set_ratio(full_a, full_b)
    if (
        _soundex(fa) == _soundex(fb)
        and _soundex(a["ln"]) == _soundex(b["ln"])
        and fn_r > 80
    ):
        score += 40
    if _wratio(full_a, full_b) > 95:
        score += 30
    if a["bd"] and a["bd"] == b["bd"]:
        score += 100
    elif a["bd"] and b["bd"] and a["bd"] != b["bd"]:
        score -= 150
    if a["city"] and b["city"] and a["city"] != b["city"]:
        score -= 30
    if a["mn"] and b["mn"]:
        if len(a["mn"]) > 1 and len(b["mn"]) > 1 and mn_r < 65:
            score -= 80
        elif a["mn"][0] != b["mn"][0]:
            score -= 60
    score = round(score, 4)
    # F2 adaptive name-only gates
    if score <= -1000 or _has_bd(a, b):
        return score
    fn_sim = _ratio(a["fn"], b["fn"])
    if fn_sim < 60 and a["fn"] != b["fn"]:
        return -1000.0
    ln_sim = _ratio(a["ln"], b["ln"])
    if ln_sim < 85 and a["ln"] != b["ln"]:
        return -1000.0
    if (
        a["mn"] and b["mn"] and len(a["mn"]) > 1 and len(b["mn"]) > 1
        and _ratio(a["mn"], b["mn"]) < 80 and a["mn"][0] != b["mn"][0]
    ):
        return -1000.0
    if _ratio(_full(a["fn"], a["mn"], a["ln"]), _full(b["fn"], b["mn"], b["ln"])) < 75:
        return -1000.0
    return float(int(score * 0.9))


def _status(a: dict, b: dict, s: float, lenient: bool = False) -> str | None:
    name_only = (
        not _has_bd(a, b)
        and not (a["sex"] and b["sex"])
        and not (a["city"] and b["city"])
    )
    fuzzy_t = 90 if name_only else 110
    lenient_t = 90 if name_only else 95
    if s > 198:
        return "Exact Match"
    if s > fuzzy_t:
        return "Fuzzy Match"
    if lenient and s > lenient_t:
        return "Fuzzy Match"
    return None


def _oracle_keys(n: dict, canon: dict[str, str]) -> set[str]:
    ks = set()
    if n["fn"] and n["ln"]:
        ks.add(f"FL_{n['fn'].replace(' ', '')}_{n['ln'].replace(' ', '')}")
        ks.add(f"SDX_{_soundex(n['fn'])}_{_soundex(n['ln'])}")
        ks.add(f"FLC_{canon.get(n['fn'], n['fn'])}_{n['ln']}")
    if n["ln"] and n["bd"]:
        ks.add(f"LNBD_{n['ln']}_{n['bd']}")
    parts = [p for p in (n["fn"], n["mn"], n["ln"]) if p]
    if len(parts) > 1:
        ks.add("SSDX_" + "_".join(sorted(_soundex(p) for p in parts)))
    return ks


def _oracle_clusters(rows: list[dict]) -> dict[str, str]:
    canon = _canon_map()
    norm = {r["rid"]: _norm_row(r) for r in rows}
    keys: dict[str, set[str]] = {}
    for rid, n in norm.items():
        for k in _oracle_keys(n, canon):
            keys.setdefault(k, set()).add(rid)
    pairs = set()
    for members in keys.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        s = _score(norm[a], norm[b], canon)
        if _status(norm[a], norm[b], s) is not None:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {rid: find(rid) for rid in parent}


# ---- fixtures ----------------------------------------------------------------

ROWS = [
    # exact dup pair
    dict(rid="r01", first_name="Jose", last_name="Mercado", middle_name="Santos",
         birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
    dict(rid="r02", first_name="Jose", last_name="Mercado", middle_name="Santos",
         birthdate="01/15/1990", city="Boac", sex="Male", suffix=""),
    # nickname swap (Pepe ~ Jose), same last+bdate
    dict(rid="r03", first_name="Pepe", last_name="Mercado", middle_name="Santos",
         birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
    # Ma. -> Maria expansion
    dict(rid="r04", first_name="Ma. Luisa", last_name="Reyes", middle_name="Cruz",
         birthdate="1985-06-02", city="Gasan", sex="F", suffix=""),
    dict(rid="r05", first_name="Maria Luisa", last_name="Reyes", middle_name="Cruz",
         birthdate="1985-06-02", city="Gasan", sex="F", suffix=""),
    # same name, DIFFERENT birthdate -> -150 must keep them apart
    dict(rid="r06", first_name="Carlos", last_name="Lim", middle_name="Tan",
         birthdate="1970-03-03", city="Mogpog", sex="M", suffix=""),
    dict(rid="r07", first_name="Carlos", last_name="Lim", middle_name="Tan",
         birthdate="1979-12-12", city="Mogpog", sex="M", suffix=""),
    # sex conflict -> hard reject
    dict(rid="r08", first_name="Alex", last_name="Santos", middle_name="",
         birthdate="1992-07-07", city="Boac", sex="M", suffix=""),
    dict(rid="r09", first_name="Alex", last_name="Santos", middle_name="",
         birthdate="1992-07-07", city="Boac", sex="F", suffix=""),
    # typo within fuzz threshold
    dict(rid="r10", first_name="Antonio", last_name="Villanueva", middle_name="Garcia",
         birthdate="1988-11-30", city="Sta Cruz", sex="M", suffix=""),
    dict(rid="r11", first_name="Antonoi", last_name="Villanueva", middle_name="Garcia",
         birthdate="1988-11-30", city="Sta Cruz", sex="M", suffix=""),
    # unrelated singleton
    dict(rid="r12", first_name="Zenaida", last_name="Ocampo", middle_name="Flor",
         birthdate="1975-09-09", city="Torrijos", sex="F", suffix=""),
    # ---- F2 name-only records (no birthdate/sex/city): strict gates ----
    dict(rid="r13", first_name="Ricardo", last_name="Delacruz", middle_name="",
         birthdate="", city="", sex="", suffix=""),
    dict(rid="r14", first_name="Ricardo", last_name="Delacruz", middle_name="",
         birthdate="", city="", sex="", suffix=""),
    # one-letter first-name variant: gates pass, 0.9 penalty applies
    dict(rid="r15", first_name="Ricarda", last_name="Delacruz", middle_name="",
         birthdate="", city="", sex="", suffix=""),
    # same last name, very different first name -> adaptive hard reject
    dict(rid="r16", first_name="Bonifacio", last_name="Delacruz", middle_name="",
         birthdate="", city="", sex="", suffix=""),
    # middle-name -80 rule: long dissimilar middles, same bdate
    dict(rid="r17", first_name="Teodoro", last_name="Ramos", middle_name="Santos",
         birthdate="1966-04-04", city="Boac", sex="M", suffix=""),
    dict(rid="r18", first_name="Teodoro", last_name="Ramos", middle_name="Bautista",
         birthdate="1966-04-04", city="Boac", sex="M", suffix=""),
    # city-variant pair: C6 must canonicalize 'Sta. Cruz' == 'Santa Cruz'
    dict(rid="r19", first_name="Imelda", last_name="Torres", middle_name="Reyes",
         birthdate="1981-05-05", city="Sta. Cruz", sex="F", suffix=""),
    dict(rid="r20", first_name="Imelda", last_name="Torres", middle_name="Reyes",
         birthdate="1981-05-05", city="Santa Cruz", sex="F", suffix=""),
    # swapped first/last, name-only: token_set_ratio=100 would fuzzy-match
    # (130 > 90) WITHOUT the F2 gates; adaptive fn-similarity rule rejects
    dict(rid="r21", first_name="Dimaculangan", last_name="Rogelio", middle_name="",
         birthdate="", city="", sex="", suffix=""),
    dict(rid="r22", first_name="Rogelio", last_name="Dimaculangan", middle_name="",
         birthdate="", city="", sex="", suffix=""),
    # widened N3 family (round-3): Christopher ~ Chris via curated lookup —
    # neither prefix (chr) nor part rules produce 'chris', so the curated
    # table is load-bearing for this J4 cluster
    dict(rid="r23", first_name="Christopher", last_name="Magbanua", middle_name="Cruz",
         birthdate="1987-02-02", city="Boac", sex="M", suffix=""),
    dict(rid="r24", first_name="Chris", last_name="Magbanua", middle_name="Cruz",
         birthdate="1987-02-02", city="Boac", sex="M", suffix=""),
    # widened N3 female family: Corazon ~ Cory
    dict(rid="r25", first_name="Corazon", last_name="Dimagiba", middle_name="Luna",
         birthdate="1972-08-08", city="Gasan", sex="F", suffix=""),
    dict(rid="r26", first_name="Cory", last_name="Dimagiba", middle_name="Luna",
         birthdate="1972-08-08", city="Gasan", sex="F", suffix=""),
]


def _spark_clusters(spark):
    df = spark.createDataFrame(pd.DataFrame(ROWS))
    edges, clusters = dedupe_names(spark, df, id_col="rid")
    return (
        {(r["src"], r["dst"]): r["status"] for r in edges.collect()},
        {r["url"]: r["cluster_id"] for r in clusters.collect()},
    )


@pytest.fixture(scope="module")
def result(spark):
    return _spark_clusters(spark)


def test_parity_with_python_oracle(result):
    _, got = result
    want = _oracle_clusters(ROWS)
    assert got == want, (got, want)


def test_seeded_semantics(result):
    edges, clusters = result

    def same(a, b):
        return clusters.get(a, a) == clusters.get(b, b)

    assert same("r01", "r02"), "exact dup (date format variant) must cluster"
    assert same("r01", "r03"), "nickname swap Pepe~Jose must cluster"
    assert same("r04", "r05"), "Ma. -> Maria must cluster"
    assert same("r10", "r11"), "single-typo first name must cluster"
    assert not same("r06", "r07"), "birthdate conflict must NOT cluster"
    assert not same("r08", "r09"), "sex conflict is a hard reject"
    assert "r12" not in clusters, "singleton stays unclustered"
    # F2 adaptive name-only semantics
    assert same("r13", "r14"), "identical name-only records must cluster"
    assert not same("r13", "r16"), "name-only far first names: adaptive reject"
    assert not same("r21", "r22"), (
        "swapped first/last name-only records score 130 via token_set but "
        "the F2 first-name gate must hard-reject"
    )
    # C6 city canonicalization feeds the -30 conflict term
    assert same("r19", "r20"), "Sta. Cruz == Santa Cruz after C6 canon"
    # round-3 widened N3 families (J4 recall through the curated table)
    assert same("r23", "r24"), "Christopher ~ Chris must cluster (N3)"
    assert same("r25", "r26"), "Corazon ~ Cory must cluster (N3)"


def test_adaptive_penalty_and_status(result):
    """r13~r15 (name-only, near first names) must carry the 0.9-truncated
    adaptive score and the shifted fuzzy threshold (90, not 110)."""
    edges, _ = result
    canon = _canon_map()
    a, b = _norm_row(ROWS[12]), _norm_row(ROWS[14])  # r13, r15
    want = _score(a, b, canon)
    assert want == float(int(want))  # int-truncated by the adaptive path
    assert _status(a, b, want) is not None


def test_middle_name_far_penalty(result):
    """r17/r18: both long middles, ratio<65 -> -80 (not -60)."""
    edges, clusters = result
    canon = _canon_map()
    a, b = _norm_row(ROWS[16]), _norm_row(ROWS[17])
    s = _score(a, b, canon)
    # components: token_set + phonetic(40) + wratio? + bdate(100) - 80
    ts = _token_set_ratio(
        _full(a["fn"], a["mn"], a["ln"]), _full(b["fn"], b["mn"], b["ln"])
    )
    wr = 30 if _wratio(_full(a["fn"], a["mn"], a["ln"]), _full(b["fn"], b["mn"], b["ln"])) > 95 else 0
    assert s == round(ts + 40 + wr + 100 - 80, 4)
    spark_scores = {(r, c): v for (r, c), v in edges.items()}
    # Spark emitted the same pair iff oracle says matchable
    assert (("r17", "r18") in {k for k in spark_scores}) == (
        _status(a, b, s) is not None
    )


def test_two_table_linkage_names(spark):
    """J3 analog: user records linked against a master table via shared
    blocking keys (/root/reference/analysis_engine.py:439-449)."""
    from name_deduplication_python_spark.operators.names import (
        blocking_keys,
        candidate_pairs_two_tables_names,
        normalize_records,
        remap_columns,
        score_name_pairs,
    )

    user = spark.createDataFrame(pd.DataFrame(ROWS[:3]))
    master_rows = [
        dict(rid="m01", first_name="Jose", last_name="Mercado", middle_name="Santos",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        dict(rid="m02", first_name="Zoila", last_name="Quinto", middle_name="",
             birthdate="1960-02-02", city="Gasan", sex="F", suffix=""),
    ]
    master = spark.createDataFrame(pd.DataFrame(master_rows))
    fu = normalize_records(remap_columns(user, keep=["rid"]))
    fm = normalize_records(remap_columns(master, keep=["rid"]))
    pairs = candidate_pairs_two_tables_names(
        blocking_keys(fu, "rid"), blocking_keys(fm, "rid")
    )
    both = fu.unionByName(fm)
    edges = score_name_pairs(pairs, both, "rid")
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert ("r01", "m01") in got and ("r02", "m01") in got
    assert all(dst != "m02" for _, dst in got)


def test_remap_aliases(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "FIRST NAME": ["Ana"],
                "SURNAME": ["Cruz"],
                "dob": ["1990-01-01"],
                "MUNCIPALITY": ["Boac"],
                "gender": ["F"],
                "cellphoneno": ["0917"],
            }
        )
    )
    row = remap_columns(df).collect()[0].asDict()
    assert row["first_name"] == "Ana" and row["last_name"] == "Cruz"
    assert row["birthdate"] == "1990-01-01" and row["city"] == "Boac"
    assert row["sex"] == "F" and row["contact_number"] == "0917"
    assert row["middle_name"] == "" and row["suffix"] == ""


def test_full_name_split(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "full_name": [
                    "Mercado, Jose Santos Jr",
                    "Jose Santos Mercado",
                    "Ana Cruz",
                    "Reyes, Maria",
                ]
            }
        )
    )
    got = split_full_name(df).toPandas()
    r0 = got.iloc[0]
    assert (r0["last_name"], r0["first_name"], r0["middle_name"], r0["suffix"]) == (
        "Mercado", "Jose", "Santos", "Jr",
    )
    r1 = got.iloc[1]
    assert (r1["first_name"], r1["middle_name"], r1["last_name"]) == (
        "Jose", "Santos", "Mercado",
    )
    r2 = got.iloc[2]
    assert (r2["first_name"], r2["last_name"], r2["middle_name"]) == ("Ana", "Cruz", "")
    r3 = got.iloc[3]
    assert (r3["last_name"], r3["first_name"]) == ("Reyes", "Maria")


def test_pair_tester_helper(spark):
    """F5 quick pair tester (analysis_engine.py:198-231 analog)."""
    from name_deduplication_python_spark.operators.names import test_name_pair

    score, status = test_name_pair(
        spark, "Jose", "Mercado", "Pepe", "Mercado",
        birthdate1="1990-01-15", birthdate2="1990-01-15",
    )
    assert status == "Exact Match" and score > 198
    score2, status2 = test_name_pair(spark, "Zenaida", "Ocampo", "Carlos", "Lim")
    assert status2 is None and score2 <= 90


def test_link_tables_multi_pass(spark):
    """F4 orchestration (analysis_engine.py:515-552): three pools, the
    officials pool gets the lenient tier, clusters span tables."""
    from name_deduplication_python_spark.operators.names import link_tables

    u2 = dict(rid="user_2", first_name="Rosalinda", last_name="Cruz", middle_name="A",
              birthdate="1980-02-02", city="Boac", sex="F", suffix="")
    o1 = dict(rid="official_1", first_name="Rosa", last_name="Cruz", middle_name="L",
              birthdate="1980-02-02", city="Boac", sex="F", suffix="")
    # self-validating fixture: the oracle must place this pair strictly in
    # the lenient-only band (95 < s <= 110) — shared LNBD block, +100
    # birthdate, -60 middle-initial, no phonetic/wratio bonus
    canon = _canon_map()
    s = _score(_norm_row(u2), _norm_row(o1), canon)
    assert 95 < s <= 110, s
    assert _status(_norm_row(u2), _norm_row(o1), s, lenient=True) == "Fuzzy Match"
    assert _status(_norm_row(u2), _norm_row(o1), s, lenient=False) is None

    user = spark.createDataFrame(pd.DataFrame([
        dict(rid="user_1", first_name="Jose", last_name="Mercado", middle_name="Santos",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        u2,
    ]))
    master = spark.createDataFrame(pd.DataFrame([
        dict(rid="master_1", first_name="Jose", last_name="Mercado", middle_name="Santos",
             birthdate="1990-01-15", city="Boac", sex="M", suffix=""),
        # same record as the official: the user_master pool has NO lenient
        # tier, so this pair must NOT produce an edge
        dict(rid="master_2", first_name="Rosa", last_name="Cruz", middle_name="L",
             birthdate="1980-02-02", city="Boac", sex="F", suffix=""),
    ]))
    officials = spark.createDataFrame(pd.DataFrame([o1]))
    edges, clusters = link_tables(spark, user, master, officials)
    got = {(r.src, r.dst): (r.pair_type, r.status) for r in edges.collect()}
    assert ("user_1", "master_1") in got
    assert got[("user_1", "master_1")][0] == "user_master"
    lab = {r.url: r.cluster_id for r in clusters.collect()}
    assert lab.get("user_1") == lab.get("master_1")
    # lenient tier catches the officials pair...
    assert got.get(("user_2", "official_1")) == ("user_official", "Fuzzy Match")
    # ...but the SAME record in the master pool (no lenient tier) does not
    assert ("user_2", "master_2") not in got


def test_display_name_expr(spark):
    """C3 presentation formatter (data_utils.py:54-60): capitalize words,
    keep 'Ma.' verbatim, collapse commas/whitespace and float-ints."""
    from name_deduplication_python_spark.operators.names import display_name_expr

    df = spark.createDataFrame(
        [("ma. luisa  reyes",), ("JOSE,SANTOS",), ("1990.0",), ("dela cruz",)],
        "v string",
    )
    got = [r.d for r in df.select(display_name_expr(__import__('pyspark.sql.functions', fromlist=['col']).col("v")).alias("d")).collect()]
    assert got == ["Ma. Luisa Reyes", "Jose Santos", "1990", "Dela Cruz"]


def test_officials_extra_columns_first_class(spark):
    """Reference officials tables project extra columns (Position,
    Barangay — data_utils.py:297,311). remap_columns(officials=True) maps
    them FIRST-CLASS (alias-resolved, '' when absent), they survive
    normalize_records, and they ride into report output via the feature
    join."""
    import pandas as pd

    from name_deduplication_python_spark.operators.names import (
        link_tables,
        normalize_records,
        remap_columns,
    )

    # alias-form headers, as a real officials CSV would carry them
    rows = pd.DataFrame([
        dict(rid="official_1", FirstName="Jose", LastName="Mercado",
             MiddleName="", Birthdate="1990-01-15", City="Boac", Sex="M",
             Position="Chairman", Brgy="Poblacion"),
        dict(rid="official_2", FirstName="Ana", LastName="Reyes",
             MiddleName="", Birthdate="1985-06-02", City="Gasan", Sex="F",
             Position="Kagawad", Brgy="Ipil"),
    ])
    feats = normalize_records(
        remap_columns(spark.createDataFrame(rows), keep=["rid"], officials=True)
    )
    got = {r.rid: (r.position, r.barangay) for r in feats.collect()}
    assert got == {
        "official_1": ("Chairman", "Poblacion"),
        "official_2": ("Kagawad", "Ipil"),
    }
    assert "_fn" in feats.columns  # normalized features still present
    # a table without the columns materializes them as '' (schema parity)
    bare = remap_columns(
        spark.createDataFrame(
            pd.DataFrame([dict(rid="o3", FirstName="X", LastName="Y")])
        ),
        keep=["rid"],
        officials=True,
    )
    assert {"position", "barangay"} <= set(bare.columns)

    # end-to-end: a user-official match's report row carries both columns
    user = spark.createDataFrame(pd.DataFrame([
        dict(rid="user_1", first_name="Jose", last_name="Mercado",
             middle_name="", birthdate="1990-01-15", city="Boac", sex="M",
             suffix=""),
    ]))
    edges, clusters = link_tables(spark, user, officials=spark.createDataFrame(rows))
    from pyspark.sql import functions as F

    report = clusters.join(
        feats.select("rid", "position", "barangay"),
        clusters["url"] == feats["rid"],
        "left",
    )
    by_url = {r.url: (r.position, r.barangay) for r in report.collect()}
    assert by_url["official_1"] == ("Chairman", "Poblacion")
    lab = {r.url: r.cluster_id for r in clusters.collect()}
    assert lab["user_1"] == lab["official_1"]
