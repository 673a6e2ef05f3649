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
    bd = r.get("birthdate", "").strip()
    # fixture dates are already yyyy-MM-dd or MM/dd/yyyy
    if "/" in bd:
        m, d, y = bd.split("/")
        bd = f"{y}-{int(m):02d}-{int(d):02d}"
    sex = r.get("sex", "").strip().lower()
    sex = "male" if sex.startswith("m") else ("female" if sex.startswith("f") else "")
    city = r.get("city", "").strip().lower()
    return dict(fn=fn, ln=ln, mn=mn, sfx=sfx, bd=bd, sex=sex, city=city)


def _score(a: dict, b: dict, canon: dict[str, str]) -> float:
    if a["sex"] and b["sex"] and a["sex"] != b["sex"]:
        return -1000.0
    if a["sfx"] and b["sfx"] and a["sfx"] != b["sfx"]:
        return -1000.0
    fnc_a, fnc_b = canon.get(a["fn"], a["fn"]), canon.get(b["fn"], b["fn"])
    fn_r = max(_ratio(a["fn"], b["fn"]), _ratio(fnc_a, fnc_b))
    ln_r = _ratio(a["ln"], b["ln"])
    mn_r = _ratio(a["mn"], b["mn"])
    full_r = _ratio(
        " ".join(x for x in (a["fn"], a["mn"], a["ln"]) if x),
        " ".join(x for x in (b["fn"], b["mn"], b["ln"]) if x),
    )
    score = 0.6 * fn_r + 0.4 * mn_r + 0.5 * ln_r + 0.5 * full_r
    if (
        _soundex(a["fn"]) == _soundex(b["fn"])
        and _soundex(a["ln"]) == _soundex(b["ln"])
        and fn_r > 80
    ):
        score += 40
    if a["bd"] and a["bd"] == b["bd"]:
        score += 100
    elif a["bd"] and b["bd"] and a["bd"] != b["bd"]:
        score -= 150
    if a["city"] and b["city"] and a["city"] != b["city"]:
        score -= 30
    if a["mn"] and b["mn"] and a["mn"][0] != b["mn"][0]:
        score -= 60
    return score


def _oracle_clusters(rows: list[dict]) -> dict[str, str]:
    canon = _canon_map()
    norm = {r["rid"]: _norm_row(r) for r in rows}
    # blocking: FL, SDX, LNBD/FL, FLC keys — mirror the Spark key set
    keys: dict[str, set[str]] = {}
    for rid, n in norm.items():
        ks = {
            f"FL_{n['fn']}_{n['ln']}",
            f"SDX_{_soundex(n['fn'])}_{_soundex(n['ln'])}",
            (f"LNBD_{n['ln']}_{n['bd']}" if n["bd"] else f"FL_{n['fn']}_{n['ln']}"),
            f"FLC_{canon.get(n['fn'], n['fn'])}_{n['ln']}",
        }
        for k in ks:
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
        if _score(norm[a], norm[b], canon) > THRESH_FUZZY:
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
