"""Tests: readers (S1/P4), nickname generation (N1-N6), text stats."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from name_deduplication_python_spark.functions.nicknames import (
    apply_overrides,
    generate_nicknames_py,
    nickname_generation,
)
from name_deduplication_python_spark.functions.text_stats import (
    bpe_token_estimate,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from name_deduplication_python_spark.sources.readers import (
    read_table,
    with_row_provenance,
)


def test_read_csv_permissive_drops_allnull(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text('a,b\n1,x\n,,\n2,"y,z"\n,\n')
    df = read_table(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2
    assert rows[1]["b"] == "y,z"  # quoted separator survives
    assert dict(df.dtypes)["a"] == "string"  # string-typed like the reference


def test_read_tsv_and_excel(spark, tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("a\tb\n1\tx\n")
    assert read_table(spark, str(p)).count() == 1
    with pytest.raises(NotImplementedError, match="xls"):
        read_table(spark, str(tmp_path / "x.xls"))


def _write_min_xlsx(path, header, rows):
    """Hand-rolled minimal xlsx (zip of XML) — S2 fixture."""
    import zipfile

    strings: list[str] = []

    def sref(s):
        strings.append(s)
        return len(strings) - 1

    def cell_ref(r, c):
        col = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            col = chr(65 + rem) + col
        return f"{col}{r + 1}"

    body = []
    for ri, row in enumerate([header] + rows):
        cells = []
        for ci, v in enumerate(row):
            if isinstance(v, (int, float)):
                cells.append(f'<c r="{cell_ref(ri, ci)}"><v>{v}</v></c>')
            elif v is None:
                continue
            else:
                cells.append(
                    f'<c r="{cell_ref(ri, ci)}" t="s"><v>{sref(v)}</v></c>'
                )
        body.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    sst = f'<sst xmlns="{ns}">' + "".join(
        f"<si><t>{s}</t></si>" for s in strings
    ) + "</sst>"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def test_read_xlsx_roundtrip(spark, tmp_path):
    """S2: native stdlib xlsx scan — shared strings, numerics rendered as
    text (dtype=str parity), sparse cells, all-empty rows dropped."""
    p = str(tmp_path / "t.xlsx")
    _write_min_xlsx(
        p,
        ["First Name", "Last Name", "Age"],
        [
            ["Jose", "Mercado", 31],
            ["Ana", None, 28.0],
            ["", "", None],          # all-empty -> dropped (P4)
            ["Ma. Luisa", "Reyes", 40],
        ],
    )
    df = read_table(spark, p)
    got = df.toPandas()
    assert list(got.columns) == ["First Name", "Last Name", "Age"]
    assert len(got) == 3
    assert dict(df.dtypes)["Age"] == "string"
    assert got.iloc[0]["Age"] == "31"
    assert got.iloc[1]["Age"] == "28"   # 28.0 -> '28' like dtype=str ints
    assert got.iloc[2]["First Name"] == "Ma. Luisa"


def test_row_provenance(spark):
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    out = with_row_provenance(df, "userfile").toPandas()
    assert set(out["src_table"]) == {"userfile"}
    assert out["src_row_id"].nunique() == 2


def test_nickname_rules():
    assert "joey" in generate_nicknames_py("Jose")          # N3 curated
    assert "rob" in generate_nicknames_py("Robney")         # N1 prefix 3
    assert "jo" in generate_nicknames_py("Jovito")          # N1 prefix 2
    assert "bert" in generate_nicknames_py("Gilbert")       # N2 part
    assert "kristian" in generate_nicknames_py("Christian") # N4 phonetic
    multi = generate_nicknames_py("Maria Luisa")
    assert set(multi) == {"maria", "luisa"}                 # N5 multi-word
    assert generate_nicknames_py("Ma. Luisa") == ["luisa", "maria"]
    assert generate_nicknames_py("") == []
    assert all(len(n) >= 2 for n in generate_nicknames_py("Al"))


def test_nickname_core_prefix_rules():
    """N2 core/prefix families (nickname_generator.py:203-231)."""
    assert "leo" in generate_nicknames_py("Leonardo")
    assert "vic" in generate_nicknames_py("Victorino")
    assert "ric" in generate_nicknames_py("Federico")   # infix
    assert "greg" in generate_nicknames_py("Gregorio")
    assert "ben" in generate_nicknames_py("Benigno")
    assert "chard" in generate_nicknames_py("Richard")
    assert "wena" in generate_nicknames_py("Rowena")
    assert "mar" in generate_nicknames_py("Marlon")
    assert "noel" in generate_nicknames_py("Noelito")


def test_nickname_lyn_and_ann_and_maria_split():
    """N2 -lyn/-lynn split, N5 'X Ann'->Xn and maria*-split."""
    got = generate_nicknames_py("Jocelyn")
    assert "lyn" in got and "joce" in got               # stem len>=4 kept
    got2 = generate_nicknames_py("Marilyn")
    assert "lyn" in got2 and "mari" in got2
    assert "lovelyn" in generate_nicknames_py("Lovely Ann")
    assert "lovelyn" in generate_nicknames_py("Lovely Anne")
    mf = generate_nicknames_py("Mariafe")
    assert "maria" in mf and "fe" in mf
    # filter: non-alphabetic and single-char candidates never emitted
    assert all(n.isalpha() and len(n) >= 2 for n in mf)


def test_nickname_generation_spark_and_overrides(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"formal_name": ["Jose", "Gilbert", "Unknownxyz"]})
    )
    gen = nickname_generation(df)
    got = gen.toPandas()
    assert ("joey", "jose") in set(zip(got.nickname, got.formal_name))
    ov = spark.createDataFrame(
        [("pepito", "jose")], "nickname string, formal_name string"
    )
    merged = apply_overrides(gen, ov).toPandas()
    jose_nicks = set(merged[merged.formal_name == "jose"]["nickname"])
    assert jose_nicks == {"pepito"}  # override replaces generated set
    assert "gilbert" in set(merged.formal_name)


def test_curated_family_golden_pairs():
    """Round-3 widened N3 table: one golden nickname per family across the
    newly-covered groups (VERDICT r2 'common families absent')."""
    golden = [
        ("Alexander", "alex"), ("Alejandro", "alex"), ("Christopher", "chris"),
        ("Corazon", "cora"), ("Concepcion", "connie"), ("Rodrigo", "rudy"),
        ("Manuel", "manny"), ("Emmanuel", "noel"), ("Vicente", "enteng"),
        ("Salvador", "badong"), ("Teodoro", "teddy"), ("Guillermo", "willy"),
        ("Rosario", "charo"), ("Remedios", "remy"), ("Milagros", "mila"),
        ("Dolores", "dolly"), ("Josefina", "josie"), ("Margarita", "rita"),
        ("William", "bill"), ("Richard", "dick"), ("Charles", "chuck"),
        ("Benjamin", "benjie"), ("Imelda", "meldy"), ("Lourdes", "lulu"),
        ("Nicolas", "kulas"), ("Federico", "fred"), ("Esperanza", "espie"),
    ]
    for formal, nick in golden:
        assert nick in generate_nicknames_py(formal), (formal, nick)
    from name_deduplication_python_spark.functions.nicknames import CURATED

    assert len(CURATED) >= 60  # reference-comparable coverage (~100 there)


def test_load_overrides_csv_roundtrip(spark, tmp_path):
    """N6 file workflow: overrides CSV -> load -> generation precedence."""
    from name_deduplication_python_spark.functions.nicknames import (
        load_overrides,
        nickname_generation,
    )

    p = tmp_path / "overrides.csv"
    p.write_text(
        "formal_name,nicknames\n"
        "Jose,\"pepito;joseboy\"\n"
        "  MARIA ,mimi\n"
        "empty,\n"          # empty nickname dropped
        "selfsame,selfsame\n"  # nickname==formal dropped
    )
    ov = load_overrides(spark, str(p))
    got = {(r.formal_name, r.nickname) for r in ov.collect()}
    assert got == {("jose", "pepito"), ("jose", "joseboy"), ("maria", "mimi")}

    gen = nickname_generation(
        spark.createDataFrame(pd.DataFrame({"formal_name": ["Jose", "Ana"]}))
    )
    merged = apply_overrides(gen, ov).toPandas()
    assert set(merged[merged.formal_name == "jose"].nickname) == {
        "pepito", "joseboy"
    }


def test_read_xlsx_sheet_order_numeric(spark, tmp_path):
    """sheet10.xml must NOT sort before sheet2.xml (lexicographic trap);
    sheet_index picks by numeric order."""
    import zipfile

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

    def sheet_xml(marker):
        return (
            f'<worksheet xmlns="{ns}"><sheetData>'
            f'<row r="1"><c r="A1" t="inlineStr"><is><t>{marker}</t></is></c></row>'
            f'<row r="2"><c r="A2" t="inlineStr"><is><t>x</t></is></c></row>'
            "</sheetData></worksheet>"
        )

    p = str(tmp_path / "many.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        for i in list(range(1, 12)):
            z.writestr(f"xl/worksheets/sheet{i}.xml", sheet_xml(f"s{i}"))
    from name_deduplication_python_spark.sources.readers import read_xlsx

    # index 1 must be sheet2 (lexicographic would give sheet10)
    assert read_xlsx(spark, p, sheet_index=1).columns == ["s2"]
    assert read_xlsx(spark, p, sheet_index=10).columns == ["s11"]


def test_read_xlsx_scientific_notation(spark, tmp_path):
    """Numeric cells stored in scientific notation render like pandas
    dtype=str (via float), not verbatim."""
    import zipfile

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>v</t></is></c></row>'
        '<row r="2"><c r="A2"><v>1.23E+05</v></c></row>'
        '<row r="3"><c r="A3"><v>1.5e-3</v></c></row>'
        "</sheetData></worksheet>"
    )
    p = str(tmp_path / "sci.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    from name_deduplication_python_spark.sources.readers import read_xlsx

    got = read_xlsx(spark, p).toPandas()["v"].tolist()
    assert got == ["123000", "0.0015"]


def test_text_stats_exprs(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the cat sat on the mat and the dog is here now ok fine",
                    "el perro y el gato que corre en la casa de la madre",
                    "日本語のテキストです",
                    "!!! ??? ###",
                ]
            }
        )
    )
    out = df.select(
        token_count("text").alias("tc"),
        bpe_token_estimate("text").alias("bpe"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        doc_fingerprint("text").alias("fp"),
    ).collect()
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "es"
    assert out[2]["lang"] == "zh/ja/ko"
    assert out[3]["lang"] == "und"
    assert out[0]["bpe"] >= out[0]["tc"]
    assert out[0]["q"] > out[3]["q"]
    # determinism
    out2 = df.select(doc_fingerprint("text").alias("fp")).collect()
    assert [r["fp"] for r in out2] == [r["fp"] for r in out]


def test_gopher_filter_documents(spark):
    """filter_documents keeps a normal English doc and drops the Gopher
    failure modes: too-short, no-stopword token soup, bullet walls."""
    import pandas as pd

    from name_deduplication_python_spark.functions.text_stats import (
        filter_documents,
    )

    good = ("the quick brown fox jumps over the lazy dog and runs to "
            "a river of calm water in the morning light ") * 3
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                good,
                "too short to pass",
                "zx qw er ty ui op as df gh jk " * 10,   # no stopwords
                "\n".join(["- bullet item here we go again"] * 60),
            ],
        }
    )
    df = spark.createDataFrame(rows)
    kept = [r.doc_id for r in filter_documents(df).collect()]
    assert kept == [1]


def test_gopher_alpha_rule_counts_uppercase_words(spark):
    """The Rae et al. rule is 'contains at least one ALPHABETIC char':
    acronyms and all-caps headings are alphabetic words, so an
    acronym-heavy but otherwise normal document must pass the 0.8
    alpha-word floor (a lowercase-only regex silently dropped these)."""
    import pandas as pd

    from name_deduplication_python_spark.functions.text_stats import (
        filter_documents, gopher_flags,
    )

    # >20% of words are all-caps; still a legitimate English document
    caps = ("NASA ESA JAXA ISRO CNSA the agencies SHARE data and the "
            "teams WORK with the labs on a joint PLAN for the mission ") * 3
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [caps]}))
    flags = df.select(
        *[v.alias(k) for k, v in gopher_flags(F.col("text")).items()]
    ).collect()[0]
    assert flags.frac_alpha_words == 1.0
    assert [r.doc_id for r in filter_documents(df).collect()] == [1]


def test_gopher_flags_plan_is_python_free(spark):
    """The quality filter must stay inside whole-stage codegen — no
    Python evaluation node anywhere in the plan (it runs over every
    document of the corpus)."""
    import pandas as pd

    from name_deduplication_python_spark.functions.text_stats import (
        filter_documents,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["the of and words here"]})
    )
    plan = (
        filter_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, plan


def test_c4_line_rules_rewrite_document(spark):
    """C4 line filter (Raffel et al. 2020 §2.2): a line survives iff it
    ends in terminal punctuation, has >= 5 words, and lacks
    'javascript'; the document text is REWRITTEN to the kept lines."""
    import pandas as pd

    from name_deduplication_python_spark.functions.text_stats import (
        c4_clean_cols,
    )

    text = "\n".join(
        [
            "this line ends with a period and stays here.",  # kept
            "short line stays not.",                         # <5 words
            "no terminal punctuation on this line at all",   # no punct
            "this javascript line would otherwise be kept.", # javascript
            'he said "it ends in a quote after punctuation."',  # kept
            "does this question line survive the filter?",   # kept
        ]
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    row = df.select(
        *[v.alias(k) for k, v in c4_clean_cols(F.col("text")).items()]
    ).collect()[0]
    assert row.clean_text.split("\n") == [
        "this line ends with a period and stays here.",
        'he said "it ends in a quote after punctuation."',
        "does this question line survive the filter?",
    ]
    assert row.n_lines_kept == 3 and row.n_lines_dropped == 3
    assert row.n_sentences == 3
    assert row.passes_c4 == 1


def test_c4_page_blockers(spark):
    """Page-level rules: lorem ipsum, curly brace, badword, and the
    three-sentence floor each fail the document independently."""
    import pandas as pd

    from name_deduplication_python_spark.functions.text_stats import (
        c4_clean_cols, c4_clean_documents,
    )

    good = "\n".join(["a good line with five words here."] * 4)
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                good,
                good + "\nsome Lorem Ipsum filler text",
                good + "\nconfig = { key: value }",
                good + "\nbuy cheap viagra online now",
                "only two sentences on this page. second one right here.",
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            *[v.alias(k) for k, v in c4_clean_cols(F.col("text")).items()],
        ).collect()
    }
    assert out[1].passes_c4 == 1
    assert out[2].has_lorem_ipsum == 1 and out[2].passes_c4 == 0
    assert out[3].has_brace == 1 and out[3].passes_c4 == 0
    assert out[4].has_badword == 1 and out[4].passes_c4 == 0
    assert out[5].n_sentences == 2 and out[5].passes_c4 == 0
    kept = c4_clean_documents(df).collect()
    assert [r.doc_id for r in kept] == [1]
    assert kept[0].text == good  # rewrite preserved the clean lines


def test_c4_badword_is_word_boundary(spark):
    """'xxx' must match as a word, not as a substring of a legitimate
    token (the blocklist rule is word-boundary on the lowercased page)."""
    import pandas as pd

    from name_deduplication_python_spark.functions.text_stats import (
        c4_clean_cols,
    )

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the maxxxed out word here is fine and stays okay.",
                "but xxx alone on the page is not fine at all.",
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = {
        r.doc_id: r.has_badword
        for r in df.select(
            "doc_id",
            *[v.alias(k) for k, v in c4_clean_cols(F.col("text")).items()],
        ).collect()
    }
    assert out == {1: 0, 2: 1}


def test_c4_plan_is_python_free(spark):
    """The cleaner runs over every document — it must stay inside
    whole-stage codegen with no Python evaluation node."""
    import pandas as pd

    from name_deduplication_python_spark.functions.text_stats import (
        c4_clean_documents,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["five words end in period."]})
    )
    plan = (
        c4_clean_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, plan
