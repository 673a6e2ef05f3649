"""S9 report re-scan: sectioned 'Analysis Report' sheet -> DataFrames.

Fixture workbooks are hand-rolled stdlib zips (an xlsx IS a zip of XML)
including xl/workbook.xml so sheet-NAME resolution is exercised, the
part the reference requires (/root/reference/auditor.py:190-207).
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

import pytest

from name_deduplication_python_spark.sources.readers import load_report_sections

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _sheet_xml(rows: list[list[str | None]], strings: list[str]) -> str:
    def sref(s: str) -> int:
        strings.append(s)
        return len(strings) - 1

    def ref(r: int, c: int) -> str:
        col = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            col = chr(65 + rem) + col
        return f"{col}{r + 1}"

    body = []
    for ri, row in enumerate(rows):
        cells = [
            f'<c r="{ref(ri, ci)}" t="s"><v>{sref(v)}</v></c>'
            for ci, v in enumerate(row)
            if v is not None
        ]
        body.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
    return f'<worksheet xmlns="{_NS}"><sheetData>{"".join(body)}</sheetData></worksheet>'


def _write_report_xlsx(path: str, sheets: dict[str, list[list[str | None]]]) -> None:
    strings: list[str] = []
    sheet_parts = {
        f"xl/worksheets/sheet{i + 1}.xml": _sheet_xml(rows, strings)
        for i, (_, rows) in enumerate(sheets.items())
    }
    wb = (
        f'<workbook xmlns="{_NS}"><sheets>'
        + "".join(
            f'<sheet name="{name}" sheetId="{i + 1}"/>'
            for i, name in enumerate(sheets)
        )
        + "</sheets></workbook>"
    )
    sst = (
        f'<sst xmlns="{_NS}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        for part, xml in sheet_parts.items():
            z.writestr(part, xml)
        z.writestr("xl/sharedStrings.xml", sst)


REPORT_ROWS: list[list[str | None]] = [
    ["Run summary", None],
    [None],
    ["--- Officials Found in Masterlist ---"],
    ["First Name", "Last Name", "Position", "", ""],  # trailing empties trimmed
    ["Jose", "Mercado", "Mayor"],
    ["Ana", "Reyes", None],  # short row -> '' fill
    [None],  # blank row terminates the section
    ["stray note outside any section"],
    ["--- Mystery Section ---"],  # unknown -> skipped entirely
    ["colA", "colB"],
    ["x", "y"],
    ["--- Duplicates Found (beneficiaries) ---"],
    ["Group", "Full Name"],
    ["1", "Jose Mercado"],
    ["1", "Jose M. Mercado"],
]


def test_load_report_sections_reference_semantics(spark, tmp_path):
    p = str(tmp_path / "report.xlsx")
    _write_report_xlsx(
        p, {"Cover": [["not", "a", "report"]], "Analysis Report": REPORT_ROWS}
    )
    sections = load_report_sections(spark, p)
    assert set(sections) == {"officials", "dedupe"}  # unknown+empty skipped
    off = sections["officials"]
    assert off.columns == ["First Name", "Last Name", "Position"]
    got = [tuple(r) for r in off.orderBy("First Name").collect()]
    assert got == [("Ana", "Reyes", ""), ("Jose", "Mercado", "Mayor")]
    dd = sections["dedupe"]
    assert dd.columns == ["Group", "Full Name"]
    assert dd.count() == 2
    assert all(f.dataType.simpleString() == "string" for f in dd.schema.fields)


def test_load_report_sections_missing_sheet_errors(spark, tmp_path):
    p = str(tmp_path / "other.xlsx")
    _write_report_xlsx(p, {"Sheet1": [["a"], ["1"]]})
    with pytest.raises(ValueError, match="Analysis Report"):
        load_report_sections(spark, p)


def test_load_report_sections_section_at_eof(spark, tmp_path):
    """A section whose data runs to the last row must still parse."""
    p = str(tmp_path / "eof.xlsx")
    _write_report_xlsx(
        p,
        {
            "Analysis Report": [
                ["--- Linked Records (masterlist <-> officials) ---"],
                ["Left", "Right"],
                ["a", "b"],
            ]
        },
    )
    sections = load_report_sections(spark, p)
    assert list(sections) == ["linking"]
    assert [tuple(r) for r in sections["linking"].collect()] == [("a", "b")]
