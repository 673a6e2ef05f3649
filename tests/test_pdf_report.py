"""S7 PDF sink tests: the native PDF 1.4 writer produces a structurally
valid document with the reference's per-section page setup
(/root/reference/excel_converter.py:38-55 — Dashboard landscape
fit-to-one-page, User File Data portrait multi-page, Analysis Report
landscape multi-page, one combined file)."""

from __future__ import annotations

import re
import zlib

from name_deduplication_python_spark.operators.pdf_report import (
    dashboard_df,
    export_pdf_report,
)


def _write(spark, tmp_path, n_user_rows=5, section_limit=2000):
    dash = dashboard_df(
        spark, {"total": 8, "unique": 3, "in_dup_clusters": 5, "n_clusters": 4}
    )
    user = spark.createDataFrame(
        [(f"u{i}", f"Document body (parens) & back\\slash {i}") for i in range(n_user_rows)],
        "url string, text string",
    )
    report = spark.createDataFrame(
        [("a1", "g1", "Exact Match"), ("b1", "g2", "Fuzzy Match")],
        "url string, group_id string, remark string",
    )
    path = str(tmp_path / "report.pdf")
    export_pdf_report(
        [("Dashboard", dash), ("User File Data", user), ("Analysis Report", report)],
        path,
        section_limit=section_limit,
    )
    with open(path, "rb") as f:
        return f.read()


def _pages(data: bytes) -> list[bytes]:
    return re.findall(rb"<< /Type /Page /Parent.*?>>", data, re.S)


def _decoded_text(data: bytes) -> bytes:
    out = b""
    for m in re.finditer(rb"stream\n(.*?)\nendstream", data, re.S):
        out += zlib.decompress(m.group(1))
    return out


def test_pdf_structure_valid(spark, tmp_path):
    data = _write(spark, tmp_path)
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    # startxref points at the xref table
    at = int(data[data.rindex(b"startxref") :].split()[1])
    assert data[at : at + 4] == b"xref"
    # every xref offset points at the matching "N 0 obj" header
    xref = data[at:].split(b"\n")
    n = int(xref[1].split()[1])
    for i, line in enumerate(xref[3 : 2 + n]):  # skip the free-list entry
        off = int(line.split()[0])
        assert data[off:].startswith(b"%d 0 obj" % (i + 1))
    # exactly one catalog, one font, one pages tree
    assert data.count(b"/Type /Catalog") == 1
    assert data.count(b"/BaseFont /Courier") == 1
    kids = re.search(rb"/Kids \[(.*?)\]", data, re.S).group(1)
    assert len(re.findall(rb"\d+ 0 R", kids)) == len(_pages(data))


def test_reference_page_setup(spark, tmp_path):
    data = _write(spark, tmp_path)
    pages = _pages(data)
    assert len(pages) == 3  # small sections: one page each
    # Dashboard + Analysis Report landscape, User File Data portrait
    assert b"[0 0 792 612]" in pages[0]
    assert b"[0 0 612 792]" in pages[1]
    assert b"[0 0 792 612]" in pages[2]
    # no unresolved placeholders anywhere
    assert b"PAGES" not in data and b"FONT" not in data


def test_text_content_and_escaping(spark, tmp_path):
    text = _decoded_text(_write(spark, tmp_path))
    for expected in (b"Dashboard", b"User File Data", b"Analysis Report",
                     b"in_dup_clusters", b"Fuzzy Match"):
        assert expected in text
    # parens and backslashes escaped in literal strings
    assert b"\\(parens\\)" in text
    assert b"back\\\\slash" in text


def test_multipage_and_truncation(spark, tmp_path):
    data = _write(spark, tmp_path, n_user_rows=200, section_limit=150)
    pages = _pages(data)
    assert len(pages) > 3  # portrait section spilled over pages
    text = _decoded_text(data)
    assert b"User File Data \\(cont.\\)" in text
    assert b"first 150 rows shown" in text
    # Dashboard still fits one page: exactly one landscape page before
    # the first portrait page
    assert b"[0 0 792 612]" in pages[0] and b"[0 0 612 792]" in pages[1]


def test_pipeline_export_pdf(spark, tmp_path):
    """DedupPipeline.export_pdf renders the run's three sections off the
    real clusters stage table."""
    import re

    from name_deduplication_python_spark.pipeline import (
        DedupConfig, DedupPipeline,
    )
    from name_deduplication_python_spark.sources.corpus import (
        corpus_to_spark, generate_corpus,
    )

    pages, _ = generate_corpus(n_base=40, seed=7)
    pipe = DedupPipeline(spark, str(tmp_path / "wd"), DedupConfig())
    pipe.run(corpus_to_spark(spark, pages))
    path = pipe.export_pdf(str(tmp_path / "run.pdf"), sample_rows=100)
    data = open(path, "rb").read()
    assert data.startswith(b"%PDF-1.4") and data.rstrip().endswith(b"%%EOF")
    text = _decoded_text(data)
    for expected in (b"Dashboard", b"n_clusters", b"Analysis Report"):
        assert expected in text
    assert len(re.findall(rb"/Type /Page /Parent", data)) >= 3


def test_fit_one_page_clip_is_disclosed(spark, tmp_path):
    """A fit-to-one-page section that cannot fit even at the font floor
    discloses the clip with a footer instead of silently truncating."""
    big = spark.createDataFrame(
        [(f"metric_{i:03d}", str(i)) for i in range(300)],
        "metric string, value string",
    )
    path = str(tmp_path / "clip.pdf")
    export_pdf_report([("Dashboard", big)], path)
    data = open(path, "rb").read()
    assert len(_pages(data)) == 1
    text = _decoded_text(data)
    assert b"more rows clipped to fit page" in text
