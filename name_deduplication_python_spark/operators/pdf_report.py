"""S7 PDF report sink (closes the SURVEY §2.1 S7 descope).

The reference exports its three report sheets to a single PDF through
desktop Excel COM automation (/root/reference/excel_converter.py:7-81:
Dashboard landscape fit-to-one-page, "User File Data" portrait
multi-page, "Analysis Report" landscape multi-page, one combined PDF).
COM is a Windows deployment detail; the *operator semantics* — render
the analysis run's report sections into one print-ready PDF with the
reference's per-section page setup — are engine scope, and this module
implements them natively: a minimal, valid PDF 1.4 writer over stdlib
+ zlib only (no external PDF library in the container).

Spark-first shape: the PDF is a driver-side presentation artifact, the
same boundary as the reference (its Excel/PDF step runs on the desktop
after the engine finishes). Section DataFrames are the engine's small
report/summary tables (dashboard counters, bounded samples of the
cluster report); `section_limit` caps the driver collect so a
mis-pointed terabyte table cannot flatten the driver — the full data
lives in the stage tables (S6), the PDF is the human excerpt.

Layout: Courier (monospace) text pages. Column widths derive from the
data, cells are clipped, rows paginate at the page's line budget.
Landscape fit-to-one-page (Dashboard) shrinks the font until the rows
fit, mirroring Excel's FitToPagesTall=1; multi-page sections keep the
font and spill (FitToPagesTall=False).
"""

from __future__ import annotations

import os
import zlib

from pyspark.sql import DataFrame

# US Letter points, the reference printer default
_PORTRAIT = (612.0, 792.0)
_LANDSCAPE = (792.0, 612.0)
_MARGIN = 36.0
_COURIER_WIDTH = 0.6  # Courier glyph advance = 0.6 em

# reference sheet order + page setup (excel_converter.py:38-55)
DEFAULT_SECTIONS = (
    ("Dashboard", "landscape", True),
    ("User File Data", "portrait", False),
    ("Analysis Report", "landscape", False),
)


def _esc(s: str) -> bytes:
    """PDF literal-string escape; non-latin1 chars degrade to '?' (the
    report text is ASCII-shaped; a full-unicode PDF needs embedded
    fonts, out of scope for a print excerpt)."""
    out = s.encode("latin-1", "replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _table_lines(rows: list[list[str]], header: list[str]) -> list[str]:
    """Monospace table: width per column = longest cell (capped), cells
    clipped, two-space gutters, '-' rule under the header."""
    cap = 40
    cols = len(header)
    widths = [min(cap, len(header[c])) for c in range(cols)]
    for row in rows:
        for c in range(cols):
            cell = row[c] if c < len(row) else ""
            widths[c] = min(cap, max(widths[c], len(cell)))

    def fmt(row: list[str]) -> str:
        return "  ".join(
            (row[c] if c < len(row) else "")[: widths[c]].ljust(widths[c])
            for c in range(cols)
        ).rstrip()

    lines = [fmt(header), "  ".join("-" * w for w in widths)]
    lines.extend(fmt(r) for r in rows)
    return lines


def _paginate(
    title: str, lines: list[str], size: tuple[float, float], fit_one_page: bool
) -> list[tuple[tuple[float, float], float, list[str]]]:
    """-> [(page_size, font_size, page_lines)]. fit_one_page shrinks the
    font (9 -> 4pt floor) until everything fits one page, then clips —
    the FitToPagesWide/Tall=1 analog."""
    w, h = size
    usable_h = h - 2 * _MARGIN - 24  # 24pt title band
    usable_w = w - 2 * _MARGIN
    font = 9.0
    while True:
        leading = font * 1.25
        max_lines = int(usable_h / leading)
        max_chars = int(usable_w / (font * _COURIER_WIDTH))
        clipped = [ln[:max_chars] for ln in lines]
        if not fit_one_page or len(clipped) <= max_lines or font <= 4.0:
            break
        font -= 0.5
    pages = []
    body = clipped if clipped else [""]
    if fit_one_page and len(body) > max_lines:
        # disclose the clip like the section_limit footer does — a
        # fit-to-one-page section must not LOOK complete when it isn't
        n_cut = len(body) - (max_lines - 1)
        body = body[: max_lines - 1] + [f"... {n_cut} more rows clipped to fit page"]
    for i in range(0, len(body), max_lines):
        head = title if i == 0 else f"{title} (cont.)"
        pages.append((size, font, [head, ""] + body[i : i + max_lines]))
    return pages


class _PdfWriter:
    """Just enough PDF 1.4: numbered objects, Flate content streams,
    one Courier font resource, a correct xref + trailer."""

    def __init__(self) -> None:
        self.objs: list[bytes] = []  # bodies; object number = index+1
        self._page_objs: set[int] = set()  # indices safe for ref fix-up

    def add(self, body: bytes) -> int:
        self.objs.append(body)
        return len(self.objs)

    def page(self, size: tuple[float, float], font: float, lines: list[str]) -> int:
        w, h = size
        ops = [b"BT /F1 %.1f Tf %.1f TL" % (font, font * 1.25)]
        # title line sits in the 24pt band above the body
        y0 = h - _MARGIN - 12
        ops.append(b"%.1f %.1f Td" % (_MARGIN, y0))
        for i, ln in enumerate(lines):
            if i:
                ops.append(b"T*")
            if ln:
                ops.append(b"(%s) Tj" % _esc(ln))
        ops.append(b"ET")
        stream = zlib.compress(b"\n".join(ops))
        cid = self.add(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(stream), stream)
        )
        pid = self.add(
            b"<< /Type /Page /Parent PAGES /MediaBox [0 0 %.0f %.0f] "
            b"/Resources << /Font << /F1 FONT >> >> /Contents %d 0 R >>"
            % (w, h, cid)
        )
        self._page_objs.add(pid - 1)
        return pid

    def render(self, page_ids: list[int], title: str) -> bytes:
        font_id = self.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
        )
        kids = b" ".join(b"%d 0 R" % p for p in page_ids)
        pages_id = self.add(
            b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
        )
        catalog_id = self.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
        info_id = self.add(b"<< /Title (%s) >>" % _esc(title))
        # late-bound refs now that ids are known — fixed up ONLY in page
        # dict objects (a compressed content stream can contain the
        # placeholder byte sequences by chance)
        fixed = [
            o.replace(b"PAGES", b"%d 0 R" % pages_id).replace(
                b"FONT", b"%d 0 R" % font_id
            )
            if i in self._page_objs
            else o
            for i, o in enumerate(self.objs)
        ]
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = []
        for i, body in enumerate(fixed):
            offsets.append(len(out))
            out += b"%d 0 obj\n%s\nendobj\n" % (i + 1, body)
        xref_at = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(fixed) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root %d 0 R /Info %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (len(fixed) + 1, catalog_id, info_id, xref_at)
        )
        return bytes(out)


def export_pdf_report(
    sections: list[tuple[str, DataFrame]],
    pdf_path: str,
    title: str = "Analysis Report",
    section_limit: int = 2000,
    layouts: tuple = DEFAULT_SECTIONS,
) -> str:
    """Render report sections into one PDF at pdf_path (S7 analog).

    sections: ordered (name, DataFrame) — the engine's report tables.
    Each section gets the reference page setup when its name matches a
    layouts entry (orientation, fit-to-one-page), else portrait
    multi-page. DataFrames are bounded-collected (limit section_limit +
    1; a '... N rows shown' footer marks truncation) — the PDF is the
    human excerpt, the stage tables stay the source of truth.
    """
    setup = {name: (orient, fit) for name, orient, fit in layouts}
    writer = _PdfWriter()
    page_ids: list[int] = []
    for name, df in sections:
        orient, fit = setup.get(name, ("portrait", False))
        size = _LANDSCAPE if orient == "landscape" else _PORTRAIT
        header = list(df.columns)
        collected = df.limit(section_limit + 1).collect()
        trunc = len(collected) > section_limit
        # newlines inside a cell are legal in a PDF literal string but
        # break the one-row-per-line table layout — flatten to spaces
        rows = [
            ["" if v is None else str(v).replace("\n", " ") for v in r]
            for r in collected[:section_limit]
        ]
        lines = _table_lines(rows, header)
        if trunc:
            lines.append(f"... first {section_limit} rows shown")
        for psize, font, plines in _paginate(name, lines, size, fit):
            page_ids.append(writer.page(psize, font, plines))
    data = writer.render(page_ids, title)
    os.makedirs(os.path.dirname(os.path.abspath(pdf_path)), exist_ok=True)
    with open(pdf_path, "wb") as f:
        f.write(data)
    return pdf_path


def dashboard_df(spark, summary: dict) -> DataFrame:
    """The reference Dashboard sheet is counter rows (analysis_engine
    summary); same shape here from Pipeline.summary()'s dict."""
    rows = [(str(k), str(v)) for k, v in summary.items()]
    return spark.createDataFrame(rows, "metric string, value string")
