"""Minimal dependency-free XLSX writer (stdlib zipfile + XML).

The reference exports the final table via openpyxl with auto-sized columns
and a summary sheet (pdf_data_to_table.py:287-362). openpyxl does not ship
in this container, but .xlsx is just a zip of OOXML parts — this module
writes exactly the subset the reference's export uses: multiple sheets,
inline strings, and per-column widths. Readable by Excel/LibreOffice/
pandas; verified in tests by unzipping and parsing the sheet XML.

Deliberately NOT a general spreadsheet library: one string cell type
(everything str()-ified like the reference's ``str(cell.value)`` width
pass), no styles, no formulas.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

import pandas as pd

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _col_letter(i: int) -> str:
    """0-based column index → A, B, …, Z, AA, …"""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _sheet_xml(df: pd.DataFrame, widths: list[float]) -> str:
    cols = "".join(
        f'<col min="{i + 1}" max="{i + 1}" width="{w:g}" customWidth="1"/>'
        for i, w in enumerate(widths)
    )
    rows = []
    header = "".join(
        f'<c r="{_col_letter(j)}1" t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(str(c))}</t></is></c>"
        for j, c in enumerate(df.columns)
    )
    rows.append(f'<row r="1">{header}</row>')
    for ri, (_idx, row) in enumerate(df.iterrows(), start=2):
        cells = "".join(
            f'<c r="{_col_letter(j)}{ri}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
            for j, v in enumerate(row)
        )
        rows.append(f'<row r="{ri}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<cols>{cols}</cols><sheetData>{''.join(rows)}</sheetData></worksheet>"
    )


def auto_widths(df: pd.DataFrame, lo: int = 10, hi: int = 100) -> list[float]:
    """The reference's width rule (pdf_data_to_table.py:305-310):
    max(len(str(cell))) over header+cells, clamped to [10, 100]."""
    out = []
    for c in df.columns:
        length = max(
            [len(str(c))] + [len(str(v)) for v in df[c].fillna("")]
        ) if len(df) else len(str(c))
        out.append(float(min(max(length, lo), hi)))
    return out


def write_xlsx(path: str, sheets: list[tuple[str, pd.DataFrame, list[float] | None]]
               ) -> None:
    """Write sheets = [(name, dataframe, widths-or-None)] to ``path``."""
    overrides = []
    wb_sheets = []
    wb_rels = []
    parts = []
    for i, (name, df, widths) in enumerate(sheets, start=1):
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
        )
        wb_sheets.append(
            f'<sheet name="{escape(name, {chr(34): "&quot;"})}" '
            f'sheetId="{i}" r:id="rId{i}"/>'
        )
        wb_rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
        )
        parts.append(
            (f"xl/worksheets/sheet{i}.xml",
             _sheet_xml(df, widths if widths is not None else auto_widths(df)))
        )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml",
                   _CONTENT_TYPES.format(sheet_overrides="".join(overrides)))
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml",
                   _WORKBOOK.format(sheets="".join(wb_sheets)))
        z.writestr("xl/_rels/workbook.xml.rels",
                   _WORKBOOK_RELS.format(rels="".join(wb_rels)))
        for name, xml in parts:
            z.writestr(name, xml)


def read_xlsx_sheet(path: str, sheet_index: int = 1) -> tuple[pd.DataFrame, list[float]]:
    """Test-side reader: parse one sheet's XML back into (DataFrame,
    column widths). Inline-string cells only (what write_xlsx emits)."""
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        xml = z.read(f"xl/worksheets/sheet{sheet_index}.xml")
    root = ET.fromstring(xml)
    widths = [
        float(c.get("width")) for c in root.findall("m:cols/m:col", ns)
    ]
    rows = []
    for row in root.findall("m:sheetData/m:row", ns):
        rows.append([
            (c.find("m:is/m:t", ns).text or "")
            if c.find("m:is/m:t", ns) is not None else ""
            for c in row.findall("m:c", ns)
        ])
    header, data = rows[0], rows[1:]
    return pd.DataFrame(data, columns=header), widths
