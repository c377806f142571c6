"""Output sinks: CSV / JSON-records / SpreadsheetML "xls".

Analog of the reference formatters (formatters/csv.rb:5-22,
jsonrecords.rb:5-33, excel.rb:5-31, aggregation_json.rb:3-10).
These operate on the *collected* tidy rows — aggregate results are
small by construction (they are grouped rollups); bulk exports of
un-aggregated data should use df.write.* instead (documented path).
"""

from __future__ import annotations

import csv
import io
import json
from typing import Any
from xml.sax.saxutils import escape


def to_csv(header: list[str], rows: list[list]) -> str:
    """formatters/csv.rb:5-22 — header + one row per axis tuple."""
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(header)
    w.writerows(rows)
    return buf.getvalue()


def to_jsonrecords(header: list[str], rows: list[list],
                   as_array: bool = False) -> str:
    """formatters/jsonrecords.rb:5-33 — {data:[{col: val}]} or, with
    ?format=array, {variables:[...], data:[[...]]}."""
    if as_array:
        return json.dumps({"variables": header, "data": rows}, default=str)
    return json.dumps(
        {"data": [dict(zip(header, r)) for r in rows]}, default=str)


def to_xls(header: list[str], rows: list[list]) -> str:
    """formatters/excel.rb:5-31 analog.  Emits SpreadsheetML 2003 —
    plain XML Excel opens natively — so no spreadsheet library is
    required in the runtime image."""
    def cell(v: Any) -> str:
        if v is None:
            return '<Cell><Data ss:Type="String"></Data></Cell>'
        if isinstance(v, bool):
            return f'<Cell><Data ss:Type="Boolean">{int(v)}</Data></Cell>'
        if isinstance(v, (int, float)):
            return f'<Cell><Data ss:Type="Number">{v}</Data></Cell>'
        return f'<Cell><Data ss:Type="String">{escape(str(v))}</Data></Cell>'

    body = "".join(
        "<Row>" + "".join(cell(v) for v in row) + "</Row>"
        for row in [list(header)] + [list(r) for r in rows])
    return (
        '<?xml version="1.0"?>'
        '<Workbook xmlns="urn:schemas-microsoft-com:office:spreadsheet" '
        'xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet">'
        '<Worksheet ss:Name="aggregation"><Table>' + body +
        "</Table></Worksheet></Workbook>")


def to_xlsx(header: list[str], rows: list[list]) -> bytes:
    """Real binary Excel (reference formatters/excel.rb writes binary
    .xls via the spreadsheet gem; the modern equivalent is OOXML
    .xlsx).  A minimal SpreadsheetML-2006 package — a zip of XML parts
    built with the stdlib only (no spreadsheet library in the runtime
    image): workbook + one worksheet, numbers as native number cells,
    strings inline (no shared-strings table needed)."""
    import zipfile

    def cell(ref: str, v: Any) -> str:
        if v is None:
            return f'<c r="{ref}"/>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}'
                f'</t></is></c>')

    def col_ref(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    body = "".join(
        f'<row r="{ri + 1}">' +
        "".join(cell(f"{col_ref(ci)}{ri + 1}", v) for ci, v in enumerate(row)) +
        "</row>"
        for ri, row in enumerate([list(header)] + [list(r) for r in rows]))
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<worksheet xmlns="{ns}"><sheetData>{body}</sheetData></worksheet>')
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org'
        f'/officeDocument/2006/relationships"><sheets>'
        f'<sheet name="aggregation" sheetId="1" r:id="rId1"/></sheets></workbook>')
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>')
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>')
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


XLSX_MIME = ("application/vnd.openxmlformats-officedocument"
             ".spreadsheetml.sheet")


def to_aggregation_json(result: dict) -> str:
    """formatters/aggregation_json.rb:3-10 — the axes/values contract
    serialized as-is."""
    return json.dumps(result, default=str)
