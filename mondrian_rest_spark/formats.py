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


def to_aggregation_json(result: dict) -> str:
    """formatters/aggregation_json.rb:3-10 — the axes/values contract
    serialized as-is."""
    return json.dumps(result, default=str)
