"""Golden-workbook test for the stdlib xlsx decoder (S2 byte path):
hand-built xlsx zip (independent of the decoder) → binaryFile source →
mapInPandas decode → grid → full Day-Docket parse, end-to-end in this
container with no Excel library."""

from __future__ import annotations

import datetime
import io
import zipfile
from decimal import Decimal

from xero_api_etl_utilities_spark.operators.daydocket import day_summary, parse_charges
from xero_api_etl_utilities_spark.sources.excel_grid import (
    decode_xlsx_grid,
    read_workbook_grids,
)

_WB_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
  <sheets>
    <sheet name="Front" sheetId="1" r:id="rId1"/>
    <sheet name="A4 Summary" sheetId="2" r:id="rId2"/>
  </sheets>
</workbook>"""

_RELS_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
  <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""


def _xlsx_bytes(rows: dict[int, dict[str, object]]) -> bytes:
    """Build a minimal two-sheet workbook; ``rows`` populates the
    'A4 Summary' sheet. Strings go through the shared-string table
    (t="s") except ones prefixed 'inline:' (t="inlineStr"); numbers
    are typeless numeric cells — the three cell forms a real Excel
    writer emits."""
    sst: list[str] = []
    row_xml = []
    for r in sorted(rows):
        cells = []
        for col, v in sorted(rows[r].items()):
            ref = f"{col}{r}"
            if isinstance(v, str) and v.startswith("inline:"):
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{v[7:]}</t></is></c>'
                )
            elif isinstance(v, str):
                sst.append(v)
                cells.append(f'<c r="{ref}" t="s"><v>{len(sst) - 1}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        row_xml.append(f'<row r="{r}">{"".join(cells)}</row>')
    sheet2 = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(row_xml)}</sheetData></worksheet>'
    )
    sst_xml = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{s}</t></si>" for s in sst)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", _WB_XML)
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS_XML)
        zf.writestr("xl/sharedStrings.xml", sst_xml)
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s">'
            "<v>0</v></c></row></sheetData></worksheet>",
        )
        zf.writestr("xl/worksheets/sheet2.xml", sheet2)
    return buf.getvalue()


_DD01_ROWS = {
    3: {"B": 45292},
    15: {"D": 1.25},
    21: {"C": "Amount"},
    22: {"C": 100.5, "D": "10-643", "E": 12, "F": "inline:note a"},
    23: {"C": 0.004},
    25: {"C": 59.5},
    26: {"C": "Amount"},
    27: {"C": -40, "D": "10643", "E": 7},
    28: {"D": "Total Charges"},
    31: {"F": "Total Debtors", "G": 120},
}


def test_decode_xlsx_grid_values():
    got = dict(decode_xlsx_grid(_xlsx_bytes(_DD01_ROWS), "A4 Summary"))
    assert got[3][1] == "45292"          # numeric passthrough
    assert got[21][2] == "Amount"        # shared string
    assert got[22][3] == "10-643"
    assert got[22][5] == "note a"        # inline string
    assert got[27][2] == "-40"
    assert got[4] == [None] * 7          # absent row materialized
    assert max(got) == 31 and len(got) == 31


def test_read_workbook_grids_end_to_end(spark, tmp_path):
    (tmp_path / "DD 01.xlsx").write_bytes(_xlsx_bytes(_DD01_ROWS))
    dd02 = {
        3: {"B": 45293},
        21: {"C": "Amount"},
        22: {"C": 10, "D": 1},
        26: {"C": "Amount"},
        28: {"D": "Total Charges"},
        31: {"A": "Total Debtors", "G": 999},
    }
    (tmp_path / "DD 02.xlsx").write_bytes(_xlsx_bytes(dd02))
    # filename contract: non-DD files never reach the decoder
    (tmp_path / "notes.xlsx").write_bytes(b"not a workbook")

    grid = read_workbook_grids(spark, str(tmp_path))
    charges = {
        (r["src_file"], r["section"], r["customer_id"]): r
        for r in parse_charges(grid).collect()
    }
    dashed = charges[("DD 01.xlsx", "charges", "10643")]
    assert dashed["amount"] == Decimal("100.50")
    assert dashed["seq_no"] == "0012"
    assert dashed["notes"] == "note a"
    assert dashed["date"] == datetime.date(2024, 1, 1)

    summaries = {r["src_file"]: r for r in day_summary(grid).collect()}
    assert summaries["DD 01.xlsx"]["is_balanced"] is True
    assert summaries["DD 01.xlsx"]["till_variance"] == Decimal("1.25")
    assert summaries["DD 02.xlsx"]["is_balanced"] is False
    assert summaries["DD 02.xlsx"]["date"] == datetime.date(2024, 1, 2)
