"""S10 — stdlib .xlsx reader/writer (no openpyxl/xlrd required).

The reference round-trips spreadsheets with xlrd/xlwt
(/root/reference/getDirection.py:62-120, /root/reference/getGeocode.py:56-99:
open an ``.xlsx`` workbook, walk rows/cells, write results back out). An
``.xlsx`` file is just a ZIP of SpreadsheetML XML parts, so the whole
round-trip is expressible with :mod:`zipfile` + :mod:`xml.etree` — both in
the standard library — which makes S10 fully testable in this container.

Reader coverage: shared strings (``t="s"``), inline strings
(``t="inlineStr"``), cached formula strings (``t="str"``), booleans
(``t="b"``), numbers (int when integral), sparse rows (missing cells filled
with None via the ``r`` cell-reference attribute), sheet selection by index
or name. Writer emits inline-string cells only — enough for fixtures and for
the reference's "write geocoded results next to the input" sink.

Deliberately NOT covered (fall back to pandas.read_excel when available):
dates-as-serials styling, merged cells, legacy BIFF ``.xls``.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from xml.sax.saxutils import escape

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int | None:
    """``A1``-style cell reference → 0-based column index (A=0, AA=26)."""
    m = _CELL_REF.match(ref)
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _col_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _cell_text(elem: ET.Element, tag: str) -> str:
    """Concatenated text of every ``<t>`` run under ``elem`` (rich text
    splits one logical string across runs)."""
    return "".join(t.text or "" for t in elem.iter(f"{_MAIN_NS}{tag}"))


def _parse_number(raw: str):
    f = float(raw)
    return int(f) if f.is_integer() and "e" not in raw.lower() else f


def read_xlsx_rows(path: str, sheet: int | str = 0) -> list[list]:
    """Parse one worksheet of an ``.xlsx`` into a list of rows (lists of
    str/int/float/bool/None), ragged rows right-padded to the widest row."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = wb.iter(f"{_MAIN_NS}sheet")
        rels = {}
        try:
            rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in rel_root.iter(f"{_REL_NS}Relationship"):
                target = rel.get("Target", "")
                if target.startswith("/"):
                    target = target.lstrip("/")
                else:
                    target = "xl/" + target
                rels[rel.get("Id")] = target.replace("xl/./", "xl/")
        except KeyError:
            pass

        chosen = None
        for i, s in enumerate(sheets):
            name = s.get("name")
            if (isinstance(sheet, int) and i == sheet) or name == sheet:
                chosen = s
                break
        if chosen is None:
            raise ValueError(f"sheet {sheet!r} not found in {path}")
        sheet_path = rels.get(chosen.get(_RID_ATTR), "xl/worksheets/sheet1.xml")

        shared: list[str] = []
        try:
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [_cell_text(si, "t") for si in ss.iter(f"{_MAIN_NS}si")]
        except KeyError:
            pass

        ws = ET.fromstring(zf.read(sheet_path))

    rows: list[list] = []
    width = 0
    for row_el in ws.iter(f"{_MAIN_NS}row"):
        cells: list = []
        next_col = 0
        for c in row_el.iter(f"{_MAIN_NS}c"):
            ref = c.get("r")
            col = _col_index(ref) if ref else None
            if col is None:
                col = next_col
            while len(cells) < col:
                cells.append(None)
            next_col = col + 1

            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                value = _cell_text(c, "t")
            else:
                v = c.find(f"{_MAIN_NS}v")
                raw = v.text if v is not None and v.text is not None else None
                if raw is None:
                    value = None
                elif ctype == "s":
                    value = shared[int(raw)]
                elif ctype == "str":
                    value = raw
                elif ctype == "b":
                    value = raw not in ("0", "false", "FALSE")
                else:
                    value = _parse_number(raw)
            cells.append(value)
        rows.append(cells)
        width = max(width, len(cells))
    for r in rows:
        r.extend([None] * (width - len(r)))
    return rows


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_xlsx(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Write rows (header included, if any) as a minimal single-sheet
    ``.xlsx`` — the xlwt-outbook side of the reference round-trip
    (/root/reference/getDirection.py:69-118), modern container."""
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letters(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK.format(name=escape(sheet_name)))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
