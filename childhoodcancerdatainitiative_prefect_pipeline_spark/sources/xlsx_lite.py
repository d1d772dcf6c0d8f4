"""Dependency-free xlsx read/write (driver-side, stdlib only).

The reference's interchange format is the Excel manifest (S1/S2);
this runtime has no openpyxl, so the engine carries a minimal OOXML
implementation: a workbook is a zip of XML parts.  Scope is exactly
what manifests need — string/number cells, one table per sheet,
header in row 1.  No styles, merges, formulas, or charts.

Write: inline strings only (no shared-strings table) — simplest
valid form, readable by Excel/openpyxl/pandas.
Read: inline strings, shared strings, and plain values; namespace-
agnostic tag matching so files from any producer parse.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}
</Relationships>"""


def _col_letter(i: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write ``{sheet_name: rows}`` (row 0 = header) as a valid xlsx."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CT.format(
                sheet_overrides="\n".join(
                    f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                    'ContentType="application/vnd.openxmlformats-officedocument.'
                    'spreadsheetml.worksheet+xml"/>'
                    for i in range(len(names))
                )
            ),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr(
            "xl/workbook.xml",
            _WB.format(
                sheets="".join(
                    f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                    for i, n in enumerate(names)
                )
            ),
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            _WB_RELS.format(
                rels="\n".join(
                    f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                    "openxmlformats.org/officeDocument/2006/relationships/worksheet"
                    f'" Target="worksheets/sheet{i + 1}.xml"/>'
                    for i in range(len(names))
                )
            ),
        )
        for i, name in enumerate(names):
            rows_xml = []
            for r, row in enumerate(sheets[name], start=1):
                cells = []
                for c, v in enumerate(row):
                    if v is None:
                        continue
                    ref = f"{_col_letter(c)}{r}"
                    if isinstance(v, (int, float)) and not isinstance(v, bool):
                        cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                    else:
                        cells.append(
                            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                            f"{escape(str(v))}</t></is></c>"
                        )
                rows_xml.append(f'<row r="{r}">{"".join(cells)}</row>')
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(rows_xml)
                + "</sheetData></worksheet>",
            )


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _cell_col(ref: str) -> int:
    letters = "".join(ch for ch in ref if ch.isalpha())
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch.upper()) - ord("A") + 1)
    return i - 1


def read_xlsx(path: str) -> dict[str, list[list[str | None]]]:
    """Read every sheet into dense rows of ``str | None`` values."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root:
                shared.append("".join(t.text or "" for t in si.iter() if _local(t.tag) == "t"))

        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            rel.attrib["Id"]: rel.attrib["Target"].lstrip("/")
            for rel in rels
        }
        out: dict[str, list[list[str | None]]] = {}
        for sheet in wb.iter():
            if _local(sheet.tag) != "sheet":
                continue
            name = sheet.attrib["name"]
            rid = next(v for k, v in sheet.attrib.items() if _local(k) == "id")
            target = rid_to_target[rid]
            part = target if target.startswith("xl/") else f"xl/{target}"
            ws = ET.fromstring(z.read(part))
            rows: list[list[str | None]] = []
            for row in ws.iter():
                if _local(row.tag) != "row":
                    continue
                vals: list[str | None] = []
                for cell in row:
                    if _local(cell.tag) != "c":
                        continue
                    col = _cell_col(cell.attrib.get("r", ""))
                    while len(vals) < col:
                        vals.append(None)
                    ctype = cell.attrib.get("t", "n")
                    text: str | None = None
                    for child in cell.iter():
                        lt = _local(child.tag)
                        if lt == "v" and text is None:
                            text = child.text
                        elif lt == "t" and ctype == "inlineStr":
                            text = (text or "") + (child.text or "")
                    if ctype == "s" and text is not None:
                        text = shared[int(text)]
                    vals.append(text)
                rows.append(vals)
            width = max((len(r) for r in rows), default=0)
            out[name] = [r + [None] * (width - len(r)) for r in rows]
        return out
