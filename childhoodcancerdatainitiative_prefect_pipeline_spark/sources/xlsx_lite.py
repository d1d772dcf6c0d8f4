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


# ---------------------------------------------------------------------------
# Template overlay (S2) — stdlib-only style preservation.  An xlsx is
# a zip; every member EXCEPT the overlaid worksheets is copied
# byte-identical (styles.xml, theme, formats all survive), and inside
# a worksheet only the <sheetData> span is rebuilt: header row 1 is
# kept verbatim, data rows are regenerated with each column's
# template style index (the template's first data row defines the
# data-area formatting, which is how the reference's pre-styled
# submission templates are laid out).
# ---------------------------------------------------------------------------

import re


def _sheet_parts(z: zipfile.ZipFile) -> dict[str, str]:
    """sheet name → zip member path."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.attrib["Id"]: rel.attrib["Target"].lstrip("/") for rel in rels
    }
    out = {}
    for sheet in wb.iter():
        if _local(sheet.tag) != "sheet":
            continue
        rid = next(v for k, v in sheet.attrib.items() if _local(k) == "id")
        target = rid_to_target[rid]
        out[sheet.attrib["name"]] = (
            target if target.startswith("xl/") else f"xl/{target}"
        )
    return out


def _render_cell(ref: str, value, style: str | None) -> str:
    s_attr = f' s="{style}"' if style else ""
    if value is None:
        return ""
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return f'<c r="{ref}"{s_attr}><v>{value}</v></c>'
    return (
        f'<c r="{ref}"{s_attr} t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(str(value))}</t></is></c>"
    )


def overlay_xlsx(
    template_path: str, out_path: str, sheets: dict[str, list[list]]
) -> None:
    """Overlay data rows (row 2+) onto a styled template.

    ``sheets``: ``{sheet_name: data_rows}`` — row 1 (header) and all
    non-worksheet zip members pass through byte-identical; new data
    cells inherit the column style of the template's first data row.
    Sheets absent from the template are ignored (parity with the
    openpyxl-based reference flow, src/create_submission.py).
    """
    with zipfile.ZipFile(template_path) as zin:
        members = {i.filename: zin.read(i.filename) for i in zin.infolist()}
        parts = _sheet_parts(zin)

    for name, data_rows in sheets.items():
        part = parts.get(name)
        if part is None or part not in members:
            continue
        xml = members[part].decode("utf-8")
        m = re.search(r"<sheetData(?:/>|>(.*?)</sheetData>)", xml, re.S)
        if not m:
            raise ValueError(f"worksheet {name!r} has no sheetData")
        span = m.group(1) or ""
        header_m = re.search(r'<row[^>]*\br="1"[^>]*>.*?</row>', span, re.S)
        header_xml = header_m.group(0) if header_m else ""
        # column → style index from the template's first data row
        styles: dict[int, str] = {}
        row2_m = re.search(r'<row[^>]*\br="2"[^>]*>(.*?)</row>', span, re.S)
        if row2_m:
            for c in re.finditer(r"<c\b[^>]*>", row2_m.group(1)):
                attrs = dict(re.findall(r'(\w+)="([^"]*)"', c.group(0)))
                if "r" in attrs and "s" in attrs:
                    styles[_cell_col(attrs["r"])] = attrs["s"]
        rows_xml = [header_xml]
        for i, row in enumerate(data_rows, start=2):
            cells = "".join(
                _render_cell(f"{_col_letter(c)}{i}", v, styles.get(c))
                for c, v in enumerate(row)
            )
            rows_xml.append(f'<row r="{i}">{cells}</row>')
        new_xml = (
            xml[: m.start()]
            + "<sheetData>"
            + "".join(rows_xml)
            + "</sheetData>"
            + xml[m.end() :]
        )
        # Rewrite <dimension ref=.../> to the rendered extent: strict
        # consumers reject a stale dimension when the new data region
        # is larger/smaller than the template's.
        header_cols = [
            _cell_col(a)
            for a in re.findall(r'<c\b[^>]*\br="([A-Z]+\d+)"', header_xml)
        ]
        width = max(
            [len(r) - 1 for r in data_rows] + header_cols + [0]
        )
        last_row = max(len(data_rows) + 1, 1)
        dim_ref = (
            "A1" if last_row == 1 and width == 0
            else f"A1:{_col_letter(width)}{last_row}"
        )
        new_xml = re.sub(
            r'(<dimension\b[^>]*\bref=")[^"]*(")',
            lambda dm: dm.group(1) + dim_ref + dm.group(2),
            new_xml,
            count=1,
        )
        members[part] = new_xml.encode("utf-8")

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zout:
        for fname, blob in members.items():
            zout.writestr(fname, blob)
