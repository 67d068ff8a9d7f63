"""Minimal .xlsx reader + writer — the reference's Excel semantics.

``excel_to_df`` (reference: utils/utility_commons.py:72-93) reads a
workbook sheet with ``dtype=str`` and maps NaN -> '' — i.e. *everything
is a string and blanks are empty strings* (SURVEY §1.2). ``df_to_excel``
(utility_commons.py:97-112) exports a frame to a named sheet, APPENDING
the sheet when the workbook already exists. This module reproduces
exactly those contracts with the stdlib only (openpyxl/xlrd are not in
this container): an .xlsx file is a zip of XML parts, so ``zipfile`` +
``ElementTree`` suffice — the writer emits inline-string cells, which
the reader round-trips.

Scale note: workbooks are inherently small edge inputs/outputs (lookup
dims, seed lists, result exports) — they are read/written on the driver
and broadcast/`from_arrow`'d, never treated as distributed tables.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import pyarrow as pa

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
       "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships"}
_COL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'B3' -> 1, 'AA7' -> 26."""
    m = _COL_RE.match(ref)
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.iter(
            "{%s}t" % _NS["m"])))
    return out


def _sheet_path(z: zipfile.ZipFile, sheet_name: str | None) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    target_of = {rel.get("Id"): rel.get("Target")
                 for rel in rels.iter(rel_ns + "Relationship")}
    for sheet in wb.iter("{%s}sheet" % _NS["m"]):
        if sheet_name is None or sheet.get("name") == sheet_name:
            target = target_of[sheet.get(
                "{%s}id" % _NS["r"])]
            return target if target.startswith("xl/") else "xl/" + target
    raise KeyError(f"sheet not found: {sheet_name!r}")


def read_excel(path: str, sheet_name: str | None = None) -> pa.Table:
    """Workbook sheet -> all-string Arrow table (blanks = '', first row
    = column names; duplicate/empty headers get positional suffixes)."""
    with zipfile.ZipFile(path) as z:
        strings = _shared_strings(z)
        root = ET.fromstring(z.read(_sheet_path(z, sheet_name)))
        rows: list[dict[int, str]] = []
        for row in root.iter("{%s}row" % _NS["m"]):
            vals: dict[int, str] = {}
            for c in row.findall("m:c", _NS):
                ref = c.get("r")
                ci = _col_index(ref) if ref else len(vals)
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    txt = "".join(t.text or "" for t in c.iter(
                        "{%s}t" % _NS["m"]))
                else:
                    v = c.find("m:v", _NS)
                    txt = v.text if v is not None and v.text else ""
                    if ctype == "s" and txt:
                        txt = strings[int(txt)]
                vals[ci] = txt
            rows.append(vals)
    if not rows or not any(rows):
        return pa.table({})
    n_cols = max(max(r) for r in rows if r) + 1
    header = rows[0]
    names: list[str] = []
    for i in range(n_cols):
        name = header.get(i, "") or f"col{i}"
        while name in names:   # suffix until unique (never drop a column)
            name = f"{name}_{i}"
        names.append(name)
    cols = {names[i]: [r.get(i, "") for r in rows[1:]] for i in range(n_cols)}
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def sheet_names(path: str) -> list[str]:
    """Workbook sheet names, in workbook order."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name") for s in wb.iter("{%s}sheet" % _NS["m"])]


def _col_letters(idx: int) -> str:
    """0 -> 'A', 25 -> 'Z', 26 -> 'AA'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _sheet_xml(table: pa.Table) -> str:
    from xml.sax.saxutils import escape

    def cell(ref: str, val: str) -> str:
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(val)}</t></is></c>")

    rows_xml = []
    header = "".join(cell(f"{_col_letters(i)}1", n)
                     for i, n in enumerate(table.column_names))
    rows_xml.append(f'<row r="1">{header}</row>')
    cols = [table.column(n).to_pylist() for n in table.column_names]
    for r in range(table.num_rows):
        cells = "".join(
            cell(f"{_col_letters(i)}{r + 2}",
                 "" if col[r] is None else str(col[r]))
            for i, col in enumerate(cols))
        rows_xml.append(f'<row r="{r + 2}">{cells}</row>')
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_NS["m"]}"><sheetData>'
            + "".join(rows_xml) + "</sheetData></worksheet>")


def write_excel(table: pa.Table, path: str,
                sheet_name: str = "Results") -> str:
    """Write *table* as a workbook sheet (reference ``df_to_excel``
    semantics, utility_commons.py:97-112): when *path* already exists
    the sheet is APPENDED to the workbook; a same-named sheet is
    replaced (last write wins, the engine's sink-dedupe convention).
    Cells are inline strings — ``str(value)``, None -> '' — matching the
    reader's all-string contract, so write -> read round-trips."""
    import os

    # carry over existing sheets (append semantics), dropping a
    # same-named one
    sheets: list[tuple[str, str]] = []
    if os.path.exists(path):
        with zipfile.ZipFile(path) as z:
            for name in sheet_names(path):
                if name != sheet_name:
                    sheets.append((name, z.read(_sheet_path(z, name))
                                   .decode("utf-8")))
    sheets.append((sheet_name, _sheet_xml(table)))

    n = len(sheets)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument'
            '.spreadsheetml.worksheet+xml"/>' for i in range(n))
        + "</Types>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>')
    from xml.sax.saxutils import quoteattr

    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS["m"]}" xmlns:r="{_NS["r"]}"><sheets>'
        + "".join(
            f"<sheet name={quoteattr(name)} sheetId=\"{i + 1}\" "
            f'r:id="rId{i + 1}"/>' for i, (name, _) in enumerate(sheets))
        + "</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>' for i in range(n))
        + "</Relationships>")

    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (_, xml) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    os.replace(tmp, path)
    return path
