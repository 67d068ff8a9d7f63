"""Minimal .xlsx reader — the reference's Excel ingestion semantics.

``excel_to_df`` (reference: utils/utility_commons.py:72-93) reads a
workbook sheet with ``dtype=str`` and maps NaN -> '' — i.e. *everything
is a string and blanks are empty strings* (SURVEY §1.2). This module
reproduces exactly that contract with the stdlib only (openpyxl/xlrd are
not in this container): an .xlsx file is a zip of XML parts, so
``zipfile`` + ``ElementTree`` suffice for the header-row + string-cell
layout the reference's dim workbooks use.

Scale note: workbooks are inherently small edge inputs (lookup dims,
seed lists) — they are read on the driver and broadcast/`from_arrow`'d,
never treated as distributed tables.
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
