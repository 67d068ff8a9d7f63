"""Static lookup-dimension ingestion (reference S10/J8).

The reference ships three small lookup files joined against API queries
(reference/BaiduMap_cityCode_1102.txt — ``area_id,name`` CSV;
AMap_adcode_citycode.xlsx; amap_poicode.xlsx — wired in
handlers/baidu_api.py:25-30). This module loads any of them into a
plain dict for the broadcast-join pattern: read once on the driver,
``ray.put`` the dict, look up inside ``map_batches`` — a small side
never shuffles.
"""

from __future__ import annotations

import csv

import pyarrow as pa


def load_dim_table(path: str, sheet_name: str | None = None) -> pa.Table:
    """Lookup file -> all-string Arrow table (csv/txt header row, or a
    workbook sheet via the stdlib xlsx reader)."""
    if path.endswith((".xlsx", ".xls")):
        from .xlsx import read_excel

        return read_excel(path, sheet_name)
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    return pa.table({
        h: pa.array([r[i] if i < len(r) else "" for r in body], pa.string())
        for i, h in enumerate(header)
    })


def dim_lookup(path: str, key_col: str, value_col: str,
               sheet_name: str | None = None) -> dict[str, str]:
    """Lookup file -> {key -> value} dict ready for ray.put broadcast."""
    t = load_dim_table(path, sheet_name)
    return dict(zip(t.column(key_col).to_pylist(),
                    t.column(value_col).to_pylist()))


def broadcast_join(ds, lookup_ref, key_col: str, out_col: str,
                   drop_unmatched: bool = False):
    """Generic broadcast enrichment: add ``out_col`` by dict lookup on
    ``key_col``; the dict travels via the object store (one copy per
    node), not per-task pickles."""
    import ray

    def f(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        vals = [lookup.get(k) for k in t.column(key_col).to_pylist()]
        out = t.append_column(out_col, pa.array(vals, pa.string()))
        if drop_unmatched:
            import pyarrow.compute as pc

            out = out.filter(pc.is_valid(out.column(out_col)))
        return out

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
