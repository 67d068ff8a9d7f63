"""Format-agnostic table IO (reference S4-S7 generalized).

The reference reads Excel workbooks (utility_commons.py:72-93) and SQL
tables (db.py:232-247) and writes Excel sheets + batched SQL upserts
(db.py:279-341). This engine standardizes on columnar files:

- ``read_table(path)`` — parquet / csv / json(lines) by extension, via
  the matching ``ray.data.read_*`` (Excel has no distributed reader;
  convert workbooks to CSV at the edge, which is what the all-string
  ``excel_to_df`` effectively produced).
- ``write_dataset(ds, path, format=...)`` — the sink seam: 'parquet'
  today, 'lance' when the lance package is present (the north rule's
  target table format; not installed in this sandbox, so the Lance
  branch is import-gated and falls back with a warning).

Sink layout is always a directory of part files (resumable; one dir per
wave/partition) — never one giant file.
"""

from __future__ import annotations

import warnings

import ray.data as rd


def read_table(path: str, columns: list[str] | None = None) -> rd.Dataset:
    import os

    if os.path.isdir(path) or path.endswith(".parquet"):
        return rd.read_parquet(path, columns=columns)
    if path.endswith(".csv"):
        ds = rd.read_csv(path)
    elif path.endswith((".json", ".jsonl")):
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported table format: {path}")
    return ds.select_columns(columns) if columns else ds


def write_dataset(ds: rd.Dataset, path: str, format: str = "parquet") -> str:
    """Write *ds* under *path* as a directory of part files."""
    if format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError:
            warnings.warn(
                "lance is not installed; writing parquet with the same "
                "directory layout instead", stacklevel=2)
            format = "parquet"
        else:
            # stream fragments into the Lance dataset (append mode). Note:
            # batches funnel through the driver sequentially — at real
            # scale this becomes a per-partition distributed write via
            # lance fragment writers; acceptable here because lance is an
            # optional sink in this sandbox.
            import pyarrow as pa

            first = True
            for batch in ds.iter_batches(batch_format="pyarrow",
                                         batch_size=65536):
                lance.write_dataset(
                    batch, path, mode="create" if first else "append")
                first = False
            if first:   # empty dataset: still create a readable table
                empty = pa.table({}, schema=pa.schema(
                    [(n, t) for n, t in zip(ds.schema().names,
                                            ds.schema().types)]))
                lance.write_dataset(empty, path, mode="create")
            return path
    if format == "parquet":
        ds.write_parquet(path)
        return path
    if format == "csv":
        ds.write_csv(path)
        return path
    if format == "json":
        ds.write_json(path)
        return path
    raise ValueError(f"unsupported sink format: {format}")
