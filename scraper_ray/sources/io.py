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
    elif path.endswith((".xlsx", ".xls")):
        # workbooks are small edge inputs (dims, seed lists): read on the
        # driver with the all-string contract (reference
        # utility_commons.py:72-93), then hand to Ray as one table
        from .xlsx import read_excel

        ds = rd.from_arrow(read_excel(path))
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
            return _write_lance_distributed(ds, path)
    if format == "parquet":
        ds.write_parquet(path)
        return path
    if format == "lance-seq":   # driver-side fallback (tiny tables only)
        import lance

        first = True
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            lance.write_dataset(batch, path, mode="create" if first else "append")
            first = False
        return path
    if format == "warc":
        # archival crawl sink (ISO 28500): WARC shards under *path* plus
        # the CDX index as parquet under *path*/_cdx — consuming the CDX
        # dataset drives the distributed shard write (sources/warc.py).
        # Task-pool stage: the writer is stateless beyond its target dir,
        # so per-wave actor spin-up would be pure overhead.
        import os

        from .warc import WarcShardWriter

        cdx = ds.map_batches(WarcShardWriter(path), batch_size=4096,
                             batch_format="pyarrow")
        cdx.write_parquet(os.path.join(path, "_cdx"))
        return path
    if format == "csv":
        ds.write_csv(path)
        return path
    if format == "json":
        ds.write_json(path)
        return path
    if format == "xlsx":
        # workbook export (reference df_to_excel, utility_commons.py:
        # 97-112): a small driver-side result file, not a distributed
        # sink — *path* is the .xlsx file, sheet 'Results' (append/
        # replace semantics live in xlsx.write_excel). Guarded by the
        # sheet row limit so big data can't be funneled through here.
        import pyarrow as pa
        import ray

        from .xlsx import write_excel

        tbl = pa.concat_tables(
            [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows],
            promote_options="default")
        if tbl.num_rows > 1_048_575:
            raise ValueError(
                "xlsx sheets cap at 1,048,576 rows — use parquet for "
                f"large outputs (got {tbl.num_rows})")
        return write_excel(tbl, path)
    raise ValueError(f"unsupported sink format: {format}")


def _write_lance_distributed(ds: rd.Dataset, path: str) -> str:
    """Distributed Lance write: every map_batches task writes its own
    fragment data files directly to *path* and returns only the fragment
    METADATA (a small JSON string); the driver then commits all fragments
    in one atomic manifest operation. No table bytes funnel through the
    driver — the wide write is as parallel as the dataset has blocks
    (the north rule's Lance sink at scale).

    Uses the public ``lance.fragment.write_fragments`` +
    ``LanceDataset.commit`` two-phase API; falls back to the sequential
    driver loop if this lance build predates it.
    """
    import pyarrow as pa

    import lance

    schema = pa.schema(
        [(n, t) for n, t in zip(ds.schema().names, ds.schema().types)])

    try:
        from lance.fragment import FragmentMetadata, write_fragments
    except ImportError:
        warnings.warn("lance.fragment API unavailable; falling back to the "
                      "sequential driver write", stacklevel=2)
        return write_dataset(ds, path, format="lance-seq")

    def write_frag(t: pa.Table) -> pa.Table:
        frags = write_fragments(t, path, schema=schema)
        return pa.table({"frag_json": pa.array(
            [f.to_json() for f in frags], pa.string())})

    frag_rows = ds.map_batches(write_frag, batch_format="pyarrow",
                               batch_size=None).take_all()
    frags = [FragmentMetadata.from_json(r["frag_json"]) for r in frag_rows]
    op = lance.LanceOperation.Overwrite(schema, frags)
    lance.LanceDataset.commit(path, op)
    return path
