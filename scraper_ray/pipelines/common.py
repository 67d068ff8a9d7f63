"""Shared pipeline helpers: table reads + exact money scaling."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy). The driver's parquet
    files carry a ``pandas`` metadata blob that makes ``hash(schema)``
    raise, which both spams 'Failed to hash the schemas' warnings and
    silently disables Ray's schema-deduplication fast path in every
    downstream shuffle."""
    return t.replace_schema_metadata(None)


def read_sf_table(sf_dir: str, name: str,
                  columns: list[str] | None = None,
                  filter: "pa.dataset.Expression | None" = None
                  ) -> rd.Dataset:
    """Read one driver table, pruning columns — and optionally rows —
    at the read.

    ``filter`` is a pyarrow dataset expression pushed into the parquet
    fragments (row-group statistics prune whole groups before any byte
    leaves storage) — at 100 TB a date/flag predicate evaluated here
    instead of in a downstream map is the difference between scanning a
    partition and scanning the corpus.

    Passes an explicit metadata-stripped ``schema=`` (one footer read on
    the driver) so the read tasks themselves emit metadata-free blocks:
    the driver files carry a ``pandas`` blob that makes ``hash(schema)``
    raise inside the fused ReadParquet->SplitBlocks operator, spamming
    'Failed to hash the schemas' and defeating schema dedup before any
    downstream strip could run."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch,
                           filter=filter)


def int_scaled(arr, scale: float):
    """Exact integer-scaled money: round(x*scale) as int64.

    Parallel float summation wobbles in the last ulp, which breaks the
    driver's value-hash compare — so every money aggregate is summed in
    scaled integers (exact, associative) and divided back at the end.
    The DuckDB oracles mirror the same expression. (int64 headroom: safe
    through ~sf10 row counts; beyond that scale drops to 1e4.)"""
    # half-away-from-zero to match SQL round() (Arrow defaults to
    # half-to-even, which diverges on exact .5 scaled values)
    return pc.cast(
        pc.round(pc.multiply(arr, pa.scalar(scale)),
                 round_mode="half_towards_infinity"),
        pa.int64())


def round_half_away(x, ndigits: int = 4):
    """Round half away from zero — SQL round() semantics.

    Python's round()/np.round are half-to-even, which diverges from the
    DuckDB oracles on exactly-representable ties (e.g. 21/32 = 0.65625:
    DuckDB round(.,4)=0.6563, Python=0.6562). Every rounded similarity /
    coordinate the oracles compare goes through this instead."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def embs_to_numpy(col: pa.ChunkedArray | pa.Array) -> "np.ndarray":
    """Embedding list column -> (n, dim) float64 matrix, zero-copy.

    Flattens the Arrow list child buffer directly instead of
    ``to_pylist()`` (which boxes every float into a Python object) — the
    difference between O(n*dim) pointer chasing and one buffer view."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def sql_hex64(expr: str) -> str:
    """DuckDB expression: first 64 bits of ``md5(expr)`` as HUGEINT.

    Mirrors ``int.from_bytes(hashlib.md5(x).digest()[:8], 'big')`` — the
    deterministic 64-bit hash used by the synthetic fixtures (fake API,
    minhash/simhash token hashes), so SQL oracles can recompute them."""
    return (
        "list_sum(list_transform(range(1, 17), hx -> "
        f"(instr('0123456789abcdef', substr(md5({expr}), hx, 1)) - 1)::HUGEINT"
        " * (1::HUGEINT << (4 * (16 - hx)))))"
    )


# keyed_repartition sizing: one hash partition per this many rows
# (capped at cluster CPUs). See keyed_repartition's docstring for the
# startup-cost vs downstream-parallelism tradeoff behind the value.
REPART_ROWS_PER_PART = 16384
# keyed_repartition routes exchanges at or below this row count through
# the task-based sort shuffle (see its docstring); above it, hash shuffle
SORT_COLOCATE_CUTOFF = 4_000_000


def flat_tokens(t: pa.Table, text_col: str = "text"):
    """Whitespace-tokenize a batch in three Arrow/numpy kernels:
    returns ``(flat, lens, doc)`` — the flattened token array, per-row
    token counts, and the row index of every flat token. The shared
    front half of every token-level batch kernel (df counts, vocab
    histograms, posting pairs, OOV membership): no Python loop ever
    touches the token stream."""
    import numpy as np

    ls = pc.split_pattern(t.column(text_col), " ")
    lens = pc.list_value_length(ls).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(ls)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, lens, np.repeat(np.arange(len(lens)), lens)


def flat_spans(t: pa.Table):
    """Explode a crawl-doc batch's ``spans`` column (the interleaved
    ``list<struct<kind,text,media_ref,offset>>`` payload) in three Arrow
    kernels: returns ``(flat, parents)`` — the flattened StructArray and
    the int64 row index of every flat span. Flatten preserves in-list
    order, so a doc's spans stay in offset order within its run. The
    shared front half of every span-level batch kernel (text rollup,
    paragraph rows, media-asset pairs, composition rollups): no Python
    loop ever touches the span stream."""
    spans = t.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    return pc.list_flatten(spans), pc.list_parent_indices(spans)


def span_content_bodies(t: pa.Table) -> pa.Array:
    """Per-doc content-fingerprint body: each span rendered as
    ``kind|text|media_ref`` and the doc's lines joined by newline, all
    in four Arrow kernels (flatten preserves the parse stage's offset
    order — the same invariant ``rollup_texts`` leans on). Callers md5
    the bodies (one C call per doc); the serialization is mirrored
    verbatim by the DuckDB oracles' ``string_agg(... ORDER BY
    offset)``."""
    import numpy as np

    spans = t.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    lines = pc.binary_join_element_wise(
        pc.struct_field(flat, "kind"), pc.struct_field(flat, "text"),
        pc.struct_field(flat, "media_ref"), "|")
    lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), lines)
    return pc.binary_join(lists, "\n")


def join_parts(div: int = 4, cap: int = 256) -> int:
    """Hash-join / groupby fan-out derived from the cluster instead of a
    constant: ``cpus // div``, floored at 2 and capped. ``div`` encodes
    the exchange's relative weight — 1 for the widest fact-fact joins,
    4 (default) for standard joins, 8 for small-side joins. At this
    sandbox's 32 CPUs the values reproduce the constants they replaced
    (32 / 8 / 4), and on a real cluster the fan-out grows with the
    cores; the cap bounds per-join aggregator startup."""
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    return max(2, min(cap, cpus // div))


def keyed_repartition(ds: rd.Dataset, keys: list[str],
                      num_partitions: int | None = None) -> rd.Dataset:
    """Hash-shuffle *ds* so every row of a key lands in one block.

    The front half of the repo's standard window/segmented-pass shape
    (``q_knn_graph``, ``q_paragraph_dedup``, ``keep_max_by``): ONE keyed
    repartition co-locates each key's rows, then a single
    ``map_batches(fn, batch_size=None)`` pass runs a *vectorized*
    per-batch segmented computation (pandas groupby transforms / numpy
    reduceat over sorted runs) — never one Python dispatch per group.
    ``batch_size=None`` (the Ray 2.49 default) is load-bearing: blocks
    map whole, so a key's rows never split across batches.

    Partition count defaults to one per ~16k rows, capped at the
    cluster CPU count — the input is already materialized by the
    empty-block scrub, so the row count is metadata-only. Two forces:
    each hash partition spawns a shuffle-aggregator actor whose startup
    dominates at small scale (measured 4.7 s at 32 partitions vs 2.0 s
    at 8 for a 256k-row exchange), while the downstream segmented pass
    parallelizes per PARTITION (blocks map whole under batch_size=None)
    so too few partitions starve it; ~16k rows/partition balances both
    at bench scale, and at 100 TB the row term saturates the CPU cap so
    the shuffle fans out with the cluster. Empty blocks are scrubbed on
    both sides — groupby/aggregate inputs carry schema-less zero-row
    blocks that crash the hash shuffle."""
    import ray
    from ray.data.context import ShuffleStrategy

    ds = drop_empty_blocks(ds)
    n = ds.count()
    if num_partitions is None:
        cpus = max(8, int(ray.cluster_resources().get("CPU", 8)))
        num_partitions = max(2, min(cpus, n // REPART_ROWS_PER_PART + 2))
    if n <= SORT_COLOCATE_CUTOFF:
        # small exchange: hash-shuffle aggregator actors cost seconds of
        # per-query startup that dwarf the data movement. Co-locate by a
        # coarse __part column instead and route through the TASK-based
        # sort shuffle: groupby(__part).map_groups emits whole groups,
        # so every row of a key still lands in one block and downstream
        # map_batches(batch_size=None) sees keys whole. Above the
        # cutoff the hash shuffle wins (actor startup amortizes and the
        # sort's sample pass stops being free) — at 100 TB every wide
        # exchange takes that path, so the scale story is unchanged.
        import pandas as pd

        np_parts = int(num_partitions)

        def add_part(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.select(keys).to_pandas(), index=False).to_numpy()
            return strip_schema_metadata(t).append_column(
                "__part", pa.array((h % np_parts).astype("int64")))

        def strip(t: pa.Table) -> pa.Table:
            return t.drop_columns(["__part"])

        return (ds.map_batches(add_part, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("__part")
                .map_groups(strip, batch_format="pyarrow"))
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return drop_empty_blocks(ds.repartition(num_partitions, keys=keys))


def drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Rebuild *ds* without empty blocks.

    ``groupby(...).map_groups`` / aggregate outputs include schema-less
    zero-row blocks; Ray's hash-join aggregator rejects a partition made
    only of those ("No match ... for key field reference"). This scrub
    materializes the dataset and re-registers only non-empty block refs —
    metadata-level work, no block data moves through the driver.
    """
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return mat
    return rd.from_arrow_refs(refs)
