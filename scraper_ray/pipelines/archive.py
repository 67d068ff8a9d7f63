"""Archival pipelines: WARC sink + CDX index over the crawl output.

The operator a crawl farm runs after (or during) every crawl: persist
the fetched docs as WARC shards and build the CDX index that makes the
archive randomly addressable (the Common Crawl access pattern — look up
a URL in the CDX, seek to (filename, offset), decompress one gzip
member). The WARC/CDX formats are public (ISO 28500); see
sources/warc.py for the record layout.

Scale shape: the write is embarrassingly parallel (one shard per doc
batch, no shuffle anywhere); the CDX rows come out of the same pass as
a by-product of the byte cursor, so indexing is free. Reading back is
one task per shard. Nothing touches the driver but the returned index
Dataset.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import ray.data as rd

_WARC_CACHE: dict[str, str] = {}


def _warc_dir_for(sf_dir: str) -> str:
    """Write (once per process per tier) the tier's crawl docs as WARC
    shards; return the shard directory."""
    from .crawl_queries import _run_crawl

    tier = os.path.basename(os.path.normpath(sf_dir))
    if tier not in _WARC_CACHE:
        from ..sources.warc import write_warc

        out = tempfile.mkdtemp(prefix="warc_")
        docs = _run_crawl(sf_dir).select_columns(["doc_id", "url", "spans"])
        # consuming the CDX dataset drives the distributed write; the
        # index itself is persisted next to the shards (parquet), the
        # layout a CDX server reads
        cdx = write_warc(docs, out)
        cdx.write_parquet(os.path.join(out, "_cdx"))
        _WARC_CACHE[tier] = out
    return _WARC_CACHE[tier]


def q_warc_cdx(sf_dir: str) -> rd.Dataset:
    """CDX index of the crawl's WARC archive: (url, payload digest,
    payload length). Digest/length are recomputed by the DuckDB oracle
    from the sequential crawler's span parquet using the identical
    serialization (kind|text|media_ref lines in offset order), so this
    checks the whole chain: crawl -> serialize -> gzip-member write ->
    index. The (offset, filename) columns are excluded from the oracle
    compare (they describe the physical shard layout, which the oracle
    can't know) and are covered by the random-access round-trip test."""
    cdx = rd.read_parquet(os.path.join(_warc_dir_for(sf_dir), "_cdx"),
                          columns=["url", "digest", "length"])
    return cdx


def q_warc_readback(sf_dir: str) -> rd.Dataset:
    """Read the WARC shards back (one parse task per shard) and emit
    (url, digest, payload_len) from the RECORDS — proving the archive
    on disk, not just the writer's index, carries the right bytes. The
    oracle is the same SQL as warc_cdx; a mismatch between the two
    queries would localize a fault to the gzip/framing layer."""
    import pyarrow.compute as pc

    from ..sources.warc import read_warc

    recs = read_warc(_warc_dir_for(sf_dir))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("url"),
            "digest": t.column("digest"),
            "length": pc.cast(pc.binary_length(t.column("payload")),
                              pa.int64()),
        })

    return recs.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True)


def _cdx_oracle_sql() -> str:
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_SPANS_PATH

    payload = ("coalesce(string_agg(s.kind || '|' || s.text || '|' || "
               "s.media_ref, chr(10) ORDER BY s.\"offset\"), '')")
    return f"""
SELECT d.url,
       md5({payload}) AS digest,
       CAST(strlen({payload}) AS BIGINT) AS length
FROM read_parquet('{ORACLE_DOCS_PATH}') d
LEFT JOIN read_parquet('{ORACLE_SPANS_PATH}') s USING (doc_id)
GROUP BY d.url
"""


ORACLE_SQL = {"warc_cdx": _cdx_oracle_sql(),
              "warc_readback": _cdx_oracle_sql()}

QUERIES = {"warc_cdx": q_warc_cdx,
           "warc_readback": q_warc_readback}
