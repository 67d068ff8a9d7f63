"""WARC archival source/sink (ISO 28500 / WARC 1.1, the Common Crawl
interchange format).

The reference persists crawl output only to SQL tables / Excel sheets
(db.py:279-341, utility_commons.py:97-112); a web-scale engine also
needs the archival format the rest of the crawl ecosystem speaks. This
module implements, from the public spec, the subset a text-extraction
crawl uses:

- ``write_warc(ds, out_dir)`` — distributed sink: every ``map_batches``
  task serializes its doc batch as WARC ``conversion`` records (the
  WET-style plaintext-extract record type Common Crawl uses for
  extracted text), each record its OWN gzip member, concatenated into a
  per-task ``part-*.warc.gz`` shard. Per-record gzip members are what
  make a WARC randomly addressable: a reader can seek to a CDX offset
  and decompress one member without touching the rest of the file. The
  sink returns the CDX index rows (url, digest, length, offset,
  filename) produced *during* the write — offsets come for free from
  the byte cursor, no second pass.
- ``read_warc(path)`` — distributed source: ``read_binary_files`` over
  the shard files, then a per-file record parser inside ``map_batches``
  (each shard parses in parallel; shards are sized by the writer's
  batch size, never one giant file).
- ``read_warc_member(filename, offset, length)`` — the CDX random-access
  path: decompress exactly one member.

Records are standard WARC: ``WARC/1.1`` version line, CRLF header
block (WARC-Type / WARC-Record-ID / WARC-Date / WARC-Target-URI /
Content-Type / Content-Length / WARC-Payload-Digest), blank line,
payload, two CRLFs. The conversion payload is the doc's span
serialization in offset order — ``kind|text|media_ref`` lines — i.e.
the same content fingerprint the recrawl differ hashes, so the CDX
digest is independently recomputable by the DuckDB oracle.

No wall clock: WARC-Date is a run-scoped constant (T7 discipline), and
record IDs are content-derived UUIDs (md5 of url+digest), so a re-run
writes byte-identical archives — the property that makes the sink
resumable and the round-trip testable.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa
import ray.data as rd

WARC_VERSION = b"WARC/1.1"
DEFAULT_WARC_DATE = "2024-01-01T00:00:00Z"
_CRLF = b"\r\n"


def span_payload_text(spans: list[dict]) -> str:
    """Canonical plaintext serialization of a doc's span sequence:
    ``kind|text|media_ref`` lines in offset order. Shared contract with
    the recrawl differ (crawl_queries._content_sigs) and the CDX oracle
    (``string_agg(kind || '|' || text || '|' || media_ref, chr(10)
    ORDER BY offset)``)."""
    return "\n".join(
        f"{s['kind']}|{s['text']}|{s['media_ref']}"
        for s in sorted(spans, key=lambda s: s["offset"]))


def _record_id(url: str, digest: str) -> str:
    h = hashlib.md5(f"{url}\x00{digest}".encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def build_record(url: str, payload: bytes, *, warc_type: str = "conversion",
                 content_type: str = "text/plain",
                 warc_date: str = DEFAULT_WARC_DATE,
                 extra_headers: dict[str, str] | None = None) -> bytes:
    """Serialize one WARC record (uncompressed bytes)."""
    digest = hashlib.md5(payload).hexdigest()
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", _record_id(url, digest)),
        ("WARC-Date", warc_date),
        ("WARC-Target-URI", url),
        ("WARC-Payload-Digest", f"md5:{digest}"),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    if extra_headers:
        headers.extend(extra_headers.items())
    buf = io.BytesIO()
    buf.write(WARC_VERSION + _CRLF)
    for k, v in headers:
        buf.write(f"{k}: {v}".encode() + _CRLF)
    buf.write(_CRLF)
    buf.write(payload)
    buf.write(_CRLF + _CRLF)
    return buf.getvalue()


CDX_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("digest", pa.string()),        # md5 hex of the uncompressed payload
    ("length", pa.int64()),         # uncompressed payload bytes
    ("offset", pa.int64()),         # gzip-member byte offset in the shard
    ("member_length", pa.int64()),  # compressed member bytes
    ("filename", pa.string()),
])


class WarcShardWriter:
    """Actor-pool sink stage: one ``__call__`` serializes a doc batch
    into a single ``part-*.warc.gz`` shard (one gzip member per record)
    and returns the batch's CDX rows. Shard names are content-derived
    (md5 of the member stream), so a re-run of the same input overwrites
    the same files — idempotent, resumable output."""

    def __init__(self, out_dir: str, warc_date: str = DEFAULT_WARC_DATE):
        self.out_dir = out_dir
        self.warc_date = warc_date
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        # instance may have been pickled to a task on another node where
        # __init__'s makedirs never ran
        os.makedirs(self.out_dir, exist_ok=True)
        urls = t.column("url").to_pylist()
        spans_col = t.column("spans").to_pylist()
        doc_ids = (t.column("doc_id").to_pylist()
                   if "doc_id" in t.column_names else [""] * len(urls))
        members: list[bytes] = []
        cdx: list[tuple[str, str, int, int]] = []  # url,digest,len,mlen
        for url, spans, did in zip(urls, spans_col, doc_ids):
            payload = span_payload_text(spans).encode()
            rec = build_record(
                url, payload, warc_date=self.warc_date,
                extra_headers={"X-Doc-Id": did} if did else None)
            member = gzip.compress(rec, mtime=0)  # mtime=0: deterministic
            members.append(member)
            cdx.append((url, hashlib.md5(payload).hexdigest(),
                        len(payload), len(member)))
        blob = b"".join(members)
        fname = f"part-{hashlib.md5(blob).hexdigest()[:16]}.warc.gz"
        path = os.path.join(self.out_dir, fname)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        off = 0
        rows = {"url": [], "digest": [], "length": [], "offset": [],
                "member_length": [], "filename": []}
        for (url, digest, plen, mlen) in cdx:
            rows["url"].append(url)
            rows["digest"].append(digest)
            rows["length"].append(plen)
            rows["offset"].append(off)
            rows["member_length"].append(mlen)
            rows["filename"].append(fname)
            off += mlen
        return pa.table(rows, schema=CDX_SCHEMA)


def write_warc(ds: rd.Dataset, out_dir: str, *, batch_size: int = 4096,
               concurrency: int | None = None,
               warc_date: str = DEFAULT_WARC_DATE) -> rd.Dataset:
    """Write doc rows (url + spans [+ doc_id]) as sharded WARC and
    return the CDX index Dataset. The write happens inside the returned
    Dataset's execution — consume (write_parquet / to_pandas / count)
    to drive it. ``batch_size`` bounds shard size: 4096 docs/shard keeps
    a shard a few MB, the seek-friendly sizing CDX readers expect."""
    return ds.map_batches(
        WarcShardWriter, fn_constructor_args=(out_dir, warc_date),
        batch_size=batch_size, batch_format="pyarrow",
        concurrency=concurrency or (1, 8))


def parse_warc_bytes(blob: bytes, filename: str = "") -> pa.Table:
    """Parse one shard's bytes (concatenated gzip members, or already-
    decompressed record bytes — sniffed by the gzip magic, since Ray's
    binary reader auto-decompresses ``.gz`` paths) into record rows.
    GzipFile reads concatenated members transparently; records are then
    split by the spec's Content-Length framing — no regex over payload
    bytes, so binary payloads are safe."""
    raw = (gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
           if blob[:2] == b"\x1f\x8b" else blob)
    rows = {"url": [], "warc_type": [], "warc_date": [], "digest": [],
            "doc_id": [], "payload": []}
    pos = 0
    n = len(raw)
    while pos < n:
        hdr_end = raw.index(b"\r\n\r\n", pos)
        head = raw[pos:hdr_end].decode()
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line in {filename!r}: "
                             f"{lines[0][:40]!r}")
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs["content-length"])
        body_start = hdr_end + 4
        payload = raw[body_start:body_start + clen]
        pos = body_start + clen + 4  # trailing CRLF CRLF
        rows["url"].append(hdrs.get("warc-target-uri", ""))
        rows["warc_type"].append(hdrs.get("warc-type", ""))
        rows["warc_date"].append(hdrs.get("warc-date", ""))
        digest = hdrs.get("warc-payload-digest", "")
        rows["digest"].append(digest.removeprefix("md5:"))
        rows["doc_id"].append(hdrs.get("x-doc-id", ""))
        rows["payload"].append(payload)
    return pa.table({
        "url": pa.array(rows["url"], pa.string()),
        "warc_type": pa.array(rows["warc_type"], pa.string()),
        "warc_date": pa.array(rows["warc_date"], pa.string()),
        "digest": pa.array(rows["digest"], pa.string()),
        "doc_id": pa.array(rows["doc_id"], pa.string()),
        "payload": pa.array(rows["payload"], pa.binary()),
    })


def read_warc(path: str) -> rd.Dataset:
    """Distributed WARC reader: one row per record. Each shard file is
    read and parsed by its own task (shards are writer-batch-sized, so
    parse parallelism == shard count)."""

    def parse(t: pa.Table) -> pa.Table:
        out = [parse_warc_bytes(blob, fname) for blob, fname in
               zip(t.column("bytes").to_pylist(),
                   t.column("path").to_pylist())]
        return (pa.concat_tables(out) if out
                else parse_warc_bytes(b""))

    return rd.read_binary_files(
        path, include_paths=True,
        file_extensions=["warc.gz", "warc"]).map_batches(
        parse, batch_size=1, batch_format="pyarrow")


def read_warc_member(path: str, offset: int, member_length: int) -> pa.Table:
    """CDX random access: decompress exactly one gzip member (one
    record) from a shard without reading the rest of the file."""
    with open(path, "rb") as f:
        f.seek(offset)
        member = f.read(member_length)
    return parse_warc_bytes(member, os.path.basename(path))
