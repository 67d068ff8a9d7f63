"""WARC sink/source invariants: record framing, per-member gzip random
access, deterministic re-write, and the distributed round-trip. The
value-level gate is the warc_cdx / warc_readback DuckDB oracles in
tests/test_pipelines.py; these pin the byte-layout properties the
oracle compare can't see."""

import glob
import gzip
import hashlib
import os

import pyarrow as pa
import pytest

from scraper_ray.sources.warc import (
    DEFAULT_WARC_DATE,
    WarcShardWriter,
    build_record,
    parse_warc_bytes,
    read_warc_member,
    span_payload_text,
)


def _spans(*items):
    return [{"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(items)]


DOCS = pa.table({
    "doc_id": pa.array([f"d{i}" for i in range(5)], pa.string()),
    "url": pa.array([f"http://ex.com/{i}" for i in range(5)], pa.string()),
    "spans": [
        _spans(("text", "hello world", ""), ("media", "", "img://a.png")),
        _spans(("text", "second doc", "")),
        _spans(("media", "", "img://b.png")),
        _spans(("text", "pipes | and\nnewlines", "")),
        [],                                       # empty-span doc
    ],
})


def test_record_framing_roundtrip():
    payload = "kind|text line\nanother".encode()
    rec = build_record("http://x/y", payload)
    t = parse_warc_bytes(gzip.compress(rec))
    assert t.num_rows == 1
    assert t.column("url")[0].as_py() == "http://x/y"
    assert t.column("payload")[0].as_py() == payload
    assert (t.column("digest")[0].as_py()
            == hashlib.md5(payload).hexdigest())
    assert t.column("warc_date")[0].as_py() == DEFAULT_WARC_DATE


def test_span_payload_respects_offset_order():
    spans = [{"kind": "text", "text": "b", "media_ref": "", "offset": 1},
             {"kind": "text", "text": "a", "media_ref": "", "offset": 0}]
    assert span_payload_text(spans) == "text|a|\ntext|b|"


def test_shard_writer_cdx_and_random_access(tmp_path):
    w = WarcShardWriter(str(tmp_path))
    cdx = w(DOCS)
    assert cdx.num_rows == 5
    files = glob.glob(str(tmp_path / "part-*.warc.gz"))
    assert len(files) == 1
    # offsets partition the shard exactly: sum of member lengths == size
    sizes = cdx.column("member_length").to_pylist()
    offs = cdx.column("offset").to_pylist()
    assert offs == [sum(sizes[:i]) for i in range(len(sizes))]
    assert sum(sizes) == os.path.getsize(files[0])
    # random access: each (offset, member_length) yields exactly its doc
    for i in range(5):
        rec = read_warc_member(files[0], offs[i], sizes[i])
        assert rec.num_rows == 1
        assert rec.column("url")[0].as_py() == f"http://ex.com/{i}"
        payload = rec.column("payload")[0].as_py()
        assert payload == span_payload_text(
            DOCS.column("spans")[i].as_py()).encode()
        assert len(payload) == cdx.column("length")[i].as_py()
        assert rec.column("doc_id")[0].as_py() == f"d{i}"


def test_shard_writer_is_deterministic(tmp_path):
    a = WarcShardWriter(str(tmp_path / "a"))(DOCS)
    b = WarcShardWriter(str(tmp_path / "b"))(DOCS)
    fa = glob.glob(str(tmp_path / "a" / "*.warc.gz"))[0]
    fb = glob.glob(str(tmp_path / "b" / "*.warc.gz"))[0]
    assert os.path.basename(fa) == os.path.basename(fb)
    assert open(fa, "rb").read() == open(fb, "rb").read()
    assert a.equals(b)


def test_parse_rejects_garbage():
    with pytest.raises(ValueError, match="bad WARC version"):
        parse_warc_bytes(gzip.compress(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n"))


def test_distributed_roundtrip(ray_session, tmp_path):
    """write_warc over a multi-block Dataset, read_warc back: every doc
    survives with its payload, across shard boundaries."""
    import ray.data as rd

    from scraper_ray.sources.warc import read_warc, write_warc

    n = 700
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
        "url": pa.array([f"http://ex.com/p/{i}" for i in range(n)],
                        pa.string()),
        "spans": [_spans(("text", f"doc {i} body", ""),
                         ("media", "", f"img://{i}.png"))
                  for i in range(n)],
    })).repartition(6)
    out = str(tmp_path / "warc")
    cdx = write_warc(docs, out, batch_size=128).to_pandas()
    assert len(cdx) == n
    assert cdx["url"].is_unique
    assert len(glob.glob(out + "/part-*.warc.gz")) >= 6
    back = read_warc(out).to_pandas()
    assert len(back) == n
    assert set(back["url"]) == set(cdx["url"])
    got = dict(zip(back["url"], back["payload"]))
    for i in (0, 13, n - 1):
        u = f"http://ex.com/p/{i}"
        assert got[u].decode().startswith(f"text|doc {i} body|")
    # index digests equal record digests
    assert (dict(zip(cdx["url"], cdx["digest"]))
            == dict(zip(back["url"], back["digest"])))
