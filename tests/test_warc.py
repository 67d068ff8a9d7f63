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


def test_crawl_to_warc_sink(ray_session, tmp_path):
    """sink_format='warc' makes the archive a first-class crawl output:
    each wave dir holds WARC shards + a _cdx parquet index, the record
    readback covers exactly the oracle's seen set with self-consistent
    digests, and a CDX row random-accesses its record."""
    import pyarrow.parquet as pq

    from scraper_ray.crawl import CrawlConfig, crawl, read_docs
    from scraper_ray.oracle import crawl_oracle
    from scraper_ray.synthweb import WebConfig, default_politeness, gen_seeds

    web = WebConfig(seed=5, n_entities=6, items_per_page=4, max_pages_cap=6,
                    dup_rate=0.2, alias_rate=0.2)
    pol = default_politeness(web, wave_units=10)
    seeds = gen_seeds(web, 30)
    out = str(tmp_path / "docs")
    stats = crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                                     batch_size=64, sink_format="warc"))
    wave_dirs = sorted(glob.glob(os.path.join(out, "wave=*")))
    assert len(wave_dirs) == stats.waves
    for d in wave_dirs:
        assert glob.glob(os.path.join(d, "part-*.warc.gz"))
        assert glob.glob(os.path.join(d, "_cdx", "*.parquet"))

    oracle = crawl_oracle(seeds, web, pol)
    recs = read_docs(out, format="warc").to_pandas()
    assert set(recs["url"]) == oracle.seen
    assert len(recs) == stats.docs
    # record digests are self-consistent with their payload bytes
    assert all(hashlib.md5(p).hexdigest() == dg
               for p, dg in zip(recs["payload"], recs["digest"]))

    # CDX random access: every row of one wave's index resolves to its
    # record without reading the rest of the shard
    cdx = pq.read_table(os.path.join(wave_dirs[0], "_cdx")).to_pylist()
    assert cdx
    for row in cdx[:5]:
        one = read_warc_member(
            os.path.join(wave_dirs[0], row["filename"]),
            row["offset"], row["member_length"]).to_pylist()
        assert len(one) == 1 and one[0]["url"] == row["url"]
        assert one[0]["digest"] == row["digest"]
