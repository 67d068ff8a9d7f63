"""Unit tests: RFC 3986 canonicalization + SHA-1 keying."""

import hashlib

import pyarrow as pa
import pytest

from scraper_ray.canonicalize import (
    canonicalize_batch,
    canonicalize_url,
    doc_id_for,
    frontier_table,
    registered_domain,
    sha1_url,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTP://WWW.Example.COM/a/b", "http://www.example.com/a/b"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/a/./b/../c", "http://example.com/a/c"),
        ("http://example.com/a/b/..", "http://example.com/a/"),
        ("http://example.com/../x", "http://example.com/x"),
        ("http://example.com/a#frag", "http://example.com/a"),
        ("http://example.com/%7euser/%41bc", "http://example.com/~user/Abc"),
        ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
        ("http://example.com/it%65m/9/", "http://example.com/item/9/"),
        ("http://example.com/a b", "http://example.com/a%20b"),
        ("http://example.com/p?a=1&a=1&b=2", "http://example.com/p?a=1&b=2"),
        ("http://example.com/p?b=2&a=1", "http://example.com/p?b=2&a=1"),
        ("http://example.com./x", "http://example.com/x"),
        ("  http://example.com/x  ", "http://example.com/x"),
    ],
)
def test_canonicalize_url(raw, expected):
    assert canonicalize_url(raw) == expected


@pytest.mark.parametrize("raw", ["ftp://example.com/x", "mailto:a@b.c", "", "not a url", "http://"])
def test_canonicalize_rejects(raw):
    assert canonicalize_url(raw) is None


def test_canonicalize_idempotent():
    urls = [
        "HTTP://WWW.Example.COM:80/a/./b/../c?x=1&x=1#f",
        "http://www.ent0003.test/./x/../item/1234/",
    ]
    for u in urls:
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once


@pytest.mark.parametrize(
    "host,expected",
    [
        ("www.example.com", "example.com"),
        ("a.b.c.example.co.uk", "example.co.uk"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("www.ent0001.test", "ent0001.test"),
        ("192.168.0.1", "192.168.0.1"),
    ],
)
def test_registered_domain(host, expected):
    assert registered_domain(host) == expected


def test_sha1_keys():
    u = "http://example.com/x"
    assert sha1_url(u) == hashlib.sha1(u.encode()).digest()
    assert doc_id_for(u) == hashlib.sha1(u.encode()).hexdigest()
    assert len(sha1_url(u)) == 20


def test_frontier_table_collapses_aliases():
    tbl = frontier_table(
        [
            "http://WWW.Example.com:80/item/1/",
            "http://www.example.com/item/1/#f",
            "http://www.example.com/item/2/",
            "ftp://bad/x",
        ],
        depth=0,
        parent_ids="",
    )
    assert tbl.num_rows == 2
    urls = tbl.column("url").to_pylist()
    assert urls == ["http://www.example.com/item/1/", "http://www.example.com/item/2/"]
    # first-discovery wins: the alias at child_idx 0 beats child_idx 1
    assert tbl.column("child_idx").to_pylist() == [0, 2]
    assert tbl.column("domain_key").to_pylist() == ["example.com", "example.com"]


def test_canonicalize_batch_schema():
    batch = pa.table({"url": ["http://a.example.com/x", "bogus"]})
    out = canonicalize_batch(batch)
    assert out.num_rows == 1
    assert out.schema.field("url_sha1").type == pa.binary(20)
