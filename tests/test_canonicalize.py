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


def test_fast_path_agrees_with_full_normalizer():
    """The fast-path recognizer must be semantics-preserving: for any URL
    it accepts, the full normalizer returns the same string."""
    import scraper_ray.canonicalize as c

    def slow(url):
        fast = c._canonical_fast
        c._canonical_fast = lambda u: None
        try:
            return c.canonicalize_url(url)
        finally:
            c._canonical_fast = fast

    cases = [
        "http://x.test/a", "http://x.test", "http://x.test/",
        "http://x.test//a//", "http://x.test/a..b/c", "http://x.test/~u/.h",
        "http://x.test/a.", "http://x.test/.", "http://x.test/..",
        "http://x.test/a/.", "HTTP://X.test/a", "http://x.test:80/a",
        "http://x.test/a/../b", "http://x.test/a%2Fb", "http://x.test/a?x=1",
        "http://x.test/a#f", "https://y.test/Q:Z@x", "http://x.TEST/a",
        "http://user@x.test/a", "http://x.test./a",
    ]
    from scraper_ray.synthweb import WebConfig, fetch_page, gen_seeds

    cfg = WebConfig(seed=99, n_entities=6, items_per_page=5, max_pages_cap=4,
                    alias_rate=0.5)
    cases += gen_seeds(cfg, 200)
    for ent in cfg.entities()[:3]:
        cases += list(fetch_page(cfg.list_url(ent, 1), cfg).child_urls)
    for u in cases:
        assert c.canonicalize_url(u) == slow(u), u


def test_hypothesis_canonicalize_idempotent_and_fast_consistent():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import scraper_ray.canonicalize as c

    part = st.text(
        alphabet="abcxyzABC019-._~%/?#:@ &=+!,();$'", min_size=0, max_size=25)

    @settings(max_examples=300, deadline=None)
    @given(scheme=st.sampled_from(["http", "https"]),
           host=st.from_regex(r"[a-zA-Z0-9.\-]{1,20}", fullmatch=True),
           rest=part)
    def check(scheme, host, rest):
        url = f"{scheme}://{host}/{rest}"
        out = c.canonicalize_url(url)
        if out is not None:
            # idempotent
            assert c.canonicalize_url(out) == out
            # fast path (if taken on the canonical form) agrees
            fast = c._canonical_fast(out)
            if fast is not None:
                assert fast == out

    check()


def test_malformed_ports_dropped():
    assert canonicalize_url("http://h:99999/x") is None
    assert canonicalize_url("http://h:abc/x") is None


def test_ipv6_hosts_keep_brackets():
    from scraper_ray.canonicalize import host_of

    u = canonicalize_url("http://[2001:DB8::1]:8080/x")
    assert u == "http://[2001:db8::1]:8080/x"
    assert host_of(u) == "2001:db8::1"
    assert registered_domain("2001:db8::1") == "2001:db8::1"
    # default port removal still applies
    assert canonicalize_url("http://[2001:db8::1]:80/x") == "http://[2001:db8::1]/x"
