"""Unit tests: deterministic synthetic web + oracle crawler."""

from scraper_ray.canonicalize import canonicalize_url
from scraper_ray.oracle import crawl_oracle
from scraper_ray.synthweb import (
    WebConfig,
    default_politeness,
    fetch_page,
    gen_seeds,
)

CFG = WebConfig(seed=7, n_entities=5, items_per_page=4, max_pages_cap=6)


def test_fetch_page_deterministic():
    url = CFG.list_url("ent0001", 1)
    p1, p2 = fetch_page(url, CFG), fetch_page(url, CFG)
    assert p1 == p2
    assert p1.page_type == "list"
    # items in DOM order, next-page link last
    assert p1.child_urls[-1] == CFG.list_url("ent0001", 2)
    assert len(p1.child_urls) == CFG.items_per_page + 1


def test_stop_on_empty():
    beyond = CFG.max_pages("ent0001") + 1
    p = fetch_page(CFG.list_url("ent0001", beyond), CFG)
    assert p.page_type == "empty"
    assert p.child_urls == ()


def test_detail_spans_interleaved():
    lp = fetch_page(CFG.list_url("ent0000", 1), CFG)
    item_raw = lp.child_urls[0]
    item = canonicalize_url(item_raw)
    p = fetch_page(item, CFG)
    assert p.page_type == "detail"
    kinds = [s.kind for s in p.spans]
    assert kinds.count("media") == 1
    assert kinds.count("text") >= CFG.text_spans_lo
    # offsets are the 0-based DOM positions
    assert [s.offset for s in p.spans] == list(range(len(p.spans)))
    media = next(s for s in p.spans if s.kind == "media")
    assert media.text == "" and media.media_ref.startswith("http://cdn.")
    for s in p.spans:
        if s.kind == "text":
            assert s.media_ref == ""


def test_aliases_canonicalize_back():
    # every messy child link must canonicalize to a well-formed synth URL
    for page_n in range(1, 4):
        p = fetch_page(CFG.list_url("ent0000", page_n), CFG)
        for raw in p.child_urls:
            cu = canonicalize_url(raw)
            assert cu is not None
            rp = fetch_page(cu, CFG)
            assert rp.page_type in ("list", "detail")


def test_gen_seeds_deterministic():
    s1, s2 = gen_seeds(CFG, 50), gen_seeds(CFG, 50)
    assert s1 == s2
    assert len(s1) == 50


def test_oracle_basic_invariants():
    seeds = gen_seeds(CFG, 40)
    pol = default_politeness(CFG)
    res = crawl_oracle(seeds, CFG, pol)
    # every admitted URL fetched exactly once
    fetched = [d["url"] for d in res.docs]
    assert len(fetched) == len(set(fetched))
    assert set(fetched) == res.seen
    # robots: no disallowed URL ever fetched
    from urllib.parse import urlsplit

    from scraper_ray.canonicalize import registered_domain

    for u in fetched:
        parts = urlsplit(u)
        assert pol.allowed(registered_domain(parts.hostname or ""), parts.path), u
    assert res.n_robots_blocked > 0   # seeds do contain blocked URLs
    assert res.n_duplicates > 0       # dup_rate + aliasing exercised
    # pop order is key-sorted on (depth, path) — the discovery-path key
    # (linear extension proof, SURVEY §7.3)
    keys = [(d["depth"], d["path"]) for d in res.docs]
    assert keys == sorted(keys)
    # ascending pages along discovery chains: page p's successor p+1 is
    # fetched after p (seeds may inject deeper pages directly, so only the
    # chain property holds — matching stop-on-empty ascending iteration)
    pos = {d["url"]: i for i, d in enumerate(res.docs)}
    by_id = {d["doc_id"]: d for d in res.docs}
    for d in res.docs:
        if d["parent_id"]:
            parent = by_id[d["parent_id"]]
            assert pos[parent["url"]] < pos[d["url"]]


def test_oracle_deterministic():
    seeds = gen_seeds(CFG, 30)
    r1 = crawl_oracle(seeds, CFG)
    r2 = crawl_oracle(seeds, CFG)
    assert [d["doc_id"] for d in r1.docs] == [d["doc_id"] for d in r2.docs]
    assert r1.seen == r2.seen
