"""Invariant tests for the recrawl-diff, anchor-text and link-degree
operators (the crawl-maintenance family). The value-level correctness
gate is the DuckDB oracle in tests/test_pipelines.py; these pin the
semantics that the oracle comparison can't express directly —
rev-0 backward compatibility, status partitioning, anchor/slot
alignment and degree mass conservation."""

from dataclasses import replace

from scraper_ray.synthweb import WebConfig, fetch_page

WEB = WebConfig(seed=7, n_entities=6, items_per_page=5, max_pages_cap=6,
                dup_rate=0.1, alias_rate=0.2)


def _all_urls(cfg: WebConfig) -> list[str]:
    urls = []
    for e in cfg.entities():
        for p in range(1, cfg.max_pages(e) + 1):
            urls.append(cfg.list_url(e, p))
            page = fetch_page(cfg.list_url(e, p), cfg)
            urls.extend(u for u in page.child_urls if "/item/" in u)
    return urls


def test_rev_zero_is_identity():
    # rev=0 must be byte-identical to a config without the field set:
    # every rev branch in synthweb is a no-op at rev 0
    cfg0 = replace(WEB, rev=0)
    for e in WEB.entities():
        assert WEB.max_pages(e) == cfg0.max_pages(e)
        for p in range(1, WEB.max_pages(e) + 1):
            u = WEB.list_url(e, p)
            assert fetch_page(u, WEB) == fetch_page(u, cfg0)


def test_rev_one_changes_some_detail_pages_and_page_counts():
    cfg1 = replace(WEB, rev=1)
    # URL churn: at least one entity grew or shrank a page
    assert any(WEB.max_pages(e) != cfg1.max_pages(e) for e in WEB.entities())
    # content churn: some (not all) detail pages changed their spans
    changed = same = 0
    for e in WEB.entities():
        for item_id in range(200):
            u = WEB.item_url(e, item_id)
            if fetch_page(u, WEB).spans != fetch_page(u, cfg1).spans:
                changed += 1
            else:
                same += 1
    assert changed > 0 and same > 0
    # roughly change_rate of items move (deterministic, loose band)
    frac = changed / (changed + same)
    assert 0.10 < frac < 0.45


def test_rev_is_stable_within_a_revision():
    # the mutation is a pure function of (seed, rev): re-fetching at the
    # same rev yields identical pages (recrawl determinism)
    cfg1 = replace(WEB, rev=1)
    for e in WEB.entities()[:2]:
        for item_id in range(20):
            u = WEB.item_url(e, item_id)
            assert fetch_page(u, cfg1) == fetch_page(u, cfg1)


def test_recrawl_diff_partitions_the_url_universe(ray_session):
    from scraper_ray.pipelines.crawl_queries import _run_crawl, q_recrawl_diff

    sf = "/root/testdata/sf0.001"
    diff = q_recrawl_diff(sf).to_pandas()
    assert set(diff["status"]) <= {"added", "removed", "changed",
                                   "unchanged"}
    # each URL appears exactly once
    assert diff["url"].is_unique
    urls0 = set(_run_crawl(sf, rev=0).to_pandas()["url"])
    urls1 = set(_run_crawl(sf, rev=1).to_pandas()["url"])
    assert set(diff["url"]) == urls0 | urls1
    by = diff.groupby("status")["url"].apply(set).to_dict()
    assert by.get("added", set()) == urls1 - urls0
    assert by.get("removed", set()) == urls0 - urls1
    assert (by.get("changed", set()) | by.get("unchanged", set())
            == urls0 & urls1)


def test_anchor_text_matches_item_span(ray_session):
    """Planted check: a crawled item's min/max anchor text is one of the
    'item {id} ...' spans from the list pages that link it."""
    from scraper_ray.pipelines.crawl_queries import _cfg_for, _run_crawl
    from scraper_ray.pipelines.graph import q_anchor_text

    sf = "/root/testdata/sf0.001"
    web, _ = _cfg_for(sf)
    out = q_anchor_text(sf).to_pandas()
    docs = _run_crawl(sf).to_pandas()
    url_of = dict(zip(docs["doc_id"], docs["url"]))
    item_rows = out[out["dst"].map(
        lambda d: "/item/" in url_of.get(d, ""))]
    assert len(item_rows) > 0
    for _, r in item_rows.head(25).iterrows():
        item_id = url_of[r["dst"]].rstrip("/").rsplit("/", 1)[-1]
        assert r["min_anchor"].startswith(f"item {item_id} ")
        assert r["max_anchor"].startswith(f"item {item_id} ")
    # list pages (when linked) carry either an item anchor or the
    # pagination label
    assert (out["n_inlinks"] > 0).all()


def test_link_degree_mass_conservation(ray_session):
    from scraper_ray.pipelines.crawl_queries import _cfg_for, _run_crawl
    from scraper_ray.pipelines.graph import crawl_link_edges, q_link_degree

    sf = "/root/testdata/sf0.001"
    web, _ = _cfg_for(sf)
    docs = _run_crawl(sf)
    hist = q_link_degree(sf).to_pandas()
    n_docs = docs.count()
    n_edges = crawl_link_edges(docs, web).count()
    assert int(hist["n_nodes"].sum()) == n_docs
    assert int((hist["in_degree"] * hist["n_nodes"]).sum()) == n_edges
