"""Robots handling: the RFC 9309 parser (functions/robots.py), the
vectorized robots_filter vs the per-row politeness.allowed oracle, the
synthetic web's robots.txt serving, and end-to-end robots discovery
(fetch + parse -> PolitenessConfig) matching the hand-built config."""

from urllib.parse import urlsplit

import pyarrow as pa

from scraper_ray.functions.robots import RobotsRules, parse_robots
from scraper_ray.state.scheduler import robots_filter
from scraper_ray.synthweb import (
    PolitenessConfig,
    WebConfig,
    default_politeness,
    robots_text_for,
)


def _batch(rows):
    return pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "domain_key": pa.array([d for _, d in rows], pa.string()),
    })


POL = PolitenessConfig(disallow={
    "a.test": ("/admin", "/private/"),
    "b.test": ("/x",),
})

ROWS = [
    ("http://www.a.test/admin/panel", "a.test"),        # blocked
    ("http://www.a.test/administrate", "a.test"),       # blocked (prefix)
    ("http://www.a.test/public/admin", "a.test"),       # allowed
    ("http://www.a.test/private/", "a.test"),           # blocked
    ("http://www.a.test/priv", "a.test"),               # allowed
    ("http://www.a.test/admin?q=/safe", "a.test"),      # blocked (path only)
    ("http://www.a.test/safe?q=/admin", "a.test"),      # allowed (query ignored)
    ("http://www.a.test", "a.test"),                    # allowed (no path)
    ("http://www.b.test/x/1", "b.test"),                # blocked
    ("http://www.b.test/y/x", "b.test"),                # allowed
    ("http://www.c.test/admin", "c.test"),              # allowed (no rules)
]


def test_matches_per_row_oracle():
    tbl = _batch(ROWS)
    out, n_blocked = robots_filter(tbl, POL)
    keep_oracle = [POL.allowed(d, urlsplit(u).path) for u, d in ROWS]
    assert n_blocked == keep_oracle.count(False) == 5
    assert out.column("url").to_pylist() == [
        u for (u, _), k in zip(ROWS, keep_oracle) if k]


def test_no_rules_short_circuits():
    tbl = _batch(ROWS)
    out, n = robots_filter(tbl, PolitenessConfig())
    assert n == 0 and out is tbl


def test_empty_batch():
    out, n = robots_filter(_batch([]), POL)
    assert n == 0 and out.num_rows == 0


# ---------------------------------------------------------------------------
# RFC 9309 parser
# ---------------------------------------------------------------------------

def test_parse_basic_group():
    r = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n"
        "Crawl-delay: 2\nSitemap: http://x.test/s.xml\n")
    assert r.disallow == ("/private/",)
    assert r.allow == ("/private/ok/",)
    assert r.crawl_delay == 2.0


def test_parse_specific_agent_beats_star():
    txt = ("User-agent: *\nDisallow: /\n\n"
           "User-agent: graftbot\nDisallow: /x/\nCrawl-delay: 1\n")
    assert parse_robots(txt, "graftbot").disallow == ("/x/",)
    assert parse_robots(txt, "someoneelse").disallow == ("/",)


def test_parse_prefix_token_match():
    # RFC: longest token that is a prefix of the agent wins over *
    txt = ("User-agent: graft\nDisallow: /a/\n\n"
           "User-agent: *\nDisallow: /b/\n")
    assert parse_robots(txt, "graftbot").disallow == ("/a/",)


def test_parse_multi_token_group_and_merge():
    # consecutive User-agent lines head ONE group; same-specificity
    # groups merge
    txt = ("User-agent: graftbot\nUser-agent: otherbot\nDisallow: /a/\n\n"
           "User-agent: graftbot\nDisallow: /b/\nCrawl-delay: 3\n")
    r = parse_robots(txt, "graftbot")
    assert set(r.disallow) == {"/a/", "/b/"}
    assert r.crawl_delay == 3.0
    assert parse_robots(txt, "otherbot").disallow == ("/a/",)


def test_parse_tolerance():
    # case-insensitive fields, comments, blank lines, empty Disallow
    # ignored, rules before any User-agent line ignored, junk lines
    txt = ("Disallow: /orphan/\n"
           "# header comment\n"
           "USER-AGENT: *   # trailing\n"
           "DISALLOW:\n"
           "disallow: /x/  # inline\n"
           "not a field line\n"
           "CRAWL-delay:  4.5\n")
    r = parse_robots(txt)
    assert r.disallow == ("/x/",)
    assert r.crawl_delay == 4.5


def test_parse_no_matching_group_allows_all():
    r = parse_robots("User-agent: otherbot\nDisallow: /\n", "graftbot")
    assert r.disallow == () and r.allowed("/anything")


def test_rules_longest_match_and_wildcards():
    r = RobotsRules(disallow=("/p/", "/*.zip$"), allow=("/p/open/",))
    assert not r.allowed("/p/secret")
    assert r.allowed("/p/open/doc")          # longer allow wins
    assert not r.allowed("/files/a.zip")     # * and $ wildcard
    assert r.allowed("/files/a.zip.txt")     # $ anchors the end
    assert r.allowed("/q/")
    # tie resolves to allow (least restrictive)
    assert RobotsRules(disallow=("/a/",), allow=("/a/",)).allowed("/a/x")
    # wildcard rules are excluded from the prefix-enforcement subset
    assert r.plain_prefixes() == (("/p/",), ("/p/open/",))


# ---------------------------------------------------------------------------
# allow-rule (longest-match) enforcement in the vectorized filter
# ---------------------------------------------------------------------------

POL_ALLOW = PolitenessConfig(
    disallow={"a.test": ("/private/",), "b.test": ("/x",)},
    allow={"a.test": ("/private/item/", "/private/i"), "b.test": ("/",)},
)

ALLOW_ROWS = [
    ("http://www.a.test/private/area/1", "a.test"),      # blocked
    ("http://www.a.test/private/item/9/", "a.test"),     # readmitted
    ("http://www.a.test/private/it", "a.test"),          # readmitted (/private/i)
    ("http://www.a.test/public/", "a.test"),             # allowed (no match)
    ("http://www.b.test/x/1", "b.test"),                 # blocked (allow '/' shorter)
    ("http://www.b.test/y", "b.test"),                   # allowed
]


def test_allow_rules_match_per_row_oracle():
    tbl = _batch(ALLOW_ROWS)
    out, n_blocked = robots_filter(tbl, POL_ALLOW)
    keep = [POL_ALLOW.allowed(d, urlsplit(u).path) for u, d in ALLOW_ROWS]
    assert keep == [False, True, True, True, False, True]
    assert n_blocked == 2
    assert out.column("url").to_pylist() == [
        u for (u, _), k in zip(ALLOW_ROWS, keep) if k]


# ---------------------------------------------------------------------------
# synthetic robots serving + discovery stage
# ---------------------------------------------------------------------------

WEB = WebConfig(seed=29, n_entities=11, items_per_page=4, max_pages_cap=4)


def test_robots_texts_parse_to_default_politeness():
    """Every render variant parses back to exactly the hand-built
    config's rules for the graftbot agent."""
    pol = default_politeness(WEB)
    for i, ent in enumerate(WEB.entities()):
        dom = f"{ent}.test"
        r = parse_robots(robots_text_for(WEB, ent))
        assert r.disallow == pol.disallow.get(dom, ()), ent
        assert r.crawl_delay == pol.crawl_delay(dom), ent
        # decoy/bogus groups must NOT leak through
        assert "/" not in r.disallow


def test_discover_politeness_matches_default(ray_session):
    from scraper_ray.stages.robots import discover_politeness

    got = discover_politeness(WEB, wave_units=24)
    ref = default_politeness(WEB, wave_units=24)
    assert got.disallow == ref.disallow
    for ent in WEB.entities():
        dom = f"{ent}.test"
        assert got.crawl_delay(dom) == ref.crawl_delay(dom)
        assert got.budget_per_wave(dom) == ref.budget_per_wave(dom)
        assert got.allowed(dom, "/private/x") == ref.allowed(dom, "/private/x")
        assert got.allowed(dom, "/listing/p1/") is True


def test_crawl_with_allow_override_matches_oracle(ray_session, tmp_path):
    """End-to-end: a config whose allow rule readmits /private/item/
    under a disallowed domain — engine crawl equals the sequential
    oracle (both share longest-match admission)."""
    from scraper_ray.crawl import CrawlConfig, crawl, read_docs
    from scraper_ray.oracle import crawl_oracle
    from scraper_ray.schema import order_key_columns
    from scraper_ray.synthweb import gen_seeds

    web = WebConfig(seed=37, n_entities=6, items_per_page=5, max_pages_cap=4,
                    private_link_rate=0.4)
    base = default_politeness(web, wave_units=16)
    pol = PolitenessConfig(
        seed=base.seed, wave_units=base.wave_units, disallow=base.disallow,
        allow={"ent0000.test": ("/private/item/",)})
    seeds = gen_seeds(web, 30)
    out = str(tmp_path / "a")
    crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                             batch_size=64))
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, web, pol)
    assert set(docs["url"]) == oracle.seen
    es = docs.sort_values(order_key_columns()).reset_index(drop=True)
    assert es["url"].tolist() == [d["url"] for d in oracle.docs]
    # the allow rule actually readmitted private item pages for ent0000
    readmitted = [u for u in docs["url"]
                  if "ent0000.test/private/item/" in u]
    assert readmitted
    # while /private/ elsewhere under disallowed domains stayed blocked
    assert not any("ent0003.test/private/" in u for u in docs["url"])


# ---------------------------------------------------------------------------
# sitemap ingestion (stages/sitemap.py)
# ---------------------------------------------------------------------------

def test_robots_sitemap_lines_collected_cross_group():
    txt = ("User-agent: otherbot\nDisallow: /\n\n"
           "Sitemap: http://www.a.test/sitemap.xml\n"
           "User-agent: *\nDisallow: /x/\n"
           "Sitemap: http://www.a.test/sitemap2.xml\n")
    r = parse_robots(txt, "graftbot")
    assert r.sitemaps == ("http://www.a.test/sitemap.xml",
                          "http://www.a.test/sitemap2.xml")
    assert r.disallow == ("/x/",)


def test_parse_sitemap_kinds():
    from scraper_ray.stages.sitemap import parse_sitemap

    kind, locs = parse_sitemap(
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        '<url><loc> http://a.test/p1/ </loc></url>'
        '<url><loc>http://a.test/p2/</loc><priority>0.5</priority></url>'
        '</urlset>')
    assert kind == "urlset"
    assert locs == ["http://a.test/p1/", "http://a.test/p2/"]
    kind, locs = parse_sitemap(
        '<sitemapindex><sitemap><loc>http://a.test/s1.xml</loc></sitemap>'
        '</sitemapindex>')
    assert kind == "sitemapindex" and locs == ["http://a.test/s1.xml"]
    assert parse_sitemap("<html>nope</html>") == ("invalid", [])
    assert parse_sitemap("not xml <<<") == ("invalid", [])


def test_discovered_seeds_match_synthetic_universe(ray_session):
    """Discovered seed set == the web's own definition of its sitemaps,
    for both flat-urlset and two-level-index entities."""
    from scraper_ray.stages.sitemap import discover_sitemap_seeds
    from scraper_ray.synthweb import serve_meta

    web = WebConfig(seed=41, n_entities=9, items_per_page=5, max_pages_cap=6)
    domains = [f"{e}.test" for e in web.entities()]
    out = discover_sitemap_seeds(
        domains, lambda u: serve_meta(web, u)).to_pandas()
    from scraper_ray.synthweb import _item_ids_for_page

    for i, ent in enumerate(web.entities()):
        got = set(out[out["domain"] == f"{ent}.test"]["url"])
        want = {web.list_url(ent, p)
                for p in range(1, web.max_pages(ent) + 1)}
        want |= {web.item_url(ent, x)
                 for x in _item_ids_for_page(web, ent, 1)}
        assert got == want, (ent, i)
    # both protocol shapes actually occurred
    assert any(i % 4 == 0 for i in range(9))


def test_crawl_from_sitemap_seeds_matches_oracle(ray_session, tmp_path):
    """Compose: sitemap discovery -> crawl; engine == sequential oracle
    on the discovered seed list."""
    from scraper_ray.crawl import CrawlConfig, crawl, read_docs
    from scraper_ray.oracle import crawl_oracle
    from scraper_ray.schema import order_key_columns
    from scraper_ray.stages.sitemap import discover_sitemap_seeds
    from scraper_ray.synthweb import serve_meta

    web = WebConfig(seed=43, n_entities=5, items_per_page=4, max_pages_cap=4)
    pol = default_politeness(web, wave_units=16)
    domains = [f"{e}.test" for e in web.entities()]
    seeds_df = discover_sitemap_seeds(
        domains, lambda u: serve_meta(web, u)).to_pandas()
    seeds = sorted(seeds_df["url"])
    out = str(tmp_path / "sm")
    crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                             batch_size=64))
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, web, pol)
    assert set(docs["url"]) == oracle.seen
    es = docs.sort_values(order_key_columns()).reset_index(drop=True)
    assert es["url"].tolist() == [d["url"] for d in oracle.docs]
