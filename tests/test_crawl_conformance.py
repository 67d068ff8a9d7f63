"""Conformance: the Ray crawl engine vs the sequential oracle.

The BASELINE.json contract: same seed list + politeness budget =>
(a) final URL-seen set exact match,
(b) crawl-order match under the deterministic key (global sort equality
    + per-domain chronological order = key order, i.e. wave numbers
    nondecreasing along each domain's key order),
(c) per-row span-sequence equality (kind, text, media_ref, order),
(d) politeness: per-(domain, wave) fetch counts never exceed the budget.
"""

import pytest

from scraper_ray.crawl import CrawlConfig, crawl, read_docs
from scraper_ray.oracle import crawl_oracle
from scraper_ray.schema import order_key_columns
from scraper_ray.synthweb import WebConfig, default_politeness, gen_seeds

CFG = WebConfig(seed=11, n_entities=8, items_per_page=5, max_pages_cap=8,
                dup_rate=0.2, alias_rate=0.3)
POL = default_politeness(CFG, wave_units=12)


@pytest.fixture(scope="module")
def crawl_run(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("docs"))
    seeds = gen_seeds(CFG, 60)
    ccfg = CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                       n_seen_shards=3, n_sched_shards=2, batch_size=64)
    stats = crawl(seeds, ccfg)
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, CFG, POL)
    return stats, docs, oracle


def test_seen_set_equality(crawl_run):
    stats, docs, oracle = crawl_run
    assert set(docs["url"]) == oracle.seen
    assert stats.seen_total == len(oracle.seen)
    assert len(docs) == len(oracle.docs)
    assert docs["url"].is_unique


def test_crawl_order_equality(crawl_run):
    _, docs, oracle = crawl_run
    key = order_key_columns()
    engine_sorted = docs.sort_values(key).reset_index(drop=True)
    for i, od in enumerate(oracle.docs):
        row = engine_sorted.iloc[i]
        assert row["url"] == od["url"], i
        assert row["doc_id"] == od["doc_id"]
        assert row["depth"] == od["depth"]
        assert row["parent_id"] == od["parent_id"]
        assert row["child_idx"] == od["child_idx"]


def test_per_domain_chronological_order_is_key_order(crawl_run):
    _, docs, _ = crawl_run
    key = order_key_columns()
    for dom, grp in docs.groupby("domain_key"):
        g = grp.sort_values(key)
        waves = g["wave"].tolist()
        assert waves == sorted(waves), dom


def test_span_sequence_equality(crawl_run):
    _, docs, oracle = crawl_run
    by_id = {d["doc_id"]: d for d in oracle.docs}
    for _, row in docs.iterrows():
        ospans = by_id[row["doc_id"]]["spans"]
        espans = list(row["spans"])
        assert len(espans) == len(ospans)
        for e, o in zip(espans, ospans):
            assert (e["kind"], e["text"], e["media_ref"], e["offset"]) == (
                o["kind"], o["text"], o["media_ref"], o["offset"]
            )


def test_politeness_budget_never_exceeded(crawl_run):
    _, docs, _ = crawl_run
    counts = docs.groupby(["domain_key", "wave"]).size()
    for (dom, _wave), n in counts.items():
        assert n <= POL.budget_per_wave(dom), (dom, n)


def test_robots_never_fetched(crawl_run):
    _, docs, _ = crawl_run
    from urllib.parse import urlsplit

    for u in docs["url"]:
        parts = urlsplit(u)
        from scraper_ray.canonicalize import registered_domain

        assert POL.allowed(registered_domain(parts.hostname or ""), parts.path)


def test_global_level_sync_same_result(ray_session, tmp_path):
    """level_sync='global' (safe mode for cross-domain links) must yield
    the identical seen set and ordering on the synthetic web."""
    seeds = gen_seeds(CFG, 40)
    ccfg = CrawlConfig(web=CFG, politeness=POL, out_dir=str(tmp_path / "g"),
                       n_seen_shards=2, n_sched_shards=2, batch_size=64,
                       level_sync="global")
    crawl(seeds, ccfg)
    docs = read_docs(str(tmp_path / "g")).to_pandas()
    oracle = crawl_oracle(seeds, CFG, POL)
    assert set(docs["url"]) == oracle.seen
    key = order_key_columns()
    engine_sorted = docs.sort_values(key).reset_index(drop=True)
    assert engine_sorted["url"].tolist() == [d["url"] for d in oracle.docs]


def test_retry_and_dead_letter_conformance(ray_session, tmp_path):
    """With transient fetch failures injected, engine == oracle, error
    docs surface as dead letters (never silently dropped), and retry
    counts match."""
    web = WebConfig(seed=31, n_entities=5, items_per_page=4, max_pages_cap=5,
                    dup_rate=0.1, alias_rate=0.2, fail_rate=0.35)
    pol = default_politeness(web, wave_units=16)
    seeds = gen_seeds(web, 40)
    out = str(tmp_path / "r")
    crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                             batch_size=64))
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, web, pol)
    assert set(docs["url"]) == oracle.seen
    key = order_key_columns()
    es = docs.sort_values(key).reset_index(drop=True)
    assert es["url"].tolist() == [d["url"] for d in oracle.docs]
    by_id = {d["doc_id"]: d for d in oracle.docs}
    for _, row in docs.iterrows():
        od = by_id[row["doc_id"]]
        assert row["page_type"] == od["page_type"]
        assert row["n_attempts"] == od["n_attempts"]
    # failures actually happened and are visible
    assert (docs["page_type"] == "error").any()
    assert (docs["n_attempts"] > 1).any()


def test_mid_crawl_robots_filtering(ray_session, tmp_path):
    """Discovered (not just seeded) links under /private/ are filtered by
    robots for disallowed domains, fetched as 'empty' docs elsewhere —
    engine matches oracle either way and counts the blocks."""
    web = WebConfig(seed=17, n_entities=6, items_per_page=5, max_pages_cap=4,
                    private_link_rate=0.3)
    pol = default_politeness(web, wave_units=16)
    seeds = gen_seeds(web, 30)
    out = str(tmp_path / "p")
    stats = crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                                     batch_size=64))
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, web, pol)
    assert set(docs["url"]) == oracle.seen
    assert (docs.sort_values(order_key_columns())["url"].tolist()
            == [d["url"] for d in oracle.docs])
    # mid-crawl discoveries were actually blocked by robots
    assert stats.counters.get("n_robots_blocked", 0) > 0
    assert oracle.n_robots_blocked > 0
    # /private/ URLs of disallowed domains never fetched; allowed domains
    # do fetch them (as 'empty' leaf pages)
    from urllib.parse import urlsplit

    from scraper_ray.canonicalize import registered_domain

    priv = docs[docs["url"].str.contains("/private/")]
    assert len(priv) > 0
    for u in priv["url"]:
        parts = urlsplit(u)
        assert pol.allowed(registered_domain(parts.hostname or ""), parts.path)


def test_property_random_webs_match_oracle(ray_session, tmp_path):
    """Property sweep: engine == sequential oracle (seen set, order,
    span sequences) across randomized web shapes — entity counts, page
    caps, dup/alias churn, budget tightness, shard counts. Derandomized
    (fixed example set) so the suite stays deterministic."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    runs = [0]

    @settings(max_examples=6, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(seed=st.integers(0, 10_000),
           ents=st.integers(2, 9),
           ipp=st.integers(1, 6),
           cap=st.integers(1, 6),
           dup=st.floats(0.0, 0.4),
           alias=st.floats(0.0, 0.4),
           units=st.integers(4, 24),
           n_seeds=st.integers(10, 80),
           shards=st.integers(1, 4))
    def check(seed, ents, ipp, cap, dup, alias, units, n_seeds, shards):
        web = WebConfig(seed=seed, n_entities=ents, items_per_page=ipp,
                        max_pages_cap=cap, dup_rate=dup, alias_rate=alias)
        pol = default_politeness(web, wave_units=units)
        seeds = gen_seeds(web, n_seeds)
        runs[0] += 1
        out = str(tmp_path / f"docs{runs[0]}")
        crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                                 n_seen_shards=shards, n_sched_shards=shards,
                                 batch_size=128))
        docs = read_docs(out).to_pandas()
        oracle = crawl_oracle(seeds, web, pol)
        assert set(docs["url"]) == oracle.seen
        es = docs.sort_values(order_key_columns()).reset_index(drop=True)
        assert es["url"].tolist() == [d["url"] for d in oracle.docs]
        got_spans = es["spans"].tolist()
        want = [d["spans"] for d in oracle.docs]
        for g, w in zip(got_spans, want):
            assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in g] == \
                   [(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in w]

    check()
