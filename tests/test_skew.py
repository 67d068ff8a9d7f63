"""Skew scenario (FIXTURES.md F2: one domain dominates) + randomized
conformance sweeps."""

import pytest

from scraper_ray.crawl import CrawlConfig, crawl, read_docs
from scraper_ray.oracle import crawl_oracle
from scraper_ray.schema import order_key_columns
from scraper_ray.synthweb import WebConfig, default_politeness, gen_seeds


@pytest.mark.usefixtures("ray_session")
def test_skewed_heavy_domain(tmp_path):
    """Entity 0 holds ~half the web. Conformance must hold, the heavy
    domain must stay budget-bounded per wave (skew containment), and
    light domains must not be starved behind it."""
    web = WebConfig(seed=13, n_entities=6, items_per_page=4, max_pages_cap=6,
                    dup_rate=0.1, alias_rate=0.1, skew_entity_share=0.8)
    pol = default_politeness(web, wave_units=8)
    seeds = gen_seeds(web, 40)
    out = str(tmp_path / "docs")
    crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                             batch_size=64))
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, web, pol)
    assert set(docs["url"]) == oracle.seen
    key = order_key_columns()
    assert (docs.sort_values(key)["url"].tolist()
            == [d["url"] for d in oracle.docs])

    heavy = docs[docs["domain_key"] == "ent0000.test"]
    light = docs[docs["domain_key"] != "ent0000.test"]
    assert len(heavy) > len(light)          # the skew is real
    # budget containment per wave
    for (dom, _w), n in docs.groupby(["domain_key", "wave"]).size().items():
        assert n <= pol.budget_per_wave(dom)
    # no starvation: light domains finish while the heavy one continues
    assert light["wave"].max() < heavy["wave"].max()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_conformance(tmp_path, seed):
    """Random small webs: engine == oracle on seen set and order."""
    import hashlib

    h = int.from_bytes(hashlib.sha1(str(seed).encode()).digest()[:4], "big")
    web = WebConfig(seed=seed, n_entities=3 + h % 5,
                    items_per_page=2 + (h >> 8) % 4,
                    max_pages_cap=2 + (h >> 16) % 5,
                    dup_rate=0.1 + (h % 30) / 100,
                    alias_rate=0.1 + ((h >> 4) % 40) / 100)
    pol = default_politeness(web, wave_units=4 + h % 20)
    seeds = gen_seeds(web, 20 + h % 30)
    out = str(tmp_path / f"d{seed}")
    crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=out,
                             n_seen_shards=2, n_sched_shards=2, batch_size=32))
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, web, pol)
    assert set(docs["url"]) == oracle.seen, "seen-set mismatch"
    assert (docs.sort_values(order_key_columns())["url"].tolist()
            == [d["url"] for d in oracle.docs]), "order mismatch"
    # invariant: no URL fetched twice
    assert docs["url"].is_unique
