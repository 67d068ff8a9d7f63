"""Incremental-crawl conformance: `crawl(..., skip_urls=...)` must
equal the sequential oracle run with the same pre-seen set — docs,
order, and final seen set — and must never fetch a skipped URL."""

from dataclasses import replace

import ray.data as rd

from scraper_ray.crawl import CrawlConfig, crawl, read_docs
from scraper_ray.oracle import crawl_oracle
from scraper_ray.schema import order_key_columns
from scraper_ray.synthweb import WebConfig, default_politeness, gen_seeds

WEB = WebConfig(seed=11, n_entities=8, items_per_page=6, max_pages_cap=6,
                dup_rate=0.15, alias_rate=0.2)


def _full_then_incremental(tmp_path, skip_as_dataset: bool):
    pol = default_politeness(WEB, wave_units=40)
    seeds = gen_seeds(WEB, 60)
    res0 = crawl_oracle(seeds, WEB, pol)
    skip = [d["url"] for d in res0.docs if d["page_type"] == "detail"]

    web1 = replace(WEB, rev=1)
    oracle = crawl_oracle(seeds, web1, pol, pre_seen=set(skip))

    out = str(tmp_path / ("inc_ds" if skip_as_dataset else "inc_list"))
    skip_arg = (rd.from_items([{"url": u} for u in skip])
                if skip_as_dataset else skip)
    stats = crawl(seeds, CrawlConfig(web=web1, politeness=pol, out_dir=out,
                                     batch_size=256),
                  skip_urls=skip_arg)
    docs = read_docs(out).to_pandas()
    return res0, oracle, stats, docs, set(skip)


def test_incremental_matches_oracle_dataset_skip(ray_session, tmp_path):
    res0, oracle, stats, docs, skip = _full_then_incremental(tmp_path, True)
    # the engine fetched exactly the oracle's pages, in oracle order
    es = docs.sort_values(order_key_columns()).reset_index(drop=True)
    assert es["url"].tolist() == [d["url"] for d in oracle.docs]
    # no pre-seen URL was fetched
    assert not (set(docs["url"]) & skip)
    # final seen set (incl. preseeds) matches
    assert stats.seen_total == len(oracle.seen)
    assert stats.counters["n_preseeded"] == len(skip)
    # hubs were re-fetched, and something new was found
    assert (docs["page_type"] == "list").any()
    assert (docs["page_type"] == "detail").any()


def test_incremental_matches_oracle_list_skip(ray_session, tmp_path):
    _, oracle, stats, docs, skip = _full_then_incremental(tmp_path, False)
    assert set(docs["url"]) == {d["url"] for d in oracle.docs}
    assert not (set(docs["url"]) & skip)
    assert stats.counters["n_preseeded"] == len(skip)


def test_skipped_seeds_are_dropped_at_admission(ray_session, tmp_path):
    """A seed inside the skip list must not be fetched (and must not
    trip the emission-freshness assert)."""
    pol = default_politeness(WEB, wave_units=40)
    seeds = gen_seeds(WEB, 20)
    res0 = crawl_oracle(seeds, WEB, pol)
    # skip EVERY rev-0 url, seeds included -> nothing can be crawled at
    # rev 0 (no churn), because discovery needs a fetched page
    skip = [d["url"] for d in res0.docs]
    out = str(tmp_path / "all_skip")
    stats = crawl(seeds, CrawlConfig(web=WEB, politeness=pol, out_dir=out,
                                     batch_size=256),
                  skip_urls=skip)
    assert stats.docs == 0
    oracle = crawl_oracle(seeds, WEB, pol, pre_seen=set(skip))
    assert not oracle.docs
