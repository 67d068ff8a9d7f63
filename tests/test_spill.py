"""Scheduler cold-tail disk spill: emission/order identical to the
in-memory path, files actually written and loaded, checkpointable."""

import glob
import os

import pyarrow as pa
import pytest

from scraper_ray.canonicalize import frontier_table
from scraper_ray.crawl import CrawlConfig, crawl, read_docs
from scraper_ray.oracle import crawl_oracle
from scraper_ray.schema import order_key_columns
from scraper_ray.synthweb import (PolitenessConfig, WebConfig,
                                  default_politeness, gen_seeds)


def _front(urls, depth=0, parent="", idxs=None):
    return frontier_table(urls, depth=depth, parent_ids=parent, child_idxs=idxs)


def _drain(pool):
    import ray

    waves = []
    w = 0
    while True:
        refs, n = pool.next_wave_refs(w)
        if n == 0 and pool.pending() == 0:
            return waves
        tbl = pa.concat_tables(ray.get(refs))
        waves.append(sorted(
            (r["depth"], r["path"], r["url"], r["parent_id"], r["child_idx"])
            for r in tbl.to_pylist()))
        w += 1
        assert w < 50


@pytest.mark.usefixtures("ray_session")
def test_spill_emission_equals_memory_path(tmp_path):
    """Same offers, spilling vs not: identical wave-by-wave emission."""
    from scraper_ray.state.scheduler import SchedulerPool

    pol = PolitenessConfig(wave_units=6, delays={"s.test": 2, "t.test": 3})
    offers = []
    for depth in (0, 1, 2, 3):
        urls = ([f"http://www.s.test/d{depth}/i{i}/" for i in range(6)]
                + [f"http://www.t.test/d{depth}/i{i}/" for i in range(4)])
        offers.append((urls, depth))

    spill_dir = str(tmp_path / "spill")
    pool_mem = SchedulerPool(pol, n_shards=2)
    pool_sp = SchedulerPool(pol, n_shards=2, spill_dir=spill_dir,
                            spill_threshold=5)
    for urls, depth in offers:
        pool_mem.offer(_front(urls, depth=depth))
        pool_sp.offer(_front(urls, depth=depth))

    # cold tail actually hit disk
    stats = pool_sp.stats()
    assert sum(s["spilled"] for s in stats) > 0
    assert glob.glob(os.path.join(spill_dir, "run_*.parquet"))

    assert _drain(pool_sp) == _drain(pool_mem)


@pytest.mark.usefixtures("ray_session")
def test_spill_keep_min_upgrade_across_boundary(tmp_path):
    """A URL spilled at one key and re-offered at a smaller key emits
    once, with the smaller key's attribution (keep-min holds across the
    memory/disk boundary)."""
    from scraper_ray.state.scheduler import SchedulerPool

    pol = PolitenessConfig(wave_units=100)
    pool = SchedulerPool(pol, n_shards=1, spill_dir=str(tmp_path / "sp"),
                         spill_threshold=2)
    url = "http://www.u.test/deep/item/"
    # depth-0 head keeps the shard busy; the depth-2 row spills
    pool.offer(_front([f"http://www.u.test/head/{i}/" for i in range(3)]))
    pool.offer(_front([url], depth=2, parent="zzz", idxs=[9]))
    assert sum(s["spilled"] for s in pool.stats()) >= 1
    # re-offer the spilled URL with a smaller key
    pool.offer(_front([url], depth=2, parent="aaa", idxs=[1]))

    import ray

    seen_urls = []
    for w in range(10):
        refs, n = pool.next_wave_refs(w)
        if n == 0 and pool.pending() == 0:
            break
        for r in pa.concat_tables(ray.get(refs)).to_pylist():
            seen_urls.append((r["url"], r["parent_id"], r["child_idx"]))
    mine = [t for t in seen_urls if t[0] == url]
    assert mine == [(url, "aaa", 1)]


@pytest.mark.usefixtures("ray_session")
def test_spill_snapshot_restore(tmp_path):
    """Snapshot taken while runs sit on disk restores to identical
    emission (the manifest references the run files)."""
    from scraper_ray.state.scheduler import SchedulerPool

    pol = PolitenessConfig(wave_units=4)
    spill_dir = str(tmp_path / "sp")
    pool = SchedulerPool(pol, n_shards=2, spill_dir=spill_dir,
                         spill_threshold=3)
    for depth in (0, 1, 2):
        pool.offer(_front([f"http://www.v.test/d{depth}/i{i}/"
                           for i in range(5)], depth=depth))
    assert sum(s["spilled"] for s in pool.stats()) > 0
    ck = str(tmp_path / "ck")
    pool.snapshot(ck)
    pool2 = SchedulerPool(pol, n_shards=2, spill_dir=spill_dir,
                          spill_threshold=3)
    pool2.restore(ck)
    assert _drain(pool2) == _drain(pool)


def test_spilled_crawl_matches_oracle(ray_session, tmp_path):
    """Full crawl with an aggressively tiny spill threshold: seen set,
    order and spans equal the sequential oracle (exercises load-time
    seen-filtering of rows emitted through other paths — the synthetic
    web plants duplicate/alias links across depths)."""
    web = WebConfig(seed=11, n_entities=8, items_per_page=5, max_pages_cap=8,
                    dup_rate=0.2, alias_rate=0.3)
    pol = default_politeness(web, wave_units=12)
    seeds = gen_seeds(web, 60)
    out = str(tmp_path / "docs")
    stats = crawl(seeds, CrawlConfig(
        web=web, politeness=pol, out_dir=out, n_seen_shards=3,
        n_sched_shards=2, batch_size=64,
        sched_spill_dir=str(tmp_path / "spill"), sched_spill_threshold=8))
    docs = read_docs(out).to_pandas()
    oracle = crawl_oracle(seeds, web, pol)
    assert set(docs["url"]) == oracle.seen
    assert stats.seen_total == len(oracle.seen)
    es = docs.sort_values(order_key_columns()).reset_index(drop=True)
    assert es["url"].tolist() == [d["url"] for d in oracle.docs]
    # spilling really happened
    assert glob.glob(str(tmp_path / "spill" / "run_*.parquet"))
