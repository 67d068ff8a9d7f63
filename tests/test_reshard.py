"""Re-shard-on-restore: a checkpoint taken at N seen/sched shards must
resume at M shards with output identical to an uninterrupted run
(round-3 VERDICT "next round" item 2 — a run checkpointed on a small
cluster resumes on a bigger one without keeping the small shard count).
"""

import glob
import hashlib

import numpy as np
import pytest

from scraper_ray.crawl import CrawlConfig, crawl, read_docs
from scraper_ray.schema import order_key_columns
from scraper_ray.state.scheduler import SchedulerPool
from scraper_ray.state.seen import ShardedSeen
from scraper_ray.synthweb import (PolitenessConfig, WebConfig,
                                  default_politeness, gen_seeds)

CFG = WebConfig(seed=11, n_entities=6, items_per_page=4, max_pages_cap=6,
                dup_rate=0.2, alias_rate=0.2)
POL = default_politeness(CFG, wave_units=10)


@pytest.mark.usefixtures("ray_session")
def test_seen_reshard_roundtrip(tmp_path):
    digs = [hashlib.sha1(str(i).encode()).digest() for i in range(500)]
    a = ShardedSeen(3, 1 << 12)
    a.add_if_new(digs[:400])
    a.snapshot(str(tmp_path))
    b = ShardedSeen(5, 1 << 12)   # more shards than the dump
    b.restore(str(tmp_path))
    c = ShardedSeen(2, 1 << 12)   # fewer shards than the dump
    c.restore(str(tmp_path))
    assert b.total() == c.total() == a.total() == 400
    np.testing.assert_array_equal(b.contains(digs), a.contains(digs))
    np.testing.assert_array_equal(c.contains(digs), a.contains(digs))
    # freshness semantics survive: re-adding old digests is not new,
    # adding unseen ones is
    mask = b.add_if_new(digs)
    assert not mask[:400].any() and mask[400:].all()
    for pool in (a, b, c):
        pool.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_crawl_resume_resharded_identical(tmp_path):
    seeds = gen_seeds(CFG, 40)
    key = order_key_columns()
    full_out = str(tmp_path / "full")
    full_stats = crawl(seeds, CrawlConfig(
        web=CFG, politeness=POL, out_dir=full_out,
        n_seen_shards=2, n_sched_shards=2, batch_size=64))
    full = read_docs(full_out).to_pandas().sort_values(key) \
        .reset_index(drop=True)

    out, ck = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                             checkpoint_dir=ck, n_seen_shards=2,
                             n_sched_shards=2, batch_size=64, max_waves=3))
    # resume at DIFFERENT counts on both pools (up for seen, up for sched)
    stats = crawl(None, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                                    checkpoint_dir=ck, n_seen_shards=5,
                                    n_sched_shards=3, batch_size=64),
                  resume=True)
    resumed = read_docs(out).to_pandas().sort_values(key) \
        .reset_index(drop=True)
    assert resumed["url"].tolist() == full["url"].tolist()
    assert resumed["doc_id"].tolist() == full["doc_id"].tolist()
    assert stats.seen_total == len(full)
    # run counters are merged totals, not double-counted: the resumed
    # run's counters equal the uninterrupted run's
    assert stats.counters == full_stats.counters


@pytest.mark.usefixtures("ray_session")
def test_crawl_resume_resharded_with_spill(tmp_path):
    """Re-shard while spill runs sit on disk: run-file ownership moves to
    each domain's new shard and loads there."""
    web = WebConfig(seed=11, n_entities=8, items_per_page=5,
                    max_pages_cap=8, dup_rate=0.2, alias_rate=0.3)
    pol = default_politeness(web, wave_units=12)
    seeds = gen_seeds(web, 60)
    key = order_key_columns()
    spill = str(tmp_path / "spill")

    full_out = str(tmp_path / "full")
    crawl(seeds, CrawlConfig(web=web, politeness=pol, out_dir=full_out,
                             n_seen_shards=3, n_sched_shards=2,
                             batch_size=64))
    full = read_docs(full_out).to_pandas().sort_values(key) \
        .reset_index(drop=True)

    out, ck = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    crawl(seeds, CrawlConfig(
        web=web, politeness=pol, out_dir=out, checkpoint_dir=ck,
        n_seen_shards=3, n_sched_shards=2, batch_size=64, max_waves=2,
        sched_spill_dir=spill, sched_spill_threshold=8))
    assert glob.glob(spill + "/run_*.parquet"), "fixture must spill"
    crawl(None, CrawlConfig(
        web=web, politeness=pol, out_dir=out, checkpoint_dir=ck,
        n_seen_shards=2, n_sched_shards=4, batch_size=64,
        sched_spill_dir=spill, sched_spill_threshold=8), resume=True)
    resumed = read_docs(out).to_pandas().sort_values(key) \
        .reset_index(drop=True)
    assert resumed["url"].tolist() == full["url"].tolist()


def _front(urls, depth=0):
    from scraper_ray.canonicalize import frontier_table

    return frontier_table(urls, depth=depth, parent_ids="")


@pytest.mark.usefixtures("ray_session")
def test_scheduler_pool_reshard_preserves_pending_and_counters(tmp_path):
    pol = PolitenessConfig(wave_units=100)
    pool = SchedulerPool(pol, n_shards=2)
    pool.offer(_front([f"http://www.a.test/p{i}/" for i in range(20)]),
               {"n_fetched": 7})
    pool.offer(_front([f"http://www.b.test/p{i}/" for i in range(13)]))
    ck = str(tmp_path / "ck")
    pool.snapshot(ck)
    re = SchedulerPool(pol, n_shards=5)
    re.restore(ck)
    assert re.pending() == pool.pending() == 33
    assert re.counters() == pool.counters()
    # emission content is shard-count-independent
    refs_a, n_a = pool.next_wave_refs(0)
    refs_b, n_b = re.next_wave_refs(0)
    assert n_a == n_b
    import pyarrow as pa
    import ray

    rows = lambda refs: sorted(  # noqa: E731
        pa.concat_tables(ray.get(refs)).column("url").to_pylist())
    assert rows(refs_a) == rows(refs_b)
    pool.shutdown()
    re.shutdown()
