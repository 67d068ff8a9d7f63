"""Unit tests: politeness scheduler shards (budget, key order, keep-min)."""

import pyarrow as pa
import pytest

from scraper_ray.canonicalize import frontier_table
from scraper_ray.synthweb import PolitenessConfig


def _front(urls, depth=0, parent="", idxs=None):
    return frontier_table(urls, depth=depth, parent_ids=parent, child_idxs=idxs)


@pytest.mark.usefixtures("ray_session")
def test_budget_and_key_order():
    import ray

    from scraper_ray.state.scheduler import SchedulerPool

    pol = PolitenessConfig(wave_units=4, delays={"a.test": 2, "b.test": 1})
    pool = SchedulerPool(pol, n_shards=2)
    urls = [f"http://www.a.test/item/{i}/" for i in range(10)] + [
        f"http://www.b.test/item/{i}/" for i in range(10)
    ]
    pool.offer(_front(urls))
    refs, _n = pool.next_wave_refs(0)
    tbl = pa.concat_tables(ray.get(refs))
    by_dom = {}
    for r in tbl.to_pylist():
        by_dom.setdefault(r["domain_key"], []).append(r)
    # budget: a.test delay 2 -> 2/wave; b.test delay 1 -> 4/wave
    assert len(by_dom["a.test"]) == 2
    assert len(by_dom["b.test"]) == 4
    # key order within domain
    for rows in by_dom.values():
        keys = [(r["depth"], r["parent_id"], r["child_idx"], r["url"]) for r in rows]
        assert keys == sorted(keys)
    assert pool.pending() == 20 - 6


@pytest.mark.usefixtures("ray_session")
def test_keep_min_upgrade_and_min_depth():
    import ray

    from scraper_ray.state.scheduler import SchedulerPool

    pol = PolitenessConfig(wave_units=100)
    pool = SchedulerPool(pol, n_shards=1)
    url = "http://www.c.test/item/1/"
    pool.offer(_front([url], depth=3, parent="zzz", idxs=[5]))
    # re-offer with a smaller key -> upgrade
    pool.offer(_front([url], depth=3, parent="aaa", idxs=[2]))
    # and a deeper decoy that must NOT emit this wave (min-depth rule)
    pool.offer(_front(["http://www.c.test/item/2/"], depth=4, parent="aaa", idxs=[0]))
    refs, _n = pool.next_wave_refs(0)
    tbl = pa.concat_tables(ray.get(refs))
    rows = tbl.to_pylist()
    assert len(rows) == 1
    assert rows[0]["parent_id"] == "aaa" and rows[0]["child_idx"] == 2
    # next wave emits the depth-4 row
    refs2, _n2 = pool.next_wave_refs(1)
    tbl2 = pa.concat_tables(ray.get(refs2))
    assert [r["depth"] for r in tbl2.to_pylist()] == [4]
    assert pool.pending() == 0


@pytest.mark.usefixtures("ray_session")
def test_duplicate_offer_not_recounted():
    from scraper_ray.state.scheduler import SchedulerPool

    pol = PolitenessConfig(wave_units=10)
    pool = SchedulerPool(pol, n_shards=2)
    n1 = pool.offer(_front(["http://www.d.test/x/", "http://www.d.test/y/"]))
    n2 = pool.offer(_front(["http://www.d.test/x/"]))
    assert (n1, n2) == (2, 0)


@pytest.mark.usefixtures("ray_session")
def test_scheduler_snapshot_restore():
    import tempfile

    import ray

    from scraper_ray.state.scheduler import SchedulerPool

    pol = PolitenessConfig(wave_units=2)
    pool = SchedulerPool(pol, n_shards=2)
    pool.offer(_front([f"http://www.e.test/item/{i}/" for i in range(6)]))
    with tempfile.TemporaryDirectory() as tmp:
        pool.snapshot(tmp)
        pool2 = SchedulerPool(pol, n_shards=2)
        pool2.restore(tmp)
        r1, _ = pool.next_wave_refs(0)
        t1 = pa.concat_tables(ray.get(r1))
        r2, _ = pool2.next_wave_refs(0)
        t2 = pa.concat_tables(ray.get(r2))
        assert t1.sort_by("url").equals(t2.sort_by("url"))


@pytest.mark.usefixtures("ray_session")
def test_balanced_emission_aligns_tasks_to_cores():
    import math

    import ray

    from scraper_ray.state.scheduler import _MIN_CHUNK, SchedulerPool

    pol = PolitenessConfig(wave_units=100_000)
    pool = SchedulerPool(pol, n_shards=2)
    urls = [f"http://www.d{i % 7}.test/item/{i}/" for i in range(9000)]
    pool.offer(_front(urls))
    chunk_rows = 512
    refs, n = pool.next_wave_refs(0, chunk_rows=chunk_rows)
    tables = ray.get(refs)
    assert sum(t.num_rows for t in tables) == n == 9000
    cpus = int(ray.cluster_resources()["CPU"])
    # large wave: task count lands on a multiple of the cluster's cores
    # (per-shard rounding can add at most one chunk per shard)
    want = cpus * math.ceil(math.ceil(n / chunk_rows) / cpus)
    assert want <= len(tables) <= want + pool.n_shards
    # chunks are balanced: no chunk more than 2x the mean, all <= cap
    mean = n / len(tables)
    assert max(t.num_rows for t in tables) <= min(2 * mean, chunk_rows)
    # tiny wave: no fan-out below the per-task overhead floor
    pool2 = SchedulerPool(pol, n_shards=2)
    pool2.offer(_front([f"http://www.e.test/item/{i}/" for i in range(40)]))
    refs2, n2 = pool2.next_wave_refs(0, chunk_rows=chunk_rows)
    assert n2 == 40
    assert len(ray.get(refs2)) <= math.ceil(40 / _MIN_CHUNK) + 1
