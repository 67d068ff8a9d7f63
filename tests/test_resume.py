"""Checkpoint/resume: a killed run restarted from checkpoint must yield
the identical final output + seen set (SURVEY.md §5.2 item 3)."""

import pytest

from scraper_ray.crawl import CrawlConfig, crawl, latest_checkpoint, read_docs
from scraper_ray.schema import order_key_columns
from scraper_ray.synthweb import WebConfig, default_politeness, gen_seeds

CFG = WebConfig(seed=5, n_entities=6, items_per_page=4, max_pages_cap=6,
                dup_rate=0.2, alias_rate=0.2)
POL = default_politeness(CFG, wave_units=10)


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume_identical(tmp_path):
    seeds = gen_seeds(CFG, 40)
    key = order_key_columns()

    # uninterrupted reference run
    full_out = str(tmp_path / "full")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=full_out,
                             batch_size=64))
    full = read_docs(full_out).to_pandas().sort_values(key).reset_index(drop=True)

    # killed mid-crawl (max_waves caps the run = crash after wave 2)
    out = str(tmp_path / "docs")
    ck = str(tmp_path / "ckpt")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                             checkpoint_dir=ck, batch_size=64, max_waves=3))
    assert latest_checkpoint(ck) == 2
    n_partial = len(read_docs(out).to_pandas())
    assert 0 < n_partial < len(full)

    # resume and finish
    stats = crawl(None, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                                    checkpoint_dir=ck, batch_size=64),
                  resume=True)
    resumed = read_docs(out).to_pandas().sort_values(key).reset_index(drop=True)
    assert resumed["url"].tolist() == full["url"].tolist()
    assert resumed["doc_id"].tolist() == full["doc_id"].tolist()
    assert stats.seen_total == len(full)


@pytest.mark.usefixtures("ray_session")
def test_resume_cleans_partial_wave_dirs(tmp_path):
    import os

    seeds = gen_seeds(CFG, 30)
    out, ck = str(tmp_path / "d"), str(tmp_path / "c")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                             checkpoint_dir=ck, batch_size=64, max_waves=2))
    junk = os.path.join(out, "wave=00050")
    os.makedirs(junk)
    open(os.path.join(junk, "part.parquet"), "w").write("")
    crawl(None, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                            checkpoint_dir=ck, batch_size=64), resume=True)
    assert not os.path.isdir(junk)


@pytest.mark.usefixtures("ray_session")
def test_lance_sink_config_falls_back(tmp_path):
    """sink_format='lance' routes each wave through write_dataset: with
    no lance package installed it must warn and fall back to parquet
    with the identical wave-dir layout and docs."""
    seeds = gen_seeds(CFG, 20)
    key = order_key_columns()
    a, b = str(tmp_path / "pq"), str(tmp_path / "ln")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=a,
                             batch_size=64))
    with pytest.warns(UserWarning, match="lance is not installed"):
        crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=b,
                                 batch_size=64, sink_format="lance"))
    pa_docs = read_docs(a).to_pandas().sort_values(key).reset_index(drop=True)
    ln_docs = read_docs(b).to_pandas().sort_values(key).reset_index(drop=True)
    assert pa_docs["url"].tolist() == ln_docs["url"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_wave_lineage_records(tmp_path):
    """Every wave dir carries a _LINEAGE.json whose shard contributions
    sum to the wave's row count (per-partition lineage)."""
    import json
    import os

    seeds = gen_seeds(CFG, 40)
    out = str(tmp_path / "docs")
    stats = crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                                     batch_size=64))
    wave_dirs = sorted(d for d in os.listdir(out) if d.startswith("wave="))
    assert len(wave_dirs) == len(stats.wave_sizes)
    for d, n in zip(wave_dirs, stats.wave_sizes):
        with open(os.path.join(out, d, "_LINEAGE.json")) as f:
            lin = json.load(f)
        assert lin["rows"] == n
        assert sum(lin["shard_rows"].values()) == n
        assert lin["wave"] == int(d.split("=")[1])
    # lineage files must not leak into the doc read
    assert len(read_docs(out).to_pandas()) == stats.docs


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("kill_waves", [(1,), (4,), (1, 3)])
def test_kill_at_any_wave_and_double_kill(tmp_path, kill_waves):
    """Resume equality must hold for a kill at ANY wave boundary — and
    for a resume that is itself killed again (checkpoint-of-checkpoint):
    the final output equals the uninterrupted run byte-for-byte."""
    seeds = gen_seeds(CFG, 40)
    key = order_key_columns()
    full_out = str(tmp_path / "full")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=full_out,
                             batch_size=64))
    full = (read_docs(full_out).to_pandas()
            .sort_values(key).reset_index(drop=True))

    out, ck = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    first = True
    for kw in kill_waves:
        crawl(seeds if first else None,
              CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                          checkpoint_dir=ck, batch_size=64, max_waves=kw),
              resume=not first)
        first = False
        assert len(read_docs(out).to_pandas()) < len(full)
    crawl(None, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                            checkpoint_dir=ck, batch_size=64), resume=True)
    resumed = (read_docs(out).to_pandas()
               .sort_values(key).reset_index(drop=True))
    assert resumed["url"].tolist() == full["url"].tolist()
    assert resumed["doc_id"].tolist() == full["doc_id"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_gc_keeps_newest_and_resumes(tmp_path):
    """Checkpoint GC: only ``checkpoint_keep`` newest wave dirs survive
    (each carries full frontier-state dumps — unbounded history is a
    storage leak at scale), and resume from the pruned directory still
    reproduces the uninterrupted run."""
    import os
    import re

    seeds = gen_seeds(CFG, 40)
    key = order_key_columns()
    full_out = str(tmp_path / "full")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=full_out,
                             batch_size=64))
    full = (read_docs(full_out).to_pandas()
            .sort_values(key).reset_index(drop=True))

    out, ck = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                             checkpoint_dir=ck, batch_size=64, max_waves=4,
                             checkpoint_full_every=1))
    dirs = [d for d in os.listdir(ck) if re.fullmatch(r"wave_\d{5}", d)]
    assert len(dirs) == 2                      # default checkpoint_keep
    assert f"wave_{latest_checkpoint(ck):05d}" in dirs
    crawl(None, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                            checkpoint_dir=ck, batch_size=64), resume=True)
    resumed = (read_docs(out).to_pandas()
               .sort_values(key).reset_index(drop=True))
    assert resumed["url"].tolist() == full["url"].tolist()

    # keep-all escape hatch: checkpoint_keep=0 retains every wave
    out2, ck2 = str(tmp_path / "docs2"), str(tmp_path / "ckpt2")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=out2,
                             checkpoint_dir=ck2, batch_size=64, max_waves=4,
                             checkpoint_keep=0))
    dirs2 = [d for d in os.listdir(ck2) if re.fullmatch(r"wave_\d{5}", d)]
    assert len(dirs2) == 4


@pytest.mark.usefixtures("ray_session")
def test_delta_chain_resume_identical(tmp_path):
    """Seen-set delta snapshots: with a full dump only at the base wave
    and deltas after, (a) the delta files actually replace the full
    dumps on non-base waves, (b) GC never prunes the chain's base, and
    (c) a resume through the chain — including onto a DIFFERENT shard
    count (delta routing is digest-pure) — reproduces the uninterrupted
    run."""
    import glob
    import os

    seeds = gen_seeds(CFG, 40)
    key = order_key_columns()
    full_out = str(tmp_path / "full")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=full_out,
                             batch_size=64))
    full = (read_docs(full_out).to_pandas()
            .sort_values(key).reset_index(drop=True))

    out, ck = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    crawl(seeds, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                             checkpoint_dir=ck, batch_size=64, max_waves=4,
                             n_seen_shards=3, n_sched_shards=2,
                             checkpoint_full_every=10))
    # base wave 0 holds full dumps and survives GC; later waves hold
    # deltas only
    assert glob.glob(os.path.join(ck, "wave_00000", "seen_shard_*.bin"))
    last = latest_checkpoint(ck)
    ldir = os.path.join(ck, f"wave_{last:05d}")
    assert glob.glob(os.path.join(ldir, "seen_delta_*.bin"))
    assert not glob.glob(os.path.join(ldir, "seen_shard_*.bin"))

    # resume on MORE seen shards than the checkpoint (re-shard + chain)
    crawl(None, CrawlConfig(web=CFG, politeness=POL, out_dir=out,
                            checkpoint_dir=ck, batch_size=64,
                            n_seen_shards=5, n_sched_shards=2),
          resume=True)
    resumed = (read_docs(out).to_pandas()
               .sort_values(key).reset_index(drop=True))
    assert resumed["url"].tolist() == full["url"].tolist()
    assert resumed["doc_id"].tolist() == full["doc_id"].tolist()
