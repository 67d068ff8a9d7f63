"""The crawl wave loop — driver-side orchestration (SURVEY.md §7.0).

    seeds ─ canonicalize ─ robots ─ offer ─▶ scheduler shards
                 ┌──────────────────────────────┘
                 ▼ next_wave (politeness budget, min-depth, key order;
                 │            emitted URLs marked in the cuckoo seen set)
           wave Dataset ── map_batches(FetchParse) ── map_batches(DiscoverOffer)
                 │                                        │ children + run
                 ▼                                        ▼ counters to shards
           docs parquet (wave=K dir)             (piggybacked on offer RPC)

One streaming execution per wave (fetch -> discover -> write are fused;
blocks pipeline with backpressure). Frontier iteration is inherently a
per-wave barrier (SURVEY §2.9); driver work per wave is O(shards), never
O(urls). Docs land in one parquet directory per wave — resumable output:
a restart from checkpoint deletes incomplete wave dirs and continues
(the reference's entity-granularity resume, handlers/db.py:191-203,
generalized to wave/partition granularity).

Checkpoints are written atomically per wave: seen-shard dumps +
scheduler-shard dumps + a manifest with counters and lineage (wave ->
output dir), then ``LATEST`` is swapped via rename.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import pyarrow as pa
import ray.data as rd

from .canonicalize import frontier_table
from .stages.fetch import DiscoverOffer, FetchParse
from .state.scheduler import SchedulerPool, robots_filter
from .state.seen import ShardedSeen
from .synthweb import PolitenessConfig, WebConfig


@dataclass
class CrawlConfig:
    web: WebConfig
    politeness: PolitenessConfig
    out_dir: str
    checkpoint_dir: str | None = None
    checkpoint_every: int = 1
    # retain only this many newest checkpoint waves (0 = keep all):
    # each checkpoint carries frontier-state dumps, so an unbounded
    # history costs waves x frontier-state size at 10^10-URL scale.
    # Resume reads the chain ending at LATEST; dirs older than both the
    # keep window and the chain's base are pruned AFTER LATEST advances,
    # so a crash mid-prune leaves extras, never a gap.
    checkpoint_keep: int = 2
    # write a FULL seen-set dump every this many waves and DELTAS (only
    # digests added since the previous snapshot) in between: the seen
    # set only grows, so base + deltas reconstructs it exactly while the
    # per-wave checkpoint write stops scaling with total frontier size.
    # Scheduler dumps stay full every wave (pending state shrinks, and
    # queues mutate non-monotonically). 1 = full every wave (old
    # behavior).
    checkpoint_full_every: int = 5
    # None -> derived from the cluster at crawl() start (one shard per
    # ~4 cores, floor 4): a 256-core cluster gets 64 admission points
    # without the caller remembering to size them. On resume, None keeps
    # the checkpoint's count; an EXPLICIT different count re-shards the
    # restored state (state/{seen,scheduler}.py restore re-routing).
    n_seen_shards: int | None = None
    n_sched_shards: int | None = None
    seen_capacity_per_shard: int = 1 << 18   # cuckoo slots; exact set backs it
    fetch_concurrency: int | None = None   # None -> task pool (pure fetcher);
    # an int -> actor pool of that size (stateful HTTP fetcher shape)
    # The fetch stage itself is pluggable: any FetchParse-shaped class
    # (frontier batch -> FETCH_OUT_SCHEMA rows). None -> the synthetic
    # FetchParse(web). A real deployment wires the live fetcher here:
    #   CrawlConfig(..., fetcher_cls=RequestsFetcher,
    #               fetcher_kwargs={"transport": ..., "renew": ...},
    #               fetch_concurrency=16)
    # (stages/http_fetch.py; per-actor session state demands actor-pool
    # mode, i.e. an int fetch_concurrency)
    fetcher_cls: type | None = None
    fetcher_kwargs: dict = field(default_factory=dict)
    batch_size: int = 1024
    level_sync: str = "domain"             # 'global' when cross-domain links exist
    max_waves: int = 100_000
    # cold-tail frontier spill (state/scheduler.py): 0 = keep the whole
    # pending frontier in actor memory (sandbox default); at 10^10-URL
    # scale set a per-shard threshold sized to worker heap
    sched_spill_dir: str | None = None
    sched_spill_threshold: int = 0
    # doc sink format per wave dir: 'lance' is the north rule's target
    # (distributed fragment writes, sources/io.py); falls back to
    # parquet with the same wave-dir layout when lance is not installed.
    # 'warc' archives each wave as WARC shards + a CDX parquet index
    # (sources/warc.py) — the Common Crawl interchange layout; read back
    # with read_docs(out_dir, format='warc') or any CDX-aware reader
    sink_format: str = "parquet"


@dataclass
class CrawlStats:
    waves: int = 0
    docs: int = 0
    seen_total: int = 0
    counters: dict = field(default_factory=dict)
    wave_sizes: list[int] = field(default_factory=list)
    # set when GRAFT_CRAWL_PHASES=1: per-wave [emit_s, fetch_s, tail_s]
    # (scheduler emission / fetch+discover+write / lineage+checkpoint) —
    # the boundary-cost profile that sizes the wave-overlap optimization
    phase_times: list[list[float]] = field(default_factory=list)
    # GRAFT_CRAWL_PHASES=1: setup_s (state actors), seed_s (admission),
    # final_s (totals + actor shutdown)
    section_times: dict = field(default_factory=dict)


def _seed_frontier(seeds: list[str] | rd.Dataset, ccfg: CrawlConfig,
                   sched: SchedulerPool,
                   seen: ShardedSeen | None = None) -> int:
    """Admit the seed list: canonicalize -> keep-min dedup -> robots ->
    offer. Seed child_idx (and first path hop) is the global seed-list
    position, so aliased duplicate seeds collapse to the first occurrence
    exactly like the oracle. Seeds are NOT pre-marked in the seen set —
    the seen set records emissions only; scheduler keep-min dedups.
    *seen* is passed ONLY on pre-seeded (incremental) runs: then seeds
    already marked as crawled must be dropped at admission (one batched
    probe per seed batch), mirroring DiscoverOffer's child probe —
    otherwise the emission-freshness invariant would trip."""

    def drop_seen(tbl: pa.Table) -> tuple[pa.Table, int]:
        if seen is None or tbl.num_rows == 0:
            return tbl, 0
        already = seen.contains(tbl.column("url_sha1").to_pylist())
        if not already.any():
            return tbl, 0
        return tbl.filter(pa.array(~already)), int(already.sum())

    if isinstance(seeds, list):
        tbl = frontier_table(seeds, depth=0, parent_ids="")
        tbl, n_blocked = robots_filter(tbl, ccfg.politeness)
        tbl, n_skipped = drop_seen(tbl)
        counters = {}
        if n_blocked:
            counters["n_robots_blocked"] = n_blocked
        if n_skipped:
            counters["n_seen_dropped"] = n_skipped
        # seed-stage robots blocks count like any other stage's — the
        # 'blocked URLs are never silently lost' contract covers admission
        return sched.offer(tbl, counters or None)
    assert "seed_idx" in seeds.schema().names, "seed Dataset needs a seed_idx column"

    def canon(batch: pa.Table) -> pa.Table:
        return frontier_table(batch.column("url").to_pylist(), depth=0,
                              parent_ids="",
                              child_idxs=batch.column("seed_idx").to_pylist())

    # two executions with a barrier: fusing canonicalize with the
    # offer RPCs into one task chain serializes badly (measured 27s vs
    # 5s on a 200k-seed list)
    front = seeds.map_batches(canon, batch_format="pyarrow",
                              batch_size=8192).materialize()

    def offer(batch: pa.Table) -> pa.Table:
        batch, n_blocked = robots_filter(batch, ccfg.politeness)
        batch, n_skipped = drop_seen(batch)
        counters = {}
        if n_blocked:
            counters["n_robots_blocked"] = n_blocked
        if n_skipped:
            counters["n_seen_dropped"] = n_skipped
        return pa.table({"n_offered": [sched.offer(batch, counters or None)]})

    stats = front.map_batches(offer, batch_format="pyarrow",
                              batch_size=8192).to_pandas()
    return int(stats["n_offered"].sum())


def _preseed_seen(skip_urls: list[str] | rd.Dataset,
                  seen: ShardedSeen) -> int:
    """Incremental-crawl preseed: mark *skip_urls* (raw or canonical) in
    the seen set so the scheduler never emits them — the engine then
    fetches only URLs OUTSIDE the previous crawl. A Dataset is marked
    inside map_batches (batched add_if_new RPCs from the tasks, the
    DiscoverOffer pattern), so a billion-URL skip list never funnels
    through the driver; a list is chunk-batched driver-side."""
    from .canonicalize import canonicalize_url, sha1_url

    def digests(urls: list[str]) -> list[bytes]:
        return [sha1_url(cu) for u in urls
                if (cu := canonicalize_url(u)) is not None]

    if isinstance(skip_urls, list):
        digs = digests(skip_urls)
        total = 0
        for off in range(0, len(digs), 65536):
            total += int(seen.add_if_new(digs[off:off + 65536]).sum())
        return total

    def mark(batch: pa.Table) -> pa.Table:
        digs = digests(batch.column("url").to_pylist())
        return pa.table({"n": [int(seen.add_if_new(digs).sum())]})

    marked = skip_urls.select_columns(["url"]).map_batches(
        mark, batch_format="pyarrow", batch_size=8192).to_pandas()
    return int(marked["n"].sum())


def _micro_wave_task(tbl: pa.Table, fetch_fn, discover_fn,
                     out_path: str) -> int:
    """One tiny-wave chunk: fetch -> discover/offer -> parquet part, as a
    plain Ray task. A streaming Dataset execution costs ~100 ms of
    setup regardless of size — the right price for a 200k-row wave,
    pure overhead for the long tail of <~2k-row waves every frontier
    exhausts into (the profile showed 11 of 13 bench waves under 150
    rows). Output rows and offer RPCs are identical to the pipeline
    path; only the executor differs."""
    import pyarrow.parquet as pq

    out = discover_fn(fetch_fn(tbl))
    pq.write_table(out, out_path)
    return out.num_rows


_micro_wave_remote = None   # lazily-decorated (keeps import side-effect free)


def _micro_wave(refs: list, fetch_ref, disc_ref, wave_dir: str) -> None:
    """*fetch_ref*/*disc_ref* are object refs put ONCE per crawl —
    re-putting the stage closures (which carry the seen/sched actor
    handles) per wave costs ~100 ms, defeating the fast path."""
    import ray

    global _micro_wave_remote
    if _micro_wave_remote is None:
        _micro_wave_remote = ray.remote(_micro_wave_task)
    os.makedirs(wave_dir, exist_ok=True)
    ray.get([
        _micro_wave_remote.remote(
            r, fetch_ref, disc_ref,
            os.path.join(wave_dir, f"part-{i:05d}.parquet"))
        for i, r in enumerate(refs)])


def _default_shard_count() -> int:
    """Seen/scheduler shard count for a fresh run: one admission point
    per ~4 cluster cores, floor 4. Each shard admits ~450-500k rows/s
    (bench.py --admission-only), so this keeps admission far off the
    critical path while shard RPC fan-out stays O(cores)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 0)) or 32
    return max(4, cpus // 4)


def _checkpoint(ccfg: CrawlConfig, wave: int, seen: ShardedSeen,
                sched: SchedulerPool, stats: CrawlStats,
                seen_base: int | None) -> int:
    """Write wave *wave*'s checkpoint; returns the (possibly new) base
    wave of the seen-set snapshot chain. The seen set dumps FULL when
    the chain is due for re-basing (every ``checkpoint_full_every``
    waves, or no base yet) and a DELTA otherwise; scheduler dumps are
    always full."""
    root = ccfg.checkpoint_dir
    wdir = os.path.join(root, f"wave_{wave:05d}")
    os.makedirs(wdir, exist_ok=True)
    full = (seen_base is None
            or wave - seen_base >= max(1, ccfg.checkpoint_full_every))
    written = seen.snapshot(wdir, mode="full" if full else "delta")
    if written == "full":
        seen_base = wave
    sched.snapshot(wdir)
    manifest = {
        "wave": wave,
        "seen_base_wave": seen_base,
        "n_seen_shards": ccfg.n_seen_shards,
        "n_sched_shards": ccfg.n_sched_shards,
        "docs": stats.docs,
        "wave_sizes": stats.wave_sizes,
        "counters": stats.counters,
        "out_dirs": [f"wave={w:05d}" for w in range(wave + 1)],
    }
    tmp = os.path.join(wdir, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(wdir, "MANIFEST.json"))
    tmp_latest = os.path.join(root, ".LATEST.tmp")
    with open(tmp_latest, "w") as f:
        f.write(str(wave))
    os.replace(tmp_latest, os.path.join(root, "LATEST"))
    if ccfg.checkpoint_keep:
        import re
        import shutil

        waves = sorted(
            int(m.group(1)) for d in os.listdir(root)
            if (m := re.fullmatch(r"wave_(\d{5})", d)))
        # never prune the delta chain's base or anything after it
        cut = min(seen_base,
                  waves[-ccfg.checkpoint_keep] if
                  len(waves) >= ccfg.checkpoint_keep else waves[0])
        for w in waves:
            if w < cut:
                shutil.rmtree(os.path.join(root, f"wave_{w:05d}"),
                              ignore_errors=True)
    return seen_base


def latest_checkpoint(checkpoint_dir: str) -> int | None:
    path = os.path.join(checkpoint_dir, "LATEST")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(f.read().strip())


def crawl(seeds: list[str] | rd.Dataset, ccfg: CrawlConfig,
          resume: bool = False,
          skip_urls: list[str] | rd.Dataset | None = None) -> CrawlStats:
    """Run the crawl to frontier exhaustion; returns run counters.

    ``resume=True`` restores seen + scheduler state from the latest
    checkpoint, deletes any incomplete wave output dirs, and continues —
    the final output is identical to an uninterrupted run
    (tests/test_resume.py).

    ``skip_urls`` runs an INCREMENTAL crawl: the given URLs (typically a
    previous crawl's content-page URL column) are pre-marked in the seen
    set, so they are never fetched again — the run crawls only pages
    outside the previous crawl, discovering them through the pages it
    does fetch. Equivalent to the sequential oracle with ``pre_seen``
    (tests/test_incremental.py pins the conformance).
    """
    import dataclasses

    manifest, wdir, last = None, None, None
    if resume:
        assert ccfg.checkpoint_dir, "resume requires a checkpoint_dir"
        last = latest_checkpoint(ccfg.checkpoint_dir)
        assert last is not None, "no checkpoint to resume from"
        wdir = os.path.join(ccfg.checkpoint_dir, f"wave_{last:05d}")
        with open(os.path.join(wdir, "MANIFEST.json")) as f:
            manifest = json.load(f)
    # resolve shard counts: explicit > checkpoint's > cluster-derived.
    # An explicit count differing from the checkpoint triggers re-shard
    # restore (state re-routed by digest/domain hash under the new count)
    # so a run checkpointed on 8 nodes can resume on 32.
    ccfg = dataclasses.replace(
        ccfg,
        n_seen_shards=ccfg.n_seen_shards or (
            manifest.get("n_seen_shards", 4) if manifest
            else _default_shard_count()),
        n_sched_shards=ccfg.n_sched_shards or (
            manifest.get("n_sched_shards", 4) if manifest
            else _default_shard_count()))
    profile_phases = os.environ.get("GRAFT_CRAWL_PHASES") == "1"
    ts0 = time.perf_counter() if profile_phases else 0.0
    # journal deltas only when checkpoints will consume them — an
    # un-checkpointed crawl must not grow a shadow copy of the seen set
    seen = ShardedSeen(ccfg.n_seen_shards, ccfg.seen_capacity_per_shard,
                       track_deltas=bool(ccfg.checkpoint_dir)
                       and ccfg.checkpoint_full_every > 1)
    sched = SchedulerPool(ccfg.politeness, ccfg.n_sched_shards,
                          level_sync=ccfg.level_sync, seen=seen,
                          spill_dir=ccfg.sched_spill_dir,
                          spill_threshold=ccfg.sched_spill_threshold)
    stats = CrawlStats()
    if profile_phases:
        stats.section_times["setup_s"] = round(time.perf_counter() - ts0, 4)
    start_wave = 0
    seen_base: int | None = None   # base wave of the seen snapshot chain

    if resume:
        seen_base = manifest.get("seen_base_wave", last)
        # delta-chain restore: full dumps at the base wave plus every
        # later checkpoint's delta dumps (checkpoint_every may skip
        # waves — take the dirs that exist). A base == last chain is
        # just the full restore; restore_chain also resets the shards'
        # delta journals (everything ingested is already on disk).
        chain = [os.path.join(ccfg.checkpoint_dir, f"wave_{w:05d}")
                 for w in range(seen_base, last + 1)
                 if os.path.isdir(os.path.join(ccfg.checkpoint_dir,
                                               f"wave_{w:05d}"))]
        seen.restore_chain(chain)
        sched.restore(wdir)
        stats.docs = manifest["docs"]
        stats.wave_sizes = manifest["wave_sizes"]
        # run counters live in the scheduler-shard dumps (piggybacked on
        # offer RPCs), so restoring the shards restores the counters
        stats.counters = sched.counters()
        start_wave = last + 1
        # resumable output: drop partial results from waves after the ckpt
        if os.path.isdir(ccfg.out_dir):
            for name in os.listdir(ccfg.out_dir):
                if name.startswith("wave=") and int(name.split("=")[1]) > last:
                    shutil.rmtree(os.path.join(ccfg.out_dir, name))
    else:
        if skip_urls is not None:
            n_preseeded = _preseed_seen(skip_urls, seen)
            if n_preseeded:
                # ride the counter plumbing so it survives checkpoints
                # and lands in stats.counters like every other metric
                sched.offer(frontier_table([], depth=0, parent_ids=""),
                            {"n_preseeded": n_preseeded})
        ts1 = time.perf_counter() if profile_phases else 0.0
        _seed_frontier(seeds, ccfg, sched,
                       seen=seen if skip_urls is not None else None)
        if profile_phases:
            stats.section_times["seed_s"] = round(
                time.perf_counter() - ts1, 4)

    os.makedirs(ccfg.out_dir, exist_ok=True)
    if ccfg.fetcher_cls is not None:
        fetch_cls, fetch_kwargs = ccfg.fetcher_cls, ccfg.fetcher_kwargs
    else:
        fetch_cls, fetch_kwargs = FetchParse, {"web_cfg": ccfg.web}
    fetch_fn = fetch_cls(**fetch_kwargs)
    discover_fn = DiscoverOffer(ccfg.politeness, seen, sched)
    micro_refs = None   # (fetch_ref, disc_ref), put lazily on first use
    wave = start_wave
    while wave < ccfg.max_waves:
        t0 = time.perf_counter() if profile_phases else 0.0
        refs, n_wave = sched.next_wave_refs(wave, chunk_rows=ccfg.batch_size)
        if n_wave == 0:
            # with scheduler spill enabled, a zero wave can still leave
            # rows in disk runs (pending() counts them); the empty wave
            # above already drained dead runs, so just advance
            if sched.pending() == 0:
                break
            wave += 1
            continue
        from .sources.io import write_dataset

        t1 = time.perf_counter() if profile_phases else 0.0
        wave_dir = os.path.join(ccfg.out_dir, f"wave={wave:05d}")
        if (n_wave <= max(2048, ccfg.batch_size)
                and ccfg.fetch_concurrency is None
                and ccfg.sink_format == "parquet"):
            # tiny-wave fast path: plain tasks, no streaming-executor
            # setup (~100 ms/wave saved across the frontier's long tail)
            if micro_refs is None:
                import ray

                micro_refs = (ray.put(fetch_fn), ray.put(discover_fn))
            _micro_wave(refs, micro_refs[0], micro_refs[1], wave_dir)
        else:
            # skew rebalancing happens at emission: shards pre-split their
            # wave into ≤batch_size chunks (one block per ref), so a heavy
            # domain's rows spread over the pool with no repartition barrier
            # batch_size=None: one emitted chunk == one block == one task
            # batch. The scheduler pool already balanced chunk sizes against
            # the global wave and the core count; letting map_batches
            # re-bundle toward a row target would pair trailing slivers with
            # full chunks into double-length straggler tasks.
            ds = rd.from_arrow_refs(refs)
            if ccfg.fetch_concurrency is None:
                ds = ds.map_batches(fetch_fn, batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)
            else:
                ds = ds.map_batches(
                    fetch_cls,
                    fn_constructor_kwargs=fetch_kwargs,
                    batch_format="pyarrow",
                    batch_size=None,
                    concurrency=ccfg.fetch_concurrency,
                    zero_copy_batch=True,
                )
            ds = ds.map_batches(discover_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
            write_dataset(ds, wave_dir, format=ccfg.sink_format)
        t2 = time.perf_counter() if profile_phases else 0.0
        # per-partition lineage: each wave dir records exactly which
        # scheduler shards produced how many of its rows and the run
        # counters at emission, so any output partition is traceable to
        # its frontier state without the checkpoint (north rule's
        # "per-partition lineage + metrics"). Written atomically after
        # the data so resume's wave-dir cleanup treats them as one unit.
        lineage = {
            "wave": wave,
            "rows": n_wave,
            # a resumed run's first wave still has a parent on disk from
            # the pre-resume run, so key on wave number, not start_wave —
            # the lineage chain must survive checkpoint resumes
            "parent_wave": wave - 1 if wave > 0 else None,
            "shard_rows": {str(i): c for i, c
                           in enumerate(sched.last_emit_counts()) if c},
            "counters_at_emit": sched.counters(),
        }
        tmp = os.path.join(wave_dir, "._LINEAGE.tmp")
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, os.path.join(wave_dir, "_LINEAGE.json"))
        stats.docs += n_wave
        stats.wave_sizes.append(n_wave)
        if ccfg.checkpoint_dir and (wave % ccfg.checkpoint_every == 0):
            # offer RPCs are awaited inside the wave's discover stage, so
            # at this barrier the shard counters are exactly complete
            stats.counters = sched.counters()
            seen_base = _checkpoint(ccfg, wave, seen, sched, stats,
                                    seen_base)
        if profile_phases:
            t3 = time.perf_counter()
            stats.phase_times.append(
                [round(t1 - t0, 4), round(t2 - t1, 4), round(t3 - t2, 4)])
        wave += 1

    ts2 = time.perf_counter() if profile_phases else 0.0
    stats.waves = wave - start_wave
    stats.seen_total = seen.total()
    stats.counters = sched.counters()
    # release the state actors: their heap (seen tables, pending maps)
    # would otherwise linger for the rest of the Ray session and tax
    # whatever pipeline runs next in it
    seen.shutdown()
    sched.shutdown()
    if profile_phases:
        stats.section_times["final_s"] = round(time.perf_counter() - ts2, 4)
    return stats


def read_docs(out_dir: str, format: str = "parquet") -> rd.Dataset:
    """All crawled docs as a Dataset (wave dirs unioned).

    ``format='lance'`` reads each wave's Lance dataset via
    ``ray.data.read_lance`` and unions them (only when the lance
    package is installed; the sink falls back to parquet otherwise).

    ``format='warc'`` parses the wave dirs' WARC shards (one task per
    shard; the _cdx parquet and _LINEAGE files are extension-filtered
    out) into RECORD rows — url, doc_id, payload digest and the
    canonical span-text payload. WARC is the archival view: the
    numeric span offsets live only in the parquet/lance sinks."""
    if format == "warc":
        from .sources.warc import read_warc

        return read_warc(out_dir)
    if format == "lance":
        import lance  # noqa: F401  (gate: raises cleanly when absent)

        waves = sorted(
            os.path.join(out_dir, n) for n in os.listdir(out_dir)
            if n.startswith("wave="))
        parts = [rd.read_lance(w) for w in waves]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out
    return rd.read_parquet(out_dir)
