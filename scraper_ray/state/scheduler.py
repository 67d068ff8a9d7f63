"""Per-domain politeness-aware frontier scheduler — an actor pool.

Replaces the reference's implicit frontier (sequential entity -> ascending
page -> DOM item loops, handlers/scrapers.py:84-150) and its random-sleep
politeness (handlers/diandianzu.py:40, handlers/haozu.py:41) with explicit,
deterministic scheduling:

- the frontier is hash-partitioned by **registered domain** across
  ``SchedulerShard`` actors (north rule); each shard owns a per-domain
  priority queue on the deterministic key ``(depth, path)`` — the
  discovery path, which is the reference's sequential crawl order made
  sortable (see schema.order_key_columns);
- **politeness budget**: per wave, a domain emits at most
  ``wave_units // crawl_delay_units`` URLs (deterministic budget units
  instead of wall-clock sleeps — FIXTURES.md F8);
- **min-depth emission**: a domain only emits rows at its minimum pending
  depth (or at the global minimum with ``level_sync='global'`` when
  cross-domain links exist). Combined with keep-min-key upgrades of
  pending URLs, this makes first-discovery attribution deterministic and
  equal to the sequential oracle's (tests/test_crawl_conformance.py);
- **keep-min upgrade**: re-offering a pending URL with a smaller
  (depth, path) replaces its attribution — duplicates discovered
  concurrently within a level resolve to the oracle's min key regardless
  of arrival order;
- **seen-marking at emission**: each shard marks its emitted URLs in the
  sharded cuckoo seen set *before* returning the wave table, so discover
  stages running concurrently with fetch can never re-admit an
  in-flight URL.

Skew handling: emission is budget-bounded per domain, so one hot domain
cannot dominate a wave; the crawl driver additionally splits each wave's
blocks evenly across fetch tasks (``repartition``), so a heavy domain's
rows spread over the whole pool instead of serializing on one worker.

Scale note (10^10 frontier): each shard spills its **cold tail** —
pending entries deeper than a domain's current emission depth, which
cannot emit for at least one more wave — to Arrow runs on disk once the
in-memory pending count crosses ``spill_threshold``, keeping only the
per-domain heads (current-depth entries) in memory. Runs are loaded
back exactly when the frontier reaches their depth; entries whose URL
was emitted while spilled (a duplicate discovered and crawled through a
different path) are dropped at load time via a batched seen-set
membership probe, and keep-min key resolution applies across the
memory/disk boundary, so emission order and the final seen set are
identical with or without spilling (tests/test_scheduler.py,
test_crawl_conformance.py). Off by default in-sandbox (dict frontier is
fine at 10^5); the 100 TB deployment sets a threshold sized to worker
heap.
"""

from __future__ import annotations

import heapq
import pickle

import pyarrow as pa
import ray

from ..canonicalize import FRONTIER_SCHEMA
from ..synthweb import PolitenessConfig

WAVE_SCHEMA = FRONTIER_SCHEMA.append(pa.field("wave", pa.int32()))

_ROW_FIELDS = list(FRONTIER_SCHEMA.names)


# path component of a canonical URL (everything between the authority
# and the first '?'/'#') — the vectorized mirror of urlsplit(u).path
_URL_PATH_RE = r"^[a-z][a-z0-9+.\-]*://[^/?#]*(?P<path>[^?#]*)"


def robots_filter(tbl: pa.Table, politeness: PolitenessConfig) -> tuple[pa.Table, int]:
    """Drop rows whose path is disallowed for their registered domain.

    The reference has no robots handling — this is a north-rule addition;
    blocked URLs are counted, never silently lost (cf. the reference's
    silent ``return None`` drops, handlers/scrapers.py:50-52).

    Fully vectorized (this sits on the crawl admission hot path): paths
    come from one ``pc.extract_regex`` pass, and each disallow prefix is
    one ``starts_with`` kernel masked to its domain's rows — no per-URL
    Python. Domains without disallow rules (the common case) short-
    circuit without touching the URL column.
    """
    import numpy as np
    import pyarrow.compute as pc

    dis = politeness.disallow
    if tbl.num_rows == 0 or not dis:
        return tbl, 0
    doms = tbl.column("domain_key")
    relevant = set(pc.unique(doms).to_pylist()) & set(dis)
    if not relevant:
        return tbl, 0
    path_col = pc.struct_field(
        pc.extract_regex(tbl.column("url"), _URL_PATH_RE), "path")
    blocked = np.zeros(tbl.num_rows, dtype=bool)
    for domain in relevant:
        pmask = None
        for prefix in dis[domain]:
            sw = pc.starts_with(path_col, pattern=prefix)
            pmask = sw if pmask is None else pc.or_kleene(pmask, sw)
        if pmask is None:
            continue
        both = pc.and_kleene(pc.equal(doms, domain), pmask)
        blocked |= np.asarray(pc.fill_null(both, False))
    n_blocked = int(blocked.sum())
    if n_blocked == 0:
        return tbl, 0
    return tbl.filter(pa.array(~blocked)), n_blocked


@ray.remote(num_cpus=0)
class SchedulerShard:
    """Owns the per-domain queues for domains hashing to this shard."""

    def __init__(self, politeness: PolitenessConfig, seen=None,
                 spill_dir: str | None = None, spill_threshold: int = 0,
                 shard_idx: int = 0):
        self.politeness = politeness
        self.seen = seen   # ShardedSeen client (marks emissions) or None
        # domain -> {url: (depth, path, parent_id, child_idx, sha1, host)}
        self.entries: dict[str, dict[str, tuple]] = {}
        # domain -> heap of (depth, path, url); stale entries dropped lazily
        self.heaps: dict[str, list] = {}
        # cold-tail spill state: domain -> depth -> [run file paths]
        self.spill_dir = spill_dir
        self.spill_threshold = spill_threshold
        self.shard_idx = shard_idx
        self.runs: dict[str, dict[int, list[str]]] = {}
        self.spill_seq = 0
        self.n_spilled = 0
        self.n_loaded = 0
        self.n_offered = 0
        self.n_upgraded = 0
        self.last_emit = 0
        # run counters piggybacked on offer() calls — the discover stage
        # attaches its batch counters to the offer RPC it must await
        # anyway, so metrics cost zero extra round-trips on the hot path
        # and are exactly consistent at every wave barrier
        self.run_counters: dict[str, int] = {}

    def offer(self, tbl: pa.Table, counters: dict | None = None) -> int:
        """Insert or keep-min-upgrade frontier rows. Returns rows accepted."""
        if counters:
            for k, v in counters.items():
                self.run_counters[k] = self.run_counters.get(k, 0) + int(v)
        cols = {n: tbl.column(n).to_pylist() for n in _ROW_FIELDS}
        n_new = 0
        for i in range(tbl.num_rows):
            domain = cols["domain_key"][i]
            url = cols["url"][i]
            key = (cols["depth"][i], cols["path"][i])
            ent = self.entries.setdefault(domain, {})
            cur = ent.get(url)
            if cur is not None:
                if key < cur[:2]:
                    ent[url] = (*key, cols["parent_id"][i], cols["child_idx"][i],
                                cur[4], cur[5])
                    heapq.heappush(self.heaps[domain], (*key, url))
                    self.n_upgraded += 1
                continue
            ent[url] = (*key, cols["parent_id"][i], cols["child_idx"][i],
                        cols["url_sha1"][i], cols["host"][i])
            heapq.heappush(self.heaps.setdefault(domain, []), (*key, url))
            n_new += 1
        self.n_offered += n_new
        if n_new:
            self.run_counters["n_offered"] = (
                self.run_counters.get("n_offered", 0) + n_new)
        self._maybe_spill()
        return n_new

    # -- cold-tail disk spill ---------------------------------------------

    def _spill_enabled(self) -> bool:
        return self.spill_dir is not None and self.spill_threshold > 0

    def _maybe_spill(self) -> None:
        """Move entries deeper than each domain's current emission depth
        to sorted Arrow runs on disk when the in-memory frontier exceeds
        the threshold. Spilled rows cannot emit for >= 1 more wave (the
        min-depth rule), so emission never stalls on a load."""
        if not self._spill_enabled() or self.pending() <= self.spill_threshold:
            return
        import os

        import pyarrow.parquet as pq

        os.makedirs(self.spill_dir, exist_ok=True)
        for domain, ent in self.entries.items():
            top = self._valid_top(domain)
            if top is None:
                continue
            dmin = top[0]
            cold = [(u, v) for u, v in ent.items() if v[0] > dmin]
            if not cold:
                continue
            by_depth: dict[int, list] = {}
            for u, v in cold:
                by_depth.setdefault(v[0], []).append((u, v))
                del ent[u]
            for depth, rows in by_depth.items():
                tbl = pa.table({
                    "url": pa.array([u for u, _ in rows], pa.string()),
                    "url_sha1": pa.array([v[4] for _, v in rows],
                                         FRONTIER_SCHEMA.field("url_sha1").type),
                    "host": pa.array([v[5] for _, v in rows], pa.string()),
                    "domain_key": pa.array([domain] * len(rows), pa.string()),
                    "depth": pa.array([depth] * len(rows),
                                      FRONTIER_SCHEMA.field("depth").type),
                    "parent_id": pa.array([v[2] for _, v in rows], pa.string()),
                    "child_idx": pa.array([v[3] for _, v in rows],
                                          FRONTIER_SCHEMA.field("child_idx").type),
                    "path": pa.array([v[1] for _, v in rows],
                                     FRONTIER_SCHEMA.field("path").type),
                })
                path = os.path.join(
                    self.spill_dir,
                    f"run_s{self.shard_idx:02d}_{self.spill_seq:06d}_d{depth}.parquet")
                self.spill_seq += 1
                pq.write_table(tbl, path)
                self.runs.setdefault(domain, {}).setdefault(depth, []).append(path)
                self.n_spilled += len(rows)
            # rebuild the heap from the surviving head entries (also
            # reclaims tuples left stale by upgrades)
            self.heaps[domain] = [(v[0], v[1], u) for u, v in ent.items()]
            heapq.heapify(self.heaps[domain])

    def _load_runs(self, domain: str, emit_depth: int) -> None:
        """Merge spilled runs at (or defensively below) *emit_depth* back
        into memory. Rows whose URL was already emitted while the run sat
        on disk (re-discovered through another path) are dropped via one
        batched seen probe; rows also pending in memory resolve keep-min."""
        dr = self.runs.get(domain)
        if not dr:
            return
        paths = [p for d in list(dr) if d <= emit_depth for p in dr.pop(d)]
        if not paths:
            return
        import pyarrow.parquet as pq

        if not dr:
            del self.runs[domain]
        tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        self.n_loaded += tbl.num_rows
        emitted = (self.seen.contains(tbl.column("url_sha1").to_pylist())
                   if self.seen is not None else None)
        cols = {n: tbl.column(n).to_pylist() for n in _ROW_FIELDS}
        ent = self.entries.setdefault(domain, {})
        heap = self.heaps.setdefault(domain, [])
        for i in range(tbl.num_rows):
            if emitted is not None and emitted[i]:
                continue
            url = cols["url"][i]
            key = (cols["depth"][i], cols["path"][i])
            cur = ent.get(url)
            if cur is not None and cur[:2] <= key:
                continue   # memory already holds an equal-or-better key
            ent[url] = (*key, cols["parent_id"][i], cols["child_idx"][i],
                        cols["url_sha1"][i], cols["host"][i])
            heapq.heappush(heap, (*key, url))

    def _domain_min_depth(self, domain: str) -> int | None:
        """Min pending depth for *domain* across memory AND disk runs."""
        top = self._valid_top(domain)
        d = top[0] if top is not None else None
        dr = self.runs.get(domain)
        if dr:
            d_run = min(dr)
            d = d_run if d is None else min(d, d_run)
        return d

    def _valid_top(self, domain: str) -> tuple | None:
        """Smallest live heap entry for *domain* (drops stale ones)."""
        heap = self.heaps.get(domain)
        ent = self.entries.get(domain, {})
        while heap:
            d, path, url = heap[0]
            cur = ent.get(url)
            if cur is not None and cur[:2] == (d, path):
                return heap[0]
            heapq.heappop(heap)   # stale (upgraded or emitted)
        return None

    def min_depth(self) -> int | None:
        depths = [d for dom in set(self.heaps) | set(self.runs)
                  if (d := self._domain_min_depth(dom)) is not None]
        return min(depths) if depths else None

    def next_wave(self, wave: int, min_depth: int | None = None) -> pa.Table:
        """Emit this wave's rows: per domain, up to ``budget_per_wave``
        rows in key order, restricted to the domain's min pending depth
        (or to *min_depth* under global level-sync). Emitted URLs are
        marked in the seen set before the table is returned."""
        out: dict[str, list] = {n: [] for n in _ROW_FIELDS}
        for domain in sorted(set(self.heaps) | set(self.runs)):
            # loop: a spilled run whose rows were ALL emitted through
            # other discovery paths loads to nothing — fall through to
            # the next pending depth instead of emitting a hole (under
            # global level-sync only this wave's depth may emit; deeper
            # runs wait for the next wave's barrier)
            while True:
                dom_min = self._domain_min_depth(domain)
                if dom_min is None:
                    break
                emit_depth = dom_min if min_depth is None else min_depth
                self._load_runs(domain, emit_depth)
                if self._valid_top(domain) is not None or min_depth is not None:
                    break
            if self._valid_top(domain) is None:
                continue
            budget = self.politeness.budget_per_wave(domain)
            ent = self.entries[domain]
            heap = self.heaps[domain]
            emitted = 0
            while emitted < budget:
                top = self._valid_top(domain)
                if top is None or top[0] != emit_depth:
                    break
                d, path, url = heapq.heappop(heap)
                row = ent.pop(url)
                out["url"].append(url)
                out["url_sha1"].append(row[4])
                out["host"].append(row[5])
                out["domain_key"].append(domain)
                out["depth"].append(d)
                out["parent_id"].append(row[2])
                out["child_idx"].append(row[3])
                out["path"].append(path)
                emitted += 1
        self.last_emit = len(out["url"])
        if self.seen is not None and out["url_sha1"]:
            fresh = self.seen.add_if_new(out["url_sha1"])
            assert fresh.all(), "emitted an already-seen URL"
        tbl = pa.table(
            {n: pa.array(out[n], type=FRONTIER_SCHEMA.field(n).type)
             for n in _ROW_FIELDS}
        )
        return tbl.append_column("wave", pa.array([wave] * tbl.num_rows, pa.int32()))

    def next_wave_chunks(self, wave: int, min_depth: int | None = None,
                         chunk_rows: int = 2048):
        """``next_wave`` streamed as ~chunk_rows zero-copy slices (one
        object ref each). Shards pre-split their wave output so the
        driver can build a balanced Dataset directly from the refs —
        no per-wave ``repartition`` all-to-all; a heavy domain's rows
        land in many small blocks instead of one fat one."""
        tbl = self.next_wave(wave, min_depth)
        for off in range(0, tbl.num_rows, chunk_rows):
            yield tbl.slice(off, chunk_rows)

    def last_emit_count(self) -> int:
        return self.last_emit

    def pending(self) -> int:
        """In-memory pending count (spilled rows tracked separately)."""
        return sum(len(e) for e in self.entries.values())

    def pending_total(self) -> int:
        """Pending incl. rows sitting in disk runs (upper bound: a
        spilled row re-offered and re-emitted stays in its run file
        until load-time seen-filtering drops it)."""
        return self.pending() + self.n_spilled - self.n_loaded

    def stats(self) -> dict:
        return {
            "pending": self.pending(),
            "offered": self.n_offered,
            "upgraded": self.n_upgraded,
            "domains": len(self.entries),
            "spilled": self.n_spilled,
            "spill_files": sum(len(ps) for dr in self.runs.values()
                               for ps in dr.values()),
        }

    def counters(self) -> dict[str, int]:
        return dict(self.run_counters)

    def dump(self) -> bytes:
        # run files are append-only during a run and the manifest names
        # them explicitly, so a dump taken between spills is consistent:
        # a file spilled after this dump is simply unreferenced (harmless
        # orphan) when this snapshot is restored
        return pickle.dumps(
            {"entries": self.entries, "offered": self.n_offered,
             "upgraded": self.n_upgraded, "counters": self.run_counters,
             "runs": self.runs, "spill_seq": self.spill_seq,
             "n_spilled": self.n_spilled, "n_loaded": self.n_loaded},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.entries = d["entries"]
        self.n_offered = d["offered"]
        self.n_upgraded = d["upgraded"]
        self.run_counters = d.get("counters", {})
        self.runs = d.get("runs", {})
        self.spill_seq = d.get("spill_seq", 0)
        self.n_spilled = d.get("n_spilled", 0)
        self.n_loaded = d.get("n_loaded", 0)
        self.heaps = {
            dom: [(v[0], v[1], url) for url, v in ent.items()]
            for dom, ent in self.entries.items()
        }
        for h in self.heaps.values():
            heapq.heapify(h)


def shard_of_domain(domain: str, n_shards: int) -> int:
    import hashlib

    return int.from_bytes(hashlib.sha1(domain.encode()).digest()[:4], "big") % n_shards


class SchedulerPool:
    """Serializable client over the scheduler shards."""

    def __init__(self, politeness: PolitenessConfig, n_shards: int = 4,
                 level_sync: str = "domain", seen=None, actors: list | None = None,
                 spill_dir: str | None = None, spill_threshold: int = 0):
        assert level_sync in ("domain", "global")
        self.n_shards = n_shards
        self.level_sync = level_sync
        self.actors = actors or [
            SchedulerShard.remote(politeness, seen, spill_dir,
                                  spill_threshold, i)
            for i in range(n_shards)
        ]

    def offer(self, tbl: pa.Table, counters: dict | None = None) -> int:
        """Hash-route rows to their domain's shard; one RPC per shard.
        Batch *counters* ride along on one of the RPCs (they are summed
        across shards at read time, so the carrier shard is arbitrary)."""
        counters = counters or None
        if tbl.num_rows == 0:
            if counters:
                ray.get(self.actors[0].offer.remote(tbl, counters))
            return 0
        domains = tbl.column("domain_key").to_pylist()
        idx_by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(domains):
            idx_by_shard.setdefault(shard_of_domain(d, self.n_shards), []).append(i)
        refs = []
        for s, ix in idx_by_shard.items():
            refs.append(self.actors[s].offer.remote(
                tbl.take(pa.array(ix)), counters))
            counters = None   # attach to the first RPC only
        return int(sum(ray.get(refs)))

    def counters(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for d in ray.get([a.counters.remote() for a in self.actors]):
            for k, v in d.items():
                out[k] = out.get(k, 0) + v
        return out

    def next_wave_refs(self, wave: int,
                       chunk_rows: int = 2048) -> tuple[list, int]:
        """Emit the wave on every shard. Returns (object refs of Arrow
        tables — consumed zero-copy via ``ray.data.from_arrow_refs`` —
        and the total emitted row count). Each ref holds ≤ *chunk_rows*
        rows: shards stream their wave pre-split, so the Dataset built
        from the refs is already balanced (no repartition barrier) and
        empty shards contribute no empty blocks."""
        min_depth = None
        if self.level_sync == "global":
            depths = [d for d in ray.get([a.min_depth.remote() for a in self.actors])
                      if d is not None]
            if not depths:
                return [], 0
            min_depth = min(depths)
        gens = [a.next_wave_chunks.remote(wave, min_depth, chunk_rows)
                for a in self.actors]
        refs = [ref for g in gens for ref in g]
        counts = ray.get([a.last_emit_count.remote() for a in self.actors])
        # per-shard contributions of the wave just emitted — the lineage
        # record for the wave's output partition (read via last_emit_counts)
        self._last_emit_counts = [int(c) for c in counts]
        return refs, int(sum(counts))

    def last_emit_counts(self) -> list[int]:
        """Rows each scheduler shard contributed to the latest wave."""
        return list(getattr(self, "_last_emit_counts", []))

    def pending(self) -> int:
        """Pending rows incl. spilled disk runs (drives the wave loop's
        termination check — spilled rows must keep the loop alive)."""
        return int(sum(ray.get([a.pending_total.remote() for a in self.actors])))

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    # -- checkpoint -------------------------------------------------------
    def snapshot(self, directory: str) -> None:
        import os

        os.makedirs(directory, exist_ok=True)
        blobs = ray.get([a.dump.remote() for a in self.actors])
        for i, blob in enumerate(blobs):
            tmp = os.path.join(directory, f".sched_shard_{i:04d}.tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(directory, f"sched_shard_{i:04d}.bin"))

    def restore(self, directory: str) -> None:
        import os

        refs = []
        for i, a in enumerate(self.actors):
            with open(os.path.join(directory, f"sched_shard_{i:04d}.bin"), "rb") as f:
                refs.append(a.restore.remote(f.read()))
        ray.get(refs)

    def shutdown(self) -> None:
        """Terminate the shard actors (end-of-run cleanup)."""
        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []
