"""Sharded URL-seen set as a Ray actor pool (north-rule stage 2).

``SeenShard`` actors each own one ``SeenShardState`` (cuckoo filter +
exact set); ``ShardedSeen`` is a lightweight, serializable client that
fans a batch of SHA-1 digests out to the owning shards and recombines the
per-digest freshness mask. The client works both on the driver and inside
``map_batches`` tasks (actor handles are serializable), so the seen-filter
stage stays off the driver's hot path: each fetch/discover task talks to
the shards directly with one batched RPC per shard (SURVEY.md §7.3
"batched RPC fan-out by shard").

Shard routing uses digest bytes 12..16 — independent of the bytes the
cuckoo filter consumes (0..2 fingerprint, 4..12 bucket index), so shard
skew and filter behavior stay uncorrelated.
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import SeenShardState


@ray.remote(num_cpus=0)
class SeenShard:
    """One seen-set shard. ``num_cpus=0``: membership work is tiny per
    batch and must never starve fetch tasks of CPU slots."""

    def __init__(self, capacity: int = 1 << 16, track_deltas: bool = False):
        self.track_deltas = track_deltas
        self.state = SeenShardState(capacity, track_deltas=track_deltas)

    def add_if_new(self, digests: list[bytes]) -> np.ndarray:
        return np.asarray(self.state.add_if_new(digests), dtype=bool)

    def contains(self, digests: list[bytes]) -> np.ndarray:
        return np.asarray(self.state.contains_batch(digests), dtype=bool)

    def size(self) -> int:
        return len(self.state)

    def dump(self) -> bytes:
        return self.state.dump()

    def dump_delta(self) -> bytes:
        return self.state.dump_delta()

    def reset_delta(self) -> None:
        self.state.reset_delta()

    def restore(self, blob: bytes) -> None:
        self.state = SeenShardState.load(blob,
                                         track_deltas=self.track_deltas)

    def ingest(self, digests: list[bytes]) -> int:
        """Bulk-load digests (re-shard restore path). Same insert path as
        ``add_if_new`` so the rebuilt filter is deterministic for a given
        arrival order; returns the count actually new to this shard."""
        return int(np.asarray(self.state.add_if_new(digests)).sum())


def shard_of(digest: bytes, n_shards: int) -> int:
    return int.from_bytes(digest[12:16], "big") % n_shards


def shards_of_np(digests: np.ndarray, n_shards: int) -> np.ndarray:
    """Vectorized ``shard_of`` over an S20 digest array: bytes 12..16
    big-endian -> uint32 -> mod n_shards. One numpy pass, no per-digest
    Python."""
    if len(digests) == 0:
        return np.zeros(0, dtype=np.int64)
    u = digests.view(np.uint8).reshape(len(digests), 20)
    key = (u[:, 12].astype(np.uint32) << 24
           | u[:, 13].astype(np.uint32) << 16
           | u[:, 14].astype(np.uint32) << 8
           | u[:, 15].astype(np.uint32))
    return (key % np.uint32(n_shards)).astype(np.int64)


class ShardedSeen:
    """Client over the shard actor pool. Serializable; safe inside tasks."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 16,
                 actors: list | None = None, track_deltas: bool = False):
        self.n_shards = n_shards
        self.actors = actors or [
            SeenShard.remote(capacity_per_shard, track_deltas=track_deltas)
            for _ in range(n_shards)
        ]

    def _fanout(self, method: str, digests: list[bytes]) -> np.ndarray:
        """Group digests by owning shard, one batched RPC per shard,
        recombine the per-digest boolean mask. Routing is one vectorized
        numpy pass (``shards_of_np``) — this runs inside every fetch /
        discover task, so per-digest Python here taxes the whole crawl."""
        n = len(digests)
        if n == 0:
            return np.zeros(0, dtype=bool)
        arr = np.asarray(digests, dtype="S20")
        sh = shards_of_np(arr, self.n_shards)
        mask = np.zeros(n, dtype=bool)
        idxs, refs = [], []
        for s in np.unique(sh):
            ix = np.flatnonzero(sh == s)
            idxs.append(ix)
            # index the ORIGINAL list: numpy S20 -> tolist() strips
            # trailing \x00 bytes, which would corrupt 1-in-256 digests
            refs.append(getattr(self.actors[int(s)], method).remote(
                [digests[i] for i in ix]))
        for ix, res in zip(idxs, ray.get(refs)):
            mask[ix] = res
        return mask

    def add_if_new(self, digests: list[bytes]) -> np.ndarray:
        """Freshness mask for *digests*; inserts fresh ones."""
        return self._fanout("add_if_new", digests)

    def contains(self, digests: list[bytes]) -> np.ndarray:
        """Membership mask (read-only)."""
        return self._fanout("contains", digests)

    def total(self) -> int:
        return int(sum(ray.get([a.size.remote() for a in self.actors])))

    # -- checkpoint -------------------------------------------------------
    def snapshot(self, directory: str, mode: str = "full") -> str:
        """Write shard dumps; returns the mode actually written.
        ``mode='full'`` persists whole shard states
        (``seen_shard_*.bin``); ``mode='delta'`` persists only digests
        added since the previous snapshot of either kind
        (``seen_delta_*.bin``) — the seen set only grows, so a chain of
        one full dump plus every later delta reconstructs it exactly,
        and per-wave checkpoint writes stop scaling with total frontier
        size. A delta request ESCALATES to full when any shard's journal
        overflowed its bound (or tracking is off) — the full dump
        supersedes every drained journal, so nothing is lost."""
        os.makedirs(directory, exist_ok=True)
        blobs, stem = None, "seen_shard"
        if mode == "delta":
            deltas = ray.get([a.dump_delta.remote() for a in self.actors])
            if all(b is not None for b in deltas):
                blobs, stem = deltas, "seen_delta"
        if blobs is None:
            blobs, mode = ray.get([a.dump.remote()
                                   for a in self.actors]), "full"
        for i, blob in enumerate(blobs):
            tmp = os.path.join(directory, f".{stem}_{i:04d}.tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(directory, f"{stem}_{i:04d}.bin"))
        return mode

    def restore(self, directory: str) -> None:
        """Restore from shard dumps. When the dump count equals this
        pool's shard count the restore is positional (bit-identical
        filters). When it differs — a checkpoint taken on an N-shard
        cluster resumed at M shards — digests are RE-ROUTED: each old
        dump's exact set is re-partitioned by ``shards_of_np`` under the
        new count and bulk-ingested. The rebuilt cuckoo filters differ in
        layout (insertion order changed) but membership is exact either
        way (the exact set backs every positive), so crawl output is
        unchanged (tests/test_reshard.py)."""
        import glob

        files = sorted(glob.glob(os.path.join(directory, "seen_shard_*.bin")))
        assert files, f"no seen-shard dumps under {directory}"
        if len(files) == self.n_shards:
            refs = []
            for path, a in zip(files, self.actors):
                with open(path, "rb") as f:
                    refs.append(a.restore.remote(f.read()))
            ray.get(refs)
            return
        import pickle

        # one old dump in driver memory at a time; at 10^10-digest scale
        # the dumps become parquet digest runs and this loop a Ray Data
        # map_batches over them (same routing kernel), but the re-shard
        # event itself is rare enough that driver chunking suffices here
        for path in files:
            with open(path, "rb") as f:
                exact = pickle.loads(f.read())["exact"]
            if not exact:
                continue
            arr = np.asarray(exact, dtype="S20")
            sh = shards_of_np(arr, self.n_shards)
            refs = []
            for s in np.unique(sh):
                ix = np.flatnonzero(sh == s)
                digs = [exact[i] for i in ix]
                refs.extend(
                    self.actors[int(s)].ingest.remote(digs[off:off + 65536])
                    for off in range(0, len(digs), 65536))
            ray.get(refs)

    def restore_chain(self, dirs: list[str]) -> None:
        """Restore from a checkpoint chain: ``dirs[0]`` holds the full
        shard dumps (base), every later dir holds delta dumps. Deltas
        are ROUTED, not positional — a digest's owning shard is a pure
        function of (digest, n_shards) — so the same apply path serves
        matching and re-sharded restores. The delta journals are reset
        afterwards: everything just ingested is already durable in the
        on-disk chain."""
        import glob
        import pickle

        self.restore(dirs[0])
        for d in dirs[1:]:
            files = sorted(glob.glob(os.path.join(d, "seen_delta_*.bin")))
            digs: list[bytes] = []
            for path in files:
                with open(path, "rb") as f:
                    digs.extend(pickle.loads(f.read())["delta"])
            if not digs:
                continue
            arr = np.asarray(digs, dtype="S20")
            sh = shards_of_np(arr, self.n_shards)
            refs = []
            for s in np.unique(sh):
                ix = np.flatnonzero(sh == s)
                part = [digs[i] for i in ix]
                refs.extend(
                    self.actors[int(s)].ingest.remote(part[off:off + 65536])
                    for off in range(0, len(part), 65536))
            ray.get(refs)
        ray.get([a.reset_delta.remote() for a in self.actors])

    def shutdown(self) -> None:
        """Terminate the shard actors (end-of-run cleanup)."""
        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []
