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

    def __init__(self, capacity: int = 1 << 16):
        self.state = SeenShardState(capacity)

    def add_if_new(self, digests: list[bytes]) -> np.ndarray:
        return np.asarray(self.state.add_if_new(digests), dtype=bool)

    def contains(self, digests: list[bytes]) -> np.ndarray:
        return np.asarray(self.state.contains_batch(digests), dtype=bool)

    def size(self) -> int:
        return len(self.state)

    def dump(self) -> bytes:
        return self.state.dump()

    def restore(self, blob: bytes) -> None:
        self.state = SeenShardState.load(blob)


def shard_of(digest: bytes, n_shards: int) -> int:
    return int.from_bytes(digest[12:16], "big") % n_shards


class ShardedSeen:
    """Client over the shard actor pool. Serializable; safe inside tasks."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 16,
                 actors: list | None = None):
        self.n_shards = n_shards
        self.actors = actors or [
            SeenShard.remote(capacity_per_shard) for _ in range(n_shards)
        ]

    def _fanout(self, method: str, digests: list[bytes]) -> np.ndarray:
        """Group digests by owning shard, one batched RPC per shard,
        recombine the per-digest boolean mask."""
        n = len(digests)
        if n == 0:
            return np.zeros(0, dtype=bool)
        by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            by_shard.setdefault(shard_of(d, self.n_shards), []).append(i)
        shards = list(by_shard.keys())
        refs = [
            getattr(self.actors[s], method).remote(
                [digests[i] for i in by_shard[s]])
            for s in shards
        ]
        mask = np.zeros(n, dtype=bool)
        for s, res in zip(shards, ray.get(refs)):
            mask[np.asarray(by_shard[s])] = res
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
    def snapshot(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        blobs = ray.get([a.dump.remote() for a in self.actors])
        for i, blob in enumerate(blobs):
            tmp = os.path.join(directory, f".seen_shard_{i:04d}.tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(directory, f"seen_shard_{i:04d}.bin"))

    def restore(self, directory: str) -> None:
        refs = []
        for i, a in enumerate(self.actors):
            path = os.path.join(directory, f"seen_shard_{i:04d}.bin")
            with open(path, "rb") as f:
                refs.append(a.restore.remote(f.read()))
        ray.get(refs)

    def shutdown(self) -> None:
        """Terminate the shard actors (end-of-run cleanup)."""
        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []
