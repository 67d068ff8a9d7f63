"""Cuckoo filter + exact-set backing — one URL-seen shard's state.

Per the north rule, the URL-seen set is a *sharded cuckoo filter held in an
actor pool* whose final contents must match the reference's dedup semantics
exactly (the reference dedups by key at the sink, handlers/db.py:38-54 —
exact, last-write-wins). A cuckoo filter alone has false positives, so each
shard pairs the filter (fast-path negative checks, O(1) membership on the
hot path) with an exact digest set consulted only when the filter says
"maybe" (SURVEY.md §7.3). The filter is the scale structure: at 10^10 URLs
the exact set becomes per-shard on-disk sorted runs probed only on filter
hits (~epsilon of lookups); in-sandbox it is an in-memory set.

Pure data structure — no Ray here; ``seen.py`` wraps it in actors.
"""

from __future__ import annotations

import pickle

import numpy as np

_EMPTY = 0


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class CuckooFilter:
    """Standard (2,4)-cuckoo filter with 16-bit fingerprints.

    Fingerprint and bucket indices are carved from independent bytes of the
    20-byte SHA-1 URL digest, so no extra hashing of the key is needed.
    Eviction uses a deterministic LCG so a rebuilt filter with the same
    insertion order is bit-identical (determinism contract, SURVEY §7.3).
    """

    BUCKET = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16):
        nb = _next_pow2(max(16, int(capacity / self.BUCKET / 0.84) + 1))
        self.table = np.zeros((nb, self.BUCKET), dtype=np.uint16)
        self.mask = nb - 1
        self.overflow: set[int] = set()   # (index, fp) pairs that failed insert
        self._rng_state = 0x9E3779B97F4A7C15
        self.n_items = 0

    # -- key mapping ------------------------------------------------------
    @staticmethod
    def _fp(digest: bytes) -> int:
        return (digest[0] << 8 | digest[1]) or 1   # never the empty marker

    def _i1(self, digest: bytes) -> int:
        return int.from_bytes(digest[4:12], "little") & self.mask

    @staticmethod
    def _hash_fp(fp: int) -> int:
        x = (fp * 0x5BD1E995) & 0xFFFFFFFF
        return x ^ (x >> 13)

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ self._hash_fp(fp)) & self.mask

    def _rand(self, mod: int) -> int:
        self._rng_state = (self._rng_state * 6364136223846793005 + 1442695040888963407) & (
            (1 << 64) - 1
        )
        return (self._rng_state >> 33) % mod

    # -- operations -------------------------------------------------------
    def contains(self, digest: bytes) -> bool:
        fp = self._fp(digest)
        i1 = self._i1(digest)
        row = self.table[i1]
        if fp in row:
            return True
        i2 = self._alt(i1, fp)
        if fp in self.table[i2]:
            return True
        return (i1, fp) in self.overflow or (i2, fp) in self.overflow

    def insert(self, digest: bytes) -> None:
        fp = self._fp(digest)
        i1 = self._i1(digest)
        self.n_items += 1
        for idx in (i1, self._alt(i1, fp)):
            row = self.table[idx]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = fp
                return
        # evict: deterministic random walk
        idx, cur = i1, fp
        for _ in range(self.MAX_KICKS):
            slot = self._rand(self.BUCKET)
            cur, self.table[idx][slot] = int(self.table[idx][slot]), cur
            idx = self._alt(idx, cur)
            row = self.table[idx]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = cur
                return
        self.overflow.add((idx, cur))

    def load_factor(self) -> float:
        return float(self.n_items) / (self.table.size or 1)


def _probe_np(filt: CuckooFilter, digests: list[bytes]) -> np.ndarray:
    """Vectorized cuckoo membership for a digest batch: one numpy pass
    computes every row's fingerprint and both bucket indices and probes
    the whole table at once — no per-digest Python on the admission hot
    path (round-3 VERDICT: the per-digest loop bounded barrier marking
    and the discover stage's child probes). Exactly mirrors
    ``CuckooFilter.contains`` incl. the overflow fallback (scanned only
    for table-miss rows, and only when overflow is non-empty)."""
    n = len(digests)
    if n == 0:
        return np.zeros(0, dtype=bool)
    u = np.asarray(digests, dtype="S20").view(np.uint8).reshape(n, 20)
    fp = (u[:, 0].astype(np.uint16) << np.uint16(8)) | u[:, 1]
    fp[fp == 0] = 1
    i1 = (np.ascontiguousarray(u[:, 4:12]).view("<u8").reshape(n)
          & np.uint64(filt.mask))
    x = fp.astype(np.uint32) * np.uint32(0x5BD1E995)
    x ^= x >> np.uint32(13)
    i2 = (i1 ^ x.astype(np.uint64)) & np.uint64(filt.mask)
    hit = ((filt.table[i1] == fp[:, None]).any(axis=1)
           | (filt.table[i2] == fp[:, None]).any(axis=1))
    if filt.overflow:
        for i in np.flatnonzero(~hit):
            key = int(fp[i])
            if ((int(i1[i]), key) in filt.overflow
                    or (int(i2[i]), key) in filt.overflow):
                hit[i] = True
    return hit


class SeenShardState:
    """Filter fast-path + exact backing set for one shard.

    ``add_if_new`` is the single batched operation the crawl uses: for each
    digest (in order) report whether it is fresh, inserting as it goes —
    within-batch duplicates resolve to first-occurrence-wins, matching the
    oracle's first-discovery-wins admission.

    Both batch ops probe the filter with one vectorized pass
    (``_probe_np``); per-digest Python survives only in the insert loop,
    which runs once per genuinely-new digest over the whole crawl.
    """

    # journal bound: past this many un-snapshotted digests the journal
    # is dropped and the next snapshot escalates to a full dump — the
    # journal must never rival the exact set's own memory
    DELTA_CAP = 1 << 22

    def __init__(self, capacity: int = 1 << 16, track_deltas: bool = False):
        self.filter = CuckooFilter(capacity)
        self.exact: set[bytes] = set()
        # digests inserted since the last dump/dump_delta — the delta
        # snapshot payload (seen sets only ever GROW, so a checkpoint
        # chain of one full dump + per-wave deltas reconstructs the
        # state at a fraction of the full-dump-per-wave write cost).
        # Opt-in: un-checkpointed runs must not grow a shadow journal.
        self.track_deltas = track_deltas
        self.new_since_dump: list[bytes] = []
        self.delta_overflow = False

    def add_if_new(self, digests: list[bytes]) -> list[bool]:
        n = len(digests)
        if n == 0:
            return []
        maybe = _probe_np(self.filter, digests)
        out = np.zeros(n, dtype=bool)
        seen_in_batch: set[bytes] = set()
        ins = self.filter.insert
        exact = self.exact
        for i in range(n):
            d = digests[i]
            # filter hit -> consult exact (false positives resolve new);
            # filter miss -> definitely new unless an earlier row of THIS
            # batch inserted it (the probe predates the batch's inserts)
            if d in seen_in_batch or (maybe[i] and d in exact):
                continue
            ins(d)
            exact.add(d)
            seen_in_batch.add(d)
            out[i] = True
        if self.track_deltas and not self.delta_overflow:
            self.new_since_dump.extend(seen_in_batch)
            if len(self.new_since_dump) > self.DELTA_CAP:
                self.new_since_dump = []
                self.delta_overflow = True
        return out.tolist()

    def contains_batch(self, digests: list[bytes]) -> list[bool]:
        maybe = _probe_np(self.filter, digests)
        exact = self.exact
        return [bool(m) and d in exact for m, d in zip(maybe, digests)]

    def __len__(self) -> int:
        return len(self.exact)

    # -- checkpoint -------------------------------------------------------
    def dump(self) -> bytes:
        self.new_since_dump = []
        self.delta_overflow = False
        return pickle.dumps(
            {
                "table": self.filter.table,
                "mask": self.filter.mask,
                "overflow": self.filter.overflow,
                "rng": self.filter._rng_state,
                "n_items": self.filter.n_items,
                "exact": sorted(self.exact),
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    def dump_delta(self) -> bytes | None:
        """Digests added since the previous dump/dump_delta — the
        incremental checkpoint payload (full state = the chain's base
        full dump plus every delta since, applied in any order: set
        union is commutative and the filter is rebuilt by insert).
        Returns None when the journal overflowed (or tracking is off):
        the caller must escalate this snapshot to a full dump."""
        if self.delta_overflow or not self.track_deltas:
            return None
        delta = sorted(set(self.new_since_dump))
        self.new_since_dump = []
        return pickle.dumps({"delta": delta},
                            protocol=pickle.HIGHEST_PROTOCOL)

    def reset_delta(self) -> None:
        """Clear the delta journal — called after a restore, whose
        ingested digests are already durable in the on-disk chain."""
        self.new_since_dump = []
        self.delta_overflow = False

    @classmethod
    def load(cls, blob: bytes,
             track_deltas: bool = False) -> "SeenShardState":
        d = pickle.loads(blob)
        st = cls.__new__(cls)
        f = CuckooFilter.__new__(CuckooFilter)
        f.table = d["table"]
        f.mask = d["mask"]
        f.overflow = d["overflow"]
        f._rng_state = d["rng"]
        f.n_items = d["n_items"]
        st.filter = f
        st.exact = set(d["exact"])
        st.track_deltas = track_deltas
        st.new_since_dump = []
        st.delta_overflow = False
        return st
