"""Deduplication pipelines over the documents table.

The reference's only dedup is exact-key last-write-wins at the SQL sink
(handlers/db.py:38-54). A training-data engine needs the full ladder, each
expressed Ray-Data-first:

- ``exact``     — hash-partition on content hash, keep min doc_id
                  (one groupby shuffle; the 100 TB path).
- ``minhash``   — shingle -> 64-perm MinHash -> banded LSH buckets
                  (groupby on band keys) -> candidate pairs -> exact
                  n-gram Jaccard verify against broadcast texts.
- ``simhash``   — 64-bit SimHash per doc + hamming-prefix bucket.
- ``embedding`` — random-hyperplane LSH buckets over the embeddings
                  table -> cosine-verified near-dup pairs.

All hashing is seeded/deterministic (blake2b + fixed linear-perm
constants), so outputs are stable across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .common import join_parts

_N_PERM = 64
_BANDS = 16
_ROWS_PER_BAND = _N_PERM // _BANDS

# fixed odd constants for the multiply-shift permutation family (uint64
# wraparound arithmetic — fully vectorized, no bigint fallback)
_rng = np.random.default_rng(0x5EED)
_PERM_A = _rng.integers(1, 1 << 62, size=_N_PERM, dtype=np.uint64) | np.uint64(1)
_PERM_B = _rng.integers(0, 1 << 62, size=_N_PERM, dtype=np.uint64)


from .common import read_sf_table as _t, round_half_away


_BUCKET_CAP = 64   # max docs per LSH bucket before the bucket is dropped
_GRAM_DF_CAP = 32  # drop 3-grams appearing in more documents than this
# verify-side candidate broadcast: below this many pairs the distinct
# participating doc ids fit on the driver (<= 2*cap * 16 B each) and the
# corpus can be membership-filtered without a shuffle
_VERIFY_BROADCAST_CAP = 2_000_000
# when the membership-filtered doc side is this small, skip the two hash
# joins entirely: ray.put the (doc_id, text) map once and verify pairs in
# a single stateless map — the broadcast-small-side plan. Above the bound
# the distributed join path runs unchanged.
_VERIFY_INLINE_BYTES = 256 << 20
# candidate-side analogue: the multi-occupancy bucket key set is tiny in
# any non-degenerate corpus — broadcast it as a membership filter instead
# of hash-joining the full band-rows exchange against it
_MULTI_BROADCAST_CAP = 4_000_000

_EMB_BANDS = 8          # independent sign-LSH bands...
_EMB_PLANES = 6         # ...of at least this many hyperplanes each
_EMB_MAX_PLANES = 12    # oracle-covered ceiling (n_vecs <= 16 * 2^12)
_EMB_SLOT_CAP = 24      # canonical family slots per band (hard ceiling)


def _emb_planes_for(n_vecs: int) -> int:
    """Planes per band scale with corpus size so the expected bucket
    occupancy stays ~16 regardless of N — with a FIXED plane count the
    2^planes buckets saturate (at N=4096 every bucket of a 6-plane band
    exceeds the cap and the whole corpus gets dropped)."""
    import math

    return max(_EMB_PLANES, math.ceil(math.log2(max(2, n_vecs / 16))))


def _emb_planes_canonical(dim: int) -> np.ndarray:
    """(dim, bands * _EMB_SLOT_CAP) seeded canonical hyperplane family,
    band-major with ``_EMB_SLOT_CAP`` slots per band. Every consumer —
    the engine at ANY adaptive planes count and the SQL oracle — takes
    the FIRST ``planes_for(n)`` slots of each band from this ONE
    matrix, so both sides agree at every tier (round-5 fix: the oracle
    was pinned to 6 planes/band and silently diverged at sf0.1's 2000
    vecs -> 7 planes; the sf0.1 full-registry run caught it)."""
    return np.random.default_rng(7).standard_normal(
        (dim, _EMB_BANDS * _EMB_SLOT_CAP))


def _emb_planes(dim: int, planes_per_band: int = _EMB_PLANES) -> np.ndarray:
    """(dim, bands*planes) band-major slice of the canonical family."""
    assert planes_per_band <= _EMB_SLOT_CAP, (
        f"{planes_per_band} planes/band exceeds the canonical family's "
        f"{_EMB_SLOT_CAP} slots (~16*2^{_EMB_SLOT_CAP} vectors) — raise "
        "_EMB_SLOT_CAP (and regenerate any stored LSH artifacts)")
    c = _emb_planes_canonical(dim)
    return np.concatenate(
        [c[:, b * _EMB_SLOT_CAP: b * _EMB_SLOT_CAP + planes_per_band]
         for b in range(_EMB_BANDS)], axis=1)


# shingle hashes are a LINEAR COMBINE of per-token md5 hashes instead of
# md5 over each materialized k-gram string: tokens are hashed once each
# (md5, so the DuckDB oracle can recompute them — common.sql_hex64) and
# cached per worker process (vocabulary-bounded), then the k-gram hash is
# h[i]*C1 + h[i+1]*C2 + h[i+2]*C3 (uint64 wraparound) — one vectorized
# numpy pass per doc. vs the old md5-per-shingle loop this removes the
# O(n*k) gram-string building AND amortizes md5 to cache misses only.
# Constants < 2^61 and odd: DuckDB mirrors the combine in signed 128-bit
# HUGEINT, and 3 * (2^64 * 2^61) must stay under 2^127 before the mask.
_SHINGLE_C = (np.random.default_rng(0xC0FFEE)
              .integers(1, 1 << 61, size=3, dtype=np.uint64)
              | np.uint64(1))
_TOKEN_CACHE_CAP = 1 << 20
_token_hash_cache: dict[str, int] = {}


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _token_hashes(toks: list[str]) -> np.ndarray:
    cache = _token_hash_cache
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = _hash64(t)
            if len(cache) < _TOKEN_CACHE_CAP:
                cache[t] = h
        out[i] = h
    return out


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Deterministic 64-bit hashes of word k-shingles: md5 per token
    (oracle-recomputable), linear-combined per gram (vectorized)."""
    toks = text.split(" ")
    if len(toks) < k:
        # degenerate short doc: one hash over the whole text (equal to
        # ' '.join(toks)), exactly the oracle's ELSE branch
        return np.array([_hash64(text)], dtype=np.uint64)
    h = _token_hashes(toks)
    with np.errstate(over="ignore"):
        out = h[: -(k - 1)] * _SHINGLE_C[0]
        for j in range(1, k):
            out = out + h[j: len(h) - (k - 1 - j) or None] * _SHINGLE_C[j]
    return out


def _minhash_sig(hashes: np.ndarray) -> np.ndarray:
    """64-perm MinHash signature of a shingle-hash set — one vectorized
    uint64 multiply-add (wraparound) per permutation, then a column min."""
    with np.errstate(over="ignore"):
        vals = hashes[None, :] * _PERM_A[:, None] + _PERM_B[:, None]
    return np.min(vals, axis=1)


# LSH bucket key = uint64 linear combine of a band's signature values
# (wraparound), NOT md5 of their decimal join: the combine is one numpy
# multiply-add over the whole batch's signature matrix, where md5 cost
# one Python hash call per (doc, band). Odd constants < 2^61 so DuckDB
# mirrors the combine in HUGEINT (& mask) without overflow: 4 terms
# < 2^125 each sum to < 2^127. Collisions beyond LSH's own are ~2^-64
# and identical on both sides (the oracle recomputes the same key).
_BUCKET_C = (np.random.default_rng(0xB0C4E7)
             .integers(1, 1 << 61, size=_ROWS_PER_BAND, dtype=np.uint64)
             | np.uint64(1))


def _batch_shingle_hashes(texts: list[str],
                          k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hashes for a whole batch: one flat uint64 array plus
    per-doc start offsets (for ``np.minimum.reduceat``).

    Token md5 hashing is one cached pass over the batch's flattened
    token stream; the k-gram linear combine runs ONCE over the flat
    array and each doc slices its valid window out (grams never cross
    doc boundaries). Docs shorter than *k* tokens contribute their
    single whole-text hash, exactly like ``_shingle_hashes``."""
    n = len(texts)
    tok_lists = [t.split(" ") for t in texts]
    lens = np.fromiter((len(x) for x in tok_lists), np.int64, n)
    flat: list[str] = []
    for toks in tok_lists:
        flat.extend(toks)
    H = _token_hashes(flat)
    tok_off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=tok_off[1:])
    counts = np.where(lens >= k, lens - (k - 1), 1)
    g_off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=g_off[1:])
    out = np.empty(int(g_off[-1]), np.uint64)
    with np.errstate(over="ignore"):
        if len(H) >= k:
            comb = H[: -(k - 1)] * _SHINGLE_C[0]
            for j in range(1, k):
                comb = comb + H[j: len(H) - (k - 1 - j) or None] * _SHINGLE_C[j]
        else:
            comb = np.empty(0, np.uint64)
    for i in range(n):
        if lens[i] >= k:
            s = tok_off[i]
            out[g_off[i]: g_off[i + 1]] = comb[s: s + counts[i]]
        else:
            out[g_off[i]] = _hash64(texts[i])
    return out, g_off[:-1]


def _per_doc_unique(flat: np.ndarray,
                    off: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Dedupe each doc's shingle hashes in one batch-wide pass: a
    (doc, hash) lexsort + boundary compare, instead of one Python
    ``set()`` per doc. *off* is ``_batch_shingle_hashes``'s starts-only
    offsets. Returns (unique hashes, their doc indices), doc-major."""
    n = len(off)
    tag = np.repeat(np.arange(n),
                    np.diff(np.concatenate((off, [len(flat)]))))
    order = np.lexsort((flat, tag))
    hs, ds = flat[order], tag[order]
    first = np.ones(len(hs), dtype=bool)
    first[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
    return hs[first], ds[first]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact content dedup: md5(text) -> keep min doc_id per hash.

    The groupby is a hash shuffle on the 32-char digest — at 100 TB this
    is the canonical 'exact dedup' plan (hash-partition + per-group
    first), never a driver-side set. keep-first is a Min+Count aggregate
    (Arrow block aggregation), not a per-group pandas dispatch — one
    Python call per distinct hash would dominate at corpus scale."""
    from ray.data.aggregate import Count, Min

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest() for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text_hash": pa.array(hs, pa.string())})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Count(alias_name="n_dups"))
    )


def q_dedup_rate(sf_dir: str) -> rd.Dataset:
    """Per-(source, lang) exact-duplication report: how much of each
    slice of the corpus is redundant — the curation dashboard number
    that decides which sources get dropped or down-weighted before a
    training run.

    Two-level aggregate, both Arrow block aggregations (no per-group
    Python dispatch): (source, lang, md5(text)) -> count collapses
    duplicates on one hash shuffle, then (source, lang) sums counts and
    counts distinct hashes. At 100 TB the first groupby is the same
    canonical exact-dedup shuffle as q_dedup_exact; the second input is
    already tiny (one row per distinct text per slice)."""
    from ray.data.aggregate import Count, Sum

    from .common import drop_empty_blocks

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source", "lang"])

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in t.column("text").to_pylist()]
        return pa.table({"source": t.column("source"),
                         "lang": t.column("lang"),
                         "text_hash": pa.array(hs, pa.string())})

    per_text = (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang", "text_hash"])
        .aggregate(Count(alias_name="n"))
    )
    rep = per_text.groupby(["source", "lang"]).aggregate(
        Count(alias_name="n_distinct"), Sum("n", alias_name="n_docs"))

    def finish(t: pa.Table) -> pa.Table:
        docs = pc.cast(t.column("n_docs"), pa.float64())
        dis = pc.cast(t.column("n_distinct"), pa.float64())
        return pa.table({
            "source": t.column("source"),
            "lang": t.column("lang"),
            "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            "n_distinct": pc.cast(t.column("n_distinct"), pa.int64()),
            "dup_rate": pc.divide(pc.subtract(docs, dis), docs),
        })

    return drop_empty_blocks(rep).map_batches(finish, batch_format="pyarrow")


def q_incremental_dedup(sf_dir: str) -> rd.Dataset:
    """Dedupe a NEW document batch against an EXISTING corpus without
    ever reshuffling the old corpus — the hourly-ingest plan when the
    accumulated corpus is 1000x the increment.

    The existing side (even doc_ids) is read once and its content
    digests load into the crawl engine's sharded seen-set actors
    (``state/seen.py`` — cuckoo filter + exact backing, the same state
    that holds 10^10 URL digests at crawl scale) via batched
    ``add_if_new`` RPCs from inside ``map_batches``; the new side (odd
    doc_ids) probes with one batched ``contains`` RPC per shard per
    batch. No join, no shuffle: the old corpus's only cost is one
    linear scan at load time, amortizable across increments in a
    persistent deployment. ``contains`` is exact (the cuckoo filter is
    backed by an exact digest set), so the output hash-matches the SQL
    anti-join semantics."""
    from ..state.seen import ShardedSeen

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    seen = ShardedSeen(4, 1 << 16)

    def load_existing(t: pa.Table) -> pa.Table:
        digs = [hashlib.sha1(x.encode()).digest()
                for i, x in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist())
                if i % 2 == 0]
        if digs:
            seen.add_if_new(digs)
        return pa.table({"n": pa.array([len(digs)], pa.int64())})

    # barrier: the existing side must be fully loaded before any probe
    ds.map_batches(load_existing, batch_format="pyarrow",
                   zero_copy_batch=True).count()

    def probe_new(t: pa.Table) -> pa.Table:
        ids = [i for i in t.column("doc_id").to_pylist() if i % 2 == 1]
        texts = [x for i, x in zip(t.column("doc_id").to_pylist(),
                                   t.column("text").to_pylist())
                 if i % 2 == 1]
        digs = [hashlib.sha1(x.encode()).digest() for x in texts]
        dup = seen.contains(digs) if digs else []
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "is_dup": pa.array([int(d) for d in dup], pa.int64()),
        })

    return ds.map_batches(probe_new, batch_format="pyarrow",
                          zero_copy_batch=True)


_SPAN_K = 32       # window width (chars) — ExactSubstr-style span unit
_SPAN_STRIDE = 16  # sampling stride; any duplicated run >= K+S-1 chars
                   # is guaranteed to contribute at least one shared window


def _strided_windows_pos(t: pa.Table) -> pa.Table:
    """(doc_id, pos, win) rows for every strided 32-char window of the
    batch, doc-major with pos ascending — the shared kernel behind
    ``q_dup_spans`` (which drops pos and dedupes) and
    ``q_dup_span_coverage`` (which needs every position). No per-window
    Python loop: ASCII docs concatenate into one byte buffer and every
    window's K bytes gather in a single fancy-index (O(total windows));
    non-ASCII docs (byte length != char length, where byte slicing
    would split a codepoint) fall back to the exact Python loop."""
    K, S = _SPAN_K, _SPAN_STRIDE
    ids_col = t.column("doc_id")
    texts = t.column("text").to_pylist()
    n = len(texts)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64()),
                      "win": pa.array([], pa.string())})
    if n == 0:
        return empty
    raw = [tx.encode() for tx in texts]
    slow_i = [i for i, (tx, b) in enumerate(zip(texts, raw))
              if len(b) != len(tx)]
    slow = set(slow_i)
    lens = np.fromiter(
        (0 if i in slow else len(b) for i, b in enumerate(raw)),
        np.int64, n)
    counts = np.where(lens >= K, (lens - K) // S + 1, 0)
    total = int(counts.sum())
    parts = []
    if total:
        buf = np.frombuffer(
            b"".join(b for i, b in enumerate(raw) if i not in slow)
            if slow else b"".join(raw), np.uint8)
        kept = np.array([i for i in range(n) if i not in slow],
                        np.int64) if slow else np.arange(n)
        klens = lens[kept]
        doc_off = np.zeros(len(kept) + 1, np.int64)
        np.cumsum(klens, out=doc_off[1:])
        kcounts = counts[kept]
        w_off = np.concatenate(([0], np.cumsum(kcounts)))
        wi = np.arange(total) - np.repeat(w_off[:-1], kcounts)
        widx = np.repeat(doc_off[:-1], kcounts) + wi * S
        w = buf[widx[:, None] + np.arange(K)]
        parts.append(pa.table({
            "doc_id": pc.take(ids_col,
                              pa.array(np.repeat(kept, kcounts))),
            "pos": pa.array(wi * S, pa.int64()),
            "win": pc.cast(
                pa.array(np.ascontiguousarray(w).view(f"S{K}").ravel()),
                pa.string())}))
    for i in slow_i:
        tx = texts[i]
        m = len(tx)
        if m < K:
            continue
        cnt = (m - K) // S + 1
        parts.append(pa.table({
            "doc_id": pa.array([ids_col[i].as_py()] * cnt, ids_col.type),
            "pos": pa.array([j * S for j in range(cnt)], pa.int64()),
            "win": pa.array([tx[j * S: j * S + K] for j in range(cnt)],
                            pa.string())}))
    return pa.concat_tables(parts) if parts else empty


def q_dup_spans(sf_dir: str) -> rd.Dataset:
    """Span-level exact-substring duplication audit (the signal behind
    suffix-array ExactSubstr dedup, Lee et al. 2021, via strided k-char
    window sampling): per doc, how many 32-char windows also occur in at
    least one OTHER document.

    Plan: flat-map docs -> DISTINCT per-doc (doc_id, window) rows (the
    dedup is local — a doc's windows are all generated in its own
    batch, so no distinct shuffle is ever needed); count docs per
    window (ONE groupby shuffle); the multi-doc window set is tiny in
    any non-degenerate corpus, so under ``_MULTI_BROADCAST_CAP`` it is
    ray.put once and the per-doc flags are a stateless map — above the
    cap a distributed hash join runs instead (same discipline as the
    minhash verify). Gate tiers shuffle the raw 32-char windows so the
    DuckDB oracle can recompute them with substr(); a 100 TB deployment
    hashes windows to u64 first (4x less exchange volume) with the
    identical topology."""
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def windows(t: pa.Table) -> pa.Table:
        """Distinct per-doc strided windows — the shared positional
        gather, positions dropped, distinctness via C-level group_by."""
        wp = _strided_windows_pos(t)
        return (wp.select(["doc_id", "win"])
                .group_by(["doc_id", "win"]).aggregate([]))

    w = ds.map_batches(windows, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()
    def only_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("ndocs"), 2))

    dup_wins = drop_empty_blocks(
        w.groupby("win").count().rename_columns({"count()": "ndocs"})
        .map_batches(only_dups, batch_format="pyarrow")).materialize()

    if dup_wins.count() <= _MULTI_BROADCAST_CAP:
        dup_ref = ray.put({r["win"] for r in dup_wins.take_all()})

        def flag_bcast(t: pa.Table) -> pa.Table:
            dset = ray.get(dup_ref)
            dup = [w_ in dset for w_ in t.column("win").to_pylist()]
            return pa.table({
                "doc_id": t.column("doc_id"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "dup": pa.array(np.asarray(dup, dtype=np.int64)),
            })

        flagged = w.map_batches(flag_bcast, batch_format="pyarrow")
    else:
        joined = w.join(dup_wins, join_type="left_outer", num_partitions=join_parts(1),
                        on=("win",))

        def flag_join(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t.column("doc_id"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "dup": pc.cast(pc.is_valid(t.column("ndocs")), pa.int64()),
            })

        flagged = joined.map_batches(flag_join, batch_format="pyarrow")

    return (flagged.groupby("doc_id")
            .aggregate(Sum("one", alias_name="n_windows"),
                       Sum("dup", alias_name="n_dup_windows")))


_DUP_SPANS_SQL = f"""
WITH w AS (
  SELECT DISTINCT doc_id, substr(text, 1 + s.i * {_SPAN_STRIDE}, {_SPAN_K}) AS win
  FROM documents, LATERAL (
    SELECT unnest(generate_series(
        0, (length(text) - {_SPAN_K}) // {_SPAN_STRIDE})) AS i) s
  WHERE length(text) >= {_SPAN_K}),
nd AS (SELECT win, count(DISTINCT doc_id) AS ndocs FROM w GROUP BY win)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_windows
FROM w JOIN nd USING (win) GROUP BY doc_id
"""

def q_dup_span_coverage(sf_dir: str) -> rd.Dataset:
    """ExactSubstr COVERAGE (the cut-planning half of Lee et al. 2021
    that ``q_dup_spans`` only audits): per doc, how many characters are
    covered by the UNION of its cross-doc-duplicated 32-char windows —
    the number a span-removal rewrite would delete. Because strided
    fixed-length windows union as Σ min(next_start − start, K) over the
    doc's dup windows (positions ascending), coverage needs no interval
    sweep — one vectorized lag per doc segment.

    Engine shape: a positional window map (same flat-bytes gather as
    ``q_dup_spans``, positions kept, no dedupe), the dup-window set from
    one (win) groupby over locally-distinct rows, then — broadcast
    under ``_MULTI_BROADCAST_CAP``, hash-join + doc-keyed repartition
    past it — a per-batch segmented coverage kernel. Docs arrive whole
    in both branches (windows generate in the doc's own batch; the join
    path re-co-locates by doc), so coverage is exact."""
    from .common import drop_empty_blocks, keyed_repartition

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    K, S = _SPAN_K, _SPAN_STRIDE

    wp = drop_empty_blocks(
        ds.map_batches(_strided_windows_pos, batch_format="pyarrow",
                       zero_copy_batch=True)).materialize()


    def loc_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["doc_id", "win"])
                .group_by(["doc_id", "win"]).aggregate([]))

    def only_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("ndocs"), 2))

    dup_wins = drop_empty_blocks(
        wp.map_batches(loc_distinct, batch_format="pyarrow")
        .groupby("win").count().rename_columns({"count()": "ndocs"})
        .map_batches(only_dups, batch_format="pyarrow")).materialize()

    def coverage(ids: np.ndarray, pos: np.ndarray,
                 dup: np.ndarray, id_arr: pa.Array) -> pa.Table:
        # rows are doc-major with pos ascending within each doc
        m = len(ids)
        new = np.ones(m, dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        codes = np.cumsum(new) - 1
        n_docs = int(codes[-1]) + 1 if m else 0
        n_win = np.bincount(codes, minlength=n_docs)
        n_dup = np.bincount(codes[dup], minlength=n_docs)
        posd, codd = pos[dup], codes[dup]
        contr = np.full(len(posd), K, np.int64)
        if len(posd) > 1:
            same = codd[1:] == codd[:-1]
            gap = posd[1:] - posd[:-1]
            contr[:-1] = np.where(same, np.minimum(gap, K), K)
        covered = np.bincount(codd, weights=contr,
                              minlength=n_docs).astype(np.int64)
        firsts = np.flatnonzero(new)
        return pa.table({
            "doc_id": pc.take(id_arr, pa.array(firsts)),
            "n_windows": pa.array(n_win.astype(np.int64), pa.int64()),
            "n_dup_windows": pa.array(n_dup.astype(np.int64), pa.int64()),
            "covered": pa.array(covered, pa.int64())})

    empty_out = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_windows": pa.array([], pa.int64()),
                          "n_dup_windows": pa.array([], pa.int64()),
                          "covered": pa.array([], pa.int64())})

    if dup_wins.count() <= _MULTI_BROADCAST_CAP:
        dup_ref = ray.put({r["win"] for r in dup_wins.take_all()})

        def flag_cov(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty_out
            dset = ray.get(dup_ref)
            dup = np.fromiter((w_ in dset
                               for w_ in t.column("win").to_pylist()),
                              bool, t.num_rows)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            pos = t.column("pos").to_numpy(zero_copy_only=False)
            return coverage(ids, pos, dup, t.column("doc_id"))

        return wp.map_batches(flag_cov, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)

    joined = drop_empty_blocks(wp.join(
        dup_wins, join_type="left_outer", num_partitions=join_parts(1),
        on=("win",)))

    def sort_cov(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_out
        t = t.sort_by([("doc_id", "ascending"), ("pos", "ascending")])
        dup = pc.is_valid(t.column("ndocs")).to_numpy(
            zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        return coverage(ids, pos, dup, t.column("doc_id"))

    return keyed_repartition(joined, ["doc_id"]).map_batches(
        sort_cov, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)


def q_dup_span_rewrite(sf_dir: str) -> rd.Dataset:
    """ExactSubstr CUT (Lee et al. 2021, applied): materialize each
    document with the union of its cross-doc-duplicated 32-char windows
    REMOVED — the rewrite ``q_dup_span_coverage`` only budgets. Every
    doc comes back (short/clean docs unchanged, n_removed = 0).

    Engine shape: the dup-window set derives exactly as in the coverage
    query; under ``_MULTI_BROADCAST_CAP`` it broadcasts and the rewrite
    is ONE fused map over documents (windows re-gathered per batch with
    the shared kernel, covered bytes masked with one scatter, survivors
    sliced per doc). Past the cap, dup positions hash-join to the
    window rows, pack to one row per doc via a keyed repartition +
    segmented pass, and hash-join back to the documents for the same
    vectorized mask — no per-char Python anywhere on the ASCII path."""
    from .common import drop_empty_blocks, keyed_repartition

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    K = _SPAN_K

    wp = drop_empty_blocks(
        ds.map_batches(_strided_windows_pos, batch_format="pyarrow",
                       zero_copy_batch=True)).materialize()

    def loc_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["doc_id", "win"])
                .group_by(["doc_id", "win"]).aggregate([]))

    def only_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("ndocs"), 2))

    dup_wins = drop_empty_blocks(
        wp.map_batches(loc_distinct, batch_format="pyarrow")
        .groupby("win").count().rename_columns({"count()": "ndocs"})
        .map_batches(only_dups, batch_format="pyarrow")).materialize()

    def apply_cut(t: pa.Table, starts_of: dict) -> pa.Table:
        """Rewrite one documents batch given per-doc dup window starts
        (char offsets). Vectorized byte mask for ASCII docs; exact
        Python slicing for non-ASCII docs."""
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_pylist()
        kept, removed = [], []
        for did, tx in zip(ids, texts):
            ps = starts_of.get(did)
            if not ps:
                kept.append(tx)
                removed.append(0)
                continue
            b = tx.encode()
            if len(b) == len(tx):
                mask = np.zeros(len(b), dtype=bool)
                idx = (np.asarray(ps, np.int64)[:, None]
                       + np.arange(K)).ravel()
                mask[idx] = True
                arr = np.frombuffer(b, np.uint8)
                kept.append(arr[~mask].tobytes().decode())
                removed.append(int(mask.sum()))
            else:
                m2 = [False] * len(tx)
                for p in ps:
                    for j in range(p, p + K):
                        m2[j] = True
                kept.append("".join(c for c, f in zip(tx, m2) if not f))
                removed.append(sum(m2))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "kept_text": pa.array(kept, pa.string()),
            "n_removed": pa.array(removed, pa.int64())})

    if dup_wins.count() <= _MULTI_BROADCAST_CAP:
        dup_ref = ray.put({r["win"] for r in dup_wins.take_all()})

        def rewrite_bcast(t: pa.Table) -> pa.Table:
            dset = ray.get(dup_ref)
            wpb = _strided_windows_pos(t)
            starts_of: dict = {}
            for did, pos, w_ in zip(wpb.column("doc_id").to_pylist(),
                                    wpb.column("pos").to_pylist(),
                                    wpb.column("win").to_pylist()):
                if w_ in dset:
                    starts_of.setdefault(did, []).append(pos)
            return apply_cut(t, starts_of)

        return ds.map_batches(rewrite_bcast, batch_format="pyarrow",
                              zero_copy_batch=True)

    dup_pos = drop_empty_blocks(wp.join(
        dup_wins, join_type="inner", num_partitions=join_parts(1),
        on=("win",))).select_columns(["doc_id", "pos"])

    def pack(t: pa.Table) -> pa.Table:
        # one row per doc: its dup window starts, ascending, packed
        t = t.sort_by([("doc_id", "ascending"), ("pos", "ascending")])
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.table({"pdoc": pa.array([], pa.int64()),
                             "poslist": pa.array([], pa.string())})
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        packed = [",".join(map(str, pos[a:b])) for a, b in
                  zip(starts, np.append(starts[1:], len(ids)))]
        return pa.table({"pdoc": pa.array(ids[starts], pa.int64()),
                         "poslist": pa.array(packed, pa.string())})

    packed = keyed_repartition(dup_pos, ["doc_id"]).map_batches(
        pack, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    joined = drop_empty_blocks(ds.join(
        packed, join_type="left_outer", num_partitions=join_parts(1),
        on=("doc_id",), right_on=("pdoc",)))

    def rewrite_join(t: pa.Table) -> pa.Table:
        starts_of = {d: [int(x) for x in pl.split(",")]
                     for d, pl in zip(t.column("doc_id").to_pylist(),
                                      t.column("poslist").to_pylist())
                     if pl}
        return apply_cut(t, starts_of)

    return joined.map_batches(rewrite_join, batch_format="pyarrow")


_DUP_SPAN_REWRITE_SQL = f"""
WITH w AS (
  SELECT doc_id, s.i * {_SPAN_STRIDE} AS pos,
         substr(text, 1 + s.i * {_SPAN_STRIDE}, {_SPAN_K}) AS win
  FROM documents, LATERAL (
    SELECT unnest(generate_series(
        0, (length(text) - {_SPAN_K}) // {_SPAN_STRIDE})) AS i) s
  WHERE length(text) >= {_SPAN_K}),
wd AS (SELECT DISTINCT doc_id, win FROM w),
nd AS (SELECT win, count(*) AS ndocs FROM wd GROUP BY win),
dupw AS (SELECT w.doc_id, w.pos FROM w JOIN nd USING (win)
         WHERE nd.ndocs >= 2),
cov AS (SELECT DISTINCT doc_id, pos + j AS i
        FROM dupw, unnest(generate_series(1, {_SPAN_K})) u(j)),
chars AS (SELECT d.doc_id, t.i, substr(d.text, t.i, 1) AS ch
          FROM documents d, LATERAL (
            SELECT unnest(generate_series(1, length(d.text))) AS i) t)
SELECT d.doc_id,
       coalesce(agg.kept_text, d.text) AS kept_text,
       CAST(coalesce(agg.n_removed, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN (
  SELECT c.doc_id,
         coalesce(string_agg(c.ch, '' ORDER BY c.i)
                  FILTER (WHERE cov.i IS NULL), '') AS kept_text,
         count(*) FILTER (WHERE cov.i IS NOT NULL) AS n_removed
  FROM chars c LEFT JOIN cov
    ON c.doc_id = cov.doc_id AND c.i = cov.i
  GROUP BY c.doc_id) agg USING (doc_id)
"""


_DUP_SPAN_COVERAGE_SQL = f"""
WITH w AS (
  SELECT doc_id, s.i * {_SPAN_STRIDE} AS pos,
         substr(text, 1 + s.i * {_SPAN_STRIDE}, {_SPAN_K}) AS win
  FROM documents, LATERAL (
    SELECT unnest(generate_series(
        0, (length(text) - {_SPAN_K}) // {_SPAN_STRIDE})) AS i) s
  WHERE length(text) >= {_SPAN_K}),
wd AS (SELECT DISTINCT doc_id, win FROM w),
nd AS (SELECT win, count(*) AS ndocs FROM wd GROUP BY win),
f AS (SELECT w.doc_id, w.pos, (nd.ndocs >= 2) AS d
      FROM w JOIN nd USING (win)),
f2 AS (SELECT doc_id, pos, d,
              lead(pos) OVER (PARTITION BY doc_id, d ORDER BY pos) AS nxt
       FROM f)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN d THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(sum(CASE WHEN d
            THEN least(coalesce(nxt - pos, {_SPAN_K}), {_SPAN_K})
            ELSE 0 END), 0) AS BIGINT) AS covered
FROM f2 GROUP BY doc_id
"""


_BOILER_N = 3        # token n-gram width
_BOILER_MIN_DOCS = 2  # grams on >= this many docs of one source are boiler


def q_boilerplate(sf_dir: str) -> rd.Dataset:
    """Per-source boilerplate audit (the CCNet/RefinedWeb-style signal
    that precedes quality filtering): for every doc, how many of its
    distinct token 3-grams also occur in at least one OTHER document of
    the SAME source — repeated template text (headers, footers, legal
    blurbs) scores high, original prose scores low, and a downstream
    gate drops or strips by the ratio. Differs from ``q_dup_spans``
    (global char-window duplication) by conditioning on the source
    column: a phrase common across sources is NOT boilerplate here.

    Plan: flat-map -> locally-DISTINCT (doc, source, gram) rows; one
    groupby on (source, gram) counts carrier docs; the multi-doc gram
    set is broadcast under ``_MULTI_BROADCAST_CAP`` (distributed hash
    join past it); one final groupby on doc_id sums the flags. The
    exchanges carry gram rows pre-deduped per doc — O(tokens), with the
    same topology at any corpus size."""
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])

    def grams(t: pa.Table) -> pa.Table:
        """Distinct (doc, source, gram) rows, no per-doc Python loop:
        the batch's tokens flatten once, every gram materializes via
        ONE Arrow ``binary_join_element_wise`` over _BOILER_N shifted
        takes, and per-doc distinctness is a C-level hash group_by."""
        texts = t.column("text").to_pylist()
        n = len(texts)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "source": pa.array([], pa.string()),
                          "gram": pa.array([], pa.string())})
        if n == 0:
            return empty
        tok_lists = [x.split(" ") for x in texts]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64, n)
        flat: list[str] = []
        for toks in tok_lists:
            flat.extend(toks)
        tok_off = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=tok_off[1:])
        counts = np.maximum(lens - (_BOILER_N - 1), 0)  # short docs: 0
        total = int(counts.sum())
        if total == 0:
            return empty
        g_off = np.concatenate(([0], np.cumsum(counts)))
        starts = np.repeat(tok_off[:-1], counts)
        pos = starts + (np.arange(total) - np.repeat(g_off[:-1], counts))
        fa = pa.array(flat, pa.string())
        parts = [fa.take(pa.array(pos + j)) for j in range(_BOILER_N)]
        gram = pc.binary_join_element_wise(*parts, " ")
        doc_idx = pa.array(np.repeat(np.arange(n), counts))
        out = pa.table({
            "doc_id": pc.take(t.column("doc_id"), doc_idx),
            "source": pc.take(t.column("source"), doc_idx),
            "gram": gram})
        return out.group_by(["doc_id", "source", "gram"]).aggregate([])

    g = ds.map_batches(grams, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()

    def only_boiler(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("ndocs"),
                                         _BOILER_MIN_DOCS))

    boiler = drop_empty_blocks(
        g.groupby(["source", "gram"]).count()
        .rename_columns({"count()": "ndocs"})
        .map_batches(only_boiler, batch_format="pyarrow")).materialize()

    if boiler.count() <= _MULTI_BROADCAST_CAP:
        bref = ray.put({(r["source"], r["gram"])
                        for r in boiler.take_all()})

        def flag_bcast(t: pa.Table) -> pa.Table:
            bset = ray.get(bref)
            dup = [(s, gr) in bset
                   for s, gr in zip(t.column("source").to_pylist(),
                                    t.column("gram").to_pylist())]
            return pa.table({
                "doc_id": t.column("doc_id"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "boiler": pa.array(np.asarray(dup, dtype=np.int64)),
            })

        flagged = g.map_batches(flag_bcast, batch_format="pyarrow")
    else:
        joined = g.join(boiler.select_columns(["source", "gram", "ndocs"]),
                        join_type="left_outer", num_partitions=join_parts(1),
                        on=("source", "gram"))

        def flag_join(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t.column("doc_id"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "boiler": pc.cast(pc.is_valid(t.column("ndocs")), pa.int64()),
            })

        flagged = joined.map_batches(flag_join, batch_format="pyarrow")

    return (flagged.groupby("doc_id")
            .aggregate(Sum("one", alias_name="n_grams"),
                       Sum("boiler", alias_name="n_boiler_grams")))


_BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
g AS (
  SELECT DISTINCT doc_id, source,
         ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS gram
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(ts) - {_BOILER_N - 1})) AS i) s
  WHERE len(ts) >= {_BOILER_N}),
freq AS (SELECT source, gram, count(*) AS ndocs FROM g GROUP BY source, gram)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.ndocs >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boiler_grams
FROM g JOIN freq f ON f.source = g.source AND f.gram = g.gram
GROUP BY g.doc_id
"""


def q_dedup_keep_best(sf_dir: str) -> rd.Dataset:
    """Normalize-then-dedup keeping the BEST copy, not the min-id one:
    docs that normalize to the same canonical text (lowercase,
    non-alphanumerics to spaces, collapsed whitespace) form one group,
    and the survivor is the longest RAW copy (tie: lowest doc_id) — the
    policy real curation pipelines use, where formatting variants of
    one page should yield the richest original, not an arbitrary id.

    Engine shape: normalization is three RE2 kernels per batch (the
    pinned ``q_text_normalize`` pair), the per-group argmax rides the
    existing ``keep_max_by`` machinery (per-batch partial keep-max, ONE
    hash repartition, second partial — never a per-key dispatch) with
    the (n_chars DESC, doc_id ASC) order packed into one unique int64
    score: ``n_chars * 2^40 - doc_id``."""
    from .relational import keep_max_by

    ds = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t.column("text"))
        x = pc.replace_substring_regex(x, "[^a-z0-9 ]+", " ")
        x = pc.replace_substring_regex(x, " +", " ")
        x = pc.utf8_trim(x, " ")
        keys = [hashlib.md5(s.encode()).hexdigest()
                for s in x.to_pylist()]           # md5: oracle parity
        did = pc.cast(t.column("doc_id"), pa.int64())
        nch = pc.cast(t.column("n_chars"), pa.int64())
        score = pc.subtract(
            pc.multiply(nch, pa.scalar(1 << 40, pa.int64())), did)
        return pa.table({"norm_key": pa.array(keys, pa.string()),
                         "doc_id": did, "n_chars": nch, "score": score})

    kept = keep_max_by(
        ds.map_batches(keyed, batch_format="pyarrow",
                       zero_copy_batch=True), "norm_key", "score")
    return kept.drop_columns(["score"])


_KEEP_BEST_SQL = """
WITH n AS (
  SELECT doc_id, n_chars,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'), ' ')) AS norm_key
  FROM documents)
SELECT norm_key, doc_id, n_chars FROM (
  SELECT norm_key, doc_id, n_chars,
         row_number() OVER (PARTITION BY norm_key
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM n) WHERE rn = 1
"""


_WINNOW_W = 4   # winnowing window (consecutive grams per min-selection)


def q_winnow(sf_dir: str) -> rd.Dataset:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003, the MOSS algorithm): slide a W-gram window over each doc's
    ORDERED shingle-hash sequence and select every window's minimum —
    the guarantee q_fingerprint's single global min lacks: any shared
    run of >= W+k-1 tokens contributes at least one shared fingerprint,
    so partial overlaps are detectable, with density 2/(W+1) instead of
    one-hash-per-window sampling. Docs shorter than W grams select
    their global min. Output per doc: gram count, distinct selected
    fingerprints, and the min fingerprint (decimal string, HUGEINT-
    mirrorable).

    Engine shape: pure map — the batch's grams come from the shared
    ``_batch_shingle_hashes`` kernel, window minima are one
    ``np.minimum.reduce`` over W shifted gathers (within-doc window
    starts built with the repeat/arange trick), and per-doc distinct +
    min fall out of one lexsort. No shuffle at any scale."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_fp": pa.array([], pa.int64()),
                             "min_fp": pa.array([], pa.string())})
        flat, off = _batch_shingle_hashes(texts)
        counts = np.diff(np.concatenate((off, [len(flat)])))
        long = counts >= _WINNOW_W
        # long docs: within-doc window starts, min over W shifted reads
        wc = counts[long] - _WINNOW_W + 1
        w_off = np.concatenate(([0], np.cumsum(wc)))
        pos = (np.repeat(off[long], wc)
               + (np.arange(int(wc.sum())) - np.repeat(w_off[:-1], wc)))
        vals_long = np.minimum.reduce(
            [flat[pos + j] for j in range(_WINNOW_W)]) if len(pos) else \
            np.empty(0, flat.dtype)
        tags_long = np.repeat(np.flatnonzero(long), wc)
        # short docs: one fingerprint = the doc's global min
        seg_min = np.minimum.reduceat(flat, off) if len(flat) else \
            np.empty(0, flat.dtype)
        short_idx = np.flatnonzero(~long)
        vals = np.concatenate((vals_long, seg_min[short_idx]))
        tags = np.concatenate((tags_long, short_idx))
        order = np.lexsort((vals, tags))
        vs, ds_ = vals[order], tags[order]
        first = np.ones(len(vs), dtype=bool)
        first[1:] = (vs[1:] != vs[:-1]) | (ds_[1:] != ds_[:-1])
        doc_first = np.ones(len(vs), dtype=bool)
        doc_first[1:] = ds_[1:] != ds_[:-1]
        n_fp = np.bincount(ds_[first], minlength=n)
        min_fp = np.zeros(n, flat.dtype)
        min_fp[ds_[doc_first]] = vs[doc_first]   # vals asc within doc
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_grams": pa.array(counts, pa.int64()),
            "n_fp": pa.array(n_fp.astype(np.int64), pa.int64()),
            "min_fp": pa.array(min_fp.astype("U20"))})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _winnow_oracle_sql() -> str:
    from .common import sql_hex64

    mask = "18446744073709551615::HUGEINT"
    c1, c2, c3 = (f"{int(c)}::HUGEINT" for c in _SHINGLE_C)
    w = _WINNOW_W
    return f"""
WITH docs AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
th AS (
  SELECT doc_id, text, len(toks) AS n,
         list_transform(toks, t -> {sql_hex64('t')}) AS ht
  FROM docs),
hso AS (
  SELECT doc_id,
         CASE WHEN n >= 3 THEN
           list_transform(range(1, n - 1), i ->
             (ht[i] * {c1} + ht[i+1] * {c2} + ht[i+2] * {c3}) & {mask})
         ELSE [{sql_hex64('text')}] END AS h
  FROM th),
g AS (SELECT doc_id, len(h) AS n_grams, h FROM hso),
sel AS (
  SELECT doc_id, n_grams,
         CASE WHEN n_grams >= {w} THEN
           list_transform(range(1, n_grams - {w - 2}), i ->
             list_min(list_slice(h, i, i + {w - 1})))
         ELSE [list_min(h)] END AS s
  FROM g)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(len(list_distinct(s)) AS BIGINT) AS n_fp,
       CAST(list_min(s) AS VARCHAR) AS min_fp
FROM sel
"""


def _gram_hash_ctes(source: str) -> str:
    """The shared docs -> hs CTE prefix: tokenized docs, per-token md5
    hashes, and the k-gram linear combine — the SQL mirror of
    ``_shingle_hashes`` (same _SHINGLE_C constants, HUGEINT & mask for
    the uint64 wraparound)."""
    from .common import sql_hex64

    mask = "18446744073709551615::HUGEINT"
    c1, c2, c3 = (f"{int(c)}::HUGEINT" for c in _SHINGLE_C)
    return f"""docs AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM {source}),
th AS (
  SELECT doc_id, text, len(toks) AS n,
         list_transform(toks, t -> {sql_hex64('t')}) AS ht
  FROM docs),
hs AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN n >= 3 THEN
             list_transform(range(1, n - 1), i ->
               (ht[i] * {c1} + ht[i+1] * {c2} + ht[i+2] * {c3}) & {mask})
           ELSE [{sql_hex64('text')}] END) AS h
  FROM th)"""


def _minhash_oracle_sql(threshold: float = 0.6,
                        source: str = "documents") -> str:
    """The full MinHash+LSH near-dup pipeline re-expressed in SQL:
    shingle -> 64-perm signature (same multiply-shift constants, uint64
    wraparound via HUGEINT & mask) -> banded md5 buckets -> capped
    in-bucket pairs -> exact Jaccard verify. Constants are inlined from
    the module's seeded permutation family. ``source`` is any table name
    or parenthesized subquery with (doc_id, text) columns."""
    a_lst = "[" + ", ".join(f"{int(a)}::HUGEINT" for a in _PERM_A) + "]"
    b_lst = "[" + ", ".join(f"{int(b)}::HUGEINT" for b in _PERM_B) + "]"
    mask = "18446744073709551615::HUGEINT"
    # bucket = uint64 linear combine of the band's 4 signature values,
    # constant-for-constant with the engine's _BUCKET_C (wraparound ==
    # HUGEINT sum & mask; 4 terms < 2^125 stay under 2^127)
    band_key = "(" + " + ".join(
        f"sig[4 * b + {r}] * {int(_BUCKET_C[r - 1])}::HUGEINT"
        for r in range(1, 5)) + f") & {mask}"
    return f"""
WITH {_gram_hash_ctes(source)},
sigs AS (
  SELECT doc_id, h,
         list_transform(range(1, 65), p ->
           list_min(list_transform(h,
             s -> (s * ({a_lst})[p] + ({b_lst})[p]) & {mask}))) AS sig
  FROM hs),
bands AS (
  SELECT doc_id, b, {band_key} AS bucket
  FROM sigs CROSS JOIN range(0, 16) t(b)),
ok_buckets AS (
  SELECT b, bucket FROM bands GROUP BY b, bucket
  HAVING count(DISTINCT doc_id) <= {_BUCKET_CAP}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.b = y.b AND x.bucket = y.bucket
               AND x.doc_id < y.doc_id
  JOIN ok_buckets ob ON ob.b = x.b AND ob.bucket = x.bucket),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(ha.h, hb.h)) AS DOUBLE)
           / greatest(1, len(ha.h) + len(hb.h)
                         - len(list_intersect(ha.h, hb.h))) AS j
  FROM cand c
  JOIN hs ha ON ha.doc_id = c.doc_a
  JOIN hs hb ON hb.doc_id = c.doc_b)
SELECT doc_a, doc_b, round(j, 4) AS jaccard
FROM verified WHERE j >= {threshold}
"""


def _embedding_neardup_oracle_sql(threshold: float = 0.3,
                                  dim: int = 64) -> str:
    """Banded sign-LSH + cosine verify in SQL, canonical plane
    constants inlined (band-major slices of ``_emb_planes_canonical``,
    exactly what the engine uses).

    The planes-per-band count is computed IN SQL from the corpus size —
    ``greatest(6, ceil(log2(n/16)))``, the mirror of
    ``_emb_planes_for`` — and each band's bucket key sums only the
    first ``planes`` bits, so the oracle tracks the engine's adaptive
    plane count at every tier up to ``_EMB_MAX_PLANES`` (n <= 16*2^12
    vectors; past that the final WHERE gate returns an empty — loudly
    mismatching — result rather than a silently wrong one). Round-5
    fix: the previous pin to 6 planes diverged at sf0.1 (2000 vecs ->
    7 planes), caught by the full-registry run at sf0.1."""
    pl = _emb_planes_canonical(dim)
    keys = []
    for b in range(_EMB_BANDS):
        bits = " + ".join(
            f"(CASE WHEN {p} < pn.planes AND list_dot_product(emb, ["
            + ", ".join(repr(float(x))
                        for x in pl[:, b * _EMB_SLOT_CAP + p])
            + f"]) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(_EMB_MAX_PLANES))
        keys.append(f"({bits}) AS k{b}")
    key_cols = ",\n         ".join(keys)
    band_union = "\nUNION ALL\n".join(
        f"SELECT vec_id, {b} AS band, k{b} AS bucket FROM keyed"
        for b in range(_EMB_BANDS))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
pn AS (SELECT greatest({_EMB_PLANES},
                       CAST(ceil(log2(greatest(2.0, count(*) / 16.0)))
                            AS INTEGER)) AS planes
       FROM embeddings),
keyed AS (
  SELECT vec_id, emb,
         {key_cols}
  FROM e CROSS JOIN pn),
bands AS ({band_union}),
ok_buckets AS (
  SELECT band, bucket FROM bands GROUP BY band, bucket
  HAVING count(DISTINCT vec_id) <= {_BUCKET_CAP}),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
               AND x.vec_id < y.vec_id
  JOIN ok_buckets ob ON ob.band = x.band AND ob.bucket = x.bucket),
verified AS (
  SELECT c.vec_a, c.vec_b,
         list_cosine_similarity(ea.emb, eb.emb) AS s
  FROM cand c
  JOIN e ea ON ea.vec_id = c.vec_a
  JOIN e eb ON eb.vec_id = c.vec_b)
SELECT vec_a, vec_b, round(s, 4) AS cosine
FROM verified
WHERE s >= {threshold}
  AND (SELECT planes FROM pn) <= {_EMB_MAX_PLANES}
"""


def _simhash_oracle_sql() -> str:
    from .common import sql_hex64

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents),
th AS (SELECT doc_id, {sql_hex64('tok')} AS h FROM toks),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN range(0, 64) t(b)
  GROUP BY doc_id, b),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::HUGEINT << b)
                  ELSE 0::HUGEINT END) AS simv
  FROM bits GROUP BY doc_id)
SELECT doc_id,
       lpad(lower(to_hex(simv)), 16, '0') AS simhash,
       CAST(simv >> 48 AS BIGINT) AS bucket
FROM sim
"""


def _ngram_jaccard_oracle_sql(threshold: float = 0.6) -> str:
    """Inverted-index n-gram blocking + exact Jaccard verify in SQL:
    same gram hashes (md5-derived, sql_hex64), same df cap, so the
    candidate sets match the engine's exactly."""
    return f"""
WITH {_gram_hash_ctes('documents')},
inc AS (SELECT doc_id, CAST(unnest(h) AS VARCHAR) AS gram FROM hs),
ok AS (SELECT gram FROM inc GROUP BY gram
       HAVING count(*) <= {_GRAM_DF_CAP}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM inc x
  JOIN inc y ON x.gram = y.gram AND x.doc_id < y.doc_id
  JOIN ok ON ok.gram = x.gram),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(ha.h, hb.h)) AS DOUBLE)
           / greatest(1, len(ha.h) + len(hb.h)
                         - len(list_intersect(ha.h, hb.h))) AS j
  FROM cand c
  JOIN hs ha ON ha.doc_id = c.doc_a
  JOIN hs hb ON hb.doc_id = c.doc_b)
SELECT doc_a, doc_b, round(j, 4) AS jaccard
FROM verified WHERE j >= {threshold}
"""


ORACLE_SQL = {
    "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
    "dedup_rate": """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS dup_rate
FROM documents GROUP BY source, lang
""",
    "incremental_dedup": """
SELECT doc_id,
       CAST(CASE WHEN text IN (SELECT text FROM documents
                               WHERE doc_id % 2 = 0)
            THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM documents WHERE doc_id % 2 = 1
""",
    "dup_spans": _DUP_SPANS_SQL,
    "boilerplate": _BOILERPLATE_SQL,
    "simhash": _simhash_oracle_sql(),
    "minhash_pairs": _minhash_oracle_sql(),
    "embedding_neardup": _embedding_neardup_oracle_sql(),
    "ngram_jaccard": _ngram_jaccard_oracle_sql(),
}


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _band_rows_fn(id_type: pa.DataType):
    def minhash_band_rows(t: pa.Table) -> pa.Table:
        """doc batch -> (band, bucket, doc_id) rows (LSH banding).

        Fully batched: ONE flat shingle pass for the whole batch, the
        64-perm signature matrix computed as 64 multiply-add +
        ``minimum.reduceat`` passes over the flat hash array (Python
        loop is over permutations, never docs), and bucket keys as a
        vectorized uint64 band combine — zero per-doc Python work."""
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], id_type),
                             "band": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64())})
        H, offsets = _batch_shingle_hashes(t.column("text").to_pylist())
        sig = np.empty((_N_PERM, n), np.uint64)
        with np.errstate(over="ignore"):
            for p in range(_N_PERM):
                sig[p] = np.minimum.reduceat(
                    H * _PERM_A[p] + _PERM_B[p], offsets)
            buckets = np.zeros((_BANDS, n), np.uint64)
            for b in range(_BANDS):
                acc = np.zeros(n, np.uint64)
                for r in range(_ROWS_PER_BAND):
                    acc = acc + sig[b * _ROWS_PER_BAND + r] * _BUCKET_C[r]
                buckets[b] = acc
        ids = pc.take(t.column("doc_id"),
                      pa.array(np.repeat(np.arange(n, dtype=np.int64),
                                         _BANDS)))
        # int64 two's-complement view: equality-preserving, and Ray's
        # hash aggregate handles int64 natively where uint64 values past
        # 2^63 fall back to pickled Python objects
        return pa.table({
            "doc_id": pc.cast(ids, id_type),
            "band": pa.array(np.tile(np.arange(_BANDS, dtype=np.int32), n)),
            "bucket": pa.array(buckets.T.reshape(-1).view(np.int64)),
        })
    return minhash_band_rows


def candidate_pairs_over(docs: rd.Dataset,
                         id_type: pa.DataType = pa.int64()) -> rd.Dataset:
    """LSH candidate pairs over any (doc_id, text) dataset: same
    (band, bucket) -> pair rows, deduped. ``id_type`` pins the doc_id
    dtype through the group/pair stages (int64 for the driver tables,
    string for crawl-derived corpora)."""
    from ray.data.aggregate import Count

    from .common import drop_empty_blocks

    band_rows = drop_empty_blocks(
        docs.map_batches(_band_rows_fn(id_type), batch_format="pyarrow",
                         zero_copy_batch=True))

    # nearly every bucket is a singleton (no pair can come out of it),
    # and map_groups pays a Python dispatch PER GROUP — so filter to
    # multi-occupancy buckets first with a vectorized Count aggregate +
    # hash join (at sf0.1: 76,520 buckets -> 3,337 survivors, 23x fewer
    # group dispatches). A doc emits one row per band, so the row count
    # equals the oracle's count(DISTINCT doc_id). The bucket CAP stays
    # inside pairs() so overflow buckets are still dropped loudly.
    def pin_keys(t: pa.Table) -> pa.Table:
        # the aggregate upcasts the int32 band key; re-pin both join keys
        return pa.table({"band": pc.cast(t.column("band"), pa.int32()),
                         "bucket": pc.cast(t.column("bucket"), pa.int64())})

    # materialize the (small) survivor key set ONCE so the count() below
    # and the take_all()/join consumer read pinned blocks instead of
    # re-executing the band-rows groupby a second time
    multi = drop_empty_blocks(
        band_rows.groupby(["band", "bucket"])
        .aggregate(Count(alias_name="n_docs"))
        .filter(expr="n_docs >= 2")
        .select_columns(["band", "bucket"])
        .map_batches(pin_keys, batch_format="pyarrow")).materialize()
    n_multi = multi.count()
    if n_multi == 0:   # no bucket collides anywhere -> no pairs
        return rd.from_arrow(pa.table({"doc_a": pa.array([], id_type),
                                       "doc_b": pa.array([], id_type)}))
    if n_multi <= _MULTI_BROADCAST_CAP:
        # the surviving key set is small (banded blocking collapses most
        # buckets to singletons): broadcast it once and membership-filter
        # the band rows in place of a full hash join — one barrier fewer,
        # and nothing re-partitions the wide band-rows exchange
        keys = frozenset((r["band"], r["bucket"]) for r in multi.take_all())
        keys_ref = ray.put(keys)

        def keep_multi(t: pa.Table) -> pa.Table:
            k = ray.get(keys_ref)
            mask = pa.array(
                [(b, u) in k for b, u in zip(t.column("band").to_pylist(),
                                             t.column("bucket").to_pylist())],
                pa.bool_())
            return t.filter(mask)

        band_rows = drop_empty_blocks(
            band_rows.map_batches(keep_multi, batch_format="pyarrow",
                                  zero_copy_batch=True))
    else:
        band_rows = drop_empty_blocks(
            band_rows.join(multi, join_type="inner", num_partitions=join_parts(),
                           on=("band", "bucket")))

    def pairs_batch(df) -> pa.Table:
        # segmented pair expansion vectorized over BUCKETS (the
        # cross_source_leakage shape — never one Python dispatch per
        # bucket): buckets sharing a size k expand together through one
        # (n_segments, k*(k-1)/2) broadcast. Degenerate buckets
        # (boilerplate hashing everything together) would go quadratic —
        # capped and dropped, loudly; the SQL oracle mirrors the cap
        # (HAVING count(*) <= cap). Arrow output with pinned id types:
        # schema-less empty blocks break downstream join unification.
        import sys

        empty = pa.table({"doc_a": pa.array([], id_type),
                          "doc_b": pa.array([], id_type)})
        if not len(df):
            return empty
        df = (df.drop_duplicates(["band", "bucket", "doc_id"])
              .sort_values(["band", "bucket", "doc_id"]))
        band = df["band"].to_numpy()
        bucket = df["bucket"].to_numpy()
        ids = df["doc_id"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(df)))
        n_over = int((sizes > _BUCKET_CAP).sum())
        if n_over:
            print(f"minhash: dropping {n_over} overflow buckets "
                  f"(> cap {_BUCKET_CAP})", file=sys.stderr)
        out_a, out_b = [], []
        for k in np.unique(sizes):
            if not 2 <= k <= _BUCKET_CAP:
                continue
            iu, ju = np.triu_indices(int(k), 1)
            seg = starts[sizes == k]
            out_a.append(ids[(seg[:, None] + iu[None, :]).ravel()])
            out_b.append(ids[(seg[:, None] + ju[None, :]).ravel()])
        if not out_a:
            return empty
        return pa.table({"doc_a": pa.array(np.concatenate(out_a), id_type),
                         "doc_b": pa.array(np.concatenate(out_b), id_type)})

    from .common import keyed_repartition

    cand = keyed_repartition(band_rows, ["band", "bucket"]).map_batches(
        pairs_batch, batch_format="pandas"
    )
    # a true near-dup pair surfaces from MANY of the 16 bands (matched
    # signatures collide band after band), so deduping here shrinks the
    # verify joins up to 16x; minhash candidate sets are small by
    # construction (banded high-similarity blocking), so the per-group
    # aggregate overhead stays negligible — unlike the embedding path,
    # whose dense candidate sets dedupe after the verify instead
    deduped = cand.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands"))

    def pin_schema(t: pa.Table) -> pa.Table:
        return pa.table({"doc_a": pc.cast(t.column("doc_a"), id_type),
                         "doc_b": pc.cast(t.column("doc_b"), id_type)})

    return drop_empty_blocks(
        deduped.map_batches(pin_schema, batch_format="pyarrow"))


def candidate_pairs(sf_dir: str) -> rd.Dataset:
    return candidate_pairs_over(_t(sf_dir, "documents", ["doc_id", "text"]))


class _JaccardVerify:
    """Actor-pool Jaccard verifier, fully vectorized per batch.

    A document participates in many candidate pairs, so the batch's
    UNIQUE docs are shingled once (one ``_batch_shingle_hashes`` pass),
    deduped to hash SETS with one lexsort, and every pair's
    intersection is counted in one more pair-tagged lexsort (a hash
    appearing twice under one pair tag is a common element — shingle
    sets are per-doc unique by construction). No Python loop over
    pairs; replaces the old per-pair frozenset intersection (and its
    per-actor cache — the unique-doc pass makes it redundant)."""

    def __init__(self, threshold: float, id_type: pa.DataType):
        self.threshold = threshold
        self.id_type = id_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], self.id_type),
                          "doc_b": pa.array([], self.id_type),
                          "jaccard": pa.array([], pa.float64())})
        n_pairs = batch.num_rows
        if n_pairs == 0:
            return empty
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        keys: dict[object, int] = {}
        texts: list[str] = []
        for k_, t_ in zip(a + b, ta + tb):
            if k_ not in keys:
                keys[k_] = len(texts)
                texts.append(t_)
        flat, off = _batch_shingle_hashes(texts)
        m = len(texts)
        hu, du = _per_doc_unique(flat, off)
        sizes = np.bincount(du, minlength=m)
        starts = np.concatenate(([0], np.cumsum(sizes)))
        ai = np.fromiter((keys[x] for x in a), np.int64, n_pairs)
        bi = np.fromiter((keys[x] for x in b), np.int64, n_pairs)
        la, lb = sizes[ai], sizes[bi]
        # gather each pair's two hash sets into one flat run
        seg_starts = np.empty(2 * n_pairs, np.int64)
        seg_starts[0::2], seg_starts[1::2] = starts[ai], starts[bi]
        seg_lens = np.empty(2 * n_pairs, np.int64)
        seg_lens[0::2], seg_lens[1::2] = la, lb
        seg_off = np.concatenate(([0], np.cumsum(seg_lens)))
        total = int(seg_off[-1])
        idx = (np.repeat(seg_starts, seg_lens)
               + (np.arange(total) - np.repeat(seg_off[:-1], seg_lens)))
        vals = hu[idx]
        ptag = np.repeat(np.arange(n_pairs), la + lb)
        o2 = np.lexsort((vals, ptag))
        vs, ps = vals[o2], ptag[o2]
        dup = (vs[1:] == vs[:-1]) & (ps[1:] == ps[:-1])
        inter = np.bincount(ps[1:][dup], minlength=n_pairs)
        j = inter / np.maximum(1, la + lb - inter)
        keep = j >= self.threshold
        mask = pa.array(keep)
        return pa.table({
            "doc_a": pc.cast(batch.column("doc_a").filter(mask),
                             self.id_type),
            "doc_b": pc.cast(batch.column("doc_b").filter(mask),
                             self.id_type),
            "jaccard": pa.array(round_half_away(j[keep]), pa.float64())})


def jaccard_verify_pairs(cand: rd.Dataset, docs: rd.Dataset,
                         threshold: float,
                         id_type: pa.DataType = pa.int64(),
                         assume_unique: bool = True) -> rd.Dataset:
    """Exact 3-gram-Jaccard verification of candidate (doc_a, doc_b)
    pairs: the distinct participating doc ids (bounded by the candidate
    count) are broadcast once and the corpus is REDUCED with a
    shuffle-free membership map before texts meet pairs — so the stage
    truly scales with the candidate count, not the corpus (an un-reduced
    inner join would still hash-partition all 100 TB of docs twice).
    When the reduced doc side fits the broadcast byte bound, the texts
    themselves ship once via ray.put and the verify is a single
    stateless map over the pairs (no joins at all); past the bound the
    two distributed hash joins pull texts to the pairs. Past the
    candidate-count bound the reduction is skipped — with that many
    candidates the joins are corpus-sized anyway. *cand* must be
    empty-block-scrubbed (``candidate_pairs_over`` output shape). With
    ``assume_unique=False`` duplicate candidate rows are tolerated and
    collapsed AFTER the verify — the surviving set is orders smaller
    than the candidate set, so deduping there avoids a full pre-verify
    pair shuffle."""

    def rename(suffix: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({f"doc_{suffix}": t.column("doc_id"),
                             f"text_{suffix}": t.column("text")})
        return f

    from .common import drop_empty_blocks

    # a corpus with no candidate collisions at all yields a block-less
    # dataset that the join operator can't take a schema from (cand is
    # already materialized by the scrub, so this count is metadata-only)
    n_cand = cand.count()
    if n_cand == 0:
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], id_type),
            "doc_b": pa.array([], id_type),
            "jaccard": pa.array([], pa.float64())}))
    inline_docs = None
    if n_cand <= _VERIFY_BROADCAST_CAP:
        wanted: set = set()
        for r in cand.take_all():
            wanted.add(r["doc_a"])
            wanted.add(r["doc_b"])
        wanted_ref = ray.put(frozenset(wanted))

        def member(t: pa.Table) -> pa.Table:
            w = ray.get(wanted_ref)
            mask = pa.array([x in w for x in
                             t.column("doc_id").to_pylist()], pa.bool_())
            return t.filter(mask)

        docs = drop_empty_blocks(
            docs.map_batches(member, batch_format="pyarrow",
                             zero_copy_batch=True))
        if docs.size_bytes() <= _VERIFY_INLINE_BYTES:
            inline_docs = docs

    if inline_docs is not None:
        # small participating-doc side: broadcast the texts once and
        # verify every pair in a single stateless map — no hash joins,
        # no actor pool, zero shuffles (the 100 TB case with a dense
        # candidate set falls through to the join path below)
        texts_ref = ray.put({r["doc_id"]: r["text"]
                             for r in inline_docs.take_all()})

        def verify_inline(batch: pa.Table) -> pa.Table:
            texts = ray.get(texts_ref)
            shingles: dict[object, frozenset] = {}

            def sh(key):
                s = shingles.get(key)
                if s is None:
                    txt = texts.get(key)
                    # pair references a doc_id absent from docs: the
                    # join path drops such pairs silently (inner join),
                    # so mirror that here instead of raising KeyError
                    if txt is None:
                        return None
                    s = frozenset(_shingle_hashes(txt).tolist())
                    shingles[key] = s
                return s

            keep_a, keep_b, jac = [], [], []
            for a, b in zip(batch.column("doc_a").to_pylist(),
                            batch.column("doc_b").to_pylist()):
                sa, sb = sh(a), sh(b)
                if sa is None or sb is None:
                    continue
                inter = len(sa & sb)
                j = inter / max(1, len(sa) + len(sb) - inter)
                if j >= threshold:
                    keep_a.append(a)
                    keep_b.append(b)
                    jac.append(float(round_half_away(j)))
            return pa.table({"doc_a": pa.array(keep_a, id_type),
                             "doc_b": pa.array(keep_b, id_type),
                             "jaccard": pa.array(jac, pa.float64())})

        out = cand.map_batches(verify_inline, batch_format="pyarrow",
                               zero_copy_batch=True)
    else:
        # each join's empty hash partitions emit schema-less blocks that
        # the next join rejects — scrub between stages
        with_a = drop_empty_blocks(
            cand.join(docs.map_batches(rename("a"), batch_format="pyarrow"),
                      join_type="inner", num_partitions=join_parts(), on=("doc_a",)))
        with_ab = drop_empty_blocks(
            with_a.join(docs.map_batches(rename("b"), batch_format="pyarrow"),
                        join_type="inner", num_partitions=join_parts(), on=("doc_b",)))

        out = with_ab.map_batches(
            _JaccardVerify, batch_format="pyarrow", concurrency=(1, 8),
            fn_constructor_kwargs={"threshold": threshold,
                                   "id_type": id_type})
    if not assume_unique:
        from ray.data.aggregate import Max

        # duplicate candidates carry identical jaccard values, so any
        # per-pair aggregate reproduces the value exactly
        out = out.groupby(["doc_a", "doc_b"]).aggregate(
            Max("jaccard", alias_name="jaccard"))

        def pin(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_a": pc.cast(t.column("doc_a"), id_type),
                "doc_b": pc.cast(t.column("doc_b"), id_type),
                "jaccard": pc.cast(t.column("jaccard"), pa.float64())})

        out = drop_empty_blocks(out.map_batches(pin, batch_format="pyarrow"))
    return out


def minhash_pairs_over(docs: rd.Dataset, threshold: float = 0.6,
                       id_type: pa.DataType = pa.int64()) -> rd.Dataset:
    """Near-duplicate pairs over any (doc_id, text) dataset: LSH
    candidates verified by exact 3-gram Jaccard >= *threshold*."""
    return jaccard_verify_pairs(candidate_pairs_over(docs, id_type),
                                docs, threshold, id_type)


_PAIR_CACHE: dict[tuple[str, float], rd.Dataset] = {}


def q_minhash_pairs(sf_dir: str, threshold: float = 0.6) -> rd.Dataset:
    """Verified near-dup pairs of the tier's documents table, derived
    once per process and shared by every consumer (the pair list is a
    pure function of the corpus — q_neardup_clusters would otherwise
    repay the full shingle->LSH->verify pipeline; same per-tier cache
    discipline as graph._cached_link_edges). Materialized so downstream
    joins reuse the object-store blocks; Datasets are immutable, so
    handing the same one to multiple consumers is safe."""
    import os

    # full normalized path, not basename: two corpora in different parent
    # dirs with the same tier name must not share one pair set
    key = (os.path.normpath(os.path.abspath(sf_dir)), threshold)
    if key not in _PAIR_CACHE:
        _PAIR_CACHE[key] = minhash_pairs_over(
            _t(sf_dir, "documents", ["doc_id", "text"]),
            threshold).materialize()
    return _PAIR_CACHE[key]


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted-index blocking, exact recall up to a
# document-frequency cap)
# ---------------------------------------------------------------------------

# i<j index templates for in-block posting-list pair expansion, keyed
# by run length (df is capped at _GRAM_DF_CAP so there are at most 31)
_PAIR_TEMPLATES: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _pair_template(d: int) -> tuple[np.ndarray, np.ndarray]:
    tpl = _PAIR_TEMPLATES.get(d)
    if tpl is None:
        tpl = _PAIR_TEMPLATES[d] = np.triu_indices(d, k=1)
    return tpl


def gram_profile_over(docs: rd.Dataset) -> dict:
    """Shared front half of the gram-blocked pair queries
    (``q_ngram_jaccard``, ``q_containment_pairs``): the per-pair
    shared-rare-gram counts plus per-doc gram totals, built with ONE
    wide exchange over the incidence table.

    Earlier rounds ran this as df-groupby -> anti-join -> self-join on
    gram -> pair groupby (~5 all-to-alls, twice — once per query);
    measured 61 s + 41 s at sf0.1 on ~240k incidence rows, i.e. pure
    exchange machinery, not compute. Now: one ``keyed_repartition`` on
    the gram hash co-locates each posting list whole, so document
    frequency is BLOCK-LOCAL (run length after an in-block sort), the
    df > ``_GRAM_DF_CAP`` drop is a vectorized filter, and the
    candidate pairs are emitted by numpy index templates over each
    rare run (<= C(32,2) = 496 pairs per gram, the bounded-bucket
    discipline) with in-block partial counts — the only other
    exchanges are the (doc_a, doc_b) partial-count sum and the tiny
    per-doc meta rollup, BOTH themselves keyed repartitions with
    block-local Arrow aggregates (ray groupby's sort shuffle measured
    15.5 s on the 1.25M-row pair table; the keyed block sum 0.34 s).
    Same candidates, same counts, same SQL oracles as before; 100 TB
    shape: everything is hash-partitioned by gram or pair key, nothing
    driver-sized.

    Returns ``{"pairs": (doc_a < doc_b, shared) Dataset,
    "docmeta": (doc_id, n_grams, n_rare) Dataset}``, both
    materialized. ``n_grams`` counts ALL distinct grams of the doc
    (computed at incidence time — batches hold whole docs), ``n_rare``
    only those with df <= cap; docs with zero rare grams cannot appear
    in any pair and are absent from docmeta."""
    from .common import drop_empty_blocks, keyed_repartition

    def incidence(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64())})
        flat, off = _batch_shingle_hashes(texts)
        hu, du = _per_doc_unique(flat, off)
        ng = np.bincount(du, minlength=t.num_rows)
        return pa.table({
            "doc_id": pc.take(t.column("doc_id"),
                              pa.array(du, pa.int64())),
            # int64 bit-view of the uint64 gram hash — identity-equal
            # to the decimal-string key the SQL oracles recompute
            "gram": pa.array(hu.view(np.int64)),
            "n_grams": pa.array(ng[du].astype(np.int64))})

    inc = drop_empty_blocks(
        docs.map_batches(incidence, batch_format="pyarrow",
                         zero_copy_batch=True))
    keyed = keyed_repartition(inc, ["gram"]).materialize()

    def _sorted_runs(t: pa.Table):
        """Block sorted by (gram, doc_id) + run starts/lengths — df per
        gram is global because the repartition co-located each gram."""
        tt = t.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        g = tt.column("gram").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])))
        lens = np.diff(np.concatenate((starts, [len(g)])))
        return tt, starts, lens

    def pair_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "part": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        tt, starts, lens = _sorted_runs(t)
        d = tt.column("doc_id").to_numpy(zero_copy_only=False)
        a_parts, b_parts = [], []
        for dlen in np.unique(lens):
            if dlen < 2 or dlen > _GRAM_DF_CAP:
                continue
            S = starts[lens == dlen]
            ti, tj = _pair_template(int(dlen))
            # doc ids ascend within a run (sort above) and each doc
            # holds a gram at most once (per-doc unique upstream), so
            # i<j gives doc_a < doc_b directly, no self pairs
            a_parts.append(d[(S[:, None] + ti[None, :]).ravel()])
            b_parts.append(d[(S[:, None] + tj[None, :]).ravel()])
        if not a_parts:
            return empty
        tbl = pa.table({"doc_a": pa.array(np.concatenate(a_parts)),
                        "doc_b": pa.array(np.concatenate(b_parts))})
        part = tbl.group_by(["doc_a", "doc_b"]).aggregate(
            [([], "count_all")])
        return pa.table({"doc_a": part.column("doc_a"),
                         "doc_b": part.column("doc_b"),
                         "part": pc.cast(part.column("count_all"),
                                         pa.int64())})

    def pair_block_sum(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_a", "doc_b"]).aggregate([("part", "sum")])
        return pa.table({"doc_a": g.column("doc_a"),
                         "doc_b": g.column("doc_b"),
                         "shared": pc.cast(g.column("part_sum"),
                                           pa.int64())})

    pairs = keyed_repartition(
        keyed.map_batches(pair_partials, batch_format="pyarrow",
                          batch_size=None),
        ["doc_a", "doc_b"]).map_batches(
            pair_block_sum, batch_format="pyarrow",
            batch_size=None).materialize()

    def doc_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "rare_part": pa.array([], pa.int64())})
        tt, starts, lens = _sorted_runs(t)
        rare = tt.filter(pa.array(
            np.repeat(lens <= _GRAM_DF_CAP, lens)))
        part = (rare.select(["doc_id", "n_grams"])
                .group_by(["doc_id", "n_grams"])
                .aggregate([([], "count_all")]))
        return pa.table({"doc_id": part.column("doc_id"),
                         "n_grams": part.column("n_grams"),
                         "rare_part": pc.cast(part.column("count_all"),
                                              pa.int64())})

    def doc_block_sum(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("n_grams", "max"),
                                            ("rare_part", "sum")])
        return pa.table({"doc_id": g.column("doc_id"),
                         "n_grams": pc.cast(g.column("n_grams_max"),
                                            pa.int64()),
                         "n_rare": pc.cast(g.column("rare_part_sum"),
                                           pa.int64())})

    docmeta = keyed_repartition(
        keyed.map_batches(doc_partials, batch_format="pyarrow",
                          batch_size=None),
        ["doc_id"]).map_batches(
            doc_block_sum, batch_format="pyarrow",
            batch_size=None).materialize()

    return {"pairs": pairs, "docmeta": docmeta}


def _attach_gram_meta(pairs: rd.Dataset, docmeta: rd.Dataset) -> rd.Dataset:
    """Attach per-doc gram counts to both sides of the pair table:
    (doc_a, doc_b, shared) -> + (n_a, n_b, nf_a, nf_b). Under
    ``_MULTI_BROADCAST_CAP`` docmeta rows the lookup ships ONCE via
    ``ray.put`` and the attach is a stateless vectorized map (zero
    exchanges — the dims-lookup pattern); past the cap it falls back to
    two distributed hash joins, the 100 TB path."""
    from .common import drop_empty_blocks, join_parts

    if docmeta.count() <= _MULTI_BROADCAST_CAP:
        rows = docmeta.take_all()
        meta_ref = ray.put({int(r["doc_id"]): (int(r["n_grams"]),
                                               int(r["n_rare"]))
                            for r in rows})

        def attach(t: pa.Table) -> pa.Table:
            m = ray.get(meta_ref)
            a = t.column("doc_a").to_numpy(zero_copy_only=False)
            b = t.column("doc_b").to_numpy(zero_copy_only=False)
            # every pair doc has >=1 rare gram by construction, so the
            # lookups cannot miss
            na, nra = zip(*(m[int(x)] for x in a)) if len(a) else ((), ())
            nb, nrb = zip(*(m[int(x)] for x in b)) if len(b) else ((), ())
            na = np.asarray(na, np.int64)
            nb = np.asarray(nb, np.int64)
            nra = np.asarray(nra, np.int64)
            nrb = np.asarray(nrb, np.int64)
            return pa.table({
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "shared": pc.cast(t.column("shared"), pa.int64()),
                "n_a": pa.array(na), "n_b": pa.array(nb),
                "nf_a": pa.array(na - nra), "nf_b": pa.array(nb - nrb)})

        return pairs.map_batches(attach, batch_format="pyarrow")

    def meta_as(side: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                f"doc_{side}": pc.cast(t.column("doc_id"), pa.int64()),
                f"n_{side}": pc.cast(t.column("n_grams"), pa.int64()),
                f"nf_{side}": pc.cast(pc.subtract(t.column("n_grams"),
                                                  t.column("n_rare")),
                                      pa.int64())})
        return f

    with_meta_a = drop_empty_blocks(
        pairs.map_batches(
            lambda t: pa.table({
                "doc_a": pc.cast(t.column("doc_a"), pa.int64()),
                "doc_b": pc.cast(t.column("doc_b"), pa.int64()),
                "shared": pc.cast(t.column("shared"), pa.int64())}),
            batch_format="pyarrow")
        .join(docmeta.map_batches(meta_as("a"), batch_format="pyarrow"),
              join_type="inner", num_partitions=join_parts(), on=("doc_a",)))
    return drop_empty_blocks(
        with_meta_a
        .join(docmeta.map_batches(meta_as("b"), batch_format="pyarrow"),
              join_type="inner", num_partitions=join_parts(), on=("doc_b",)))


_GRAM_CACHE: dict[str, dict] = {}


def _gram_profile(sf_dir: str) -> dict:
    """Per-tier cache of ``gram_profile_over`` — the profile is a pure
    function of the corpus and both gram-blocked queries consume it, so
    it is built once per process (same discipline as ``_PAIR_CACHE``)."""
    import os

    key = os.path.normpath(os.path.abspath(sf_dir))
    if key not in _GRAM_CACHE:
        _GRAM_CACHE[key] = gram_profile_over(
            _t(sf_dir, "documents", ["doc_id", "text"]))
    return _GRAM_CACHE[key]


def q_ngram_jaccard(sf_dir: str, threshold: float = 0.6) -> rd.Dataset:
    """Near-dup pairs via a distributed 3-gram inverted index.

    Complements minhash_pairs: instead of probabilistic LSH blocking,
    every pair sharing at least one *rare* 3-gram becomes a candidate —
    exact recall for pairs sharing any gram with document frequency
    <= cap. Stopword-like grams (df > cap) are dropped loudly, the same
    bounded-bucket discipline as the LSH buckets: a boilerplate gram
    shared by half the corpus would otherwise go quadratic.

    The candidate stage is join-shaped, not map_groups-shaped: at sf0.1
    the index holds ~10^5 DISTINCT grams and Ray's per-group Python
    dispatch makes a map_groups over them orders slower than the
    vectorized hash self-join on the same key (the embedding path's
    measured tiny-group lesson).

    The VERIFY is count-based, not text-based: the capped self-join
    already yields |A∩B| over rare grams as a per-pair row count, and a
    per-doc distinct-gram Count gives |A| and |B| — so jaccard falls
    out of two small int-only joins instead of shipping full document
    texts through two hash shuffles (the text-join verify measured 95s
    of a 127s sf0.1 wall; this form runs ~78s, now dominated by the
    single irreducible per-pair count exchange). Exactness: rare-shared
    equals all-shared whenever EITHER doc holds zero frequent (df > cap)
    grams; the rare
    pairs where both sides touch a frequent gram are routed through the
    exact text-verify slow path, which is bounded by the boilerplate
    footprint, not the corpus. Ladder: ``_gram_profile`` (ONE gram-keyed
    exchange + in-block pair expansion, cached and shared with
    ``q_containment_pairs``) -> per-doc meta attach (broadcast under
    ``_MULTI_BROADCAST_CAP``, hash joins past it) -> vectorized jaccard
    (+ text verify for the frequent-touched remainder); nothing
    touches the driver beyond the cap-guarded meta table."""
    from .common import drop_empty_blocks

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    profile = _gram_profile(sf_dir)
    pairs, docmeta = profile["pairs"], profile["docmeta"]

    def _empty() -> rd.Dataset:
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))

    # pathological corpus where every gram is frequent, or no two docs
    # share a rare gram (both materialized — metadata-only counts)
    if pairs.count() == 0:
        return _empty()

    with_meta = _attach_gram_meta(pairs, docmeta)

    def fast(t: pa.Table) -> pa.Table:
        # exact when either side has no frequent grams: shared rare ==
        # shared all, so J = shared / (|A| + |B| - shared)
        ok = pc.or_(pc.equal(t.column("nf_a"), 0),
                    pc.equal(t.column("nf_b"), 0))
        f = t.filter(ok)
        shared = f.column("shared").to_numpy(zero_copy_only=False)
        na = f.column("n_a").to_numpy(zero_copy_only=False)
        nb = f.column("n_b").to_numpy(zero_copy_only=False)
        j = shared / np.maximum(1, na + nb - shared)
        keep = j >= threshold
        return pa.table({
            "doc_a": pa.array(
                f.column("doc_a").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "doc_b": pa.array(
                f.column("doc_b").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "jaccard": pa.array(round_half_away(j[keep]), pa.float64())})

    def needs_text(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.not_equal(t.column("nf_a"), 0),
                    pc.not_equal(t.column("nf_b"), 0))
        f = t.filter(m)
        return pa.table({"doc_a": pc.cast(f.column("doc_a"), pa.int64()),
                         "doc_b": pc.cast(f.column("doc_b"), pa.int64())})

    fast_pairs = drop_empty_blocks(
        with_meta.map_batches(fast, batch_format="pyarrow"))
    slow_cand = drop_empty_blocks(
        with_meta.map_batches(needs_text, batch_format="pyarrow"))
    slow_pairs = jaccard_verify_pairs(slow_cand, docs, threshold)
    return fast_pairs.union(slow_pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimHasher:
    """Actor-pool SimHash: one vectorized pass per doc-chunk.

    Tokens are md5-hashed once per UNIQUE token with a per-actor cache
    (the vocab repeats heavily across docs and batches); all unique
    token hashes unpack to their 64 bit-columns in one
    ``np.unpackbits``, and the per-doc ±1 bit sums reduce over
    doc-sorted runs with one ``np.add.reduceat`` per chunk. Replaces
    ~64 numpy ops PER TOKEN (plus an md5 per token occurrence) with
    three array ops per 2048-doc chunk. Chunking bounds the gathered
    (pairs × 64) bit matrix to ~tens of MB regardless of block size."""

    _CACHE_MAX = 1 << 21
    _CHUNK = 2048

    def __init__(self):
        self.cache: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = len(texts)
        sims = np.zeros(n, np.uint64)
        cache = self.cache
        for lo in range(0, n, self._CHUNK):
            chunk = texts[lo:lo + self._CHUNK]
            counts = np.empty(len(chunk), np.int64)
            tok_ids: list[int] = []     # per (doc, unique-token) pair
            uniq: dict[str, int] = {}
            hvals: list[int] = []
            for i, text in enumerate(chunk):
                s = set(text.split(" "))
                counts[i] = len(s)      # >= 1: "".split(" ") == [""]
                for tok in s:
                    k = uniq.get(tok)
                    if k is None:
                        k = len(hvals)
                        uniq[tok] = k
                        h = cache.get(tok)
                        if h is None:
                            if len(cache) > self._CACHE_MAX:
                                cache.clear()
                            h = int.from_bytes(
                                hashlib.md5(tok.encode()).digest()[:8],
                                "big")
                            cache[tok] = h
                        hvals.append(h)
                    tok_ids.append(k)
            H = np.array(hvals, dtype=np.uint64)
            # (U, 64) bit matrix; little-endian view + bitorder="little"
            # makes column k exactly (h >> k) & 1
            B = np.unpackbits(H[:, None].view(np.uint8), axis=1,
                              bitorder="little")
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            ones = np.add.reduceat(
                B[np.asarray(tok_ids, np.int64)].astype(np.int32),
                starts, axis=0)
            acc = 2 * ones - counts[:, None]    # ones - zeros
            sims[lo:lo + len(chunk)] = (
                (acc > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "simhash": pa.array([format(int(s), "016x") for s in sims],
                                pa.string()),
            "bucket": pa.array((sims >> np.uint64(48)).astype(np.int64),
                               pa.int64())})


def q_simhash(sf_dir: str) -> rd.Dataset:
    """64-bit SimHash per document + 16-bit prefix bucket (near-dup
    blocking key). Pure map — no shuffle. Token hashes are the first 64
    bits of md5 so the DuckDB oracle recomputes them (common.sql_hex64);
    the kernel itself is the vectorized ``_SimHasher`` actor pool (the
    token-hash cache is per-actor state, init-once)."""
    import ray

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    return ds.map_batches(_SimHasher, concurrency=(1, max(4, cpus // 2)),
                          batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Embedding near-dup (random hyperplane LSH + cosine verify)
# ---------------------------------------------------------------------------

def q_embedding_neardup(sf_dir: str, threshold: float = 0.3) -> rd.Dataset:
    """Near-dup vector pairs: banded sign-LSH buckets with the vectors
    riding along, exact cosine verified INSIDE each bucket group.

    8 bands x >=6 planes: a pair is a candidate when it shares a bucket
    in ANY band (multi-probe recall); buckets above the cap are dropped
    loudly (no quadratic blowup on a degenerate bucket). Each band row
    carries its packed-float32 vector, so the (band, bucket) groupby is
    the ONLY shuffle — the verify is a vectorized in-group einsum over
    at most cap vectors, replacing the earlier candidate-pair + two
    hash-joins-back-to-embeddings topology (measured 2x at sf0.1: the
    joins moved every vector twice more). The shuffle grows by
    bands x vec bytes, which is the classic LSH-dedup trade: one wide
    exchange instead of three."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    n_vecs = ds.count()                      # metadata-only for parquet
    n_planes = _emb_planes_for(n_vecs)
    planes_ref = ray.put(_emb_planes(dim, n_planes))
    w = 1 << np.arange(n_planes, dtype=np.int64)
    # part count sized to the QUADRATIC verify (pairs per row, not rows):
    # ~2k band rows per part keeps every core busy on the einsum
    cpus = max(8, int(ray.cluster_resources().get("CPU", 8)))
    n_parts = min(cpus, max(2, (n_vecs * _EMB_BANDS) // 2048))

    def band_rows(t: pa.Table) -> pa.Table:
        from .common import embs_to_numpy

        pl = ray.get(planes_ref)
        embs = embs_to_numpy(t.column("embedding"))
        signs = (embs @ pl) > 0                      # (n, bands*planes)
        ids = t.column("vec_id")
        n = t.num_rows
        keys = np.concatenate([
            signs[:, b * n_planes:(b + 1) * n_planes] @ w
            for b in range(_EMB_BANDS)
        ])
        ids_np = ids.to_numpy()
        # float32 row bytes (lossless: the source column is float32);
        # list-repeat matches the band-major np.tile/np.repeat layout
        blob = [r.tobytes() for r in embs.astype(np.float32)]
        bands = np.repeat(np.arange(_EMB_BANDS), n).astype(np.int64)
        buckets = keys.astype(np.int64)
        # coarse co-location key: a (band, bucket) always lands whole in
        # one part, so the downstream groupby("part") hands the segmented
        # verify whole buckets — n_parts Python dispatches total through
        # the task-based sort shuffle (no per-query hash-shuffle
        # aggregator-actor startup, measured ~4 s cold at bench scale)
        part = ((buckets * 1000003) ^ bands) % n_parts
        return pa.table({
            "vec_id": pa.array(np.tile(ids_np, _EMB_BANDS).astype("int64")),
            "band": pa.array(bands.astype("int32")),
            "bucket": pa.array(buckets),
            "part": pa.array(part.astype("int64")),
            "emb": pa.array(blob * _EMB_BANDS, pa.binary()),
        })

    def verify_batch(t: pa.Table) -> pa.Table:
        # segmented in-bucket verify, vectorized over BUCKETS (the
        # candidate_pairs_over shape — never one Python dispatch per
        # (band, bucket) group): the keyed repartition co-located each
        # bucket's rows, one sort makes buckets contiguous runs with
        # ascending vec_id (vec_a < vec_b by construction), buckets
        # sharing a size expand together through one triu broadcast, and
        # ONE einsum scores every surviving pair in the batch. Per-row
        # normalization and the per-pair einsum are elementwise, so the
        # floats are bit-identical to the old per-group path and the SQL
        # oracle. Overflow buckets (> cap) are dropped loudly as before.
        import sys

        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        n = t.num_rows
        if n < 2:
            return empty
        t = t.sort_by([("band", "ascending"), ("bucket", "ascending"),
                       ("vec_id", "ascending")])
        band = t.column("band").to_numpy(zero_copy_only=False)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        n_over = int((sizes > _BUCKET_CAP).sum())
        if n_over:
            print(f"embedding_neardup: dropping {n_over} overflow "
                  f"buckets (> cap {_BUCKET_CAP})", file=sys.stderr)
        ia_parts, ib_parts = [], []
        for k in np.unique(sizes):
            if not 2 <= k <= _BUCKET_CAP:
                continue
            iu, ju = np.triu_indices(int(k), 1)
            seg = starts[sizes == k]
            ia_parts.append((seg[:, None] + iu[None, :]).ravel())
            ib_parts.append((seg[:, None] + ju[None, :]).ravel())
        if not ia_parts:
            return empty
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        blobs = t.column("emb").to_pylist()
        v = np.frombuffer(b"".join(blobs), dtype=np.float32).reshape(
            n, -1).astype(np.float64)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0] = 1.0
        vn = v / norms[:, None]
        # same einsum kernel as the former join-side verify — float
        # results are bit-identical to the SQL oracle's
        sims = np.einsum("ij,ij->i", vn[ia], vn[ib])
        keep = sims >= threshold
        return pa.table({
            "vec_a": pa.array(ids[ia[keep]]),
            "vec_b": pa.array(ids[ib[keep]]),
            "cosine": pa.array(round_half_away(sims[keep]), pa.float64()),
        })

    # coarse-part sort-shuffle (the stats.py shard-rank shape): the
    # groupby("part") co-locates whole buckets through the task-based
    # sort shuffle and hands the SEGMENTED verify one part at a time —
    # n_parts Python dispatches total, each a vectorized pass over many
    # buckets. This beat both the per-bucket map_groups (Python dispatch
    # per bucket at scale) and the hash-shuffle keyed repartition (~4 s
    # of per-query aggregator-actor startup at bench scale).
    verified = (
        ds.map_batches(band_rows, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(verify_batch, batch_format="pyarrow")
    )

    # a pair sharing buckets in k bands verifies to k identical rows —
    # dedupe with ONE keyed repartition + block-local Arrow max
    # (equivalent to groupby(...).aggregate(Max) — max is associative
    # and the repartition co-locates each pair — and 2.4x faster on the
    # threshold=-1 kNN path's 134k-row pair table: 0.74 s vs 1.79 s).
    # Deduping candidates PRE-verify measured 19 s for 138k tiny groups.
    from .common import drop_empty_blocks, keyed_repartition

    def block_max(t: pa.Table) -> pa.Table:
        g = t.group_by(["vec_a", "vec_b"]).aggregate([("cosine", "max")])
        return pa.table({"vec_a": g.column("vec_a"),
                         "vec_b": g.column("vec_b"),
                         "cosine": g.column("cosine_max")})

    return keyed_repartition(
        drop_empty_blocks(verified), ["vec_a", "vec_b"]).map_batches(
            block_max, batch_format="pyarrow", batch_size=None)


def q_dedup_funnel(sf_dir: str) -> rd.Dataset:
    """The dedup-ladder funnel — the curation dashboard's one-glance
    'where do the documents go' report: corpus size, distinct exact
    texts, verified near-dup pairs, docs touched by the near-dup graph,
    near-dup clusters, and the survivor count under the canonical
    keep-one-per-cluster rule (docs - near_docs + near_clusters). Every
    number is a distributed aggregate of an existing ladder stage (the
    verified pair set comes from the per-tier cache, components reuse
    the dual-plan union-find); only the six scalars reach the driver."""
    from .graph import connected_components

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    n_distinct = q_dedup_exact(sf_dir).count()
    pairs = q_minhash_pairs(sf_dir)
    n_pairs = pairs.count()
    comp = connected_components(pairs)
    n_near_docs = comp.count()
    n_clusters = comp.groupby("cluster_id").count().count()
    stages = [
        (1, "docs", n_docs),
        (2, "distinct_texts", n_distinct),
        (3, "near_pairs", n_pairs),
        (4, "near_docs", n_near_docs),
        (5, "near_clusters", n_clusters),
        (6, "survivors", n_docs - n_near_docs + n_clusters),
    ]
    return rd.from_arrow(pa.table({
        "stage_idx": pa.array([s[0] for s in stages], pa.int64()),
        "stage": pa.array([s[1] for s in stages], pa.string()),
        "n": pa.array([s[2] for s in stages], pa.int64())}))


def _funnel_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs),
reach(node, r) AS (
  SELECT u, v FROM edges
  UNION
  SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u),
clusters AS (
  SELECT node, least(node, min(r)) AS cluster_id FROM reach GROUP BY node),
m AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT count(DISTINCT md5(text)) FROM documents) AS n_distinct,
             (SELECT count(*) FROM pairs) AS n_pairs,
             (SELECT count(*) FROM clusters) AS n_near_docs,
             (SELECT count(DISTINCT cluster_id) FROM clusters) AS n_clusters)
SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage, CAST(n AS BIGINT) AS n
FROM (
  SELECT 1 AS stage_idx, 'docs' AS stage, n_docs AS n FROM m
  UNION ALL SELECT 2, 'distinct_texts', n_distinct FROM m
  UNION ALL SELECT 3, 'near_pairs', n_pairs FROM m
  UNION ALL SELECT 4, 'near_docs', n_near_docs FROM m
  UNION ALL SELECT 5, 'near_clusters', n_clusters FROM m
  UNION ALL SELECT 6, 'survivors', n_docs - n_near_docs + n_clusters FROM m)
"""


ORACLE_SQL["dedup_funnel"] = _funnel_sql()
ORACLE_SQL["winnow"] = _winnow_oracle_sql()
ORACLE_SQL["dedup_keep_best"] = _KEEP_BEST_SQL
ORACLE_SQL["dup_span_coverage"] = _DUP_SPAN_COVERAGE_SQL
ORACLE_SQL["dup_span_rewrite"] = _DUP_SPAN_REWRITE_SQL

QUERIES = {
    "dedup_funnel": q_dedup_funnel,
    "winnow": q_winnow,
    "dedup_keep_best": q_dedup_keep_best,
    "dup_span_coverage": q_dup_span_coverage,
    "dup_span_rewrite": q_dup_span_rewrite,
    "dedup_exact": q_dedup_exact,
    "dedup_rate": q_dedup_rate,
    "incremental_dedup": q_incremental_dedup,
    "dup_spans": q_dup_spans,
    "boilerplate": q_boilerplate,
    "minhash_pairs": q_minhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash": q_simhash,
    "embedding_neardup": q_embedding_neardup,
}


# ---------------------------------------------------------------------------
# containment_pairs (asymmetric near-dup: doc A's content inside doc B)
# ---------------------------------------------------------------------------

# containment threshold as an exact rational (3/4): the flag compare is
# integer cross-multiplication, so engine and oracle cannot ulp-diverge
_CONTAIN_NUM, _CONTAIN_DEN = 3, 4


def q_containment_pairs(sf_dir: str) -> rd.Dataset:
    """Asymmetric containment pairs (Broder's C(A,B) = |S(A)∩S(B)|/|S(A)|):
    docs whose distinctive content sits ≥ 3/4 inside another doc — the
    quote/superset/wrapper-page signal symmetric Jaccard misses when
    the container is much larger than the contained doc.

    Containment is measured over each doc's RARE 3-gram profile (df ≤
    ``_GRAM_DF_CAP``, the same loud cap as ``ngram_jaccard``): frequent
    boilerplate grams neither block nor count toward containment, which
    is both the scale guard (no quadratic stopword buckets) and the
    right semantics (shared boilerplate is not 'content contained').
    The SQL oracle applies the identical cap, so parity is exact.

    Integer-exact end-to-end: the flag is ``4*shared >= 3*n_rare`` and
    the output columns are int64 counts — no float ratio anywhere.
    Plan: ``_gram_profile`` (the cached gram-keyed exchange + in-block
    pair expansion shared with ``q_ngram_jaccard`` — running both
    queries pays for the front half ONCE) → per-side meta attach
    (broadcast under cap, joins past it) → vectorized both-direction
    flag map."""
    profile = _gram_profile(sf_dir)
    pairs, docmeta = profile["pairs"], profile["docmeta"]

    def _empty() -> rd.Dataset:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "container_id": pa.array([], pa.int64()),
            "shared": pa.array([], pa.int64()),
            "n_rare": pa.array([], pa.int64())}))

    if pairs.count() == 0:
        return _empty()

    with_meta = _attach_gram_meta(pairs, docmeta)

    def flag(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        sh = t.column("shared").to_numpy(zero_copy_only=False)
        # rare-gram profile size per side: n_rare = n_grams - n_freq
        na = (t.column("n_a").to_numpy(zero_copy_only=False)
              - t.column("nf_a").to_numpy(zero_copy_only=False))
        nb = (t.column("n_b").to_numpy(zero_copy_only=False)
              - t.column("nf_b").to_numpy(zero_copy_only=False))
        ka = _CONTAIN_DEN * sh >= _CONTAIN_NUM * na   # a contained in b
        kb = _CONTAIN_DEN * sh >= _CONTAIN_NUM * nb   # b contained in a
        return pa.table({
            "doc_id": pa.array(np.concatenate((a[ka], b[kb])), pa.int64()),
            "container_id": pa.array(np.concatenate((b[ka], a[kb])),
                                     pa.int64()),
            "shared": pa.array(np.concatenate((sh[ka], sh[kb])), pa.int64()),
            "n_rare": pa.array(np.concatenate((na[ka], nb[kb])), pa.int64()),
        })

    return with_meta.map_batches(flag, batch_format="pyarrow")


def _containment_oracle_sql() -> str:
    return f"""
WITH {_gram_hash_ctes('documents')},
inc AS (SELECT doc_id, CAST(unnest(h) AS VARCHAR) AS gram FROM hs),
ok AS (SELECT gram FROM inc GROUP BY gram
       HAVING count(*) <= {_GRAM_DF_CAP}),
rinc AS (SELECT i.doc_id, i.gram FROM inc i JOIN ok USING (gram)),
nr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rare
       FROM rinc GROUP BY doc_id),
sh AS (SELECT x.doc_id AS a, y.doc_id AS b,
              CAST(count(*) AS BIGINT) AS shared
       FROM rinc x JOIN rinc y ON x.gram = y.gram AND x.doc_id < y.doc_id
       GROUP BY x.doc_id, y.doc_id),
dirs AS (
  SELECT sh.a AS doc_id, sh.b AS container_id, sh.shared, nr.n_rare
  FROM sh JOIN nr ON nr.doc_id = sh.a
  UNION ALL
  SELECT sh.b AS doc_id, sh.a AS container_id, sh.shared, nr.n_rare
  FROM sh JOIN nr ON nr.doc_id = sh.b)
SELECT doc_id, container_id, shared, n_rare
FROM dirs
WHERE {_CONTAIN_DEN} * shared >= {_CONTAIN_NUM} * n_rare
"""


QUERIES["containment_pairs"] = q_containment_pairs
ORACLE_SQL["containment_pairs"] = _containment_oracle_sql()
