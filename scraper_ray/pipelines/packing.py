"""Training-corpus assembly operators: benchmark decontamination,
context-length chunking, and greedy sequence packing.

The last mile of a training-data pipeline after dedup/quality gating:

- ``decontaminate`` — flag training docs sharing any 5-token n-gram
  with a held-out eval split (the benchmark-leakage check). The eval
  side is tiny by construction (benchmarks are ~10^5 grams even when
  the corpus is 100 TB), so its distinct-gram set is collected once,
  ``ray.put`` once, and probed inside ``map_batches`` — a broadcast
  semi-join, never a corpus-wide shuffle.
- ``chunk_tokens`` — split each doc into fixed-length token windows
  (the context-window chunking stage before tokenization). Pure
  flat-map, embarrassingly parallel.
- ``pack_bins`` — assign docs to fixed token-budget training bins by
  their offset in the doc_id-ordered token stream (streaming-concat
  packing: bin = exclusive-prefix-sum // budget). Prefix sums don't
  exist as a Ray Data primitive, so this is the classic two-phase
  distributed scan: per-partition local prefix sums (one groupby on a
  doc_id-range key), per-partition totals to the driver (one row per
  partition — O(N / part_size), sized so this stays small; a 100 TB
  corpus at part_size 10^6 is ~10^5 offset rows), cumulative offsets
  broadcast back, and a final vectorized map adds them.

All three are deterministic and mirrored exactly by DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .common import read_sf_table as _t

_DECON_K = 5        # eval-overlap n-gram length
_EVAL_MOD = 17      # doc_id % 17 == 0 -> held-out eval split
_CHUNK_LEN = 32     # tokens per context window
_PACK_BUDGET = 512  # tokens per training bin
_PACK_PART = 64        # docs per scan partition, gate-tier floor
_PACK_MAX_PARTS = 1 << 20   # driver offsets map bound (one int each)


def _pack_part_for(max_id: int) -> int:
    """Docs per scan partition, DERIVED from the id range: wide enough
    that the driver's per-partition offsets map stays under
    _PACK_MAX_PARTS entries (one int each — ~8 MB at the cap), floored
    at the gate-tier width. Partitioning only shapes the internal
    prefix-scan topology; bin_id output is identical at any width, so
    the oracle needs no derivation mirror."""
    import math

    return max(_PACK_PART, math.ceil((max_id + 1) / _PACK_MAX_PARTS))


def _grams(text: str, k: int) -> set[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return {text}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _eval_gram_set(docs: rd.Dataset) -> frozenset:
    """Distinct 5-grams of the eval split (doc_id % 17 == 0), built as
    per-batch distinct gram rows then unioned on the driver (the set
    union IS the dedup; a groupby here would shuffle thousands of tiny
    groups for nothing). Collect size is bounded by the benchmark, not
    the corpus."""

    def eval_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out: set[str] = set()
        for i, x in zip(ids, texts):
            if int(i) % _EVAL_MOD == 0:
                out |= _grams(x, _DECON_K)
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    gram_rows = docs.map_batches(eval_grams, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return frozenset(r["gram"] for r in gram_rows.take_all())


def q_decontaminate(sf_dir: str) -> rd.Dataset:
    """Eval-overlap decontamination: for every training doc (doc_id not
    divisible by 17), count its distinct 5-gram overlaps with the eval
    split's gram set and flag contamination. The gram set is broadcast
    once (ray.put) and probed inside map_batches — a broadcast
    semi-join, never a corpus-wide shuffle."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    ev_ref = ray.put(_eval_gram_set(docs))

    def overlap(t: pa.Table) -> pa.Table:
        ev_set = ray.get(ev_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        keep_ids, n_over = [], []
        for i, x in zip(ids, texts):
            if int(i) % _EVAL_MOD == 0:
                continue
            keep_ids.append(int(i))
            n_over.append(len(_grams(x, _DECON_K) & ev_set))
        n = np.asarray(n_over, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(keep_ids, pa.int64()),
            "n_overlap": pa.array(n),
            "contaminated": pa.array((n > 0).astype(np.int64)),
        })

    return docs.map_batches(overlap, batch_format="pyarrow",
                            zero_copy_batch=True)


BLOOM_M = 1 << 16   # filter bits (8 KiB packed — constant vs corpus size)
BLOOM_K = 3         # hash functions per gram


def _bloom_positions(gram: str) -> tuple[int, ...]:
    """The K bit positions of *gram*: md5 of 'j:gram' for j in 0..K-1,
    first 8 hex digits mod M — the same deterministic cross-engine hash
    family as the CMS/HLL sketches (sketch.py), so the DuckDB oracle
    recomputes identical bits."""
    import hashlib

    return tuple(
        int(hashlib.md5(f"{j}:{gram}".encode()).hexdigest()[:8], 16)
        % BLOOM_M for j in range(BLOOM_K))


def q_decontaminate_bloom(sf_dir: str) -> rd.Dataset:
    """Bloom-filter decontamination (the 100 TB-scale path): the eval
    split's gram set is folded into a FIXED-SIZE bit array (2^16 bits =
    8 KiB regardless of benchmark size) broadcast once; every training
    doc probes its distinct 5-grams against the bits. One-sided error:
    ``bloom_hit >= exact_hit`` always (no false negatives — safe for
    decontamination, a clean doc is never flagged missed), and the
    exact flag is emitted alongside so the row set measures the
    false-positive mass directly. Same broadcast-semi-join shape as
    ``q_decontaminate``; the broadcast payload just stops growing with
    the eval set."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    ev_set = _eval_gram_set(docs)
    bits = np.zeros(BLOOM_M, dtype=bool)
    for g in ev_set:
        for p in _bloom_positions(g):
            bits[p] = True
    bits_ref = ray.put(bits)
    ev_ref = ray.put(ev_set)

    def probe(t: pa.Table) -> pa.Table:
        bset = ray.get(bits_ref)
        exact = ray.get(ev_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        keep_ids, bloom_hit, exact_hit = [], [], []
        for i, x in zip(ids, texts):
            if int(i) % _EVAL_MOD == 0:
                continue
            gs = _grams(x, _DECON_K)
            keep_ids.append(int(i))
            bloom_hit.append(int(any(
                all(bset[p] for p in _bloom_positions(g)) for g in gs)))
            exact_hit.append(int(bool(gs & exact)))
        return pa.table({
            "doc_id": pa.array(keep_ids, pa.int64()),
            "bloom_hit": pa.array(bloom_hit, pa.int64()),
            "exact_hit": pa.array(exact_hit, pa.int64()),
        })

    return docs.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_chunk_tokens(sf_dir: str) -> rd.Dataset:
    """Context-window chunking: each doc's tokens split into consecutive
    32-token windows (last window ragged). One output row per chunk —
    a pure flat-map, no shuffle."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out_id, out_cid, out_txt, out_n = [], [], [], []
        for i, x in zip(ids, texts):
            toks = x.split(" ")
            for c in range(0, max(1, -(-len(toks) // _CHUNK_LEN))):
                win = toks[c * _CHUNK_LEN : (c + 1) * _CHUNK_LEN]
                out_id.append(int(i))
                out_cid.append(c)
                out_txt.append(" ".join(win))
                out_n.append(len(win))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        })

    return docs.map_batches(chunks, batch_format="pyarrow",
                            zero_copy_batch=True)


def pack_assign(counts: rd.Dataset) -> rd.Dataset:
    """Assign (doc_id, n_tokens) rows to fixed token-budget bins by
    their offset in the doc_id-ordered token stream
    (bin = exclusive-prefix-sum // budget).

    Two-phase distributed scan (no driver-side row loop): local prefix
    sums inside doc_id-range partitions, partition totals -> cumulative
    offsets on the driver (one small row per partition), offsets
    broadcast via ray.put, final vectorized add."""

    # size the scan partitions to the id range (cheap Max over the
    # small (doc_id, n_tokens) projection) so the driver's offsets map
    # stays bounded at any corpus size
    counts = counts.materialize()
    part_w = _pack_part_for(int(counts.max("doc_id")))

    def keyed(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        return pa.table({
            "doc_id": ids,
            "part": pc.divide(ids, pa.scalar(part_w, pa.int64())),
            "n_tokens": pc.cast(t.column("n_tokens"), pa.int64()),
        })

    counts = counts.map_batches(keyed, batch_format="pyarrow").materialize()

    # phase 1: within-partition exclusive prefix sums (sorted by doc_id)
    def local_scan(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column("doc_id"))
        g = g.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        prefix = np.cumsum(n) - n
        return pa.table({
            "doc_id": g.column("doc_id"),
            "part": g.column("part"),
            "n_tokens": g.column("n_tokens"),
            "local_prefix": pa.array(prefix, pa.int64()),
        })

    scanned = counts.groupby("part").map_groups(
        local_scan, batch_format="pyarrow")

    # phase 2: per-partition totals -> cumulative offsets (driver holds
    # one int per partition, never per row)
    totals = counts.groupby("part").sum("n_tokens").take_all()
    totals.sort(key=lambda r: r["part"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[int(r["part"])] = acc
        acc += int(r["sum(n_tokens)"])
    off_ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        parts = t.column("part").to_numpy(zero_copy_only=False)
        base = np.asarray([off[int(p)] for p in parts], dtype=np.int64)
        prefix = base + t.column("local_prefix").to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "bin_id": pa.array(prefix // _PACK_BUDGET, pa.int64()),
        })

    return scanned.map_batches(assign, batch_format="pyarrow")


def q_pack_bins(sf_dir: str) -> rd.Dataset:
    """Greedy streaming-concat packing of the documents table: docs in
    doc_id order are laid end-to-end in a token stream and each doc
    lands in the bin covering its start offset."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def counted(t: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(t.column("text"), " "), 1)
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_tokens": pc.cast(n_tok, pa.int64()),
        })

    return pack_assign(docs.map_batches(counted, batch_format="pyarrow",
                                        zero_copy_batch=True))


def q_corpus_assemble(sf_dir: str) -> rd.Dataset:
    """End-to-end training-set assembly over the documents table:

        quality gate (>=20 tokens, stopword ratio < 0.5)
        -> train split (drop eval docs, doc_id % 17 == 0)
        -> decontaminate (drop docs overlapping eval 5-grams)
        -> exact dedup (md5(text), keep min doc_id)
        -> pack into token-budget bins

    The gate + split + decontamination run in ONE map over the corpus
    (eval grams broadcast); the only shuffles are the dedup groupby and
    the packing scan. Mirrored end-to-end by a single SQL oracle."""
    import hashlib

    from .text import _STOPWORDS

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    ev_ref = ray.put(_eval_gram_set(docs))
    stop = frozenset(_STOPWORDS)

    def gate(t: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out_id, out_hash, out_n = [], [], []
        for i, x in zip(ids, texts):
            if int(i) % _EVAL_MOD == 0:
                continue
            toks = x.split(" ")
            n = len(toks)
            if n < 20:
                continue
            n_stop = sum(1 for w in toks if w in stop)
            if n_stop / n >= 0.5:
                continue
            if _grams(x, _DECON_K) & ev:
                continue
            out_id.append(int(i))
            out_hash.append(hashlib.md5(x.encode()).hexdigest())
            out_n.append(n)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text_hash": pa.array(out_hash, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        })

    gated = docs.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True)

    # identical texts have identical token counts — keep min doc_id.
    # A Min aggregate (Arrow block aggregation), not map_groups: one
    # Python dispatch per distinct hash would dominate at corpus scale.
    from ray.data.aggregate import Min

    deduped = (gated.groupby("text_hash")
               .aggregate(Min("doc_id", alias_name="doc_id"),
                          Min("n_tokens", alias_name="n_tokens"))
               .select_columns(["doc_id", "n_tokens"]))
    return pack_assign(deduped)


_SELECT_BUDGET = 10_000       # token budget for the selection demo
_BAND_TARGET_ROWS = 1 << 18   # target scan rows per score band


def budget_select(scored: rd.Dataset, budget: int) -> rd.Dataset:
    """Select documents under a total token *budget* in quality order
    (score DESC, doc_id ASC) — the data-constrained 'take the best N
    tokens' corpus-selection step.

    A global quality-ordered prefix sum, distributed as a two-phase
    scan over SCORE BANDS (band = (max_score - score) // band_w, so
    band-ascending order IS score-descending order and equal scores
    never straddle bands): local prefix sums inside each band (sorted
    (score DESC, doc_id) within), band totals -> cumulative offsets on
    the driver (one int per band), broadcast, vectorized add + filter.
    No global sort shuffle: rows move once, into their band.

    Scale shape: band count derives from corpus size (driver state =
    one int per band); one band must fit a worker's heap for the local
    scan — the same constraint family as global_shuffle's shards. A
    degenerate score distribution (every doc the same score) caps at
    band_w = 1, where the within-band doc_id tie-break still gives a
    deterministic selection."""
    scored = scored.materialize()
    n_docs = scored.count()
    if n_docs == 0:
        return scored
    max_score = int(scored.max("score"))
    n_bands = max(8, min(4096, n_docs // _BAND_TARGET_ROWS + 8))
    band_w = max(1, (max_score + n_bands) // n_bands)

    def keyed(t: pa.Table) -> pa.Table:
        sc = pc.cast(t.column("score"), pa.int64())
        band = pc.divide(
            pc.subtract(pa.scalar(max_score, pa.int64()), sc),
            pa.scalar(band_w, pa.int64()))
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "score": sc,
            "n_tokens": pc.cast(t.column("n_tokens"), pa.int64()),
            "band": band,
        })

    keyed_ds = scored.map_batches(keyed, batch_format="pyarrow").materialize()

    def local_scan(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("score", "descending"),
                                              ("doc_id", "ascending")])
        g = g.take(order)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        return g.append_column(
            "local_prefix", pa.array(np.cumsum(n) - n, pa.int64()))

    scanned = keyed_ds.groupby("band").map_groups(
        local_scan, batch_format="pyarrow")

    totals = keyed_ds.groupby("band").sum("n_tokens").take_all()
    totals.sort(key=lambda r: r["band"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[int(r["band"])] = acc
        acc += int(r["sum(n_tokens)"])
    off_ref = ray.put(offsets)

    def select(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        bands = t.column("band").to_numpy(zero_copy_only=False)
        base = np.asarray([off[int(b)] for b in bands], dtype=np.int64)
        prefix = base + t.column("local_prefix").to_numpy(
            zero_copy_only=False)
        keep = prefix < budget
        t = t.filter(pa.array(keep))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "score": t.column("score"),
            "n_tokens": t.column("n_tokens"),
            "prefix_tokens": pa.array(prefix[keep], pa.int64()),
        })

    return scanned.map_batches(select, batch_format="pyarrow")


def q_budget_select(sf_dir: str) -> rd.Dataset:
    """Token-budget corpus selection: score = distinct-token count (an
    integer quality proxy — exact at any parallelism), keep the
    best-scored docs until the token budget is spent (the doc crossing
    the boundary is included)."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def counted(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(pc.add(pc.count_substring(t.column("text"), " "), 1),
                        pa.int64())
        dis = [len(set(x.split(" "))) for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "score": pa.array(dis, pa.int64()),
            "n_tokens": n_tok,
        })

    return budget_select(
        docs.map_batches(counted, batch_format="pyarrow",
                         zero_copy_batch=True),
        _SELECT_BUDGET)


ORACLE_SQL = {
    "budget_select": f"""
WITH s AS (SELECT doc_id,
                  CAST(len(list_distinct(string_split(text, ' ')))
                       AS BIGINT) AS score,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
w AS (SELECT *,
             sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
                 AS prefix_tokens
      FROM s)
SELECT doc_id, score, n_tokens, CAST(prefix_tokens AS BIGINT) AS prefix_tokens
FROM w WHERE prefix_tokens < {_SELECT_BUDGET}
""",
    "decontaminate": f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {_DECON_K} THEN
           list_transform(range(1, len(toks) - {_DECON_K - 2}),
                          i -> array_to_string(toks[i:i+{_DECON_K - 1}], ' '))
         ELSE [text] END AS gs
  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        FROM documents)),
ev AS (SELECT DISTINCT unnest(gs) AS gram FROM g
       WHERE doc_id % {_EVAL_MOD} = 0),
tr AS (SELECT doc_id, list_distinct(gs) AS gs FROM g
       WHERE doc_id % {_EVAL_MOD} <> 0),
ex AS (SELECT doc_id, unnest(gs) AS gram FROM tr),
h AS (SELECT ex.doc_id, count(*) AS n FROM ex
      JOIN ev USING (gram) GROUP BY ex.doc_id)
SELECT tr.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_overlap,
       CAST(CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM tr LEFT JOIN h USING (doc_id)
""",
    "decontaminate_bloom": "",  # generated below (needs the hex helper)
    "chunk_tokens": f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ex AS (SELECT doc_id, toks,
              unnest(range(0, CAST(ceil(len(toks) / {_CHUNK_LEN}.0)
                                   AS BIGINT))) AS i
       FROM d)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       array_to_string(toks[i*{_CHUNK_LEN}+1:i*{_CHUNK_LEN}+{_CHUNK_LEN}],
                       ' ') AS chunk_text,
       CAST(least({_CHUNK_LEN}, len(toks) - i*{_CHUNK_LEN})
            AS BIGINT) AS n_tokens
FROM ex
""",
    "pack_bins": f"""
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id
FROM (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             sum(len(string_split(text, ' ')))
               OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents)
""",
    "corpus_assemble": f"""
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
g AS (
  SELECT doc_id, text, toks,
         CASE WHEN len(toks) >= {_DECON_K} THEN
           list_transform(range(1, len(toks) - {_DECON_K - 2}),
                          i -> array_to_string(toks[i:i+{_DECON_K - 1}], ' '))
         ELSE [text] END AS gs
  FROM d),
ev AS (SELECT DISTINCT unnest(gs) AS gram FROM g
       WHERE doc_id % {_EVAL_MOD} = 0),
tr AS (SELECT doc_id, text, toks, list_distinct(gs) AS gs FROM g
       WHERE doc_id % {_EVAL_MOD} <> 0),
ovl AS (SELECT DISTINCT t.doc_id
        FROM (SELECT doc_id, unnest(gs) AS gram FROM tr) t
        JOIN ev USING (gram)),
gated AS (
  SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens FROM tr
  WHERE len(toks) >= 20
    AND CAST(len(list_filter(toks,
          x -> x IN ('the','a','of','and','to','in','is','it')))
        AS DOUBLE) / len(toks) < 0.5
    AND doc_id NOT IN (SELECT doc_id FROM ovl)),
deduped AS (
  SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
  FROM gated GROUP BY md5(text))
SELECT doc_id, n_tokens,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id
FROM deduped
""",
}

def _bloom_oracle_sql() -> str:
    """DuckDB mirror of q_decontaminate_bloom: the identical md5-derived
    bit set, a per-(doc, gram) bool_and over the K probe positions, and
    the exact-overlap flag from the plain gram join."""
    from .sketch import _sql_hex_int

    pos = _sql_hex_int("CAST(j AS VARCHAR) || ':' || gram", 1, 8)
    return f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {_DECON_K} THEN
           list_transform(range(1, len(toks) - {_DECON_K - 2}),
                          i -> array_to_string(toks[i:i+{_DECON_K - 1}], ' '))
         ELSE [text] END AS gs
  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        FROM documents)),
ev AS (SELECT DISTINCT unnest(gs) AS gram FROM g
       WHERE doc_id % {_EVAL_MOD} = 0),
evb AS (SELECT DISTINCT CAST({pos} % {BLOOM_M} AS BIGINT) AS b
        FROM ev CROSS JOIN range(0, {BLOOM_K}) r(j)),
tr AS (SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM g
       WHERE doc_id % {_EVAL_MOD} <> 0),
trb AS (SELECT doc_id, gram, j, CAST({pos} % {BLOOM_M} AS BIGINT) AS b
        FROM tr CROSS JOIN range(0, {BLOOM_K}) r(j)),
ghit AS (SELECT t.doc_id, t.gram,
                bool_and(evb.b IS NOT NULL) AS all_in
         FROM trb t LEFT JOIN evb ON evb.b = t.b
         GROUP BY t.doc_id, t.gram),
bl AS (SELECT doc_id, max(CASE WHEN all_in THEN 1 ELSE 0 END) AS bloom_hit
       FROM ghit GROUP BY doc_id),
exh AS (SELECT tr.doc_id, count(*) AS n FROM tr
        JOIN ev ON ev.gram = tr.gram GROUP BY tr.doc_id),
base AS (SELECT DISTINCT doc_id FROM tr)
SELECT base.doc_id,
       CAST(coalesce(bl.bloom_hit, 0) AS BIGINT) AS bloom_hit,
       CAST(CASE WHEN coalesce(exh.n, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS exact_hit
FROM base LEFT JOIN bl USING (doc_id) LEFT JOIN exh USING (doc_id)
"""


ORACLE_SQL["decontaminate_bloom"] = _bloom_oracle_sql()

QUERIES = {
    "decontaminate": q_decontaminate,
    "decontaminate_bloom": q_decontaminate_bloom,
    "chunk_tokens": q_chunk_tokens,
    "pack_bins": q_pack_bins,
    "budget_select": q_budget_select,
    "corpus_assemble": q_corpus_assemble,
}
