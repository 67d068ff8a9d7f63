"""Approximate-nearest-neighbor search over the embeddings table.

- ``ann_topk`` — brute-force cosine top-k: the query vector is broadcast
  once (``ray.put``), each batch does one float64 matmul against it, and
  per-batch partial top-k rows flow into a tiny global sort+limit. This
  is the exact baseline and the verification oracle for the scale path.
- ``ann_lsh_topk`` — sign-LSH **partitioned index** variant: a one-time
  build pass writes the embeddings into hive-partitioned parquet keyed
  by (band, signature) — two bands of 4 hyperplanes each — and the query
  reads *only* the two partitions matching the query's signatures. At
  100 TB the scan cost is the candidate partitions, not the corpus; the
  build is a single streaming pass (storage 2x, the standard banded-LSH
  index tradeoff).

Determinism: similarities are computed in float64 and rounded to 4
decimals; ordering ties break on vec_id. Hyperplanes are seeded, and the
DuckDB oracles inline the same plane constants.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .common import embs_to_numpy, read_sf_table as _t, round_half_away

N_PLANES = 8
_HALF = N_PLANES // 2


def _planes(dim: int) -> np.ndarray:
    return np.random.default_rng(11).standard_normal((dim, N_PLANES))


def _query_vector(sf_dir: str, query_vec_id: int = 0) -> np.ndarray:
    """Pruned single-row read — a row-group/predicate-pushdown read, not
    a driver-side scan of the whole embeddings table."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", query_vec_id)])
    assert t.num_rows == 1, f"vec_id {query_vec_id} not found"
    return embs_to_numpy(t.column("embedding"))[0]


def q_ann_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> rd.Dataset:
    """Exact cosine top-k to the query vector (brute force baseline)."""
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        embs = embs_to_numpy(t.column("embedding"))
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs / norms[:, None]) @ qv
        out = pa.table({"vec_id": t.column("vec_id"),
                        "cosine": pa.array(round_half_away(sims))})
        # partial top-k per batch: only k candidate rows leave each task
        order = pa.compute.sort_indices(
            out, sort_keys=[("cosine", "descending"), ("vec_id", "ascending")]
        )
        return out.take(order[: min(k, out.num_rows)])

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cosine", "vec_id"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Sign-LSH partitioned index
# ---------------------------------------------------------------------------

def band_keys(embs: np.ndarray, planes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n,) int keys for the two 4-plane signature bands."""
    signs = (embs @ planes) > 0
    w = 1 << np.arange(_HALF)
    return signs[:, :_HALF] @ w, signs[:, _HALF:] @ w


def build_lsh_index(sf_dir: str, out_dir: str) -> str:
    """One streaming pass: embeddings -> hive-partitioned parquet under
    ``out_dir/band=B/key=K/`` (each vector written once per band)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    pl_ref = ray.put(_planes(dim))

    def expand(t: pa.Table) -> pa.Table:
        pl = ray.get(pl_ref)
        embs = embs_to_numpy(t.column("embedding"))
        k1, k2 = band_keys(embs, pl)
        n = t.num_rows
        base = t.select(["vec_id", "embedding"])
        both = pa.concat_tables([base, base])
        both = both.append_column("band", pa.array([0] * n + [1] * n, pa.int32()))
        return both.append_column(
            "key", pa.array(np.concatenate([k1, k2]).astype("int64")))

    ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True
                   ).write_parquet(out_dir, partition_cols=["band", "key"])
    return out_dir


_INDEX_CACHE: dict[str, str] = {}


def _index_for(sf_dir: str) -> str:
    key = os.path.normpath(sf_dir)
    if key not in _INDEX_CACHE:
        out = tempfile.mkdtemp(prefix="lsh_index_")
        build_lsh_index(sf_dir, out)
        _INDEX_CACHE[key] = out
    return _INDEX_CACHE[key]


def q_ann_lsh_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> rd.Dataset:
    """Banded sign-LSH top-k: read ONLY the two index partitions whose
    (band, key) match the query's signatures, dedupe candidates that
    match in both bands, score, global top-k."""
    q = _query_vector(sf_dir, query_vec_id)
    planes = _planes(q.shape[0])
    k1, k2 = band_keys(q[None, :], planes)
    idx = _index_for(sf_dir)
    import glob as _glob

    paths = [f for d in (os.path.join(idx, f"band=0/key={int(k1[0])}"),
                         os.path.join(idx, f"band=1/key={int(k2[0])}"))
             for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        embs = embs_to_numpy(t.column("embedding"))
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs / norms[:, None]) @ qv
        return pa.table({"vec_id": t.column("vec_id"),
                         "cosine": pa.array(round_half_away(sims))})

    if not paths:
        return rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64())}))
    from ray.data.aggregate import Count

    scored = (
        rd.read_parquet(paths, columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    )
    # a vector matching in both bands appears in both partitions — its
    # two scored rows are identical, so a native (vec_id, cosine) groupby
    # dedupes without a driver round-trip
    deduped = scored.groupby(["vec_id", "cosine"]).aggregate(
        Count(alias_name="n")).drop_columns(["n"])
    return deduped.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the k-means scale path
# ---------------------------------------------------------------------------

IVF_NPROBE = 3


def ivf_k(n_vecs: int) -> int:
    return max(4, min(4096, n_vecs // 32))


def train_centroids(vecs: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means in float64: init = first k vectors
    (by position in the vec_id-sorted sample), assignment = argmin of
    -2*v.c + |c|^2 (first index wins ties), empty clusters keep their
    previous centroid. No RNG anywhere — reproducible across runs and
    cluster sizes, and re-derivable by the oracle generator."""
    c = vecs[:k].copy()
    for _ in range(iters):
        d = -2.0 * (vecs @ c.T) + (c * c).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        for j in range(k):
            members = vecs[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return c


IVF_TRAIN_CAP = 1 << 17   # max vectors read for centroid training


def _ivf_train_set(sf_dir: str) -> np.ndarray:
    """Deterministic training sample: every 4th vector by vec_id order,
    reading row groups only until the cap — the driver never holds more
    than IVF_TRAIN_CAP vectors regardless of corpus size."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    parts, rows = [], 0
    for rg in range(f.num_row_groups):
        parts.append(f.read_row_group(rg, columns=["vec_id", "embedding"]))
        rows += parts[-1].num_rows
        if rows >= IVF_TRAIN_CAP:
            break
    t = pa.concat_tables(parts).slice(0, IVF_TRAIN_CAP)
    order = pa.compute.sort_indices(t, sort_keys=[("vec_id", "ascending")])
    t = t.take(order)
    embs = embs_to_numpy(t.column("embedding"))
    return embs[::4]


def build_ivf_index(sf_dir: str, out_dir: str) -> np.ndarray:
    """One streaming pass: assign every vector to its nearest centroid
    and write hive-partitioned parquet under ``out_dir/cid=C/``.
    Returns the centroids (they parameterize the query side)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = _ivf_train_set(sf_dir)
    cents = train_centroids(sample, ivf_k(ds.count()))
    c_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        embs = embs_to_numpy(t.column("embedding"))
        d = -2.0 * (embs @ c.T) + (c * c).sum(axis=1)[None, :]
        return t.append_column(
            "cid", pa.array(np.argmin(d, axis=1).astype("int64")))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True
                   ).write_parquet(out_dir, partition_cols=["cid"])
    return cents


_IVF_CACHE: dict[str, tuple[str, np.ndarray]] = {}


def _ivf_for(sf_dir: str) -> tuple[str, np.ndarray]:
    key = os.path.normpath(sf_dir)
    if key not in _IVF_CACHE:
        out = tempfile.mkdtemp(prefix="ivf_index_")
        cents = build_ivf_index(sf_dir, out)
        _IVF_CACHE[key] = (out, cents)
    return _IVF_CACHE[key]


def q_ann_ivf_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                   nprobe: int = IVF_NPROBE) -> rd.Dataset:
    """IVF top-k: score only the ``nprobe`` partitions whose centroids
    are nearest the query — at scale the scan is nprobe/k of the corpus,
    and the partitions are separate parquet dirs (pruned at the read)."""
    q = _query_vector(sf_dir, query_vec_id)
    idx, cents = _ivf_for(sf_dir)
    d = -2.0 * (cents @ q) + (cents * cents).sum(axis=1)
    probes = np.argsort(d, kind="stable")[:nprobe]
    import glob as _glob

    paths = [f for c in probes
             for f in sorted(_glob.glob(os.path.join(idx, f"cid={int(c)}",
                                                     "*.parquet")))]
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        embs = embs_to_numpy(t.column("embedding"))
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs / norms[:, None]) @ qv
        out = pa.table({"vec_id": t.column("vec_id"),
                        "cosine": pa.array(round_half_away(sims))})
        order = pa.compute.sort_indices(
            out, sort_keys=[("cosine", "descending"), ("vec_id", "ascending")])
        return out.take(order[: min(k, out.num_rows)])

    if not paths:
        return rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64())}))
    return (
        rd.read_parquet(paths, columns=["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cosine", "vec_id"], descending=[True, False])
        .limit(k)
    )


SEMDEDUP_THRESHOLD = 0.3
SEMDEDUP_CLUSTER_CAP = 256   # skip-prune bound for degenerate clusters


def q_semdedup(sf_dir: str, threshold: float = SEMDEDUP_THRESHOLD) -> rd.Dataset:
    """SemDedup-style semantic dedup: cluster with the deterministic
    k-means, then inside each cluster drop any vector whose cosine to a
    LOWER-id cluster member reaches the threshold (the lower id is the
    kept representative). Output: (vec_id, cid, keep) for every vector.

    Topology: one assignment map (centroids broadcast via ray.put) and
    one groupby(cid) shuffle with the packed vector riding along; the
    prune is a vectorized in-group matmul bounded by the cluster cap —
    degenerate clusters past the cap keep all members, loudly (pruning
    them would need an unbounded pairwise pass; SQL mirrors the skip)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_vecs = ds.count()
    cents = train_centroids(_ivf_train_set(sf_dir), ivf_k(n_vecs))
    c_ref = ray.put(cents)
    # part count sized to the QUADRATIC prune (pairs per row, not rows);
    # a cid always lands whole in one part, so the groupby("part") hands
    # the segmented prune whole clusters through the task-based sort
    # shuffle (no hash-shuffle aggregator-actor startup per query)
    cpus = max(8, int(ray.cluster_resources().get("CPU", 8)))
    n_parts = min(cpus, max(2, n_vecs // 512))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        embs = embs_to_numpy(t.column("embedding"))
        d = -2.0 * (embs @ c.T) + (c * c).sum(axis=1)[None, :]
        cid = np.argmin(d, axis=1).astype("int64")
        return pa.table({
            "vec_id": pa.compute.cast(t.column("vec_id"), pa.int64()),
            "cid": pa.array(cid),
            "part": pa.array((cid * 1000003) % n_parts),
            "emb": pa.array([r.tobytes()
                             for r in embs.astype(np.float32)], pa.binary()),
        })

    def prune_batch(t: pa.Table) -> pa.Table:
        # segmented in-cluster prune, vectorized over CLUSTERS (the
        # embedding-near-dup verify shape — never one Python dispatch per
        # cid group): one sort makes clusters contiguous runs with
        # ascending vec_id, clusters sharing a size expand together
        # through one triu broadcast, and ONE einsum scores every pair.
        # Per-row normalization and the per-pair einsum are elementwise,
        # so floats are bit-identical to the old per-group path (and to
        # DuckDB's list_cosine_similarity; a BLAS matmul could reorder
        # the additions). Clusters past the cap keep all members, loudly.
        import sys

        n = t.num_rows
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cid": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.int64())})
        t = t.sort_by([("cid", "ascending"), ("vec_id", "ascending")])
        cid = t.column("cid").to_numpy(zero_copy_only=False)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = cid[1:] != cid[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        over = sizes > SEMDEDUP_CLUSTER_CAP
        if over.any():
            for s, z in zip(starts[over], sizes[over]):
                print(f"semdedup: cluster {int(cid[s])} past cap ({int(z)} "
                      f"> {SEMDEDUP_CLUSTER_CAP}), keeping all members",
                      file=sys.stderr)
        ia_parts, ib_parts = [], []
        for k in np.unique(sizes):
            if not 2 <= k <= SEMDEDUP_CLUSTER_CAP:
                continue
            iu, ju = np.triu_indices(int(k), 1)
            seg = starts[sizes == k]
            ia_parts.append((seg[:, None] + iu[None, :]).ravel())
            ib_parts.append((seg[:, None] + ju[None, :]).ravel())
        dup = np.zeros(n, dtype=bool)
        if ia_parts:
            ia = np.concatenate(ia_parts)
            ib = np.concatenate(ib_parts)
            v = np.frombuffer(b"".join(t.column("emb").to_pylist()),
                              dtype=np.float32).reshape(n, -1).astype(
                np.float64)
            norms = np.linalg.norm(v, axis=1)
            norms[norms == 0] = 1.0
            vn = v / norms[:, None]
            sims = np.einsum("ij,ij->i", vn[ia], vn[ib])
            hit = sims >= threshold
            # dropped when ANY lower-id member is >= threshold (segments
            # are disjoint index ranges, so one flat scatter covers all)
            np.logical_or.at(dup, ib[hit], True)
        return pa.table({"vec_id": pa.array(ids),
                         "cid": pa.array(cid.astype(np.int64)),
                         "keep": pa.array((~dup).astype(np.int64))})

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(prune_batch, batch_format="pyarrow")
    )


def semdedup_oracle_sql(sf_dir: str = "/root/testdata/sf0.01",
                        threshold: float = SEMDEDUP_THRESHOLD) -> str:
    """Generated for the driver-gate tier, like ``ivf_oracle_sql``:
    inline the deterministic centroids, assign with the same argmin
    formula, and mark a vector dropped when a lower-id cluster member
    reaches the cosine threshold."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    cents = train_centroids(_ivf_train_set(sf_dir), ivf_k(n))
    c_lists = ["[" + ", ".join(repr(float(x)) for x in c) + "]" for c in cents]
    norms = [(c * c).sum() for c in cents]
    dist_list = ", ".join(
        f"(-2 * list_dot_product(emb, {cl}) + {repr(float(nm))})"
        for cl, nm in zip(c_lists, norms))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
assigned AS (
  SELECT vec_id, emb,
         list_position(d, list_min(d)) - 1 AS cid
  FROM (SELECT vec_id, emb, [{dist_list}] AS d FROM e)),
sizes AS (SELECT cid, count(*) AS n FROM assigned GROUP BY cid)
SELECT v.vec_id, CAST(v.cid AS BIGINT) AS cid,
       CAST(CASE WHEN s.n > {SEMDEDUP_CLUSTER_CAP} THEN 1
                 WHEN EXISTS (
                   SELECT 1 FROM assigned u
                   WHERE u.cid = v.cid AND u.vec_id < v.vec_id
                     AND list_cosine_similarity(u.emb, v.emb)
                         >= {threshold}) THEN 0
                 ELSE 1 END AS BIGINT) AS keep
FROM assigned v JOIN sizes s ON s.cid = v.cid
"""


def q_embedding_norms(sf_dir: str) -> rd.Dataset:
    """Per-vector L2 norm (rounded) — the simplest vector kernel, used to
    anchor the float pipeline against the SQL oracle."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def f(t: pa.Table) -> pa.Table:
        embs = embs_to_numpy(t.column("embedding"))
        return pa.table({"vec_id": t.column("vec_id"),
                         "l2": pa.array(round_half_away(np.linalg.norm(embs, axis=1)))})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_embedding_quantize(sf_dir: str) -> rd.Dataset:
    """Symmetric per-vector int8 quantization (the storage-compression
    step a 100 TB embedding corpus takes before indexing): scale =
    max|x| / 127, q_i = sign(x_i) * floor(|x_i|/scale + 0.5). Pure map,
    zero-copy decode, one vectorized numpy pass per batch. Outputs are
    hash-exact: the per-vector scale (double, same IEEE ops as the SQL
    oracle) plus two integer summaries of the quantized codes (|q| sum
    and zero-code count) — integers shuffle-order-independently, so no
    float-accumulation wobble."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def f(t: pa.Table) -> pa.Table:
        embs = embs_to_numpy(t.column("embedding"))
        a = np.abs(embs)
        scale = a.max(axis=1) / 127.0
        q = np.floor(a / scale[:, None] + 0.5)   # |q_i|, half away from zero
        return pa.table({
            "vec_id": t.column("vec_id"),
            "scale": pa.array(scale, pa.float64()),
            "sum_abs_q": pa.array(q.sum(axis=1).astype(np.int64), pa.int64()),
            "n_zero": pa.array((q == 0).sum(axis=1).astype(np.int64),
                               pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# ann_pq — product quantization (the IVF-PQ storage/search compression)
# ---------------------------------------------------------------------------

PQ_M = 8     # subspaces
PQ_K = 16    # centroids per subspace codebook
PQ_DIM = 8   # dims per subspace (embeddings are PQ_M * PQ_DIM = 64-d)


def _pq_codebooks(sf_dir: str) -> list[np.ndarray]:
    """Per-subspace codebooks from the SAME deterministic, driver-capped
    train sample as IVF (``_ivf_train_set``): codebook m is Lloyd's
    k-means over the sample's m-th 8-dim slice, first-k init, first
    index wins ties — re-derivable by the oracle generator."""
    train = _ivf_train_set(sf_dir)
    return [train_centroids(train[:, m * PQ_DIM:(m + 1) * PQ_DIM], PQ_K)
            for m in range(PQ_M)]


def q_ann_pq(sf_dir: str) -> rd.Dataset:
    """Product-quantization encoding of the embedding corpus — the
    compression step an IVF-PQ index applies before a 100 TB corpus fits
    in memory (Jégou et al. 2011): each vector's 8 subspaces are each
    assigned to the nearest of 16 codebook centroids, giving a 8-byte
    code (here also packed into one int64 ``pq_key``, code0 most
    significant).

    Engine shape: codebooks train once on the driver-capped sample and
    broadcast via ``ray.put``; encoding is a pure vectorized map (one
    (batch × 16) matmul per subspace), no shuffle at any scale. Output
    is all-integer, so hash-exactness needs no float discipline beyond
    the assignment argmin the IVF path already mirrors."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    books_ref = ray.put(_pq_codebooks(sf_dir))

    def assign(t: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        embs = embs_to_numpy(t.column("embedding"))
        cols: dict = {"vec_id": pa.compute.cast(t.column("vec_id"),
                                                pa.int64())}
        key = np.zeros(max(len(embs), 0), np.int64)
        for m, c in enumerate(books):
            x = embs[:, m * PQ_DIM:(m + 1) * PQ_DIM]
            d = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
            code = np.argmin(d, axis=1).astype(np.int64)
            cols[f"code{m}"] = pa.array(code)
            key = key * PQ_K + code
        cols["pq_key"] = pa.array(key)
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def ann_pq_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Generated like ``ivf_oracle_sql``: retrain the deterministic
    per-subspace codebooks, inline them as DOUBLE[] literals, and assign
    with the identical ``-2*dot + |c|^2`` argmin (first index wins) over
    ``list_slice`` subvectors of the pinned tier's embeddings."""
    code_exprs = []
    for m, cents in enumerate(_pq_codebooks(sf_dir)):
        lists = ["[" + ", ".join(repr(float(x)) for x in c) + "]"
                 for c in cents]
        norms = [(c * c).sum() for c in cents]
        sub = f"list_slice(emb, {m * PQ_DIM + 1}, {(m + 1) * PQ_DIM})"
        dlist = ", ".join(
            f"(-2 * list_dot_product({sub}, {cl}) + {repr(float(nm))})"
            for cl, nm in zip(lists, norms))
        code_exprs.append(
            f"list_position([{dlist}], list_min([{dlist}])) - 1 AS code{m}")
    key_expr = " + ".join(
        f"CAST(code{m} AS BIGINT) * {PQ_K ** (PQ_M - 1 - m)}"
        for m in range(PQ_M))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
coded AS (SELECT vec_id, {', '.join(code_exprs)} FROM e)
SELECT vec_id, {', '.join(f'code{m}' for m in range(PQ_M))},
       CAST({key_expr} AS BIGINT) AS pq_key
FROM coded
"""


# ---------------------------------------------------------------------------
# ann_ivf_pq_topk — IVF coarse probe + PQ asymmetric-distance search
# ---------------------------------------------------------------------------

def _pq_lut(sf_dir: str, q: np.ndarray) -> np.ndarray:
    """(PQ_M, PQ_K) asymmetric-distance lookup table: squared L2 from
    each query subvector to every codebook centroid. Computed ONCE on
    the driver; the engine broadcasts this exact array and the oracle
    inlines its repr literals, so both sides sum identical doubles —
    bit-exact with no float-association caveat."""
    books = _pq_codebooks(sf_dir)
    lut = np.empty((PQ_M, PQ_K), np.float64)
    for m, c in enumerate(books):
        diff = c - q[m * PQ_DIM:(m + 1) * PQ_DIM][None, :]
        lut[m] = (diff * diff).sum(axis=1)
    return lut


def q_ann_ivf_pq_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                      nprobe: int = IVF_NPROBE) -> rd.Dataset:
    """IVF-PQ search (Jégou et al. 2011, the memory-bound 100 TB ANN
    design): probe the ``nprobe`` IVF cells nearest the query, and rank
    their members by PQ asymmetric distance — each candidate costs 8
    int lookups into the query's LUT instead of a 64-dim float dot, and
    at scale the codes (8 B/vector) live in RAM where raw vectors
    can't.

    Engine shape: centroids + codebooks + LUT broadcast once; per batch
    one matmul per subspace assigns codes, the ADC sum is a left-fold
    over the 8 LUT columns (matching the oracle's explicit + chain),
    and only the per-batch top-k leaves each task. Final exact top-k is
    a k-row sort."""
    q = _query_vector(sf_dir, query_vec_id)
    cents = train_centroids(_ivf_train_set(sf_dir),
                            ivf_k(_t(sf_dir, "embeddings",
                                     ["vec_id"]).count()))
    d = -2.0 * (cents @ q) + (cents * cents).sum(axis=1)
    probes = set(int(x) for x in np.argsort(d, kind="stable")[:nprobe])
    ctx = ray.put((cents, _pq_codebooks(sf_dir), _pq_lut(sf_dir, q),
                   probes))

    def score(t: pa.Table) -> pa.Table:
        cents_, books, lut, probes_ = ray.get(ctx)
        embs = embs_to_numpy(t.column("embedding"))
        dd = -2.0 * (embs @ cents_.T) + (cents_ * cents_).sum(axis=1)[None, :]
        cid = np.argmin(dd, axis=1)
        keep = np.isin(cid, list(probes_))
        embs = embs[keep]
        ids = t.column("vec_id").to_numpy()[keep].astype(np.int64)
        adc = np.zeros(len(embs), np.float64)
        for m, c in enumerate(books):
            x = embs[:, m * PQ_DIM:(m + 1) * PQ_DIM]
            dm = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
            code = np.argmin(dm, axis=1)
            adc = adc + lut[m][code]          # left-fold, oracle order
        out = pa.table({"vec_id": pa.array(ids, pa.int64()),
                        "adc": pa.array(round_half_away(adc, 6),
                                        pa.float64())})
        order = pa.compute.sort_indices(
            out, sort_keys=[("adc", "ascending"), ("vec_id", "ascending")])
        return out.take(order[: min(k, out.num_rows)])

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return (ds.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True)
            .sort(["adc", "vec_id"], descending=[False, False])
            .limit(k))


def ann_ivf_pq_oracle_sql(sf_dir: str = "/root/testdata/sf0.01",
                          k: int = 10, nprobe: int = IVF_NPROBE) -> str:
    """Generated like ``ivf_oracle_sql``: the IVF assign + probe filter,
    then PQ codes via the inlined codebooks and the ADC sum via the
    inlined LUT literals (identical doubles to the engine broadcast)."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    cents = train_centroids(_ivf_train_set(sf_dir), ivf_k(n))
    q = _query_vector(sf_dir, 0)
    d = -2.0 * (cents @ q) + (cents * cents).sum(axis=1)
    probes = ", ".join(str(int(c))
                       for c in np.argsort(d, kind="stable")[:nprobe])
    c_lists = ["[" + ", ".join(repr(float(x)) for x in c) + "]"
               for c in cents]
    norms = [(c * c).sum() for c in cents]
    dist_list = ", ".join(
        f"(-2 * list_dot_product(emb, {cl}) + {repr(float(nm))})"
        for cl, nm in zip(c_lists, norms))
    lut = _pq_lut(sf_dir, q)
    code_exprs, adc_terms = [], []
    for m, cb in enumerate(_pq_codebooks(sf_dir)):
        lists = ["[" + ", ".join(repr(float(x)) for x in c) + "]"
                 for c in cb]
        nms = [(c * c).sum() for c in cb]
        sub = f"list_slice(emb, {m * PQ_DIM + 1}, {(m + 1) * PQ_DIM})"
        dl = ", ".join(
            f"(-2 * list_dot_product({sub}, {cl}) + {repr(float(nm))})"
            for cl, nm in zip(lists, nms))
        code_exprs.append(
            f"list_position([{dl}], list_min([{dl}])) - 1 AS code{m}")
        lut_lit = "[" + ", ".join(repr(float(x)) for x in lut[m]) + "]"
        adc_terms.append(f"list_extract({lut_lit}, code{m} + 1)")
    adc_expr = " + ".join(adc_terms)     # left-assoc, engine order
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
assigned AS (
  SELECT vec_id, emb,
         list_position(d, list_min(d)) - 1 AS cid
  FROM (SELECT vec_id, emb, [{dist_list}] AS d FROM e)),
coded AS (
  SELECT vec_id, {', '.join(code_exprs)}
  FROM assigned WHERE cid IN ({probes}))
SELECT vec_id, round({adc_expr}, 6) AS adc
FROM coded ORDER BY adc ASC, vec_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# hard_negatives — contrastive pair mining over an anchor set
# ---------------------------------------------------------------------------

HN_ANCHORS = 8     # anchor vectors (vec_id < HN_ANCHORS)
HN_K = 5           # hard negatives kept per anchor
HN_DUP_COS = 0.9   # at/above this cosine a candidate is a near-dup
                   # (likely positive), not a negative — excluded


def q_hard_negatives(sf_dir: str, n_anchors: int = HN_ANCHORS,
                     k: int = HN_K) -> rd.Dataset:
    """Hard-negative mining for contrastive training (the in-batch /
    ANN-mined negatives of DPR, SimCSE, CLIP-style pipelines): for each
    anchor, the top-k most-similar vectors that are NOT near-duplicates
    (rounded cosine < HN_DUP_COS) and not the anchor itself — similar
    enough to be hard, distinct enough to be true negatives.

    Engine shape: the anchor matrix broadcasts once via ``ray.put``;
    each batch scores against ALL anchors in one matmul and emits only
    its per-(batch, anchor) top-k via a segmented lexsort (partial
    top-k — k*A rows leave each task regardless of batch size); the
    final exact rank is one tiny groupby over A anchors. The dup-gate
    compares the ROUNDED cosine exactly like the SQL mirror."""
    import pyarrow.parquet as pq

    at = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", n_anchors)])
    order = pa.compute.sort_indices(at, sort_keys=[("vec_id", "ascending")])
    at = at.take(order)
    anchors = embs_to_numpy(at.column("embedding"))
    a_ids = at.column("vec_id").to_numpy().astype(np.int64)
    norms = np.linalg.norm(anchors, axis=1)
    norms[norms == 0] = 1.0
    a_ref = ray.put((anchors / norms[:, None], a_ids))

    def score(t: pa.Table) -> pa.Table:
        an, aid = ray.get(a_ref)
        embs = embs_to_numpy(t.column("embedding"))
        vn = np.linalg.norm(embs, axis=1)
        vn[vn == 0] = 1.0
        sims = round_half_away((embs / vn[:, None]) @ an.T)   # (n, A)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        n, a = sims.shape
        anchor_l = np.repeat(aid, n)
        vec_l = np.tile(ids, a)
        cos_l = sims.T.ravel()
        keep = (vec_l != anchor_l) & (cos_l < HN_DUP_COS)
        anchor_l, vec_l, cos_l = anchor_l[keep], vec_l[keep], cos_l[keep]
        # segmented partial top-k: one lexsort, rank within anchor runs
        o = np.lexsort((vec_l, -cos_l, anchor_l))
        anchor_l, vec_l, cos_l = anchor_l[o], vec_l[o], cos_l[o]
        new = np.ones(len(anchor_l), dtype=bool)
        new[1:] = anchor_l[1:] != anchor_l[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        rank = np.arange(len(anchor_l)) - starts[seg]
        top = rank < k
        return pa.table({
            "anchor_id": pa.array(anchor_l[top], pa.int64()),
            "vec_id": pa.array(vec_l[top], pa.int64()),
            "cosine": pa.array(cos_l[top], pa.float64())})

    def final_rank(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["cosine", "vec_id"],
                            ascending=[False, True]).head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return (ds.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("anchor_id")              # A groups — tiny
            .map_groups(final_rank, batch_format="pandas"))


_HARD_NEG_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
a AS (SELECT vec_id AS anchor_id, emb AS ae FROM e
      WHERE vec_id < {HN_ANCHORS}),
scored AS (
  SELECT a.anchor_id, e.vec_id,
         round(list_cosine_similarity(e.emb, a.ae), 4) AS cosine
  FROM e JOIN a ON e.vec_id <> a.anchor_id),
ranked AS (
  SELECT anchor_id, vec_id, cosine,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM scored WHERE cosine < {HN_DUP_COS})
SELECT anchor_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {HN_K}
"""


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

def _plane_sql_lists(dim: int = 64) -> list[str]:
    """Each hyperplane as a SQL DOUBLE[] literal (full-precision repr,
    round-trips to the identical float64)."""
    pl = _planes(dim)
    return ["[" + ", ".join(repr(float(x)) for x in pl[:, p]) + "]"
            for p in range(N_PLANES)]


def _ann_lsh_oracle_sql(k: int = 10) -> str:
    planes = _plane_sql_lists()
    def key_expr(col: str, off: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {planes[off + p]}) > 0 "
            f"THEN {1 << p} ELSE 0 END)" for p in range(_HALF))

    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
keyed AS (
  SELECT vec_id, emb,
         {key_expr('emb', 0)} AS k1,
         {key_expr('emb', _HALF)} AS k2
  FROM e),
qk AS (SELECT {key_expr('qe', 0)} AS k1, {key_expr('qe', _HALF)} AS k2 FROM q)
SELECT vec_id,
       round(list_cosine_similarity(emb, (SELECT qe FROM q)), 4) AS cosine
FROM keyed
WHERE k1 = (SELECT k1 FROM qk) OR k2 = (SELECT k2 FROM qk)
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def ivf_oracle_sql(sf_dir: str = "/root/testdata/sf0.01",
                   k: int = 10, nprobe: int = IVF_NPROBE) -> str:
    """Generated for the driver-gate tier: recompute the deterministic
    centroids in Python, inline them (and the probe set for query vec 0)
    as constants, assign each vector with the same argmin formula, and
    take the cosine top-k over the probed cells."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    cents = train_centroids(_ivf_train_set(sf_dir), ivf_k(n))
    q = _query_vector(sf_dir, 0)
    d = -2.0 * (cents @ q) + (cents * cents).sum(axis=1)
    probes = ", ".join(str(int(c))
                       for c in np.argsort(d, kind="stable")[:nprobe])
    c_lists = ["[" + ", ".join(repr(float(x)) for x in c) + "]" for c in cents]
    norms = [(c * c).sum() for c in cents]
    dist_list = ", ".join(
        f"(-2 * list_dot_product(emb, {cl}) + {repr(float(nm))})"
        for cl, nm in zip(c_lists, norms))
    # read the pinned tier by absolute path (not the session's views):
    # the centroid/probe constants above were derived from THIS file
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
assigned AS (
  SELECT vec_id, emb,
         list_position(d, list_min(d)) - 1 AS cid
  FROM (SELECT vec_id, emb, [{dist_list}] AS d FROM e))
SELECT vec_id,
       round(list_cosine_similarity(emb, (SELECT qe FROM q)), 4) AS cosine
FROM assigned WHERE cid IN ({probes})
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def q_ann_recall(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                 nprobe: int = IVF_NPROBE) -> rd.Dataset:
    """Recall@k of the IVF index against the exact brute-force top-k —
    the index-quality check a curation pipeline runs before trusting an
    ANN index for near-dup/search at scale. Both sides are the existing
    bounded pipelines (k rows each), so the driver-side compare touches
    2k rows regardless of corpus size; at a real evaluation scale the
    same shape fans out over a query *set* with the per-query recalls
    aggregated by one tiny groupby."""
    exact = {r["vec_id"]
             for r in q_ann_topk(sf_dir, k, query_vec_id).take_all()}
    approx = {r["vec_id"]
              for r in q_ann_ivf_topk(sf_dir, k, query_vec_id,
                                      nprobe).take_all()}
    hits = len(exact & approx)
    return rd.from_arrow(pa.table({
        "k": pa.array([k], pa.int64()),
        "nprobe": pa.array([nprobe], pa.int64()),
        "n_hits": pa.array([hits], pa.int64()),
        "recall": pa.array([hits / k], pa.float64()),
    }))


def ann_recall_oracle_sql(sf_dir: str = "/root/testdata/sf0.01",
                          k: int = 10, nprobe: int = IVF_NPROBE) -> str:
    """Generated like ``ivf_oracle_sql`` (whose SELECT it embeds as the
    approx side); the exact side is the brute-force top-k over the same
    pinned tier with the identical rounding + tie-break."""
    ivf = ivf_oracle_sql(sf_dir, k, nprobe)
    return f"""
WITH approx AS ({ivf}),
exact AS (
  SELECT vec_id,
         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
               (SELECT CAST(embedding AS DOUBLE[])
                FROM read_parquet('{sf_dir}/embeddings.parquet')
                WHERE vec_id = 0)), 4) AS cosine
  FROM read_parquet('{sf_dir}/embeddings.parquet')
  ORDER BY cosine DESC, vec_id ASC LIMIT {k}),
hits AS (SELECT count(*) AS n FROM exact JOIN approx USING (vec_id))
SELECT CAST({k} AS BIGINT) AS k, CAST({nprobe} AS BIGINT) AS nprobe,
       CAST(n AS BIGINT) AS n_hits,
       n / CAST({k} AS DOUBLE) AS recall
FROM hits
"""


# ---------------------------------------------------------------------------
# knn_graph — per-vector top-k neighbor graph over LSH candidates
# ---------------------------------------------------------------------------

KNN_K = 5

# tier-keyed materialized kNN graphs: q_knn_label_acc (and any future
# graph consumer) reuses the object-store blocks instead of re-paying
# the LSH candidate build — same cache discipline as dedup._PAIR_CACHE
# (full normalized path + params as the key)
_KNN_CACHE: dict[tuple[str, int], rd.Dataset] = {}


def q_knn_graph(sf_dir: str, k: int = KNN_K) -> rd.Dataset:
    import os

    key = (os.path.normpath(os.path.abspath(sf_dir)), k)
    if key not in _KNN_CACHE:
        _KNN_CACHE[key] = _knn_graph_build(sf_dir, k).materialize()
    return _KNN_CACHE[key]


def _knn_graph_build(sf_dir: str, k: int = KNN_K) -> rd.Dataset:
    """Per-vector top-k cosine neighbor graph — the kNN graph behind
    SemDeDup-style pruning, graph-based diversification, and
    label-propagation curation. Built from the SAME banded sign-LSH
    candidate machinery as ``dedup.q_embedding_neardup`` with the
    similarity floor removed (every in-bucket candidate pair competes):
    a vector's neighbor pool is its bucket-mates across the 8 bands —
    the standard LSH-kNN recall trade, exact within candidates, never
    all-pairs.

    One wide shuffle total (the (band, bucket) groupby inside the pair
    search); the symmetrize + rank tail is the ``keep_max_by``
    discipline — per-block partial top-k (Arrow sort + pandas
    groupby.head, both C), ONE keyed repartition to co-locate each
    vec_id's survivors, and the same vectorized pass finishes with a
    cumcount rank. No per-group Python dispatch. Ranking orders on the
    ROUNDED cosine (4 dp — the value the DuckDB oracle reproduces
    bit-for-bit) with neighbor-id tie-break, so ranks are deterministic
    across engines."""
    import pandas as pd

    from .common import drop_empty_blocks, strip_schema_metadata
    from .dedup import q_embedding_neardup

    pairs = q_embedding_neardup(sf_dir, threshold=-1.0)

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("vec_a").combine_chunks()
        b = t.column("vec_b").combine_chunks()
        c = t.column("cosine").combine_chunks()
        return pa.table({"vec_id": pa.chunked_array([a, b]),
                         "neighbor": pa.chunked_array([b, a]),
                         "cosine": pa.chunked_array([c, c])})

    def topk_pass(df: "pd.DataFrame") -> pa.Table:
        df = df.sort_values(["vec_id", "cosine", "neighbor"],
                            ascending=[True, False, True], kind="mergesort")
        # Arrow out, metadata stripped: pandas blocks entering the keyed
        # repartition disable the shuffle's schema-dedup fast path
        return strip_schema_metadata(pa.Table.from_pandas(
            df.groupby("vec_id", sort=False).head(k), preserve_index=False))

    from .common import keyed_repartition

    partial = drop_empty_blocks(
        pairs.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(topk_pass, batch_format="pandas"))
    co = keyed_repartition(partial, ["vec_id"])

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["vec_id", "cosine", "neighbor"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("vec_id", sort=False).head(k).copy()
        df["rank"] = df.groupby("vec_id", sort=False).cumcount() + 1
        return df[["vec_id", "neighbor", "rank", "cosine"]]

    return co.map_batches(final, batch_format="pandas")


def knn_graph_oracle_sql() -> str:
    from .dedup import _embedding_neardup_oracle_sql

    inner = _embedding_neardup_oracle_sql(threshold=-1.0)
    return f"""
WITH pairs AS (SELECT * FROM ({inner})),
sym AS (
  SELECT vec_a AS vec_id, vec_b AS neighbor, cosine FROM pairs
  UNION ALL
  SELECT vec_b AS vec_id, vec_a AS neighbor, cosine FROM pairs)
SELECT vec_id, neighbor,
       CAST(row_number() OVER (PARTITION BY vec_id
                               ORDER BY cosine DESC, neighbor) AS BIGINT)
         AS "rank",
       cosine
FROM sym QUALIFY "rank" <= {KNN_K}
"""


ORACLE_SQL = {
    "ann_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    (SELECT CAST(qe AS DOUBLE[]) FROM q)), 4) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
    "embedding_norms": """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))), 4) AS l2
FROM embeddings
""",
    "ann_lsh_topk": _ann_lsh_oracle_sql(),
    "embedding_quantize": """
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> abs(x))) / 127.0 AS scale
  FROM embeddings)
SELECT vec_id, scale,
       CAST(list_sum(list_transform(emb,
            x -> floor(abs(x) / scale + 0.5))) AS BIGINT) AS sum_abs_q,
       CAST(len(list_filter(emb,
            x -> floor(abs(x) / scale + 0.5) = 0)) AS BIGINT) AS n_zero
FROM s
""",
}

ORACLE_SQL["knn_graph"] = knn_graph_oracle_sql()
ORACLE_SQL["ann_pq"] = ann_pq_oracle_sql()
ORACLE_SQL["ann_ivf_pq_topk"] = ann_ivf_pq_oracle_sql()
ORACLE_SQL["hard_negatives"] = _HARD_NEG_SQL

QUERIES = {
    "ann_pq": q_ann_pq,
    "ann_ivf_pq_topk": q_ann_ivf_pq_topk,
    "hard_negatives": q_hard_negatives,
    "knn_graph": q_knn_graph,
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_recall": q_ann_recall,
    "embedding_norms": q_embedding_norms,
    "embedding_quantize": q_embedding_quantize,
    "semdedup": q_semdedup,
}


# ---------------------------------------------------------------------------
# cluster purity — clustering quality vs the fixture's ground-truth labels
# ---------------------------------------------------------------------------

def q_cluster_purity(sf_dir: str) -> rd.Dataset:
    """Clustering-quality evaluation against the embeddings table's
    ground-truth ``label`` column: every vector is assigned to its
    deterministic k-means cluster, and each cluster reports its size,
    majority label (ties break to the smaller label) and the majority
    count — purity = n_top / n_vecs, the standard external clustering
    metric, left as integers so the result is exact.

    Scale shape: one assignment map (centroids broadcast via ray.put),
    per-batch (cid, label) count partials fused into one int64 key, ONE
    groupby-sum whose key domain is bounded by k x |labels| (never the
    corpus), then the bounded result flows through the single-group
    majority pass (the ``_vocab_topk_ds`` tail shape)."""
    import pandas as pd

    from .common import drop_empty_blocks

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    cents = train_centroids(_ivf_train_set(sf_dir), ivf_k(ds.count()))
    c_ref = ray.put(cents)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cid": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = ray.get(c_ref)
        embs = embs_to_numpy(t.column("embedding"))
        d = -2.0 * (embs @ c.T) + (c * c).sum(axis=1)[None, :]
        cid = np.argmin(d, axis=1).astype(np.int64)
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64)
        fused = cid * (1 << 32) + lab
        u, cnt = np.unique(fused, return_counts=True)
        return pa.table({"cid": pa.array(u >> 32),
                         "label": pa.array(u & 0xFFFFFFFF),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = drop_empty_blocks(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
    ).groupby(["cid", "label"]).sum("n")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array([0] * t.num_rows, pa.int8()))

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.rename(columns={"sum(n)": "n"})
        tot = df.groupby("cid", sort=False)["n"].sum()
        top = (df.sort_values(["cid", "n", "label"],
                              ascending=[True, False, True])
               .groupby("cid", sort=False).head(1))
        out = top[["cid", "label", "n"]].rename(
            columns={"label": "top_label", "n": "n_top"})
        out["n_vecs"] = out["cid"].map(tot)
        return out[["cid", "n_vecs", "top_label", "n_top"]].astype("int64")

    return (agg.map_batches(tag, batch_format="pyarrow")
            .groupby("g").map_groups(final, batch_format="pandas"))


def cluster_purity_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Generated for the driver-gate tier like ``semdedup_oracle_sql``:
    inline the deterministic centroids, assign with the same argmin
    formula, majority label per cluster via a window rank."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    cents = train_centroids(_ivf_train_set(sf_dir), ivf_k(n))
    c_lists = ["[" + ", ".join(repr(float(x)) for x in c) + "]" for c in cents]
    norms = [(c * c).sum() for c in cents]
    dist_list = ", ".join(
        f"(-2 * list_dot_product(emb, {cl}) + {repr(float(nm))})"
        for cl, nm in zip(c_lists, norms))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
assigned AS (
  SELECT vec_id, label,
         list_position(d, list_min(d)) - 1 AS cid
  FROM (SELECT vec_id, label, [{dist_list}] AS d FROM e)),
cl AS (SELECT cid, label, count(*) AS n FROM assigned GROUP BY cid, label),
tot AS (SELECT cid, sum(n) AS n_vecs FROM cl GROUP BY cid),
ranked AS (
  SELECT cid, label, n,
         row_number() OVER (PARTITION BY cid
                            ORDER BY n DESC, label ASC) AS rn
  FROM cl)
SELECT CAST(r.cid AS BIGINT) AS cid,
       CAST(t.n_vecs AS BIGINT) AS n_vecs,
       CAST(r.label AS BIGINT) AS top_label,
       CAST(r.n AS BIGINT) AS n_top
FROM ranked r JOIN tot t USING (cid)
WHERE r.rn = 1
"""


ORACLE_SQL["cluster_purity"] = cluster_purity_oracle_sql()
QUERIES["cluster_purity"] = q_cluster_purity


# ---------------------------------------------------------------------------
# kNN label consistency — classifier-style eval of the neighbor graph
# ---------------------------------------------------------------------------

def q_knn_label_acc(sf_dir: str) -> rd.Dataset:
    """kNN label-consistency: predict every vector's label by majority
    vote over its LSH-kNN neighbors (ties break to the smaller label;
    vectors with no candidates count as wrong) and report per-label
    totals and correct counts — the standard embedding-quality probe
    against the fixture's ground-truth ``label`` column, integers only.

    Scale shape: the kNN graph comes from ``q_knn_graph`` (exact within
    LSH candidate buckets, never all-pairs); neighbor labels attach via
    ONE hash join against the embeddings table (cluster-derived
    fan-out, no corpus-sized broadcast); per-batch fused (vec, label)
    vote partials -> one groupby-sum; the majority pick is a keyed
    segmented pass; own labels attach via a second hash join; the
    per-label rollup is a bounded groupby-sum."""
    import pandas as pd

    from .common import drop_empty_blocks, join_parts, keyed_repartition

    knn = q_knn_graph(sf_dir).select_columns(["vec_id", "neighbor"])
    labels = _t(sf_dir, "embeddings", ["vec_id", "label"])

    def lab_tbl(t: pa.Table) -> pa.Table:
        return pa.table({
            "lvec": pc.cast(t.column("vec_id"), pa.int64()),
            "label": pc.cast(t.column("label"), pa.int64())})

    lab = labels.map_batches(lab_tbl, batch_format="pyarrow",
                             zero_copy_batch=True)
    votes_raw = drop_empty_blocks(knn).join(
        lab, join_type="inner", num_partitions=join_parts(),
        on=("neighbor",), right_on=("lvec",))

    def vote_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "nlabel": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = t.column("vec_id").to_numpy(zero_copy_only=False)
        l = t.column("label").to_numpy(zero_copy_only=False)
        u, c = np.unique(v * (1 << 32) + l, return_counts=True)
        return pa.table({"vec_id": pa.array(u >> 32),
                         "nlabel": pa.array(u & 0xFFFFFFFF),
                         "n": pa.array(c.astype(np.int64))})

    votes = drop_empty_blocks(
        votes_raw.map_batches(vote_partial, batch_format="pyarrow")
    ).groupby(["vec_id", "nlabel"]).sum("n")

    def majority(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.rename(columns={"sum(n)": "n"})
        df = df.sort_values(["vec_id", "n", "nlabel"],
                            ascending=[True, False, True], kind="mergesort")
        top = df.groupby("vec_id", sort=False).head(1)
        return top[["vec_id", "nlabel"]].rename(columns={"nlabel": "pred"})

    pred = keyed_repartition(votes, ["vec_id"]).map_batches(
        majority, batch_format="pandas")
    scored = drop_empty_blocks(lab).join(
        drop_empty_blocks(pred), join_type="left_outer",
        num_partitions=join_parts(), on=("lvec",), right_on=("vec_id",))

    def per_label(t: pa.Table) -> pa.Table:
        lbl = t.column("label").to_numpy(zero_copy_only=False)
        pr = t.column("pred").to_numpy(zero_copy_only=False)
        correct = (pr == lbl) & ~pc.is_null(t.column("pred")).to_numpy(
            zero_copy_only=False)
        u, tot = np.unique(lbl, return_counts=True)
        ok = np.bincount(
            np.searchsorted(u, lbl[correct]), minlength=len(u))
        return pa.table({"label": pa.array(u.astype(np.int64)),
                         "n_vecs": pa.array(tot.astype(np.int64)),
                         "n_correct": pa.array(ok.astype(np.int64))})

    from ray.data.aggregate import Sum

    return (drop_empty_blocks(
        scored.map_batches(per_label, batch_format="pyarrow"))
        .groupby("label")
        .aggregate(Sum("n_vecs", alias_name="n_vecs"),
                   Sum("n_correct", alias_name="n_correct")))


def knn_label_acc_oracle_sql() -> str:
    knn = knn_graph_oracle_sql()
    return f"""
WITH knn AS ({knn}),
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
votes AS (
  SELECT k.vec_id, l2.label AS nlabel, count(*) AS n
  FROM knn k JOIN lab l2 ON l2.vec_id = k.neighbor
  GROUP BY k.vec_id, l2.label),
pred AS (
  SELECT vec_id, nlabel AS pred
  FROM (SELECT vec_id, nlabel,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY n DESC, nlabel ASC) AS rn
        FROM votes)
  WHERE rn = 1)
SELECT l.label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(*) FILTER (p.pred = l.label) AS BIGINT) AS n_correct
FROM lab l LEFT JOIN pred p USING (vec_id)
GROUP BY l.label
"""


ORACLE_SQL["knn_label_acc"] = knn_label_acc_oracle_sql()
QUERIES["knn_label_acc"] = q_knn_label_acc
