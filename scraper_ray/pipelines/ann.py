"""Approximate-nearest-neighbor search over the embeddings table.

- ``ann_topk`` — brute-force cosine top-k: the query matrix is broadcast
  once (``ray.put``), each batch does one float64 matmul against it, and
  per-batch partial top-k rows flow into a tiny global sort+limit. This
  is the exact baseline and the verification oracle for the scale path.
- ``ann_lsh_topk`` — sign-LSH bucketed variant: candidates share at
  least one hyperplane-signature band with the query; only candidates
  are scored. At 100 TB the bucket keys become the shuffle/partition key
  and the brute-force pass never happens.

Determinism: similarities are computed in float64 and rounded to 4
decimals; ordering ties break on vec_id. Hyperplanes are seeded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


from .common import read_sf_table as _t


def _query_vector(sf_dir: str, query_vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t.column("vec_id").to_pylist().index(query_vec_id)
    return np.asarray(t.column("embedding")[idx].as_py(), dtype=np.float64)


def q_ann_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> rd.Dataset:
    """Exact cosine top-k to the query vector (brute force baseline)."""
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        embs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs / norms[:, None]) @ qv
        out = pa.table({"vec_id": t.column("vec_id"),
                        "cosine": pa.array(np.round(sims, 4))})
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


def q_ann_lsh_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0,
                   n_planes: int = 8) -> rd.Dataset:
    """Sign-LSH pre-filtered top-k: score only vectors whose signature
    matches the query's in at least one of two plane bands."""
    q = _query_vector(sf_dir, query_vec_id)
    dim = q.shape[0]
    planes = np.random.default_rng(11).standard_normal((dim, n_planes))
    q_sig = (q @ planes) > 0
    half = n_planes // 2
    qn = q / (np.linalg.norm(q) or 1.0)
    state = ray.put((qn, planes, q_sig))

    def score(t: pa.Table) -> pa.Table:
        qv, pl, qs = ray.get(state)
        embs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        sigs = (embs @ pl) > 0
        cand = (sigs[:, :half] == qs[:half]).all(axis=1) | (
            sigs[:, half:] == qs[half:]
        ).all(axis=1)
        if not cand.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        embs = embs[cand]
        ids = np.asarray(t.column("vec_id").to_pylist())[cand]
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs / norms[:, None]) @ qv
        out = pa.table({"vec_id": pa.array(ids.astype("int64")),
                        "cosine": pa.array(np.round(sims, 4))})
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


def q_embedding_norms(sf_dir: str) -> rd.Dataset:
    """Per-vector L2 norm (rounded) — the simplest vector kernel, used to
    anchor the float pipeline against the SQL oracle."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def f(t: pa.Table) -> pa.Table:
        embs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        return pa.table({"vec_id": t.column("vec_id"),
                         "l2": pa.array(np.round(np.linalg.norm(embs, axis=1), 4))})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


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
}

QUERIES = {
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "embedding_norms": q_embedding_norms,
}
