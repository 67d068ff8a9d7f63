"""ANN index paths: IVF and LSH must find planted near neighbors and
stay deterministic across rebuilds."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(d, n=400, dim=32, seed=3):
    rng = np.random.default_rng(seed)
    embs = rng.standard_normal((n, dim)).astype(np.float32)
    # vec 0 is the query; plant two near neighbors of it
    embs[7] = embs[0] + rng.standard_normal(dim).astype(np.float32) * 0.05
    embs[11] = embs[0] + rng.standard_normal(dim).astype(np.float32) * 0.05
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([e.tolist() for e in embs],
                              pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_finds_planted_neighbors(tmp_path):
    from scraper_ray.pipelines.ann import q_ann_ivf_topk, q_ann_topk

    _write_embeddings(tmp_path)
    got = q_ann_ivf_topk(str(tmp_path), k=5).to_pandas()
    # the query's own cell always contains itself + its planted twins
    ids = got["vec_id"].tolist()
    assert ids[0] == 0 and got["cosine"].iloc[0] == 1.0
    assert {7, 11} <= set(ids)
    # determinism: a second build in a fresh cache yields identical rows
    import scraper_ray.pipelines.ann as ann

    ann._IVF_CACHE.clear()
    again = q_ann_ivf_topk(str(tmp_path), k=5).to_pandas()
    assert got.values.tolist() == again.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_ivf_centroid_training_deterministic(tmp_path):
    from scraper_ray.pipelines.ann import _ivf_train_set, train_centroids

    _write_embeddings(tmp_path)
    a = train_centroids(_ivf_train_set(str(tmp_path)), 8)
    b = train_centroids(_ivf_train_set(str(tmp_path)), 8)
    assert np.array_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_lsh_topk_contains_query(tmp_path):
    from scraper_ray.pipelines.ann import q_ann_lsh_topk

    _write_embeddings(tmp_path)
    got = q_ann_lsh_topk(str(tmp_path), k=5).to_pandas()
    # the query matches its own signature in both bands -> always a hit,
    # deduped to a single row
    assert got["vec_id"].tolist()[0] == 0
    assert got["vec_id"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_semdedup_drops_planted_twins_keeps_rest(tmp_path):
    """Planted near-duplicates of vec 0 land in its cluster and must be
    dropped (keep=0) in favor of the lowest id; unrelated vectors keep."""
    from scraper_ray.pipelines.ann import q_semdedup

    _write_embeddings(tmp_path)
    got = q_semdedup(str(tmp_path), threshold=0.9).to_pandas()
    assert len(got) == 400                        # one row per vector
    by_id = got.set_index("vec_id")
    assert by_id.loc[0, "keep"] == 1              # representative kept
    assert by_id.loc[7, "keep"] == 0
    assert by_id.loc[11, "keep"] == 0
    # twins share vec 0's cluster
    assert by_id.loc[7, "cid"] == by_id.loc[0, "cid"]
    # random vectors at dim 32 never reach cosine 0.9 pairwise
    others = by_id.drop(index=[7, 11])
    assert (others["keep"] == 1).all()


@pytest.mark.usefixtures("ray_session")
def test_ann_recall_bounds_and_planted_hits(tmp_path):
    """Recall@k is in [0,1], n_hits consistent, and the planted twins
    guarantee at least self+twins overlap between exact and IVF top-5."""
    from scraper_ray.pipelines.ann import q_ann_recall

    _write_embeddings(tmp_path)
    row = q_ann_recall(str(tmp_path), k=5).to_pandas().iloc[0]
    assert row["k"] == 5 and 0 <= row["n_hits"] <= 5
    assert row["recall"] == row["n_hits"] / 5
    # query vec 0 and its planted twins sit in the probed cell on both sides
    assert row["n_hits"] >= 3


def test_hard_negatives_excludes_near_dups(ray_session, tmp_path):
    """A planted exact duplicate of an anchor (cosine 1.0 >= the dup
    gate) must NOT appear among its hard negatives; a moderately
    similar vector must. Rank is dense 1..k per anchor."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.ann import HN_DUP_COS, q_hard_negatives

    rng = np.random.default_rng(3)
    dim = 64
    base = rng.normal(size=dim)
    vecs = [base]                      # anchor 0
    vecs.append(base * 2.0)            # vec 1: exact dup direction (cos 1)
    near = base + 0.5 * rng.normal(size=dim)   # similar but below gate
    vecs.append(near)
    vecs += [rng.normal(size=dim) for _ in range(30)]
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))})
    d = tmp_path / "hn"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))

    out = q_hard_negatives(str(d), n_anchors=1, k=5).to_pandas()
    a0 = out[out["anchor_id"] == 0]
    assert 1 not in set(a0["vec_id"]), a0        # dup excluded
    assert (a0["cosine"] < HN_DUP_COS).all()
    assert sorted(a0["rank"]) == list(range(1, len(a0) + 1))
    assert 2 in set(a0["vec_id"])                # similar-but-distinct kept


def test_pq_key_packs_codes(ray_session):
    """pq_key must equal the big-endian base-16 packing of code0..7."""
    from scraper_ray.pipelines.ann import PQ_K, PQ_M, q_ann_pq

    df = q_ann_pq("/root/testdata/sf0.001").to_pandas()
    key = df["code0"].astype("int64")
    for m in range(1, PQ_M):
        key = key * PQ_K + df[f"code{m}"]
    assert (df["pq_key"] == key).all()
    assert ((df[[f"code{m}" for m in range(PQ_M)]] >= 0).all().all()
            and (df[[f"code{m}" for m in range(PQ_M)]] < PQ_K).all().all())
