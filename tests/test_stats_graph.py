"""Unit tests for the iterative connected-components operator."""

import pyarrow as pa
import ray.data as rd

from scraper_ray.pipelines.graph import connected_components


def _edges(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    return rd.from_arrow(pa.table({"doc_a": pa.array(a, pa.int64()),
                                   "doc_b": pa.array(b, pa.int64())}))


def _labels(ds):
    out = ds.to_pandas()
    return dict(zip(out["doc_id"], out["cluster_id"]))


def test_chain_collapses_to_one_component():
    # 1-2, 2-3, 3-4: transitive even though 1 and 4 never share an edge
    got = _labels(connected_components(_edges([(1, 2), (2, 3), (3, 4)])))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_keep_separate_labels():
    got = _labels(connected_components(
        _edges([(10, 11), (5, 7), (7, 6), (99, 98)])))
    assert got == {10: 10, 11: 10, 5: 5, 6: 5, 7: 5, 98: 98, 99: 98}


def test_long_path_needs_multiple_rounds():
    # a 12-node path exercises >1 propagation round (diameter 11);
    # inline_edge_cap=0 forces the DISTRIBUTED min-label plan (the
    # default would take the driver union-find fast path here)
    pairs = [(i, i + 1) for i in range(100, 112)]
    got = _labels(connected_components(_edges(pairs), inline_edge_cap=0))
    assert set(got.values()) == {100}
    assert len(got) == 13


def test_inline_and_distributed_paths_agree():
    pairs = [(1, 2), (2, 3), (9, 8), (7, 8), (20, 21)]
    fast = _labels(connected_components(_edges(pairs)))
    slow = _labels(connected_components(_edges(pairs), inline_edge_cap=0))
    assert fast == slow == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7, 20: 20, 21: 20}


def test_string_node_ids_cluster_lexicographically():
    # crawl doc_ids are sha1 strings; min-label = lexicographic min
    ds = rd.from_arrow(pa.table({
        "doc_a": pa.array(["bb", "cc", "zz"], pa.string()),
        "doc_b": pa.array(["cc", "aa", "yy"], pa.string())}))
    out = connected_components(ds).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {"aa": "aa", "bb": "aa", "cc": "aa",
                   "yy": "yy", "zz": "yy"}


def test_empty_edge_list_yields_empty_clusters():
    ds = connected_components(_edges([]))
    assert ds.count() == 0
    assert set(ds.schema().names) == {"doc_id", "cluster_id"}


# ---------------------------------------------------------------------------
# integer-exact PageRank (graph.pagerank)
# ---------------------------------------------------------------------------

def _pr_reference(nodes, edges, iters):
    """Sequential mirror of the integer PageRank formula."""
    from scraper_ray.pipelines.graph import PR_SCALE

    n = len(nodes)
    r0 = PR_SCALE // n
    base = (15 * r0) // 100
    outdeg: dict = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: r0 for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_sequential_reference(ray_session):
    from scraper_ray.pipelines.graph import pagerank

    nodes = ["a", "b", "c", "d", "e"]   # e is dangling & unlinked
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c")]
    nds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.string())}))
    eds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    want = _pr_reference(nodes, edges, 4)
    # both plans: inline numpy fast path AND the distributed iterations
    for cap in (2_000_000, 0):
        out = pagerank(nds, eds, iters=4, inline_edge_cap=cap).to_pandas()
        got = dict(zip(out["doc_id"], out["pr"]))
        assert got == want, cap
    # c has the highest in-degree -> highest rank; unlinked e the lowest
    assert got["c"] == max(got.values())
    assert got["e"] == min(got.values())


def test_pagerank_mass_is_conserved_modulo_floor_loss(ray_session):
    """Total rank never exceeds SCALE; floor division + dangling nodes
    only ever LOSE mass (deterministically)."""
    from scraper_ray.pipelines.graph import PR_SCALE, pagerank

    nodes = [f"n{i}" for i in range(7)]
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 7}") for i in range(6)]
    nds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.string())}))
    eds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    out = pagerank(nds, eds, iters=3).to_pandas()
    assert len(out) == 7
    assert 0 < out["pr"].sum() <= PR_SCALE


def test_link_components_mass_conservation(ray_session):
    """Component sizes sum to the doc count (singletons included), and
    no component is larger than the corpus."""
    from scraper_ray.pipelines.crawl_queries import _run_crawl
    from scraper_ray.pipelines.graph import q_link_components

    sf = "/root/testdata/sf0.001"
    hist = q_link_components(sf).to_pandas()
    n_docs = _run_crawl(sf).count()
    assert int((hist["component_size"] * hist["n_components"]).sum()) == n_docs
    assert hist["component_size"].max() <= n_docs
    assert (hist["n_components"] > 0).all()


def test_host_graph_edge_mass(ray_session):
    """Host-graph link counts sum to the distinct doc-edge count."""
    from scraper_ray.pipelines.crawl_queries import _cfg_for, _run_crawl
    from scraper_ray.pipelines.graph import crawl_link_edges, q_host_graph

    sf = "/root/testdata/sf0.001"
    web, _ = _cfg_for(sf)
    docs = _run_crawl(sf)
    hg = q_host_graph(sf).to_pandas()
    assert int(hg["n_links"].sum()) == crawl_link_edges(docs, web).count()
    assert hg.set_index(["src_domain", "dst_domain"]).index.is_unique


# ---------------------------------------------------------------------------
# integer-exact HITS (graph.hits)
# ---------------------------------------------------------------------------

def _hits_reference(nodes, edges, iters):
    """Sequential mirror of the integer HITS formula."""
    from scraper_ray.pipelines.graph import HITS_SCALE

    h = {v: HITS_SCALE for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        a_raw = {v: 0 for v in nodes}
        for u, v in edges:
            a_raw[v] += h[u]
        qa = max(1, max(a_raw.values(), default=0) // HITS_SCALE)
        a = {v: a_raw[v] // qa for v in nodes}
        h_raw = {v: 0 for v in nodes}
        for u, v in edges:
            h_raw[u] += a[v]
        qh = max(1, max(h_raw.values(), default=0) // HITS_SCALE)
        h = {v: h_raw[v] // qh for v in nodes}
    return h, a


def test_hits_matches_sequential_reference(ray_session):
    from scraper_ray.pipelines.graph import hits

    nodes = ["a", "b", "c", "d", "e"]   # a is the hub; c the authority
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("d", "c")]
    nds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.string())}))
    eds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    want_h, want_a = _hits_reference(nodes, edges, 3)
    # both plans: inline numpy fast path AND the distributed iterations
    for cap in (2_000_000, 0):
        out = hits(nds, eds, iters=3, inline_edge_cap=cap).to_pandas()
        got_h = dict(zip(out["doc_id"], out["hub"]))
        got_a = dict(zip(out["doc_id"], out["auth"]))
        assert got_h == want_h, cap
        assert got_a == want_a, cap
    # the fan-out page is the best hub; the most-linked page the best
    # authority; the isolated node scores zero on both
    assert got_h["a"] == max(got_h.values())
    assert got_a["c"] == max(got_a.values())
    assert got_h["e"] == 0 and got_a["e"] == 0


def test_hits_scores_bounded_by_scale(ray_session):
    """Rescale-by-max keeps every score in [0, ~2*SCALE] and the max
    score lands in [SCALE, 2*SCALE) whenever the graph has edges."""
    from scraper_ray.pipelines.graph import HITS_SCALE, hits

    nodes = [f"n{i}" for i in range(9)]
    edges = [(f"n{i}", f"n{(i * 5 + 2) % 9}") for i in range(8)]
    nds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.string())}))
    eds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    out = hits(nds, eds, iters=3).to_pandas()
    assert len(out) == 9
    for col in ("hub", "auth"):
        assert (out[col] >= 0).all()
        assert HITS_SCALE <= out[col].max() < 2 * HITS_SCALE


# ---------------------------------------------------------------------------
# URL-template mining and cross-domain mirror detection
# ---------------------------------------------------------------------------

def test_url_patterns_mass_and_trap_signal(ray_session):
    """Template row counts sum to the doc count; the digit-collapsed
    template is digit-free; and the synthetic web's item template shows
    the trap signature (many URLs, fewer entities)."""
    from scraper_ray.pipelines.crawl_queries import _run_crawl, q_url_patterns

    sf = "/root/testdata/sf0.001"
    pats = q_url_patterns(sf).to_pandas()
    assert int(pats["n_urls"].sum()) == _run_crawl(sf).count()
    assert not pats["url_pattern"].str.contains(r"[0-9]").any()
    assert (pats["n_entities"] <= pats["n_urls"]).all()
    item = pats[pats["url_pattern"].str.contains("/item/")]
    assert (item["n_urls"] > item["n_entities"]).any()


def test_mirror_domains_pairs_are_ordered_and_grounded(ray_session):
    """Every reported pair is ordered (a < b), shares >= 1 fingerprint,
    and each shared count is bounded by the smaller domain's page count."""
    from scraper_ray.pipelines.crawl_queries import (_run_crawl,
                                                     q_mirror_domains)

    sf = "/root/testdata/sf0.001"
    pairs = q_mirror_domains(sf).to_pandas()
    assert len(pairs) > 0          # the synthetic web has shared pages
    assert (pairs["domain_a"] < pairs["domain_b"]).all()
    assert (pairs["n_shared"] >= 1).all()
    per_dom = _run_crawl(sf).to_pandas().groupby("domain_key").size()
    cap = pairs.apply(lambda r: min(per_dom[r["domain_a"]],
                                    per_dom[r["domain_b"]]), axis=1)
    assert (pairs["n_shared"] <= cap).all()


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------

def _str_edges(pairs):
    return rd.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string())}))


def _ids(names):
    return rd.from_arrow(pa.table({"doc_id": pa.array(names, pa.string())}))


def test_bfs_shortcut_beats_long_path():
    # s -> a -> b -> c (3 hops) but also s -> c directly: min-hop is 1,
    # which is exactly how BFS differs from a first-discovery depth
    from scraper_ray.pipelines.graph import bfs_hops

    nodes = _ids(["s", "a", "b", "c", "iso"])
    edges = _str_edges([("s", "a"), ("a", "b"), ("b", "c"), ("s", "c")])
    got = dict(zip(*[bfs_hops(nodes, edges, _ids(["s"])).to_pandas()[c]
                     for c in ("doc_id", "hops")]))
    assert got == {"s": 0, "a": 1, "b": 2, "c": 1, "iso": -1}


def test_bfs_inline_and_distributed_paths_agree():
    from scraper_ray.pipelines.graph import bfs_hops

    names = [f"n{i}" for i in range(12)]
    pairs = [(f"n{i}", f"n{i+1}") for i in range(11)] + [("n0", "n7")]
    a = bfs_hops(_ids(names), _str_edges(pairs), _ids(["n0"]))
    b = bfs_hops(_ids(names), _str_edges(pairs), _ids(["n0"]),
                 inline_edge_cap=0)
    pda = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pdb = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert pda.equals(pdb)
    got = dict(zip(pda["doc_id"], pda["hops"]))
    assert got["n7"] == 1 and got["n8"] == 2 and got["n6"] == 6


# ---------------------------------------------------------------------------
# HyperLogLog sketch
# ---------------------------------------------------------------------------

def test_hll_register_merge_equals_union():
    """Register-merge (elementwise max) of two shard sketches must equal
    the sketch of the union — the property that makes HLL mergeable
    across corpus shards without rescanning."""
    import numpy as np

    from scraper_ray.pipelines.sketch import _hll_partial

    a = [f"u{i}" for i in range(500)]
    b = [f"u{i}" for i in range(300, 900)]
    merged = np.maximum(_hll_partial(a), _hll_partial(b))
    assert np.array_equal(merged, _hll_partial(a + b))


def test_hll_estimate_within_tolerance():
    import numpy as np

    from scraper_ray.pipelines.sketch import (
        _hll_partial, hll_estimate_from_regs)

    n = 20_000
    est = hll_estimate_from_regs(_hll_partial([f"key-{i}" for i in range(n)]))
    # standard error ~1.04/sqrt(256) = 6.5%; 3 sigma
    assert abs(est - n) / n < 0.2, est


# ---------------------------------------------------------------------------
# inverted index posting blocks
# ---------------------------------------------------------------------------

def test_inverted_index_truncates_posting_block(tmp_path):
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.stats import (
        POSTINGS_BLOCK, q_inverted_index)

    n = POSTINGS_BLOCK + 17
    texts = ["common alpha" if i % 2 == 0 else "common beta"
             for i in range(2 * n)]
    tbl = pa.table({"doc_id": pa.array(range(2 * n), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    d = tmp_path / "inv"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = q_inverted_index(str(d)).to_pandas().set_index("token")
    assert out.loc["common", "df"] == 2 * n          # full df survives
    got = [int(x) for x in out.loc["common", "postings"].split(",")]
    assert got == sorted(range(2 * n))[:POSTINGS_BLOCK]   # first block only
    assert [int(x) for x in out.loc["alpha", "postings"].split(",")] == \
        sorted(i for i in range(2 * n) if i % 2 == 0)[:POSTINGS_BLOCK]


def test_triangle_census_on_planted_graph():
    """K4 plus a pendant edge: C(4,3)=4 triangles; oriented wedges are
    countable by hand. A star graph has zero oriented wedges (the
    degree orientation points every edge AT the hub)."""
    from scraper_ray.pipelines.graph import count_triangles

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("d", "e")]
    wedges, tris = count_triangles(_str_edges(k4))
    assert tris == 4
    assert wedges >= tris
    star = [("hub", f"leaf{i}") for i in range(6)]
    assert count_triangles(_str_edges(star)) == (0, 0)
    # direction and parallel/reverse duplicates must not change the census
    k4_rev = k4 + [(b, a) for a, b in k4]
    assert count_triangles(_str_edges(k4_rev))[1] == 4


def test_triangle_inline_and_distributed_plans_agree():
    """The driver numpy fast path and the distributed join plan are the
    same formula — force each on a pseudo-random graph and compare both
    counts exactly."""
    import random

    from scraper_ray.pipelines.graph import count_triangles

    rng = random.Random(7)
    edges = list({(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
                  for _ in range(160)})
    ds = _str_edges(edges)
    inline = count_triangles(ds)                       # inline (under cap)
    dist = count_triangles(ds, inline_edge_cap=0)      # distributed
    assert inline == dist
    assert inline[0] >= inline[1] >= 0


def test_hll_daily_exact_matches_distinct_daily(ray_session):
    """hll_daily's exact column must equal the canonical two-phase
    distinct per day, and the HLL estimate stays inside the standard
    error envelope (1.04/sqrt(m) ~ 6.5%; allow 4 sigma)."""
    from scraper_ray.pipelines.sketch import HLL_M, q_hll_daily
    from scraper_ray.pipelines.window import q_distinct_daily

    hd = q_hll_daily("/root/testdata/sf0.001").to_pandas().set_index("day")
    dd = (q_distinct_daily("/root/testdata/sf0.001").to_pandas()
          .set_index("day"))
    assert set(hd.index) == set(dd.index)
    dd = dd.reindex(hd.index)
    assert (hd["exact_distinct"] == dd["n_users"]).all()
    tol = 4 * 1.04 / (HLL_M ** 0.5)
    rel = ((hd["est_distinct"] - hd["exact_distinct"]).abs()
           / hd["exact_distinct"])
    assert (rel <= tol).all()


def test_cms_overestimates_and_merges_exactly():
    """CMS one-sided error: the sketch estimate never undercounts; and
    sketch-of-parts summed equals sketch-of-whole (exact merge)."""
    import numpy as np

    from scraper_ray.pipelines.sketch import _cms_partial

    a = {"alpha": 7, "beta": 3, "gamma": 11}
    b = {"alpha": 2, "delta": 5}
    whole = {"alpha": 9, "beta": 3, "gamma": 11, "delta": 5}
    assert np.array_equal(_cms_partial(a) + _cms_partial(b),
                          _cms_partial(whole))
    import hashlib

    from scraper_ray.pipelines.sketch import CMS_DEPTH, CMS_WIDTH

    regs = _cms_partial(whole)
    for tok, n in whole.items():
        est = min(regs[d, int(hashlib.md5(f"{d}:{tok}".encode())
                              .hexdigest()[:8], 16) % CMS_WIDTH]
                  for d in range(CMS_DEPTH))
        assert est >= n


def _tr_reference(nodes, trusted, edges, iters):
    from scraper_ray.pipelines.graph import PR_SCALE

    nt = sum(1 for v in nodes if v in trusted)
    r0 = PR_SCALE // nt
    base = (15 * r0) // 100
    outdeg: dict = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: (r0 if v in trusted else 0) for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {v: (base if v in trusted else 0) + (85 * s[v]) // 100
             for v in nodes}
    return r


def test_trustrank_inline_and_distributed_match_reference(ray_session):
    from scraper_ray.pipelines.graph import trustrank

    nodes = ["a", "b", "c", "d", "e"]   # e unlinked; d untrusted source
    trusted = {"a", "b"}
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c")]
    nds = rd.from_arrow(pa.table({
        "doc_id": pa.array(nodes, pa.string()),
        "trusted": pa.array([1 if v in trusted else 0 for v in nodes],
                            pa.int64())}))
    eds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    want = _tr_reference(nodes, trusted, edges, 4)
    for cap in (2_000_000, 0):   # inline numpy AND distributed plans
        out = trustrank(nds, eds, iters=4, inline_edge_cap=cap).to_pandas()
        got = dict(zip(out["doc_id"], out["tr"]))
        assert got == want, cap
    # untrusted, unlinked e gets exactly zero; seeds a/b hold mass
    assert got["e"] == 0
    assert got["a"] > 0 and got["b"] > 0


# ---------------------------------------------------------------------------
# ghost edge endpoints (ids absent from the node table) — the public-API
# invariant: ghosts never enter the rank/score output, ghost-dst mass
# evaporates like dangling mass (outdeg still counts the ghost edge)
# ---------------------------------------------------------------------------

def _pr_ghost_reference(nodes, edges, iters):
    """Sequential mirror with ghost handling: outdeg over ALL edges,
    contributions only along node->node edges."""
    from scraper_ray.pipelines.graph import PR_SCALE

    r0 = PR_SCALE // len(nodes)
    base = (15 * r0) // 100
    outdeg: dict = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: r0 for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            if u in r and v in s:
                s[v] += r[u] // outdeg[u]
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    return r


def test_pagerank_ghost_edges_evaporate_not_rank(ray_session):
    from scraper_ray.pipelines.graph import pagerank

    nodes = ["a", "b", "c"]
    # a->ghost halves a's per-edge contribution (od(a)=2, mass to the
    # ghost evaporates); phantom->c must contribute nothing
    edges = [("a", "b"), ("a", "ghost"), ("b", "c"), ("phantom", "c")]
    nds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.string())}))
    eds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    want = _pr_ghost_reference(nodes, edges, 3)
    for cap in (2_000_000, 0):   # inline numpy AND distributed plans
        out = pagerank(nds, eds, iters=3, inline_edge_cap=cap).to_pandas()
        got = dict(zip(out["doc_id"], out["pr"]))
        assert set(got) == set(nodes), cap      # no ghost rows, ever
        assert got == want, cap


def test_trustrank_ghost_edges_stay_out(ray_session):
    from scraper_ray.pipelines.graph import PR_SCALE, trustrank

    nodes = ["a", "b", "c"]
    trusted = {"a"}
    edges = [("a", "b"), ("a", "ghost"), ("b", "c"), ("phantom", "b")]
    nds = rd.from_arrow(pa.table({
        "doc_id": pa.array(nodes, pa.string()),
        "trusted": pa.array([1 if v in trusted else 0 for v in nodes],
                            pa.int64())}))
    eds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    r0 = PR_SCALE // 1
    base = (15 * r0) // 100
    # hand-unrolled 2 iterations: od(a)=2, ghost mass evaporates
    s1_b = r0 // 2
    r1 = {"a": base, "b": (85 * s1_b) // 100, "c": 0}
    s2_b, s2_c = r1["a"] // 2, r1["b"]
    want = {"a": base, "b": (85 * s2_b) // 100, "c": (85 * s2_c) // 100}
    for cap in (2_000_000, 0):
        out = trustrank(nds, eds, iters=2, inline_edge_cap=cap).to_pandas()
        got = dict(zip(out["doc_id"], out["tr"]))
        assert set(got) == set(nodes), cap
        assert got == want, cap


def test_hits_ghost_edges_dropped(ray_session):
    from scraper_ray.pipelines.graph import hits

    nodes = ["a", "b", "c"]
    edges = [("a", "b"), ("a", "ghost"), ("b", "c"), ("phantom", "c")]
    # the same graph with ghost edges pre-stripped is the expected
    # answer: HITS has no outdeg division, so full-edge removal is the
    # ghost semantics
    clean = [("a", "b"), ("b", "c")]
    nds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.string())}))

    def _eds(pairs):
        return rd.from_arrow(pa.table({
            "src": pa.array([e[0] for e in pairs], pa.string()),
            "dst": pa.array([e[1] for e in pairs], pa.string())}))

    want_df = hits(nds, _eds(clean), iters=3).to_pandas()
    want_h = dict(zip(want_df["doc_id"], want_df["hub"]))
    want_a = dict(zip(want_df["doc_id"], want_df["auth"]))
    for cap in (2_000_000, 0):
        out = hits(nds, _eds(edges), iters=3, inline_edge_cap=cap).to_pandas()
        got_h = dict(zip(out["doc_id"], out["hub"]))
        got_a = dict(zip(out["doc_id"], out["auth"]))
        assert set(got_h) == set(nodes), cap
        assert (got_h, got_a) == (want_h, want_a), cap
