"""Iterative graph operators: connected components over near-dup pairs.

Near-duplicate PAIRS (``dedup.q_minhash_pairs``) are only half the
dedup story — a corpus dedup needs CLUSTERS, so transitively-linked
docs collapse to one canonical representative (A~B, B~C => {A,B,C}
even when A and C never shared an LSH bucket).

``neardup_clusters`` computes them with distributed min-label
propagation, the standard bulk-synchronous connected-components plan:

    labels(v) = v
    repeat: labels(v) = min(labels(v), min over neighbors' labels)
    until no label changes

Each round is one hash-join (labels x edges) plus one ``groupby.min``
— both distributed shuffles over the PAIR graph, which is orders of
magnitude smaller than the corpus (only docs that near-dup anything).
Rounds needed = graph diameter (near-dup clusters are dense; single
digits in practice, capped + logged). Convergence is detected with a
scalar label-sum aggregate per round: labels only ever decrease, so an
unchanged sum IS the fixpoint — an O(1) driver check, not a data pull.
Each round materializes its (node, label) table — bounded by the pair
graph's node count — so lineage doesn't recompute prior rounds.

The DuckDB oracle recomputes the same clusters from the same pair SQL
with a recursive transitive-closure CTE.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .common import join_parts

from .common import drop_empty_blocks
from .dedup import _minhash_oracle_sql, q_minhash_pairs

logger = logging.getLogger(__name__)

MAX_ROUNDS = 30
# below this many directed edges the edge list streams to the driver and
# an exact union-find labels it in one pass — a near-dup pair graph is
# orders smaller than its corpus, so at bench/gate scale the iterative
# plan's 3-barriers-per-round overhead dwarfs the actual work. Past the
# cap the distributed min-label propagation runs unchanged.
_INLINE_EDGE_CAP = 2_000_000


def _one_chunk(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _empty_clusters(id_type: pa.DataType) -> rd.Dataset:
    return rd.from_arrow(pa.table({"doc_id": pa.array([], id_type),
                                   "cluster_id": pa.array([], id_type)}))


def _inline_union_find(dir_edges: rd.Dataset) -> rd.Dataset:
    """Exact single-pass union-find over a driver-bounded edge list;
    cluster_id = min node in the component (same contract as the
    distributed plan and the SQL oracle)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:            # path compression
            parent[x], x = root, parent[x]
        return root

    id_dtype = None
    for b in dir_edges.iter_batches(batch_format="pyarrow"):
        if id_dtype is None:
            id_dtype = b.column("u").type
        for u, v in zip(b.column("u").to_pylist(),
                        b.column("v").to_pylist()):
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
    # roots are unioned min-first, so find() already yields the
    # component's min node
    nodes = sorted(parent)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(nodes, id_dtype),
        "cluster_id": pa.array([find(n) for n in nodes], id_dtype)}))


def connected_components(edges: rd.Dataset,
                         src: str = "doc_a", dst: str = "doc_b",
                         num_partitions: int = 8,
                         id_type: pa.DataType = pa.int64(),
                         inline_edge_cap: int = _INLINE_EDGE_CAP
                         ) -> rd.Dataset:
    """(src, dst) edge list -> (doc_id, cluster_id=min reachable node).

    Node ids may be any orderable Arrow type (int64 driver keys, string
    crawl doc_ids); labels propagate by ``min`` in that type's order,
    and the oracle's ``least``/``min`` agree (lexicographic for
    VARCHAR). Nodes touched by at least one edge only; singletons are
    the caller's corpus minus this output (an anti-join, not
    recomputation). Edge lists at or under *inline_edge_cap* directed
    rows take the exact driver union-find fast path; larger graphs run
    the distributed propagation."""

    def both_dirs(t: pa.Table) -> pa.Table:
        a, b = _one_chunk(t.column(src)), _one_chunk(t.column(dst))
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    dir_edges = drop_empty_blocks(
        edges.map_batches(both_dirs, batch_format="pyarrow")).materialize()
    # id_type only matters here: a non-empty edge list carries its own
    # key dtype through every downstream stage
    n_dir = dir_edges.count()
    if n_dir == 0:
        return _empty_clusters(id_type)
    if n_dir <= inline_edge_cap:
        return _inline_union_find(dir_edges)

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("u"), "lbl": t.column("u")})

    # drop_empty_blocks after every groupby: its zero-column empty
    # blocks crash the next round's hash join (join-side key lookup)
    labels = drop_empty_blocks(
        dir_edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node").min("lbl")
        .rename_columns({"min(lbl)": "lbl"}))

    def edge_key(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("u"), "dst": t.column("v")})

    keyed_edges = dir_edges.map_batches(
        edge_key, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max, Min

    def as_candidate(t: pa.Table) -> pa.Table:
        # cur=null marks neighbor-candidate rows; the per-node Max(cur)
        # below recovers the node's CURRENT label (exactly one non-null
        # row per node), giving an exact, dtype-agnostic change count —
        # a numeric label sum would not survive string doc_ids
        n = t.num_rows
        return pa.table({"node": t.column("dst"), "lbl": t.column("lbl"),
                         "cur": pa.nulls(n, t.column("lbl").type)})

    def as_current(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "lbl": t.column("lbl"),
                         "cur": t.column("lbl")})

    def n_changed(t: pa.Table) -> pa.Table:
        diff = pc.sum(pc.cast(pc.not_equal(t.column("lbl"),
                                           t.column("cur")),
                              pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([diff], pa.int64())})

    for _ in range(MAX_ROUNDS):
        # One materialized lineage per round: join -> tag -> union ->
        # aggregate (drop_empty_blocks is the barrier; the join output
        # itself needs no scrub — only JOIN INPUTS choke on empty
        # blocks, and next round's input is `merged`). The stale `cur`
        # column rides along into the next round's join harmlessly:
        # both union branches re-derive it.
        prop = keyed_edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("node",))
        merged = drop_empty_blocks(
            prop.map_batches(as_candidate, batch_format="pyarrow")
            .union(labels.map_batches(as_current, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"),
                       Max("cur", alias_name="cur")))
        changed = merged.map_batches(
            n_changed, batch_format="pyarrow").sum("n")
        labels = merged
        if not changed:
            break
    else:
        logger.warning("connected_components: label propagation hit the "
                       "%d-round cap before converging", MAX_ROUNDS)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("node"),
                         "cluster_id": t.column("lbl")})

    return labels.map_batches(rename, batch_format="pyarrow")


def q_neardup_clusters(sf_dir: str) -> rd.Dataset:
    """Connected components of the verified MinHash near-dup pair graph."""
    return connected_components(q_minhash_pairs(sf_dir))


# ---------------------------------------------------------------------------
# PageRank over the crawl's link graph — integer-exact fixed iterations
# ---------------------------------------------------------------------------

def _edge_indices(edges: rd.Dataset, node_ids: list):
    """(src, dst) edge columns mapped to positions in the sorted
    ``node_ids`` list — the driver-side indexing step of the inline
    graph fast paths, vectorized via ``pc.index_in`` (one C-kernel
    lookup per batch instead of a Python dict probe per edge).

    Edges with an endpoint absent from ``node_ids`` ("ghost" ids) are
    DROPPED — the rank/score algorithms are defined over *nodes* only
    (their SQL oracles restrict to nodes), so ghost edges must not
    inject or receive mass. Mirrors the dst semi-join in the
    distributed ``trustrank`` path."""
    import numpy as np

    value_set = pa.array(node_ids)
    src_parts, dst_parts = [], []
    for b in edges.iter_batches(batch_format="pyarrow"):
        si = pc.index_in(b.column("src"), value_set=value_set)
        di = pc.index_in(b.column("dst"), value_set=value_set)
        ok = pc.and_(pc.is_valid(si), pc.is_valid(di))
        src_parts.append(si.filter(ok).to_numpy(zero_copy_only=False))
        dst_parts.append(di.filter(ok).to_numpy(zero_copy_only=False))
    if not src_parts:
        z = np.empty(0, np.int64)
        return z, z
    return (np.concatenate(src_parts).astype(np.int64),
            np.concatenate(dst_parts).astype(np.int64))


PR_SCALE = 10**12      # rank mass carried as int64 (SCALE = total mass 1.0)
PR_ITERS = 5           # fixed iteration count, unrolled in the SQL oracle


def pagerank(nodes: rd.Dataset, edges: rd.Dataset,
             iters: int = PR_ITERS,
             num_partitions: int | None = None,
             inline_edge_cap: int = _INLINE_EDGE_CAP,
             edges_subset_of_nodes: bool = False) -> rd.Dataset:
    """Damped PageRank over (src, dst) edges in exact int64 arithmetic.

    Per iteration (damping 85/100, the classic 0.85):

        S(v)   = sum over in-edges (R(u) // outdeg(u))
        R'(v)  = (15 * (SCALE // N)) // 100  +  (85 * S(v)) // 100

    Every operation is integer (floor division, int64 sums), so the
    result is **independent of addition order** — the distributed
    groupby-sum is bit-equal to the DuckDB oracle's unrolled-CTE
    evaluation, with no float-parity caveats (same discipline as the
    integer-scaled money sums in relational.py). Dangling-node mass
    evaporates rather than redistributing — mirrored in the oracle.

    Engine shape: outdeg is joined onto the edge list ONCE; each
    iteration is one hash join (ranks x edges on src) + one groupby-sum
    over contributions + a vectorized rescale — 2 shuffles/iteration
    over the EDGE list, the standard BSP PageRank plan. Ranks
    materialize per round so lineage stays one round deep. At 100 TB
    the edge list is the big side and stays block-partitioned; ranks
    are O(nodes) rows of 2 columns. Graphs at or under
    ``_INLINE_EDGE_CAP`` directed rows take an exact driver numpy fast
    path instead (same integer formula, bit-identical output) — at
    gate/bench scale ~15 shuffle barriers would dwarf microseconds of
    arithmetic, the same dual plan as ``connected_components``.

    Implementation: PageRank IS TrustRank with every node trusted —
    |T| = N makes the teleport r0 = SCALE // N and the base term
    identical — so this delegates to ``trustrank`` and renames the
    score column. ONE copy of the BSP loop / inline fast path has to
    stay bit-equal to the unrolled SQL CTEs, not two. Ghost edge
    endpoints (absent from *nodes*) are handled per trustrank's
    contract: they never enter the output, ghost-dst mass evaporates;
    pass ``edges_subset_of_nodes=True`` to skip the guard semi-join
    when the caller guarantees the invariant."""

    def all_trusted(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "trusted": pa.array([1] * t.num_rows, pa.int64())})

    tr = trustrank(nodes.map_batches(all_trusted, batch_format="pyarrow"),
                   edges, iters=iters, num_partitions=num_partitions,
                   inline_edge_cap=inline_edge_cap,
                   edges_subset_of_nodes=edges_subset_of_nodes)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "pr": t.column("tr")})

    return tr.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HITS (hubs & authorities) over the crawl's link graph — integer-exact
# ---------------------------------------------------------------------------

HITS_SCALE = 10**9     # score carried as int64; max score rescaled to ~SCALE
HITS_ITERS = 3         # fixed iteration count, unrolled in the SQL oracle


def hits(nodes: rd.Dataset, edges: rd.Dataset,
         iters: int = HITS_ITERS,
         num_partitions: int | None = None,
         inline_edge_cap: int = _INLINE_EDGE_CAP,
         edges_subset_of_nodes: bool = False) -> rd.Dataset:
    """Kleinberg HITS over (src, dst) edges in exact int64 arithmetic.

    Per iteration:

        a_raw(v) = sum over in-edges  (u,v) of h(u)
        a(v)     = a_raw(v) // max(1, max_v(a_raw) // SCALE)
        h_raw(u) = sum over out-edges (u,v) of a(v)
        h(u)     = h_raw(u) // max(1, max_u(h_raw) // SCALE)

    The classic L2 normalization is replaced by an integer
    rescale-by-max (divide by ``max // SCALE``) so every operation is
    int64 floor division and sums — **independent of addition order**
    and bit-equal to the DuckDB oracle's unrolled CTEs (the same
    discipline as ``pagerank``). The divisor-form rescale (rather than
    ``(SCALE * a_raw) // max``) keeps every intermediate <= ~2*SCALE so
    the per-node sums overflow int64 only past ~4e9 in-degree.

    Engine shape mirrors ``pagerank``: each half-iteration is one hash
    join (scores x edges) + one groupby-sum over contributions + one
    scalar ``max`` aggregate + a vectorized rescale — 2 shuffles per
    half over the EDGE list, scores are O(nodes) rows. Graphs at or
    under ``inline_edge_cap`` directed rows take the exact driver numpy
    fast path (same formula, bit-identical output)."""
    import numpy as np
    from ray.data.aggregate import Sum

    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.string()),
                                       "hub": pa.array([], pa.int64()),
                                       "auth": pa.array([], pa.int64())}))

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= inline_edge_cap and n <= inline_edge_cap:
        node_ids = sorted(r["doc_id"]
                          for r in nodes.take_all(limit=inline_edge_cap + 1))
        src_i, dst_i = _edge_indices(edges, node_ids)
        h = np.full(n, HITS_SCALE, np.int64)
        a = np.zeros(n, np.int64)
        for _ in range(iters):
            a_raw = np.zeros(n, np.int64)
            np.add.at(a_raw, dst_i, h[src_i])
            a = a_raw // max(1, int(a_raw.max(initial=0)) // HITS_SCALE)
            h_raw = np.zeros(n, np.int64)
            np.add.at(h_raw, src_i, a[dst_i])
            h = h_raw // max(1, int(h_raw.max(initial=0)) // HITS_SCALE)
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(node_ids, pa.string()),
            "hub": pa.array(h, pa.int64()),
            "auth": pa.array(a, pa.int64())}))

    if num_partitions is None:
        num_partitions = int(min(64, max(2, n_edges // 65536 + 2)))

    node_col = drop_empty_blocks(
        nodes.select_columns(["doc_id"])).materialize()

    if not edges_subset_of_nodes:
        # drop ghost edges (an endpoint absent from *nodes*) with two
        # semi-joins so ghost ids can neither receive nor inject score
        # — HITS has no outdeg division, so full-edge removal is the
        # oracle-equal semantics (ghosts contribute nothing there)
        def as_col(name):
            def f(t: pa.Table) -> pa.Table:
                return pa.table({name: t.column("doc_id")})
            return f

        for col in ("src", "dst"):
            edges = drop_empty_blocks(edges.join(
                node_col.map_batches(as_col(col), batch_format="pyarrow"),
                join_type="inner", num_partitions=num_partitions,
                on=(col,)))
        edges = edges.materialize()

    def init_scores(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "x": pa.array([HITS_SCALE] * t.num_rows,
                                       pa.int64())})

    def zero_scores(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "x": pa.array([0] * t.num_rows, pa.int64())})

    def _propagate(scores: rd.Dataset, key: str, out: str) -> rd.Dataset:
        """sum over edges of the *key*-side score, grouped by the *out*
        side, zero-filled over all nodes, rescaled by max//SCALE."""
        prop = drop_empty_blocks(edges.join(
            scores, join_type="inner", num_partitions=num_partitions,
            on=(key,), right_on=("doc_id",)))

        def contrib(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t.column(out), "x": t.column("x")})

        summed = drop_empty_blocks(
            prop.map_batches(contrib, batch_format="pyarrow")
            .union(node_col.map_batches(zero_scores, batch_format="pyarrow"))
            .groupby("doc_id").aggregate(Sum("x", alias_name="x"))
        ).materialize()
        mx = summed.max("x") or 0
        q = max(1, int(mx) // HITS_SCALE)

        def rescale(t: pa.Table) -> pa.Table:
            import numpy as np
            x = t.column("x").to_numpy().astype(np.int64)
            return pa.table({"doc_id": t.column("doc_id"),
                             "x": pa.array(x // q, pa.int64())})

        return summed.map_batches(
            rescale, batch_format="pyarrow").materialize()

    hub = node_col.map_batches(
        init_scores, batch_format="pyarrow").materialize()
    auth = None
    for _ in range(iters):
        auth = _propagate(hub, key="src", out="dst")
        hub = _propagate(auth, key="dst", out="src")

    joined = drop_empty_blocks(hub.rename_columns({"x": "hub"})).join(
        drop_empty_blocks(auth.rename_columns({"x": "auth"})),
        join_type="inner", num_partitions=num_partitions, on=("doc_id",))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "hub": pc.cast(t.column("hub"), pa.int64()),
                         "auth": pc.cast(t.column("auth"), pa.int64())})

    return drop_empty_blocks(joined).map_batches(pin, batch_format="pyarrow")


def q_link_hits(sf_dir: str) -> rd.Dataset:
    """HITS hubs & authorities over the distributed crawl's internal
    link graph — the complementary centrality to ``link_pagerank``
    (list/hub pages vs linked-to item/authority pages; on a crawl graph
    the two roles are structurally distinct, so this is the signal that
    separates index pages from content pages). The DuckDB oracle runs
    the same fixed integer iterations as unrolled CTEs over the
    sequential oracle crawler's independently-derived edge list."""
    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    edges = _cached_link_edges(sf_dir)
    return hits(docs.select_columns(["doc_id"]), edges,
                edges_subset_of_nodes=True)


def _hits_oracle_sql() -> str:
    """The same integer-exact iterations as ``hits``, unrolled as CTEs
    over the sequential oracle crawler's docs + edge fixtures."""
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_EDGES_PATH

    parts = [f"""
WITH nodes AS (SELECT doc_id FROM read_parquet('{ORACLE_DOCS_PATH}')),
edges AS (SELECT DISTINCT src, dst FROM read_parquet('{ORACLE_EDGES_PATH}')),
h0 AS (SELECT doc_id, CAST({HITS_SCALE} AS BIGINT) AS x FROM nodes)"""]
    for i in range(1, HITS_ITERS + 1):
        parts.append(f""",
ag{i} AS (
  SELECT e.dst AS doc_id, sum(h{i-1}.x) AS s
  FROM edges e JOIN h{i-1} ON e.src = h{i-1}.doc_id
  GROUP BY e.dst),
ar{i} AS (
  SELECT n.doc_id, coalesce(ag{i}.s, 0) AS s
  FROM nodes n LEFT JOIN ag{i} USING (doc_id)),
a{i} AS (
  SELECT doc_id,
         CAST(s // greatest(1, (SELECT max(s) FROM ar{i}) // {HITS_SCALE})
              AS BIGINT) AS x
  FROM ar{i}),
hg{i} AS (
  SELECT e.src AS doc_id, sum(a{i}.x) AS s
  FROM edges e JOIN a{i} ON e.dst = a{i}.doc_id
  GROUP BY e.src),
hr{i} AS (
  SELECT n.doc_id, coalesce(hg{i}.s, 0) AS s
  FROM nodes n LEFT JOIN hg{i} USING (doc_id)),
h{i} AS (
  SELECT doc_id,
         CAST(s // greatest(1, (SELECT max(s) FROM hr{i}) // {HITS_SCALE})
              AS BIGINT) AS x
  FROM hr{i})""")
    parts.append(f"""
SELECT h{HITS_ITERS}.doc_id, h{HITS_ITERS}.x AS hub, a{HITS_ITERS}.x AS auth
FROM h{HITS_ITERS} JOIN a{HITS_ITERS} USING (doc_id)
""")
    return "".join(parts)


def crawl_link_edges(docs: rd.Dataset, web) -> rd.Dataset:
    """Distinct internal (src doc_id, dst doc_id) edges of the crawled
    web: each crawled page's child links, canonicalized, kept only when
    the target was itself crawled (semi join against the doc table —
    never a driver set). The crawl stores first-discovery parents only
    (a forest); this recovers the FULL link graph, so in-degree > 1 is
    real and PageRank is non-trivial."""
    from ..canonicalize import canonicalize_url, doc_id_for
    from ..synthweb import fetch_page

    def to_edges(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        for did, url in zip(t.column("doc_id").to_pylist(),
                            t.column("url").to_pylist()):
            for raw in fetch_page(url, web).child_urls:
                cu = canonicalize_url(raw)
                if cu is not None:
                    srcs.append(did)
                    dsts.append(doc_id_for(cu))
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string())})

    ids = docs.select_columns(["doc_id"])
    raw_edges = drop_empty_blocks(
        docs.select_columns(["doc_id", "url"])
        .map_batches(to_edges, batch_format="pyarrow"))
    internal = raw_edges.join(ids, join_type="left_semi", num_partitions=join_parts(),
                              on=("dst",), right_on=("doc_id",))
    # distinct (src, dst): parallel edges collapse (mirrored by the
    # fixture writer's set + the oracle's DISTINCT read)
    return drop_empty_blocks(
        internal.groupby(["src", "dst"]).count()
        .drop_columns(["count()"]))


_EDGE_CACHE: dict[str, rd.Dataset] = {}


def _cached_link_edges(sf_dir: str) -> rd.Dataset:
    """The tier's link-edge list, derived once per process and shared by
    every graph query (pagerank, HITS, degree, components, host graph).
    The edge list is a pure function of the cached crawl output, but its
    derivation re-fetches every page to recover out-links — without the
    cache each graph query repaid the full fetch CPU. Keyed by tier like
    ``_run_crawl``'s cache; materialized so downstream joins reuse the
    object-store blocks."""
    import os

    from .crawl_queries import _cfg_for, _run_crawl

    tier = os.path.basename(os.path.normpath(sf_dir))
    if tier not in _EDGE_CACHE:
        web, _ = _cfg_for(sf_dir)
        _EDGE_CACHE[tier] = crawl_link_edges(
            _run_crawl(sf_dir), web).materialize()
    return _EDGE_CACHE[tier]


def q_link_pagerank(sf_dir: str) -> rd.Dataset:
    """PageRank over the distributed crawl's internal link graph.

    The crawl-prioritization signal a frontier scheduler feeds on:
    re-derive every crawled page's out-links, keep edges whose target
    was crawled, run integer-exact PageRank. The DuckDB oracle runs the
    same fixed iterations as unrolled CTEs over the *sequential oracle
    crawler's* independently-derived edge list, so graph construction
    and the distributed iteration are both checked end-to-end."""
    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    edges = _cached_link_edges(sf_dir)
    return pagerank(docs.select_columns(["doc_id"]), edges,
                    edges_subset_of_nodes=True)


CRAWL_BUDGET_TOTAL = 100_000


def q_crawl_budget(sf_dir: str) -> rd.Dataset:
    """PageRank-weighted per-domain fetch-budget allocation — the
    crawl-prioritization loop closed: the frontier scheduler's next-wave
    budget is apportioned to domains in proportion to their crawled
    pages' integer PageRank mass (importance-driven recrawl/frontier
    spending, the OPIC-style signal).

    ``fetch_budget = (TOTAL * mass_d) // mass_total`` in int64 — exact
    and order-independent. Overflow headroom: total PageRank mass is
    ~PR_SCALE (1e12) by construction, so TOTAL * mass < 1e17 << 2^63.
    Engine shape: one hash join (ranks x doc->domain projection), one
    groupby-sum to O(domains) rows, one O(1) scalar total, a vectorized
    allocation map."""
    from ray.data.aggregate import Sum

    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    pr = q_link_pagerank(sf_dir)
    doms = docs.select_columns(["doc_id", "domain_key"])
    j = drop_empty_blocks(pr.join(
        doms.rename_columns({"doc_id": "d2"}), join_type="inner",
        num_partitions=join_parts(), on=("doc_id",), right_on=("d2",)))
    mass = drop_empty_blocks(
        j.groupby("domain_key").aggregate(Sum("pr", alias_name="pr_mass")))
    total = int(mass.sum("pr_mass"))

    def alloc(t: pa.Table) -> pa.Table:
        m = pc.cast(t.column("pr_mass"), pa.int64())
        b = pc.divide(pc.multiply(m, pa.scalar(CRAWL_BUDGET_TOTAL,
                                               pa.int64())),
                      pa.scalar(total, pa.int64()))
        return pa.table({"domain_key": t.column("domain_key"),
                         "pr_mass": m,
                         "fetch_budget": pc.cast(b, pa.int64())})

    return mass.map_batches(alloc, batch_format="pyarrow")


def _crawl_budget_oracle_sql() -> str:
    from .crawl_queries import ORACLE_DOCS_PATH

    return _pagerank_ctes() + f""",
mass AS (
  SELECT d.domain_key, sum(r.r) AS pr_mass
  FROM r{PR_ITERS} r
  JOIN read_parquet('{ORACLE_DOCS_PATH}') d USING (doc_id)
  GROUP BY d.domain_key),
tot AS (SELECT sum(pr_mass) AS t FROM mass)
SELECT domain_key, CAST(pr_mass AS BIGINT) AS pr_mass,
       CAST(({CRAWL_BUDGET_TOTAL} * pr_mass) // (SELECT t FROM tot)
            AS BIGINT) AS fetch_budget
FROM mass
"""


def _clusters_oracle_sql() -> str:
    pairs = _minhash_oracle_sql()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs),
reach(node, r) AS (
  SELECT u, v FROM edges
  UNION
  SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u)
SELECT node AS doc_id,
       CAST(least(node, min(r)) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


def _pagerank_ctes() -> str:
    """The integer-exact pagerank iterations unrolled as CTEs over the
    sequential oracle crawler's docs + edge fixtures — int64 floor
    division and sums only, so DuckDB's evaluation order cannot diverge
    from the distributed groupby-sum. Ends after ``r{PR_ITERS}`` so
    consumers (the pagerank oracle itself, the budget allocator) append
    their own tail."""
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_EDGES_PATH

    parts = [f"""
WITH nodes AS (SELECT doc_id FROM read_parquet('{ORACLE_DOCS_PATH}')),
edges AS (SELECT DISTINCT src, dst FROM read_parquet('{ORACLE_EDGES_PATH}')),
nn AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
r0 AS (SELECT doc_id, {PR_SCALE} // (SELECT n FROM nn) AS r FROM nodes)"""]
    base = f"(15 * ({PR_SCALE} // (SELECT n FROM nn))) // 100"
    for i in range(1, PR_ITERS + 1):
        parts.append(f""",
c{i} AS (
  SELECT e.dst AS doc_id, sum(r{i-1}.r // o.od) AS s
  FROM edges e
  JOIN r{i-1} ON e.src = r{i-1}.doc_id
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
r{i} AS (
  SELECT nodes.doc_id,
         {base} + (85 * coalesce(c{i}.s, 0)) // 100 AS r
  FROM nodes LEFT JOIN c{i} USING (doc_id))""")
    return "".join(parts)


def _pagerank_oracle_sql() -> str:
    return _pagerank_ctes() + f"""
SELECT doc_id, CAST(r AS BIGINT) AS pr FROM r{PR_ITERS}
"""


def crawl_anchor_edges(docs: rd.Dataset, web) -> rd.Dataset:
    """(src doc_id, dst doc_id, anchor) rows of the crawled web's link
    graph — one row PER LINK OCCURRENCE (parallel links kept: a page
    linking the same item from two DOM slots contributes two rows, each
    with its own anchor text). Anchor text is the item span at the
    link's DOM slot (``anchor_text_for_slot``); targets not themselves
    crawled are dropped with a semi join, never a driver set."""
    from ..canonicalize import canonicalize_url, doc_id_for
    from ..pipelines.crawl_queries import anchor_text_for_slot
    from ..synthweb import fetch_page

    def to_anchor_rows(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        txts: list[str] = []
        for did, url in zip(t.column("doc_id").to_pylist(),
                            t.column("url").to_pylist()):
            page = fetch_page(url, web)
            for slot, raw in enumerate(page.child_urls):
                cu = canonicalize_url(raw)
                if cu is None:
                    continue
                srcs.append(did)
                dsts.append(doc_id_for(cu))
                txts.append(anchor_text_for_slot(page.spans, slot))
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string()),
                         "anchor": pa.array(txts, pa.string())})

    ids = docs.select_columns(["doc_id"])
    raw_rows = drop_empty_blocks(
        docs.select_columns(["doc_id", "url"])
        .map_batches(to_anchor_rows, batch_format="pyarrow"))
    return drop_empty_blocks(
        raw_rows.join(ids, join_type="left_semi", num_partitions=join_parts(),
                      on=("dst",), right_on=("doc_id",)))


def q_anchor_text(sf_dir: str) -> rd.Dataset:
    """Anchor-text index over the crawl's link graph: for every crawled
    page, the inbound-link count and the lexicographic min/max anchor
    text pointing at it — the classic IR signal (anchor text describes
    the TARGET) a search/curation pipeline extracts from a crawl.
    Scale shape: anchors are emitted per batch from the fetch contract,
    then one hash-partitioned groupby(dst) with min/max/count — O(links)
    exchange, O(crawled pages) output, nothing on the driver. The
    DuckDB oracle aggregates the sequential crawler's independently
    derived (src, dst, anchor) fixture."""
    from ray.data.aggregate import Count, Max, Min

    from .crawl_queries import _cfg_for, _run_crawl

    web, _ = _cfg_for(sf_dir)
    docs = _run_crawl(sf_dir)
    anchors = crawl_anchor_edges(docs, web)
    agg = anchors.groupby("dst").aggregate(
        Count(alias_name="n_inlinks"),
        Min("anchor", alias_name="min_anchor"),
        Max("anchor", alias_name="max_anchor"))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "dst": t.column("dst"),
            "n_inlinks": pc.cast(t.column("n_inlinks"), pa.int64()),
            "min_anchor": t.column("min_anchor"),
            "max_anchor": t.column("max_anchor"),
        })

    return drop_empty_blocks(agg).map_batches(pin, batch_format="pyarrow")


def q_link_degree(sf_dir: str) -> rd.Dataset:
    """In-degree distribution of the crawl's internal link graph
    (distinct edges): (in_degree, n_nodes) including the zero-in-degree
    bucket — the connectivity audit read before tuning a frontier
    prioritizer. Scale shape: distinct-edge groupby, a left join of the
    doc table against per-target counts, then a groupby over the degree
    value — output is O(distinct degrees), so the result is tiny at any
    corpus size."""
    from ray.data.aggregate import Count

    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    edges = _cached_link_edges(sf_dir)
    indeg = edges.groupby("dst").aggregate(Count(alias_name="in_degree"))
    joined = drop_empty_blocks(
        docs.select_columns(["doc_id"])
        .join(drop_empty_blocks(indeg), join_type="left_outer",
              num_partitions=join_parts(), on=("doc_id",), right_on=("dst",)))

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({"in_degree": pc.cast(
            pc.coalesce(t.column("in_degree"), pa.scalar(0)), pa.int64())})

    hist = (joined.map_batches(fill, batch_format="pyarrow")
            .groupby("in_degree").aggregate(Count(alias_name="n_nodes")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({"in_degree": pc.cast(t.column("in_degree"), pa.int64()),
                         "n_nodes": pc.cast(t.column("n_nodes"), pa.int64())})

    return drop_empty_blocks(hist).map_batches(pin, batch_format="pyarrow")


def q_link_components(sf_dir: str) -> rd.Dataset:
    """Component-size histogram of the crawl's internal link graph
    (undirected): (component_size, n_components), singletons included —
    the structural audit that tells a crawl operator whether the corpus
    is one connected web or islands (isolated islands usually mean
    broken seed coverage). Scale shape: the connected_components
    dual plan (exact driver union-find under the edge cap, distributed
    min-label propagation past it), singletons recovered with a LEFT
    join of the doc table (never recomputed), then two tiny groupbys —
    output is O(distinct sizes)."""
    from ray.data.aggregate import Count

    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    edges = _cached_link_edges(sf_dir)
    comp = connected_components(edges, src="src", dst="dst",
                                id_type=pa.string())
    joined = drop_empty_blocks(
        docs.select_columns(["doc_id"])
        .join(drop_empty_blocks(comp).rename_columns({"doc_id": "node"}),
              join_type="left_outer", num_partitions=join_parts(),
              on=("doc_id",), right_on=("node",)))

    def fill(t: pa.Table) -> pa.Table:
        # a doc untouched by any edge is its own singleton component
        return pa.table({"cluster_id": pc.coalesce(
            t.column("cluster_id"), t.column("doc_id"))})

    sizes = (joined.map_batches(fill, batch_format="pyarrow")
             .groupby("cluster_id").aggregate(Count(alias_name="sz")))
    hist = (drop_empty_blocks(sizes).groupby("sz")
            .aggregate(Count(alias_name="n_components")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "component_size": pc.cast(t.column("sz"), pa.int64()),
            "n_components": pc.cast(t.column("n_components"), pa.int64()),
        })

    return drop_empty_blocks(hist).map_batches(pin, batch_format="pyarrow")


def q_host_graph(sf_dir: str) -> rd.Dataset:
    """Domain-level link graph: (src_domain, dst_domain, n_links) from
    the distinct doc-level edges — the host graph crawl studies analyze
    (and the input a frontier partitioner would use to co-locate
    domains that cite each other). Scale shape: two hash joins that
    move only the edge list (doc_id -> domain maps are projected to two
    columns), then the combiner groupby; output is O(domain pairs)."""
    from ray.data.aggregate import Count

    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    edges = _cached_link_edges(sf_dir)
    doms = docs.select_columns(["doc_id", "domain_key"])
    e1 = drop_empty_blocks(edges.join(
        doms.rename_columns({"doc_id": "sdoc", "domain_key": "src_domain"}),
        join_type="inner", num_partitions=join_parts(), on=("src",), right_on=("sdoc",)))
    e2 = drop_empty_blocks(e1.join(
        doms.rename_columns({"doc_id": "ddoc", "domain_key": "dst_domain"}),
        join_type="inner", num_partitions=join_parts(), on=("dst",), right_on=("ddoc",)))
    agg = (e2.groupby(["src_domain", "dst_domain"])
           .aggregate(Count(alias_name="n_links")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "src_domain": t.column("src_domain"),
            "dst_domain": t.column("dst_domain"),
            "n_links": pc.cast(t.column("n_links"), pa.int64()),
        })

    return drop_empty_blocks(agg).map_batches(pin, batch_format="pyarrow")


BFS_MAX_HOPS = 30
_BFS_UNREACHED = 1 << 30     # "infinity" label; far above any real hop count


def bfs_hops(nodes: rd.Dataset, edges: rd.Dataset, seeds: rd.Dataset,
             max_hops: int = BFS_MAX_HOPS,
             num_partitions: int = 8,
             inline_edge_cap: int = _INLINE_EDGE_CAP) -> rd.Dataset:
    """Min-hop distance from the *seeds* node set over directed (src,
    dst) edges: (doc_id, hops), hops = -1 for unreachable nodes.

    Distributed plan: level-synchronous relaxation (the BSP BFS /
    Bellman-Ford hybrid every vertex-centric framework uses) — labels
    start at 0 for seeds and "infinity" elsewhere; each round is one
    hash join (labels x edges on src) emitting d+1 candidates at dst,
    one union with the current labels, one groupby-min. Labels only
    decrease, so an unchanged label sum is the fixpoint (the same O(1)
    convergence check as ``connected_components``). Rounds needed =
    eccentricity of the seed set, never more than *max_hops*. Graphs
    under ``inline_edge_cap`` take an exact driver numpy fast path
    (identical semantics, bit-identical output)."""
    import numpy as np
    from ray.data.aggregate import Min, Sum

    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.string()),
                                       "hops": pa.array([], pa.int64())}))
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= inline_edge_cap and n <= inline_edge_cap:
        node_ids = sorted(r["doc_id"]
                          for r in nodes.take_all(limit=inline_edge_cap + 1))
        src_i, dst_i = _edge_indices(edges, node_ids)
        seed_set = pa.array([r["doc_id"] for r in seeds.take_all()])
        seed_i = pc.index_in(pa.array(node_ids), value_set=seed_set)
        d = np.where(np.asarray(seed_i.is_valid()), 0, _BFS_UNREACHED
                     ).astype(np.int64)
        for _ in range(max_hops):
            nd = d.copy()
            if n_edges:
                np.minimum.at(nd, dst_i, d[src_i] + 1)
            if np.array_equal(nd, d):
                break
            d = nd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(node_ids, pa.string()),
            "hops": pa.array(np.where(d >= _BFS_UNREACHED, -1, d),
                             pa.int64())}))

    seed_ds = drop_empty_blocks(
        seeds.select_columns(["doc_id"])).materialize()

    def init_seed(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("doc_id"),
                         "d": pa.array([0] * t.num_rows, pa.int64())})

    def init_inf(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("doc_id"),
                         "d": pa.array([_BFS_UNREACHED] * t.num_rows,
                                       pa.int64())})

    labels = drop_empty_blocks(
        seed_ds.map_batches(init_seed, batch_format="pyarrow")
        .union(nodes.select_columns(["doc_id"])
               .map_batches(init_inf, batch_format="pyarrow"))
        .groupby("node").aggregate(Min("d", alias_name="d"))).materialize()
    total = labels.sum("d")

    def relax(t: pa.Table) -> pa.Table:
        import numpy as np
        d = t.column("d").to_numpy().astype(np.int64)
        return pa.table({"node": t.column("dst"),
                         "d": pa.array(np.minimum(d + 1, _BFS_UNREACHED),
                                       pa.int64())})

    for _ in range(max_hops):
        prop = edges.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("node",))
        merged = drop_empty_blocks(
            prop.map_batches(relax, batch_format="pyarrow")
            .union(labels)
            .groupby("node").aggregate(Min("d", alias_name="d"))
        ).materialize()
        new_total = merged.sum("d")
        labels = merged
        if new_total == total:
            break
        total = new_total
    else:
        logger.warning("bfs_hops: relaxation hit the %d-round cap before "
                       "converging", max_hops)

    def rename(t: pa.Table) -> pa.Table:
        import numpy as np
        d = t.column("d").to_numpy().astype(np.int64)
        return pa.table({"doc_id": t.column("node"),
                         "hops": pa.array(
                             np.where(d >= _BFS_UNREACHED, -1, d),
                             pa.int64())})

    return labels.map_batches(rename, batch_format="pyarrow")


def q_link_bfs(sf_dir: str) -> rd.Dataset:
    """Min-hop histogram of the crawl's link graph from the seed pages:
    (hops, n_nodes), hops = min link distance from any depth-0 doc over
    the DISTINCT edge graph, -1 if unreachable. Genuinely different
    from the crawl's stored ``depth`` (first-discovery path length):
    budget-deferred emission can record a deeper first-discovery path
    than the true shortest link path, and BFS here relaxes over ALL
    edges, not the discovery forest. The DuckDB oracle recomputes the
    same bounded BFS with a recursive CTE over the sequential oracle
    crawler's independently-derived fixtures."""
    from ray.data.aggregate import Count

    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    edges = _cached_link_edges(sf_dir)
    seeds = docs.filter(expr="depth == 0")
    per_node = bfs_hops(docs.select_columns(["doc_id"]), edges,
                        seeds.select_columns(["doc_id"]))
    hist = per_node.groupby("hops").aggregate(Count(alias_name="n_nodes"))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({"hops": pc.cast(t.column("hops"), pa.int64()),
                         "n_nodes": pc.cast(t.column("n_nodes"),
                                            pa.int64())})

    return drop_empty_blocks(hist).map_batches(pin, batch_format="pyarrow")


# inline triangle path: bail to the distributed join plan past this
# many enumerated wedges (~5 int64 arrays of this length on the driver)
_INLINE_WEDGE_CAP = 8_000_000


def _count_triangles_inline(src, dst) -> tuple[int, int] | None:
    """Exact driver numpy triangle census over directed (src, dst) code
    arrays — the same degree-(then-id)-oriented formula as the
    distributed plan, segment-vectorized wedge expansion, closure via
    one searchsorted membership pass. Returns None when the enumerated
    wedge count would exceed ``_INLINE_WEDGE_CAP`` (caller falls back
    to the distributed join plan, which streams the same wedges)."""
    import numpy as np

    keep = src != dst
    src, dst = src[keep], dst[keep]
    if not len(src):
        return 0, 0
    n = int(max(src.max(), dst.max())) + 1
    u = np.minimum(src, dst)
    v = np.maximum(src, dst)
    und = np.unique(u * n + v)
    u, v = und // n, und % n
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    # orient from the lower-(degree, id) endpoint to the higher; u < v
    # already, so the tie-break keeps (u, v) as-is
    u_first = deg[u] <= deg[v]
    a = np.where(u_first, u, v)
    b = np.where(u_first, v, u)
    out_cnt = np.bincount(a, minlength=n)
    cnt = out_cnt[b]                      # wedges seeded by each edge
    n_wedges = int(cnt.sum())
    if n_wedges > _INLINE_WEDGE_CAP:
        return None
    if n_wedges == 0:
        return 0, 0
    order = np.argsort(a, kind="stable")
    b_by_a = b[order]
    out_start = np.concatenate(([0], np.cumsum(out_cnt)))[:-1]
    e1 = np.repeat(np.arange(len(a)), cnt)
    off = np.arange(n_wedges) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    w_c = b_by_a[out_start[b[e1]] + off]
    q = a[e1] * n + w_c
    ekeys = np.sort(a * n + b)
    idx = np.searchsorted(ekeys, q)
    idx_c = np.minimum(idx, len(ekeys) - 1)
    n_tri = int(np.count_nonzero(ekeys[idx_c] == q))
    return n_wedges, n_tri


def count_triangles(edges: rd.Dataset, num_partitions: int = 8,
                    inline_edge_cap: int = _INLINE_EDGE_CAP
                    ) -> tuple[int, int]:
    """(n_wedges, n_triangles) of the UNDIRECTED graph under (src, dst)
    edges, by the standard degree-oriented distributed plan: orient
    every undirected edge from its lower-(degree, id) endpoint to the
    higher, join oriented edges head-to-tail to enumerate wedges, and
    close each wedge with a second join against the oriented edge list.
    Degree orientation bounds the wedge count at O(m^1.5) regardless of
    skew (a star graph yields zero oriented wedges at its hub), so both
    joins move edge-bounded data — nothing is collected on the driver.

    Graphs at or under ``inline_edge_cap`` directed rows whose oriented
    wedge count fits ``_INLINE_WEDGE_CAP`` take an exact driver numpy
    fast path (same orientation, bit-identical counts — the pagerank /
    HITS dual-plan discipline)."""
    from ray.data.aggregate import Count

    edges = edges.materialize()
    if edges.count() <= inline_edge_cap:
        import numpy as np
        import pandas as pd

        parts = [b for b in edges.iter_batches(batch_format="pandas")]
        if not parts:
            return 0, 0
        df = pd.concat(parts, ignore_index=True)
        codes, _ = pd.factorize(
            pd.concat([df["src"], df["dst"]], ignore_index=True), sort=True)
        m = len(df)
        res = _count_triangles_inline(
            codes[:m].astype(np.int64), codes[m:].astype(np.int64))
        if res is not None:
            return res

    def undirect(t: pa.Table) -> pa.Table:
        s, d = t.column("src"), t.column("dst")
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return pa.table({"u": lo, "v": hi})

    und = drop_empty_blocks(
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["u", "v"]).count().drop_columns(["count()"])
    ).materialize()
    if und.count() == 0:
        return 0, 0

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [_one_chunk(t.column("u")), _one_chunk(t.column("v"))])})

    deg = drop_empty_blocks(
        und.map_batches(both_ends, batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="d"))).materialize()

    ed = drop_empty_blocks(und.join(
        deg.rename_columns({"node": "un", "d": "du"}), join_type="inner",
        num_partitions=num_partitions, on=("u",), right_on=("un",)))
    ed = drop_empty_blocks(ed.join(
        deg.rename_columns({"node": "vn", "d": "dv"}), join_type="inner",
        num_partitions=num_partitions, on=("v",), right_on=("vn",)))

    def orient(t: pa.Table) -> pa.Table:
        u, v = t.column("u"), t.column("v")
        du, dv = t.column("du"), t.column("dv")
        u_first = pc.or_(pc.less(du, dv),
                         pc.and_(pc.equal(du, dv), pc.less(u, v)))
        return pa.table({"a": pc.if_else(u_first, u, v),
                         "b": pc.if_else(u_first, v, u)})

    oriented = drop_empty_blocks(
        ed.map_batches(orient, batch_format="pyarrow")).materialize()

    wedges = drop_empty_blocks(oriented.rename_columns(
        {"a": "w_a", "b": "mid"}).join(
        oriented.rename_columns({"a": "m2", "b": "w_c"}),
        join_type="inner", num_partitions=num_partitions,
        on=("mid",), right_on=("m2",))).materialize()
    n_wedges = wedges.count()
    if n_wedges == 0:
        return 0, 0
    closed = wedges.join(
        oriented, join_type="inner", num_partitions=num_partitions,
        on=("w_a", "w_c"), right_on=("a", "b"))
    return n_wedges, closed.count()


def q_link_triangles(sf_dir: str) -> pa.Table:
    """Triangle census of the crawl's link graph (undirected distinct
    edges): one row (n_wedges, n_triangles, clustering) — the global
    clustering coefficient 3*triangles/wedges... using the ORIENTED
    wedge count, where each triangle closes exactly one oriented wedge,
    so clustering = n_triangles / n_wedges (rounded 6). The DuckDB
    oracle recomputes the same orientation and joins over the
    sequential oracle crawler's edge fixture."""
    edges = _cached_link_edges(sf_dir)
    n_wedges, n_tri = count_triangles(edges)
    ratio = 0.0
    if n_wedges:
        from .common import round_half_away
        ratio = float(round_half_away(n_tri / n_wedges, 6))
    return pa.table({"n_wedges": pa.array([n_wedges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64()),
                     "closure_rate": pa.array([ratio], pa.float64())})


def _link_triangles_oracle_sql() -> str:
    from .crawl_queries import ORACLE_EDGES_PATH

    return f"""
WITH e0 AS (
  SELECT DISTINCT src, dst FROM read_parquet('{ORACLE_EDGES_PATH}')
  WHERE src <> dst),
und AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e0 GROUP BY 1, 2),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
  GROUP BY node),
orient AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND und.u < und.v)
              THEN und.u ELSE und.v END AS a,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND und.u < und.v)
              THEN und.v ELSE und.u END AS b
  FROM und
  JOIN deg da ON da.node = und.u
  JOIN deg db ON db.node = und.v),
wedges AS (
  SELECT e1.a AS w_a, e1.b AS mid, e2.b AS w_c
  FROM orient e1 JOIN orient e2 ON e1.b = e2.a),
tri AS (
  SELECT count(*) AS c
  FROM wedges w JOIN orient e3 ON e3.a = w.w_a AND e3.b = w.w_c),
wc AS (SELECT count(*) AS n FROM wedges)
SELECT CAST(wc.n AS BIGINT) AS n_wedges,
       CAST(tri.c AS BIGINT) AS n_triangles,
       CASE WHEN wc.n = 0 THEN 0.0
            ELSE round(tri.c / CAST(wc.n AS DOUBLE), 6) END AS closure_rate
FROM wc, tri
"""


def _link_bfs_oracle_sql() -> str:
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_EDGES_PATH

    return f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT src, dst FROM read_parquet('{ORACLE_EDGES_PATH}')),
reach(node, d) AS (
  SELECT doc_id, 0 FROM read_parquet('{ORACLE_DOCS_PATH}') WHERE depth = 0
  UNION
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.d < {BFS_MAX_HOPS}),
mind AS (SELECT node, min(d) AS hops FROM reach GROUP BY node),
perdoc AS (
  SELECT coalesce(m.hops, -1) AS hops
  FROM read_parquet('{ORACLE_DOCS_PATH}') doc
  LEFT JOIN mind m ON m.node = doc.doc_id)
SELECT CAST(hops AS BIGINT) AS hops,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM perdoc GROUP BY hops
"""


def _link_components_oracle_sql() -> str:
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_EDGES_PATH

    return f"""
WITH RECURSIVE dedges AS (
  SELECT src AS u, dst AS v FROM read_parquet('{ORACLE_EDGES_PATH}')
  UNION
  SELECT dst AS u, src AS v FROM read_parquet('{ORACLE_EDGES_PATH}')),
reach(node, r) AS (
  SELECT u, v FROM dedges
  UNION
  SELECT reach.node, dedges.v FROM reach JOIN dedges ON reach.r = dedges.u),
lbl AS (
  SELECT node, least(node, min(r)) AS cluster_id FROM reach GROUP BY node),
alllbl AS (
  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
  FROM read_parquet('{ORACLE_DOCS_PATH}') d
  LEFT JOIN lbl l ON l.node = d.doc_id),
sizes AS (SELECT cluster_id, count(*) AS sz FROM alllbl GROUP BY cluster_id)
SELECT CAST(sz AS BIGINT) AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz
"""


def _host_graph_oracle_sql() -> str:
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_EDGES_PATH

    return f"""
SELECT ds.domain_key AS src_domain, dd.domain_key AS dst_domain,
       CAST(count(*) AS BIGINT) AS n_links
FROM read_parquet('{ORACLE_EDGES_PATH}') e
JOIN read_parquet('{ORACLE_DOCS_PATH}') ds ON ds.doc_id = e.src
JOIN read_parquet('{ORACLE_DOCS_PATH}') dd ON dd.doc_id = e.dst
GROUP BY ds.domain_key, dd.domain_key
"""


def _anchor_text_oracle_sql() -> str:
    from .crawl_queries import ORACLE_ANCHORS_PATH

    return f"""
SELECT dst, CAST(count(*) AS BIGINT) AS n_inlinks,
       min(anchor) AS min_anchor, max(anchor) AS max_anchor
FROM read_parquet('{ORACLE_ANCHORS_PATH}')
GROUP BY dst
"""


def _link_degree_oracle_sql() -> str:
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_EDGES_PATH

    return f"""
WITH ind AS (
  SELECT d.doc_id, CAST(count(e.src) AS BIGINT) AS in_degree
  FROM read_parquet('{ORACLE_DOCS_PATH}') d
  LEFT JOIN (SELECT DISTINCT src, dst
             FROM read_parquet('{ORACLE_EDGES_PATH}')) e
    ON e.dst = d.doc_id
  GROUP BY d.doc_id)
SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM ind GROUP BY in_degree
"""


# ---------------------------------------------------------------------------
# TrustRank (personalized PageRank from the crawl's seed set) — integer-exact
# ---------------------------------------------------------------------------

def trustrank(nodes: rd.Dataset, edges: rd.Dataset,
              iters: int = PR_ITERS,
              num_partitions: int | None = None,
              inline_edge_cap: int = _INLINE_EDGE_CAP,
              edges_subset_of_nodes: bool = False) -> rd.Dataset:
    """TrustRank (Gyöngyi et al., VLDB 2004): PageRank whose teleport
    mass lands ONLY on a trusted seed set — here the crawl's depth-0
    pages. Spam/mirror farms deep in the graph get rank only through
    paths from the seeds, so the score is the crawl-frontier trust
    signal (prioritize pages reachable from vetted roots).

    *nodes* carries (doc_id, trusted:int64 0/1). Same exact-int64
    discipline as ``pagerank``:

        R0(v)  = trusted(v) * (SCALE // |T|)
        R'(v)  = trusted(v) * (15 * (SCALE // |T|)) // 100
                 + (85 * S(v)) // 100

    Engine shape matches ``pagerank`` (2 shuffles/iteration over the
    edge list) with one twist: the per-node teleport base rides the
    rank table as a ``b`` column — contributions union in with b=0 and
    ``Max(b)`` recovers each node's base in the same groupby that sums
    S(v), so personalization costs NO extra join or broadcast. Inline
    numpy fast path under ``inline_edge_cap``, bit-identical.

    Ghost ids (an edge endpoint absent from *nodes*) CANNOT enter the
    rank table: outdegree is counted over ALL edges (mass along a
    ghost-dst edge evaporates, like dangling mass — mirrored in the
    oracle's unrestricted outdeg CTE), but contributions are delivered
    only to dst in *nodes* (a semi-join in the distributed path, an
    index-validity filter inline), and ghost srcs never match the
    nodes-only rank table. Callers that guarantee edges are endpoints
    within *nodes* (the crawl queries — edges are filtered to crawled
    targets) pass ``edges_subset_of_nodes=True`` to skip the setup
    semi-join."""
    import numpy as np
    from ray.data.aggregate import Max, Sum

    empty = pa.table({"doc_id": pa.array([], pa.string()),
                      "tr": pa.array([], pa.int64())})
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(empty)
    n_trusted = int(nodes.sum("trusted"))
    if n_trusted == 0:
        # no seeds -> no teleport mass anywhere; every rank is 0
        def zero(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t.column("doc_id"),
                             "tr": pa.array([0] * t.num_rows, pa.int64())})
        return nodes.map_batches(zero, batch_format="pyarrow")
    r0 = PR_SCALE // n_trusted
    base = (15 * r0) // 100

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= inline_edge_cap and n <= inline_edge_cap:
        rows = sorted((r["doc_id"], int(r["trusted"]))
                      for r in nodes.take_all(limit=inline_edge_cap + 1))
        node_ids = [d for d, _ in rows]
        tr_mask = np.array([t for _, t in rows], np.int64)
        src_i, dst_i = _edge_indices(edges, node_ids)
        if edges_subset_of_nodes:
            od = np.bincount(src_i, minlength=n).astype(np.int64)
        else:
            # outdeg over ALL edges with a known src (ghost-dst edges
            # included — their mass evaporates), matching the oracle's
            # unrestricted outdeg CTE; _edge_indices drops ghost pairs
            # so the filtered src_i alone would undercount
            od = np.zeros(n, np.int64)
            vset = pa.array(node_ids)
            for b in edges.iter_batches(batch_format="pyarrow"):
                si = (pc.index_in(b.column("src"), value_set=vset)
                      .drop_null().to_numpy(zero_copy_only=False))
                if len(si):
                    od += np.bincount(si.astype(np.int64), minlength=n)
        r = tr_mask * r0
        for _ in range(iters):
            s = np.zeros(n, np.int64)
            if n_edges:
                np.add.at(s, dst_i, r[src_i] // od[src_i])
            r = tr_mask * base + (85 * s) // 100
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(node_ids, pa.string()),
            "tr": pa.array(r, pa.int64())}))

    if num_partitions is None:
        num_partitions = int(min(64, max(2, n_edges // 65536 + 2)))

    outdeg = drop_empty_blocks(
        edges.groupby("src").count().rename_columns({"count()": "od"}))
    keyed = drop_empty_blocks(
        edges.join(outdeg, join_type="inner",
                   num_partitions=num_partitions,
                   on=("src",)))
    if not edges_subset_of_nodes:
        # semi-join dst against the node set so ghost ids can never
        # enter the rank table via the contribution groupby (outdeg
        # above is over ALL edges, so ghost-dst mass still evaporates)
        def as_dst(t: pa.Table) -> pa.Table:
            return pa.table({"dst": t.column("doc_id")})

        node_dst = drop_empty_blocks(
            nodes.select_columns(["doc_id"])
            .map_batches(as_dst, batch_format="pyarrow"))
        keyed = drop_empty_blocks(
            keyed.join(node_dst, join_type="inner",
                       num_partitions=num_partitions, on=("dst",)))
    keyed = keyed.materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        tr = pc.cast(t.column("trusted"), pa.int64())
        return pa.table({"src": t.column("doc_id"),
                         "r": pc.multiply(tr, pa.scalar(r0, pa.int64())),
                         "b": pc.multiply(tr, pa.scalar(base, pa.int64()))})

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        import numpy as np
        r = t.column("r").to_numpy().astype(np.int64)
        od = t.column("od").to_numpy().astype(np.int64)
        return pa.table({"src": t.column("dst"),
                         "s": pa.array(r // od, type=pa.int64()),
                         "b": pa.array(np.zeros(t.num_rows, np.int64))})

    def zero_s(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"),
                         "s": pa.array([0] * t.num_rows, pa.int64()),
                         "b": t.column("b")})

    def rescale(t: pa.Table) -> pa.Table:
        import numpy as np
        s = t.column("s").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        return pa.table({"src": t.column("src"),
                         "r": pa.array(b + (85 * s) // 100, pa.int64()),
                         "b": pa.array(b)})

    for _ in range(iters):
        prop = keyed.join(ranks, join_type="inner",
                          num_partitions=num_partitions, on=("src",))
        summed = drop_empty_blocks(
            prop.map_batches(contrib, batch_format="pyarrow")
            .union(ranks.map_batches(zero_s, batch_format="pyarrow"))
            .groupby("src").aggregate(Sum("s", alias_name="s"),
                                      Max("b", alias_name="b")))
        ranks = summed.map_batches(
            rescale, batch_format="pyarrow").materialize()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("src"), "tr": t.column("r")})

    return ranks.map_batches(rename, batch_format="pyarrow")


def q_link_trustrank(sf_dir: str) -> rd.Dataset:
    """TrustRank over the crawl's link graph, trusted set = the crawl's
    depth-0 (seed) pages — trust flows out from the vetted seed list
    instead of raining uniformly, the frontier-prioritization signal
    that starves link farms unreachable from the roots. Same cached
    edge list as the other graph queries; oracle = the same integer
    iterations unrolled as CTEs over the sequential oracle crawler's
    fixtures."""
    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    edges = _cached_link_edges(sf_dir)

    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "trusted": pc.cast(pc.equal(t.column("depth"), 0), pa.int64()),
        })

    nodes = docs.select_columns(["doc_id", "depth"]).map_batches(
        flag, batch_format="pyarrow")
    return trustrank(nodes, edges, edges_subset_of_nodes=True)


def _trustrank_oracle_sql() -> str:
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_EDGES_PATH

    parts = [f"""
WITH nodes AS (SELECT doc_id, depth FROM read_parquet('{ORACLE_DOCS_PATH}')),
edges AS (SELECT DISTINCT src, dst FROM read_parquet('{ORACLE_EDGES_PATH}')),
nt AS (SELECT count(*) AS n FROM nodes WHERE depth = 0),
outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
t0 AS (SELECT doc_id,
              CASE WHEN depth = 0
                   THEN {PR_SCALE} // (SELECT n FROM nt) ELSE 0 END AS r
       FROM nodes)"""]
    base = (f"CASE WHEN nodes.depth = 0 THEN "
            f"(15 * ({PR_SCALE} // (SELECT n FROM nt))) // 100 ELSE 0 END")
    for i in range(1, PR_ITERS + 1):
        parts.append(f""",
c{i} AS (
  SELECT e.dst AS doc_id, sum(t{i-1}.r // o.od) AS s
  FROM edges e
  JOIN t{i-1} ON e.src = t{i-1}.doc_id
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
t{i} AS (
  SELECT nodes.doc_id,
         {base} + (85 * coalesce(c{i}.s, 0)) // 100 AS r
  FROM nodes LEFT JOIN c{i} USING (doc_id))""")
    parts.append(f"""
SELECT doc_id, CAST(r AS BIGINT) AS tr FROM t{PR_ITERS}
""")
    return "".join(parts)


ORACLE_SQL = {"neardup_clusters": _clusters_oracle_sql(),
              "link_bfs": _link_bfs_oracle_sql(),
              "link_triangles": _link_triangles_oracle_sql(),
              "link_pagerank": _pagerank_oracle_sql(),
              "link_hits": _hits_oracle_sql(),
              "anchor_text": _anchor_text_oracle_sql(),
              "link_degree": _link_degree_oracle_sql(),
              "link_components": _link_components_oracle_sql(),
              "host_graph": _host_graph_oracle_sql(),
              "crawl_budget": _crawl_budget_oracle_sql(),
              "link_trustrank": _trustrank_oracle_sql()}

QUERIES = {"neardup_clusters": q_neardup_clusters,
           "link_bfs": q_link_bfs,
           "link_triangles": q_link_triangles,
           "link_pagerank": q_link_pagerank,
           "link_hits": q_link_hits,
           "anchor_text": q_anchor_text,
           "link_degree": q_link_degree,
           "link_components": q_link_components,
           "host_graph": q_host_graph,
           "crawl_budget": q_crawl_budget,
           "link_trustrank": q_link_trustrank}
