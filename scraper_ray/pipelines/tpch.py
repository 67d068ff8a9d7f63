"""Multi-table analytical joins in the TPC-H Q5/Q10 shape.

The reference's analytical surface is single-join + groupby summaries
(handlers/cn_postalcode.py:184-216 aggregates, utility_commons.py:116-130
sink joins); production curation pipelines routinely chain 4-6 tables
(fact x fact x several dims). These two queries exercise that plan shape
end-to-end on the driver's star schema:

- ``regional_volume`` (TPC-H Q5 shape): lineitem x orders is the one
  big-big hash join; every dimension (supplier, customer->nation,
  nation->region) rides ``ray.put`` broadcast lookups inside the SAME
  map over the join output — at 100 TB the fact-fact join is the only
  all-to-all exchange, dims are one object-store read per actor.
- ``returned_revenue`` (TPC-H Q10 shape): flag-filtered fact join, a
  groupby to O(customers) rows, distributed top-k by (revenue, key),
  then the k winning rows (bounded, k=20) pick up customer/nation
  attributes driver-side.

Money sums follow the repo's exact-integer discipline (``int_scaled``;
see pipelines/common.py) so the distributed sum is bit-equal to the
DuckDB oracle regardless of addition order.

Broadcast-dim discipline: each lookup dict is built only when the dim's
row count is under ``_DIM_BROADCAST_CAP`` (TPC-H dims scale far slower
than facts; suppliers = 0.01 x lineitem). Past the cap the query raises
rather than silently materializing an unbounded driver dict — the
hash-join fallback for oversized dims already exists as ``q_join_hash``'s
plan and would replace the lookup here.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .common import int_scaled as _int_scaled
from .common import read_sf_table as _t

_DIM_BROADCAST_CAP = 4_000_000


def _join_parts(sf_dir: str, fact: str = "lineitem") -> int:
    """Fact-fact hash-join partition count: one partition per ~64k fact
    rows (parquet-metadata count, no data pass), capped at the cluster
    CPU count — a 100 TB fact saturates the cluster while the bench
    tier doesn't pay dozens of shuffle-aggregator startups for 200k
    rows (measured 6.3 s at 32 partitions vs 2.2 s at the derived
    count; same sizing rule as graph.pagerank's num_partitions)."""
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{sf_dir}/{fact}.parquet").metadata.num_rows
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cpus, n_rows // 65536 + 2))


Q5_REGION = "ASIA"
Q5_T0 = _dt.datetime(1996, 1, 1)
Q5_T1 = _dt.datetime(1997, 1, 1)


def _dim_map(sf_dir: str, table: str, key: str, val: str) -> dict:
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, val])
    if tbl.num_rows > _DIM_BROADCAST_CAP:
        raise ValueError(
            f"{table} exceeds the broadcast cap ({tbl.num_rows} rows); "
            "switch this dim to the hash-join plan (q_join_hash shape)")
    return dict(zip(tbl.column(key).to_pylist(), tbl.column(val).to_pylist()))


def q_regional_volume(sf_dir: str) -> rd.Dataset:
    """TPC-H Q5 shape: revenue by nation for orders placed in 1996 where
    the customer and the line's supplier sit in the same ASIA nation.

    Plan: orders is date-pruned at the read and hash-joined to lineitem
    (the single big-big exchange); supplier->nation, customer->nation
    and the region's nation set are ``ray.put`` broadcast dicts applied
    in one vectorized map over the join output; the final groupby
    carries O(nations) rows."""
    nat_region = _dim_map(sf_dir, "nation", "n_nationkey", "n_regionkey")
    nat_name = _dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    region_name = _dim_map(sf_dir, "region", "r_regionkey", "r_name")
    region_nations = {nk for nk, rk in nat_region.items()
                      if region_name[rk] == Q5_REGION}
    name_of = {nk: nat_name[nk] for nk in region_nations}

    def _dim_arrays(table: str, key: str, val: str):
        # broadcast form for fact-sized lookups: sorted key array +
        # aligned value array, probed with vectorized searchsorted
        # (no per-row dict.get in the hot map)
        import numpy as np

        d = _dim_map(sf_dir, table, key, val)
        keys = np.fromiter(d.keys(), dtype=np.int64, count=len(d))
        vals = np.fromiter(d.values(), dtype=np.int64, count=len(d))
        order = np.argsort(keys)
        return keys[order], vals[order]

    cust_ref = ray.put(_dim_arrays("customer", "c_custkey", "c_nationkey"))
    supp_ref = ray.put(_dim_arrays("supplier", "s_suppkey", "s_nationkey"))
    name_ref = ray.put(name_of)

    # the date predicate is pushed into the parquet fragments (row-group
    # stats prune before any byte leaves storage), not a downstream map
    import pyarrow.dataset as pds

    date_pred = ((pds.field("o_orderdate") >= pa.scalar(Q5_T0))
                 & (pds.field("o_orderdate") < pa.scalar(Q5_T1)))
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                filter=date_pred)

    def project(t: pa.Table) -> pa.Table:
        return t.select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(project, batch_format="pyarrow",
                                zero_copy_batch=True)

    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        # pre-join reduction: the supplier->nation broadcast and the
        # region membership test run HERE, before the fact-fact
        # exchange — only region-supplier lines (1/|regions| of the
        # table) enter the join — and a batch-local partial aggregate
        # per (orderkey, supplier-nation) collapses multi-line orders
        # (lineitem arrives orderkey-clustered, so the combine is
        # effective). Item counts ride along so the final Sum matches
        # the old post-join Count exactly.
        import numpy as np

        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "s_nat": pa.array([], pa.int64()),
                          "rev_c": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        sk, sv = ray.get(supp_ref)
        region = np.fromiter(sorted(region_nations), dtype=np.int64,
                             count=len(region_nations))
        if t.num_rows == 0 or not len(sk):
            return empty
        sq = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        si = np.minimum(np.searchsorted(sk, sq), len(sk) - 1)
        snat = sv[si]
        mask = (sk[si] == sq) & np.isin(snat, region)
        if not mask.any():
            return empty
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        rev_c = np.asarray(_int_scaled(rev, 10_000))[mask]
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)[mask]
        fused = ok * 64 + snat[mask]          # nationkeys < 64
        u, inv = np.unique(fused, return_inverse=True)
        # int sums through float64 bincount stay exact (< 2^53 per cell)
        sums = np.bincount(inv, weights=rev_c.astype(np.float64))
        cnt = np.bincount(inv)
        return pa.table({"l_orderkey": pa.array((u // 64).astype(np.int64)),
                         "s_nat": pa.array((u % 64).astype(np.int64)),
                         "rev_c": pa.array(sums.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    line = line.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)
    # the (date-pruned) orders side attaches via bounded broadcast when
    # the FULL orders table fits the cap (metadata-only decision, and
    # the filtered slice can only be smaller): one searchsorted with a
    # membership mask replaces the fact-fact exchange. Past the cap the
    # native hash join takes over — the 100 TB plan is unchanged.
    import pyarrow.parquet as _pq

    if _pq.ParquetFile(
            f"{sf_dir}/orders.parquet").metadata.num_rows \
            <= _DIM_BROADCAST_CAP:
        import numpy as np

        otbl = _pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey"],
            filters=[("o_orderdate", ">=", Q5_T0),
                     ("o_orderdate", "<", Q5_T1)])
        ok_np = otbl.column("o_orderkey").to_numpy()
        oc_np = otbl.column("o_custkey").to_numpy()
        order = np.argsort(ok_np)
        omap_ref = ray.put((ok_np[order], oc_np[order]))

        def attach_cust(t: pa.Table) -> pa.Table:
            import numpy as np

            okeys, ocust = ray.get(omap_ref)
            if t.num_rows == 0 or not len(okeys):
                return pa.table({"o_custkey": pa.array([], pa.int64()),
                                 "s_nat": pa.array([], pa.int64()),
                                 "rev_c": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            lk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(okeys, lk), len(okeys) - 1)
            m = okeys[pos] == lk   # only orders inside the date window
            f = t.filter(pa.array(m))
            return pa.table({
                "o_custkey": pa.array(ocust[pos[m]], pa.int64()),
                "s_nat": f.column("s_nat"),
                "rev_c": f.column("rev_c"),
                "n": f.column("n")})

        joined = line.map_batches(attach_cust, batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        joined = line.join(orders, join_type="inner",
                           num_partitions=_join_parts(sf_dir),
                           on=("l_orderkey",), right_on=("o_orderkey",))

    def dims(t: pa.Table) -> pa.Table:
        # vectorized broadcast-dim application: the customer->nation
        # probe and the same-nation test against the pre-joined
        # supplier nation, then a tiny nation->name take
        import numpy as np

        ck, cv = ray.get(cust_ref)
        names = ray.get(name_ref)
        if t.num_rows == 0 or not names or not len(ck):
            return pa.table({"n_name": pa.array([], pa.string()),
                             "rev_c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        cq = t.column("o_custkey").to_numpy(zero_copy_only=False)
        sn = t.column("s_nat").to_numpy(zero_copy_only=False)
        ci = np.minimum(np.searchsorted(ck, cq), len(ck) - 1)
        cn = cv[ci]
        mask = (ck[ci] == cq) & (cn == sn)
        nat_keys = np.fromiter(sorted(names), dtype=np.int64,
                               count=len(names))
        nat_vals = np.array([names[k] for k in sorted(names)], dtype=object)
        cn = cn[mask]
        ni = np.minimum(np.searchsorted(nat_keys, cn), len(nat_keys) - 1)
        mask2 = nat_keys[ni] == cn
        return pa.table({
            "n_name": pa.array(nat_vals[ni][mask2], pa.string()),
            "rev_c": pa.array(
                t.column("rev_c").to_numpy(zero_copy_only=False)
                [mask][mask2], pa.int64()),
            "n": pa.array(
                t.column("n").to_numpy(zero_copy_only=False)
                [mask][mask2], pa.int64())})

    agg = (joined.map_batches(dims, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("rev_c", alias_name="rev_c"),
                      Sum("n", alias_name="n_items")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t.column("n_name"),
            "revenue": pc.divide(pc.cast(t.column("rev_c"), pa.float64()),
                                 10_000.0),
            "n_items": pc.cast(t.column("n_items"), pa.int64()),
        })

    from .common import drop_empty_blocks
    return drop_empty_blocks(agg).map_batches(finish, batch_format="pyarrow")


RETURNED_TOP_K = 20


def q_returned_revenue(sf_dir: str, k: int = RETURNED_TOP_K) -> pa.Table:
    """TPC-H Q10 shape: the top-*k* customers by revenue of returned
    line items (``l_returnflag = 'R'``), with name and nation.

    Plan: the flag filter prunes lineitem in the map before the single
    fact-fact hash join; the groupby collapses to O(customers) rows; a
    distributed sort + limit picks the k winners (ties break by custkey
    ascending — deterministic); only those k rows (bounded by the
    constant k, never data-sized) take their customer/nation attributes
    from driver-side dim reads."""
    import pyarrow.dataset as pds

    # flag predicate pushed into the parquet fragments (row-group
    # dictionary/stats pruning), not a downstream map
    line = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
              filter=pds.field("l_returnflag") == "R")

    def derive(t: pa.Table) -> pa.Table:
        # batch-local partial aggregate per orderkey before the
        # fact-fact exchange (lineitem arrives orderkey-clustered, so
        # multi-line orders collapse here); the item count rides along
        # so the final Sum matches the old post-join Count exactly
        import numpy as np

        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        rev_c = np.asarray(_int_scaled(rev, 10_000))
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        if not len(ok):
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=rev_c.astype(np.float64))
        cnt = np.bincount(inv)
        return pa.table({"l_orderkey": pa.array(u.astype(np.int64)),
                         "rev_c": pa.array(sums.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    line = line.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)
    # orderkey -> custkey attaches via bounded broadcast when orders
    # fits the cap (one sorted-array searchsorted per batch — no
    # fact-fact exchange at all); past the cap the native hash join
    # takes over, so the 100 TB plan is unchanged (the repo's standard
    # broadcast-under-cap-else-join discipline). Row count is parquet
    # metadata — the decision costs no data read.
    import pyarrow.parquet as _pq

    n_orders = _pq.ParquetFile(
        f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= _DIM_BROADCAST_CAP:
        import numpy as np

        otbl = _pq.read_table(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"])
        ok = otbl.column("o_orderkey").to_numpy()
        oc = otbl.column("o_custkey").to_numpy()
        order = np.argsort(ok)
        omap_ref = ray.put((ok[order], oc[order]))

        def attach(t: pa.Table) -> pa.Table:
            import numpy as np

            okeys, ocust = ray.get(omap_ref)
            if t.num_rows == 0 or not len(okeys):
                return pa.table({"o_custkey": pa.array([], pa.int64()),
                                 "rev_c": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            lk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(okeys, lk), len(okeys) - 1)
            # membership mask, not an FK assumption: an orderkey absent
            # from orders drops here exactly as the inner join it
            # replaces would drop it (same guard as Q5's attach_cust)
            m = okeys[pos] == lk
            f = t.filter(pa.array(m))
            return pa.table({
                "o_custkey": pa.array(ocust[pos[m]], pa.int64()),
                "rev_c": f.column("rev_c"),
                "n": f.column("n")})

        joined = line.map_batches(attach, batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        joined = line.join(orders, join_type="inner",
                           num_partitions=_join_parts(sf_dir),
                           on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = (joined.groupby("o_custkey",
                        num_partitions=_join_parts(sf_dir))
                .aggregate(Sum("rev_c", alias_name="rev_c"),
                           Sum("n", alias_name="n_items")))

    from .common import drop_empty_blocks
    top = (drop_empty_blocks(per_cust)
           .sort(["rev_c", "o_custkey"], descending=[True, False])
           .limit(k).take_all())

    name_of = _dim_map(sf_dir, "customer", "c_custkey", "c_name")
    cust_nat = _dim_map(sf_dir, "customer", "c_custkey", "c_nationkey")
    nat_name = _dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    return pa.table({
        "c_custkey": pa.array([r["o_custkey"] for r in top], pa.int64()),
        "c_name": pa.array([name_of[r["o_custkey"]] for r in top],
                           pa.string()),
        "n_name": pa.array([nat_name[cust_nat[r["o_custkey"]]] for r in top],
                           pa.string()),
        "revenue": pa.array([r["rev_c"] / 10_000.0 for r in top],
                            pa.float64()),
        "n_items": pa.array([r["n_items"] for r in top], pa.int64()),
    })


ORACLE_SQL = {
    "regional_volume": f"""
WITH rev AS (
  SELECT c.c_nationkey AS nk,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS rev_c
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey = c.c_nationkey
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01')
SELECT n.n_name,
       sum(rev.rev_c) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM rev
JOIN nation n ON rev.nk = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
GROUP BY n.n_name
""",
    "returned_revenue": f"""
WITH per_cust AS (
  SELECT o.o_custkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                  AS BIGINT)) AS rev_c,
         count(*) AS n_items
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey)
SELECT p.o_custkey AS c_custkey, c.c_name, n.n_name,
       p.rev_c / 10000.0 AS revenue,
       CAST(p.n_items AS BIGINT) AS n_items
FROM per_cust p
JOIN customer c ON p.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
ORDER BY p.rev_c DESC, p.o_custkey ASC
LIMIT {RETURNED_TOP_K}
""",
}

QUERIES = {
    "regional_volume": q_regional_volume,
    "returned_revenue": q_returned_revenue,
}
