"""Relational operators as Ray Data pipelines (SURVEY.md §2.4-§2.7).

Every public ``q_*`` function takes an ``sf_dir`` containing the driver's
parquet tables and returns a ``ray.data.Dataset`` (or small pyarrow
Table); ``ORACLE_SQL`` maps each query name to the ANSI-SQL equivalent
DuckDB runs over the same tables for the correctness gate. Column names
match between the two on purpose — the driver's compare hashes values
after sorting columns by name.

Determinism notes:
- float aggregate columns are rounded identically on both sides (the
  parallel sum's last-ulp wobble would otherwise break value hashes);
- collect_list outputs are sorted and joined to a CSV string (list
  ordering is undefined in both engines otherwise);
- top-k queries carry a unique tiebreak column in the sort key.

Reference parity: each query cites the reference operator it models.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .common import join_parts
from ray.data.aggregate import Count, Max, Min, Sum


from .common import int_scaled as _int_scaled
from .common import read_sf_table as _t


def _round_cols(digits: int, *cols: str):
    """map_batches fn rounding float columns for cross-engine hash equality."""

    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            t = t.set_column(
                t.schema.get_field_index(c), c, pc.round(t.column(c), digits)
            )
        return t

    return fn


# ---------------------------------------------------------------------------
# Aggregations (reference A1-A6: handlers/cn_postalcode.py:184-216,
# utils/utility_commons.py:116-120)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str) -> rd.Dataset:
    """Flagship groupby-aggregate (TPC-H Q1 shape; models the reference's
    per-entity summary tables, cn_postalcode.py:196-214)."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_tax"])

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), t.column("l_tax")))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": _int_scaled(t.column("l_quantity"), 1),
                "base_c": _int_scaled(t.column("l_extendedprice"), 100),
                "disc_c": _int_scaled(disc_price, 10_000),
                "charge_c": _int_scaled(charge, 1_000_000),
            }
        )

    agg = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_c", alias_name="base_c"),
            Sum("disc_c", alias_name="disc_c"),
            Sum("charge_c", alias_name="charge_c"),
            Count(alias_name="count_order"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": t.column("sum_qty"),
                "sum_base_price": pc.divide(pc.cast(t.column("base_c"), pa.float64()), 100.0),
                "sum_disc_price": pc.divide(pc.cast(t.column("disc_c"), pa.float64()), 10_000.0),
                "sum_charge": pc.divide(pc.cast(t.column("charge_c"), pa.float64()), 1_000_000.0),
                "avg_qty": pc.round(
                    pc.divide(pc.cast(t.column("sum_qty"), pa.float64()),
                              pc.cast(t.column("count_order"), pa.float64())), 2),
                "count_order": t.column("count_order"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)  AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
                                                               AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0
                                                               AS sum_charge,
       round(sum(CAST(round(l_quantity) AS BIGINT)) / CAST(count(*) AS DOUBLE), 2) AS avg_qty,
       count(*)                                                AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_group_minmax(sf_dir: str) -> rd.Dataset:
    """Grouped min/max (reference A1: cn_postalcode.py:196-199)."""
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_totalprice", "o_orderkey"])
    return ds.groupby("o_orderpriority").aggregate(
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
        Count(alias_name="n"),
    )


ORACLE_SQL["group_minmax"] = """
SELECT o_orderpriority, min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price, count(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def q_group_collect(sf_dir: str) -> rd.Dataset:
    """Grouped collect_list (reference A2: cn_postalcode.py:207-209).
    Output is a sorted CSV string for deterministic comparison.

    Scale shape: collect_list over a low-cardinality group key would
    put ~1/|segments| of the whole table in ONE map_groups task, so the
    distinct (segment, nationkey) pairs are pre-aggregated first — a
    per-batch Arrow distinct (the combiner) then a hash-shuffle groupby
    — and only the <= |segments|x|nations|-row result is collected."""
    import pandas as pd

    ds = _t(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["c_mktsegment", "c_nationkey"]).aggregate([])

    pairs = (
        ds.map_batches(distinct_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["c_mktsegment", "c_nationkey"])
        .aggregate(Count(alias_name="_n"))
    )

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(set(int(v) for v in g["c_nationkey"]))
        return pd.DataFrame(
            {"c_mktsegment": [g["c_mktsegment"].iloc[0]],
             "nations_csv": [",".join(str(v) for v in vals)]}
        )

    return pairs.groupby("c_mktsegment").map_groups(
        collect, batch_format="pandas")


ORACLE_SQL["group_collect"] = """
SELECT c_mktsegment,
       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations_csv
FROM customer GROUP BY c_mktsegment
"""


def q_rollup_union(sf_dir: str) -> rd.Dataset:
    """Grouping-sets rollup by hand (reference A3: cn_postalcode.py:196-214
    — same measure at three hierarchy levels, unioned)."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    fine = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"), Count(alias_name="n")
    )
    mid = ds.groupby("l_returnflag").aggregate(
        Sum("l_quantity", alias_name="sum_qty"), Count(alias_name="n")
    )

    def add_null_status(t: pa.Table) -> pa.Table:
        return t.add_column(
            1, "l_linestatus", pa.nulls(t.num_rows, pa.string())
        )

    mid = mid.map_batches(add_null_status, batch_format="pyarrow")
    return fine.union(mid)


ORACLE_SQL["rollup_union"] = """
SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
"""


def q_distinct_pairs(sf_dir: str) -> rd.Dataset:
    """Distinct + counts (reference A5: db.py:189 ``unique().tolist()``)."""
    return (
        _t(sf_dir, "documents", ["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"))
    )


ORACLE_SQL["distinct_pairs"] = """
SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY lang, source
"""


def q_max_strlen(sf_dir: str) -> rd.Dataset:
    """Per-group max string length (reference A6: get_df_col_size,
    utility_commons.py:116-120 — drives NVARCHAR sizing)."""
    ds = _t(sf_dir, "documents", ["source", "text", "n_chars"])

    def strlen(t: pa.Table) -> pa.Table:
        return t.append_column("text_len", pc.utf8_length(t.column("text")))

    return (
        ds.map_batches(strlen, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Max("text_len", alias_name="max_len"),
                   Max("n_chars", alias_name="max_n_chars"))
    )


ORACLE_SQL["max_strlen"] = """
SELECT source, max(length(text)) AS max_len, max(n_chars) AS max_n_chars
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# Joins (reference J1-J8: cn_postalcode.py:216-218, db.py:191-203)
# ---------------------------------------------------------------------------

def q_join_broadcast(sf_dir: str) -> rd.Dataset:
    """Fact x small-dim broadcast join (reference J8: static code lookups
    shipped in-repo, joined in the parse stage). The dim table is read
    once on the driver and published to the object store with ``ray.put``
    — each task fetches the shared copy (plasma-local after first read)
    instead of deserializing a pickled closure copy per task."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_of = dict(zip(part.column("p_partkey").to_pylist(),
                        part.column("p_brand").to_pylist()))
    dim_ref = ray.put(brand_of)

    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def join_agg(t: pa.Table) -> pa.Table:
        lookup = ray.get(dim_ref)
        brands = [lookup.get(k) for k in t.column("l_partkey").to_pylist()]
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        out = pa.table({"p_brand": pa.array(brands, pa.string()),
                        "rev_c": _int_scaled(rev, 10_000)})
        # inner-join semantics (matches the SQL oracle): drop unmatched keys
        return out.filter(pc.is_valid(out.column("p_brand")))

    agg = (
        ds.map_batches(join_agg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_brand")
        .aggregate(Sum("rev_c", alias_name="rev_c"), Count(alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": t.column("p_brand"),
            "revenue": pc.divide(pc.cast(t.column("rev_c"), pa.float64()), 10_000.0),
            "n": t.column("n"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["join_broadcast"] = """
SELECT p.p_brand,
       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
       count(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


def q_join_hash(sf_dir: str) -> rd.Dataset:
    """Distributed hash join (reference J3 merge semantics,
    cn_postalcode.py:216) via Ray Data's native shuffle join."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(cust, join_type="inner", num_partitions=join_parts(),
                         on=("o_custkey",), right_on=("c_custkey",))

    def scale(t: pa.Table) -> pa.Table:
        return pa.table({"c_nationkey": t.column("c_nationkey"),
                         "price_c": _int_scaled(t.column("o_totalprice"), 100)})

    agg = (
        joined.map_batches(scale, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("price_c", alias_name="price_c"), Count(alias_name="n_orders"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": t.column("c_nationkey"),
            "total_price": pc.divide(pc.cast(t.column("price_c"), pa.float64()), 100.0),
            "n_orders": t.column("n_orders"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["join_hash"] = """
SELECT c.c_nationkey, sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
"""


def q_join_left(sf_dir: str) -> rd.Dataset:
    """Left outer join keeping dangling left rows (reference J3:
    ``merge(..., how='left')``, cn_postalcode.py:216): customers with
    their order counts, zero when none."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    joined = cust.join(orders, join_type="left_outer", num_partitions=join_parts(),
                       on=("c_custkey",), right_on=("o_custkey",))

    # count(o_orderkey) == sum of a notnull flag: project the flag in a
    # vectorized map, then one Sum aggregate — no per-customer pandas
    # dispatch (the old map_groups paid one Python call per custkey)
    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_mktsegment": t.column("c_mktsegment"),
            "has_order": pc.cast(pc.is_valid(t.column("o_orderkey")),
                                 pa.int64()),
        })

    return (joined.map_batches(flag, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["c_custkey", "c_mktsegment"])
            .aggregate(Sum("has_order", alias_name="n_orders")))


ORACLE_SQL["join_left"] = """
SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
"""


def q_join_anti(sf_dir: str) -> rd.Dataset:
    """Anti join — the reference's resume set-difference
    (get_to_runs, db.py:191-203: all entities minus entities done today).
    Here: customers with no URGENT order. The done-set is distinct-small,
    so it broadcasts into the filter closure (J6 -> seen-filter shape)."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    urgent = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("o_orderpriority"), "1-URGENT")
        return t.filter(m).select(["o_custkey"])

    done = urgent.map_batches(keys, batch_format="pyarrow",
                              zero_copy_batch=True)
    # native distributed anti join — the done-set never touches the
    # driver (contrast: the reference materializes both entity lists,
    # db.py:191-203)
    return cust.join(done, join_type="left_anti", num_partitions=join_parts(8),
                     on=("c_custkey",), right_on=("o_custkey",))


def q_join_semi(sf_dir: str) -> rd.Dataset:
    """Semi join — existence filter without multiplying rows (the
    complement of J6's anti join): customers holding at least one open
    ('O') order. Native distributed left_semi; the probe side stays
    off the driver and duplicate order rows never fan out."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    open_orders = _t(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("o_orderstatus"), "O")
        return t.filter(m).select(["o_custkey"])

    probe = open_orders.map_batches(keys, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return cust.join(probe, join_type="left_semi", num_partitions=join_parts(8),
                     on=("c_custkey",), right_on=("o_custkey",))


def q_join_outer(sf_dir: str) -> rd.Dataset:
    """Full outer join (reference J4: divisions x postal summary outer
    merge, cn_postalcode.py:218): per-nation customer counts FULL OUTER
    per-nation supplier counts — danglers survive on both sides."""
    cust = (_t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            .groupby("c_nationkey").aggregate(Count(alias_name="n_cust")))
    supp = (_t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
            .groupby("s_nationkey").aggregate(Count(alias_name="n_supp")))
    joined = cust.join(supp, join_type="full_outer", num_partitions=join_parts(8),
                       on=("c_nationkey",), right_on=("s_nationkey",))

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces the join key into the left column name
        return pa.table({
            "nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "n_cust": pc.coalesce(t.column("n_cust"), pa.scalar(0)),
            "n_supp": pc.coalesce(t.column("n_supp"), pa.scalar(0)),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["join_outer"] = """
SELECT CAST(coalesce(c.c_nationkey, s.s_nationkey) AS BIGINT) AS nationkey,
       coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
"""


ORACLE_SQL["join_anti"] = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""

ORACLE_SQL["join_semi"] = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


# ---------------------------------------------------------------------------
# Dedup / set ops (reference D1-D5: db.py:38-54, db.py:200,
# cn_postalcode.py:205,214)
# ---------------------------------------------------------------------------

def keep_max_by(ds: rd.Dataset, key: str, order_col: str,
                num_partitions: int = 8) -> rd.Dataset:
    """One full row per ``key``: the row holding the maximum
    ``order_col``. Fully vectorized — no per-group Python dispatch:

    1. per-batch partial keep-max (Arrow sort + encounter-order
       ``hash_first``, all C++) shrinks the exchange to at most one row
       per (key, block);
    2. ONE hash-shuffle ``repartition(keys=[key])`` co-locates each
       key's surviving rows;
    3. the same vectorized keep-max pass per output block finishes the
       reduce — exactly one row per key.

    Contrast ``groupby(key).map_groups(keep_last)``: that pays one
    pandas-DataFrame construction + Python call PER DISTINCT KEY —
    millions of dispatches at corpus scale. Here every stage is a
    constant number of vectorized passes, and the only exchange moves
    <= one row per (key, input block). (A Max-aggregate + semi-join
    plan was measured 2.5x slower: two shuffles instead of one.)

    Invariant: ``order_col`` must be unique within each key (true at
    every call site — o_orderkey is globally unique, crawl_path is
    unique per doc, page_no is unique per entity). A tie on the max
    would keep the first-encountered row after the shuffle, matching
    the old map_groups path's nondeterministic tie-break. Integer order
    columns are normalized to int64 so partial blocks unify.

    ``num_partitions`` sizes the shuffle: at the test tiers 8 is
    plenty; at 100 TB pass ~(cluster cores), since post-partial volume
    is one row per (key, block)."""
    from ray.data.context import ShuffleStrategy

    from .common import drop_empty_blocks

    def partial_keep_max(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(order_col)
        if pa.types.is_integer(t.field(i).type):
            t = t.set_column(i, order_col,
                             pc.cast(t.column(order_col), pa.int64()))
        # sort desc by order, then keep the first encounter per key —
        # pyarrow's hash_first respects encounter order when
        # use_threads=False, so this is drop_duplicates in C++
        t = t.take(pc.sort_indices(t, sort_keys=[(order_col, "descending")]))
        others = [c for c in t.column_names if c != key]
        g = t.group_by(key, use_threads=False).aggregate(
            [(c, "first") for c in others])
        return g.rename_columns(
            [n[:-6] if n.endswith("_first") else n for n in g.column_names])

    # empty upstream batches yield schema-less blocks that poison the
    # shuffle's key resolution — scrub before the exchange. Arrow-format
    # blocks deliberately: the hash-shuffle aggregator re-converts
    # pandas blocks per partition (measured 16x slower).
    partial = drop_empty_blocks(
        ds.map_batches(partial_keep_max, batch_format="pyarrow",
                       zero_copy_batch=True))
    # keyed repartition requires the hash-shuffle strategy; flip it on
    # this dataset's captured context (joins already run this machinery)
    partial.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return drop_empty_blocks(
        partial.repartition(num_partitions, keys=[key])
        .map_batches(partial_keep_max, batch_format="pyarrow",
                     zero_copy_batch=True))


def q_dedup_keep_latest(sf_dir: str) -> rd.Dataset:
    """Key dedup keeping the newest row — the reference's sink dedupe
    (delete_table_dup/upload dedupe_col, db.py:38-54: last write wins on
    Source_ID). Here: one row per customer, their highest-numbered order.
    Vectorized via keep_max_by (partial keep-max + Max aggregate +
    semi join) — no per-group pandas dispatch."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return keep_max_by(ds, "o_custkey", "o_orderkey")


ORACLE_SQL["dedup_keep_latest"] = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1
"""


def q_union_all(sf_dir: str) -> rd.Dataset:
    """Union of two filtered streams then re-aggregate (reference D3:
    pd.concat of grouping frames, cn_postalcode.py:205,214)."""
    ev = _t(sf_dir, "events", ["event_type", "value"])

    def f(kind: str):
        return ev.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t.column("event_type"), k)),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    def scale(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "value_u": _int_scaled(t.column("value"), 1_000_000)})

    agg = (
        f("signup").union(f("error"))
        .map_batches(scale, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value_u", alias_name="value_u"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "n": t.column("n"),
            "total_value": pc.divide(pc.cast(t.column("value_u"), pa.float64()),
                                     1_000_000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["union_all"] = """
SELECT event_type, count(*) AS n,
       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total_value
FROM (SELECT * FROM events WHERE event_type = 'signup'
      UNION ALL
      SELECT * FROM events WHERE event_type = 'error')
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Sort / top-k / filters / scalar functions (reference O1-O5, M9-M17)
# ---------------------------------------------------------------------------

def q_top_orders(sf_dir: str) -> rd.Dataset:
    """Top-k by value with a unique tiebreak (reference O5 head-n,
    cn_postalcode.py:188)."""
    return (
        _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, True])
        .limit(10)
    )


ORACLE_SQL["top_orders"] = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10
"""


def q_filter_contains(sf_dir: str) -> rd.Dataset:
    """Substring containment filter (reference M15: location containment,
    baidu_api.py:64-69)."""
    ds = _t(sf_dir, "documents", ["doc_id", "source", "lang", "text"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.match_substring(t.column("text"), "spark"),
                    pc.equal(t.column("lang"), "en"))
        return t.filter(m).select(["doc_id", "source"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["filter_contains"] = """
SELECT doc_id, source FROM documents
WHERE text LIKE '%spark%' AND lang = 'en'
"""


def q_regex_extract(sf_dir: str) -> rd.Dataset:
    """Regex id extraction (reference M12/§2.8: numeric-id regex from URLs,
    diandianzu.py:95, haozu.py:48) applied to the events props payload."""
    ds = _t(sf_dir, "events", ["event_id", "props"])

    def f(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"), r"(?P<k>\d+)")
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        return pa.table({"event_id": t.column("event_id"), "k": k})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["regex_extract"] = """
SELECT event_id,
       CAST(NULLIF(regexp_extract(props, '(\\d+)', 1), '') AS BIGINT) AS k
FROM events
"""


def q_json_flatten(sf_dir: str) -> rd.Dataset:
    """JSON flatten (reference M13: get_nested_value recursive flatten,
    utility_commons.py:59-68)."""
    import json as _json

    ds = _t(sf_dir, "events", ["event_id", "props"])

    def f(t: pa.Table) -> pa.Table:
        ks = []
        for p in t.column("props").to_pylist():
            try:
                ks.append(int(_json.loads(p).get("k")))
            except (ValueError, TypeError):
                ks.append(None)
        return pa.table({"event_id": t.column("event_id"),
                         "k": pa.array(ks, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["json_flatten"] = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
"""


def q_truncate_stamp(sf_dir: str) -> rd.Dataset:
    """String clamp + constant stamp column (reference M10 truncation,
    utility_commons.py:124-130 / haozu.py:127-134, and M8 timestamp
    stamping, scrapers.py:77-81)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        clamped = pc.utf8_slice_codeunits(t.column("text"), 0, 50)
        stamp = pa.array(["2024-01-01"] * t.num_rows, pa.string())
        return pa.table({"doc_id": t.column("doc_id"),
                         "text_trunc": clamped, "stamp": stamp})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["truncate_stamp"] = """
SELECT doc_id, substr(text, 1, 50) AS text_trunc, '2024-01-01' AS stamp
FROM documents
"""


def q_explode_tokens(sf_dir: str) -> rd.Dataset:
    """Row explosion (reference M1/M2 list-page item extraction — one
    page row becomes N item rows, diandianzu.py:27-36)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        toks: list[str] = []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            if did < 50:
                for tok in text.split(" "):
                    ids.append(did)
                    toks.append(tok)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["explode_tokens"] = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents WHERE doc_id < 50
"""


def q_event_stats(sf_dir: str) -> rd.Dataset:
    """Grouped multi-aggregate over the event stream (reference A4 run
    stats + per-entity bounds, scrapers.py:100,144)."""
    ds = _t(sf_dir, "events", ["event_type", "value", "user_id"])
    def scale(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "user_id": t.column("user_id"),
                         "value_u": _int_scaled(t.column("value"), 1_000_000)})

    agg = (
        ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value_u", alias_name="value_u"),
            Min("user_id", alias_name="min_user"),
            Max("user_id", alias_name="max_user"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "n": t.column("n"),
            "total_value": pc.divide(pc.cast(t.column("value_u"), pa.float64()),
                                     1_000_000.0),
            "min_user": t.column("min_user"),
            "max_user": t.column("max_user"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["event_stats"] = """
SELECT event_type, count(*) AS n,
       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total_value,
       min(user_id) AS min_user, max(user_id) AS max_user
FROM events GROUP BY event_type
"""



def q_range_join(sf_dir: str) -> rd.Dataset:
    """Range (band) join — each order matched to its price band.

    The bands dimension is tiny and sorted, so the scale plan is a
    broadcast + vectorized ``searchsorted`` per batch (never an
    all-pairs shuffle); the DuckDB oracle is the equivalent BETWEEN
    join. Bands: [0,50k), [50k,150k), [150k,300k), [300k,inf).
    """
    import numpy as np

    edges = np.array([0.0, 50_000.0, 150_000.0, 300_000.0])
    names = ["B0_low", "B1_mid", "B2_high", "B3_top"]

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def band(t: pa.Table) -> pa.Table:
        prices = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, prices, side="right") - 1
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "band": pa.array([names[i] for i in idx], pa.string()),
        })

    from ray.data.aggregate import Count as _Count

    return (
        ds.map_batches(band, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band")
        .aggregate(_Count(alias_name="n_orders"))
    )


ORACLE_SQL["range_join"] = """
SELECT b.band, count(*) AS n_orders
FROM orders o
JOIN (VALUES ('B0_low', 0, 50000), ('B1_mid', 50000, 150000),
             ('B2_high', 150000, 300000), ('B3_top', 300000, 1e18))
     b(band, lo, hi)
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
"""


def q_stable_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic ~10%% hash sample (stable holdout split): keep docs
    whose md5(text) hex starts below '1a' — identical membership on any
    cluster size or run, unlike seeded random_sample whose draw depends
    on block layout."""
    import hashlib as _hl

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        keep = [_hl.md5(x.encode()).hexdigest()[:2] <= "19"
                for x in t.column("text").to_pylist()]
        return t.filter(pa.array(keep)).select(["doc_id"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["stable_sample"] = """
SELECT doc_id FROM documents WHERE substr(md5(text), 1, 2) <= '19'
"""

QUERIES = {
    "pricing_summary": q_pricing_summary,
    "group_minmax": q_group_minmax,
    "group_collect": q_group_collect,
    "rollup_union": q_rollup_union,
    "distinct_pairs": q_distinct_pairs,
    "max_strlen": q_max_strlen,
    "join_broadcast": q_join_broadcast,
    "join_hash": q_join_hash,
    "join_left": q_join_left,
    "join_anti": q_join_anti,
    "join_semi": q_join_semi,
    "join_outer": q_join_outer,
    "range_join": q_range_join,
    "stable_sample": q_stable_sample,
    "dedup_keep_latest": q_dedup_keep_latest,
    "union_all": q_union_all,
    "top_orders": q_top_orders,
    "filter_contains": q_filter_contains,
    "regex_extract": q_regex_extract,
    "json_flatten": q_json_flatten,
    "truncate_stamp": q_truncate_stamp,
    "explode_tokens": q_explode_tokens,
    "event_stats": q_event_stats,
}
