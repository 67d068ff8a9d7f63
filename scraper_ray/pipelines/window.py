"""Window-function operators: rank, running totals, moving averages,
two-phase distinct, pivot.

SQL window functions have no direct Ray Data primitive, so each is the
documented composition (SURVEY §2 "custom operators" ladder, option a):
ONE keyed repartition hash-shuffles on the PARTITION BY key (every
key's rows co-located in one block), then a single *vectorized*
segmented pass per block — sort + pandas groupby transform / numpy
shifts, never one Python dispatch per group — with a combiner first
wherever the window runs over an aggregate rather than raw rows:

- ``rank_topn`` — ``row_number() <= k`` per partition. Per-batch partial
  top-k inside ``map_batches`` first, so the shuffle moves at most
  k rows per (group, batch) — never the full orders table.
- ``cumulative_spend`` — running sum per customer. Money sums in scaled
  int64 (exact, associative) so the cumulative values match SQL bit-for-
  bit regardless of DuckDB's segment-tree accumulation order.
- ``moving_avg`` — 3-row frame average over per-(user, day) spend.
  Combiner collapses raw events to day partials before the per-user
  window pass: the groupby moves one row per user-day.
- ``distinct_daily`` — count(DISTINCT user) per day as the two-phase
  distinct: groupby(day, user) collapses duplicates in a distributed
  shuffle, then a tiny groupby(day) counts survivors. Never builds a
  per-day set in one task.
- ``pivot_events`` — per-user event-type counts pivoted to wide columns
  (conditional-aggregate pivot). The type list is a fixed schema
  contract, not data-inferred — Arrow schemas are static per dataset.

Partitioning assumption (documented per the custom-operator rule): one
group's *window input* fits in a worker — true by construction here
because every window runs over per-group aggregates (days, top-k rows),
not raw events; hot-key salting for raw-row windows lives in
``temporal.q_sessions_salted``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from .common import int_scaled, read_sf_table as _t

RANK_K = 3
MAVG_FRAME = 3  # ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_rank_topn(sf_dir: str) -> rd.Dataset:
    """Top-3 orders per customer by price, with their rank.

    row_number semantics: ties broken by ascending o_orderkey, so the
    rank is total and deterministic (reference's NEWID() nondeterminism
    class removed, SURVEY §2 M21)."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def partial_topk(t: pa.Table) -> pa.Table:
        # keep at most k candidate rows per customer per batch — only
        # these can appear in the final top-k
        df = t.to_pandas()
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        # strip the pandas metadata blob: schemas carrying it defeat
        # Ray's downstream schema-dedup ("Failed to hash the schemas")
        return pa.Table.from_pandas(
            df.groupby("o_custkey").head(RANK_K),
            preserve_index=False).replace_schema_metadata(None)

    def final_rank(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per co-located block (the q_knn_graph
        # rank shape): sort, per-key head(k), cumcount rank — no
        # per-customer Python dispatch
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("o_custkey", sort=False).head(RANK_K).copy()
        g["rnk"] = (g.groupby("o_custkey", sort=False).cumcount()
                    + 1).astype("int64")
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rnk"]]

    from .common import keyed_repartition

    partial = ds.map_batches(partial_topk, batch_format="pyarrow",
                             zero_copy_batch=True)
    return keyed_repartition(partial, ["o_custkey"]).map_batches(
        final_rank, batch_format="pandas", batch_size=None)


def q_cumulative_spend(sf_dir: str) -> rd.Dataset:
    """Running total of order spend per customer, ordered by
    (o_orderdate, o_orderkey). Scaled-int cents keep the running sum
    exact and independent of accumulation order."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate",
                               "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate": t.column("o_orderdate"),
            "cents": int_scaled(t.column("o_totalprice"), 100),
        })

    def running(g: pd.DataFrame) -> pd.DataFrame:
        # segmented cumsum over the co-located block: groupby(...).cumsum
        # is one vectorized C pass, not a per-customer dispatch
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort").reset_index(drop=True)
        cum = g.groupby("o_custkey", sort=False)["cents"].cumsum()
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].astype("int64"),
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "cum_spend": cum.astype("int64") / 100.0,
        })

    from .common import keyed_repartition

    pre_ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    return keyed_repartition(pre_ds, ["o_custkey"]).map_batches(
        running, batch_format="pandas", batch_size=None)


def q_moving_avg(sf_dir: str) -> rd.Dataset:
    """3-row moving average of per-(user, day) spend, ordered by day.

    Combiner first: the groupby-sum collapses events to day rows; the
    per-user window pass then slides over day summaries only. The
    average divides the exact int window sum by the window row count in
    the same operation order as the SQL oracle, so float64 results are
    bit-identical."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "day": pc.floor_temporal(t.column("ts"), unit="day"),
            "vu": int_scaled(t.column("value"), 1_000_000),
        })

    days = (ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["user_id", "day"]).sum("vu"))

    def window(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized 3-row frame over the co-located block: the window
        # sum is the value plus up-to-two lagged values masked at user
        # boundaries — pure numpy shifts, no per-user dispatch
        import numpy as np

        n = len(g)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "day": pd.Series([], dtype="datetime64[ns]"),
                "avg_value": pd.Series([], dtype="float64"),
            })
        g = g.sort_values(["user_id", "day"],
                          kind="mergesort").reset_index(drop=True)
        u = g["user_id"].to_numpy()
        vu = g["sum(vu)"].to_numpy(np.int64)
        wsum = vu.astype(np.float64)
        wn = np.ones(n, dtype=np.float64)
        for lag in range(1, MAVG_FRAME):
            same = np.zeros(n, dtype=bool)
            same[lag:] = u[lag:] == u[:-lag]
            lagged = np.zeros(n, dtype=np.int64)
            lagged[lag:] = vu[:-lag]
            wsum[same] += lagged[same]
            wn += same
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "day": g["day"],
            "avg_value": (wsum / wn) / 1_000_000.0,
        })

    from .common import keyed_repartition

    return keyed_repartition(days, ["user_id"]).map_batches(
        window, batch_format="pandas", batch_size=None)


def q_distinct_daily(sf_dir: str) -> rd.Dataset:
    """Distinct users per day — the distributed two-phase distinct.

    Phase 1 shuffles on the *composite* key (day, user), so no task ever
    holds a whole day; phase 2 counts one row per survivor. This is the
    scale-safe count(DISTINCT) plan (a per-day set in one task is the
    anti-pattern)."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.floor_temporal(t.column("ts"), unit="day"),
            "user_id": t.column("user_id"),
        })

    return (ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["day", "user_id"]).aggregate(Count(alias_name="_n"))
            .groupby("day").aggregate(Count(alias_name="n_users"))
            .select_columns(["day", "n_users"]))


def q_pivot_events(sf_dir: str) -> rd.Dataset:
    """Per-user event counts pivoted to one column per event type
    (conditional-aggregate pivot; the wide schema is fixed up front).

    The pivot happens inside the map as a per-batch partial — each batch
    emits one row per user with per-type counts — then a groupby sums
    the partials: the shuffle moves (user, 5 ints) rows, not events."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = (df.pivot_table(index="user_id", columns="event_type",
                              aggfunc="size", fill_value=0)
               .reindex(columns=list(EVENT_TYPES), fill_value=0)
               .astype("int64").reset_index())
        out.columns = ["user_id"] + [f"n_{c}" for c in EVENT_TYPES]
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).groupby("user_id").sum(
        [f"n_{c}" for c in EVENT_TYPES])

    def finish(t: pa.Table) -> pa.Table:
        cols = {"user_id": t.column("user_id")}
        for c in EVENT_TYPES:
            cols[f"n_{c}"] = t.column(f"sum(n_{c})")
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL = {
    "rank_topn": """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
WHERE rnk <= 3
""",
    "cumulative_spend": """
SELECT o_custkey, o_orderkey,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_spend
FROM orders
""",
    "moving_avg": """
WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS vu
  FROM events GROUP BY 1, 2)
SELECT user_id, day,
       (CAST(sum(vu) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE))
         / 1000000.0 AS avg_value
FROM d
WINDOW w AS (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    "distinct_daily": """
SELECT date_trunc('day', ts) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
""",
    "pivot_events": """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
""",
}

QUERIES = {
    "rank_topn": q_rank_topn,
    "cumulative_spend": q_cumulative_spend,
    "moving_avg": q_moving_avg,
    "distinct_daily": q_distinct_daily,
    "pivot_events": q_pivot_events,
}
