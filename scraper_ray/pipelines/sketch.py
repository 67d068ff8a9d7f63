"""Distributed cardinality sketch: HyperLogLog over a key column.

At crawl scale "how many distinct users / URLs / hosts?" cannot afford
an exact ``groupby`` — the distinct-key shuffle moves every key. A
HyperLogLog sketch answers it with ONE streaming map whose partials are
fixed-size register vectors (2^p int8s) combined by element-wise max —
associative, commutative, so the distributed merge is order-independent
and exact (Flajolet et al. 2007, the standard register-merge property).

Engine shape: each batch folds its rows into a (2^p)-register partial
(numpy ``maximum.at``), emitting <= 2^p tiny rows; one ``groupby.max``
over O(batches * 2^p) rows finishes. Nothing here scales with row
count except the embarrassingly-parallel first map.

Hash discipline: register index and rank derive from ``md5(str(key))``
— the same deterministic cross-engine hash family the repo's synthetic
fixtures use (common.sql_hex64) — so the DuckDB oracle recomputes the
IDENTICAL registers from the same rows: bucket = first 2 hex digits,
rank = 33 - bit_length(next 8 hex digits). ``bit_length`` is computed
via DuckDB ``length(format('{:b}', x))`` (integer-exact; no float log2
whose boundary rounding could diverge).

The estimate is reported alongside the exact distinct count. All its
float terms are exact powers of two (sum of 2^-rho over 256 registers
is exactly representable), so even the cross-engine double arithmetic
matches bit-for-bit; the linear-counting branch's ``ln`` is rounded to
6 digits on both sides (house convention for transcendental outputs).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max

from .common import drop_empty_blocks, read_sf_table as _t
from .common import round_half_away

HLL_P = 8                     # 2^8 = 256 registers
HLL_M = 1 << HLL_P


def _hll_partial(keys: list) -> np.ndarray:
    """Fold string keys into one (HLL_M,) register vector."""
    regs = np.zeros(HLL_M, dtype=np.int64)
    if not keys:
        return regs
    bucket = np.empty(len(keys), np.int64)
    rank = np.empty(len(keys), np.int64)
    for i, k in enumerate(keys):
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket[i] = int(h[:2], 16)
        x = int(h[2:10], 16)
        rank[i] = 33 - x.bit_length()   # x == 0 -> 33
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_registers(ds: rd.Dataset, col: str) -> rd.Dataset:
    """(bucket, rho) HLL register table of the distinct values of *col*
    — all 2^p buckets present, untouched buckets at rho 0."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _hll_partial(t.column(col).to_pylist())
        return pa.table({"bucket": pa.array(np.arange(HLL_M), pa.int64()),
                         "rho": pa.array(regs, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").aggregate(Max("rho", alias_name="rho")))

    def pin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"bucket": pc.cast(t.column("bucket"), pa.int64()),
                         "rho": pc.cast(t.column("rho"), pa.int64())})

    return drop_empty_blocks(agg).map_batches(pin, batch_format="pyarrow")


def hll_estimate_from_regs(rho: np.ndarray) -> float:
    """The standard HLL estimator with linear-counting small-range
    correction; every term before the optional ``ln`` is exact in
    float64 (powers of two), so the value is engine-independent."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = float(np.sum(np.power(2.0, -rho.astype(np.float64))))
    # alpha * (m*m): ONE multiplication against the exact m^2 literal,
    # the same association as the SQL oracle's `alpha_lit * 65536.0` —
    # (alpha*m)*m would round differently in the last ulp
    est = alpha * (m * m) / s
    v = int(np.sum(rho == 0))
    if est <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    return float(round_half_away(est, 6))


def q_hll_distinct(sf_dir: str) -> pa.Table:
    """Approximate vs exact distinct users over the events stream:
    one row (m, est_distinct, exact_distinct). The register table
    itself is the companion ``hll_registers`` query."""
    ds = _t(sf_dir, "events", ["user_id"])
    regs = hll_registers(ds, "user_id")
    rho = np.zeros(HLL_M, np.int64)
    for r in regs.take_all():
        rho[r["bucket"]] = r["rho"]
    est = hll_estimate_from_regs(rho)
    exact = (_t(sf_dir, "events", ["user_id"])
             .groupby("user_id").count().count())
    return pa.table({"m": pa.array([HLL_M], pa.int64()),
                     "est_distinct": pa.array([est], pa.float64()),
                     "exact_distinct": pa.array([exact], pa.int64())})


def q_hll_registers(sf_dir: str) -> rd.Dataset:
    """The HLL register table over events.user_id — the exact artifact
    a multi-corpus pipeline would persist and merge (register max) to
    count distinct across shards without re-scanning."""
    return hll_registers(_t(sf_dir, "events", ["user_id"]), "user_id")


def _sql_bucket(expr: str) -> str:
    h = f"md5(CAST({expr} AS VARCHAR))"
    return ("(instr('0123456789abcdef', substr(" + h + ", 1, 1)) - 1) * 16 + "
            "(instr('0123456789abcdef', substr(" + h + ", 2, 1)) - 1)")


def _sql_x32(expr: str) -> str:
    """next 8 hex digits of md5 as a BIGINT (32-bit value)."""
    h = f"md5(CAST({expr} AS VARCHAR))"
    return ("list_sum(list_transform(range(3, 11), hx -> "
            f"(instr('0123456789abcdef', substr({h}, hx, 1)) - 1)::BIGINT"
            " * (1::BIGINT << (4 * (10 - hx)))))")


def _registers_cte() -> str:
    return f"""
hashed AS (
  SELECT {_sql_bucket('user_id')} AS bucket, {_sql_x32('user_id')} AS x
  FROM events),
ranked AS (
  SELECT bucket,
         CASE WHEN x = 0 THEN 33
              ELSE 33 - length(format('{{:b}}', CAST(x AS BIGINT))) END AS r
  FROM hashed),
regs AS (
  SELECT b.bucket, coalesce(mx.rho, 0) AS rho
  FROM range(0, {HLL_M}) AS b(bucket)
  LEFT JOIN (SELECT bucket, max(r) AS rho FROM ranked GROUP BY bucket) mx
    USING (bucket))"""


ORACLE_SQL = {
    "hll_registers": f"""
WITH {_registers_cte()}
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(rho AS BIGINT) AS rho
FROM regs
""",
    "hll_distinct": f"""
WITH {_registers_cte()},
raw AS (
  SELECT CAST({0.7213 / (1.0 + 1.079 / HLL_M)!r} AS DOUBLE)
           * CAST({float(HLL_M * HLL_M)!r} AS DOUBLE)
           / sum(power(2.0, -rho)) AS est,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
  FROM regs),
est AS (
  SELECT CASE WHEN est <= CAST({2.5 * HLL_M!r} AS DOUBLE) AND v > 0
              THEN CAST({float(HLL_M)!r} AS DOUBLE)
                     * ln(CAST({float(HLL_M)!r} AS DOUBLE) / v)
              ELSE est END AS e
  FROM raw)
SELECT CAST({HLL_M} AS BIGINT) AS m,
       round(e, 6) AS est_distinct,
       (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
         AS exact_distinct
FROM est
""",
}

QUERIES = {
    "hll_registers": q_hll_registers,
    "hll_distinct": q_hll_distinct,
}
