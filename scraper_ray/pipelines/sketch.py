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
    """Fold string keys into one (HLL_M,) register vector. One md5 per
    key is inherent (the SQL oracle recomputes it), but the digest→
    (bucket, rank) math is batch numpy: bucket = first digest byte,
    x = bytes 1..4 big-endian, rank = 33 - bit_length(x) via frexp
    (exact for 32-bit ints in float64)."""
    regs = np.zeros(HLL_M, dtype=np.int64)
    if not keys:
        return regs
    digs = b"".join(hashlib.md5(str(k).encode()).digest() for k in keys)
    arr = np.frombuffer(digs, np.uint8).reshape(-1, 16)
    bucket = arr[:, 0].astype(np.int64)
    x = (arr[:, 1:5].astype(np.uint64)
         << np.array([24, 16, 8, 0], np.uint64)).sum(
             axis=1, dtype=np.uint64)
    _, e = np.frexp(x.astype(np.float64))
    rank = np.where(x == 0, 33, 33 - e).astype(np.int64)
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


def q_hll_daily(sf_dir: str) -> pa.Table:
    """Per-day distinct-user HLL estimate vs exact — the register-MERGE
    property in action: every batch contributes per-(day, bucket)
    partials and one groupby-max merges them, so sketches built on
    different partitions/shards/days combine without re-scanning (the
    artifact a multi-tenant pipeline persists per day and unions for
    any date range). Driver materialization is bounded by the day
    domain (<= 2^p rows per day), never by events."""
    from ray.data.aggregate import Count

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        days = pc.floor_temporal(t.column("ts"), unit="day").to_pandas()
        uids = t.column("user_id").to_pandas()
        out_day, out_b, out_r = [], [], []
        for day, g in pd.DataFrame({"day": days, "uid": uids}).groupby(
                "day", sort=False):
            regs = _hll_partial(g["uid"].tolist())
            nz = np.nonzero(regs)[0]      # only set registers: <= 2^p/day
            out_day.extend([day] * len(nz))
            out_b.extend(nz.tolist())
            out_r.extend(regs[nz].tolist())
        return pa.table({"day": pa.array(out_day, pa.timestamp("us")),
                         "bucket": pa.array(out_b, pa.int64()),
                         "rho": pa.array(out_r, pa.int64())})

    regs_rows = (ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .groupby(["day", "bucket"])
                 .aggregate(Max("rho", alias_name="rho")))
    per_day: dict = {}
    for r in drop_empty_blocks(regs_rows).take_all():
        per_day.setdefault(r["day"],
                           np.zeros(HLL_M, np.int64))[r["bucket"]] = r["rho"]

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "day": pc.floor_temporal(t.column("ts"), unit="day"),
            "user_id": t.column("user_id")})

    exact_rows = (ds.map_batches(pre, batch_format="pyarrow",
                                 zero_copy_batch=True)
                  .groupby(["day", "user_id"])
                  .aggregate(Count(alias_name="_n"))
                  .groupby("day").aggregate(Count(alias_name="n")))
    exact = {r["day"]: r["n"]
             for r in drop_empty_blocks(exact_rows).take_all()}

    days = sorted(per_day)
    return pa.table({
        "day": pa.array(days, pa.timestamp("us")),
        "est_distinct": pa.array(
            [hll_estimate_from_regs(per_day[d]) for d in days],
            pa.float64()),
        "exact_distinct": pa.array([int(exact[d]) for d in days],
                                   pa.int64())})


def q_hll_registers(sf_dir: str) -> rd.Dataset:
    """The HLL register table over events.user_id — the exact artifact
    a multi-corpus pipeline would persist and merge (register max) to
    count distinct across shards without re-scanning."""
    return hll_registers(_t(sf_dir, "events", ["user_id"]), "user_id")


# ---------------------------------------------------------------------------
# Count-Min sketch: heavy-hitter token counts without a full groupby
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOP_K = 10


def _cms_partial(tok_counts: dict) -> np.ndarray:
    """Fold {token: count} into one (CMS_DEPTH, CMS_WIDTH) int64 sketch."""
    regs = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for tok, n in tok_counts.items():
        for d in range(CMS_DEPTH):
            h = hashlib.md5(f"{d}:{tok}".encode()).hexdigest()
            regs[d, int(h[:8], 16) % CMS_WIDTH] += n
    return regs


def q_cms_heavy_hitters(sf_dir: str) -> pa.Table:
    """Count-Min-sketch readout (Cormode & Muthukrishnan 2005) for the
    corpus's exact top-k tokens: (token, true_n, est_n). ``est_n >=
    true_n`` always (the CMS one-sided error guarantee); equality up to
    hash-collision mass.

    Scale shape: each batch folds its token counts into a fixed
    (depth x width) integer sketch — merge is element-wise SUM, exact
    and associative, so the distributed combine is order-independent.
    The shuffle carries <= depth*width tiny rows per batch, never the
    token stream; the exact top-k (for the comparison column) is the
    usual partial-count groupby + bounded sort. The driver touches only
    the k winners and the 4096-cell sketch (explicitly bounded). The
    DuckDB oracle recomputes the identical sketch from the same md5
    bucket arithmetic and integer sums."""
    from ray.data.aggregate import Sum

    ds = _t(sf_dir, "documents", ["text"])

    def _batch_token_counts(t: pa.Table) -> dict[str, int]:
        # one split_pattern + one value_counts — the token histogram is
        # computed by Arrow C++ kernels; Python touches only the batch's
        # DISTINCT tokens (for the md5 folds)
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if not len(flat):
            return {}
        vc = pc.value_counts(flat)
        return dict(zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()))

    def partial(t: pa.Table) -> pa.Table:
        regs = _cms_partial(_batch_token_counts(t))
        d_idx, b_idx = np.nonzero(regs)
        return pa.table({"d": pa.array(d_idx, pa.int64()),
                         "b": pa.array(b_idx, pa.int64()),
                         "c": pa.array(regs[d_idx, b_idx], pa.int64())})

    cms_rows = (ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(["d", "b"]).aggregate(Sum("c", alias_name="c")))
    cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for r in drop_empty_blocks(cms_rows).take_all():   # <= 4096 rows
        cms[r["d"], r["b"]] = r["c"]

    def tok_partial(t: pa.Table) -> pa.Table:
        counts = _batch_token_counts(t)
        return pa.table({"token": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    top = (ds.map_batches(tok_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("token").aggregate(Sum("n", alias_name="n")))
    winners = (drop_empty_blocks(top)
               .sort(["n", "token"], descending=[True, False])
               .limit(CMS_TOP_K).take_all())

    ests = []
    for r in winners:
        cells = [cms[d, int(hashlib.md5(f"{d}:{r['token']}".encode())
                            .hexdigest()[:8], 16) % CMS_WIDTH]
                 for d in range(CMS_DEPTH)]
        ests.append(int(min(cells)))
    return pa.table({
        "token": pa.array([r["token"] for r in winners], pa.string()),
        "true_n": pa.array([r["n"] for r in winners], pa.int64()),
        "est_n": pa.array(ests, pa.int64())})


def _sql_hex_int(expr: str, start: int, ndigits: int) -> str:
    """DuckDB: hex digits [start, start+ndigits) of md5(expr) as BIGINT."""
    h = f"md5({expr})"
    return (f"list_sum(list_transform(range({start}, {start + ndigits}), "
            f"hx -> (instr('0123456789abcdef', substr({h}, hx, 1)) - 1)"
            f"::BIGINT * (1::BIGINT << (4 * ({start + ndigits - 1} - hx)))))")


def _cms_oracle_sql() -> str:
    bucket = _sql_hex_int("CAST(d AS VARCHAR) || ':' || tok", 1, 8)
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
tc AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
dh AS (
  SELECT r.d, tc.tok, tc.n, CAST({bucket} % {CMS_WIDTH} AS BIGINT) AS b
  FROM tc CROSS JOIN range(0, {CMS_DEPTH}) r(d)),
cms AS (SELECT d, b, sum(n) AS c FROM dh GROUP BY d, b),
topk AS (SELECT tok, n FROM tc ORDER BY n DESC, tok LIMIT {CMS_TOP_K}),
est AS (
  SELECT t.tok, t.n, min(cms.c) AS est
  FROM topk t
  JOIN dh ON dh.tok = t.tok
  JOIN cms ON cms.d = dh.d AND cms.b = dh.b
  GROUP BY t.tok, t.n)
SELECT tok AS token, CAST(n AS BIGINT) AS true_n,
       CAST(est AS BIGINT) AS est_n
FROM est
"""


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
    "cms_heavy_hitters": _cms_oracle_sql(),
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

ORACLE_SQL["hll_daily"] = f"""
WITH hashed AS (
  SELECT date_trunc('day', ts) AS day,
         {_sql_bucket('user_id')} AS bucket, {_sql_x32('user_id')} AS x
  FROM events),
ranked AS (
  SELECT day, bucket,
         CASE WHEN x = 0 THEN 33
              ELSE 33 - length(format('{{:b}}', CAST(x AS BIGINT))) END AS r
  FROM hashed),
days AS (SELECT DISTINCT day FROM hashed),
regs AS (
  SELECT d.day, b.bucket, coalesce(mx.rho, 0) AS rho
  FROM days d CROSS JOIN range(0, {HLL_M}) AS b(bucket)
  LEFT JOIN (SELECT day, bucket, max(r) AS rho FROM ranked
             GROUP BY day, bucket) mx
    ON mx.day = d.day AND mx.bucket = b.bucket),
raw AS (
  SELECT day,
         CAST({0.7213 / (1.0 + 1.079 / HLL_M)!r} AS DOUBLE)
           * CAST({float(HLL_M * HLL_M)!r} AS DOUBLE)
           / sum(power(2.0, -rho)) AS est,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS v
  FROM regs GROUP BY day),
est AS (
  SELECT day, CASE WHEN est <= CAST({2.5 * HLL_M!r} AS DOUBLE) AND v > 0
                   THEN CAST({float(HLL_M)!r} AS DOUBLE)
                          * ln(CAST({float(HLL_M)!r} AS DOUBLE) / v)
                   ELSE est END AS e
  FROM raw),
exact AS (SELECT date_trunc('day', ts) AS day,
                 count(DISTINCT user_id) AS n
          FROM events GROUP BY day)
SELECT est.day, round(e, 6) AS est_distinct,
       CAST(exact.n AS BIGINT) AS exact_distinct
FROM est JOIN exact USING (day)
"""

QUERIES = {
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "hll_registers": q_hll_registers,
    "hll_distinct": q_hll_distinct,
    "hll_daily": q_hll_daily,
}
