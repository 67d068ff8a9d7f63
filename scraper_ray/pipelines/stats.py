"""Corpus statistics operators: quantiles, repetition, splits, top-k, DF.

Training-data curation shapes the reference never needed but a 100 TB
run does (SURVEY §2 extensions). Every operator follows the combiner
discipline: per-batch partials inside ``map_batches``, then one small
shuffle — nothing materializes raw rows on the driver.

- ``quantiles`` — exact discrete quantiles over a bounded-cardinality
  column via a distributed value histogram: the shuffle moves one
  (value, count) partial per batch, and the final cumulative scan runs
  over the tiny histogram in a single worker task. For unbounded
  continuous columns at 100 TB the same plan applies after a fixed-width
  binning pass (the histogram IS the sketch); exactness then holds per
  bin edge.
- ``repetition_stats`` — per-document duplicate-token ratio (the Gopher
  repetition rule family): pure map, no shuffle.
- ``stratified_split`` — deterministic train/valid/test assignment from
  the first 64 bits of ``md5(doc_id)``; reproducible across runs and
  cluster sizes because it depends on nothing but the key.
- ``group_topk`` — top-k rows per group: per-batch partial top-k (only
  k rows per group per batch survive the map) then a per-group final
  top-k — the shuffle moves O(groups * k * batches) rows, not the table.
- ``token_df`` — document frequency + IDF per token: per-batch distinct
  (doc, token) incidence collapses inside the map (each doc lives in
  exactly one batch, so batch-local df partials sum exactly).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .common import (int_scaled, read_sf_table as _t, round_half_away,
                     sql_hex64)

QUANTILE_LEVELS = (0.25, 0.5, 0.75, 0.9, 0.99)
SPLIT_EDGES = (80, 90)  # <80 train, <90 valid, else test
TOPK_K = 3


# ---------------------------------------------------------------------------
# quantiles
# ---------------------------------------------------------------------------

def q_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact ``quantile_disc`` of lineitem quantity at the standard
    levels. DuckDB's discrete quantile picks the value at 1-based rank
    ``ceil(q * n)`` of the sorted column (probed empirically); the
    cumulative-histogram scan below reproduces exactly that."""
    ds = _t(sf_dir, "lineitem", ["l_quantity"])

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = t.column("l_quantity").value_counts()
        return pa.table({"value": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    hist = (
        ds.map_batches(partial_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("value").sum("n")
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value").reset_index(drop=True)
        cum = g["sum(n)"].cumsum()
        n = int(cum.iloc[-1])
        out_q, out_v = [], []
        for q in QUANTILE_LEVELS:
            rank = max(1, math.ceil(q * n))
            idx = int((cum >= rank).idxmax())
            out_q.append(q)
            out_v.append(float(g["value"].iloc[idx]))
        return pd.DataFrame({"q": out_q, "value": out_v})

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array([0] * t.num_rows, pa.int8()))

    # the histogram is tiny (<= distinct values); one group = one task
    return (hist.map_batches(tag, batch_format="pyarrow")
            .groupby("g").map_groups(finish, batch_format="pandas"))


# ---------------------------------------------------------------------------
# price_histogram
# ---------------------------------------------------------------------------

HIST_WIDTH_CENTS = 3_000_000  # 30k-currency-unit bins


def q_price_histogram(sf_dir: str) -> rd.Dataset:
    """Fixed-width histogram of order totals — the scale-safe shape for
    distribution stats over an unbounded column: bin in integer cents
    (exact, no float edge ambiguity), count per batch, one tiny
    (bucket, n) shuffle. The same plan at 100 TB moves a few hundred
    partial rows per block regardless of input size."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = int_scaled(t.column("o_totalprice"), 100)
        buckets = pc.divide(cents, pa.scalar(HIST_WIDTH_CENTS, pa.int64()))
        vc = buckets.value_counts()
        return pa.table({"bucket": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").sum("n"))

    def finish(t: pa.Table) -> pa.Table:
        b = t.column("bucket")
        lo = pc.multiply(pc.cast(b, pa.float64()),
                         HIST_WIDTH_CENTS / 100.0)
        return pa.table({"bucket": b, "lo": lo,
                         "n": pc.cast(t.column("sum(n)"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------

def q_repetition_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc token repetition: distinct/total tokens and the duplicate
    fraction (1 - distinct/total), the cheapest of the Gopher-style
    repetition signals. Pure map — no shuffle at any scale."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_tok, n_dis = [], []
        for txt in t.column("text").to_pylist():
            toks = txt.split(" ")
            n_tok.append(len(toks))
            n_dis.append(len(set(toks)))
        n_tok_a = np.asarray(n_tok, dtype=np.float64)
        ratio = round_half_away(1.0 - np.asarray(n_dis) / n_tok_a, 6)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
            "dup_ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# stratified_split
# ---------------------------------------------------------------------------

def _split_name(bucket: int) -> str:
    if bucket < SPLIT_EDGES[0]:
        return "train"
    if bucket < SPLIT_EDGES[1]:
        return "valid"
    return "test"


def q_stratified_split(sf_dir: str) -> rd.Dataset:
    """Deterministic 80/10/10 split: bucket = first 64 bits of
    md5(doc_id) mod 100. Key-only hashing means any worker, any batch
    boundary, any cluster size produces the identical assignment."""
    ds = _t(sf_dir, "documents", ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        buckets = [
            int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "big")
            % 100
            for d in t.column("doc_id").to_pylist()
        ]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array([_split_name(b) for b in buckets], pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# group_topk
# ---------------------------------------------------------------------------

def q_group_topk(sf_dir: str) -> rd.Dataset:
    """Top-3 orders by price per order priority, orderkey tie-break.

    Partial top-k inside the map bounds the shuffle to k rows per
    (group, batch); the per-group final pass re-ranks the survivors.
    """
    ds = _t(sf_dir, "orders",
            ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True])
                .groupby("o_orderpriority", as_index=False, sort=False)
                .head(TOPK_K))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True])
                .head(TOPK_K)[["o_orderpriority", "o_orderkey",
                               "o_totalprice"]])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("o_orderpriority")
            .map_groups(final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# token_df
# ---------------------------------------------------------------------------

def q_token_df(sf_dir: str) -> rd.Dataset:
    """Per-token document frequency and IDF over the corpus.

    Each document lands in exactly one batch, so batch-local df counts
    are disjoint partials and one ``groupby(token).sum`` finishes them —
    the shuffle carries (token, df) pairs, never the token stream. IDF
    needs the corpus size: a parquet-metadata count, not a data pass."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _t(sf_dir, "documents", ["doc_id"]).count()

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            for tok in set(txt.split(" ")):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"token": pa.array(list(counts), pa.string()),
                         "df": pa.array(list(counts.values()), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("token").sum("df"))

    def finish(t: pa.Table) -> pa.Table:
        df = t.column("sum(df)").to_numpy().astype(np.int64)
        idf = round_half_away(np.log(n_docs / df.astype(np.float64)), 6)
        return pa.table({"token": t.column("token"),
                         "df": pa.array(df, pa.int64()),
                         "idf": pa.array(idf, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def _quantiles_sql() -> str:
    branches = " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(l_quantity, {q}) AS value "
        "FROM lineitem"
        for q in QUANTILE_LEVELS)
    return branches


def _split_sql() -> str:
    bucket = sql_hex64("CAST(doc_id AS VARCHAR)") + " % 100"
    return f"""
SELECT doc_id, CAST(b AS BIGINT) AS bucket,
       CASE WHEN b < {SPLIT_EDGES[0]} THEN 'train'
            WHEN b < {SPLIT_EDGES[1]} THEN 'valid'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {bucket} AS b FROM documents)
"""


ORACLE_SQL = {
    "quantiles": _quantiles_sql(),
    "price_histogram": f"""
SELECT b AS bucket, b * {HIST_WIDTH_CENTS / 100.0} AS lo,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
             // {HIST_WIDTH_CENTS} AS b
      FROM orders)
GROUP BY b
""",
    "repetition_stats": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         AS n_distinct,
       round(1.0 - len(list_distinct(string_split(text, ' ')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
         AS dup_ratio
FROM documents
""",
    "stratified_split": _split_sql(),
    "group_topk": f"""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rn
      FROM orders)
WHERE rn <= {TOPK_K}
""",
    "token_df": """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       round(ln((SELECT count(*) FROM documents) / CAST(count(*) AS DOUBLE)),
             6) AS idf
FROM tok GROUP BY token
""",
}

QUERIES = {
    "quantiles": q_quantiles,
    "price_histogram": q_price_histogram,
    "repetition_stats": q_repetition_stats,
    "stratified_split": q_stratified_split,
    "group_topk": q_group_topk,
    "token_df": q_token_df,
}
