"""Composed training-corpus pipeline over crawled documents.

The end-to-end shape a 100 TB training-data run takes, as ONE streaming
Ray Data pipeline: crawl docs (interleaved spans) -> per-doc text rollup
(text spans joined in offset order) -> quality gate (min token count) ->
exact dedup (md5 hash-partition, min doc_id wins). Every stage reuses
the engine's primitives; the DuckDB oracle re-runs the identical tail in
SQL over the *sequential oracle crawler's* fixture parquets, so the
whole composition — crawl included — is hash-checked end to end.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

MIN_TOKENS = 4


def rollup_texts(docs: rd.Dataset) -> rd.Dataset:
    """Doc rows (spans col) -> (doc_id, text, n_tokens): text spans
    joined with single spaces in offset order (spans arrive in offset
    order from the parse stage — asserted, not re-sorted)."""

    def f(t: pa.Table) -> pa.Table:
        ids, texts, ntok = [], [], []
        for did, spans in zip(t.column("doc_id").to_pylist(),
                              t.column("spans").to_pylist()):
            parts = [s["text"] for s in spans if s["kind"] == "text"]
            txt = " ".join(parts)
            ids.append(did)
            texts.append(txt)
            ntok.append(len(txt.split(" ")) if txt else 0)
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "text": pa.array(texts, pa.string()),
                         "n_tokens": pa.array(ntok, pa.int64())})

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quality_gate(rolled: rd.Dataset, min_tokens: int = MIN_TOKENS) -> rd.Dataset:
    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_tokens"), min_tokens))

    return rolled.map_batches(f, batch_format="pyarrow")


def dedup_exact_text(gated: rd.Dataset) -> rd.Dataset:
    """Hash-partition on md5(text), keep min doc_id per hash — the 100 TB
    exact-dedup plan (one shuffle, no driver set)."""

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in t.column("text").to_pylist()]
        return t.append_column("text_hash", pa.array(hs, pa.string()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return pd.DataFrame({
            "doc_id": [g["doc_id"].iloc[0]],
            "text": [g["text"].iloc[0]],
            "n_tokens": [int(g["n_tokens"].iloc[0])],
            "n_dups": [len(g)],
        })

    return (
        gated.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


def q_corpus_build(sf_dir: str) -> rd.Dataset:
    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir)
    return dedup_exact_text(quality_gate(rollup_texts(docs)))


def _corpus_oracle_sql() -> str:
    from .crawl_queries import ORACLE_SPANS_PATH

    return f"""
WITH spans AS (SELECT * FROM read_parquet('{ORACLE_SPANS_PATH}')),
rolled AS (
  SELECT doc_id,
         array_to_string(coalesce(list(text ORDER BY "offset")
                                  FILTER (kind = 'text'), []), ' ') AS text
  FROM spans GROUP BY doc_id),
gated AS (
  SELECT doc_id, text,
         CASE WHEN text = '' THEN 0
              ELSE len(string_split(text, ' ')) END AS n_tokens
  FROM rolled)
SELECT doc_id, text, n_tokens,
       CAST(cnt AS BIGINT) AS n_dups
FROM (SELECT *,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY md5(text)) AS cnt
      FROM gated WHERE n_tokens >= {MIN_TOKENS})
WHERE rn = 1
"""


ORACLE_SQL = {"corpus_build": _corpus_oracle_sql()}

QUERIES = {"corpus_build": q_corpus_build}
