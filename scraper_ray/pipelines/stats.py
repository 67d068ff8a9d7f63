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

from .common import (int_scaled, join_parts, read_sf_table as _t,
                     round_half_away, sql_hex64)

QUANTILE_LEVELS = (0.25, 0.5, 0.75, 0.9, 0.99)
SPLIT_EDGES = (80, 90)  # <80 train, <90 valid, else test
TOPK_K = 3
VOCAB_K = 20
OOV_K = 15   # vocab size for the OOV-ratio gate (binds at gate tiers)
BM25_QUERY = ("merge", "spark", "window")   # fixed search terms
BM25_K1, BM25_B = 1.2, 0.75
SAMPLE_PER_LANG = 10
# global_shuffle topology: shard count GROWS with the corpus so one
# shard (the rank-within-shard group) always fits a worker — a fixed
# count would mean 12.5 TB/group at 100 TB. Floor of 8 binds at the
# gate tiers; the oracle SQL derives the identical count from count(*).
SHUFFLE_SHARDS = 8
SHUFFLE_TARGET_ROWS = 4_000_000


def _shuffle_shards_for(n_rows: int) -> int:
    import math

    return max(SHUFFLE_SHARDS, math.ceil(n_rows / SHUFFLE_TARGET_ROWS))
LENGTH_BAND = (0.05, 0.95)
# data-mixing weights: docs kept per source (md5 order), default for
# sources not listed — sized so the quota binds at the gate tiers
# (25 docs/source): src0 kept whole, src1 downsampled, the rest heavily
SOURCE_QUOTAS = {"src0": 25, "src1": 15}
SOURCE_QUOTA_DEFAULT = 5


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


def q_group_quantiles(sf_dir: str) -> rd.Dataset:
    """Per-group exact discrete quantiles: median/p90/... of lineitem
    quantity WITHIN each returnflag — the grouped percentile view a
    curation dashboard reads (e.g. token-length quantiles per source).
    Same two-phase value-histogram plan as q_quantiles but keyed:
    per-batch Arrow (group, value) counts, one groupby-sum shuffle of
    O(groups x distinct values) partial rows, then the cumulative rank
    pick per group. The shuffle and the finish are bounded by the VALUE
    DOMAIN (quantity has <100 distinct values) times the group count —
    never by row count — so the plan is unchanged at 100 TB."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial_counts(t: pa.Table) -> pa.Table:
        g = (pa.table({"flag": t.column("l_returnflag"),
                       "value": t.column("l_quantity")})
             .group_by(["flag", "value"]).aggregate([("value", "count")]))
        return pa.table({"l_returnflag": g.column("flag"),
                         "value": g.column("value"),
                         "n": pc.cast(g.column("value_count"), pa.int64())})

    hist = (ds.map_batches(partial_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["l_returnflag", "value"]).sum("n"))

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
        return pd.DataFrame({"l_returnflag": g["l_returnflag"].iloc[0],
                             "q": out_q, "value": out_v})

    # one dispatch per returnflag (3 groups) over a value-domain-bounded
    # histogram — per-group pandas is fine at this cardinality
    return hist.groupby("l_returnflag").map_groups(
        finish, batch_format="pandas")


def _group_quantiles_sql() -> str:
    branches = " UNION ALL ".join(
        f"SELECT l_returnflag, {q} AS q, "
        f"quantile_disc(l_quantity, {q}) AS value "
        "FROM lineitem GROUP BY l_returnflag"
        for q in QUANTILE_LEVELS)
    return branches


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
        # vectorized df partial: flatten once, hash-distinct (token,
        # row), one value_counts — no Python token loop
        from .common import flat_tokens

        flat, _, doc = flat_tokens(t)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        dfp = pd.DataFrame({"token": flat.to_pandas().to_numpy(),
                            "doc": doc}).drop_duplicates()
        vc = dfp["token"].value_counts(sort=False)
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "df": pa.array(vc.to_numpy(), pa.int64())})

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
# inverted_index (token -> sorted posting list)
# ---------------------------------------------------------------------------

# singleton tokens carry no retrieval signal and are excluded; posting
# rows are bounded by emitting only the FIRST posting block (the K
# lowest doc_ids — real indexes store long lists as chains of such
# compressed blocks) while df reports the full count
POSTINGS_DF_MIN = 2
POSTINGS_BLOCK = 32


def q_inverted_index(sf_dir: str) -> rd.Dataset:
    """Posting-list build: (token, df, postings) with df the full
    document frequency and postings the token's first posting block —
    the ``POSTINGS_BLOCK`` lowest doc_ids, comma-joined ascending. The
    core artifact of a search/retrieval index over a curated corpus.

    Scale shape: per-batch distinct (doc_id, token) pairs (docs land
    whole in a batch, so batch-local distinct is globally distinct),
    ONE keyed repartition on token to co-locate each token's rows, then
    a single vectorized per-batch segmented pass (pandas groupby-agg +
    cumcount inside the batch — never one Python dispatch per token via
    map_groups). The block cap bounds every output row; the shuffle
    carries (token, doc_id) pairs once."""
    from .common import keyed_repartition

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        # vectorized distinct (token, doc) pairs: flatten once,
        # doc_id via the repeat-built row index, one hash-distinct
        from .common import flat_tokens

        flat, _, doc = flat_tokens(t)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        dfp = pd.DataFrame({"token": flat.to_pandas().to_numpy(),
                            "doc_id": ids[doc]}).drop_duplicates()
        return pa.table({
            "token": pa.array(dfp["token"], pa.string()),
            "doc_id": pa.array(dfp["doc_id"].to_numpy(), pa.int64())})

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow",
                             zero_copy_batch=True)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"token": pd.Series([], dtype="string"),
                                 "df": pd.Series([], dtype="int64"),
                                 "postings": pd.Series([], dtype="string")})
        df = df.sort_values(["token", "doc_id"])
        full = df.groupby("token", sort=False)["doc_id"].size()
        head = df[df.groupby("token", sort=False).cumcount()
                  < POSTINGS_BLOCK]
        out = pd.DataFrame({
            "df": full,
            "postings": head.groupby("token", sort=False)["doc_id"]
            .agg(lambda s: ",".join(map(str, s))),
        }).reset_index()
        out = out[out["df"] >= POSTINGS_DF_MIN]
        out["df"] = out["df"].astype("int64")
        return out[["token", "df", "postings"]]

    return keyed_repartition(pair_ds, ["token"]).map_batches(
        postings, batch_format="pandas")


# ---------------------------------------------------------------------------
# token_entropy (per-source vocabulary diversity)
# ---------------------------------------------------------------------------

def q_token_entropy(sf_dir: str) -> rd.Dataset:
    """Per-source Shannon entropy of the token distribution — the
    vocabulary-diversity signal curation dashboards use to spot
    template-generated or looping sources (low entropy at high volume).

    Scale shape: per-batch (source, token) count partials (disjoint —
    docs land whole in a batch), one groupby-sum to corpus counts, then
    ONE keyed repartition on source and a vectorized per-batch
    segmented entropy (numpy log over each source's contiguous rows) —
    the shuffle carries (source, token, n) rows, never the token
    stream. Entropy is rounded to 6 digits (house convention for
    transcendental aggregates; sum-order ulp noise sits far below)."""
    from .common import keyed_repartition

    ds = _t(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        # vectorized: one split_pattern, token->source via a repeat-built
        # doc index, one hash groupby-size — no Python loop over tokens
        ls = pc.split_pattern(t.column("text"), " ")
        lens = pc.list_value_length(ls).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(ls)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if not len(flat):
            return pa.table({"source": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        src = t.column("source").to_pandas().to_numpy()
        doc = np.repeat(np.arange(len(lens)), lens)
        df = pd.DataFrame({"source": src[doc],
                           "token": flat.to_pandas().to_numpy()})
        out = (df.groupby(["source", "token"], sort=False)
               .size().reset_index(name="n"))
        return pa.table({
            "source": pa.array(out["source"], pa.string()),
            "token": pa.array(out["token"], pa.string()),
            "n": pa.array(out["n"].to_numpy(), pa.int64())})

    summed = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["source", "token"]).sum("n"))

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"source": pd.Series([], dtype="string"),
                                 "n_tokens": pd.Series([], dtype="int64"),
                                 "n_distinct": pd.Series([], dtype="int64"),
                                 "entropy": pd.Series([], dtype="float64")})
        g = df.groupby("source", sort=False)["sum(n)"]
        tot = g.transform("sum").to_numpy(dtype=np.float64)
        p = df["sum(n)"].to_numpy(dtype=np.float64) / tot
        df = df.assign(term=-p * np.log(p))
        agg = df.groupby("source", sort=False).agg(
            n_tokens=("sum(n)", "sum"), n_distinct=("sum(n)", "size"),
            entropy=("term", "sum")).reset_index()
        agg["entropy"] = round_half_away(agg["entropy"].to_numpy(), 6)
        agg["n_tokens"] = agg["n_tokens"].astype("int64")
        agg["n_distinct"] = agg["n_distinct"].astype("int64")
        return agg

    return keyed_repartition(summed, ["source"]).map_batches(
        entropy, batch_format="pandas")


# ---------------------------------------------------------------------------
# cross_source_leakage (shared n-grams across source pairs)
# ---------------------------------------------------------------------------

LEAK_NGRAM = 4
# grams present in more than this many sources are boilerplate, not
# leakage — they would also blow the per-gram pair expansion up
# quadratically; excluded identically in the SQL oracle's HAVING
LEAK_MAX_SOURCES = 16


def q_cross_source_leakage(sf_dir: str) -> rd.Dataset:
    """Contamination audit: for every source pair, how many distinct
    4-grams they share — the cross-corpus leakage signal checked before
    treating two sources as independent (train/eval splits, mixture
    weighting).

    Scale shape: per-batch locally-distinct (gram, source) pairs, ONE
    keyed repartition on gram (which both globally co-locates and lets
    one in-batch drop_duplicates finish the distinct — no separate
    groupby exchange), a vectorized per-batch segmented pass expanding
    each gram's <= ``LEAK_MAX_SOURCES`` sources into ordered pairs
    (bounded fan-out), and a final (src_a, src_b) groupby-count —
    O(sources^2) output."""
    from .common import keyed_repartition

    ds = _t(sf_dir, "documents", ["source", "text"])

    def grams(t: pa.Table) -> pa.Table:
        # vectorized n-gram construction (the q_bpe_pairs pattern): one
        # split_pattern per batch, grams built by joining the flattened
        # token array against itself shifted 1..3 (Arrow C++ kernels),
        # doc-boundary grams masked via a repeat-built doc index, local
        # distinct via one hash-based drop_duplicates — no Python loop
        # over rows or grams
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "source": pa.array([], pa.string())})
        ls = pc.split_pattern(t.column("text"), " ")
        lens = pc.list_value_length(ls).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(ls)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        if n < LEAK_NGRAM:
            return empty
        m = n - LEAK_NGRAM + 1
        g = pc.binary_join_element_wise(
            *(flat.slice(i, m) for i in range(LEAK_NGRAM)), " ")
        doc = np.repeat(np.arange(len(lens)), lens)
        # a gram starting at flat index i is valid iff token i+3 is
        # still in the same doc
        mask = doc[:m] == doc[LEAK_NGRAM - 1:]
        src = t.column("source").to_pandas().to_numpy()
        df = pd.DataFrame({"gram": g.to_pandas().to_numpy()[mask],
                           "source": src[doc[:m][mask]]})
        df = df.drop_duplicates()
        return pa.table({"gram": pa.array(df["gram"], pa.string()),
                         "source": pa.array(df["source"], pa.string())})

    # per-batch locally-distinct rows go straight into the keyed
    # repartition — it co-locates every copy of a gram in one block, so
    # the global (gram, source) distinct happens inside the pairs batch
    # (one drop_duplicates) instead of a separate groupby all-to-all
    distinct = ds.map_batches(grams, batch_format="pyarrow",
                              zero_copy_batch=True)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # segmented pair expansion, vectorized over GRAMS (never one
        # Python dispatch per gram): grams sharing a source count k
        # expand together through one (n_segments, k*(k-1)/2) broadcast
        if not len(df):
            return pd.DataFrame({"src_a": pd.Series([], dtype="string"),
                                 "src_b": pd.Series([], dtype="string")})
        df = df.drop_duplicates().sort_values(["gram", "source"])
        src = df["source"].to_numpy()
        codes = pd.factorize(df["gram"], sort=False)[0]
        change = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(codes)])))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for k in np.unique(sizes):
            if not 2 <= k <= LEAK_MAX_SOURCES:
                continue
            iu, ju = np.triu_indices(k, 1)
            seg = starts[sizes == k]
            out_a.append(src[(seg[:, None] + iu[None, :]).ravel()])
            out_b.append(src[(seg[:, None] + ju[None, :]).ravel()])
        if not out_a:
            return pd.DataFrame({"src_a": pd.Series([], dtype="string"),
                                 "src_b": pd.Series([], dtype="string")})
        return pd.DataFrame({"src_a": np.concatenate(out_a),
                             "src_b": np.concatenate(out_b)})

    from ray.data.aggregate import Count

    agg = (keyed_repartition(distinct, ["gram"])
           .map_batches(pairs, batch_format="pandas")
           .groupby(["src_a", "src_b"])
           .aggregate(Count(alias_name="n_shared")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({"src_a": t.column("src_a"),
                         "src_b": t.column("src_b"),
                         "n_shared": pc.cast(t.column("n_shared"),
                                             pa.int64())})

    from .common import drop_empty_blocks
    return drop_empty_blocks(agg).map_batches(pin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# top_terms (per-doc tf-idf keyword extraction)
# ---------------------------------------------------------------------------

TOP_TERMS_K = 5
# vocab sizes under this broadcast the (token -> idf) map via ray.put;
# past it the fallback is a distributed (doc, token, tf) x df join plus
# a doc-keyed repartition so each block holds whole docs for the top-k
_TOP_TERMS_BROADCAST_CAP = 4_000_000


def q_top_terms(sf_dir: str, k: int = TOP_TERMS_K,
                broadcast_cap: int = _TOP_TERMS_BROADCAST_CAP) -> rd.Dataset:
    """Per-document top-*k* tf-idf keywords — the keyword-extraction /
    doc-tagging stage of a curation pipeline (and the raw material for
    cluster labeling). idf uses exactly ``q_token_df``'s convention
    (round(ln(N/df), 6)) so the two views agree term for term.

    Scale shape: the corpus-wide df pass is the token_df partial
    (batch-disjoint dicts, one (token, df) shuffle). Under the cap the
    idf map rides ``ray.put`` and scoring + top-k is ONE streaming map
    over docs (tf, score and rank are row-local). Past the cap: flat-map
    (doc, token, tf) rows, hash-join them with the df table, repartition
    by doc_id (whole docs per block) and take the per-batch vectorized
    top-k — no per-group Python dispatch on either path. Ties break by
    token ascending; both paths and the SQL oracle share the order."""
    import ray

    from .common import drop_empty_blocks

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _t(sf_dir, "documents", ["doc_id"]).count()

    def df_partial(t: pa.Table) -> pa.Table:
        # vectorized df partial (the q_token_df kernel): flatten once,
        # hash-distinct (token, row), one value_counts
        from .common import flat_tokens

        flat, _, doc = flat_tokens(t)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        dfp = pd.DataFrame({"token": flat.to_pandas().to_numpy(),
                            "doc": doc}).drop_duplicates()
        vc = dfp["token"].value_counts(sort=False)
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "df": pa.array(vc.to_numpy(), pa.int64())})

    df_tbl = (ds.map_batches(df_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("token").sum("df")).materialize()

    def _topk_rows(did, toks, idf_of):
        tf: dict[str, int] = {}
        for tok in toks:
            tf[tok] = tf.get(tok, 0) + 1
        scored = sorted(
            ((-round_half_away(n * idf_of(tok), 6), tok, n)
             for tok, n in tf.items()))
        return [(did, tok, -neg, r + 1)
                for r, (neg, tok, _) in enumerate(scored[:k])]

    if df_tbl.count() <= broadcast_cap:
        idf_map = {r["token"]: round_half_away(
            math.log(n_docs / r["sum(df)"]), 6)
            for r in df_tbl.take_all()}
        idf_ref = ray.put(idf_map)

        def score_bcast(t: pa.Table) -> pa.Table:
            idf = ray.get(idf_ref)
            rows = []
            for did, txt in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
                rows.extend(_topk_rows(did, txt.split(" "), idf.__getitem__))
            return pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "token": pa.array([r[1] for r in rows], pa.string()),
                "score": pa.array([r[2] for r in rows], pa.float64()),
                "rank": pa.array([r[3] for r in rows], pa.int64())})

        return ds.map_batches(score_bcast, batch_format="pyarrow",
                              zero_copy_batch=True)

    # distributed fallback: explode tf rows, join idf, co-locate by doc
    def tf_rows(t: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            tf: dict[str, int] = {}
            for tok in txt.split(" "):
                tf[tok] = tf.get(tok, 0) + 1
            ids.extend([did] * len(tf))
            toks.extend(tf.keys())
            tfs.extend(tf.values())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    tfr = drop_empty_blocks(ds.map_batches(
        tf_rows, batch_format="pyarrow", zero_copy_batch=True))
    joined = drop_empty_blocks(tfr.join(
        df_tbl, join_type="inner", num_partitions=join_parts(2), on=("token",)))
    from .common import keyed_repartition

    by_doc = keyed_repartition(joined, ["doc_id"])

    def topk_batch(t: pa.Table) -> pa.Table:
        idf = round_half_away(
            np.log(n_docs / t.column("sum(df)").to_numpy()
                   .astype(np.float64)), 6)
        score = round_half_away(
            t.column("tf").to_numpy().astype(np.float64) * idf, 6)
        pdf = pd.DataFrame({
            "doc_id": t.column("doc_id").to_numpy(),
            "token": t.column("token").to_pylist(),
            "score": score})
        pdf = pdf.sort_values(["doc_id", "score", "token"],
                              ascending=[True, False, True],
                              kind="mergesort")
        pdf["rank"] = pdf.groupby("doc_id").cumcount() + 1
        pdf = pdf[pdf["rank"] <= k]
        return pa.table({
            "doc_id": pa.array(pdf["doc_id"].to_numpy(), pa.int64()),
            "token": pa.array(pdf["token"].tolist(), pa.string()),
            "score": pa.array(pdf["score"].to_numpy(), pa.float64()),
            "rank": pa.array(pdf["rank"].to_numpy(), pa.int64())})

    return drop_empty_blocks(by_doc).map_batches(
        topk_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# vocab_topk
# ---------------------------------------------------------------------------

def _token_counts_agg(sf_dir: str) -> rd.Dataset:
    """Global (token, sum(n)) term frequencies: per-batch value_counts
    partials (the only pass over text) + one groupby-sum whose shuffle
    carries one row per distinct token per batch. The shared front half
    of the vocabulary queries — materialize it when two consumers read
    it (q_vocab_coverage's top-k + denominator)."""
    ds = _t(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        # one split + one value_counts (Arrow C++), no Python token loop
        from .common import flat_tokens

        flat, _, _ = flat_tokens(t)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("token").sum("n"))


def _vocab_topk_ds(sf_dir: str, k: int,
                   agg: rd.Dataset | None = None) -> rd.Dataset:
    """Top-*k* vocabulary by total term frequency. Three bounded stages:
    the ``_token_counts_agg`` (token, n) groupby-sum (or a caller-shared
    *agg*), and a partial top-k per block so the final single-group rank
    sees at most k * n_blocks rows — never the vocabulary. Ties at the
    boundary break by token ascending, so the result is deterministic."""
    if agg is None:
        agg = _token_counts_agg(sf_dir)

    def partial_top(t: pa.Table) -> pa.Table:
        out = pa.table({"token": t.column("token"),
                        "n": pc.cast(t.column("sum(n)"), pa.int64())})
        order = pc.sort_indices(out, sort_keys=[("n", "descending"),
                                                ("token", "ascending")])
        t2 = out.take(order[: min(k, out.num_rows)])
        return t2.append_column("g", pa.array([0] * t2.num_rows, pa.int8()))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["n", "token"], ascending=[False, True])
                .head(k)[["token", "n"]])

    return (agg.map_batches(partial_top, batch_format="pyarrow")
            .groupby("g").map_groups(final, batch_format="pandas"))


def q_vocab_topk(sf_dir: str) -> rd.Dataset:
    """Global top-K vocabulary (the tokenizer-vocabulary / wordcount
    shape); see ``_vocab_topk_ds`` for the bounded three-stage plan."""
    return _vocab_topk_ds(sf_dir, VOCAB_K)


# ---------------------------------------------------------------------------
# oov_ratio
# ---------------------------------------------------------------------------

def q_oov_ratio(sf_dir: str) -> rd.Dataset:
    """Per-document out-of-vocabulary ratio against the global top-K
    vocabulary — the coverage signal tokenizer and quality pipelines cut
    on (docs whose tokens a fixed vocab mostly can't represent are noise
    or the wrong language). Two stages: the bounded vocab top-k (at most
    OOV_K rows reach the driver — the only materialization), then one
    streaming map over documents with the vocab set broadcast in the
    closure (tiny: OOV_K strings; at a real 100 TB vocab this becomes a
    ``ray.put`` handle like the dims broadcast)."""
    vocab = frozenset(
        r["token"] for r in _vocab_topk_ds(sf_dir, OOV_K).take_all())
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    vocab_arr = pa.array(sorted(vocab), pa.string())

    def f(t: pa.Table) -> pa.Table:
        # vectorized OOV: one is_in membership kernel over the flat
        # token stream, per-doc misses via one bincount on the row index
        from .common import flat_tokens

        flat, lens, doc = flat_tokens(t)
        inset = pc.is_in(flat, value_set=vocab_arr).to_numpy(
            zero_copy_only=False)
        n_oov = np.bincount(doc[~inset], minlength=t.num_rows)
        ratio = round_half_away(n_oov / lens.astype(np.float64), 6)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(lens.astype(np.int64)),
            "n_oov": pa.array(n_oov.astype(np.int64)),
            "oov_ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# bm25_search
# ---------------------------------------------------------------------------

def q_bm25_search(sf_dir: str) -> rd.Dataset:
    """BM25 relevance of every document to a fixed query (the retrieval /
    quality-ranking stage over a crawled corpus).

    Corpus stats come from two bounded exchanges: (n_docs, total_tokens)
    partials for avgdl, and per-query-token df partials — both shuffle a
    handful of rows per batch regardless of corpus size (the df pass only
    tracks the |query| tokens, never the vocabulary). The stats broadcast
    into the scoring map, which is one streaming pass emitting docs with
    score > 0. Term order in the score sum is fixed (BM25_QUERY order) so
    float results are bit-stable and the SQL oracle can mirror them."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def meta_partial(t: pa.Table) -> pa.Table:
        rows = {q: 0 for q in BM25_QUERY}
        total_toks = 0
        for txt in t.column("text").to_pylist():
            toks = txt.split(" ")
            total_toks += len(toks)
            tokset = set(toks)
            for q in BM25_QUERY:
                if q in tokset:
                    rows[q] += 1
        return pa.table({
            "token": pa.array(list(rows) + ["__len__", "__docs__"]),
            "n": pa.array(list(rows.values()) + [total_toks, t.num_rows],
                          pa.int64())})

    # tiny by construction: |query| + 2 rows per batch -> one small agg
    meta = {r["token"]: r["sum(n)"]
            for r in ds.map_batches(meta_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
            .groupby("token").sum("n").take_all()}
    n_docs = meta["__docs__"]
    avgdl = meta["__len__"] / n_docs
    idf = {q: math.log(1.0 + (n_docs - meta[q] + 0.5) / (meta[q] + 0.5))
           for q in BM25_QUERY}

    def score(t: pa.Table) -> pa.Table:
        ids, scores = [], []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            toks = txt.split(" ")
            dl = len(toks)
            s = 0.0
            for q in BM25_QUERY:           # fixed term order: bit-stable
                tf = toks.count(q)
                if tf:
                    s += idf[q] * (tf * (BM25_K1 + 1.0)) / (
                        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
            if s > 0.0:
                ids.append(did)
                scores.append(s)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "score": pa.array(round_half_away(scores, 6), pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# lang_balanced_sample
# ---------------------------------------------------------------------------

def q_lang_balanced_sample(sf_dir: str) -> rd.Dataset:
    """Language-balanced subsample: the SAMPLE_PER_LANG docs per language
    with the smallest md5(doc_id) sort key — a deterministic per-group
    quota sample (the data-mixing step that stops one dominant language
    from swamping a training corpus). Same bounded topology as
    group_topk: per-batch partial quota, then a per-group final, so the
    shuffle moves O(langs * quota * batches) rows."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang"])

    def keyed(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(str(d).encode()).hexdigest()
              for d in t.column("doc_id").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "sort_key": pa.array(hs, pa.string())})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["sort_key", "doc_id"])
                .groupby("lang", as_index=False, sort=False)
                .head(SAMPLE_PER_LANG))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["sort_key", "doc_id"])
                .head(SAMPLE_PER_LANG)[["doc_id", "lang", "sort_key"]])

    return (ds.map_batches(keyed, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(partial, batch_format="pandas")
            .groupby("lang").map_groups(final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# global_shuffle
# ---------------------------------------------------------------------------

def q_global_shuffle(sf_dir: str) -> rd.Dataset:
    """Deterministic training-order shuffle: every doc gets a shard
    (first 64 md5 bits mod the derived shard count) and a dense position
    within its shard (rank by md5 hex, doc_id tie-break). Key-only
    hashing makes the permutation identical across runs and cluster
    sizes; the only shuffle is the groupby(shard), and each shard ranks
    independently — the shard count is DERIVED from the corpus size
    (_shuffle_shards_for: ceil(n / SHUFFLE_TARGET_ROWS), floor 8) so one
    rank group always fits a worker at any tier. The parquet row count
    is metadata, so the sizing pass is free."""
    ds = _t(sf_dir, "documents", ["doc_id"])
    n_shards = _shuffle_shards_for(ds.count())

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hs = [hashlib.md5(str(d).encode()).hexdigest() for d in ids]
        shards = [int(h[:16], 16) % n_shards for h in hs]
        return pa.table({"doc_id": t.column("doc_id"),
                         "shard": pa.array(shards, pa.int64()),
                         "h": pa.array(hs, pa.string())})

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).reset_index(drop=True)
        return pd.DataFrame({"doc_id": g["doc_id"],
                             "shard": g["shard"],
                             "pos": np.arange(len(g), dtype=np.int64)})

    return (ds.map_batches(keyed, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("shard").map_groups(rank, batch_format="pandas"))


# ---------------------------------------------------------------------------
# source_mix
# ---------------------------------------------------------------------------

def _quota_for(source: str) -> int:
    return SOURCE_QUOTAS.get(source, SOURCE_QUOTA_DEFAULT)


def q_source_mix(sf_dir: str) -> rd.Dataset:
    """Weighted corpus mixing: keep a per-source quota of docs (md5-order
    deterministic), up-weighting curated sources over bulk crawl — the
    mixture step that sets a training corpus's source proportions.
    Same bounded topology as lang_balanced_sample, but the quota varies
    per group; the per-batch partial keeps at most quota rows per
    (source, batch), so the shuffle never carries the full corpus."""
    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def keyed(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(str(d).encode()).hexdigest()
              for d in t.column("doc_id").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "source": t.column("source"),
                         "sort_key": pa.array(hs, pa.string())})

    def take_quota(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sort_key", "doc_id"])
        rank = df.groupby("source").cumcount()
        quota = df["source"].map(_quota_for)
        return df[rank < quota][["doc_id", "source", "sort_key"]]

    return (ds.map_batches(keyed, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(take_quota, batch_format="pandas")
            .groupby("source").map_groups(take_quota, batch_format="pandas"))


# ---------------------------------------------------------------------------
# length_band_filter
# ---------------------------------------------------------------------------

PPLX_LEVELS = (0.33, 0.67)  # tercile edges, exact decimal literals


def q_perplexity_buckets(sf_dir: str) -> rd.Dataset:
    """CCNet-style head/middle/tail partition (Wenzek et al. 2020 §4.3):
    per-LANGUAGE tercile thresholds of a fluency score, each doc labeled
    by which band it falls in — the curation split that keeps 'head'
    for training and drops or down-samples 'tail'. The score here is an
    integer perplexity surrogate (chars per whitespace token, in
    milli-units: associative, no float wobble); a real deployment swaps
    in a KenLM score column with the identical plan.

    Two phases, both scale-free: (1) per-batch Arrow (lang, score)
    value counts -> one groupby-sum shuffle bounded by |langs| x the
    score's value domain (never by doc count) -> per-lang quantile_disc
    rank pick on the driver (a handful of rows); (2) a streaming
    vectorized map with the |langs|-entry threshold table in the
    closure. Same topology as q_length_band_filter, keyed."""
    docs = _t(sf_dir, "documents", ["doc_id", "lang", "text", "n_chars"])

    def score_cols(t: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(t.column("text"), " "), 1)
        s = pc.divide(pc.multiply(t.column("n_chars"), 1000),
                      pc.cast(n_tok, pa.int64()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "score": pc.cast(s, pa.int64())})

    scored = docs.map_batches(score_cols, batch_format="pyarrow",
                              zero_copy_batch=True)

    def partial_counts(t: pa.Table) -> pa.Table:
        g = (pa.table({"lang": t.column("lang"), "value": t.column("score")})
             .group_by(["lang", "value"]).aggregate([("value", "count")]))
        return pa.table({"lang": g.column("lang"),
                         "value": g.column("value"),
                         "n": pc.cast(g.column("value_count"), pa.int64())})

    hist = (scored.map_batches(partial_counts, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["lang", "value"]).sum("n").to_pandas())

    edges: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("value").reset_index(drop=True)
        cum = g["sum(n)"].cumsum()
        n = int(cum.iloc[-1])
        picks = []
        for q in PPLX_LEVELS:  # quantile_disc rank = ceil(q*n), 1-based
            rank = max(1, math.ceil(q * n))
            picks.append(int(g["value"].iloc[int((cum >= rank).idxmax())]))
        edges[str(lang)] = (picks[0], picks[1])

    # corpus-wide fallback edges: pandas groupby drops NaN lang groups, so
    # a null/unseen lang must degrade to the global quantiles, not KeyError
    gg = hist.groupby("value", as_index=False)["sum(n)"].sum().sort_values(
        "value").reset_index(drop=True)
    gcum = gg["sum(n)"].cumsum()
    gn = int(gcum.iloc[-1]) if len(gg) else 0
    gpicks = []
    for q in PPLX_LEVELS:
        rank = max(1, math.ceil(q * max(gn, 1)))
        gpicks.append(int(gg["value"].iloc[int((gcum >= rank).idxmax())])
                      if len(gg) else 0)
    global_edges = (gpicks[0], gpicks[1]) if gpicks else (0, 0)

    def label(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_pylist()
        s = t.column("score").to_numpy()
        t1 = np.fromiter((edges.get(x, global_edges)[0] for x in langs),
                         np.int64, len(langs))
        t2 = np.fromiter((edges.get(x, global_edges)[1] for x in langs),
                         np.int64, len(langs))
        bucket = np.where(s <= t1, "head", np.where(s <= t2, "middle",
                                                    "tail"))
        return t.append_column("bucket", pa.array(bucket, pa.string()))

    return scored.map_batches(label, batch_format="pyarrow",
                              zero_copy_batch=True)


def _pplx_sql() -> str:
    qd = ", ".join(
        f"quantile_disc(s, {q}) AS t{i + 1}"
        for i, q in enumerate(PPLX_LEVELS))
    return f"""
WITH d AS (
  SELECT doc_id, lang,
         (n_chars * 1000) // len(string_split(text, ' ')) AS s
  FROM documents),
t AS (SELECT lang, {qd} FROM d GROUP BY lang)
SELECT d.doc_id, d.lang, CAST(d.s AS BIGINT) AS score,
       CASE WHEN d.s <= t.t1 THEN 'head'
            WHEN d.s <= t.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM d JOIN t USING (lang)
"""


def q_length_band_filter(sf_dir: str) -> rd.Dataset:
    """Percentile-band outlier trim: keep docs whose char length lies in
    the global [p5, p95] band — the two-phase filter shape (aggregate a
    threshold, broadcast it into a streaming filter). Phase 1 reuses the
    distributed value histogram: the driver sees (distinct n_chars,
    count) rows, bounded cardinality, never documents. Phase 2 is a pure
    vectorized filter with the two scalars in the closure."""
    docs = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = t.column("n_chars").value_counts()
        return pa.table({"value": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    hist = (docs.map_batches(partial_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("value").sum("n").to_pandas()
            .sort_values("value").reset_index(drop=True))
    cum = hist["sum(n)"].cumsum()
    n = int(cum.iloc[-1])
    edges = []
    for q in LENGTH_BAND:   # quantile_disc rank = ceil(q*n), 1-based
        rank = max(1, math.ceil(q * n))
        edges.append(int(hist["value"].iloc[int((cum >= rank).idxmax())]))
    lo, hi = edges

    def band(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t.column("n_chars"), lo),
                       pc.less_equal(t.column("n_chars"), hi))
        return t.filter(keep)

    return docs.map_batches(band, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def _quantiles_sql() -> str:
    branches = " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(l_quantity, {q}) AS value "
        "FROM lineitem"
        for q in QUANTILE_LEVELS)
    return branches


def _bm25_sql() -> str:
    """Same expression tree as q_bm25_search, term order and operator
    associativity preserved so the doubles match bit-for-bit."""
    terms = []
    for q in BM25_QUERY:
        df = f"(SELECT count(*) FROM d WHERE list_contains(toks, '{q}'))"
        idf = f"ln(1.0 + ((SELECT n FROM c) - {df} + 0.5) / ({df} + 0.5))"
        tf = f"len(list_filter(toks, x -> x = '{q}'))"
        terms.append(
            f"{idf} * ({tf} * ({BM25_K1} + 1.0)) / ({tf} + {BM25_K1} * "
            f"(1.0 - {BM25_B} + {BM25_B} * len(toks) / (SELECT avgdl FROM c)))")
    score = " + ".join(terms)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT count(*) AS n, sum(len(toks)) / count(*) AS avgdl FROM d)
SELECT doc_id, round(s, 6) AS score
FROM (SELECT doc_id, {score} AS s FROM d)
WHERE s > 0
"""


def _split_sql() -> str:
    bucket = sql_hex64("CAST(doc_id AS VARCHAR)") + " % 100"
    return f"""
SELECT doc_id, CAST(b AS BIGINT) AS bucket,
       CASE WHEN b < {SPLIT_EDGES[0]} THEN 'train'
            WHEN b < {SPLIT_EDGES[1]} THEN 'valid'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {bucket} AS b FROM documents)
"""


# ---------------------------------------------------------------------------
# dsir_weights — hashed n-gram importance resampling (DSIR)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 64
DSIR_SCALE = 1_000_000
DSIR_TARGET_LANG = "zh"


def q_dsir_weights(sf_dir: str) -> rd.Dataset:
    """Per-doc importance weight for target-domain data selection — the
    hashed-n-gram importance-resampling estimator of DSIR (Xie et al.
    2023): bucket every token by hash, fit bag-of-buckets counts for the
    target domain (here DSIR_TARGET_LANG docs) and the raw corpus, and score
    each document by the sum of its tokens' target/raw bucket ratios.
    DSIR samples proportionally to exp(log-ratio sums); this uses
    integer-scaled ratios with add-1 smoothing so the score is EXACT
    (associative int64 sums — no float wobble under parallel reduction)
    and the DuckDB oracle can replay it bit-for-bit. (int64 headroom:
    (count+1)*1e6 per bucket — safe through ~1e12-token corpora.)

    Two passes, both streaming: (1) per-batch bucket histograms reduced
    by ONE tiny groupby — exactly DSIR_BUCKETS rows reach the driver,
    never the token stream; (2) a stateless map over docs with the
    DSIR_BUCKETS-entry weight table in the closure (a ray.put handle at
    a real bucket count). Token hashing reuses the per-worker md5 cache
    of the minhash kernel (vocabulary-bounded, one md5 per distinct
    token per worker)."""
    from .dedup import _token_hashes

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def bucket_partial(t: pa.Table) -> pa.Table:
        raw = np.zeros(DSIR_BUCKETS, np.int64)
        tgt = np.zeros(DSIR_BUCKETS, np.int64)
        for txt, lang in zip(t.column("text").to_pylist(),
                             t.column("lang").to_pylist()):
            b = _token_hashes(txt.split(" ")) % DSIR_BUCKETS
            cnt = np.bincount(b.astype(np.int64), minlength=DSIR_BUCKETS)
            raw += cnt
            if lang == DSIR_TARGET_LANG:
                tgt += cnt
        return pa.table({"bkt": pa.array(range(DSIR_BUCKETS), pa.int64()),
                         "raw": pa.array(raw), "tgt": pa.array(tgt)})

    counts = (ds.map_batches(bucket_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bkt").sum(["raw", "tgt"]).take_all())
    w = np.zeros(DSIR_BUCKETS, np.int64)
    for r in counts:
        w[r["bkt"]] = ((r["sum(tgt)"] + 1) * DSIR_SCALE) // (r["sum(raw)"] + 1)

    def score(t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, np.int64)
        for i, txt in enumerate(t.column("text").to_pylist()):
            b = _token_hashes(txt.split(" ")) % DSIR_BUCKETS
            out[i] = w[b.astype(np.int64)].sum()
        return pa.table({"doc_id": t.column("doc_id"),
                         "score": pa.array(out)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _dsir_sql() -> str:
    bkt = sql_hex64("tok") + f" % {DSIR_BUCKETS}"
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents),
bk AS (SELECT doc_id, lang, CAST({bkt} AS BIGINT) AS bkt FROM toks),
raw AS (SELECT bkt, count(*) AS c FROM bk GROUP BY bkt),
tgt AS (SELECT bkt, count(*) AS c FROM bk
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bkt),
r AS (SELECT raw.bkt,
             ((coalesce(tgt.c, 0) + 1) * {DSIR_SCALE}) // (raw.c + 1) AS w
      FROM raw LEFT JOIN tgt USING (bkt))
SELECT bk.doc_id, CAST(sum(r.w) AS BIGINT) AS score
FROM bk JOIN r USING (bkt) GROUP BY bk.doc_id
"""


# ---------------------------------------------------------------------------
# temperature_mix — multinomial source-sampling weights p ∝ n^α
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.7          # sampling temperature (GPT-3/PaLM-style mixing)
MIX_BUDGET = 100_000     # docs drawn per epoch


def q_temperature_mix(sf_dir: str) -> rd.Dataset:
    """Temperature-scaled source mixing weights (the multilingual /
    multi-source sampling rule of GPT-3 / PaLM / XLM-R: p_s ∝ n_s^α,
    α < 1 up-weights small curated sources against bulk crawl), plus
    each source's integer draw allocation for a fixed per-epoch budget.

    Engine shape: ONE groupby-count shuffle to O(sources) rows; the
    weight normalization runs on the driver over that tiny table (the
    same O(groups) discipline as ``q_crawl_budget``). Weights round to
    6 dp before the floor so both sides allocate from the identical
    double; per-source pow() is elementwise (glibc pow on both sides).
    At 100 TB the only data-sized work is the count shuffle."""
    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    counts = ds.groupby("source").count()
    rows = sorted((r["source"], int(r["count()"]))
                  for r in counts.take_all())   # O(sources), bounded
    p = [math.pow(n, MIX_ALPHA) for _, n in rows]
    z = sum(p)
    w6 = [round_half_away(x / z, 6) for x in p]
    return rd.from_arrow(pa.table({
        "source": pa.array([s for s, _ in rows], pa.string()),
        "n_docs": pa.array([n for _, n in rows], pa.int64()),
        "weight": pa.array(w6, pa.float64()),
        "alloc": pa.array([int(math.floor(MIX_BUDGET * w)) for w in w6],
                          pa.int64()),
    }))


_TEMPERATURE_MIX_SQL = f"""
WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
tot AS (SELECT sum(pow(n_docs, {MIX_ALPHA})) AS z FROM s)
SELECT source, n_docs,
       round(pow(n_docs, {MIX_ALPHA}) / (SELECT z FROM tot), 6) AS weight,
       CAST(floor({MIX_BUDGET}
            * round(pow(n_docs, {MIX_ALPHA}) / (SELECT z FROM tot), 6))
            AS BIGINT) AS alloc
FROM s
"""


ORACLE_SQL = {
    "temperature_mix": _TEMPERATURE_MIX_SQL,
    "quantiles": _quantiles_sql(),
    "group_quantiles": _group_quantiles_sql(),
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
    "top_terms": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
sc AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * round(ln((SELECT count(*) FROM documents)
                                / CAST(df.df AS DOUBLE)), 6), 6) AS score
  FROM tf JOIN df USING (token)),
rk AS (
  SELECT doc_id, token, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token) AS rank
  FROM sc)
SELECT doc_id, token, score, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {TOP_TERMS_K}
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
    "token_entropy": """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY source, tok),
t AS (SELECT source, sum(n) AS tot FROM c GROUP BY source)
SELECT c.source, CAST(t.tot AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(-sum((n / CAST(t.tot AS DOUBLE))
                  * ln(n / CAST(t.tot AS DOUBLE))), 6) AS entropy
FROM c JOIN t USING (source)
GROUP BY c.source, t.tot
""",
    "cross_source_leakage": f"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT source, array_to_string(t[i.i:i.i + {LEAK_NGRAM - 1}], ' ') AS gram
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(range(1, len(t) - {LEAK_NGRAM - 2})) AS i) i),
gs AS (SELECT DISTINCT gram, source FROM g),
k AS (SELECT gram FROM gs GROUP BY gram
      HAVING count(*) BETWEEN 2 AND {LEAK_MAX_SOURCES})
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM gs a JOIN gs b USING (gram) JOIN k USING (gram)
WHERE a.source < b.source
GROUP BY a.source, b.source
""",
    "inverted_index": f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
rk AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY token) AS df
  FROM tok)
SELECT token, CAST(max(df) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM rk WHERE rn <= {POSTINGS_BLOCK}
GROUP BY token HAVING max(df) >= {POSTINGS_DF_MIN}
""",
    "vocab_topk": f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT {VOCAB_K}
""",
    "oov_ratio": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
vocab AS (
  SELECT token FROM tok GROUP BY token
  ORDER BY count(*) DESC, token LIMIT {OOV_K})
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS oov_ratio
FROM tok t LEFT JOIN vocab v USING (token)
GROUP BY t.doc_id
""",
    "bm25_search": _bm25_sql(),
    "lang_balanced_sample": f"""
SELECT doc_id, lang, sort_key FROM (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS sort_key,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
WHERE rn <= {SAMPLE_PER_LANG}
""",
    "global_shuffle": f"""
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
            AS BIGINT) AS pos
FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST({sql_hex64("CAST(doc_id AS VARCHAR)")}
                  % (SELECT greatest({SHUFFLE_SHARDS},
                       CAST(ceil(count(*) / {SHUFFLE_TARGET_ROWS}.0)
                            AS BIGINT)) FROM documents)
                  AS BIGINT) AS shard
      FROM documents)
""",
    "length_band_filter": f"""
SELECT d.doc_id, d.n_chars
FROM documents d,
     (SELECT quantile_disc(n_chars, {LENGTH_BAND[0]}) AS lo,
             quantile_disc(n_chars, {LENGTH_BAND[1]}) AS hi
      FROM documents) t
WHERE d.n_chars BETWEEN t.lo AND t.hi
""",
    "source_mix": f"""
SELECT doc_id, source, sort_key FROM (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS sort_key,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
WHERE rn <= CASE source {' '.join(
    f"WHEN '{s}' THEN {q}" for s, q in sorted(SOURCE_QUOTAS.items()))}
            ELSE {SOURCE_QUOTA_DEFAULT} END
""",
}

QUERIES = {
    "quantiles": q_quantiles,
    "group_quantiles": q_group_quantiles,
    "price_histogram": q_price_histogram,
    "repetition_stats": q_repetition_stats,
    "stratified_split": q_stratified_split,
    "group_topk": q_group_topk,
    "token_df": q_token_df,
    "inverted_index": q_inverted_index,
    "token_entropy": q_token_entropy,
    "cross_source_leakage": q_cross_source_leakage,
    "top_terms": q_top_terms,
    "vocab_topk": q_vocab_topk,
    "oov_ratio": q_oov_ratio,
    "bm25_search": q_bm25_search,
    "lang_balanced_sample": q_lang_balanced_sample,
    "global_shuffle": q_global_shuffle,
    "length_band_filter": q_length_band_filter,
    "source_mix": q_source_mix,
    "temperature_mix": q_temperature_mix,
    "dsir_weights": q_dsir_weights,
    "perplexity_buckets": q_perplexity_buckets,
}

ORACLE_SQL["dsir_weights"] = _dsir_sql()
ORACLE_SQL["perplexity_buckets"] = _pplx_sql()


# ---------------------------------------------------------------------------
# lm_score — bigram language-model fluency (the CCNet/KenLM move)
# ---------------------------------------------------------------------------

LM_VOCAB = 256   # model hyperparameter (vocab size before <unk>), not a
                 # scale knob: the bigram table is structurally capped at
                 # (LM_VOCAB+1)^2 entries whatever the corpus size


# tier-keyed trained-LM cache: q_lm_score and q_curation_verdict share
# one training pass per corpus (the refs live in the object store);
# keyed by full normalized path like dedup._PAIR_CACHE / ann._KNN_CACHE
_LM_CACHE: dict[str, tuple] = {}


def _lm_model(sf_dir: str):
    import os

    key = os.path.normpath(os.path.abspath(sf_dir))
    if key not in _LM_CACHE:
        _LM_CACHE[key] = _lm_model_build(sf_dir)
    return _LM_CACHE[key]


def _lm_model_build(sf_dir: str):
    """Train the bigram LM (stages 1-2 of ``q_lm_score``); returns
    ``(vocab_arr, c1_ref, c2_ref, width)`` with the dense count tables
    already in the object store. Shared by the standalone scorer and
    the fused curation verdict."""
    import ray
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks, flat_tokens

    vocab_rows = _vocab_topk_ds(sf_dir, LM_VOCAB).take_all()
    vocab_arr = pa.array([r["token"] for r in vocab_rows], pa.string())
    v = len(vocab_rows)           # < LM_VOCAB on tiny corpora
    unk = v
    width = v + 1
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def tok_count(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t.column("text"), " "), 1)
        return pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(n, pa.int64())).as_py() or 0)], pa.int64())})

    total_tokens = int(
        ds.map_batches(tok_count, batch_format="pyarrow")
        .aggregate(Sum("n", alias_name="n"))["n"])
    c1 = np.zeros(width, dtype=np.int64)
    for j, r in enumerate(vocab_rows):
        c1[j] = int(r["n"])
    c1[unk] = total_tokens - int(c1[:v].sum())

    def bigram_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        flat, _lens, doc = flat_tokens(t)
        ids = pc.fill_null(pc.index_in(flat, value_set=vocab_arr), unk)
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) < 2:
            return empty
        mask = doc[:-1] == doc[1:]
        fused = ids[:-1][mask] * width + ids[1:][mask]
        if not len(fused):
            return empty
        u, c = np.unique(fused, return_counts=True)
        return pa.table({"key": pa.array(u), "n": pa.array(c)})

    bc_rows = drop_empty_blocks(
        ds.map_batches(bigram_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
    ).groupby("key").sum("n").take_all()
    c2 = np.zeros(width * width, dtype=np.int64)
    for r in bc_rows:
        c2[int(r["key"])] = int(r["sum(n)"])
    return vocab_arr, ray.put(c1), ray.put(c2), width


def q_lm_score(sf_dir: str) -> rd.Dataset:
    """Bigram language-model fluency scoring — the REAL version of the
    CCNet perplexity gate (Wenzek et al. 2020 §4.3; KenLM in the
    original): train an add-one-smoothed bigram LM on the corpus itself
    and score every doc by its mean negative log-likelihood. Low nll =
    fluent/templated, high = rare constructions or noise.

    Three bounded stages, none corpus-sized:
    (1) vocab = top-``LM_VOCAB`` unigrams (reuses the ``_vocab_topk_ds``
        bounded plan; ties break by token ascending); everything else
        maps to one <unk> id.
    (2) bigram counts AFTER unk-mapping: per-batch fused-id np.unique
        partials -> one (key, n) groupby-sum whose key domain is
        STRUCTURALLY capped at (V+1)^2 (the id space, never the corpus)
        -> a dense (V+1)^2 int64 matrix broadcast once via ``ray.put``.
        Unigram denominators ride along: vocab counts come from stage 1,
        the <unk> count is total tokens minus their sum (one Sum
        aggregate — no extra shuffle).
    (3) one streaming score map: ids via ``pc.index_in`` against the
        broadcast vocab, -ln((c2+1)/(c1+V+1)) per bigram, per-doc mean
        via bincount, rounded to 6 dp (sum-order ulp noise sits far
        below — the token_entropy convention). Docs with < 2 tokens
        score 0 with n_bigrams = 0.

    Training lives in ``_lm_model`` (shared with the fused
    ``q_curation_verdict``)."""
    import ray

    from .common import flat_tokens

    vocab_arr, c1_ref, c2_ref, width = _lm_model(sf_dir)
    unk = width - 1
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat, _lens, doc = flat_tokens(t)
        ids = pc.fill_null(pc.index_in(flat, value_set=vocab_arr), unk)
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        uni, mat = ray.get(c1_ref), ray.get(c2_ref)
        if len(ids) >= 2:
            mask = doc[:-1] == doc[1:]
            d = doc[:-1][mask]
            w1 = ids[:-1][mask]
            fused = w1 * width + ids[1:][mask]
            nll = -np.log((mat[fused] + 1.0) / (uni[w1] + width + 0.0))
            sums = np.bincount(d, weights=nll, minlength=n)
            counts = np.bincount(d, minlength=n)
        else:
            sums = np.zeros(n)
            counts = np.zeros(n, dtype=np.int64)
        mean = round_half_away(
            np.where(counts > 0, sums / np.maximum(counts, 1), 0.0), 6)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bigrams": pa.array(counts.astype(np.int64)),
            "nll": pa.array(mean, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _lm_score_sql() -> str:
    # chr(1) is the SQL-side <unk> sentinel — it cannot collide with a
    # space-split token; the engine side uses ids, not strings, so only
    # the SQL needs a reserved spelling
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
flat AS (SELECT doc_id, i, t[i] AS w
         FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)),
uc AS (SELECT w, count(*) AS c FROM flat GROUP BY w),
vocab AS (SELECT w FROM uc ORDER BY c DESC, w ASC LIMIT {LM_VOCAB}),
nv AS (SELECT count(*) AS v FROM vocab),
mapped AS (SELECT f.doc_id, f.i,
                  CASE WHEN vb.w IS NULL THEN chr(1) ELSE f.w END AS w
           FROM flat f LEFT JOIN vocab vb ON f.w = vb.w),
u1 AS (SELECT w, count(*) AS c1 FROM mapped GROUP BY w),
big AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
        FROM mapped a JOIN mapped b ON a.doc_id = b.doc_id
                                   AND b.i = a.i + 1),
bc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
nll AS (SELECT g.doc_id,
               -ln((bc.c2 + 1.0)
                   / (u1.c1 + (SELECT v FROM nv) + 1.0)) AS x
        FROM big g
        JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
        JOIN u1 ON u1.w = g.w1),
per AS (SELECT doc_id, count(*) AS n_bigrams, round(avg(x), 6) AS nll
        FROM nll GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       COALESCE(per.nll, 0.0) AS nll
FROM documents d LEFT JOIN per USING (doc_id)
"""


QUERIES["lm_score"] = q_lm_score
ORACLE_SQL["lm_score"] = _lm_score_sql()


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------

# corpus-coverage cutoffs for the tokenizer-budget curve; small enough to
# bind at the gate tiers (vocab there is a few hundred distinct tokens)
COVERAGE_CUTOFFS = (10, 100, 1000)


def q_vocab_coverage(sf_dir: str) -> pa.Table:
    """Tokenizer-budget coverage curve: what fraction of all token
    occurrences the top-K vocabulary covers, at K in COVERAGE_CUTOFFS —
    the number a tokenizer/vocab-size decision is made on (BPE papers
    plot exactly this curve). Integer-exact: output is (cutoff, covered
    occurrences, total occurrences), never a float ratio.

    ONE tokenize pass: the shared ``_token_counts_agg`` (token, n)
    aggregate is materialized once and feeds both the partial-top-k
    plan (at most max(cutoffs) rows reach the driver — the documented
    cap) and the denominator (one streaming Sum over the aggregate —
    the total token count IS the sum of the per-token counts, no
    second scan of the documents table). Ranks tie-break by token
    ascending, matching the SQL ROW_NUMBER order."""
    top_k = max(COVERAGE_CUTOFFS)
    agg = _token_counts_agg(sf_dir).materialize()
    total = int(agg.sum("sum(n)") or 0)
    ranked = _vocab_topk_ds(sf_dir, top_k, agg=agg).take_all()
    counts = np.array([r["n"] for r in ranked], dtype=np.int64)
    cum = np.cumsum(counts)
    covered = [int(cum[min(c, len(cum)) - 1]) if len(cum) else 0
               for c in COVERAGE_CUTOFFS]
    return pa.table({
        "cutoff": pa.array(list(COVERAGE_CUTOFFS), pa.int64()),
        "covered": pa.array(covered, pa.int64()),
        "total": pa.array([total] * len(COVERAGE_CUTOFFS), pa.int64()),
    })


QUERIES["vocab_coverage"] = q_vocab_coverage
ORACLE_SQL["vocab_coverage"] = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
ranked AS (SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rk
           FROM counts),
tot AS (SELECT count(*) AS t FROM tok)
SELECT CAST(c.cutoff AS BIGINT) AS cutoff,
       CAST((SELECT COALESCE(sum(n), 0) FROM ranked WHERE rk <= c.cutoff)
            AS BIGINT) AS covered,
       CAST((SELECT t FROM tot) AS BIGINT) AS total
FROM (VALUES {", ".join(f"({c})" for c in COVERAGE_CUTOFFS)}) AS c(cutoff)
"""


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------

def q_weighted_sample(sf_dir: str) -> rd.Dataset:
    """Quality-weighted downsampling: keep each doc with probability
    proportional to its token count, P = min(n_tokens, 256) / 256 —
    the DSIR/CCNet-style curation step that thins short/low-signal docs
    harder than long ones while staying fully deterministic. The draw is
    integer-exact on both sides: the first 32 bits of md5(doc_id) are
    compared against min(n_tokens, 256) << 24 (== P * 2^32, exact since
    256 divides 2^32), so membership is identical on any cluster size,
    block layout, or SQL engine — no float thresholds anywhere. Pure
    one-pass map: no shuffle, no driver materialization."""

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        u32 = np.fromiter(
            (int.from_bytes(hashlib.md5(str(d).encode()).digest()[:4], "big")
             for d in ids), count=len(ids), dtype=np.uint64)
        lens = pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")).to_numpy(
                zero_copy_only=False).astype(np.int64)
        thresh = np.minimum(lens, 256).astype(np.uint64) << np.uint64(24)
        keep = pa.array(u32 < thresh)
        out = pa.table({"doc_id": t.column("doc_id"),
                        "n_tokens": pa.array(lens, pa.int64())})
        return out.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["weighted_sample"] = q_weighted_sample
ORACLE_SQL["weighted_sample"] = """
WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
h AS (SELECT doc_id, n_tokens,
             list_sum(list_transform(range(1, 9), hx ->
               (instr('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), hx, 1))
                - 1)::HUGEINT
               * (1::HUGEINT << (4 * (8 - hx))))) AS u32
      FROM d)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM h
WHERE u32 < least(n_tokens, 256)::HUGEINT * 16777216
"""
