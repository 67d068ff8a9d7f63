"""Invariant tests for the corpus-curation operators (stats/text).

The value-level correctness gate is the DuckDB oracle compare in
test_pipelines.py; these pin the structural invariants a user relies on
(quota bounds, dense shard positions, idempotence) that a hash compare
would not explain when broken.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_lang_balanced_sample_quota(ray_session):
    from scraper_ray.pipelines.stats import SAMPLE_PER_LANG, q_lang_balanced_sample

    df = q_lang_balanced_sample(SF).to_pandas()
    per = df.groupby("lang")["doc_id"].count()
    assert (per <= SAMPLE_PER_LANG).all()
    # no doc appears twice
    assert df["doc_id"].is_unique


def test_global_shuffle_positions_dense_and_total(ray_session):
    from scraper_ray.pipelines.stats import SHUFFLE_SHARDS, q_global_shuffle

    df = q_global_shuffle(SF).to_pandas()
    assert df["doc_id"].is_unique
    assert set(df["shard"].unique()) <= set(range(SHUFFLE_SHARDS))
    for _, g in df.groupby("shard"):
        pos = sorted(g["pos"].tolist())
        assert pos == list(range(len(g)))   # dense 0..n-1 per shard


def test_length_band_keeps_interior_docs(ray_session):
    from scraper_ray.pipelines.common import read_sf_table
    from scraper_ray.pipelines.stats import q_length_band_filter

    kept = q_length_band_filter(SF).to_pandas()
    full = read_sf_table(SF, "documents", ["doc_id", "n_chars"]).to_pandas()
    assert 0 < len(kept) <= len(full)
    # the median-length doc always survives a [p5, p95] band
    med = full["n_chars"].median()
    inner = full[full["n_chars"] == full["n_chars"].iloc[
        (full["n_chars"] - med).abs().idxmin()]]
    assert set(inner["doc_id"]) <= set(kept["doc_id"])


def test_bm25_scores_positive_and_query_docs_only(ray_session):
    from scraper_ray.pipelines.common import read_sf_table
    from scraper_ray.pipelines.stats import BM25_QUERY, q_bm25_search

    scored = q_bm25_search(SF).to_pandas()
    assert (scored["score"] > 0).all()
    docs = read_sf_table(SF, "documents", ["doc_id", "text"]).to_pandas()
    has_term = {
        int(r.doc_id)
        for r in docs.itertuples()
        if any(q in r.text.split(" ") for q in BM25_QUERY)
    }
    assert set(scored["doc_id"]) == has_term


def test_text_normalize_idempotent(ray_session):
    import pyarrow as pa

    from scraper_ray.pipelines.text import q_text_normalize

    out = q_text_normalize(SF).to_pandas()
    # normalizing an already-normal string is a no-op: no uppers, no
    # double spaces, no edge spaces
    for s in out["norm_text"].head(50):
        assert s == s.lower()
        assert "  " not in s
        assert s == s.strip()


def test_source_mix_respects_quotas(ray_session):
    from scraper_ray.pipelines.stats import (SOURCE_QUOTA_DEFAULT,
                                             _quota_for, q_source_mix)

    df = q_source_mix(SF).to_pandas()
    assert df["doc_id"].is_unique
    for src, g in df.groupby("source"):
        assert len(g) <= _quota_for(src)
    assert SOURCE_QUOTA_DEFAULT > 0   # config sanity


def test_vocab_topk_is_sorted_and_bounded(ray_session):
    from scraper_ray.pipelines.stats import VOCAB_K, q_vocab_topk

    df = q_vocab_topk(SF).to_pandas().reset_index(drop=True)
    assert len(df) <= VOCAB_K
    ns = df["n"].tolist()
    assert ns == sorted(ns, reverse=True)
    assert df["token"].is_unique


def test_oov_ratio_invariants(ray_session):
    from scraper_ray.pipelines.common import read_sf_table
    from scraper_ray.pipelines.stats import OOV_K, _vocab_topk_ds, q_oov_ratio

    df = q_oov_ratio(SF).to_pandas()
    docs = read_sf_table(SF, "documents", ["doc_id", "text"]).to_pandas()
    assert len(df) == len(docs) and df["doc_id"].is_unique
    assert ((0 <= df["n_oov"]) & (df["n_oov"] <= df["n_tokens"])).all()
    assert ((0.0 <= df["oov_ratio"]) & (df["oov_ratio"] <= 1.0)).all()
    # recompute one doc by hand against the same vocab
    vocab = {r["token"] for r in _vocab_topk_ds(SF, OOV_K).take_all()}
    row = df.iloc[0]
    toks = docs.set_index("doc_id").loc[int(row.doc_id), "text"].split(" ")
    assert int(row.n_oov) == sum(1 for t in toks if t not in vocab)


def test_topology_constants_derive_from_corpus_size():
    """The two scan/shuffle-topology constants grow with the input (a
    fixed count would mean terabyte groups / unbounded driver maps at
    100 TB) and floor at the gate-tier values."""
    from scraper_ray.pipelines.packing import (_PACK_MAX_PARTS, _PACK_PART,
                                               _pack_part_for)
    from scraper_ray.pipelines.stats import (SHUFFLE_SHARDS,
                                             SHUFFLE_TARGET_ROWS,
                                             _shuffle_shards_for)

    assert _shuffle_shards_for(100) == SHUFFLE_SHARDS
    assert _shuffle_shards_for(SHUFFLE_TARGET_ROWS * 8) == SHUFFLE_SHARDS
    assert _shuffle_shards_for(SHUFFLE_TARGET_ROWS * 100) == 100
    assert _shuffle_shards_for(25 * 10**9) > 6000   # 100 TB-ish corpora

    assert _pack_part_for(500) == _PACK_PART
    wide = _pack_part_for(10**12)
    assert wide > _PACK_PART
    # the derived width keeps the driver offsets map bounded
    assert (10**12 + 1) / wide <= _PACK_MAX_PARTS


def test_boilerplate_flags_per_source_repeats_only(ray_session, tmp_path):
    """A footer phrase repeated across srcA docs is boilerplate for
    them; the SAME phrase on a single srcB doc is not (per-source
    conditioning); fully original docs score zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.dedup import q_boilerplate

    footer = "all rights reserved footer"          # 4 tokens -> 2 grams
    rows = {
        1: ("alpha beta gamma delta " + footer, "srcA"),
        2: ("epsilon zeta eta theta " + footer, "srcA"),
        3: ("iota kappa lmb mu nu xi", "srcA"),     # original -> 0
        4: ("omic pi rho sigma " + footer, "srcB"),  # lone carrier -> 0
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(rows), pa.int64()),
        "text": pa.array([t for t, _ in rows.values()], pa.string()),
        "source": pa.array([s for _, s in rows.values()], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = q_boilerplate(str(tmp_path)).to_pandas().set_index("doc_id")
    # doc 1: 8 tokens -> 6 grams; the 2 grams inside the footer repeat
    # on doc 2 (bridging grams mix unique prefixes, so only the footer's
    # own 3-grams repeat)
    assert out.loc[1, "n_boiler_grams"] == 2
    assert out.loc[2, "n_boiler_grams"] == 2
    assert out.loc[3, "n_boiler_grams"] == 0
    assert out.loc[4, "n_boiler_grams"] == 0
    assert (out["n_boiler_grams"] <= out["n_grams"]).all()
    assert out.loc[1, "n_grams"] == 6


def test_top_terms_paths_agree_and_ranks_dense(ray_session):
    """The broadcast and distributed-join plans return identical rows;
    ranks are dense 1..k per doc and scores non-increasing."""
    from scraper_ray.pipelines.stats import TOP_TERMS_K, q_top_terms

    a = (q_top_terms(SF).to_pandas()
         .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    b = (q_top_terms(SF, broadcast_cap=0).to_pandas()
         .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    assert a.values.tolist() == b.values.tolist()
    for _, g in a.groupby("doc_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert len(g) <= TOP_TERMS_K
        assert (g["score"].diff().dropna() <= 0).all()


def test_budget_select_prefix_and_degenerate_scores(ray_session):
    """budget_select: selection is the quality-ordered prefix (every
    kept doc outranks every dropped one under (score DESC, doc_id)),
    the budget binds exactly at the boundary doc, and the degenerate
    all-equal-score corpus (band_w floor of 1) still selects the
    deterministic doc_id prefix."""
    import pandas as pd
    import ray.data as rd

    from scraper_ray.pipelines.packing import _SELECT_BUDGET, budget_select, q_budget_select

    df = q_budget_select(SF).to_pandas().sort_values("prefix_tokens")
    assert (df["prefix_tokens"] < _SELECT_BUDGET).all()
    # prefix sums are consistent: each prefix = previous prefix + tokens
    assert (df["prefix_tokens"].to_numpy()[1:]
            == (df["prefix_tokens"] + df["n_tokens"]).to_numpy()[:-1]).all()
    # total selected tokens covers the budget (last doc may overflow)
    assert (df["prefix_tokens"] + df["n_tokens"]).max() >= _SELECT_BUDGET
    # degenerate: every score identical -> doc_id-prefix selection
    flat = pd.DataFrame({"doc_id": range(100), "score": [7] * 100,
                         "n_tokens": [10] * 100})
    out = budget_select(rd.from_pandas(flat), budget=95).to_pandas()
    assert sorted(out["doc_id"].tolist()) == list(range(10))
    assert sorted(out["prefix_tokens"].tolist()) == [i * 10 for i in range(10)]


def test_media_resize_and_frame_sample_invariants(ray_session):
    """Resize: thumbnails fit 64x64 with the long side exactly 64 and
    aspect preserved within integer rounding. Frame sample: <= 8 frames
    per stream, indices inside the stream, constant 40ms spacing."""
    from scraper_ray.pipelines.media import q_frame_sample, q_media_resize

    rz = q_media_resize(SF).to_pandas()
    assert len(rz) and (rz["dst_w"] <= 64).all() and (rz["dst_h"] <= 64).all()
    assert (rz[["dst_w", "dst_h"]].max(axis=1) == 64).all()
    assert (rz["thumb_bytes"] == rz["dst_w"] * rz["dst_h"] * 3).all()

    fs = q_frame_sample(SF).to_pandas()
    assert len(fs) and (fs["frame_idx"] < fs["n_frames"]).all()
    per = fs.groupby("media_id").size()
    assert (per <= 8).all()
    assert (fs["ts_ms"] == fs["frame_idx"] * 40).all()


def test_media_pool_size_derives_from_cluster(ray_session):
    """The media actor pools must scale with the cluster like the
    quality classifier's, not sit at a hardcoded concurrency=2."""
    import ray

    from scraper_ray.pipelines.media import media_pool_size

    lo, hi = media_pool_size()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    assert lo == 1 and hi == max(4, cpus // 2)


def test_bpe_pairs_counts_match_naive(ray_session):
    from collections import Counter

    from scraper_ray.pipelines.common import read_sf_table
    from scraper_ray.pipelines.text import _BPE_PAIRS_K, q_bpe_pairs

    got = q_bpe_pairs(SF).to_pandas()
    docs = read_sf_table(SF, "documents", ["text"]).to_pandas()
    naive: Counter = Counter()
    for txt in docs["text"]:
        toks = txt.split(" ")
        naive.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_PAIRS_K]
    assert list(zip(got["pair"], got["n"])) == want


def test_dsir_weights_favor_target_language(ray_session):
    from scraper_ray.pipelines.common import read_sf_table
    from scraper_ray.pipelines.stats import DSIR_TARGET_LANG, q_dsir_weights

    scores = q_dsir_weights(SF).to_pandas()
    docs = read_sf_table(SF, "documents",
                         ["doc_id", "lang", "text"]).to_pandas()
    m = scores.merge(docs, on="doc_id")
    assert (m["score"] > 0).all()
    # the estimator's whole point: target-language docs score higher
    # PER TOKEN on average than the rest of the corpus (total score
    # scales with doc length, so normalize before comparing)
    per_tok = m["score"] / m["text"].str.split(" ").str.len()
    tgt = per_tok[m["lang"] == DSIR_TARGET_LANG].mean()
    rest = per_tok[m["lang"] != DSIR_TARGET_LANG].mean()
    assert tgt > rest


def test_knn_graph_ranks_dense_and_symmetric_candidates(ray_session):
    from scraper_ray.pipelines.ann import KNN_K, q_knn_graph

    g = q_knn_graph(SF).to_pandas()
    assert not (g["vec_id"] == g["neighbor"]).any()
    for _, grp in g.groupby("vec_id"):
        ranks = sorted(grp["rank"].tolist())
        assert ranks == list(range(1, len(grp) + 1))   # dense 1..n
        assert len(grp) <= KNN_K
        # ranks follow (cosine desc, neighbor asc)
        ordered = grp.sort_values("rank")
        key = list(zip(-ordered["cosine"], ordered["neighbor"]))
        assert key == sorted(key)
    # candidate symmetry: if b is a's neighbor, the pair was scored both
    # ways, so a appears among b's candidates unless pushed out by rank
    pairs = set(zip(g["vec_id"], g["neighbor"]))
    back = sum((b, a) in pairs for a, b in pairs)
    assert back > 0


def test_paragraph_dedup_rewrites_only_duplicates(ray_session):
    from scraper_ray.pipelines.corpus import q_paragraph_dedup

    out = q_paragraph_dedup(SF).to_pandas()
    assert (out["n_kept"] <= out["n_pars"]).all()
    assert (out["n_kept"] >= 0).all()
    # rewritten text token/paragraph arithmetic: empty text iff nothing kept
    empty = out["text"] == ""
    assert (empty == (out["n_kept"] == 0)).all()
    # some boilerplate must exist in a synthetic web with shared headers
    assert (out["n_kept"] < out["n_pars"]).any()
    # a kept-everything doc's text is its paragraphs joined by one space
    full = out[out["n_kept"] == out["n_pars"]]
    if len(full):
        assert (full["text"].str.len() > 0).all()


def test_quality_classifier_matches_naive_recount(ray_session):
    from scraper_ray.pipelines.common import read_sf_table
    from scraper_ray.pipelines.dedup import _hash64
    from scraper_ray.pipelines.text import (CLF_BUCKETS, _CLF_WEIGHT_MOD,
                                            q_quality_classifier)

    out = q_quality_classifier(SF).to_pandas().set_index("doc_id")
    docs = read_sf_table(SF, "documents", ["doc_id", "text"]).to_pandas()
    assert len(out) == len(docs)
    # keep_flag is exactly sign(logit)
    assert (out["keep_flag"] == (out["logit"] > 0).astype(int)).all()
    # naive per-token recompute on a sample agrees with the actor pool
    for r in docs.head(25).itertuples():
        logit = sum(
            _hash64(str(_hash64(tok) % CLF_BUCKETS)) % _CLF_WEIGHT_MOD - 1000
            for tok in r.text.split(" "))
        assert int(out.loc[r.doc_id, "logit"]) == logit


def test_perplexity_buckets_band_order_and_coverage(ray_session):
    from scraper_ray.pipelines.stats import q_perplexity_buckets

    df = q_perplexity_buckets(SF).to_pandas()
    assert df["doc_id"].is_unique
    assert set(df["bucket"].unique()) <= {"head", "middle", "tail"}
    for _, g in df.groupby("lang"):
        # band boundaries are value-ordered within every language
        h = g.loc[g["bucket"] == "head", "score"]
        m = g.loc[g["bucket"] == "middle", "score"]
        t = g.loc[g["bucket"] == "tail", "score"]
        if len(h) and len(m):
            assert h.max() < m.min()
        if len(m) and len(t):
            assert m.max() < t.min()
        # head holds at least the quantile_disc tercile mass
        assert len(h) >= 1
        if len(g) >= 3:
            assert len(h) >= 0.33 * len(g) - 1


def test_media_dedup_keeper_is_first_occurrence(ray_session):
    from scraper_ray.pipelines.corpus import q_media_dedup
    from scraper_ray.pipelines.crawl_queries import _run_crawl

    out = q_media_dedup(SF).to_pandas()
    assert out["media_ref"].is_unique
    assert (out["n_refs"] >= out["n_docs"]).all()
    assert (out["n_docs"] >= 1).all()
    # keeper must be the globally-minimal (doc_id, offset) occurrence
    spans = _run_crawl(SF).select_columns(["doc_id", "spans"]).to_pandas()
    first: dict[str, tuple] = {}
    n_occ: dict[str, int] = {}
    for r in spans.itertuples():
        for s in r.spans:
            if s["kind"] != "media":
                continue
            key = (r.doc_id, s["offset"])
            ref = s["media_ref"]
            n_occ[ref] = n_occ.get(ref, 0) + 1
            if ref not in first or key < first[ref]:
                first[ref] = key
    assert len(out) == len(first)
    for r in out.itertuples():
        assert (r.keep_doc, r.keep_offset) == first[r.media_ref]
        assert r.n_refs == n_occ[r.media_ref]


def test_dedup_funnel_monotone_and_consistent(ray_session):
    from scraper_ray.pipelines.dedup import q_dedup_funnel

    df = (q_dedup_funnel(SF).to_pandas()
          .set_index("stage")["n"].astype(int))
    assert df["docs"] >= df["distinct_texts"] >= 1
    assert df["near_docs"] >= 2 * df["near_clusters"] or df["near_docs"] == 0
    # every pair touches two docs; a cluster of k docs has >= k-1 pairs
    assert df["near_pairs"] >= df["near_docs"] - df["near_clusters"]
    assert df["survivors"] == df["docs"] - df["near_docs"] + df["near_clusters"]
    assert 0 < df["survivors"] <= df["docs"]


def test_decontaminate_bloom_one_sided_and_consistent(ray_session):
    """Bloom decontamination never misses a truly contaminated doc
    (bloom_hit >= exact_hit row-wise), covers exactly the training
    split, and its exact flag agrees with q_decontaminate."""
    from scraper_ray.pipelines.packing import (
        q_decontaminate, q_decontaminate_bloom)

    bl = q_decontaminate_bloom(SF).to_pandas().set_index("doc_id")
    ex = q_decontaminate(SF).to_pandas().set_index("doc_id")
    assert set(bl.index) == set(ex.index)
    merged = bl.join(ex[["contaminated"]])
    # one-sided: every exact hit is a bloom hit
    assert (merged["bloom_hit"] >= merged["exact_hit"]).all()
    # the exact flag recomputed inside the bloom query matches the
    # canonical decontaminate output
    assert (merged["exact_hit"] == merged["contaminated"]).all()
    assert set(bl["bloom_hit"].unique()) <= {0, 1}


def test_repetition_scores_match_naive(ray_session):
    """The vectorized gram kernels equal a per-doc Python recount."""
    from collections import Counter

    from scraper_ray.pipelines.text import q_repetition_scores

    df = (q_repetition_scores(SF).to_pandas()
          .set_index("doc_id").sort_index())
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    for _, r in docs.head(60).iterrows():
        toks = r["text"].split(" ")
        g2 = Counter(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
        g3 = Counter(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
        row = df.loc[r["doc_id"]]
        n2 = sum(g2.values())
        assert row["n2"] == n2
        assert row["d2"] == len(g2)
        assert row["top2"] == (max(g2.values()) if g2 else 0)
        assert row["n3"] == sum(g3.values())
        assert row["d3"] == len(g3)
        want_keep = int(n2 == 0 or ((n2 - len(g2)) * 5 <= n2
                                    and max(g2.values()) * 5 <= n2))
        assert row["keep_flag"] == want_keep


def test_media_alignment_invariants(ray_session):
    """One aligned row per media span; scores inside the int logit
    range; the aligned flag is exactly the threshold comparison."""
    from scraper_ray.pipelines.media import ALIGN_THRESHOLD, q_media_alignment
    from scraper_ray.pipelines.crawl_queries import q_crawl_spans

    df = q_media_alignment(SF).to_pandas()
    spans = q_crawl_spans(SF).to_pandas()
    media = spans[spans["kind"] == "media"]
    assert len(df) == len(media)
    assert set(zip(df["doc_id"], df["offset"])) == set(
        zip(media["doc_id"], media["offset"]))
    assert df["score"].between(0, 1100).all()
    assert (df["aligned"] == (df["score"] >= ALIGN_THRESHOLD)
            .astype("int64")).all()


def test_lm_score_matches_naive(ray_session):
    """The distributed bigram LM equals a single-process recount."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from scraper_ray.pipelines.stats import LM_VOCAB, q_lm_score

    df = q_lm_score(SF).to_pandas().set_index("doc_id").sort_index()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    uni = Counter()
    for x in docs["text"]:
        uni.update(x.split(" "))
    vocab = set(w for w, _ in sorted(uni.items(),
                                     key=lambda kv: (-kv[1], kv[0]))
                [:LM_VOCAB])
    v = len(vocab)

    def mapped(x):
        return [w if w in vocab else None for w in x.split(" ")]

    u1, bc = Counter(), Counter()
    for x in docs["text"]:
        ws = mapped(x)
        u1.update(ws)
        bc.update(zip(ws, ws[1:]))
    for _, r in docs.head(50).iterrows():
        ws = mapped(r["text"])
        pairs = list(zip(ws, ws[1:]))
        row = df.loc[r["doc_id"]]
        assert row["n_bigrams"] == len(pairs)
        if not pairs:
            assert row["nll"] == 0.0
            continue
        nll = sum(-math.log((bc[p] + 1.0) / (u1[p[0]] + v + 1.0))
                  for p in pairs) / len(pairs)
        assert abs(row["nll"] - nll) < 5e-6


def test_curation_verdict_consistent_with_gates(ray_session):
    """The fused verdict's per-gate flags equal the standalone gate
    queries' decisions, and keep is their conjunction."""
    from scraper_ray.pipelines.text import (
        LM_NLL_MAX, q_curation_verdict, q_gopher_rules, q_quality_filter,
        q_repetition_scores)
    from scraper_ray.pipelines.stats import q_lm_score

    v = q_curation_verdict(SF).to_pandas().set_index("doc_id").sort_index()
    quality = set(q_quality_filter(SF).to_pandas()["doc_id"])
    gopher = (q_gopher_rules(SF).to_pandas()
              .set_index("doc_id")["keep_flag"])
    rep = (q_repetition_scores(SF).to_pandas()
           .set_index("doc_id")["keep_flag"])
    lm = q_lm_score(SF).to_pandas().set_index("doc_id")
    assert (v["quality_keep"] == v.index.isin(quality)
            .astype("int64")).all()
    assert (v["gopher_keep"] == gopher.reindex(v.index)).all()
    assert (v["rep_keep"] == rep.reindex(v.index)).all()
    lm_keep = ((lm["n_bigrams"] == 0)
               | (lm["nll"] <= LM_NLL_MAX)).astype("int64")
    assert (v["lm_keep"] == lm_keep.reindex(v.index)).all()
    assert (v["keep"] == v["quality_keep"] * v["gopher_keep"]
            * v["rep_keep"] * v["lm_keep"]).all()


def test_weighted_sample_invariants(ray_session):
    import hashlib

    from scraper_ray.pipelines.common import read_sf_table
    from scraper_ray.pipelines.stats import q_weighted_sample

    kept = q_weighted_sample(SF).to_pandas()
    full = read_sf_table(SF, "documents", ["doc_id", "text"]).to_pandas()
    assert kept["doc_id"].is_unique
    assert set(kept["doc_id"]) <= set(full["doc_id"])
    # saturated probability: docs with >= 256 tokens are ALWAYS kept
    # (threshold 256 << 24 == 2^32 exceeds any u32 draw)
    ntok = full["text"].str.split(" ").str.len()
    long_ids = set(full.loc[ntok >= 256, "doc_id"])
    assert long_ids <= set(kept["doc_id"])
    # membership recomputes exactly from the documented draw
    for _, r in kept.head(20).iterrows():
        u32 = int.from_bytes(
            hashlib.md5(str(r["doc_id"]).encode()).digest()[:4], "big")
        assert u32 < min(int(r["n_tokens"]), 256) << 24


def test_vocab_coverage_monotone_and_bounded(ray_session):
    from scraper_ray.pipelines.stats import COVERAGE_CUTOFFS, q_vocab_coverage

    df = q_vocab_coverage(SF).to_pandas().sort_values("cutoff")
    assert list(df["cutoff"]) == sorted(COVERAGE_CUTOFFS)
    assert df["total"].nunique() == 1
    cov = df["covered"].tolist()
    assert cov == sorted(cov)                      # monotone in cutoff
    assert (df["covered"] <= df["total"]).all()
    assert (df["covered"] > 0).all()


def test_traffic_anomalies_flags_planted_spike(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.temporal import q_traffic_anomalies

    # 30 flat days of 10 events + one 40-event spike day for type "a";
    # type "b" stays flat and must NOT be flagged
    rows = []
    eid = 0
    for day in range(30):
        n = 40 if day == 7 else 10
        for et, cnt in (("a", n), ("b", 10)):
            for _ in range(cnt):
                rows.append((eid, pd.Timestamp("2024-01-01")
                             + pd.Timedelta(days=day, minutes=eid % 60),
                             eid % 5, et, 1.0, "{}"))
                eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_traffic_anomalies(str(tmp_path)).to_pandas()
    assert set(out["event_type"]) == {"a"}
    assert len(out) == 1 and int(out["n_events"].iloc[0]) == 40


def test_containment_detects_planted_subset(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.dedup import q_containment_pairs

    # doc 2 = the first half of doc 1's distinctive text; doc 3 unrelated.
    words = [f"tok{i}" for i in range(64)]
    big = " ".join(words)
    small = " ".join(words[:32])
    other = " ".join(f"zzz{i}" for i in range(64))
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([big, small, other], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(big), len(small), len(other)], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = q_containment_pairs(str(tmp_path)).to_pandas()
    pairs = set(zip(out["doc_id"], out["container_id"]))
    assert (2, 1) in pairs            # small contained in big
    assert (1, 2) not in pairs        # big NOT contained in small
    assert not any(3 in p for p in pairs)
