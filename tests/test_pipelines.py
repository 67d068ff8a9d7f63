"""Pipeline correctness at sf0.001: every oracle-backed query must match
DuckDB exactly (rows + columns + values); rows-only queries must be
deterministic across two runs."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].map(lambda x: f"{float(x):.12g}")
        else:
            df[c] = df[c].astype(str)
    return sorted(tuple(r) for r in df.itertuples(index=False, name=None))


def test_all_oracle_queries_match(entrymod, con):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the crawl/listing oracles compare against sequential-crawler parquet
    # fixtures pinned to the driver's gate tier (sf0.01) — run those
    # queries at that tier; everything else stays on the fast sf0.001
    from scraper_ray.pipelines.crawl_queries import _ORACLE_TIER, PINNED_QUERIES

    pinned = "/root/testdata/" + _ORACLE_TIER
    # ann_ivf_topk's oracle inlines centroids derived from the gate
    # tier's embeddings, so it is tier-pinned like the crawl fixtures;
    # the set is shared with tools/check_oracles.py so they can't drift
    pinned_qs = PINNED_QUERIES
    failures = []
    for name, sql in oracles.items():
        mine = _to_pandas(qs[name](pinned if name in pinned_qs else SF))
        orc = con.execute(sql).df()
        if sorted(mine.columns) != sorted(orc.columns):
            failures.append(f"{name}: cols {sorted(mine.columns)} vs {sorted(orc.columns)}")
        elif _canon(mine) != _canon(orc):
            failures.append(f"{name}: value mismatch ({len(mine)} vs {len(orc)} rows)")
    assert not failures, failures


def test_rows_only_queries_deterministic(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        if name.startswith("crawl"):
            continue   # covered (more strongly) by the conformance suite
        a = _canon(_to_pandas(qs[name](SF)))
        b = _canon(_to_pandas(qs[name](SF)))
        assert a == b, name
        assert len(a) >= 0


def test_entry_contract(entrymod):
    import ray.data as rd

    res = entrymod.entry()
    assert isinstance(res, rd.Dataset)
    df = res.to_pandas()
    assert len(df) > 0
    assert "doc_id" in df.columns


def test_minhash_finds_planted_near_dups(ray_session, tmp_path):
    """Plant real near-duplicates and check minhash+jaccard flags them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight while stars shine "
            "bright over the quiet sleepy town").split()
    texts, ids = [], []
    for i in range(20):
        words = [w + str(i) for w in base]   # unique docs
        texts.append(" ".join(words))
        ids.append(i)
    # two planted near-dups of doc 0: one word changed / appended
    texts.append(texts[0].replace("fox0", "cat0"))
    ids.append(100)
    texts.append(texts[0] + " extra0")
    ids.append(101)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    from scraper_ray.pipelines.dedup import q_minhash_pairs

    pairs = q_minhash_pairs(str(d), threshold=0.5).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 100) in got
    assert (0, 101) in got
    # unrelated docs must not pair
    assert all(a == 0 or b in (100, 101) or a in (100, 101) for a, b in got), got


def test_skewed_bucket_capped(ray_session, tmp_path):
    """Adversarial degenerate bucket: one boilerplate text repeated far
    past the bucket cap must be dropped (no quadratic pair blowup) while
    near-dups outside the hot bucket are still found; same for the
    embedding path with a repeated vector."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.dedup import (
        _BUCKET_CAP, q_embedding_neardup, q_minhash_pairs,
    )

    n_hot = _BUCKET_CAP + 40
    texts = ["cookie banner accept all rights reserved footer text here"] * n_hot
    ids = list(range(n_hot))
    texts += ["alpha beta gamma delta epsilon zeta eta theta iota kappa",
              "alpha beta gamma delta epsilon zeta eta theta iota lambda"]
    ids += [900, 901]
    d = tmp_path / "skewed"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(d / "documents.parquet"))
    pairs = q_minhash_pairs(str(d), threshold=0.5).to_pandas()
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (900, 901) in got                      # survivors still pair
    assert not any(a < n_hot and b < n_hot for a, b in got)  # hot bucket dropped
    assert len(pairs) < 50                        # no quadratic blowup

    rng = np.random.default_rng(5)
    hot_vec = rng.standard_normal(16).astype(np.float32)
    base = rng.standard_normal(16).astype(np.float32)
    near = base + rng.standard_normal(16).astype(np.float32) * 0.01
    embs = [hot_vec] * n_hot + [base, near.astype(np.float32)]
    vids = list(range(n_hot)) + [900, 901]
    pq.write_table(
        pa.table({"vec_id": pa.array(vids, pa.int64()),
                  "embedding": pa.array([e.tolist() for e in embs],
                                        pa.list_(pa.float32()))}),
        str(d / "embeddings.parquet"))
    epairs = q_embedding_neardup(str(d), threshold=0.9).to_pandas()
    egot = {(a, b) for a, b in zip(epairs["vec_a"], epairs["vec_b"])}
    assert (900, 901) in egot
    assert not any(a < n_hot and b < n_hot for a, b in egot)
    assert len(epairs) < 50


def test_ngram_jaccard_frequent_gram_slow_path(ray_session, tmp_path):
    """Exercise BOTH verify branches of q_ngram_jaccard against a
    brute-force oracle: a boilerplate phrase shared by > _GRAM_DF_CAP
    docs makes its grams frequent, so near-dup pairs inside that cohort
    must route through the exact text-verify slow path (count-based
    jaccard would undercount their intersection), while a clean pair
    outside the cohort exercises the vectorized fast path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.dedup import (
        _GRAM_DF_CAP, _shingle_hashes, q_ngram_jaccard,
    )

    n_boiler = _GRAM_DF_CAP + 5
    texts, ids = [], []
    # cohort: every doc carries the same boilerplate sentence (its grams
    # go frequent) plus unique filler
    boiler = "all rights reserved cookie banner accept terms of service"
    for i in range(n_boiler):
        texts.append(f"{boiler} unique{i} filler{i} words{i} here{i} now{i}")
        ids.append(i)
    # planted near-dup pair INSIDE the cohort (both touch frequent grams)
    texts.append(f"{boiler} unique0 filler0 words0 here0 changed")
    ids.append(500)
    # planted near-dup pair OUTSIDE the cohort (fast path)
    texts.append("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ids.append(600)
    texts.append("alpha beta gamma delta epsilon zeta eta theta iota mu")
    ids.append(601)
    d = tmp_path / "freqgram"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(d / "documents.parquet"))

    # brute-force reference: candidates = pairs sharing >=1 rare gram;
    # jaccard over FULL gram sets
    shingles = {i: set(_shingle_hashes(t).tolist())
                for i, t in zip(ids, texts)}
    df: dict[int, int] = {}
    for s in shingles.values():
        for h in s:
            df[h] = df.get(h, 0) + 1
    rare = {h for h, c in df.items() if c <= _GRAM_DF_CAP}
    expect = {}
    sids = sorted(ids)
    for x in range(len(sids)):
        for y in range(x + 1, len(sids)):
            a, b = sids[x], sids[y]
            sa, sb = shingles[a], shingles[b]
            if not (sa & sb & rare):
                continue
            j = len(sa & sb) / max(1, len(sa | sb))
            if j >= 0.6:
                expect[(a, b)] = round(j, 4)

    got = q_ngram_jaccard(str(d), threshold=0.6).to_pandas()
    got_pairs = {(int(r.doc_a), int(r.doc_b)): round(float(r.jaccard), 4)
                 for r in got.itertuples()}
    assert (0, 500) in expect and (600, 601) in expect  # test is non-trivial
    assert got_pairs == expect


def test_jaccard_verify_distributed_path_matches_inline(
        ray_session, tmp_path, monkeypatch):
    """The hash-join + actor-pool verify path (the 100 TB fallback past
    _VERIFY_BROADCAST_CAP) must emit exactly the inline broadcast
    path's pairs. Forces the join path by zeroing the cap — this is the
    branch small-fixture oracle runs never reach, where a vectorization
    bug once hid (starts-only offsets fed to np.diff)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from scraper_ray.pipelines import dedup

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(30):
        words = list(rng.choice(vocab, size=40))
        texts.append(" ".join(words))
        ids.append(i)
        if i % 3 == 0:                      # planted near-dup
            mutated = words[:]
            mutated[5] = "zz" + str(i)
            texts.append(" ".join(mutated))
            ids.append(1000 + i)
    texts += ["hi", ""]                     # sub-k-token edge docs
    ids += [2000, 2001]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    cand = dedup.candidate_pairs_over(docs, pa.int64())

    inline = dedup.jaccard_verify_pairs(
        cand, docs, 0.5, assume_unique=False).to_pandas()
    monkeypatch.setattr(dedup, "_VERIFY_BROADCAST_CAP", 0)
    joined = dedup.jaccard_verify_pairs(
        cand, docs, 0.5, assume_unique=False).to_pandas()

    key = ["doc_a", "doc_b"]
    inline = inline.sort_values(key).reset_index(drop=True)
    joined = joined.sort_values(key).reset_index(drop=True)
    assert len(inline) > 0                  # planted dups must verify
    assert inline.equals(joined), (inline, joined)


def test_dup_spans_vectorized_kernel_edge_docs(ray_session, tmp_path):
    """The flat-bytes window gather must agree with a sequential
    reference on edge docs: empty, shorter than K, exactly K, K±1, and
    non-ASCII docs (which take the exact Python fallback because byte
    slicing would split codepoints)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.dedup import _SPAN_K, _SPAN_STRIDE, q_dup_spans

    rng = np.random.default_rng(1)
    texts = ["".join(rng.choice(list("abcdef "), size=int(L)))
             for L in rng.integers(0, 200, size=40)]
    texts += ["", "short", "x" * _SPAN_K, "y" * (_SPAN_K - 1),
              "z" * (_SPAN_K + 1), "née-déjà-vu " * 10,
              "日本語テキスト" * 20, "rep " * 16]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path / "spans"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = (q_dup_spans(str(d)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # sequential reference: per-doc distinct strided windows
    import pandas as pd
    rows = []
    for did, tx in zip(ids, texts):
        if len(tx) < _SPAN_K:
            continue
        seen = {tx[i * _SPAN_STRIDE: i * _SPAN_STRIDE + _SPAN_K]
                for i in range((len(tx) - _SPAN_K) // _SPAN_STRIDE + 1)}
        rows += [(did, w) for w in seen]
    ref = pd.DataFrame(rows, columns=["doc_id", "win"])
    cnt = ref.groupby("win")["doc_id"].nunique()
    dupset = set(cnt[cnt >= 2].index)
    ref = (ref.assign(dup=ref["win"].isin(dupset).astype("int64"), one=1)
           .groupby("doc_id", as_index=False)
           .agg(n_windows=("one", "sum"), n_dup_windows=("dup", "sum"))
           .sort_values("doc_id").reset_index(drop=True))
    assert got[["doc_id", "n_windows", "n_dup_windows"]].astype("int64") \
        .equals(ref.astype("int64"))


def test_winnow_matches_sequential_reference(ray_session, tmp_path):
    """Winnowing's segmented window-min kernel vs a per-doc sequential
    reference, over docs around every boundary: 0/1/2/3 tokens (single
    whole-text gram), exactly W grams, W-1 and W+1 grams."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.dedup import (
        _WINNOW_W, _shingle_hashes, q_winnow)

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = ["", "one", "one two", "one two three"]
    for g in (_WINNOW_W - 1, _WINNOW_W, _WINNOW_W + 1, 40):
        texts.append(" ".join(rng.choice(vocab, size=g + 2)))  # g grams
    texts.append("rep " * 20 + "rep")     # every gram identical -> 1 fp
    ids = list(range(len(texts)))
    d = tmp_path / "win"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(d / "documents.parquet"))

    got = (q_winnow(str(d)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    for i, tx in enumerate(texts):
        # ordered, NON-distinct gram hashes; short docs -> whole-text
        h = list(_shingle_hashes(tx))
        row = got[got["doc_id"] == i].iloc[0]
        assert row["n_grams"] == len(h)
        if len(h) >= _WINNOW_W:
            sel = {min(h[j:j + _WINNOW_W])
                   for j in range(len(h) - _WINNOW_W + 1)}
        else:
            sel = {min(h)}
        assert row["n_fp"] == len(sel), (i, tx)
        assert row["min_fp"] == str(min(sel))


def test_dedup_keep_best_keeps_longest_raw_copy(ray_session, tmp_path):
    """Formatting variants that normalize identically must collapse to
    ONE survivor: the longest raw text, tie broken by lowest doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.dedup import q_dedup_keep_best

    texts = {
        10: "Hello,   World! This is DOC one.",   # richest variant
        11: "hello world this is doc one",         # normalized twin
        12: "HELLO WORLD THIS IS DOC ONE",          # same norm, shorter
        20: "an unrelated document",
        30: "tie a",       # 30/31: same norm AND same length ->
        31: "tie a",       # lowest doc_id must win
    }
    tbl = pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
        "n_chars": pa.array([len(t) for t in texts.values()], pa.int64())})
    d = tmp_path / "kb"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    out = q_dedup_keep_best(str(d)).to_pandas()
    kept = set(out["doc_id"])
    assert kept == {10, 20, 30}, out
    assert len(out) == out["norm_key"].nunique()


def test_dup_span_coverage_matches_sequential_union(ray_session, tmp_path,
                                                    monkeypatch):
    """Coverage must equal the true union length of duplicated windows,
    on overlapping (stride < K) and disjoint dup runs — checked against
    an explicit per-position union reference, on BOTH the broadcast and
    the join+repartition branches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines import dedup

    K, S = dedup._SPAN_K, dedup._SPAN_STRIDE
    shared = "x" * (K + 3 * S)            # long shared run
    shared2 = "y" * K                      # exactly one window
    rng = np.random.default_rng(9)

    def rand(n):
        return "".join(rng.choice(list("abcdefgh "), size=n))

    texts = {
        1: shared + rand(100) + shared2,
        2: rand(57) + shared + rand(31),
        3: shared2 + rand(40),
        4: rand(200),                      # no dups
        5: rand(K - 1),                    # below window size
    }
    tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                    "text": pa.array(list(texts.values()), pa.string())})
    d = tmp_path / "cov"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    def reference():
        wins = {}
        for did, tx in texts.items():
            if len(tx) < K:
                continue
            ws = [(i * S, tx[i * S:i * S + K])
                  for i in range((len(tx) - K) // S + 1)]
            wins[did] = ws
        docs_per_win = {}
        for did, ws in wins.items():
            for _, w in set((0, w) for _, w in ws):
                docs_per_win.setdefault(w, set()).add(did)
        out = {}
        for did, ws in wins.items():
            dup = [(p, w) for p, w in ws if len(docs_per_win[w]) >= 2]
            cov = set()
            for p, _ in dup:
                cov.update(range(p, p + K))
            out[did] = (len(ws), len(dup), len(cov))
        return out

    ref = reference()
    for branch_cap in (None, 0):           # broadcast, then join path
        if branch_cap is not None:
            monkeypatch.setattr(dedup, "_MULTI_BROADCAST_CAP", branch_cap)
        got = (dedup.q_dup_span_coverage(str(d)).to_pandas()
               .set_index("doc_id").sort_index())
        assert set(got.index) == set(ref), (branch_cap, got)
        for did, (nw, ndup, cov) in ref.items():
            row = got.loc[did]
            assert (row["n_windows"], row["n_dup_windows"],
                    row["covered"]) == (nw, ndup, cov), (branch_cap, did,
                                                         row, ref[did])


def test_dup_span_rewrite_cuts_only_shared_runs(ray_session, tmp_path,
                                                monkeypatch):
    """The cut must remove exactly the union of duplicated windows:
    clean docs come back verbatim, docs sharing a run lose it (plus
    window spill, bounded by K-1 chars each side), and the join
    fallback equals the broadcast path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scraper_ray.pipelines import dedup

    K, S = dedup._SPAN_K, dedup._SPAN_STRIDE
    shared = "z" * (K + 2 * S)
    texts = {
        1: "left padding abcdefghij " + shared + " right padding here!",
        2: "other document starts... " + shared + " ...and then ends",
        3: "a completely clean unique document body with no repeats",
        4: "tiny",
    }
    tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                    "text": pa.array(list(texts.values()), pa.string())})
    d = tmp_path / "cut"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    results = {}
    for cap in (None, 0):
        if cap is not None:
            monkeypatch.setattr(dedup, "_MULTI_BROADCAST_CAP", cap)
        out = (dedup.q_dup_span_rewrite(str(d)).to_pandas()
               .set_index("doc_id").sort_index())
        results[cap] = out
        assert set(out.index) == set(texts)
        assert out.loc[3, "kept_text"] == texts[3]
        assert out.loc[3, "n_removed"] == 0
        assert out.loc[4, "kept_text"] == texts[4]
        for did in (1, 2):
            assert shared not in out.loc[did, "kept_text"]
            assert out.loc[did, "n_removed"] >= K
            # cut is window-aligned: at most K-1 spill chars per side
            assert len(out.loc[did, "kept_text"]) >= (
                len(texts[did]) - out.loc[did, "n_removed"])
    assert results[None].equals(results[0])
