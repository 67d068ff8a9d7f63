"""Text analysis pipelines over the documents table.

Training-data operators a 100 TB text pipeline needs — all pure
``map_batches`` (no shuffle): token counting, quality scoring, n-gram
language ID, and rolling-hash document fingerprinting. Vectorized with
pyarrow.compute where a kernel exists; the per-doc Python paths (lang-ID
profiles, winnowing) run over small strings inside the batch function —
state (profiles, stopword sets) is module-level constants compiled once
per worker process, mirroring the actor-pool init pattern.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# toy character-profile table for the n-gram language-ID heuristic;
# deterministic and self-contained (no external model)
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an"),
    "de": ("en", "er", "ch", "de", "ei"),
    "es": ("de", "la", "os", "en", "el"),
    "fr": ("es", "le", "de", "en", "re"),
    "zh": ("zh", "sh", "ng", "ia", "uo"),
}


from .common import read_sf_table as _t


def q_token_count(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per doc — fully vectorized
    (count_substring + 1 on single-spaced text)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_tok = pc.add(pc.count_substring(t.column("text"), " "), 1)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pc.cast(n_tok, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_stats(sf_dir: str) -> rd.Dataset:
    """Quality-scoring inputs per doc: tokens, distinct tokens, stopword
    count, char length — the length/stopword-ratio family."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        # vectorized: one flat tokenize; stopword membership via
        # pc.is_in on the flat stream; per-doc distinct via
        # dictionary-encode + np.unique on a fused (doc, code) key — no
        # Python loop over docs or tokens
        import numpy as np

        from .common import flat_tokens

        flat, lens, doc = flat_tokens(t)
        n = t.num_rows
        isstop = pc.is_in(
            flat, value_set=pa.array(sorted(_STOPWORDS), pa.string())
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(doc[isstop], minlength=n)
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        width = (codes.max() + 1) if len(codes) else 1
        n_dis = np.bincount(np.unique(doc * width + codes) // width,
                            minlength=n)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
            "n_tokens": pa.array(lens.astype(np.int64), pa.int64()),
            "n_distinct": pa.array(n_dis.astype(np.int64), pa.int64()),
            "n_stop": pa.array(n_stop.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_quality_filter(sf_dir: str) -> rd.Dataset:
    """Quality gate: docs kept when token count and stopword ratio pass
    fixed thresholds (the classic C4-style heuristic shape)."""
    stats = q_doc_stats(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        ratio = pc.divide(pc.cast(t.column("n_stop"), pa.float64()),
                          pc.cast(t.column("n_tokens"), pa.float64()))
        keep = pc.and_(pc.greater_equal(t.column("n_tokens"), 20),
                       pc.less(ratio, pa.scalar(0.5)))
        return t.filter(keep).select(["doc_id", "n_tokens"])

    return stats.map_batches(f, batch_format="pyarrow")


_NUM_RE = re.compile(r"[0-9]+")

_GOPHER_MIN_TOK, _GOPHER_MAX_TOK = 10, 5000
_GOPHER_MIN_LEN, _GOPHER_MAX_LEN = 2.0, 12.0
_GOPHER_MAX_NUM, _GOPHER_MAX_DUP = 0.3, 0.6


def q_gopher_rules(sf_dir: str) -> rd.Dataset:
    """Gopher-style heuristic quality gates (Rae et al. 2021 §A1.1):
    per-doc mean token length, numeric-token fraction, and
    duplicate-token fraction, plus the combined keep flag. Pure map, no
    shuffle. Mean token length is fully vectorized (on single-spaced
    text, sum of token lengths = n_chars - (n_tokens - 1)); the
    numeric/distinct token counts run one bounded Python pass per doc
    with a module-compiled regex (same pattern as q_doc_stats)."""
    import numpy as np

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t.column("text")
        nc = np.asarray(pc.cast(pc.utf8_length(text), pa.float64()))
        nt = np.asarray(pc.cast(
            pc.add(pc.count_substring(text, " "), 1), pa.float64()))
        mean_len = (nc - (nt - 1.0)) / nt
        # vectorized numeric/distinct token counts: one flat tokenize,
        # RE2 full-match on the flat stream (anchored — same semantics
        # as re.fullmatch of [0-9]+), per-doc distinct via
        # dictionary-encode + np.unique on a fused (doc, code) key — no
        # Python loop over docs or tokens
        from .common import flat_tokens

        flat, _lens, doc = flat_tokens(t)
        isnum = pc.match_substring_regex(flat, r"^[0-9]+$").to_numpy(
            zero_copy_only=False)
        n_num = np.bincount(doc[isnum], minlength=len(nt)).astype(
            np.float64)
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        width = (codes.max() + 1) if len(codes) else 1
        n_dis = np.bincount(np.unique(doc * width + codes) // width,
                            minlength=len(nt)).astype(np.float64)
        numeric_frac = n_num / nt
        dup_frac = (nt - n_dis) / nt
        keep = ((nt >= _GOPHER_MIN_TOK) & (nt <= _GOPHER_MAX_TOK)
                & (mean_len >= _GOPHER_MIN_LEN) & (mean_len <= _GOPHER_MAX_LEN)
                & (numeric_frac < _GOPHER_MAX_NUM) & (dup_frac < _GOPHER_MAX_DUP))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(nt.astype(np.int64), pa.int64()),
            "mean_tok_len": pa.array(mean_len, pa.float64()),
            "numeric_frac": pa.array(numeric_frac, pa.float64()),
            "dup_tok_frac": pa.array(dup_frac, pa.float64()),
            "keep_flag": pa.array(keep.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_repetition_scores(sf_dir: str) -> rd.Dataset:
    """Gopher-style WITHIN-doc repetition signals (Rae et al. 2021
    §A1.1, the 'repetitious text' gates): per-doc 2-/3-gram totals and
    distincts plus the top-2-gram multiplicity — the filter that
    catches looping generators and templated pages that token-level
    stats miss. Columns are INTEGER-exact (consumers derive the
    fractions), so the distributed result hash-matches DuckDB bit for
    bit; ``keep_flag`` mirrors 'dup-2-gram fraction <= 0.2 AND
    top-2-gram fraction <= 0.2' in cross-multiplied integer arithmetic
    (no float compare on either side).

    Scale shape: pure map, no shuffle — docs land whole in their batch;
    grams come from the q_bpe_pairs join-against-shifted-self Arrow
    kernels, per-doc counts from bincount/np.unique over fused
    (doc, gram-code) keys. No Python loop over docs or grams."""
    import numpy as np

    from .common import flat_tokens

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat, _lens, doc = flat_tokens(t)

        def gram_stats(gn: int):
            mm = len(flat) - gn + 1
            if mm <= 0:
                z = np.zeros(n, dtype=np.int64)
                return z, z.copy(), z.copy()
            g = pc.binary_join_element_wise(
                *(flat.slice(i, mm) for i in range(gn)), " ")
            mask = doc[:mm] == doc[gn - 1:]
            g = g.filter(pa.array(mask))
            docg = doc[:mm][mask]
            total = np.bincount(docg, minlength=n)
            codes = pc.dictionary_encode(g).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            width = (codes.max() + 1) if len(codes) else 1
            uniq, cnts = np.unique(docg * width + codes,
                                   return_counts=True)
            distinct = np.bincount(uniq // width, minlength=n)
            top = np.zeros(n, dtype=np.int64)
            np.maximum.at(top, uniq // width, cnts)
            return total, distinct, top

        n2, d2, top2 = gram_stats(2)
        n3, d3, _ = gram_stats(3)
        keep = ((n2 == 0)
                | (((n2 - d2) * 5 <= n2) & (top2 * 5 <= n2)))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n2": pa.array(n2.astype(np.int64)),
            "d2": pa.array(d2.astype(np.int64)),
            "top2": pa.array(top2.astype(np.int64)),
            "n3": pa.array(n3.astype(np.int64)),
            "d3": pa.array(d3.astype(np.int64)),
            "keep_flag": pa.array(keep.astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# BPE-style pre-tokenizer (the GPT-2 pattern family, simplified to the
# RE2-compatible subset — no lookahead — so pyarrow's RE2 and DuckDB's
# RE2 scan identically): runs of letters / digits / punctuation, each
# optionally preceded by one space, else runs of spaces.
_BPE_PAT = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def q_regex_tokens(sf_dir: str) -> rd.Dataset:
    """Token counting under a BPE-ish pre-tokenizer regex vs whitespace
    — the 'how many tokens will the tokenizer actually see' estimate a
    training-budget plan needs. Fully vectorized: one RE2
    ``count_substring_regex`` pass (non-overlapping scan == findall
    count), no Python per doc."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_ws = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
        n_bpe = pc.cast(pc.count_substring_regex(text, _BPE_PAT), pa.int64())
        chars = pc.cast(pc.utf8_length(text), pa.float64())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_ws_tokens": n_ws,
            "n_bpe_tokens": n_bpe,
            "chars_per_bpe": pc.divide(chars, pc.cast(n_bpe, pa.float64())),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_lang_confusion(sf_dir: str) -> rd.Dataset:
    """Language-ID confusion matrix: (labeled lang, predicted lang) ->
    count, the corpus-curation report that says where the lang-ID
    heuristic misroutes documents. One tiny groupby over the lang_id
    map output (at most |langs|^2 result rows at any corpus size)."""
    from ray.data.aggregate import Count

    pred = q_lang_id(sf_dir).select_columns(["lang", "lang_pred"])
    return pred.groupby(["lang", "lang_pred"]).aggregate(
        Count(alias_name="n"))


def q_lang_id(sf_dir: str) -> rd.Dataset:
    """Character-bigram language ID heuristic (deterministic, no model):
    argmax over profile-bigram hit counts; tie-broken alphabetically."""
    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        preds = []
        for x in t.column("text").to_pylist():
            best = ("", -1)
            for lang in sorted(_LANG_PROFILES):
                score = sum(x.count(bg) for bg in _LANG_PROFILES[lang])
                if score > best[1]:
                    best = (lang, score)
            preds.append(best[0])
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "lang_pred": pa.array(preds, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_fingerprint(sf_dir: str) -> rd.Dataset:
    """Winnowed rolling-hash document fingerprint (MOSS-style): min md5
    over token 4-gram windows — a compact near-identity key. md5 (not
    blake2b) so DuckDB's ``md5()`` can mirror it exactly; the lexicographic
    min of the hex digests equals the numeric min of the 128-bit hashes."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        fps = []
        for x in t.column("text").to_pylist():
            toks = x.split(" ")
            grams = (
                [" ".join(toks[i : i + 4]) for i in range(len(toks) - 3)]
                if len(toks) >= 4 else [x]
            )
            fps.append(min(hashlib.md5(g.encode()).hexdigest() for g in grams))
        return pa.table({"doc_id": t.column("doc_id"),
                         "fingerprint": pa.array(fps, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# RE2 on both sides: Arrow's replace_substring_regex/count_substring_regex
# and DuckDB's regexp_replace/regexp_extract_all are all RE2, so the
# redaction semantics (leftmost, non-overlapping, global) match exactly.
_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    (r"\b(customer|supplier) [a-z]+", "<NAME>"),   # entity-mention shape
)


def pii_scrub_batch(t: pa.Table) -> pa.Table:
    """One redaction pass over a (doc_id, text) batch: each pattern is
    counted on — then applied to — the text as redacted by the previous
    patterns (a placeholder can neither hide nor mint later matches
    unnoticed; the SQL oracle stages the same sequence)."""
    clean = t.column("text")
    n_red = None
    for pat, repl in _PII_PATTERNS:
        n = pc.cast(pc.count_substring_regex(clean, pat), pa.int64())
        n_red = n if n_red is None else pc.add(n_red, n)
        clean = pc.replace_substring_regex(clean, pat, repl)
    return pa.table({"doc_id": t.column("doc_id"),
                     "clean_text": clean,
                     "n_redacted": n_red})


def q_pii_scrub(sf_dir: str) -> rd.Dataset:
    """Regex redaction pass (the PII-scrub stage of a training-data
    pipeline): emails, phone numbers and entity mentions replaced by
    typed placeholders, with a per-doc redaction count. Fully
    vectorized — one RE2 kernel per pattern per batch."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(pii_scrub_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_stopword_strip(sf_dir: str) -> rd.Dataset:
    """Stopword removal: drop stopword tokens from each doc, keep the
    rest in order; emits the cleaned text and how many tokens fell.
    Per-doc token loop (no Arrow kernel filters list elements), state
    is a module-level frozenset — the init-once pattern."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    stop = frozenset(_STOPWORDS)

    def f(t: pa.Table) -> pa.Table:
        texts, n_rm = [], []
        for x in t.column("text").to_pylist():
            toks = x.split(" ")
            kept = [w for w in toks if w not in stop]
            texts.append(" ".join(kept))
            n_rm.append(len(toks) - len(kept))
        return pa.table({"doc_id": t.column("doc_id"),
                         "clean_text": pa.array(texts, pa.string()),
                         "n_removed": pa.array(n_rm, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


_TRUNC_TOKENS = 64


def q_truncate_tokens(sf_dir: str) -> rd.Dataset:
    """Context-length trim: keep each doc's first 64 whitespace tokens
    (the sequence-length cap stage before tokenization/packing)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts, n_tok = [], []
        for x in t.column("text").to_pylist():
            toks = x.split(" ")[:_TRUNC_TOKENS]
            texts.append(" ".join(toks))
            n_tok.append(len(toks))
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string()),
                         "n_tokens": pa.array(n_tok, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_text_normalize(sf_dir: str) -> rd.Dataset:
    """Canonical text normalization before hashing/dedup: lowercase,
    non-alphanumerics to spaces, whitespace collapsed, edges trimmed.
    Fully vectorized — three RE2/utf8 kernels per batch, no Python row
    loop, no shuffle (the shape every 100 TB normalization pass wants)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t.column("text"))
        x = pc.replace_substring_regex(x, "[^a-z0-9 ]+", " ")
        x = pc.replace_substring_regex(x, " +", " ")
        x = pc.utf8_trim(x, " ")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "norm_text": x,
            "n_chars": pc.cast(pc.utf8_length(x), pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# quality_classifier — fastText-style linear model inference
# ---------------------------------------------------------------------------

CLF_BUCKETS = 4096
_CLF_WEIGHT_MOD = 2001  # weights span [-1000, 1000]


class QualityClassifier:
    """Batched linear-classifier inference — the fastText-shaped quality
    gate (Joulin et al. 2016; the CCNet/LLaMA 'looks like a reference
    page' filter): tokens hash into CLF_BUCKETS buckets, the model is one
    weight per bucket, a doc's logit is the sum of its tokens' weights.

    This is the model-scoring actor-pool pattern: the weight table is
    "loaded" ONCE per actor in ``__init__`` (here derived
    deterministically from md5 so the run is hermetic and the DuckDB
    oracle can replay it — a real deployment would read a .bin from
    shared storage instead), and ``__call__`` scores a whole Arrow batch
    vectorized. Integer weights make the logit an associative int64 sum:
    exact under any parallelism, hash-comparable against SQL. Pure map —
    no shuffle at any scale. Reference seam: handlers/scrapers.py's
    per-session state lives the same way (SURVEY §2.3 T3)."""

    def __init__(self) -> None:
        from .dedup import _token_hashes
        self._token_hashes = _token_hashes
        # one md5 per bucket, once per actor — never per batch
        w = _token_hashes([str(b) for b in range(CLF_BUCKETS)])
        import numpy as np
        self._w = (w % _CLF_WEIGHT_MOD).astype(np.int64) - 1000

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        if t.num_rows == 0:
            return pa.table({"doc_id": t.column("doc_id"),
                             "logit": pa.array([], pa.int64()),
                             "keep_flag": pa.array([], pa.int64())})
        # one Arrow split over the batch, one hash pass over the flat
        # token stream (md5 cached per distinct token per worker), one
        # segmented reduce over doc boundaries — no per-doc Python loop.
        # split_pattern never yields an empty list (''.split -> ['']),
        # so every reduceat segment is non-empty.
        toks = pc.split_pattern(t.column("text"), " ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks).to_pylist()
        vals = self._w[(self._token_hashes(flat)
                        % CLF_BUCKETS).astype(np.int64)]
        starts = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out = np.add.reduceat(vals, starts)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "logit": pa.array(out),
            "keep_flag": pa.array((out > 0).astype("int64"), pa.int64()),
        })


def q_quality_classifier(sf_dir: str) -> rd.Dataset:
    """Score every doc with the hashed-bag-of-words linear classifier —
    actor pool so the weight table builds once per actor, not per
    batch. Pool size derives from the cluster (an inference stage is
    CPU-bound here; a real model swaps in num_gpus per actor), elastic
    from 1 so a small tier doesn't hold idle actors."""
    import ray

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return ds.map_batches(QualityClassifier, concurrency=(1, max(4, cpus // 2)),
                          batch_format="pyarrow", zero_copy_batch=True)


def _clf_sql() -> str:
    from .common import sql_hex64
    bkt = f"{sql_hex64('tok')} % {CLF_BUCKETS}"
    wgt = (f"{sql_hex64('CAST(bkt AS VARCHAR)')} % {_CLF_WEIGHT_MOD} "
           "- 1000")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
bk AS (SELECT doc_id, CAST({bkt} AS BIGINT) AS bkt FROM toks),
w AS (SELECT bkt, CAST({wgt} AS BIGINT) AS w
      FROM (SELECT DISTINCT bkt FROM bk))
SELECT bk.doc_id, CAST(sum(w.w) AS BIGINT) AS logit,
       CAST(CAST(sum(w.w) > 0 AS INTEGER) AS BIGINT) AS keep_flag
FROM bk JOIN w USING (bkt) GROUP BY bk.doc_id
"""


ORACLE_SQL = {
    "text_normalize": """
SELECT doc_id, norm AS norm_text, CAST(length(norm) AS BIGINT) AS n_chars
FROM (SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'), ' ') AS norm
      FROM documents)
""",
    "token_count": """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
""",
    "doc_stats": """
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       len(list_filter(string_split(text, ' '),
           x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop
FROM documents
""",
    "lang_id": """
WITH s AS (
  SELECT doc_id, lang,
    (length(text) - length(replace(text,'en',''))) / 2
      + (length(text) - length(replace(text,'er',''))) / 2
      + (length(text) - length(replace(text,'ch',''))) / 2
      + (length(text) - length(replace(text,'de',''))) / 2
      + (length(text) - length(replace(text,'ei',''))) / 2 AS s_de,
    (length(text) - length(replace(text,'th',''))) / 2
      + (length(text) - length(replace(text,'he',''))) / 2
      + (length(text) - length(replace(text,'in',''))) / 2
      + (length(text) - length(replace(text,'er',''))) / 2
      + (length(text) - length(replace(text,'an',''))) / 2 AS s_en,
    (length(text) - length(replace(text,'de',''))) / 2
      + (length(text) - length(replace(text,'la',''))) / 2
      + (length(text) - length(replace(text,'os',''))) / 2
      + (length(text) - length(replace(text,'en',''))) / 2
      + (length(text) - length(replace(text,'el',''))) / 2 AS s_es,
    (length(text) - length(replace(text,'es',''))) / 2
      + (length(text) - length(replace(text,'le',''))) / 2
      + (length(text) - length(replace(text,'de',''))) / 2
      + (length(text) - length(replace(text,'en',''))) / 2
      + (length(text) - length(replace(text,'re',''))) / 2 AS s_fr,
    (length(text) - length(replace(text,'zh',''))) / 2
      + (length(text) - length(replace(text,'sh',''))) / 2
      + (length(text) - length(replace(text,'ng',''))) / 2
      + (length(text) - length(replace(text,'ia',''))) / 2
      + (length(text) - length(replace(text,'uo',''))) / 2 AS s_zh
  FROM documents)
SELECT doc_id, lang,
  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
       WHEN s_fr >= s_zh THEN 'fr'
       ELSE 'zh' END AS lang_pred
FROM s
""",
    "quality_filter": """
SELECT doc_id, n_tokens FROM (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop
  FROM documents)
WHERE n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5
""",
    "fingerprint": """
SELECT doc_id,
       CASE WHEN len(toks) >= 4 THEN
         list_min(list_transform(range(1, len(toks) - 2),
                  i -> md5(array_to_string(toks[i:i+3], ' '))))
       ELSE md5(text) END AS fingerprint
FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
""",
    "pii_scrub": r"""
-- staged to mirror the engine exactly: each pattern is counted on the
-- text as redacted by the previous patterns, then applied
SELECT doc_id,
       regexp_replace(t2, '\b(customer|supplier) [a-z]+',
                      '<NAME>', 'g') AS clean_text,
       CAST(n1 + n2
          + len(regexp_extract_all(t2, '\b(customer|supplier) [a-z]+'))
          AS BIGINT) AS n_redacted
FROM (
  SELECT doc_id, n1,
         len(regexp_extract_all(t1, '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS n2,
         regexp_replace(t1, '\b\d{3}[- ]\d{3}[- ]\d{4}\b',
                        '<PHONE>', 'g') AS t2
  FROM (
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n1,
           regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t1
    FROM documents))
""",
    "stopword_strip": """
SELECT doc_id,
       array_to_string(list_filter(string_split(text, ' '),
           x -> x NOT IN ('the','a','of','and','to','in','is','it')),
           ' ') AS clean_text,
       CAST(len(string_split(text, ' '))
          - len(list_filter(string_split(text, ' '),
                x -> x NOT IN ('the','a','of','and','to','in','is','it')))
          AS BIGINT) AS n_removed
FROM documents
""",
    "truncate_tokens": """
SELECT doc_id,
       array_to_string(toks[1:64], ' ') AS text,
       CAST(least(len(toks), 64) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
""",
    "gopher_rules": """
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       mean_tok_len, numeric_frac, dup_tok_frac,
       CAST(CASE WHEN n_tokens >= 10 AND n_tokens <= 5000
                  AND mean_tok_len >= 2.0 AND mean_tok_len <= 12.0
                  AND numeric_frac < 0.3 AND dup_tok_frac < 0.6
             THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM (
  SELECT doc_id,
         n_tokens,
         (CAST(n_chars AS DOUBLE) - (CAST(n_tokens AS DOUBLE) - 1.0))
             / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
         CAST(n_num AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS numeric_frac,
         (CAST(n_tokens AS DOUBLE) - CAST(n_distinct AS DOUBLE))
             / CAST(n_tokens AS DOUBLE) AS dup_tok_frac
  FROM (
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '),
               x -> regexp_matches(x, '^[0-9]+$'))) AS n_num,
           len(list_distinct(string_split(text, ' '))) AS n_distinct
    FROM documents))
""",
}

ORACLE_SQL["regex_tokens"] = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT)
           AS n_bpe_tokens,
       CAST(length(text) AS DOUBLE)
           / CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS DOUBLE)
           AS chars_per_bpe
FROM documents
"""

ORACLE_SQL["lang_confusion"] = f"""
WITH pred AS ({ORACLE_SQL["lang_id"]})
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY lang, lang_pred
"""


# ---------------------------------------------------------------------------
# bpe_pairs — adjacent-token pair counts (one BPE merge iteration)
# ---------------------------------------------------------------------------

_BPE_PAIRS_K = 50


def q_bpe_pairs(sf_dir: str) -> rd.Dataset:
    """Top-K adjacent-token pair counts over the corpus — the statistic
    one iteration of BPE tokenizer training maximises (Sennrich et al.
    2016: merge the most frequent symbol pair; here at word granularity,
    the same count over an initial character vocabulary trains a real
    tokenizer).

    Fully vectorized pair construction: one ``split_pattern`` per batch,
    adjacent pairs built by joining the flattened token array against
    itself shifted by one (two Arrow C++ kernels), doc-boundary pairs
    masked with a numpy cumsum over the per-doc token counts, and the
    batch's histogram taken with ``value_counts``. The shuffle carries
    one (pair, n) row per distinct pair per batch — never the token
    stream — and a partial top-K per block bounds the final
    single-group rank to K * n_blocks rows, exactly the bounded
    three-stage plan of ``stats._vocab_topk_ds``."""
    import numpy as np
    import pandas as pd

    ds = _t(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        ls = pc.split_pattern(t.column("text"), " ")
        lens = pc.list_value_length(ls).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(ls)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if n < 2:
            return empty
        pairs = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n), " ")
        # a pair (i, i+1) is invalid when i+1 starts a new doc
        starts = np.cumsum(lens[:-1])
        mask = np.ones(n - 1, dtype=bool)
        mask[starts[(starts > 0) & (starts < n)] - 1] = False
        vc = pc.value_counts(pairs.filter(pa.array(mask)))
        if len(vc) == 0:
            return empty
        return pa.table({"pair": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("pair").sum("n"))

    def partial_top(t: pa.Table) -> pa.Table:
        out = pa.table({"pair": t.column("pair"),
                        "n": pc.cast(t.column("sum(n)"), pa.int64())})
        order = pc.sort_indices(out, sort_keys=[("n", "descending"),
                                                ("pair", "ascending")])
        t2 = out.take(order[: min(_BPE_PAIRS_K, out.num_rows)])
        return t2.append_column("g", pa.array([0] * t2.num_rows, pa.int8()))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["n", "pair"], ascending=[False, True])
                .head(_BPE_PAIRS_K)[["pair", "n"]])

    return (agg.map_batches(partial_top, batch_format="pyarrow")
            .groupby("g").map_groups(final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# bpe_encode — train merges on a capped sample, apply corpus-wide
# ---------------------------------------------------------------------------

BPE_MERGES = 8                 # merge rules learned
BPE_TRAIN_CAP = 1 << 14        # max docs read for merge training
_BPE_JOIN = "·"           # merged-token joiner (absent from corpus)


def _bpe_train_merges(sf_dir: str, n_merges: int = BPE_MERGES) -> list[str]:
    """Iterative BPE merge training on a deterministic driver-capped
    sample (the IVF-centroid pattern: real tokenizers train on a
    sample, then encode the whole corpus). Each round counts adjacent
    pairs on the CURRENT sample (re-counted after every merge — true
    BPE, not one-pass ranking), picks the (count DESC, pair ASC) best,
    and applies it as a string-level leftmost-nonoverlapping replace —
    the exact semantics both the engine's Arrow ``replace_substring``
    and the oracle's nested ``replace()`` apply at encode time."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    parts, rows = [], 0
    for rg in range(f.num_row_groups):
        parts.append(f.read_row_group(rg, columns=["doc_id", "text"]))
        rows += parts[-1].num_rows
        if rows >= BPE_TRAIN_CAP:
            break
    t = pa.concat_tables(parts).slice(0, BPE_TRAIN_CAP)
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    sample = t.column("text").to_pylist()
    merges: list[str] = []
    for _ in range(n_merges):
        counts: dict[str, int] = {}
        for tx in sample:
            toks = tx.split(" ")
            for a, b in zip(toks, toks[1:]):
                p = a + " " + b
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best.replace(" ", _BPE_JOIN)
        sample = [tx.replace(best, joined) for tx in sample]
    return merges


def q_bpe_encode(sf_dir: str) -> rd.Dataset:
    """Apply the trained BPE merge table to every document (the encode
    half of tokenizer training: merges learned once on the sample,
    rolled out corpus-wide). Per doc: base token count, encoded token
    count after the in-order merges, and how many merges fired.

    Engine shape: the merge list (8 strings) closes over a pure
    vectorized map — one Arrow ``replace_substring`` per merge rule per
    batch, one ``split_pattern`` length per side; no shuffle at any
    scale. String-level replace is leftmost-nonoverlapping on BOTH
    sides (Arrow and DuckDB ``replace``), so the oracle mirrors the
    application exactly; the merge table itself is re-derived by the
    oracle generator from the same pinned sample."""
    merges = _bpe_train_merges(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_base = pc.cast(pc.list_value_length(
            pc.split_pattern(text, " ")), pa.int64())
        enc = text
        for m in merges:
            enc = pc.replace_substring(
                enc, pattern=m, replacement=m.replace(" ", _BPE_JOIN))
        n_enc = pc.cast(pc.list_value_length(
            pc.split_pattern(enc, " ")), pa.int64())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_base": n_base,
            "n_enc": n_enc,
            "n_merged": pc.subtract(n_base, n_enc)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def bpe_encode_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Generated: re-derive the merge table from the pinned sample and
    mirror the in-order application as nested ``replace()`` calls."""
    def esc(s: str) -> str:
        return s.replace("'", "''")

    enc = "text"
    for m in _bpe_train_merges(sf_dir):
        enc = (f"replace({enc}, '{esc(m)}', "
               f"'{esc(m.replace(' ', _BPE_JOIN))}')")
    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_base,
       CAST(len(string_split({enc}, ' ')) AS BIGINT) AS n_enc,
       CAST(len(string_split(text, ' '))
            - len(string_split({enc}, ' ')) AS BIGINT) AS n_merged
FROM read_parquet('{sf_dir}/documents.parquet')
"""


ORACLE_SQL["bpe_pairs"] = f"""
WITH d AS (SELECT string_split(text, ' ') AS l FROM documents),
p AS (SELECT l[i] || ' ' || l[i + 1] AS pair
      FROM d, UNNEST(range(1, len(l))) AS t(i))
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT {_BPE_PAIRS_K}
"""

ORACLE_SQL["quality_classifier"] = _clf_sql()

ORACLE_SQL["repetition_scores"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g2 AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
a2 AS (
  SELECT doc_id, count(*) AS n2, count(DISTINCT gram) AS d2
  FROM g2 GROUP BY doc_id),
t2 AS (
  SELECT doc_id, max(c) AS top2 FROM (
    SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram)
  GROUP BY doc_id),
g3 AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
a3 AS (
  SELECT doc_id, count(*) AS n3, count(DISTINCT gram) AS d3
  FROM g3 GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(n2, 0) AS n2, COALESCE(d2, 0) AS d2,
       COALESCE(top2, 0) AS top2,
       COALESCE(n3, 0) AS n3, COALESCE(d3, 0) AS d3,
       CAST(CASE WHEN COALESCE(n2, 0) = 0 THEN 1
                 WHEN (n2 - d2) * 5 <= n2 AND top2 * 5 <= n2 THEN 1
                 ELSE 0 END AS BIGINT) AS keep_flag
FROM documents d
LEFT JOIN a2 USING (doc_id)
LEFT JOIN t2 USING (doc_id)
LEFT JOIN a3 USING (doc_id)
"""

ORACLE_SQL["bpe_encode"] = bpe_encode_oracle_sql()

QUERIES = {
    "bpe_pairs": q_bpe_pairs,
    "bpe_encode": q_bpe_encode,
    "repetition_scores": q_repetition_scores,
    "quality_classifier": q_quality_classifier,
    "token_count": q_token_count,
    "regex_tokens": q_regex_tokens,
    "doc_stats": q_doc_stats,
    "quality_filter": q_quality_filter,
    "gopher_rules": q_gopher_rules,
    "lang_id": q_lang_id,
    "lang_confusion": q_lang_confusion,
    "fingerprint": q_fingerprint,
    "pii_scrub": q_pii_scrub,
    "stopword_strip": q_stopword_strip,
    "truncate_tokens": q_truncate_tokens,
    "text_normalize": q_text_normalize,
}


# ---------------------------------------------------------------------------
# curation verdict — every per-doc quality gate fused into ONE pass
# ---------------------------------------------------------------------------

LM_NLL_MAX = 3.45  # fluency gate on the bigram-LM mean nll — sits inside
                   # the corpus nll distribution (sf0.01: mean 3.40,
                   # p75 3.42) so the gate actually discriminates


def q_curation_verdict(sf_dir: str) -> rd.Dataset:
    """The per-doc curation verdict — every heuristic gate this engine
    implements (C4-style stopword/length, Gopher §A1.1 token stats,
    within-doc repetition, bigram-LM fluency) evaluated together with
    the final keep decision and per-gate reason flags. This is the
    table a curation run actually materializes: one row per doc, one
    column per gate, ``keep`` = AND of all four.

    Scale shape: the LM is trained once (``stats._lm_model`` — bounded
    stages, dense counts broadcast via ray.put), then ONE fused
    map_batches computes all four gates per batch from a single
    tokenize — where the standalone queries would be four passes plus
    three hash joins, the fused verdict touches each doc once and
    shuffles nothing."""
    import numpy as np

    from .common import flat_tokens, round_half_away
    from .stats import _lm_model

    vocab_arr, c1_ref, c2_ref, width = _lm_model(sf_dir)
    unk = width - 1
    stop_arr = pa.array(sorted(_STOPWORDS), pa.string())
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import ray

        n = t.num_rows
        text = t.column("text")
        flat, lens, doc = flat_tokens(t)
        nt = lens.astype(np.float64)
        nc = np.asarray(pc.cast(pc.utf8_length(text), pa.float64()))
        # C4-style quality gate (quality_filter semantics)
        isstop = pc.is_in(flat, value_set=stop_arr).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(doc[isstop], minlength=n)
        q_keep = (lens >= 20) & (n_stop / nt < 0.5)
        # Gopher gates (gopher_rules semantics)
        mean_len = (nc - (nt - 1.0)) / nt
        isnum = pc.match_substring_regex(flat, r"^[0-9]+$").to_numpy(
            zero_copy_only=False)
        n_num = np.bincount(doc[isnum], minlength=n)
        codes = pc.dictionary_encode(flat).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        cw = (codes.max() + 1) if len(codes) else 1
        n_dis = np.bincount(np.unique(doc * cw + codes) // cw, minlength=n)
        g_keep = ((lens >= _GOPHER_MIN_TOK) & (lens <= _GOPHER_MAX_TOK)
                  & (mean_len >= _GOPHER_MIN_LEN)
                  & (mean_len <= _GOPHER_MAX_LEN)
                  & (n_num / nt < _GOPHER_MAX_NUM)
                  & ((nt - n_dis) / nt < _GOPHER_MAX_DUP))
        # repetition gate (repetition_scores keep semantics, 2-grams)
        m2 = len(flat) - 1
        if m2 > 0:
            g2 = pc.binary_join_element_wise(flat.slice(0, m2),
                                             flat.slice(1, m2), " ")
            mask2 = doc[:m2] == doc[1:]
            g2 = g2.filter(pa.array(mask2))
            d2p = doc[:m2][mask2]
            n2 = np.bincount(d2p, minlength=n)
            gc = pc.dictionary_encode(g2).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            gw = (gc.max() + 1) if len(gc) else 1
            uniq, cnts = np.unique(d2p * gw + gc, return_counts=True)
            d2 = np.bincount(uniq // gw, minlength=n)
            top2 = np.zeros(n, dtype=np.int64)
            np.maximum.at(top2, uniq // gw, cnts)
        else:
            n2 = d2 = top2 = np.zeros(n, dtype=np.int64)
        r_keep = (n2 == 0) | (((n2 - d2) * 5 <= n2) & (top2 * 5 <= n2))
        # bigram-LM fluency gate (lm_score semantics)
        ids = pc.fill_null(pc.index_in(flat, value_set=vocab_arr), unk)
        ids = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        uni, mat = ray.get(c1_ref), ray.get(c2_ref)
        if len(ids) >= 2:
            maskb = doc[:-1] == doc[1:]
            db = doc[:-1][maskb]
            w1 = ids[:-1][maskb]
            fused = w1 * width + ids[1:][maskb]
            nllv = -np.log((mat[fused] + 1.0) / (uni[w1] + width + 0.0))
            sums = np.bincount(db, weights=nllv, minlength=n)
            counts = np.bincount(db, minlength=n)
        else:
            sums = np.zeros(n)
            counts = np.zeros(n, dtype=np.int64)
        nll = round_half_away(
            np.where(counts > 0, sums / np.maximum(counts, 1), 0.0), 6)
        lm_keep = (counts == 0) | (nll <= LM_NLL_MAX)
        keep = q_keep & g_keep & r_keep & lm_keep
        return pa.table({
            "doc_id": t.column("doc_id"),
            "quality_keep": pa.array(q_keep.astype(np.int64)),
            "gopher_keep": pa.array(g_keep.astype(np.int64)),
            "rep_keep": pa.array(r_keep.astype(np.int64)),
            "lm_keep": pa.array(lm_keep.astype(np.int64)),
            "nll": pa.array(nll, pa.float64()),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _curation_verdict_sql() -> str:
    from .stats import ORACLE_SQL as STATS_SQL

    lm = STATS_SQL["lm_score"]
    stop_list = ",".join(f"'{s}'" for s in _STOPWORDS)
    return f"""
WITH lm AS ({lm}),
base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS nt,
         length(text) AS nc,
         len(list_filter(string_split(text, ' '),
             x -> x IN ({stop_list}))) AS nstop,
         len(list_filter(string_split(text, ' '),
             x -> regexp_matches(x, '^[0-9]+$'))) AS nnum,
         len(list_distinct(string_split(text, ' '))) AS ndis,
         string_split(text, ' ') AS t
  FROM documents),
g2 AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
  FROM base, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
a2 AS (
  SELECT doc_id, count(*) AS n2, count(DISTINCT gram) AS d2
  FROM g2 GROUP BY doc_id),
t2 AS (
  SELECT doc_id, max(c) AS top2 FROM (
    SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram)
  GROUP BY doc_id),
flags AS (
  SELECT b.doc_id,
    CAST(b.nt >= 20 AND CAST(b.nstop AS DOUBLE) / b.nt < 0.5
         AS BIGINT) AS quality_keep,
    CAST(b.nt >= {_GOPHER_MIN_TOK} AND b.nt <= {_GOPHER_MAX_TOK}
         AND (CAST(b.nc AS DOUBLE) - (CAST(b.nt AS DOUBLE) - 1.0))
             / b.nt >= {_GOPHER_MIN_LEN}
         AND (CAST(b.nc AS DOUBLE) - (CAST(b.nt AS DOUBLE) - 1.0))
             / b.nt <= {_GOPHER_MAX_LEN}
         AND CAST(b.nnum AS DOUBLE) / b.nt < {_GOPHER_MAX_NUM}
         AND (CAST(b.nt AS DOUBLE) - b.ndis) / b.nt < {_GOPHER_MAX_DUP}
         AS BIGINT) AS gopher_keep,
    CAST(COALESCE(a2.n2, 0) = 0
         OR ((a2.n2 - a2.d2) * 5 <= a2.n2 AND t2.top2 * 5 <= a2.n2)
         AS BIGINT) AS rep_keep,
    CAST(lm.n_bigrams = 0 OR lm.nll <= {LM_NLL_MAX} AS BIGINT)
        AS lm_keep,
    lm.nll AS nll
  FROM base b
  LEFT JOIN a2 USING (doc_id)
  LEFT JOIN t2 USING (doc_id)
  JOIN lm USING (doc_id))
SELECT doc_id, quality_keep, gopher_keep, rep_keep, lm_keep, nll,
       CAST(quality_keep * gopher_keep * rep_keep * lm_keep AS BIGINT)
           AS keep
FROM flags
"""


QUERIES["curation_verdict"] = q_curation_verdict
ORACLE_SQL["curation_verdict"] = _curation_verdict_sql()
