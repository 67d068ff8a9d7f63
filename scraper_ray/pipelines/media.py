"""Multimodal (binary-column) pipeline plumbing — decode stubs.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract stages are actor-pool ``map_batches`` stages
whose Ray-side plumbing (schema, batch sizing, actor init, output
layout) is real and tested, while the actual codec call is stubbed —
the image/audio libraries are not in this container (see
``MediaDecoder.decode_real``). Mirrors the reference's OCR image path
(M18: grayscale/threshold preprocessing, baidu_api.py:149-154) as the
per-row binary transform pattern.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

def media_pool_size() -> tuple[int, int]:
    """Actor-pool bounds for the media stages, derived from the cluster
    like ``QualityClassifier``'s (text.py): elastic from 1 so a small
    tier doesn't hold idle actors, up to half the cluster's cores — a
    decode stage is CPU-bound; a real codec swaps in num_gpus/actor."""
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    return (1, max(4, cpus // 2))


MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),          # 'image' | 'audio'
        ("payload", pa.binary()),       # opaque encoded bytes
        ("n_bytes", pa.int64()),
    ]
)


def synth_media_table(sf_dir: str) -> rd.Dataset:
    """Deterministic fake media blobs derived from the documents table
    (each doc's text bytes stand in for an encoded payload)."""
    from .common import read_sf_table

    docs = read_sf_table(sf_dir, "documents", ["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        ids, kinds, payloads, sizes = [], [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            blob = hashlib.sha256(text.encode()).digest() * 8  # 256 bytes
            ids.append(f"m{did:08d}")
            kinds.append("image" if did % 2 == 0 else "audio")
            payloads.append(blob)
            sizes.append(len(blob))
        return pa.table({"media_id": pa.array(ids, pa.string()),
                         "kind": pa.array(kinds, pa.string()),
                         "payload": pa.array(payloads, pa.binary()),
                         "n_bytes": pa.array(sizes, pa.int64())},
                        schema=MEDIA_SCHEMA)

    return docs.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` is where a real deployment loads the codec / model once
    per actor (the reference's OCR client construction, T3,
    baidu_api.py:144-172). ``decode_real`` is the stubbed codec seam.
    """

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim
        # model/codec load would happen here, once per actor

    @staticmethod
    def decode_real(payload: bytes, kind: str):
        raise NotImplementedError(
            "image/audio codecs are not available in this container; "
            "plug PIL/torchaudio here in a real deployment"
        )

    def fake_features(self, payload: bytes) -> np.ndarray:
        """Deterministic stand-in features: bytes -> fixed-dim float64.

        Hashes the hex encoding (not the raw bytes) so the DuckDB oracle
        — whose sha256() only takes VARCHAR — can recompute the exact
        values; little-endian u32 words are made explicit for parity."""
        h = hashlib.sha256(payload.hex().encode()).digest()
        raw = np.frombuffer(h[: self.feature_dim * 4], dtype="<u4")
        return (raw % 1000).astype(np.float64) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([self.fake_features(p)
                          for p in batch.column("payload").to_pylist()])
        cols = {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_bytes": batch.column("n_bytes"),
        }
        # one scalar column per feature dim (f0..fN): list<float> columns
        # defeat value-level comparators; wide scalar columns also
        # vectorize better downstream
        for j in range(self.feature_dim):
            cols[f"f{j}"] = pa.array(feats[:, j], pa.float64())
        return pa.table(cols)


def q_media_features(sf_dir: str) -> rd.Dataset:
    """Full media plumbing: synth blobs -> actor-pool decode stub ->
    feature rows. Small batches (binary payloads) + bounded pool."""
    return synth_media_table(sf_dir).map_batches(
        MediaDecoder,
        fn_constructor_args=(8,),
        batch_format="pyarrow",
        batch_size=128,            # binary payloads: keep batches small
        concurrency=media_pool_size(),
        zero_copy_batch=True,
    )


class MediaResizer:
    """Actor-pool stage: image resize plumbing (thumbnailing).

    A real deployment decodes the payload and resizes in ``__call__``
    (PIL/libvips loaded once per actor in ``__init__`` — same honest
    codec seam as ``MediaDecoder.decode_real``). The stand-in reads the
    source dimensions from the payload header bytes (deterministic, so
    the DuckDB oracle recomputes them) and does the real thumbnail
    math: fit within ``max_side`` x ``max_side`` preserving aspect
    ratio, integer arithmetic only."""

    def __init__(self, max_side: int = 64):
        self.max_side = max_side
        # codec handle would load here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ms = self.max_side
        ids, sw, sh, dw, dh, nb = [], [], [], [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload").to_pylist()):
            hdr = np.frombuffer(p[:12], dtype="<u4")
            w = 1 + int(hdr[0]) % 1920
            h = 1 + int(hdr[1]) % 1080
            m = max(w, h)
            tw = max(1, w * ms // m)
            th = max(1, h * ms // m)
            ids.append(mid)
            sw.append(w); sh.append(h); dw.append(tw); dh.append(th)
            nb.append(tw * th * 3)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "src_w": pa.array(sw, pa.int64()),
            "src_h": pa.array(sh, pa.int64()),
            "dst_w": pa.array(dw, pa.int64()),
            "dst_h": pa.array(dh, pa.int64()),
            "thumb_bytes": pa.array(nb, pa.int64()),
        })


def q_media_resize(sf_dir: str) -> rd.Dataset:
    """Thumbnail pass over the image rows: actor-pool resize stage,
    small binary batches. Kind filter at the source (only images move
    through the pool)."""
    import pyarrow.compute as pc

    media = synth_media_table(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow")
    return media.map_batches(
        MediaResizer,
        fn_constructor_args=(64,),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=media_pool_size(),
        zero_copy_batch=True,
    )


_FRAME_CAP = 8      # sampled frames per stream
_FRAME_MS = 40      # 25 fps frame interval


def q_frame_sample(sf_dir: str) -> rd.Dataset:
    """Frame sampling plumbing over the a/v rows (the audio-kind blobs
    stand in for av streams): the stream's frame count comes from the
    payload header (deterministic), and every ceil(n/8)-th frame is
    emitted as its own row — a pure flat-map (one input row -> <= 8
    frame rows), the shape a video-frame extraction stage has at any
    scale. A real deployment decodes the container and grabs the frame
    bytes here; the stub emits the frame index + timestamp plumbing."""

    def sample(t: pa.Table) -> pa.Table:
        ids, nf, fi, ts = [], [], [], []
        for mid, kind, p in zip(t.column("media_id").to_pylist(),
                                t.column("kind").to_pylist(),
                                t.column("payload").to_pylist()):
            if kind != "audio":
                continue
            hdr = np.frombuffer(p[:12], dtype="<u4")
            n_frames = 1 + int(hdr[2]) % 240
            stride = -(-n_frames // _FRAME_CAP)
            for idx in range(0, n_frames, stride):
                ids.append(mid)
                nf.append(n_frames)
                fi.append(idx)
                ts.append(idx * _FRAME_MS)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_frames": pa.array(nf, pa.int64()),
            "frame_idx": pa.array(fi, pa.int64()),
            "ts_ms": pa.array(ts, pa.int64()),
        })

    return synth_media_table(sf_dir).map_batches(
        sample, batch_format="pyarrow", batch_size=128, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# DuckDB oracle: recompute payload -> features in SQL. The synthetic
# payload is sha256(text) bytes x8; its hex is repeat(sha256(text), 8),
# so the feature hash is sha256(repeat(sha256(text), 8)) and each f_j is
# the j-th little-endian u32 of that digest, mod 1000, / 1000. The
# resize / frame-sample headers are the first u32 words of the payload
# itself — i.e. of sha256(text).
# ---------------------------------------------------------------------------

def _media_oracle_sql() -> str:
    digit = "(instr('0123456789abcdef', substr(h, {p}, 1)) - 1)"

    def byte(k: int) -> str:   # k-th byte (0-based) of the hex digest
        return f"({digit.format(p=2 * k + 1)} * 16 + {digit.format(p=2 * k + 2)})"

    feats = []
    for j in range(8):
        word = " + ".join(f"{byte(4 * j + m)} * {1 << (8 * m)}" for m in range(4))
        feats.append(
            f"CAST(CAST({word} AS BIGINT) % 1000 AS DOUBLE) / 1000.0 AS f{j}")
    cols = ",\n       ".join(feats)
    return f"""
WITH b AS (
  SELECT 'm' || printf('%08d', doc_id) AS media_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         CAST(256 AS BIGINT) AS n_bytes,
         sha256(repeat(sha256(text), 8)) AS h
  FROM documents)
SELECT media_id, kind, n_bytes,
       {cols}
FROM b
"""


def _hdr_word_sql(j: int) -> str:
    """Little-endian u32 word *j* of the hex digest aliased ``h``."""
    digit = "(instr('0123456789abcdef', substr(h, {p}, 1)) - 1)"

    def byte(k: int) -> str:
        return f"({digit.format(p=2 * k + 1)} * 16 + {digit.format(p=2 * k + 2)})"

    return " + ".join(f"{byte(4 * j + m)} * {1 << (8 * m)}" for m in range(4))


def _media_resize_oracle_sql() -> str:
    return f"""
WITH b AS (SELECT 'm' || printf('%08d', doc_id) AS media_id, sha256(text) AS h
           FROM documents WHERE doc_id % 2 = 0),
d AS (SELECT media_id,
             1 + CAST({_hdr_word_sql(0)} AS BIGINT) % 1920 AS src_w,
             1 + CAST({_hdr_word_sql(1)} AS BIGINT) % 1080 AS src_h
      FROM b)
SELECT media_id, src_w, src_h,
       greatest(1, src_w * 64 // greatest(src_w, src_h)) AS dst_w,
       greatest(1, src_h * 64 // greatest(src_w, src_h)) AS dst_h,
       greatest(1, src_w * 64 // greatest(src_w, src_h))
         * greatest(1, src_h * 64 // greatest(src_w, src_h)) * 3 AS thumb_bytes
FROM d
"""


def _frame_sample_oracle_sql() -> str:
    return f"""
WITH b AS (SELECT 'm' || printf('%08d', doc_id) AS media_id, sha256(text) AS h
           FROM documents WHERE doc_id % 2 = 1),
d AS (SELECT media_id,
             1 + CAST({_hdr_word_sql(2)} AS BIGINT) % 240 AS n_frames
      FROM b),
s AS (SELECT media_id, n_frames, (n_frames + {_FRAME_CAP - 1}) // {_FRAME_CAP}
          AS stride FROM d)
SELECT media_id, n_frames, frame_idx,
       CAST(frame_idx * {_FRAME_MS} AS BIGINT) AS ts_ms
FROM (SELECT media_id, n_frames,
             CAST(unnest(range(0, n_frames, stride)) AS BIGINT) AS frame_idx
      FROM s)
"""


ALIGN_BUCKETS = 64
ALIGN_THRESHOLD = 550   # of the 0..1100 int score range


class MediaTextAligner:
    """CLIP-shaped image-text alignment scorer — the actor-pool model
    pattern (T3) over the INTERLEAVED payload: each media span is scored
    against its caption context (the nearest preceding text span in the
    same doc). The 'model' here is a deterministic int64 hash-logit
    plus a bucket-weight table built once per actor in ``__init__``
    (exactly the QualityClassifier discipline, text.py) so the DuckDB
    oracle can recompute every score; a real CLIP swaps in model load
    here and a batched image/text matmul in ``__call__``."""

    def __init__(self, n_buckets: int = ALIGN_BUCKETS):
        # "model load": the weight table is built once per actor
        self.n = n_buckets
        self.w = [(j * 17) % 101 for j in range(n_buckets)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        ctxs = batch.column("ctx").to_pylist()
        hs = [int.from_bytes(
            hashlib.md5((r + "|" + c).encode()).digest()[:8], "big")
            for r, c in zip(refs, ctxs)]
        score = np.array([(h % 1000) + self.w[(h // 1024) % self.n]
                          for h in hs], np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "offset": batch.column("offset"),
            "score": pa.array(score),
            "aligned": pa.array((score >= ALIGN_THRESHOLD)
                                .astype(np.int64)),
        })


def q_media_alignment(sf_dir: str) -> rd.Dataset:
    """Image-text alignment over the crawl's interleaved spans: media
    spans paired with their caption context and scored by the
    actor-pool aligner. Scale shape: one pure vectorized map derives
    (media span, context) rows — the per-doc 'last text before each
    media offset' is a segmented maximum.accumulate, no Python span
    loop — then the aligner pool scores batches; no shuffle anywhere
    (a doc's spans arrive together by construction)."""
    import pyarrow.compute as pc

    from .common import flat_spans
    from .crawl_queries import _run_crawl

    docs = _run_crawl(sf_dir).select_columns(["doc_id", "spans"])

    def ctx_rows(t: pa.Table) -> pa.Table:
        flat, parents = flat_spans(t)
        par = parents.to_numpy(zero_copy_only=False)
        n = t.num_rows
        is_tx = pc.equal(pc.struct_field(flat, "kind"), "text").to_numpy(
            zero_copy_only=False)
        pos = np.arange(len(par))
        # last text position at or before each flat position, globally;
        # per-doc validity = that position not before the doc's first
        # span (docs are contiguous runs in flatten order)
        last_tx = (np.maximum.accumulate(np.where(is_tx, pos, -1))
                   if len(par) else np.array([], dtype=np.int64))
        counts = np.bincount(par, minlength=n)
        doc_start = np.concatenate(([0], np.cumsum(counts)))[:-1]
        ok = last_tx >= doc_start[par] if len(par) else last_tx
        texts = pc.struct_field(flat, "text").to_numpy(
            zero_copy_only=False)
        ctx = np.where(ok, texts[np.maximum(last_tx, 0)], "")
        is_md = ~is_tx
        return pa.table({
            "doc_id": pc.take(t.column("doc_id"), pa.array(par[is_md])),
            "media_ref": pc.struct_field(flat, "media_ref").filter(
                pa.array(is_md)),
            "offset": pc.struct_field(flat, "offset").filter(
                pa.array(is_md)),
            "ctx": pa.array(ctx[is_md], pa.string()),
        })

    pool = media_pool_size()
    return (docs.map_batches(ctx_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(MediaTextAligner, batch_format="pyarrow",
                         batch_size=4096, concurrency=pool,
                         zero_copy_batch=True))


def _media_alignment_oracle_sql() -> str:
    from .common import sql_hex64
    from .crawl_queries import ORACLE_SPANS_PATH

    h = sql_hex64("media_ref || '|' || ctx")
    score = f"(hh % 1000) + ((hh // 1024) % {ALIGN_BUCKETS}) * 17 % 101"
    return f"""
WITH spans AS (SELECT * FROM read_parquet('{ORACLE_SPANS_PATH}')),
m AS (SELECT doc_id, media_ref, "offset" FROM spans WHERE kind = 'media'),
c AS (
  SELECT m.doc_id, m.media_ref, m."offset",
         coalesce((SELECT t.text FROM spans t
                   WHERE t.doc_id = m.doc_id AND t.kind = 'text'
                     AND t."offset" < m."offset"
                   ORDER BY t."offset" DESC LIMIT 1), '') AS ctx
  FROM m),
h AS (SELECT *, {h} AS hh FROM c)
SELECT doc_id, media_ref, "offset",
       CAST({score} AS BIGINT) AS score,
       CAST(CASE WHEN {score} >= {ALIGN_THRESHOLD} THEN 1 ELSE 0 END
            AS BIGINT) AS aligned
FROM h
"""


ORACLE_SQL = {"media_features": _media_oracle_sql(),
              "media_resize": _media_resize_oracle_sql(),
              "frame_sample": _frame_sample_oracle_sql(),
              "media_alignment": _media_alignment_oracle_sql()}

QUERIES = {"media_features": q_media_features,
           "media_resize": q_media_resize,
           "frame_sample": q_frame_sample,
           "media_alignment": q_media_alignment}
