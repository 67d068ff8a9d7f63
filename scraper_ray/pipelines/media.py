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
        concurrency=2,
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: recompute payload -> features in SQL. The synthetic
# payload is sha256(text) bytes x8; its hex is repeat(sha256(text), 8),
# so the feature hash is sha256(repeat(sha256(text), 8)) and each f_j is
# the j-th little-endian u32 of that digest, mod 1000, / 1000.
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


ORACLE_SQL = {"media_features": _media_oracle_sql()}

QUERIES = {"media_features": q_media_features}
