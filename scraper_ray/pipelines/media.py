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
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

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
        """Deterministic stand-in features: bytes -> fixed-dim float32."""
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(h[: self.feature_dim * 4], dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.fake_features(p)
                 for p in batch.column("payload").to_pylist()]
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_bytes": batch.column("n_bytes"),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


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


QUERIES = {"media_features": q_media_features}
