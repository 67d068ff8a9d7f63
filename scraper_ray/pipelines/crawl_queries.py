"""Crawl pipeline exposed as driver queries (rows-only checks).

The crawl's real correctness gate is the oracle-conformance pytest suite
(tests/test_crawl_conformance.py — seen-set, ordering, span equality);
these entries additionally surface the engine through the driver's
``queries()`` interface as deterministic row streams. ``sf_dir`` picks
the crawl size tier so bigger scale factors exercise bigger webs.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import ray.data as rd

from ..crawl import CrawlConfig, crawl, read_docs
from ..synthweb import WebConfig, default_politeness, gen_seeds

_SIZES = {  # sf tier -> (entities, seeds)
    "sf0.001": (6, 40),
    "sf0.01": (12, 120),
    "sf0.1": (24, 400),
}


def _cfg_for(sf_dir: str) -> tuple[WebConfig, int]:
    tier = os.path.basename(os.path.normpath(sf_dir))
    ents, seeds = _SIZES.get(tier, (8, 60))
    return (
        WebConfig(seed=23, n_entities=ents, items_per_page=6, max_pages_cap=8,
                  dup_rate=0.15, alias_rate=0.2),
        seeds,
    )


_CRAWL_CACHE: dict[str, str] = {}


def _run_crawl(sf_dir: str) -> rd.Dataset:
    """Run (or reuse this process's) crawl for the sf tier."""
    tier = os.path.basename(os.path.normpath(sf_dir))
    if tier not in _CRAWL_CACHE:
        web, n_seeds = _cfg_for(sf_dir)
        pol = default_politeness(web, wave_units=48)
        out = tempfile.mkdtemp(prefix="crawl_docs_")
        ccfg = CrawlConfig(web=web, politeness=pol, out_dir=out, batch_size=1024)
        crawl(gen_seeds(web, n_seeds), ccfg)
        _CRAWL_CACHE[tier] = out
    return read_docs(_CRAWL_CACHE[tier])


def q_crawl_docs(sf_dir: str) -> rd.Dataset:
    """Full crawl; returns the doc table (deterministic given sf tier)."""
    return _run_crawl(sf_dir).drop_columns(["spans"])


def q_crawl_spans(sf_dir: str) -> rd.Dataset:
    """Crawl + span explosion: one row per (doc, span) — the interleaved
    text/media payload contract (input_hint) flattened."""
    docs = _run_crawl(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        ids, kinds, texts, refs, offs = [], [], [], [], []
        for did, spans in zip(t.column("doc_id").to_pylist(),
                              t.column("spans").to_pylist()):
            for s in spans:
                ids.append(did)
                kinds.append(s["kind"])
                texts.append(s["text"])
                refs.append(s["media_ref"])
                offs.append(s["offset"])
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "offset": pa.array(offs, pa.int32()),
        })

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_geocode_grid(sf_dir: str) -> "pa.Table":
    """Geocode converter sweep over a fixed in-China grid + out-of-China
    points (rows-only; golden values pinned by tests/test_geocode.py)."""
    import numpy as np

    from ..functions.geocode import (
        bd09_to_gcj02, gcj02_to_bd09, gcj02_to_wgs84, wgs84_to_gcj02,
    )

    lngs = np.linspace(74.0, 134.0, 13)
    lats = np.linspace(19.0, 53.0, 9)
    glng, glat = np.meshgrid(lngs, lats)
    lng = np.concatenate([glng.ravel(), [10.0, -74.0]])   # + out-of-china
    lat = np.concatenate([glat.ravel(), [50.0, 40.7]])
    g_lng, g_lat = wgs84_to_gcj02(lng, lat)
    b_lng, b_lat = gcj02_to_bd09(g_lng, g_lat)
    w_lng, w_lat = gcj02_to_wgs84(g_lng, g_lat)
    r_lng, r_lat = bd09_to_gcj02(b_lng, b_lat)
    return pa.table({
        "lng": lng, "lat": lat,
        "gcj_lng": np.round(g_lng, 6), "gcj_lat": np.round(g_lat, 6),
        "bd_lng": np.round(b_lng, 6), "bd_lat": np.round(b_lat, 6),
        "back_wgs_lng": np.round(w_lng, 6), "back_wgs_lat": np.round(w_lat, 6),
        "back_gcj_lng": np.round(r_lng, 6), "back_gcj_lat": np.round(r_lat, 6),
    })


QUERIES = {
    "crawl_docs": q_crawl_docs,
    "crawl_spans": q_crawl_spans,
    "geocode_grid": q_geocode_grid,
}
