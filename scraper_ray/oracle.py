"""Sequential reference-semantics oracle crawler (SURVEY.md §5.2).

A pure-Python, single-threaded crawler faithful to the reference's
sequential semantics (handlers/scrapers.py:110-150: entity by entity,
ascending pages with stop-on-empty, DOM item order; dedupe by canonical
key as in handlers/db.py:38-54), generalized to the deterministic
priority key ``(depth, path)`` where ``path`` is the discovery path —
seed index followed by the chain of child indices, each hop fixed-width
hex so lexicographic order equals numeric order:

- the frontier is a min-heap on that key;
- keys pushed while popping depth ``d`` all have depth ``d+1``, so the pop
  sequence is globally key-sorted — a linear extension of the reference's
  sequential order in which every entity's pages ascend and every page's
  items appear in DOM order;
- the URL-seen set admits a canonical URL exactly once, at first
  discovery (= minimal discovery path, because parents pop in path
  order); robots-disallowed URLs are never admitted.

The Ray engine must reproduce (a) this final seen set exactly, (b) this
order when its output is sorted by the same key — and chronologically per
domain, and (c) per-row span sequences (the BASELINE.json invariant).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from .canonicalize import (
    canonicalize_url,
    doc_id_for,
    encode_hop,
    registered_domain,
)
from .synthweb import PolitenessConfig, WebConfig, fetch_with_retry


@dataclass
class OracleResult:
    docs: list[dict] = field(default_factory=list)   # DOC_SCHEMA-shaped dicts
    seen: set[str] = field(default_factory=set)      # canonical URLs admitted
    n_invalid: int = 0
    n_robots_blocked: int = 0
    n_duplicates: int = 0


def _admit(
    raw_url: str,
    depth: int,
    parent_id: str,
    child_idx: int,
    parent_path: str,
    res: OracleResult,
    politeness: PolitenessConfig | None,
    heap: list,
) -> None:
    cu = canonicalize_url(raw_url)
    if cu is None:
        res.n_invalid += 1
        return
    if politeness is not None:
        parts = urlsplit(cu)
        if not politeness.allowed(registered_domain(parts.hostname or ""), parts.path):
            res.n_robots_blocked += 1
            return
    if cu in res.seen:
        res.n_duplicates += 1
        return
    res.seen.add(cu)
    path = parent_path + encode_hop(child_idx)
    heapq.heappush(heap, (depth, path, cu, parent_id, child_idx))


def crawl_oracle(
    seeds: list[str],
    cfg: WebConfig,
    politeness: PolitenessConfig | None = None,
    max_docs: int | None = None,
    pre_seen: set[str] | None = None,
) -> OracleResult:
    """Crawl the synthetic web sequentially; ground truth for conformance.

    ``pre_seen`` (canonical URLs) seeds the seen set before admission —
    the sequential ground truth for the engine's incremental crawl
    (``crawl(..., skip_urls=...)``): pre-seen URLs are never fetched,
    and everything else reachable through the fetched pages is."""
    res = OracleResult()
    if pre_seen:
        res.seen.update(pre_seen)
    heap: list = []
    for seed_idx, raw in enumerate(seeds):
        _admit(raw, 0, "", seed_idx, "", res, politeness, heap)

    while heap:
        depth, path, url, parent_id, child_idx = heapq.heappop(heap)
        page, attempts = fetch_with_retry(url, cfg)
        did = doc_id_for(url)
        host = urlsplit(url).hostname or ""
        res.docs.append(
            {
                "doc_id": did,
                "url": url,
                "entity": page.entity if page else "",
                "page_type": page.page_type if page else "error",
                "domain_key": registered_domain(host),
                "depth": depth,
                "parent_id": parent_id,
                "child_idx": child_idx,
                "path": path,
                "wave": -1,
                "n_attempts": attempts,
                "spans": [
                    {"kind": s.kind, "text": s.text,
                     "media_ref": s.media_ref, "offset": s.offset}
                    for s in page.spans
                ] if page else [],
            }
        )
        if max_docs is not None and len(res.docs) >= max_docs:
            break
        for idx, child in enumerate(page.child_urls if page else ()):
            _admit(child, depth + 1, did, idx, path, res, politeness, heap)
    return res
