"""Fetch + parse + discover stages (map_batches over Arrow batches).

``FetchParse`` is the map_batches stage at the heart of the engine
(north rule: "fetch/parse via map_batches over zero-copy Arrow"). It is a
callable class usable two ways:

- as a pickled *instance* -> Ray task pool (default here: the synthetic
  fetcher is a pure function, so tasks avoid actor-pool spin-up per wave);
- as the *class* with ``concurrency=N`` -> actor pool, the right shape
  for a real HTTP fetcher whose per-worker state (session + cookies with
  renew-on-failure — reference: handlers/scrapers.py:26-69) is built once
  in ``__init__``.

``DiscoverOffer`` is fused after fetch in the same wave pipeline: it
canonicalizes + robots-filters the children, drops already-seen URLs
(batched RPC to the seen shards — safe mid-wave because the scheduler
marks emissions in the seen set before the wave starts), offers the rest
to the scheduler shards with the batch's run counters piggybacked on the
offer RPC (zero extra round-trips on the hot path), and passes the doc
rows through unchanged — so one streaming execution per wave goes
frontier -> fetch -> discover/offer -> parquet.
"""

from __future__ import annotations

import pyarrow as pa

from ..canonicalize import doc_id_for, frontier_table
from ..schema import DOC_SCHEMA
from ..state.scheduler import robots_filter
from ..synthweb import PolitenessConfig, WebConfig, fetch_with_retry

FETCH_OUT_SCHEMA = DOC_SCHEMA.append(pa.field("children", pa.list_(pa.string())))


class FetchParse:
    """Frontier wave rows -> doc rows + raw child links (DOM order)."""

    def __init__(self, web_cfg: WebConfig):
        self.cfg = web_cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in FETCH_OUT_SCHEMA.names}
        urls = batch.column("url").to_pylist()
        depths = batch.column("depth").to_pylist()
        parents = batch.column("parent_id").to_pylist()
        cidxs = batch.column("child_idx").to_pylist()
        paths = batch.column("path").to_pylist()
        domains = batch.column("domain_key").to_pylist()
        waves = (
            batch.column("wave").to_pylist()
            if "wave" in batch.column_names
            else [-1] * len(urls)
        )
        for url, depth, pid, ci, path, dom, wave in zip(
            urls, depths, parents, cidxs, paths, domains, waves
        ):
            # bounded retry; permanent failures become dead-letter 'error'
            # docs instead of silent drops (reference: scrapers.py:50-52)
            page, attempts = fetch_with_retry(url, self.cfg)
            cols["doc_id"].append(doc_id_for(url))
            cols["url"].append(url)
            cols["entity"].append(page.entity if page else "")
            cols["page_type"].append(page.page_type if page else "error")
            cols["domain_key"].append(dom)
            cols["depth"].append(depth)
            cols["parent_id"].append(pid)
            cols["child_idx"].append(ci)
            cols["path"].append(path)
            cols["wave"].append(wave)
            cols["n_attempts"].append(attempts)
            cols["spans"].append(
                [
                    {"kind": s.kind, "text": s.text,
                     "media_ref": s.media_ref, "offset": s.offset}
                    for s in page.spans
                ] if page else []
            )
            cols["children"].append(list(page.child_urls) if page else [])
        return pa.table(
            {n: pa.array(cols[n], type=FETCH_OUT_SCHEMA.field(n).type)
             for n in FETCH_OUT_SCHEMA.names}
        )


class DiscoverOffer:
    """Fused discover stage: offer children, pass doc rows through."""

    def __init__(self, politeness: PolitenessConfig, seen, sched):
        self.politeness = politeness
        self.seen = seen       # ShardedSeen
        self.sched = sched     # SchedulerPool

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # vectorized child explosion: list_flatten + parent-indices take
        # instead of a per-page Python loop (this runs once per fetched
        # page across the whole crawl)
        ch = batch.column("children")
        par = pc.list_parent_indices(ch)   # skips null/empty lists
        urls = pc.list_flatten(ch).to_pylist()
        par_np = par.to_numpy(zero_copy_only=False)
        depths = (pc.take(batch.column("depth"), par).to_numpy(
            zero_copy_only=False) + 1).tolist()
        parents = pc.take(batch.column("doc_id"), par).to_pylist()
        ppaths = pc.take(batch.column("path"), par).to_pylist()
        # index within each parent's list: par_np is sorted, so position
        # minus the first position of that parent run
        idxs = (np.arange(len(par_np))
                - np.searchsorted(par_np, par_np, side="left")).tolist()

        n_children = len(urls)
        # canonicalize + within-batch keep-min dedup (invalid URLs dropped)
        front = frontier_table(urls, depths, parents, idxs, ppaths)
        n_invalid_or_alias = n_children - front.num_rows
        front, n_blocked = robots_filter(front, self.politeness)
        n_seen_dropped = 0
        if front.num_rows:
            fresh = ~self.seen.contains(front.column("url_sha1").to_pylist())
            n_seen_dropped = int((~fresh).sum())
            front = front.filter(pa.array(fresh))
        counters = {
            "n_children": n_children,
            "n_invalid_or_alias": n_invalid_or_alias,
            "n_robots_blocked": n_blocked,
            "n_seen_dropped": n_seen_dropped,
        }
        if front.num_rows or any(counters.values()):
            self.sched.offer(front, counters)
        return batch.drop_columns(["children"])
