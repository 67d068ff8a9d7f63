"""Sitemap ingestion: seed discovery from robots.txt Sitemap lines.

The reference seeds its crawl from a DB log table
(jobs/job_diandianzu.py:21-24); a web-scale engine also discovers seeds
from the sitemaps the sites themselves publish (sitemaps.org protocol):

    domains ─map_batches(DiscoverSitemaps)─▶ (domain, url) seed rows
       │  per domain: fetch robots.txt → Sitemap: lines →
       │  fetch each sitemap; a <sitemapindex> fans out one more level
       │  (depth-capped) to its child <urlset> maps; collect <loc> urls

One stage, parallel across domains — each domain's sitemap tree is a
handful of tiny documents, so the per-domain work is bounded and the
scale axis is the domain count (same shape as stages/robots.py). The
output table feeds the crawl as a seed list (canonicalize → dedupe →
schedule exactly like any other seed source).

XML is parsed with a real parser (xml.etree, namespace-agnostic tag
matching); the DuckDB oracle re-extracts ``<loc>`` values with regexes
over the same documents — two independent implementations of the
protocol (sitemap_seeds query).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterable

import pyarrow as pa

from ..functions.robots import DEFAULT_AGENT, parse_robots

#: sitemapindex -> urlset is the protocol's one nesting level; the cap
#: guards against malformed self-referencing indexes
SITEMAP_DEPTH_CAP = 2


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(xml_text: str) -> tuple[str, list[str]]:
    """-> ('sitemapindex' | 'urlset', [loc, ...]) in document order.
    Malformed XML yields ('invalid', []) — counted by callers, never
    raised mid-pipeline."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return "invalid", []
    kind = _localname(root.tag)
    if kind not in ("sitemapindex", "urlset"):
        return "invalid", []
    locs = [el.text.strip()
            for el in root.iter()
            if _localname(el.tag) == "loc" and el.text and el.text.strip()]
    return kind, locs


class DiscoverSitemaps:
    """map_batches stage: domain rows -> discovered (domain, url) seeds.

    *transport* maps any metadata URL (robots.txt / sitemap XML) to its
    text, or None for 404 — synthweb.serve_meta in-sandbox."""

    def __init__(self, transport: Callable[[str], str | None],
                 agent: str = DEFAULT_AGENT):
        self.transport = transport
        self.agent = agent

    def __call__(self, batch: pa.Table) -> pa.Table:
        doms_out: list[str] = []
        urls_out: list[str] = []
        for domain in batch.column("domain").to_pylist():
            robots = self.transport(f"http://www.{domain}/robots.txt")
            if not robots:
                continue
            queue = list(parse_robots(robots, self.agent).sitemaps)
            found: set[str] = set()
            depth = 0
            while queue and depth < SITEMAP_DEPTH_CAP:
                depth += 1
                nxt: list[str] = []
                for sm_url in queue:
                    text = self.transport(sm_url)
                    if not text:
                        continue
                    kind, locs = parse_sitemap(text)
                    if kind == "urlset":
                        found.update(locs)
                    elif kind == "sitemapindex":
                        nxt.extend(locs)
                queue = nxt
            for u in sorted(found):
                doms_out.append(domain)
                urls_out.append(u)
        return pa.table({"domain": pa.array(doms_out, pa.string()),
                         "url": pa.array(urls_out, pa.string())})


def discover_sitemap_seeds(domains: Iterable[str],
                           transport: Callable[[str], str | None],
                           agent: str = DEFAULT_AGENT,
                           batch_size: int = 256):
    """Distributed seed discovery -> Dataset(domain, url), distinct per
    domain. Feed the ``url`` column straight into ``crawl()`` seeds."""
    import ray.data as rd

    ds = rd.from_items([{"domain": d} for d in domains])
    return ds.map_batches(DiscoverSitemaps(transport, agent),
                          batch_format="pyarrow", batch_size=batch_size)
