"""Robots discovery stage: fetch + parse /robots.txt per registered domain.

The reference has no robots handling; the north rule's scheduler is
"politeness-aware (robots.txt + crawl-delay)". This stage produces the
``PolitenessConfig`` the scheduler shards and the admission-path
``robots_filter`` enforce, from actual robots.txt bytes instead of a
hand-written config:

    domains ──map_batches(FetchRobots)──▶ (domain, disallow, allow,
                                           crawl_delay, n_wildcard)
            ──politeness_from_rules──▶ PolitenessConfig

The fetch is one tiny request per **registered domain** — a vanishing
fraction of crawl traffic (a domain with one page still costs one robots
fetch; a domain with 10^6 pages also costs one). The transport is
injectable exactly like the page fetcher seam (stages/fetch.py): the
synthetic web serves deterministic texts (synthweb.robots_text_for); a
real deployment passes a RequestsFetcher-backed callable.

Scale notes (10^8 domains): the rules table is a normal Dataset — write
it as hash-partitioned parquet and give each SchedulerShard its slice at
init instead of collecting to a driver dict; ``politeness_from_rules``'s
``take_all`` is the sandbox-size shortcut and asserts a bound so the
driver-materialization never silently grows past gate tiers. Wildcard
rules (``*``/``$``) are counted per domain (``n_wildcard``) because the
vectorized prefix filter cannot enforce them — a deployment either
drops them loudly (here) or routes those domains through a slow-path
regex filter.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pyarrow as pa

from ..functions.robots import DEFAULT_AGENT, parse_robots
from ..synthweb import PolitenessConfig, WebConfig, robots_text_for

ROBOTS_SCHEMA = pa.schema([
    ("domain", pa.string()),
    ("disallow", pa.list_(pa.string())),
    ("allow", pa.list_(pa.string())),
    ("crawl_delay", pa.float64()),
    ("n_wildcard", pa.int32()),
])

#: driver-side collect bound for politeness_from_rules (sandbox tiers);
#: past this, keep the rules distributed (module docstring scale notes)
RULES_COLLECT_CAP = 200_000


class FetchRobots:
    """map_batches stage: domain rows -> parsed robots-rule rows.

    *transport* maps a registered domain to robots.txt text (or None
    for unreachable/absent — treated as allow-all per RFC 9309 §2.3.1.4
    with no crawl-delay)."""

    def __init__(self, transport: Callable[[str], str | None],
                 agent: str = DEFAULT_AGENT):
        self.transport = transport
        self.agent = agent

    def __call__(self, batch: pa.Table) -> pa.Table:
        doms = batch.column("domain").to_pylist()
        dis, allow, delay, n_wild = [], [], [], []
        for d in doms:
            text = self.transport(d)
            rules = parse_robots(text, self.agent) if text else None
            if rules is None:
                dis.append([])
                allow.append([])
                delay.append(None)
                n_wild.append(0)
                continue
            p_dis, p_allow = rules.plain_prefixes()
            dis.append(list(p_dis))
            allow.append(list(p_allow))
            delay.append(rules.crawl_delay)
            n_wild.append(len(rules.disallow) + len(rules.allow)
                          - len(p_dis) - len(p_allow))
        return pa.table({
            "domain": pa.array(doms, pa.string()),
            "disallow": pa.array(dis, ROBOTS_SCHEMA.field("disallow").type),
            "allow": pa.array(allow, ROBOTS_SCHEMA.field("allow").type),
            "crawl_delay": pa.array(delay, pa.float64()),
            "n_wildcard": pa.array(n_wild, pa.int32()),
        })


def fetch_robots_rules(domains: Iterable[str],
                       transport: Callable[[str], str | None],
                       agent: str = DEFAULT_AGENT,
                       batch_size: int = 512) -> pa.Table:
    """Distributed robots discovery over *domains* -> one rule row each."""
    import ray.data as rd

    ds = rd.from_items([{"domain": d} for d in domains])
    out = ds.map_batches(FetchRobots(transport, agent),
                         batch_format="pyarrow", batch_size=batch_size)
    tbls = [ref for ref in out.to_arrow_refs()]
    import ray

    parts = [t for t in ray.get(tbls) if t.num_rows]
    if not parts:
        return ROBOTS_SCHEMA.empty_table()
    return pa.concat_tables(
        [t.select(ROBOTS_SCHEMA.names) for t in parts])


def politeness_from_rules(rules: pa.Table, seed: int,
                          wave_units: int = 64) -> PolitenessConfig:
    """Fold a robots-rules table into the scheduler's PolitenessConfig.

    Crawl-delay seconds map onto deterministic budget units
    ``max(1, round(delay))``; domains whose robots carry no delay keep
    the config's seeded default (PolitenessConfig.crawl_delay)."""
    assert rules.num_rows <= RULES_COLLECT_CAP, (
        f"{rules.num_rows} domains exceed the driver-collect cap; "
        "keep the rules table distributed (stages/robots.py scale notes)")
    delays: dict[str, int] = {}
    disallow: dict[str, tuple[str, ...]] = {}
    allow: dict[str, tuple[str, ...]] = {}
    for row in rules.to_pylist():
        dom = row["domain"]
        if row["disallow"]:
            disallow[dom] = tuple(row["disallow"])
        if row["allow"]:
            allow[dom] = tuple(row["allow"])
        if row["crawl_delay"] is not None:
            delays[dom] = max(1, round(row["crawl_delay"]))
    return PolitenessConfig(seed=seed, wave_units=wave_units, delays=delays,
                            disallow=disallow, allow=allow)


def discover_politeness(web: WebConfig, wave_units: int = 64,
                        domains: Iterable[str] | None = None,
                        transport: Callable[[str], str | None] | None = None,
                        agent: str = DEFAULT_AGENT) -> PolitenessConfig:
    """Fetch + parse robots.txt for the web's domains and build the
    crawl's PolitenessConfig. Default transport is the synthetic web's
    deterministic robots server; conformance: the discovered config is
    semantically equal to ``default_politeness`` (tests/test_robots.py),
    so a crawl under it matches the sequential oracle exactly."""
    if domains is None:
        domains = [f"{e}.test" for e in web.entities()]
    if transport is None:
        cfg = web

        def transport(domain: str) -> str:
            return robots_text_for(cfg, domain.removesuffix(".test"))

    rules = fetch_robots_rules(domains, transport, agent)
    return politeness_from_rules(rules, seed=web.seed, wave_units=wave_units)
