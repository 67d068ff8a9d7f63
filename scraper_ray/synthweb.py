"""Deterministic synthetic web — the crawl universe (FIXTURES.md F2/F3/F8).

A pure function ``fetch_page(canonical_url, cfg)`` shared by the Ray engine's
fetch stage and the sequential oracle, so both crawl the *same* web with no
network and full reproducibility. The shape mirrors the reference's two-step
listing site (reference: handlers/scrapers.py:110-150):

- **list pages** ``http://www.{entity}.test/listing/p{n}/`` emit
  ``items_per_page`` detail links in DOM order plus the next list page as the
  last child; a page beyond ``max_pages(entity)`` emits nothing — reproducing
  ascending-page iteration with stop-on-empty (scrapers.py:88-98).
- **detail pages** ``http://www.{entity}.test/item/{id}/`` are leaves that
  yield interleaved text + media spans — reproducing the 照片-column media
  extraction interleaved with text cells (handlers/diandianzu.py:65-86).

Duplicate item ids across pages (``dup_rate``) exercise the URL-seen set;
messy child-link variants (``alias_rate``: uppercase host, default port,
dot-segments, fragments, duplicate query pairs) exercise RFC 3986
canonicalization — several raw URLs alias to one canonical URL.

All randomness is ``sha1(seed || tag)``-derived: any page is reproducible in
isolation, which is what lets the fetch stage be an embarrassingly parallel
``map_batches`` over URL batches.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

_LIST_RE = re.compile(r"^http://www\.([a-z0-9-]+)\.test/listing/p(\d+)/$")
_ITEM_RE = re.compile(r"^http://www\.([a-z0-9-]+)\.test/item/(\d+)/$")

_WORDS = (
    "floor area price metro tower plaza office loft suite garden park "
    "center district road street lane avenue building level room view"
).split()


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash of the joined parts."""
    s = ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


@dataclass(frozen=True)
class WebConfig:
    """Parameters of the synthetic web (all seeded, FIXTURES.md F3)."""

    seed: int = 42
    n_entities: int = 20
    items_per_page: int = 8
    max_pages_cap: int = 12          # Zipf-skewed per-entity page counts
    text_spans_lo: int = 2
    text_spans_hi: int = 6
    dup_rate: float = 0.15           # item slots repeating an earlier id
    alias_rate: float = 0.20         # child links emitted as messy variants
    skew_entity_share: float = 0.0   # >0: entity 0 gets cap*share extra pages
    work_per_page: int = 0           # simulated fetch+parse CPU (hash rounds)
    fail_rate: float = 0.0           # transient fetch-failure probability
    private_link_rate: float = 0.0   # fraction of item links under /private/
    # recrawl simulation: rev > 0 deterministically mutates the web —
    # ~change_rate of detail pages get new span content, and some
    # entities grow/shrink a list page (new + removed URLs). rev=0 is
    # byte-identical to the pre-rev web (every rev branch is a no-op),
    # so all existing fixtures/oracles are unaffected.
    rev: int = 0
    change_rate: float = 0.25        # fraction of detail items changed/rev

    def entity_name(self, i: int) -> str:
        return f"ent{i:04d}"

    def entities(self) -> list[str]:
        return [self.entity_name(i) for i in range(self.n_entities)]

    def max_pages(self, entity: str) -> int:
        """Zipf-ish page count per entity; entity index 0 is the heaviest."""
        try:
            rank = int(entity.removeprefix("ent"))
        except ValueError:
            rank = _h(self.seed, "rank", entity) % self.n_entities
        base = max(1, int(self.max_pages_cap / (rank + 1) ** 0.7))
        if rank == 0 and self.skew_entity_share > 0:
            base = max(base, int(self.max_pages_cap * self.n_entities
                                 * self.skew_entity_share))
        if self.rev:
            # recrawl URL churn: ~20% of entities grow a page, ~15%
            # shrink one (deterministic per (entity, rev)) — yields
            # 'added' and 'removed' rows in the recrawl diff
            jig = _h(self.seed, "maxpages", entity, self.rev) % 100
            if jig < 20:
                base += 1
            elif jig < 35 and base > 1:
                base -= 1
        return base

    def list_url(self, entity: str, page: int) -> str:
        return f"http://www.{entity}.test/listing/p{page}/"

    def item_url(self, entity: str, item_id: int) -> str:
        return f"http://www.{entity}.test/item/{item_id}/"


@dataclass(frozen=True)
class Span:
    kind: str        # 'text' | 'media'
    text: str
    media_ref: str
    offset: int


@dataclass(frozen=True)
class Page:
    url: str                     # canonical
    page_type: str               # 'list' | 'detail' | 'empty' ('error'
                                 # docs are emitted by the crawl when
                                 # every fetch attempt fails)
    entity: str
    child_urls: tuple[str, ...]  # raw (possibly messy) URLs, DOM order
    spans: tuple[Span, ...]


def _alias_variant(url: str, salt: int) -> str:
    """A messy-but-equivalent variant of *url* (canonicalizes back to it)."""
    kind = salt % 5
    if kind == 0:
        scheme, rest = url.split("://", 1)
        host, path = rest.split("/", 1)
        return f"{scheme.upper()}://{host.upper()}/{path}"
    if kind == 1:
        return url.replace(".test/", ".test:80/", 1)
    if kind == 2:
        return url.replace(".test/", ".test/./x/../", 1)
    if kind == 3:
        return url + "#frag%2f" + str(salt % 7)
    # percent-encode an unreserved octet ('t' = %74) — decodes back on
    # normalization, so the canonical form is unchanged
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    return f"{scheme}://{host}/" + path.replace("t", "%74", 1)


def _words(h: int, n: int) -> str:
    return " ".join(_WORDS[(h >> (7 * k)) % len(_WORDS)] for k in range(n))


def _item_ids_for_page(cfg: WebConfig, entity: str, page: int) -> list[int]:
    """Item ids listed on (entity, page) — DOM order, with duplicates.

    Fresh ids are globally unique per (entity, page, slot); a ``dup_rate``
    fraction of slots instead repeat an id from an earlier page, so the
    duplicate shows up in the seen set exactly like the reference's
    Source_ID collisions at the sink (handlers/db.py:38-54).
    """
    ids: list[int] = []
    for slot in range(cfg.items_per_page):
        hv = _h(cfg.seed, "slot", entity, page, slot)
        if page > 1 and (hv % 1000) < cfg.dup_rate * 1000:
            # repeat an item from an earlier page (deterministic choice)
            src_page = 1 + hv % (page - 1)
            src_slot = (hv >> 13) % cfg.items_per_page
            ids.append(_h(cfg.seed, "id", entity, src_page, src_slot) % 10_000_000)
        else:
            ids.append(_h(cfg.seed, "id", entity, page, slot) % 10_000_000)
    return ids


def fetch_fails(canonical_url: str, cfg: WebConfig, attempt: int) -> bool:
    """Deterministic transient failure for (url, attempt) — stands in for
    the reference's fetch errors that a session renewal may cure
    (handlers/scrapers.py:38-52)."""
    if cfg.fail_rate <= 0:
        return False
    return (_h(cfg.seed, "fail", canonical_url, attempt) % 1000
            < cfg.fail_rate * 1000)


def fetch_with_retry(canonical_url: str, cfg: WebConfig,
                     max_attempts: int = 3) -> tuple["Page | None", int]:
    """Bounded retry around the synthetic fetch: returns (page, attempts)
    or (None, max_attempts) when every attempt fails — the caller emits a
    dead-letter 'error' doc instead of dropping the URL silently (the
    reference returns None and loses the page, scrapers.py:50-52)."""
    for attempt in range(max_attempts):
        if not fetch_fails(canonical_url, cfg, attempt):
            return fetch_page(canonical_url, cfg), attempt + 1
    return None, max_attempts


def fetch_page(canonical_url: str, cfg: WebConfig) -> Page:
    """The synthetic web: canonical URL -> page contents. Pure, total.

    ``work_per_page`` hash rounds emulate the CPU cost of a real
    fetch+parse (HTML tokenization, DOM walk) so benchmarks measure a
    realistic compute-bound fetch stage rather than pure orchestration.
    """
    if cfg.work_per_page:
        h = canonical_url.encode()
        for _ in range(cfg.work_per_page):
            h = hashlib.blake2b(h, digest_size=32).digest()
    m = _LIST_RE.match(canonical_url)
    if m:
        entity, page = m.group(1), int(m.group(2))
        if page > cfg.max_pages(entity) or page < 1:
            # stop-on-empty: an empty list page, no children
            return Page(canonical_url, "empty", entity, (),
                        (Span("text", "no more results", "", 0),))
        children: list[str] = []
        spans: list[Span] = []
        for slot, item_id in enumerate(_item_ids_for_page(cfg, entity, page)):
            hv = _h(cfg.seed, "alias", entity, page, slot)
            if ((hv >> 40) % 1000) < cfg.private_link_rate * 1000:
                # robots-sensitive link: filtered at discovery for domains
                # whose politeness config disallows /private/
                raw = f"http://www.{entity}.test/private/item/{item_id}/"
            else:
                raw = cfg.item_url(entity, item_id)
                if (hv % 1000) < cfg.alias_rate * 1000:
                    raw = _alias_variant(raw, hv >> 10)
            children.append(raw)
            spans.append(Span("text", f"item {item_id} " + _words(hv, 3), "", slot))
        # next list page is the final child — ascending-page iteration
        children.append(cfg.list_url(entity, page + 1))
        return Page(canonical_url, "list", entity, tuple(children), tuple(spans))

    m = _ITEM_RE.match(canonical_url)
    if m:
        entity, item_id = m.group(1), int(m.group(2))
        hv = _h(cfg.seed, "detail", entity, item_id)
        if cfg.rev and (_h(cfg.seed, "changed", entity, item_id) % 1000
                        < cfg.change_rate * 1000):
            # this item's content was edited between revisions: reseed
            # the span-layout hash so text, span count and media ref all
            # move — a 'changed' row in the recrawl diff
            hv = _h(cfg.seed, "detail", entity, item_id, "rev", cfg.rev)
        n_text = cfg.text_spans_lo + hv % (cfg.text_spans_hi - cfg.text_spans_lo + 1)
        media_pos = (hv >> 17) % (n_text + 1)
        spans: list[Span] = []
        off = 0
        for i in range(n_text + 1):
            if i == media_pos:
                spans.append(Span(
                    "media", "",
                    f"http://cdn.{entity}.test/img/{item_id}_{hv % 97}.jpg", off))
            else:
                spans.append(Span(
                    "text", _words(_h(cfg.seed, "span", entity, item_id, i), 5),
                    "", off))
            off += 1
        return Page(canonical_url, "detail", entity, (), tuple(spans))

    # unknown URL inside the synthetic universe -> empty leaf page
    return Page(canonical_url, "empty", "", (),
                (Span("text", "not found", "", 0),))


# ---------------------------------------------------------------------------
# Politeness config (FIXTURES.md F8) — deterministic budget units, no clocks
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PolitenessConfig:
    """Per-domain crawl-delay units + robots allow/disallow prefixes.

    Replaces the reference's random sleeps (handlers/diandianzu.py:40,
    handlers/haozu.py:41) with deterministic budget units: a domain with
    ``crawl_delay_units = d`` may fetch at most ``wave_units // d`` pages
    per wave. The oracle and engine consume the same config, so ordering
    under budget is comparable.

    Admission follows RFC 9309 §2.2.2 longest-match semantics over plain
    path prefixes: the longest matching rule wins, an ``allow`` prefix at
    least as long as the best ``disallow`` match readmits the path. With
    no allow rules (the default configs) this reduces to the plain
    any-disallow-prefix block. Configs are either hand-built (tests) or
    discovered from fetched robots.txt via stages/robots.py.
    """

    seed: int = 42
    wave_units: int = 64
    delays: dict[str, int] = field(default_factory=dict)
    disallow: dict[str, tuple[str, ...]] = field(default_factory=dict)
    allow: dict[str, tuple[str, ...]] = field(default_factory=dict)

    def crawl_delay(self, domain: str) -> int:
        if domain in self.delays:
            return self.delays[domain]
        return 1 + _h(self.seed, "delay", domain) % 4

    def budget_per_wave(self, domain: str) -> int:
        return max(1, self.wave_units // self.crawl_delay(domain))

    def allowed(self, domain: str, path: str) -> bool:
        d = -1
        for prefix in self.disallow.get(domain, ()):
            if len(prefix) > d and path.startswith(prefix):
                d = len(prefix)
        if d < 0:
            return True
        a = -1
        for prefix in self.allow.get(domain, ()):
            if len(prefix) > a and path.startswith(prefix):
                a = len(prefix)
        return a >= d


def default_politeness(cfg: WebConfig, wave_units: int = 64) -> PolitenessConfig:
    """Deterministic politeness config for the synthetic web: every third
    entity disallows ``/private/`` (no synthetic page lives there, but seed
    lists may include such URLs to exercise the robots filter)."""
    disallow = {
        f"{e}.test": ("/private/",)
        for i, e in enumerate(cfg.entities())
        if i % 3 == 0
    }
    return PolitenessConfig(seed=cfg.seed, wave_units=wave_units, disallow=disallow)


def robots_url(entity: str) -> str:
    return f"http://www.{entity}.test/robots.txt"


def robots_text_for(cfg: WebConfig, entity: str) -> str:
    """The synthetic web's ``/robots.txt`` for *entity* — deterministic,
    and semantically equal to ``default_politeness``: every third entity
    disallows ``/private/``; the governing group's ``Crawl-delay`` equals
    ``PolitenessConfig.crawl_delay`` for the domain. Five render variants
    exercise the RFC 9309 parser (functions/robots.py): decoy groups for
    other agents, an agent-specific group that overrides ``*``, comments,
    mixed-case field names, no-op ``Allow`` rules. Parsing this text with
    ``parse_robots(agent='graftbot')`` must recover exactly the default
    config's rules (tests/test_robots.py)."""
    try:
        idx = int(entity.removeprefix("ent"))
    except ValueError:
        idx = _h(cfg.seed, "rank", entity) % max(1, cfg.n_entities)
    domain = f"{entity}.test"
    delay = 1 + _h(cfg.seed, "delay", domain) % 4
    dis_private = idx % 3 == 0
    variant = idx % 5
    rules = ["Disallow: /private/"] if dis_private else []
    rules.append(f"Crawl-delay: {delay}")
    body = "\n".join(rules)
    # Sitemap is cross-group (sitemaps.org); appended after the groups
    smap = f"\nSitemap: http://www.{entity}.test/sitemap.xml\n"
    if variant == 0:
        return f"User-agent: *\n{body}\n" + smap
    if variant == 1:   # decoy group for another agent before ours
        return ("User-agent: otherbot\nDisallow: /\nCrawl-delay: 9\n\n"
                f"User-agent: *\n{body}\n") + smap
    if variant == 2:   # agent-specific group overrides a bogus * group
        return ("User-agent: *\nDisallow: /\nCrawl-delay: 7\n\n"
                f"User-agent: graftbot\n{body}\n") + smap
    if variant == 3:   # comments, blank lines, a no-op Allow
        return ("# synthetic robots\n\nUser-agent: *  # all crawlers\n"
                f"Allow: /\n{body}\n# end\n") + smap
    # variant 4: mixed-case field names + stray whitespace
    loud = body.replace("Disallow:", "DISALLOW:").replace(
        "Crawl-delay:", "CRAWL-DELAY:   ")
    return f"USER-AGENT: *\n{loud}\n" + smap


# ---------------------------------------------------------------------------
# Sitemaps (sitemaps.org protocol) — seed discovery for the crawl
# ---------------------------------------------------------------------------

_SMAP_PAGES = "http://www.{e}.test/sitemap-pages.xml"
_SMAP_ITEMS = "http://www.{e}.test/sitemap-items.xml"


def _urlset_xml(urls: list[str]) -> str:
    body = "\n".join(
        f"  <url><loc>{u}</loc><changefreq>daily</changefreq></url>"
        for u in urls)
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            f"{body}\n</urlset>\n")


def sitemap_xml_for(cfg: WebConfig, url: str) -> str | None:
    """The synthetic web's sitemap documents. Every fourth entity splits
    its sitemap into a **sitemap index** with two child urlsets (pages /
    items) — exercising the two-level protocol; others serve one flat
    urlset. Contents: every list page plus page 1's item URLs."""
    m = re.match(r"^http://www\.([a-z0-9-]+)\.test/"
                 r"(sitemap|sitemap-pages|sitemap-items)\.xml$", url)
    if not m:
        return None
    entity, kind = m.group(1), m.group(2)
    try:
        idx = int(entity.removeprefix("ent"))
    except ValueError:
        return None
    pages = [cfg.list_url(entity, p)
             for p in range(1, cfg.max_pages(entity) + 1)]
    items = sorted({cfg.item_url(entity, i)
                    for i in _item_ids_for_page(cfg, entity, 1)})
    if kind == "sitemap":
        if idx % 4 == 0:   # two-level: index -> child urlsets
            locs = [_SMAP_PAGES.format(e=entity), _SMAP_ITEMS.format(e=entity)]
            body = "\n".join(f"  <sitemap><loc>{u}</loc></sitemap>"
                             for u in locs)
            return ('<?xml version="1.0" encoding="UTF-8"?>\n'
                    '<sitemapindex '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                    f"{body}\n</sitemapindex>\n")
        return _urlset_xml(pages + items)
    if idx % 4 != 0:
        return None   # child maps exist only for index entities
    return _urlset_xml(pages if kind == "sitemap-pages" else items)


def serve_meta(cfg: WebConfig, url: str) -> str | None:
    """Synthetic transport for crawl metadata documents: robots.txt and
    sitemap XML by URL (None = 404). The injectable-transport seam of
    stages/robots.py and stages/sitemap.py points here in-sandbox and at
    a RequestsFetcher-backed callable in a real deployment."""
    m = re.match(r"^http://www\.([a-z0-9-]+)\.test/robots\.txt$", url)
    if m:
        return robots_text_for(cfg, m.group(1))
    return sitemap_xml_for(cfg, url)


# ---------------------------------------------------------------------------
# Seed list generator (FIXTURES.md F2)
# ---------------------------------------------------------------------------

def gen_seeds(cfg: WebConfig, n: int) -> list[str]:
    """Messy seed list of *n* raw URLs (dupes + aliases + robots-blocked).

    Mostly variants of each entity's first list pages (the reference starts
    each entity at page 1, handlers/scrapers.py:84-98), plus a sprinkle of
    direct item URLs and robots-disallowed paths.
    """
    return [seed_url(cfg, i) for i in range(n)]


def seed_url(cfg: WebConfig, i: int) -> str:
    """Seed #i of the messy seed list (same distribution as gen_seeds)."""
    hv = _h(cfg.seed, "seedlist", i)
    ent = cfg.entity_name(hv % cfg.n_entities)
    mode = (hv >> 8) % 10
    if mode < 6:
        url = cfg.list_url(ent, 1)
    elif mode < 8:
        url = cfg.list_url(ent, 1 + (hv >> 16) % 3)
    elif mode < 9:
        item_id = _h(cfg.seed, "id", ent, 1, (hv >> 16) % cfg.items_per_page) % 10_000_000
        url = cfg.item_url(ent, item_id)
    else:
        url = f"http://www.{ent}.test/private/area/{hv % 50}/"
    if (hv >> 24) % 2:
        url = _alias_variant(url, hv >> 32)
    return url


def gen_seeds_dataset(cfg: WebConfig, n: int):
    """Seed list as a Ray Dataset (url, seed_idx) — generated inside
    map_batches so a 10^6-seed list never materializes on the driver."""
    import pyarrow as pa
    import ray.data as rd

    def make(batch: pa.Table) -> pa.Table:
        idxs = batch.column("id").to_pylist()
        return pa.table({
            "url": pa.array([seed_url(cfg, i) for i in idxs], pa.string()),
            "seed_idx": pa.array(idxs, pa.int64()),
        })

    return rd.range(n).map_batches(make, batch_format="pyarrow",
                                   batch_size=16384)
