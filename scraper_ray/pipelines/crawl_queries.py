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
import pyarrow.compute as pc
import ray.data as rd

from .common import join_parts

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


_CRAWL_CACHE: dict[tuple[str, int], str] = {}


def _run_crawl(sf_dir: str, rev: int = 0) -> rd.Dataset:
    """Run (or reuse this process's) crawl for the sf tier.

    ``rev`` crawls revision *rev* of the synthetic web (same seed list,
    same politeness — only page content / URL churn differ), the
    recrawl scenario q_recrawl_diff compares."""
    from dataclasses import replace

    tier = os.path.basename(os.path.normpath(sf_dir))
    if (tier, rev) not in _CRAWL_CACHE:
        web, n_seeds = _cfg_for(sf_dir)
        pol = default_politeness(web, wave_units=48)
        seeds = gen_seeds(web, n_seeds)
        if rev:
            web = replace(web, rev=rev)
        out = tempfile.mkdtemp(prefix="crawl_docs_")
        ccfg = CrawlConfig(web=web, politeness=pol, out_dir=out, batch_size=1024)
        crawl(seeds, ccfg)
        _CRAWL_CACHE[(tier, rev)] = out
    return read_docs(_CRAWL_CACHE[(tier, rev)])


def q_crawl_docs(sf_dir: str) -> rd.Dataset:
    """Full crawl; returns the doc table (deterministic given sf tier).

    ``wave`` (the engine's internal scheduling round) and ``spans``
    (exploded by q_crawl_spans) are dropped so every remaining column is
    derivable by the sequential oracle crawler — the DuckDB oracle
    compares against oracle.py's output, not engine internals."""
    return _run_crawl(sf_dir).drop_columns(["spans", "wave"])


def q_crawl_spans(sf_dir: str) -> rd.Dataset:
    """Crawl + span explosion: one row per (doc, span) — the interleaved
    text/media payload contract (input_hint) flattened."""
    docs = _run_crawl(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        # vectorized: one list_flatten + parent-index take — no Python
        # loop over spans (flatten preserves in-list order, so spans
        # stay in offset order within each doc's run)
        from .common import flat_spans

        flat, parents = flat_spans(t)
        return pa.table({
            "doc_id": pc.take(t.column("doc_id"), parents),
            "kind": pc.struct_field(flat, "kind"),
            "text": pc.struct_field(flat, "text"),
            "media_ref": pc.struct_field(flat, "media_ref"),
            "offset": pc.cast(pc.struct_field(flat, "offset"), pa.int32()),
        })

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_span_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc composition of the interleaved text+media payload
    (input_hint contract): span counts by kind, text volume, distinct
    media assets — the multimodal 'what is this page made of' rollup a
    curation pass filters on (e.g. drop image-farm pages with no text).
    Pure map over the docs' spans column; no shuffle (spans of a doc
    arrive together by construction)."""
    docs = _run_crawl(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        # vectorized: one flatten, per-doc counts via bincount over the
        # parent indices, text chars via utf8_length weights, distinct
        # media refs via dictionary-encode + np.unique on a fused
        # (doc, ref-code) int64 key — no Python loop over spans
        import numpy as np

        from .common import flat_spans

        n = t.num_rows
        flat, parents = flat_spans(t)
        par = parents.to_numpy(zero_copy_only=False)
        is_tx = pc.equal(pc.struct_field(flat, "kind"), "text").to_numpy(
            zero_copy_only=False)
        n_sp = np.bincount(par, minlength=n)
        n_tx = np.bincount(par[is_tx], minlength=n)
        tlen = pc.utf8_length(pc.struct_field(flat, "text")).to_numpy(
            zero_copy_only=False)
        chars = np.bincount(par[is_tx], weights=tlen[is_tx],
                            minlength=n).astype(np.int64)
        md_par = par[~is_tx]
        refs = pc.struct_field(flat, "media_ref").filter(
            pa.array(~is_tx))
        codes = pc.dictionary_encode(refs).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        fused = np.unique(md_par * (codes.max() + 1 if len(codes) else 1)
                          + codes)
        nref = np.bincount(fused // (codes.max() + 1 if len(codes) else 1),
                           minlength=n)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_spans": pa.array(n_sp.astype(np.int64)),
            "n_text": pa.array(n_tx.astype(np.int64)),
            "n_media": pa.array((n_sp - n_tx).astype(np.int64)),
            "text_chars": pa.array(chars),
            "n_media_refs": pa.array(nref.astype(np.int64)),
        })

    return docs.select_columns(["doc_id", "spans"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def _content_sigs(docs: rd.Dataset, sig_col: str) -> rd.Dataset:
    """(url, {sig_col}) — md5 over the doc's span sequence in offset
    order, the content fingerprint the recrawl diff compares. Pure
    per-row map; the md5 serialization (kind|text|media_ref joined by
    newline) is mirrored verbatim by the DuckDB oracle's
    ``string_agg(... ORDER BY offset)``."""
    import hashlib

    from .common import span_content_bodies

    def sig(t: pa.Table) -> pa.Table:
        bodies = span_content_bodies(t)
        sigs = pa.array([hashlib.md5(b.encode()).hexdigest()
                         for b in bodies.to_pylist()], pa.string())
        return pa.table({"url": t.column("url"), sig_col: sigs})

    return docs.select_columns(["url", "spans"]).map_batches(
        sig, batch_format="pyarrow", zero_copy_batch=True)


def q_recrawl_diff(sf_dir: str) -> rd.Dataset:
    """Incremental recrawl with change detection: crawl the web at
    revision 0 and revision 1 (same seed list, same politeness budget),
    fingerprint every doc's span content, and FULL OUTER join the two
    URL sets — each URL is classified ``added`` (rev 1 only),
    ``removed`` (rev 0 only), ``changed`` (both revs, fingerprints
    differ) or ``unchanged``. This is the delta feed an incremental
    crawler ships downstream instead of re-emitting the whole corpus.
    Scale shape: two streaming crawls + one hash-partitioned outer join
    on url; fingerprints are computed per batch, never collected. The
    DuckDB oracle recomputes both fingerprint sets from the sequential
    oracle crawler's rev-0 and rev-1 span parquets."""
    import pyarrow.compute as pc

    from .common import drop_empty_blocks

    s0 = _content_sigs(_run_crawl(sf_dir, rev=0), "sig0")
    s1 = (_content_sigs(_run_crawl(sf_dir, rev=1), "sig1")
          .rename_columns({"url": "url1"}))
    joined = drop_empty_blocks(
        s0.join(s1, join_type="full_outer", num_partitions=join_parts(8),
                on=("url",), right_on=("url1",)))

    def classify(t: pa.Table) -> pa.Table:
        a, b = t.column("sig0"), t.column("sig1")
        status = pc.if_else(
            pc.is_null(a), pa.scalar("added"),
            pc.if_else(pc.is_null(b), pa.scalar("removed"),
                       pc.if_else(pc.equal(a, b), pa.scalar("unchanged"),
                                  pa.scalar("changed"))))
        return pa.table({"url": t.column("url"), "status": status})

    return joined.map_batches(classify, batch_format="pyarrow")


_INCR_CACHE: dict[str, str] = {}


def _run_incremental_crawl(sf_dir: str) -> rd.Dataset:
    """Crawl revision 1 with revision 0's detail-page URLs pre-marked in
    the seen set (``crawl(..., skip_urls=...)``): list/hub pages are
    re-fetched (they carry the links), already-crawled detail pages are
    never touched, and only NEW detail pages are fetched. The skip list
    is passed as a Dataset, so the preseed is batched RPCs from tasks —
    a previous 10^9-doc crawl's URL column never lands on the driver."""
    import pyarrow.compute as pc
    from dataclasses import replace

    tier = os.path.basename(os.path.normpath(sf_dir))
    if tier not in _INCR_CACHE:
        web, n_seeds = _cfg_for(sf_dir)
        pol = default_politeness(web, wave_units=48)
        seeds = gen_seeds(web, n_seeds)

        def detail_urls(t: pa.Table) -> pa.Table:
            mask = pc.equal(t.column("page_type"), pa.scalar("detail"))
            return pa.table({"url": t.column("url").filter(mask)})

        skip = _run_crawl(sf_dir, rev=0).select_columns(
            ["url", "page_type"]).map_batches(
            detail_urls, batch_format="pyarrow", zero_copy_batch=True)
        out = tempfile.mkdtemp(prefix="crawl_incr_")
        ccfg = CrawlConfig(web=replace(web, rev=1), politeness=pol,
                           out_dir=out, batch_size=1024)
        crawl(seeds, ccfg, skip_urls=skip)
        _INCR_CACHE[tier] = out
    return read_docs(_INCR_CACHE[tier])


def q_incremental_crawl(sf_dir: str) -> rd.Dataset:
    """Incremental crawl output: (url, page_type, depth) of every page
    the rev-1 skip-crawl actually fetched — the crawl-budget saver that
    re-fetches hubs but not already-archived content pages. The DuckDB
    oracle is the sequential oracle crawler run with the same pre-seen
    set (fixture parquet), so this checks preseed admission, seed-stage
    seen-dropping and discovery through re-fetched hubs end to end."""
    import pyarrow.compute as pc

    docs = _run_incremental_crawl(sf_dir)

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("url"),
            "page_type": t.column("page_type"),
            "depth": pc.cast(t.column("depth"), pa.int64()),
        })

    return docs.select_columns(["url", "page_type", "depth"]).map_batches(
        pin, batch_format="pyarrow", zero_copy_batch=True)


def q_revisit_priority(sf_dir: str) -> rd.Dataset:
    """Per-domain revisit scheduling signal from the rev-0 -> rev-1
    recrawl diff: counts by status plus the Poisson change-rate
    estimate lambda = -ln(1 - changed/(changed+unchanged)) (Cho &
    Garcia-Molina's frequency estimator — domains whose content churns
    fastest get recrawled first). The crawl-policy feedback loop:
    recrawl_diff produces the deltas, this ranks where the next crawl's
    budget goes. Scale shape: the diff is joined to the (url -> domain)
    map from the two doc tables (hash join on url), then one combiner
    groupby per domain — the output is O(domains). The DuckDB oracle
    recomputes the diff from the sequential crawler's rev-0/rev-1
    fixtures and aggregates identically."""
    import math

    import pyarrow.compute as pc

    from .common import drop_empty_blocks

    diff = q_recrawl_diff(sf_dir)
    dom0 = _run_crawl(sf_dir, rev=0).select_columns(["url", "domain_key"])
    dom1 = _run_crawl(sf_dir, rev=1).select_columns(["url", "domain_key"])
    # url -> domain over BOTH revisions (added urls exist only in rev 1,
    # removed only in rev 0); urls are unique per rev and map to the
    # same domain in both, so a vectorized keep-any (Max) dedup is
    # exact — never a per-group pandas dispatch
    from ray.data.aggregate import Max

    doms = (dom0.union(dom1).groupby("url")
            .aggregate(Max("domain_key", alias_name="domain_key")))
    joined = drop_empty_blocks(
        diff.join(doms, join_type="inner", num_partitions=join_parts(8), on=("url",)))

    def partial(t: pa.Table) -> pa.Table:
        status = t.column("status")
        flat = pa.table({
            "domain_key": t.column("domain_key"),
            "n_added": pc.cast(pc.equal(status, "added"), pa.int64()),
            "n_removed": pc.cast(pc.equal(status, "removed"), pa.int64()),
            "n_changed": pc.cast(pc.equal(status, "changed"), pa.int64()),
            "n_unchanged": pc.cast(pc.equal(status, "unchanged"),
                                   pa.int64()),
        })
        g = flat.group_by("domain_key").aggregate(
            [("n_added", "sum"), ("n_removed", "sum"),
             ("n_changed", "sum"), ("n_unchanged", "sum")])
        return g.rename_columns(["domain_key", "n_added", "n_removed",
                                 "n_changed", "n_unchanged"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("domain_key")
           .sum(["n_added", "n_removed", "n_changed", "n_unchanged"]))

    def finish(t: pa.Table) -> pa.Table:
        ch = pc.cast(t.column("sum(n_changed)"), pa.int64())
        un = pc.cast(t.column("sum(n_unchanged)"), pa.int64())
        ratio = pc.divide(pc.cast(ch, pa.float64()),
                          pc.cast(pc.add(ch, un), pa.float64()))
        # -ln(1-r); r == 1 (everything changed) caps at ln(n+1): the
        # estimator's standard saturation guard, mirrored in the SQL
        n = pc.add(ch, un)
        capped = pc.if_else(
            pc.equal(ch, n),
            pa.array([math.log(v + 1.0) for v in n.to_pylist()],
                     pa.float64()),
            pc.multiply(pc.ln(pc.subtract(pa.scalar(1.0), ratio)),
                        pa.scalar(-1.0)))
        return pa.table({
            "domain_key": t.column("domain_key"),
            "n_added": pc.cast(t.column("sum(n_added)"), pa.int64()),
            "n_removed": pc.cast(t.column("sum(n_removed)"), pa.int64()),
            "n_changed": ch,
            "n_unchanged": un,
            "change_rate": capped,
        })

    return drop_empty_blocks(agg).map_batches(finish, batch_format="pyarrow")


def q_domain_stats(sf_dir: str) -> rd.Dataset:
    """Per-domain crawl rollup: doc count, detail-page count, deepest
    level reached and total fetch attempts — the frontier-audit view a
    crawl operator reads first. Combiner discipline: each batch
    pre-aggregates per domain (Arrow group_by inside the map), so the
    shuffle moves one partial row per (domain, batch) — at 100 TB the
    exchange is O(domains x blocks), never O(pages). The DuckDB oracle
    aggregates the sequential oracle crawler's parquet, checking the
    whole distributed crawl end-to-end in aggregate form."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    docs = _run_crawl(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "domain_key": t.column("domain_key"),
            "n_docs": pa.array([1] * t.num_rows, pa.int64()),
            "n_detail": pc.cast(pc.equal(t.column("page_type"), "detail"),
                                pa.int64()),
            "depth": pc.cast(t.column("depth"), pa.int64()),
            "n_attempts": pc.cast(t.column("n_attempts"), pa.int64()),
        })
        g = flat.group_by("domain_key").aggregate(
            [("n_docs", "sum"), ("n_detail", "sum"),
             ("depth", "max"), ("n_attempts", "sum")])
        return pa.table({
            "domain_key": g.column("domain_key"),
            "n_docs": pc.cast(g.column("n_docs_sum"), pa.int64()),
            "n_detail": pc.cast(g.column("n_detail_sum"), pa.int64()),
            "max_depth": pc.cast(g.column("depth_max"), pa.int64()),
            "n_attempts": pc.cast(g.column("n_attempts_sum"), pa.int64()),
        })

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("domain_key")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_detail", alias_name="n_detail"),
                      Max("max_depth", alias_name="max_depth"),
                      Sum("n_attempts", alias_name="n_attempts")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({c: pc.cast(t.column(c), pa.int64())
                         if c != "domain_key" else t.column(c)
                         for c in ["domain_key", "n_docs", "n_detail",
                                   "max_depth", "n_attempts"]})

    return agg.map_batches(pin, batch_format="pyarrow")


def q_url_patterns(sf_dir: str) -> rd.Dataset:
    """URL-template mining over the crawl: collapse every digit run in
    the URL to ``N`` and aggregate per (domain, template) — the classic
    spider-trap / duplicate-content detector (a template with many URLs
    but few distinct entities is pagination or a calendar trap; crawl
    operators blocklist such templates before the next run). Scale
    shape: the regex runs vectorized per batch
    (``pc.replace_substring_regex``), each batch pre-aggregates to one
    partial row per (domain, template, entity), the first shuffle is on
    those partials, and the distinct-entity count is a second groupby
    over one row per (domain, template, entity) — both exchanges are
    O(templates), never O(pages). The DuckDB oracle recomputes the
    template with the same regex over the sequential crawler's docs."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    docs = _run_crawl(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "domain_key": t.column("domain_key"),
            "url_pattern": pc.replace_substring_regex(
                t.column("url"), r"[0-9]+", "N"),
            "entity": t.column("entity"),
            "n_urls": pa.array([1] * t.num_rows, pa.int64()),
            "depth": pc.cast(t.column("depth"), pa.int64()),
        })
        g = flat.group_by(["domain_key", "url_pattern", "entity"]).aggregate(
            [("n_urls", "sum"), ("depth", "max")])
        return g.rename_columns(
            ["domain_key", "url_pattern", "entity", "n_urls", "depth"])

    per_entity = (docs.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
                  .groupby(["domain_key", "url_pattern", "entity"])
                  .aggregate(Sum("n_urls", alias_name="n_urls"),
                             Max("depth", alias_name="depth")))

    def one_entity(t: pa.Table) -> pa.Table:
        return pa.table({
            "domain_key": t.column("domain_key"),
            "url_pattern": t.column("url_pattern"),
            "n_urls": pc.cast(t.column("n_urls"), pa.int64()),
            "n_entities": pa.array([1] * t.num_rows, pa.int64()),
            "depth": pc.cast(t.column("depth"), pa.int64()),
        })

    agg = (per_entity.map_batches(one_entity, batch_format="pyarrow")
           .groupby(["domain_key", "url_pattern"])
           .aggregate(Sum("n_urls", alias_name="n_urls"),
                      Sum("n_entities", alias_name="n_entities"),
                      Max("depth", alias_name="max_depth")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "domain_key": t.column("domain_key"),
            "url_pattern": t.column("url_pattern"),
            "n_urls": pc.cast(t.column("n_urls"), pa.int64()),
            "n_entities": pc.cast(t.column("n_entities"), pa.int64()),
            "max_depth": pc.cast(t.column("max_depth"), pa.int64()),
        })

    from .common import drop_empty_blocks
    return drop_empty_blocks(agg).map_batches(pin, batch_format="pyarrow")


_MIRROR_FANOUT_CAP = 64  # content sigs shared by more domains than this
                         # are dropped (loudly) — a sig on k domains emits
                         # C(k,2) pairs, so the cap bounds the pair blowup
                         # exactly like the LSH bucket caps in dedup.py


def q_mirror_domains(sf_dir: str) -> rd.Dataset:
    """Cross-domain mirror detection (Broder-style): fingerprint every
    page's span content (the same md5 serialization the recrawl diff
    uses), keep fingerprints seen on 2..{cap} distinct domains, and
    count shared fingerprints per unordered domain pair — domains that
    share many full-page fingerprints are mirrors or boilerplate farms,
    the dedup signal that runs BEFORE any text-level near-dup at crawl
    scale. Scale shape: distinct (sig, domain) via one groupby; the
    multi-domain sig set is tiny (mirrors are rare) and rides a second
    groupby; the pair fan-out is a sig-keyed self-join bounded by
    ``_MIRROR_FANOUT_CAP`` (dropped sigs are logged, same discipline as
    the capped LSH buckets); the final count is one groupby over pair
    rows. No stage materializes pages on the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .common import drop_empty_blocks

    docs = _run_crawl(sf_dir)

    def sig(t: pa.Table) -> pa.Table:
        import hashlib

        from .common import span_content_bodies

        bodies = span_content_bodies(t)
        sigs = pa.array([hashlib.md5(b.encode()).hexdigest()
                         for b in bodies.to_pylist()], pa.string())
        return pa.table({"sig": sigs,
                         "domain_key": t.column("domain_key")})

    # distinct (sig, domain): a page duplicated inside one domain counts once
    sd = (docs.select_columns(["spans", "domain_key"])
          .map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)
          .groupby(["sig", "domain_key"]).count()
          .drop_columns(["count()"])).materialize()

    fan = sd.groupby("sig").count().rename_columns({"count()": "n_domains"})

    def keep_multi(t: pa.Table) -> pa.Table:
        n = t.column("n_domains")
        over = pc.sum(pc.cast(pc.greater(n, _MIRROR_FANOUT_CAP),
                              pa.int64())).as_py() or 0
        if over:
            print(f"[mirror_domains] dropped {over} sigs over the "
                  f"{_MIRROR_FANOUT_CAP}-domain fan-out cap")
        mask = pc.and_(pc.greater_equal(n, 2),
                       pc.less_equal(n, _MIRROR_FANOUT_CAP))
        return t.filter(mask).select(["sig"])

    multi = drop_empty_blocks(
        fan.map_batches(keep_multi, batch_format="pyarrow")).materialize()

    pairs_left = drop_empty_blocks(sd.join(
        multi, join_type="inner", num_partitions=join_parts(), on=("sig",)))
    right = pairs_left.rename_columns({"domain_key": "domain_b"})
    both = pairs_left.rename_columns({"domain_key": "domain_a"}).join(
        right, join_type="inner", num_partitions=join_parts(), on=("sig",))

    def ordered(t: pa.Table) -> pa.Table:
        m = pc.less(t.column("domain_a"), t.column("domain_b"))
        f = t.filter(m)
        return pa.table({"domain_a": f.column("domain_a"),
                         "domain_b": f.column("domain_b"),
                         "one": pa.array([1] * f.num_rows, pa.int64())})

    agg = (drop_empty_blocks(both.map_batches(ordered, batch_format="pyarrow"))
           .groupby(["domain_a", "domain_b"])
           .aggregate(Sum("one", alias_name="n_shared")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({"domain_a": t.column("domain_a"),
                         "domain_b": t.column("domain_b"),
                         "n_shared": pc.cast(t.column("n_shared"),
                                             pa.int64())})

    return drop_empty_blocks(agg).map_batches(pin, batch_format="pyarrow")


_ROBOTS_WAVE_UNITS = 48


def q_robots_rules(sf_dir: str) -> pa.Table:
    """Distributed robots.txt discovery (north rule: "robots.txt +
    crawl-delay"): fetch + RFC 9309-parse every domain's robots.txt via
    the synthetic transport, fold to the effective per-domain policy the
    scheduler enforces. One tiny fetch per registered domain — O(domains)
    rows total, so the driver-side fold is bounded (stages/robots.py
    scale notes). The DuckDB oracle re-parses the same robots texts from
    scratch in SQL (group resolution via window functions), so the
    engine's parser is checked against an independent implementation."""
    from ..stages.robots import fetch_robots_rules
    from ..synthweb import robots_text_for

    web, _ = _cfg_for(sf_dir)
    domains = [f"{e}.test" for e in web.entities()]
    tbl = fetch_robots_rules(
        domains, lambda d: robots_text_for(web, d.removesuffix(".test")))
    doms, dis_s, units, budget = [], [], [], []
    for row in sorted(tbl.to_pylist(), key=lambda r: r["domain"]):
        doms.append(row["domain"])
        dis_s.append(",".join(row["disallow"]))
        u = max(1, round(row["crawl_delay"]))
        units.append(u)
        budget.append(max(1, _ROBOTS_WAVE_UNITS // u))
        assert row["n_wildcard"] == 0   # synthetic web emits plain prefixes
    return pa.table({
        "domain": pa.array(doms, pa.string()),
        "disallow": pa.array(dis_s, pa.string()),
        "crawl_delay_units": pa.array(units, pa.int64()),
        "budget_per_wave": pa.array(budget, pa.int64()),
    })


def robots_rules_oracle_sql() -> str:
    """DuckDB re-implementation of the robots parse over the gate tier's
    robots texts (embedded as VALUES): comment strip, governing-group
    resolution (specific agent beats ``*``) via IGNORE NULLS window,
    Disallow/Crawl-delay extraction — independent of functions/robots.py."""
    from ..synthweb import robots_text_for

    web, _ = _cfg_for(_ORACLE_TIER)
    vals = ",\n  ".join(
        "('{}.test', '{}')".format(
            e, robots_text_for(web, e).replace("'", "''").replace("\n", "\\n"))
        for e in web.entities())
    return rf"""
WITH robots(domain, txt) AS (VALUES
  {vals}),
split AS (
  SELECT domain, unnest(string_split(replace(txt, '\n', chr(10)), chr(10))) AS raw,
         generate_subscripts(string_split(replace(txt, '\n', chr(10)), chr(10)), 1) AS ln
  FROM robots),
lines AS (SELECT domain, ln, trim(regexp_replace(raw, '#.*$', '')) AS line FROM split),
tagged AS (
  SELECT domain, ln, line,
         CASE WHEN regexp_matches(line, '(?i)^user-agent:')
              THEN lower(trim(regexp_extract(line, '(?i)^user-agent:(.*)$', 1)))
         END AS ua
  FROM lines),
grouped AS (
  SELECT domain, ln, line,
         last_value(ua IGNORE NULLS) OVER (
             PARTITION BY domain ORDER BY ln
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS agent
  FROM tagged),
chosen AS (
  SELECT domain,
         CASE WHEN bool_or(agent = 'graftbot') THEN 'graftbot' ELSE '*' END AS agent
  FROM grouped WHERE agent IS NOT NULL GROUP BY domain),
gov AS (SELECT g.* FROM grouped g JOIN chosen c
          ON g.domain = c.domain AND g.agent = c.agent),
dis AS (
  SELECT domain, string_agg(trim(regexp_extract(line, '(?i)^disallow:(.*)$', 1)),
                            ',' ORDER BY ln) AS disallow
  FROM gov WHERE regexp_matches(line, '(?i)^disallow:')
       AND trim(regexp_extract(line, '(?i)^disallow:(.*)$', 1)) <> ''
  GROUP BY domain),
delay AS (
  SELECT domain,
         CAST(max(CAST(regexp_extract(line, '(?i)^crawl-delay:\s*([0-9]+)', 1)
                       AS BIGINT)) AS BIGINT) AS d
  FROM gov WHERE regexp_matches(line, '(?i)^crawl-delay:') GROUP BY domain)
SELECT r.domain, coalesce(dis.disallow, '') AS disallow,
       delay.d AS crawl_delay_units,
       CAST(greatest(1, {_ROBOTS_WAVE_UNITS} // delay.d) AS BIGINT) AS budget_per_wave
FROM robots r LEFT JOIN dis USING(domain) JOIN delay USING(domain)
"""


def q_sitemap_seeds(sf_dir: str) -> rd.Dataset:
    """Seed discovery via the sitemaps.org protocol: per domain, fetch
    robots.txt -> Sitemap lines -> sitemap XML (two-level sitemapindex
    fan-out for every fourth entity) -> distinct page URLs. One parallel
    map over domains (stages/sitemap.py); the DuckDB oracle re-walks the
    same robots + XML documents with regex extraction — an independent
    implementation of the whole discovery chain."""
    from ..stages.sitemap import discover_sitemap_seeds
    from ..synthweb import serve_meta

    web, _ = _cfg_for(sf_dir)
    domains = [f"{e}.test" for e in web.entities()]
    return discover_sitemap_seeds(domains, lambda u: serve_meta(web, u))


def sitemap_seeds_oracle_sql() -> str:
    """DuckDB re-implementation of sitemap seed discovery over the gate
    tier's embedded robots + sitemap documents."""
    from ..synthweb import robots_text_for, sitemap_xml_for

    web, _ = _cfg_for(_ORACLE_TIER)

    def esc(s: str) -> str:
        return s.replace("'", "''").replace("\n", "\\n")

    robots_vals = ",\n  ".join(
        f"('{e}.test', '{esc(robots_text_for(web, e))}')"
        for e in web.entities())
    smap_rows = []
    for e in web.entities():
        for u in (f"http://www.{e}.test/sitemap.xml",
                  f"http://www.{e}.test/sitemap-pages.xml",
                  f"http://www.{e}.test/sitemap-items.xml"):
            xml = sitemap_xml_for(web, u)
            if xml is not None:
                smap_rows.append(f"('{u}', '{esc(xml)}')")
    smap_vals = ",\n  ".join(smap_rows)
    return rf"""
WITH robots(domain, txt) AS (VALUES
  {robots_vals}),
smaps(url, xml) AS (VALUES
  {smap_vals}),
rl AS (
  SELECT domain,
         trim(regexp_replace(unnest(string_split(replace(txt, '\n', chr(10)),
                                                 chr(10))), '#.*$', '')) AS line
  FROM robots),
sm0 AS (
  SELECT domain, trim(regexp_extract(line, '(?i)^sitemap:(.*)$', 1)) AS surl
  FROM rl WHERE regexp_matches(line, '(?i)^sitemap:')),
lvl0 AS (SELECT sm0.domain, s.xml FROM sm0 JOIN smaps s ON s.url = sm0.surl),
kids AS (
  SELECT domain, unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS loc
  FROM lvl0 WHERE xml LIKE '%<sitemapindex%'),
lvl1 AS (SELECT kids.domain, s.xml FROM kids JOIN smaps s ON s.url = kids.loc),
leaves AS (
  SELECT domain, xml FROM lvl0 WHERE xml NOT LIKE '%<sitemapindex%'
  UNION ALL
  SELECT domain, xml FROM lvl1)
SELECT DISTINCT domain, url FROM (
  SELECT domain,
         unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS url
  FROM leaves)
"""


def q_geocode_grid(sf_dir: str) -> "pa.Table":
    """Geocode converter sweep over a fixed in-China grid + out-of-China
    points (rows-only; golden values pinned by tests/test_geocode.py)."""
    import numpy as np

    from ..functions.geocode import (
        bd09_to_gcj02, gcj02_to_bd09, gcj02_to_wgs84, wgs84_to_gcj02,
    )

    from .common import round_half_away as _rha

    def _r6(x):
        return _rha(x, 6)

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
        "gcj_lng": _r6(g_lng), "gcj_lat": _r6(g_lat),
        "bd_lng": _r6(b_lng), "bd_lat": _r6(b_lat),
        "back_wgs_lng": _r6(w_lng), "back_wgs_lat": _r6(w_lat),
        "back_gcj_lng": _r6(r_lng), "back_gcj_lat": _r6(r_lat),
    })


# ---------------------------------------------------------------------------
# Sequential-oracle crawl fixtures for the driver gate.
#
# The driver compares queries() against oracle_sql() at sf=0.01. The
# crawl is not SQL-expressible, but its ground truth IS independently
# computable: the sequential oracle crawler (scraper_ray/oracle.py —
# reference semantics, no Ray). ensure_oracle_fixtures() runs it for the
# sf0.01 tier and writes docs/spans parquets under /tmp; the crawl_* and
# listing_* oracle SQL read those files, so the driver's DuckDB compare
# checks the distributed engine end-to-end against the independent
# implementation (exactly what tests/test_crawl_conformance.py asserts,
# surfaced through the driver's gate).
# ---------------------------------------------------------------------------

_ORACLE_TIER = "sf0.01"
_ORACLE_ROOT = "/tmp/scraper_ray_oracle"

# Queries whose oracle SQL embeds gate-tier fixtures or constants (the
# sequential-crawl parquets, inlined IVF centroids) — correctness
# harnesses must run these at the gate tier regardless of the sf_dir
# under test. Single source of truth shared by tests/test_pipelines.py
# and tools/check_oracles.py so the two lists cannot drift.
PINNED_QUERIES = frozenset({
    "crawl_docs", "crawl_spans", "span_stats", "domain_stats",
    "listing_detail",
    "listing_info", "ann_ivf_topk", "ann_recall", "corpus_build",
    "corpus_neardedup", "paragraph_dedup", "media_dedup",
    "media_alignment", "semdedup", "cluster_purity",
    "robots_rules",
    "link_pagerank", "link_trustrank", "link_bfs", "link_triangles",
    "crawl_budget",
    "sitemap_seeds", "recrawl_diff", "anchor_text", "link_degree",
    "link_hits", "url_patterns", "mirror_domains",
    "warc_cdx", "warc_readback", "incremental_crawl",
    "revisit_priority", "link_components", "host_graph",
    # generated oracles whose inlined constants (PQ codebooks, the
    # IVF-PQ LUT, the BPE merge table) derive from the gate tier's
    # fixture files — tier-pinned like ann_ivf_topk/semdedup
    "ann_pq", "ann_ivf_pq_topk", "bpe_encode",
})
ORACLE_DOCS_PATH = f"{_ORACLE_ROOT}/{_ORACLE_TIER}/docs.parquet"
ORACLE_SPANS_PATH = f"{_ORACLE_ROOT}/{_ORACLE_TIER}/spans.parquet"
ORACLE_EDGES_PATH = f"{_ORACLE_ROOT}/{_ORACLE_TIER}/edges.parquet"
ORACLE_SPANS_REV1_PATH = f"{_ORACLE_ROOT}/{_ORACLE_TIER}/spans_rev1.parquet"
ORACLE_DOCS_REV1_PATH = f"{_ORACLE_ROOT}/{_ORACLE_TIER}/docs_rev1.parquet"
ORACLE_ANCHORS_PATH = f"{_ORACLE_ROOT}/{_ORACLE_TIER}/anchors.parquet"
ORACLE_INCR_DOCS_PATH = f"{_ORACLE_ROOT}/{_ORACLE_TIER}/docs_incr.parquet"


def _docs_spans_tables(res) -> tuple[pa.Table, pa.Table]:
    doc_cols = ["doc_id", "url", "entity", "page_type", "domain_key",
                "depth", "parent_id", "child_idx", "path", "n_attempts"]
    docs_tbl = pa.table({
        **{c: [d[c] for d in res.docs] for c in doc_cols},
        "depth": pa.array([d["depth"] for d in res.docs], pa.int32()),
        "child_idx": pa.array([d["child_idx"] for d in res.docs], pa.int32()),
        "n_attempts": pa.array([d["n_attempts"] for d in res.docs], pa.int32()),
    })
    s_cols: dict[str, list] = {"doc_id": [], "kind": [], "text": [],
                               "media_ref": [], "offset": []}
    for d in res.docs:
        for s in d["spans"]:
            s_cols["doc_id"].append(d["doc_id"])
            s_cols["kind"].append(s["kind"])
            s_cols["text"].append(s["text"])
            s_cols["media_ref"].append(s["media_ref"])
            s_cols["offset"].append(s["offset"])
    spans_tbl = pa.table({
        "doc_id": pa.array(s_cols["doc_id"], pa.string()),
        "kind": pa.array(s_cols["kind"], pa.string()),
        "text": pa.array(s_cols["text"], pa.string()),
        "media_ref": pa.array(s_cols["media_ref"], pa.string()),
        "offset": pa.array(s_cols["offset"], pa.int32()),
    })
    return docs_tbl, spans_tbl


def anchor_text_for_slot(spans: list, slot: int) -> str:
    """The anchor text of child link *slot* on a list page: the item
    span at the same DOM slot, or the literal next-page label for the
    trailing pagination link. Shared by the engine stage and the
    sequential fixture writer so both derive the same anchors from a
    page's (children, spans) contract."""
    if slot < len(spans):
        s = spans[slot]
        kind = s["kind"] if isinstance(s, dict) else s.kind
        text = s["text"] if isinstance(s, dict) else s.text
        if kind == "text":
            return text
    return "next page"


def ensure_oracle_fixtures() -> None:
    """Run the sequential oracle crawler for the driver-gate tier and
    write its docs + exploded spans as parquet (atomic rename), for
    revision 0 and revision 1 of the web (the recrawl-diff oracle
    inputs), plus the rev-0 link-edge and anchor-text fixtures."""
    from dataclasses import replace

    import pyarrow.parquet as pq

    from ..oracle import crawl_oracle
    from ..synthweb import default_politeness, gen_seeds

    out_dir = os.path.dirname(ORACLE_DOCS_PATH)
    os.makedirs(out_dir, exist_ok=True)
    web, n_seeds = _cfg_for(_ORACLE_TIER)
    pol = default_politeness(web, wave_units=48)
    seeds = gen_seeds(web, n_seeds)
    res = crawl_oracle(seeds, web, pol)
    docs_tbl, spans_tbl = _docs_spans_tables(res)
    # revision 1: same seeds + politeness, mutated content/URL set
    res1 = crawl_oracle(seeds, replace(web, rev=1), pol)
    docs1_tbl, spans1_tbl = _docs_spans_tables(res1)
    # incremental-crawl ground truth: rev-1 sequential crawl with rev-0's
    # detail-page URLs pre-seen (q_incremental_crawl's oracle input)
    pre = {d["url"] for d in res.docs if d["page_type"] == "detail"}
    res_inc = crawl_oracle(seeds, replace(web, rev=1), pol, pre_seen=pre)
    incr_tbl = pa.table({
        "url": pa.array([d["url"] for d in res_inc.docs], pa.string()),
        "page_type": pa.array([d["page_type"] for d in res_inc.docs],
                              pa.string()),
        "depth": pa.array([d["depth"] for d in res_inc.docs], pa.int64()),
    })

    # distinct internal link edges + per-link anchor text, independently
    # derived from the sequential crawler's doc set (oracle inputs for
    # graph.q_link_pagerank / q_link_degree / q_anchor_text)
    from ..canonicalize import canonicalize_url, doc_id_for
    from ..synthweb import fetch_page

    ids = {d["doc_id"] for d in res.docs}
    edge_set: set[tuple[str, str]] = set()
    a_src: list[str] = []
    a_dst: list[str] = []
    a_txt: list[str] = []
    for d in res.docs:
        page = fetch_page(d["url"], web)
        for slot, raw in enumerate(page.child_urls):
            cu = canonicalize_url(raw)
            if cu is None or (dst := doc_id_for(cu)) not in ids:
                continue
            edge_set.add((d["doc_id"], dst))
            a_src.append(d["doc_id"])
            a_dst.append(dst)
            a_txt.append(anchor_text_for_slot(page.spans, slot))
    edges_sorted = sorted(edge_set)
    edges_tbl = pa.table({
        "src": pa.array([e[0] for e in edges_sorted], pa.string()),
        "dst": pa.array([e[1] for e in edges_sorted], pa.string()),
    })
    anchors_tbl = pa.table({
        "src": pa.array(a_src, pa.string()),
        "dst": pa.array(a_dst, pa.string()),
        "anchor": pa.array(a_txt, pa.string()),
    })
    for tbl, path in ((docs_tbl, ORACLE_DOCS_PATH),
                      (spans_tbl, ORACLE_SPANS_PATH),
                      (edges_tbl, ORACLE_EDGES_PATH),
                      (docs1_tbl, ORACLE_DOCS_REV1_PATH),
                      (spans1_tbl, ORACLE_SPANS_REV1_PATH),
                      (anchors_tbl, ORACLE_ANCHORS_PATH),
                      (incr_tbl, ORACLE_INCR_DOCS_PATH)):
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)


# ---------------------------------------------------------------------------
# DuckDB oracle for the geocode grid — the datum-conversion formulas
# (functions/geocode.py) re-expressed as SQL with identical operation
# order, so both sides evaluate the same IEEE-754 double expressions.
# The SQL is generated programmatically to keep the two deltas (one per
# input datum) consistent with the numpy kernels.
# ---------------------------------------------------------------------------

_EE_S = "0.00669342162296594323"
_A_S = "6378245.0"
_XPI = "(pi() * 3000.0 / 180.0)"


def _delta_cols(lng: str, lat: str, tag: str) -> str:
    """SQL computed columns mirroring geocode._delta({lng}, {lat})."""
    x = f"({lng} - 105.0)"
    y = f"({lat} - 35.0)"
    tlat = (f"(-100.0 + 2.0*{x} + 3.0*{y} + 0.2*{y}*{y} + 0.1*{x}*{y} "
            f"+ 0.2*sqrt(abs({x}))) "
            f"+ (20.0*sin(6.0*{x}*pi()) + 20.0*sin(2.0*{x}*pi())) * 2.0 / 3.0 "
            f"+ (20.0*sin({y}*pi()) + 40.0*sin({y}/3.0*pi())) * 2.0 / 3.0 "
            f"+ (160.0*sin({y}/12.0*pi()) + 320.0*sin({y}*pi()/30.0)) * 2.0 / 3.0")
    tlng = (f"(300.0 + {x} + 2.0*{y} + 0.1*{x}*{x} + 0.1*{x}*{y} "
            f"+ 0.1*sqrt(abs({x}))) "
            f"+ (20.0*sin(6.0*{x}*pi()) + 20.0*sin(2.0*{x}*pi())) * 2.0 / 3.0 "
            f"+ (20.0*sin({x}*pi()) + 40.0*sin({x}/3.0*pi())) * 2.0 / 3.0 "
            f"+ (150.0*sin({x}/12.0*pi()) + 300.0*sin({x}/30.0*pi())) * 2.0 / 3.0")
    radlat = f"({lat} / 180.0 * pi())"
    magic = f"(1 - {_EE_S} * sin({radlat}) * sin({radlat}))"
    dlat = (f"(({tlat}) * 180.0) / (({_A_S} * (1 - {_EE_S})) "
            f"/ ({magic} * sqrt({magic})) * pi())")
    dlng = (f"(({tlng}) * 180.0) / ({_A_S} / sqrt({magic}) "
            f"* cos({radlat}) * pi())")
    ooc = (f"NOT (72.004 <= {lng} AND {lng} <= 137.8347 "
           f"AND 0.8293 <= {lat} AND {lat} <= 55.8271)")
    return (f"{dlng} AS dlng_{tag}, {dlat} AS dlat_{tag}, "
            f"({ooc}) AS ooc_{tag}")


def geocode_grid_oracle_sql() -> str:
    return f"""
WITH grid AS (
  SELECT 74.0 + i * 5.0 AS lng, 19.0 + j * 4.25 AS lat
  FROM range(0, 13) t1(i) CROSS JOIN range(0, 9) t2(j)
  UNION ALL SELECT * FROM (VALUES (10.0, 50.0), (-74.0, 40.7)) v(lng, lat)
),
d1 AS (SELECT lng, lat, {_delta_cols('lng', 'lat', 'w')} FROM grid),
g1 AS (SELECT lng, lat,
         CASE WHEN ooc_w THEN lng ELSE lng + dlng_w END AS glng,
         CASE WHEN ooc_w THEN lat ELSE lat + dlat_w END AS glat
       FROM d1),
d2 AS (SELECT *, {_delta_cols('glng', 'glat', 'g')} FROM g1),
w2 AS (SELECT lng, lat, glng, glat,
         CASE WHEN ooc_g THEN glng ELSE glng * 2 - (glng + dlng_g) END AS wlng,
         CASE WHEN ooc_g THEN glat ELSE glat * 2 - (glat + dlat_g) END AS wlat
       FROM d2),
bd AS (SELECT *,
         sqrt(glng * glng + glat * glat) + 0.00002 * sin(glat * {_XPI}) AS bz,
         atan2(glat, glng) + 0.000003 * cos(glng * {_XPI}) AS btheta
       FROM w2),
bd2 AS (SELECT *,
         bz * cos(btheta) + 0.0065 AS blng,
         bz * sin(btheta) + 0.006 AS blat
        FROM bd),
rg AS (SELECT *,
         sqrt((blng - 0.0065) * (blng - 0.0065)
              + (blat - 0.006) * (blat - 0.006))
           - 0.00002 * sin((blat - 0.006) * {_XPI}) AS rz,
         atan2(blat - 0.006, blng - 0.0065)
           - 0.000003 * cos((blng - 0.0065) * {_XPI}) AS rtheta
       FROM bd2)
SELECT lng, lat,
       round(glng, 6) AS gcj_lng, round(glat, 6) AS gcj_lat,
       round(blng, 6) AS bd_lng, round(blat, 6) AS bd_lat,
       round(wlng, 6) AS back_wgs_lng, round(wlat, 6) AS back_wgs_lat,
       round(rz * cos(rtheta), 6) AS back_gcj_lng,
       round(rz * sin(rtheta), 6) AS back_gcj_lat
FROM rg
"""


ORACLE_SQL = {
    "geocode_grid": geocode_grid_oracle_sql(),
    "robots_rules": robots_rules_oracle_sql(),
    "sitemap_seeds": sitemap_seeds_oracle_sql(),
    "crawl_docs": f"""
SELECT doc_id, url, entity, page_type, domain_key, depth, parent_id,
       child_idx, path, n_attempts
FROM read_parquet('{ORACLE_DOCS_PATH}')
""",
    "crawl_spans": f"""
SELECT doc_id, kind, text, media_ref, "offset"
FROM read_parquet('{ORACLE_SPANS_PATH}')
""",
    "span_stats": f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_text,
       CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_media,
       CAST(sum(CASE WHEN kind = 'text' THEN length(text) ELSE 0 END)
           AS BIGINT) AS text_chars,
       CAST(count(DISTINCT CASE WHEN kind = 'media' THEN media_ref END)
           AS BIGINT) AS n_media_refs
FROM read_parquet('{ORACLE_SPANS_PATH}')
GROUP BY doc_id
""",
    "url_patterns": f"""
SELECT domain_key, regexp_replace(url, '[0-9]+', 'N', 'g') AS url_pattern,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT entity) AS BIGINT) AS n_entities,
       CAST(max(depth) AS BIGINT) AS max_depth
FROM read_parquet('{ORACLE_DOCS_PATH}')
GROUP BY domain_key, url_pattern
""",
    # same md5 span serialization as recrawl_diff; the BETWEEN clause
    # mirrors the engine's _MIRROR_FANOUT_CAP pair-blowup bound
    "mirror_domains": f"""
WITH ds AS (
  SELECT d.doc_id, d.domain_key,
         md5(string_agg(s.kind || '|' || s.text || '|' || s.media_ref,
                        chr(10) ORDER BY s."offset")) AS sig
  FROM read_parquet('{ORACLE_DOCS_PATH}') d
  JOIN read_parquet('{ORACLE_SPANS_PATH}') s USING (doc_id)
  GROUP BY d.doc_id, d.domain_key),
sd AS (SELECT DISTINCT sig, domain_key FROM ds),
multi AS (SELECT sig FROM sd GROUP BY sig
          HAVING count(*) BETWEEN 2 AND {_MIRROR_FANOUT_CAP})
SELECT a.domain_key AS domain_a, b.domain_key AS domain_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM sd a
JOIN sd b ON a.sig = b.sig AND a.domain_key < b.domain_key
JOIN multi m ON m.sig = a.sig
GROUP BY a.domain_key, b.domain_key
""",
    "domain_stats": f"""
SELECT domain_key,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN page_type = 'detail' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_detail,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(sum(n_attempts) AS BIGINT) AS n_attempts
FROM read_parquet('{ORACLE_DOCS_PATH}')
GROUP BY domain_key
""",
    # same fingerprint serialization as _content_sigs: kind|text|media_ref
    # rows joined by newline in span-offset order, md5-hashed per doc
    "recrawl_diff": f"""
WITH sig0 AS (
  SELECT d.url,
         md5(string_agg(s.kind || '|' || s.text || '|' || s.media_ref,
                        chr(10) ORDER BY s."offset")) AS sig
  FROM read_parquet('{ORACLE_DOCS_PATH}') d
  JOIN read_parquet('{ORACLE_SPANS_PATH}') s USING (doc_id)
  GROUP BY d.url),
sig1 AS (
  SELECT d.url,
         md5(string_agg(s.kind || '|' || s.text || '|' || s.media_ref,
                        chr(10) ORDER BY s."offset")) AS sig
  FROM read_parquet('{ORACLE_DOCS_REV1_PATH}') d
  JOIN read_parquet('{ORACLE_SPANS_REV1_PATH}') s USING (doc_id)
  GROUP BY d.url)
SELECT coalesce(sig0.url, sig1.url) AS url,
       CASE WHEN sig0.url IS NULL THEN 'added'
            WHEN sig1.url IS NULL THEN 'removed'
            WHEN sig0.sig = sig1.sig THEN 'unchanged'
            ELSE 'changed' END AS status
FROM sig0 FULL OUTER JOIN sig1 ON sig0.url = sig1.url
""",
    # sequential oracle crawler re-run with rev-0 detail URLs pre-seen
    "incremental_crawl": f"""
SELECT url, page_type, depth
FROM read_parquet('{ORACLE_INCR_DOCS_PATH}')
""",
    # recrawl diff recomputed from the rev-0/rev-1 fixtures, joined to
    # the (url -> domain) map and aggregated per domain with the same
    # saturating Poisson change-rate estimator as the engine
    "revisit_priority": f"""
WITH sig0 AS (
  SELECT d.url, d.domain_key,
         md5(string_agg(s.kind || '|' || s.text || '|' || s.media_ref,
                        chr(10) ORDER BY s."offset")) AS sig
  FROM read_parquet('{ORACLE_DOCS_PATH}') d
  JOIN read_parquet('{ORACLE_SPANS_PATH}') s USING (doc_id)
  GROUP BY d.url, d.domain_key),
sig1 AS (
  SELECT d.url, d.domain_key,
         md5(string_agg(s.kind || '|' || s.text || '|' || s.media_ref,
                        chr(10) ORDER BY s."offset")) AS sig
  FROM read_parquet('{ORACLE_DOCS_REV1_PATH}') d
  JOIN read_parquet('{ORACLE_SPANS_REV1_PATH}') s USING (doc_id)
  GROUP BY d.url, d.domain_key),
diff AS (
  SELECT coalesce(sig0.domain_key, sig1.domain_key) AS domain_key,
         CASE WHEN sig0.url IS NULL THEN 'added'
              WHEN sig1.url IS NULL THEN 'removed'
              WHEN sig0.sig = sig1.sig THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM sig0 FULL OUTER JOIN sig1 ON sig0.url = sig1.url),
agg AS (
  SELECT domain_key,
         CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
  FROM diff GROUP BY domain_key)
SELECT domain_key, n_added, n_removed, n_changed, n_unchanged,
       CASE WHEN n_changed = n_changed + n_unchanged
            THEN ln(CAST(n_changed + n_unchanged AS DOUBLE) + 1.0)
            ELSE -ln(1.0 - CAST(n_changed AS DOUBLE)
                           / CAST(n_changed + n_unchanged AS DOUBLE))
       END AS change_rate
FROM agg
""",
}

QUERIES = {
    "crawl_docs": q_crawl_docs,
    "crawl_spans": q_crawl_spans,
    "span_stats": q_span_stats,
    "domain_stats": q_domain_stats,
    "url_patterns": q_url_patterns,
    "mirror_domains": q_mirror_domains,
    "recrawl_diff": q_recrawl_diff,
    "incremental_crawl": q_incremental_crawl,
    "revisit_priority": q_revisit_priority,
    "geocode_grid": q_geocode_grid,
    "robots_rules": q_robots_rules,
    "sitemap_seeds": q_sitemap_seeds,
}
