"""CLI entry point — the ``ray job submit`` surface.

    # crawl the synthetic web (or any seed parquet with url[,seed_idx])
    python -m scraper_ray.cli crawl --out /tmp/docs --checkpoint /tmp/ckpt \
        --seeds 10000 --entities 200 [--resume] [--level-sync global]

    # run one named pipeline from the query registry
    python -m scraper_ray.cli query pricing_summary --sf /root/testdata/sf0.01

On a real cluster this module is the job driver:
``ray job submit -- python -m scraper_ray.cli crawl ...`` — it owns the
Ray session (guarded init), the library never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args: argparse.Namespace) -> None:
    from .crawl import CrawlConfig, crawl
    from .synthweb import (
        WebConfig,
        default_politeness,
        gen_seeds_dataset,
        serve_meta,
    )

    web = WebConfig(seed=args.seed, n_entities=args.entities,
                    items_per_page=args.items_per_page,
                    max_pages_cap=args.max_pages,
                    work_per_page=args.work_per_page)
    if args.discover_robots:
        # fetch + parse each domain's robots.txt into the politeness
        # config instead of the hand-built default (stages/robots.py)
        from .stages.robots import discover_politeness

        pol = discover_politeness(web, wave_units=args.wave_units)
    else:
        pol = default_politeness(web, wave_units=args.wave_units)
    ccfg = CrawlConfig(web=web, politeness=pol, out_dir=args.out,
                       checkpoint_dir=args.checkpoint,
                       n_seen_shards=args.shards, n_sched_shards=args.shards,
                       batch_size=args.batch_size, level_sync=args.level_sync)
    if args.resume:
        seeds = None
    elif args.sitemap_seeds:
        # seed discovery via robots Sitemap lines + sitemap XML
        # (stages/sitemap.py); sorted so seed_idx (= crawl tiebreak
        # order) is deterministic. One URL per sitemap entry — a
        # bounded list, unlike the 10^6 synthetic seed generator
        from .stages.sitemap import discover_sitemap_seeds

        domains = [f"{e}.test" for e in web.entities()]
        found = discover_sitemap_seeds(
            domains, lambda u: serve_meta(web, u)).to_pandas()
        seeds = sorted(found["url"])
    else:
        seeds = gen_seeds_dataset(web, args.seeds)
    stats = crawl(seeds, ccfg, resume=args.resume)
    print(json.dumps({
        "docs": stats.docs, "waves": stats.waves,
        "seen_total": stats.seen_total, "counters": stats.counters,
    }))


def cmd_query(args: argparse.Namespace) -> None:
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    import __ray_entry__ as e

    qs = e.queries()
    if args.name not in qs:
        raise SystemExit(f"unknown query {args.name!r}; "
                         f"available: {', '.join(sorted(qs))}")
    res = qs[args.name](args.sf)
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        if args.out:
            res = res.materialize()   # execute once; write+count reuse blocks
            res.write_parquet(args.out)
            print(json.dumps({"rows": res.count(), "out": args.out}))
        else:
            print(json.dumps({"rows": res.count()}))
    else:
        print(json.dumps({"rows": getattr(res, "num_rows", len(res))}))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="scraper_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--out", required=True)
    c.add_argument("--checkpoint", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--seeds", type=int, default=1000)
    c.add_argument("--entities", type=int, default=50)
    c.add_argument("--items-per-page", type=int, default=8)
    c.add_argument("--max-pages", type=int, default=10)
    c.add_argument("--wave-units", type=int, default=64)
    c.add_argument("--work-per-page", type=int, default=0)
    c.add_argument("--shards", type=int, default=None,
                   help="seen/scheduler shard count (default: one per "
                        "~4 cluster cores; on resume, the checkpoint's)")
    c.add_argument("--batch-size", type=int, default=2048)
    c.add_argument("--level-sync", choices=["domain", "global"], default="domain")
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--discover-robots", action="store_true",
                   help="build politeness from fetched robots.txt")
    c.add_argument("--sitemap-seeds", action="store_true",
                   help="seed from sitemaps discovered via robots.txt")
    c.set_defaults(fn=cmd_crawl)

    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None)
    q.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    _init_ray(args.num_cpus)
    try:
        args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()
