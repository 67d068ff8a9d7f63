"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline on a small deterministic
synthetic web plus the flagship relational aggregate on sf0.001;
``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 (plus the training-data extensions); ``oracle_sql()`` maps
the SQL-expressible ones to DuckDB equivalents over the same tables.

Ray is initialised by the driver before this module is imported — no
ray.init()/ray.shutdown() anywhere in the library or in these callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic-web crawl -> doc table
    (interleaved text+media spans, the input_hint payload)."""
    from scraper_ray.pipelines.crawl_queries import q_crawl_docs

    return q_crawl_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from scraper_ray.pipelines import (
        ann,
        archive,
        corpus,
        crawl_queries,
        dedup,
        enrichment,
        graph,
        listing,
        media,
        packing,
        relational,
        sketch,
        stats,
        temporal,
        text,
        tpch,
        window,
    )

    out: dict[str, Callable[[str], Any]] = {}
    for mod in (relational, dedup, text, ann, enrichment, media,
                crawl_queries, listing, temporal, corpus, stats, graph,
                window, packing, archive, tpch, sketch):
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from scraper_ray.pipelines import (
        ann,
        archive,
        corpus,
        crawl_queries,
        dedup,
        enrichment,
        graph,
        listing,
        media,
        packing,
        relational,
        sketch,
        stats,
        temporal,
        text,
        tpch,
        window,
    )

    # the crawl/listing oracles compare against the sequential oracle
    # crawler's output — generate its parquet fixtures for the gate tier
    crawl_queries.ensure_oracle_fixtures()

    out: dict[str, str] = {}
    for mod in (relational, dedup, text, ann, temporal, crawl_queries,
                listing, enrichment, media, corpus, stats, graph, window,
                packing, archive, tpch, sketch):
        out.update(mod.ORACLE_SQL)
    # generated at call time: inlines the gate tier's k-means centroids
    out["ann_ivf_topk"] = ann.ivf_oracle_sql()
    out["ann_recall"] = ann.ann_recall_oracle_sql()
    out["semdedup"] = ann.semdedup_oracle_sql()
    return out
