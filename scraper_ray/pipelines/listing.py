"""Detail/info two-table split over crawled docs (reference core shape).

The reference accumulates exactly two tables per site — ``df`` (detail
rows; one per rentable unit) and ``info`` (one per property)
(handlers/scrapers.py:24) — then uploads them with last-write-wins
dedupe on ``Source_ID`` (handlers/db.py:38-54) and clamps every string
to the sink width (utils/utility_commons.py:124-130). This module
re-expresses that tail as Ray Data stages over the crawl's doc table:

- detail rows come from ``detail`` pages: ``source_id = entity_itemid``
  (diandianzu.py:82), first text span -> title, media span -> photo,
  parent list page propagated as property id (J1 denormalized join,
  diandianzu.py:83-85);
- info rows come from ``list`` pages (one per entity page -> rolled up
  per entity);
- ``dedupe_last_wins`` = groupby(source_id) keep max timestamp/seq —
  the J5 sink anti-join delete expressed as a shuffle;
- ``clamp_strings`` = utf8 slice at 250 chars (M10).
"""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

MAX_COL = 250   # DB['MAX_COL_SIZE'] parity (utility_commons.py:37)


def clamp_strings(tbl: pa.Table, limit: int = MAX_COL) -> pa.Table:
    """Truncate every string column to *limit* chars (M10)."""
    for i, field in enumerate(tbl.schema):
        if pa.types.is_string(field.type) or pa.types.is_large_string(field.type):
            tbl = tbl.set_column(
                i, field.name,
                pc.utf8_slice_codeunits(tbl.column(i), 0, limit))
    return tbl


def split_detail_info(docs: rd.Dataset, stamp: str = "2024-01-01"
                      ) -> tuple[rd.Dataset, rd.Dataset]:
    """Crawl docs -> (detail, info) datasets, reference semantics."""

    def detail_rows(t: pa.Table) -> pa.Table:
        # vectorized: filter to detail pages, flatten spans once, and
        # derive every column with Arrow kernels + bincount — no Python
        # loop over rows or spans
        import numpy as np

        from .common import flat_spans

        t = t.filter(pc.equal(t.column("page_type"), "detail"))
        n = t.num_rows
        # item_id = url.rstrip("/").rsplit("/", 1)[-1]
        item = pc.struct_field(
            pc.extract_regex(t.column("url"), r"(?P<i>[^/]+)/*$"), "i")
        source_id = pc.binary_join_element_wise(
            t.column("entity"), item, "_")
        flat, parents = flat_spans(t)
        par = parents.to_numpy(zero_copy_only=False)
        is_tx = pc.equal(pc.struct_field(flat, "kind"), "text").to_numpy(
            zero_copy_only=False)
        tx_par = par[is_tx]
        tx_txt = pc.struct_field(flat, "text").filter(pa.array(is_tx))
        n_tx = np.bincount(tx_par, minlength=n)
        # within-doc rank of each text span (parents ascend, so rank =
        # position minus the doc's first position)
        starts = np.concatenate(([0], np.cumsum(n_tx)))[:-1]
        rank = np.arange(len(tx_par)) - starts[tx_par] if len(tx_par) \
            else np.array([], dtype=np.int64)
        # title = first text span (docs with none -> "")
        title = np.full(n, "", dtype=object)
        first = rank == 0
        title[tx_par[first]] = np.asarray(
            tx_txt.to_numpy(zero_copy_only=False))[first]
        # photo = first media span's ref
        md_par = par[~is_tx]
        md_ref = pc.struct_field(flat, "media_ref").filter(
            pa.array(~is_tx))
        n_md = np.bincount(md_par, minlength=n)
        md_first = (np.arange(len(md_par))
                    - np.concatenate(([0], np.cumsum(n_md)))[:-1][md_par]
                    == 0) if len(md_par) else np.array([], dtype=bool)
        photo = np.full(n, "", dtype=object)
        photo[md_par[md_first]] = np.asarray(
            md_ref.to_numpy(zero_copy_only=False))[md_first]
        # open-ended scraped attributes in one packed string column —
        # the fixed-schema answer to the reference's NVARCHAR schema
        # evolution (db.py:108-119). A plain string (not map<k,v>):
        # map columns defeat Ray's schema dedup (hash spam) and SQL
        # comparators; 'k=v;k=v' keeps keys open and stays comparable.
        # Built vectorized: 'f{rank-1}={text}' parts for rank >= 1,
        # regrouped into per-doc lists and joined with ';'
        tail = rank >= 1
        idx_str = pc.cast(pa.array((rank[tail] - 1).astype(np.int64)),
                          pa.string())
        kv = pc.binary_join_element_wise(
            pc.binary_join_element_wise(pa.scalar("f"), idx_str,
                                        pa.scalar("")),
            tx_txt.filter(pa.array(tail)),
            "=")
        tail_counts = np.bincount(tx_par[tail], minlength=n)
        offs = np.concatenate(([0], np.cumsum(tail_counts))).astype(
            np.int32)
        extras = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kv), ";")
        return clamp_strings(pa.table({
            "source_id": source_id,
            "entity": t.column("entity"),
            "property_id": t.column("parent_id"),   # J1 propagation
            "title": pa.array(title, pa.string()),
            "photo": pa.array(photo, pa.string()),
            "n_text_spans": pa.array(n_tx.astype(np.int32), pa.int32()),
            "timestamp": pa.array([stamp] * n, pa.string()),  # M8
            "crawl_path": t.column("path"),
            "extras": extras,
        }))

    def info_rows(t: pa.Table) -> pa.Table:
        # vectorized: filter to list pages, regex-extract the numeric
        # page (lexicographic page_url breaks at p10: 'p9/' > 'p10/'),
        # count text spans per doc via bincount — no Python row loop.
        # entity-level key: pages of the same entity COLLIDE here, so
        # dedupe_last_wins keeps the newest page per property — the
        # reference's one-info-row-per-property upsert (db.py:38-54)
        import numpy as np

        from .common import flat_spans

        t = t.filter(pc.equal(t.column("page_type"), "list"))
        n = t.num_rows
        no = pc.struct_field(
            pc.extract_regex(t.column("url"), r"p(?P<no>\d+)/$"), "no")
        page_no = pc.fill_null(pc.cast(no, pa.int32()), 0)
        flat, parents = flat_spans(t)
        is_tx = pc.equal(pc.struct_field(flat, "kind"), "text").to_numpy(
            zero_copy_only=False)
        n_items = np.bincount(
            parents.to_numpy(zero_copy_only=False)[is_tx], minlength=n)
        return clamp_strings(pa.table({
            "source_id": t.column("entity"),
            "entity": t.column("entity"),
            "page_url": t.column("url"),
            "page_no": page_no,
            "n_items": pa.array(n_items.astype(np.int32), pa.int32()),
            "timestamp": pa.array([stamp] * n, pa.string()),
        }))

    detail = docs.map_batches(detail_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    info = docs.map_batches(info_rows, batch_format="pyarrow",
                            zero_copy_batch=True)
    return detail, info


def dedupe_last_wins(ds: rd.Dataset, key: str = "source_id",
                     order_col: str = "crawl_path") -> rd.Dataset:
    """Sink dedupe, J5 semantics: for colliding keys the latest-written
    row wins (reference deletes old rows then inserts the new batch,
    db.py:38-54). 'Latest' here = max order_col, deterministic.
    Vectorized via keep_max_by (per-batch partial keep-max + Max
    aggregate + semi join) — no per-key pandas dispatch."""
    from .relational import keep_max_by

    return keep_max_by(ds, key, order_col)


def q_listing_detail(sf_dir: str) -> rd.Dataset:
    from .crawl_queries import _run_crawl

    detail, _ = split_detail_info(_run_crawl(sf_dir))
    return dedupe_last_wins(detail)


def q_listing_info(sf_dir: str) -> rd.Dataset:
    from .crawl_queries import _run_crawl

    _, info = split_detail_info(_run_crawl(sf_dir))
    return dedupe_last_wins(info, order_col="page_no")


# ---------------------------------------------------------------------------
# DuckDB oracles: the same listing tail expressed in SQL over the
# *sequential oracle crawler's* docs/spans parquet (written by
# crawl_queries.ensure_oracle_fixtures for the driver-gate tier), so the
# distributed crawl + listing pipeline is checked end-to-end against an
# independent implementation.
# ---------------------------------------------------------------------------

def _listing_oracle_sql() -> dict[str, str]:
    from .crawl_queries import ORACLE_DOCS_PATH, ORACLE_SPANS_PATH

    base = f"""
WITH docs AS (SELECT * FROM read_parquet('{ORACLE_DOCS_PATH}')),
spans AS (SELECT * FROM read_parquet('{ORACLE_SPANS_PATH}'))
"""
    detail = base + """
, agg AS (
  SELECT d.doc_id, d.entity, d.parent_id, d.path, d.url,
         coalesce(list(s.text ORDER BY s.offset)
                  FILTER (s.kind = 'text'), []) AS texts,
         coalesce(list(s.media_ref ORDER BY s.offset)
                  FILTER (s.kind = 'media'), []) AS media
  FROM docs d LEFT JOIN spans s ON d.doc_id = s.doc_id
  WHERE d.page_type = 'detail'
  GROUP BY ALL
),
rows_ AS (
  SELECT entity || '_' || regexp_extract(url, '/([^/]+)/$', 1) AS source_id,
         entity,
         parent_id AS property_id,
         CASE WHEN len(texts) > 0 THEN texts[1] ELSE '' END AS title,
         CASE WHEN len(media) > 0 THEN media[1] ELSE '' END AS photo,
         len(texts) AS n_text_spans,
         '2024-01-01' AS timestamp,
         path AS crawl_path,
         array_to_string(list_transform(range(2, len(texts) + 1),
             i -> 'f' || CAST(i - 2 AS VARCHAR) || '=' || texts[i]),
             ';') AS extras
  FROM agg
)
SELECT substr(source_id, 1, 250) AS source_id,
       substr(entity, 1, 250) AS entity,
       substr(property_id, 1, 250) AS property_id,
       substr(title, 1, 250) AS title,
       substr(photo, 1, 250) AS photo,
       n_text_spans,
       substr(timestamp, 1, 250) AS timestamp,
       substr(crawl_path, 1, 250) AS crawl_path,
       substr(extras, 1, 250) AS extras
FROM (SELECT *, row_number() OVER
        (PARTITION BY source_id ORDER BY crawl_path DESC) AS rn FROM rows_)
WHERE rn = 1
"""
    info = base + """
, rows_ AS (
  SELECT d.entity AS source_id, d.entity, d.url AS page_url,
         CAST(regexp_extract(d.url, 'p(\\d+)/$', 1) AS INTEGER) AS page_no,
         (SELECT count(*) FROM spans s
          WHERE s.doc_id = d.doc_id AND s.kind = 'text') AS n_items,
         '2024-01-01' AS timestamp
  FROM docs d WHERE d.page_type = 'list'
)
SELECT source_id, entity, page_url, page_no, n_items, timestamp
FROM (SELECT *, row_number() OVER
        (PARTITION BY source_id ORDER BY page_no DESC) AS rn FROM rows_)
WHERE rn = 1
"""
    return {"listing_detail": detail, "listing_info": info}


ORACLE_SQL = _listing_oracle_sql()

QUERIES = {
    "listing_detail": q_listing_detail,
    "listing_info": q_listing_info,
}
