"""Row -> API 1:N enrichment join (reference pipeline 3.2, FIXTURES.md F7).

Models ``default_api.query`` (handlers/default_api.py:76-114): every input
row is projected onto request params, the (here: deterministic fake) API
returns 0..3 nested-JSON results per row, each result is recursively
flattened, the input row is echoed back as ``ref_*`` columns, and GCJ-02
coordinates are converted to WGS-84 (amap_api.py:57-61).

Ray-Data shape: a single ``map_batches`` stage — the API client would be
a stateful actor pool (session/signing state in ``__init__``) for a real
endpoint; rows with zero results go to a dead-letter count instead of
vanishing (the reference silently drops them, default_api.py:91-105).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.geocode import gcj02_to_wgs84


PAGE_SIZE = 2


def fake_api_page(keyword: str, city: str, page: int) -> list[dict]:
    """One page of the deterministic fake POI API (pagination surface:
    the reference's client loops ``page += 1`` until an empty response,
    default_api.py:91-112). Page numbers start at 1."""
    all_results = fake_api_results(keyword, city)
    lo = (page - 1) * PAGE_SIZE
    return all_results[lo : lo + PAGE_SIZE]


def fake_api_results(keyword: str, city: str) -> list[dict]:
    """Deterministic fake POI API: 0-3 nested-JSON results per query.

    Hashes are md5-derived (not sha1) so the DuckDB oracle can recompute
    the exact same responses in SQL (common.sql_hex64)."""
    h = int.from_bytes(
        hashlib.md5(f"api:{keyword}:{city}".encode()).digest()[:8], "big"
    )
    n = h % 4
    out = []
    for i in range(n):
        hi = int.from_bytes(
            hashlib.md5(f"api:{keyword}:{city}:{i}".encode()).digest()[:8], "big"
        )
        lng = 73.5 + (hi % 10_000_000) / 10_000_000 * 60.0
        lat = 18.2 + ((hi >> 24) % 10_000_000) / 10_000_000 * 35.0
        out.append(
            {
                "id": f"poi_{hi % 10**10:010d}",
                "name": f"{keyword} {['center','plaza','tower'][i % 3]}",
                "location": f"{lng:.6f},{lat:.6f}",
                "biz_ext": {"rating": str((hi >> 8) % 50 / 10.0),
                            "cost": str((hi >> 16) % 500)},
            }
        )
    return out


def flatten_json(obj: dict, out: dict | None = None) -> dict:
    """Recursive flatten: nested dict keys promoted to the top level
    (semantics of get_nested_value, utility_commons.py:59-68)."""
    out = {} if out is None else out
    for k, v in obj.items():
        if isinstance(v, dict):
            flatten_json(v, out)
        else:
            out[k] = v
    return out


def enrich(queries: rd.Dataset) -> rd.Dataset:
    """Input Dataset(keyword, city) -> one row per API result with
    flattened fields + ref_* echo columns + WGS-84 coordinates."""

    def call(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for kw, city in zip(batch.column("keyword").to_pylist(),
                            batch.column("city").to_pylist()):
            # pagination loop inside the stage (T4): page ascending until
            # an empty page, like the reference's call_api while-loop
            results: list[dict] = []
            page = 1
            while True:
                chunk = fake_api_page(kw, city, page)
                if not chunk:
                    break
                results.extend(chunk)
                page += 1
            for res in results:
                flat = flatten_json(res)
                lng_s, lat_s = flat["location"].split(",")
                wlng, wlat = gcj02_to_wgs84(float(lng_s), float(lat_s))
                from .common import round_half_away

                flat["MapIT_lon"] = float(round_half_away(wlng, 6))
                flat["MapIT_lat"] = float(round_half_away(wlat, 6))
                flat["ref_keyword"] = kw
                flat["ref_city"] = city
                rows.append(flat)
        if not rows:
            return pa.table({
                "id": pa.array([], pa.string()),
                "name": pa.array([], pa.string()),
                "location": pa.array([], pa.string()),
                "rating": pa.array([], pa.string()),
                "cost": pa.array([], pa.string()),
                "MapIT_lon": pa.array([], pa.float64()),
                "MapIT_lat": pa.array([], pa.float64()),
                "ref_keyword": pa.array([], pa.string()),
                "ref_city": pa.array([], pa.string()),
            })
        cols = ["id", "name", "location", "rating", "cost",
                "MapIT_lon", "MapIT_lat", "ref_keyword", "ref_city"]
        return pa.table({c: pa.array([r.get(c) for r in rows]) for c in cols})

    return queries.map_batches(call, batch_format="pyarrow", zero_copy_batch=True)


def dead_letters(queries: rd.Dataset) -> rd.Dataset:
    """Rows the API returned nothing for — the reference silently drops
    these (default_api.py:91-105); here they become an auditable table
    (M14: invalid responses -> dead-letter, not dropped)."""

    def find(batch: pa.Table) -> pa.Table:
        kws, cities = [], []
        for kw, city in zip(batch.column("keyword").to_pylist(),
                            batch.column("city").to_pylist()):
            if not fake_api_results(kw, city):
                kws.append(kw)
                cities.append(city)
        return pa.table({"ref_keyword": pa.array(kws, pa.string()),
                         "ref_city": pa.array(cities, pa.string()),
                         "reason": pa.array(["no_results"] * len(kws),
                                            pa.string())})

    return queries.map_batches(find, batch_format="pyarrow",
                               zero_copy_batch=True)


def _query_table(sf_dir: str) -> rd.Dataset:
    from .common import read_sf_table

    parts = read_sf_table(sf_dir, "part", ["p_name", "p_brand"])

    def to_queries(t: pa.Table) -> pa.Table:
        return pa.table({"keyword": t.column("p_name"),
                         "city": t.column("p_brand")})

    return parts.map_batches(to_queries, batch_format="pyarrow",
                             zero_copy_batch=True)


def q_api_enrichment(sf_dir: str) -> rd.Dataset:
    """Enrichment demo over driver data: part names x nation cities."""
    return enrich(_query_table(sf_dir))


def q_api_dead_letter(sf_dir: str) -> rd.Dataset:
    return dead_letters(_query_table(sf_dir))


# ---------------------------------------------------------------------------
# DuckDB oracles — the fake API is md5-derived, so SQL can recompute the
# responses (sql_hex64), re-derive each flattened row, and re-run the
# GCJ-02 -> WGS-84 conversion with the same IEEE operation order
# (crawl_queries._delta_cols). This checks the distributed enrichment
# join end-to-end: fan-out per input row, pagination coverage, flatten,
# ref_* echo, geocode, and dead-letter completeness.
# ---------------------------------------------------------------------------

def _enrichment_oracle_sql() -> dict[str, str]:
    from .common import sql_hex64
    from .crawl_queries import _delta_cols

    base = f"""
WITH q AS (SELECT p_name AS kw, p_brand AS city FROM part),
nres AS (SELECT kw, city,
           CAST({sql_hex64("'api:' || kw || ':' || city")} % 4 AS BIGINT)
             AS n_res
         FROM q)
"""
    hi = sql_hex64("'api:' || kw || ':' || city || ':' || CAST(i AS VARCHAR)")
    enr = base + f"""
, hits AS (
  SELECT kw, city, i, {hi} AS hi
  FROM nres CROSS JOIN range(0, 4) t(i)
  WHERE i < n_res
),
flat AS (
  SELECT kw, city, i,
         printf('poi_%010d', CAST(hi % 10000000000 AS BIGINT)) AS id,
         kw || ' ' || ['center', 'plaza', 'tower'][(i % 3) + 1] AS name,
         printf('%.6f,%.6f',
                73.5 + CAST(hi % 10000000 AS DOUBLE) / 10000000 * 60.0,
                18.2 + CAST((hi >> 24) % 10000000 AS DOUBLE) / 10000000 * 35.0)
           AS location,
         CAST(CAST((hi >> 8) % 50 AS DOUBLE) / 10.0 AS VARCHAR) AS rating,
         CAST(CAST((hi >> 16) % 500 AS BIGINT) AS VARCHAR) AS cost
  FROM hits
),
-- the engine parses coordinates back out of the formatted location
-- string (lossy 6-decimal round-trip) before converting — mirror that
coords AS (
  SELECT *,
         CAST(string_split(location, ',')[1] AS DOUBLE) AS glng,
         CAST(string_split(location, ',')[2] AS DOUBLE) AS glat
  FROM flat
),
d AS (SELECT *, {_delta_cols('glng', 'glat', 'g')} FROM coords)
SELECT id, name, location, rating, cost,
       round(CASE WHEN ooc_g THEN glng
                  ELSE glng * 2 - (glng + dlng_g) END, 6) AS MapIT_lon,
       round(CASE WHEN ooc_g THEN glat
                  ELSE glat * 2 - (glat + dlat_g) END, 6) AS MapIT_lat,
       kw AS ref_keyword, city AS ref_city
FROM d
"""
    dead = base + """
SELECT kw AS ref_keyword, city AS ref_city, 'no_results' AS reason
FROM nres WHERE n_res = 0
"""
    return {"api_enrichment": enr, "api_dead_letter": dead}


ORACLE_SQL = _enrichment_oracle_sql()

QUERIES = {
    "api_enrichment": q_api_enrichment,
    "api_dead_letter": q_api_dead_letter,
}
