"""Vectorized robots_filter == the per-row politeness.allowed oracle
on tricky batches (query strings, path-less URLs, multi-domain rows,
multiple prefixes per domain)."""

from urllib.parse import urlsplit

import pyarrow as pa

from scraper_ray.state.scheduler import robots_filter
from scraper_ray.synthweb import PolitenessConfig


def _batch(rows):
    return pa.table({
        "url": pa.array([u for u, _ in rows], pa.string()),
        "domain_key": pa.array([d for _, d in rows], pa.string()),
    })


POL = PolitenessConfig(disallow={
    "a.test": ("/admin", "/private/"),
    "b.test": ("/x",),
})

ROWS = [
    ("http://www.a.test/admin/panel", "a.test"),        # blocked
    ("http://www.a.test/administrate", "a.test"),       # blocked (prefix)
    ("http://www.a.test/public/admin", "a.test"),       # allowed
    ("http://www.a.test/private/", "a.test"),           # blocked
    ("http://www.a.test/priv", "a.test"),               # allowed
    ("http://www.a.test/admin?q=/safe", "a.test"),      # blocked (path only)
    ("http://www.a.test/safe?q=/admin", "a.test"),      # allowed (query ignored)
    ("http://www.a.test", "a.test"),                    # allowed (no path)
    ("http://www.b.test/x/1", "b.test"),                # blocked
    ("http://www.b.test/y/x", "b.test"),                # allowed
    ("http://www.c.test/admin", "c.test"),              # allowed (no rules)
]


def test_matches_per_row_oracle():
    tbl = _batch(ROWS)
    out, n_blocked = robots_filter(tbl, POL)
    keep_oracle = [POL.allowed(d, urlsplit(u).path) for u, d in ROWS]
    assert n_blocked == keep_oracle.count(False) == 5
    assert out.column("url").to_pylist() == [
        u for (u, _), k in zip(ROWS, keep_oracle) if k]


def test_no_rules_short_circuits():
    tbl = _batch(ROWS)
    out, n = robots_filter(tbl, PolitenessConfig())
    assert n == 0 and out is tbl


def test_empty_batch():
    out, n = robots_filter(_batch([]), POL)
    assert n == 0 and out.num_rows == 0
