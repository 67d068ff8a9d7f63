"""Real-HTTP fetch stage: ``RequestsFetcher`` — the live counterpart of
the reference's session-holding scraper (handlers/scrapers.py:26-69),
shaped for a Ray Data actor pool.

Reference semantics mirrored exactly:

- one ``requests.Session`` per worker, built once (``__init__`` — the
  T1 session-pool shape: pass the CLASS to ``map_batches(...,
  concurrency=N)`` so each actor builds its session once, not per batch);
- on a failed GET the session is renewed AT MOST ONCE per failure
  streak (the reference's ``switch`` flag, scrapers.py:33-52): renew ->
  retry; a failure with renewal already spent falls back to plain
  bounded retry, then dead-letters;
- any success re-arms the renewal allowance (``self.switch = True``);
- permanent failures become dead-letter ``page_type='error'`` doc rows
  with the attempt count recorded — never silent drops
  (scrapers.py:50-52 logs and returns None; here the row IS the log);
- per-site encoding override for GBK sites (scrapers.py:40-43 sets
  ``response.encoding``) via the ``encoding`` kwarg.

Everything network-shaped is injectable, so the stage is fully
unit-testable in this no-network sandbox and deployable unchanged:

- ``transport(session, url, headers, timeout) -> bytes`` — performs one
  GET and returns the body; raises ``TransportError`` (or anything) on
  failure. The default (``requests_transport``) uses ``requests`` when
  installed.
- ``session_factory() -> session`` — builds the per-worker session
  (default: ``requests.Session`` when installed, else a plain ``dict``).
- ``renew(old_session) -> session`` — the cookie re-harvest hook (the
  reference opens the search base in a browser page and copies its
  cookie jar, scrapers.py:54-69; a deployment plugs that in here).

Output rows follow ``FETCH_OUT_SCHEMA`` (doc rows + raw child links in
DOM order), so the stage is a drop-in for the crawl loop::

    CrawlConfig(..., fetcher_cls=RequestsFetcher,
                fetcher_kwargs={"transport": my_transport},
                fetch_concurrency=16)
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from ..adapters.html import parse as parse_html
from ..canonicalize import doc_id_for
from ..schema import DOC_SCHEMA

FETCH_OUT_SCHEMA = DOC_SCHEMA.append(pa.field("children", pa.list_(pa.string())))

DEFAULT_HEADERS = {"User-Agent": "scraper-ray/1.0"}


class TransportError(Exception):
    """A single GET failed (connection, timeout, HTTP >= 400)."""


def requests_transport(session, url: str, headers: dict,
                       timeout: float) -> bytes:
    """Default transport: one GET via ``requests``. Import-gated — this
    container has no network, so tests inject mocks; a deployment with
    ``requests`` installed uses this unchanged."""
    try:
        import requests  # noqa: PLC0415
    except ImportError as ex:  # pragma: no cover - env-dependent
        raise TransportError(
            "requests is not installed; inject a transport") from ex
    try:
        resp = session.get(url, headers=headers, timeout=timeout)
    except Exception as ex:
        raise TransportError(str(ex)) from ex
    if resp.status_code >= 400:
        raise TransportError(f"HTTP {resp.status_code}")
    return resp.content


def _default_session_factory():
    try:
        import requests  # noqa: PLC0415

        return requests.Session()
    except ImportError:  # sandbox: opaque placeholder threaded to transport
        return {}


class RequestsFetcher:
    """FetchParse-shaped actor-pool stage over a real HTTP transport.

    Frontier wave rows -> doc rows + raw child links, parsed with the
    HTML adapter registry (``adapters``: {netloc: parse_fn}, generic
    parser otherwise — same routing as HtmlFetchParse)."""

    def __init__(self,
                 transport: Callable = requests_transport,
                 session_factory: Callable = _default_session_factory,
                 renew: Callable | None = None,
                 max_attempts: int = 3,
                 timeout: float = 30.0,
                 headers: dict | None = None,
                 encoding: str | None = None,
                 adapters: dict | None = None):
        self.transport = transport
        self.session_factory = session_factory
        self.renew = renew
        self.max_attempts = max_attempts
        self.timeout = timeout
        self.headers = dict(DEFAULT_HEADERS, **(headers or {}))
        self.encoding = encoding
        self.adapters = adapters or {}
        # per-worker state, built once per actor (reference __init__):
        self.session = session_factory()
        self.switch = True           # renewal allowance (scrapers.py:33)
        self.n_renewals = 0          # observability, surfaced in tests

    def _parse_fn(self, url: str):
        from urllib.parse import urlsplit

        return self.adapters.get(urlsplit(url).netloc, parse_html)

    def _fetch_one(self, url: str):
        """One URL with the reference's retry ladder. Returns
        (ParsedPage | None, attempts)."""
        attempts = 0
        while attempts < self.max_attempts:
            attempts += 1
            try:
                body = self.transport(self.session, url, self.headers,
                                      self.timeout)
            except Exception:
                # renew-once-per-failure-streak (scrapers.py:45-52):
                # the renewed session gets the retry; with the allowance
                # spent, remaining attempts are plain retries
                if self.switch and self.renew is not None:
                    try:
                        self.session = self.renew(self.session)
                        self.n_renewals += 1
                    except Exception:
                        pass  # failed renewal: keep the old session
                    self.switch = False
                continue
            self.switch = True       # success re-arms the allowance
            return self._parse_fn(url)(body, url, self.encoding), attempts
        return None, attempts        # dead letter

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in FETCH_OUT_SCHEMA.names}
        urls = batch.column("url").to_pylist()
        n = len(urls)

        def col(name, default):
            return (batch.column(name).to_pylist()
                    if name in batch.column_names else [default] * n)

        depths = col("depth", 0)
        parents = col("parent_id", "")
        cidxs = col("child_idx", 0)
        paths = col("path", "")
        domains = col("domain_key", "")
        waves = col("wave", -1)
        for url, depth, pid, ci, path, dom, wave in zip(
                urls, depths, parents, cidxs, paths, domains, waves):
            page, attempts = self._fetch_one(url)
            cols["doc_id"].append(doc_id_for(url))
            cols["url"].append(url)
            cols["entity"].append("")
            cols["page_type"].append(page.page_type if page else "error")
            cols["domain_key"].append(dom)
            cols["depth"].append(depth)
            cols["parent_id"].append(pid)
            cols["child_idx"].append(ci)
            cols["path"].append(path)
            cols["wave"].append(wave)
            cols["n_attempts"].append(attempts)
            cols["spans"].append(
                [{"kind": k, "text": t, "media_ref": m, "offset": o}
                 for k, t, m, o in page.spans] if page else [])
            cols["children"].append(list(page.child_urls) if page else [])
        return pa.table(
            {n: pa.array(cols[n], type=FETCH_OUT_SCHEMA.field(n).type)
             for n in FETCH_OUT_SCHEMA.names})
