"""Per-domain site-adapter registry — the engine's user-extension
surface (SURVEY §2.10; reference subclass points `scrapers.py:72-81`,
site classes `diandianzu.py:27-122`, `haozu.py:26-136`).

An adapter is a callable ``(raw_bytes, base_url, encoding) -> ParsedPage``
— the same signature as the default ``adapters.html.parse`` — so site
logic stays a pure function usable directly inside ``map_batches``.

Two ways to use it:

- process-local: ``register('www.example.com', my_parse)`` then build
  stages with ``resolve()`` — convenient in notebooks and single-node
  scripts.
- explicit: pass an ``adapters={domain: fn}`` dict straight to
  ``HtmlFetchParse``. This is the CLUSTER-SAFE form: a map_batches
  actor pool pickles its constructor args onto every worker, while a
  module-level registry mutated on the driver after workers start would
  not be visible remotely. ``resolve()`` snapshots the registry into
  exactly such a dict at stage-construction time.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register(domain: str, adapter: Callable) -> None:
    """Route pages whose URL netloc equals *domain* to *adapter*."""
    _REGISTRY[domain] = adapter


def resolve() -> dict[str, Callable]:
    """Snapshot of the current registry (pass to a stage constructor —
    the copy is what gets pickled to workers)."""
    return dict(_REGISTRY)


def clear() -> None:
    _REGISTRY.clear()
