"""RequestsFetcher: the live-HTTP counterpart of the reference's
session-holding scraper (handlers/scrapers.py:26-69), tested against an
injected mock transport (this sandbox has no network).

Covers the reference's exact retry ladder: renew the session at most
once per failure streak, success re-arms the allowance, permanent
failures dead-letter as ``page_type='error'`` rows — plus the full
crawl-loop wiring via ``CrawlConfig(fetcher_cls=...)``.
"""

import os
import sys

import pyarrow as pa
import pytest

from scraper_ray.stages.http_fetch import RequestsFetcher, TransportError

# the mock transport / session helpers below travel inside actor
# constructor kwargs; workers can't import this test module, so ship it
# by value (otherwise deserialization fails and the actor pool retries
# forever)
from ray import cloudpickle as _cp

_cp.register_pickle_by_value(sys.modules[__name__])

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

LIST_URL = "http://www.site.test/listing/p1/"
ITEM_URLS = [f"http://www.site.test/item/{i}/" for i in (1, 2, 3)]

LIST_HTML = (
    '<div class="list-item-link header"><a href="#">hdr</a></div>'
    + "".join(
        f'<div class="list-item-link"><a href="{u}">item {i}</a></div>'
        for i, u in enumerate(ITEM_URLS))
).encode()

DETAIL_HTML = (
    '<div class="ftitle">面积</div><div class="ftitle">照片</div>'
    '<div class="fitem"><div>88平米</div>'
    '<div><img src="http://cdn.site.test/a.jpg"/></div></div>'
).encode()

WEB = {LIST_URL: LIST_HTML, **{u: DETAIL_HTML for u in ITEM_URLS}}


def make_session(fresh: bool = False) -> dict:
    return {"fresh": fresh}


class StoreTransport:
    """Mock transport: serves WEB, with per-URL scripted failures.

    ``fail_until_renewed``: these URLs raise unless the session has been
    renewed (session['fresh']). ``fail_always``: always raise."""

    def __init__(self, store, fail_until_renewed=(), fail_always=()):
        self.store = store
        self.fail_until_renewed = set(fail_until_renewed)
        self.fail_always = set(fail_always)
        self.calls = []

    def __call__(self, session, url, headers, timeout):
        self.calls.append(url)
        if url in self.fail_always:
            raise TransportError("connection reset")
        if url in self.fail_until_renewed and not session.get("fresh"):
            raise TransportError("stale cookies")
        body = self.store.get(url)
        if body is None:
            raise TransportError("HTTP 404")
        return body


def renew(old_session):
    """The cookie re-harvest hook (reference scrapers.py:54-69)."""
    return make_session(fresh=True)


def _batch(urls):
    return pa.table({"url": pa.array(urls, pa.string())})


def test_success_first_try_parses_dom_order():
    f = RequestsFetcher(transport=StoreTransport(WEB),
                        session_factory=make_session)
    out = f(_batch([LIST_URL]))
    assert out.column("page_type").to_pylist() == ["list"]
    assert out.column("n_attempts").to_pylist() == [1]
    assert out.column("children").to_pylist() == [ITEM_URLS]
    assert f.switch is True and f.n_renewals == 0


def test_renew_on_failure_then_success():
    """First failure spends the renewal allowance; the renewed session
    succeeds on the retry (reference switch semantics, scrapers.py:45-52)."""
    tr = StoreTransport(WEB, fail_until_renewed={LIST_URL})
    f = RequestsFetcher(transport=tr, session_factory=make_session,
                        renew=renew)
    out = f(_batch([LIST_URL]))
    assert out.column("page_type").to_pylist() == ["list"]
    assert out.column("n_attempts").to_pylist() == [2]
    assert f.n_renewals == 1
    assert f.switch is True            # success re-armed the allowance


def test_permanent_failure_dead_letters_after_bounded_retry():
    tr = StoreTransport(WEB, fail_always={LIST_URL})
    f = RequestsFetcher(transport=tr, session_factory=make_session,
                        renew=renew, max_attempts=3)
    out = f(_batch([LIST_URL]))
    # dead-letter row, never a silent drop (scrapers.py:50-52 logs+None;
    # here the 'error' doc row IS the record)
    assert out.column("page_type").to_pylist() == ["error"]
    assert out.column("spans").to_pylist() == [[]]
    assert out.column("children").to_pylist() == [[]]
    assert out.column("n_attempts").to_pylist() == [3]
    assert len(tr.calls) == 3
    # renewal spent exactly ONCE per failure streak, not per attempt
    assert f.n_renewals == 1
    assert f.switch is False


def test_success_rearms_renewal_for_next_streak():
    u1, u2 = ITEM_URLS[0], ITEM_URLS[1]
    tr = StoreTransport(WEB, fail_until_renewed={u1, u2})
    f = RequestsFetcher(transport=tr, session_factory=make_session,
                        renew=renew)

    # a renew hook that hands back a STALE session: the streak for u2
    # must get its own renewal even though u1's succeeded
    calls = {"n": 0}

    def flaky_renew(old):
        calls["n"] += 1
        return make_session(fresh=True)

    f.renew = flaky_renew
    # u1: fail -> renew -> ok; fresh session then also serves u2... so
    # degrade the session between URLs to force a second streak
    out1 = f(_batch([u1]))
    assert out1.column("n_attempts").to_pylist() == [2]
    f.session = make_session(fresh=False)   # cookies expired again
    out2 = f(_batch([u2]))
    assert out2.column("n_attempts").to_pylist() == [2]
    assert calls["n"] == 2                  # one renewal per streak


def test_failed_renewal_keeps_old_session_and_retries():
    tr = StoreTransport(WEB, fail_until_renewed={LIST_URL})

    def broken_renew(old):
        raise RuntimeError("browser pool exhausted")

    f = RequestsFetcher(transport=tr, session_factory=make_session,
                        renew=broken_renew, max_attempts=2)
    out = f(_batch([LIST_URL]))
    assert out.column("page_type").to_pylist() == ["error"]
    assert out.column("n_attempts").to_pylist() == [2]


def test_missing_columns_get_defaults():
    """Frontier batches without depth/path columns still fetch (the
    stage is usable standalone, not only inside the crawl loop)."""
    f = RequestsFetcher(transport=StoreTransport(WEB),
                        session_factory=make_session)
    out = f(_batch(ITEM_URLS))
    assert out.column("depth").to_pylist() == [0, 0, 0]
    assert out.column("page_type").to_pylist() == ["detail"] * 3
    spans = out.column("spans").to_pylist()[0]
    assert [(s["kind"], s["offset"]) for s in spans] == [
        ("text", 0), ("media", 1)]


@pytest.mark.usefixtures("ray_session")
def test_crawl_loop_with_requests_fetcher_actor_pool(tmp_path):
    """End-to-end: CrawlConfig(fetcher_cls=RequestsFetcher) drives the
    full frontier loop (seed -> list page -> item pages) through an
    actor-pool fetch stage with per-actor session state."""
    from scraper_ray.crawl import CrawlConfig, crawl, read_docs
    from scraper_ray.synthweb import PolitenessConfig, WebConfig

    cfg = CrawlConfig(
        web=WebConfig(),                       # unused by the fetcher
        politeness=PolitenessConfig(),
        out_dir=str(tmp_path / "docs"),
        fetcher_cls=RequestsFetcher,
        fetcher_kwargs={"transport": StoreTransport(WEB),
                        "session_factory": make_session,
                        "renew": renew},
        fetch_concurrency=2,                   # actor pool (session state)
        n_seen_shards=2, n_sched_shards=2,
    )
    stats = crawl([LIST_URL], cfg)
    docs = read_docs(str(tmp_path / "docs")).to_pandas()
    assert set(docs["url"]) == {LIST_URL, *ITEM_URLS}
    by_url = {r["url"]: r for _, r in docs.iterrows()}
    assert by_url[LIST_URL]["page_type"] == "list"
    assert all(by_url[u]["page_type"] == "detail" for u in ITEM_URLS)
    # interleaved span invariant on the fetched details
    spans = by_url[ITEM_URLS[0]]["spans"]
    assert [(s["kind"], s["offset"]) for s in spans] == [
        ("text", 0), ("media", 1)]
    assert stats.docs == 4
