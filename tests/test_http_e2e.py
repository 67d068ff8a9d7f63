"""Real-HTTP crawl end-to-end over a local socket server (VERDICT r4
item 7): the full frontier loop — robots discovery over HTTP,
politeness admission, actor-pool fetch with a REAL ``requests.Session``
per worker, bounded retry against injected 503s, and the
session-renewal (T1) ladder against a 403-until-token endpoint — with
nothing mocked below the socket.

The server runs in the pytest process on 127.0.0.1:<ephemeral>; Ray
fetch actors are separate processes on the same host, so every GET is a
real TCP round-trip. The server keeps a request log + per-path hit
counters, which is what lets the test assert the NEGATIVE robots case
(the disallowed URL is never requested at all) and the exact retry
counts on the wire.
"""

import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

# handler state and the renewal hook ride into Ray actors by value
from ray import cloudpickle as _cp

_cp.register_pickle_by_value(sys.modules[__name__])

ROBOTS_TXT = (
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Crawl-delay: 2\n"
)

DETAIL_HTML = (
    '<div class="ftitle">size</div><div class="ftitle">photo</div>'
    '<div class="fitem"><div>88sqm</div>'
    '<div><img src="http://cdn.site.test/a.jpg"/></div></div>'
)


class _Handler(BaseHTTPRequestHandler):
    """Routes: /robots.txt; /listing/p1/ (links to items, a flaky page,
    a token-gated page, and a robots-DISALLOWED page); /item/N/ details;
    /flaky/ 503s twice then serves; /secure/ 403s without X-Token."""

    # class-level shared state (one server per test)
    lock = threading.Lock()
    log: list = []
    flaky_hits = 0

    def _send(self, code: int, body: bytes, ctype="text/html"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (BaseHTTPRequestHandler API)
        cls = type(self)
        with cls.lock:
            cls.log.append((self.path, self.headers.get("X-Token")))
        host = self.headers.get("Host")
        if self.path == "/robots.txt":
            return self._send(200, ROBOTS_TXT.encode(), "text/plain")
        if self.path == "/listing/p1/":
            links = [f"http://{host}/item/1/",
                     f"http://{host}/item/2/",
                     f"http://{host}/flaky/3/",
                     f"http://{host}/secure/4/",
                     f"http://{host}/private/secret/"]
            body = ('<div class="list-item-link header"><a href="#">h</a>'
                    "</div>" + "".join(
                        f'<div class="list-item-link"><a href="{u}">x</a>'
                        "</div>" for u in links))
            return self._send(200, body.encode())
        if self.path.startswith("/flaky/"):
            with cls.lock:
                cls.flaky_hits += 1
                fail = cls.flaky_hits <= 2
            if fail:
                return self._send(503, b"later")
            return self._send(200, DETAIL_HTML.encode())
        if self.path.startswith("/secure/"):
            if self.headers.get("X-Token") != "fresh":
                return self._send(403, b"no token")
            return self._send(200, DETAIL_HTML.encode())
        if self.path.startswith("/item/"):
            return self._send(200, DETAIL_HTML.encode())
        if self.path.startswith("/private/"):
            return self._send(200, b"should never be fetched")
        return self._send(404, b"nope")

    def log_message(self, *a):  # silence per-request stderr noise
        pass


def renew_with_token(old_session):
    """T1 renewal hook: re-harvest credentials (here: the header token a
    real deployment would pull from a login/browser flow)."""
    import requests

    s = requests.Session()
    s.headers["X-Token"] = "fresh"
    return s


@pytest.fixture()
def http_server():
    _Handler.log = []
    _Handler.flaky_hits = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


def _robots_transport(netloc: str):
    def fetch(domain: str) -> str | None:
        import requests

        # the crawl keys rules by registered domain (port-less); the
        # transport knows the real socket address
        resp = requests.get(f"http://{netloc}/robots.txt", timeout=10)
        return resp.text if resp.status_code == 200 else None

    return fetch


@pytest.mark.usefixtures("ray_session")
def test_crawl_e2e_over_real_http(http_server, tmp_path):
    from scraper_ray.crawl import CrawlConfig, crawl, read_docs
    from scraper_ray.stages.http_fetch import RequestsFetcher
    from scraper_ray.stages.robots import fetch_robots_rules, \
        politeness_from_rules
    from scraper_ray.synthweb import WebConfig

    netloc = http_server
    seed = f"http://{netloc}/listing/p1/"

    # 1. robots discovery over real HTTP (distributed FetchRobots stage)
    rules = fetch_robots_rules(["127.0.0.1"], _robots_transport(netloc))
    assert rules.num_rows == 1
    row = rules.to_pylist()[0]
    assert row["disallow"] == ["/private/"]
    assert row["crawl_delay"] == 2.0
    pol = politeness_from_rules(rules, seed=7)
    assert pol.delays["127.0.0.1"] == 2          # crawl-delay honored
    assert pol.budget_per_wave("127.0.0.1") == pol.wave_units // 2

    # 2. full crawl through the actor-pool fetcher: real sessions, real
    # sockets, injected 503s and the 403-until-renewed endpoint
    cfg = CrawlConfig(
        web=WebConfig(),                         # unused by the fetcher
        politeness=pol,
        out_dir=str(tmp_path / "docs"),
        fetcher_cls=RequestsFetcher,
        fetcher_kwargs={"renew": renew_with_token, "timeout": 10.0,
                        "max_attempts": 3},
        fetch_concurrency=2,
        n_seen_shards=2, n_sched_shards=2,
    )
    stats = crawl([seed], cfg)
    docs = read_docs(str(tmp_path / "docs")).to_pandas()
    by_path = {u.split(netloc)[1]: r for u, r in
               zip(docs["url"], docs.to_dict("records"))}

    paths = [p for p, _ in _Handler.log]

    # the robots-disallowed child was admitted nowhere
    assert "/private/secret/" not in by_path
    assert not any(p.startswith("/private/") for p in paths)
    assert set(by_path) == {"/listing/p1/", "/item/1/", "/item/2/",
                            "/flaky/3/", "/secure/4/"}
    assert stats.docs == 5

    # bounded retry on the wire: two 503s + the success = 3 attempts
    assert by_path["/flaky/3/"]["n_attempts"] == 3
    assert paths.count("/flaky/3/") == 3
    assert by_path["/flaky/3/"]["page_type"] == "detail"

    # session renewal happened ON THE WIRE: the fresh-session factory
    # has no token, so a successful /secure/ fetch proves the renewed
    # session (X-Token: fresh) was in play — whether the 403 or an
    # earlier 503 in the same streak spent the allowance. The LAST
    # /secure/ hit must carry the token; any earlier ones are the
    # tokenless attempts that failed with 403.
    secure_hits = [tok for p, tok in _Handler.log if p == "/secure/4/"]
    assert secure_hits[-1] == "fresh"
    assert all(t is None for t in secure_hits[:-1])
    assert by_path["/secure/4/"]["n_attempts"] == len(secure_hits)
    assert by_path["/secure/4/"]["page_type"] == "detail"

    # interleaved span invariant survives the real transport
    spans = by_path["/item/1/"]["spans"]
    assert [(s["kind"], s["offset"]) for s in spans] == [
        ("text", 0), ("media", 1)]
