"""Real-HTML adapter: stored page bytes -> interleaved spans + links.

Reproduces the reference's DOM-extraction semantics on actual HTML
(headers zipped to cells, 照片 column -> media span, header-row skip,
(VR看房) cleanup), and routes the bytes through the FetchParse-shaped
stage so the engine-side plumbing (schema, children, doc ids) is proven
on real markup, not only the synthetic web.
"""

import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name: str) -> bytes:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def test_list_page_items_and_links():
    from scraper_ray.adapters.html import parse

    p = parse(_read("list_page.html"), "http://www.example.test/listing/p1/")
    assert p.page_type == "list"
    # header row skipped (reference item_list[1:]), DOM order preserved
    assert p.child_urls == [
        "http://www.example.test/item/1001/",
        "http://www.example.test/item/1002/",
        "http://www.example.test/item/1003/",
    ]
    kinds_texts = [(k, t) for k, t, _, _ in p.spans]
    assert kinds_texts[0] == ("text", "国贸大厦 A座")   # (VR看房) stripped
    assert [o for _, _, _, o in p.spans] == list(range(len(p.spans)))


def test_detail_page_interleaved_spans():
    from scraper_ray.adapters.html import parse

    p = parse(_read("detail_page.html"), "http://www.example.test/item/1001/")
    assert p.page_type == "detail"
    # span sequence: exact (kind, text, media_ref, offset) interleaving —
    # the input_hint invariant on real markup
    assert p.spans == [
        ("text", "12/45层", "", 0),
        ("text", "268平米", "", 1),
        ("media", "", "http://cdn.example.test/img/1001_0.jpg", 2),
        ("text", "8.5元/平米/天", "", 3),
        ("text", "15/45层", "", 4),
        ("text", "120平米", "", 5),
        ("media", "", "http://cdn.example.test/img/1001_1.jpg", 6),
        ("text", "9.0元/平米/天", "", 7),
    ]
    # discovered-at-parse-time keys (reference row dict, diandianzu.py:71-75)
    assert p.fields["面积"] == "120平米"       # last row wins in the dict
    assert p.fields["照片"].startswith("http://cdn.")


def test_gbk_encoding_override():
    """Reference sets response.encoding for GBK sites (scrapers.py:40-43)."""
    from scraper_ray.adapters.html import parse

    html = ('<div class="ftitle">地址</div>'
            '<div class="fitem"><div>北京市朝阳区</div></div>')
    p = parse(html.encode("gbk"), encoding="gbk")
    assert p.page_type == "detail"
    assert p.spans[0] == ("text", "北京市朝阳区", "", 0)


@pytest.mark.usefixtures("ray_session")
def test_html_fetchparse_stage():
    """Route real HTML through the FetchParse-shaped map_batches stage."""
    import pyarrow as pa
    import ray.data as rd

    from scraper_ray.adapters.html import HtmlFetchParse

    store = {
        "http://www.example.test/listing/p1/": _read("list_page.html"),
        "http://www.example.test/item/1001/": _read("detail_page.html"),
    }
    frontier = rd.from_arrow(pa.table({
        "url": pa.array(list(store) + ["http://www.example.test/missing/"]),
    }))
    docs = frontier.map_batches(
        HtmlFetchParse(store), batch_format="pyarrow").to_pandas()
    by_url = {r["url"]: r for _, r in docs.iterrows()}
    assert by_url["http://www.example.test/listing/p1/"]["page_type"] == "list"
    d = by_url["http://www.example.test/item/1001/"]
    assert d["page_type"] == "detail"
    assert [s["kind"] for s in d["spans"]] == [
        "text", "text", "media", "text", "text", "text", "media", "text"]
    # missing pages become dead-letter 'error' docs, never silent drops
    assert by_url["http://www.example.test/missing/"]["page_type"] == "error"
    kids = by_url["http://www.example.test/listing/p1/"]["children"]
    assert len(kids) == 3


def test_per_domain_adapter_registry_routes_by_netloc(ray_session):
    """A site adapter registered for one domain overrides the generic
    parser for that domain only — the SURVEY §2.10 extension surface."""
    import ray.data as rd

    from scraper_ray.adapters import registry
    from scraper_ray.adapters.html import HtmlFetchParse, ParsedPage, parse

    def shouty(raw, url, encoding=None):
        base = parse(raw, url, encoding)
        spans = [(k, t.upper(), m, o) for k, t, m, o in base.spans]
        return ParsedPage(base.page_type, spans, base.child_urls,
                          base.fields)

    registry.clear()
    try:
        registry.register("www.custom.test", shouty)
        store = {
            "http://www.custom.test/listing/p1/": _read("list_page.html"),
            "http://www.example.test/listing/p1/": _read("list_page.html"),
        }
        stage = HtmlFetchParse(store, adapters=registry.resolve())
        frontier = rd.from_items([
            {"url": "http://www.custom.test/listing/p1/"},
            {"url": "http://www.example.test/listing/p1/"},
        ])
        docs = {r["url"]: r for r in
                frontier.map_batches(stage, batch_format="pyarrow").take_all()}
        custom = docs["http://www.custom.test/listing/p1/"]
        plain = docs["http://www.example.test/listing/p1/"]
        c_texts = [s["text"] for s in custom["spans"]]
        p_texts = [s["text"] for s in plain["spans"]]
        # a latin-letter span proves the override actually fired
        assert any(t != t.lower() and t == t.upper() for t in c_texts if t)
        assert any(t != t.lower() and t == t.upper() for t in c_texts if t)
        assert c_texts == [t.upper() for t in p_texts]
        # children untouched by the custom adapter
        assert custom["children"] == plain["children"]
    finally:
        registry.clear()


def test_backend_registry_has_stdlib_and_prefers_lxml():
    from scraper_ray.adapters.html import DEFAULT_BACKEND, DOM_BACKENDS

    assert "stdlib" in DOM_BACKENDS
    # lxml registers itself when importable and becomes the default
    try:
        import lxml.html  # noqa: F401
    except ImportError:
        assert DEFAULT_BACKEND == "stdlib"
    else:
        assert "lxml" in DOM_BACKENDS and DEFAULT_BACKEND == "lxml"


@pytest.mark.parametrize("fixture", ["list_page.html", "detail_page.html"])
def test_backends_agree_on_shared_fixtures(fixture):
    """Every registered backend must produce identical span/link/field
    output on the shared fixtures (in-sandbox this covers stdlib alone;
    where lxml is installed it pins stdlib == lxml)."""
    from scraper_ray.adapters.html import DOM_BACKENDS, parse

    raw = _read(fixture)
    results = {b: parse(raw, backend=b) for b in DOM_BACKENDS}
    base = results["stdlib"]
    for name, got in results.items():
        assert got.page_type == base.page_type, name
        assert got.spans == base.spans, name
        assert got.child_urls == base.child_urls, name
        assert got.fields == base.fields, name


def test_elem_to_node_matches_stdlib_tree():
    """The lxml-side element converter (shared node-dict shape) places
    text and tails exactly like the stdlib parser — validated here via
    xml.etree (same element API lxml exposes), since lxml itself may be
    absent in the sandbox."""
    import xml.etree.ElementTree as ET

    from scraper_ray.adapters.html import (_build_dom_stdlib, _elem_to_node,
                                           _find_all, _first_img_src, _text)

    doc = ('<div class="a"><p>hello <b>bold</b> tail</p>'
           '<div class="cell"><img src="x.png"/>after</div></div>')
    via_etree = {"tag": "", "attrs": {}, "text": [],
                 "children": [_elem_to_node(ET.fromstring(doc))]}
    via_stdlib = _build_dom_stdlib(doc)

    def norm(node):
        return (node["tag"], tuple(sorted(node["attrs"].items())),
                _text(node), tuple(norm(c) for c in node["children"]))

    assert norm(via_etree) == norm(via_stdlib)
    a = _find_all(via_etree, lambda n: n["attrs"].get("class") == "cell")
    b = _find_all(via_stdlib, lambda n: n["attrs"].get("class") == "cell")
    assert _first_img_src(a[0]) == _first_img_src(b[0]) == "x.png"
