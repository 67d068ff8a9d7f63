"""Real-HTML site adapter — listing-site semantics over stored page bytes.

The reference's core competency is DOM extraction from two-step listing
sites: a list page yields item links in DOM order, and a detail page is
a header row zipped against item rows where the 照片 (photo) column
yields ``img src`` (a media ref) while sibling columns yield text —
producing the interleaved text+media span document
(reference: handlers/diandianzu.py:39-88, handlers/haozu.py:40-89).

This module re-implements those semantics over *real HTML bytes* behind
a pluggable DOM-builder registry (``DOM_BACKENDS``): the stdlib
``html.parser`` backend is always available; an ``lxml`` backend
registers itself when the package is importable and becomes the default
(the throughput backend — at real fetch rates the Python parser is the
parse stage's bottleneck). Both emit the same node-dict tree, so all
extraction logic is shared and backend output is identical. Adapters
are pure functions of page bytes — directly usable inside
``map_batches`` with no per-row state.

Adapter protocol (SURVEY §2.10):

    parse(page_bytes, base_url) -> ParsedPage
        .page_type   'list' | 'detail' | 'empty'
        .spans       [(kind, text, media_ref, offset)] in DOM order
        .child_urls  discovered links, DOM order (list pages)
        .fields      {column header -> cell text} (detail pages) — the
                     reference's discovered-at-parse-time row dict

Encoding override (reference: scrapers.py:40-43 sets
``response.encoding`` for GBK sites): ``parse(..., encoding='gbk')``
decodes the raw bytes with the site's declared codec before parsing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

MEDIA_HEADERS = ("照片", "photo", "image")   # columns that hold media refs
_VR_RE = re.compile(r"\(VR看房\)")           # name-cleanup M9 (diandianzu.py:118-122)


@dataclass
class ParsedPage:
    page_type: str
    spans: list[tuple[str, str, str, int]] = field(default_factory=list)
    child_urls: list[str] = field(default_factory=list)
    fields: dict[str, str] = field(default_factory=dict)


class _Dom(HTMLParser):
    """Minimal DOM builder: (tag, attrs, children, text) tree."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = {"tag": "", "attrs": {}, "children": [], "text": []}
        self.stack = [self.root]

    _VOID = {"img", "br", "hr", "meta", "link", "input", "area", "base",
             "col", "embed", "source", "track", "wbr"}

    def handle_starttag(self, tag, attrs):
        node = {"tag": tag, "attrs": dict(attrs), "children": [], "text": []}
        self.stack[-1]["children"].append(node)
        if tag not in self._VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i]["tag"] == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1]["text"].append(data)


def _build_dom_stdlib(html: str) -> dict:
    dom = _Dom()
    dom.feed(html)
    return dom.root


def _build_dom_lxml(html: str) -> dict:
    """lxml backend: same node-dict shape as ``_Dom``, so every
    downstream helper (_text/_find_all/_first_img_src) and the whole
    page-type logic is shared verbatim between backends. Text placement
    mirrors the stdlib parser exactly — a child's ``tail`` is the
    PARENT's data chunk — so span/link output is backend-identical
    (tests/test_html_adapter.py pins equality on the shared fixtures
    wherever lxml is installed). lxml is the throughput backend: its C
    parser is ~10-30x the stdlib's, which dominates the parse stage at
    real fetch rates (reference uses lxml via BeautifulSoup,
    handlers/scrapers.py:43)."""
    import lxml.html as lh

    tree = lh.document_fromstring(html or "<html></html>")
    return {"tag": "", "attrs": {}, "children": [_elem_to_node(tree)],
            "text": []}


def _elem_to_node(elem) -> dict:
    """ElementTree-style element -> the shared node-dict shape. A
    child's ``tail`` text belongs to the PARENT's text list, exactly
    where the stdlib parser's handle_data puts it (tested against
    xml.etree on well-formed markup, so the placement logic is pinned
    even where lxml itself is absent)."""
    node = {"tag": elem.tag, "attrs": dict(elem.attrib),
            "children": [], "text": []}
    if elem.text:
        node["text"].append(elem.text)
    for c in elem:
        if isinstance(c.tag, str):   # skip comments / PIs
            node["children"].append(_elem_to_node(c))
        if c.tail:
            node["text"].append(c.tail)
    return node


# parser backend registry: 'lxml' registers itself when importable and
# becomes the default; the stdlib parser is always available. parse()
# accepts backend= to pin one explicitly (the equality test does).
DOM_BACKENDS: dict[str, object] = {"stdlib": _build_dom_stdlib}
try:  # pragma: no cover - exercised only where lxml is installed
    import lxml.html  # noqa: F401

    DOM_BACKENDS["lxml"] = _build_dom_lxml
    DEFAULT_BACKEND = "lxml"
except ImportError:
    DEFAULT_BACKEND = "stdlib"


def _text(node) -> str:
    out = list(node["text"])
    for c in node["children"]:
        out.append(_text(c))
    return "".join(out).strip()


def _find_all(node, pred, out=None):
    out = [] if out is None else out
    for c in node["children"]:
        if pred(c):
            out.append(c)
        _find_all(c, pred, out)
    return out


def _first_img_src(node) -> str | None:
    imgs = _find_all(node, lambda n: n["tag"] == "img")
    return imgs[0]["attrs"].get("src") if imgs else None


def _has_class(node, cls: str) -> bool:
    return cls in node["attrs"].get("class", "").split()


def parse(page_bytes: bytes, base_url: str = "",
          encoding: str | None = None,
          backend: str | None = None) -> ParsedPage:
    """Parse stored listing-site HTML bytes (auto page-type detection).
    *backend* picks the DOM builder ('stdlib' | 'lxml'); default is the
    fastest one installed (``DEFAULT_BACKEND``)."""
    html = page_bytes.decode(encoding or "utf-8", errors="replace")
    root = DOM_BACKENDS[backend or DEFAULT_BACKEND](html)

    # list page: item links in DOM order (M1/M2; the reference drops a
    # header row with item_list[1:], modeled by the 'header' class skip)
    items = _find_all(root, lambda n: _has_class(n, "list-item-link"))
    if items:
        child_urls, spans = [], []
        off = 0
        for it in items:
            if _has_class(it, "header"):
                continue
            href = (it["attrs"].get("href")
                    or (_find_all(it, lambda n: n["tag"] == "a")
                        or [{"attrs": {}}])[0]["attrs"].get("href"))
            if href:
                child_urls.append(href)
            spans.append(("text", _VR_RE.sub("", _text(it)).strip(), "", off))
            off += 1
        return ParsedPage("list", spans, child_urls, {})

    # detail page: headers zipped against item-row cells (M3/M5)
    headers = [_text(n) for n in
               _find_all(root, lambda n: _has_class(n, "ftitle"))]
    rows = _find_all(root, lambda n: _has_class(n, "fitem"))
    if headers and rows:
        spans, fields = [], {}
        off = 0
        for row in rows:
            cells = [c for c in row["children"] if c["tag"] in ("div", "td", "span")]
            for key, cell in zip(headers, cells):
                if key in MEDIA_HEADERS:
                    src = _first_img_src(cell)
                    spans.append(("media", "", src or "", off))
                    fields[key] = src or ""
                else:
                    val = _VR_RE.sub("", _text(cell)).strip()
                    spans.append(("text", val, "", off))
                    fields[key] = val
                off += 1
        return ParsedPage("detail", spans, [], fields)

    return ParsedPage("empty", [("text", _text(root) or "not found", "", 0)],
                      [], {})


class HtmlFetchParse:
    """FetchParse-shaped map_batches stage over a stored-page corpus:
    frontier rows (url, ...) -> doc rows + children, using the HTML
    adapter instead of the synthetic web. ``store`` maps url -> raw
    bytes (a fixture dir in tests; a fetch actor's response body in a
    deployment)."""

    def __init__(self, store: dict[str, bytes], encoding: str | None = None,
                 adapters: dict | None = None):
        # adapters: {netloc: (raw, url, encoding) -> ParsedPage}; pages
        # from unregistered domains fall back to the generic parser.
        # Passed as an explicit dict (see adapters.registry docstring)
        # so the routing table pickles with the stage onto every worker.
        self.store = store
        self.encoding = encoding
        self.adapters = adapters or {}

    def _parse_fn(self, url: str):
        from urllib.parse import urlsplit

        return self.adapters.get(urlsplit(url).netloc, parse)

    def __call__(self, batch):
        import pyarrow as pa

        from ..canonicalize import doc_id_for
        from ..schema import DOC_SCHEMA

        out_schema = DOC_SCHEMA.append(pa.field("children",
                                                pa.list_(pa.string())))
        cols: dict[str, list] = {n: [] for n in out_schema.names}
        for i, url in enumerate(batch.column("url").to_pylist()):
            raw = self.store.get(url)
            page = (self._parse_fn(url)(raw, url, self.encoding)
                    if raw is not None else None)
            cols["doc_id"].append(doc_id_for(url))
            cols["url"].append(url)
            cols["entity"].append("")
            cols["page_type"].append(page.page_type if page else "error")
            cols["domain_key"].append(
                batch.column("domain_key")[i].as_py()
                if "domain_key" in batch.column_names else "")
            cols["depth"].append(
                batch.column("depth")[i].as_py()
                if "depth" in batch.column_names else 0)
            cols["parent_id"].append("")
            cols["child_idx"].append(i)
            cols["path"].append("")
            cols["wave"].append(-1)
            cols["n_attempts"].append(1)
            cols["spans"].append(
                [{"kind": k, "text": t, "media_ref": m, "offset": o}
                 for k, t, m, o in page.spans] if page else [])
            cols["children"].append(list(page.child_urls) if page else [])
        return pa.table({n: pa.array(cols[n], type=out_schema.field(n).type)
                         for n in out_schema.names})
