"""Arrow schemas shared by the engine, the oracle and the tests.

The document payload schema is the authoritative ``input_hint`` from
BASELINE.json: ``(doc_id: string, spans: list<struct<kind, text,
media_ref, offset>>)`` — one row per fetched page, spans in DOM order,
mirroring the reference's interleaved text + photo-URL parse output
(reference: handlers/diandianzu.py:65-86).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),       # 'text' | 'media'
        ("text", pa.string()),       # '' for media spans
        ("media_ref", pa.string()),  # '' for text spans
        ("offset", pa.int32()),      # 0-based span index (DOM order)
    ]
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),     # sha1_hex(canonical url)
        ("url", pa.string()),        # canonical url
        ("entity", pa.string()),
        ("page_type", pa.string()),  # 'list' | 'detail' | 'empty' | 'error'
        ("domain_key", pa.string()),
        ("depth", pa.int32()),
        ("parent_id", pa.string()),  # parent doc_id, '' for seeds
        ("child_idx", pa.int32()),   # discovery order under the parent
        ("path", pa.string()),       # discovery path, 8-hex chars per hop
        ("wave", pa.int32()),        # engine wave number (-1 in the oracle)
        ("n_attempts", pa.int32()),  # fetch attempts (retry accounting)
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)


def order_key_columns() -> list[str]:
    """The deterministic global crawl-order key (SURVEY.md §7.3).

    The reference's order is total because it is sequential
    (handlers/scrapers.py:88-150: entity -> ascending page -> DOM item
    order). That order IS the discovery path: (seed index, then the chain
    of child indices down to the URL), compared level by level — encoded
    here as ``(depth, path)`` with each hop fixed-width hex so string
    order equals numeric order. The oracle's pop order is exactly this
    sort order, and the engine's per-domain chronological fetch order is
    its restriction to each domain.
    """
    return ["depth", "path"]
