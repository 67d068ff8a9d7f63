"""String / URL scalar function family (reference §2.8).

Vectorized pyarrow.compute wrappers plus the request-building helpers
the API adapters need: numeric-id extraction (diandianzu.py:95,
haozu.py:48), name cleanup (diandianzu.py:118-122), coordinate
splitting (baidu_api.py:72-76), truncation (utility_commons.py:124-130)
and MD5-signed URL building (default_api.py:59-64, amap_api.py:49-55).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlencode

import pyarrow as pa
import pyarrow.compute as pc


def extract_numeric_id(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """First run of digits in each string ('' when none)."""
    ex = pc.extract_regex(arr, r"(?P<id>\d+)")
    return pc.fill_null(pc.struct_field(ex, "id"), "")


def clean_suffix(arr, pattern: str = r"\(VR看房\)") -> pa.Array:
    """Strip a regex suffix from every value (M9 name cleanup)."""
    return pc.replace_substring_regex(arr, pattern, "")


def truncate(arr, limit: int = 250) -> pa.Array:
    """Clamp strings to *limit* chars (M10)."""
    return pc.utf8_slice_codeunits(arr, 0, limit)


def split_coords(arr) -> tuple[pa.Array, pa.Array]:
    """'lng,lat' strings -> (lng, lat) float64 arrays (M17)."""
    parts = pc.split_pattern(arr, ",")
    lng = pc.cast(pc.list_element(parts, 0), pa.float64())
    lat = pc.cast(pc.list_element(parts, 1), pa.float64())
    return lng, lat


def concat_key(prefix_arr, id_arr, sep: str = "_") -> pa.Array:
    """entity + '_' + id -> Source_ID-style keys (diandianzu.py:82)."""
    return pc.binary_join_element_wise(prefix_arr, id_arr, sep)


def build_signed_url(base: str, params: dict[str, str], secret: str,
                     sig_param: str = "sig") -> str:
    """Querystring + MD5 signature over path?query+secret — the signing
    scheme family the reference's API adapters implement (M12)."""
    qs = urlencode(sorted(params.items()))
    path = base.split("://", 1)[-1]
    path = path[path.find("/"):] if "/" in path else "/"
    sig = hashlib.md5((f"{path}?{qs}" + secret).encode()).hexdigest()
    return f"{base}?{qs}&{sig_param}={sig}"
