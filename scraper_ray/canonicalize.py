"""RFC 3986 URL canonicalization + SHA-1 keying (north-rule stage 1).

The reference scraper never canonicalizes URLs — its dedup key is the
site-specific ``Source_ID`` regex-extracted from item URLs
(reference: handlers/diandianzu.py:82,101; handlers/haozu.py:48,65-66).
The new engine generalizes that to a canonical-URL identity:

    canonical_url = rfc3986_normalize(url)      (this module)
    url_sha1      = sha1(canonical_url)          (20-byte binary key)
    doc_id        = sha1_hex(canonical_url)      (string id, fixture F1)

Normalization implemented (RFC 3986 §6.2.2 syntax-based normalization):
 - scheme + host lowercased
 - default ports removed (http:80 / https:443)
 - dot-segments resolved (§5.2.4)
 - percent-encoding: unreserved octets decoded, other triplets uppercased,
   raw octets that must be encoded are encoded
 - empty path -> "/"
 - fragment stripped
 - exact-duplicate ``key=value`` query pairs removed (first kept, order
   preserved — semantics-preserving; we never sort the query)

These pure functions run inside ``map_batches`` over Arrow batches; see
``canonicalize_batch`` at the bottom for the batch-level entry point.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

import pyarrow as pa

SUPPORTED_SCHEMES = ("http", "https")

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
# Octets that may appear raw in a path (pchar + "/") per RFC 3986.
_PATH_SAFE = _UNRESERVED | set("!$&'()*+,;=:@/")
# Octets that may appear raw in a query (pchar + "/" + "?").
_QUERY_SAFE = _PATH_SAFE | set("?")

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# PSL-lite: multi-label public suffixes we recognize. A real deployment
# would ship the full Public Suffix List as a broadcast lookup table; the
# registered-domain contract (frontier partition key) is identical.
_MULTIPART_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "gov.uk", "ac.uk",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "com.au", "net.au", "org.au",
        "co.jp", "ne.jp", "or.jp",
        "com.br", "com.mx", "co.in", "co.kr",
    }
)


def _normalize_pct(s: str, safe: set[str]) -> str:
    """Percent-encoding normalization of one URL component.

    Decodes unreserved octets, uppercases remaining triplets, encodes raw
    octets that are not safe for this component. Invalid '%' sequences are
    encoded literally (as browsers do).
    """
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            hex2 = s[i + 1 : i + 3]
            if len(hex2) == 2 and all(h in "0123456789abcdefABCDEF" for h in hex2):
                octet = int(hex2, 16)
                ch = chr(octet)
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + hex2.upper())
                i += 3
                continue
            out.append("%25")  # bare '%'
            i += 1
            continue
        if c in safe:
            out.append(c)
        else:
            out.extend("%{:02X}".format(b) for b in c.encode("utf-8"))
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    # Work segment-wise; a leading '/' is preserved by construction.
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if output:
                output.pop()
            continue
        output.append(seg)
    # Re-add trailing '/' when the final segment was '.' or '..'.
    if path.endswith(("/.", "/..")) or path.endswith("/"):
        trailing = "/"
    else:
        trailing = ""
    joined = "/".join(output)
    if not joined.startswith("/"):
        joined = "/" + joined.lstrip("/")
    if trailing and not joined.endswith("/"):
        joined += "/"
    return joined


import re as _re

# Fast-path recognizer: URLs already in canonical form (lowercase host, no
# default port / userinfo / query / fragment / percent-escapes / dot
# segments, all path octets raw-safe). The slow path below is the
# authority; tests assert the two agree (test_canonicalize.py).
_FAST_HOST_RE = _re.compile(r"[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?")
_FAST_PATH_RE = _re.compile(r"(?:/[A-Za-z0-9\-._~!$&'()*+,;=:@]*)+")


def _canonical_fast(url: str) -> str | None:
    if url.startswith("http://"):
        rest = url[7:]
    elif url.startswith("https://"):
        rest = url[8:]
    else:
        return None
    slash = rest.find("/")
    host, path = (rest, "") if slash == -1 else (rest[:slash], rest[slash:])
    if not _FAST_HOST_RE.fullmatch(host):
        return None
    if path and ("/../" in path or "/./" in path
                 or path.endswith(("/..", "/."))
                 or not _FAST_PATH_RE.fullmatch(path)):
        return None
    return url if path else url + "/"


def canonicalize_url(url: str) -> str | None:
    """Return the canonical form of *url*, or None if unsupported/invalid."""
    if not url:
        return None
    fast = _canonical_fast(url)
    if fast is not None:
        return fast
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in SUPPORTED_SCHEMES:
        return None
    try:
        host = (parts.hostname or "").lower().rstrip(".")
        port = parts.port   # raises ValueError on malformed/out-of-range ports
    except ValueError:
        return None
    if not host:
        return None
    # IPv6 literals must keep their brackets in the rebuilt netloc
    netloc = f"[{host}]" if ":" in host else host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{netloc}:{port}"
    if parts.username:
        userinfo = parts.username + (":" + parts.password if parts.password else "")
        netloc = f"{userinfo}@{netloc}"
    path = _normalize_pct(parts.path, _PATH_SAFE)
    path = _remove_dot_segments(path) if path else "/"
    query = _normalize_pct(parts.query, _QUERY_SAFE)
    if query:
        seen_pairs: set[str] = set()
        kept: list[str] = []
        for pair in query.split("&"):
            if pair and pair not in seen_pairs:
                seen_pairs.add(pair)
                kept.append(pair)
        query = "&".join(kept)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out


from functools import lru_cache


@lru_cache(maxsize=1 << 17)
def registered_domain(host: str) -> str:
    """Registered (pay-level) domain of *host* — the frontier partition key.

    PSL-lite: known multi-label suffixes take three labels, everything else
    two; IP literals and single-label hosts are returned unchanged.
    """
    host = host.lower().rstrip(".")
    if (not host or ":" in host                       # IPv6 literal
            or host.replace(".", "").isdigit()):      # IPv4 literal
        return host
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _MULTIPART_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def sha1_url(canonical_url: str) -> bytes:
    return hashlib.sha1(canonical_url.encode("utf-8")).digest()


def doc_id_for(canonical_url: str) -> str:
    return hashlib.sha1(canonical_url.encode("utf-8")).hexdigest()


def host_of(canonical_url: str) -> str:
    """Host of an already-canonical URL — cheap string slicing (the hot
    discover path calls this per child; urlsplit costs ~10x more)."""
    start = canonical_url.find("://") + 3
    end = canonical_url.find("/", start)
    netloc = canonical_url[start : end if end != -1 else len(canonical_url)]
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if netloc.startswith("["):           # bracketed IPv6 literal
        return netloc[1 : netloc.find("]")]
    if ":" in netloc:
        netloc = netloc.split(":", 1)[0]
    return netloc


# ---------------------------------------------------------------------------
# Batch-level entry point (map_batches, batch_format="pyarrow")
# ---------------------------------------------------------------------------

FRONTIER_FIELDS = [
    ("url", pa.string()),           # canonical URL
    ("url_sha1", pa.binary(20)),
    ("host", pa.string()),
    ("domain_key", pa.string()),
    ("depth", pa.int32()),
    ("parent_id", pa.string()),     # parent doc_id ('' for seeds)
    ("child_idx", pa.int32()),      # DOM/discovery order under the parent
    ("path", pa.string()),          # discovery path, 8-hex per hop
]
FRONTIER_SCHEMA = pa.schema(FRONTIER_FIELDS)


def encode_hop(idx: int) -> str:
    """One discovery-path hop as fixed-width hex (lexicographic = numeric)."""
    assert 0 <= idx < 1 << 32
    return format(idx, "08x")


def frontier_table(
    urls: list[str],
    depth: int | list[int],
    parent_ids: str | list[str],
    child_idxs: list[int] | None = None,
    parent_paths: str | list[str] = "",
) -> pa.Table:
    """Canonicalize raw *urls* into a frontier-schema table.

    Invalid / unsupported URLs are dropped (the reference drops them
    silently via its try/except parse wrappers, handlers/diandianzu.py:31-35;
    we drop at canonicalization and count upstream). Duplicate canonical
    URLs within the input are collapsed keeping the lowest (depth, path)
    key — first-discovery-wins in the reference's sequential order, since
    the discovery path (seed idx -> page chain -> DOM slot chain) IS that
    order (handlers/scrapers.py:88-150) generalized to a sortable key.
    """
    n = len(urls)
    depths = [depth] * n if isinstance(depth, int) else depth
    parents = [parent_ids] * n if isinstance(parent_ids, str) else parent_ids
    idxs = child_idxs if child_idxs is not None else list(range(n))
    ppaths = [parent_paths] * n if isinstance(parent_paths, str) else parent_paths

    best: dict[str, tuple] = {}
    for raw, d, p, ci, pp in zip(urls, depths, parents, idxs, ppaths):
        cu = canonicalize_url(raw)
        if cu is None:
            continue
        key = (d, pp + encode_hop(ci), p, ci)
        prev = best.get(cu)
        if prev is None or key[:2] < prev[:2]:
            best[cu] = key
    rows = sorted(best.items(), key=lambda kv: kv[1][:2])
    cols: dict[str, list] = {name: [] for name, _ in FRONTIER_FIELDS}
    for cu, (d, path, p, ci) in rows:
        h = host_of(cu)
        cols["url"].append(cu)
        cols["url_sha1"].append(sha1_url(cu))
        cols["host"].append(h)
        cols["domain_key"].append(registered_domain(h))
        cols["depth"].append(d)
        cols["parent_id"].append(p)
        cols["child_idx"].append(ci)
        cols["path"].append(path)
    return pa.table(
        {name: pa.array(cols[name], type=typ) for name, typ in FRONTIER_FIELDS},
        schema=FRONTIER_SCHEMA,
    )


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: raw seed batch (column ``url``) -> frontier rows."""
    urls = batch.column("url").to_pylist()
    return frontier_table(urls, depth=0, parent_ids="")
