"""robots.txt parsing (RFC 9309) — rules the crawl admission path enforces.

The reference has no robots handling (its politeness is random sleeps,
handlers/diandianzu.py:40, handlers/haozu.py:41); the north rule asks for
"per-host politeness-aware priority queue (robots.txt + crawl-delay)".
This module turns fetched ``/robots.txt`` bytes into the per-domain rules
that ``PolitenessConfig`` (synthweb.py) carries and ``robots_filter``
(state/scheduler.py) enforces vectorized on the admission path:

- **groups** (RFC 9309 §2.2.1): consecutive ``User-agent`` lines head a
  group of ``Allow``/``Disallow``/``Crawl-delay`` rules; a ``User-agent``
  line after rule lines starts a new group. The crawler obeys the
  group(s) whose product token matches it most specifically — exact
  (case-insensitive) token match first, else the longest token that is a
  prefix of the agent name, else the ``*`` groups; ALL groups at the
  winning specificity merge (§2.2.1 "combinable").
- **rule matching** (§2.2.2): longest-match wins between Allow and
  Disallow; equal lengths resolve to Allow (least restrictive). ``*``
  matches any octet sequence and ``$`` anchors the end.
- ``Crawl-delay`` is non-standard but ubiquitous; parsed as float
  seconds and mapped onto the engine's deterministic budget units by
  the caller (stages/robots.py).

Everything here is pure and byte-deterministic — usable directly inside
``map_batches`` (one robots fetch+parse per registered domain is a
vanishing fraction of crawl work; see stages/robots.py for the
distributed discovery stage and its 10^8-domain scale notes).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

#: product token this engine matches robots groups against
DEFAULT_AGENT = "graftbot"

_FIELD_RE = re.compile(r"^([a-zA-Z\-]+)\s*:\s*(.*)$")


@dataclass(frozen=True)
class RobotsRules:
    """Effective rules for one (domain, agent) after group resolution.

    ``sitemaps`` (sitemaps.org extension) is collected file-wide — the
    Sitemap field is independent of user-agent groups."""

    disallow: tuple[str, ...] = ()
    allow: tuple[str, ...] = ()
    crawl_delay: float | None = None
    sitemaps: tuple[str, ...] = ()

    def allowed(self, path: str) -> bool:
        """RFC 9309 §2.2.2 longest-match; ties resolve to allow."""
        if not path:
            path = "/"
        d = max((len(r) for r in self.disallow if _rule_matches(r, path)),
                default=-1)
        if d < 0:
            return True
        a = max((len(r) for r in self.allow if _rule_matches(r, path)),
                default=-1)
        return a >= d

    def plain_prefixes(self) -> tuple[tuple[str, ...], tuple[str, ...]]:
        """(disallow, allow) rules that are plain path prefixes — the
        subset ``PolitenessConfig``/``robots_filter`` enforce with
        vectorized ``starts_with`` kernels. Wildcard rules (``*``/``$``)
        are excluded; callers count them so nothing drops silently."""
        return (
            tuple(r for r in self.disallow if not _has_wildcard(r)),
            tuple(r for r in self.allow if not _has_wildcard(r)),
        )


def _has_wildcard(rule: str) -> bool:
    return "*" in rule or rule.endswith("$")


def _rule_matches(rule: str, path: str) -> bool:
    """Does *rule* (with ``*``/``$`` wildcards) match *path* from its
    start? Plain rules take the fast prefix path."""
    if not _has_wildcard(rule):
        return path.startswith(rule)
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = ".*".join(re.escape(p) for p in body.split("*"))
    pat = "^" + pat + ("$" if anchored else "")
    return re.match(pat, path) is not None


def parse_robots(text: str, agent: str = DEFAULT_AGENT) -> RobotsRules:
    """Parse robots.txt *text* into the rules governing *agent*.

    Tolerant per RFC 9309 §2.2: unknown fields are ignored, ``#``
    comments stripped, field names case-insensitive, empty
    Allow/Disallow values ignored (an empty Disallow permits
    everything). A file with no matching group (and no ``*`` group)
    yields empty rules — everything allowed.
    """
    agent_l = agent.lower()
    # group = (agent_tokens, disallow, allow, crawl_delay)
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    cur_tokens: list[str] = []
    cur_dis: list[str] = []
    cur_allow: list[str] = []
    cur_delay: float | None = None
    sitemaps: list[str] = []
    in_rules = False   # rule line seen since the last User-agent line

    def flush() -> None:
        nonlocal cur_tokens, cur_dis, cur_allow, cur_delay
        if cur_tokens:
            groups.append((cur_tokens, cur_dis, cur_allow, cur_delay))
        cur_tokens, cur_dis, cur_allow, cur_delay = [], [], [], None

    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        m = _FIELD_RE.match(line)
        if not m:
            continue
        fld, val = m.group(1).lower(), m.group(2).strip()
        if fld == "user-agent":
            if in_rules:
                flush()
                in_rules = False
            cur_tokens.append(val.lower())
        elif fld in ("disallow", "allow", "crawl-delay"):
            in_rules = True
            if not cur_tokens:
                continue   # rules before any User-agent line: ignored
            if fld == "disallow" and val:
                cur_dis.append(val)
            elif fld == "allow" and val:
                cur_allow.append(val)
            elif fld == "crawl-delay":
                try:
                    cur_delay = float(val)
                except ValueError:
                    pass
        elif fld == "sitemap" and val:
            sitemaps.append(val)   # cross-group, file-wide
        # anything else (Host, ...): ignored
    flush()

    # group resolution: exact token match > longest prefix token > '*'
    def specificity(tokens: list[str]) -> int:
        best = -1
        for t in tokens:
            if t == agent_l:
                best = max(best, 1_000_000 + len(t))
            elif t != "*" and agent_l.startswith(t):
                best = max(best, len(t))
        return best

    spec = max((specificity(t) for t, *_ in groups), default=-1)
    if spec < 0:
        winning = [g for g in groups if "*" in g[0]]
    else:
        winning = [g for g in groups if specificity(g[0]) == spec]

    dis: list[str] = []
    allow: list[str] = []
    delay: float | None = None
    for _, g_dis, g_allow, g_delay in winning:
        dis.extend(g_dis)
        allow.extend(g_allow)
        if g_delay is not None:
            delay = g_delay if delay is None else min(delay, g_delay)
    return RobotsRules(tuple(dis), tuple(allow), delay, tuple(sitemaps))
