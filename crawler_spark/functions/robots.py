"""robots.txt parsing/matching with crawler-commons semantics.

The reference delegates to crawler-commons' ``SimpleRobotRulesParser``
(``lib/crawler/robots_txt_parser.rb:10-80``); this is a from-scratch Python
implementation of the same publicly-documented behavior (Google robots.txt
spec / RFC 9309 longest-match semantics):

* bytes > 127 stripped before parsing (robots_txt_parser.rb:13-22)
* groups by ``User-agent``; our agent matches a group when the group's
  (lowercased) agent token is a substring of the lowercased agent name;
  the most specific (longest) matching token's group wins, else the ``*``
  group; multiple UA lines stack onto one group
* ``Allow``/``Disallow`` longest-pattern-match wins; tie → allow;
  ``*`` wildcard and ``$`` end-anchor supported; empty Disallow = allow all
* ``Crawl-delay`` seconds → stored in ms, negative → None
  (robots_txt_parser.rb:34-37); the reference disables the parser's
  max-crawl-delay clamp (62-66) so we apply none
* ``Sitemap`` lines collected, resolved against the robots.txt location
* fetch failures: HTTP 4xx → allow all, 5xx/other ≥300 → allow none
  (``failed_fetch`` — robots_txt_parser.rb:69-79, service semantics
  lib/crawler/robots_txt_service.rb:43-59)

Pure Python, usable inside vectorized pandas UDFs against broadcast rules.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from .urlnorm import split_url

DEFAULT_AGENT = "Elastic-Crawler"


def strip_non_ascii(content: str) -> str:
    """robots_txt_to_byte_array keeps only bytes <= 127."""
    if content is None:
        return ""
    return bytes(b for b in content.encode("utf-8", "replace") if b <= 127).decode("ascii")


class RobotRules:
    """Compiled per-domain rules. Picklable → broadcastable."""

    __slots__ = ("rules", "crawl_delay_ms", "sitemaps", "mode", "failure_status")

    def __init__(self, rules=None, crawl_delay_ms=None, sitemaps=None, mode="rules", failure_status=None):
        self.rules = rules or []  # list[(allow: bool, pattern: str)]
        self.crawl_delay_ms = crawl_delay_ms
        self.sitemaps = sitemaps or []
        self.mode = mode  # rules | allow_all | allow_none
        self.failure_status = failure_status

    # -- queries ----------------------------------------------------------

    def allow_all(self) -> bool:
        return self.mode == "allow_all" or (self.mode == "rules" and not self.rules)

    def allow_none(self) -> bool:
        return self.mode == "allow_none"

    def crawl_delay_s(self):
        """ms → seconds; negative → None (robots_txt_parser.rb:34-37)."""
        if self.crawl_delay_ms is None or self.crawl_delay_ms < 0:
            return None
        return self.crawl_delay_ms / 1000.0

    def allowed(self, url_or_path: str) -> bool:
        if self.mode == "allow_all":
            return True
        if self.mode == "allow_none":
            return False
        path = _path_for_match(url_or_path)
        best_len = -1
        best_allow = True
        for allow, pattern in self.rules:
            if _rule_matches(pattern, path):
                plen = len(pattern)
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = allow
        return best_allow if best_len >= 0 else True

    def to_tuple(self):
        return (self.rules, self.crawl_delay_ms, self.sitemaps, self.mode, self.failure_status)

    @classmethod
    def from_tuple(cls, t):
        return cls(*t)


def _path_for_match(url_or_path: str) -> str:
    if "://" in url_or_path:
        _s, _u, _h, _p, path, query, _f = split_url(url_or_path)
    else:
        path, _, query = url_or_path.partition("?")
        query = query if "?" in url_or_path else None
    path = path or "/"
    if query is not None:
        path += "?" + query
    return path


def _rule_matches(pattern: str, path: str) -> bool:
    """Google-spec wildcard match: '*' any run, '$' end anchor, prefix match."""
    if not pattern:
        return True
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    rx = "".join(re.escape(p) + ("(?:.*)" if i < len(parts) - 1 else "") for i, p in enumerate(parts))
    rx = rx + "$" if anchored else rx
    return re.match(rx, path) is not None


_LINE_RE = re.compile(r"^\s*([A-Za-z][A-Za-z\- ]*?)\s*:\s*(.*?)\s*$")


def parse_robots_txt(content: str, base_url: str = "", agent: str = DEFAULT_AGENT) -> RobotRules:
    """Parse robots.txt content into :class:`RobotRules` for ``agent``."""
    content = strip_non_ascii(content)
    agent_lc = agent.lower()

    groups = []  # list of dict(tokens=[...], rules=[...], delay=None)
    cur = None
    collecting_agents = False
    sitemaps: list[str] = []

    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        m = _LINE_RE.match(line)
        if not m:
            continue
        field = m.group(1).strip().lower().replace(" ", "")
        value = m.group(2).strip()
        if field in ("user-agent", "useragent"):
            if cur is None or not collecting_agents:
                cur = {"tokens": [], "rules": [], "delay": None}
                groups.append(cur)
            cur["tokens"].append(value.lower())
            collecting_agents = True
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if cur is None:
                continue
            if field == "disallow" and not value:
                continue  # empty Disallow: allow all (no rule)
            if value:
                cur["rules"].append((field == "allow", _decode_pattern(value)))
        elif field in ("crawl-delay", "crawldelay"):
            collecting_agents = False
            if cur is not None:
                try:
                    cur["delay"] = int(float(value) * 1000)
                except ValueError:
                    pass
        elif field == "sitemap":
            collecting_agents = False
            if value:
                sitemaps.append(urljoin(base_url, value) if base_url else value)
        else:
            collecting_agents = False

    # pick the most specific matching group, else '*'
    best = None
    best_len = -1
    star = None
    for g in groups:
        for tok in g["tokens"]:
            if tok == "*":
                if star is None:
                    star = g
            elif tok and tok in agent_lc and len(tok) > best_len:
                best = g
                best_len = len(tok)
    chosen = best if best is not None else star
    if chosen is None:
        return RobotRules(sitemaps=sitemaps, mode="allow_all")
    return RobotRules(
        rules=chosen["rules"], crawl_delay_ms=chosen["delay"], sitemaps=sitemaps, mode="rules"
    )


def _decode_pattern(p: str) -> str:
    """Percent-decode pattern except %2F, per Google spec/crawler-commons."""
    out = []
    i = 0
    while i < len(p):
        if p[i] == "%" and i + 3 <= len(p):
            hx = p[i + 1 : i + 3]
            if re.fullmatch(r"[0-9A-Fa-f]{2}", hx) and hx.upper() != "2F":
                out.append(chr(int(hx, 16)))
                i += 3
                continue
        out.append(p[i])
        i += 1
    return "".join(out)


def failed_fetch(status_code: int) -> RobotRules:
    """4xx → allow all; anything else ≥300 → allow none
    (robots_txt_parser.rb:69-79; service rule_engine failed-fetch path)."""
    if 400 <= status_code < 500:
        return RobotRules(mode="allow_all", failure_status=status_code)
    return RobotRules(mode="allow_none", failure_status=status_code)
