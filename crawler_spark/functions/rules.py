"""Crawl-rule (allow/deny) engine.

Reproduces the reference's rule compilation and first-match-wins evaluation:

* pattern compiler — ``lib/crawler/utils.rb:11-31``:
  ``\\A<escaped domain><path pattern>`` where path pattern is
  ``begins`` → escaped pattern with ``*`` → ``.*``;
  ``ends`` → ``.*<pattern>\\z``; ``contains`` → ``.*<pattern>``;
  ``regex`` → raw pattern.
* evaluation — ``lib/crawler/rule_engine/base.rb:39-63``: ordered rules,
  first match wins, no match → allow. Rule regex timeout 1 s
  (``lib/crawler/data/rule.rb:14,34-38``) — approximated with the ``regex``
  module's timeout parameter.

Matching table pinned from ``docs/features/CRAWL_RULES.md:46-60``.
"""

from __future__ import annotations

import re

import regex as _regex

ALLOW = "allow"
DENY = "deny"
RULE_TYPES = ("begins", "ends", "contains", "regex")
REGEX_TIMEOUT_S = 1.0


def pattern_with_wildcard(pattern: str) -> str:
    """Regexp.escape then '*' wildcard → '.*' (utils.rb:28-30)."""
    return re.escape(pattern).replace(r"\*", ".*")


def path_pattern(rule_type: str, pattern: str) -> str:
    if rule_type == "begins":
        return pattern_with_wildcard(pattern)
    if rule_type == "ends":
        return f".*{pattern_with_wildcard(pattern)}\\Z"
    if rule_type == "contains":
        return f".*{pattern_with_wildcard(pattern)}"
    if rule_type == "regex":
        return pattern
    raise ValueError(f"unsupported rule type: {rule_type!r}")


def url_pattern(domain: str, rule_type: str, pattern: str) -> str:
    """Anchored full-URL pattern (utils.rb:11-13). ``domain`` is the
    normalized site string, e.g. ``https://example.com``."""
    return f"\\A{re.escape(domain)}{path_pattern(rule_type, pattern)}"


class CompiledRule:
    __slots__ = ("policy", "rx", "source")

    def __init__(self, policy: str, pattern: str, source=None):
        if policy not in (ALLOW, DENY):
            raise ValueError(f"policy {policy!r} is not supported")
        # Ruby \A / \z anchors — the regex module supports \A; \z → \Z in
        # Python semantics (end of string).
        self.rx = _regex.compile(pattern.replace("\\z", "\\Z"))
        self.policy = policy
        self.source = source

    def url_match(self, url: str) -> bool:
        try:
            return self.rx.search(url, timeout=REGEX_TIMEOUT_S) is not None
        except TimeoutError:
            return False


class RuleEngine:
    """Ordered first-match-wins rule list for one domain
    (rule_engine/base.rb:50-63). Picklable via spec lists."""

    def __init__(self, compiled: list[CompiledRule]):
        self.rules = compiled

    @classmethod
    def from_specs(cls, domain: str, specs) -> "RuleEngine":
        """specs: iterable of (policy, type, pattern) or dicts."""
        out = []
        for s in specs:
            if isinstance(s, dict):
                policy, rtype, pattern = s["policy"], s["type"], s["pattern"]
            else:
                policy, rtype, pattern = s
            out.append(CompiledRule(policy, url_pattern(domain, rtype, pattern), source=s))
        return cls(out)

    def outcome(self, url: str) -> str:
        """Return 'allow' or 'deny' for a normalized URL string.

        No matching rule → allow (rule_engine/base.rb:58-62); a rule whose
        regex times out denies (rule_engine/base.rb:40-45).
        """
        for r in self.rules:
            try:
                if r.rx.search(url, timeout=REGEX_TIMEOUT_S) is not None:
                    return r.policy
            except TimeoutError:
                return DENY
        return ALLOW
