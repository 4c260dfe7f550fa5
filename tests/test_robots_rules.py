"""robots.txt matcher + crawl-rule engine goldens.

robots semantics per crawler-commons SimpleRobotRulesParser behaviors the
reference relies on (lib/crawler/robots_txt_parser.rb, robots_txt_service.rb);
crawl-rule table from docs/features/CRAWL_RULES.md:46-60.
"""

import pytest

from crawler_spark.functions.robots import (
    RobotRules,
    failed_fetch,
    parse_robots_txt,
    strip_non_ascii,
)
from crawler_spark.functions.rules import RuleEngine, url_pattern


BASIC = """
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2
Sitemap: /sitemap.xml
Sitemap: http://example.com/other.xml
"""


def test_basic_allow_disallow():
    r = parse_robots_txt(BASIC, base_url="http://example.com/robots.txt")
    assert r.allowed("http://example.com/") is True
    assert r.allowed("/public/page") is True
    assert r.allowed("/private/page") is False
    # longest match wins: /private/ok beats /private/
    assert r.allowed("/private/ok/deep") is True
    assert r.crawl_delay_s() == 2.0
    assert r.sitemaps == ["http://example.com/sitemap.xml", "http://example.com/other.xml"]


def test_agent_groups_most_specific_wins():
    body = """
User-agent: *
Disallow: /all
User-agent: elastic-crawler
Disallow: /elastic
"""
    r = parse_robots_txt(body, agent="Elastic-Crawler")
    assert r.allowed("/all") is True
    assert r.allowed("/elastic") is False
    other = parse_robots_txt(body, agent="SomeBot")
    assert other.allowed("/all") is False
    assert other.allowed("/elastic") is True


def test_wildcards_and_anchor():
    body = """
User-agent: *
Disallow: /*.pdf$
Disallow: /tmp*/x
"""
    r = parse_robots_txt(body)
    assert r.allowed("/doc.pdf") is False
    assert r.allowed("/doc.pdf?x=1") is True  # $ anchors end
    assert r.allowed("/a/b/doc.pdf") is False
    assert r.allowed("/tmp123/x") is False
    assert r.allowed("/tmp123/y") is True


def test_empty_disallow_allows_all():
    r = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert r.allow_all()
    assert r.allowed("/anything") is True


def test_tie_prefers_allow():
    r = parse_robots_txt("User-agent: *\nDisallow: /dir/\nAllow: /dir/\n")
    assert r.allowed("/dir/x") is True


def test_crawl_delay_negative_is_none():
    r = RobotRules(crawl_delay_ms=-1000)
    assert r.crawl_delay_s() is None
    assert parse_robots_txt("User-agent: *\nCrawl-delay: 1.5\n").crawl_delay_s() == 1.5


def test_failed_fetch_semantics():
    # robots_txt_parser.rb:69-79 + service: 4xx allow-all, 5xx allow-none
    assert failed_fetch(404).allow_all()
    assert failed_fetch(403).allow_all()
    assert failed_fetch(500).allow_none()
    assert failed_fetch(301).allow_none()
    assert failed_fetch(503).allowed("/x") is False
    assert failed_fetch(404).allowed("/x") is True


def test_non_ascii_stripped():
    # robots_txt_parser.rb:13-22: bytes > 127 dropped before parse
    body = "User-agent: *\nDisallow: /café\n"
    assert "é" not in strip_non_ascii(body)
    r = parse_robots_txt(body)
    assert r.allowed("/caf") is False  # pattern degraded to /caf


# --- crawl rules (CRAWL_RULES.md matching table) ---------------------------

TABLE = [
    ("/foo/bar", "begins", "/foo", True),
    ("/foo/bar", "begins", "/*oo", True),
    ("/bar/foo", "begins", "/foo", False),
    ("/foo/bar", "begins", "foo", False),
    ("/blog/posts/hello-world", "ends", "world", True),
    ("/blog/posts/hello-world", "ends", "hello-*", True),
    ("/blog/world-hello ", "ends", "world ", False),
    ("/blog/world-hello", "ends", "*world", False),
    ("/fruits/bananas", "contains", "banana", True),
    ("/fruits/apples", "contains", "banana", False),
    ("/2020", "regex", r"\/[0-9]{3,5}", True),
    ("/20", "regex", r"\/[0-9]{3,5}", False),
    ("/2020", "regex", "[0-9]{3,5}", False),
]


@pytest.mark.parametrize("path,rtype,pattern,match", TABLE)
def test_crawl_rule_matching_table(path, rtype, pattern, match):
    domain = "http://example.com"
    eng = RuleEngine.from_specs(domain, [("deny", rtype, pattern)])
    outcome = eng.outcome(domain + path)
    assert (outcome == "deny") is match


def test_first_match_wins_and_default_allow():
    domain = "http://example.com"
    eng = RuleEngine.from_specs(
        domain,
        [("allow", "begins", "/blog/public"), ("deny", "begins", "/blog")],
    )
    assert eng.outcome("http://example.com/blog/public/1") == "allow"
    assert eng.outcome("http://example.com/blog/private") == "deny"
    assert eng.outcome("http://example.com/other") == "allow"  # no match -> allow


def test_pattern_anchoring():
    # \A<escaped domain> — rule can't match mid-URL
    p = url_pattern("http://example.com", "begins", "/foo")
    assert p.startswith("\\Ahttp")
    eng = RuleEngine.from_specs("http://example.com", [("deny", "begins", "/foo")])
    assert eng.outcome("http://other.com/x?u=http://example.com/foo") == "allow"


def test_rule_regex_timeout_denies(monkeypatch):
    """rule_spec.rb:27-34 + rule_engine/base.rb:40-45: a catastrophically
    backtracking rule regex is time-bounded, and a timed-out rule DENIES."""
    import time

    from crawler_spark.functions import rules as rules_mod

    # the spec's own pattern ((((((a*)*)*)*)*)*)*… is handled by the regex
    # module WITHOUT backtracking blowup — strictly better than the
    # reference (fast no-match → allow, no timeout needed):
    spec_eng = rules_mod.RuleEngine.from_specs(
        "http://test1.example.com",
        [("deny", "regex",
          r"((((((a*)*)*)*)*)*)*((((((a*)*)*)*)*)*)*((((((a*)*)*)*)*)*)*$")],
    )
    t0 = time.time()
    assert spec_eng.outcome("http://test1.example.com//" + "a" * 45 + "b") == "allow"
    assert time.time() - t0 < 5.0

    # a pattern that DOES blow up pins the timeout → deny path
    eng = rules_mod.RuleEngine.from_specs(
        "http://test1.example.com", [("deny", "regex", r"/(a+)+$")]
    )
    url = "http://test1.example.com/" + "a" * 3000 + "b"
    monkeypatch.setattr(rules_mod, "REGEX_TIMEOUT_S", 0.005)
    t0 = time.time()
    assert eng.outcome(url) == "deny"
    assert time.time() - t0 < 5.0
