"""URL validator diagnostic chain (url_validator.rb:16-53 equivalent) —
pure-Python, no Spark session."""

from crawler_spark.config import CrawlConfig
from crawler_spark.functions.robots import parse_robots_txt
from crawler_spark.plans.validator import validate_url

CFG = CrawlConfig(
    seed_urls=("https://site0.test/",),
    crawl_rules={"https://site0.test": [("deny", "begins", "/denied")]},
)

ROBOTS = {
    "https://site0.test:443": parse_robots_txt(
        "User-agent: *\nDisallow: /private/\n",
        base_url="https://site0.test/robots.txt",
        agent="Elastic-Crawler",
    ).to_tuple()
}


def _outcomes(rep):
    return {r.name: r.outcome for r in rep.results}


def test_valid_url_full_chain_ok():
    rep = validate_url("https://site0.test/page", CFG, ROBOTS, page_exists=True)
    assert rep.valid
    o = _outcomes(rep)
    assert o["url"] == "ok" and o["domain_access"] == "ok"
    assert o["robots_txt"] == "ok" and o["crawl_rules"] == "ok"
    assert o["content"] == "ok"
    assert o["dns"] == "skipped" and o["tcp"] == "skipped"


def test_malformed_url_fails_first_check():
    rep = validate_url("not a url", CFG)
    assert not rep.valid
    assert rep.results[0].name == "url" and rep.results[0].outcome == "failure"
    assert rep.normalized is None


def test_offsite_fails_domain_access():
    rep = validate_url("https://elsewhere.example/x", CFG, ROBOTS)
    assert not rep.valid
    assert _outcomes(rep)["domain_access"] == "failure"


def test_robots_disallow_detected():
    rep = validate_url("https://site0.test/private/x", CFG, ROBOTS)
    assert not rep.valid
    assert _outcomes(rep)["robots_txt"] == "failure"


def test_crawl_rule_deny_detected():
    rep = validate_url("https://site0.test/denied/x", CFG, ROBOTS)
    assert not rep.valid
    assert _outcomes(rep)["crawl_rules"] == "failure"


def test_missing_page_fails_content():
    rep = validate_url("https://site0.test/nope", CFG, ROBOTS, page_exists=False)
    assert not rep.valid
    assert _outcomes(rep)["content"] == "failure"


def test_no_corpus_skips_content():
    rep = validate_url("https://site0.test/page", CFG, ROBOTS)
    assert rep.valid
    assert _outcomes(rep)["content"] == "skipped"
