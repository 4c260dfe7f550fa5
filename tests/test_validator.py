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


def _live_outcomes(url, **cfg_kw):
    cfg = CrawlConfig(seed_urls=(url,), **cfg_kw)
    rep = validate_url(url, cfg, live=True)
    return _outcomes(rep), {r.name: r.detail for r in rep.results}


def test_live_dns_tcp_against_local_server():
    """urltest-style e2e (dns_check_concern.rb / tcp_check_concern.rb):
    a real listener on 127.0.0.1 gives dns ok (loopback allowed) and
    tcp ok; the same URL with loopback denied fails dns with the SSRF
    filter verdict; a dead port fails tcp."""
    import socket
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        o, d = _live_outcomes(
            f"http://127.0.0.1:{port}/", loopback_allowed=True)
        assert o["dns"] == "ok" and o["tcp"] == "ok"
        assert f"127.0.0.1:{port}" in d["tcp"]

        # SSRF policy: loopback denied -> dns failure, tcp never attempted
        o, d = _live_outcomes(f"http://127.0.0.1:{port}/")
        assert o["dns"] == "failure" and "tcp" not in o
        assert "SSRF" in d["dns"]
    finally:
        srv.shutdown()

    # closed port: dns ok, tcp failure
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    dead_port = probe.getsockname()[1]
    probe.close()
    o, d = _live_outcomes(
        f"http://127.0.0.1:{dead_port}/", loopback_allowed=True)
    assert o["dns"] == "ok" and o["tcp"] == "failure"


def test_live_dns_unresolvable_host_fails():
    o, d = _live_outcomes("https://definitely-not-a-real-host.invalid/")
    assert o["dns"] == "failure"
    assert "resolution failed" in d["dns"]
    assert "tcp" not in o
