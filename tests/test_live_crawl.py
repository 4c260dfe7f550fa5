"""Live-fetch mode e2e: the engine crawls a REAL HTTP site served on
127.0.0.1 (the same strategy as the reference's Faux integration specs,
spec/support/faux) — robots honored, redirects followed via discovery,
404s recorded, docs extracted — with no pages table at all."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawler_spark.config import CrawlConfig
from crawler_spark.plans.crawl import SparkCrawler

SITE = {
    "/robots.txt": ("text/plain", "User-agent: *\nDisallow: /private/\n"),
    "/": (
        "text/html; charset=utf-8",
        '<html><head><title>root</title></head><body>home '
        '<a href="/a">a</a> <a href="/private/x">p</a> '
        '<a href="/missing">m</a> <a href="/r">r</a> '
        '<a href="/gz">g</a></body></html>',
    ),
    "/gz": ("text/html", "<html><head><title>GZ</title></head>"
                         "<body>zipped words</body></html>"),
    "/a": ("text/html", "<html><head><title>A</title></head>"
                        "<body>alpha beta</body></html>"),
    "/b": ("text/html", "<html><head><title>B</title></head>"
                        "<body>bee</body></html>"),
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/r":
            self.send_response(302)
            self.send_header("Location", "/b")
            self.end_headers()
            return
        entry = SITE.get(self.path)
        if entry is None:
            self.send_response(404)
            self.end_headers()
            return
        ctype, body = entry
        payload = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        if self.path == "/gz":  # forced-gzip server (http_client.rb:61-66)
            import gzip

            payload = gzip.compress(payload)
            self.send_header("Content-Encoding", "gzip")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture(scope="module")
def site_url():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_live_crawl_end_to_end(spark, tmp_path, site_url):
    cfg = CrawlConfig(
        seed_urls=(f"{site_url}/",),
        fetch_mode="live", loopback_allowed=True,
        purge_crawl_enabled=False,
    )
    res = SparkCrawler(
        spark, cfg, None, str(tmp_path / "st"), max_waves=10
    ).run()

    docs = {r["url"]: r for r in res.docs.collect()}
    assert set(docs) == {
        f"{site_url}/", f"{site_url}/a", f"{site_url}/b", f"{site_url}/gz"}
    assert docs[f"{site_url}/a"]["title"] == "A"
    assert docs[f"{site_url}/a"]["body"] == "alpha beta"
    # Content-Encoding: gzip transfer decoding (http_client.rb:61-66)
    assert docs[f"{site_url}/gz"]["body"] == "zipped words"

    seen = {r["norm_url"] for r in res.seen.collect()}
    assert f"{site_url}/missing" in seen  # fetched, 404, no doc
    assert f"{site_url}/r" in seen  # redirect result, target /b discovered
    assert f"{site_url}/private/x" not in seen  # robots denied pre-seen

    denied = {r["norm_url"]: r["deny_reason"]
              for r in res.lineage.filter("deny_reason is not null").collect()}
    assert denied.get(f"{site_url}/private/x") == "robots_txt_disallowed"

    # non-2xx fetches (the 404 and the 302 result) are failure outcomes,
    # same classification as corpus mode
    fails = {r["url"] for r in res.events.filter(
        "action = 'url-fetch' and outcome = 'failure'").collect()}
    assert fails == {f"{site_url}/missing", f"{site_url}/r"}


def test_live_mode_requires_no_pages_and_validates(spark, tmp_path):
    with pytest.raises(ValueError, match="pages table required"):
        SparkCrawler(
            spark, CrawlConfig(seed_urls=("https://x.test/",)), None,
            str(tmp_path / "st2"),
        )


def test_live_crawl_politeness_quota_waves(spark, tmp_path, site_url):
    """Politeness × live mode: a 1-second window with a 1-second
    crawl-delay gives each host a one-URL quota per wave, so the live
    crawl serializes into one-fetch waves (deterministic via wave counts,
    no timing assertions)."""
    cfg = CrawlConfig(
        seed_urls=(f"{site_url}/",),
        sitemap_discovery_disabled=True,
        fetch_mode="live", loopback_allowed=True,
        purge_crawl_enabled=False,
        politeness_window_s=1.0,
        default_crawl_delay_s=1.0,
    )
    crawler = SparkCrawler(spark, cfg, None, str(tmp_path / "st"), max_waves=12)
    res = crawler.run()
    # same final result set as the unthrottled crawl…
    assert {r["url"] for r in res.docs.collect()} == {
        f"{site_url}/", f"{site_url}/a", f"{site_url}/b", f"{site_url}/gz"}
    # …but serialized into one-fetch waves by the host quota
    waves = crawler.store.read_manifest()["waves"]
    readies = [w["ready"] for w in waves if "ready" in w]
    assert all(r <= 1 for r in readies) and len(readies) >= 5


def test_live_head_preflight_skips_binary_download(spark, tmp_path):
    """head_requests_enabled (http_executor.rb:48-50): a HEAD pre-flight
    classifies /blob as an unsupported binary and the body is NEVER
    GET-downloaded; the page is seen, denied by the output gate, and the
    server's method log proves no GET hit the blob."""
    calls = []

    class _H(BaseHTTPRequestHandler):
        def _respond(self, send_body):
            calls.append((self.command, self.path))
            if self.path == "/":
                payload = (b'<html><head><title>r</title></head>'
                           b'<body>x <a href="/blob">b</a></body></html>')
                ctype = "text/html"
            elif self.path == "/blob":
                payload = b"\x00" * 4096
                ctype = "application/octet-stream"
            elif self.path == "/robots.txt":
                payload = b"User-agent: *\nAllow: /\n"
                ctype = "text/plain"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            if send_body:
                self.wfile.write(payload)

        def do_GET(self):
            self._respond(True)

        def do_HEAD(self):
            self._respond(False)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        cfg = CrawlConfig(
            seed_urls=(f"{base}/",),
            fetch_mode="live", loopback_allowed=True,
            head_requests_enabled=True,
            purge_crawl_enabled=False,
        )
        res = SparkCrawler(spark, cfg, None, str(tmp_path / "st"), max_waves=5).run()
        assert {r["url"] for r in res.docs.collect()} == {f"{base}/"}
        assert f"{base}/blob" in {r["norm_url"] for r in res.seen.collect()}
        xt = {r["url"]: r["deny_reason"] for r in res.events.filter(
            "action = 'url-extracted' and outcome = 'denied'").collect()}
        assert xt.get(f"{base}/blob") == "content_type_denied"
        # the blob was HEADed, never GETted
        assert ("HEAD", "/blob") in calls
        assert ("GET", "/blob") not in calls
        # html pages go HEAD -> GET (pre-flight then download)
        assert ("GET", "/") in calls
    finally:
        server.shutdown()


def test_fetch_urls_host_parallel_and_polite(site_url):
    """Distinct hosts fetch concurrently; same-host requests stay
    serialized with crawl_delay between them. 127.0.0.1 and localhost
    alias the same server but are distinct politeness hosts."""
    import time

    from crawler_spark.operators.fetch_live import fetch_urls

    port = site_url.rsplit(":", 1)[1]
    host_a = [f"http://127.0.0.1:{port}{p}" for p in ("/", "/a", "/b")]
    host_b = [f"http://localhost:{port}{p}" for p in ("/", "/a", "/b")]
    urls = host_a + host_b
    delay = 0.6

    t0 = time.monotonic()
    bodies, done_at = fetch_urls(urls, delay_s=delay, threads=8)
    elapsed = time.monotonic() - t0

    # bodies arrive aligned to input order and non-empty
    assert len(bodies) == 6 and all(b and b"title" in b for b in bodies)
    # per-host serialization: consecutive same-host completions spaced
    # by at least ~crawl_delay
    for idxs in ((0, 1, 2), (3, 4, 5)):
        times = [done_at[i] for i in idxs]
        assert times == sorted(times)
        assert all(b - a >= delay * 0.9 for a, b in zip(times, times[1:]))
    # host-parallel: both hosts overlapped — total well under the
    # sequential floor of 4 inter-request delays (2.4s)
    assert elapsed < 2 * delay * 2 * 0.9 + 0.5

    # threaded and sequential modes produce identical bodies
    seq_bodies, _ = fetch_urls(urls, delay_s=0.0, threads=1)
    assert bodies == seq_bodies


def test_fetch_urls_adaptive_delay_backs_off_slow_host():
    """Heritrix-style delay-factor pacing: a host whose responses take
    ~0.3s gets ~factor*latency between requests; a fast host with the
    same settings is not slowed beyond the base delay."""
    import time

    class _Slow(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/slow"):
                time.sleep(0.3)
            body = b"<html><head><title>s</title></head><body>x</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    from crawler_spark.operators.fetch_live import fetch_urls

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Slow)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]
        slow = [f"http://127.0.0.1:{port}/slow{i}" for i in range(3)]
        fast = [f"http://localhost:{port}/fast{i}" for i in range(3)]

        _, done_slow = fetch_urls(slow, delay_s=0.0, adaptive_factor=2.0)
        gaps = [b - a for a, b in zip(done_slow, done_slow[1:])]
        # wait(2*~0.3s) + latency(~0.3s) between completions
        assert all(g >= 0.75 for g in gaps), gaps

        _, done_fast = fetch_urls(fast, delay_s=0.0, adaptive_factor=2.0)
        fgaps = [b - a for a, b in zip(done_fast, done_fast[1:])]
        # fast host: latency ~ms → adaptive delay ~ms, no slow-down
        assert all(g < 0.2 for g in fgaps), fgaps

        # cap honored: huge factor clamps to adaptive_max_s
        t0 = time.monotonic()
        fetch_urls(slow[:2], delay_s=0.0, adaptive_factor=100.0,
                   adaptive_max_s=0.5)
        assert time.monotonic() - t0 < 2.5  # 2 fetches + one 0.5s wait
    finally:
        server.shutdown()


def test_auth_header_for_url_matching():
    """basic → Basic base64(user:pass); raw passes through; matched on
    url.site with last-match-wins (http_header_service.rb:74-97)."""
    import base64

    from crawler_spark.operators.fetch_live import auth_header_for_url

    auth = (
        {"domain": "https://a.test", "type": "basic",
         "username": "u", "password": "p"},
        {"domain": "https://b.test", "type": "raw", "header": "Bearer tok"},
        {"domain": "https://a.test", "type": "raw", "header": "Bearer last"},
    )
    expected_basic = "Basic " + base64.b64encode(b"u:p").decode()
    assert auth_header_for_url("https://b.test/x", auth) == "Bearer tok"
    # last matching entry wins
    assert auth_header_for_url("https://a.test/x", auth) == "Bearer last"
    assert auth_header_for_url("https://c.test/x", auth) is None
    # port is part of the site
    assert auth_header_for_url("https://a.test:8443/x", auth) is None
    assert auth_header_for_url("https://a.test/x", auth[:1]) == expected_basic


def test_live_crawl_basic_auth_domain(spark, tmp_path):
    """A site that 401s without credentials crawls fully once the domain
    carries basic auth in the config (reference domains[].auth)."""
    import base64

    expected = "Basic " + base64.b64encode(b"crawler:secret").decode()

    class _Auth(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/robots.txt" and \
                    self.headers.get("Authorization") != expected:
                self.send_response(401)
                self.send_header("WWW-Authenticate", "Basic realm=t")
                self.end_headers()
                return
            body = (b"User-agent: *\n" if self.path == "/robots.txt" else
                    b'<html><head><title>t</title></head>'
                    b'<body>private <a href="/p">p</a></body></html>')
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Auth)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        cfg_noauth = CrawlConfig(
            seed_urls=(f"{base}/",), fetch_mode="live", loopback_allowed=True,
            purge_crawl_enabled=False, lineage_enabled=False)
        res = SparkCrawler(spark, cfg_noauth, None,
                           str(tmp_path / "s1"), max_waves=3).run()
        assert res.docs.count() == 0  # 401 everywhere -> no docs

        cfg_auth = CrawlConfig(
            seed_urls=(f"{base}/",), fetch_mode="live", loopback_allowed=True,
            purge_crawl_enabled=False, lineage_enabled=False,
            domain_auth=({"domain": base, "type": "basic",
                          "username": "crawler", "password": "secret"},))
        res = SparkCrawler(spark, cfg_auth, None,
                           str(tmp_path / "s2"), max_waves=3).run()
        assert res.docs.count() == 2  # / and /p
    finally:
        server.shutdown()


def test_fetch_urls_userinfo_gate():
    """Credential-bearing URLs over plain http are an Error result unless
    http_auth_allowed; when allowed, the userinfo becomes Basic auth
    (http_executor.rb:44-46)."""
    import base64

    expected = "Basic " + base64.b64encode(b"u:pw").decode()
    seen_auth = []

    class _Echo(BaseHTTPRequestHandler):
        def do_GET(self):
            seen_auth.append(self.headers.get("Authorization"))
            body = b"<html><head><title>t</title></head><body>x</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    from crawler_spark.operators.fetch_live import fetch_urls

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Echo)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]
        url = f"http://u:pw@127.0.0.1:{port}/x"
        bodies, _ = fetch_urls([url], http_auth_allowed=False)
        assert bodies[0] == b"<!--STATUS:599-->" and not seen_auth

        bodies, _ = fetch_urls([url], http_auth_allowed=True)
        assert b"title" in bodies[0]
        assert seen_auth == [expected]
    finally:
        server.shutdown()


def test_fetch_urls_via_forward_proxy():
    """With http_proxy_* configured, requests route through the proxy
    (absolute-form request line) carrying Proxy-Authorization from the
    proxy credentials (api/config.rb:83-88)."""
    import base64

    requests_seen = []

    class _Proxy(BaseHTTPRequestHandler):
        def do_GET(self):
            # a forward proxy receives the absolute URI in the request line
            requests_seen.append(
                (self.path, self.headers.get("Proxy-Authorization"))
            )
            body = b"<html><head><title>via-proxy</title></head><body>x</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    from crawler_spark.config import CrawlConfig
    from crawler_spark.operators.fetch_live import (
        fetch_urls,
        proxy_url_from_config,
    )

    proxy = ThreadingHTTPServer(("127.0.0.1", 0), _Proxy)
    threading.Thread(target=proxy.serve_forever, daemon=True).start()
    try:
        pport = proxy.server_address[1]
        cfg = CrawlConfig(
            seed_urls=("http://upstream.test/",),
            http_proxy_host="127.0.0.1", http_proxy_port=pport,
            http_proxy_username="pu", http_proxy_password="pp")
        purl = proxy_url_from_config(cfg)
        assert purl == f"http://pu:pp@127.0.0.1:{pport}"

        bodies, _ = fetch_urls(
            ["http://upstream.test/page"], proxy_url=purl)
        assert b"via-proxy" in bodies[0]
        path, pauth = requests_seen[0]
        assert path == "http://upstream.test/page"  # absolute-form = proxied
        assert pauth == "Basic " + base64.b64encode(b"pu:pp").decode()

        assert proxy_url_from_config(CrawlConfig(seed_urls=("http://a/",))) is None
    finally:
        proxy.shutdown()


def test_live_crawl_warc_archive_no_double_fetch(spark, tmp_path, site_url):
    """warc_export_dir archives every fetched page as WARC per wave; the
    persist guarantees live mode still GETs each URL exactly once, and
    read_warc round-trips the archive."""
    from collections import Counter

    from crawler_spark.sources.warc import read_warc

    counts: Counter = Counter()
    orig_do_get = _Handler.do_GET

    def counting_get(self):
        counts[self.path] += 1
        orig_do_get(self)

    _Handler.do_GET = counting_get
    try:
        warc_dir = str(tmp_path / "archive")
        cfg = CrawlConfig(
            seed_urls=(f"{site_url}/",), fetch_mode="live", loopback_allowed=True,
            purge_crawl_enabled=False, lineage_enabled=False,
            warc_export_dir=warc_dir)
        res = SparkCrawler(spark, cfg, None, str(tmp_path / "st"),
                           max_waves=5).run()
        n_docs = res.docs.count()
        assert n_docs >= 3

        # every URL the server saw was requested exactly once
        dupes = {p: c for p, c in counts.items() if c > 1}
        assert not dupes, dupes

        back = read_warc(spark, warc_dir + "/wave=*/*.warc.gz")
        archived = {r.url for r in back.select("url").collect()}
        # every page wave-fetched (incl. 404s/redirects as marker bodies)
        # is archived; all docs' URLs are present
        doc_urls = {r.url for r in res.docs.select("url").collect()}
        assert doc_urls <= archived
        assert back.count() == sum(counts.values()) - 1  # minus robots.txt
    finally:
        _Handler.do_GET = orig_do_get


def test_ssl_verification_modes(tmp_path):
    """full rejects a self-signed server (Error result 599), none accepts
    it, and full + the cert in ssl_ca_certificates accepts it too
    (reference ssl_verification_mode / ssl_ca_certificates)."""
    import ssl
    import subprocess

    cert = tmp_path / "srv.pem"
    key = tmp_path / "srv.key"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "2",
         "-subj", "/CN=127.0.0.1",
         "-addext", "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True)

    class _H(BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"<html><head><title>tls</title></head><body>s</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(str(cert), str(key))
    server.socket = sctx.wrap_socket(server.socket, server_side=True)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        from crawler_spark.operators.fetch_live import fetch_urls

        url = f"https://127.0.0.1:{server.server_address[1]}/x"
        bodies, _ = fetch_urls([url], ssl_mode="full")
        assert bodies[0] == b"<!--STATUS:599-->"  # untrusted self-signed

        bodies, _ = fetch_urls([url], ssl_mode="none")
        assert b"tls" in bodies[0]

        bodies, _ = fetch_urls([url], ssl_mode="full", ssl_cas=(str(cert),))
        assert b"tls" in bodies[0]

        # inline PEM form of the same CA
        bodies, _ = fetch_urls(
            [url], ssl_mode="full", ssl_cas=(cert.read_text(),))
        assert b"tls" in bodies[0]
    finally:
        server.shutdown()


def test_ssl_certificate_mode_skips_hostname_check(tmp_path):
    """'certificate' trusts the CA but ignores hostname mismatch; 'full'
    with the same CA still rejects a cert issued for another name."""
    import ssl
    import subprocess

    cert = tmp_path / "wrong.pem"
    key = tmp_path / "wrong.key"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "2",
         "-subj", "/CN=other.example",
         "-addext", "subjectAltName=DNS:other.example"],
        check=True, capture_output=True)

    class _H(BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"<html><head><title>cert</title></head><body>s</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(str(cert), str(key))
    server.socket = sctx.wrap_socket(server.socket, server_side=True)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        from crawler_spark.operators.fetch_live import fetch_urls

        url = f"https://127.0.0.1:{server.server_address[1]}/x"
        bodies, _ = fetch_urls(
            [url], ssl_mode="full", ssl_cas=(str(cert),))
        assert bodies[0] == b"<!--STATUS:599-->"  # hostname mismatch

        bodies, _ = fetch_urls(
            [url], ssl_mode="certificate", ssl_cas=(str(cert),))
        assert b"cert" in bodies[0]  # CA trusted, hostname ignored
    finally:
        server.shutdown()


def test_conditional_revalidation_304_recrawl(spark, tmp_path):
    """Crawl 1 stores ETags; the recrawl sends If-None-Match, the server
    answers 304 everywhere, and: no body is re-downloaded, the docs stay
    byte-identical and live (purge does NOT tombstone), and the recrawl's
    metrics record the 304s."""
    got_conditional = []
    full_downloads = []

    class _ETag(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                body = b"User-agent: *\n"
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            etag = f'"v1-{self.path}"'
            if self.headers.get("If-None-Match") == etag:
                got_conditional.append(self.path)
                self.send_response(304)
                self.send_header("ETag", etag)
                self.end_headers()
                return
            full_downloads.append(self.path)
            body = (
                f'<html><head><title>t{self.path}</title></head>'
                f'<body>page {self.path} <a href="/a">a</a> '
                f'<a href="/b">b</a></body></html>'
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _ETag)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        state = str(tmp_path / "st")
        cfg = CrawlConfig(seed_urls=(f"{base}/",), fetch_mode="live", loopback_allowed=True,
                          lineage_enabled=False)
        res1 = SparkCrawler(spark, cfg, None, state, max_waves=4).run()
        docs1 = {r.url: r.body for r in res1.docs.select("url", "body").collect()}
        assert len(docs1) == 3  # /, /a, /b
        n_full_first = len(full_downloads)
        assert n_full_first == 3 and not got_conditional

        res2 = SparkCrawler(spark, cfg, None, state, max_waves=4,
                            recrawl=True).run()
        docs2 = {r.url: r.body for r in res2.docs.select("url", "body").collect()}
        # nothing re-downloaded: every page request was conditional -> 304
        assert len(full_downloads) == n_full_first
        assert set(got_conditional) >= {"/", "/a", "/b"}
        # docs unchanged and alive (not tombstoned by the purge stage)
        assert docs2 == docs1
        # the recrawl recorded 304 fetches
        m = res2.metrics.filter("status = 304").agg({"n": "sum"}).collect()[0][0]
        assert m and m >= 3

        # validators survive state compaction: a third recrawl after
        # compact_state still revalidates with zero re-downloads
        crawler3 = SparkCrawler(spark, cfg, None, state, max_waves=4,
                                recrawl=True)
        crawler3.compact_state()
        res3 = crawler3.run()
        assert len(full_downloads) == n_full_first
        docs3 = {r.url: r.body for r in res3.docs.select("url", "body").collect()}
        assert docs3 == docs1
    finally:
        server.shutdown()


def test_fetch_urls_per_url_delays(site_url):
    """A delays list (robots Crawl-delay per host) overrides the global
    default for pacing."""
    from crawler_spark.operators.fetch_live import fetch_urls

    port = site_url.rsplit(":", 1)[1]
    urls = [f"http://127.0.0.1:{port}{p}" for p in ("/", "/a", "/b")]
    _, done = fetch_urls(urls, delay_s=0.0, delays=[0.5, 0.5, 0.5])
    gaps = [b - a for a, b in zip(done, done[1:])]
    assert all(g >= 0.45 for g in gaps), gaps

    # None entries fall back to delay_s (0 here): no pacing
    _, done = fetch_urls(urls, delay_s=0.0, delays=[None, None, None])
    gaps = [b - a for a, b in zip(done, done[1:])]
    assert all(g < 0.2 for g in gaps), gaps


def test_live_crawl_honors_robots_crawl_delay(spark, tmp_path):
    """robots.txt Crawl-delay reaches the in-task pacing: same-host
    fetches within a wave are spaced by the robots delay even with no
    configured default delay."""
    import time

    times: dict = {}

    class _Delayed(BaseHTTPRequestHandler):
        def do_GET(self):
            times.setdefault(self.path, time.monotonic())
            if self.path == "/robots.txt":
                body = b"User-agent: *\nCrawl-delay: 1\n"
                ctype = "text/plain"
            else:
                body = (b'<html><head><title>d</title></head><body>'
                        b'<a href="/a">a</a> <a href="/b">b</a></body></html>')
                ctype = "text/html"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Delayed)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        cfg = CrawlConfig(seed_urls=(f"{base}/",), fetch_mode="live", loopback_allowed=True,
                          purge_crawl_enabled=False, lineage_enabled=False,
                          default_crawl_delay_s=0.0)
        SparkCrawler(spark, cfg, None, str(tmp_path / "st"), max_waves=3).run()
        # /a and /b are the same wave, same host: robots Crawl-delay: 1
        # must space them
        assert "/a" in times and "/b" in times
        assert abs(times["/b"] - times["/a"]) >= 0.9
    finally:
        server.shutdown()


def test_retry_after_backoff_on_429():
    """A 429 with Retry-After is retried once after the stated wait
    (capped); a 429 without the header, or a second 429, is the final
    Error-shaped result."""
    import time

    hits: dict = {}

    class _RateLimit(BaseHTTPRequestHandler):
        def do_GET(self):
            n = hits[self.path] = hits.get(self.path, 0) + 1
            if self.path == "/flaky" and n == 1:
                self.send_response(429)
                self.send_header("Retry-After", "1")
                self.end_headers()
                return
            if self.path == "/always429":
                self.send_response(429)
                self.send_header("Retry-After", "1")
                self.end_headers()
                return
            if self.path == "/noheader":
                self.send_response(429)
                self.end_headers()
                return
            body = b"<html><head><title>ok</title></head><body>x</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    from crawler_spark.operators.fetch_live import http_fetch_one

    server = ThreadingHTTPServer(("127.0.0.1", 0), _RateLimit)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"

        t0 = time.monotonic()
        body, _, _ = http_fetch_one(f"{base}/flaky")
        assert b"ok" in body  # recovered after the retry
        assert time.monotonic() - t0 >= 0.9  # waited Retry-After
        assert hits["/flaky"] == 2

        body, _, _ = http_fetch_one(f"{base}/always429")
        assert body == b"<!--STATUS:429-->"
        assert hits["/always429"] == 2  # exactly one retry, then give up

        body, _, _ = http_fetch_one(f"{base}/noheader")
        assert body == b"<!--STATUS:429-->"
        assert hits["/noheader"] == 1  # no Retry-After -> no retry
    finally:
        server.shutdown()


def test_live_robots_dimension_mode(spark, tmp_path, site_url):
    """With the host count over robots_dimension_threshold, live mode
    fetches robots.txt on the executors (distributed dimension, no
    driver-side GET loop) and the crawl result is identical to the
    broadcast-dict path: robots disallow still honored."""
    from dataclasses import replace

    cfg = CrawlConfig(
        seed_urls=(f"{site_url}/",),
        fetch_mode="live", loopback_allowed=True,
        purge_crawl_enabled=False,
    )
    cfg = replace(cfg, robots_dimension_threshold=1)  # force the dimension
    res = SparkCrawler(spark, cfg, None, str(tmp_path / "st"), max_waves=10).run()
    assert {r["url"] for r in res.docs.collect()} == {
        f"{site_url}/", f"{site_url}/a", f"{site_url}/b", f"{site_url}/gz"}
    denied = {r["norm_url"]: r["deny_reason"]
              for r in res.lineage.filter("deny_reason is not null").collect()}
    assert denied.get(f"{site_url}/private/x") == "robots_txt_disallowed"


def test_ssrf_address_classification():
    """allowed_address mirrors filtering_dns_resolver.rb:83-97: loopback
    gated by loopback_allowed; RFC1918 / link-local / wildcard gated by
    private_networks_allowed; public addresses always pass."""
    import ipaddress

    from crawler_spark.operators.fetch_live import address_allowed

    ip = ipaddress.ip_address
    # defaults: everything non-public denied
    for bad in ("127.0.0.1", "::1", "10.0.0.8", "172.16.1.1", "172.31.255.1",
                "192.168.0.42", "169.254.169.254", "0.0.0.0", "fe80::1",
                "fec0::1"):
        assert not address_allowed(ip(bad)), bad
    for ok in ("93.184.216.34", "8.8.8.8", "2606:2800:220:1:248:1893:25c8:1946"):
        assert address_allowed(ip(ok)), ok
    # loopback flag frees loopback only
    assert address_allowed(ip("127.0.0.1"), loopback_allowed=True)
    assert not address_allowed(ip("10.0.0.8"), loopback_allowed=True)
    # private flag frees site/link/wildcard-local only
    assert address_allowed(ip("10.0.0.8"), private_networks_allowed=True)
    assert address_allowed(ip("169.254.169.254"), private_networks_allowed=True)
    assert not address_allowed(ip("127.0.0.1"), private_networks_allowed=True)
    # 172.32.x is OUTSIDE the /12 block — public
    assert address_allowed(ip("172.32.0.1"))


def test_ssrf_host_resolution_guard():
    from crawler_spark.operators.fetch_live import host_resolution_allowed

    assert not host_resolution_allowed("127.0.0.1")
    assert host_resolution_allowed("127.0.0.1", loopback_allowed=True)
    assert not host_resolution_allowed("localhost")
    assert not host_resolution_allowed("169.254.169.254")
    assert host_resolution_allowed(
        "169.254.169.254", private_networks_allowed=True)
    # unresolvable: the guard defers to the fetch's own DNS error
    assert host_resolution_allowed("definitely-not-a-real-host.invalid")


def test_ssrf_guard_denies_before_connecting():
    """The guard must short-circuit BEFORE any connection: a private-IP
    fetch with a long timeout returns the 599 marker immediately instead
    of hanging until the transport gives up."""
    import time

    from crawler_spark.operators.fetch_live import http_fetch_one

    t0 = time.monotonic()
    body, etag, lm = http_fetch_one(
        "http://10.255.255.1/latest/meta-data", timeout_s=30.0,
        loopback_allowed=False, private_networks_allowed=False,
    )
    assert body == b"<!--STATUS:599-->"
    assert etag is None and lm is None
    assert time.monotonic() - t0 < 2.0


def test_ssrf_live_crawl_denies_private_seed(spark, tmp_path, site_url):
    """E2E: loopback allowed (the test site works) but private networks
    NOT allowed -> a link-local metadata-service host is never contacted:
    its robots.txt fetch is guard-refused (the 599 Error marker), which
    the engine's 5xx-robots rule escalates to disallow-all, so the URL
    dies in the gate with a deny_reason and no document — the same
    never-touch-the-network outcome as the reference's InvalidHost."""
    meta = "http://169.254.169.254/latest/meta-data"
    cfg = CrawlConfig(
        seed_urls=(f"{site_url}/", meta),
        fetch_mode="live", loopback_allowed=True,
        purge_crawl_enabled=False,
    )
    res = SparkCrawler(spark, cfg, None, str(tmp_path / "st"), max_waves=3).run()
    # the real site still crawls
    assert f"{site_url}/" in {r["url"] for r in res.docs.collect()}
    # the private URL is denied, produced nothing, and was never fetched
    denied = {r["norm_url"]: r["deny_reason"]
              for r in res.lineage.filter("deny_reason is not null").collect()}
    assert denied[meta] == "robots_txt_disallowed"
    assert not any("169.254" in r["url"] for r in res.docs.collect())
    assert not any(
        "169.254" in (r["url"] or "")
        for r in res.events.filter("action = 'url-extracted'").collect()
    )


def test_ssrf_rebinding_between_check_and_connect(monkeypatch):
    """DNS rebinding: the resolver answers a PUBLIC address for the
    policy check and a LOOPBACK address when the connection resolves
    again. Because the filter runs inside connect() on the very answer
    being dialed, the rebound loopback answer is refused — the server on
    127.0.0.1 must never receive a request (the reference gets the same
    atomicity from its connection-manager resolver,
    filtering_dns_resolver.rb:36-48)."""
    import socket
    import threading

    from crawler_spark.operators import fetch_live
    from crawler_spark.operators.fetch_live import http_fetch_one

    hits = []

    class _H(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            body = b"secret"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    real_getaddrinfo = socket.getaddrinfo
    answers = iter(["93.184.216.34"] + ["127.0.0.1"] * 10)

    def rotating(host, *a, **k):
        if host == "rebind.test":
            ip = next(answers)
            return [(socket.AF_INET, socket.SOCK_STREAM, 6, "", (ip, port))]
        return real_getaddrinfo(host, *a, **k)

    monkeypatch.setattr(socket, "getaddrinfo", rotating)
    fetch_live._DNS_GUARD_CACHE.clear()
    try:
        body, _, _ = http_fetch_one(
            f"http://rebind.test:{port}/", timeout_s=5.0,
            loopback_allowed=False, private_networks_allowed=False,
        )
    finally:
        server.shutdown()
        fetch_live._DNS_GUARD_CACHE.clear()
    assert body == b"<!--STATUS:599-->"
    assert hits == []  # the loopback server was never contacted


def test_ssrf_mixed_records_connect_via_allowed_only(monkeypatch):
    """A host resolving to one disallowed and one allowed address must
    connect via the allowed one (reference parity: the resolver filters
    the address LIST, not the whole host)."""
    import socket
    import threading

    from crawler_spark.operators import fetch_live
    from crawler_spark.operators.fetch_live import http_fetch_one

    class _H(BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"<html><body>ok</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    real_getaddrinfo = socket.getaddrinfo

    def mixed(host, *a, **k):
        if host == "mixed.test":
            # 10.0.0.8 is site-local (denied: private_networks_allowed
            # False); 127.0.0.1 is allowed via loopback_allowed
            return [
                (socket.AF_INET, socket.SOCK_STREAM, 6, "", ("10.0.0.8", port)),
                (socket.AF_INET, socket.SOCK_STREAM, 6, "", ("127.0.0.1", port)),
            ]
        return real_getaddrinfo(host, *a, **k)

    monkeypatch.setattr(socket, "getaddrinfo", mixed)
    fetch_live._DNS_GUARD_CACHE.clear()
    try:
        body, _, _ = http_fetch_one(
            f"http://mixed.test:{port}/", timeout_s=5.0,
            loopback_allowed=True, private_networks_allowed=False,
        )
    finally:
        server.shutdown()
        fetch_live._DNS_GUARD_CACHE.clear()
    assert b"ok" in body  # served by the allowed loopback address
