"""Live HTTP fetch (S4's online half): crawl real sites instead of an
offline corpus.

The offline model encodes response semantics in the page bytes
(``<!--STATUS:nnn-->`` / ``<!--REDIRECT:loc-->`` / ``<!--MIME:type-->`` /
``<!--CHARSET:enc-->`` — the same trick the reference's integration specs
play with their Faux site DSL). The live fetcher ADAPTS real HTTP
responses into exactly those conventions, so everything downstream —
parse, gates, output rules, events, purge — runs unchanged in either
mode. Equivalent surface: http_executor.rb:40-132 + http_utils/
response.rb (redirects not auto-followed: a 3xx is a result whose
Location the discovery stage enqueues, http_executor.rb:57-70).

Scale/politeness shape: the wave arrives already quota'd per host by the
politeness scheduler; within a partition rows are fetched host-grouped
with ``crawl_delay`` sleeps between same-host requests, and partitions
are host-hashed so one host never fans out across executors (the
per-host serialization the reference gets from its single-threaded
per-task model). Arrow-batched mapInPandas — the network wait dominates,
Python overhead is irrelevant here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import CrawlConfig
from ..functions import urlnorm as U

FETCHED_COLS = (
    "url_hash string, norm_url string, task_type string, depth int, "
    "seq long, redirect_chain array<string>, html binary, warc_ts timestamp, "
    "etag string, last_modified string"
)


def auth_header_for_url(url: str, auth_configs: tuple) -> str | None:
    """Authorization header value for ``url`` from the per-domain auth
    list (http_header_service.rb:74-97 ``authorization_header_for_url``):
    entries match when their ``domain`` equals the URL's site
    (scheme://host[:port]); LAST matching entry wins. ``basic`` builds
    ``Basic base64(user:pass)``; ``raw`` passes the header through."""
    import base64

    site = U.url_site(url)
    value = None
    for a in auth_configs or ():
        if a.get("domain") != site:
            continue
        if a.get("type") == "basic":
            cred = f"{a.get('username', '')}:{a.get('password', '')}"
            value = "Basic " + base64.b64encode(cred.encode()).decode()
        elif a.get("type") == "raw":
            value = a.get("header")
    return value


def _addr_is_site_local(a) -> bool:
    """java InetAddress#isSiteLocalAddress semantics (what the reference
    tests via is_site_local_address?): RFC 1918 v4 ranges, fec0::/10 v6.
    Deliberately NOT python's broader ``is_private`` (which also covers
    loopback/link-local — those are separate checks, separate flags)."""
    import ipaddress

    if a.version == 4:
        return (
            a in ipaddress.ip_network("10.0.0.0/8")
            or a in ipaddress.ip_network("172.16.0.0/12")
            or a in ipaddress.ip_network("192.168.0.0/16")
        )
    return a in ipaddress.ip_network("fec0::/10")


def address_allowed(
    a, loopback_allowed: bool = False, private_networks_allowed: bool = False
) -> bool:
    """Mirror of filtering_dns_resolver.rb:83-97 ``allowed_address?`` /
    ``local_address?``: loopback gated by ``loopback_allowed``; site-local
    (RFC 1918), link-local (169.254/16, fe80::/10) and wildcard (0.0.0.0)
    gated by ``private_networks_allowed``."""
    if a.is_loopback and not loopback_allowed:
        return False
    if not private_networks_allowed and (
        _addr_is_site_local(a) or a.is_link_local or a.is_unspecified
    ):
        return False
    return True


_DNS_GUARD_CACHE: dict = {}


def host_resolution_allowed(
    host: str,
    loopback_allowed: bool = False,
    private_networks_allowed: bool = False,
) -> bool:
    """SSRF guard (filtering_dns_resolver.rb:63-80): resolve ``host`` and
    return False when every resolved address is disallowed (the
    reference raises InvalidHost there; our caller turns that into the
    ``<!--STATUS:599-->`` Error result). Unresolvable hosts return True
    — the fetch itself will surface the DNS error as the same 599, and
    a name that doesn't resolve can't be used to reach anything.

    This is the cheap cached FAST-DENY only: the authoritative filter
    runs at connection time (``_filtered_tcp_connect``), where the
    resolved answer used for policy is the answer dialed — atomic
    check-and-connect, same placement as the reference's
    connection-manager resolver, so DNS rebinding between a pre-check
    and the GET cannot flip the classification, and a host with one
    public and one private A record connects only via the public one.
    Results here are cached per process — executor-side this dedups the
    per-host lookup across a wave's URLs."""
    key = (host, loopback_allowed, private_networks_allowed)
    hit = _DNS_GUARD_CACHE.get(key)
    if hit is not None:
        return hit
    import ipaddress
    import socket

    try:
        infos = socket.getaddrinfo(host, None)
        addrs = {
            ipaddress.ip_address(i[4][0].split("%")[0]) for i in infos
        }
    except (OSError, ValueError):
        return True
    ok = any(
        address_allowed(a, loopback_allowed, private_networks_allowed)
        for a in addrs
    )
    if len(_DNS_GUARD_CACHE) < 65536:
        _DNS_GUARD_CACHE[key] = ok
    return ok


_SSL_CTX_CACHE: dict = {}


def ssl_context_for(mode: str = "full", ca_certificates: tuple = ()):
    """TLS context per the reference's ssl_verification_mode
    (api/config.rb:80-81; http_client.rb SSL setup): ``full`` verifies
    certificate + hostname, ``certificate`` skips the hostname check,
    ``none`` disables verification. ``ca_certificates`` entries are PEM
    file paths or inline PEM strings added to the trust store. Contexts
    aren't picklable, so executors build them lazily from these plain
    values (cached per process)."""
    import ssl

    key = (mode, tuple(ca_certificates or ()))
    ctx = _SSL_CTX_CACHE.get(key)
    if ctx is not None:
        return ctx
    ctx = ssl.create_default_context()
    for ca in ca_certificates or ():
        if "-----BEGIN" in ca:
            ctx.load_verify_locations(cadata=ca)
        else:
            ctx.load_verify_locations(cafile=ca)
    if mode == "certificate":
        ctx.check_hostname = False
    elif mode == "none":
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    _SSL_CTX_CACHE[key] = ctx
    return ctx


def proxy_url_from_config(cfg: CrawlConfig) -> str | None:
    """Forward-proxy URL from the http_proxy_* settings
    (api/config.rb:83-88); None when no proxy host is configured."""
    if not cfg.http_proxy_host:
        return None
    cred = ""
    if cfg.http_proxy_username:
        cred = f"{cfg.http_proxy_username}:{cfg.http_proxy_password}@"
    return (
        f"{cfg.http_proxy_protocol}://{cred}"
        f"{cfg.http_proxy_host}:{cfg.http_proxy_port}"
    )


def _filtered_tcp_connect(conn, loopback_allowed: bool,
                          private_networks_allowed: bool):
    """Resolve ``conn.host`` and dial ONLY addresses that pass
    ``address_allowed`` — the check-and-connect atomicity the reference
    gets by filtering inside its HTTP client's connection-manager
    resolver (filtering_dns_resolver.rb:36-48). A pre-flight check that
    lets urllib re-resolve internally leaves a DNS-rebinding window: the
    attacker answers with a public address for the check and a loopback
    address for the connect. Filtering at the socket means the answer
    used for policy IS the answer dialed; a host with one public and one
    private A record connects via the public one (reference parity).
    Sets ``conn.sock`` or raises OSError."""
    import ipaddress
    import socket

    infos = socket.getaddrinfo(
        conn.host, conn.port, 0, socket.SOCK_STREAM
    )
    allowed = []
    for family, kind, proto, _, sockaddr in infos:
        try:
            a = ipaddress.ip_address(sockaddr[0].split("%")[0])
        except ValueError:
            continue
        if address_allowed(a, loopback_allowed, private_networks_allowed):
            allowed.append((family, kind, proto, sockaddr))
    if not allowed:
        raise OSError(
            f"all resolved addresses for {conn.host!r} are disallowed "
            "(loopback/private/link-local)"
        )
    err = None
    for family, kind, proto, sockaddr in allowed:
        sock = None
        try:
            sock = socket.socket(family, kind, proto)
            if conn.timeout is not socket._GLOBAL_DEFAULT_TIMEOUT:
                sock.settimeout(conn.timeout)
            if conn.source_address:
                sock.bind(conn.source_address)
            sock.connect(sockaddr)
            try:
                sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            except OSError:
                pass
            conn.sock = sock
            return
        except OSError as e:
            err = e
            if sock is not None:
                sock.close()
    raise err


def _filtered_handlers(loopback_allowed: bool, private_networks_allowed: bool,
                       ssl_context):
    """urllib handlers whose connections dial only vetted addresses.
    HTTPS wraps the vetted TCP socket with SNI/hostname = the original
    host (certificate verification is unchanged — only the dialed
    address set is filtered)."""
    import http.client
    import urllib.request

    flags = (loopback_allowed, private_networks_allowed)

    class _FC(http.client.HTTPConnection):
        def connect(self):
            _filtered_tcp_connect(self, *flags)

    class _FCS(http.client.HTTPSConnection):
        def connect(self):
            _filtered_tcp_connect(self, *flags)
            if self._tunnel_host:
                self._tunnel()
                server_hostname = self._tunnel_host
            else:
                server_hostname = self.host
            self.sock = self._context.wrap_socket(
                self.sock, server_hostname=server_hostname
            )

    class _H(urllib.request.HTTPHandler):
        def http_open(self, req):
            return self.do_open(_FC, req)

    class _HS(urllib.request.HTTPSHandler):
        def https_open(self, req):
            return self.do_open(_FCS, req, context=self._context)

    return [_H(), _HS(context=ssl_context)]


def http_fetch_one(
    url: str,
    timeout_s: float = 10.0,
    max_bytes: int = 10 * 1024 * 1024,
    user_agent: str = "Elastic-Crawler",
    head_first: bool = False,
    extractable_mimes: tuple = (),
    authorization: str | None = None,
    proxy_url: str | None = None,
    ssl_mode: str = "full",
    ssl_cas: tuple = (),
    etag: str | None = None,
    last_modified: str | None = None,
    retry_after_cap_s: float = 30.0,
    loopback_allowed: bool = True,
    private_networks_allowed: bool = True,
    _retried: bool = False,
) -> tuple:
    """One GET, redirects NOT followed, response adapted to the corpus
    marker conventions. Returns ``(body, etag, last_modified)`` — the
    response validators are captured so revisits can revalidate instead
    of re-downloading. Network/DNS/timeout errors become
    ``<!--STATUS:599-->`` (the reference maps transport exceptions to
    Error results, http_executor.rb:103-132); bodies are cut at
    ``max_bytes + 1`` so the engine's max_response_size gate fires
    without buffering an unbounded response.

    ``etag``/``last_modified`` are the stored validators from the LAST
    crawl of this URL: they are sent as If-None-Match/If-Modified-Since,
    and a 304 response becomes ``<!--STATUS:304-->`` — the engine treats
    it as "document unchanged" (RFC 9110 §13; beyond-reference: the
    reference re-downloads unconditionally on every recrawl).

    ``head_first`` mirrors ``head_requests_enabled``
    (http_executor.rb:48-50): a HEAD pre-flight skips the body download
    entirely when the Content-Type is neither parseable text nor a
    configured extractable binary type — the unsupported MIME marker is
    produced from headers alone. HEAD failures fall through to the GET
    (servers that 405 HEAD must not break the crawl)."""
    import urllib.error
    import urllib.request

    # SSRF guard (filtering_dns_resolver.rb): refuse hosts resolving only
    # to disallowed loopback/private addresses BEFORE any connection.
    # Utility-level default is permissive (callers own their targets);
    # the product path (live_fetch_join / robots fetch) passes the
    # CrawlConfig flags, whose defaults are the reference's secure False.
    if not (loopback_allowed and private_networks_allowed):
        from urllib.parse import urlsplit

        _h = urlsplit(url).hostname
        if _h and not host_resolution_allowed(
            _h, loopback_allowed, private_networks_allowed
        ):
            return b"<!--STATUS:599-->", None, None

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):  # 3xx is a result, not a hop
            return None

    headers = {"User-Agent": user_agent}
    if authorization:
        headers["Authorization"] = authorization
    handlers = [_NoRedirect]
    if proxy_url:
        # urllib's ProxyHandler turns userinfo in the proxy URL into a
        # Proxy-Authorization: Basic header (config.rb:83-88 semantics)
        handlers.append(
            urllib.request.ProxyHandler({"http": proxy_url, "https": proxy_url})
        )
    if not (loopback_allowed and private_networks_allowed):
        # connection-level filter: the addresses dialed are exactly the
        # addresses vetted (closes the rebinding window the pre-check
        # alone would leave — see _filtered_tcp_connect)
        handlers.extend(
            _filtered_handlers(
                loopback_allowed, private_networks_allowed,
                ssl_context_for(ssl_mode, ssl_cas),
            )
        )
    elif url.startswith("https://"):
        handlers.append(
            urllib.request.HTTPSHandler(
                context=ssl_context_for(ssl_mode, ssl_cas)
            )
        )
    opener = urllib.request.build_opener(*handlers)
    if head_first:
        try:
            hreq = urllib.request.Request(url, method="HEAD", headers=headers)
            with opener.open(hreq, timeout=timeout_s) as hresp:
                hmime = (
                    (hresp.headers.get("Content-Type", "") or "")
                    .split(";")[0].strip().lower()
                )
            path = U.url_path(url)
            is_text = (
                hmime in ("text/html", "application/xhtml+xml", "", "text/plain")
                or hmime.endswith("xml")
                or path.endswith("/robots.txt")
            )
            if not is_text and hmime not in extractable_mimes:
                # body never fetched
                return f"<!--MIME:{hmime}-->".encode(), None, None
        except Exception:
            pass  # 405/other: fall through to the normal GET

    get_headers = dict(headers)
    if etag:
        get_headers["If-None-Match"] = etag
    if last_modified:
        get_headers["If-Modified-Since"] = last_modified
    req = urllib.request.Request(url, headers=get_headers)
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            status = resp.status
            body = resp.read(max_bytes + 1)
            ctype = resp.headers.get("Content-Type", "") or ""
    except urllib.error.HTTPError as e:
        if e.code == 304:
            # Not Modified: keep the stored validators live so the next
            # revisit keeps revalidating against them
            return b"<!--STATUS:304-->", etag, last_modified
        if 300 <= e.code < 400 and e.headers.get("Location"):
            return f"<!--REDIRECT:{e.headers['Location']}-->".encode(), None, None
        # rate limiting / transient overload (RFC 9110 §10.2.3): honor a
        # bounded Retry-After once, then re-issue the request — the
        # worker thread owns this host, so sleeping here IS the per-host
        # backoff (no other request hits the host meanwhile)
        if e.code in (429, 503) and not _retried:
            ra = e.headers.get("Retry-After")
            try:
                wait = min(float(ra), retry_after_cap_s) if ra else None
            except ValueError:
                wait = None  # HTTP-date form / garbage: don't retry
            if wait is not None:
                import time as _time

                _time.sleep(wait)
                return http_fetch_one(
                    url, timeout_s, max_bytes, user_agent, False,
                    extractable_mimes, authorization, proxy_url,
                    ssl_mode, ssl_cas, etag, last_modified,
                    retry_after_cap_s, loopback_allowed,
                    private_networks_allowed, _retried=True,
                )
        return f"<!--STATUS:{e.code}-->".encode(), None, None
    except Exception:
        return b"<!--STATUS:599-->", None, None
    r_etag = resp.headers.get("ETag") or None
    r_lastmod = resp.headers.get("Last-Modified") or None
    # transfer decoding (http_client.rb:61-66 gzip/deflate); skip when the
    # body hit the size cap — the max_response_size gate denies it anyway
    cenc = (resp.headers.get("Content-Encoding", "") or "").lower()
    if len(body) <= max_bytes and cenc in ("gzip", "x-gzip", "deflate"):
        import gzip as _gzip
        import zlib as _zlib

        try:
            if cenc == "deflate":
                try:
                    body = _zlib.decompress(body)
                except _zlib.error:
                    body = _zlib.decompress(body, -_zlib.MAX_WBITS)
            else:
                body = _gzip.decompress(body)
        except Exception:
            return b"<!--STATUS:599-->", None, None
    if status == 304:
        return b"<!--STATUS:304-->", etag, last_modified
    if 300 <= status < 400:
        loc = ""
        try:
            loc = resp.headers.get("Location", "") or ""
        except Exception:
            pass
        return f"<!--REDIRECT:{loc}-->".encode(), None, None
    if status >= 400:
        return f"<!--STATUS:{status}-->".encode(), None, None
    mime = ctype.split(";")[0].strip().lower()
    charset = ""
    if "charset=" in ctype:
        charset = ctype.split("charset=")[-1].split(";")[0].strip()
    prefix = b""
    if charset and charset.lower() not in ("utf-8", "utf8"):
        prefix = f"<!--CHARSET:{charset}-->".encode()
    path = U.url_path(url)
    is_text = (
        mime in ("text/html", "application/xhtml+xml", "", "text/plain")
        or mime.endswith("xml")
        or path.endswith("/robots.txt")
    )
    if not is_text:
        return f"<!--MIME:{mime}-->".encode() + body, r_etag, r_lastmod
    return prefix + body, r_etag, r_lastmod


def fetch_urls(
    urls: list,
    *,
    timeout_s: float = 10.0,
    max_bytes: int = 10 * 1024 * 1024,
    user_agent: str = "Elastic-Crawler",
    delay_s: float = 0.0,
    head_first: bool = False,
    extractable_mimes: tuple = (),
    threads: int = 1,
    last_by_host: dict | None = None,
    adaptive_factor: float = 0.0,
    adaptive_max_s: float = 30.0,
    auth_configs: tuple = (),
    http_auth_allowed: bool = False,
    proxy_url: str | None = None,
    ssl_mode: str = "full",
    ssl_cas: tuple = (),
    etags: list | None = None,
    last_modifieds: list | None = None,
    validators_out: list | None = None,
    delays: list | None = None,
    loopback_allowed: bool = True,
    private_networks_allowed: bool = True,
):
    """Fetch a batch of URLs with per-host politeness: same-host requests
    run strictly in list order with ``delay_s`` between them; DIFFERENT
    hosts run concurrently on up to ``threads`` workers (the reference's
    executor thread pool, http_executor.rb via executor concurrency —
    network wait is the bottleneck, so host-parallelism is the whole
    live-mode speedup). Returns (bodies, monotonic_done_times) aligned to
    the input order. ``last_by_host`` carries delay bookkeeping across
    batches (mutated in place).

    ``adaptive_factor`` > 0 enables latency-adaptive pacing: the wait
    before the NEXT request to a host is
    ``max(delay_s, min(factor * last_latency, adaptive_max_s))`` — a slow
    (overloaded) host automatically gets more breathing room. This is
    Heritrix's published delay-factor/max-delay politeness model.

    ``etags``/``last_modifieds``: per-URL stored validators (aligned
    with ``urls``) sent as conditional-request headers (a 304 body is
    the ``<!--STATUS:304-->`` marker); ``validators_out``, when passed,
    is filled with one ``(etag, last_modified)`` pair per URL from the
    responses."""
    import time as _time

    if last_by_host is None:
        last_by_host = {}
    n = len(urls)
    bodies: list = [None] * n
    done_at: list = [0.0] * n
    if validators_out is not None:
        validators_out[:] = [(None, None)] * n
    delay_by_host: dict[str, float] = {}
    by_host: dict[str, list[int]] = {}
    for i, u in enumerate(urls):
        by_host.setdefault(U.url_host_key(u), []).append(i)

    def run_host(host: str, idxs: list) -> None:
        for i in idxs:
            # per-URL base delay: the host's robots Crawl-delay when the
            # wave carries one, else the configured default
            base_delay = (
                delays[i]
                if delays is not None and delays[i] is not None
                else delay_s
            )
            eff_delay = (
                delay_by_host.get(host, base_delay)
                if adaptive_factor > 0 else base_delay
            )
            if eff_delay > 0:
                wait = last_by_host.get(host, 0) + eff_delay - _time.monotonic()
                if wait > 0:
                    _time.sleep(wait)
            t0 = _time.monotonic()
            target = urls[i]
            auth = auth_header_for_url(target, auth_configs)
            # credential-bearing URLs: denied over plain http unless
            # http_auth_allowed (http_executor.rb:44-46 -> an Error
            # result); otherwise the userinfo becomes the Basic header
            scheme, rest = target.split("://", 1)
            netloc, sep, tail = rest.partition("/")
            if "@" in netloc:
                userinfo, bare_host = netloc.rsplit("@", 1)
                if scheme == "http" and not http_auth_allowed:
                    bodies[i] = b"<!--STATUS:599-->"
                    if validators_out is not None:
                        validators_out[i] = (None, None)
                    now = _time.monotonic()
                    last_by_host[host] = now
                    done_at[i] = now
                    continue
                import base64 as _b64

                target = f"{scheme}://{bare_host}{sep}{tail}"
                auth = "Basic " + _b64.b64encode(userinfo.encode()).decode()
            bodies[i], r_etag, r_lastmod = http_fetch_one(
                target, timeout_s, max_bytes, user_agent, head_first,
                extractable_mimes, authorization=auth, proxy_url=proxy_url,
                ssl_mode=ssl_mode, ssl_cas=ssl_cas,
                etag=etags[i] if etags is not None else None,
                last_modified=(
                    last_modifieds[i] if last_modifieds is not None else None
                ),
                loopback_allowed=loopback_allowed,
                private_networks_allowed=private_networks_allowed,
            )
            if validators_out is not None:
                validators_out[i] = (r_etag, r_lastmod)
            now = _time.monotonic()
            last_by_host[host] = now
            done_at[i] = now
            if adaptive_factor > 0:
                delay_by_host[host] = max(
                    base_delay, min(adaptive_factor * (now - t0), adaptive_max_s)
                )

    if threads <= 1 or len(by_host) == 1:
        for host, idxs in by_host.items():
            run_host(host, idxs)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(threads, len(by_host))) as ex:
            for f in [ex.submit(run_host, h, ix) for h, ix in by_host.items()]:
                f.result()
    return bodies, done_at


def live_fetch_join(wave: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """The live counterpart of ``fetch_join``: same input wave columns,
    same output schema (wave + html + warc_ts), bodies from real GETs.
    Host-hashed repartition keeps each host on one task so the
    crawl-delay sleep between same-host requests actually serializes
    that host's traffic; within a task, distinct hosts fetch in parallel
    on ``cfg.live_fetch_threads`` workers."""
    import pandas as pd

    timeout = cfg.request_timeout_s
    max_bytes = cfg.max_response_size
    agent = cfg.user_agent
    delay = cfg.default_crawl_delay_s
    head_first = cfg.head_requests_enabled
    extractable = tuple(cfg.binary_content_extraction_mime_types or ())
    threads = cfg.live_fetch_threads
    adaptive_factor = cfg.adaptive_delay_factor
    adaptive_max = cfg.adaptive_delay_max_s
    auth_configs = tuple(cfg.domain_auth or ())
    auth_allowed = cfg.http_auth_allowed
    proxy = proxy_url_from_config(cfg)
    ssl_mode = cfg.ssl_verification_mode
    ssl_cas = tuple(cfg.ssl_ca_certificates or ())
    loopback_ok = cfg.loopback_allowed
    private_ok = cfg.private_networks_allowed

    def fetch(it):
        import time as _time

        last_by_host: dict[str, float] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("norm_url", kind="stable")
            has_validators = "etag" in pdf.columns
            validators: list = []
            bodies, done_at = fetch_urls(
                list(pdf["norm_url"]),
                timeout_s=timeout, max_bytes=max_bytes, user_agent=agent,
                delay_s=delay, head_first=head_first,
                extractable_mimes=extractable, threads=threads,
                last_by_host=last_by_host,
                adaptive_factor=adaptive_factor,
                adaptive_max_s=adaptive_max,
                auth_configs=auth_configs,
                http_auth_allowed=auth_allowed,
                proxy_url=proxy,
                ssl_mode=ssl_mode,
                ssl_cas=ssl_cas,
                etags=(
                    [None if e != e else e for e in pdf["etag"]]
                    if has_validators else None
                ),
                last_modifieds=(
                    [None if m != m else m for m in pdf["last_modified"]]
                    if has_validators else None
                ),
                validators_out=validators,
                delays=(
                    [
                        None if d != d or d is None or d <= 0 else d / 1000.0
                        for d in pdf["crawl_delay_ms"]
                    ]
                    if "crawl_delay_ms" in pdf.columns else None
                ),
                loopback_allowed=loopback_ok,
                private_networks_allowed=private_ok,
            )
            # per-row fetch-completion wall time from the monotonic marks
            wall_base = _time.time() - _time.monotonic()
            stamps = [
                pd.Timestamp(wall_base + t, unit="s").round("us") for t in done_at
            ]
            out = pdf.drop(columns=["crawl_delay_ms"], errors="ignore")
            out["html"] = pd.Series(bodies, index=pdf.index, dtype="object")
            out["warc_ts"] = pd.Series(stamps, index=pdf.index)
            out["etag"] = pd.Series(
                [v[0] for v in validators], index=pdf.index, dtype="object")
            out["last_modified"] = pd.Series(
                [v[1] for v in validators], index=pdf.index, dtype="object")
            yield out

    from pyspark.sql import functions as F

    cols = ["url_hash", "norm_url", "task_type", "depth", "seq", "redirect_chain"]
    if "etag" in wave.columns:  # stored validators joined onto the wave
        cols += ["etag", "last_modified"]
    if "crawl_delay_ms" in wave.columns:  # robots Crawl-delay per host
        cols += ["crawl_delay_ms"]
    return (
        wave.select(*cols)
        .repartition(F.expr("pmod(hash(split(norm_url, '/')[2]), 8)"))
        .mapInPandas(fetch, schema=FETCHED_COLS)
    )
