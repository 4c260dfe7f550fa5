"""URL validator — the `crawler validate` / `urltest` diagnostic
(SURVEY §2.5 C7; reference: lib/crawler/url_validator.rb:16-53,
lib/crawler/cli/urltest.rb, coordinator.rb:118-131).

A single URL runs the same check chain a discovered URL would face:
``url`` (parse+normalize) → ``domain_access`` (allowlist) →
``robots_txt`` → ``crawl_rules`` → ``content`` (fetch against the
offline corpus when one is supplied). Pure Python over the exact same
gate functions the Spark operators use — no session needed, so it is
usable as a driver-side pre-flight (e.g. seed validation before a crawl)
and cheap enough to `mapInPandas` over a URL list if ever needed in bulk.

The reference's live-network checks (dns, tcp) run for real in live
mode (``live=True``, matching url_validator/dns_check_concern.rb and
tcp_check_concern.rb): dns resolves the host and applies the same SSRF
address filter the live fetcher dials through, tcp connects to a vetted
address. Offline (the default) they are reported as ``skipped`` to keep
the check-name surface aligned with url_validator.rb.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..functions import urlnorm as U
from ..functions.robots import RobotRules
from ..functions.rules import RuleEngine


@dataclass
class CheckResult:
    name: str
    outcome: str  # ok | failure | skipped
    detail: str = ""


@dataclass
class ValidationReport:
    url: str
    normalized: str | None
    results: list[CheckResult] = field(default_factory=list)

    @property
    def valid(self) -> bool:
        return all(r.outcome != "failure" for r in self.results)


def _live_dns_tcp(norm: str, cfg: CrawlConfig, timeout_s: float) -> list:
    """Real dns + tcp checks (url_validator/dns_check_concern.rb,
    tcp_check_concern.rb): resolve the host, classify every address with
    the SAME SSRF filter the live fetcher dials through
    (operators/fetch_live.address_allowed), then TCP-connect to a vetted
    address. DNS fails on unresolvable hosts AND on hosts whose every
    address is policy-denied (the reference's InvalidHost), so the
    validator's verdict matches what a live crawl would actually do."""
    import ipaddress
    import socket
    from urllib.parse import urlsplit

    from ..operators.fetch_live import address_allowed

    parts = urlsplit(norm)
    host = parts.hostname
    port = parts.port or (443 if parts.scheme == "https" else 80)
    try:
        infos = socket.getaddrinfo(host, port, 0, socket.SOCK_STREAM)
    except OSError as e:
        return [CheckResult("dns", "failure", f"DNS resolution failed: {e}")]
    vetted = []
    for family, kind, proto, _, sockaddr in infos:
        try:
            a = ipaddress.ip_address(sockaddr[0].split("%")[0])
        except ValueError:
            continue
        if address_allowed(
            a, cfg.loopback_allowed, cfg.private_networks_allowed
        ):
            vetted.append((family, kind, proto, sockaddr))
    if not vetted:
        return [CheckResult(
            "dns", "failure",
            "all resolved addresses denied by the SSRF address filter "
            "(loopback/private/link-local)",
        )]
    out = [CheckResult(
        "dns", "ok", ", ".join(sorted({s[3][0] for s in vetted}))
    )]
    err = None
    for family, kind, proto, sockaddr in vetted:
        try:
            with socket.socket(family, kind, proto) as s:
                s.settimeout(timeout_s)
                s.connect(sockaddr)
            out.append(CheckResult("tcp", "ok", f"{sockaddr[0]}:{port}"))
            return out
        except OSError as e:
            err = e
    out.append(CheckResult("tcp", "failure", f"TCP connection failed: {err}"))
    return out


def validate_url(
    url: str,
    cfg: CrawlConfig,
    robots: dict | None = None,
    page_exists: bool | None = None,
    live: bool = False,
    timeout_s: float = 5.0,
) -> ValidationReport:
    """Run the url → domain_access → robots_txt → crawl_rules → content
    chain for one URL.

    robots: {host_key: RobotRules.to_tuple()} as produced by
    SparkCrawler.load_robots (None skips the robots check).
    page_exists: whether the offline corpus has the URL (None skips the
    content check — the offline stand-in for request/content checks).
    live: run the dns + tcp checks against the real network (reference
    urltest parity); offline they report ``skipped``.
    """
    report = ValidationReport(url=url, normalized=None)

    norm, err = U.try_normalize(url)
    if err is not None:
        report.results.append(CheckResult("url", "failure", err))
        return report
    report.normalized = norm
    report.results.append(CheckResult("url", "ok", norm))

    if live:
        net = _live_dns_tcp(norm, cfg, timeout_s)
        report.results.extend(net)
        if any(r.outcome == "failure" for r in net):
            return report
    else:
        # no live network in the offline engine
        report.results.append(CheckResult("dns", "skipped", "offline engine"))
        report.results.append(CheckResult("tcp", "skipped", "offline engine"))

    scheme = U.url_scheme(norm)
    if scheme not in U.SUPPORTED_SCHEMES:
        report.results.append(
            CheckResult("url_request", "failure", f"unsupported scheme {scheme!r}")
        )
        return report
    report.results.append(CheckResult("url_request", "ok"))

    site = U.url_site(norm)
    allowed = frozenset(cfg.allowed_sites())
    if site not in allowed:
        report.results.append(
            CheckResult(
                "domain_access", "failure", f"{site} not in domain allowlist"
            )
        )
        return report
    report.results.append(CheckResult("domain_access", "ok", site))

    host_key = U.url_host_key(norm)
    if robots is not None and host_key in robots:
        rb = RobotRules.from_tuple(robots[host_key])
        path = U.url_path(norm)
        if rb.allow_none() or not rb.allowed(path):
            report.results.append(
                CheckResult("robots_txt", "failure", f"disallowed: {path}")
            )
            return report
        report.results.append(CheckResult("robots_txt", "ok"))
    else:
        report.results.append(CheckResult("robots_txt", "skipped", "no robots data"))

    specs = dict(cfg.crawl_rules).get(site)
    if specs:
        eng = RuleEngine.from_specs(site, specs)
        if eng.outcome(norm) == "deny":
            report.results.append(CheckResult("crawl_rules", "failure", "denied by rule"))
            return report
    report.results.append(CheckResult("crawl_rules", "ok"))

    if page_exists is None:
        report.results.append(CheckResult("content", "skipped", "no corpus given"))
    elif page_exists:
        report.results.append(CheckResult("content", "ok"))
    else:
        report.results.append(CheckResult("content", "failure", "not in corpus (404)"))
    return report
