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

The reference's live-network checks (dns, tcp) have no offline
equivalent; they are reported as ``skipped`` to keep the check-name
surface aligned with url_validator.rb.
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


def validate_url(
    url: str,
    cfg: CrawlConfig,
    robots: dict | None = None,
    page_exists: bool | None = None,
) -> ValidationReport:
    """Run the url → domain_access → robots_txt → crawl_rules → content
    chain for one URL.

    robots: {host_key: RobotRules.to_tuple()} as produced by
    SparkCrawler.load_robots (None skips the robots check).
    page_exists: whether the offline corpus has the URL (None skips the
    content check — the offline stand-in for request/content checks).
    """
    report = ValidationReport(url=url, normalized=None)

    norm, err = U.try_normalize(url)
    if err is not None:
        report.results.append(CheckResult("url", "failure", err))
        return report
    report.normalized = norm
    report.results.append(CheckResult("url", "ok", norm))

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
