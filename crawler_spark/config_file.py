"""Load the reference's ``crawler.yml`` configuration format.

A user of the reference points this engine at their existing config file
and gets the same crawl: ``domains:`` entries carry ``url`` (the
allowlist entry), optional ``seed_urls`` (default ``"<url>/"``,
api/config.rb:419-427), ``sitemap_urls``, ``crawl_rules``
(policy/type/pattern, config.rb:395-417) and ``extraction_rulesets``;
top-level scalars map by name (``max_duration`` seconds →
``max_duration_s``). Ruby-style numeric literals with underscores
(``5_242_880``, YAML-parsed as strings) coerce to int.

Keys with no offline-engine equivalent (elasticsearch credentials, HTTP
timeouts/proxies, logging, threads_per_crawl) are returned in the
``extras`` dict rather than silently dropped, so callers can act on
``output_sink``/``output_dir``/``schedule``.
"""

from __future__ import annotations

import json
import re

from .config import CrawlConfig
from .functions.urlnorm import normalize_url, url_site

# top-level crawler.yml keys that map 1:1 onto CrawlConfig fields
_DIRECT_KEYS = (
    "max_crawl_depth",
    "max_unique_url_count",
    "max_url_length",
    "max_url_segments",
    "max_url_params",
    "max_redirects",
    "max_response_size",
    "max_title_size",
    "max_body_size",
    "max_keywords_size",
    "max_description_size",
    "max_extracted_links_count",
    "max_indexed_links_count",
    "max_headings_count",
    "sitemap_discovery_disabled",
    "full_html_extraction_enabled",
    "binary_content_extraction_enabled",
    "default_encoding",
    "user_agent",
    "purge_crawl_enabled",
    "url_queue_size_limit",
    "http_auth_allowed",
    "head_requests_enabled",
    "http_proxy_host",
    "http_proxy_port",
    "http_proxy_protocol",
    "http_proxy_username",
    "http_proxy_password",
    "ssl_verification_mode",
    "reuse_unchanged_pages",
    "frontier_priority_expr",
    "priority_dimension_path",
    "priority_dimension_key",
)

_RUBY_INT_RE = re.compile(r"\A\d[\d_]*\Z")


def _coerce(v):
    """YAML leaves Ruby-style ``5_242_880`` literals as strings."""
    if isinstance(v, str) and _RUBY_INT_RE.match(v):
        return int(v.replace("_", ""))
    return v


def config_from_dict(doc: dict) -> tuple[CrawlConfig, dict]:
    """Build (CrawlConfig, extras) from a parsed crawler.yml document."""
    doc = {str(k): v for k, v in (doc or {}).items()}
    kwargs: dict = {}
    extras: dict = {}

    domains = doc.pop("domains", None) or []
    seed_urls: list[str] = list(doc.pop("seed_urls", []) or [])
    sitemap_urls: list[str] = list(doc.pop("sitemap_urls", []) or [])
    allowlist: list[str] = []
    crawl_rules: dict = {}
    extraction_rules: dict = {}
    domain_auth: list[dict] = []
    for dom in domains:
        dom = {str(k): v for k, v in dom.items()}
        url = dom["url"]
        allowlist.append(url)
        site = url_site(normalize_url(url))
        # seed_urls default to the domain url (api/config.rb:419-427)
        seed_urls.extend(dom.get("seed_urls") or [f"{url}/"])
        sitemap_urls.extend(dom.get("sitemap_urls") or [])
        rules = dom.get("crawl_rules") or []
        if rules:
            crawl_rules[site] = [
                (r["policy"], r["type"], r["pattern"]) for r in rules
            ]
        rulesets = dom.get("extraction_rulesets") or []
        if rulesets:
            extraction_rules[site] = rulesets
        auth = dom.get("auth")
        if auth:
            # per-domain Authorization (http_header_service.rb; matched on
            # url.site like all_auth_headers, api/config.rb:448-460)
            entry = {str(k): v for k, v in auth.items()}
            entry["domain"] = site
            domain_auth.append(entry)

    if seed_urls:
        kwargs["seed_urls"] = tuple(seed_urls)
    if sitemap_urls:
        kwargs["sitemap_urls"] = tuple(sitemap_urls)
    if allowlist:
        kwargs["domain_allowlist"] = tuple(allowlist)
    if crawl_rules:
        kwargs["crawl_rules"] = crawl_rules
    if extraction_rules:
        kwargs["extraction_rules"] = extraction_rules
    if domain_auth:
        kwargs["domain_auth"] = tuple(domain_auth)

    if "max_duration" in doc:  # seconds in the reference (config.rb:96)
        kwargs["max_duration_s"] = float(_coerce(doc.pop("max_duration")))
    if "binary_content_extraction_mime_types" in doc:
        kwargs["binary_content_extraction_mime_types"] = tuple(
            doc.pop("binary_content_extraction_mime_types") or ()
        )
    if "ssl_ca_certificates" in doc:  # PEM paths or inline PEM blocks
        kwargs["ssl_ca_certificates"] = tuple(
            doc.pop("ssl_ca_certificates") or ()
        )
    for key in _DIRECT_KEYS:
        if key in doc:
            kwargs[key] = _coerce(doc.pop(key))

    extras.update(doc)  # output_sink/output_dir/schedule/elasticsearch/...
    return CrawlConfig(**kwargs), extras


def load_config(path: str) -> tuple[CrawlConfig, dict]:
    """Parse a crawler.yml (or .json) file → (CrawlConfig, extras)."""
    with open(path) as f:
        text = f.read()
    try:
        import yaml  # pyyaml ships with the runtime; JSON is a fallback

        doc = yaml.safe_load(text)
    except ImportError:
        doc = json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError(f"config root must be a mapping: {path}")
    return config_from_dict(doc)
