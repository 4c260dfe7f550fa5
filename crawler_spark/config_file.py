"""Load the reference's ``crawler.yml`` configuration format.

A user of the reference points this engine at their existing config file
and gets the same crawl: ``domains:`` entries carry ``url`` (the
allowlist entry), optional ``seed_urls`` (default ``"<url>/"``,
api/config.rb:419-427), ``sitemap_urls``, ``crawl_rules``
(policy/type/pattern, config.rb:395-417) and ``extraction_rulesets``;
top-level scalars map by name (``max_duration`` seconds →
``max_duration_s``). Ruby-style numeric literals with underscores
(``5_242_880``, YAML-parsed as strings) coerce to int.

Compatibility contract (the full table lives in COVERAGE.md): every one
of the reference's ``Crawler::API::Config::CONFIG_FIELDS``
(api/config.rb:36-110) is classified here as MAPPED (drives this
engine), ACTIONED (returned in ``extras`` and consumed by a job/sink:
``output_sink``/``output_dir``/``output_index``/``schedule``/
``elasticsearch``), or IGNORED (no analog in a Spark engine — e.g.
``threads_per_crawl`` is the cluster's executor count, logging knobs are
log4j's). Ignored keys present in a config file raise a
``ConfigCompatWarning`` naming each one, so a reference user migrating
their crawler.yml learns exactly which knobs will not take effect —
nothing is silently dropped (ignored keys are still returned in
``extras``). Unknown keys (typos, not reference fields at all) warn
separately.
"""

from __future__ import annotations

import json
import re
import warnings

from .config import CrawlConfig
from .functions.urlnorm import normalize_url, url_site


class ConfigCompatWarning(UserWarning):
    """A crawler.yml key was recognized as a reference config field that
    this engine does not act on (see COVERAGE.md for the full table)."""

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
    "crawl_id",
    "max_elastic_tag_size",
    "max_data_attribute_size",
    "loopback_allowed",
    "private_networks_allowed",
)

# reference fields returned in ``extras`` AND consumed by a job or sink
# in this repo (jobs/schedule_crawl.py, sources/sinks.py, sources/es_bulk.py)
_ACTIONED_EXTRAS = frozenset({
    "output_sink", "output_dir", "output_index", "schedule", "elasticsearch",
})

# reference CONFIG_FIELDS with no analog in a Spark engine; the value in
# the map is the one-line reason surfaced in COVERAGE.md's compat table
_IGNORED_FIELDS = {
    "log_level": "logging is Spark log4j / driver config, not crawl config",
    "log_file_directory": "logging is Spark log4j / driver config",
    "log_file_rotation_policy": "logging is Spark log4j / driver config",
    "system_logs_to_file": "logging is Spark log4j / driver config",
    "event_logs_to_file": "the event stream is a state table (C5), always on with lineage",
    "crawl_stage": "stage naming is internal to the two-stage plan (primary/purge)",
    "robots_txt_service": "robots fetch/registry is built into the crawl plan (S2)",
    "results_collection": "mock-sink injection point; use sources/sinks.py MockSink",
    "stats_dump_interval": "per-wave metrics land in the state manifest instead",
    "http_header_service": "per-domain headers come from domains[].auth (domain_auth)",
    "auth": "top-level auth unused by the reference CLI too; use domains[].auth",
    "url_queue": "the frontier IS the queue (a state table); no pluggable impl",
    "threads_per_crawl": "parallelism is the cluster's executor/core count",
    "connect_timeout": "single request_timeout covers the whole request (urllib)",
    "socket_timeout": "single request_timeout covers the whole request (urllib)",
    "compression_enabled": "urllib negotiates gzip transparently",
    "sink_lock_retry_interval": "no network ES sink (offline _bulk export only)",
    "sink_lock_max_retries": "no network ES sink (offline _bulk export only)",
}

# every reference CONFIG_FIELDS name (api/config.rb:36-110); used to
# distinguish "reference knob we ignore" from "unknown key / typo"
_REFERENCE_FIELDS = frozenset(_IGNORED_FIELDS) | _ACTIONED_EXTRAS | frozenset({
    "crawl_id", "domains", "domain_allowlist", "seed_urls", "sitemap_urls",
    "crawl_rules", "extraction_rules", "exclude_tags", "user_agent",
    "purge_crawl_enabled", "full_html_extraction_enabled",
    "http_auth_allowed", "loopback_allowed", "private_networks_allowed",
    "ssl_ca_certificates", "ssl_verification_mode", "http_proxy_host",
    "http_proxy_port", "http_proxy_protocol", "http_proxy_username",
    "http_proxy_password", "url_queue_size_limit", "max_duration",
    "max_crawl_depth", "max_unique_url_count", "max_url_length",
    "max_url_segments", "max_url_params", "max_redirects",
    "max_response_size", "request_timeout", "max_title_size",
    "max_body_size", "max_keywords_size", "max_description_size",
    "max_elastic_tag_size", "max_data_attribute_size",
    "max_extracted_links_count", "max_indexed_links_count",
    "max_headings_count", "binary_content_extraction_enabled",
    "binary_content_extraction_mime_types", "default_encoding",
    "sitemap_discovery_disabled", "head_requests_enabled",
})

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
    exclude_tags: dict = {}
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
        # per-domain exclude_tags, lowercased and keyed by site
        # (api/config.rb:377-393 configure_exclude_tags!)
        tags = dom.get("exclude_tags") or []
        if tags:
            exclude_tags[site] = [str(t).lower() for t in tags]
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
    # top-level exclude_tags (site -> [tag]) merges under the per-domain
    # entries, which win (the reference derives the top-level value FROM
    # domains[].exclude_tags; a top-level dict is our programmatic form)
    top_tags = doc.pop("exclude_tags", None) or {}
    exclude_tags = {**{str(s): [str(t).lower() for t in ts]
                       for s, ts in top_tags.items()}, **exclude_tags}
    if exclude_tags:
        kwargs["exclude_tags"] = exclude_tags
    if domain_auth:
        kwargs["domain_auth"] = tuple(domain_auth)

    if "max_duration" in doc:  # seconds in the reference (config.rb:96)
        kwargs["max_duration_s"] = float(_coerce(doc.pop("max_duration")))
    if "request_timeout" in doc:  # seconds (config.rb:110)
        kwargs["request_timeout_s"] = float(_coerce(doc.pop("request_timeout")))
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
    ignored = sorted(k for k in doc if k in _IGNORED_FIELDS)
    if ignored:
        warnings.warn(
            "crawler.yml keys accepted by the reference but not acted on "
            "by this engine (see COVERAGE.md config-compat table): "
            + ", ".join(f"{k} ({_IGNORED_FIELDS[k]})" for k in ignored),
            ConfigCompatWarning,
            stacklevel=2,
        )
    unknown = sorted(k for k in doc if k not in _REFERENCE_FIELDS)
    if unknown:
        warnings.warn(
            f"unknown crawler.yml keys (not reference config fields): "
            + ", ".join(unknown),
            ConfigCompatWarning,
            stacklevel=2,
        )
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
