"""Crawl configuration — defaults mirror ``lib/crawler/api/config.rb:143-213``.

Plain picklable dataclass; broadcast to executors as-is (SURVEY §1.1: no
Spark analog needed for config).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.urlnorm import normalize_url, url_site


@dataclass
class CrawlConfig:
    crawl_id: str = "crawl"
    seed_urls: tuple = ()
    sitemap_urls: tuple = ()
    domain_allowlist: tuple = ()  # derived from seeds when empty
    crawl_rules: dict = field(default_factory=dict)  # site -> [(policy,type,pattern)]
    exclude_tags: dict = field(default_factory=dict)  # site -> [tag,...]
    # site -> [ruleset-spec dicts] (config.rb:475-489 extraction_rulesets);
    # kept as plain dicts for broadcast picklability, compiled in the
    # parse operator via functions.extraction.compile_rulesets
    extraction_rules: dict = field(default_factory=dict)

    # api/config.rb defaults
    max_crawl_depth: int = 10
    max_unique_url_count: int = 100_000
    max_url_length: int = 2048
    max_url_segments: int = 16
    max_url_params: int = 32
    max_redirects: int = 10
    # download cap before the fetch becomes an Error result
    # (api/config.rb:167 `max_response_size: 10.megabytes`,
    # response.rb:166-171 ResponseTooLarge)
    max_response_size: int = 10 * 1024 * 1024
    # "corpus" = offline fetch join against the pages table;
    # "live" = real HTTP GETs (operators/fetch_live.py)
    fetch_mode: str = "corpus"
    # live mode: HEAD pre-flight skips downloads of unsupported content
    # types (http_executor.rb:48-50 `head_requests_enabled`)
    head_requests_enabled: bool = False
    # per-request socket timeout in live mode (http_executor.rb timeouts)
    request_timeout_s: float = 10.0
    # live mode: hosts fetched concurrently within a partition (the
    # reference's executor thread pool, executor.rb/http_executor.rb);
    # same-host requests stay serialized under crawl_delay regardless.
    # 1 = fully sequential per partition
    live_fetch_threads: int = 8
    # live mode: adaptive per-host pacing — the delay before the next
    # request to a host becomes max(crawl_delay, factor * last response
    # latency), capped at adaptive_delay_max_s (Heritrix's public
    # delay-factor/max-delay-ms politeness knobs). 0 = fixed crawl_delay
    adaptive_delay_factor: float = 0.0
    adaptive_delay_max_s: float = 30.0
    # per-domain Authorization headers (http_header_service.rb): tuple of
    # {"domain": site, "type": "basic", "username", "password"} or
    # {"domain": site, "type": "raw", "header"}; matched on url.site,
    # last match wins (authorization_header_for_url)
    domain_auth: tuple = ()
    # whether credential-bearing URLs (userinfo) may be fetched over
    # plain http (config.rb:72, http_executor.rb:44-46; default false)
    http_auth_allowed: bool = False
    # SSRF guard for live fetches (filtering_dns_resolver.rb:23-57;
    # api/config.rb:76-77,179): a host that resolves ONLY to loopback /
    # RFC1918 / link-local / wildcard addresses is refused (an Error
    # result) unless the matching flag is set. Both default off, like
    # the reference — a hostile page linking http://169.254.169.254/
    # must not make the crawler probe the internal network.
    loopback_allowed: bool = False
    private_networks_allowed: bool = False
    # forward proxy for all live requests (api/config.rb:83-88,170-175;
    # empty host = no proxying). Credentials become Proxy-Authorization
    http_proxy_host: str = ""
    http_proxy_port: int = 8080
    http_proxy_protocol: str = "http"
    http_proxy_username: str = ""
    http_proxy_password: str = ""
    # archive every fetched page as WARC under <dir>/wave=N/ (one file
    # per partition, executor-side — sources/warc.py export_warc). The
    # fetched frame is persisted for the wave so live mode never re-GETs
    warc_export_dir: str = ""
    # TLS verification for live fetches (api/config.rb:80-81,169-170):
    # "full" (cert + hostname), "certificate" (cert only), "none";
    # ssl_ca_certificates: extra trusted CAs (PEM file paths or inline
    # "-----BEGIN CERTIFICATE-----" strings)
    ssl_verification_mode: str = "full"
    ssl_ca_certificates: tuple = ()
    # offline recrawl/purge: reuse the stored parsed row when the corpus
    # warc_ts is unchanged (skip the per-document parse — the offline
    # 304). Opt-in: only sound when the corpus bumps warc_ts on content
    # change, which Common-Crawl-style fetch timestamps do
    reuse_unchanged_pages: bool = False
    max_title_size: int = 1_000
    max_body_size: int = 5 * 1024 * 1024
    max_keywords_size: int = 512
    max_description_size: int = 1_024
    max_elastic_tag_size: int = 512
    max_data_attribute_size: int = 512
    max_extracted_links_count: int = 1_000
    max_indexed_links_count: int = 25
    max_headings_count: int = 25
    sitemap_discovery_disabled: bool = False
    # include the page's full HTML in the doc (config.rb:65,208,
    # document_mapper.rb:76). The reference stores the jsoup-reserialized
    # DOM; here it is the decoded source HTML — same opt-in, same field
    full_html_extraction_enabled: bool = False
    # binary downloads (config.rb binary_content_extraction_*): when
    # enabled, pages marked <!--MIME:type--> with an allowed type become
    # base64 _attachment docs; others are unsupported content (no doc)
    binary_content_extraction_enabled: bool = False
    binary_content_extraction_mime_types: tuple = ()
    # body decode fallback when the response carries no charset hint
    # (http_utils/response.rb:53-54,123-135 `default_encoding`)
    default_encoding: str = "UTF-8"
    default_crawl_delay_s: float = 0.0  # used when robots has none
    politeness_window_s: float = 0.0  # 0 = unlimited per-wave host quota
    # frontier dispatch priority (operators/politeness.py priority_order):
    # a Spark SQL expression over the frontier columns, higher first, FIFO
    # (depth, seq) as the deterministic tie-break. "" = pure FIFO — the
    # reference's BFS order. Only reorders WHICH urls a host spends its
    # politeness quota on; the converged seen set is unchanged. Example:
    # "-length(norm_url) - 100 * size(split(norm_url, '/'))" (short,
    # shallow paths first — the classic frontier heuristic)
    frontier_priority_expr: str = ""
    # optional priority dimension: a parquet table left-joined onto the
    # frontier before dispatch so frontier_priority_expr can reference its
    # columns (e.g. a stored linkrank.pagerank output). Keyed by
    # priority_dimension_key: "url_hash" for URL-level scores, or
    # "host_key" for host-level scores combined with URL features in the
    # expression ("coalesce(rank, 0) * 1000 - length(norm_url)") — a bare
    # host score is constant within a host and per-host quotas make it a
    # no-op across hosts. Dimension columns must not collide with frontier
    # columns (except the key). AQE broadcasts it when it fits
    priority_dimension_path: str = ""
    priority_dimension_key: str = "host_key"
    user_agent: str = "Elastic-Crawler"
    lineage_enabled: bool = True
    # wall-clock budget across primary+purge stages (config.rb:158 default
    # 24h); exceeded → the crawl stops with a :warning outcome
    # (coordinator.rb:290-302)
    max_duration_s: float = 24 * 3600.0
    # purge stage after the primary crawl (coordinator.rb:96-115): re-fetch
    # docs not refreshed by this run, tombstone the ones that are gone
    purge_crawl_enabled: bool = True
    # strict-compat queue cap (url_queue/memory_only.rb:27 default 10_000):
    # None = unbounded (the frontier is a table, not an in-memory queue).
    # When set, per-wave admissions beyond the cap deny `queue_full` and
    # are NOT marked seen (coordinator.rb:631-644 drop-and-unsee).
    url_queue_size_limit: int | None = None
    # host count at which the per-host robots rules switch from a
    # driver-collected broadcast dict to a distributed DataFrame dimension
    # joined by host_key (the 10^8-host path; set 0 to force it)
    robots_dimension_threshold: int = 100_000
    # explicit partitioned Bloom sidecar over the seen set (state/bloom.py):
    # candidates the filter proves unseen bypass the exact anti-join
    # (filter-then-verify — false positives re-probe, false negatives are
    # impossible because every wave's delta lands before the next probe).
    # Off by default: at test scale the two extra tiny jobs/wave cost more
    # than the pruned probe saves; at 10^10 seen URLs the trade inverts.
    seen_bloom_enabled: bool = False
    seen_bloom_buckets: int = 64
    seen_bloom_bits: int = 1 << 20
    # fused single-pass HTML extraction (functions/fastextract.py):
    # tokenize + collect + text-assemble in one scan, no DOM allocation;
    # pages needing the tree (directives, restructure shapes) fall back
    # per-document. Field-identity pinned by tests/test_fastextract.py.
    fused_extract: bool = True
    # JVM-side candidate pre-dedup before the Python gate UDF
    # (operators/dedup.py prededup_discoveries): a hash aggregate with
    # map-side partial combine collapses the exploded wave (ready x
    # fanout rows) to one FIFO-winner row per distinct link before the
    # Arrow round-trip, cutting the gate + anti-join input ~fanout-fold.
    # Only active with lineage off (per-candidate deny attribution needs
    # the uncollapsed stream); admitted set/seq provably identical.
    discovery_prededup: bool = True
    # store the seen table bucketed by url_hash (state/store.py) — the
    # parquet stand-in for Iceberg bucket(N, url_hash). The per-wave seen
    # anti-join then plans with zero Exchange on the seen side: only the
    # wave delta shuffles, never the cumulative 10^10-row table.
    # None = shuffle-partition count; 0/None+False path kept for A/B.
    seen_bucketed_enabled: bool = True
    seen_buckets: int | None = None
    # HTML parser backend for the per-document parse (the dominant
    # per-page cost at 100 TB): 'builtin' = the pure-Python parser (the
    # byte-identity contract the goldens pin), 'auto' = install the
    # fastest importable C parser (lxml) into the DOM seam at executor
    # startup, degrading to builtin when none is available. The lxml
    # walker is qualified byte-identical on the fixture corpus by
    # tests/test_textextract.py (gated on lxml presence).
    html_backend: str = "builtin"

    def normalized_seeds(self) -> list[str]:
        out = []
        for s in self.seed_urls:
            n = normalize_url(s)
            out.append(n)
        return out

    def allowed_sites(self) -> list[str]:
        """Domain allowlist as site strings (scheme://host[:port]) —
        config.rb derives it from configured domains; we derive from seeds
        unless given explicitly."""
        if self.domain_allowlist:
            return [url_site(normalize_url(d)) for d in self.domain_allowlist]
        return sorted({url_site(n) for n in self.normalized_seeds()})
