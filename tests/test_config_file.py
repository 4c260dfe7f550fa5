"""crawler.yml loader parity (api/config.rb mapping)."""

import textwrap

from crawler_spark.config_file import config_from_dict, load_config


def _example_yaml(tmp_path):
    p = tmp_path / "crawler.yml"
    p.write_text(textwrap.dedent("""
        domains:
          - url: https://parksaustralia.gov.au
            seed_urls:
              - https://parksaustralia.gov.au
              - https://parksaustralia.gov.au/news/
            crawl_rules:
              - policy: deny
                type: begins
                pattern: /admin
          - url: https://example.com
            sitemap_urls:
              - https://example.com/sitemap.xml
            extraction_rulesets:
              - url_filters:
                  - type: regex
                    pattern: .*
                rules:
                  - action: set
                    field_name: is_page
                    selector: .*
                    value: yes
                    source: url
        output_sink: elasticsearch
        output_index: parks-australia
        max_crawl_depth: 2
        max_title_size: 500
        max_body_size: 5_242_880 # 5 megabytes
        max_duration: 3600
        full_html_extraction_enabled: true
        schedule:
          pattern: "0 2 * * *"
        elasticsearch:
          host: http://localhost
          port: 9200
    """))
    return str(p)


def test_load_reference_shaped_yaml(tmp_path):
    cfg, extras = load_config(_example_yaml(tmp_path))
    # domains -> allowlist; second domain has no seed_urls -> "<url>/"
    assert cfg.domain_allowlist == (
        "https://parksaustralia.gov.au", "https://example.com",
    )
    assert cfg.seed_urls == (
        "https://parksaustralia.gov.au",
        "https://parksaustralia.gov.au/news/",
        "https://example.com/",
    )
    assert cfg.sitemap_urls == ("https://example.com/sitemap.xml",)
    # crawl_rules keyed by site, tuple specs
    assert cfg.crawl_rules == {
        "https://parksaustralia.gov.au": [("deny", "begins", "/admin")]
    }
    assert list(cfg.extraction_rules) == ["https://example.com"]
    rs = cfg.extraction_rules["https://example.com"][0]
    assert rs["rules"][0]["field_name"] == "is_page"
    # scalars, Ruby underscore literal, max_duration -> seconds field
    assert cfg.max_crawl_depth == 2
    assert cfg.max_title_size == 500
    assert cfg.max_body_size == 5_242_880
    assert cfg.max_duration_s == 3600.0
    assert cfg.full_html_extraction_enabled is True
    # non-engine keys surface in extras, never dropped
    assert extras["output_sink"] == "elasticsearch"
    assert extras["output_index"] == "parks-australia"
    assert extras["schedule"] == {"pattern": "0 2 * * *"}
    assert extras["elasticsearch"]["port"] == 9200


def test_domain_defaults_and_empty():
    cfg, extras = config_from_dict({"domains": [{"url": "https://a.test"}]})
    assert cfg.seed_urls == ("https://a.test/",)
    assert cfg.domain_allowlist == ("https://a.test",)
    assert cfg.crawl_rules == {}
    assert extras == {}


def test_top_level_seed_urls_without_domains():
    cfg, _ = config_from_dict({"seed_urls": ["https://b.test/x"]})
    assert cfg.seed_urls == ("https://b.test/x",)
    assert cfg.domain_allowlist == ()  # derived from seeds at crawl time


def test_domain_auth_parsed_and_keyed_by_site():
    from crawler_spark.config_file import config_from_dict

    cfg, _ = config_from_dict({
        "domains": [
            {"url": "https://secure.test",
             "auth": {"type": "basic", "username": "u", "password": "p"}},
            {"url": "https://open.test"},
            {"url": "https://token.test:8443",
             "auth": {"type": "raw", "header": "Bearer tok"}},
        ],
        "http_auth_allowed": True,
    })
    assert cfg.http_auth_allowed is True
    assert cfg.domain_auth == (
        {"type": "basic", "username": "u", "password": "p",
         "domain": "https://secure.test"},
        {"type": "raw", "header": "Bearer tok",
         "domain": "https://token.test:8443"},
    )


def test_example_config_parses_completely():
    """config/crawler.yml.example documents every supported key — loading
    it must consume all engine keys (nothing silently ignored) and set
    the fields it claims."""
    import os

    from crawler_spark.config_file import load_config

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "config", "crawler.yml.example")
    cfg, extras = load_config(path)
    assert cfg.domain_allowlist == ("https://example.com",)
    assert "https://example.com/blog/" in cfg.seed_urls
    assert cfg.crawl_rules["https://example.com"] == [("deny", "begins", "/admin")]
    assert cfg.extraction_rules["https://example.com"][0]["rules"][0]["field_name"] == "author"
    assert cfg.domain_auth[0]["type"] == "basic"
    assert cfg.max_duration_s == 86400.0
    assert cfg.max_body_size == 5_242_880  # Ruby underscore literal
    assert cfg.ssl_verification_mode == "full"
    assert cfg.reuse_unchanged_pages is False
    assert cfg.frontier_priority_expr == ""
    assert cfg.url_queue_size_limit == 10000
    # only documented non-engine keys remain in extras
    assert set(extras) == {"output_sink"}


def test_ignored_reference_knobs_warn_by_name():
    """Every reference CONFIG_FIELD the engine does not act on must raise
    a ConfigCompatWarning naming it (COVERAGE.md compat table) — a
    migrating user learns exactly which crawler.yml knobs are inert.
    Mapped knobs must NOT warn."""
    import warnings as w

    from crawler_spark.config_file import ConfigCompatWarning, config_from_dict

    doc = {
        "seed_urls": ["https://a.test/"],
        "threads_per_crawl": 8,
        "connect_timeout": 10,
        "log_level": "debug",
        "sink_lock_retry_interval": 1,
    }
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        cfg, extras = config_from_dict(doc)
    compat = [c for c in caught if issubclass(c.category, ConfigCompatWarning)]
    assert len(compat) == 1
    msg = str(compat[0].message)
    for k in ("threads_per_crawl", "connect_timeout", "log_level",
              "sink_lock_retry_interval"):
        assert k in msg
        assert k in extras  # still surfaced, never silently dropped
    # a fully-mapped config is warning-free
    with w.catch_warnings(record=True) as caught2:
        w.simplefilter("always")
        config_from_dict({
            "seed_urls": ["https://a.test/"],
            "max_crawl_depth": 3,
            "loopback_allowed": True,
            "private_networks_allowed": False,
            "request_timeout": 30,
        })
    assert not [c for c in caught2
                if issubclass(c.category, ConfigCompatWarning)]


def test_unknown_keys_warn_separately():
    import warnings as w

    from crawler_spark.config_file import ConfigCompatWarning, config_from_dict

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        config_from_dict({"seed_urls": ["https://a.test/"],
                          "max_crawl_depht": 3})  # typo
    compat = [c for c in caught if issubclass(c.category, ConfigCompatWarning)]
    assert len(compat) == 1 and "max_crawl_depht" in str(compat[0].message)
    assert "unknown" in str(compat[0].message)


def test_domain_exclude_tags_keyed_by_site():
    from crawler_spark.config_file import config_from_dict

    cfg, _ = config_from_dict({
        "domains": [
            {"url": "https://a.test", "exclude_tags": ["NAV", "Footer"]},
            {"url": "https://b.test"},
        ],
    })
    assert cfg.exclude_tags == {"https://a.test": ["nav", "footer"]}


def test_request_timeout_and_dns_flags_map():
    from crawler_spark.config_file import config_from_dict

    cfg, _ = config_from_dict({
        "seed_urls": ["https://a.test/"],
        "request_timeout": "15",
        "loopback_allowed": True,
        "private_networks_allowed": True,
    })
    assert cfg.request_timeout_s == 15.0
    assert cfg.loopback_allowed is True
    assert cfg.private_networks_allowed is True
