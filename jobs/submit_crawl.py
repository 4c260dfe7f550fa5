#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north rule: ships as a
``spark-submit --py-files`` job).

Usage (local smoke):

    python scripts/package.py                      # builds dist/crawler_spark.zip
    spark-submit --master local[8] \
        --py-files dist/crawler_spark.zip \
        jobs/submit_crawl.py --pages /path/pages.parquet \
        --seeds https://site0.test/ --state /tmp/crawl_state --max-waves 30

On a real cluster the same invocation takes ``--master yarn|k8s://…`` plus
executor sizing conf; the job itself is cluster-agnostic — all state lives
in the warehouse (pages/seen/docs/frontier tables), nothing on local disk
except the manifest directory, which on a cluster points at shared storage.

Resume: pass ``--resume`` with the same ``--state`` dir and the crawl
continues from the last completed wave's checkpoint.

Live mode: pass ``--live`` (no ``--pages`` needed) and the engine crawls
real sites over HTTP — robots fetched per domain, redirects discovered,
per-host crawl-delay serialization — through the identical wave plan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="crawler_spark crawl job")
    ap.add_argument("--pages", default=None,
                    help="pages table (parquet path); omit with --live")
    ap.add_argument("--live", action="store_true",
                    help="fetch over real HTTP instead of an offline pages table")
    ap.add_argument("--state", required=True, help="state/checkpoint directory")
    ap.add_argument("--config", default=None,
                    help="reference-format crawler.yml (domains / crawl_rules "
                         "/ extraction_rulesets / max_* settings); CLI flags "
                         "override its values")
    ap.add_argument("--seeds", nargs="*", default=None)
    ap.add_argument("--sitemaps", nargs="*", default=[])
    ap.add_argument("--allow-domain", nargs="*", default=None,
                    help="domain allowlist (defaults to the seed sites)")
    ap.add_argument("--max-waves", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--max-unique", type=int, default=None)
    ap.add_argument("--politeness-window", type=float, default=None,
                    help="seconds of crawl-delay budget per wave (0 = off)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--recrawl", action="store_true",
                    help="re-crawl over an existing state dir: seen set "
                         "resets, docs history is kept for the purge stage")
    ap.add_argument("--compact", action="store_true",
                    help="run the state-maintenance pass after the crawl "
                         "(bin-pack seen, fold the parsed MERGE history)")
    ap.add_argument("--no-lineage", action="store_true")
    ap.add_argument("--warc-export", default=None, metavar="DIR",
                    help="archive every fetched page as WARC under DIR/wave=N/")
    ap.add_argument("--es-export", default=None, metavar="DIR",
                    help="after the crawl, write the docs as Elasticsearch "
                         "_bulk request files under DIR (the offline "
                         "output_sink: elasticsearch; replay with curl)")
    ap.add_argument("--es-index", default=None,
                    help="target index for --es-export (or config output_index)")
    ap.add_argument("--es-url", default=None,
                    help="live Elasticsearch base URL: after the export, send "
                         "every _bulk request file with the reference "
                         "client's retry/backoff (or config "
                         "elasticsearch.host[:port])")
    ap.add_argument("--es-api-key", default=None)
    ap.add_argument("--es-username", default=None)
    ap.add_argument("--es-password", default=None)
    ap.add_argument("--es-purge", action="store_true",
                    help="after a successful live send, delete docs whose "
                         "last_crawled_at predates this crawl "
                         "(_delete_by_query, output_sink/elasticsearch.rb:"
                         "131-151); requires --es-url")
    ap.add_argument("--reuse-unchanged", action="store_true",
                    help="recrawl/purge: skip re-parsing pages whose corpus "
                         "warc_ts is unchanged (the offline 304)")
    ap.add_argument("--bloom", action="store_true",
                    help="maintain the partitioned Bloom sidecar over the "
                         "seen set; provably-new candidates bypass the exact "
                         "anti-join (filter-then-verify, state/bloom.py)")
    ap.add_argument("--no-bucketed-seen", action="store_true",
                    help="store the seen table as plain per-wave parquet "
                         "instead of the bucketed layout (state/store.py); "
                         "A/B and legacy-layout escape hatch")
    ap.add_argument("--html-backend", choices=("builtin", "auto"),
                    default=None,
                    help="HTML parser backend for the per-document parse: "
                         "builtin (default, byte-identity contract) or auto "
                         "(install the fastest importable C parser, "
                         "degrading to builtin)")
    ap.add_argument("--no-fused-extract", action="store_true",
                    help="disable the fused single-pass extractor and take "
                         "the DOM path for every document "
                         "(functions/fastextract.py); A/B escape hatch")
    ap.add_argument("--no-prededup", action="store_true",
                    help="disable the JVM-side candidate pre-dedup ahead of "
                         "the gate UDF (operators/dedup.py "
                         "prededup_discoveries); A/B escape hatch")
    args = ap.parse_args(argv)
    if not args.pages and not args.live:
        ap.error("--pages is required unless --live is given")

    from pyspark.sql import SparkSession

    from crawler_spark.config import CrawlConfig
    from crawler_spark.plans.crawl import SparkCrawler

    spark = SparkSession.builder.appName("crawler-spark-crawl").getOrCreate()

    _extras: dict = {}
    if args.config:
        from dataclasses import replace

        from crawler_spark.config_file import load_config

        config, _extras = load_config(args.config)
        overrides = {}
        if args.max_depth is not None:
            overrides["max_crawl_depth"] = args.max_depth
        if args.max_unique is not None:
            overrides["max_unique_url_count"] = args.max_unique
        if args.politeness_window is not None:
            overrides["politeness_window_s"] = args.politeness_window
        if args.no_lineage:
            overrides["lineage_enabled"] = False
        if args.seeds:
            overrides["seed_urls"] = tuple(args.seeds)
        if args.sitemaps:
            overrides["sitemap_urls"] = tuple(args.sitemaps)
        if args.allow_domain:
            overrides["domain_allowlist"] = tuple(args.allow_domain)
        if args.live:
            overrides["fetch_mode"] = "live"
        if args.warc_export:
            overrides["warc_export_dir"] = args.warc_export
        if args.reuse_unchanged:
            overrides["reuse_unchanged_pages"] = True
        if args.bloom:
            overrides["seen_bloom_enabled"] = True
        if args.no_bucketed_seen:
            overrides["seen_bucketed_enabled"] = False
        if args.html_backend:
            overrides["html_backend"] = args.html_backend
        if args.no_fused_extract:
            overrides["fused_extract"] = False
        if args.no_prededup:
            overrides["discovery_prededup"] = False
        if overrides:
            config = replace(config, **overrides)
    else:
        if not args.seeds:
            ap.error("--seeds is required when no --config is given")
        kwargs = dict(
            seed_urls=tuple(args.seeds),
            sitemap_urls=tuple(args.sitemaps),
            max_crawl_depth=args.max_depth if args.max_depth is not None else 10,
            max_unique_url_count=(
                args.max_unique if args.max_unique is not None else 100_000
            ),
            politeness_window_s=(
                args.politeness_window if args.politeness_window is not None else 0.0
            ),
            lineage_enabled=not args.no_lineage,
        )
        if args.allow_domain:
            kwargs["domain_allowlist"] = tuple(args.allow_domain)
        if args.live:
            kwargs["fetch_mode"] = "live"
        if args.warc_export:
            kwargs["warc_export_dir"] = args.warc_export
        if args.reuse_unchanged:
            kwargs["reuse_unchanged_pages"] = True
        if args.bloom:
            kwargs["seen_bloom_enabled"] = True
        if args.no_bucketed_seen:
            kwargs["seen_bucketed_enabled"] = False
        if args.html_backend:
            kwargs["html_backend"] = args.html_backend
        if args.no_fused_extract:
            kwargs["fused_extract"] = False
        if args.no_prededup:
            kwargs["discovery_prededup"] = False
        config = CrawlConfig(**kwargs)

    # output_sink: elasticsearch (offline) — resolve the export target up
    # front so a missing index fails before any crawl work (the reference
    # raises "Missing output index" at sink construction, elasticsearch.rb:29)
    es_dir = args.es_export
    es_index = args.es_index or _extras.get("output_index")
    es_cfg = _extras.get("elasticsearch") or {}
    if es_dir is None and _extras.get("output_sink") == "elasticsearch":
        es_dir = os.path.join(args.state, "es_bulk")
    if es_dir and not es_index:
        ap.error("--es-index (or config output_index) is required for the "
                 "elasticsearch output sink")

    # live cluster target: --es-url, or elasticsearch.host[:port] from the
    # reference-format config (es/client.rb builds the connection the same
    # way: host wins, port appended only when the host URL carries none)
    es_url = args.es_url
    if es_url is None and es_cfg.get("host"):
        es_url = str(es_cfg["host"])
        from urllib.parse import urlsplit

        if es_cfg.get("port") and not urlsplit(es_url).port:
            es_url = es_url.rstrip("/") + f":{int(es_cfg['port'])}"
    es_api_key = args.es_api_key or es_cfg.get("api_key")
    es_user = args.es_username or es_cfg.get("username")
    es_password = args.es_password or es_cfg.get("password")
    if args.es_purge and not es_url:
        ap.error("--es-purge requires --es-url (or config elasticsearch.host)")
    if es_url and not es_dir:
        ap.error("--es-url requires the elasticsearch export sink "
                 "(--es-export DIR or config output_sink: elasticsearch)")

    import datetime as _dt

    # the reference purges docs whose last_crawled_at predates the crawl
    # start (coordinator.rb:112, elasticsearch.rb:131-151)
    crawl_start_rfc3339 = _dt.datetime.now(_dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )

    pages = spark.read.parquet(args.pages) if args.pages else None
    crawler = SparkCrawler(
        spark, config, pages, args.state,
        max_waves=args.max_waves, resume=args.resume, recrawl=args.recrawl,
    )
    res = crawler.run()
    if args.compact:
        crawler.compact_state()
    es_stats = None
    if es_dir:
        from crawler_spark.sources.es_bulk import (
            DEFAULT_MAX_ITEMS,
            DEFAULT_MAX_SIZE_BYTES,
            DEFAULT_PIPELINE,
            export_es_bulk,
        )

        bulk_api = es_cfg.get("bulk_api") or {}
        es_stats = export_es_bulk(
            res.docs, es_dir, es_index,
            pipeline_enabled=bool(es_cfg.get("pipeline_enabled", True)),
            pipeline=es_cfg.get("pipeline", DEFAULT_PIPELINE),
            pipeline_params=es_cfg.get("pipeline_params"),
            max_items=int(bulk_api.get("max_items", DEFAULT_MAX_ITEMS)),
            max_size_bytes=int(
                bulk_api.get("max_size_bytes", DEFAULT_MAX_SIZE_BYTES)
            ),
        )
    send_stats = None
    deleted = None
    if es_dir and es_url:
        from crawler_spark.sources.es_live import delete_by_query, send_bulk_files

        basic = (es_user, es_password) if es_user else None
        send_stats = send_bulk_files(
            spark, es_dir, es_url,
            api_key=es_api_key, basic_auth=basic,
            crawl_id=os.path.basename(args.state.rstrip("/")) or "crawl",
        )
        if args.es_purge and not send_stats["failed_requests"]:
            if args.live:
                # live fetches stamp wall-clock last_crawled_at, so the
                # reference's exact purge applies (elasticsearch.rb:131-151):
                # refresh, then delete everything this crawl didn't re-index
                deleted = delete_by_query(
                    es_url, es_index,
                    {"query": {"range": {"last_crawled_at": {
                        "lt": crawl_start_rfc3339}}}},
                    api_key=es_api_key, basic_auth=basic,
                )
            else:
                # offline corpus timestamps aren't wall-clock; the purge
                # stage's tombstones name the gone docs exactly — stream
                # bulk delete actions for them, executor-parallel
                from crawler_spark.sources.es_live import send_delete_ids

                purged = res.purged
                deleted = 0
                if purged is not None:
                    del_stats = send_delete_ids(
                        spark, purged.select("id").distinct(), es_url,
                        es_index, api_key=es_api_key, basic_auth=basic,
                    )
                    deleted = del_stats["deleted"]

    manifest = res.store.read_manifest()
    out = {
        "waves": manifest["wave"],
        "seen_count": manifest["seen_count"],
        "elapsed_s": round(res.elapsed_s, 2),
        "state": args.state,
    }
    if es_stats is not None:
        # live send stats supersede the exporter's optimistic local count —
        # they say what the cluster actually acknowledged
        out["ingestion_stats"] = send_stats if send_stats is not None else es_stats
        if send_stats is not None:
            out["ingestion_stats"]["exported"] = {
                "docs_count": es_stats["completed"]["docs_count"],
                "docs_volume": es_stats["completed"]["docs_volume"],
            }
    if deleted is not None:
        out["deleted"] = deleted
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
