#!/usr/bin/env python
"""spark-submit entry point: publish a finished crawl's docs as
sitemaps.org shards + index (sources/sitemap_export.py).

    spark-submit --py-files dist/crawler_spark.zip jobs/export_sitemaps.py \
        --state /warehouse/state --out /var/www/sitemaps \
        --base-url https://mirror.example [--urls-per-file 50000]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="sitemaps.org export from crawl state")
    ap.add_argument("--state", required=True, help="crawl state directory")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--base-url", default="", help="public URL prefix for the index")
    ap.add_argument("--urls-per-file", type=int, default=50_000)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crawler_spark.plans.crawl import state_docs_view
    from crawler_spark.sources.sitemap_export import export_sitemaps
    from crawler_spark.state.store import StateStore

    spark = SparkSession.builder.appName("crawler-spark-export-sitemaps").getOrCreate()
    store = StateStore(spark, args.state)
    if store.read("parsed") is None:
        print(json.dumps({"shards": 0, "note": "no parsed history in state dir"}))
        return 0
    docs = state_docs_view(store)
    shards = export_sitemaps(
        docs, args.out, base_url=args.base_url,
        urls_per_file=args.urls_per_file, url_col="url",
    )
    print(json.dumps({"shards": len(shards), "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
