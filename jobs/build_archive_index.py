#!/usr/bin/env python
"""spark-submit entry point for the CDX archive index: turn a finished
crawl state's docs view into SURT-keyed, globally-sorted index shards
(sources/cdx.py) — the lookup artifact that makes a WARC-exporting crawl
(`--warc-export`) a self-describing web archive.

    spark-submit --py-files dist/crawler_spark.zip jobs/build_archive_index.py \
        --state /warehouse/state --out /warehouse/cdx [--shards 64]

Shards are range-partitioned on (surt, ts) and sorted within each shard,
so shard k's every key precedes shard k+1's: the concatenation in file
order IS the sorted CDX — no single-task global sort at any scale.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="CDX archive index from crawl state")
    ap.add_argument("--state", required=True, help="crawl state directory")
    ap.add_argument("--out", required=True, help="output shard directory")
    ap.add_argument("--shards", type=int, default=0,
                    help="shard count (0 = let Spark pick)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crawler_spark.plans.crawl import state_docs_view
    from crawler_spark.sources.cdx import cdx_index, write_cdx
    from crawler_spark.state.store import StateStore

    spark = SparkSession.builder.appName("crawler-spark-archive-index").getOrCreate()
    store = StateStore(spark, args.state)
    if store.read("parsed") is None:
        print(json.dumps({"records": 0, "note": "no parsed history in state dir"}))
        return 0
    docs = state_docs_view(store)
    idx = cdx_index(docs, url_col="url", ts_col="last_crawled_at", content_col="body")
    write_cdx(idx, args.out, shards=args.shards)
    print(json.dumps({"records": idx.count(), "out": args.out,
                      "shards": args.shards or "auto"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
