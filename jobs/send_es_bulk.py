#!/usr/bin/env python
"""spark-submit entry point: replay an ``export_es_bulk`` output dir
against a live Elasticsearch cluster (sources/es_live.py) with the
reference client's retry/backoff and failed-payload capture.

    spark-submit --py-files dist/crawler_spark.zip jobs/send_es_bulk.py \
        --bulk-dir /warehouse/es_bulk --es-url https://es.example:9243 \
        [--api-key KEY | --username elastic --password ...] \
        [--retries 3] [--retry-delay 2] [--crawl-id my-crawl] \
        [--failed-dir output/failed_payloads]

Exit status is 0 when every request succeeded, 2 when any request
exhausted its retries (its payload is preserved under --failed-dir for
replay; the printed stats say exactly how many docs/bytes failed).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="send ES _bulk request files")
    ap.add_argument("--bulk-dir", required=True, help="export_es_bulk output dir")
    ap.add_argument("--es-url", required=True, help="Elasticsearch base URL")
    ap.add_argument("--api-key", default=None)
    ap.add_argument("--username", default=None)
    ap.add_argument("--password", default=None)
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--retry-delay", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=60.0)
    ap.add_argument("--crawl-id", default="crawl")
    ap.add_argument("--failed-dir", default="output/failed_payloads")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crawler_spark.sources.es_live import send_bulk_files

    basic = (args.username, args.password) if args.username else None
    spark = SparkSession.builder.appName("crawler-spark-send-es-bulk").getOrCreate()
    stats = send_bulk_files(
        spark,
        args.bulk_dir,
        args.es_url,
        api_key=args.api_key,
        basic_auth=basic,
        retry_on_failure=args.retries,
        delay_on_retry=args.retry_delay,
        timeout_s=args.timeout,
        crawl_id=args.crawl_id,
        failed_dir=args.failed_dir,
    )
    print(json.dumps(stats))
    return 0 if not stats["failed_requests"] else 2


if __name__ == "__main__":
    sys.exit(main())
