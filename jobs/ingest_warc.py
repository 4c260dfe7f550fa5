#!/usr/bin/env python
"""spark-submit entry point for WARC ingestion: raw Common-Crawl archives
→ the crawl-ready ``pages`` parquet table.

    spark-submit --py-files dist/crawler_spark.zip jobs/ingest_warc.py \
        --warc 'segments/*.warc.gz' --out /warehouse/pages \
        [--buckets 256]

One non-splittable archive per task (Common Crawl segments are ~1 GB, so
100 TB ≈ 10^5 files ≈ 10^5 tasks); the output is written through
``prepare_pages`` so it lands already carrying the join identity
(norm_url, url_hash) and repartitioned on url_hash — the layout every
downstream fetch join and seen anti-join co-partitions against.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="WARC → pages ingestion job")
    ap.add_argument("--warc", required=True,
                    help="WARC path/glob (.warc or .warc.gz)")
    ap.add_argument("--out", required=True, help="output pages parquet path")
    ap.add_argument("--buckets", type=int, default=None,
                    help="url_hash partitions for the output layout "
                         "(default: spark.sql.shuffle.partitions)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crawler_spark.sources.pages import prepare_pages
    from crawler_spark.sources.warc import read_warc

    spark = SparkSession.builder.appName("crawler-spark-ingest-warc").getOrCreate()
    pages = read_warc(spark, args.warc)
    prepared = prepare_pages(pages, repartition=args.buckets)
    prepared.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"pages": n, "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
