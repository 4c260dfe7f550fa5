#!/usr/bin/env python
"""spark-submit entry point for freshness scheduling: compute which URLs
are DUE for a refresh from the crawl state's own parsed history (Cho &
Garcia-Molina change-rate policy, operators/revisit.py), and emit them as
a seed list / parquet for a targeted refresh crawl.

    spark-submit --py-files dist/crawler_spark.zip jobs/refresh_due.py \
        --state /warehouse/state --base-interval 86400 \
        [--as-of 2026-08-18T00:00:00] [--out due.parquet] [--print-seeds]

Then refresh only what changed-prone pages need:

    spark-submit ... jobs/submit_crawl.py --state /warehouse/state \
        --pages corpus.parquet --recrawl --seeds $(cat due_seeds.txt)

At 10^10 URLs this replaces the reference's uniform cron recrawl
(cli/schedule.rb re-crawls everything) with a fetch budget proportional
to the corpus' actual change volume.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="freshness: URLs due for refresh")
    ap.add_argument("--state", required=True, help="crawl state directory")
    ap.add_argument("--base-interval", type=int, default=86400,
                    help="base revisit interval in seconds (default 1 day)")
    ap.add_argument("--as-of", default=None,
                    help="ISO timestamp to evaluate dueness at (default: now)")
    ap.add_argument("--min-obs", type=int, default=2,
                    help="minimum crawl observations to estimate change rate")
    ap.add_argument("--out", default=None,
                    help="write the due list as parquet here")
    ap.add_argument("--print-seeds", action="store_true",
                    help="print due URLs one per line (seed-list form)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crawler_spark.operators.revisit import due_for_revisit
    from crawler_spark.state.store import StateStore

    spark = SparkSession.builder.appName("crawler-spark-refresh-due").getOrCreate()
    store = StateStore(spark, args.state)
    parsed = store.read("parsed")
    if parsed is None:
        print(json.dumps({"due": 0, "note": "no parsed history in state dir"}))
        return 0
    due = due_for_revisit(
        parsed, base_interval_s=args.base_interval,
        as_of=args.as_of, min_obs=args.min_obs,
    )
    if args.out:
        due.write.mode("overwrite").parquet(args.out)
    if args.print_seeds:
        for r in due.select("norm_url").toLocalIterator():
            print(r.norm_url)
    n = due.count()
    print(json.dumps({"due": n, "base_interval_s": args.base_interval,
                      "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
