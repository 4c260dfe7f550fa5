#!/usr/bin/env python
"""spark-submit entry point for link-graph host ranking: run integer
fixed-point PageRank (operators/linkrank.py) over the crawl state's own
docs link graph and write the result as a priority dimension the next
crawl dispatches by.

    spark-submit --py-files dist/crawler_spark.zip jobs/rank_hosts.py \
        --state /warehouse/state --out /warehouse/host_rank.parquet \
        [--iterations 3] [--damping 85]

Then crawl with link-evidence prioritization:

    spark-submit ... jobs/submit_crawl.py --state /warehouse/state2 \
        --pages corpus.parquet --seeds ... \
        # crawler.yml: priority_dimension_path: /warehouse/host_rank.parquet
        #              priority_dimension_key: host_key
        #              frontier_priority_expr: "coalesce(rank, 0)"

The output host_key column uses the frontier's scheme://host:port format
(functions/urlnorm.url_host_key) so the dispatch join matches directly;
both scheme variants are emitted per ranked host since the link graph is
host-level while frontier keys carry the scheme.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="host rank priority dimension")
    ap.add_argument("--state", required=True, help="crawl state directory")
    ap.add_argument("--out", required=True, help="dimension parquet path")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--damping", type=int, default=85,
                    help="damping factor as a percent (default 85)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from crawler_spark.operators.linkrank import link_edges_from_docs, pagerank
    from crawler_spark.plans.crawl import state_docs_view
    from crawler_spark.state.store import StateStore

    spark = SparkSession.builder.appName("crawler-spark-rank-hosts").getOrCreate()
    store = StateStore(spark, args.state)
    if store.read("parsed") is None:
        print(json.dumps({"hosts": 0, "note": "no parsed history in state dir"}))
        return 0
    docs = state_docs_view(store)
    ranks = pagerank(
        link_edges_from_docs(docs),
        iterations=args.iterations,
        damping_pct=args.damping,
    )
    # expand host -> frontier host_key (scheme://host:port; default ports)
    dim = ranks.select(
        F.explode(
            F.array(
                F.concat(F.lit("https://"), F.col("node"), F.lit(":443")),
                F.concat(F.lit("http://"), F.col("node"), F.lit(":80")),
            )
        ).alias("host_key"),
        "rank",
    )
    dim.write.mode("overwrite").parquet(args.out)
    n = ranks.count()
    print(json.dumps({"hosts": n, "iterations": args.iterations,
                      "damping": args.damping, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
