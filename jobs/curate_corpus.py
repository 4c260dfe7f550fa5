#!/usr/bin/env python
"""spark-submit entry point for the training-data curation pipeline.

Turns a raw document corpus — a documents parquet, or the docs produced
by a crawl state dir — into packed training sequences plus a curation
report, using the same `crawler_spark.textops` operators the driver
queries exercise: optional UT1-style URL/domain blocklist prune →
heuristic quality gate → Gopher repetition gate → near-dup keep-best
prune → benchmark decontamination → GPT-style sequence packing
(`textops/corpusfilter.py corpus_pipeline`).

Usage (local smoke):

    spark-submit --master local[8] --py-files dist/crawler_spark.zip \
        jobs/curate_corpus.py --docs /data/documents.parquet \
        --out /warehouse/packed --report /warehouse/mix_report

    # or straight off a finished crawl:
    spark-submit ... jobs/curate_corpus.py --state /tmp/crawl_state \
        --blocklist blocked_domains.txt --out /warehouse/packed

Prints ONE JSON line: input/blocked/survivor/pack tallies.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="crawler_spark corpus curation job")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", default=None,
                     help="documents parquet (doc_id bigint, text string; "
                          "optional url/source/lang columns)")
    src.add_argument("--state", default=None,
                     help="crawl state dir — curate that crawl's docs view "
                          "(id/url/body map onto doc_id/url/text)")
    ap.add_argument("--out", required=True,
                    help="output parquet: packed sequences (doc_id, shard, "
                         "pack_id, offset_in_pack, n_tokens)")
    ap.add_argument("--report", default=None, metavar="DIR",
                    help="also write the per-(source,lang) corpus-mix report "
                         "parquet (tallies + sqrt-temperature weights)")
    ap.add_argument("--blocklist", default=None, metavar="FILE",
                    help="text file of blocked registrable domains (one per "
                         "line, UT1 format); rows whose url host matches are "
                         "pruned before the pipeline")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--budget", type=int, default=2048,
                    help="tokens per packed training sequence")
    ap.add_argument("--shards", type=int, default=64,
                    help="independent packing streams (output shards)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from crawler_spark.textops.corpusfilter import (
        corpus_mix_report,
        corpus_pipeline,
    )

    spark = SparkSession.builder.appName("crawler-spark-curate").getOrCreate()

    if args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        from crawler_spark.plans.crawl import state_docs_view
        from crawler_spark.state.store import StateStore

        view = state_docs_view(StateStore(spark, args.state))
        # packing shards by doc_id % n — derive a stable numeric id from
        # the url-hash id; keep url for the blocklist stage
        docs = view.select(
            F.abs(F.xxhash64("id")).alias("doc_id"),
            F.col("url"),
            F.coalesce(F.col("body"), F.lit("")).alias("text"),
        )

    n_input = docs.count()
    n_blocked = 0
    if args.blocklist:
        if "url" not in docs.columns:
            ap.error("--blocklist needs a url column in the input docs")
        from crawler_spark.textops.urlfilter import apply_domain_blocklist

        with open(args.blocklist) as f:
            hosts = [ln.strip().lower() for ln in f if ln.strip()]
        dim = spark.createDataFrame([(h,) for h in hosts], "host string")
        docs = apply_domain_blocklist(docs, dim)
        # one extra count so the tally is honest; skipped when no blocklist
        kept = docs.count()
        n_blocked = n_input - kept

    packed = corpus_pipeline(
        docs, min_quality=args.min_quality,
        budget=args.budget, n_shards=args.shards,
    )
    packed.write.mode("overwrite").parquet(args.out)
    out_df = spark.read.parquet(args.out)
    n_docs = out_df.count()
    n_packs = out_df.select("shard", "pack_id").distinct().count()

    if args.report:
        rep_in = docs
        for col, default in (("source", "unknown"), ("lang", "unknown")):
            if col not in rep_in.columns:
                rep_in = rep_in.withColumn(col, F.lit(default))
        corpus_mix_report(rep_in).write.mode("overwrite").parquet(args.report)

    print(json.dumps({
        "input_docs": n_input,
        "blocked_by_url": n_blocked,
        "packed_docs": n_docs,
        "packs": n_packs,
        "budget": args.budget,
        "out": args.out,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
