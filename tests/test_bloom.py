"""Partitioned Bloom sidecar tests: no-false-negative invariant, fpp
sanity, incremental delta OR-merge, and crawl-level equivalence (the
bloom fast path must produce the exact same seen set and docs as the
plain anti-join)."""

import os
import tempfile

from pyspark.sql import functions as F


def _hashes(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "url_hash string")


def test_bloom_no_false_negatives_and_low_fpp(spark):
    from crawler_spark.state.bloom import bloom_classify, build_bloom_delta

    seen_keys = [f"seen-{i:05d}" for i in range(2000)]
    new_keys = [f"new-{i:05d}" for i in range(2000)]
    bloom = build_bloom_delta(_hashes(spark, seen_keys), num_buckets=8, nbits=1 << 16)
    out = bloom_classify(
        _hashes(spark, seen_keys + new_keys), bloom, num_buckets=8, nbits=1 << 16
    ).collect()
    flags = {r["url_hash"]: r["_maybe_seen"] for r in out}
    # every inserted key MUST flag maybe-seen (a false negative loses dedup)
    assert all(flags[k] for k in seen_keys)
    # false-positive rate stays around the design point (k=7, ~10 bits/key
    # per bucket here); generous bound to keep the test weather-proof
    fp = sum(1 for k in new_keys if flags[k])
    assert fp < len(new_keys) * 0.05
    assert len(flags) == 4000


def test_bloom_incremental_deltas_or_merge(spark):
    from crawler_spark.state.bloom import bloom_classify, build_bloom_delta

    d1 = build_bloom_delta(_hashes(spark, ["a", "b"]), num_buckets=4, nbits=1 << 12)
    d2 = build_bloom_delta(_hashes(spark, ["c"]), num_buckets=4, nbits=1 << 12)
    merged = d1.unionByName(d2)
    out = {
        r["url_hash"]: r["_maybe_seen"]
        for r in bloom_classify(
            _hashes(spark, ["a", "b", "c"]), merged, num_buckets=4, nbits=1 << 12
        ).collect()
    }
    assert out == {"a": True, "b": True, "c": True}


def test_bloom_empty_sidecar_classifies_all_new(spark):
    from crawler_spark.state.bloom import bloom_classify

    empty = spark.createDataFrame([], "bucket int, bits binary")
    out = bloom_classify(
        _hashes(spark, ["x", "y"]), empty, num_buckets=4, nbits=1 << 12
    ).collect()
    assert all(r["_maybe_seen"] is False for r in out)
    assert len(out) == 2


def test_crawl_with_bloom_sidecar_matches_plain_antijoin(spark, corpus):
    from dataclasses import replace

    from crawler_spark.config import CrawlConfig
    from crawler_spark.fixtures.gen import write_parquet
    from crawler_spark.plans.crawl import SparkCrawler

    rows, cfg = corpus
    tmp = tempfile.mkdtemp(prefix="bloom_e2e_")
    pages_path = os.path.join(tmp, "pages.parquet")
    write_parquet(rows, pages_path)
    base = CrawlConfig(
        seed_urls=tuple(cfg["seed_urls"]),
        sitemap_urls=tuple(cfg["sitemap_urls"]),
        crawl_rules=cfg["crawl_rules"],
    )
    results = {}
    for label, conf in (
        ("plain", base),
        ("bloom", replace(base, seen_bloom_enabled=True,
                          seen_bloom_buckets=8, seen_bloom_bits=1 << 16)),
    ):
        pages = spark.read.parquet(pages_path)
        res = SparkCrawler(
            spark, conf, pages, os.path.join(tmp, f"state_{label}"), max_waves=30
        ).run()
        results[label] = (
            {r["url_hash"] for r in res.seen.select("url_hash").collect()},
            {r["id"] for r in res.docs.select("id").collect()},
        )
    assert results["bloom"][0] == results["plain"][0]
    assert results["bloom"][1] == results["plain"][1]
    # the sidecar actually materialized (one delta per admitting wave)
    bloom_dir = os.path.join(tmp, "state_bloom", "seen_bloom")
    assert os.path.isdir(bloom_dir) and any(
        d.startswith("wave=") for d in os.listdir(bloom_dir)
    )


def test_crawl_bloom_resume_keeps_seen_consistent(spark, corpus, tmp_path):
    """Interrupt a bloom-enabled crawl after 2 waves and resume: the final
    seen set must equal an uninterrupted plain-anti-join crawl's (the
    sidecar deltas persisted in the state dir must cover exactly the seen
    rows on resume)."""
    from dataclasses import replace

    from crawler_spark.config import CrawlConfig
    from crawler_spark.fixtures.gen import write_parquet
    from crawler_spark.plans.crawl import SparkCrawler

    rows, cfg = corpus
    pages_path = str(tmp_path / "pages.parquet")
    write_parquet(rows, pages_path)
    base = CrawlConfig(
        seed_urls=tuple(cfg["seed_urls"]),
        sitemap_urls=tuple(cfg["sitemap_urls"]),
        crawl_rules=cfg["crawl_rules"],
    )
    pages = spark.read.parquet(pages_path)
    full = SparkCrawler(
        spark, base, pages, str(tmp_path / "state_full"), max_waves=30
    ).run()
    expected = {r["url_hash"] for r in full.seen.select("url_hash").collect()}

    bcfg = replace(base, seen_bloom_enabled=True, seen_bloom_buckets=8,
                   seen_bloom_bits=1 << 16)
    state = str(tmp_path / "state_bloom_resume")
    SparkCrawler(spark, bcfg, pages, state, max_waves=2).run()
    res = SparkCrawler(
        spark, bcfg, pages, state, max_waves=30, resume=True
    ).run()
    got = {r["url_hash"] for r in res.seen.select("url_hash").collect()}
    assert got == expected


def test_bloom_enabled_mid_crawl_rebuilds_sidecar(spark, corpus, tmp_path):
    """Enable --bloom when resuming a state crawled WITHOUT it: the
    resume must rebuild the sidecar from the full seen table (the
    manifest records no bloom coverage), or Bloom false negatives would
    re-admit pre-enable seen URLs. Final seen set must equal an
    uninterrupted plain crawl's, and the rebuilt sidecar must cover
    every pre-resume seen hash (zero 'definitely new' among them)."""
    import json
    from dataclasses import replace

    from crawler_spark.config import CrawlConfig
    from crawler_spark.fixtures.gen import write_parquet
    from crawler_spark.plans.crawl import SparkCrawler
    from crawler_spark.state.bloom import bloom_classify

    rows, cfg = corpus
    pages_path = str(tmp_path / "pages.parquet")
    write_parquet(rows, pages_path)
    base = CrawlConfig(
        seed_urls=tuple(cfg["seed_urls"]),
        sitemap_urls=tuple(cfg["sitemap_urls"]),
        crawl_rules=cfg["crawl_rules"],
    )
    pages = spark.read.parquet(pages_path)
    full = SparkCrawler(
        spark, base, pages, str(tmp_path / "state_full"), max_waves=30
    ).run()
    expected = {r["url_hash"] for r in full.seen.select("url_hash").collect()}

    # 2 plain waves, then resume with bloom ON (params never persisted)
    state = str(tmp_path / "state_switch")
    SparkCrawler(spark, base, pages, state, max_waves=2).run()
    pre = spark.read.parquet(os.path.join(state, "seen", "wave=*")) \
        .select("url_hash")
    pre_hashes = {r["url_hash"] for r in pre.collect()}
    bcfg = replace(base, seen_bloom_enabled=True, seen_bloom_buckets=8,
                   seen_bloom_bits=1 << 16)
    res = SparkCrawler(
        spark, bcfg, pages, state, max_waves=30, resume=True
    ).run()
    got = {r["url_hash"] for r in res.seen.select("url_hash").collect()}
    assert got == expected

    # coverage proof: every pre-enable hash probes 'maybe seen'
    sidecar = res.store.read("seen_bloom")
    probe = bloom_classify(
        spark.createDataFrame([(h,) for h in sorted(pre_hashes)],
                              "url_hash string"),
        sidecar, num_buckets=8, nbits=1 << 16,
    )
    assert probe.filter(~F.col("_maybe_seen")).count() == 0
    # and the manifest now records the coverage params
    with open(os.path.join(state, "manifest.json")) as f:
        m = json.load(f)
    assert m["bloom"] == {"buckets": 8, "bits": 1 << 16}


def test_bloom_param_change_on_resume_rebuilds(spark, corpus, tmp_path):
    """Changing seen_bloom_buckets/bits between runs must invalidate the
    persisted sidecar (positions are param-dependent): the resume
    rebuilds with the new params and the seen set stays exact."""
    from dataclasses import replace

    from crawler_spark.config import CrawlConfig
    from crawler_spark.fixtures.gen import write_parquet
    from crawler_spark.plans.crawl import SparkCrawler

    rows, cfg = corpus
    pages_path = str(tmp_path / "pages.parquet")
    write_parquet(rows, pages_path)
    base = CrawlConfig(
        seed_urls=tuple(cfg["seed_urls"]),
        sitemap_urls=tuple(cfg["sitemap_urls"]),
        crawl_rules=cfg["crawl_rules"],
    )
    pages = spark.read.parquet(pages_path)
    full = SparkCrawler(
        spark, base, pages, str(tmp_path / "state_full2"), max_waves=30
    ).run()
    expected = {r["url_hash"] for r in full.seen.select("url_hash").collect()}

    state = str(tmp_path / "state_params")
    b1 = replace(base, seen_bloom_enabled=True, seen_bloom_buckets=4,
                 seen_bloom_bits=1 << 14)
    SparkCrawler(spark, b1, pages, state, max_waves=2).run()
    b2 = replace(base, seen_bloom_enabled=True, seen_bloom_buckets=8,
                 seen_bloom_bits=1 << 16)
    res = SparkCrawler(
        spark, b2, pages, state, max_waves=30, resume=True
    ).run()
    got = {r["url_hash"] for r in res.seen.select("url_hash").collect()}
    assert got == expected
