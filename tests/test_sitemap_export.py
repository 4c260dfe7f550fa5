"""Sitemap export: sitemaps.org shards + index from a url frame, and the
round trip back through the engine's own sitemap parser."""

import os

from pyspark.sql import functions as F


def test_export_sitemaps_round_trip_and_protocol_shape(spark, tmp_path):
    from crawler_spark.functions.sitemaps import parse_sitemap
    from crawler_spark.sources.sitemap_export import export_sitemaps

    urls = [f"https://site.test/page/{i:04d}?a=1&b=<2>" for i in range(500)]
    df = spark.createDataFrame(
        [(u, "2026-08-19 00:00:00") for u in urls], "url string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = str(tmp_path / "maps")
    shards = export_sitemaps(
        df, out, base_url="https://site.test", urls_per_file=200, lastmod_col="ts"
    )
    assert len(shards) >= 3  # 500 urls / (200 * 0.8 slack)

    # index lists every shard under the base url
    idx = open(os.path.join(out, "sitemap_index.xml")).read()
    sm_links, _ = parse_sitemap("https://site.test/sitemap_index.xml", idx)
    assert sorted(sm_links) == [
        f"https://site.test/{os.path.basename(p)}" for p in sorted(shards)
    ]

    # round trip: parsing every shard recovers the exact URL set (entity
    # escaping included), each shard within the derated cap and sorted
    seen = []
    for p in shards:
        content = open(p).read()
        _, content_links = parse_sitemap("https://site.test/x.xml", content)
        assert len(content_links) <= 200
        assert content_links == sorted(content_links)
        assert "<lastmod>2026-08-19</lastmod>" in content
        seen.extend(content_links)
    assert sorted(seen) == sorted(urls)
    # shards are range-partitioned: concatenation in name order is sorted
    assert seen == sorted(seen)


def test_export_sitemaps_empty_frame(spark, tmp_path):
    from crawler_spark.sources.sitemap_export import export_sitemaps

    df = spark.createDataFrame([], "url string")
    out = str(tmp_path / "maps")
    assert export_sitemaps(df, out) == []
    assert "<sitemapindex" in open(os.path.join(out, "sitemap_index.xml")).read()


def test_export_sitemaps_job_from_crawl_state(spark, monkeypatch, tmp_path,
                                              crawl_config, pages_path, capsys):
    import json

    import jobs.export_sitemaps as job

    monkeypatch.setattr(
        "pyspark.sql.SparkSession.builder",
        type("B", (), {"appName": lambda self, n: self,
                       "getOrCreate": lambda self: spark})(),
    )
    from crawler_spark.functions.sitemaps import parse_sitemap
    from crawler_spark.plans.crawl import SparkCrawler

    state = str(tmp_path / "state")
    res = SparkCrawler(
        spark, crawl_config, spark.read.parquet(pages_path), state, max_waves=30
    ).run()
    doc_urls = {r["url"] for r in res.docs.select("url").collect()}

    out = str(tmp_path / "maps")
    assert job.main(["--state", state, "--out", out,
                     "--base-url", "https://mirror.test"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["shards"] >= 1
    import glob

    got = []
    for p in glob.glob(os.path.join(out, "sitemap-*.xml")):
        _, links = parse_sitemap("https://mirror.test/x.xml", open(p).read())
        got.extend(links)
    assert set(got) == doc_urls
