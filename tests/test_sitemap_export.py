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
