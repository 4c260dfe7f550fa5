"""CDX archive-index tests: SURT transform edge cases and the
range-partitioned globally-ordered shard writer."""

import os
import tempfile

from pyspark.sql import functions as F


def _surt(spark, url):
    from crawler_spark.sources.cdx import surt_key

    return (
        spark.createDataFrame([(url,)], "url string")
        .select(surt_key(F.col("url")).alias("s"))
        .first()["s"]
    )


def test_surt_key_cases(spark):
    assert _surt(spark, "https://www.sub.Example.com:8080/a/b?q=1") == (
        "com,example,sub:8080)/a/b?q=1"
    )
    assert _surt(spark, "http://example.com/") == "com,example)/"
    assert _surt(spark, "https://EXAMPLE.com") == "com,example)/"
    assert _surt(spark, "https://a.b.c.d/p") == "d,c,b,a)/p"
    # only a leading www. label is dropped, not an interior one
    assert _surt(spark, "https://www.www2.site.org/x") == "org,site,www2)/x"
    # host-prefix contiguity: all of one host's captures sort together
    assert _surt(spark, "https://docs.site.org/a") < _surt(
        spark, "https://site.org/z"
    ) or _surt(spark, "https://docs.site.org/a").startswith("org,site")


def test_cdx_index_and_sharded_write_is_globally_sorted(spark):
    from crawler_spark.sources.cdx import cdx_index, write_cdx

    rows = [
        (f"https://host{i % 7}.test/page/{i}", 20260101000000 + i, f"text {i}")
        for i in range(200)
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts long, text string")
    idx = cdx_index(pages)
    assert idx.columns == ["surt", "url", "ts", "digest"]
    assert idx.count() == 200

    out = os.path.join(tempfile.mkdtemp(prefix="cdx_"), "index")
    write_cdx(idx, out, shards=4)
    # global order: per-file sorted AND file ranges non-overlapping, so the
    # concatenation of part files in name order is fully sorted
    files = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    assert len(files) >= 2
    seen = []
    for f in files:
        part = spark.read.parquet(os.path.join(out, f)).select("surt", "ts").collect()
        keys = [(r["surt"], r["ts"]) for r in part]
        assert keys == sorted(keys)
        seen.extend(keys)
    assert seen == sorted(seen)
    assert len(seen) == 200


def test_surt_key_matches_python_reference_on_adversarial_matrix(spark):
    """Differential test: the codegen SURT expression vs an independent
    per-row Python reference, over the cartesian matrix of scheme x www x
    case x port x path/query shapes (one Spark job, every row compared)."""
    from crawler_spark.sources.cdx import surt_key

    def surt_py(url: str) -> str:
        rest = url.split("://", 1)[1].lower() if "://" in url else url.lower()
        hostport, _, path = rest.partition("/")
        path = "/" + path if _ else "/"
        host, colon, port = hostport.partition(":")
        if host.startswith("www."):
            host = host[4:]
        return ",".join(reversed(host.split("."))) + colon + port + ")" + path

    urls = []
    for scheme in ("http", "https"):
        for host in ("example.com", "WWW.Sub.Example.COM", "a.b.c.d.e", "localhost"):
            for port in ("", ":8080", ":443"):
                for tail in ("", "/", "/a/b", "/a/b?q=1&x=2", "/%7Euser"):
                    urls.append(f"{scheme}://{host}{port}{tail}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["s"]
        for r in df.select("url", surt_key(F.col("url")).alias("s")).collect()
    }
    for u in urls:
        assert got[u] == surt_py(u), u
