"""WARC ingestion source: parse round-trip, record-type filtering, gzip
members, and compatibility with prepare_pages (the crawl's input prep)."""

import datetime

import pytest


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    from crawler_spark.sources.warc import write_warc

    d = tmp_path_factory.mktemp("warc")
    write_warc(
        str(d / "seg-00000.warc"),
        [
            {
                "url": "https://site0.test/",
                "date": "2024-01-02T03:04:05Z",
                "body": b"<html><body>home</body></html>",
            },
            {
                # request records must be skipped
                "url": "https://site0.test/",
                "date": "2024-01-02T03:04:05Z",
                "body": b"GET / HTTP/1.1",
                "type": "request",
                "http": False,
            },
            {
                # non-http payload (resource-style body, no HTTP envelope)
                "url": "https://site0.test/raw",
                "date": "2024-01-02T03:04:06Z",
                "body": b"<html><body>raw</body></html>",
                "http": False,
            },
        ],
    )
    write_warc(
        str(d / "seg-00001.warc.gz"),
        [
            {
                "url": "https://site1.test/a",
                "date": "2024-02-03T04:05:06Z",
                "body": b"<html><body>gz page</body></html>",
            }
        ],
        compress=True,
    )
    return str(d)


def test_warc_read_responses_only(spark, warc_dir):
    from crawler_spark.sources.warc import read_warc

    rows = {r.url: r for r in read_warc(spark, warc_dir).collect()}
    assert set(rows) == {
        "https://site0.test/",
        "https://site0.test/raw",
        "https://site1.test/a",
    }
    # HTTP envelope stripped; raw payload passed through
    assert bytes(rows["https://site0.test/"].html) == b"<html><body>home</body></html>"
    assert bytes(rows["https://site0.test/raw"].html) == b"<html><body>raw</body></html>"
    assert bytes(rows["https://site1.test/a"].html) == b"<html><body>gz page</body></html>"
    assert rows["https://site1.test/a"].warc_ts == datetime.datetime(2024, 2, 3, 4, 5, 6)
    # text/lang are downstream derivations — null at ingest
    assert rows["https://site0.test/"].text is None
    assert rows["https://site0.test/"].lang is None


def test_warc_feeds_prepare_pages(spark, warc_dir):
    from crawler_spark.sources.pages import prepare_pages
    from crawler_spark.sources.warc import read_warc

    pages = prepare_pages(read_warc(spark, warc_dir))
    got = {r.norm_url: r.url_hash for r in pages.collect()}
    assert "https://site0.test/" in got
    assert all(len(h) == 40 for h in got.values())  # sha1 hex join identity


def test_truncated_archive_yields_good_prefix(spark, tmp_path):
    from crawler_spark.sources.warc import iter_warc_records, write_warc

    p = tmp_path / "trunc.warc"
    write_warc(
        str(p),
        [
            {"url": "https://a.test/", "date": "2024-01-01T00:00:00Z", "body": b"x"},
            {"url": "https://b.test/", "date": "2024-01-01T00:00:01Z", "body": b"y"},
        ],
    )
    data = p.read_bytes()[:-30]  # cut into the second record
    recs = list(iter_warc_records(data))
    assert len(recs) == 1
    assert recs[0][0]["warc-target-uri"] == "https://a.test/"


def test_ingest_warc_job(spark, tmp_path, monkeypatch):
    """jobs/ingest_warc.py lands a WARC archive as a crawl-ready pages
    table (norm_url/url_hash present, url_hash-partitioned layout)."""
    import sys

    from crawler_spark.sources.warc import write_warc

    warc = str(tmp_path / "seg.warc.gz")
    write_warc(warc, [
        {"url": "https://w.test/a", "date": "2026-01-01T00:00:00Z",
         "body": b"<html><body>a</body></html>"},
        {"url": "https://w.test/b", "date": "2026-01-01T00:00:01Z",
         "body": b"<html><body>b</body></html>"},
    ], compress=True)
    out = str(tmp_path / "pages")

    import jobs.ingest_warc as job

    # reuse the test session instead of letting the job build its own
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.builder",
        type("B", (), {"appName": lambda self, n: self,
                       "getOrCreate": lambda self: spark})(),
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert job.main(["--warc", warc, "--out", out, "--buckets", "4"]) == 0
    df = spark.read.parquet(out)
    assert df.count() == 2
    assert {"url", "norm_url", "url_hash", "html"} <= set(df.columns)


def test_stream_warc_incremental(spark, tmp_path):
    """Streaming ingestion: archives dropped into a directory land in the
    pages table incrementally; the checkpoint makes re-runs exactly-once
    (an already-processed archive is never re-ingested)."""
    import os

    from crawler_spark.sources.warc import stream_warc, write_warc

    src = tmp_path / "drop"
    src.mkdir()
    out = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")

    def _drain():
        q = (stream_warc(spark, str(src))
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    write_warc(str(src / "seg1.warc.gz"), [
        {"url": "https://w.test/a", "date": "2026-01-01T00:00:00Z",
         "body": b"<html>a</html>"},
    ], compress=True)
    _drain()
    assert {r["url"] for r in spark.read.parquet(out).collect()} == {"https://w.test/a"}

    write_warc(str(src / "seg2.warc.gz"), [
        {"url": "https://w.test/b", "date": "2026-01-01T00:00:01Z",
         "body": b"<html>b</html>"},
    ], compress=True)
    _drain()
    rows = spark.read.parquet(out).collect()
    assert {r["url"] for r in rows} == {"https://w.test/a", "https://w.test/b"}
    assert len(rows) == 2  # seg1 not re-ingested


def test_export_warc_round_trip(spark, tmp_path):
    """export_warc (distributed, per-partition archives) → read_warc
    reproduces the exact (url, body) set; .gz uses per-record members."""
    import datetime

    from crawler_spark.sources.warc import export_warc, read_warc

    rows = [
        (f"https://site{i}.test/p{i}",
         datetime.datetime(2026, 1, 1, 12, 0, i),
         f"<html><body>doc {i}</body></html>".encode())
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")

    out = sorted(
        export_warc(df.repartition(3), str(tmp_path / "gz"), compress=True).collect()
    )
    assert sum(r.n_records for r in out) == 10
    assert all(r.path.endswith(".warc.gz") for r in out)
    assert 1 <= len(out) <= 3  # one file per non-empty partition

    back = read_warc(spark, str(tmp_path / "gz") + "/*.warc.gz")
    got = {(r.url, bytes(r.html)) for r in back.collect()}
    assert got == {(u, b) for u, _, b in rows}

    # uncompressed round trip too
    export_warc(df, str(tmp_path / "plain"), compress=False).collect()
    back2 = read_warc(spark, str(tmp_path / "plain") + "/*.warc")
    assert back2.count() == 10
    # timestamps survive the round trip (second precision)
    ts = {r.url: r.warc_ts for r in back2.collect()}
    assert ts["https://site3.test/p3"] == datetime.datetime(2026, 1, 1, 12, 0, 3)
