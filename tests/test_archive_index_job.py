"""jobs/build_archive_index.py e2e: a finished crawl state's docs view
becomes globally-sorted SURT-keyed CDX shards."""

import json
import os

import pytest


@pytest.fixture()
def job(spark, monkeypatch):
    import jobs.build_archive_index as job_mod

    monkeypatch.setattr(
        "pyspark.sql.SparkSession.builder",
        type("B", (), {"appName": lambda self, n: self,
                       "getOrCreate": lambda self: spark})(),
    )
    return job_mod


def test_archive_index_from_crawl_state(job, spark, tmp_path, crawl_config, pages_path, capsys):
    from crawler_spark.plans.crawl import SparkCrawler

    state = str(tmp_path / "state")
    res = SparkCrawler(
        spark, crawl_config, spark.read.parquet(pages_path), state, max_waves=30
    ).run()
    n_docs = res.docs.count()

    out = str(tmp_path / "cdx")
    assert job.main(["--state", state, "--out", out, "--shards", "3"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["records"] == n_docs

    files = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    keys = []
    for f in files:
        part = spark.read.parquet(os.path.join(out, f)).select("surt", "ts").collect()
        pk = [(r["surt"], r["ts"]) for r in part]
        assert pk == sorted(pk)
        keys.extend(pk)
    assert keys == sorted(keys) and len(keys) == n_docs
    # SURT form: reversed host labels before the ')' path separator
    one = spark.read.parquet(out).select("surt", "url").first()
    host = one["url"].split("/")[2].split(":")[0]
    assert one["surt"].split(")")[0].split(":")[0] == ",".join(reversed(host.split(".")))


def test_archive_index_empty_state(job, tmp_path, capsys):
    out = str(tmp_path / "cdx")
    assert job.main(["--state", str(tmp_path / "nostate"), "--out", out]) == 0
    assert json.loads(capsys.readouterr().out.strip())["records"] == 0
