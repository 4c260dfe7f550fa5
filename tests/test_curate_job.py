"""jobs/curate_corpus.py e2e: raw documents (or a crawl state) in, packed
training sequences + mix report out, with the UT1 blocklist pre-stage."""

import json
import os

import pytest


@pytest.fixture()
def job(spark, monkeypatch):
    import jobs.curate_corpus as job_mod

    monkeypatch.setattr(
        "pyspark.sql.SparkSession.builder",
        type("B", (), {"appName": lambda self, n: self,
                       "getOrCreate": lambda self: spark})(),
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    return job_mod


def _write_docs(spark, path, n=40):
    rows = [
        {
            "doc_id": i,
            "text": f"clean document {i} with plenty of words the and of to "
                    f"a in is it for on that this are was " * 3,
            "url": (f"https://blocked.example/p/{i}" if i % 10 == 0
                    else f"https://site-{i % 3}.example/p/{i}"),
            "source": f"src{i % 2}",
            "lang": "en",
        }
        for i in range(n)
    ]
    spark.createDataFrame(rows).coalesce(2).write.mode("overwrite").parquet(path)


def test_curate_docs_with_blocklist_and_report(job, spark, tmp_path, capsys):
    docs = str(tmp_path / "docs.parquet")
    _write_docs(spark, docs)
    bl = tmp_path / "blocked.txt"
    bl.write_text("Blocked.example\n\nother.example\n")
    out = str(tmp_path / "packed")
    report = str(tmp_path / "report")

    assert job.main([
        "--docs", docs, "--out", out, "--report", report,
        "--blocklist", str(bl), "--budget", "64", "--shards", "4",
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert stats["input_docs"] == 40
    assert stats["blocked_by_url"] == 4  # doc_id % 10 == 0 hosts
    assert 0 < stats["packed_docs"] <= 36
    assert stats["packs"] >= 1

    packed = spark.read.parquet(out)
    assert {"doc_id", "shard", "pack_id", "offset_in_pack"} <= set(packed.columns)
    assert packed.count() == stats["packed_docs"]
    # blocked docs never reach packing
    assert packed.filter((packed.doc_id % 10) == 0).count() == 0
    # offsets respect the budget
    assert packed.filter("offset_in_pack >= 64").count() == 0

    rep = spark.read.parquet(report)
    assert {"source", "lang", "n_docs"} <= set(rep.columns)
    assert rep.count() == 2  # src0/src1, en only, blocked host pruned first


def test_curate_from_crawl_state(job, spark, tmp_path, capsys):
    """--state: a finished crawl's docs view feeds the same pipeline."""
    from crawler_spark.config import CrawlConfig
    from crawler_spark.fixtures.gen import generate_corpus, write_parquet
    from crawler_spark.plans.crawl import SparkCrawler

    rows, cfg = generate_corpus(n_hosts=1, pages_per_host=8)
    pages = str(tmp_path / "pages.parquet")
    write_parquet(rows, pages)
    state = str(tmp_path / "state")
    config = CrawlConfig(seed_urls=tuple(cfg["seed_urls"]),
                         lineage_enabled=False, purge_crawl_enabled=False)
    SparkCrawler(spark, config, spark.read.parquet(pages), state,
                 max_waves=10).run()

    out = str(tmp_path / "packed")
    assert job.main(["--state", state, "--out", out, "--min-quality", "0.0",
                     "--budget", "32", "--shards", "2"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] > 0
    assert stats["packed_docs"] > 0
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
