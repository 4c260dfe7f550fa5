"""E2E: the distributed Spark crawl must match the single-threaded
reference-semantics simulator — identical URL-seen set (with depth +
source-type attribution), identical docs, byte-identical extracted text
vs. the corpus oracle column (the north-rule invariants)."""

import pytest

from crawler_spark.oracle.simulator import CrawlSimulator
from crawler_spark.plans.crawl import SparkCrawler


@pytest.fixture(scope="module")
def sim_result(corpus, crawl_config):
    rows, _ = corpus
    return CrawlSimulator(rows, crawl_config).run()


@pytest.fixture(scope="module")
def spark_result(spark, corpus, crawl_config, pages_path, tmp_path_factory):
    state = tmp_path_factory.mktemp("state")
    pages = spark.read.parquet(pages_path)
    crawler = SparkCrawler(spark, crawl_config, pages, str(state), max_waves=40)
    return crawler.run()


def test_seen_set_identical(sim_result, spark_result):
    spark_seen = {r["norm_url"]: r for r in spark_result.seen.collect()}
    sim_seen = sim_result.seen
    missing = set(sim_seen) - set(spark_seen)
    extra = set(spark_seen) - set(sim_seen)
    assert not missing, f"missing from spark seen: {sorted(missing)[:10]}"
    assert not extra, f"extra in spark seen: {sorted(extra)[:10]}"


def test_seen_depth_and_source_attribution(sim_result, spark_result):
    spark_seen = {r["norm_url"]: r for r in spark_result.seen.collect()}
    for url, rec in sim_result.seen.items():
        s = spark_seen[url]
        assert s["depth"] == rec["depth"], f"depth mismatch for {url}"
        assert s["source_type"] == rec["source_type"], f"source mismatch for {url}"


def test_seen_hashes_match(sim_result, spark_result):
    spark_hashes = {r["url_hash"] for r in spark_result.seen.collect()}
    assert spark_hashes == {rec["url_hash"] for rec in sim_result.seen.values()}


def test_admission_order_matches_fifo(sim_result, spark_result):
    """seq ordering must equal the single-thread FIFO admission order."""
    spark_order = [
        r["norm_url"] for r in spark_result.seen.orderBy("seq").collect()
    ]
    sim_order = [u for u, _ in sorted(sim_result.seen.items(), key=lambda kv: kv[1]["seq"])]
    assert spark_order == sim_order


def test_docs_identical(sim_result, spark_result):
    spark_docs = {r["id"]: r.asDict() for r in spark_result.docs.collect()}
    sim_docs = {d["id"]: d for d in sim_result.docs}
    assert set(spark_docs) == set(sim_docs)
    for did, sd in sim_docs.items():
        pd_ = spark_docs[did]
        for fld in ["title", "body", "meta_keywords", "meta_description",
                    "url", "url_scheme", "url_host", "url_path",
                    "url_path_dir1", "url_path_dir2", "url_path_dir3"]:
            assert pd_[fld] == sd.get(fld), f"{fld} mismatch for {sd['url']}"
        assert pd_["url_port"] == sd.get("url_port")
        assert list(pd_["links"] or []) == sd["links"]
        assert list(pd_["headings"] or []) == sd["headings"]


def test_byte_identical_text_vs_corpus(corpus, spark_result):
    """input_hint invariant: per-url extracted text == pages.text."""
    rows, _ = corpus
    expected = {}
    from crawler_spark.functions.urlnorm import try_normalize
    for r in rows:
        n, err = try_normalize(r["url"])
        if err is None:
            expected[n] = r["text"]
    checked = 0
    for doc in spark_result.docs.collect():
        if doc["url"] in expected and expected[doc["url"]]:
            assert (doc["body"] or "") == expected[doc["url"]], doc["url"]
            checked += 1
    assert checked > 50


def test_deny_reasons_present(spark_result):
    lineage = spark_result.lineage
    reasons = {
        r["deny_reason"]
        for r in lineage.filter("deny_reason is not null").select("deny_reason").distinct().collect()
    }
    for expect in [
        "incorrect_protocol", "link_too_long", "link_with_too_many_segments",
        "link_with_too_many_params", "domain_filter_denied",
        "robots_txt_disallowed", "rule_engine_denied",
    ]:
        assert expect in reasons, f"missing deny reason {expect}"


def test_never_followed_stays_uncrawled(sim_result, spark_result):
    """meta nofollow page's links must not be admitted (F12)."""
    seen_urls = {r["norm_url"] for r in spark_result.seen.collect()}
    assert not any(u.endswith("/never-followed") for u in seen_urls)
    assert not any(u.endswith("/nofollow-target") for u in seen_urls)


def test_noindex_not_in_docs(spark_result):
    urls = {r["url"] for r in spark_result.docs.collect()}
    assert not any(u.endswith("/noindex") for u in urls)
    # but its links WERE followed
    seen_urls = {r["norm_url"] for r in spark_result.seen.collect()}
    assert any(u.endswith("/from-noindex") for u in seen_urls)


def test_resume_from_checkpoint(spark, corpus, crawl_config, pages_path, tmp_path_factory):
    """Kill after K waves; resume must converge to the same seen set."""
    state = tmp_path_factory.mktemp("state_resume")
    pages = spark.read.parquet(pages_path)
    partial = SparkCrawler(spark, crawl_config, pages, str(state), max_waves=2).run()
    partial_count = partial.seen.count()
    resumed = SparkCrawler(
        spark, crawl_config, pages, str(state), max_waves=40, resume=True
    ).run()
    rows, _ = corpus
    sim = CrawlSimulator(rows, crawl_config).run()
    resumed_seen = {r["norm_url"] for r in resumed.seen.collect()}
    assert resumed_seen == set(sim.seen)
    assert partial_count < len(resumed_seen)


def test_binary_file_docs_and_unsupported(sim_result, spark_result):
    """E22: allowed-MIME downloads become base64 _attachment docs in BOTH
    engines; disallowed MIME types are crawled (seen) but produce no doc."""
    import base64

    spark_docs = {r["url"]: r.asDict() for r in spark_result.docs.collect()}
    pdfs = {u: d for u, d in spark_docs.items() if u.endswith("/file.pdf")}
    assert len(pdfs) >= 2  # one per host
    for url, d in pdfs.items():
        assert d["content_type"] == "application/pdf"
        assert d["file_name"] == "file.pdf"
        payload = base64.b64decode(d["_attachment"])
        assert payload.startswith(b"%PDF-1.4")
        assert d["content_length"] == len(payload)
        assert d["title"] is None and d["body"] is None
    # sim parity for the binary docs
    sim_pdf = {d["url"]: d for d in sim_result.docs if d["url"].endswith("/file.pdf")}
    assert set(sim_pdf) == set(pdfs)
    for url in pdfs:
        assert sim_pdf[url]["_attachment"] == pdfs[url]["_attachment"]
    # octet-stream: seen but never a doc
    spark_seen_urls = {r["norm_url"] for r in spark_result.seen.collect()}
    bins = {u for u in spark_seen_urls if u.endswith("/file.bin")}
    assert len(bins) >= 2
    assert not any(u.endswith("/file.bin") for u in spark_docs)


def test_extraction_rules_fields(sim_result, spark_result):
    """E19: the host0 redirect-family ruleset sets a constant and extracts
    paragraph text; fields land in extra_fields identically in both
    engines."""
    spark_docs = {r["url"]: r.asDict() for r in spark_result.docs.collect()}
    target = [u for u in spark_docs if u.endswith("site0.test/redirected-target")]
    assert target, "redirected-target doc missing"
    ef = spark_docs[target[0]]["extra_fields"] or {}
    assert ef.get("origin") == "redirect_family"
    assert ef.get("para_text") == "redirtarget0"
    # other hosts' same-path docs have no extraction fields
    other = [u for u in spark_docs if u.endswith("site1.test/redirected-target")]
    if other:
        ef1 = spark_docs[other[0]]["extra_fields"] or {}
        assert "origin" not in ef1


def test_lineage_off_perf_path_identical(
    spark, crawl_config, pages_path, sim_result, tmp_path_factory
):
    """The lineage-off admission path (collect-free in-plan rank, no
    wave-sized cache, n_adm from parquet footers) must admit the exact
    same seen set in the exact same FIFO seq order as the lineage-on path
    pinned above against the simulator."""
    import dataclasses

    state = tmp_path_factory.mktemp("state_nolineage")
    cfg = dataclasses.replace(crawl_config, lineage_enabled=False)
    pages = spark.read.parquet(pages_path)
    res = SparkCrawler(spark, cfg, pages, str(state), max_waves=40).run()
    got = {r["norm_url"]: r for r in res.seen.collect()}
    assert set(got) == set(sim_result.seen)
    for url, rec in sim_result.seen.items():
        assert got[url]["seq"] == rec["seq"], f"seq mismatch for {url}"
    # the lineage table must NOT have been written on the perf path
    assert res.lineage is None or res.lineage.rdd.isEmpty()


def test_prededup_discoveries_identical(
    spark, crawl_config, pages_path, tmp_path_factory
):
    """The JVM-side candidate pre-dedup (prededup_discoveries) must be
    invisible in the output: every seen/frontier row — including the FIFO
    winner's attribution columns (source_type, source_url, parent_seq,
    sub_order, depth) and the assigned seq — identical with the collapse
    on and off."""
    import dataclasses

    frames = {}
    for flag in (False, True):
        state = tmp_path_factory.mktemp(f"state_prededup_{flag}")
        cfg = dataclasses.replace(
            crawl_config, lineage_enabled=False, discovery_prededup=flag
        )
        pages = spark.read.parquet(pages_path)
        res = SparkCrawler(spark, cfg, pages, str(state), max_waves=40).run()
        frames[flag] = {
            r["norm_url"]: r.asDict() for r in res.seen.collect()
        }
    assert set(frames[False]) == set(frames[True])
    for url, base in frames[False].items():
        assert frames[True][url] == base, f"frontier row diverges for {url}"


def test_streaming_state_reconciles_with_batch(
    spark, crawl_config, spark_result, tmp_path_factory
):
    """The crawl's per-wave parsed snapshots drive Structured Streaming
    consumers whose results must reconcile exactly with the batch crawl:
    live metrics == batch parsed counts, and the foreachBatch incremental
    docs view == the batch merge-on-read docs view."""
    from pyspark.sql import functions as F

    from crawler_spark.streaming.crawl_stream import (
        docs_view, incremental_docs, live_fetch_metrics, parsed_stream,
    )

    state_dir = spark_result.store.root
    # live metrics: drain and compare with a batch aggregation
    q = (
        live_fetch_metrics(parsed_stream(spark, state_dir))
        .writeStream.format("memory")
        .queryName("crawl_metrics_t")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = {
        (r.kind, r.status, r.depth): r.n
        for r in spark.table("crawl_metrics_t").collect()
    }
    want = {
        (r.kind, r.status, r.depth): r.n
        for r in spark_result.store.read("parsed")
        .groupBy("kind", "status", "depth")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want

    # incremental docs: foreachBatch appends keyed by (id, wave); the
    # read-time view must equal the batch docs view
    out = str(tmp_path_factory.mktemp("stream_docs"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    q2 = incremental_docs(
        parsed_stream(spark, state_dir), crawl_config, out, ckpt
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()
    streamed = {r.id: r.url for r in docs_view(spark, out).collect()}
    batch = {r.id: r.url for r in spark_result.docs.collect()}
    assert streamed == batch
