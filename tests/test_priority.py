"""Frontier priority scheduling — the north-rule grouped priority queue
with a configurable order beyond FIFO (operators/politeness.py
priority_order). Default ("" expr) stays byte-identical to the reference's
BFS order, which tests/test_crawl_e2e.py pins; these tests pin the
priority mode: quota spent highest-priority-first, deterministic FIFO
tie-break, and set-convergence (priority only reorders fetches, it never
changes the crawl's final seen/docs sets when budgets are unbounded).
"""

import datetime as dt

from pyspark.sql import functions as F

from crawler_spark.config import CrawlConfig
from crawler_spark.operators.politeness import dispatch, dispatch_schedule
from crawler_spark.plans.crawl import SparkCrawler

EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

_FRONTIER_SCHEMA = (
    "host_key string, norm_url string, url_hash string, depth int, "
    "seq long, crawl_delay_ms long"
)


def _frontier(spark, urls, delay_ms=1000):
    rows = [
        ("https://h.test", u, f"h{i}", 0, i, delay_ms)
        for i, u in enumerate(urls)
    ]
    return spark.createDataFrame(rows, _FRONTIER_SCHEMA)


def test_dispatch_priority_spends_quota_on_top_urls(spark):
    # window 2s / delay 1s -> quota 2 per host
    urls = ["https://h.test/long-long", "https://h.test/a",
            "https://h.test/medium", "https://h.test/b"]
    f = _frontier(spark, urls)

    fifo = dispatch(f, window_s=2.0)
    assert {r["norm_url"] for r in fifo.filter("ready").collect()} == set(urls[:2])

    prio = dispatch(f, window_s=2.0, priority_expr="-length(norm_url)")
    ready = prio.filter("ready").orderBy("dispatch_slot").collect()
    # the two shortest urls win the quota; FIFO (seq) breaks the /a-/b tie
    assert [r["norm_url"] for r in ready] == [
        "https://h.test/a", "https://h.test/b"]
    # quota semantics unchanged: same number dispatched either way
    assert prio.filter("ready").count() == fifo.filter("ready").count()


def test_dispatch_priority_tiebreak_is_fifo(spark):
    # equal priority everywhere -> identical to pure FIFO
    urls = [f"https://h.test/{c}" for c in "abcd"]
    f = _frontier(spark, urls)
    fifo = dispatch(f, window_s=3.0).filter("ready")
    prio = dispatch(f, window_s=3.0, priority_expr="7").filter("ready")
    key = lambda rows: sorted((r["norm_url"], r["dispatch_slot"]) for r in rows)
    assert key(prio.collect()) == key(fifo.collect())


def test_dispatch_schedule_priority_slots(spark):
    # live-path timeline: slot 0 goes to the highest-priority url
    urls = ["https://h.test/zzzz", "https://h.test/y", "https://h.test/xx"]
    f = _frontier(spark, urls, delay_ms=2000)
    sched = dispatch_schedule(f, window_s=4.0, priority_expr="-length(norm_url)")
    rows = sorted(sched.collect(), key=lambda r: r["slot_s"])
    assert [r["norm_url"] for r in rows] == [
        "https://h.test/y", "https://h.test/xx", "https://h.test/zzzz"]
    assert [r["slot_s"] for r in rows] == [0.0, 2.0, 4.0]
    assert [r["batch_idx"] for r in rows] == [0, 0, 1]


def _pages(host, links_by_path):
    def page(links):
        body = "".join(f'<a href="{h}">x</a>' for h in links)
        return f"<html><head><title>t</title></head><body>w {body}</body></html>"

    return {f"{host}{p}": page(ls) for p, ls in links_by_path.items()}


def test_priority_crawl_converges_to_fifo_seen_set(spark, tmp_path):
    """Priority mode reorders WHICH url a host's quota fetches each wave;
    with unbounded budgets the converged seen/docs sets must equal FIFO's."""
    from crawler_spark.fixtures.gen import write_parquet

    host = "https://prio.test"
    pages = _pages(host, {
        "/": ["/bbbb", "/a", "/ccc"],
        "/bbbb": ["/dd"],
        "/a": ["/e-e-e-e"],
        "/ccc": [],
        "/dd": [],
        "/e-e-e-e": [],
    })
    rows = [
        {"url": u, "warc_ts": EPOCH + dt.timedelta(seconds=i),
         "html": h.encode(), "text": "", "lang": "en"}
        for i, (u, h) in enumerate(sorted(pages.items()))
    ]
    path = str(tmp_path / "pages.parquet")
    write_parquet(rows, path)
    corpus = spark.read.parquet(path)

    def run(expr, state):
        cfg = CrawlConfig(
            seed_urls=(f"{host}/",),
            politeness_window_s=1.0,
            default_crawl_delay_s=1.0,  # quota 1 per host per wave
            frontier_priority_expr=expr,
            purge_crawl_enabled=False,
        )
        return SparkCrawler(spark, cfg, corpus, str(tmp_path / state),
                            max_waves=20).run()

    fifo = run("", "st_fifo")
    prio = run("-length(norm_url)", "st_prio")
    seen = lambda res: {r["norm_url"] for r in res.seen.collect()}
    docs = lambda res: {r["url"] for r in res.docs.collect()}
    assert seen(prio) == seen(fifo) == set(pages)
    assert docs(prio) == docs(fifo) == set(pages)


def test_priority_dimension_join_feeds_expression(spark, tmp_path):
    """The full loop: pagerank a link graph, store it as a priority
    dimension, crawl with an expression mixing the stored host rank with
    a URL feature — the crawl runs and converges to the same sets."""
    from crawler_spark.fixtures.gen import write_parquet
    from crawler_spark.operators.linkrank import pagerank

    host = "https://dim.test"
    pages = _pages(host, {
        "/": ["/aa", "/b"], "/aa": ["/c"], "/b": [], "/c": [],
    })
    rows = [
        {"url": u, "warc_ts": EPOCH + dt.timedelta(seconds=i),
         "html": h.encode(), "text": "", "lang": "en"}
        for i, (u, h) in enumerate(sorted(pages.items()))
    ]
    corpus_path = str(tmp_path / "pages.parquet")
    write_parquet(rows, corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # host-level rank from a toy cross-host graph, stored as the dimension
    edges = spark.createDataFrame(
        [("other.test", "dim.test"), ("third.test", "dim.test")],
        "src string, dst string")
    dim_path = str(tmp_path / "prio_dim.parquet")
    (pagerank(edges, iterations=2)
     # frontier host_key format is scheme://host:port (urlnorm.url_host_key)
     .select(F.concat(F.lit("https://"), F.col("node"), F.lit(":443"))
             .alias("host_key"), "rank")
     .write.parquet(dim_path))
    dim = spark.read.parquet(dim_path)
    assert dim.filter("host_key = 'https://dim.test:443'").count() == 1

    cfg = CrawlConfig(
        seed_urls=(f"{host}/",),
        politeness_window_s=1.0,
        default_crawl_delay_s=1.0,
        frontier_priority_expr="coalesce(rank, 0) * 1000 - length(norm_url)",
        priority_dimension_path=dim_path,
        priority_dimension_key="host_key",
        purge_crawl_enabled=False,
    )
    res = SparkCrawler(spark, cfg, corpus, str(tmp_path / "st"),
                       max_waves=20).run()
    assert {r["norm_url"] for r in res.seen.collect()} == set(pages)
    assert {r["url"] for r in res.docs.collect()} == set(pages)
    # frontier cols survive the dimension join (deferred re-entered clean)
    assert "rank" not in res.seen.columns


def test_priority_dimension_url_keyed(spark, tmp_path):
    """URL-keyed dimension: per-URL scores reorder WITHIN a host (the
    general case — host-keyed scores are constant inside the window)."""
    from crawler_spark.fixtures.gen import write_parquet
    from crawler_spark.functions.urlnorm import url_sha1

    host = "https://udim.test"
    pages = _pages(host, {"/": ["/x", "/y", "/z"], "/x": [], "/y": [], "/z": []})
    rows = [
        {"url": u, "warc_ts": EPOCH + dt.timedelta(seconds=i),
         "html": h.encode(), "text": "", "lang": "en"}
        for i, (u, h) in enumerate(sorted(pages.items()))
    ]
    corpus_path = str(tmp_path / "pages.parquet")
    write_parquet(rows, corpus_path)

    dim_path = str(tmp_path / "url_dim.parquet")
    spark.createDataFrame(
        [(url_sha1(f"{host}/y"), 10), (url_sha1(f"{host}/x"), 1)],
        "url_hash string, score long",
    ).write.parquet(dim_path)

    cfg = CrawlConfig(
        seed_urls=(f"{host}/",),
        politeness_window_s=1.0,
        default_crawl_delay_s=1.0,
        frontier_priority_expr="coalesce(score, 0)",
        priority_dimension_path=dim_path,
        priority_dimension_key="url_hash",
        purge_crawl_enabled=False,
    )
    res = SparkCrawler(spark, cfg, spark.read.parquet(corpus_path),
                       str(tmp_path / "st"), max_waves=20).run()
    assert {r["norm_url"] for r in res.seen.collect()} == set(pages)
    assert {r["url"] for r in res.docs.collect()} == set(pages)
