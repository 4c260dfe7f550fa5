"""Stage-level crawl behaviors: purge/re-crawl (S9/C4), max_duration (C2),
fetch-time redirect budget, already_seen vs too_many_unique_links lineage
attribution, and the per-URL event stream (C5)."""

import datetime as dt

import pytest

from crawler_spark.config import CrawlConfig
from crawler_spark.oracle.simulator import CrawlSimulator
from crawler_spark.plans.crawl import SparkCrawler

EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _rows(pages: dict) -> list[dict]:
    return [
        {
            "url": u,
            "warc_ts": EPOCH + dt.timedelta(seconds=i),
            "html": h.encode() if isinstance(h, str) else h,
            "text": "",
            "lang": "en",
        }
        for i, (u, h) in enumerate(sorted(pages.items()))
    ]


def _page(links):
    body = "".join(f'<a href="{h}">x</a>' for h in links)
    return f"<html><head><title>t</title></head><body>word {body}</body></html>"


def _write(spark, rows, path):
    from crawler_spark.fixtures.gen import write_parquet

    write_parquet(rows, path)
    return spark.read.parquet(path)


HOST = "https://p.test"


def test_purge_recrawl_tombstones(spark, tmp_path):
    """Crawl v1 {/, /a, /b, /c}; recrawl v2 where /b is gone and /c is
    unlinked-but-alive: the purge stage must tombstone /b (re-fetch fails)
    and retain /c (re-fetch succeeds), per coordinator.rb:96-115."""
    v1 = {
        f"{HOST}/": _page(["/a", "/b", "/c"]),
        f"{HOST}/a": _page([]),
        f"{HOST}/b": _page([]),
        f"{HOST}/c": _page([]),
    }
    v2 = {
        f"{HOST}/": _page(["/a"]),
        f"{HOST}/a": _page([]),
        f"{HOST}/c": _page([]),
    }
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",))
    state = str(tmp_path / "state")
    p1 = _write(spark, _rows(v1), str(tmp_path / "v1.parquet"))
    r1 = SparkCrawler(spark, cfg, p1, state, max_waves=10).run()
    assert {r["url"] for r in r1.docs.collect()} == {
        f"{HOST}/", f"{HOST}/a", f"{HOST}/b", f"{HOST}/c"}
    assert r1.outcome == ("purge", "success",
                          "Skipped purge crawl as no outdated documents were found.")

    p2 = _write(spark, _rows(v2), str(tmp_path / "v2.parquet"))
    r2 = SparkCrawler(spark, cfg, p2, state, max_waves=10, recrawl=True).run()
    docs = {r["url"] for r in r2.docs.collect()}
    assert docs == {f"{HOST}/", f"{HOST}/a", f"{HOST}/c"}
    from crawler_spark.functions.urlnorm import url_sha1

    assert {r["id"] for r in r2.purged.collect()} == {url_sha1(f"{HOST}/b")}
    assert r2.outcome == ("purge", "success", "Completed the purge crawl.")
    # re-crawl reset the seen set: only v2-reachable urls are seen
    assert {r["norm_url"] for r in r2.seen.collect()} == {f"{HOST}/", f"{HOST}/a"}


def test_purge_skipped_on_fresh_state(spark, tmp_path):
    v1 = {f"{HOST}/": _page([])}
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",))
    p1 = _write(spark, _rows(v1), str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=5).run()
    assert res.outcome[0] == "purge" and "Skipped" in res.outcome[2]
    assert res.purged is None


def test_max_duration_warning_outcome(spark, tmp_path):
    """C2: a wall-clock budget of ~0 stops the loop with a :warning outcome
    (coordinator.rb:290-302) while the wave-0 seed admission still lands."""
    v1 = {f"{HOST}/": _page(["/a"]), f"{HOST}/a": _page(["/b"]), f"{HOST}/b": _page([])}
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), max_duration_s=1e-6,
                      purge_crawl_enabled=False)
    p1 = _write(spark, _rows(v1), str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=10).run()
    assert res.outcome[0] == "primary" and res.outcome[1] == "warning"
    assert "taking too long" in res.outcome[2]
    assert res.seen.count() == 1  # seeds admitted, no wave ran


def test_redirect_chain_budget(spark, tmp_path):
    """A chain of max_redirects+2 distinct redirects must stop at the
    fetch-time budget (http_executor.rb:57-70) — engine ≡ simulator."""
    n = 13
    pages = {f"{HOST}/r{i}": f"<!--REDIRECT:/r{i + 1}-->" for i in range(n)}
    pages[f"{HOST}/r{n}"] = _page([])
    pages[f"{HOST}/"] = _page(["/r0"])
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), purge_crawl_enabled=False)
    rows = _rows(pages)
    p1 = _write(spark, rows, str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=30).run()
    sim = CrawlSimulator(rows, cfg).run()
    spark_seen = {r["norm_url"] for r in res.seen.collect()}
    assert spark_seen == set(sim.seen)
    # the chain was cut: the tail of the chain is never admitted
    assert f"{HOST}/r10" in spark_seen
    assert f"{HOST}/r12" not in spark_seen and f"{HOST}/r{n}" not in spark_seen
    # the final target never became a doc in either engine
    assert not any(d["url"].endswith(f"/r{n}") for d in sim.docs)
    assert res.docs.filter(f"url = '{HOST}/r{n}'").count() == 0


def test_seen_vs_budget_deny_split(spark, tmp_path):
    """F10/A3: with a budget smaller than the corpus, lineage must report
    both `already_seen` (dups of admitted urls) and `too_many_unique_links`
    (budget-capped), matching coordinator.rb:707-717 reasons."""
    # /p0#f is a SAME-batch dup of /p0 → silently batch-deduped, no event
    # in either engine. Each child page links /p0 again (cross-batch dup):
    # before the budget fills mid-wave-2 those are already_seen; at and
    # after the fill position the reference checks budget before seen, so
    # they flip to too_many_unique_links — the engine replays that exact
    # boundary via the last-admitted admission-order key.
    pages = {f"{HOST}/": _page(["/p0", "/p0#f"] + [f"/p{i}" for i in range(1, 8)])}
    for i in range(8):
        pages[f"{HOST}/p{i}"] = _page([f"/q{i}", "/p0"])
        pages[f"{HOST}/q{i}"] = _page([])
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), max_unique_url_count=12,
                      purge_crawl_enabled=False)
    rows = _rows(pages)
    p1 = _write(spark, rows, str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=10).run()
    sim = CrawlSimulator(rows, cfg).run()
    assert {r["norm_url"] for r in res.seen.collect()} == set(sim.seen)
    reasons = {
        r["deny_reason"]
        for r in res.lineage.filter("deny_reason is not null").collect()
    }
    assert "already_seen" in reasons
    assert "too_many_unique_links" in reasons
    assert "already_seen_or_budget" not in reasons
    # per-reason counts match the FIFO oracle
    sim_counts = {}
    for d in sim.denied:
        sim_counts[d["deny_reason"]] = sim_counts.get(d["deny_reason"], 0) + 1
    eng = res.lineage.filter("deny_reason is not null").groupBy("deny_reason").count()
    eng_counts = {r["deny_reason"]: r["count"] for r in eng.collect()}
    assert eng_counts.get("too_many_unique_links") == sim_counts.get("too_many_unique_links")
    assert eng_counts.get("already_seen") == sim_counts.get("already_seen")


def test_event_stream_reconciles(spark, tmp_path):
    """C5: url-fetch events == frontier fetches, url-seed == seen set,
    url-output == doc writes (event_generator.rb:135-246 actions)."""
    pages = {f"{HOST}/": _page(["/a", "/b", "/missing"]),
             f"{HOST}/a": _page(["/b"]), f"{HOST}/b": _page([])}
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), purge_crawl_enabled=False)
    rows = _rows(pages)
    p1 = _write(spark, rows, str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=10).run()
    sim = CrawlSimulator(rows, cfg).run()
    ev = res.events
    by_action = {r["action"]: r["count"]
                 for r in ev.groupBy("action").count().collect()}
    assert by_action["url-fetch"] == len(sim.fetches)
    assert by_action["url-seed"] == res.seen.count()
    assert by_action["url-output"] == len(sim.docs)
    # fetch outcomes: the /missing url is a failure event
    fails = {r["url"] for r in ev.filter(
        "action = 'url-fetch' and outcome != 'success'").collect()}
    assert f"{HOST}/missing" in fails
    # url-extracted: one per fetched result (coordinator.rb:380-407), the
    # 404 denied by the output gate with error_denied
    assert by_action["url-extracted"] == len(sim.fetches)
    xden = {r["url"]: r["deny_reason"] for r in ev.filter(
        "action = 'url-extracted' and outcome = 'denied'").collect()}
    assert xden == {f"{HOST}/missing": "error_denied"}
    # lifecycle events (event_generator.rb:54-99): one start, one seed,
    # one stage-end + one end carrying the final outcome
    assert by_action.get("crawl-start") == 1
    assert by_action.get("crawl-seed") == 1
    assert by_action.get("crawl-stage-end") == 1
    assert by_action.get("crawl-end") == 1
    end = ev.filter("action = 'crawl-end'").first()
    assert end["outcome"] == "success" and end["message"]


def test_charset_decode_golden(spark, tmp_path):
    """An ISO-8859-1 page behind the <!--CHARSET:...--> marker decodes to
    the right unicode text (http_utils/response.rb:123-135); an unknown
    label falls back to utf-8."""
    latin = "café au lait résumé"
    body = f"<html><head><title>L</title></head><body><p>{latin}</p></body></html>"
    pages = {f"{HOST}/": _page(["/l1", "/bad"])}
    rows = _rows(pages)
    rows.append({
        "url": f"{HOST}/l1",
        "warc_ts": EPOCH,
        "html": b"<!--CHARSET:iso-8859-1-->" + body.encode("iso-8859-1"),
        "text": latin, "lang": "fr",
    })
    rows.append({
        "url": f"{HOST}/bad",
        "warc_ts": EPOCH,
        "html": b"<!--CHARSET:no-such-enc-->" + body.encode("utf-8"),
        "text": latin, "lang": "fr",
    })
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), purge_crawl_enabled=False)
    from crawler_spark.fixtures.gen import write_parquet

    p = str(tmp_path / "v.parquet")
    write_parquet(rows, p)
    res = SparkCrawler(spark, cfg, spark.read.parquet(p),
                       str(tmp_path / "st"), max_waves=5).run()
    bodies = {r["url"]: r["body"] for r in res.docs.collect()}
    assert bodies[f"{HOST}/l1"] == latin
    assert bodies[f"{HOST}/bad"] == latin  # utf-8 fallback
    sim = CrawlSimulator(rows, cfg).run()
    sim_bodies = {d["url"]: d["body"] for d in sim.docs}
    assert sim_bodies[f"{HOST}/l1"] == latin


def test_robots_dimension_mode_matches_dict_mode(spark, corpus, crawl_config,
                                                 pages_path, tmp_path):
    """10^8-host path: robots rules as a DataFrame dimension joined by
    host_key (threshold forced to 0) must reproduce the driver-dict crawl
    exactly — same seen set, same robots denials, no robots broadcast."""
    import dataclasses

    cfg = dataclasses.replace(crawl_config, robots_dimension_threshold=0,
                              purge_crawl_enabled=False)
    pages = spark.read.parquet(pages_path)
    crawler = SparkCrawler(spark, cfg, pages, str(tmp_path / "st"), max_waves=40)
    res = crawler.run()
    assert crawler.robots_bc is None and crawler.robots_dim is not None
    rows, _ = corpus
    sim = CrawlSimulator(rows, crawl_config).run()
    assert {r["norm_url"] for r in res.seen.collect()} == set(sim.seen)
    reasons = {r["deny_reason"] for r in
               res.lineage.filter("deny_reason is not null").collect()}
    assert "robots_txt_disallowed" in reasons and "rule_engine_denied" in reasons
    # politeness delay column still populated from the dimension
    assert res.seen.filter("crawl_delay_ms > 0").count() > 0


def test_queue_full_strict_compat(spark, tmp_path):
    """Strict-compat queue cap (memory_only.rb:37-49, coordinator.rb:631-644):
    overflow admissions deny `queue_full`, are NOT marked seen, and get
    re-discovered (and admitted) in a later wave."""
    # root links p0..p5; each p_i links back to /p5 so the dropped tail is
    # re-discoverable after the queue drains
    pages = {f"{HOST}/": _page([f"/p{i}" for i in range(6)])}
    for i in range(6):
        pages[f"{HOST}/p{i}"] = _page(["/p5"])
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), url_queue_size_limit=3,
                      purge_crawl_enabled=False)
    rows = _rows(pages)
    p1 = _write(spark, rows, str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=10).run()
    lin = res.lineage
    qf = {r["norm_url"] for r in lin.filter("deny_reason = 'queue_full'").collect()}
    # wave 1 admits p0,p1,p2 (cap 3), drops p3,p4,p5 as queue_full
    assert qf == {f"{HOST}/p3", f"{HOST}/p4", f"{HOST}/p5"}
    seen = {r["norm_url"] for r in res.seen.collect()}
    # /p5 is re-discovered from p0..p2's links in wave 2 and admitted then
    assert f"{HOST}/p5" in seen
    assert f"{HOST}/p3" not in seen and f"{HOST}/p4" not in seen


def test_full_html_extraction_opt_in(spark, tmp_path):
    """full_html_extraction_enabled (config.rb:65,208 ->
    document_mapper.rb:76): docs carry the page's full HTML only when the
    flag is on; the field is absent otherwise."""
    pages = {
        f"{HOST}/": _page(["/a"]),
        f"{HOST}/a": _page([]),
    }
    rows = _rows(pages)
    pdf = _write(spark, rows, str(tmp_path / "pages.parquet"))

    on = CrawlConfig(seed_urls=(f"{HOST}/",), full_html_extraction_enabled=True)
    res = SparkCrawler(spark, on, pdf, str(tmp_path / "s1"), max_waves=10).run()
    docs = {r.url: r for r in res.docs.collect()}
    assert set(docs) == set(pages)
    for u, h in pages.items():
        assert docs[u].full_html == h

    off = CrawlConfig(seed_urls=(f"{HOST}/",))
    res2 = SparkCrawler(spark, off, pdf, str(tmp_path / "s2"), max_waves=10).run()
    assert "full_html" not in res2.docs.columns


def _parquet_files(root):
    import glob

    return glob.glob(f"{root}/**/*.parquet", recursive=True)


def test_compact_state_preserves_views(spark, tmp_path):
    """Table maintenance: compact_state() bin-packs seen/parsed and folds
    MERGE history without changing the docs view, the seen set, or the
    manifest's frontier_pending path (resume stays valid)."""
    v1 = {
        f"{HOST}/": _page(["/a"]),
        f"{HOST}/a": _page(["/b"]),
        f"{HOST}/b": _page(["/c"]),
        f"{HOST}/c": _page([]),
    }
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), purge_crawl_enabled=False)
    state = str(tmp_path / "state")
    p1 = _write(spark, _rows(v1), str(tmp_path / "v.parquet"))
    crawler = SparkCrawler(spark, cfg, p1, state, max_waves=10)
    res = crawler.run()
    docs_before = sorted(map(tuple, res.docs.collect()))
    seen_before = sorted(r["norm_url"] for r in res.seen.collect())
    lineage_before = res.lineage.count()
    events_before = res.events.count()
    files_before = len(_parquet_files(state))
    pend = crawler.store.read_manifest()["frontier_pending"]
    pend_before = spark.read.parquet(pend).count()

    crawler.compact_state()

    assert sorted(map(tuple, res.docs.collect())) == docs_before
    assert sorted(r["norm_url"] for r in res.seen.collect()) == seen_before
    assert res.lineage.count() == lineage_before
    assert res.events.count() == events_before
    files_after = len(_parquet_files(state))
    assert files_after < files_before
    # at most one bin-packed file per seen wave dir
    import glob as g

    for d in g.glob(f"{state}/seen/wave=*"):
        assert len(_parquet_files(d)) <= 1
    # resume contract: the pending-frontier path stays readable as before
    assert spark.read.parquet(pend).count() == pend_before


def test_compact_state_keeps_doc_for_noindex_recrawl(spark, tmp_path):
    """A page whose recrawl turned noindex keeps its older doc row
    (MERGE-without-delete): compaction must retain BOTH the latest row
    (staleness bookkeeping) and the latest doc-eligible row per id."""
    noindex = ('<html><head><meta name="robots" content="noindex">'
               "</head><body>gone</body></html>")
    v1 = {f"{HOST}/": _page(["/a"]), f"{HOST}/a": _page([])}
    v2 = {f"{HOST}/": _page(["/a"]), f"{HOST}/a": noindex}
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), purge_crawl_enabled=False)
    state = str(tmp_path / "state")
    p1 = _write(spark, _rows(v1), str(tmp_path / "v1.parquet"))
    SparkCrawler(spark, cfg, p1, state, max_waves=10).run()
    p2 = _write(spark, _rows(v2), str(tmp_path / "v2.parquet"))
    crawler2 = SparkCrawler(spark, cfg, p2, state, max_waves=10, recrawl=True)
    res2 = crawler2.run()
    docs_before = sorted(map(tuple, res2.docs.collect()))
    assert f"{HOST}/a" in {r["url"] for r in res2.docs.collect()}

    crawler2.compact_state()

    assert sorted(map(tuple, res2.docs.collect())) == docs_before
    # parsed kept two rows for /a: the noindex recrawl + the v1 doc row
    from crawler_spark.functions.urlnorm import url_sha1

    a_rows = (crawler2.store.read("parsed")
              .filter(f"url_hash = '{url_sha1(f'{HOST}/a')}'").collect())
    assert len(a_rows) == 2


def test_max_response_size_cap(spark, tmp_path):
    """A page over max_response_size becomes an Error result — no parse,
    no links followed, output gate denies (response.rb:166-171
    ResponseTooLarge; api/config.rb max_response_size). Engine ≡ simulator."""
    huge = _page(["/hidden"]) + "<!-- pad -->" * 500  # > 1 KB cap below
    pages = {f"{HOST}/": _page(["/big", "/ok"]),
             f"{HOST}/big": huge,
             f"{HOST}/ok": _page([]),
             f"{HOST}/hidden": _page([])}
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), max_response_size=1024,
                      purge_crawl_enabled=False)
    rows = _rows(pages)
    p1 = _write(spark, rows, str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=10).run()
    sim = CrawlSimulator(rows, cfg).run()

    docs = {r["url"] for r in res.docs.collect()}
    assert docs == {d["url"] for d in sim.docs} == {f"{HOST}/", f"{HOST}/ok"}
    # /big was fetched (seen) but errored: no doc, /hidden never discovered
    seen = {r["norm_url"] for r in res.seen.collect()}
    assert f"{HOST}/big" in seen and f"{HOST}/hidden" not in seen
    ev = res.events.filter(f"url = '{HOST}/big'")
    assert {r["action"]: r["outcome"] for r in ev.collect()} == {
        "url-seed": "allowed", "url-fetch": "failure", "url-extracted": "denied"}
    assert ev.filter("action = 'url-extracted'").first()["deny_reason"] == "error_denied"


def test_ghost_host_all_404_crawl(spark, tmp_path):
    """Seeds pointing at a host absent from the corpus: every fetch is a
    404 Error result — the crawl terminates cleanly after wave 1 with the
    seed seen, zero docs, zero discoveries, and the purge stage skipped."""
    pages = {f"{HOST}/real": _page([])}  # corpus has only an unrelated host
    cfg = CrawlConfig(seed_urls=("https://ghost.test/",))
    p1 = _write(spark, _rows(pages), str(tmp_path / "v.parquet"))
    res = SparkCrawler(spark, cfg, p1, str(tmp_path / "st"), max_waves=5).run()
    assert {r["norm_url"] for r in res.seen.collect()} == {"https://ghost.test/"}
    assert res.docs.count() == 0
    assert res.outcome[1] == "success"
    fetch = res.events.filter("action = 'url-fetch'").collect()
    assert len(fetch) == 1 and fetch[0]["status"] == 404


def test_malformed_seed_raises_before_spark(spark, tmp_path):
    """A malformed seed fails fast at config normalization
    (InvalidURLError), before any Spark job runs — the validator CLI path
    reports the same error."""
    from crawler_spark.functions.urlnorm import InvalidURLError

    cfg = CrawlConfig(seed_urls=("nonsense^^^",))
    with pytest.raises(InvalidURLError):
        cfg.normalized_seeds()


def test_revisit_schedule_change_rates(spark):
    """Cho/Garcia-Molina revisit policy: static page -> 10x base interval,
    always-changing page -> ~0.9x; single-crawl keys dropped."""
    import datetime as dt

    from crawler_spark.operators.revisit import revisit_schedule

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # static: 3 crawls, same fingerprint
        ("u/static", t(0), "aaa"), ("u/static", t(10), "aaa"),
        ("u/static", t(20), "aaa"),
        # churner: changes every crawl
        ("u/churn", t(0), "v1"), ("u/churn", t(10), "v2"),
        ("u/churn", t(20), "v3"),
        # half: one change over two gaps
        ("u/half", t(0), "x"), ("u/half", t(10), "x"), ("u/half", t(20), "y"),
        # singleton: dropped
        ("u/once", t(0), "z"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, fp string")
    out = {r.url: r for r in revisit_schedule(df, base_interval_s=100).collect()}

    assert set(out) == {"u/static", "u/churn", "u/half"}
    assert out["u/static"].change_rate_bp == 0
    assert out["u/static"].interval_s == 1000  # 100*10000 DIV 1000
    assert out["u/churn"].change_rate_bp == 10000
    assert out["u/churn"].interval_s == 90  # 100*10000 DIV 11000
    assert out["u/half"].change_rate_bp == 5000
    assert out["u/half"].n_obs == 3 and out["u/half"].n_changes == 1
    assert out["u/half"].last_seen == t(20)


def test_reuse_unchanged_pages_skips_parse(spark, tmp_path):
    """reuse_unchanged_pages (the offline 304): on a recrawl, a page whose
    corpus warc_ts did not change is NOT re-parsed — its stored extraction
    is reused verbatim (proven by mutating the html under an unchanged
    ts: the doc keeps the OLD body) — while a bumped ts re-parses."""
    ts0 = EPOCH
    ts1 = EPOCH + dt.timedelta(days=1)

    def rows(body_a, body_b, ts_b):
        return [
            {"url": f"{HOST}/", "warc_ts": ts0,
             "html": _page(["/a", "/b"]).encode(), "text": "", "lang": "en"},
            {"url": f"{HOST}/a", "warc_ts": ts0,
             "html": body_a.encode(), "text": "", "lang": "en"},
            {"url": f"{HOST}/b", "warc_ts": ts_b,
             "html": body_b.encode(), "text": "", "lang": "en"},
        ]

    mk = lambda txt: (f"<html><head><title>t</title></head>"
                      f"<body>{txt}</body></html>")
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",), reuse_unchanged_pages=True)
    state = str(tmp_path / "state")
    p1 = _write(spark, rows(mk("original a"), mk("original b"), ts0),
                str(tmp_path / "v1.parquet"))
    r1 = SparkCrawler(spark, cfg, p1, state, max_waves=10).run()
    assert {r["url"]: r["body"] for r in r1.docs.collect()} == {
        f"{HOST}/": "word x x",
        f"{HOST}/a": "original a",
        f"{HOST}/b": "original b",
    }

    # v2: /a mutated WITHOUT a ts bump (must be treated as unchanged and
    # NOT re-parsed); /b mutated WITH a ts bump (must re-parse)
    p2 = _write(spark, rows(mk("mutated a"), mk("mutated b"), ts1),
                str(tmp_path / "v2.parquet"))
    r2 = SparkCrawler(spark, cfg, p2, state, max_waves=10, recrawl=True).run()
    docs = {r["url"]: r["body"] for r in r2.docs.collect()}
    assert docs[f"{HOST}/a"] == "original a"  # reused, parse skipped
    assert docs[f"{HOST}/b"] == "mutated b"   # ts bumped -> re-parsed
    assert docs[f"{HOST}/"] == "word x x"
    # nothing tombstoned: reused rows count as refreshed in purge
    assert r2.purged is None or r2.purged.count() == 0


def test_due_for_revisit_from_parsed_history(spark):
    """due_for_revisit over a parsed-history-shaped frame: the churner
    gets a short interval (due soon), the static page a 10x one (not yet
    due at a near horizon, due at a far one)."""
    from crawler_spark.operators.revisit import due_for_revisit

    def row(h, url, ts_s, body, kind="html"):
        return (h, url, EPOCH + dt.timedelta(seconds=ts_s), body, kind)

    rows = [
        # static: same body at t=0, 100, 200
        row("h1", f"{HOST}/static", 0, "same"),
        row("h1", f"{HOST}/static", 100, "same"),
        row("h1", f"{HOST}/static", 200, "same"),
        # churner: different body each time
        row("h2", f"{HOST}/churn", 0, "v1"),
        row("h2", f"{HOST}/churn", 100, "v2"),
        row("h2", f"{HOST}/churn", 200, "v3"),
        # a live-304 observation must NOT register as a change
        row("h1", f"{HOST}/static", 250, None, kind="not_modified"),
        # non-doc rows ignored
        row("h3", f"{HOST}/err", 0, None, kind="error"),
    ]
    parsed = spark.createDataFrame(
        rows, "url_hash string, norm_url string, warc_ts timestamp, "
              "body string, kind string")

    base = 100  # static interval -> 1000s, churner -> 90s
    near = EPOCH + dt.timedelta(seconds=600)
    due_near = {r.url_hash: r for r in
                due_for_revisit(parsed, base_interval_s=base, as_of=near).collect()}
    assert set(due_near) == {"h2"}  # churner due, static not
    assert due_near["h2"].change_rate_bp == 10000
    assert due_near["h2"].norm_url == f"{HOST}/churn"

    far = EPOCH + dt.timedelta(seconds=5000)
    due_far = {r.url_hash for r in
               due_for_revisit(parsed, base_interval_s=base, as_of=far).collect()}
    assert due_far == {"h1", "h2"}  # everyone due eventually; h3 never (1 obs)


def test_refresh_due_job_on_real_state(spark, tmp_path, capsys):
    """jobs/refresh_due.py over a real crawl's state dir: far horizon →
    every doc-producing URL is due; near horizon → none (single crawl =
    1 observation, below min_obs)."""
    import json as _json

    import jobs.refresh_due as job

    v = {f"{HOST}/": _page(["/a"]), f"{HOST}/a": _page([])}
    p = _write(spark, _rows(v), str(tmp_path / "v.parquet"))
    cfg = CrawlConfig(seed_urls=(f"{HOST}/",))
    state = str(tmp_path / "state")
    SparkCrawler(spark, cfg, p, state, max_waves=5).run()
    # second observation so change rates are estimable
    SparkCrawler(spark, cfg, p, state, max_waves=5, recrawl=True).run()

    out = str(tmp_path / "due.parquet")
    rc = job.main(["--state", state, "--base-interval", "100",
                   "--as-of", "2030-01-01T00:00:00", "--out", out,
                   "--print-seeds"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert f"{HOST}/" in printed and f"{HOST}/a" in printed
    summary = _json.loads(printed.strip().splitlines()[-1])
    assert summary["due"] == 2
    due = spark.read.parquet(out)
    assert {r.norm_url for r in due.collect()} == {f"{HOST}/", f"{HOST}/a"}
    # static pages (no change between the two crawls) got the 10x interval
    assert all(r.change_rate_bp == 0 and r.interval_s == 1000
               for r in due.collect())

    rc = job.main(["--state", state, "--base-interval", "100000000",
                   "--as-of", "2030-01-01T00:00:00"])
    assert rc == 0
    assert _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["due"] == 0


def test_rank_hosts_job_end_to_end(spark, tmp_path, capsys):
    """jobs/rank_hosts.py over a real crawl's state dir: the linked-to
    host outranks the linking host, and the emitted dimension joins back
    into a priority-dispatched crawl."""
    import json as _json

    import jobs.rank_hosts as job

    h1, h2 = "https://r1.test", "https://r2.test"
    v = {
        f"{h1}/": _page([f"{h2}/", "/a"]),
        f"{h1}/a": _page([f"{h2}/"]),
        f"{h2}/": _page([]),
    }
    p = _write(spark, _rows(v), str(tmp_path / "v.parquet"))
    cfg = CrawlConfig(seed_urls=(f"{h1}/", f"{h2}/"),
                      purge_crawl_enabled=False)
    state = str(tmp_path / "state")
    SparkCrawler(spark, cfg, p, state, max_waves=5).run()

    out = str(tmp_path / "host_rank.parquet")
    rc = job.main(["--state", state, "--out", out])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["hosts"] == 2
    dim = {r["host_key"]: r["rank"]
           for r in spark.read.parquet(out).collect()}
    # r2 is linked-to (from r1's pages); r1 has no in-links
    assert dim["https://r2.test:443"] > dim["https://r1.test:443"]
    assert "http://r2.test:80" in dim  # both scheme variants emitted

    # the dimension drives a prioritized crawl on a fresh state
    cfg2 = CrawlConfig(
        seed_urls=(f"{h1}/", f"{h2}/"),
        politeness_window_s=1.0, default_crawl_delay_s=1.0,
        priority_dimension_path=out,
        frontier_priority_expr="coalesce(rank, 0)",
        purge_crawl_enabled=False,
    )
    res = SparkCrawler(spark, cfg2, p, str(tmp_path / "state2"),
                       max_waves=20).run()
    assert {r["norm_url"] for r in res.seen.collect()} == set(v)


def test_html_backend_auto_matches_builtin_byte_identical(spark, tmp_path):
    """html_backend='auto' installs the fastest importable C parser into
    the DOM seam at executor startup (or degrades to the built-in one
    when none is present — this container has no lxml, which exercises
    exactly the degradation path). Whatever backend ends up in charge,
    the crawl's docs must be byte-identical to the builtin run over the
    generated fixture corpus — the qualification contract for enabling
    the flag in production."""
    from crawler_spark.fixtures.gen import generate_corpus, write_parquet

    rows, gen_cfg = generate_corpus(n_hosts=1, pages_per_host=12)
    p = str(tmp_path / "pages.parquet")
    write_parquet(rows, p)
    results = {}
    for backend in ("builtin", "auto"):
        cfg = CrawlConfig(
            seed_urls=tuple(gen_cfg["seed_urls"]),
            sitemap_urls=tuple(gen_cfg["sitemap_urls"]),
            crawl_rules=gen_cfg["crawl_rules"],
            html_backend=backend,
            lineage_enabled=False,
        )
        res = SparkCrawler(
            spark, cfg, spark.read.parquet(p),
            str(tmp_path / f"st_{backend}"), max_waves=10,
        ).run()
        results[backend] = sorted(
            (r["url"], r["title"], r["body"], tuple(r["links"] or ()),
             tuple(r["headings"] or ()))
            for r in res.docs.collect()
        )
    assert results["auto"] == results["builtin"]
    assert len(results["builtin"]) > 5
