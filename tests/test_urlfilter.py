"""URL-level corpus filtering tests (RefinedWeb §3.1.1 / UT1 shape)."""


def _urls(spark):
    rows = [
        {"id": 1, "url": "https://www.BadSite.example/casino/poker"},
        {"id": 2, "url": "https://news.example.org/politics/article-1"},
        {"id": 3, "url": "http://badsite.example/about"},
        {"id": 4, "url": "https://blog.example.net/casino-reviews/casino"},
        {"id": 5, "url": "https://shop.example.com/products?q=poker+chips"},
    ]
    return spark.createDataFrame(rows)


def test_domain_blocklist_anti_join(spark):
    from crawler_spark.textops.urlfilter import apply_domain_blocklist

    bl = spark.createDataFrame([{"host": "BADSITE.example"}, {"host": "unused.tld"}])
    kept = apply_domain_blocklist(_urls(spark), bl).select("id")
    # www. + case folding: both badsite.example rows drop
    assert {r.id for r in kept.collect()} == {2, 4, 5}
    assert "__host" not in kept.columns


def test_domain_blocklist_audit_mode(spark):
    from crawler_spark.textops.urlfilter import apply_domain_blocklist

    bl = spark.createDataFrame([{"host": "badsite.example"}])
    flagged = apply_domain_blocklist(_urls(spark), bl, keep_blocked=True)
    got = {r.id: r.blocked for r in flagged.collect()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: False}


def test_url_word_score_and_threshold(spark):
    from crawler_spark.textops.urlfilter import url_word_score

    scored = url_word_score(
        _urls(spark), {"casino": 5, "poker": 3}, threshold=8
    ).select("id", "url_score", "url_banned")
    got = {r.id: (r.url_score, r.url_banned) for r in scored.collect()}
    assert got[1] == (8, True)  # casino + poker
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (10, True)  # casino twice
    assert got[5] == (3, False)  # poker once (case-folded, query string counts)


def test_word_score_is_shuffle_free(spark):
    from crawler_spark.textops.urlfilter import url_word_score

    plan = url_word_score(
        _urls(spark), {"casino": 5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
