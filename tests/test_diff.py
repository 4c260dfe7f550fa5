"""Crawl snapshot diff: added/removed/changed/unchanged classification
between two docs views, plus the 4-row summary rollup."""


def test_crawl_diff_statuses_and_summary(spark):
    from crawler_spark.operators.diff import crawl_diff, crawl_diff_summary

    old = spark.createDataFrame(
        [("a", "same text"), ("b", "will change"), ("c", "will vanish")],
        "id string, body string",
    )
    new = spark.createDataFrame(
        [("a", "same text"), ("b", "changed text"), ("d", "brand new")],
        "id string, body string",
    )
    diff = crawl_diff(old, new)
    rows = {r["id"]: r for r in diff.collect()}
    assert rows["a"]["status"] == "unchanged"
    assert rows["b"]["status"] == "changed"
    assert rows["c"]["status"] == "removed" and rows["c"]["new_fp"] is None
    assert rows["d"]["status"] == "added" and rows["d"]["old_fp"] is None
    assert len(rows) == 4

    summary = {r["status"]: r["n"] for r in crawl_diff_summary(diff).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_crawl_diff_null_bodies_hash_stable(spark):
    from crawler_spark.operators.diff import crawl_diff

    old = spark.createDataFrame([("a", None)], "id string, body string")
    new = spark.createDataFrame([("a", None)], "id string, body string")
    assert crawl_diff(old, new).first()["status"] == "unchanged"
