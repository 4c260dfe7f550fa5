"""Iceberg migration map: the DDL is well-formed, and — the load-bearing
claim — bucketed state tables execute the per-wave seen anti-join with
NO shuffle of the seen table (storage-partitioned join). Spark's
built-in bucketed tables use the same physical mechanism as Iceberg's
bucket() transform with v2 bucketing enabled, so the plan-shape proof
runs in this container without the Iceberg runtime jar."""

import re

import pytest
from pyspark.sql import functions as F


def test_ddl_statements_are_bucketed_and_complete():
    from crawler_spark.state.iceberg import compact, ddl, iceberg_session_confs, merge_seen

    d = ddl(n_buckets=1024)
    assert set(d) == {"seen", "parsed", "frontier"}
    for name, sql in d.items():
        assert "USING iceberg" in sql
        assert re.search(r"bucket\(1024,\s*url_hash\)", sql), name
        assert "url_hash" in sql and "CREATE TABLE" in sql
    m = merge_seen()
    assert "MERGE INTO" in m and "t.url_hash = s.url_hash" in m
    assert "WHEN NOT MATCHED THEN INSERT" in m
    confs = iceberg_session_confs()
    assert confs["spark.sql.sources.v2.bucketing.enabled"] == "true"
    assert any("SparkCatalog" in v for v in confs.values())
    assert len(compact()) == 2


@pytest.fixture()
def bucketed_tables(spark, tmp_path_factory):
    """seen (large) and candidates (delta) as tables bucketed by
    url_hash into the same bucket count — the layout the Iceberg DDL
    declares via bucket(N, url_hash)."""
    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS cand_b")
    seen = spark.range(0, 20000).select(
        F.sha1(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("https://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("norm_url"),
    )
    cand = spark.range(15000, 25000).select(
        F.sha1(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("https://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("norm_url"),
    )
    seen.write.bucketBy(8, "url_hash").sortBy("url_hash").mode(
        "overwrite"
    ).saveAsTable("seen_b")
    cand.write.bucketBy(8, "url_hash").sortBy("url_hash").mode(
        "overwrite"
    ).saveAsTable("cand_b")
    yield "seen_b", "cand_b"
    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS cand_b")


def test_bucketed_seen_antijoin_has_no_exchange(spark, bucketed_tables):
    """The per-wave admission anti-join over co-bucketed tables runs
    with ZERO Exchange operators — neither the 10^10-row seen table nor
    the candidate delta shuffles. This is the plan Iceberg's
    bucket(N, url_hash) + storage-partitioned joins produces, and the
    evidence behind 'the per-wave seen-merge shuffle disappears'."""
    seen_t, cand_t = bucketed_tables
    # at 10^10 rows neither side is broadcastable — disable the broadcast
    # fallback so the plan shows the big-big strategy under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        new = spark.table(cand_t).join(
            spark.table(seen_t), on="url_hash", how="left_anti"
        )
        plan = new._sc._jvm.PythonSQLUtils.explainString(
            new._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        # and it is the correct anti-join: exactly the 5000 new rows
        assert new.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_baseline_does_shuffle(spark, bucketed_tables):
    """Control: the same join over plain (unbucketed) frames DOES
    exchange both sides — the shuffle the bucketed layout removes."""
    seen_t, cand_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        seen_plain = spark.table(seen_t).repartition(5)
        cand_plain = spark.table(cand_t).repartition(5)
        j = cand_plain.join(seen_plain, on="url_hash", how="left_anti")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "hashpartitioning(url_hash" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
