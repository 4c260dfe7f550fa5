"""Unit tests for the temporal relational operators (as-of join, range
bucket join, multi-grain rollup), the KMV distinct sketch, and the
leakage-safe corpus split."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# asof_join

def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            # (event_id, ts, key, payload)
            (10, dt.datetime(2024, 1, 1, 10, 0), "u1", 1.0),
            (11, dt.datetime(2024, 1, 1, 12, 0), "u1", 2.0),
            (12, dt.datetime(2024, 1, 1, 9, 0), "u2", 3.0),
        ],
        "event_id long, ts timestamp, key string, payload double",
    )
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 9, 30), "u1", 100.0),
            (2, dt.datetime(2024, 1, 1, 11, 0), "u1", 200.0),
            (3, dt.datetime(2024, 1, 1, 13, 0), "u1", 300.0),  # after all
            (4, dt.datetime(2024, 1, 1, 9, 30), "u2", 400.0),  # after u2's
        ],
        "event_id long, ts timestamp, key string, value double",
    )
    return left, right


def test_asof_join_most_recent_strictly_before(spark):
    from crawler_spark.operators.temporal import asof_join

    left, right = _asof_fixture(spark)
    out = asof_join(left, right, "key", ("ts", "event_id"), ("value",))
    rows = {r.event_id: r for r in out.collect()}
    assert len(rows) == 3  # every left row survives
    assert rows[10].asof_value == 100.0  # 9:30 is the latest before 10:00
    assert rows[11].asof_value == 200.0  # 11:00 beats 9:30; 13:00 is later
    assert rows[12].asof_value is None  # no u2 right row before 9:00
    # left payload carried through untouched
    assert rows[11].payload == 2.0


def test_asof_join_tie_total_order_and_multi_value(spark):
    from crawler_spark.operators.temporal import asof_join

    ts = dt.datetime(2024, 6, 1, 12, 0)
    left = spark.createDataFrame(
        [(5, ts, "k")], "event_id long, ts timestamp, key string"
    )
    # right rows share the left row's ts: the (ts, event_id) total order
    # decides — id 4 < 5 counts as "before", id 6 > 5 does not
    right = spark.createDataFrame(
        [(4, ts, "k", 40.0, "a"), (6, ts, "k", 60.0, "b")],
        "event_id long, ts timestamp, key string, value double, tag string",
    )
    out = asof_join(
        left, right, "key", ("ts", "event_id"), ("value", "tag")
    ).collect()[0]
    assert out.asof_value == 40.0 and out.asof_tag == "a"


def test_asof_join_preserves_colliding_left_column(spark):
    """ADVICE r3: a left column named like a value_col must survive —
    only the prefixed asof_ column is added."""
    from crawler_spark.operators.temporal import asof_join

    ts = dt.datetime(2024, 6, 1)
    left = spark.createDataFrame(
        [(1, ts + dt.timedelta(hours=2), "k", 7.0)],
        "event_id long, ts timestamp, key string, value double",
    )
    right = spark.createDataFrame(
        [(0, ts, "k", 99.0)],
        "event_id long, ts timestamp, key string, value double",
    )
    out = asof_join(left, right, "key", ("ts", "event_id"), ("value",))
    row = out.collect()[0]
    assert row.value == 7.0          # left payload untouched
    assert row.asof_value == 99.0    # right value under the prefix
    assert out.columns.count("value") == 1


def test_asof_join_null_value_semantics(spark):
    """skip_null_values=True carries the last NON-NULL value forward;
    False reports the most recent ROW's value even when NULL — while
    'no earlier row at all' stays NULL in both modes."""
    from crawler_spark.operators.temporal import asof_join

    ts = dt.datetime(2024, 6, 1)
    left = spark.createDataFrame(
        [(10, ts + dt.timedelta(hours=3), "k"),
         (11, ts - dt.timedelta(hours=1), "k")],
        "event_id long, ts timestamp, key string",
    )
    right = spark.createDataFrame(
        [(0, ts, "k", 5.0), (1, ts + dt.timedelta(hours=1), "k", None)],
        "event_id long, ts timestamp, key string, value double",
    )
    locf = {r.event_id: r.asof_value for r in asof_join(
        left, right, "key", ("ts", "event_id"), ("value",)).collect()}
    strict = {r.event_id: r.asof_value for r in asof_join(
        left, right, "key", ("ts", "event_id"), ("value",),
        skip_null_values=False).collect()}
    assert locf[10] == 5.0       # NULL row skipped, older value carried
    assert strict[10] is None    # most recent row's value IS NULL
    assert locf[11] is None and strict[11] is None  # no earlier row


# ---------------------------------------------------------------------------
# range_bucket_join

def test_range_bucket_join_boundaries_and_cross_bucket(spark):
    from crawler_spark.operators.temporal import range_bucket_join

    d = dt.date
    intervals = spark.createDataFrame(
        [(1, d(2024, 1, 10), d(2024, 1, 17))],  # [10th, 17th)
        "iv_id long, start date, end date",
    )
    points = spark.createDataFrame(
        [
            (100, d(2024, 1, 10)),  # == start: included
            (101, d(2024, 1, 16)),  # inside, likely next week-bucket
            (102, d(2024, 1, 17)),  # == end: excluded
            (103, d(2024, 1, 9)),   # before: excluded
        ],
        "pt_id long, p date",
    )
    out = range_bucket_join(
        intervals, points,
        start_col="start", end_col="end", point_col="p",
        bucket_width_expr="7 days",
        point_bucket_expr="datediff(p, DATE'1970-01-01') DIV 7",
        start_bucket_expr="datediff(start, DATE'1970-01-01') DIV 7",
    )
    got = sorted(r.pt_id for r in out.collect())
    assert got == [100, 101]


def test_range_bucket_join_matches_naive_join(spark):
    from crawler_spark.operators.temporal import range_bucket_join

    base = dt.date(2024, 3, 1)
    intervals = spark.createDataFrame(
        [(i, base + dt.timedelta(days=3 * i), base + dt.timedelta(days=3 * i + 7))
         for i in range(15)],
        "iv_id long, start date, end date",
    )
    points = spark.createDataFrame(
        [(j, base + dt.timedelta(days=j % 50)) for j in range(120)],
        "pt_id long, p date",
    )
    fast = range_bucket_join(
        intervals, points,
        start_col="start", end_col="end", point_col="p",
        bucket_width_expr="7 days",
        point_bucket_expr="datediff(p, DATE'1970-01-01') DIV 7",
        start_bucket_expr="datediff(start, DATE'1970-01-01') DIV 7",
    )
    naive = intervals.join(
        points, (F.col("p") >= F.col("start")) & (F.col("p") < F.col("end"))
    )
    fast_set = {(r.iv_id, r.pt_id) for r in fast.collect()}
    naive_set = {(r.iv_id, r.pt_id) for r in naive.collect()}
    assert fast_set == naive_set and fast_set


def test_range_bucket_join_negative_domain(spark):
    """ADVICE r3 adjudication: pre-1970 dates make the datediff axis
    negative; BOTH floor(x/w) and truncate-toward-zero DIV keep the
    two-bucket covering invariant there (truncation only WIDENS bucket 0
    to 2w-1, never narrows a bucket below w — exhaustively checked in
    the operator docstring's contract). Pinned against the naive
    theta-join on an epoch-spanning domain for both idioms."""
    from crawler_spark.operators.temporal import range_bucket_join

    base = dt.date(1969, 11, 1)  # spans the 1970 epoch going forward
    intervals = spark.createDataFrame(
        [(i, base + dt.timedelta(days=5 * i), base + dt.timedelta(days=5 * i + 6))
         for i in range(25)],
        "iv_id long, start date, end date",
    )
    points = spark.createDataFrame(
        [(j, base + dt.timedelta(days=j)) for j in range(130)],
        "pt_id long, p date",
    )
    kw = dict(start_col="start", end_col="end", point_col="p",
              bucket_width_expr="7 days")
    floored = range_bucket_join(
        intervals, points,
        point_bucket_expr="CAST(floor(datediff(p, DATE'1970-01-01') / 7) AS BIGINT)",
        start_bucket_expr="CAST(floor(datediff(start, DATE'1970-01-01') / 7) AS BIGINT)",
        **kw,
    )
    naive = intervals.join(
        points, (F.col("p") >= F.col("start")) & (F.col("p") < F.col("end"))
    )
    naive_set = {(r.iv_id, r.pt_id) for r in naive.collect()}
    assert {(r.iv_id, r.pt_id) for r in floored.collect()} == naive_set
    truncated = range_bucket_join(
        intervals, points,
        point_bucket_expr="datediff(p, DATE'1970-01-01') DIV 7",
        start_bucket_expr="datediff(start, DATE'1970-01-01') DIV 7",
        **kw,
    )
    assert {(r.iv_id, r.pt_id) for r in truncated.collect()} == naive_set


# ---------------------------------------------------------------------------
# time_rollup

def test_time_rollup_grains_match_manual_groupbys(spark):
    from crawler_spark.operators.temporal import time_rollup

    ev = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 5), 1),
            ("a", dt.datetime(2024, 1, 1, 9), 2),
            ("a", dt.datetime(2024, 1, 2, 5), 4),
            ("a", dt.datetime(2024, 2, 1, 5), 8),
            ("b", dt.datetime(2024, 1, 15, 5), 16),
        ],
        "k string, ts timestamp, v long",
    )
    out = time_rollup(
        ev, "ts", "k",
        [F.count("*").cast("long").alias("n"), F.sum("v").alias("sv")],
        grains=("day", "month"),
    )
    rows = {(r.k, r.grain, r.bucket_ts): (r.n, r.sv) for r in out.collect()}
    # day grain
    assert rows[("a", "day", dt.datetime(2024, 1, 1))] == (2, 3)
    assert rows[("a", "day", dt.datetime(2024, 1, 2))] == (1, 4)
    assert rows[("a", "day", dt.datetime(2024, 2, 1))] == (1, 8)
    # month grain aggregates the days
    assert rows[("a", "month", dt.datetime(2024, 1, 1))] == (3, 7)
    assert rows[("a", "month", dt.datetime(2024, 2, 1))] == (1, 8)
    assert rows[("b", "month", dt.datetime(2024, 1, 1))] == (1, 16)
    # row count = day buckets + month buckets, nothing else
    assert len(rows) == 4 + 3


# ---------------------------------------------------------------------------
# kmv_distinct

def test_kmv_small_group_is_exact(spark):
    from crawler_spark.textops.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("g", f"tok{i % 10}") for i in range(100)], "grp string, e string"
    )
    row = kmv_distinct(df, "grp", "e", k=64).collect()[0]
    assert row.k_used == 10
    assert row.est_distinct == 10 == row.exact_distinct


def test_kmv_estimate_within_tolerance_and_deterministic(spark):
    from crawler_spark.textops.sketches import kmv_distinct

    n = 3000
    df = spark.createDataFrame(
        [(f"g{i % 2}", f"elem-{i}") for i in range(n)], "grp string, e string"
    )
    out = {r.grp: r for r in kmv_distinct(df, "grp", "e", k=64).collect()}
    for g, exact in (("g0", n // 2), ("g1", n // 2)):
        r = out[g]
        assert r.exact_distinct == exact
        # KMV stderr ~ 1/sqrt(k-1) ~ 12.6%; allow 4 sigma
        assert abs(r.est_distinct - exact) < exact * 0.5
    # bit-identical on re-run and under repartitioning
    again = {
        r.grp: r
        for r in kmv_distinct(df.repartition(7), "grp", "e", k=64).collect()
    }
    for g in out:
        assert out[g].est_distinct == again[g].est_distinct
        assert out[g].kth_h == again[g].kth_h


def test_kmv_hash_sql_matches_spark_conv(spark):
    import duckdb

    from crawler_spark.textops.sketches import kmv_hash_sql

    words = ["alpha", "beta", "gamma", "δelta", ""]
    spark_vals = [
        r.h
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select(
            F.expr(
                "CAST(conv(substring(md5(w), 1, 13), 16, 10) AS BIGINT)"
            ).alias("h")
        )
        .collect()
    ]
    duck_vals = [
        duckdb.sql(f"SELECT {kmv_hash_sql(repr(w))} AS h").fetchone()[0]
        for w in words
    ]
    assert spark_vals == duck_vals


# ---------------------------------------------------------------------------
# leakage_safe_split

def test_leakage_safe_split_stable_and_unit_atomic(spark):
    from crawler_spark.textops.corpusfilter import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"host{i % 25}", 100 + i) for i in range(200)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.unit: r for r in leakage_safe_split(docs).collect()}
    assert len(out) == 25
    for r in out.values():
        assert 0 <= r.bucket < 100
        assert r.split == (
            "train" if r.bucket < 80 else "val" if r.bucket < 90 else "test"
        )
        assert r.n_docs == 8
    # growing the corpus never reassigns an existing unit
    bigger = docs.union(
        spark.createDataFrame(
            [(1000 + i, f"host{i % 25}", 7) for i in range(50)],
            "doc_id long, source string, n_chars long",
        )
    )
    out2 = {r.unit: r for r in leakage_safe_split(bigger).collect()}
    for u, r in out.items():
        assert out2[u].split == r.split and out2[u].bucket == r.bucket
    # doc counts grew, proving the units absorbed the new docs in place
    assert all(out2[u].n_docs == 10 for u in out)


def test_leakage_safe_split_proportions_roughly_hold(spark):
    from crawler_spark.textops.corpusfilter import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"site-{i}", 1) for i in range(2000)],
        "doc_id long, source string, n_chars long",
    )
    counts = {
        r.split: r.n
        for r in leakage_safe_split(docs)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts["train"] == pytest.approx(1600, rel=0.1)
    assert counts["val"] == pytest.approx(200, rel=0.35)
    assert counts["test"] == pytest.approx(200, rel=0.35)


def test_asof_join_matches_naive_argmax_on_random_data(spark):
    """Seeded randomized differential test: the union-tag window as-of
    join must equal the naive (quadratic) definition — for each left
    row, the right row with the greatest (ts, event_id) strictly below
    the left's (ts, event_id) within the key — on data with duplicate
    timestamps, keys with no right rows, and keys with no left rows."""
    import random

    from crawler_spark.operators.temporal import asof_join

    rng = random.Random(1234)
    base = dt.datetime(2024, 5, 1)
    # duplicate-heavy timestamps: only 40 distinct seconds over 300 rows
    left = [
        (i, base + dt.timedelta(seconds=rng.randrange(40)), f"k{rng.randrange(12)}")
        for i in range(0, 300, 2)
    ]
    right = [
        (i, base + dt.timedelta(seconds=rng.randrange(40)),
         f"k{rng.randrange(14)}", float(i))
        for i in range(1, 300, 2)
    ]
    ldf = spark.createDataFrame(left, "event_id long, ts timestamp, key string")
    rdf = spark.createDataFrame(
        right, "event_id long, ts timestamp, key string, value double"
    )
    out = {
        r.event_id: r.asof_value
        for r in asof_join(ldf, rdf, "key", ("ts", "event_id"), ("value",)).collect()
    }
    assert len(out) == len(left)
    rights_by_key = {}
    for rid, rts, rk, rv in right:
        rights_by_key.setdefault(rk, []).append((rts, rid, rv))
    for lid, lts, lk in left:
        before = [
            (rts, rid, rv)
            for rts, rid, rv in rights_by_key.get(lk, [])
            if (rts, rid) < (lts, lid)
        ]
        expect = max(before)[2] if before else None
        assert out[lid] == expect, (lid, lk, lts)
