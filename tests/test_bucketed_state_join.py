"""Bucketed state store contracts (state/store.py): the parquet stand-in
for Iceberg ``bucket(N, url_hash)``.

Pins the four claims the crawl loop depends on:
1. plan shape — the seen anti-join reads the table ``Bucketed: true``
   with NO Exchange on the seen side (only the candidate delta shuffles);
2. snapshot isolation — a DataFrame captured before an append does not
   see the appended wave (the old glob-read contract);
3. durability — a fresh session re-registers from the sidecar spec and
   keeps reading/appending; per-wave re-writes are idempotent; empty
   waves keep the wave-dir contract;
4. legacy fallback — a pre-bucketing state dir stays on the plain path.
"""

import os
import re

from pyspark.sql import functions as F

from crawler_spark.state.store import StateStore


def _mk(spark, tmp_path, **kw):
    return StateStore(spark, str(tmp_path / "state"), bucketed_tables=("seen",), **kw)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.sha1(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("https://x/"), F.col("id")).alias("norm_url"),
        F.lit(3).alias("depth"),
    )


def test_bucketed_antijoin_plan_shape_and_values(spark, tmp_path):
    st = _mk(spark, tmp_path, n_buckets=8)
    st.append("seen", _rows(spark, 0, 5000), 0)
    st.append("seen", _rows(spark, 5000, 7000), 1)
    seen = st.read("seen")
    assert seen.count() == 7000
    cand = spark.range(6500, 7500).select(
        F.sha1(F.col("id").cast("string")).alias("url_hash")
    )
    j = cand.join(seen.select("url_hash"), "url_hash", "left_anti")
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # exactly ONE exchange: the wave-sized candidate side; the seen
        # table side must plan exchange-free (the 10^10-row win)
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert j.count() == 500  # ids 7000..7499 are new
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_read_snapshot_isolation(spark, tmp_path):
    st = _mk(spark, tmp_path, n_buckets=4)
    st.append("seen", _rows(spark, 0, 100), 0)
    before = st.read("seen")  # captured BEFORE the next wave lands
    st.append("seen", _rows(spark, 100, 200), 1)
    assert before.count() == 100  # executes post-append, sees pre-append
    assert st.read("seen").count() == 200


def test_bucketed_resume_fresh_session_and_idempotent_rewrite(spark, tmp_path):
    st = _mk(spark, tmp_path, n_buckets=4)
    st.append("seen", _rows(spark, 0, 100), 0)
    st.append("seen", _rows(spark, 100, 150), 1)
    # simulate a fresh session: drop the catalog entry, keep the files
    spark.sql(f"DROP TABLE IF EXISTS {st._table_ident('seen')}")
    st2 = _mk(spark, tmp_path, n_buckets=4)
    assert st2.read("seen").count() == 150
    # resume re-runs wave 1 (idempotent slot overwrite, not duplication)
    st2.append("seen", _rows(spark, 100, 160), 1)
    assert st2.read("seen").count() == 160
    # wave column survives as an int (staleness comparisons)
    waves = {r.wave for r in st2.read("seen").select("wave").distinct().collect()}
    assert waves == {0, 1}


def test_bucketed_empty_wave_keeps_dir_contract(spark, tmp_path):
    st = _mk(spark, tmp_path, n_buckets=4)
    st.append("seen", _rows(spark, 0, 50), 0)
    empty = _rows(spark, 0, 50).filter(F.lit(False))
    path = st.append("seen", empty, 1)
    assert os.path.isdir(path)  # manifest paths must stay valid
    assert spark.read.parquet(path).count() == 0  # direct read works
    assert st.read("seen").count() == 50  # table read unaffected
    # a later re-run of the same slot with rows replaces the marker
    st.append("seen", _rows(spark, 50, 60), 1)
    assert st.read("seen").count() == 60


def test_legacy_plain_state_dir_stays_plain(spark, tmp_path):
    # a pre-bucketing state dir: plain per-wave parquet, no spec sidecar
    plain = StateStore(spark, str(tmp_path / "state"))
    plain.append("seen", _rows(spark, 0, 30), 0)
    st = _mk(spark, tmp_path, n_buckets=4)
    assert not st._is_bucketed("seen")  # resumes on the plain path
    assert st.read("seen").count() == 30
    p = st.append("seen", _rows(spark, 30, 40), 1)
    assert st.read("seen").count() == 40
    assert not os.path.exists(st._spec_path("seen"))
    assert os.path.isdir(p)


def test_append_counted_carries_write_counts(spark, tmp_path):
    """append_counted: the row count rides the write job as an observe
    metric (no footer read) for bucketed and plain tables alike; the
    AQE-elided empty write falls back to the (trivial) footer read."""
    st = _mk(spark, tmp_path, n_buckets=4)
    p, n = st.append_counted("seen", _rows(spark, 0, 123), 0)
    assert n == 123 and os.path.isdir(p)
    p, n = st.append_counted("seen", _rows(spark, 0, 50).filter(F.lit(False)), 1)
    assert n == 0 and os.path.isdir(p)
    plain = StateStore(spark, str(tmp_path / "plain"))
    p, n = plain.append_counted("metrics", _rows(spark, 0, 7), 0)
    assert n == 7
    p, n = plain.append_counted("metrics", _rows(spark, 0, 7).filter(F.lit(False)), 1)
    assert n == 0


def test_second_store_instance_same_session_reappends_safely(spark, tmp_path):
    """The session-scoped partition cache must stay conservative when a
    SECOND StateStore over the same root (same session, table already in
    the catalog) re-appends an existing wave: the drop still happens and
    the slot is replaced, not duplicated."""
    st = _mk(spark, tmp_path, n_buckets=4)
    st.append("seen", _rows(spark, 0, 100), 0)
    st.append("seen", _rows(spark, 100, 150), 1)
    st2 = _mk(spark, tmp_path, n_buckets=4)  # catalog entry already exists
    st2.append("seen", _rows(spark, 100, 170), 1)
    assert st2.read("seen").count() == 170
    assert st.read("seen").count() == 170
