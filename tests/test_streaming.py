"""Structured Streaming tests: drain the file-backed events stream with
availableNow and cross-check each streaming aggregate against its batch
twin computed on the same parquet."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_hourly_counts_match_batch(spark, batch_events):
    from crawler_spark.streaming.events import (
        hourly_event_counts, read_event_stream, run_to_memory,
    )

    stream = read_event_stream(spark, SF)
    run_to_memory(hourly_event_counts(stream), "hourly_t", "complete")
    got = {
        (r.hour, r.event_type): r.n
        for r in spark.table("hourly_t").collect()
    }
    want = {
        (r.hour, r.event_type): r.n
        for r in batch_events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_session_windows_match_batch_gap_semantics(spark, batch_events):
    from crawler_spark.streaming.events import (
        read_event_stream, run_to_memory, session_windows,
    )

    stream = read_event_stream(spark, SF)
    run_to_memory(session_windows(stream, gap="30 minutes"), "sess_t", "complete")
    got = spark.table("sess_t")
    # session invariants: positive counts, start <= end, no overlapping
    # sessions per user, and total events conserved
    rows = got.collect()
    assert sum(r.n_events for r in rows) == batch_events.count()
    per_user = {}
    for r in rows:
        assert r.n_events > 0 and r.session_start <= r.session_end
        per_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for user, spans in per_user.items():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2, f"overlapping sessions for user {user}"


def test_host_ledger_stateful(spark, batch_events):
    from crawler_spark.streaming.events import (
        host_fetch_ledger, read_event_stream, run_to_memory,
    )

    stream = read_event_stream(spark, SF)
    run_to_memory(host_fetch_ledger(stream), "ledger_t", "update")
    # update-mode memory sink keeps every emitted row; the LAST row per
    # host carries the final ledger state
    final = {}
    for r in spark.table("ledger_t").collect():
        final[r.host] = (r.n_fetches, r.last_ts)
    want = {
        r.user_id: (r.n, r.last_ts)
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
        .collect()
    }
    got_counts = {h: max_n for h, (max_n, _) in final.items()}
    # with maxFilesPerTrigger=1 and a single file, one batch: finals match
    assert got_counts == {h: n for h, (n, _) in want.items()}
    for h, (_, last) in want.items():
        assert final[h][1] == last


def test_host_ledger_timeout_eviction_branch():
    """The idle-timeout eviction path, unit-tested directly: a timed-out
    group removes its state and emits nothing (integration drains run with
    idle_timeout_ms=None — a processing-time timeout never lets a finite
    drain conclude)."""
    import pandas as pd

    from crawler_spark.streaming.events import make_host_ledger

    class FakeState:
        def __init__(self, timed_out, existing=None):
            self.hasTimedOut = timed_out
            self.exists = existing is not None
            self.get = existing
            self.removed = False
            self.updated = None
            self.timeout_ms = None

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    fn = make_host_ledger(3_600_000)
    # timed-out group: state removed, nothing emitted
    st = FakeState(timed_out=True, existing=(5, 1000))
    assert list(fn((7,), iter([]), st)) == []
    assert st.removed
    # live group: count accumulates, timeout re-armed
    st2 = FakeState(timed_out=False, existing=(2, 0))
    pdf = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01 00:00:05"])})
    out = list(fn((7,), iter([pdf]), st2))
    assert st2.updated[0] == 3 and st2.timeout_ms == 3_600_000
    assert out[0]["n_fetches"].iloc[0] == 3


def _stage_doc_files(spark, tmp_path):
    """Two parquet files staged with increasing mtimes so the file source
    (maxFilesPerTrigger=1) replays them as two ordered micro-batches."""
    import os
    import time

    stage = str(tmp_path / "doc_stream")
    os.makedirs(stage)
    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(4, "alpha text"), (5, "gamma text")], "doc_id long, text string"
    )
    for i, b in enumerate((b1, b2)):
        d = str(tmp_path / f"b{i}")
        b.coalesce(1).write.parquet(d)
        import glob
        import shutil

        src = glob.glob(os.path.join(d, "part-*.parquet"))[0]
        dst = os.path.join(stage, f"{i:05d}.parquet")
        shutil.copy(src, dst)
        t = time.time() + i  # strictly increasing mtimes
        os.utime(dst, (t, t))
    return stage


def _doc_stream(spark, stage):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )


def test_stream_exact_dedup_first_arrival_across_batches(spark, tmp_path):
    from crawler_spark.streaming.dedup_stream import stream_exact_dedup
    from crawler_spark.streaming.events import run_to_memory

    stage = _stage_doc_files(spark, tmp_path)
    run_to_memory(
        stream_exact_dedup(_doc_stream(spark, stage)), "dedup_t", "append"
    )
    rows = {r["doc_id"] for r in spark.sql("select * from dedup_t").collect()}
    # alpha kept once (batch-1 arrival), beta and gamma kept; 3 and 4 dropped
    assert rows == {1, 2, 5} or rows == {3, 2, 5}  # intra-batch tie either id
    assert 4 not in rows  # cross-batch duplicate suppressed by state


def test_stream_novelty_flags_running_counts(spark, tmp_path):
    from crawler_spark.streaming.dedup_stream import stream_novelty_flags
    from crawler_spark.streaming.events import run_to_memory

    stage = _stage_doc_files(spark, tmp_path)
    run_to_memory(
        stream_novelty_flags(_doc_stream(spark, stage)), "novel_t", "append"
    )
    out = {r["doc_id"]: r for r in spark.sql("select * from novel_t").collect()}
    assert len(out) == 5  # mark-don't-drop: every row emitted
    # batch 1: alpha arrives twice (ids 1,3 -> counts 1,2), beta once
    assert out[1]["novel"] is True and out[1]["dup_count"] == 1
    assert out[3]["novel"] is False and out[3]["dup_count"] == 2
    assert out[2]["novel"] is True
    # batch 2: alpha again -> state carried across batches (count 3)
    assert out[4]["novel"] is False and out[4]["dup_count"] == 3
    assert out[5]["novel"] is True and out[5]["dup_count"] == 1
