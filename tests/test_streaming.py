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
