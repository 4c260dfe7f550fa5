"""scripts/driver_gap.py — per-wave driver-gap attribution from a Spark
event log joined against the crawl manifest's wall-clock anchors. Pure
interval arithmetic, testable without a session."""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.driver_gap import _busy_within, parse_event_log, wave_gaps


def test_busy_union_clips_and_merges():
    jobs = [(0.0, 2.0), (1.0, 3.0), (5.0, 6.0)]  # overlap + gap
    assert _busy_within(jobs, 0.0, 10.0) == 4.0  # [0,3] ∪ [5,6]
    assert _busy_within(jobs, 2.5, 5.5) == 1.0  # clipped halves
    assert _busy_within(jobs, 3.0, 5.0) == 0.0  # pure gap window
    assert _busy_within([], 0.0, 1.0) == 0.0


def test_wave_gaps_attribution():
    jobs = [(100.0, 104.0), (106.0, 110.0), (112.0, 113.0)]
    manifest = {
        "waves": [
            {"wave": 1, "t0": 100.0, "t_end": 111.0,
             "pre_wave": {"t0": 95.0}},
            {"wave": 2, "t0": 111.0, "t_end": 114.0},
        ]
    }
    rows = wave_gaps(jobs, manifest)
    by = {r["wave"]: r for r in rows}
    assert by["pre"]["elapsed_s"] == 5.0 and by["pre"]["busy_s"] == 0.0
    assert by[1]["busy_s"] == 8.0 and by[1]["gap_s"] == 3.0
    assert by[2]["busy_s"] == 1.0 and by[2]["gap_s"] == 2.0


def test_parse_event_log_pairs_jobs(tmp_path):
    log = tmp_path / "events"
    lines = [
        {"Event": "SparkListenerJobStart", "Job ID": 0, "Submission Time": 1000},
        {"Event": "SparkListenerJobStart", "Job ID": 1, "Submission Time": 1500},
        {"Event": "SparkListenerJobEnd", "Job ID": 0, "Completion Time": 2000},
        {"Event": "SparkListenerOther"},
        {"Event": "SparkListenerJobEnd", "Job ID": 1, "Completion Time": 2500},
        {"Event": "SparkListenerJobEnd", "Job ID": 9, "Completion Time": 9999},  # unmatched
    ]
    log.write_text("\n".join(json.dumps(x) for x in lines) + "\n{truncated")
    jobs = parse_event_log(str(log))
    assert jobs == [(1.0, 2.0), (1.5, 2.5)]
