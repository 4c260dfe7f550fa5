#!/usr/bin/env python
"""Attribute per-wave driver-gap seconds from a Spark event log.

The scaling criterion's serial floor is the time the driver spends with NO
job running — Catalyst planning, parquet commit protocol, catalog/DDL ops,
manifest/footer IO, py4j chatter. This tool makes that floor measurable
per wave instead of inferred from event-log archaeology (VERDICT r4 #4):

    gap(wave) = (t_end - t0) - union_of_job_intervals_within[t0, t_end]

Inputs: the crawl manifest (each wave checkpoint carries wall-clock ``t0``
/ ``t_end`` anchors) and the run's event log (``spark.eventLog.enabled``),
whose SparkListenerJobStart/JobEnd events carry ms-epoch timestamps on the
same clock (driver wall clock).

Usage: python scripts/driver_gap.py <event_log_file> <state_dir/manifest.json>
Library use: ``wave_gaps(jobs, manifest)`` → list of per-wave dicts.
"""

from __future__ import annotations

import json
import sys


def resolve_event_logs(evdir: str, app_id: str) -> list[str]:
    """Event-log files for an app — both the single-file layout and the
    Spark 4 rolling layout (``eventlog_v2_<appId>/events_N_<appId>``)."""
    import glob
    import os

    files = [
        p for p in glob.glob(os.path.join(evdir, app_id + "*"))
        if os.path.isfile(p)
    ]
    files += glob.glob(os.path.join(evdir, f"eventlog_v2_{app_id}", "events_*"))
    return sorted(files)


def parse_event_log(path: str) -> list[tuple[float, float]]:
    """[(submit_s, complete_s)] per finished job, epoch seconds."""
    starts: dict[int, float] = {}
    jobs: list[tuple[float, float]] = []
    with open(path, errors="replace") as f:
        for line in f:
            if '"SparkListenerJob' not in line:
                continue
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:  # truncated tail of a live log
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                starts[ev["Job ID"]] = ev["Submission Time"] / 1000.0
            elif ev.get("Event") == "SparkListenerJobEnd":
                t0 = starts.pop(ev["Job ID"], None)
                if t0 is not None:
                    jobs.append((t0, ev["Completion Time"] / 1000.0))
    return sorted(jobs)


def _busy_within(jobs: list[tuple[float, float]], lo: float, hi: float) -> float:
    """Length of the union of job intervals clipped to [lo, hi]."""
    busy, cur_lo, cur_hi = 0.0, None, None
    for a, b in jobs:
        a, b = max(a, lo), min(b, hi)
        if b <= a:
            continue
        if cur_hi is None or a > cur_hi:
            if cur_hi is not None:
                busy += cur_hi - cur_lo
            cur_lo, cur_hi = a, b
        else:
            cur_hi = max(cur_hi, b)
    if cur_hi is not None:
        busy += cur_hi - cur_lo
    return busy


def wave_gaps(jobs: list[tuple[float, float]], manifest: dict) -> list[dict]:
    out = []
    for w in manifest.get("waves", []):
        t0, t_end = w.get("t0"), w.get("t_end")
        if t0 is None or t_end is None:
            continue
        pre = w.get("pre_wave")
        if pre and pre.get("t0") is not None:
            busy = _busy_within(jobs, pre["t0"], t0)
            out.append({
                "wave": "pre", "elapsed_s": round(t0 - pre["t0"], 3),
                "busy_s": round(busy, 3),
                "gap_s": round(t0 - pre["t0"] - busy, 3),
            })
        busy = _busy_within(jobs, t0, t_end)
        out.append({
            "wave": w["wave"], "elapsed_s": round(t_end - t0, 3),
            "busy_s": round(busy, 3),
            "gap_s": round(t_end - t0 - busy, 3),
        })
    return out


def main() -> None:
    log_path, manifest_path = sys.argv[1], sys.argv[2]
    with open(manifest_path) as f:
        manifest = json.load(f)
    rows = wave_gaps(parse_event_log(log_path), manifest)
    total_gap = sum(r["gap_s"] for r in rows)
    print(json.dumps({"waves": rows, "total_gap_s": round(total_gap, 3)}, indent=1))


if __name__ == "__main__":
    main()
