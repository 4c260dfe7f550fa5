"""Freshness-driven revisit scheduling: estimate each URL's change rate
from its crawl history and derive the next-visit interval.

The classic incremental-crawler policy (Cho & Garcia-Molina, "Effective
Page Refresh Policies for Web Crawlers", TODS 2003): pages that changed
on most revisits get short intervals, static pages long ones. The
reference crawler re-crawls everything on a cron schedule
(cli/schedule.rb); at 100 TB a uniform recrawl wastes most of the fetch
budget, so this operator is the scale-path replacement — one window pass
over the (key, ts, fingerprint) history, all inside Catalyst.

Scale shape: a single shuffle on the key for the lag window, then a
map-side-combinable rollup on the same key (no second shuffle — the
window's partitioning is reused). History tables are append-only crawl
state; the content fingerprint is whatever the docs MERGE already stores
(sha256 of text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revisit_schedule(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    fp_col: str = "fp",
    base_interval_s: float = 86400.0,
    min_obs: int = 2,
) -> DataFrame:
    """Per-key change statistics and next-visit interval.

    ``change_rate`` = changed-revisit fraction over ``n_obs - 1``
    observation gaps; ``interval_s`` = ``base / (rate + 0.1)`` — a
    never-changing page gets 10x the base interval, an always-changing
    page ~0.9x. Keys with fewer than ``min_obs`` crawls are dropped (no
    gap to estimate from). The window orders by (ts, fingerprint) so the
    lag is total-ordered and engine-portable even with tied timestamps.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, fp_col)
    prev = F.lag(F.col(fp_col)).over(w)
    changed = (prev.isNotNull() & (F.col(fp_col) != prev)).cast("int")
    hist = df.select(
        F.col(key_col), F.col(ts_col), F.col(fp_col)
    ).withColumn("chg", changed)
    agg = (
        hist.groupBy(key_col)
        .agg(
            F.count("*").alias("n_obs"),
            F.sum("chg").alias("n_changes"),
            F.max(ts_col).alias("last_seen"),
        )
        .filter(F.col("n_obs") >= min_obs)
    )
    rate = F.round(F.col("n_changes") / (F.col("n_obs") - 1), 4)
    return agg.select(
        F.col(key_col),
        F.col("n_obs"),
        F.col("n_changes"),
        rate.alias("change_rate"),
        F.round(base_interval_s / (rate + 0.1), 4).alias("interval_s"),
        F.col("last_seen"),
    )
