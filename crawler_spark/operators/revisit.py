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
    base_interval_s: int = 86400,
    min_obs: int = 2,
) -> DataFrame:
    """Per-key change statistics and next-visit interval.

    ``change_rate_bp`` (BIGINT basis points, 0..10000) = changed-revisit
    fraction over ``n_obs - 1`` observation gaps; ``interval_s`` (BIGINT
    seconds) = ``base * 10000 DIV (change_rate_bp + 1000)`` — a
    never-changing page gets 10x the base interval, an always-changing
    page ~0.9x. Keys with fewer than ``min_obs`` crawls are dropped (no
    gap to estimate from). The window orders by (ts, fingerprint) so the
    lag is total-ordered and engine-portable even with tied timestamps.

    All outputs are integer fixed-point (no doubles): integer DIV is
    bit-identical across engines and partial-aggregation orders, so the
    schedule replays exactly in any oracle — the same discipline
    host_quality_filter / pagerank / kmeans follow.
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
    base = int(base_interval_s)
    rate_bp = "(n_changes * 10000) DIV (n_obs - 1)"
    return agg.select(
        F.col(key_col),
        F.col("n_obs"),
        F.col("n_changes").cast("long").alias("n_changes"),
        F.expr(rate_bp).alias("change_rate_bp"),
        F.expr(
            f"CAST({base} AS BIGINT) * 10000 DIV (({rate_bp}) + 1000)"
        ).alias("interval_s"),
        F.col("last_seen"),
    )


def due_for_revisit(
    parsed: DataFrame,
    base_interval_s: int = 86400,
    as_of=None,
    min_obs: int = 2,
) -> DataFrame:
    """URLs due for refresh, computed from the crawl's own parsed history
    (the multi-wave ``parsed`` state table): per-URL change statistics
    over the stored body fingerprints → ``next_visit = last_seen +
    interval`` → rows where ``next_visit <= as_of``.

    Feeds a targeted refresh crawl: seed the due list instead of
    re-crawling the whole corpus on a cron — at 10^10 URLs the refresh
    fetch budget tracks the corpus' actual change volume. ``as_of``
    defaults to the current timestamp; pass one explicitly for
    deterministic tests/backfills. ``not_modified`` observations (live
    304s — body is null, content unchanged by definition) are excluded:
    a page in a long 304 streak stays "due" and keeps being revalidated
    by cheap conditional requests, which is exactly the desired loop.
    Offline-304 reuse rows re-appear with the stored body, so they fold
    in naturally as non-changes.
    """
    hist = parsed.filter(
        F.col("kind").isin("html", "file")
    ).select(
        F.col("url_hash"),
        F.col("norm_url"),
        F.col("warc_ts"),
        F.sha2(F.coalesce(F.col("body"), F.lit("")), 256).alias("fp"),
    )
    sched = revisit_schedule(
        hist, key_col="url_hash", ts_col="warc_ts", fp_col="fp",
        base_interval_s=base_interval_s, min_obs=min_obs,
    )
    urls = hist.groupBy("url_hash").agg(F.max("norm_url").alias("norm_url"))
    as_of_col = (
        F.lit(as_of).cast("timestamp") if as_of is not None
        else F.current_timestamp()
    )
    return (
        sched.join(urls, "url_hash")
        .withColumn(
            "next_visit",
            F.timestamp_seconds(
                F.unix_timestamp(F.col("last_seen")) + F.col("interval_s")
            ),
        )
        .filter(F.col("next_visit") <= as_of_col)
        .select(
            "url_hash", "norm_url", "n_obs", "change_rate_bp",
            "interval_s", "last_seen", "next_visit",
        )
    )
