"""Crawl snapshot diff — what changed between two crawls of the same
space: the operational report a recurring crawl (schedule/recrawl/purge,
coordinator.rb's two-stage loop) is run FOR, computed corpus-side.

``crawl_diff(old, new)`` full-outer-joins two docs views on the doc id
and classifies every id:

* ``added``     — present only in the new crawl
* ``removed``   — present only in the old crawl (what purge tombstones)
* ``changed``   — present in both, content fingerprint differs
* ``unchanged`` — present in both, fingerprint equal

Scale shape: both sides prune to (id, fingerprint) AT THE SCAN (the
content hash is computed inside the projection — parquet never reads
the body column twice), the join keys on the id both state tables are
already bucketed by, and the summary rollup is a 4-row aggregate.
No windows, no sorts, one co-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "id",
    content_col: str = "body",
) -> DataFrame:
    """One row per doc id in either snapshot:
    ``(id, status, old_fp, new_fp)``."""
    o = old.select(
        F.col(id_col).alias("id"),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("old_fp"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("new_fp"),
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), "added")
        .when(F.col("new_fp").isNull(), "removed")
        .when(F.col("old_fp") == F.col("new_fp"), "unchanged")
        .otherwise("changed")
    )
    return j.select("id", status.alias("status"), "old_fp", "new_fp")


def crawl_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) rollup of :func:`crawl_diff` — the 4-row report line a
    scheduler logs per recrawl."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))
