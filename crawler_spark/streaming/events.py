"""Structured Streaming over the events stream (SURVEY §1.2 notes the
reference itself is batch-iterative; streaming enters for the pipeline's
operational telemetry — crawl metrics, fetch-event feeds — and as the
streaming twin of the batch sessionize/window aggregations).

Patterns covered, each with a batch-equivalent the tests cross-check
against (run with ``trigger(availableNow=True)`` so a file-backed stream
drains deterministically):

* tumbling-window aggregation with a watermark (late-data bound)
* built-in session windows (``F.session_window``)
* a custom stateful operator via ``applyInPandasWithState`` — the
  streaming form of the per-host politeness ledger: running fetch totals +
  last-seen timestamp per host with idle-timeout state eviction.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema must be explicit —
    streaming sources do not infer; and the source path must be a
    DIRECTORY, so the single-file table is staged via symlink)."""
    import os
    import tempfile

    stage = os.path.join(
        tempfile.gettempdir(), "crawler_spark_event_stream", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "part-00000.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with a late-data watermark.
    Batch twin: the ``sessionize_hourly`` entry (date_trunc groupBy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("hour"), "event_type", "n")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based), built-in session_window op."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("user_id"),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


HOST_STATE_SCHEMA = StructType(
    [StructField("n_fetches", LongType()), StructField("last_ts_us", LongType())]
)
HOST_OUT_SCHEMA = StructType(
    [
        StructField("host", LongType()),
        StructField("n_fetches", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def make_host_ledger(idle_timeout_ms: int | None):
    """Build the per-host ledger function: cumulative fetch count + latest
    event ts. The streaming form of the politeness scheduler's per-host
    bookkeeping (reference keeps this in coordinator-process memory; here
    it is checkpointed operator state that survives restarts)."""

    def _host_ledger(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, last_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            batch_max = pdf["ts"].max()
            last_us = max(last_us, int(pd.Timestamp(batch_max).value // 1000))
        state.update((n, last_us))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)  # evict idle hosts
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_fetches": [n],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return _host_ledger


def host_fetch_ledger(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """applyInPandasWithState custom stateful operator over host groups.

    ``idle_timeout_ms``: evict a host's ledger entry after that much
    processing-time silence — use on continuous production streams to
    bound state size. Leave ``None`` for deterministic drains of a finite
    backlog: with a processing-time timeout registered, the engine keeps
    scheduling "cleaning up state" micro-batches against the timeout
    horizon, so neither ``availableNow`` nor ``processAllAvailable`` can
    ever conclude the stream is exhausted."""
    return events.groupBy(F.col("user_id")).applyInPandasWithState(
        make_host_ledger(idle_timeout_ms),
        outputStructType=HOST_OUT_SCHEMA,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a file-backed stream deterministically into an in-memory table;
    returns the StreamingQuery after completion.

    ``processAllAvailable() + stop()`` rather than ``availableNow`` +
    ``awaitTermination()``: a stateful operator with a processing-time
    timeout keeps scheduling "no new data but cleaning up state"
    micro-batches under availableNow (the timeout horizon never empties),
    so the trigger never self-terminates. processAllAvailable blocks
    exactly until every input file is processed, which is the semantics a
    deterministic drain needs."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return q
