"""Structured Streaming over the crawl's own state tables.

The batch crawl loop (plans/crawl.py) lands every wave as an immutable
snapshot directory ``state/parsed/wave=NNNNN`` — exactly the layout a
file-source stream consumes incrementally: each committed wave file is
discovered once, so downstream consumers ride micro-batches instead of
re-scanning crawl history. Production mapping: the parsed table is an
Iceberg table, the stream is ``spark.readStream.format("iceberg")``, and
``incremental_docs``'s foreachBatch body is ``MERGE INTO docs`` — the
standard streaming-upsert sink pattern (reference twin: the ES sink's
bulk ``_id = url_hash`` upsert per batch, output_sink/elasticsearch.rb:88,
which is also per-micro-batch in spirit: one bulk flush per queue drain).

Consumers provided:

* ``live_fetch_metrics`` — the streaming twin of the per-wave batch
  metrics Δ (A3): kind/status/depth counts that update as waves land.
* ``incremental_docs`` — foreachBatch docs maintenance: each micro-batch
  maps parsed rows → documents and appends them keyed by (id, wave);
  ``docs_view`` resolves MERGE semantics at read time (latest wave wins
  per id — identical to the batch merge-on-read docs view).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators.parse import docs_from_parsed


def parsed_stream(
    spark: SparkSession, state_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the crawl state's parsed waves. The schema
    must be explicit for streaming sources — taken from a one-off batch
    read of the same directory (an Iceberg stream gets it from the table
    metadata instead)."""
    base = os.path.join(state_dir, "parsed")
    glob = os.path.join(base, "wave=*")
    schema = spark.read.option("basePath", base).parquet(glob).schema
    return (
        spark.readStream.schema(schema)
        .option("basePath", base)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(glob)
    )


def live_fetch_metrics(parsed: DataFrame) -> DataFrame:
    """Streaming kind/status/depth counts — updates as each wave commits."""
    return parsed.groupBy("kind", "status", "depth").agg(F.count("*").alias("n"))


def incremental_docs(
    parsed: DataFrame,
    config: CrawlConfig,
    docs_dir: str,
    checkpoint_dir: str,
):
    """Start a foreachBatch docs-maintenance query: per micro-batch, map
    parsed rows to documents and append them keyed by (id, wave). Returns
    the running StreamingQuery (caller drains with processAllAvailable()
    then stop()). Restart-safe via the checkpoint: a re-delivered batch
    rewrites the same (id, wave) rows, which the read-time view collapses
    — idempotent like a keyed MERGE."""

    def write_batch(batch_df: DataFrame, _batch_id: int):
        docs = docs_from_parsed(batch_df, config, extra_cols=("wave",))
        docs.write.mode("append").parquet(docs_dir)

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def docs_view(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Merge-on-read resolution of the appended docs: latest wave wins per
    id (the same rule as the batch docs view / an Iceberg MERGE result)."""
    from pyspark.sql import Window

    d = spark.read.parquet(docs_dir)
    w = Window.partitionBy("id").orderBy(F.col("wave").desc())
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "wave")
    )
