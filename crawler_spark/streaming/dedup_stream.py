"""Streaming deduplication — the incremental-ingest twin of the batch
dedup family (``textops.dedup``): documents arrive as a stream (e.g.
``sources.warc.stream_warc`` dropping Common-Crawl segments into a
directory) and duplicates are resolved ACROSS micro-batches against
checkpointed operator state, so a restart never re-admits what an
earlier batch already kept.

Two shapes:

* :func:`stream_exact_dedup` — keep the FIRST arrival of each content
  fingerprint; Structured Streaming's ``dropDuplicates`` state store is
  exactly the streaming seen-set. At production scale pair with an
  event-time watermark (``dropDuplicatesWithinWatermark``) so state is
  bounded by the late-data horizon instead of growing forever — the
  same bound-the-state trade the crawl's frontier-as-table design makes
  explicitly.
* :func:`stream_novelty_flags` — mark-don't-drop: every row is emitted
  with a ``novel`` flag and the running duplicate count for its
  fingerprint, via a custom ``applyInPandasWithState`` operator (what a
  dedup-METRICS feed wants: the corpus keeps flowing, downstream
  chooses what to do with dups).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType


def _with_fp(docs: DataFrame, fingerprint_col, text_col: str) -> DataFrame:
    if fingerprint_col is not None:
        return docs.withColumn("fp", F.col(fingerprint_col))
    return docs.withColumn("fp", F.md5(F.coalesce(F.col(text_col), F.lit(""))))


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    fingerprint_col: str | None = None,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """First-arrival-wins exact dedup over a document stream.

    ``watermark=(ts_col, delay)`` switches to
    ``dropDuplicatesWithinWatermark`` — duplicates are only suppressed
    within the watermark horizon, which is what bounds the state store on
    an unbounded feed (an exact forever-dedup belongs in the batch
    anti-join against the corpus table, not in stream state).
    """
    out = _with_fp(docs, fingerprint_col, text_col)
    if watermark is not None:
        ts_col, delay = watermark
        return out.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(["fp"])
    return out.dropDuplicates(["fp"])


NOVELTY_STATE = StructType([StructField("n_seen", LongType())])


def _novelty_out_schema(id_field) -> StructType:
    return StructType(
        [
            StructField("fp", StringType()),
            id_field,
            StructField("novel", BooleanType()),
            StructField("dup_count", LongType()),
        ]
    )


def stream_novelty_flags(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         fingerprint_col: str | None = None) -> DataFrame:
    """Emit every arriving row with ``novel`` (first occurrence of its
    fingerprint across ALL batches so far) and the running ``dup_count``.
    State is one counter per fingerprint, checkpointed with the query."""
    keyed = _with_fp(docs, fingerprint_col, text_col)
    id_field = keyed.schema[id_col]
    out_schema = _novelty_out_schema(id_field)

    def flag(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # batch arrivals of one fp are ordered by id for determinism
            import numpy as np

            pdf = pdf.sort_values(id_col)
            counts = n + np.arange(1, len(pdf) + 1, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "fp": pdf["fp"].to_numpy(),
                    id_col: pdf[id_col].to_numpy(),
                    "novel": counts == 1,
                    "dup_count": counts,
                }
            )
            n += len(pdf)
        state.update((n,))

    return keyed.groupBy(F.col("fp")).applyInPandasWithState(
        flag,
        outputStructType=out_schema,
        stateStructType=NOVELTY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
