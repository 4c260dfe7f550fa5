"""The `pages` source: Common-Crawl-style offline fetch corpus.

Input schema fixed by BASELINE.json `input_hint`:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

`prepare_pages` derives the join identity (norm_url, url_hash) once with a
vectorized Arrow UDF and (optionally) repartitions by the hash so every
downstream fetch-join co-locates on the same key. At production scale this
table is an Iceberg table bucketed by ``bucket(N, url_hash)``; the parquet
path here is the local stand-in (no Iceberg runtime jar in the sandbox —
the write path is isolated in :mod:`crawler_spark.state.store`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions.urlnorm import try_normalize


@F.pandas_udf(StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: try_normalize(u)[0] if u is not None else None)


def load_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def prepare_pages(pages: DataFrame, repartition: int | None = None) -> DataFrame:
    """Add norm_url + url_hash; url_hash via JVM-side sha1 (E2 —
    F.sha1(encode(norm,utf8)) ≡ Ruby Digest::SHA1.hexdigest).

    The single repartition AFTER the hash is derived puts the cached corpus
    in ``HashPartitioning(url_hash, N)`` — the exact output distribution
    every per-wave fetch join requires, so only the (small) wave side
    shuffles and the html blobs never move again. This is the local
    stand-in for Iceberg ``bucket(N, url_hash)`` table layout.

    No pre-UDF repartition: that would shuffle the html blobs twice. The
    normalize stage's parallelism comes from the parquet scan itself —
    fixture files are written with small row groups (Spark can only split
    a parquet file at row-group boundaries), and a production corpus
    arrives as many files."""
    out = (
        pages.withColumn("norm_url", normalize_url_udf(F.col("url")))
        .filter(F.col("norm_url").isNotNull())
        .withColumn("url_hash", F.sha1(F.encode(F.col("norm_url"), "utf-8")))
    )
    if repartition:
        out = out.repartition(repartition, "url_hash")
    return out
