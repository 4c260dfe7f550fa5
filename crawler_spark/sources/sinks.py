"""Output sinks (SURVEY §2.1 S6-S8).

The primary sink in the Spark engine is the docs table itself
(``StateStore`` parquet Δs locally; Iceberg ``MERGE INTO … ON t.id = s.id``
in production — the idempotent-upsert equivalent of the reference's ES
bulk ``_id = url_hash`` sink, output_sink/elasticsearch.rb:82-188).
This module adds the debug-grade sinks:

* file sink (output_sink/file.rb): one JSON file per doc is an
  anti-pattern at 10^10 scale, so the distributed form is
  ``df.write.json`` partitioned output, with the reference's per-doc
  filename derivation (``generate_filename_from_url`` — file.rb:25-44)
  kept as a column for downstream fan-out or single-doc export;
* console sink (output_sink/console.rb): ``df.show``-based dump;
* null sink: no-op (count only, forces materialization).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_file_name(url: str) -> str:
    """Reference filename sanitization (file.rb:25-44): strip trailing
    slash, non-[a-zA-Z0-9_-] → '_', squeeze '_', drop scheme/www prefix,
    middle-slice to ≤255 chars (keep domain head + unique path tail)."""
    full = url[:-1] if url.endswith("/") else url
    name = re.sub(r"[^a-zA-Z0-9\-_]", "_", full)
    name = re.sub(r"_+", "_", name)
    name = re.sub(r"^https?_?(www_)?", "", name)
    if len(name) > 255:
        # file.rb:37-42 — slice! removes chars 128..(len-122) inclusive
        name = name[:128] + name[len(name) - 121:]
    return name


_FILE_NAME_UDF = None


def with_doc_file_name(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Add the reference-sanitized per-doc filename column (vectorized)."""
    global _FILE_NAME_UDF
    if _FILE_NAME_UDF is None:
        from pyspark.sql.types import StringType

        _FILE_NAME_UDF = F.pandas_udf(
            lambda urls: urls.map(lambda u: doc_file_name(u) + ".json" if u else None),
            StringType(),
        )
    return docs.withColumn("doc_file_name", _FILE_NAME_UDF(F.col(url_col)))


def write_docs_json(docs: DataFrame, out_dir: str, coalesce: int | None = None) -> str:
    """File sink (S7): JSON-lines output with the per-doc filename column
    included. ``coalesce`` bounds output file count for small exports."""
    d = with_doc_file_name(docs)
    if coalesce:
        d = d.coalesce(coalesce)
    d.write.mode("overwrite").json(out_dir)
    return out_dir


def console_sink(docs: DataFrame, n: int = 20):
    """Console sink (S8) — debug only."""
    docs.show(n, truncate=80)


def null_sink(docs: DataFrame) -> int:
    """Null sink (S8): materialize and discard; returns the doc count."""
    return docs.count()
