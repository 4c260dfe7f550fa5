"""Elasticsearch ``_bulk`` export sink (offline parity with the reference's
primary production sink, output_sink/elasticsearch.rb + es/bulk_queue.rb).

The reference serializes each doc into a bulk operation pair — the action
line ``{"index": {"_index": idx, "_id": id}}`` followed by the doc source
merged with the ingest-pipeline params (elasticsearch.rb:82-103,243-247) —
and flushes the buffer whenever the next pair would cross the ``bulk_api``
thresholds: ``max_items`` operations per request or ``max_size_bytes`` per
request body (es/bulk_queue.rb:16-75: ``will_fit?`` rejects when
``op_count + 1 > threshold`` or ``buffer + op + payload >= size``). A single
doc that can never fit raises BulkQueueOverflowError (bulk_queue.rb:44-53)
and the reference counts it against the ``failed`` ingestion stats.

Offline, each flush becomes one ``.ndjson`` file whose bytes are a valid ES
``_bulk`` request body, replayable verbatim against a live cluster::

    curl -s -H 'Content-Type: application/x-ndjson' \
         "$ES/<index>/_bulk?pipeline=<pipeline>" --data-binary @part-...ndjson

Spark-first shape: one task per partition streams its rows into
sequentially numbered request files executor-side (``mapInPandas`` — no
driver collect; at 10^10 docs each task produces its own request series,
the same unit-of-parallelism as the WARC export sink). The driver only
aggregates the per-file stat rows into the reference's ``ingestion_stats``
``{completed, failed}`` docs_count/docs_volume dict
(elasticsearch.rb:190-192,249-281) and writes a small ``manifest.json``
recording the index/pipeline the request files target.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

# elasticsearch.rb:17-23
DEFAULT_PIPELINE = "ent-search-generic-ingestion"  # DEFAULT_PIPELINE_V1
DEFAULT_PIPELINE_V2 = "search-default-ingestion"  # 9.x / serverless
DEFAULT_PIPELINE_PARAMS = {
    "_reduce_whitespace": True,
    "_run_ml_inference": True,
    "_extract_binary_content": True,
}
# es/bulk_queue.rb:15-18
DEFAULT_MAX_ITEMS = 100
DEFAULT_MAX_SIZE_BYTES = 1 * 1024 * 1024


def _json_value(v):
    """Best-effort plain-JSON coercion for Arrow/pandas cell values."""
    import datetime as _dt

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, (np.generic,)):
        return v.item()
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        # the reference emits RFC 3339 timestamps (document_mapper)
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    if isinstance(v, np.ndarray):
        return [_json_value(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items()}
    if isinstance(v, float) and v != v:  # NaN cell from pandas
        return None
    return v


def _serialize(obj) -> bytes:
    """Compact JSON, UTF-8 — the byte count ES sees on the wire (the
    reference measures ``serializer.dump(item).bytesize``, bulk_queue.rb:85-89)."""
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False).encode("utf-8")


def export_es_bulk(
    docs: DataFrame,
    out_dir: str,
    index_name: str,
    *,
    id_col: str = "id",
    pipeline_enabled: bool = True,
    pipeline: str = DEFAULT_PIPELINE,
    pipeline_params: dict | None = None,
    max_items: int = DEFAULT_MAX_ITEMS,
    max_size_bytes: int = DEFAULT_MAX_SIZE_BYTES,
) -> dict:
    """Write ``docs`` as ES ``_bulk`` request files under ``out_dir``.

    Returns the reference's ``ingestion_stats`` dict
    (elasticsearch.rb:190-192): ``{"completed": {docs_count, docs_volume},
    "failed": {docs_count, docs_volume}, "requests": n_files}``. Docs whose
    single op pair exceeds ``max_size_bytes`` are counted as failed (the
    BulkQueueOverflowError path) and omitted from the request files.
    """
    if not index_name:
        raise ValueError("Missing output index")  # elasticsearch.rb:29

    params = dict(DEFAULT_PIPELINE_PARAMS)
    if pipeline_params:
        params.update(pipeline_params)
    cols = [c for c in docs.columns]
    if id_col not in cols:
        raise ValueError(f"docs frame has no id column {id_col!r}")
    merge_params = params if pipeline_enabled else None

    def write_partition(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os_mod = os  # closure capture; executor re-imports via pickle

        files = []  # (path, ops, payload volume)
        failed_count = 0
        failed_volume = 0

        buf: list[bytes] = []
        buf_ops = 0
        buf_size = 0  # serialized op+payload bytes, newline-exclusive like the reference
        buf_volume = 0  # payload bytes only — the reference's docs_volume unit
        seq = 0

        def flush():
            nonlocal buf, buf_ops, buf_size, buf_volume, seq
            if not buf_ops:
                return
            os_mod.makedirs(out_dir, exist_ok=True)
            path = os_mod.path.join(out_dir, f"part-{pid:05d}-{seq:04d}.ndjson")
            with open(path, "wb") as f:
                for line in buf:
                    f.write(line)
                    f.write(b"\n")
            files.append((path, buf_ops, buf_volume))
            buf, buf_ops, buf_size, buf_volume, seq = [], 0, 0, 0, seq + 1

        for pdf in it:
            for row in pdf.itertuples(index=False):
                src = {}
                for name, val in zip(pdf.columns, row):
                    jv = _json_value(val)
                    if jv is not None:
                        src[name] = jv
                if merge_params is not None:
                    src.update(merge_params)  # parametrized_doc, elasticsearch.rb:243-247
                op = _serialize({"index": {"_index": index_name, "_id": src.get(id_col)}})
                payload = _serialize(src)
                pair = len(op) + len(payload)
                # will_fit? (bulk_queue.rb:68-75): flush first when the pair
                # would cross either threshold, then re-check standalone fit.
                if buf_ops + 1 > max_items or buf_size + pair >= max_size_bytes:
                    flush()
                if pair >= max_size_bytes:
                    # BulkQueueOverflowError (bulk_queue.rb:44-53) → failed stats
                    failed_count += 1
                    failed_volume += len(payload)
                    continue
                buf.append(op)
                buf.append(payload)
                buf_ops += 1
                buf_size += pair
                buf_volume += len(payload)  # increment_ingestion_stats counts the doc only
        flush()

        yield pd.DataFrame(
            {
                "path": [p for p, _, _ in files] + ([None] if failed_count else []),
                "ops": [n for _, n, _ in files] + ([0] if failed_count else []),
                "volume": [b for _, _, b in files] + ([0] if failed_count else []),
                "failed_count": [0] * len(files) + ([failed_count] if failed_count else []),
                "failed_volume": [0] * len(files) + ([failed_volume] if failed_count else []),
            }
        )

    stat_rows = docs.mapInPandas(
        write_partition,
        schema="path string, ops long, volume long, failed_count long, failed_volume long",
    ).collect()

    completed = {
        "docs_count": sum(r.ops for r in stat_rows),
        "docs_volume": sum(r.volume for r in stat_rows),
    }
    failed = {
        "docs_count": sum(r.failed_count for r in stat_rows),
        "docs_volume": sum(r.failed_volume for r in stat_rows),
    }
    n_files = sum(1 for r in stat_rows if r.path)

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "index_name": index_name,
        "pipeline": pipeline if pipeline_enabled else None,
        "pipeline_enabled": pipeline_enabled,
        "pipeline_params": params if pipeline_enabled else {},
        "max_items": max_items,
        "max_size_bytes": max_size_bytes,
        "requests": n_files,
        "completed": completed,
        "failed": failed,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)

    return {"completed": completed, "failed": failed, "requests": n_files}
