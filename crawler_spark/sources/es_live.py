"""Live Elasticsearch sender — replays ``export_es_bulk`` request files
against a real ES endpoint over HTTP, closing the loop the offline sink
leaves open (the files are byte-valid ``_bulk`` bodies; this module sends
them with the reference client's retry/backoff and failure bookkeeping).

Reference parity (es/client.rb + output_sink/elasticsearch.rb):

- ``execute_with_retry`` (es/client.rb:233-256): at most
  ``1 + retry_on_failure`` attempts (default 3 retries), exponential
  backoff ``delay_on_retry * 2**(try-1)`` seconds between attempts
  (defaults es/client.rb:18-19: 3 retries, 2 s base delay).
- ``raise_if_necessary`` (es/client.rb:188-216): a 2xx bulk response whose
  body carries ``"errors": true`` is still a failure — the first
  ``index``/``delete`` item holding an ``error`` key is quoted in the
  raised ``IndexingFailedError``.
- ``store_failed_payload`` (es/client.rb:218-231): after the final failed
  attempt the request body is saved under
  ``<failed_dir>/<crawl_id>/<timestamp>`` so no payload is ever silently
  dropped.
- sink ``flush`` (output_sink/elasticsearch.rb:164-190): a failed request
  moves the WHOLE request's docs into the ``failed`` ingestion stats; a
  success adds them to ``completed``; the returned stats dict is the
  reference's ``{"completed": {docs_count, docs_volume}, "failed": ...}``.
- purge ``delete_by_query`` (output_sink/elasticsearch.rb:120-151): index
  refresh followed by ``_delete_by_query``, returning the deleted count.

Spark-first shape: request files are distributed over executors (one
DataFrame of paths, ``mapInPandas`` sender) so N executors push to ES
concurrently — the same unit of parallelism the exporter used to write
them. Concurrent sends cannot race on a document version because the
exporter consumes a deduplicated docs frame: each ``_id`` appears in
exactly one request file. ``failed_dir`` follows the same shared-filesystem
expectation as the sitemap exporter (executor tasks write failed payloads
there; route it through a shared mount on a multi-node cluster).
"""

from __future__ import annotations

import base64
import json
import os
import time
import urllib.error
import urllib.request

# es/client.rb:18-19,23
DEFAULT_RETRY_ON_FAILURE = 3
DEFAULT_DELAY_ON_RETRY = 2  # seconds
FAILED_BULKS_DIR = "output/failed_payloads"


class IndexingFailedError(RuntimeError):
    """2xx bulk response with ``errors: true`` (es/client.rb:206-212)."""


def _auth_header(api_key: str | None, basic_auth: tuple | None) -> str | None:
    if api_key:
        return f"ApiKey {api_key}"
    if basic_auth:
        tok = base64.b64encode(
            f"{basic_auth[0]}:{basic_auth[1]}".encode("utf-8")
        ).decode("ascii")
        return f"Basic {tok}"
    return None


def _http_json(
    url: str,
    body: bytes | None,
    *,
    method: str = "POST",
    content_type: str = "application/json",
    auth: str | None = None,
    timeout_s: float = 60.0,
) -> dict:
    """One HTTP round trip; non-2xx raises, 2xx returns the parsed JSON body."""
    req = urllib.request.Request(url, data=body, method=method)
    req.add_header("Content-Type", content_type)
    req.add_header("Accept", "application/json")
    if auth:
        req.add_header("Authorization", auth)
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        raw = resp.read()
    return json.loads(raw) if raw else {}


def _raise_if_necessary(response: dict) -> dict:
    """es/client.rb:188-216 — bulk 2xx with item-level errors is a failure."""
    if response.get("errors"):
        first_error = None
        for item in response.get("items", []):
            for op in ("index", "delete"):
                if op in item and "error" in item[op]:
                    first_error = item
                    break
            if first_error:
                break
        if first_error:
            raise IndexingFailedError(
                "Failed to index documents into Elasticsearch with an error "
                f"'{json.dumps(first_error, separators=(',', ':'))}'."
            )
        raise IndexingFailedError(
            "Failed to index documents into Elasticsearch due to unknown "
            f"error. Full response: {response}"
        )
    return response


def execute_with_retry(
    fn,
    *,
    retry_on_failure: int = DEFAULT_RETRY_ON_FAILURE,
    delay_on_retry: int = DEFAULT_DELAY_ON_RETRY,
    sleeper=time.sleep,
):
    """es/client.rb:233-256 — ``1 + retry_on_failure`` attempts, doubling
    backoff starting at ``delay_on_retry`` seconds. Retries on ANY error
    (connection refused, 5xx/429 HTTPError, IndexingFailedError) exactly
    like the reference's bare ``rescue StandardError``; the last error is
    re-raised after the final attempt."""
    # es/client.rb:122-131 normalize odd config values
    if retry_on_failure is False:
        retry_on_failure = 0
    elif not isinstance(retry_on_failure, int) or retry_on_failure < 0:
        retry_on_failure = DEFAULT_RETRY_ON_FAILURE
    if not isinstance(delay_on_retry, int) or delay_on_retry <= 0:
        delay_on_retry = DEFAULT_DELAY_ON_RETRY
    max_tries = 1 + retry_on_failure
    try_n = 0
    while True:
        try:
            return fn()
        except Exception:
            try_n += 1
            if try_n >= max_tries:
                raise
            sleeper(delay_on_retry * (2 ** (try_n - 1)))


def _bulk_url(es_url: str, index_name: str, pipeline: str | None) -> str:
    url = f"{es_url.rstrip('/')}/{index_name}/_bulk"
    if pipeline:
        url += f"?pipeline={pipeline}"
    return url


def send_bulk_body(
    body: bytes,
    es_url: str,
    index_name: str,
    *,
    pipeline: str | None = None,
    api_key: str | None = None,
    basic_auth: tuple | None = None,
    retry_on_failure: int = DEFAULT_RETRY_ON_FAILURE,
    delay_on_retry: int = DEFAULT_DELAY_ON_RETRY,
    timeout_s: float = 60.0,
    crawl_id: str = "crawl",
    failed_dir: str = FAILED_BULKS_DIR,
    sleeper=time.sleep,
) -> dict:
    """Send ONE ``_bulk`` request body with the reference's retry loop.

    Returns ``{"ok": bool, "error": str|None, "failed_payload": path|None}``.
    On final failure the body is stored under ``failed_dir/crawl_id/``
    (store_failed_payload, es/client.rb:218-231) and the error is reported,
    not raised — the sink treats it as failed ingestion stats, the crawl
    carries on (elasticsearch.rb:180-186).
    """
    auth = _auth_header(api_key, basic_auth)
    url = _bulk_url(es_url, index_name, pipeline)

    def once():
        return _raise_if_necessary(
            _http_json(
                url,
                body,
                content_type="application/x-ndjson",
                auth=auth,
                timeout_s=timeout_s,
            )
        )

    try:
        execute_with_retry(
            once,
            retry_on_failure=retry_on_failure,
            delay_on_retry=delay_on_retry,
            sleeper=sleeper,
        )
        return {"ok": True, "error": None, "failed_payload": None}
    except Exception as e:  # noqa: BLE001 — the reference catches StandardError
        dirpath = os.path.join(failed_dir, crawl_id)
        os.makedirs(dirpath, exist_ok=True)
        # timestamped like the reference; suffix the monotonic ns so two
        # failures in one second (trivially possible here) don't collide
        name = time.strftime("%Y%m%d%H%M%S") + f"-{time.monotonic_ns()}"
        path = os.path.join(dirpath, name)
        with open(path, "wb") as f:
            f.write(body)
        return {"ok": False, "error": str(e), "failed_payload": path}


def _file_stats(path: str) -> tuple:
    """(ops, payload_volume) for one exporter request file: ops are the
    odd lines (action/source pairs), volume counts source-line bytes only —
    the exporter's docs_volume unit."""
    ops = 0
    volume = 0
    with open(path, "rb") as f:
        for i, line in enumerate(f.read().split(b"\n")):
            if not line:
                continue
            if i % 2 == 1:
                ops += 1
                volume += len(line)
    return ops, volume


def send_bulk_files(
    spark,
    out_dir: str,
    es_url: str,
    *,
    api_key: str | None = None,
    basic_auth: tuple | None = None,
    retry_on_failure: int = DEFAULT_RETRY_ON_FAILURE,
    delay_on_retry: int = DEFAULT_DELAY_ON_RETRY,
    timeout_s: float = 60.0,
    crawl_id: str = "crawl",
    failed_dir: str = FAILED_BULKS_DIR,
    sleeper=time.sleep,
) -> dict:
    """Replay every request file under ``out_dir`` (an ``export_es_bulk``
    output dir with its ``manifest.json``) against a live cluster,
    executor-parallel, and return the reference-shaped ingestion stats::

        {"completed": {"docs_count": N, "docs_volume": B},
         "failed":    {"docs_count": N, "docs_volume": B},
         "requests": n_sent, "failed_requests": n_failed,
         "failed_payloads": [paths...]}
    """
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    index_name = manifest["index_name"]
    pipeline = manifest.get("pipeline")

    files = sorted(
        os.path.join(out_dir, n)
        for n in os.listdir(out_dir)
        if n.endswith(".ndjson")
    )
    if not files:
        return {
            "completed": {"docs_count": 0, "docs_volume": 0},
            "failed": {"docs_count": 0, "docs_volume": 0},
            "requests": 0,
            "failed_requests": 0,
            "failed_payloads": [],
        }

    import pandas as pd  # noqa: F401 (executor-side import below)

    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(min(len(files), 64))

    def send_partition(it):
        import pandas as pd

        rows = []
        for pdf in it:
            for path in pdf["path"]:
                ops, volume = _file_stats(path)
                with open(path, "rb") as f:
                    body = f.read()
                res = send_bulk_body(
                    body,
                    es_url,
                    index_name,
                    pipeline=pipeline,
                    api_key=api_key,
                    basic_auth=basic_auth,
                    retry_on_failure=retry_on_failure,
                    delay_on_retry=delay_on_retry,
                    timeout_s=timeout_s,
                    crawl_id=crawl_id,
                    failed_dir=failed_dir,
                    sleeper=sleeper,
                )
                rows.append(
                    (path, ops, volume, bool(res["ok"]), res["failed_payload"])
                )
        yield pd.DataFrame(
            rows, columns=["path", "ops", "volume", "ok", "failed_payload"]
        )

    stat_rows = paths_df.mapInPandas(
        send_partition,
        schema="path string, ops long, volume long, ok boolean, failed_payload string",
    ).collect()

    completed = {"docs_count": 0, "docs_volume": 0}
    failed = {"docs_count": 0, "docs_volume": 0}
    failed_payloads = []
    for r in stat_rows:
        bucket = completed if r.ok else failed
        bucket["docs_count"] += r.ops
        bucket["docs_volume"] += r.volume
        if not r.ok and r.failed_payload:
            failed_payloads.append(r.failed_payload)
    return {
        "completed": completed,
        "failed": failed,
        "requests": len(stat_rows),
        "failed_requests": len(failed_payloads),
        "failed_payloads": sorted(failed_payloads),
    }


def send_delete_ids(
    spark,
    ids_df,
    es_url: str,
    index_name: str,
    *,
    id_col: str = "id",
    batch_size: int = 1000,
    api_key: str | None = None,
    basic_auth: tuple | None = None,
    retry_on_failure: int = DEFAULT_RETRY_ON_FAILURE,
    delay_on_retry: int = DEFAULT_DELAY_ON_RETRY,
    timeout_s: float = 60.0,
    crawl_id: str = "crawl",
    failed_dir: str = FAILED_BULKS_DIR,
    sleeper=time.sleep,
) -> dict:
    """Purge deletion for the offline crawl: the purge stage's tombstone
    table knows exactly which doc ids are gone, so instead of the
    reference's index-wide ``delete_by_query`` range scan
    (elasticsearch.rb:131-151 — see ``delete_by_query`` below, used in
    live mode where ``last_crawled_at`` is wall-clock) we stream ``delete``
    bulk actions (the same op the reference's bulk queue carries,
    es/client.rb:199-204 handles their item errors) executor-parallel:
    each partition chunks its ids into ``batch_size``-action ``_bulk``
    bodies and pushes them through ``send_bulk_body``'s retry loop.

    Returns ``{"deleted": N, "failed": N, "requests": n, "failed_requests":
    n, "failed_payloads": [...]}`` — deleted counts acknowledged request
    ops, failed counts ops whose request exhausted its retries.
    """
    import pandas as pd  # noqa: F401 (executor-side import below)

    def delete_partition(it):
        import pandas as pd

        rows = []
        for pdf in it:
            ids = [i for i in pdf[id_col].tolist() if i]
            for lo in range(0, len(ids), batch_size):
                chunk = ids[lo:lo + batch_size]
                body = b"".join(
                    json.dumps(
                        {"delete": {"_index": index_name, "_id": i}},
                        separators=(",", ":"),
                    ).encode("utf-8") + b"\n"
                    for i in chunk
                )
                res = send_bulk_body(
                    body,
                    es_url,
                    index_name,
                    api_key=api_key,
                    basic_auth=basic_auth,
                    retry_on_failure=retry_on_failure,
                    delay_on_retry=delay_on_retry,
                    timeout_s=timeout_s,
                    crawl_id=crawl_id,
                    failed_dir=failed_dir,
                    sleeper=sleeper,
                )
                rows.append(
                    (len(chunk), bool(res["ok"]), res["failed_payload"])
                )
        yield pd.DataFrame(rows, columns=["ops", "ok", "failed_payload"])

    stat_rows = ids_df.select(id_col).mapInPandas(
        delete_partition, schema="ops long, ok boolean, failed_payload string"
    ).collect()

    deleted = sum(r.ops for r in stat_rows if r.ok)
    failed = sum(r.ops for r in stat_rows if not r.ok)
    failed_payloads = sorted(
        r.failed_payload for r in stat_rows if not r.ok and r.failed_payload
    )
    return {
        "deleted": deleted,
        "failed": failed,
        "requests": len(stat_rows),
        "failed_requests": len(failed_payloads),
        "failed_payloads": failed_payloads,
    }


def delete_by_query(
    es_url: str,
    index_name: str,
    query: dict,
    *,
    api_key: str | None = None,
    basic_auth: tuple | None = None,
    retry_on_failure: int = DEFAULT_RETRY_ON_FAILURE,
    delay_on_retry: int = DEFAULT_DELAY_ON_RETRY,
    timeout_s: float = 60.0,
    sleeper=time.sleep,
) -> int:
    """Purge-stage deletion (output_sink/elasticsearch.rb:120-151): refresh
    the index, then ``_delete_by_query``; returns the deleted count. Errors
    raise after the retry budget — the purge caller decides whether a
    failed purge aborts the crawl (the reference lets the error surface)."""
    auth = _auth_header(api_key, basic_auth)
    base = es_url.rstrip("/")

    def refresh():
        return _http_json(
            f"{base}/{index_name}/_refresh", b"", auth=auth, timeout_s=timeout_s
        )

    def delete():
        return _http_json(
            f"{base}/{index_name}/_delete_by_query",
            json.dumps(query, separators=(",", ":")).encode("utf-8"),
            auth=auth,
            timeout_s=timeout_s,
        )

    execute_with_retry(
        refresh,
        retry_on_failure=retry_on_failure,
        delay_on_retry=delay_on_retry,
        sleeper=sleeper,
    )
    resp = execute_with_retry(
        delete,
        retry_on_failure=retry_on_failure,
        delay_on_retry=delay_on_retry,
        sleeper=sleeper,
    )
    return int(resp.get("deleted", 0))
