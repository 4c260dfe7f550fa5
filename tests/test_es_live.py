"""Live Elasticsearch sender vs a real (mock) HTTP endpoint.

Pins the reference client semantics end-to-end: retry/backoff cadence
(es/client.rb:233-256), errors:true-is-a-failure (es/client.rb:188-216),
failed-payload capture (es/client.rb:218-231), whole-request failed stats
(output_sink/elasticsearch.rb:164-190), and the purge delete_by_query
round trip (elasticsearch.rb:120-151)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawler_spark.sources.es_bulk import export_es_bulk
from crawler_spark.sources.es_live import (
    IndexingFailedError,
    delete_by_query,
    execute_with_retry,
    send_bulk_body,
    send_bulk_files,
)


class _MockES(BaseHTTPRequestHandler):
    """Scriptable ES: each instance of the server owns a request log and a
    queue of canned responses per path suffix."""

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        srv = self.server
        with srv.lock:
            srv.requests.append(
                {
                    "path": self.path,
                    "body": body,
                    "content_type": self.headers.get("Content-Type"),
                    "auth": self.headers.get("Authorization"),
                }
            )
            plan = srv.plan
            status, payload = plan.pop(0) if plan else (200, {"errors": False})
        raw = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        if status != 204:
            self.wfile.write(raw)

    def log_message(self, *args):
        pass


@pytest.fixture()
def mock_es():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _MockES)
    server.requests = []
    server.plan = []  # list of (status, json_payload), popped per request
    server.lock = threading.Lock()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server
    server.shutdown()


def _url(server):
    return f"http://127.0.0.1:{server.server_address[1]}"


def _export(spark, tmp_path, n=7):
    docs = spark.createDataFrame(
        [(f"id{i}", f"body text {i}") for i in range(n)], "id string, body string"
    ).repartition(1)  # one writer task → deterministic request-file count
    out = str(tmp_path / "bulkdir")
    stats = export_es_bulk(docs, out, "web-index", max_items=3)
    assert stats["completed"]["docs_count"] == n
    return out


def test_send_bulk_files_success(spark, tmp_path, mock_es):
    out = _export(spark, tmp_path)
    stats = send_bulk_files(
        spark, out, _url(mock_es), api_key="SECRET", sleeper=lambda s: None
    )
    assert stats["failed"] == {"docs_count": 0, "docs_volume": 0}
    assert stats["completed"]["docs_count"] == 7
    assert stats["completed"]["docs_volume"] > 0
    assert stats["requests"] == 3  # 7 docs / max_items=3
    reqs = mock_es.requests
    assert len(reqs) == 3
    for r in reqs:
        # pipeline from the exporter manifest reaches the query string
        assert r["path"] == "/web-index/_bulk?pipeline=ent-search-generic-ingestion"
        assert r["content_type"] == "application/x-ndjson"
        assert r["auth"] == "ApiKey SECRET"
        lines = [ln for ln in r["body"].split(b"\n") if ln]
        assert len(lines) % 2 == 0
        action = json.loads(lines[0])
        assert action["index"]["_index"] == "web-index"


def test_retry_backoff_cadence_then_success(tmp_path, mock_es):
    # 2 failures then success — within the default 1+3 attempt budget.
    # Driver-side send_bulk_body so the injected sleeper stays observable
    # (inside mapInPandas the closure runs in the executor worker process).
    mock_es.plan = [(429, {"error": "too many requests"}), (503, {"error": "busy"})]
    sleeps = []

    res = send_bulk_body(
        b'{"index":{"_index":"i","_id":"a"}}\n{"f":1}\n',
        _url(mock_es),
        "i",
        sleeper=sleeps.append,
        failed_dir=str(tmp_path / "failed"),
    )
    assert res["ok"] is True
    assert len(mock_es.requests) == 3
    # es/client.rb:241-248 — delay * 2**(try-1): 2s, 4s
    assert sleeps == [2, 4]


def test_retry_through_spark_sender(spark, tmp_path, mock_es):
    # same cadence observed from the server's side when sent via Spark
    mock_es.plan = [(429, {"error": "too many requests"})]
    out = _export(spark, tmp_path, n=2)  # single request file
    stats = send_bulk_files(
        spark, out, _url(mock_es), sleeper=lambda s: None, crawl_id="c1",
        failed_dir=str(tmp_path / "failed"),
    )
    assert stats["failed"]["docs_count"] == 0
    assert stats["completed"]["docs_count"] == 2
    assert len(mock_es.requests) == 2  # one 429, one success


def test_errors_true_is_a_failure_with_payload_capture(spark, tmp_path, mock_es):
    bad_item = {"index": {"_id": "id0", "error": {"type": "mapper_parsing_exception"}}}
    mock_es.plan = [(200, {"errors": True, "items": [bad_item]})] * 4
    out = _export(spark, tmp_path, n=2)
    failed_dir = str(tmp_path / "failed")

    stats = send_bulk_files(
        spark, out, _url(mock_es), sleeper=lambda s: None,
        crawl_id="c2", failed_dir=failed_dir,
    )
    # whole request's docs land in failed (elasticsearch.rb:275-276)
    assert stats["failed"]["docs_count"] == 2
    assert stats["completed"]["docs_count"] == 0
    assert stats["failed_requests"] == 1
    # 1 + 3 retries, all consumed
    assert len(mock_es.requests) == 4
    # store_failed_payload: the exact body is preserved for replay
    (payload_path,) = stats["failed_payloads"]
    assert payload_path.startswith(failed_dir)
    with open(payload_path, "rb") as f:
        saved = f.read()
    assert saved == mock_es.requests[0]["body"]


def test_connection_refused_counts_failed(spark, tmp_path):
    out = _export(spark, tmp_path, n=2)
    # unroutable local port: bind-then-close to get a dead port
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    stats = send_bulk_files(
        spark, out, f"http://127.0.0.1:{port}", sleeper=lambda s: None,
        retry_on_failure=1, crawl_id="c3", failed_dir=str(tmp_path / "failed"),
    )
    assert stats["failed"]["docs_count"] == 2
    assert stats["failed_requests"] == 1


def test_send_bulk_body_basic_auth_and_no_pipeline(mock_es, tmp_path):
    res = send_bulk_body(
        b'{"index":{"_index":"i","_id":"a"}}\n{"f":1}\n',
        _url(mock_es),
        "i",
        pipeline=None,
        basic_auth=("elastic", "changeme"),
        sleeper=lambda s: None,
        failed_dir=str(tmp_path / "failed"),
    )
    assert res["ok"] is True
    (req,) = mock_es.requests
    assert req["path"] == "/i/_bulk"  # no ?pipeline= when disabled
    assert req["auth"].startswith("Basic ")


def test_execute_with_retry_exhausts_and_raises():
    calls = []

    def boom():
        calls.append(1)
        raise IndexingFailedError("nope")

    sleeps = []
    with pytest.raises(IndexingFailedError):
        execute_with_retry(
            boom, retry_on_failure=2, delay_on_retry=1, sleeper=sleeps.append
        )
    assert len(calls) == 3  # 1 + 2 retries (es/client.rb:235)
    assert sleeps == [1, 2]


def test_send_job_cli(spark, tmp_path, mock_es, monkeypatch):
    import jobs.send_es_bulk as job

    out = _export(spark, tmp_path, n=4)
    # the job builds its own session via getOrCreate → reuses the fixture's
    rc = job.main(
        ["--bulk-dir", out, "--es-url", _url(mock_es), "--api-key", "K",
         "--crawl-id", "cli", "--failed-dir", str(tmp_path / "failed")]
    )
    assert rc == 0
    assert len(mock_es.requests) == 2  # 4 docs / max_items=3 → 2 requests

    mock_es.requests.clear()
    mock_es.plan = [(500, {"error": "boom"})] * 8
    rc = job.main(
        ["--bulk-dir", out, "--es-url", _url(mock_es), "--retries", "0",
         "--crawl-id", "cli2", "--failed-dir", str(tmp_path / "failed2")]
    )
    assert rc == 2  # failed requests surface in the exit status


def test_send_delete_ids_batches(spark, tmp_path, mock_es):
    from crawler_spark.sources.es_live import send_delete_ids

    ids = spark.createDataFrame(
        [(f"id{i}",) for i in range(5)], "id string"
    ).repartition(1)
    stats = send_delete_ids(
        spark, ids, _url(mock_es), "web-index", batch_size=2,
        sleeper=lambda s: None, failed_dir=str(tmp_path / "failed"),
    )
    assert stats["deleted"] == 5
    assert stats["failed"] == 0
    assert stats["requests"] == 3  # 2+2+1
    assert stats["failed_requests"] == 0
    got = set()
    for r in mock_es.requests:
        assert r["path"] == "/web-index/_bulk"  # no ?pipeline= on deletes
        for ln in r["body"].split(b"\n"):
            if not ln:
                continue
            op = json.loads(ln)
            assert set(op) == {"delete"}
            assert op["delete"]["_index"] == "web-index"
            got.add(op["delete"]["_id"])
    assert got == {f"id{i}" for i in range(5)}


def test_submit_job_live_send_and_offline_purge(
    spark, tmp_path, mock_es, monkeypatch, capsys
):
    """--es-url closes the crawl→export→index loop in one job, and
    --es-purge on a recrawl streams bulk delete actions for exactly the
    purge stage's tombstones (the offline analog of
    elasticsearch.rb:131-151's delete_by_query)."""
    import datetime as dt

    from crawler_spark.fixtures.gen import write_parquet
    from crawler_spark.functions.urlnorm import url_sha1

    HOST = "https://p.test"
    EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def page(links):
        body = "".join(f'<a href="{h}">x</a>' for h in links)
        return f"<html><head><title>t</title></head><body>word {body}</body></html>"

    def corpus(pages, path):
        rows = [
            {"url": u, "warc_ts": EPOCH + dt.timedelta(seconds=i),
             "html": h.encode(), "text": "", "lang": "en"}
            for i, (u, h) in enumerate(sorted(pages.items()))
        ]
        write_parquet(rows, str(path))
        return str(path)

    v1 = corpus({
        f"{HOST}/": page(["/a", "/b"]),
        f"{HOST}/a": page([]),
        f"{HOST}/b": page([]),
    }, tmp_path / "v1.parquet")
    v2 = corpus({
        f"{HOST}/": page(["/a"]),
        f"{HOST}/a": page([]),
    }, tmp_path / "v2.parquet")

    import jobs.submit_crawl as job

    monkeypatch.setattr(
        "pyspark.sql.SparkSession.builder",
        type("B", (), {"appName": lambda self, n: self,
                       "getOrCreate": lambda self: spark})(),
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    state = str(tmp_path / "state")

    assert job.main([
        "--pages", v1, "--state", state, "--seeds", f"{HOST}/",
        "--max-waves", "10", "--no-lineage",
        "--es-export", str(tmp_path / "bulk1"), "--es-index", "web-corpus",
        "--es-url", _url(mock_es),
    ]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["ingestion_stats"]["completed"]["docs_count"] == 3
    assert out1["ingestion_stats"]["failed"]["docs_count"] == 0
    assert out1["ingestion_stats"]["exported"]["docs_count"] == 3
    indexed = set()
    for r in mock_es.requests:
        assert r["path"].startswith("/web-corpus/_bulk")
        for ln in r["body"].split(b"\n"):
            if ln and b'"index"' in ln:
                op = json.loads(ln)
                if "index" in op:
                    indexed.add(op["index"]["_id"])
    assert indexed == {url_sha1(f"{HOST}/"), url_sha1(f"{HOST}/a"),
                       url_sha1(f"{HOST}/b")}

    mock_es.requests.clear()
    assert job.main([
        "--pages", v2, "--state", state, "--seeds", f"{HOST}/",
        "--max-waves", "10", "--no-lineage", "--recrawl",
        "--es-export", str(tmp_path / "bulk2"), "--es-index", "web-corpus",
        "--es-url", _url(mock_es), "--es-purge",
    ]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["deleted"] == 1
    deletes = set()
    for r in mock_es.requests:
        for ln in r["body"].split(b"\n"):
            if ln:
                op = json.loads(ln)
                if "delete" in op:
                    deletes.add(op["delete"]["_id"])
    assert deletes == {url_sha1(f"{HOST}/b")}  # exactly the tombstoned doc


def test_delete_by_query_refresh_then_delete(mock_es):
    mock_es.plan = [(200, {"ok": True}), (200, {"deleted": 5})]
    n = delete_by_query(
        _url(mock_es), "web-index", {"query": {"bool": {}}}, sleeper=lambda s: None
    )
    assert n == 5
    assert mock_es.requests[0]["path"] == "/web-index/_refresh"
    assert mock_es.requests[1]["path"] == "/web-index/_delete_by_query"
    assert json.loads(mock_es.requests[1]["body"]) == {"query": {"bool": {}}}
