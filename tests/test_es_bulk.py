"""ES _bulk export sink parity tests (output_sink/elasticsearch.rb,
es/bulk_queue.rb)."""

import glob
import json
import os

import pytest


def _docs(spark, n=10):
    rows = [
        {
            "id": f"doc{i:03d}",
            "url": f"https://site-{i % 3}.example.com/p/{i}",
            "title": f"Title {i}",
            "body": "word " * (i + 1),
            "last_crawled_at": "2026-08-18T00:00:00Z",
        }
        for i in range(n)
    ]
    return spark.createDataFrame(rows).coalesce(2)


def _read_pairs(out_dir):
    """All (action, doc) pairs across request files, per-file op counts,
    and raw file bytes."""
    pairs, per_file, raw = [], {}, {}
    for path in sorted(glob.glob(os.path.join(out_dir, "*.ndjson"))):
        data = open(path, "rb").read()
        raw[path] = data
        lines = data.decode("utf-8").splitlines()
        assert len(lines) % 2 == 0, "bulk body must alternate action/doc lines"
        ops = []
        for i in range(0, len(lines), 2):
            ops.append((json.loads(lines[i]), json.loads(lines[i + 1])))
        per_file[path] = ops
        pairs.extend(ops)
    return pairs, per_file, raw


def test_bulk_files_are_valid_request_bodies(spark, tmp_path):
    from crawler_spark.sources.es_bulk import export_es_bulk

    out = str(tmp_path / "bulk")
    stats = export_es_bulk(_docs(spark), out, "my-index", max_items=3)
    pairs, per_file, raw = _read_pairs(out)

    assert stats["failed"] == {"docs_count": 0, "docs_volume": 0}
    assert stats["completed"]["docs_count"] == 10 == len(pairs)
    assert stats["requests"] == len(per_file)
    # max_items=3 → every request carries at most 3 ops (bulk_queue.rb:68-69)
    assert all(len(ops) <= 3 for ops in per_file.values())
    assert max(len(ops) for ops in per_file.values()) == 3
    # every body ends with a newline — the _bulk API requirement
    assert all(data.endswith(b"\n") for data in raw.values())
    ids = set()
    for action, doc in pairs:
        assert action == {"index": {"_index": "my-index", "_id": doc["id"]}}
        # pipeline params merged into the source (elasticsearch.rb:243-247)
        assert doc["_reduce_whitespace"] is True
        assert doc["_run_ml_inference"] is True
        assert doc["_extract_binary_content"] is True
        ids.add(doc["id"])
    assert ids == {f"doc{i:03d}" for i in range(10)}


def test_pipeline_disabled_and_manifest(spark, tmp_path):
    from crawler_spark.sources.es_bulk import export_es_bulk

    out = str(tmp_path / "bulk")
    export_es_bulk(_docs(spark, 4), out, "idx", pipeline_enabled=False)
    pairs, _, _ = _read_pairs(out)
    assert pairs and all("_reduce_whitespace" not in doc for _, doc in pairs)

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["index_name"] == "idx"
    assert manifest["pipeline"] is None and manifest["pipeline_params"] == {}
    assert manifest["completed"]["docs_count"] == 4


def test_size_threshold_splits_and_oversize_fails(spark, tmp_path):
    from crawler_spark.sources.es_bulk import export_es_bulk

    rows = [
        {"id": "small-1", "body": "x" * 120},  # one pair fits; two don't
        {"id": "small-2", "body": "y" * 120},
        {"id": "huge", "body": "z" * 5000},  # pair >= threshold → overflow
    ]
    docs = spark.createDataFrame(rows).coalesce(1)
    out = str(tmp_path / "bulk")
    stats = export_es_bulk(
        docs, out, "idx", pipeline_enabled=False, max_size_bytes=300
    )
    pairs, per_file, raw = _read_pairs(out)

    # the two small docs can't share one 300-byte request → one doc per file
    assert {doc["id"] for _, doc in pairs} == {"small-1", "small-2"}
    assert all(len(ops) == 1 for ops in per_file.values())
    # BulkQueueOverflowError path (bulk_queue.rb:44-53) → failed stats
    assert stats["failed"]["docs_count"] == 1
    assert stats["failed"]["docs_volume"] > 5000
    assert stats["completed"]["docs_count"] == 2
    # docs_volume counts payload bytes only (elasticsearch.rb:265-268
    # increments by bytesize(doc), not the action line)
    recomputed = sum(
        len(json.dumps(doc, separators=(",", ":")).encode()) for _, doc in pairs
    )
    assert stats["completed"]["docs_volume"] == recomputed


def test_missing_index_rejected(spark, tmp_path):
    from crawler_spark.sources.es_bulk import export_es_bulk

    with pytest.raises(ValueError, match="output index"):
        export_es_bulk(_docs(spark, 1), str(tmp_path), "")


def test_submit_job_es_sink_e2e(spark, tmp_path, monkeypatch):
    """output_sink: elasticsearch in a reference-format crawler.yml drives
    the offline _bulk export after the crawl — docs land as replayable
    request files under <state>/es_bulk with the configured index,
    pipeline, and bulk_api thresholds, and ingestion_stats reconcile."""
    from crawler_spark.fixtures.gen import generate_corpus, write_parquet

    rows, cfg = generate_corpus(n_hosts=1, pages_per_host=8)
    pages = str(tmp_path / "pages.parquet")
    write_parquet(rows, pages)
    yml = tmp_path / "crawler.yml"
    yml.write_text(
        "domains:\n"
        + "".join(
            f"  - url: {s.rstrip('/')}\n    seed_urls:\n      - {s}\n"
            for s in cfg["seed_urls"]
        )
        + "output_sink: elasticsearch\n"
        "output_index: web-corpus\n"
        "elasticsearch:\n"
        "  pipeline: my-pipeline\n"
        "  bulk_api:\n"
        "    max_items: 3\n"
        "    max_size_bytes: '1_048_576'\n"  # Ruby-style literal survives
    )

    import jobs.submit_crawl as job

    monkeypatch.setattr(
        "pyspark.sql.SparkSession.builder",
        type("B", (), {"appName": lambda self, n: self,
                       "getOrCreate": lambda self: spark})(),
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    state = str(tmp_path / "state")
    assert job.main([
        "--pages", pages, "--state", state, "--config", str(yml),
        "--max-waves", "10", "--no-lineage",
    ]) == 0

    out = os.path.join(state, "es_bulk")
    pairs, per_file, _ = _read_pairs(out)
    from crawler_spark.state.store import StateStore
    from crawler_spark.plans.crawl import state_docs_view

    n_docs = state_docs_view(StateStore(spark, state)).count()
    assert len(pairs) == n_docs > 0
    assert all(len(ops) <= 3 for ops in per_file.values())
    for action, doc in pairs:
        assert action["index"]["_index"] == "web-corpus"
        assert action["index"]["_id"] == doc["id"]
        assert doc["_reduce_whitespace"] is True  # default params merged
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["pipeline"] == "my-pipeline"
    assert manifest["max_size_bytes"] == 1048576
    assert manifest["completed"]["docs_count"] == len(pairs)
    assert manifest["failed"] == {"docs_count": 0, "docs_volume": 0}
