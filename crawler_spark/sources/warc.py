"""WARC ingestion source: raw Common-Crawl archives → the `pages` table.

The engine's input contract is the ``pages(url, warc_ts, html, text, lang)``
table (BASELINE.json input_hint). Common Crawl publishes its corpus as WARC
files (ISO 28500 — the public spec this parser implements), so this module
is the ingestion step that lands raw archives into that schema:

    spark.read.format("binaryFile") over a WARC path/glob
      → mapInPandas record parser (Arrow-batched, one task per file)
      → pages rows (text/lang null — both are downstream derivations)
      → prepare_pages() for norm_url/url_hash + bucketing

Scale shape: WARC files are the parallelism unit — Common Crawl segments
are ~1 GB each, so 100 TB ≈ 10^5 files ≈ 10^5 tasks, which is exactly how
public CC-scale Spark jobs schedule (one non-splittable archive per task;
``binaryFile`` keeps whole-file bytes in one row). ``.warc.gz`` members are
concatenated per-record gzip streams, so a whole-file ``gzip.decompress``
(multi-member capable) is correct. The parse is per-record imperative by
nature (like HTML parsing) and stays in Arrow-batched Python; everything
downstream is relational.
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record. Headers are lower-cased;
    malformed trailing bytes end the iteration rather than raising (a
    truncated archive should yield its good prefix)."""
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        end = data.find(b"\r\n\r\n", pos)
        if end < 0:
            break
        lines = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            break
        headers: dict = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            break
        if end + 4 + clen > n:
            break  # truncated final record: declared length exceeds buffer
        payload = data[end + 4 : end + 4 + clen]
        pos = end + 4 + clen
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from an application/http payload."""
    sep = payload.find(b"\r\n\r\n")
    return payload[sep + 4 :] if sep >= 0 else payload


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WARC.gz files (path or glob) into the pages schema.
    Only ``WARC-Type: response`` records become pages; request/warcinfo/
    metadata records are skipped, matching how Common Crawl's own tooling
    selects fetch bodies."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(_parse_warc_partition, schema=PAGES_SCHEMA)


def stream_warc(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming WARC ingestion: archives appearing under ``path`` become
    pages rows incrementally (continuous Common-Crawl-drop shape). Same
    Arrow-batched record parser as the batch reader; the file source's
    checkpoint makes each archive exactly-once. binaryFile streaming
    needs the source schema spelled out (no files may exist yet)."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_parse_warc_partition, schema=PAGES_SCHEMA)


def _parse_warc_partition(it):
    import pandas as pd

    for pdf in it:
        urls, tss, bodies = [], [], []
        for fpath, content in zip(pdf["path"], pdf["content"]):
            data = bytes(content)
            if fpath.endswith(".gz"):
                try:
                    data = gzip.decompress(data)
                except OSError:
                    continue  # corrupt member: skip the file, keep the job
            for headers, payload in iter_warc_records(data):
                if headers.get("warc-type") != "response":
                    continue
                url = headers.get("warc-target-uri")
                if not url:
                    continue
                body = payload
                if headers.get("content-type", "").startswith("application/http"):
                    body = _http_body(payload)
                urls.append(url)
                tss.append(headers.get("warc-date"))
                bodies.append(body)
        ts = pd.to_datetime(pd.Series(tss, dtype="object"), utc=True, errors="coerce")
        yield pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": ts.dt.tz_localize(None) if len(ts) else ts,
                "html": pd.Series(bodies, dtype="object"),
                "text": pd.Series([None] * len(urls), dtype="object"),
                "lang": pd.Series([None] * len(urls), dtype="object"),
            }
        )


def write_warc(path: str, records: list[dict], compress: bool = False) -> None:
    """Serialize response records to a WARC file (test/fixture utility and
    round-trip check). Each record: {url, date, body(bytes), http(bool)}."""
    out = bytearray()
    for r in records:
        body = r["body"]
        if r.get("http", True):
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
            ctype = "application/http; msgtype=response"
        else:
            payload = body
            ctype = "text/html"
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('type', 'response')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        out += head + payload + b"\r\n\r\n"
    data = bytes(out)
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def export_warc(df: DataFrame, out_dir: str, compress: bool = True) -> DataFrame:
    """Distributed WARC export sink: the inverse of ``read_warc``. Any
    pages-shaped frame (url, warc_ts, html) becomes one WARC file per
    partition, written executor-side (no driver collect — at 100 TB each
    task streams its partition straight to its own archive, the same
    one-archive-per-task unit the ingestion side schedules on).

    ``.warc.gz`` output is written as per-record gzip members — Common
    Crawl's convention, which keeps records independently seekable and is
    exactly what ``read_warc``'s multi-member decompress consumes.

    Returns a 1-row-per-file frame (path, n_records); trigger with
    ``.collect()``. Empty partitions produce no file.
    """
    import os

    suffix = ".warc.gz" if compress else ".warc"

    def write_partition(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        n = 0
        f = None
        try:
            for pdf in it:
                if len(pdf) and f is None:
                    os.makedirs(out_dir, exist_ok=True)
                    f = open(path, "wb")
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                    body = bytes(html) if html is not None else b""
                    payload = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                        + body
                    )
                    date = (
                        ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                        if ts is not None and ts == ts
                        else "1970-01-01T00:00:00Z"
                    )
                    head = (
                        "WARC/1.0\r\n"
                        "WARC-Type: response\r\n"
                        f"WARC-Target-URI: {url}\r\n"
                        f"WARC-Date: {date}\r\n"
                        "Content-Type: application/http; msgtype=response\r\n"
                        f"Content-Length: {len(payload)}\r\n"
                        "\r\n"
                    ).encode()
                    rec = head + payload + b"\r\n\r\n"
                    f.write(gzip.compress(rec) if compress else rec)
                    n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            yield pd.DataFrame({"path": [path], "n_records": [n]})

    return df.select("url", "warc_ts", "html").mapInPandas(
        write_partition, schema="path string, n_records long"
    )
