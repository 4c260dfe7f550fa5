"""Sitemap export — publish a crawl's docs as sitemaps.org shards.

The inverse of the sitemap *ingestion* path (SURVEY §2.3 E20,
``functions/sitemaps.py``): any url-bearing frame becomes ``<urlset>``
XML shards plus a ``sitemap_index.xml`` naming them, per the public
sitemaps.org protocol (≤ 50,000 URLs and ≤ 50 MB per file; an index
file lists the shards). A site operator republishing a crawled corpus —
or a crawler seeding a mirror — needs exactly this artifact, and the
round trip through our own parser is a correctness check the tests run.

Scale shape: one range exchange on the URL (shards carry contiguous,
deterministic URL ranges — the CDX layout trade), then each task streams
its shard straight to its own XML file executor-side (no driver
collect). The 50k protocol cap is enforced by sizing the shard count
against an exact row count with slack for range-sampling imbalance, and
re-checked per task (a task over the cap fails loudly rather than
emitting an invalid sitemap).
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROTOCOL_CAP = 50_000


def export_sitemaps(
    df: DataFrame,
    out_dir: str,
    base_url: str = "",
    urls_per_file: int = PROTOCOL_CAP,
    url_col: str = "url",
    lastmod_col: str | None = None,
    slack: float = 0.8,
) -> list[str]:
    """Write ``sitemap-NNNNN.xml`` shards + ``sitemap_index.xml``.

    ``base_url`` prefixes shard locations in the index file (the URL the
    shards will be served from). ``slack`` derates the per-file target so
    range-partition sampling imbalance stays under the effective cap
    (``min(urls_per_file, 50_000)``) — and each task re-checks ROWS
    against that same effective cap (not just the protocol constant), so
    sampling imbalance can never silently emit a shard larger than the
    caller asked for.

    Filesystem contract: shards are written with plain ``open()`` from
    executor tasks and the index from the driver, so ``out_dir`` MUST be
    a filesystem every executor and the driver share (local[*], NFS, or
    a FUSE-mounted object store). On a multi-node cluster without a
    shared mount the shards would land on scattered executor-local disks
    — route ``out_dir`` through a shared mount there.
    Returns the shard paths (driver-side: one small report row per task).
    """
    import math
    import os

    cap = min(urls_per_file, PROTOCOL_CAP)
    target = max(1, int(cap * slack))
    cols = [F.col(url_col).alias("url")]
    if lastmod_col is not None:
        cols.append(F.date_format(F.col(lastmod_col), "yyyy-MM-dd").alias("lastmod"))
    urls = df.select(*cols)
    n = urls.count()
    if n == 0:
        os.makedirs(out_dir, exist_ok=True)
        _write_index(out_dir, base_url, [])
        return []
    n_files = max(1, math.ceil(n / target))
    parted = urls.repartitionByRange(n_files, "url").sortWithinPartitions("url")

    has_lastmod = lastmod_col is not None

    def write_partition(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"sitemap-{pid:05d}.xml")
        rows = 0
        f = None
        try:
            for pdf in it:
                if len(pdf) and f is None:
                    os.makedirs(out_dir, exist_ok=True)
                    f = open(path, "w", encoding="utf-8")
                    f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
                    f.write(
                        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                    )
                rows += len(pdf)
                if rows > cap:
                    raise ValueError(
                        f"sitemap shard {pid} exceeds the per-file cap "
                        f"({rows} > {cap})"
                    )
                for rec in pdf.itertuples(index=False):
                    f.write(f"  <url><loc>{escape(rec.url)}</loc>")
                    if has_lastmod and rec.lastmod is not None:
                        f.write(f"<lastmod>{rec.lastmod}</lastmod>")
                    f.write("</url>\n")
            if f is not None:
                f.write("</urlset>\n")
        finally:
            if f is not None:
                f.close()
        if rows:
            yield pd.DataFrame({"path": [path], "n_urls": [rows]})

    from pyspark.sql import types as T

    report_schema = T.StructType(
        [T.StructField("path", T.StringType()), T.StructField("n_urls", T.LongType())]
    )
    report = parted.mapInPandas(write_partition, report_schema).collect()
    shard_paths = sorted(r["path"] for r in report)
    _write_index(out_dir, base_url, [os.path.basename(p) for p in shard_paths])
    return shard_paths


def _write_index(out_dir: str, base_url: str, shard_names: list[str]) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    prefix = base_url.rstrip("/") + "/" if base_url else ""
    with open(os.path.join(out_dir, "sitemap_index.xml"), "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n')
        for name in shard_names:
            f.write(f"  <sitemap><loc>{escape(prefix + name)}</loc></sitemap>\n")
        f.write("</sitemapindex>\n")
