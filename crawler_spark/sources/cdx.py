"""CDX archive index over crawled pages — the canonical web-archive
lookup artifact (the index format Common Crawl and the Internet Archive
publish next to their WARC sets; spec: iipc/openwayback CDX file format,
SURT canonicalization per the public IA/webarchive-commons convention).

A CDX index is a sorted table keyed by the SURT form of the URL
("Sort-friendly URI Reordering Transform": host labels reversed and
comma-joined, scheme and leading ``www.`` dropped), so that all captures
of one host — and one prefix — are contiguous. The reference crawler has
no archive index; this pairs with ``sources/warc.py`` (export_warc) to
make the crawl output a self-describing web archive.

Everything is built-in string/array expressions inside whole-stage
codegen (regexp_replace / split / reverse / array_join) — no Python in
the row path — and each piece has an exact ANSI-SQL twin, so the driver
oracle replays the transform bit-for-bit.

Scale shape: the SURT key is a pure projection (zero shuffles).
:func:`write_cdx` range-partitions on the key before a within-partition
sort — the standard petabyte archive layout (globally sorted ACROSS
shard boundaries via the range exchange, sorted within each shard by the
local sort; no single-task global sort ever materializes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url: Column) -> Column:
    """SURT canonical key for a URL column.

    ``https://www.sub.Example.com:8080/a/b?q=1`` →
    ``com,example,sub:8080)/a/b?q=1``. Rules (webarchive-commons
    SURT.toSURT, the subset our normalized URLs exercise): drop the
    scheme, lowercase, drop one leading ``www.`` label, reverse the
    remaining host labels joined by commas, keep ``:port`` after the
    reversed host, append ``)`` + path-and-query (``/`` when empty).
    """
    rest = F.lower(F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""))
    hostport = F.substring_index(rest, "/", 1)
    # path+query = everything from the first "/" on; "/" when absent
    path = F.when(
        F.length(rest) > F.length(hostport),
        F.substring(rest, F.length(hostport) + F.lit(1), F.lit(1 << 30)),
    ).otherwise(F.lit("/"))
    host = F.substring_index(hostport, ":", 1)
    port = F.when(
        F.length(hostport) > F.length(host),
        F.substring(hostport, F.length(host) + F.lit(1), F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    host_nw = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host_nw, r"\.")), ",")
    return F.concat(rev, port, F.lit(")"), path)


def cdx_index(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str | None = "text",
) -> DataFrame:
    """Build CDX index rows ``(surt, url, ts, digest)`` from a pages/docs
    frame. ``digest`` is the md5 of the content column (the CDX content
    fingerprint used for revisit-record collapsing); omitted when
    ``content_col`` is None."""
    cols = [
        surt_key(F.col(url_col)).alias("surt"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
    ]
    if content_col is not None:
        cols.append(F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("digest"))
    return df.select(*cols)


def write_cdx(index: DataFrame, path: str, shards: int = 0) -> None:
    """Write the index as globally-ordered CDX shards: range-partition on
    (surt, ts) — shard k's every key precedes shard k+1's — then sort
    within each shard. ``shards=0`` lets AQE/defaults pick the width."""
    parted = (
        index.repartitionByRange(shards, "surt", "ts")
        if shards
        else index.repartitionByRange("surt", "ts")
    )
    parted.sortWithinPartitions("surt", "ts").write.mode("overwrite").parquet(path)
