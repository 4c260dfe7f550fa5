"""Offline fetch + single-pass page parse (S4/S5 + E3-E16/E20 in SURVEY §2).

``fetch_join``: the offline equivalent of the reference's HTTP executor —
the frontier wave joins the prepared ``pages`` table on ``url_hash``; a
missing row is the 404/Error path (http_executor.rb error semantics).
The frontier side of a wave is orders of magnitude smaller than the corpus,
so we broadcast it when small; otherwise it is a shuffle join on the
bucketed hash (AQE re-plans at runtime).

``parse_wave``: one ``mapInPandas`` pass producing every extracted field +
the exploded-ready links array. This mirrors the reference's memoized
one-parse-per-result design (html.rb:25-27) and keeps all row-wise Python
in a single Arrow-batched stage — no per-row Python UDFs anywhere.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import CrawlConfig
from ..functions import urlnorm as U
from ..functions.pageextract import classify_content, extract_page, url_components
from ..functions.sitemaps import parse_sitemap

STATUS_MARK = re.compile(rb"^<!--STATUS:(\d{3})-->")
# corpus stand-in for the Content-Type charset parameter
# (http_utils/response.rb:123-135): pages whose bytes are not UTF-8 carry a
# leading <!--CHARSET:<enc>--> marker; everything else decodes with the
# configured default_encoding
CHARSET_MARK = re.compile(rb"^<!--CHARSET:([A-Za-z0-9_\-]+)-->")


def decode_body(body: bytes, default_encoding: str = "UTF-8") -> tuple[bytes, str]:
    """Strip the charset marker (if any) and return (payload, encoding)."""
    m = CHARSET_MARK.match(body)
    if m:
        return body[m.end():], m.group(1).decode("ascii")
    return body, default_encoding or "UTF-8"


def decode_text(payload: bytes, encoding: str) -> str:
    try:
        return payload.decode(encoding, "replace")
    except LookupError:  # unknown charset label → the reference's fallback
        return payload.decode("utf-8", "replace")

LINK_TYPE = StructType(
    [
        StructField("url", StringType()),
        StructField("nofollow", BooleanType()),
        StructField("pos", IntegerType()),
    ]
)

PARSED_SCHEMA = StructType(
    [
        StructField("norm_url", StringType()),
        StructField("url_hash", StringType()),
        StructField("depth", IntegerType()),
        StructField("seq", LongType()),
        StructField("task_type", StringType()),
        StructField("redirect_chain", ArrayType(StringType())),
        StructField("host_key", StringType()),
        StructField("kind", StringType()),
        StructField("status", IntegerType()),
        StructField("location", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("title", StringType()),
        StructField("body", StringType()),
        StructField("meta_keywords", StringType()),
        StructField("meta_description", StringType()),
        StructField("headings", ArrayType(StringType())),
        StructField("indexed_links", ArrayType(StringType())),
        StructField("extra_fields", MapType(StringType(), StringType())),
        # opt-in full page HTML (document_mapper.rb:76); null unless
        # full_html_extraction_enabled
        StructField("full_html", StringType()),
        StructField("canonical_url", StringType()),
        StructField("meta_nofollow", BooleanType()),
        StructField("meta_noindex", BooleanType()),
        StructField("links", ArrayType(LINK_TYPE)),
        StructField("sitemap_links", ArrayType(StringType())),
        StructField("sitemap_content_links", ArrayType(StringType())),
        # binary download fields (E22, content_extractable_file.rb:20-45)
        StructField("file_name", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("attachment", StringType()),
        # live-mode response validators (RFC 9110 §8.8): stored per URL so
        # revisits revalidate (If-None-Match/If-Modified-Since -> 304)
        # instead of re-downloading; null in offline/corpus mode
        StructField("etag", StringType()),
        StructField("last_modified", StringType()),
    ]
)


def fetch_join(
    wave: DataFrame,
    pages: DataFrame,
    broadcast_wave: bool = True,
    cache_tracker: list | None = None,
) -> DataFrame:
    """Frontier wave ⋈ pages on url_hash (left-outer semantics: misses
    become 404/error rows in the parse stage).

    A naive ``wave.join(pages, 'left')`` cannot broadcast the wave (the
    preserved side of an outer join is never the build side), so Spark
    sort-merge-joins and re-shuffles the ENTIRE corpus every wave — the
    dominant fixed cost per wave once the corpus outgrows the frontier.
    Instead:

    * small wave (``broadcast_wave=True``):
      hits  = ``pages ⋈ broadcast(wave)`` INNER — the wave is the build
      side, the cached corpus streams in place with no shuffle and no
      re-serialization of the html blobs;
      misses = ``wave ⟕̸ broadcast(hit-keys)`` LEFT ANTI — hit-keys are
      wave-sized, so this broadcasts too (hits are cached first so the
      corpus probe runs once).

    * big wave (``broadcast_wave=False``): broadcasting is driver-serial
      work proportional to wave size — at 10^5+ rows it becomes the
      per-wave scaling floor. Instead the wave shuffles once into the
      corpus's own ``HashPartitioning(url_hash, N)`` (prepare_pages
      repartitions + caches the corpus exactly so; on a real cluster both
      tables are Iceberg-bucketed on url_hash) and a SHUFFLED_HASH inner
      join builds the hash table from the *wave* partition while the html
      blobs stream in place — no corpus shuffle, no corpus sort, no
      driver-side collect. Misses come from a co-partitioned LEFT ANTI on
      the same key (zero additional shuffles).
    """
    page_cols = pages.select("url_hash", "html", "warc_ts")
    if not broadcast_wave:
        # same partition count prepare_pages used → co-partitioned join
        n_part = int(wave.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
        wave_p = wave.repartition(n_part, "url_hash").cache()
        if cache_tracker is not None:
            cache_tracker.append(wave_p)
        hits = page_cols.join(wave_p.hint("shuffle_hash"), on="url_hash", how="inner")
        # misses probe the CORPUS key column (column-pruned from the
        # corpus cache, co-partitioned on url_hash → zero-shuffle anti
        # join) instead of the hit rows — the hit rows with their html
        # payloads are never cached or computed twice.
        misses = wave_p.join(
            pages.select("url_hash"), on="url_hash", how="left_anti"
        )
    else:
        wave_p = wave
        hits = page_cols.join(F.broadcast(wave_p), on="url_hash", how="inner")
        hits = hits.cache()
        if cache_tracker is not None:
            cache_tracker.append(hits)
        misses = wave_p.join(
            F.broadcast(hits.select("url_hash")), on="url_hash", how="left_anti"
        )
    misses = misses.select(
        "*",
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
    )
    return hits.select(misses.columns).unionByName(misses)


def _clean_str(v):
    """Pandas surfaces missing object cells as float NaN; a string field
    must carry None instead."""
    return None if v is None or isinstance(v, float) else v


def _parse_partition(batches: Iterator[pd.DataFrame], cfg: CrawlConfig) -> Iterator[pd.DataFrame]:
    from ..functions.extraction import compile_rulesets

    if cfg.html_backend == "auto":
        # executor-side, idempotent, import-gated: installs the fastest
        # importable C parser (lxml/libxml2) into the DOM seam, or leaves
        # the built-in parser when none is available (htmlkit/backends.py).
        # Per-document HTML parse is the dominant 100 TB cost (the
        # reference runs on jsoup, a compiled parser — html.rb:26);
        # 'builtin' stays the default byte-identity contract.
        from ..htmlkit.backends import install_best_backend

        install_best_backend()
    # fused single-pass extraction (functions/fastextract.py): tokenizer +
    # collection + text assembly in one scan, DOM allocated only for pages
    # that bail (restructure shapes, directives). Field-identity with
    # extract_page is pinned by tests/test_fastextract.py. Skipped when a
    # C tree builder is installed — the DOM path is the fast one then.
    from ..htmlkit import dom as _dom

    fused = None
    if cfg.fused_extract and _dom._tree_builder is None:
        from ..functions.fastextract import extract_page_fast

        fused = extract_page_fast
    rulesets = compile_rulesets(cfg.extraction_rules)  # once per partition
    # per-site config lookups cost a URL split each; skip them entirely in
    # the (common) no-exclude-tags / no-extraction-rules deployment
    excl_map = cfg.exclude_tags or None
    rules_map = rulesets or None
    base_rec = {
        "norm_url": None,
        "url_hash": None,
        "depth": None,
        "seq": None,
        "task_type": None,
        "redirect_chain": None,
        "host_key": None,
        "kind": "error",
        "status": 404,
        "location": None,
        "warc_ts": None,
        "title": None,
        "body": None,
        "meta_keywords": None,
        "meta_description": None,
        "headings": None,
        "indexed_links": None,
        "extra_fields": None,
        "canonical_url": None,
        "meta_nofollow": None,
        "meta_noindex": None,
        "links": None,
        "sitemap_links": None,
        "sitemap_content_links": None,
        "file_name": None,
        "content_type": None,
        "content_length": None,
        "attachment": None,
        "etag": None,
        "last_modified": None,
    }
    for pdf in batches:
        out = []
        for row in pdf.itertuples(index=False):
            norm_url = row.norm_url
            rec = base_rec.copy()
            rec["norm_url"] = norm_url
            rec["url_hash"] = row.url_hash
            rec["depth"] = int(row.depth)
            rec["seq"] = int(row.seq)
            rec["task_type"] = row.task_type
            rec["redirect_chain"] = (
                list(row.redirect_chain) if row.redirect_chain is not None else []
            )
            rec["host_key"] = U.url_host_key(norm_url)
            rec["warc_ts"] = row.warc_ts
            rec["etag"] = _clean_str(getattr(row, "etag", None))
            rec["last_modified"] = _clean_str(getattr(row, "last_modified", None))
            html = row.html
            if html is None:
                out.append(rec)
                continue
            body = bytes(html)
            m = STATUS_MARK.match(body)
            if m:
                rec["status"] = int(m.group(1))
                if rec["status"] == 304:
                    # Not Modified on a conditional revisit: the stored
                    # document stays live (docs MERGE emits nothing, the
                    # purge stage counts it as refreshed)
                    rec["kind"] = "not_modified"
                out.append(rec)
                continue
            if len(body) >= cfg.max_response_size:
                # ResponseTooLarge (response.rb:166-171): the download is
                # aborted at the cap and the fetch becomes an Error result
                # — no parse, no links, output gate denies (error_denied)
                rec["status"] = 599
                out.append(rec)
                continue
            body, enc = decode_body(body, cfg.default_encoding)
            kind, location = classify_content(norm_url, decode_text(body[:512], enc))
            rec["status"] = 301 if kind == "redirect" else 200
            rec["kind"] = kind
            if kind == "redirect":
                # fetch-time redirect budget (http_executor.rb:57-70): a
                # redirect response whose chain would exceed max_redirects
                # becomes a RedirectError — not followed, no doc
                if len(rec["redirect_chain"]) + 1 > cfg.max_redirects:
                    rec["kind"] = "error"
                    rec["location"] = None
                else:
                    rec["location"] = U.join_url(norm_url, location) if location else None
                out.append(rec)
                continue
            if row.task_type == "sitemap" or kind == "sitemap":
                rec["kind"] = "sitemap"
                sm, cl = parse_sitemap(norm_url, body)
                rec["sitemap_links"] = sm
                rec["sitemap_content_links"] = cl
                out.append(rec)
                continue
            if kind == "robots_txt":
                out.append(rec)
                continue
            if kind == "file":
                # binary download (E22): base64 + metadata when the MIME
                # type is configured for extraction, else unsupported
                # content type (http_executor.rb:86-98 dispatch; output
                # gate denies unsupported — rule_engine/base.rb:65-82)
                mime = location
                payload = body[body.find(b"-->") + 3:]
                if cfg.binary_content_extraction_enabled and mime in (
                    cfg.binary_content_extraction_mime_types or ()
                ):
                    import base64 as _b64

                    rec.update(
                        file_name=U.url_path(norm_url).rsplit("/", 1)[-1],
                        content_type=mime,
                        content_length=len(payload),
                        attachment=_b64.b64encode(payload).decode("ascii"),
                    )
                else:
                    rec["kind"] = "unsupported"
                out.append(rec)
                continue
            html_text = decode_text(body, enc)
            site = U.url_site(norm_url) if (excl_map or rules_map) else None
            ex_tags = excl_map.get(site) if excl_map else None
            rl_sets = rules_map.get(site) if rules_map else None
            page = None
            if fused is not None and ex_tags is None and rl_sets is None:
                page = fused(
                    norm_url,
                    html_text,
                    max_extracted_links=cfg.max_extracted_links_count,
                    max_indexed_links=cfg.max_indexed_links_count,
                    max_headings=cfg.max_headings_count,
                    max_title_size=cfg.max_title_size,
                    max_body_size=cfg.max_body_size,
                    max_keywords_size=cfg.max_keywords_size,
                    max_description_size=cfg.max_description_size,
                    max_elastic_tag_size=cfg.max_elastic_tag_size,
                    max_data_attribute_size=cfg.max_data_attribute_size,
                )
            if page is None:
                page = extract_page(
                    norm_url,
                    html_text,
                    max_extracted_links=cfg.max_extracted_links_count,
                    max_indexed_links=cfg.max_indexed_links_count,
                    max_headings=cfg.max_headings_count,
                    max_title_size=cfg.max_title_size,
                    max_body_size=cfg.max_body_size,
                    max_keywords_size=cfg.max_keywords_size,
                    max_description_size=cfg.max_description_size,
                    max_elastic_tag_size=cfg.max_elastic_tag_size,
                    max_data_attribute_size=cfg.max_data_attribute_size,
                    exclude_tags=ex_tags,
                    extraction_rulesets=rl_sets,
                )
            rec.update(
                {
                    "title": page["title"],
                    "body": page["body"],
                    "meta_keywords": page["meta_keywords"],
                    "meta_description": page["meta_description"],
                    "headings": page["headings"],
                    "indexed_links": page["indexed_links"],
                    "extra_fields": page["extra_fields"] or None,
                    "canonical_url": page["canonical_url"],
                    "meta_nofollow": page["meta_nofollow"],
                    "meta_noindex": page["meta_noindex"],
                    "links": [
                        (lk["url"], lk["nofollow"], lk["pos"])
                        for lk in page["links"]
                        if lk["url"] is not None
                    ],
                }
            )
            if cfg.full_html_extraction_enabled:
                rec["full_html"] = html_text
            out.append(rec)
        yield pd.DataFrame(out, columns=[f.name for f in PARSED_SCHEMA.fields])


def parse_wave(fetched: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Arrow-batched parse of a fetched wave → PARSED_SCHEMA rows."""
    return fetched.mapInPandas(lambda it: _parse_partition(it, cfg), schema=PARSED_SCHEMA)


def doc_eligible(cfg: CrawlConfig):
    """Output-gate predicate over PARSED_SCHEMA rows (document_mapper.rb:
    35-102, rule_engine/base.rb:65-82): HTML 2xx not noindex, or
    extractable binary file, redirect chain within budget. Shared by the
    docs view and state compaction (which must preserve the latest
    doc-eligible row per id, not just the latest row)."""
    return (
        (
            ((F.col("kind") == "html") & (~F.col("meta_noindex")))
            | ((F.col("kind") == "file") & F.col("attachment").isNotNull())
        )
        & (F.col("status") >= 200) & (F.col("status") < 300)
        & (F.size(F.coalesce(F.col("redirect_chain"), F.array())) <= cfg.max_redirects)
    )


def docs_from_parsed(
    parsed: DataFrame, cfg: CrawlConfig, extra_cols: tuple = ()
) -> DataFrame:
    """Document mapping + output gate (document_mapper.rb:35-102,
    rule_engine/base.rb:65-82): HTML 2xx (not noindex) or extractable
    binary file, redirect chain within budget. URL components derived
    JVM-side from the normalized URL.

    Applied at READ time over the per-wave ``parsed`` table (merge-on-read:
    the crawl writes one wave file; docs are a filter+projection view of
    it). ``extra_cols`` passes bookkeeping columns (e.g. the ``wave``
    partition column) through the projection."""
    d = parsed.filter(doc_eligible(cfg))
    path = F.regexp_replace(
        F.regexp_extract(F.col("norm_url"), r"^[a-z+.-]+://[^/]+(/[^?#]*)?", 1), r"\?.*$", ""
    )
    comps = F.split(path, "/")
    host_port = F.regexp_extract(F.col("norm_url"), r"^[a-z+.-]+://([^/?#]+)", 1)
    host_nouser = F.element_at(F.split(host_port, "@"), -1)
    host = F.element_at(F.split(host_nouser, ":"), 1)
    port_str = F.regexp_extract(host_nouser, r":(\d+)$", 1)
    scheme = F.element_at(F.split(F.col("norm_url"), "://"), 1)
    inferred_port = F.when(port_str != "", port_str.cast("int")).otherwise(
        F.when(scheme == "https", F.lit(443)).otherwise(F.lit(80))
    )
    nullify = lambda c: F.when(F.length(c) > 0, c)  # noqa: E731  blank-strip (mapper:110-112)
    return d.select(
        F.col("url_hash").alias("id"),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ssXXX").alias("last_crawled_at"),
        nullify(F.col("title")).alias("title"),
        nullify(F.col("body")).alias("body"),
        nullify(F.col("meta_keywords")).alias("meta_keywords"),
        nullify(F.col("meta_description")).alias("meta_description"),
        F.col("indexed_links").alias("links"),
        F.col("headings").alias("headings"),
        F.col("norm_url").alias("url"),
        scheme.alias("url_scheme"),
        host.alias("url_host"),
        inferred_port.alias("url_port"),
        nullify(path).alias("url_path"),
        nullify(F.try_element_at(comps, F.lit(2))).alias("url_path_dir1"),
        nullify(F.try_element_at(comps, F.lit(3))).alias("url_path_dir2"),
        nullify(F.try_element_at(comps, F.lit(4))).alias("url_path_dir3"),
        F.col("extra_fields"),
        F.col("depth"),
        F.col("seq"),
        # binary-file docs (document_mapper.rb:80-87); null on html docs
        F.col("file_name"),
        F.col("content_type"),
        F.col("content_length"),
        F.col("attachment").alias("_attachment"),
        *([F.col("full_html")] if cfg.full_html_extraction_enabled else []),
        *[F.col(c) for c in extra_cols],
    )


__all__ = ["fetch_join", "parse_wave", "docs_from_parsed", "PARSED_SCHEMA", "url_components"]
