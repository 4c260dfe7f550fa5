"""Sitemap XML parsing (urlset + sitemapindex, gzip auto-detect).

Equivalent of the reference's crawler-commons-backed sitemap handling
(``lib/crawler/data/crawl_result/sitemap.rb:22-67``): lenient parse,
``sitemapindex`` children become ``sitemap``-type links, ``urlset`` children
become ``content``-type links, and — per sitemap.rb:36-41 — relative ``loc``
values resolve against the **site root**, not the sitemap's own URL.
"""

from __future__ import annotations

import gzip
import io
import re

from .pageextract import resolve_href
from .urlnorm import url_site

_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.IGNORECASE | re.DOTALL)
_SMAP_BLOCK_RE = re.compile(r"<sitemap[\s>](.*?)</sitemap>", re.IGNORECASE | re.DOTALL)
_URL_BLOCK_RE = re.compile(r"<url[\s>](.*?)</url>", re.IGNORECASE | re.DOTALL)
_CDATA_RE = re.compile(r"\A<!\[CDATA\[(.*)\]\]>\Z", re.DOTALL)

# sitemaps.org caps a single sitemap at 50,000 URLs; crawler-commons (and
# therefore the reference, sitemap_spec.rb "more URLs than allowed by the
# spec") returns whatever fits within the limit, without error
MAX_SITEMAP_URLS = 50_000


def maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        try:
            return gzip.GzipFile(fileobj=io.BytesIO(data)).read()
        except OSError:
            return data
    return data


def _unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", '"')
        .replace("&apos;", "'").replace("&amp;", "&")
    )


def parse_sitemap(sitemap_url: str, content: bytes | str):
    """Return (sitemap_links, content_links) — absolute URL strings.

    Tolerant regex-level extraction (the reference uses
    ``SiteMapParser(strict=false, allow_partial=true)``); resolution base is
    the site root.
    """
    if isinstance(content, bytes):
        content = maybe_gunzip(content).decode("utf-8", "replace")
    base = url_site(sitemap_url) + "/"
    sitemap_links: list[str] = []
    content_links: list[str] = []
    is_index = "<sitemapindex" in content.lower()
    blocks = _SMAP_BLOCK_RE.findall(content) if is_index else _URL_BLOCK_RE.findall(content)
    out = sitemap_links if is_index else content_links
    for block in blocks:
        if len(out) >= MAX_SITEMAP_URLS:
            break
        m = _LOC_RE.search(block)
        if not m:
            continue
        loc = m.group(1).strip()
        cm = _CDATA_RE.match(loc)
        # CDATA content is literal (no entity unescaping); plain text gets
        # XML entities decoded (sitemap_spec.rb CDATA contexts)
        loc = cm.group(1).strip() if cm else _unescape(loc)
        if not loc:
            continue
        resolved = resolve_href(base, loc)
        if resolved is not None:
            out.append(resolved)
    return sitemap_links, content_links
