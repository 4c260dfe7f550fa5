"""Single-pass page extraction: one parse → every per-page field.

Pure-Python equivalent of ``Crawler::Data::CrawlResult::HTML``
(``lib/crawler/data/crawl_result/html.rb``) + the HTML half of
``Crawler::DocumentMapper`` (``lib/crawler/document_mapper.rb:35-102``),
memoized-parse style (html.rb:25-27): parse once, derive all fields.

Used identically by the Spark ``mapInPandas`` operator
(:mod:`crawler_spark.operators.parse`) and the in-repo reference simulator
(:mod:`crawler_spark.oracle.simulator`) so both sides share one extraction
definition and the E2E test checks crawl *logic*, not parser drift; the
extraction itself is pinned by golden tests ported from the reference spec.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from ..htmlkit import dom
from .textextract import (
    NON_CONTENT_TAGS,
    limit_bytesize,
    node_descendant_text,
    remove_tags,
    squish,
    transform,
)
from .urlnorm import split_url, try_normalize

# lib/constants.rb:11-37
RESERVED_FIELD_NAMES = frozenset(
    """id any all none or and not additional_urls body_content body domains
    headings last_crawled_at links meta_description meta_keywords title url
    url_host url_path url_path_dir1 url_path_dir2 url_path_dir3 url_port
    url_scheme""".split()
)

_FIELD_NAME_RE = re.compile(r"\A[a-z0-9_]+\Z")


def valid_field_name(name: str) -> bool:
    """html.rb:173-185."""
    if not name or not _FIELD_NAME_RE.match(name) or name.startswith("_") or len(name) > 64:
        return False
    return name not in RESERVED_FIELD_NAMES


def element_text(el) -> str:
    """jsoup ``Element#text()``-alike: concatenated descendant text,
    whitespace-squished (sufficient for headings / data attributes in the
    corpus — html.rb:211, 162)."""
    parts = []
    stack = [el]
    while stack:
        n = stack.pop()
        if isinstance(n, dom.Text):
            parts.append(n.data)
        elif isinstance(n, dom.Element):
            if n.name in ("script", "style"):
                continue
            if n.name in ("br", "hr"):
                parts.append(" ")
            stack.extend(reversed(n.children))
    return squish("".join(parts))


def _first_meta_content(doc, name: str):
    for el in doc.iter_elements("meta"):
        if el.attr("name").lower() == name and "content" in el.attrs:
            return el.attrs["content"]
    return None


def _meta_robots_contains(doc, token: str) -> bool:
    for el in doc.iter_elements("meta"):
        if el.attr("name").lower() == "robots" and token in el.attr("content").lower():
            return True
    return False


def resolve_href(base_url: str, href: str):
    """Link#to_url (link.rb:59-66): join, un-normalized. None if invalid."""
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    try:
        return urljoin(base_url, href)
    except ValueError:
        return None


def compute_base_url(doc, page_url: str) -> str:
    """html.rb:53-71: first <base href>, possibly relative (completed with
    the page's site), else the page URL."""
    for el in doc.iter_elements("base"):
        href = el.attrs.get("href", "").strip()
        if href:
            resolved = resolve_href(page_url, href)
            if resolved is not None:
                return resolved
            break
    return page_url


def extract_page(
    page_url: str,
    html: str,
    *,
    max_extracted_links: int = 1000,
    max_indexed_links: int = 25,
    max_headings: int = 25,
    max_title_size: int = 1000,
    max_body_size: int = 5 * 1024 * 1024,
    max_keywords_size: int = 512,
    max_description_size: int = 1024,
    max_elastic_tag_size: int = 512,
    max_data_attribute_size: int = 512,
    exclude_tags=None,
    extraction_rulesets=None,
) -> dict:
    """Parse once, return every extracted field.

    Returns dict with keys: ``base_url, links`` (list of
    ``(href, resolved_url, rel_nofollow, pos)`` for the first
    ``max_extracted_links`` a[href] in document order, invalid resolutions
    carried as ``resolved_url=None``), ``canonical_url, meta_nofollow,
    meta_noindex, title, body, meta_keywords, meta_description, headings,
    indexed_links, extra_fields``.
    """
    doc = dom.parse(html)
    page_base = compute_base_url(doc, page_url)

    # --- links (html.rb:74-94): a[href] doc order, Set-dedup, cap ---------
    links = []
    seen_link_keys = set()
    limit_reached = False
    for a in doc.iter_elements("a"):
        if "href" not in a.attrs:
            continue
        href = a.attrs["href"]
        rel = squish(a.attr("rel")).lower().split()
        key = (href, tuple(rel), element_text(a))  # Link Set identity proxy
        if key in seen_link_keys:
            continue
        seen_link_keys.add(key)
        links.append(
            {
                "href": href,
                "url": resolve_href(page_base, href),
                "nofollow": "nofollow" in rel,
                "pos": len(links),
            }
        )
        if max_extracted_links and len(links) >= max_extracted_links:
            limit_reached = True
            break

    # indexed links (html.rb:97-104 + document_mapper links limit): first-N
    # *valid* links in doc order, then string-sorted
    valid_urls = []
    for lk in links:
        if lk["url"] is not None:
            valid_urls.append(lk["url"])
            if len(valid_urls) >= max_indexed_links:
                break
    indexed_links = sorted(valid_urls)

    # canonical (html.rb:107-117) — resolved against the page URL (not base)
    canonical_url = None
    for el in doc.iter_elements("link"):
        if "canonical" in el.attr("rel").lower().split() and el.attrs.get("href", "").strip():
            canonical_url = resolve_href(page_url, el.attrs["href"])
            break

    meta_nofollow = _meta_robots_contains(doc, "nofollow")
    meta_noindex = _meta_robots_contains(doc, "noindex")

    title_tag = doc.find_first("title")
    title = limit_bytesize(node_descendant_text(title_tag) if title_tag else "", max_title_size)

    body_doc = doc
    if exclude_tags:
        body_doc = remove_tags(doc, exclude_tags)
    body_tag = dom.body_of(body_doc)
    if body_tag is None:
        body = ""
    else:
        body_tag = transform(body_tag)
        body = limit_bytesize(node_descendant_text(body_tag), max_body_size)

    # headings (html.rb:204-218): first N non-empty h1..h6, set-deduped
    headings = []
    hseen = set()
    real_body = dom.body_of(doc)
    if real_body is not None:
        for h in real_body.iter_elements("h1", "h2", "h3", "h4", "h5", "h6"):
            t = element_text(h)
            if not t or t in hseen:
                continue
            hseen.add(t)
            headings.append(t)
            if len(headings) >= max_headings:
                break

    meta_keywords = _first_meta_content(doc, "keywords")
    meta_keywords = limit_bytesize(meta_keywords, max_keywords_size) if meta_keywords else None
    meta_description = _first_meta_content(doc, "description")
    meta_description = (
        limit_bytesize(meta_description, max_description_size) if meta_description else None
    )

    # elastic meta tags (html.rb:141-153) + body data attributes (155-171)
    extra_fields = {}
    for el in doc.iter_elements("meta"):
        if "elastic" in el.classes() and "name" in el.attrs and "content" in el.attrs:
            nm = el.attrs["name"]
            if valid_field_name(nm):
                extra_fields[nm] = limit_bytesize(el.attrs["content"], max_elastic_tag_size)
    if real_body is not None:
        for el in real_body.iter_elements():
            if el.has_attr("data-elastic-name"):
                nm = el.attr("data-elastic-name")
                if valid_field_name(nm):
                    extra_fields[nm] = limit_bytesize(element_text(el), max_data_attribute_size)

    # extraction rules merge LAST, over meta tags / data attributes
    # (document_mapper.rb:36-41 merges extraction_rule_fields after
    # html_fields). Array values (join_as=array) are JSON-encoded because
    # the docs column is map<string,string>.
    if extraction_rulesets:
        import json as _json

        from .extraction import extract_fields

        for k, v in extract_fields(extraction_rulesets, page_url, doc).items():
            extra_fields[k] = v if isinstance(v, str) else _json.dumps(v)

    return {
        "base_url": page_base,
        "links": links,
        "links_limit_reached": limit_reached,
        "canonical_url": canonical_url,
        "meta_nofollow": meta_nofollow,
        "meta_noindex": meta_noindex,
        "title": title,
        "body": body,
        "meta_keywords": meta_keywords,
        "meta_description": meta_description,
        "headings": headings,
        "indexed_links": indexed_links,
        "extra_fields": extra_fields,
    }


def url_components(normalized_url: str) -> dict:
    """document_mapper.rb:89-102."""
    scheme, _u, host, port, path, _q, _f = split_url(normalized_url)
    comps = path.split("/") if path else []
    inferred = int(port) if port else {"http": 80, "https": 443}.get(scheme)
    def _at(i):
        return comps[i] if len(comps) > i and comps[i] else None
    return {
        "url": normalized_url,
        "url_scheme": scheme,
        "url_host": host,
        "url_port": inferred,
        "url_path": path or None,
        "url_path_dir1": _at(1),
        "url_path_dir2": _at(2),
        "url_path_dir3": _at(3),
    }


# --- offline-fetch content typing (fixture convention) --------------------

REDIRECT_MARK = "<!--REDIRECT:"


def classify_content(url: str, html_text: str) -> tuple[str, str | None]:
    """Map an offline `pages` row to a crawl-result kind.

    The pages table (input_hint schema) has no status/content-type column, so
    the corpus encodes them conventionally, mirroring how the reference's
    integration specs encode site behavior in the Faux DSL
    (spec/support/faux/*): a leading ``<!--REDIRECT:<location>-->`` comment
    marks a 3xx with that Location; ``/robots.txt`` paths are robots bodies;
    ``*.xml``/leading ``<?xml`` are sitemaps; everything else is HTML.

    Returns (kind, extra) with kind ∈ html|sitemap|robots_txt|redirect|file;
    ``extra`` is the Location for redirects, the MIME type for files
    (``<!--MIME:application/pdf-->`` prefix marks a binary download — the
    ContentExtractableFile path, content_extractable_file.rb:20-45), else
    None.
    """
    if html_text.startswith(REDIRECT_MARK):
        end = html_text.find("-->")
        return "redirect", html_text[len(REDIRECT_MARK) : end].strip()
    if html_text.startswith("<!--MIME:"):
        end = html_text.find("-->")
        return "file", html_text[9:end].strip()
    _s, _u, _h, _p, path, _q, _f = split_url(url)
    if path.endswith("/robots.txt"):
        return "robots_txt", None
    if path.endswith(".xml") or path.endswith(".xml.gz") or html_text.lstrip()[:5] == "<?xml":
        return "sitemap", None
    return "html", None
