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
    EXCLUDE_ATTR,
    INCLUDE_ATTR,
    NON_CONTENT_TAGS,
    limit_bytesize,
    node_descendant_text,
    remove_tags,
    squish,
    transform,
)

_HEADING_NAMES = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
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


_FAST_BASE_RE = re.compile(r"^(https?)://[^/?#]*")


def make_resolver(base_url: str):
    """Per-page href resolver with a fast path for the two shapes that
    dominate crawl corpora (site-absolute ``/path`` and full ``http(s)://``
    URLs), falling back to :func:`resolve_href`/``urljoin`` for anything
    where RFC 3986 resolution could differ (dot segments, relative paths,
    protocol-relative, exotic schemes, uppercase scheme)."""
    m = _FAST_BASE_RE.match(base_url)
    if m is None:
        return lambda href: resolve_href(base_url, href)
    site = m.group(0)
    scheme = m.group(1)

    def resolve(href):
        if href is None:
            return None
        href = href.strip()
        if not href:
            return None
        if "/." not in href:  # urljoin applies remove_dot_segments
            c0 = href[0]
            if c0 == "/":
                if href.startswith("//"):
                    return scheme + ":" + href
                return site + href
            if href.startswith("http://") or href.startswith("https://"):
                return href
        try:
            return urljoin(base_url, href)
        except ValueError:
            return None

    return resolve


# Addressable::URI rejects malformed percent-escapes; urljoin does not —
# mirror the rejection so an invalid <base href> falls back to the page URL
_BAD_ESCAPE_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")


def compute_base_url(doc, page_url: str) -> str:
    """html.rb:53-71: the FIRST <base> element carrying an href attribute
    decides (jsoup ``base[href]`` selector) — later base tags are never
    consulted, so an empty or unparseable href falls back to the page URL.
    A relative href completes against the page's site; whitespace is
    stripped."""
    for el in doc.iter_elements("base"):
        if "href" not in el.attrs:
            continue
        href = (el.attrs.get("href") or "").strip()
        if href and not _BAD_ESCAPE_RE.search(href):
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

    Single collection walk over the tree (links, canonical, metas, title,
    base, headings, data attributes, directive detection) + the body-text
    walk — the parse-once/derive-all design of html.rb:25-27 taken one step
    further for the mapInPandas hot path.
    """
    doc = dom.parse(html)

    # --- one pre-order walk collecting every per-element signal -----------
    raw_links: list[tuple] = []  # (href, rel_tuple, nofollow)
    # Link-Set identity (link.rb Set semantics) is (href, rel, anchor-text),
    # but anchor text only disambiguates when (href, rel) collides — so the
    # element_text walk is deferred to the (rare) collision instead of paid
    # for every anchor (it was ~13% of extract_page on the bench corpus).
    link_groups: dict = {}  # (href, rel) -> accepted <a> nodes
    link_texts: dict = {}  # (href, rel) -> texts of accepted nodes (lazy)
    limit_reached = False
    links_open = True
    base_href = None
    canonical_href = None
    robots_contents: list[str] = []
    meta_keywords = None
    kw_seen = False
    meta_description = None
    desc_seen = False
    elastic_metas: list[tuple] = []  # (name, content) doc order
    data_attrs: list[tuple] = []  # (name, element) doc order, body only
    title_tag = None
    headings: list[str] = []
    hseen: set = set()
    headings_open = True
    body_el = None
    has_directives = False

    _Element = dom.Element
    stack = [(c, False) for c in reversed(doc.children)]
    while stack:
        n, in_body = stack.pop()
        if n.__class__ is not _Element:
            continue
        name = n._name
        attrs = n.attrs
        if attrs:
            if EXCLUDE_ATTR in attrs or INCLUDE_ATTR in attrs:
                has_directives = True
            if in_body and "data-elastic-name" in attrs:
                data_attrs.append((attrs["data-elastic-name"], n))
        if name == "a":
            if links_open and "href" in attrs:
                href = attrs["href"]
                # str.split() splits on any whitespace run and strips ends,
                # so the previous squish() pre-pass was redundant
                rel = tuple(attrs.get("rel", "").lower().split())
                key = (href, rel)
                group = link_groups.get(key)
                if group is None:
                    link_groups[key] = [n]
                    accept = True
                else:
                    texts = link_texts.get(key)
                    if texts is None:
                        texts = {element_text(x) for x in group}
                        link_texts[key] = texts
                    t = element_text(n)
                    accept = t not in texts
                    if accept:
                        texts.add(t)
                        group.append(n)
                if accept:
                    raw_links.append((href, "nofollow" in rel))
                    if max_extracted_links and len(raw_links) >= max_extracted_links:
                        limit_reached = True
                        links_open = False
        elif name == "meta":
            nm = attrs.get("name", "").lower()
            if nm == "robots":
                robots_contents.append(attrs.get("content", "").lower())
            elif nm == "keywords":
                if not kw_seen and "content" in attrs:
                    meta_keywords, kw_seen = attrs["content"], True
            elif nm == "description":
                if not desc_seen and "content" in attrs:
                    meta_description, desc_seen = attrs["content"], True
            if "elastic" in attrs.get("class", "").split() and "name" in attrs and "content" in attrs:
                elastic_metas.append((attrs["name"], attrs["content"]))
        elif name == "link":
            if canonical_href is None and "canonical" in attrs.get("rel", "").lower().split() \
                    and attrs.get("href", "").strip():
                canonical_href = attrs["href"]
        elif name == "title":
            if title_tag is None:
                title_tag = n
        elif name == "base":
            if base_href is None and attrs.get("href", "").strip():
                base_href = attrs["href"].strip()
        elif in_body and headings_open and name in _HEADING_NAMES:
            t = element_text(n)
            if t and t not in hseen:
                hseen.add(t)
                headings.append(t)
                if len(headings) >= max_headings:
                    headings_open = False
        elif name == "body" and body_el is None:
            body_el = n
            in_body = True
        children = n.children
        if children:
            for child in reversed(children):
                stack.append((child, in_body))

    # base URL (html.rb:53-71): first <base href>, possibly relative
    if base_href is not None:
        resolved = resolve_href(page_url, base_href)
        page_base = resolved if resolved is not None else page_url
    else:
        page_base = page_url

    # --- links (html.rb:74-94): resolve against base, doc order, cap ------
    resolver = make_resolver(page_base)
    links = [
        {"href": href, "url": resolver(href), "nofollow": nofollow, "pos": pos}
        for pos, (href, nofollow) in enumerate(raw_links)
    ]

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
    canonical_url = resolve_href(page_url, canonical_href) if canonical_href else None

    meta_nofollow = any("nofollow" in c for c in robots_contents)
    meta_noindex = any("noindex" in c for c in robots_contents)

    title = limit_bytesize(node_descendant_text(title_tag) if title_tag else "", max_title_size)

    if exclude_tags:
        body_tag = dom.body_of(remove_tags(doc, exclude_tags))
        body = (
            limit_bytesize(node_descendant_text(transform(body_tag)), max_body_size)
            if body_tag is not None
            else ""
        )
    elif body_el is None:
        body = ""
    else:
        # directive-free pages (the vast majority) skip the transformer's
        # deep copy — transform() is the identity on them by construction
        body_tag = transform(body_el) if has_directives else body_el
        body = limit_bytesize(node_descendant_text(body_tag), max_body_size)

    # elastic meta tags (html.rb:141-153) + body data attributes (155-171)
    extra_fields = {}
    for nm, content in elastic_metas:
        if valid_field_name(nm):
            extra_fields[nm] = limit_bytesize(content, max_elastic_tag_size)
    for nm, el in data_attrs:
        if valid_field_name(nm):
            extra_fields[nm] = limit_bytesize(element_text(el), max_data_attribute_size)

    meta_keywords = limit_bytesize(meta_keywords, max_keywords_size) if meta_keywords else None
    meta_description = (
        limit_bytesize(meta_description, max_description_size) if meta_description else None
    )

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
