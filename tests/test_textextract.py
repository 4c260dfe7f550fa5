"""Text-extraction goldens ported from the reference's own specs.

Sources: spec/lib/crawler/content_engine/utils_spec.rb:19-57 and
docs/features/CRAWLER_DIRECTIVES.md:78-151 (the test1..test7 example).
"""

from crawler_spark.functions.textextract import (
    limit_bytesize,
    node_descendant_text,
    squish,
    transform,
)
from crawler_spark.functions.pageextract import extract_page
from crawler_spark.htmlkit import dom


def body_text(html: str) -> str:
    doc = dom.parse(html)
    body = dom.body_of(doc)
    return node_descendant_text(transform(body))


def test_br_becomes_space():
    # utils_spec.rb golden: 'Hello,<br>World!' -> 'Hello, World!'
    assert body_text("<html><body><p>Hello,<br>World!</p></body></html>") == "Hello, World!"


def test_hr_becomes_space():
    assert body_text("<body>a<hr>b</body>") == "a b"


def test_script_and_style_skipped():
    html = "<body><script>var x = 'nope';</script><style>.a{}</style><p>yes</p></body>"
    assert body_text(html) == "yes"


def test_svg_video_object_skipped():
    html = "<body><svg><text>no</text></svg><video>no</video><object>no</object>ok</body>"
    assert body_text(html) == "ok"


def test_meta_content_attribute_contributes():
    # utils_spec.rb: Element nodes contribute their content attribute
    html = "<body><meta content='metatext'><p>body</p></body>"
    assert body_text(html) == "metatext body"


def test_comments_do_not_contribute_text():
    assert body_text("<body>a<!-- hidden -->b</body>") == "a b"


def test_whitespace_squished():
    # every element contributes a surrounding space (utils.rb:85-92), so
    # inline tags break words: 'c</b>d' -> 'c d'
    assert body_text("<body>  a\n\t b   <b> c</b>d </body>") == "a b c d"


def test_elements_insert_word_breaks():
    assert body_text("<body><div>a</div><div>b</div></body>") == "a b"


def test_directives_exclude_include_golden():
    # docs/features/CRAWLER_DIRECTIVES.md:101-126 -> "test1 test3 test5 test7"
    html = """
    <body>
        test1
        <div data-elastic-exclude>test2
            <p data-elastic-include>test3
                <span data-elastic-exclude>test4
                    <em data-elastic-include>test5</em>
                </span>
            </p>
            test6
        </div>
        test7
    </body>
    """
    assert body_text(html) == "test1 test3 test5 test7"


def test_directives_simple_exclude_golden():
    # CRAWLER_DIRECTIVES.md:128-151 -> "test1 test7"
    html = """
    <body>
        test1
        <div data-elastic-exclude>test2
            <p>test3<span>test4<em>test5</em></span></p>
            test6
        </div>
        test7
    </body>
    """
    assert body_text(html) == "test1 test7"


def test_exclude_on_body_itself():
    assert body_text('<body data-elastic-exclude>gone<p data-elastic-include>kept</p></body>') == "kept"


def test_limit_bytesize():
    assert limit_bytesize("hello", 100) == "hello"
    assert limit_bytesize("hello world", 8) == "hello…"
    # multi-byte grapheme boundary: no split mid-character
    s = "aéé"  # 1 + 2 + 2 bytes
    out = limit_bytesize(s, 4)  # real_limit = 4-3 = 1 -> 'a…'
    assert out == "a…"
    assert limit_bytesize(None, 10) is None
    assert limit_bytesize("", 0) == ""


def test_squish_unicode():
    assert squish(" a   b ") == "a b"


def test_extract_page_full():
    html = """<html><head>
      <title> My   Title </title>
      <base href="/sub/">
      <link rel="canonical" href="http://example.com/canon">
      <meta name="keywords" content="k1, k2">
      <meta name="description" content="desc here">
      <meta name="robots" content="NOINDEX">
      <meta class="elastic" name="custom_field" content="cv">
      <meta class="elastic" name="_bad" content="x">
      <meta class="elastic" name="url" content="reserved">
    </head><body>
      <h1>First</h1><h2></h2><h2>Second</h2><h1>First</h1>
      <a href="a1">A1</a>
      <a href="/abs">Abs</a>
      <a href="nope" rel="NOFOLLOW">NF</a>
      <a href="http://other.com/x">Ext</a>
      <div data-elastic-name="attr_field">attr value</div>
      <p>Body text</p>
    </body></html>"""
    r = extract_page("http://example.com/page", html)
    assert r["base_url"] == "http://example.com/sub/"
    assert r["title"] == "My Title"
    assert r["canonical_url"] == "http://example.com/canon"
    assert r["meta_noindex"] is True and r["meta_nofollow"] is False
    assert r["meta_keywords"] == "k1, k2"
    assert r["meta_description"] == "desc here"
    assert r["headings"] == ["First", "Second"]
    urls = [lk["url"] for lk in r["links"]]
    assert urls == [
        "http://example.com/sub/a1",
        "http://example.com/abs",
        "http://example.com/sub/nope",
        "http://other.com/x",
    ]
    assert [lk["nofollow"] for lk in r["links"]] == [False, False, True, False]
    assert r["indexed_links"] == sorted(urls)
    assert r["extra_fields"] == {"custom_field": "cv", "attr_field": "attr value"}
    assert "Body text" in r["body"]


def test_extract_page_link_set_identity():
    """link.rb:39-53 Set semantics via the (href, rel, anchor-text) proxy:
    exact duplicates collapse; same href with different rel OR different
    anchor text stays distinct (exercises the lazy text-on-collision path)."""
    html = (
        '<body>'
        '<a href="/x">same</a>'
        '<a href="/x">same</a>'          # dup: collapses
        '<a href="/x">other</a>'         # same href, new text: kept
        '<a href="/x" rel="nofollow">same</a>'  # same href+text, new rel: kept
        '<a href="/y">same</a>'          # different href: kept
        '<a href="/x">other</a>'         # dup of 3rd: collapses
        '</body>'
    )
    r = extract_page("http://e.com/", html)
    assert [(lk["url"], lk["nofollow"]) for lk in r["links"]] == [
        ("http://e.com/x", False),
        ("http://e.com/x", False),
        ("http://e.com/x", True),
        ("http://e.com/y", False),
    ]


def test_extract_page_caps():
    links = "".join(f'<a href="/l{i}">x</a>' for i in range(40))
    heads = "".join(f"<h3>h{i}</h3>" for i in range(40))
    r = extract_page(
        "http://e.com/", f"<body>{links}{heads}</body>",
        max_extracted_links=30, max_indexed_links=5, max_headings=25,
    )
    assert len(r["links"]) == 30 and r["links_limit_reached"]
    assert len(r["indexed_links"]) == 5
    assert r["indexed_links"] == sorted([f"http://e.com/l{i}" for i in range(5)])
    assert len(r["headings"]) == 25


def test_base_url_reference_spec_cases():
    """Mirrors spec/lib/crawler/data/crawl_result/html_spec.rb #base_url:
    spaces stripped, invalid escape -> page URL, no/empty href -> page URL,
    relative href completed, FIRST base[href] wins (even over later ones),
    no base tag -> page URL."""
    from crawler_spark.functions.pageextract import compute_base_url
    from crawler_spark.htmlkit import dom

    page = "https://page.test/dir/index.html"
    cases = [
        ('<base href="  https://example.com/hello  ">', "https://example.com/hello"),
        ('<base href="%https:/">', page),                      # invalid escape
        ('<base target="_blank">', page),                      # no href attr
        ('<base href="">', page),                              # empty href
        ('<base href="/hello">', "https://page.test/hello"),   # relative
        ('<base target="_blank"><base href="https://example.com/hello">'
         '<base href="https://example.com/world">',
         "https://example.com/hello"),                         # first href wins
        ('<base href=""><base href="https://example.com/x">', page),
        ("", page),                                            # no base tag
    ]
    for frag, expect in cases:
        doc = dom.parse(f"<html><head>{frag}</head><body>x</body></html>")
        assert compute_base_url(doc, page) == expect, frag


def test_title_fallback_reference_spec_cases():
    """html_spec.rb #document_title: head <title> preferred; first <title>
    anywhere on the page otherwise; empty string when absent."""
    from crawler_spark.functions.pageextract import extract_page

    head = extract_page("https://t.test/", "<html><head><title>A</title></head><body><title>B</title></body></html>")
    assert head["title"] == "A"
    body_only = extract_page("https://t.test/", "<html><body>text <title>B</title> <title>C</title></body></html>")
    assert body_only["title"] == "B"
    none = extract_page("https://t.test/", "<html><body>no title</body></html>")
    assert none["title"] == ""


def test_sitemap_reference_spec_cases():
    """Mirrors data/crawl_result/sitemap_spec.rb: CDATA-wrapped locs,
    BOM prefix, corrupted XML -> empty set, partial XML -> partial set,
    50k spec cap, gzip."""
    import gzip as _gz

    from crawler_spark.functions.sitemaps import MAX_SITEMAP_URLS, parse_sitemap

    u = "https://s.test/sitemap.xml"
    # CDATA in urlset and sitemapindex
    sm, cl = parse_sitemap(u, "<urlset><url><loc><![CDATA[https://s.test/a?x=1&y=2]]></loc></url></urlset>")
    assert (sm, cl) == ([], ["https://s.test/a?x=1&y=2"])
    sm, cl = parse_sitemap(u, "<sitemapindex><sitemap><loc><![CDATA[ https://s.test/child.xml ]]></loc></sitemap></sitemapindex>")
    assert (sm, cl) == (["https://s.test/child.xml"], [])
    # entity unescape outside CDATA
    _, cl = parse_sitemap(u, "<urlset><url><loc>https://s.test/a?x=1&amp;y=2</loc></url></urlset>")
    assert cl == ["https://s.test/a?x=1&y=2"]
    # BOM-prefixed document
    bom = b"\xef\xbb\xbf<?xml version='1.0'?><urlset><url><loc>https://s.test/b</loc></url></urlset>"
    assert parse_sitemap(u, bom)[1] == ["https://s.test/b"]
    # corrupted XML -> empty, no raise; partially-valid -> partial set
    assert parse_sitemap(u, "<<<not xml at all") == ([], [])
    partial = "<urlset><url><loc>https://s.test/ok</loc></url><url><loc></urlset>"
    assert parse_sitemap(u, partial)[1] == ["https://s.test/ok"]
    # gzip auto-detect
    gz = _gz.compress(b"<urlset><url><loc>https://s.test/z</loc></url></urlset>")
    assert parse_sitemap(u, gz)[1] == ["https://s.test/z"]
    # 50k spec cap
    big = "<urlset>" + "".join(
        f"<url><loc>https://s.test/p{i}</loc></url>" for i in range(MAX_SITEMAP_URLS + 5)
    ) + "</urlset>"
    assert len(parse_sitemap(u, big)[1]) == MAX_SITEMAP_URLS


def test_sitemap_xxe_and_entity_bomb_are_inert():
    """Mirrors the reference's XXE integration spec (spec/integration):
    DOCTYPE external entities and billion-laughs expansions must neither
    resolve nor blow up — the regex-level extractor never evaluates
    entity declarations, so the payloads are inert by construction."""
    from crawler_spark.functions.sitemaps import parse_sitemap

    u = "https://s.test/sitemap.xml"
    xxe = (
        "<?xml version='1.0'?>"
        "<!DOCTYPE urlset [<!ENTITY xxe SYSTEM 'file:///etc/passwd'>]>"
        "<urlset><url><loc>https://s.test/ok</loc></url>"
        "<url><loc>&xxe;</loc></url></urlset>"
    )
    sm, cl = parse_sitemap(u, xxe)
    assert "https://s.test/ok" in cl
    # the external entity is never fetched/expanded; the literal reference
    # resolves as a (harmless) relative path under the site root
    assert not any("passwd" in c or c.startswith("file:") for c in cl)
    bomb = (
        "<?xml version='1.0'?>"
        "<!DOCTYPE lolz [<!ENTITY a 'aaaa'>"
        "<!ENTITY b '&a;&a;&a;&a;'><!ENTITY c '&b;&b;&b;&b;'>]>"
        "<urlset><url><loc>https://s.test/x&c;</loc></url></urlset>"
    )
    sm, cl = parse_sitemap(u, bomb)  # must return promptly, no expansion
    assert all(len(c) < 200 for c in cl)


def test_tree_builder_seam():
    """The C-parser injection point (dom.set_tree_builder): an installed
    builder's tree feeds the whole extraction pipeline, a raising or
    None-returning builder falls back to the built-in parser, and the
    previous builder is returned for restoration."""
    calls = []

    def builder(html):
        calls.append(html)
        root = dom.Element("#root")
        h = dom.Element("html")
        root.append(h)
        b = dom.Element("body")
        h.append(b)
        p = dom.Element("p")
        b.append(p)
        p.append(dom.Text("injected by backend"))
        return root

    prev = dom.set_tree_builder(builder)
    try:
        doc = dom.parse("<html><body>built-in text</body></html>")
        assert calls == ["<html><body>built-in text</body></html>"]
        body = doc.find_first("body")
        assert "injected by backend" in node_descendant_text(body)
        assert "built-in" not in node_descendant_text(body)

        # a raising builder degrades to the built-in parser
        def boom(html):
            raise ValueError("partial adapter")

        dom.set_tree_builder(boom)
        doc2 = dom.parse("<p>real content</p>")
        assert "real content" in node_descendant_text(doc2.find_first("body"))

        # returning None also falls back
        dom.set_tree_builder(lambda h: None)
        doc3 = dom.parse("<p>still real</p>")
        assert "still real" in node_descendant_text(doc3.find_first("body"))
    finally:
        assert dom.set_tree_builder(prev) is not None  # ours was installed
    assert dom._tree_builder is prev


def test_lxml_walker_against_duck_typed_tree():
    """The lxml tree walker is pinned against a duck-typed etree fake:
    elements, nested children, attributes, text/tail placement, comment
    nodes (non-str tag), and script raw text."""
    from crawler_spark.htmlkit.backends import convert_lxml_node

    class FakeEl:
        def __init__(self, tag, attrib=None, text=None, tail=None, children=()):
            self.tag, self.attrib = tag, attrib or {}
            self.text, self.tail = text, tail
            self._children = list(children)

        def __iter__(self):
            return iter(self._children)

    comment = FakeEl(lambda: None, text=" hidden ")
    tree = FakeEl(
        "HTML", text=None, children=[
            FakeEl("body", text="lead ", children=[
                FakeEl("p", {"class": "x"}, text="para", tail=" mid "),
                comment,
                FakeEl("script", text="var a = '<not text>';", tail="end"),
            ]),
        ],
    )
    el = convert_lxml_node(tree)
    assert el._name == "html"  # tag lowercased
    body = el.find_first("body")
    txt = node_descendant_text(body)
    assert "lead" in txt and "para" in txt and "mid" in txt and "end" in txt
    assert "hidden" not in txt  # comments are Comment nodes, not text
    p = body.find_first("p")
    assert p.attr("class") == "x"
    script = body.find_first("script")
    # raw script text is preserved on the node (node_descendant_text
    # excludes script/style by extraction semantics, so check the child)
    assert any(
        getattr(c, "data", "") == "var a = '<not text>';"
        for c in script.children
    )


def test_install_best_backend_absent_is_noop():
    """Without lxml/selectolax in the container the installer returns
    None and the built-in parser remains in charge."""
    from crawler_spark.htmlkit import backends

    try:
        import lxml  # noqa: F401
        has_lxml = True
    except ImportError:
        has_lxml = False
    installed = backends.install_best_backend()
    try:
        if has_lxml:
            assert installed == "lxml"
            doc = dom.parse("<p>via backend</p>")
            assert "via backend" in node_descendant_text(doc.find_first("body"))
        else:
            assert installed is None
            assert dom._tree_builder is None
    finally:
        dom.set_tree_builder(None)
