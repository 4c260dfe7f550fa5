"""The fused single-pass extractor must agree FIELD-FOR-FIELD with the
DOM-path ``extract_page`` whenever it does not bail — it is an
optimization, never a semantic change (the byte-identical-text invariant
rides on it)."""

import random

from crawler_spark.functions.fastextract import extract_page_fast
from crawler_spark.functions.pageextract import extract_page

URL = "https://site.test/dir/page?q=1"


def both(html, **kw):
    fast = extract_page_fast(URL, html, **kw)
    slow = extract_page(URL, html, **kw)
    return fast, slow


def assert_same(html, **kw):
    fast, slow = both(html, **kw)
    if fast is None:
        return False  # bail → DOM path; nothing to compare
    assert fast == slow, f"mismatch for {html[:160]!r}\nfast={fast}\nslow={slow}"
    return True


def wrap(frag):
    return (
        "<html><head><title>T</title>"
        + frag
        + "</head><body><p>lead</p>"
        + frag
        + "</body></html>"
    )


SEMANTIC_CASES = [
    # body text choreography
    "<html><head><title>t</title></head><body><p>Hello,<br>World!</p></body></html>",
    "<html><head></head><body>a<!--c-->b<hr>c</body></html>",
    "<html><head></head><body>foo <!--x--> bar<meta content='m1'>tail</body></html>",
    "<html><head></head><body><svg><p>invisible</p></svg>vis<video>no</video></body></html>",
    "<html><head></head><body>pre<script>if(a<b){'</div>'}</script>post</body></html>",
    "<html><head></head><body><div content='dc'>x</div><img content='ic'></body></html>",
    "<html><head></head><body>a&amp;b &lt;x&gt; &#65;&#x42;</body></html>",
    "<html><head></head><body>foo \n bar<i></i>baz</body></html>",
    "<html><head></head><body>seg1<?pi>seg2</body></html>",
    # title variants
    "<html><head><title>one</title><title>two</title></head><body>b</body></html>",
    "<html><head><title content='ca'>t<b>x</b></title></head><body>b</body></html>",
    "<html><head><title/></head><body>b</body></html>",
    "<html><head></head><body><svg><title>in svg</title></svg>b</body></html>",
    "<html><head><title>a<br>b</title></head><body>c</body></html>",
    # headings: dedupe, nesting, self-closed, outside body
    "<html><head><h1>head-h</h1></head><body><h1>x</h1><h2>x</h2><h2>y</h2></body></html>",
    "<html><head></head><body><h1>outer<h2>inner</h2></h1></body></html>",
    "<html><head></head><body><h3/><h4></h4><h5>v</h5></body></html>",
    "<html><head></head><body><h1>a<script>s</script>b<br>c</h1></body></html>",
    # anchors: order, rel, collisions, nesting, limits
    "<html><head></head><body><a href='/a'>one</a><a href='/b' rel='nofollow'>two</a></body></html>",
    "<html><head></head><body><a href='/a'>same</a><a href='/a'>same</a></body></html>",
    "<html><head></head><body><a href='/a'>t1</a><a href='/a'>t2</a><a href='/a'>t1</a></body></html>",
    "<html><head></head><body><a href='/a' rel='x'>t</a><a href='/a' rel='x y'>t</a></body></html>",
    "<html><head></head><body><a href='/a'>a<b>bold</b><script>x</script>c</a></body></html>",
    "<html><head></head><body><div><a href='/a'>unclosed</div> tail</body></html>",
    "<html><head></head><body><a href='/a'/><a href='/a'></a></body></html>",
    "<html><head><a href='/inhead'>h</a></head><body>b</body></html>",
    "<html><head></head><body><a href=''>empty</a><a>nohref</a></body></html>",
    "<html><head></head><body><a href='/x'>out<a href='/y'>nested</a></a></body></html>",
    # base / canonical
    "<html><head><base href='/sub/'><base href='/other/'></head><body><a href='rel'>r</a></body></html>",
    "<html><head><base href='  '><link rel='canonical' href='/canon'></head><body>b</body></html>",
    "<html><head><link rel='CANONICAL x' href='/c1'><link rel='canonical' href='/c2'></head><body>b</body></html>",
    "<html><head><base href='https://other.test/a/'></head><body><a href='b'>x</a></body></html>",
    # metas
    "<html><head><meta name='ROBOTS' content='NOINDEX, nofollow'></head><body>b</body></html>",
    "<html><head><meta name='keywords' content='k1'><meta name='keywords' content='k2'></head><body>b</body></html>",
    "<html><head><meta name='description' content='d'></head><body>"
    "<meta class='elastic x' name='f1' content='v1'><meta class='elastic' name='_bad' content='v'></body></html>",
    "<html><head></head><body><meta class='elastic' name='f2' content='v2'></body></html>",
    # data attributes
    "<html><head></head><body><div data-elastic-name='dn'>text<b>b</b></div></body></html>",
    "<html><head></head><body><div data-elastic-name='o'>out<span data-elastic-name='i'>in</span></div></body></html>",
    "<html><head><div data-elastic-name='inhead'>x</div></head><body>b</body></html>",
    "<html><head></head><body><div data-elastic-name='s'><script>sk</script>vis<br>b</div></body></html>",
    "<html><head></head><body><img data-elastic-name='v'></body></html>",
    # structure: content outside body, stray closes, nesting
    "<html><head></head>between<body>in</body>after</html>trail",
    "<html><head></head><body>x</body><a href='/post'>post-body</a></html>",
    "<html><head></head><body>a<div>b</body>c</html>",
    "<html><head></head><body>x</body><h1>outside</h1></html>",
    "<head><title>nohtml</title></head><body>content</body>",
    "<!DOCTYPE html><html><head></head><body>d</body></html>",
    "<html><head></head><body><p>1<p>2<p>3<ul><li>a<li>b</ul></body></html>",
    "<html><head></head><body></p>stray</div>text</body></html>",
    "<html><head></head><body>x<div><body>nested</body></div></body></html>",
    # entity / malformed tails
    "<html><head></head><body><b<c>d</b> <a href= >t</a> <a href>u</a></body></html>",
    "<html><head></head><body><em>over<lap</em>ped</body></html>",
    "<html><head></head><body>tail<",
    "<html><head></head><body><div a=1 / b=2>x</div><div/ >y</body></html>",
    "<html><head></head><body>unterminated <a href='/u'>anchor",
    "<html><head></head><body>cd<script>never closed",
    # implied head/body (dom.parse distribution, streaming-emulated r5)
    "<p>no scaffolding at all</p>",
    "<html><body>missing head</body></html>",
    "<html><head></head>no body</html>",
    "<title>t</title><p>content</p>",
    "<h1>head</h1><p>text <a href='/x'>lk</a></p>",
    "<html><title>t</title><meta name='description' content='d'><div>body</div></html>",
    "<html><head><title>a</title></head><h2>implied</h2>tail</html>",
    "<!-- c --><p>after comment</p>",
    "<html><!--c--><title>title-in-body</title></html>",
    "<html><head><title>only head</title></head></html>",
    "<html><title>only headish</title></html>",
    "text only, nothing else",
    "<base href='/sub/'><a href='rel'>r</a>",
    "<noscript>ns</noscript><div data-elastic-name='dn'>v</div>",
    "<h1>a</h1><title>late title</title><p>b</p>",
    "<html><head></head><title>t2</title><h3>h</h3></html>",
    "<div>a</div><head></head><body>b</body>",  # "<body" ahead: declined, both arrive
    # declined-comment soundness (root comment dropped when <html> arrives;
    # attribution inside the html element starts fresh)
    "<!-- generator --><html><head><title>t</title></head><body>b</body></html>",
    "<!--c--><html><meta name='description' content='d'><p>x</p></html>",
    "<!--c--><html><noscript>ns</noscript><p>x</p></html>",
    "<!--c--><body>b</body>",  # re-homed comment appends only a space
    "<html><!--c--><head></head><body>b</body></html>",  # under-html decline, body arrives
]

BAIL_CASES = [
    "<html><head></head><body><div data-elastic-exclude>x</div></body></html>",
    "<html><head></head><body><div data-elastic-include=''>x</div></body></html>",
    "<html><head></head><body><![CDATA[x]]></body></html>",
    "<p>lead</p><html><head></head><body>late html</body></html>",
    "<html><head></head><body>x</body></html><html><head></head><body>y</body></html>",
    "<html/>",
    "<div><body>nested only</body></div>",
    # implied-scaffold shapes the streaming emulation must refuse
    "<html><div>a</div><body>b</body></html>",  # re-homed BEFORE body's children
    "<p>x</p><body>late</body>",                # declined flip, head missing
    "<html><body>b</body><p>post</p></html>",   # content re-homed after </body>
    "<html><head></head><head>h2</head><p>x</p></html>",  # dup head, no body
    "<title>pre</title><head></head><p>x</p>",  # prefix displaced by late head
]


def test_semantic_cases_identical():
    # every semantic case was built FOR the fast path: each must actually
    # be compared. A case that silently starts bailing after a change to
    # the bail conditions would stop verifying anything — name it loudly.
    bailed = [html for html in SEMANTIC_CASES if not assert_same(html)]
    assert bailed == [], f"semantic cases no longer on the fast path: {bailed}"


def test_bail_cases_return_none():
    for html in BAIL_CASES:
        assert extract_page_fast(URL, html) is None, html[:80]


def test_limits_identical():
    html = (
        "<html><head><title>"
        + "t" * 50
        + "</title></head><body>"
        + "".join(f"<a href='/l{i}'>a{i}</a>" for i in range(40))
        + "".join(f"<h2>h{i}</h2>" for i in range(10))
        + "<meta class='elastic' name='big' content='"
        + "c" * 100
        + "'>"
        + "<div data-elastic-name='dbig'>"
        + "d" * 100
        + "</div>"
        + "w " * 200
        + "</body></html>"
    )
    assert assert_same(
        html,
        max_extracted_links=10,
        max_indexed_links=5,
        max_headings=4,
        max_title_size=20,
        max_body_size=64,
        max_elastic_tag_size=16,
        max_data_attribute_size=16,
    )


def test_fixture_corpus_identical():
    from crawler_spark.fixtures.gen import generate_corpus, generate_scale_corpus

    rows, _ = generate_corpus(n_hosts=3, pages_per_host=30)
    rows2, _ = generate_scale_corpus(n_hosts=2, pages_per_host=200)
    fast_taken = 0
    html_pages = 0
    for r in rows + rows2:
        try:
            h = r["html"].decode()
        except UnicodeDecodeError:
            continue
        if not h.lstrip().startswith("<"):
            continue
        html_pages += 1
        fast_taken += assert_same(h)
    # the corpus is well-formed html — the fused path must carry the bulk
    assert fast_taken >= int(html_pages * 0.8), (fast_taken, html_pages)


def test_random_soup_identical():
    rng = random.Random(20260821)
    atoms = ["<", ">", "/", "!", "?", "-", "--", "=", "'", '"', " ", "\n", "\t",
             "a", "div", "p", "script", "style", "br", "hr", "meta", "base",
             "href", "rel", "nofollow", "content", "name", "class", "elastic",
             "&amp;", "&", "&#65;", "&#x", "&bogus;", ";", "#", "x y z",
             "<!--", "-->", "<!", "<?", "</", "<div>", "</div>", "<p ", "<a href=",
             "<h1>", "</h1>", "<svg>", "</svg>", "<title>", "</title>",
             "robots", "canonical", "data-elastic-name='q'", "\x00", "é",
             "<body>", "</body>", "<head>", "</head>", "<html>", "</html>"]
    compared = 0
    for _ in range(4000):
        s = "".join(rng.choice(atoms) for _ in range(rng.randrange(1, 28)))
        compared += assert_same(wrap(s))
        assert_same(s)
    # wrapped soup provides the scaffolding; most must take the fast path
    assert compared > 2000, compared
