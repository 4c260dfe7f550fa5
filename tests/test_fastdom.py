"""The fast regex tokenizer must build the EXACT tree the stdlib
html.parser builder does — token boundaries come from the stdlib's own
compiled regexes, and this test pins full-tree equality over the fixture
corpora, adversarial fragments, and a seeded random-soup fuzz."""

import random

from crawler_spark.htmlkit import dom


def build_stdlib(html):
    b = dom._DomBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass
    return b.root


def tree_repr(node):
    if isinstance(node, dom.Text):
        return ("T", node.data)
    if isinstance(node, dom.Comment):
        return ("C", node.data)
    return ("E", node._name, sorted(node.attrs.items()),
            [tree_repr(c) for c in node.children])


def assert_equivalent(html, label=""):
    try:
        fast = dom._fast_build(html)
    except dom._NeedsStdlib:
        return  # falls back by design (marked sections)
    assert tree_repr(fast) == tree_repr(build_stdlib(html)), label or html[:120]


ADVERSARIAL = [
    "", "<", "x<", "<3 html", "a & b &amp; c", "&notareal; &lt;x&gt;",
    "<p>Hello,<br>World!</p>", "<a href='/x' rel=nofollow>t</a>",
    "<script>if(a<b){x='</div>'}</script>after",
    "<script>unterminated", "<style>a{} </style >tail",
    "<ScRiPt>X</sCrIpT>done",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<!doctype html\n><p>x</p>", "<!weird decl>tail", "<?php echo ?>tail",
    "<!-- comment -->x", "<!--unterminated", "<!--bad-- >ok-->x",
    "</>x", "</ bogus>x", "</div attr>y", "<div/>z", "<img src=a/>",
    "<a href=/foo/>t</a>", "<a href='a&amp;b'>t</a>",
    '<a href="x"id=y>t</a>', "<a HREF='X' Href='dup'>t</a>",
    "<a data-x>t</a>", "<b<c>d</b>", "<a b='un>closed'>t</a>",
    "<meta name=robots content='noindex, nofollow'>",
    "<td nowrap>x", "<a href= >t</a>", "<a href>t</a>",
    "<em>over<lap</em>ped", "<p>1<p>2<p>3", "<ul><li>a<li>b</ul>",
    "<a href='#'>&#65;&#x42;&#67</a>", "<input value='&quot;q&quot;'/>",
    "<div a=1 / b=2>x</div>", "<div/ >x", "<div /\n>x",
    "<p att=''>e</p>", "<p =bad>x</p>", "<a\nhref='\nx\n'>t</a>",
    "\x00weird<p>\x00</p>",
]


def test_adversarial_fragments():
    for frag in ADVERSARIAL:
        assert_equivalent(frag)


def test_fixture_corpus_equivalence():
    from crawler_spark.fixtures.gen import generate_corpus, generate_scale_corpus

    rows, _ = generate_corpus(n_hosts=3, pages_per_host=30)
    rows2, _ = generate_scale_corpus(n_hosts=2, pages_per_host=200)
    for r in rows + rows2:
        try:
            h = r["html"].decode()
        except UnicodeDecodeError:
            continue
        assert_equivalent(h, r["url"])


def test_random_soup_fuzz():
    rng = random.Random(1234)
    atoms = ["<", ">", "/", "!", "?", "-", "--", "=", "'", '"', " ", "\n", "\t",
             "a", "div", "p", "script", "style", "br", "meta", "base",
             "href", "rel", "nofollow", "content", "name", "class", "elastic",
             "&amp;", "&", "&#65;", "&#x", "&bogus;", ";", "#", "x y z",
             "<!--", "-->", "<!", "<?", "</", "<div>", "</div>", "<p ", "<a href=",
             "robots", "canonical", "data-elastic-name", "data-elastic-exclude",
             "\x00", "é", "[", "]", "CDATA"]
    for _ in range(3000):
        s = "".join(rng.choice(atoms) for _ in range(rng.randrange(1, 25)))
        assert_equivalent(s)
