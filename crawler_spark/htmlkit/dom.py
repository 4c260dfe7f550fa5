"""Minimal HTML DOM on top of stdlib ``html.parser``.

The container has no lxml/bs4/selectolax, so the extraction pipeline builds
its own small DOM. It only needs to be faithful enough to reproduce the
reference's jsoup-based extraction on the crawl corpus:

* document order pre-order traversal
* void elements (``br``/``meta``/…) never take children
* ``script``/``style`` bodies delivered as raw text children (stdlib
  HTMLParser already switches to CDATA mode for these)
* implicit ``html > head > body`` structure (jsoup always materializes it)
* attributes: first occurrence wins, values entity-decoded

This is intentionally not a general browser-grade parser; the fixture
corpus (FIXTURES.md) is generated with unambiguous markup, and golden tests
pin the observable behavior against the reference's spec expectations
(``spec/lib/crawler/content_engine/utils_spec.rb``).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements that belong to <head>; used when materializing implicit structure.
_HEAD_ELEMENTS = frozenset("title base link meta style script noscript template".split())


class Node:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent = None

    @property
    def name(self) -> str:
        raise NotImplementedError


class Text(Node):
    __slots__ = ("data",)

    def __init__(self, data: str):
        super().__init__()
        self.data = data

    @property
    def name(self):
        return "#text"

    def __repr__(self):
        return f"Text({self.data!r})"


class Comment(Node):
    __slots__ = ("data",)

    def __init__(self, data: str):
        super().__init__()
        self.data = data

    @property
    def name(self):
        # jsoup Comment#nodeName() is "#comment" — NOT "comment", so the
        # reference's NON_CONTENT_TAGS "comment" entry never matches it and a
        # comment contributes only the generic element spacing. We mirror that.
        return "#comment"

    def __repr__(self):
        return f"Comment({self.data!r})"


class Element(Node):
    __slots__ = ("_name", "attrs", "children")

    def __init__(self, name: str, attrs=None):
        super().__init__()
        self._name = name
        self.attrs = dict(attrs or {})
        self.children: list[Node] = []

    @property
    def name(self):
        return self._name

    def append(self, node: Node):
        node.parent = self
        self.children.append(node)

    def remove_child(self, node: Node):
        self.children.remove(node)
        node.parent = None

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    def attr(self, key: str) -> str:
        return self.attrs.get(key, "")

    def classes(self):
        return self.attrs.get("class", "").split()

    # --- traversal --------------------------------------------------------

    def iter(self):
        """Pre-order document-order traversal over all descendant nodes."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            yield n
            if isinstance(n, Element):
                stack.extend(reversed(n.children))

    def iter_elements(self, *names):
        nameset = set(names) if names else None
        for n in self.iter():
            if isinstance(n, Element) and (nameset is None or n._name in nameset):
                yield n

    def find_first(self, *names):
        for el in self.iter_elements(*names):
            return el
        return None

    def copy(self) -> "Element":
        """Deep copy (Transformer.transform dups before mutating)."""
        el = Element(self._name, dict(self.attrs))
        for c in self.children:
            if isinstance(c, Element):
                el.append(c.copy())
            elif isinstance(c, Text):
                el.append(Text(c.data))
            else:
                el.append(Comment(c.data))
        return el

    def __repr__(self):
        return f"<{self._name} {self.attrs!r} children={len(self.children)}>"


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack = [self.root]

    # html.parser delivers attrs lowercased already; duplicate attr keys:
    # keep the first (jsoup behavior).
    def _mkattrs(self, attrs):
        out = {}
        for k, v in attrs:
            if k not in out:
                out[k] = v if v is not None else ""
        return out

    def handle_starttag(self, tag, attrs):
        el = Element(tag, self._mkattrs(attrs))
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].append(Element(tag, self._mkattrs(attrs)))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        # pop to the matching open element if present; ignore stray closers
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i]._name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Text(data))

    def handle_comment(self, data):
        self.stack[-1].append(Comment(data))


# --- fast tokenizer -------------------------------------------------------
#
# A single-pass re-implementation of the exact ``html.parser`` tokenization
# we rely on (convert_charrefs=True, no charref/entityref callbacks), reusing
# the stdlib's own compiled regexes so the token boundaries are identical by
# construction. It skips ``goahead``'s per-character bookkeeping
# (updatepos/rawdata slicing/method dispatch), which dominates stdlib parse
# time. Exotic constructs (``<![`` marked sections) raise and the caller
# falls back to ``_DomBuilder`` for the whole document; a golden test pins
# tree equality between the two builders over the corpus + adversarial
# fragments.

from html import parser as _hp
from html import unescape as _unescape

_TAGFIND = _hp.tagfind_tolerant
_ATTRFIND = _hp.attrfind_tolerant
_LOCATE_END = _hp.locatestarttagend_tolerant
_ENDTAGFIND = _hp.endtagfind
_COMMENTCLOSE = _hp.commentclose
import re as _re

# exact mirror of 3.11 set_cdata_mode's `interesting` pattern
_CDATA_CLOSE = {
    "script": _re.compile(r"</\s*script\s*>", _re.I),
    "style": _re.compile(r"</\s*style\s*>", _re.I),
}
_ATTR_NEXT = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"


class _NeedsStdlib(Exception):
    pass


def _fast_build(rawdata: str) -> Element:
    root = Element("#root")
    stack = [root]
    n = len(rawdata)
    i = 0
    cdata_elem = None

    # hot-loop object construction: bypass __init__ (and its defensive
    # attrs copy — the tokenizer's dict is never shared) for the ~100+
    # nodes built per page
    _el_new = Element.__new__
    _tx_new = Text.__new__

    def _mk_text(data):
        t = _tx_new(Text)
        t.parent = None
        t.data = data
        return t

    def emit(node):
        top = stack[-1]
        node.parent = top
        top.children.append(node)

    def pop_to(tag):
        if tag in VOID_ELEMENTS:
            return
        for idx in range(len(stack) - 1, 0, -1):
            if stack[idx]._name == tag:
                del stack[idx:]
                return

    while i < n:
        # --- text run up to the next construct ---------------------------
        if cdata_elem is None:
            j = rawdata.find("<", i)
            if j < 0:
                emit(_mk_text(_unescape(rawdata[i:n])))
                return root
            if i < j:
                emit(_mk_text(_unescape(rawdata[i:j])))
        else:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                return root  # stdlib drops unterminated CDATA at EOF
            j = m.start()
            if i < j:
                emit(_mk_text(rawdata[i:j]))
        i = j

        c = rawdata[i + 1 : i + 2]
        k = -1
        if c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            # --- start tag (parse_starttag + check_for_whole_start_tag) --
            m = _LOCATE_END.match(rawdata, i)
            j2 = m.end()
            nxt = rawdata[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/":
                endpos = j2 + 2 if rawdata.startswith("/>", j2) else -1
            elif nxt == "" or nxt in _ATTR_NEXT:
                endpos = -1
            else:
                endpos = j2 if j2 > i else i + 1
            if endpos >= 0:
                mt = _TAGFIND.match(rawdata, i + 1)
                kk = mt.end()
                tag = mt.group(1).lower()
                attrs = {}
                while kk < endpos:
                    ma = _ATTRFIND.match(rawdata, kk)
                    if not ma:
                        break
                    attrname, rest, attrvalue = ma.group(1, 2, 3)
                    if not rest:
                        attrvalue = None
                    elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
                        attrvalue = attrvalue[1:-1]
                    if attrvalue:
                        attrvalue = _unescape(attrvalue)
                    name = attrname.lower()
                    if name not in attrs:
                        attrs[name] = attrvalue if attrvalue is not None else ""
                    kk = ma.end()
                end = rawdata[kk:endpos].strip()
                if end not in (">", "/>"):
                    emit(_mk_text(rawdata[i:endpos]))  # raw, as stdlib handle_data
                    i = endpos
                    continue
                el = _el_new(Element)
                el.parent = None
                el._name = tag
                el.attrs = attrs
                el.children = []
                emit(el)
                if end == ">":
                    if tag not in VOID_ELEMENTS:
                        stack.append(el)
                        if tag in ("script", "style"):
                            cdata_elem = tag
                i = endpos
                continue
            # endpos < 0 → EOF-incomplete: fall through to recovery
        elif c == "/":
            # --- end tag (parse_endtag) ----------------------------------
            gt = rawdata.find(">", i + 1)
            if gt >= 0:
                gtpos = gt + 1
                m = _ENDTAGFIND.match(rawdata, i)
                if m:
                    elem = m.group(1).lower()
                    if cdata_elem is not None and elem != cdata_elem:
                        emit(_mk_text(rawdata[i:gtpos]))
                    else:
                        pop_to(elem)
                        cdata_elem = None
                    i = m.end() if cdata_elem is None else gtpos
                    continue
                if cdata_elem is not None:
                    emit(_mk_text(rawdata[i:gtpos]))
                    i = gtpos
                    continue
                nm = _TAGFIND.match(rawdata, i + 2)
                if not nm:
                    if rawdata[i : i + 3] == "</>":
                        i = i + 3
                        continue
                    pos = rawdata.find(">", i + 2)
                    if pos >= 0:  # bogus comment
                        emit(Comment(rawdata[i + 2 : pos]))
                        i = pos + 1
                        continue
                else:
                    pop_to(nm.group(1).lower())
                    i = rawdata.find(">", nm.end()) + 1
                    continue
            # unterminated → recovery
        elif rawdata.startswith("<!--", i):
            m = _COMMENTCLOSE.search(rawdata, i + 4)
            if m:
                emit(Comment(rawdata[i + 4 : m.start()]))
                i = m.end()
                continue
        elif c == "?":
            pos = rawdata.find(">", i + 2)
            if pos >= 0:  # PI: stdlib handle_pi is a no-op
                i = pos + 1
                continue
        elif c == "!":
            if rawdata.startswith("<![", i):
                raise _NeedsStdlib  # marked section (_markupbase machinery)
            if rawdata[i : i + 9].lower() == "<!doctype":
                pos = rawdata.find(">", i + 9)
                if pos >= 0:  # stdlib handle_decl is a no-op
                    i = pos + 1
                    continue
            else:
                pos = rawdata.find(">", i + 2)
                if pos >= 0:  # bogus comment
                    emit(Comment(rawdata[i + 2 : pos]))
                    i = pos + 1
                    continue
        elif i + 1 < n:
            emit(_mk_text("<"))
            i += 1
            continue
        else:
            emit(_mk_text("<"))  # goahead's trailing-data flush at EOF
            return root

        # --- EOF-incomplete construct recovery (goahead end=True, k<0) ----
        k = rawdata.find(">", i + 1)
        if k < 0:
            k = rawdata.find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        seg = rawdata[i:k]
        if seg:
            emit(_mk_text(seg if cdata_elem is not None else _unescape(seg)))
        i = k
    return root


# --- external tree-builder seam --------------------------------------------
# At 100 TB the per-document parse is the cluster bill, and a C parser
# (selectolax/lxml — absent from this container) is the 10-50x lever. The
# hook below lets a deployment drop one in WITHOUT touching the extraction
# pipeline: register a callable html -> root Element (children built from
# this module's Element/Text/Comment nodes; the implicit html/head/body
# normalization below still applies, so the builder only mirrors the raw
# tag tree). Returning None or raising falls back to the built-in parser,
# so a partial adapter degrades safely. An adapter is ~30 lines: walk the
# C parser's tree, emit Element(tag, attrs) / Text(data) preserving
# document order and script/style raw text. Contract is pinned by
# tests/test_textextract.py::test_tree_builder_seam.
_tree_builder = None


def set_tree_builder(fn):
    """Install ``fn(html) -> Element | None`` as the preferred tree builder.

    Returns the previously installed builder (None for the built-in), so
    callers can restore it. Pass ``None`` to uninstall."""
    global _tree_builder
    prev = _tree_builder
    _tree_builder = fn
    return prev


def parse(html: str) -> Element:
    """Parse HTML into a document Element with implicit html/head/body.

    Returns the ``html`` element equivalent (name ``#document`` root holding
    exactly one ``html`` child with ``head`` + ``body``), mirroring
    ``Jsoup.parse``'s always-materialized structure.
    """
    root = None
    if _tree_builder is not None:
        try:
            root = _tree_builder(html or "")
        except Exception:
            root = None
    if root is None:
        try:
            root = _fast_build(html or "")
        except Exception:
            root = None
    if root is None:
        b = _DomBuilder()
        try:
            b.feed(html or "")
            b.close()
        except Exception:
            pass  # salvage whatever tree was built — crawlers meet broken HTML
        root = b.root

    html_el = None
    for c in root.children:
        if isinstance(c, Element) and c._name == "html":
            html_el = c
            break
    doc = Element("#document")
    if html_el is not None:
        # hoist any stray siblings into the html element's body later
        doc.append(html_el)
    else:
        html_el = Element("html")
        doc.append(html_el)
        for c in list(root.children):
            html_el.append(c)

    head = next((c for c in html_el.children if isinstance(c, Element) and c._name == "head"), None)
    body = next((c for c in html_el.children if isinstance(c, Element) and c._name == "body"), None)
    if head is None or body is None:
        new_head = head if head is not None else Element("head")
        new_body = body if body is not None else Element("body")
        rest = [c for c in html_el.children if c is not head and c is not body]
        html_el.children = []
        # distribute loose nodes: while no body content seen yet, head-ish
        # elements (and whitespace) go to head; everything after to body
        in_head = head is None
        for c in rest:
            if in_head and isinstance(c, Element) and c._name in _HEAD_ELEMENTS:
                new_head.append(c)
            elif in_head and isinstance(c, Text) and not c.data.strip():
                new_head.append(c)
            else:
                in_head = False
                new_body.append(c)
        html_el.append(new_head)
        html_el.append(new_body)
    return doc


def body_of(doc: Element):
    return doc.find_first("body")


def head_of(doc: Element):
    return doc.find_first("head")
