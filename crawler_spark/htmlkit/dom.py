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


def parse(html: str) -> Element:
    """Parse HTML into a document Element with implicit html/head/body.

    Returns the ``html`` element equivalent (name ``#document`` root holding
    exactly one ``html`` child with ``head`` + ``body``), mirroring
    ``Jsoup.parse``'s always-materialized structure.
    """
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
