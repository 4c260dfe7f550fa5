"""HTML text extraction — the byte-identical-text invariant.

Reproduces the reference engine's content extraction semantics:

* ``node_descendant_text`` — ``lib/crawler/content_engine/utils.rb:34-97``
  (iterative stack walk, NON_CONTENT_TAGS skipped, ``br``/``hr`` → single
  space, text squished, element ``content`` attributes contribute, a space
  pushed around every element, adjacent-space suppression, final squish).
* ``limit_bytesize`` — ``utils.rb:106-120`` (grapheme-cluster safe
  truncation appending ``…``).
* include/exclude transformer — ``lib/crawler/content_engine/transformer.rb``
  (``data-elastic-exclude`` subtrees drop their text nodes unless re-included
  by a nested ``data-elastic-include``).

Golden behaviors pinned by tests (ported from the reference's own specs,
``spec/lib/crawler/content_engine/utils_spec.rb:19-57`` and
``docs/features/CRAWLER_DIRECTIVES.md:101-151``):
``'<p>Hello,<br>World!</p>' -> 'Hello, World!'``; script bodies skipped;
``<meta content=...>`` text contributes; the ``test1 test3 test5 test7``
directives example.
"""

from __future__ import annotations

import re

import regex as _regex

from ..htmlkit.dom import Comment, Element, Node, Text

# utils.rb:15-22 — note jsoup's Comment nodeName is "#comment", so the
# literal "comment" entry never fires; we keep the same (non-)behavior.
NON_CONTENT_TAGS = frozenset(["comment", "object", "script", "style", "svg", "video"])
BREAK_ELEMENTS = frozenset(["br", "hr"])
OMISSION = "…"

INCLUDE_ATTR = "data-elastic-include"
EXCLUDE_ATTR = "data-elastic-exclude"

# Ruby String#squish: strip + collapse [[:space:]]+ to one space.
_SQUISH_RE = re.compile(r"\s+")


def squish(s: str) -> str:
    return _SQUISH_RE.sub(" ", s).strip()


def node_descendant_text(node, ignore_tags=NON_CONTENT_TAGS) -> str:
    """Port of Utils.node_descendant_text (utils.rb:34-97)."""
    if node is None:
        return ""
    stack: list = [node]
    text: list[str] = []
    # class-dispatch (no per-node .name property call): Text/Comment names
    # are the fixed "#text"/"#comment", never in BREAK_ELEMENTS, so only
    # their ignore_tags membership must be preserved from the name ladder
    while stack:
        n = stack.pop()
        cls = n.__class__
        if cls is str:
            if not (n == " " and text and text[-1] == " "):
                text.append(n)
            continue
        if cls is Text:
            if "#text" not in ignore_tags:
                text.append(squish(n.data))
            continue
        if cls is Comment:
            # falls through the reference's type ladder to the generic
            # element branch: contributes surrounding spaces, no children
            if "#comment" not in ignore_tags:
                stack.append(" ")
                stack.append(" ")
            continue
        name = n._name if cls is Element else n.name
        if name in ignore_tags:
            continue
        if name in BREAK_ELEMENTS:
            if not (text and text[-1] == " "):
                text.append(" ")
            continue
        if isinstance(n, Element):
            content = n.attrs.get("content")
            if content is not None:
                text.append(squish(content))
        # space after children (popped last), children in doc order, space before
        stack.append(" ")
        for child in reversed(n.children):
            stack.append(child)
        stack.append(" ")
    return squish("".join(text))


def limit_bytesize(s, limit: int):
    """Byte-limit truncation on grapheme boundaries with '…' (utils.rb:106-120)."""
    if s is None:
        return None
    raw = s.encode("utf-8")
    if len(raw) <= limit:
        return s
    real_limit = limit - len(OMISSION.encode("utf-8"))
    cut = []
    size = 0
    for m in _regex.finditer(r"\X", s):
        g = m.group(0)
        gb = len(g.encode("utf-8"))
        if size + gb <= real_limit:
            cut.append(g)
            size += gb
        else:
            cut.append(OMISSION)
            break
    return "".join(cut)


# --- include/exclude transformer (transformer.rb:16-57) -------------------


def transform(tag: Element) -> Element:
    """Non-destructive: deep-copies then applies exclusion rules."""
    return transform_inplace(tag.copy())


def transform_inplace(tag: Element) -> Element:
    while True:
        if tag.has_attr(EXCLUDE_ATTR):
            node = tag
        else:
            node = _select_first_with_attr(tag, EXCLUDE_ATTR)
        if node is None:
            break
        _traverse(node, "exclude")
    return tag


def _select_first_with_attr(tag: Element, attr: str):
    for el in tag.iter_elements():
        if el.has_attr(attr):
            return el
    return None


def _traverse(node: Element, mode: str):
    if node.has_attr(EXCLUDE_ATTR):
        del node.attrs[EXCLUDE_ATTR]
    for child in list(node.children):
        if isinstance(child, Text) and mode == "exclude":
            node.remove_child(child)
        elif isinstance(child, Element):
            if child.has_attr(INCLUDE_ATTR):
                new_mode = "include"
            elif child.has_attr(EXCLUDE_ATTR):
                new_mode = "exclude"
            else:
                new_mode = mode
            _traverse(child, new_mode)


def remove_tags(doc: Element, exclude_tags) -> Element:
    """Fresh-copy removal of configured tags before body extraction
    (html.rb:29-40)."""
    doc = doc.copy()
    names = set(exclude_tags)
    def _prune(el: Element):
        el.children = [
            c for c in el.children if not (isinstance(c, Element) and c._name in names)
        ]
        for c in el.children:
            if isinstance(c, Element):
                _prune(c)
    _prune(doc)
    return doc
