"""Optional C-parser backends for the DOM seam (:func:`dom.set_tree_builder`).

At 100 TB the per-document HTML parse is the cluster bill, and a C
parser (libxml2 via lxml, or lexbor via selectolax) is the 10-50x
lever. Neither ships in this container, so everything here is
import-gated: :func:`install_best_backend` quietly returns ``None``
when no C parser is importable and the built-in parser keeps working —
while a production image with ``lxml`` installed gets the fast path by
calling one function at executor startup (e.g. at the top of the parse
UDF module).

The lxml tree walker is a pure function over the etree node protocol
(``.tag`` / ``.attrib`` / ``.text`` / ``.tail`` / child iteration /
callable-tag comments), so it is unit-tested against duck-typed fakes
even where the library is absent (tests/test_textextract.py).

Fidelity note: a backend swaps the *tree construction*, not the
extraction pipeline; libxml2's error recovery on malformed HTML can
differ from the built-in parser's, so a deployment flipping this on
should replay its extraction-parity fuzz suite on its own corpus (the
in-repo suite pins the built-in parser against html.parser).
"""

from __future__ import annotations

from . import dom


def convert_lxml_node(src) -> dom.Element:
    """Convert one lxml-protocol element (duck-typed) into a
    :class:`dom.Element` subtree, preserving document order, attribute
    values, comments, and script/style raw text.

    Protocol consumed: ``src.tag`` (str for elements, non-str for
    comments/PIs), ``src.attrib`` (mapping), ``src.text`` / ``src.tail``
    (str or None), and iteration yielding children.
    """
    el = dom.Element(str(src.tag).lower(), dict(src.attrib))
    if src.text:
        el.append(dom.Text(src.text))
    for child in src:
        if isinstance(child.tag, str):
            el.append(convert_lxml_node(child))
        else:  # comment / processing instruction: keep as a comment node
            el.append(dom.Comment(child.text or ""))
        if child.tail:
            el.append(dom.Text(child.tail))
    return el


def lxml_builder():
    """Return an ``html -> Element`` tree builder backed by lxml
    (libxml2), or ``None`` when lxml is not importable."""
    try:
        from lxml import etree
    except ImportError:
        return None

    def build(html: str):
        if not html or not html.strip():
            return None  # fall back: empty input is the built-in's case
        tree = etree.HTML(html)  # libxml2 always wraps in <html>
        if tree is None:
            return None
        root = dom.Element("#root")
        root.append(convert_lxml_node(tree))
        return root

    return build


def selectolax_builder():
    """Placeholder for a lexbor (selectolax) adapter: returns ``None``
    until the library is importable AND its node-walk is pinned by a
    test against the real package — shipping an untested walk against a
    remembered API would be a silent-corruption risk, the one failure
    mode a parser seam must not have."""
    try:
        import selectolax  # noqa: F401
    except ImportError:
        return None
    return None


_FACTORIES = (("lxml", lxml_builder), ("selectolax", selectolax_builder))


def install_best_backend() -> str | None:
    """Install the fastest importable C-parser backend into the DOM seam.

    Returns the backend name, or ``None`` (and changes nothing) when no
    C parser is available. Safe to call unconditionally at executor
    startup; raising/None-returning builders degrade to the built-in
    parser per the seam contract.
    """
    for name, factory in _FACTORIES:
        builder = factory()
        if builder is not None:
            dom.set_tree_builder(builder)
            return name
    return None
