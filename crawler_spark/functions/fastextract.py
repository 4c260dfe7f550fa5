"""Fused single-pass HTML extraction — tokenizer and collection in one scan.

``extract_page`` (pageextract.py) runs three passes per document: the
tokenizer builds a DOM (htmlkit/dom.py ``_fast_build``), a collection walk
gathers links/metas/headings, and ``node_descendant_text`` walks again for
the body/title text. At 100 TB the per-document parse is the dominant
cluster cost (the reference engine runs the same parse-once design on
jsoup, a compiled parser — ``lib/crawler/data/crawl_result/html.rb:25-27``),
and for the common page shape all three passes can be fused into the
tokenizer loop itself: no Node allocation, no tree, text assembled by a
handful of accumulators as the tags stream by.

``extract_page_fast`` returns the exact ``extract_page`` dict, or ``None``
when the document needs the DOM path. Byte-identity is the contract, not a
goal: the differential tests (tests/test_fastextract.py) compare the two
paths field-for-field over the fixture corpora, an adversarial fragment
table and random soup.

Exactness notes (each mirrors a specific reference behavior):

* Text assembly replicates ``node_descendant_text``
  (``content_engine/utils.rb:34-97``) exactly: per-text-segment squish,
  a space around every element (open + close), break elements and
  comments to single spaces, ``content`` attributes contributing BEFORE
  the element's opening space, NON_CONTENT subtrees contributing nothing.
  The DOM walk's adjacent-space suppression is omitted on purpose — the
  final squish collapses whitespace runs, so suppression is observationally
  irrelevant; per-segment squish is NOT (it strips segment edges, which
  decides whether two segments join with or without a space).
* Heading / data-attribute text replicates ``element_text``
  (jsoup ``Element#text()``-alike): raw segment concatenation with a final
  squish, only script/style subtrees skipped, br/hr to a space.
* Anchor identity is (href, rel, anchor-text) with the text computed only
  on (href, rel) collisions (link.rb Set semantics); the fused path
  records each anchor's raw byte span and re-tokenizes the (rare)
  colliding spans lazily.
* The implicit html/head/body normalization of ``dom.parse`` (mirroring
  jsoup's implied-tag handling, ``lib/crawler/data/crawl_result/html.rb:26``)
  restructures documents missing a top-level head or body. The fused path
  emulates the distribution rule STREAMING for the common real-web shapes:
  with no explicit body ahead (one lazy ``<body``-tag scan decides), the
  head-ish prefix (``_HEAD_ELEMENTS`` + whitespace text) belongs to the
  implied head, and the first non-head-ish node — element, comment, or
  non-whitespace text (any node at all once an explicit head closed) —
  opens the implied body, which then runs to ``</html>``/EOF. An explicit
  body with an implied head needs no emulation as long as nothing is
  re-homed into the body behind the scan's back. Shapes whose
  distribution cannot be decided without the tree still bail.

Bail (→ ``None``, caller falls back to ``extract_page``):
* an explicit top-level <head>/<body> arriving AFTER the implied body
  opened, a duplicate or prefix-displaced <head> when the body is
  missing, content after an explicit </body> when the head is implied,
  or a "<body" ahead that never becomes a top-level body (the
  distribution the scan assumed is invalidated in each case);
* a top-level <html> after other top-level content, a second top-level
  <html>, or a self-closed <html/> (dom.parse drops/reparents content);
* any ``data-elastic-include``/``data-elastic-exclude`` attribute (the
  directive transformer needs the tree);
* a ``<![`` marked section (the tokenizer itself falls back to the
  stdlib builder there);
* a colliding anchor span that itself needs the stdlib builder.
"""

from __future__ import annotations

import re

from ..htmlkit import dom
from ..htmlkit.dom import (
    _HEAD_ELEMENTS,
    VOID_ELEMENTS,
    _ATTR_NEXT,
    _ATTRFIND,
    _CDATA_CLOSE,
    _COMMENTCLOSE,
    _ENDTAGFIND,
    _LOCATE_END,
    _NeedsStdlib,
    _TAGFIND,
    _unescape,
)
from .pageextract import (
    _HEADING_NAMES,
    element_text,
    make_resolver,
    resolve_href,
    valid_field_name,
)
from .textextract import (
    BREAK_ELEMENTS,
    EXCLUDE_ATTR,
    INCLUDE_ATTR,
    NON_CONTENT_TAGS,
    limit_bytesize,
    squish,
)


class _Bail(Exception):
    pass


# an explicit <body ...> / <html ...> start tag, anywhere in the raw
# bytes — the lazy lookaheads that decide whether the streaming
# implied-body emulation may open (a match that turns out nested or
# commented-out only costs a bail)
_BODY_TAG_RE = re.compile(r"<body(?=[\s/>]|$)", re.IGNORECASE)
_HTML_TAG_RE = re.compile(r"<html(?=[\s/>]|$)", re.IGNORECASE)


def extract_page_fast(
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
):
    """``extract_page`` result for the common page shape, else ``None``."""
    try:
        return _run(
            page_url,
            html or "",
            max_extracted_links,
            max_indexed_links,
            max_headings,
            max_title_size,
            max_body_size,
            max_keywords_size,
            max_description_size,
            max_elastic_tag_size,
            max_data_attribute_size,
        )
    except (_Bail, _NeedsStdlib):
        return None


def _run(
    page_url,
    rawdata,
    max_extracted_links,
    max_indexed_links,
    max_headings,
    max_title_size,
    max_body_size,
    max_keywords_size,
    max_description_size,
    max_elastic_tag_size,
    max_data_attribute_size,
):
    n = len(rawdata)
    i = 0
    cdata_elem = None
    _squish = squish

    stack = []  # open tag names; index = depth

    # --- structure / visibility (dom.parse normalization guards) ----------
    html_pos = -1  # stack index of the open top-level <html>, else -1
    html_seen = False
    suppress = False  # past the top-level </html>: nodes leave the doc
    toplevel_content = False
    head_top = False
    body_top = False

    # --- implied head/body emulation (dom.parse distribution rule) --------
    implied_body = False  # synthetic body opened by the streaming emulation
    implied_prefix = 0  # top-level head-ish elements attributed to implied head
    prefix_then_head = False  # explicit <head> arrived after such a prefix
    dup_head = False  # second top-level <head>
    declined_flip = False  # observable trigger declined ("<body" seen ahead)
    after_body_content = False  # top-level node after an explicit </body>
    body_ahead_state = None  # lazy one-shot _BODY_TAG_RE scan result
    html_ahead_state = None  # lazy one-shot _HTML_TAG_RE scan result
    # comment flip declines are unobservable ONLY if the anticipated
    # scaffolding actually arrives (dom drops a pre-<html> root comment;
    # one re-homed after an explicit body appends a squished-away space).
    # If it never does, dom would have flipped at the comment — bail.
    declined_comment_root = False  # root-level decline: needs html or body
    declined_comment_inhtml = False  # under-<html> decline: needs a body

    # --- body text accumulator (node_descendant_text rules) ---------------
    body_parts = None
    body_root = -1
    body_ign = -1  # stack index of the open NON_CONTENT skip-root
    body_done = False
    body_claimed = False
    body_final = None

    # --- title accumulator (node_descendant_text rules, first <title>) ----
    title_parts = None
    title_root = -1
    title_ign = -1
    title_claimed = False
    title_final = None

    # --- element_text accumulators (open headings / data attributes) ------
    etexts = []  # [root_idx, parts, ign_idx, out_list, out_slot]
    heading_texts = []  # finalized text, pre-order (= open) order
    data_recs = []  # [name, text], pre-order

    # --- anchors: lazy raw spans ------------------------------------------
    anchors = []  # [href, rel_str, span_start, root_idx(-1 if void), span_end]
    open_anchors = []

    # --- scalar collection -------------------------------------------------
    base_href = None
    canonical_href = None
    robots_contents = []
    meta_keywords = None
    kw_seen = False
    meta_description = None
    desc_seen = False
    elastic_metas = []

    def _body_ahead():
        """One lazy scan: is an explicit <body> start tag anywhere ahead?
        (Cached — a stale True only declines the emulation, never corrupts
        it: declined observable triggers bail at EOF if the body the scan
        saw never materializes at top level.)"""
        nonlocal body_ahead_state
        if body_ahead_state is None:
            body_ahead_state = _BODY_TAG_RE.search(rawdata, i) is not None
        return body_ahead_state

    def _start_implied_body():
        """Open the synthetic body of dom.parse's distribution rule: its
        children are every top-level node from the flip point on, so it
        behaves exactly like an explicit <body> sitting one level above
        them (stack index ``html_pos``: 0 under an open <html>, -1 at
        root — closed by </html> / only at EOF respectively)."""
        nonlocal body_claimed, body_parts, body_root, body_ign, implied_body
        body_claimed = True
        implied_body = True
        body_parts = []
        body_root = html_pos
        body_ign = -1

    def _top_parent():
        return (not stack and not html_seen) or (len(stack) == 1 and html_pos == 0)

    def emit_text(data):
        nonlocal toplevel_content, declined_flip, after_body_content
        ws = not data.strip()
        if not ws and not suppress and _top_parent():
            # dom distribution: non-whitespace top-level text is body
            # content — it opens the implied body (whitespace text is
            # head-filler pre-flip and squishes away post-flip either way)
            if not body_claimed:
                if _body_ahead():
                    declined_flip = True  # re-homed AFTER body's children
                else:
                    _start_implied_body()
            elif body_done and body_top:
                after_body_content = True
        if not stack:
            if not ws:
                toplevel_content = True
            if not (body_parts is not None and not body_done and body_ign < 0):
                return  # outside every element and no open implied body
        if body_parts is not None and not body_done and body_ign < 0:
            sq = _squish(data)
            body_parts.append(sq)
            if title_parts is not None and title_ign < 0:
                title_parts.append(sq)
        elif title_parts is not None and title_ign < 0:
            title_parts.append(_squish(data))
        if etexts:
            for e in etexts:
                if e[2] < 0:
                    e[1].append(data)

    def _html_ahead():
        nonlocal html_ahead_state
        if html_ahead_state is None:
            html_ahead_state = _HTML_TAG_RE.search(rawdata, i) is not None
        return html_ahead_state

    def emit_comment():
        # node_descendant_text: a comment contributes its surrounding
        # spaces (one suffices under the final squish); element_text: none.
        # A top-level comment is a non-head-ish node in dom's distribution
        # — it opens the implied body, UNLESS explicit scaffolding lies
        # ahead: a root comment before <html> is dropped by dom outright,
        # and one re-homed after an explicit body appends only a
        # squished-away space. Either decline is re-validated at EOF (the
        # flags above) in case the lookahead match was a red herring.
        nonlocal declined_comment_root, declined_comment_inhtml
        if not suppress and not body_claimed and _top_parent():
            at_root = not html_seen
            if _body_ahead() or (at_root and _html_ahead()):
                if at_root:
                    declined_comment_root = True
                else:
                    declined_comment_inhtml = True
            else:
                _start_implied_body()
        if body_parts is not None and not body_done and body_ign < 0:
            body_parts.append(" ")
        if title_parts is not None and title_ign < 0:
            title_parts.append(" ")

    def trunc(idx, pos):
        """Close every element at stack index >= idx (pop_to / EOF)."""
        nonlocal body_ign, body_done, body_final, body_parts
        nonlocal title_ign, title_final, title_parts
        nonlocal suppress, html_pos
        depth = len(stack)
        if idx >= depth:
            return
        if open_anchors:
            keep = []
            for ai in open_anchors:
                a = anchors[ai]
                if a[3] >= idx:
                    a[4] = pos
                else:
                    keep.append(ai)
            open_anchors[:] = keep
        if etexts:
            keep = []
            for e in etexts:
                if 0 <= e[2]:
                    if e[2] >= idx:
                        e[2] = -1
                if e[0] >= idx:
                    e[3][e[4]] = _squish("".join(e[1]))
                else:
                    keep.append(e)
            etexts[:] = keep
        if body_parts is not None and not body_done:
            hi = body_ign if body_ign >= 0 else depth
            lo = body_root + 1 if idx <= body_root else idx
            cnt = hi - lo
            if cnt > 0:
                body_parts.append(" " * cnt)
            if body_ign >= idx:
                body_ign = -1
            if body_root >= idx:
                body_done = True
                body_final = body_parts
        if title_parts is not None:
            hi = title_ign if title_ign >= 0 else depth
            lo = title_root + 1 if idx <= title_root else idx
            cnt = hi - lo
            if cnt > 0:
                title_parts.append(" " * cnt)
            if title_ign >= idx:
                title_ign = -1
            if title_root >= idx:
                title_final = title_parts
                title_parts = None
        if html_pos >= idx:
            html_pos = -1
            suppress = True
        del stack[idx:]

    def pop_to(tag, pos):
        if tag in VOID_ELEMENTS:
            return
        for idx in range(len(stack) - 1, -1, -1):
            if stack[idx] == tag:
                trunc(idx, pos)
                return

    while i < n:
        # --- text run up to the next construct (dom.py:252-266) -----------
        if cdata_elem is None:
            j = rawdata.find("<", i)
            if j < 0:
                emit_text(_unescape(rawdata[i:n]))
                i = n
                break
            if i < j:
                emit_text(_unescape(rawdata[i:j]))
        else:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                break  # stdlib drops unterminated CDATA at EOF
            j = m.start()
            # CDATA text lives under script/style: invisible to every
            # accumulator (node rules skip those subtrees; element_text too)
        i = j

        c = rawdata[i + 1 : i + 2]
        if c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            # --- start tag (dom.py:271-322) --------------------------------
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
                    emit_text(rawdata[i:endpos])  # raw, as stdlib handle_data
                    i = endpos
                    continue

                # ==== start-tag event =====================================
                depth = len(stack)
                selfclosing = end == "/>" or tag in VOID_ELEMENTS
                if attrs and (EXCLUDE_ATTR in attrs or INCLUDE_ATTR in attrs):
                    raise _Bail  # directive transformer needs the tree
                if tag == "html" and depth == 0:
                    if html_seen or toplevel_content or selfclosing:
                        raise _Bail
                    html_seen = True
                    html_pos = 0
                    # any root comment the lookahead declined is now
                    # DEFINITIVELY dropped by dom (stray root sibling of
                    # an explicit <html>): attribution inside the html
                    # element starts fresh
                    declined_comment_root = False
                else:
                    if depth == 0 and not suppress and not html_seen:
                        toplevel_content = True
                    top_parent = (depth == 0 and not html_seen) or (
                        depth == 1 and html_pos == 0
                    )
                    if top_parent:
                        if tag == "head":
                            if implied_body:
                                raise _Bail  # head arrived after the flip
                            if head_top:
                                dup_head = True
                            if implied_prefix:
                                prefix_then_head = True
                            head_top = True
                        elif tag == "body":
                            if implied_body:
                                raise _Bail  # explicit body after the flip
                            if body_top:
                                # duplicate top-level body: with the head
                                # missing, dom re-homes it INTO the first
                                # body — same EOF soundness gate as any
                                # other post-body content
                                after_body_content = True
                            body_top = True
                        elif not body_claimed:
                            # dom distribution: head-ish prefix → implied
                            # head — but only while no explicit head closed
                            # AND no comment flip was declined (a declined
                            # comment already flipped dom's in_head, so a
                            # later head-ish element belongs to the body)
                            if (
                                tag in _HEAD_ELEMENTS
                                and not head_top
                                and not declined_comment_root
                                and not declined_comment_inhtml
                            ):
                                implied_prefix += 1
                            elif _body_ahead():
                                declined_flip = True
                            else:
                                _start_implied_body()
                        elif body_done and body_top:
                            after_body_content = True

                in_body = body_parts is not None and not body_done
                if not suppress:
                    # collection — the extract_page walk's chain, verbatim
                    if attrs and in_body and "data-elastic-name" in attrs:
                        rec = [attrs["data-elastic-name"], ""]
                        data_recs.append(rec)
                        if not selfclosing:
                            etexts.append([depth, [], -1, rec, 1])
                    if tag == "a":
                        if "href" in attrs:
                            a = [
                                attrs["href"],
                                attrs.get("rel", ""),
                                endpos,
                                -1 if selfclosing else depth,
                                endpos,
                            ]
                            anchors.append(a)
                            if not selfclosing:
                                open_anchors.append(len(anchors) - 1)
                    elif tag == "meta":
                        nm = attrs.get("name", "").lower()
                        if nm == "robots":
                            robots_contents.append(attrs.get("content", "").lower())
                        elif nm == "keywords":
                            if not kw_seen and "content" in attrs:
                                meta_keywords, kw_seen = attrs["content"], True
                        elif nm == "description":
                            if not desc_seen and "content" in attrs:
                                meta_description, desc_seen = attrs["content"], True
                        if (
                            "elastic" in attrs.get("class", "").split()
                            and "name" in attrs
                            and "content" in attrs
                        ):
                            elastic_metas.append((attrs["name"], attrs["content"]))
                    elif tag == "link":
                        if (
                            canonical_href is None
                            and "canonical" in attrs.get("rel", "").lower().split()
                            and attrs.get("href", "").strip()
                        ):
                            canonical_href = attrs["href"]
                    elif tag == "title":
                        if not title_claimed:
                            title_claimed = True
                            if selfclosing:
                                title_final = []
                            else:
                                title_parts = []
                                title_root = depth
                                title_ign = -1
                    elif tag == "base":
                        if base_href is None and attrs.get("href", "").strip():
                            base_href = attrs["href"].strip()
                    elif in_body and tag in _HEADING_NAMES:
                        heading_texts.append("")
                        if not selfclosing:
                            etexts.append(
                                [depth, [], -1, heading_texts, len(heading_texts) - 1]
                            )
                    elif tag == "body":
                        if not body_claimed:
                            body_claimed = True
                            if selfclosing:
                                body_done = True
                                body_final = []
                            else:
                                body_parts = []
                                body_root = depth
                                body_ign = -1

                # node-mode text choreography (body + title)
                if body_parts is not None and not body_done and body_ign < 0:
                    if tag in NON_CONTENT_TAGS:
                        if not selfclosing:
                            body_ign = depth
                    elif tag in BREAK_ELEMENTS:
                        body_parts.append(" ")
                    else:
                        cattr = attrs.get("content")
                        if cattr is not None:
                            body_parts.append(_squish(cattr))
                        body_parts.append("  " if selfclosing else " ")
                if title_parts is not None and title_ign < 0:
                    if tag in NON_CONTENT_TAGS:
                        if not selfclosing:
                            title_ign = depth
                    elif tag in BREAK_ELEMENTS:
                        title_parts.append(" ")
                    else:
                        cattr = attrs.get("content")
                        if cattr is not None:
                            title_parts.append(_squish(cattr))
                        title_parts.append("  " if selfclosing else " ")
                if etexts:
                    for e in etexts:
                        if e[2] < 0:
                            if tag == "br" or tag == "hr":
                                e[1].append(" ")
                            elif (tag == "script" or tag == "style") and not selfclosing:
                                e[2] = depth

                if not selfclosing:
                    stack.append(tag)
                    if tag in ("script", "style"):
                        cdata_elem = tag
                i = endpos
                continue
            # endpos < 0 → EOF-incomplete: fall through to recovery
        elif c == "/":
            # --- end tag (dom.py:324-358) ----------------------------------
            gt = rawdata.find(">", i + 1)
            if gt >= 0:
                gtpos = gt + 1
                m = _ENDTAGFIND.match(rawdata, i)
                if m:
                    elem = m.group(1).lower()
                    if cdata_elem is not None and elem != cdata_elem:
                        pass  # raw text inside CDATA → invisible
                    else:
                        pop_to(elem, i)
                        cdata_elem = None
                    i = m.end() if cdata_elem is None else gtpos
                    continue
                if cdata_elem is not None:
                    i = gtpos  # raw text inside CDATA → invisible
                    continue
                nm = _TAGFIND.match(rawdata, i + 2)
                if not nm:
                    if rawdata[i : i + 3] == "</>":
                        i = i + 3
                        continue
                    pos = rawdata.find(">", i + 2)
                    if pos >= 0:  # bogus comment
                        emit_comment()
                        i = pos + 1
                        continue
                else:
                    pop_to(nm.group(1).lower(), i)
                    i = rawdata.find(">", nm.end()) + 1
                    continue
            # unterminated → recovery
        elif rawdata.startswith("<!--", i):
            m = _COMMENTCLOSE.search(rawdata, i + 4)
            if m:
                emit_comment()
                i = m.end()
                continue
        elif c == "?":
            pos = rawdata.find(">", i + 2)
            if pos >= 0:  # PI: no-op
                i = pos + 1
                continue
        elif c == "!":
            if rawdata.startswith("<![", i):
                raise _NeedsStdlib  # marked section → DOM (stdlib) path
            if rawdata[i : i + 9].lower() == "<!doctype":
                pos = rawdata.find(">", i + 9)
                if pos >= 0:  # no-op
                    i = pos + 1
                    continue
            else:
                pos = rawdata.find(">", i + 2)
                if pos >= 0:  # bogus comment
                    emit_comment()
                    i = pos + 1
                    continue
        elif i + 1 < n:
            emit_text("<")
            i += 1
            continue
        else:
            emit_text("<")  # goahead's trailing-data flush at EOF
            i = n
            break

        # --- EOF-incomplete construct recovery (dom.py:394-406) ------------
        k = rawdata.find(">", i + 1)
        if k < 0:
            k = rawdata.find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        seg = rawdata[i:k]
        if seg and cdata_elem is None:
            emit_text(_unescape(seg))
        i = k

    trunc(0, n)

    # declined comment flips: sound only if the scaffolding the lookahead
    # anticipated actually arrived (see the flag comments above)
    if declined_comment_inhtml and not body_top:
        raise _Bail
    if declined_comment_root and not (html_seen or body_top):
        raise _Bail

    # dom.parse's head/body distribution ran iff either is missing: the
    # streaming emulation must have been sound, else the DOM path decides
    if not head_top or not body_top:
        if (dup_head or prefix_then_head) and not body_top:
            # with no body, dom re-homes the duplicate head / the
            # displaced prefix into the body — not what the scan assumed
            raise _Bail
        if implied_body:
            if body_final is None:
                # root-level implied body (no <html>): closes only at EOF
                body_final = body_parts if body_parts is not None else []
        elif body_top:
            # explicit body + implied head: dom appends any trailing
            # top-level content INTO the body — the scan closed it earlier
            if after_body_content or declined_flip:
                raise _Bail
        elif declined_flip:
            raise _Bail  # the "<body" ahead never became a top-level body
        elif body_final is None:
            body_final = []  # every node was head-ish: empty implied body

    # ==== post-processing: identical to extract_page's tail ===============

    # anchors → accepted raw links (link.rb Set identity, lazy span text)
    raw_links = []
    link_groups = {}
    link_texts = {}
    limit_reached = False

    def _span_text(a):
        # element_text of the anchor's content, re-tokenized in isolation:
        # structure inside the span is irrelevant to element_text (only
        # script/style sub-CDATA and br/hr matter, both context-free)
        return element_text(dom._fast_build(rawdata[a[2] : a[4]]))

    for a in anchors:
        href = a[0]
        rel = tuple(a[1].lower().split())
        key = (href, rel)
        group = link_groups.get(key)
        if group is None:
            link_groups[key] = [a]
            accept = True
        else:
            texts = link_texts.get(key)
            if texts is None:
                texts = {_span_text(x) for x in group}
                link_texts[key] = texts
            t = _span_text(a)
            accept = t not in texts
            if accept:
                texts.add(t)
                group.append(a)
        if accept:
            raw_links.append((href, "nofollow" in rel))
            if max_extracted_links and len(raw_links) >= max_extracted_links:
                limit_reached = True
                break

    # base URL (html.rb:53-71)
    if base_href is not None:
        resolved = resolve_href(page_url, base_href)
        page_base = resolved if resolved is not None else page_url
    else:
        page_base = page_url

    resolver = make_resolver(page_base)
    links = [
        {"href": href, "url": resolver(href), "nofollow": nofollow, "pos": pos}
        for pos, (href, nofollow) in enumerate(raw_links)
    ]

    valid_urls = []
    for lk in links:
        if lk["url"] is not None:
            valid_urls.append(lk["url"])
            if len(valid_urls) >= max_indexed_links:
                break
    indexed_links = sorted(valid_urls)

    canonical_url = resolve_href(page_url, canonical_href) if canonical_href else None

    meta_nofollow = any("nofollow" in c for c in robots_contents)
    meta_noindex = any("noindex" in c for c in robots_contents)

    title = limit_bytesize(
        _squish("".join(title_final)) if title_final is not None else "",
        max_title_size,
    )
    body = limit_bytesize(
        _squish("".join(body_final)) if body_final is not None else "",
        max_body_size,
    )

    headings = []
    hseen = set()
    for t in heading_texts:
        if t and t not in hseen:
            hseen.add(t)
            headings.append(t)
            if len(headings) >= max_headings:
                break

    extra_fields = {}
    for nm, content in elastic_metas:
        if valid_field_name(nm):
            extra_fields[nm] = limit_bytesize(content, max_elastic_tag_size)
    for nm, text in data_recs:
        if valid_field_name(nm):
            extra_fields[nm] = limit_bytesize(text, max_data_attribute_size)

    meta_keywords = (
        limit_bytesize(meta_keywords, max_keywords_size) if meta_keywords else None
    )
    meta_description = (
        limit_bytesize(meta_description, max_description_size)
        if meta_description
        else None
    )

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


__all__ = ["extract_page_fast"]
