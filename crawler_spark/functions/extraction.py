"""Content-extraction rules engine (SURVEY §2.3 E19).

Reproduces the reference's per-domain extraction rulesets:

* ruleset url_filters — ``lib/crawler/data/extraction/url_filter.rb`` +
  ``ruleset.rb:40-55``: each filter (begins/ends/contains/regex) compiles
  through the SAME ``Crawler::Utils.url_pattern`` builder as crawl rules
  (reused from :mod:`crawler_spark.functions.rules`); no filters → every
  URL matches; ANY filter match → every rule in the ruleset executes; the
  fields of later rulesets merge over earlier ones
  (``content_engine/extractor.rb:17-27``).
* rules — ``lib/crawler/data/extraction/rule.rb``: ``action`` ∈
  {set, extract}; ``set`` stores ``value``; ``extract`` pulls from
  ``source`` ∈ {url, html}. URL source: regex over the normalized URL —
  capture groups if present, else the whole match, as a 1-element array
  (``data/url.rb:76-88``); 0.5 s regex timeout
  (``content_engine/extractor.rb:12,50-53``). HTML source: the selector
  type is INFERRED — valid CSS wins, else XPath (``rule.rb:93-137``);
  selected nodes map through ``node_descendant_text`` with NO ignored
  tags (``crawl_result/html.rb:242-259``; extractor passes
  ``ignore_tags=[]``).
* ``join_as`` — array keeps the occurrence list, string joins with ' '
  (``extractor.rb:68-72``).

Selector engines are pure-Python subsets over :mod:`crawler_spark.htmlkit`
(the container has no lxml/jsoup):

* CSS: selector groups (','), descendant (' ') and child ('>')
  combinators, compounds of ``tag``/``*``, ``#id``, ``.class``,
  ``[attr]``, ``[attr=v]``, ``[attr^=v]``, ``[attr$=v]``, ``[attr*=v]``
  — matched in document order.
* XPath: ``/`` (child) and ``//`` (descendant-or-self) steps of
  ``tag``/``*`` with optional ``[@attr]`` / ``[@attr='v']`` predicates,
  terminated by ``text()`` (the reference's jsoup call selects TextNode
  results only, so an element-valued XPath yields nothing — mirrored
  here).
"""

from __future__ import annotations

import re

import regex as _regex

from ..htmlkit import dom
from .rules import url_pattern
from .textextract import node_descendant_text, squish

ACTIONS = ("extract", "set")
JOINS = ("array", "string")
SOURCES = ("url", "html")
URL_FILTER_TYPES = ("begins", "ends", "contains", "regex")
REGEX_TIMEOUT_S = 0.5


# --- CSS subset ------------------------------------------------------------

_COMPOUND_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:#[\w-]+|\.[\w-]+|\[[^\]]+\])*)$"
)
_PART_RE = re.compile(r"#[\w-]+|\.[\w-]+|\[[^\]]+\]")
_ATTR_RE = re.compile(r"^\[\s*([\w-]+)\s*(?:([~^$*|]?=)\s*(\"[^\"]*\"|'[^']*'|[^\]]*)\s*)?\]$")


class SelectorError(ValueError):
    pass


def _parse_compound(token: str):
    m = _COMPOUND_RE.match(token)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise SelectorError(f"not a valid CSS compound: {token!r}")
    tag = m.group("tag")
    tag = tag.lower() if tag and tag != "*" else None
    checks = []
    consumed = m.end("rest") - m.start("rest")
    if len(m.group("rest") or "") != consumed:
        raise SelectorError(f"trailing junk in {token!r}")
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("#"):
            checks.append(("attr=", "id", part[1:]))
        elif part.startswith("."):
            checks.append(("class", None, part[1:]))
        else:
            am = _ATTR_RE.match(part)
            if not am:
                raise SelectorError(f"bad attribute selector {part!r}")
            name, op, val = am.group(1), am.group(2), am.group(3)
            if op is None:
                checks.append(("attr?", name.lower(), None))
            else:
                if val and val[0] in "\"'" and val[0] == val[-1]:
                    val = val[1:-1]
                opmap = {"=": "attr=", "^=": "attr^", "$=": "attr$", "*=": "attr*"}
                if op not in opmap:
                    raise SelectorError(f"unsupported attribute op {op!r}")
                checks.append((opmap[op], name.lower(), val))
    return tag, checks


def _compound_matches(el, tag, checks) -> bool:
    if not isinstance(el, dom.Element):
        return False
    if tag is not None and el.name != tag:
        return False
    for kind, name, val in checks:
        if kind == "class":
            if val not in el.classes():
                return False
            continue
        if not el.has_attr(name):
            return False
        got = el.attr(name) or ""
        if kind == "attr=" and got != val:
            return False
        if kind == "attr^" and not got.startswith(val):
            return False
        if kind == "attr$" and not got.endswith(val):
            return False
        if kind == "attr*" and val not in got:
            return False
    return True


def parse_css(selector: str):
    """Parse into [[(combinator, (tag, checks)), ...], ...] (one list per
    comma group; first compound's combinator is ' ')."""
    groups = []
    for group in selector.split(","):
        group = group.strip()
        if not group:
            raise SelectorError("empty selector group")
        # normalize child combinator spacing then tokenize
        tokens = group.replace(">", " > ").split()
        chain = []
        comb = " "
        for tok in tokens:
            if tok == ">":
                if not chain:
                    raise SelectorError(f"dangling '>' in {selector!r}")
                comb = ">"
                continue
            chain.append((comb, _parse_compound(tok)))
            comb = " "
        if comb == ">" or not chain:
            raise SelectorError(f"dangling combinator in {selector!r}")
        groups.append(chain)
    return groups


def _chain_matches(el, chain, parents) -> bool:
    comb, (tag, checks) = chain[-1]
    if not _compound_matches(el, tag, checks):
        return False
    idx = len(chain) - 2
    pos = len(parents) - 1
    while idx >= 0:
        comb_here = chain[idx + 1][0]
        tag_i, checks_i = chain[idx][1]
        if comb_here == ">":
            if pos < 0 or not _compound_matches(parents[pos], tag_i, checks_i):
                return False
            pos -= 1
            idx -= 1
        else:
            while pos >= 0 and not _compound_matches(parents[pos], tag_i, checks_i):
                pos -= 1
            if pos < 0:
                return False
            pos -= 1
            idx -= 1
    return True


def select_css(root, selector) -> list:
    """Elements matching the selector, in document order."""
    groups = parse_css(selector) if isinstance(selector, str) else selector
    out = []
    stack = [(root, [])]
    # iterative pre-order with parent chain
    def walk(el, parents):
        for chain in groups:
            if _chain_matches(el, chain, parents):
                out.append(el)
                break
        for ch in el.children:
            if isinstance(ch, dom.Element):
                walk(ch, parents + [el])

    if isinstance(root, dom.Element):
        walk(root, [])
    return out


# --- XPath subset ----------------------------------------------------------

_XSTEP_RE = re.compile(
    r"^(?P<name>[a-zA-Z][\w-]*|\*|text\(\))"
    r"(?P<preds>(?:\[[^\]]+\])*)$"
)
_XPRED_RE = re.compile(r"^\[\s*@([\w-]+)\s*(?:=\s*('[^']*'|\"[^\"]*\"))?\s*\]$")


def parse_xpath(selector: str):
    """Parse into [(axis, name, [(attr, val|None), ...]), ...]."""
    if not selector.startswith("/"):
        raise SelectorError(f"xpath must start with / or //: {selector!r}")
    steps = []
    i = 0
    n = len(selector)
    while i < n:
        if selector.startswith("//", i):
            axis, i = "desc", i + 2
        elif selector.startswith("/", i):
            axis, i = "child", i + 1
        else:
            raise SelectorError(f"bad xpath at {selector[i:]!r}")
        j = i
        while j < n and selector[j] != "/":
            j += 1
        step = selector[i:j]
        m = _XSTEP_RE.match(step)
        if not m:
            raise SelectorError(f"unsupported xpath step {step!r}")
        preds = []
        for p in re.findall(r"\[[^\]]+\]", m.group("preds") or ""):
            pm = _XPRED_RE.match(p)
            if not pm:
                raise SelectorError(f"unsupported xpath predicate {p!r}")
            val = pm.group(2)
            preds.append((pm.group(1).lower(), val[1:-1] if val else None))
        name = m.group("name")
        steps.append((axis, name.lower() if name != "*" else "*", preds))
        i = j
    if not steps:
        raise SelectorError("empty xpath")
    return steps


def _xpath_step(nodes, axis, name, preds):
    out, seen = [], set()

    def want(n):
        if name == "text()":
            return isinstance(n, dom.Text)
        if not isinstance(n, dom.Element):
            return False
        if name != "*" and n.name != name:
            return False
        for attr, val in preds:
            if not n.has_attr(attr):
                return False
            if val is not None and (n.attr(attr) or "") != val:
                return False
        return True

    for node in nodes:
        if axis == "child":
            cands = list(getattr(node, "children", []))
        else:  # descendant-or-self
            cands = []
            stack = [node]
            while stack:
                cur = stack.pop()
                cands.append(cur)
                kids = list(getattr(cur, "children", []))
                for k in reversed(kids):
                    stack.append(k)
        for c in cands:
            if want(c) and id(c) not in seen:
                seen.add(id(c))
                out.append(c)
    return out


def select_xpath(root, selector) -> list:
    """Nodes matching the xpath subset; the reference call keeps only
    TextNode results, so callers filter on dom.Text."""
    steps = parse_xpath(selector) if isinstance(selector, str) else selector
    nodes = [root]
    for axis, name, preds in steps:
        nodes = _xpath_step(nodes, axis, name, preds)
    return nodes


# --- rules / rulesets ------------------------------------------------------


class ExtractionRule:
    """One validated rule (rule.rb:36-116)."""

    def __init__(self, spec: dict):
        self.action = spec.get("action")
        self.field_name = spec.get("field_name")
        self.selector = spec.get("selector")
        self.join_as = spec.get("join_as")
        self.source = spec.get("source")
        self.value = spec.get("value")
        self.type = None
        self._compiled = None
        self._validate()

    def _validate(self):
        if self.action not in ACTIONS:
            raise ValueError(
                f"Extraction rule action `{self.action}` is invalid; "
                f"value must be one of {', '.join(ACTIONS)}"
            )
        if self.action == "set" and self.value is None:
            raise ValueError("Extraction rule value can't be blank when action is `set`")
        if not isinstance(self.field_name, str):
            raise ValueError("Extraction rule field_name must be a string")
        if self.field_name == "":
            raise ValueError("Extraction rule field_name can't be blank")
        # lazy import: pageextract imports this module (one-way at runtime)
        from .pageextract import RESERVED_FIELD_NAMES

        if self.field_name in RESERVED_FIELD_NAMES:
            raise ValueError(
                f"Extraction rule field_name can't be a reserved field: {self.field_name}"
            )
        if self.action != "set" and self.join_as not in JOINS:
            raise ValueError(
                f"Extraction rule join_as `{self.join_as}` is invalid; "
                f"value must be one of {', '.join(JOINS)}"
            )
        if self.source not in SOURCES:
            raise ValueError(
                f"Extraction rule source `{self.source}` is invalid; "
                f"value must be one of {', '.join(SOURCES)}"
            )
        if not self.selector and self.action != "set":
            raise ValueError("Extraction rule selector can't be blank")
        if self.selector is None:
            return
        if self.source == "html":
            # inference: valid CSS wins, else XPath (rule.rb:96-137)
            try:
                self._compiled = parse_css(self.selector)
                self.type = "css"
                return
            except SelectorError as css_err:
                try:
                    self._compiled = parse_xpath(self.selector)
                    self.type = "xpath"
                    return
                except SelectorError as xp_err:
                    raise ValueError(f"{css_err}; {xp_err}") from None
        else:
            try:
                self._compiled = _regex.compile(self.selector)
                self.type = "regexp"
            except _regex.error as e:
                raise ValueError(
                    f"Extraction rule selector `{self.selector}` is not a valid "
                    f"regular expression: {e}"
                ) from None


class ExtractionRuleset:
    """url_filters + rules for one domain (ruleset.rb)."""

    def __init__(self, spec: dict, domain: str):
        self.domain = domain
        filters = spec.get("url_filters") or []
        rules = spec.get("rules") or []
        if not isinstance(rules, list):
            raise ValueError("Extraction ruleset rules must be an array")
        if not isinstance(filters, list):
            raise ValueError("Extraction ruleset url_filters must be an array")
        self.url_filters = [self._validate_filter(f) for f in filters]
        self.rules = [ExtractionRule(r) for r in rules]
        # filters compile through the same url_pattern builder as crawl
        # rules (ruleset.rb:49-54)
        self._filter_rx = [
            _regex.compile(url_pattern(domain, f["type"], f["pattern"]))
            for f in self.url_filters
        ]

    @staticmethod
    def _validate_filter(f: dict) -> dict:
        ftype, pattern = f.get("type"), f.get("pattern")
        if ftype not in URL_FILTER_TYPES:
            raise ValueError(
                f"Extraction ruleset url_filter `{ftype}` is invalid; "
                f"value must be one of {', '.join(URL_FILTER_TYPES)}"
            )
        if not pattern:
            raise ValueError("Extraction ruleset url_filter pattern can not be blank")
        if ftype == "begins" and not pattern.startswith("/"):
            raise ValueError(
                "Extraction ruleset url_filter pattern must begin with a slash (/) "
                "if type is `begins`"
            )
        if ftype == "regex":
            try:
                _regex.compile(pattern)
            except _regex.error as e:
                raise ValueError(
                    f"Extraction ruleset url_filter pattern regex is invalid: {e}"
                ) from None
        return f

    def matches_url(self, url: str) -> bool:
        if not self._filter_rx:
            return True
        for rx in self._filter_rx:
            try:
                if rx.search(url, timeout=REGEX_TIMEOUT_S) is not None:
                    return True
            except TimeoutError:
                continue
        return False


def extract_by_url_regex(url: str, rx) -> list[str]:
    """data/url.rb:76-88: captures if groups used, else whole-match array."""
    try:
        m = rx.search(url, timeout=REGEX_TIMEOUT_S)
    except TimeoutError:
        return []
    if m is None:
        return []
    if m.groups():
        return [g for g in m.groups()]
    return [m.group(0)]


def extract_fields(rulesets, url: str, doc=None) -> dict:
    """content_engine/extractor.rb:17-27 — every matching ruleset's rules
    run; later rulesets overwrite earlier fields. ``doc`` is the parsed
    htmlkit root (None for non-HTML results: only url-source rules can
    produce values then)."""
    fields: dict = {}
    for rs in rulesets or []:
        if not rs.matches_url(url):
            continue
        for rule in rs.rules:
            if rule.action == "set":
                fields[rule.field_name] = rule.value
                continue
            if rule.source == "url":
                occurrences = extract_by_url_regex(url, rule._compiled)
            elif doc is None:
                occurrences = []
            elif rule.type == "css":
                occurrences = [
                    node_descendant_text(el, ignore_tags=())
                    for el in select_css(doc, rule._compiled)
                ]
            else:  # xpath → text nodes only (crawl_result/html.rb:252-259)
                occurrences = [
                    squish(n.data)
                    for n in select_xpath(doc, rule._compiled)
                    if isinstance(n, dom.Text)
                ]
            if rule.join_as == "string":
                fields[rule.field_name] = " ".join(occurrences)
            else:
                fields[rule.field_name] = occurrences
    return fields


def compile_rulesets(specs_by_site: dict) -> dict:
    """{site: [ruleset-spec,...]} → {site: [ExtractionRuleset,...]}
    (api/config.rb:475-489)."""
    return {
        site: [ExtractionRuleset(spec, site) for spec in specs]
        for site, specs in (specs_by_site or {}).items()
    }
