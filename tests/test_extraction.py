"""Extraction rules engine (E19: extractor.rb / rule.rb / ruleset.rb /
url_filter.rb semantics) — pure Python, no Spark session."""

import json

import pytest

from crawler_spark.functions.extraction import (
    ExtractionRule,
    ExtractionRuleset,
    compile_rulesets,
    extract_fields,
    parse_css,
    parse_xpath,
    select_css,
    select_xpath,
    SelectorError,
)
from crawler_spark.functions.pageextract import extract_page
from crawler_spark.htmlkit import dom

HTML = """
<html><head><title>T</title></head><body>
  <div id="main" class="content box">
    <p class="intro">Hello <b>world</b></p>
    <p class="intro">Second intro</p>
    <p>Plain para</p>
    <span data-kind="price">42.50</span>
    <ul><li>a</li><li>b</li></ul>
  </div>
  <div class="sidebar"><p class="intro">Side intro</p></div>
</body></html>
"""

DOC = dom.parse(HTML)
SITE = "https://shop.example"


def _rs(rules, url_filters=None):
    return ExtractionRuleset({"rules": rules, "url_filters": url_filters or []}, SITE)


# --- selector engines -----------------------------------------------------


def test_css_class_and_descendant_document_order():
    els = select_css(DOC, "#main p.intro")
    assert [dom_text(e) for e in els] == ["Hello world", "Second intro"]


def dom_text(el):
    from crawler_spark.functions.textextract import node_descendant_text

    return node_descendant_text(el, ignore_tags=())


def test_css_child_combinator_and_groups():
    assert [dom_text(e) for e in select_css(DOC, "ul > li")] == ["a", "b"]
    # comma group: each element reported once, document order
    els = select_css(DOC, "span[data-kind=price], .sidebar p")
    assert [dom_text(e) for e in els] == ["42.50", "Side intro"]


def test_css_attribute_ops():
    assert len(select_css(DOC, "[data-kind]")) == 1
    assert len(select_css(DOC, "[data-kind^=pri]")) == 1
    assert len(select_css(DOC, "[data-kind$=ice]")) == 1
    assert len(select_css(DOC, "[data-kind*=ric]")) == 1
    assert select_css(DOC, "[data-kind=wrong]") == []


def test_css_rejects_xpath_shapes():
    with pytest.raises(SelectorError):
        parse_css("//p/text()")


def test_xpath_text_nodes():
    texts = [n.data.strip() for n in select_xpath(DOC, "//p[@class='intro']/text()")]
    assert texts[0].startswith("Hello")
    # element-valued xpath yields elements, which extract_fields filters out
    els = select_xpath(DOC, "//li")
    assert len(els) == 2
    with pytest.raises(SelectorError):
        parse_xpath("p.intro")


# --- rule semantics -------------------------------------------------------


def test_set_and_css_extract_join_modes():
    rs = _rs(
        [
            {"action": "set", "field_name": "source_tag", "value": "catalog",
             "source": "html", "selector": "x"},
            {"action": "extract", "field_name": "intros", "source": "html",
             "selector": "p.intro", "join_as": "array"},
            {"action": "extract", "field_name": "intro_text", "source": "html",
             "selector": "#main p.intro", "join_as": "string"},
        ]
    )
    fields = extract_fields([rs], f"{SITE}/x", DOC)
    assert fields["source_tag"] == "catalog"
    assert fields["intros"] == ["Hello world", "Second intro", "Side intro"]
    assert fields["intro_text"] == "Hello world Second intro"


def test_url_regex_captures_and_whole_match():
    rs = _rs(
        [
            {"action": "extract", "field_name": "sku", "source": "url",
             "selector": r"/product/(\d+)", "join_as": "array"},
            {"action": "extract", "field_name": "whole", "source": "url",
             "selector": r"product/\d+", "join_as": "string"},
            {"action": "extract", "field_name": "missing", "source": "url",
             "selector": r"/nope/(\d+)", "join_as": "array"},
        ]
    )
    fields = extract_fields([rs], f"{SITE}/product/123", DOC)
    assert fields["sku"] == ["123"]          # captures when groups used
    assert fields["whole"] == "product/123"  # whole match otherwise
    assert fields["missing"] == []


def test_url_filters_gate_ruleset_and_later_ruleset_overrides():
    rs1 = _rs(
        [{"action": "set", "field_name": "zone", "value": "one", "source": "html",
          "selector": "x"}],
        url_filters=[{"type": "begins", "pattern": "/product/"}],
    )
    rs2 = _rs(
        [{"action": "set", "field_name": "zone", "value": "two", "source": "html",
          "selector": "x"}],
        url_filters=[{"type": "contains", "pattern": "123"}],
    )
    fields = extract_fields([rs1, rs2], f"{SITE}/product/123", DOC)
    assert fields["zone"] == "two"  # later ruleset merges over earlier
    fields = extract_fields([rs1, rs2], f"{SITE}/product/999", DOC)
    assert fields["zone"] == "one"  # only rs1 matches
    fields = extract_fields([rs1, rs2], f"{SITE}/other", DOC)
    assert "zone" not in fields


def test_xpath_rule_via_inference():
    rule = ExtractionRule(
        {"action": "extract", "field_name": "items", "source": "html",
         "selector": "//li/text()", "join_as": "array"}
    )
    assert rule.type == "xpath"
    rule2 = ExtractionRule(
        {"action": "extract", "field_name": "items", "source": "html",
         "selector": "ul > li", "join_as": "array"}
    )
    assert rule2.type == "css"


def test_validation_errors():
    with pytest.raises(ValueError, match="action"):
        ExtractionRule({"action": "bogus", "field_name": "f", "source": "html",
                        "selector": "p", "join_as": "array"})
    with pytest.raises(ValueError, match="reserved"):
        ExtractionRule({"action": "set", "field_name": "body", "value": "v",
                        "source": "html", "selector": "p"})
    with pytest.raises(ValueError, match="join_as"):
        ExtractionRule({"action": "extract", "field_name": "f", "source": "html",
                        "selector": "p", "join_as": "csv"})
    with pytest.raises(ValueError, match="slash"):
        ExtractionRuleset(
            {"rules": [], "url_filters": [{"type": "begins", "pattern": "x"}]}, SITE
        )
    with pytest.raises(ValueError, match="not a valid"):
        ExtractionRule({"action": "extract", "field_name": "f", "source": "html",
                        "selector": "p[", "join_as": "array"})


# --- end-to-end through extract_page --------------------------------------


def test_extract_page_merges_extraction_fields_last():
    html = (
        '<html><head><meta class="elastic" name="zone" content="from_meta">'
        "</head><body><p class='intro'>X</p></body></html>"
    )
    compiled = compile_rulesets(
        {SITE: [{"rules": [
            {"action": "set", "field_name": "zone", "value": "from_rule",
             "source": "html", "selector": "x"},
            {"action": "extract", "field_name": "intros", "source": "html",
             "selector": "p.intro", "join_as": "array"},
        ], "url_filters": []}]}
    )
    page = extract_page(f"{SITE}/p", html, extraction_rulesets=compiled[SITE])
    assert page["extra_fields"]["zone"] == "from_rule"  # rules merge last
    assert json.loads(page["extra_fields"]["intros"]) == ["X"]  # arrays as JSON
