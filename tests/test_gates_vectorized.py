"""The vectorized gate batch must agree EXACTLY with the per-row
reference implementation (`_verdict` + `try_normalize`) — the fast path
is an optimization, never a semantic change."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.config import CrawlConfig
from crawler_spark.functions import urlnorm as U
from crawler_spark.functions.robots import parse_robots_txt
from crawler_spark.functions.rules import RuleEngine
from crawler_spark.operators.gates import (
    _canonical_mask,
    _verdict,
    make_gate_udf,
)

CFG = CrawlConfig(
    seed_urls=("https://site0.test/", "http://site1.test/"),
    crawl_rules={"https://site0.test": [("deny", "begins", "/denied")]},
    max_url_length=64,
    max_url_segments=4,
    max_url_params=3,
)
ALLOWED = frozenset(CFG.allowed_sites())

ROBOTS = {
    "https://site0.test:443": parse_robots_txt(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nCrawl-delay: 2\n",
        base_url="https://site0.test/robots.txt", agent="Elastic-Crawler",
    ).to_tuple(),
    "http://site1.test:80": parse_robots_txt(
        "User-agent: *\nDisallow: /wild*card$\n",
        base_url="http://site1.test/robots.txt", agent="Elastic-Crawler",
    ).to_tuple(),
}


class _FakeBC:
    def __init__(self, v):
        self.value = v


def _run_gate(urls, task_types=None, needs_norm=True):
    gate = make_gate_udf(CFG, _FakeBC(ROBOTS), _FakeBC(dict(CFG.crawl_rules)), ALLOWED)
    pdf = pd.DataFrame(
        {
            "norm_url": urls,
            "task_type": task_types or ["content"] * len(urls),
            "depth": [1] * len(urls),
            "source_type": ["organic"] * len(urls),
            "source_url": [None] * len(urls),
            "parent_seq": [0] * len(urls),
            "sub_order": list(range(len(urls))),
            "redirect_chain": [[] for _ in urls],
            "needs_norm": [needs_norm] * len(urls),
        }
    )
    (out,) = list(gate(iter([pdf])))
    return out


def _reference(url, task_type="content"):
    """Per-row reference: normalize then _verdict."""
    from crawler_spark.functions.robots import RobotRules

    n = U.try_normalize(url)[0] if url is not None else None
    if n is None:
        return None, None, None
    robots = {k: RobotRules.from_tuple(v) for k, v in ROBOTS.items()}
    engines = {s: RuleEngine.from_specs(s, sp) for s, sp in CFG.crawl_rules.items()}
    hk = U.url_host_key(n)
    rb = robots.get(hk)
    delay = int(rb.crawl_delay_ms) if rb and rb.crawl_delay_ms and rb.crawl_delay_ms > 0 else 0
    return n, _verdict(n, task_type, CFG, ALLOWED, rb, engines), (hk, delay)


CASES = [
    "https://site0.test/ok",
    "https://site0.test/private/x",          # robots literal deny
    "https://site0.test/private/ok/x",       # robots longest-match allow
    "http://site1.test/wildAcard",           # wildcard robots → per-row path
    "http://site1.test/wild_card",
    "https://site0.test/denied/by-rule",     # crawl rule deny
    "https://offsite.example/x",             # domain filter
    "ftp://site0.test/x",                    # scheme
    "https://site0.test/" + "x" * 100,       # too long
    "https://site0.test/a/b/c/d/e/f",        # segments
    "https://site0.test/q?a=1&b=2&c=3&d=4",  # params
    "https://SITE0.test/Upper/Host",         # non-canonical: host case
    "https://site0.test/a/../b",             # dot segments
    "https://site0.test/a%41b",              # pct-decodes to unreserved
    "https://site0.test:443/x",              # default port strip
    "https://site0.test:8443/x",             # explicit port (site mismatch)
    "https://user:pw@site0.test/x",          # userinfo → fallback row
    "https://site0.test/ümlaut",             # utf8 path
    "not a url",
    "",
    None,
    "https://site0.test/q?",                 # empty query
    "https://site0.test/q?&&",               # empty params only
    "https://site0.test/.",                  # trailing dot segment
    "https://site0.test/ok\n",               # trailing newline → residue
    "https://site0.test/private/x\n",        # ditto, robots after norm
]


def test_trailing_newline_raw_url_is_normalized():
    """RE2's '$' is end-of-text while Python re's also matches before a
    trailing '\\n': a raw URL ending in a newline must NOT be judged
    canonical — it goes through try_normalize (which strips the
    whitespace) and then gates on the NORMALIZED form. The old pandas
    path skipped normalization for this input class (the bug the
    RE2-parity comment in gates.py documents)."""
    out = _run_gate(["https://site0.test/ok\n"])
    assert out["norm_url"].iloc[0] == "https://site0.test/ok"
    assert pd.isna(out["deny_reason"].iloc[0])


def test_vectorized_gate_matches_reference_on_cases():
    out = _run_gate(list(CASES))
    for i, url in enumerate(CASES):
        n_ref, reason_ref, hk_ref = _reference(url)
        assert out["norm_url"].iloc[i] == (n_ref if n_ref is not None else None) or (
            pd.isna(out["norm_url"].iloc[i]) and n_ref is None
        ), f"norm mismatch for {url!r}"
        if n_ref is None:
            continue
        got = out["deny_reason"].iloc[i]
        got = None if pd.isna(got) else got
        assert got == reason_ref, f"reason mismatch for {url!r}: {got} != {reason_ref}"
        assert out["host_key"].iloc[i] == hk_ref[0], f"host_key mismatch for {url!r}"
        assert int(out["crawl_delay_ms"].iloc[i]) == hk_ref[1], f"delay mismatch for {url!r}"


def test_sitemap_task_skips_domain_robots_rules():
    out = _run_gate(
        ["https://offsite.example/sm.xml", "https://site0.test/private/sm.xml"],
        task_types=["sitemap", "sitemap"],
    )
    assert pd.isna(out["deny_reason"]).all()


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="abcxyz09.-_~%/?&=#:@ü …+!$'()*,;A" + "%",
        min_size=0, max_size=40,
    ).map(lambda s: "https://site0.test/" + s)
)
def test_vectorized_matches_reference_property(suffix_url):
    out = _run_gate([suffix_url])
    n_ref, reason_ref, hk_ref = _reference(suffix_url)
    got_n = out["norm_url"].iloc[0]
    if n_ref is None:
        assert pd.isna(got_n)
        return
    assert got_n == n_ref
    got = out["deny_reason"].iloc[0]
    got = None if pd.isna(got) else got
    assert got == reason_ref, f"{suffix_url!r}: {got} != {reason_ref}"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcz09./-%?#~ :@A&=", min_size=1, max_size=60))
def test_canonical_mask_implies_identity(path):
    url = "https://site0.test/" + path
    mask = _canonical_mask(pd.Series([url]))
    if bool(mask.iloc[0]):
        n, err = U.try_normalize(url)
        assert err is None and n == url, f"canonical but normalize changed: {url!r} -> {n!r}"
