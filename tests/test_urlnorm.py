"""Golden tests for URL normalization/hash — pins the crawl identity function.

Cases derived from the reference's spec expectations
(spec/lib/crawler/data/url_spec.rb:14-40: fragment strip, normalized_hash)
and RFC 3986 §6.2.2 (which Addressable implements).
"""

import hashlib

import pytest

from crawler_spark.functions import urlnorm as U


CASES = [
    # fragment stripped (url.rb:33; url_spec.rb:14-18)
    ("http://example.com/path#fragment", "http://example.com/path"),
    ("https://example.com/#", "https://example.com/"),
    # scheme/host case
    ("HTTP://EXAMPLE.com/Path", "http://example.com/Path"),
    # default port dropped, explicit non-default kept
    ("http://example.com:80/", "http://example.com/"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # empty path -> /
    ("http://example.com", "http://example.com/"),
    ("http://example.com?q=1", "http://example.com/?q=1"),
    # dot segments
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/../a", "http://example.com/a"),
    # percent-normalization: unreserved decoded, others uppercased
    ("http://example.com/%7Efoo", "http://example.com/~foo"),
    ("http://example.com/%41bc", "http://example.com/Abc"),
    ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
    # illegal literal chars get encoded
    ("http://example.com/a b", "http://example.com/a%20b"),
    ("http://example.com/a|b", "http://example.com/a%7Cb"),
    # query preserved (incl. '+'), fragment dropped, params order kept
    ("http://example.com/p?b=2&a=1#x", "http://example.com/p?b=2&a=1"),
    ("http://example.com/p?q=a+b", "http://example.com/p?q=a+b"),
    # unicode path percent-encoded as UTF-8
    ("http://example.com/über", "http://example.com/%C3%BCber"),
    # IDN host -> punycode
    ("http://münchen.example.com/", "http://xn--mnchen-3ya.example.com/"),
    # trailing slash is significant (kept)
    ("http://example.com/a/", "http://example.com/a/"),
    # userinfo kept
    ("http://user:pw@example.com/", "http://user:pw@example.com/"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize(raw, expected):
    assert U.normalize_url(raw) == expected


def test_idempotent():
    for raw, expected in CASES:
        assert U.normalize_url(expected) == expected


def test_sha1_matches_ruby_digest():
    # Digest::SHA1.hexdigest is plain SHA-1 over the UTF-8 string
    n = U.normalize_url("http://example.com/path#frag")
    assert U.url_sha1(n) == hashlib.sha1(b"http://example.com/path").hexdigest()
    assert len(U.url_sha1(n)) == 40


def test_invalid_urls():
    for bad in ["", "not a url", "/relative/only", "mailto:"]:
        with pytest.raises(U.InvalidURLError):
            U.normalize_url(bad)
    # mailto: is parseable but unsupported-scheme — gate F2's job, not the
    # normalizer's; it has no host though, so it fails here too
    n, err = U.try_normalize("javascript:void(0)")
    assert n is None and err


def test_join_url():
    assert U.join_url("http://example.com/a/b", "c") == "http://example.com/a/c"
    assert U.join_url("http://example.com/a/b", "/x#f") == "http://example.com/x"
    assert U.join_url("http://example.com/a/", "../up") == "http://example.com/up"
    assert U.join_url("http://example.com/", "https://other.com/q") == "https://other.com/q"
    assert U.join_url("http://example.com/", "") is None
    assert U.join_url("http://example.com/", "  ") is None


def test_component_accessors():
    n = "http://example.com/x/y/z?a=1&b=2&c=3"
    assert U.url_scheme(n) == "http"
    assert U.url_host_key(n) == "http://example.com:80"
    assert U.url_site(n) == "http://example.com"
    assert U.url_path(n) == "/x/y/z"
    assert U.request_uri(n) == "/x/y/z?a=1&b=2&c=3"
    assert U.path_segments_count(n) == 3  # url.rb:56-58 counts '/'
    assert U.params_count(n) == 3
    assert U.params_count("http://example.com/") == 0
    assert U.robots_url(n) == "http://example.com/robots.txt"
    assert U.url_host_key("https://example.com:444/p") == "https://example.com:444"


def test_request_uri_length_gate_input():
    # F3 gates on request_uri length (coordinator.rb:663-667)
    n = U.normalize_url("http://example.com/" + "a" * 100 + "?q=1")
    assert len(U.request_uri(n)) == 1 + 100 + 4
