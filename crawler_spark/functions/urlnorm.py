"""URL normalization + hashing — the load-bearing identity function of the crawl.

Re-implements (from public RFC 3986 semantics + observed behavior) the
normalization performed by the reference engine's ``Crawler::Data::URL``
(``lib/crawler/data/url.rb:22-36``): ``normalized_url`` = strip fragment +
Addressable-style normalize; ``normalized_hash`` = SHA-1 hexdigest of the
normalized URL string.

Normalization steps (RFC 3986 §6.2.2 syntax-based normalization, which is
what Addressable implements):

* scheme and host lowercased; host IDNA (punycode) encoded when non-ASCII
* default ports dropped (http:80, https:443); empty port dropped
* percent-encoding case normalized to uppercase; percent-decoding of
  *unreserved* characters only (never of reserved chars, which would change
  semantics)
* characters illegal-in-component percent-encoded (UTF-8)
* dot-segments removed from the path; empty path with authority -> "/"
* fragment removed (``url.rb:33``)
* NFC unicode normalization of decoded text

Everything here is pure Python operating on strings so it can run inside a
vectorized pandas UDF (see :func:`normalize_url_series`) — no per-row Python
UDFs in the Spark plan (they would be the row-at-a-time slow path).

WARNING (mirrors url.rb:17-29): changing the behavior of these functions
invalidates every persisted url_hash — the whole crawl state keys off them.
"""

from __future__ import annotations

import hashlib
import unicodedata
from urllib.parse import urljoin

SUPPORTED_SCHEMES = ("http", "https")
DEFAULT_PORTS = {"http": 80, "https": 443}

_ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_DIGIT = "0123456789"
UNRESERVED = set(_ALPHA + _DIGIT + "-._~")
SUB_DELIMS = "!$&'()*+,;="
_PCHAR = set(SUB_DELIMS) | UNRESERVED | {":", "@"}
PATH_SAFE = _PCHAR | {"/"}
QUERY_SAFE = _PCHAR | {"/", "?"}
_HEX = "0123456789ABCDEF"
_HEXDIG = set(_HEX + "abcdef")


class InvalidURLError(ValueError):
    """Raised for URLs the reference would reject as unparsable."""


def _pct_encode_byte(b: int) -> str:
    return "%" + _HEX[b >> 4] + _HEX[b & 0xF]


def _normalize_component(text: str, safe: set) -> str:
    """Percent-normalize one URI component.

    - ``%XX`` triplets: decoded iff the octet is an unreserved character,
      else kept with uppercase hex (RFC 3986 §6.2.2.1-2).
    - literal characters in ``safe`` pass through; everything else is
      UTF-8 percent-encoded.
    """
    out = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "%" and i + 2 < n + 1 and i + 2 < n and text[i + 1] in _HEXDIG and text[i + 2] in _HEXDIG:
            byte = int(text[i + 1 : i + 3], 16)
            ch = chr(byte)
            if ch in UNRESERVED:
                out.append(ch)
            else:
                out.append(_pct_encode_byte(byte))
            i += 3
            continue
        if c in safe:
            out.append(c)
        else:
            for b in c.encode("utf-8"):
                out.append(_pct_encode_byte(b))
        i += 1
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            if inp.startswith("/"):
                j = inp.find("/", 1)
            else:
                j = inp.find("/")
            if j == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:j])
                inp = inp[j:]
    return "".join(out)


def _idna_host(host: str) -> str:
    host = host.lower()
    try:
        host.encode("ascii")
        return host
    except UnicodeEncodeError:
        pass
    try:
        labels = host.split(".")
        return ".".join(
            lbl if not lbl else lbl.encode("idna").decode("ascii") for lbl in labels
        )
    except (UnicodeError, UnicodeDecodeError):
        return host


def split_url(url: str):
    """Split a URL into (scheme, userinfo, host, port, path, query, fragment).

    Hand-rolled (urllib.parse lowercases some things and folds others) so
    normalization decisions stay explicit. Returns raw (un-normalized)
    components; query/fragment are None when their delimiter is absent.
    """
    rest = url
    fragment = None
    h = rest.find("#")
    if h != -1:
        fragment = rest[h + 1 :]
        rest = rest[:h]
    scheme = None
    c = rest.find(":")
    if c > 0:
        cand = rest[:c]
        if cand and cand[0] in _ALPHA and all(ch in _ALPHA + _DIGIT + "+-." for ch in cand):
            scheme = cand
            rest = rest[c + 1 :]
    query = None
    q = rest.find("?")
    if q != -1:
        query = rest[q + 1 :]
        rest = rest[:q]
    userinfo = host = None
    port = None
    if rest.startswith("//"):
        rest = rest[2:]
        s = rest.find("/")
        authority, path = (rest, "") if s == -1 else (rest[:s], rest[s:])
        if "@" in authority:
            userinfo, authority = authority.rsplit("@", 1)
        if authority.startswith("["):  # IPv6 literal
            close = authority.find("]")
            host = authority[: close + 1]
            after = authority[close + 1 :]
            if after.startswith(":"):
                port = after[1:]
        elif ":" in authority:
            host, port = authority.rsplit(":", 1)
        else:
            host = authority
    else:
        path = rest
    return scheme, userinfo, host, port, path, query, fragment


def normalize_url(url: str) -> str:
    """Return the normalized form of ``url`` (fragment stripped).

    Equivalent of ``Crawler::Data::URL#normalized_url`` (url.rb:31-36).
    Raises :class:`InvalidURLError` on garbage.
    """
    if url is None:
        raise InvalidURLError("url is None")
    url = unicodedata.normalize("NFC", url.strip())
    if not url:
        raise InvalidURLError("empty url")
    scheme, userinfo, host, port, path, query, _frag = split_url(url)
    if scheme is None or host is None:
        raise InvalidURLError(f"relative or schemeless url: {url!r}")
    scheme = scheme.lower()
    host = _idna_host(host)
    if not host:
        raise InvalidURLError(f"empty host: {url!r}")
    portpart = ""
    if port:
        try:
            pnum = int(port)
        except ValueError:
            raise InvalidURLError(f"bad port in {url!r}") from None
        if DEFAULT_PORTS.get(scheme) != pnum:
            portpart = f":{pnum}"
    auth = ""
    if userinfo:
        auth = _normalize_component(userinfo, _PCHAR) + "@"
    path = _normalize_component(path, PATH_SAFE)
    path = remove_dot_segments(path)
    if not path:
        path = "/"
    out = f"{scheme}://{auth}{host}{portpart}{path}"
    if query is not None:
        out += "?" + _normalize_component(query, QUERY_SAFE)
    return out


def url_sha1(normalized: str) -> str:
    """SHA-1 hexdigest of the normalized URL (url.rb:22-24)."""
    return hashlib.sha1(normalized.encode("utf-8")).hexdigest()


def try_normalize(url: str):
    """Return (normalized, None) or (None, error_message)."""
    try:
        return normalize_url(url), None
    except InvalidURLError as e:
        return None, str(e)


def join_url(base: str, href: str):
    """Resolve ``href`` against ``base`` (Link#to_url — link.rb:59-66).

    Returns the *normalized* absolute URL or None when invalid/empty.
    """
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    try:
        joined = urljoin(base, href)
    except ValueError:
        return None
    n, err = try_normalize(joined)
    return n if err is None else None


# --- component accessors used by discovery gates -------------------------


def url_scheme(normalized: str) -> str:
    return normalized.split(":", 1)[0]


def url_host_key(normalized: str) -> str:
    """`scheme://host:port` with default port filled — Domain equality key
    (domain.rb:14-42)."""
    scheme, _u, host, port, _p, _q, _f = split_url(normalized)
    p = int(port) if port else DEFAULT_PORTS.get(scheme, 0)
    return f"{scheme}://{host}:{p}"


def url_site(normalized: str) -> str:
    """`scheme://host[:port]` origin as printed by Addressable#site."""
    scheme, _u, host, port, _p, _q, _f = split_url(normalized)
    portpart = f":{port}" if port else ""
    return f"{scheme}://{host}{portpart}"


def url_path(normalized: str) -> str:
    _s, _u, _h, _p, path, _q, _f = split_url(normalized)
    return path


def request_uri(normalized: str) -> str:
    """path + '?' + query — the string whose length gates F3
    (coordinator.rb:663-667)."""
    _s, _u, _h, _po, path, query, _f = split_url(normalized)
    if not path:
        path = "/"
    return path + ("?" + query if query is not None else "")


def path_segments_count(normalized: str) -> int:
    """Number of '/' in the path (url.rb:56-58)."""
    return url_path(normalized).count("/")


def params_count(normalized: str) -> int:
    """Number of query parameters (url.rb:60-63); 0 when no query."""
    _s, _u, _h, _po, _path, query, _f = split_url(normalized)
    if not query:
        return 0
    return len([p for p in query.split("&") if p])


def robots_url(normalized: str) -> str:
    """host_key's /robots.txt URL (domain.rb:25-27)."""
    return url_site(normalized) + "/robots.txt"


# --- vectorized (pandas) forms for Spark UDFs -----------------------------


def normalize_url_series(s):
    """pd.Series[str] -> pd.Series[str|None]: vectorized normalize."""
    return s.map(lambda u: try_normalize(u)[0] if u is not None else None)


def sha1_series(s):
    return s.map(lambda u: url_sha1(u) if u is not None else None)
