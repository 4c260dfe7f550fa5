"""Deterministic synthetic crawl corpus generator (seed=42).

Produces the ``pages(url, warc_ts, html, text, lang)`` table whose shape is
fixed by BASELINE.json's ``input_hint``, mirroring the reference's
integration-test style (spec/support/faux sites) re-expressed as parquet:
every crawl behavior the engine must reproduce gets a page family —
robots rules, sitemaps (plain + gzip index), redirects, canonical links,
nofollow (rel + meta), include/exclude directives, depth chains, the
per-gate deny cases (scheme/length/segments/params), fetch-miss URLs, a
mega-host for skew, >25 headings and >N links for the caps.

The ``text`` column carries the EXPECTED extracted body text, assembled
analytically from the same word lists used to build the HTML (never by
running the extractor) — it is the byte-identical oracle column.

Status/redirect conventions (the input schema has no status column):
``<!--REDIRECT:loc-->`` prefix = 3xx to loc; ``<!--STATUS:nnn-->`` prefix =
that HTTP status with no body semantics. Documented in
:func:`crawler_spark.functions.pageextract.classify_content`.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import random

EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)


def _page_html(title: str, body_words: list[str], links: list[tuple[str, str]],
               extras: str = "") -> tuple[str, str]:
    """Build a page and its expected extracted text.

    links: [(href, anchor_word)]; anchor words join the body text stream in
    document order, separated by single spaces (each element contributes a
    surrounding space in the reference algorithm).
    """
    body_parts = []
    text_parts = []
    for w in body_words:
        body_parts.append(f"<p>{w}</p>")
        text_parts.append(w)
    for href, anchor in links:
        body_parts.append(f'<a href="{href}">{anchor}</a>')
        text_parts.append(anchor)
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body>{extras}{''.join(body_parts)}</body></html>"
    )
    return html, " ".join(text_parts)


def generate_corpus(n_hosts: int = 2, pages_per_host: int = 40, seed: int = 42,
                    mega_host_factor: int = 0):
    """Return (pages_rows, config_dict).

    pages_rows: list of dicts with url/warc_ts/html/text/lang.
    config_dict: seeds + per-site crawl rules matching the corpus.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    langs = ["en", "de", "fr"]
    k = [0]

    def add(url: str, html, text: str = ""):
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + _dt.timedelta(seconds=k[0]),
                "html": html if isinstance(html, bytes) else html.encode("utf-8"),
                "text": text,
                "lang": langs[k[0] % 3],
            }
        )
        k[0] += 1

    hosts = [f"https://site{i}.test" for i in range(n_hosts)]
    crawl_rules = {}

    for hi, host in enumerate(hosts):
        tree_n = pages_per_host if (hi > 0 or not mega_host_factor) else pages_per_host * mega_host_factor

        # robots.txt: even hosts get rules + sitemap; host1 gets crawl-delay;
        # odd hosts >1 have NO robots row (failed fetch 404 -> allow all)
        if hi % 2 == 0 or hi == 1:
            delay = "Crawl-delay: 1\n" if hi == 1 else ""
            add(
                f"{host}/robots.txt",
                f"User-agent: *\nDisallow: /private/\n{delay}Sitemap: {host}/sitemap.xml\n",
            )

        # sitemap: urlset with a page discoverable only via sitemap
        if hi % 2 == 0:
            locs = "".join(
                f"<url><loc>{host}/sm/{j}</loc></url>" for j in range(3)
            )
            add(
                f"{host}/sitemap.xml",
                f'<?xml version="1.0" encoding="UTF-8"?>'
                f'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{locs}</urlset>',
            )
            for j in range(3):
                h, t = _page_html(f"SM {j}", [f"sitemap{hi}x{j}", "leafcontent"], [])
                add(f"{host}/sm/{j}", h, t)

        # root page: links to tree roots + special cases
        special_links = [
            ("/redirect", "redirlink"),
            ("/canonical-page", "canonlink"),
            ("/noindex", "noindexlink"),
            ("/metanofollow", "metanflink"),
            ("/nofollow-target", "nftarget"),
            ("/private/secret", "privlink"),
            ("/denied/by-rule", "rulelink"),
            ("/missing-" + str(hi), "misslink"),
            ("/dup#frag1", "dupa"),
            ("/dup#frag2", "dupb"),
            ("/exclude", "excllink"),
            ("/file.pdf", "pdflink"),
            ("/file.bin", "binlink"),
            ("/deep/" + "/".join(f"d{j}" for j in range(17)), "toodeep"),
            ("/q?" + "&".join(f"p{j}={j}" for j in range(33)), "toomanyparams"),
            ("/long-" + "x" * 2100, "toolong"),
            ("ftp://site0.test/file", "badscheme"),
            (f"{hosts[(hi + 1) % n_hosts]}/", "crosshost"),
            ("https://offsite.example.org/out", "offsite"),
        ]
        root_links = [(f"/p/0", "tree0")] + special_links
        if hi == 0:
            root_links.append(("/latin1", "latinlink"))
        h, t = _page_html(f"Root {hi}", [f"rootwords{hi}", "common"], root_links)
        # rel=nofollow link rendered specially
        h = h.replace(
            '<a href="/nofollow-target">nftarget</a>',
            '<a href="/nofollow-target" rel="nofollow">nftarget</a>',
        )
        add(f"{host}/", h, t)

        # binary-tree pages /p/i -> /p/2i+1, /p/2i+2 (BFS depth structure)
        for i in range(tree_n):
            kids = [j for j in (2 * i + 1, 2 * i + 2) if j < tree_n]
            links = [(f"/p/{j}", f"child{j}") for j in kids]
            words = [f"page{hi}x{i}", f"w{rng.randrange(1000)}"]
            h, t = _page_html(f"P{i} of {hi}", words, links)
            add(f"{host}/p/{i}", h, t)

        # special pages
        add(f"{host}/redirect", "<!--REDIRECT:/redirected-target-->")
        h, t = _page_html("Redirected", [f"redirtarget{hi}"], [])
        add(f"{host}/redirected-target", h, t)

        h, t = _page_html("Canonical page", [f"canonpage{hi}"], [])
        h = h.replace(
            "<body>",
            '<body>', 1,
        ).replace(
            "</head>", f'<link rel="canonical" href="{host}/canonical-target"></head>', 1
        )
        add(f"{host}/canonical-page", h, t)
        h, t = _page_html("Canonical target", [f"canontarget{hi}"], [])
        add(f"{host}/canonical-target", h, t)

        h, t = _page_html("Noindex", [f"noindexbody{hi}"], [(f"/from-noindex", "fromnoidx")])
        h = h.replace("</head>", '<meta name="robots" content="noindex"></head>', 1)
        add(f"{host}/noindex", h, t)
        h, t = _page_html("From noindex", [f"fromnoindex{hi}"], [])
        add(f"{host}/from-noindex", h, t)

        h, t = _page_html("MetaNofollow", [f"metanf{hi}"], [("/never-followed", "neverfollowed")])
        h = h.replace("</head>", '<meta name="robots" content="nofollow"></head>', 1)
        add(f"{host}/metanofollow", h, t)
        # /never-followed exists but must stay un-crawled
        h, t = _page_html("Never", ["neverbody"], [])
        add(f"{host}/never-followed", h, t)

        h, t = _page_html("NF target", [f"nofollowtarget{hi}"], [])
        add(f"{host}/nofollow-target", h, t)

        h, t = _page_html("Private", [f"privatebody{hi}"], [])
        add(f"{host}/private/secret", h, t)
        h, t = _page_html("Rule-denied", [f"ruledenied{hi}"], [])
        add(f"{host}/denied/by-rule", h, t)

        # fragment-dup target
        h, t = _page_html("Dup", [f"dupbody{hi}"], [])
        add(f"{host}/dup", h, t)

        # binary downloads (E22): pdf MIME is in the extraction allowlist
        # (→ base64 _attachment doc), octet-stream is not (→ unsupported
        # content, crawled but no doc)
        add(f"{host}/file.pdf", b"<!--MIME:application/pdf-->%PDF-1.4 fake-pdf-" + str(hi).encode())
        add(f"{host}/file.bin", b"<!--MIME:application/octet-stream-->\x00\x01\x02" + bytes([hi]))

        # charset page (http_utils/response.rb:123-135): ISO-8859-1 bytes
        # behind the <!--CHARSET:...--> marker; expected text is the
        # properly decoded unicode
        if hi == 0:
            latin = "café au lait résumé"
            h, t = _page_html("Latin1", [latin], [])
            add(f"{host}/latin1", b"<!--CHARSET:iso-8859-1-->" + h.encode("iso-8859-1"), t)

        # exclude-directive page (CRAWLER_DIRECTIVES golden shape)
        excl = (
            "test1 <div data-elastic-exclude>test2 "
            "<p data-elastic-include>test3 <span data-elastic-exclude>test4 "
            "<em data-elastic-include>test5</em></span></p> test6</div> test7"
        )
        html = f"<html><head><title>Excl</title></head><body>{excl}</body></html>"
        add(f"{host}/exclude", html, "test1 test3 test5 test7")

        crawl_rules[host] = [("deny", "begins", "/denied")]

    # a host serving a gzipped sitemap index (host 0 only, extra table rows)
    host = hosts[0]
    idx_xml = (
        '<?xml version="1.0"?><sitemapindex>'
        f"<sitemap><loc>{host}/child-sitemap.xml</loc></sitemap></sitemapindex>"
    )
    add(f"{host}/sitemap-index.xml.gz", gzip.compress(idx_xml.encode()))
    add(
        f"{host}/child-sitemap.xml",
        f'<?xml version="1.0"?><urlset><url><loc>{host}/sm-child</loc></url></urlset>',
    )
    h, t = _page_html("SM child", ["smchildbody"], [])
    add(f"{host}/sm-child", h, t)

    config = {
        "seed_urls": [f"{h}/" for h in hosts],
        "sitemap_urls": [f"{hosts[0]}/sitemap-index.xml.gz"],
        "crawl_rules": crawl_rules,
        "binary_content_extraction_mime_types": ["application/pdf"],
        # E19 coverage: host0 redirect-family pages get a set+extract ruleset
        "extraction_rules": {
            hosts[0]: [
                {
                    "url_filters": [{"type": "begins", "pattern": "/redirected-target"}],
                    "rules": [
                        {"action": "set", "field_name": "origin", "value": "redirect_family",
                         "source": "html", "selector": "p"},
                        {"action": "extract", "field_name": "para_text", "source": "html",
                         "selector": "p", "join_as": "string"},
                    ],
                }
            ]
        },
    }
    return rows, config


def generate_scale_corpus(
    n_hosts: int = 50,
    pages_per_host: int = 1200,
    fanout: int = 128,
    mega_host_factor: int = 8,
    seed: int = 42,
):
    """Bench-scale corpus: wide ``fanout``-ary trees (shallow BFS → wave
    sizes dominate job overhead, like a real frontier), one mega-host with
    ``mega_host_factor``× the pages of the others (host-skew retained per
    FIXTURES.md), cross-host links for discovery traffic, robots on every
    host. Text kept analytic (expected == generated words).

    ALL host roots are seeds: a production frontier restart begins with a
    dense seed list (or a resumed multi-million-row frontier), not one URL
    — the single-seed ramp-up waves of the old shape measured scheduler
    floor, not engine throughput. Cross-host links stay in as (mostly
    duplicate) discovery traffic for the seen anti-join."""
    rng = random.Random(seed)
    rows = []
    langs = ["en", "de", "fr"]
    k = [0]

    def add(url, html, text=""):
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + _dt.timedelta(seconds=k[0]),
                "html": html.encode("utf-8") if isinstance(html, str) else html,
                "text": text,
                "lang": langs[k[0] % 3],
            }
        )
        k[0] += 1

    hosts = [f"https://bench{i}.test" for i in range(n_hosts)]
    for hi, host in enumerate(hosts):
        n = pages_per_host * (mega_host_factor if hi == 0 else 1)
        add(f"{host}/robots.txt", "User-agent: *\nDisallow: /private/\n")
        root_links = [(f"/p/{j}", f"r{j}") for j in range(min(fanout, n))]
        # binary host tree: log-depth cross-host discovery (a 50-host chain
        # would collide with max_crawl_depth and serialize the BFS)
        for hj in (2 * hi + 1, 2 * hi + 2):
            if hj < n_hosts:
                root_links.append((f"{hosts[hj]}/", f"host{hj}"))
        h, t = _page_html(f"Bench root {hi}", [f"root{hi}"], root_links)
        add(f"{host}/", h, t)
        for i in range(n):
            kids = [j for j in range(fanout * i + 1, fanout * i + fanout + 1) if j < n]
            links = [(f"/p/{j}", f"c{j}") for j in kids]
            words = [f"bench{hi}x{i}", f"w{rng.randrange(10000)}", f"w{rng.randrange(10000)}"]
            h, t = _page_html(f"B{i}", words, links)
            add(f"{host}/p/{i}", h, t)
    config = {
        "seed_urls": [f"{h}/" for h in hosts],
        "sitemap_urls": [],
        "crawl_rules": {},
    }
    return rows, config


def write_parquet(rows, path: str):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    # small row groups: Spark can only split a parquet file at row-group
    # boundaries, and pyarrow's default (~1M rows) would cap the corpus
    # scan at 2-3 tasks no matter how many cores the cluster has
    pq.write_table(table, path, row_group_size=64_000)
    return path
