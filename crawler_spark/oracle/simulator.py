"""Single-threaded reference-semantics crawl simulator (the in-repo oracle).

A faithful, sequential re-implementation of the reference coordinator's
control flow, used ONLY in tests to produce golden seen/docs/denied sets the
distributed Spark engine must match:

* gate chain order — ``lib/crawler/coordinator.rb:648-724`` (scheme, length,
  segments, params, rule engine [domain → robots → crawl rules, skipped for
  sitemaps], depth, unique-count budget, seen-check LAST)
* depth bookkeeping — redirects and canonical URLs keep the parent's depth
  (coordinator.rb:421-430, 433-452); organic links get depth+1 (455-464);
  sitemap links keep depth (467-493)
* strict FIFO queue (url_queue/memory_only.rb:64-73), batch-local dedup
  (coordinator.rb:566-592), nofollow (513-521), output gate
  (rule_engine/base.rb:65-82), robots registration at crawl start
  (coordinator.rb:157-165), sitemap seeding (208-253)

Shares the pure extraction/normalization functions with the engine; what it
independently defines is the *orchestration semantics* (ordering, gates,
state), which is exactly what the distributed engine might get wrong.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..functions import robots as robots_mod
from ..functions import urlnorm as U
from ..functions.pageextract import classify_content, extract_page, url_components
from ..functions.rules import RuleEngine
from ..functions.sitemaps import parse_sitemap

STATUS_MARK = re.compile(rb"^<!--STATUS:(\d{3})-->")


@dataclass
class Task:
    url: str  # normalized
    type: str  # content | sitemap
    depth: int
    redirect_chain: list = field(default_factory=list)


class CrawlSimulator:
    def __init__(self, pages_rows, config: CrawlConfig):
        # pages: normalized-url -> raw html bytes
        self.pages = {}
        for r in pages_rows:
            n, err = U.try_normalize(r["url"])
            if err is None:
                self.pages[n] = r["html"] if isinstance(r["html"], bytes) else r["html"].encode()
        self.config = config
        self.queue: deque[Task] = deque()
        self.seen: dict[str, dict] = {}  # norm_url -> admission record
        self.docs: list[dict] = []
        self.denied: list[dict] = []
        self.fetches: list[dict] = []
        self.robots: dict[str, robots_mod.RobotRules] = {}
        self.rule_engines = {
            site: RuleEngine.from_specs(site, specs)
            for site, specs in config.crawl_rules.items()
        }
        self.allowed_sites = set(config.allowed_sites())
        self._admission_seq = 0
        self._rulesets_cache = None

    def _rulesets(self):
        if self._rulesets_cache is None:
            from ..functions.extraction import compile_rulesets

            self._rulesets_cache = compile_rulesets(self.config.extraction_rules)
        return self._rulesets_cache

    # --- offline fetch ----------------------------------------------------

    def fetch(self, norm_url: str):
        """Return (kind, status, content_bytes, location, encoding)."""
        from ..operators.parse import decode_body, decode_text

        body = self.pages.get(norm_url)
        if body is None:
            return "error", 404, b"", None, "utf-8"
        m = STATUS_MARK.match(body)
        if m:
            return "error", int(m.group(1)), b"", None, "utf-8"
        if len(body) >= self.config.max_response_size:
            # ResponseTooLarge (response.rb:166-171) -> Error result
            return "error", 599, b"", None, "utf-8"
        body, enc = decode_body(body, self.config.default_encoding)
        kind, location = classify_content(norm_url, decode_text(body[:512], enc))
        if kind == "redirect":
            return "redirect", 301, body, location, enc
        # `location` carries the MIME type for kind == "file"
        return kind, 200, body, location, enc

    # --- robots (coordinator.rb:157-194) -----------------------------------

    def load_robots(self):
        for site in sorted(self.allowed_sites):
            robots_url = site + "/robots.txt"
            n, _ = U.try_normalize(robots_url)
            kind, status, content, location, _enc = self.fetch(n)
            # follow redirects for robots (redirect error -> 404 behavior)
            hops = 0
            while kind == "redirect" and location and hops < self.config.max_redirects:
                target = U.join_url(n, location)
                if target is None:
                    break
                n = target
                kind, status, content, location, _enc = self.fetch(n)
                hops += 1
            host_key = U.url_host_key(site + "/")
            if kind == "robots_txt" and status < 300:
                self.robots[host_key] = robots_mod.parse_robots_txt(
                    content.decode("utf-8", "replace"), base_url=robots_url,
                    agent=self.config.user_agent,
                )
            else:
                self.robots[host_key] = robots_mod.failed_fetch(status if status >= 300 else 404)

    # --- gate chain (coordinator.rb:648-724) -------------------------------

    def check_discovered_url(self, norm_url: str, type_: str, depth: int) -> str | None:
        """Return deny_reason or None (allowed). Mutates seen on admission."""
        cfg = self.config
        scheme = U.url_scheme(norm_url)
        if scheme not in U.SUPPORTED_SCHEMES:
            return "incorrect_protocol"
        if len(U.request_uri(norm_url)) > cfg.max_url_length:
            return "link_too_long"
        if U.path_segments_count(norm_url) > cfg.max_url_segments:
            return "link_with_too_many_segments"
        if U.params_count(norm_url) > cfg.max_url_params:
            return "link_with_too_many_params"
        if type_ != "sitemap":
            site = U.url_site(norm_url)
            if site not in self.allowed_sites:
                return "domain_filter_denied"
            host_key = U.url_host_key(norm_url)
            rb = self.robots.get(host_key)
            if rb is not None:
                if rb.allow_none():
                    return "robots_txt_disallowed"
                if not rb.allowed(U.url_path(norm_url)):
                    return "robots_txt_disallowed"
            eng = self.rule_engines.get(site)
            if eng is not None and eng.rules and eng.outcome(norm_url) == "deny":
                return "rule_engine_denied"
        if depth > cfg.max_crawl_depth:
            return "link_too_deep"
        if len(self.seen) >= cfg.max_unique_url_count:
            return "too_many_unique_links"
        if norm_url in self.seen:
            return "already_seen"
        return None

    def add_urls_to_backlog(self, urls, type_, source_type, depth, source_url=None,
                            redirect_chain=()):
        batch_allowed = set()
        for raw in urls:
            n, err = U.try_normalize(raw) if "://" in str(raw) else (None, "relative")
            if err is not None:
                continue
            if n in batch_allowed:
                continue
            reason = self.check_discovered_url(n, type_, depth)
            if reason is not None:
                self.denied.append(
                    {"url": n, "deny_reason": reason, "source_url": source_url, "depth": depth}
                )
                continue
            batch_allowed.add(n)
            self._admission_seq += 1
            self.seen[n] = {
                "norm_url": n,
                "url_hash": U.url_sha1(n),
                "depth": depth,
                "source_type": source_type,
                "source_url": source_url,
                "seq": self._admission_seq,
                "type": type_,
            }
            self.queue.append(Task(n, type_, depth, list(redirect_chain)))

    # --- main loop ----------------------------------------------------------

    def run(self):
        cfg = self.config
        self.load_robots()
        # seeds (coordinator.rb:197-205)
        self.add_urls_to_backlog(cfg.normalized_seeds(), "content", "seed-list", 1)
        # sitemaps: config + robots-discovered (coordinator.rb:208-253)
        sitemap_urls = list(cfg.sitemap_urls)
        if not cfg.sitemap_discovery_disabled:
            for host_key in sorted(self.robots):
                sitemap_urls.extend(self.robots[host_key].sitemaps)
        if sitemap_urls:
            self.add_urls_to_backlog(sitemap_urls, "sitemap", "sitemap", 1)

        while self.queue:
            task = self.queue.popleft()
            self.process_task(task)
        return self

    def process_task(self, task: Task):
        kind, status, content, location, enc = self.fetch(task.url)
        # fetch-time redirect budget (http_executor.rb:57-70): RedirectError
        if kind == "redirect" and len(task.redirect_chain) + 1 > self.config.max_redirects:
            kind, location = "error", None
        self.fetches.append(
            {"url": task.url, "kind": kind, "status": status, "depth": task.depth,
             "type": task.type}
        )
        if kind == "error":
            return
        if kind == "redirect":
            if location is not None:
                target = U.join_url(task.url, location)
                if target is not None:
                    self.add_urls_to_backlog(
                        [target], task.type, "redirect", task.depth,
                        source_url=task.url,
                        redirect_chain=task.redirect_chain + [task.url],
                    )
            return
        if task.type == "sitemap" or kind == "sitemap":
            sm_links, content_links = parse_sitemap(task.url, content)
            self.add_urls_to_backlog(sm_links, "sitemap", "sitemap", task.depth,
                                     source_url=task.url)
            self.add_urls_to_backlog(content_links, "content", "sitemap", task.depth,
                                     source_url=task.url)
            return
        if kind == "robots_txt":
            return
        if kind == "file":
            # E22 binary download: doc only when the MIME type is allowed
            import base64 as _b64

            mime = location
            if not (
                self.config.binary_content_extraction_enabled
                and mime in (self.config.binary_content_extraction_mime_types or ())
            ):
                return
            if len(task.redirect_chain) > self.config.max_redirects:
                return
            payload = content[content.find(b"-->") + 3:]
            doc = {
                "id": U.url_sha1(task.url),
                "title": None, "body": None,
                "meta_keywords": None, "meta_description": None,
                "links": [], "headings": [],
                "file_name": U.url_path(task.url).rsplit("/", 1)[-1],
                "content_type": mime,
                "content_length": len(payload),
                "_attachment": _b64.b64encode(payload).decode("ascii"),
            }
            doc.update(url_components(task.url))
            self.docs.append(doc)
            return
        # HTML
        from ..operators.parse import decode_text as _dt
        html_text = _dt(content, enc)
        page = extract_page(
            task.url, html_text,
            max_extracted_links=self.config.max_extracted_links_count,
            max_indexed_links=self.config.max_indexed_links_count,
            max_headings=self.config.max_headings_count,
            max_title_size=self.config.max_title_size,
            max_body_size=self.config.max_body_size,
            max_keywords_size=self.config.max_keywords_size,
            max_description_size=self.config.max_description_size,
            exclude_tags=self.config.exclude_tags.get(U.url_site(task.url)),
            extraction_rulesets=self._rulesets().get(U.url_site(task.url)),
        )
        # canonical first (coordinator.rb:433-452), same depth
        if page["canonical_url"] is not None:
            n, err = U.try_normalize(page["canonical_url"])
            if err is None:
                self.add_urls_to_backlog([n], "content", "canonical_url", task.depth,
                                         source_url=task.url)
        # organic links (depth+1), nofollow filtering (513-521)
        if not page["meta_nofollow"]:
            organic = []
            for lk in page["links"]:
                if lk["url"] is None or lk["nofollow"]:
                    continue
                organic.append(lk["url"])
            self.add_urls_to_backlog(organic, "content", "organic", task.depth + 1,
                                     source_url=task.url)
        else:
            pass  # every link denied :nofollow — metric only
        # output gate (rule_engine/base.rb:65-82)
        if page["meta_noindex"]:
            return
        if len(task.redirect_chain) > self.config.max_redirects:
            return
        doc = {
            "id": U.url_sha1(task.url),
            "title": page["title"] or None,
            "body": page["body"] if page["body"] else None,
            "meta_keywords": page["meta_keywords"],
            "meta_description": page["meta_description"],
            "links": page["indexed_links"],
            "headings": page["headings"],
        }
        if self.config.full_html_extraction_enabled:
            doc["full_html"] = html_text
        doc.update(url_components(task.url))
        self.docs.append(doc)
