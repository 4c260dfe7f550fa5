"""The crawl plan: iterative BFS over DataFrame jobs (SURVEY §3.1 equivalent).

One crawl iteration ≡ one DataFrame job (north rule):

    frontier wave select (politeness quota)
      → offline fetch join vs `pages` on url_hash
      → single-pass parse UDF
      → docs MERGE (output gate + document mapping)
      → discovery (redirect ∪ canonical ∪ organic ∪ sitemap links)
      → gate chain (deny reasons) → wave dedup → anti-join vs seen
      → budget cap → seen MERGE → frontier Δ → metrics/lineage append

Control flow the reference runs in a thread-pool FIFO
(coordinator.rb:306-342) becomes a driver loop issuing one job per wave;
the final URL-seen set and per-url results are identical (SURVEY §2.4 A2:
wave-ordered BFS ≡ FIFO up to intra-wave ties, which the reference itself
does not order under >1 thread — and our `seq` ordering resolves ties
exactly like the 1-thread FIFO, which is what the oracle simulator checks).

Resume: every wave is checkpointed (frontier Δ + seen Δ + docs Δ + manifest
with seq watermark and metrics) — `SparkCrawler(..., resume=True)` continues
from the last completed wave (C3, first-class here vs. opt-in best-effort in
the reference).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CrawlConfig
from ..functions import robots as robots_mod
from ..functions import urlnorm as U
from ..operators.dedup import admit
from ..operators.gates import apply_gates
from ..operators.parse import docs_from_parsed, fetch_join, parse_wave
from ..operators.politeness import dispatch, split_ready
from ..sources.pages import prepare_pages
from ..state.store import StateStore

FRONTIER_COLS = [
    "url_hash", "norm_url", "task_type", "depth", "source_type", "source_url",
    "parent_seq", "sub_order", "redirect_chain", "deny_reason", "host_key",
    "crawl_delay_ms", "seq",
]


class SparkCrawler:
    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        pages: DataFrame | None,
        state_dir: str,
        max_waves: int = 64,
        resume: bool = False,
        recrawl: bool = False,
    ):
        self.spark = spark
        self.config = config
        self.live = config.fetch_mode == "live"
        if pages is None and not self.live:
            raise ValueError("pages table required unless fetch_mode='live'")
        if self.live:
            self.pages = None
        else:
            # repartition by the join identity: the source parquet may
            # arrive in a handful of file-splits, which would cap every
            # downstream stage's parallelism (and the fetch probe) at
            # that width
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
            self.pages = prepare_pages(pages, repartition=n_part).select(
                "url_hash", "norm_url", "html", "warc_ts"
            )
            self.pages.cache()
        self.store = StateStore(
            spark, state_dir,
            bucketed_tables=("seen",) if config.seen_bucketed_enabled else (),
            bucket_key="url_hash",
            n_buckets=config.seen_buckets,
        )
        self.max_waves = max_waves
        self.resume = resume
        self.recrawl = recrawl
        self.robots_bc = None
        self.robots_dim = None
        self.rules_bc = None
        self.outcome = None  # (stage, outcome, message) set by run()

    # --- robots stage (S2: coordinator.rb:157-194) --------------------------

    def load_robots(self) -> dict:
        """Fetch robots.txt for every allowlisted site from the offline
        corpus; returns {host_key: RobotRules tuple}.

        The per-site robots dimension is host-cardinality (tiny vs the
        corpus): resolved with a broadcast semi-join against `pages` and
        collected for broadcast. At 10^8-host scale this stays a DataFrame
        dimension joined by host_key instead of a driver dict — the UDFs
        take the broadcast either way.
        """
        sites = self.config.allowed_sites()
        rows = [(U.try_normalize(s + "/robots.txt")[0], U.url_host_key(s + "/")) for s in sites]
        if self.live:
            # online S2: eager per-domain GET, exactly the reference's
            # robots_txt_service shape (driver-side, host-cardinality)
            from ..operators.fetch_live import http_fetch_one

            out = {}
            for norm_url, host_key in rows:
                if not norm_url:
                    continue
                from ..operators.fetch_live import (
                    auth_header_for_url,
                    proxy_url_from_config,
                )

                body, _etag, _lastmod = http_fetch_one(
                    norm_url, self.config.request_timeout_s,
                    self.config.max_response_size, self.config.user_agent,
                    authorization=auth_header_for_url(
                        norm_url, tuple(self.config.domain_auth or ())
                    ),
                    proxy_url=proxy_url_from_config(self.config),
                    ssl_mode=self.config.ssl_verification_mode,
                    ssl_cas=tuple(self.config.ssl_ca_certificates or ()),
                    loopback_allowed=self.config.loopback_allowed,
                    private_networks_allowed=(
                        self.config.private_networks_allowed
                    ),
                )
                if body.startswith(b"<!--STATUS:"):
                    out[host_key] = robots_mod.failed_fetch(int(body[11:14])).to_tuple()
                elif body.startswith(b"<!--REDIRECT:"):
                    # redirected robots: the reference treats redirect
                    # errors as a 404-equivalent fetch failure
                    out[host_key] = robots_mod.failed_fetch(404).to_tuple()
                else:
                    out[host_key] = robots_mod.parse_robots_txt(
                        body.decode("utf-8", "replace"),
                        base_url=norm_url, agent=self.config.user_agent,
                    ).to_tuple()
            return out
        robots_df = self.spark.createDataFrame(
            [(r, h, U.url_sha1(r)) for r, h in rows if r], "norm_url string, host_key string, url_hash string"
        )
        # inner join with the ROBOTS side broadcast: the corpus streams in
        # place (no shuffle of the html blobs — a left join with the tiny
        # side preserved cannot broadcast it and would shuffle the corpus),
        # and this first full pass doubles as the corpus-cache
        # materializer (run() skips its explicit count when this path will
        # scan pages anyway). Hosts with no robots row in the corpus are
        # resolved driver-side to the 404 fetch-failure rules.
        fetched = (
            self.pages.select("url_hash", "html")
            .join(F.broadcast(robots_df), on="url_hash", how="inner")
            .select("host_key", "norm_url", "html")
            .collect()
        )
        out = {}
        for _r, h in rows:
            out[h] = robots_mod.failed_fetch(404).to_tuple()
        for row in fetched:
            if row.html is None:
                out[row.host_key] = robots_mod.failed_fetch(404).to_tuple()
                continue
            body = bytes(row.html)
            if body.startswith(b"<!--STATUS:"):
                status = int(body[11:14])
                out[row.host_key] = robots_mod.failed_fetch(status).to_tuple()
            else:
                out[row.host_key] = robots_mod.parse_robots_txt(
                    body.decode("utf-8", "replace"),
                    base_url=row.norm_url,
                    agent=self.config.user_agent,
                ).to_tuple()
        return out

    def load_robots_df(self) -> DataFrame:
        """Distributed robots dimension — the 10^8-host path: robots bodies
        are fetched by a url_hash join against the corpus (offline) or by
        host-hashed live GETs on the executors (live mode — the driver
        never fetches nor materializes the rules), then parsed
        executor-side into ``(host_key, rules_json, sitemaps_json)``. (The
        site list itself comes from config here; a production allowlist at
        that scale would arrive as a table and enter the same join.)"""
        import json as _json

        sites = self.config.allowed_sites()
        rows = [
            (U.try_normalize(s + "/robots.txt")[0], U.url_host_key(s + "/")) for s in sites
        ]
        robots_df = self.spark.createDataFrame(
            [(r, h, U.url_sha1(r)) for r, h in rows if r],
            "norm_url string, host_key string, url_hash string",
        )
        if self.live:
            from ..operators.fetch_live import fetch_urls, proxy_url_from_config

            cfgc = self.config
            timeout = cfgc.request_timeout_s
            max_b = cfgc.max_response_size
            agent_s = cfgc.user_agent
            threads = cfgc.live_fetch_threads
            auth_cfgs = tuple(cfgc.domain_auth or ())
            proxy = proxy_url_from_config(cfgc)
            ssl_mode = cfgc.ssl_verification_mode
            ssl_cas = tuple(cfgc.ssl_ca_certificates or ())
            loopback_ok = cfgc.loopback_allowed
            private_ok = cfgc.private_networks_allowed

            def fetch_robots(it):
                import pandas as pd

                for pdf in it:
                    if len(pdf) == 0:
                        continue
                    bodies, _ = fetch_urls(
                        list(pdf["norm_url"]),
                        timeout_s=timeout, max_bytes=max_b,
                        user_agent=agent_s, threads=threads,
                        auth_configs=auth_cfgs, proxy_url=proxy,
                        ssl_mode=ssl_mode, ssl_cas=ssl_cas,
                        loopback_allowed=loopback_ok,
                        private_networks_allowed=private_ok,
                    )
                    out = pdf[["host_key", "norm_url"]].copy()
                    out["html"] = pd.Series(
                        bodies, index=pdf.index, dtype="object")
                    yield out

            fetched = robots_df.repartition(
                F.expr("pmod(hash(host_key), 64)")
            ).mapInPandas(
                fetch_robots, "host_key string, norm_url string, html binary"
            )
        else:
            fetched = robots_df.join(
                self.pages.select("url_hash", "html"), on="url_hash", how="left"
            ).select("host_key", "norm_url", "html")
        agent = self.config.user_agent

        def parse_part(it):
            import pandas as pd

            for pdf in it:
                hks, rjs, sms = [], [], []
                for row in pdf.itertuples(index=False):
                    if row.html is None:
                        rb = robots_mod.failed_fetch(404)
                    else:
                        body = bytes(row.html)
                        if body.startswith(b"<!--STATUS:"):
                            rb = robots_mod.failed_fetch(int(body[11:14]))
                        elif body.startswith(b"<!--REDIRECT:"):
                            # redirected robots = fetch failure, same as
                            # the broadcast-dict path
                            rb = robots_mod.failed_fetch(404)
                        else:
                            rb = robots_mod.parse_robots_txt(
                                body.decode("utf-8", "replace"),
                                base_url=row.norm_url, agent=agent,
                            )
                    hks.append(row.host_key)
                    rjs.append(_json.dumps(rb.to_tuple()))
                    sms.append(_json.dumps(rb.sitemaps))
                yield pd.DataFrame(
                    {"host_key": hks, "rules_json": rjs, "sitemaps_json": sms}
                )

        return fetched.mapInPandas(
            parse_part, "host_key string, rules_json string, sitemaps_json string"
        )

    # --- helpers -------------------------------------------------------------

    def _read_frontier(self, path: str) -> DataFrame:
        """Frontier re-read with the schema pinned after the first read —
        the per-wave re-read exists to cut lineage, not to re-infer a
        fixed schema (footer-based inference is serial driver IO paid
        every wave)."""
        if getattr(self, "_frontier_schema", None) is None:
            df = self.spark.read.parquet(path)
            self._frontier_schema = df.schema
            return df
        return self.spark.read.schema(self._frontier_schema).parquet(path)

    def _candidates_df(self, rows):
        schema = T.StructType(
            [
                T.StructField("norm_url", T.StringType()),
                T.StructField("task_type", T.StringType()),
                T.StructField("depth", T.IntegerType()),
                T.StructField("source_type", T.StringType()),
                T.StructField("source_url", T.StringType()),
                T.StructField("parent_seq", T.LongType()),
                T.StructField("sub_order", T.LongType()),
                T.StructField("redirect_chain", T.ArrayType(T.StringType())),
                T.StructField("needs_norm", T.BooleanType()),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    def _append_bloom_delta(self, seen_path: str, wave: int) -> None:
        """Maintain the partitioned Bloom sidecar (state/bloom.py): append
        this wave's delta bitsets built from the just-written seen rows (a
        url_hash-pruned scan of the wave file). Must land before the next
        wave's probe — that ordering is the no-false-negative invariant."""
        if not self.config.seen_bloom_enabled:
            return
        from ..state.bloom import build_bloom_delta

        delta = build_bloom_delta(
            self.spark.read.parquet(seen_path).select("url_hash"),
            num_buckets=self.config.seen_bloom_buckets,
            nbits=self.config.seen_bloom_bits,
        )
        self.store.append("seen_bloom", delta, wave)

    def _ensure_bloom_covers_seen(self, manifest: dict, wave: int) -> None:
        """Resume-time sidecar validation (no-false-negative invariant):
        the Bloom fast path may only run if the sidecar provably covers
        the FULL seen table with the CURRENT (buckets, nbits) params.
        The manifest's ``bloom`` key asserts exactly that (written each
        bloom-on wave, removed by bloom-off waves). Any mismatch —
        --bloom newly enabled on a state crawled without it, params
        changed between runs, or a bloom-off resume that left a coverage
        gap — rebuilds the sidecar from the seen table in one pass
        (same cost as one wave's delta build, amortized over the run;
        silently probing a stale sidecar would instead re-admit
        already-seen URLs via Bloom false negatives)."""
        want = {"buckets": self.config.seen_bloom_buckets,
                "bits": self.config.seen_bloom_bits}
        if manifest.get("bloom") == want:
            return
        from ..state.bloom import build_bloom_delta

        self.store.reset("seen_bloom")
        seen_full = self.store.read("seen")
        if seen_full is not None:
            delta = build_bloom_delta(
                seen_full.select("url_hash"),
                num_buckets=want["buckets"], nbits=want["bits"],
            )
            # land under the PRIOR wave's slot (free after the reset):
            # append() overwrites per-wave dirs, and the resuming wave
            # still appends its own delta under its own number
            self.store.append("seen_bloom", delta, max(0, wave - 1))

    def _gate_and_admit(self, candidates: DataFrame, seen: DataFrame | None,
                        seen_count: int, seq_base: int, wave: int):
        """Gate chain → denied lineage rows + admitted frontier rows +
        admitted count (derived, no count job)."""
        if not self.config.lineage_enabled and self.config.discovery_prededup:
            # perf path: collapse the exploded wave to one FIFO-winner row
            # per distinct link BEFORE the Python gate UDF — map-side
            # combine absorbs the fanout duplication, so the Arrow
            # round-trip and the seen anti-join probe run on the distinct
            # set (~fanout-fold smaller). Exactness argued and pinned at
            # prededup_discoveries; lineage mode keeps the full stream for
            # per-candidate deny attribution.
            from ..operators.dedup import prededup_discoveries

            candidates = prededup_discoveries(
                candidates, self.config.max_crawl_depth
            )
        gated = apply_gates(
            candidates, self.config, self.robots_bc, self.rules_bc,
            robots_dim=self.robots_dim,
        )
        gated = gated.withColumn(
            "url_hash", F.sha1(F.encode(F.col("norm_url"), "utf-8"))
        )
        self._wave_caches = getattr(self, "_wave_caches", [])
        if self.config.lineage_enabled:
            # gated feeds both the denied-lineage rows and the admission
            # chain — worth caching; without lineage it has one consumer
            gated = gated.cache()
            self._wave_caches.append(gated)
        denied = gated.filter(F.col("deny_reason").isNotNull())
        allowed = gated.filter(F.col("deny_reason").isNull())
        # lineage off = the perf path: collect-free in-plan rank, no
        # wave-sized cache, one job per admission; n_adm rides the seen
        # write as an observe metric (store.append_counted)
        defer = not self.config.lineage_enabled
        # (with defer on, the caller reads n_adm from the seen write's
        # observe metric — append_counted — instead of running a count job)
        seen_bloom = (
            self.store.read("seen_bloom")
            if (self.config.seen_bloom_enabled and seen is not None)
            else None
        )
        admitted, n_adm, queue_dropped = admit(
            allowed, seen, seen_count, self.config.max_unique_url_count, seq_base,
            num_buckets=int(self.spark.conf.get("spark.sql.shuffle.partitions", "32")),
            cache_tracker=self._wave_caches,
            queue_space=self.config.url_queue_size_limit,
            defer_count=defer,
            seen_bloom=seen_bloom,
            bloom_conf=(self.config.seen_bloom_buckets, self.config.seen_bloom_bits),
        )
        if queue_dropped is not None:
            # strict-compat queue cap: dropped rows surface as queue_full
            # denials (never marked seen → re-discoverable later)
            denied = denied.unionByName(
                queue_dropped.select(*denied.columns), allowMissingColumns=False
            )
        if defer:
            # the already_seen/budget attribution below exists only for the
            # lineage table; without it the seen write is the sole consumer
            return denied, None, admitted, None
        if self.config.lineage_enabled:
            # with lineage on, admitted feeds the seen write AND the
            # lineage/events/K* consumers → cache; with lineage off the
            # seen write is its only consumer and caching a wave-sized
            # DataFrame just burns heap (measured: 3M-row waves thrash a
            # 24g heap and the seen write anti-scales 10×)
            admitted = admitted.cache()
            self._wave_caches.append(admitted)
        # already-seen vs budget attribution for lineage, replaying the
        # reference's per-URL order exactly (coordinator.rb:566-592,
        # 707-717):
        # * a same-batch twin of an admitted url is dropped SILENTLY (batch
        #   dedup emits no event) — one batch ≡ one (parent page,
        #   source_type, task_type) link group;
        # * the budget is checked BEFORE the seen set, so once it fills at
        #   admission-order position K* (the last admitted row), everything
        #   after K* denies too_many_unique_links — dups included;
        # * before K*, a non-admitted survivor is necessarily a dup of the
        #   seen set → already_seen.
        seen_keys = admitted.select("url_hash")
        if seen is not None:
            seen_keys = seen_keys.unionByName(seen.select("url_hash"))
        batch_key = ["url_hash", "parent_seq", "source_type", "task_type"]
        not_admitted = allowed.join(
            admitted.select(*batch_key).dropDuplicates(),
            on=batch_key, how="left_anti",
        ).join(
            seen_keys.dropDuplicates(["url_hash"]).withColumn("_in_seen", F.lit(True)),
            on="url_hash", how="left",
        )
        budget_left = max(0, self.config.max_unique_url_count - seen_count)
        filled = n_adm >= budget_left  # budget exhausted at/by this wave
        if filled and n_adm > 0 and self.config.lineage_enabled:
            kstar = admitted.filter(F.col("seq") == seq_base + n_adm).select(
                "parent_seq", "sub_order", "norm_url"
            ).first()
            before_fill = (
                (F.col("parent_seq") < kstar["parent_seq"])
                | ((F.col("parent_seq") == kstar["parent_seq"])
                   & ((F.col("sub_order") < kstar["sub_order"])
                      | ((F.col("sub_order") == kstar["sub_order"])
                         & (F.col("norm_url") < kstar["norm_url"]))))
            )
        else:
            before_fill = F.lit(not filled)
        not_admitted = not_admitted.withColumn(
            "deny_reason",
            F.when(F.col("_in_seen") & before_fill, F.lit("already_seen")).otherwise(
                F.lit("too_many_unique_links")
            ),
        ).drop("_in_seen")
        return denied, not_admitted, admitted, n_adm

    def _lineage(self, df: DataFrame, wave: int, admitted: bool) -> DataFrame:
        return df.select(
            F.lit(wave).alias("wave"),
            "norm_url", "url_hash", "task_type", "depth", "source_type", "source_url",
            F.col("deny_reason") if "deny_reason" in df.columns else F.lit(None).cast("string").alias("deny_reason"),
            F.lit(admitted).alias("admitted"),
        )

    # --- main loop ------------------------------------------------------------

    def run(self):
        cfg = self.config
        t0 = time.time()
        self._lifecycle_rows = []
        # corpus-cache materialization (the ingest/bucketing step of the
        # production Iceberg table): in offline broadcast-robots mode the
        # robots pass below is the materializing scan — one corpus pass
        # serves both instead of a count job followed by a robots scan.
        # The dimension path and empty-allowlist runs still materialize
        # explicitly so the cost stays attributed here, not to wave 1.
        robots_materializes = (
            not self.live
            and bool(cfg.allowed_sites())
            and len(cfg.allowed_sites()) < cfg.robots_dimension_threshold
        )
        if not self.live and not robots_materializes:
            self.pages.count()
        prep_s = round(time.time() - t0, 3)
        if len(cfg.allowed_sites()) >= cfg.robots_dimension_threshold:
            # 10^8-host path: rules stay a distributed dimension; only the
            # hosts that advertise sitemaps are collected (bounded by the
            # sitemap-advertising host count, not the host count)
            import json as _json

            self.robots_dim = self.load_robots_df().cache()
            self.robots_bc = None
            sitemaps_by_host = {
                r["host_key"]: _json.loads(r["sitemaps_json"])
                for r in self.robots_dim.filter(F.col("sitemaps_json") != "[]")
                .select("host_key", "sitemaps_json").collect()
            }
        else:
            robots = self.load_robots()
            self.robots_bc = self.spark.sparkContext.broadcast(robots)
            sitemaps_by_host = {
                hk: robots_mod.RobotRules.from_tuple(robots[hk]).sitemaps
                for hk in robots
            }
        robots_s = round(time.time() - t0 - prep_s, 3)
        self._pre_wave = {"prep_s": prep_s, "robots_s": robots_s,
                          "t0": round(t0, 3)}
        self.rules_bc = self.spark.sparkContext.broadcast(dict(cfg.crawl_rules))

        manifest = self.store.read_manifest() if (self.resume or self.recrawl) else None
        if self.recrawl and manifest:
            # re-crawl over the same state dir (C4 two-stage loop): the
            # parsed/docs history is retained for the purge stage, the seen
            # set resets (per-run in the reference, coordinator.rb:48), wave
            # numbering and the admission seq watermark continue
            base_wave = manifest["wave"] + 1
            seq_base = manifest["seq_base"]
            self.store.reset("seen")
            self.store.reset("seen_bloom")
            self.store.reset("frontier_pending")
            manifest = None
        else:
            base_wave = 0
        initial_pending = None
        if manifest and manifest.get("frontier_pending") is not None:
            wave = manifest["wave"] + 1
            base_wave = manifest.get("run_base_wave", 0)
            seq_base = manifest["seq_base"]
            seen_count = manifest["seen_count"]
            seen = self.store.read("seen")
            if cfg.seen_bloom_enabled:
                self._ensure_bloom_covers_seen(manifest, wave)
            frontier = self._read_frontier(manifest["frontier_pending"])
            if cfg.lineage_enabled:
                # event_generator.rb:54-69: crawl-start with resume=true
                self._lifecycle_row(
                    "crawl-start", None, f"Resuming a crawl ({seen_count} seen URLs)"
                )
        else:
            wave = base_wave
            if not self.recrawl:
                seq_base = 0
            seen = None
            seen_count = 0
            # seeds (S1) at depth 1 + sitemaps (S3) at depth 1
            rows = [
                (u, "content", 1, "seed-list", None, 0, i, [], False)
                for i, u in enumerate(cfg.normalized_seeds())
            ]
            smaps = list(cfg.sitemap_urls)
            if not cfg.sitemap_discovery_disabled:
                for hk in sorted(sitemaps_by_host):
                    smaps.extend(sitemaps_by_host[hk])
            rows += [
                (U.try_normalize(u)[0], "sitemap", 1, "sitemap", None, 0, 10_000 + i, [], False)
                for i, u in enumerate(smaps)
                if U.try_normalize(u)[0]
            ]
            if cfg.lineage_enabled:
                self._lifecycle_row("crawl-start", None, "Starting a crawl")
                self._lifecycle_row(
                    "crawl-seed", None, f"{len(rows)} seed urls", )
            candidates = self._candidates_df(rows)
            denied, dup, admitted, n_adm = self._gate_and_admit(
                candidates, None, 0, seq_base, wave
            )
            # the seen table rows ARE frontier rows (full columns): one
            # write serves both the dedup anti-join and the next wave;
            # with the count deferred (lineage off) it rides the write job
            # as an observe metric (no footer reads, no extra job)
            if n_adm is None:
                pend_path, n_adm = self.store.append_counted(
                    "seen", admitted.select(*FRONTIER_COLS), wave
                )
            else:
                pend_path = self.store.append(
                    "seen", admitted.select(*FRONTIER_COLS), wave
                )
            self._append_bloom_delta(pend_path, wave)
            frontier = self._read_frontier(pend_path)
            if cfg.lineage_enabled:
                self.store.append("lineage", self._lineage(denied, wave, False).unionByName(
                    self._lineage(admitted, wave, True)), wave)
                self.store.append(
                    "events",
                    self._drain_lifecycle(
                        self._events_delta(None, denied, None, admitted)
                    ),
                    wave,
                )
            seen_count = n_adm
            seq_base += n_adm
            seen = self.store.read("seen")
            wave += 1
            # politeness-off wave 1 reads the pending-frontier size from
            # the seed admission count instead of a count job
            initial_pending = n_adm

        politeness_on = cfg.politeness_window_s > 0 or cfg.default_crawl_delay_s > 0
        # known pending-frontier size when politeness off (None = unknown,
        # e.g. resume — one count job re-establishes it)
        pending_count = initial_pending
        # stored priority dimension (e.g. a linkrank.pagerank output) the
        # priority expression can reference; wave-invariant, loaded once
        prio_dim = (
            self.spark.read.parquet(cfg.priority_dimension_path)
            if cfg.priority_dimension_path else None
        )
        self.outcome = ("primary", "success", "Completed the primary crawl.")

        while wave <= base_wave + self.max_waves:
            if cfg.max_duration_s and (time.time() - t0) > cfg.max_duration_s:
                # coordinator.rb:290-302: duration budget spans both stages
                self.outcome = (
                    "primary", "warning",
                    f"The crawl is taking too long (elapsed: "
                    f"{int(time.time() - t0)} sec, limit: "
                    f"{int(cfg.max_duration_s)} sec).",
                )
                break
            if politeness_on:
                # politeness dispatch (S4): quota per host under the delay budget
                disp_in = frontier
                if prio_dim is not None:
                    disp_in = frontier.join(
                        prio_dim, cfg.priority_dimension_key, "left"
                    )
                dispatched = dispatch(
                    disp_in, cfg.politeness_window_s, cfg.default_crawl_delay_s,
                    priority_expr=cfg.frontier_priority_expr or None,
                )
                ready, deferred = split_ready(dispatched)
                ready = ready.cache()
                n_ready = ready.count()
            else:
                # fast path: no quota → the whole frontier is the wave, and
                # its size is already known from last wave's admission count
                ready, deferred = frontier, None
                n_ready = pending_count if pending_count is not None else frontier.count()
            if n_ready == 0:
                break
            wave_t0 = time.time()
            phases = {}

            def _mark(name, t0=[wave_t0]):
                now = time.time()
                phases[name] = round(now - t0[0], 3)
                t0[0] = now

            # fetch (offline join or live HTTP) + parse, one pass
            self._wave_caches = getattr(self, "_wave_caches", [])
            wave_cols = ready.select(
                "url_hash", "norm_url", "task_type", "depth", "seq", "redirect_chain"
            )
            if self.live:
                from ..operators.fetch_live import live_fetch_join

                # + robots Crawl-delay so in-task pacing honors each host
                live_cols = ready.select(
                    *wave_cols.columns, "crawl_delay_ms"
                )
                fetched = live_fetch_join(self._with_validators(live_cols), cfg)
                reused = None
            else:
                # recrawl: reuse parsed rows for provably-unchanged pages
                # (corpus warc_ts == recorded warc_ts) — the offline 304
                fetch_wave = wave_cols
                reused = None
                if self.recrawl and cfg.reuse_unchanged_pages:
                    reused, fetch_wave = self._reuse_unchanged(wave_cols)
                # broadcast only genuinely small waves: broadcasting is
                # driver-serial O(wave), so big waves take the
                # co-partitioned shuffle-hash path (corpus cached in
                # HashPartitioning(url_hash))
                fetched = fetch_join(
                    fetch_wave, self.pages, broadcast_wave=n_ready < 100_000,
                    cache_tracker=self._wave_caches)
            if cfg.warc_export_dir:
                # archive the wave (url, warc_ts, html) as WARC before the
                # parse consumes it; the persist makes the export action
                # populate the cache so live mode fetches each URL once
                import os as _os

                from pyspark.storagelevel import StorageLevel

                from ..sources.warc import export_warc

                fetched = fetched.persist(StorageLevel.MEMORY_AND_DISK)
                self._wave_caches.append(fetched)
                export_warc(
                    fetched.withColumnRenamed("norm_url", "url"),
                    _os.path.join(cfg.warc_export_dir, f"wave={wave}"),
                ).collect()
            parsed = parse_wave(fetched, cfg)
            if reused is not None:
                parsed = parsed.unionByName(reused, allowMissingColumns=True)

            # ONE wave-sized write serves docs (read-time view), metrics and
            # discovery: the parsed table is the docs MERGE Δ (S6) *and* the
            # link source, and every later consumer is a column-pruned
            # parquet scan — nothing wave-sized is pinned on the JVM heap
            # (the previous design cached parsed+hits deserialized, and the
            # resulting GC/eviction pressure grew with concurrency — the
            # measured anti-scaling of the admission phase at 4N cores).
            parsed_schema = parsed.schema
            parsed_path = self.store.append("parsed", parsed, wave)
            # schema pinned from the df just written: skips the re-read's
            # footer-based inference (serial driver IO, every wave)
            parsed = self.spark.read.schema(parsed_schema).parquet(parsed_path)
            if self.live:
                # conditional-revisit validators (3-column pruned scan)
                self.store.append(
                    "validators", self._validators_delta(parsed), wave
                )
            _mark("fetch_parse_docs")

            # fetch metrics (A3): 3-column pruned scan of the wave file.
            # Launched on a driver thread so the tiny metrics job overlaps
            # the admission chain's (driver-serial) planning instead of
            # adding its own fixed job cost to the wave floor; joined
            # before the checkpoint so the manifest never commits a wave
            # whose metrics Δ hasn't landed. SparkSession is thread-safe;
            # the write targets its own snapshot dir.
            import threading

            metrics_df = parsed.groupBy("kind", "status", "depth").agg(
                F.count("*").alias("n")
            )
            metrics_err = []

            def _write_metrics():
                try:
                    self.store.append("metrics", metrics_df, wave)
                except BaseException as e:  # surfaced at join time
                    metrics_err.append(e)

            metrics_t = threading.Thread(target=_write_metrics, daemon=True)
            metrics_t.start()
            _mark("metrics")

            # discovery: redirect ∪ canonical ∪ organic ∪ sitemap links
            candidates = self._discoveries(parsed)

            denied, dup, admitted, n_adm = self._gate_and_admit(
                candidates, seen, seen_count, seq_base, wave
            )
            _mark("gates_admit")
            # one write serves the seen MERGE *and* (politeness off) the
            # next frontier: the seen table stores full frontier columns and
            # the anti-join probe prunes to url_hash at the parquet scan;
            # the admitted count rides the write job as an observe metric
            if n_adm is None:
                seen_path, n_adm = self.store.append_counted(
                    "seen", admitted.select(*FRONTIER_COLS), wave
                )
            else:
                seen_path = self.store.append(
                    "seen", admitted.select(*FRONTIER_COLS), wave
                )
            self._append_bloom_delta(seen_path, wave)
            _mark("seen_merge")
            if cfg.lineage_enabled:
                self.store.append(
                    "lineage",
                    self._lineage(denied, wave, False)
                    .unionByName(self._lineage(dup, wave, False))
                    .unionByName(self._lineage(admitted, wave, True)),
                    wave,
                )
                # per-URL event stream (C5, event_generator.rb:135-246):
                # url-fetch / url-output rows from the wave's parsed file,
                # url-seed / url-discover(denied) from the admission chain
                self.store.append(
                    "events",
                    self._drain_lifecycle(
                        self._events_delta(parsed, denied, dup, admitted)
                    ),
                    wave,
                )
                _mark("lineage")
            seen_count += n_adm
            seq_base += n_adm
            seen = self.store.read("seen")

            if deferred is not None:
                next_frontier = (
                    self._read_frontier(seen_path)
                    .unionByName(deferred.select(*FRONTIER_COLS))
                )
                pend_path = self.store.append("frontier_pending", next_frontier, wave)
                pending_count = None
            else:
                pend_path = seen_path
                pending_count = n_adm
            frontier = self._read_frontier(pend_path)  # cut lineage each wave
            metrics_t.join()
            if metrics_err:
                raise metrics_err[0]
            _mark("frontier_merge")
            self.store.checkpoint(
                wave, seq_base, seen_count,
                extra={"ready": n_ready, "admitted": n_adm,
                       "wave_s": round(time.time() - wave_t0, 3),
                       "phases": phases,
                       # wall-clock anchors: scripts/driver_gap.py joins
                       # these against the Spark event log to attribute
                       # each wave's driver-gap seconds (time with no job
                       # running — the serial floor the scaling criterion
                       # pays at every core count)
                       "t0": round(wave_t0, 3),
                       "t_end": round(time.time(), 3),
                       **({"pre_wave": self._pre_wave} if wave == 1 else {})},
            )
            m = self.store.read_manifest()
            m["frontier_pending"] = pend_path
            m["run_base_wave"] = base_wave
            # record sidecar coverage: the key's presence asserts "the
            # seen_bloom deltas cover the seen table as of this manifest,
            # built with exactly these params" — resume validates against
            # it (and a bloom-off run removes it, so a later bloom-on
            # resume knows the sidecar has a coverage gap and rebuilds)
            if cfg.seen_bloom_enabled:
                m["bloom"] = {"buckets": cfg.seen_bloom_buckets,
                              "bits": cfg.seen_bloom_bits}
            else:
                m.pop("bloom", None)
            self.store.write_manifest(m)
            for df in getattr(self, "_wave_caches", []):
                df.unpersist()
            self._wave_caches = []
            if politeness_on:
                ready.unpersist()
            wave += 1

        if cfg.lineage_enabled:
            # event_generator.rb:72-91: per-stage end + final crawl-end
            self._lifecycle_row("crawl-stage-end", self.outcome[1], self.outcome[2])
        if cfg.purge_crawl_enabled and self.outcome[1] == "success":
            wave = self._run_purge(wave, base_wave, t0)
            if cfg.lineage_enabled:
                self._lifecycle_row(
                    "crawl-stage-end", self.outcome[1], self.outcome[2]
                )
        if cfg.lineage_enabled:
            self._lifecycle_row("crawl-end", self.outcome[1], self.outcome[2])
            # `wave` is past every written snapshot dir, so the flush never
            # clobbers a wave's events Δ
            self.store.append("events", self._drain_lifecycle(None), wave)
        m = self.store.read_manifest()
        if m is not None:
            m["outcome"] = {
                "stage": self.outcome[0], "outcome": self.outcome[1],
                "message": self.outcome[2],
            }
            self.store.write_manifest(m)
        return CrawlResult(self, time.time() - t0)

    def _run_purge(self, wave: int, base_wave: int, t0: float) -> int:
        """Purge stage (S9/C4, coordinator.rb:96-115): docs whose latest
        version predates this run's primary stage are re-fetched with link
        extraction suppressed (coordinator.rb:727-730); any that no longer
        yield a document are tombstoned into the ``purged`` table — the
        merge-on-read equivalent of the reference's
        ``delete_by_query(last_crawled_at < crawl_start)``
        (output_sink/elasticsearch.rb:105-151)."""
        cfg = self.config
        parsed_all = self.store.read("parsed")
        if parsed_all is None or base_wave == 0:
            # fresh state dir: nothing can predate this run
            self.outcome = (
                "purge", "success",
                "Skipped purge crawl as no outdated documents were found.",
            )
            return wave
        stale = self._live_docs().filter(F.col("wave") < base_wave).select(
            F.col("id").alias("url_hash"), F.col("url").alias("norm_url")
        )
        purge_t0 = time.time()
        frontier = stale.select(
            "url_hash",
            "norm_url",
            F.lit("content").alias("task_type"),
            F.lit(1).alias("depth"),
            F.lit(0).cast("long").alias("seq"),
            F.array().cast("array<string>").alias("redirect_chain"),
        )
        n = frontier.count()
        if n == 0:
            self.outcome = (
                "purge", "success",
                "Skipped purge crawl as no outdated documents were found.",
            )
            return wave
        if cfg.max_duration_s and (time.time() - t0) > cfg.max_duration_s:
            self.outcome = ("purge", "warning", "The crawl is taking too long.")
            return wave
        self._wave_caches = []
        reused = None
        if self.live:
            from ..operators.fetch_live import live_fetch_join

            fetched = live_fetch_join(self._with_validators(frontier), cfg)
        else:
            # unchanged pages (same corpus warc_ts) are refreshed without
            # re-parsing — the purge re-check degrades to a 2-column
            # metadata join for the static bulk of the corpus
            if cfg.reuse_unchanged_pages:
                reused, frontier = self._reuse_unchanged(frontier)
            fetched = fetch_join(
                frontier, self.pages, broadcast_wave=n < 100_000,
                cache_tracker=self._wave_caches,
            )
        parsed = parse_wave(fetched, cfg)
        if reused is not None:
            parsed = parsed.unionByName(reused, allowMissingColumns=True)
        parsed_path = self.store.append("parsed", parsed, wave)
        purge_parsed = self.spark.read.parquet(parsed_path)
        if self.live:
            self.store.append(
                "validators", self._validators_delta(purge_parsed), wave
            )
        # purge-stage fetches land in the same metrics table as primary
        # waves (A3/A4 — the ingestion-stats Δ covers both stages)
        self.store.append(
            "metrics",
            purge_parsed.groupBy("kind", "status", "depth").agg(
                F.count("*").alias("n")
            ),
            wave,
        )
        # tombstones: stale ids that did not produce a document on
        # re-fetch; a 304 (conditional revisit, not modified) counts as
        # refreshed — the stored doc stays live
        produced = docs_from_parsed(purge_parsed, cfg).select("id").unionByName(
            purge_parsed.filter(F.col("kind") == "not_modified")
            .select(F.col("url_hash").alias("id"))
        )
        tombs = (
            stale.select(F.col("url_hash").alias("id"))
            .join(produced, on="id", how="left_anti")
        )
        self.store.append("purged", tombs, wave)
        if cfg.lineage_enabled:
            fetch_ev = self._fetch_events(purge_parsed)
            out_ev = self._output_events(purge_parsed)
            self.store.append("events", fetch_ev.unionByName(out_ev), wave)
        m = self.store.read_manifest() or {}
        self.store.checkpoint(
            wave, m.get("seq_base", 0), m.get("seen_count", 0),
            extra={"stage": "purge", "ready": n,
                   "wave_s": round(time.time() - purge_t0, 3)},
        )
        for df in self._wave_caches:
            df.unpersist()
        self._wave_caches = []
        self.outcome = ("purge", "success", "Completed the purge crawl.")
        return wave + 1

    def _live_docs(self) -> DataFrame:
        return state_docs_view(self.store, self.config)

    def compact_state(self):
        """Maintenance pass between crawls (Iceberg table-maintenance
        equivalent): bin-pack the seen set (the 10^10-row table — the
        anti-join probe's scan cost is file-open bound once waves
        accumulate) and fold the parsed table's MERGE history into data
        files by keeping the latest row per id. Per-row wave values are
        preserved, so ``_live_docs`` resolution, recrawl staleness
        (``wave < base_wave``) and purge-tombstone ordering are unchanged
        — pinned by tests/test_crawl_stages.py.
        """
        from pyspark.sql import Window

        # append-only tables: pure bin-pack (no history folding needed)
        for name in ("seen", "lineage", "events", "metrics", "purged",
                     "frontier_pending"):
            if self.store.exists(name):
                self.store.compact(name)
        parsed = self.store.read("parsed")
        if parsed is not None:
            # keep BOTH the latest row per id (recrawl staleness) and the
            # latest doc-eligible row per id: a page whose recrawl turned
            # noindex/404 keeps its older doc row, matching the reference's
            # MERGE-without-delete semantics (the purge stage, not the
            # output gate, removes docs)
            from crawler_spark.operators.parse import doc_eligible

            w = Window.partitionBy("url_hash").orderBy(F.col("wave").desc())

            def _latest(df):
                return (
                    df.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )

            keep = (
                _latest(parsed)
                .unionByName(_latest(parsed.filter(doc_eligible(self.config))))
                .dropDuplicates(["url_hash", "wave"])
            )
            self.store.compact("parsed", keep)
        validators = self.store.read("validators")
        if validators is not None:
            # fold to the latest validator per URL (older conditional-
            # request state is superseded)
            w = Window.partitionBy("url_hash").orderBy(F.col("wave").desc())
            self.store.compact(
                "validators",
                validators.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn"),
            )

    # --- event stream (C5, event_generator.rb:135-246) ----------------------

    _EVENT_COLS = [
        "action", "url", "url_hash", "depth", "status", "outcome",
        "deny_reason", "source_type", "source_url", "message",
    ]

    _EVENT_SCHEMA = (
        "action string, url string, url_hash string, depth int, status int, "
        "outcome string, deny_reason string, source_type string, "
        "source_url string, message string"
    )

    def _lifecycle_row(self, action: str, outcome: str | None, message: str):
        """crawl-start / crawl-stage-end / crawl-end / crawl-seed rows
        (event_generator.rb:54-99) — buffered and unioned into the next
        events Δ (wave dirs are immutable snapshots, so lifecycle rows ride
        an existing write or the final post-loop one)."""
        self._lifecycle_rows.append(
            (action, None, None, None, None, outcome, None, None, None, message)
        )

    def _drain_lifecycle(self, ev: DataFrame | None) -> DataFrame | None:
        if not self._lifecycle_rows:
            return ev
        extra = self.spark.createDataFrame(self._lifecycle_rows, self._EVENT_SCHEMA)
        self._lifecycle_rows = []
        return extra if ev is None else ev.unionByName(extra)

    def _reuse_unchanged(self, wave_cols: DataFrame):
        """Offline analog of a 304: on a recrawl/purge wave, pages whose
        corpus ``warc_ts`` equals the one recorded in the parsed history
        are provably unchanged, so their previous parsed rows are reused
        verbatim and the per-document Python parse (the wave's dominant
        cost at scale) runs only over the changed/missing remainder.

        The change probe reads ONLY (url_hash, warc_ts) from the corpus —
        parquet column pruning never touches the 100 TB html column for
        unchanged rows. Reused rows carry their original extraction
        bit-for-bit, so the byte-identical-text invariant is preserved by
        construction. Returns ``(reused_parsed_or_None, remaining_wave)``.
        """
        prev = self.store.read("parsed")
        if prev is None or self.pages is None:
            return None, wave_cols
        from pyspark.sql import Window

        meta = self.pages.select(
            "url_hash", F.col("warc_ts").alias("_corpus_ts")
        )
        probe = wave_cols.select("url_hash").join(meta, "url_hash")
        cand = prev.join(probe, "url_hash")  # wave-sized after the join
        w = Window.partitionBy("url_hash").orderBy(F.col("wave").desc())
        latest = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        reused = (
            latest.filter(F.col("warc_ts") == F.col("_corpus_ts"))
            .drop("_rn", "_corpus_ts", "wave")
        )
        remaining = wave_cols.join(
            reused.select("url_hash"), "url_hash", "left_anti"
        )
        return reused, remaining

    def _with_validators(self, frontier: DataFrame) -> DataFrame:
        """Left-join the latest stored response validators (etag /
        last_modified, RFC 9110) onto a live fetch wave so revisited URLs
        send conditional requests and unchanged pages come back as 304s —
        the recrawl bandwidth saver the reference lacks (it re-downloads
        unconditionally every recrawl). The validators table is tiny
        relative to the corpus (one row per doc-producing URL) and
        co-keyed on url_hash, so the join shuffles only the wave."""
        v = self.store.read("validators")
        if v is None:
            return frontier
        latest = (
            v.groupBy("url_hash")
            .agg(F.max(F.struct("wave", "etag", "last_modified")).alias("s"))
            .select("url_hash", "s.etag", "s.last_modified")
        )
        return frontier.join(latest, "url_hash", "left")

    def _validators_delta(self, parsed: DataFrame) -> DataFrame:
        """Validators worth storing: rows that produced a document (a
        future 304 must always have a live doc behind it) or revalidated
        one (not_modified passes the stored validators through, keeping
        them wave-fresh)."""
        from ..operators.parse import doc_eligible

        return parsed.filter(
            (F.col("etag").isNotNull() | F.col("last_modified").isNotNull())
            & (doc_eligible(self.config) | (F.col("kind") == "not_modified"))
        ).select("url_hash", "etag", "last_modified")

    def _fetch_events(self, parsed: DataFrame) -> DataFrame:
        return parsed.select(
            F.lit("url-fetch").alias("action"),
            F.col("norm_url").alias("url"),
            "url_hash",
            "depth",
            "status",
            F.when((F.col("status") >= 200) & (F.col("status") <= 299), "success")
            .when((F.col("status") >= 300) & (F.col("status") <= 599), "failure")
            .otherwise("unknown").alias("outcome"),
            F.lit(None).cast("string").alias("deny_reason"),
            F.lit(None).cast("string").alias("source_type"),
            F.lit(None).cast("string").alias("source_url"),
            F.lit(None).cast("string").alias("message"),
        )

    def _extracted_events(self, parsed: DataFrame) -> DataFrame:
        """url-extracted (event_generator.rb:207-220, coordinator.rb:
        380-407): one event per fetched result after content extraction,
        carrying the output gate's verdict. Deny reasons mirror
        rule_engine/base.rb:66-82 in its evaluation order:
        content_type_denied → error_denied → noindex_meta_denied →
        too_many_redirects; everything else is an allowed success."""
        cfg = self.config
        reason = (
            F.when(
                (F.col("kind") == "unsupported")
                | ((F.col("kind") == "file") & F.col("attachment").isNull()),
                "content_type_denied",
            )
            .when((F.col("kind") == "error") | (F.col("status") >= 400), "error_denied")
            .when((F.col("kind") == "html") & F.col("meta_noindex"), "noindex_meta_denied")
            .when(
                F.size(F.coalesce(F.col("redirect_chain"), F.array()))
                > cfg.max_redirects,
                "too_many_redirects",
            )
        )
        return parsed.select(
            F.lit("url-extracted").alias("action"),
            F.col("norm_url").alias("url"),
            "url_hash",
            "depth",
            "status",
            F.when(reason.isNull(), "success").otherwise("denied").alias("outcome"),
            reason.alias("deny_reason"),
            F.lit(None).cast("string").alias("source_type"),
            F.lit(None).cast("string").alias("source_url"),
            F.when(
                F.col("kind") == "redirect",
                F.concat(F.lit("Crawler was redirected to "), F.col("location")),
            ).alias("message"),
        )

    def _output_events(self, parsed: DataFrame) -> DataFrame:
        return docs_from_parsed(parsed, self.config, extra_cols=("depth",)).select(
            F.lit("url-output").alias("action"),
            F.col("url"),
            F.col("id").alias("url_hash"),
            "depth",
            F.lit(None).cast("int").alias("status"),
            F.lit("success").alias("outcome"),
            F.lit(None).cast("string").alias("deny_reason"),
            F.lit(None).cast("string").alias("source_type"),
            F.lit(None).cast("string").alias("source_url"),
            F.lit(None).cast("string").alias("message"),
        )

    def _events_delta(
        self,
        parsed: DataFrame | None,
        denied: DataFrame,
        dup: DataFrame | None,
        admitted: DataFrame,
    ) -> DataFrame:
        def discover(df, action):
            return df.select(
                F.lit(action).alias("action"),
                F.col("norm_url").alias("url"),
                "url_hash",
                "depth",
                F.lit(None).cast("int").alias("status"),
                F.when(F.col("deny_reason").isNotNull() if "deny_reason" in df.columns
                       else F.lit(False), "denied").otherwise("allowed").alias("outcome"),
                (F.col("deny_reason") if "deny_reason" in df.columns
                 else F.lit(None).cast("string")).alias("deny_reason"),
                "source_type",
                "source_url",
                F.lit(None).cast("string").alias("message"),
            )

        out = discover(denied, "url-discover").unionByName(discover(admitted, "url-seed"))
        if dup is not None:
            out = out.unionByName(discover(dup, "url-discover"))
        if parsed is not None:
            out = (
                out.unionByName(self._fetch_events(parsed))
                .unionByName(self._extracted_events(parsed))
                .unionByName(self._output_events(parsed))
            )
        return out

    def _discoveries(self, parsed: DataFrame) -> DataFrame:
        """Flatten one wave's parse output into gate candidates with the
        deterministic admission ordering key (parent_seq, sub_order).

        sub_order encodes the reference's within-page enqueue order:
        redirect location (its own result) < canonical (0) < organic links
        (1+pos); sitemap links before sitemap content links
        (coordinator.rb:421-493)."""
        p = parsed
        redirects = (
            p.filter((F.col("kind") == "redirect") & F.col("location").isNotNull())
            .select(
                F.col("location").alias("norm_url"),
                F.col("task_type"),
                F.col("depth"),
                F.lit("redirect").alias("source_type"),
                F.col("norm_url").alias("source_url"),
                F.col("seq").alias("parent_seq"),
                F.lit(0).cast("long").alias("sub_order"),
                F.concat(
                    F.coalesce(F.col("redirect_chain"), F.array()), F.array(F.col("norm_url"))
                ).alias("redirect_chain"),
                F.lit(False).alias("needs_norm"),  # parse UDF normalized it
            )
        )
        html = p.filter(F.col("kind") == "html")
        canonical = (
            html.filter(F.col("canonical_url").isNotNull())
            .select(
                F.col("canonical_url").alias("raw_url"),
                F.lit("content").alias("task_type"),
                F.col("depth"),
                F.lit("canonical_url").alias("source_type"),
                F.col("norm_url").alias("source_url"),
                F.col("seq").alias("parent_seq"),
                F.lit(0).cast("long").alias("sub_order"),
            )
        )
        organic = (
            html.filter(~F.col("meta_nofollow"))
            .select(
                "norm_url", "depth", "seq", F.explode(F.col("links")).alias("lk")
            )
            .filter(~F.col("lk.nofollow"))
            .select(
                F.col("lk.url").alias("raw_url"),
                F.lit("content").alias("task_type"),
                (F.col("depth") + 1).alias("depth"),
                F.lit("organic").alias("source_type"),
                F.col("norm_url").alias("source_url"),
                F.col("seq").alias("parent_seq"),
                (F.col("lk.pos") + 1).cast("long").alias("sub_order"),
            )
        )
        smap = p.filter(F.col("kind") == "sitemap")
        sm_links = smap.select(
            "norm_url", "depth", "seq",
            F.posexplode(F.coalesce(F.col("sitemap_links"), F.array())).alias("pos", "raw_url"),
        ).select(
            "raw_url",
            F.lit("sitemap").alias("task_type"),
            F.col("depth"),
            F.lit("sitemap").alias("source_type"),
            F.col("norm_url").alias("source_url"),
            F.col("seq").alias("parent_seq"),
            F.col("pos").cast("long").alias("sub_order"),
        )
        sm_content = smap.select(
            "norm_url", "depth", "seq",
            F.posexplode(F.coalesce(F.col("sitemap_content_links"), F.array())).alias(
                "pos", "raw_url"
            ),
        ).select(
            "raw_url",
            F.lit("content").alias("task_type"),
            F.col("depth"),
            F.lit("sitemap").alias("source_type"),
            F.col("norm_url").alias("source_url"),
            F.col("seq").alias("parent_seq"),
            (F.col("pos") + 1_000_000).cast("long").alias("sub_order"),
        )
        # raw links need normalization (links were resolved but not
        # normalized) — flagged needs_norm, done inside the gate UDF in the
        # same Python pass as the verdicts (one Arrow round-trip per wave)
        raw = canonical.unionByName(organic).unionByName(sm_links).unionByName(sm_content)
        raw = (
            raw.withColumnRenamed("raw_url", "norm_url")
            .withColumn("redirect_chain", F.array().cast("array<string>"))
            .withColumn("needs_norm", F.lit(True))
        )
        return redirects.unionByName(raw.select(*redirects.columns))


def state_docs_view(store, config=None) -> DataFrame:
    """Merge-on-read docs view over a crawl state dir: latest doc-eligible
    row per id from the parsed table, minus tombstoned ids. Standalone so
    downstream jobs (rank_hosts, refresh pipelines) read docs from a state
    directory without constructing a SparkCrawler."""
    from pyspark.sql import types as T
    from pyspark.sql import Window

    from ..config import CrawlConfig
    from ..operators.parse import PARSED_SCHEMA

    parsed = store.read("parsed")
    if parsed is None:
        # a crawl that never fetched a single page (all seeds denied by
        # gates/SSRF guard, or unreachable) writes no parsed table — the
        # docs view is empty, not an error
        parsed = store.spark.createDataFrame(
            [], T.StructType(list(PARSED_SCHEMA.fields)
                             + [T.StructField("wave", T.IntegerType())])
        )
    d = docs_from_parsed(parsed, config or CrawlConfig(), extra_cols=("wave",))
    w = Window.partitionBy("id").orderBy(F.col("wave").desc())
    d = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    purged = store.read("purged")
    if purged is not None:
        tomb = purged.groupBy("id").agg(F.max("wave").alias("_pw"))
        d = (
            d.join(tomb, on="id", how="left")
            .filter(F.col("_pw").isNull() | (F.col("wave") > F.col("_pw")))
            .drop("_pw")
        )
    return d


class CrawlResult:
    def __init__(self, crawler: SparkCrawler, elapsed_s: float):
        self.crawler = crawler
        self.store = crawler.store
        self.elapsed_s = elapsed_s

    @property
    def seen(self) -> DataFrame:
        return self.store.read("seen")

    @property
    def docs(self) -> DataFrame:
        # Docs are a read-time view over the per-wave parsed table (the
        # merge-on-read pattern: one write per wave, filter+project at
        # read): latest wave wins per id, tombstoned ids excluded.
        return self.crawler._live_docs().drop("wave")

    @property
    def lineage(self) -> DataFrame:
        return self.store.read("lineage")

    @property
    def events(self) -> DataFrame:
        return self.store.read("events")

    @property
    def purged(self) -> DataFrame:
        return self.store.read("purged")

    @property
    def outcome(self):
        return self.crawler.outcome

    @property
    def metrics(self) -> DataFrame:
        return self.store.read("metrics")
