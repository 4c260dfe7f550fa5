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
        pages: DataFrame,
        state_dir: str,
        max_waves: int = 64,
        resume: bool = False,
    ):
        self.spark = spark
        self.config = config
        # repartition by the join identity: the source parquet may arrive in
        # a handful of file-splits, which would cap every downstream stage's
        # parallelism (and the fetch probe) at that width
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        self.pages = prepare_pages(pages, repartition=n_part).select(
            "url_hash", "norm_url", "html", "warc_ts"
        )
        self.pages.cache()
        self.store = StateStore(spark, state_dir)
        self.max_waves = max_waves
        self.resume = resume
        self.robots_bc = None
        self.rules_bc = None

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
        robots_df = self.spark.createDataFrame(
            [(r, h, U.url_sha1(r)) for r, h in rows if r], "norm_url string, host_key string, url_hash string"
        )
        fetched = robots_df.join(
            self.pages.select("url_hash", "html"), on="url_hash", how="left"
        ).select("host_key", "norm_url", "html").collect()
        out = {}
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

    # --- helpers -------------------------------------------------------------

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

    def _gate_and_admit(self, candidates: DataFrame, seen: DataFrame | None,
                        seen_count: int, seq_base: int, wave: int):
        """Gate chain → denied lineage rows + admitted frontier rows +
        admitted count (derived, no count job)."""
        gated = apply_gates(candidates, self.config, self.robots_bc, self.rules_bc)
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
        admitted, n_adm = admit(
            allowed, seen, seen_count, self.config.max_unique_url_count, seq_base,
            num_buckets=int(self.spark.conf.get("spark.sql.shuffle.partitions", "32")),
            cache_tracker=self._wave_caches,
        )
        admitted = admitted.cache()
        self._wave_caches.append(admitted)
        # already-seen / budget attribution for lineage (metrics only):
        # everything allowed-but-not-admitted was either a wave-dup,
        # already_seen, or budget-capped; record as already_seen|budget.
        not_admitted = allowed.join(
            admitted.select("url_hash", "norm_url").withColumnRenamed("norm_url", "_a"),
            on="url_hash", how="left_anti",
        ).withColumn("deny_reason", F.lit("already_seen_or_budget"))
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
        # materialize the corpus cache explicitly so its cost is attributed
        # (the ingest/bucketing step of the production Iceberg table, not
        # per-wave crawl work)
        self.pages.count()
        prep_s = round(time.time() - t0, 3)
        robots = self.load_robots()
        robots_s = round(time.time() - t0 - prep_s, 3)
        self._pre_wave = {"prep_s": prep_s, "robots_s": robots_s}
        self.robots_bc = self.spark.sparkContext.broadcast(robots)
        self.rules_bc = self.spark.sparkContext.broadcast(dict(cfg.crawl_rules))

        manifest = self.store.read_manifest() if self.resume else None
        if manifest and manifest.get("frontier_pending") is not None:
            wave = manifest["wave"] + 1
            seq_base = manifest["seq_base"]
            seen_count = manifest["seen_count"]
            seen = self.store.read("seen")
            frontier = self.spark.read.parquet(manifest["frontier_pending"])
        else:
            wave = 0
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
                for hk in sorted(robots):
                    smaps.extend(robots_mod.RobotRules.from_tuple(robots[hk]).sitemaps)
            rows += [
                (U.try_normalize(u)[0], "sitemap", 1, "sitemap", None, 0, 10_000 + i, [], False)
                for i, u in enumerate(smaps)
                if U.try_normalize(u)[0]
            ]
            candidates = self._candidates_df(rows)
            denied, dup, admitted, n_adm = self._gate_and_admit(candidates, None, 0, 0, wave)
            # the seen table rows ARE frontier rows (full columns): one
            # write serves both the dedup anti-join and the next wave
            pend_path = self.store.append("seen", admitted.select(*FRONTIER_COLS), wave)
            frontier = self.spark.read.parquet(pend_path)
            if cfg.lineage_enabled:
                self.store.append("lineage", self._lineage(denied, wave, False).unionByName(
                    self._lineage(admitted, wave, True)), wave)
            seen_count = n_adm
            seq_base = n_adm
            seen = self.store.read("seen")
            wave = 1

        politeness_on = cfg.politeness_window_s > 0 or cfg.default_crawl_delay_s > 0
        pending_count = None  # known pending-frontier size when politeness off

        while wave <= self.max_waves:
            if politeness_on:
                # politeness dispatch (S4): quota per host under the delay budget
                dispatched = dispatch(
                    frontier, cfg.politeness_window_s, cfg.default_crawl_delay_s
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

            # fetch (offline join) + parse, one pass
            self._wave_caches = getattr(self, "_wave_caches", [])
            # broadcast only genuinely small waves: broadcasting is
            # driver-serial O(wave), so big waves take the co-partitioned
            # shuffle-hash path (corpus cached in HashPartitioning(url_hash))
            fetched = fetch_join(ready.select(
                "url_hash", "norm_url", "task_type", "depth", "seq", "redirect_chain"
            ), self.pages, broadcast_wave=n_ready < 100_000,
                cache_tracker=self._wave_caches)
            parsed = parse_wave(fetched, cfg)

            # ONE wave-sized write serves docs (read-time view), metrics and
            # discovery: the parsed table is the docs MERGE Δ (S6) *and* the
            # link source, and every later consumer is a column-pruned
            # parquet scan — nothing wave-sized is pinned on the JVM heap
            # (the previous design cached parsed+hits deserialized, and the
            # resulting GC/eviction pressure grew with concurrency — the
            # measured anti-scaling of the admission phase at 4N cores).
            parsed_path = self.store.append("parsed", parsed, wave)
            parsed = self.spark.read.parquet(parsed_path)
            _mark("fetch_parse_docs")

            # fetch metrics (A3): 3-column pruned scan of the wave file
            self.store.append(
                "metrics",
                parsed.groupBy("kind", "status", "depth").agg(F.count("*").alias("n")),
                wave,
            )
            _mark("metrics")

            # discovery: redirect ∪ canonical ∪ organic ∪ sitemap links
            candidates = self._discoveries(parsed)

            denied, dup, admitted, n_adm = self._gate_and_admit(
                candidates, seen, seen_count, seq_base, wave
            )
            _mark("gates_admit")
            # one write serves the seen MERGE *and* (politeness off) the
            # next frontier: the seen table stores full frontier columns and
            # the anti-join probe prunes to url_hash at the parquet scan
            seen_path = self.store.append("seen", admitted.select(*FRONTIER_COLS), wave)
            _mark("seen_merge")
            if cfg.lineage_enabled:
                self.store.append(
                    "lineage",
                    self._lineage(denied, wave, False)
                    .unionByName(self._lineage(dup, wave, False))
                    .unionByName(self._lineage(admitted, wave, True)),
                    wave,
                )
                _mark("lineage")
            seen_count += n_adm
            seq_base += n_adm
            seen = self.store.read("seen")

            if deferred is not None:
                next_frontier = (
                    self.spark.read.parquet(seen_path)
                    .unionByName(deferred.select(*FRONTIER_COLS))
                )
                pend_path = self.store.append("frontier_pending", next_frontier, wave)
                pending_count = None
            else:
                pend_path = seen_path
                pending_count = n_adm
            frontier = self.spark.read.parquet(pend_path)  # cut lineage each wave
            _mark("frontier_merge")
            self.store.checkpoint(
                wave, seq_base, seen_count,
                extra={"ready": n_ready, "admitted": n_adm,
                       "wave_s": round(time.time() - wave_t0, 3),
                       "phases": phases,
                       **({"pre_wave": self._pre_wave} if wave == 1 else {})},
            )
            m = self.store.read_manifest()
            m["frontier_pending"] = pend_path
            self.store.write_manifest(m)
            for df in getattr(self, "_wave_caches", []):
                df.unpersist()
            self._wave_caches = []
            if politeness_on:
                ready.unpersist()
            wave += 1

        return CrawlResult(self, time.time() - t0)

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
        # read). MERGE-update semantics: latest wave wins per id.
        from pyspark.sql import Window

        d = docs_from_parsed(
            self.store.read("parsed"), self.crawler.config, extra_cols=("wave",)
        )
        w = Window.partitionBy("id").orderBy(F.col("wave").desc())
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "wave")
        )

    @property
    def lineage(self) -> DataFrame:
        return self.store.read("lineage")

    @property
    def metrics(self) -> DataFrame:
        return self.store.read("metrics")
