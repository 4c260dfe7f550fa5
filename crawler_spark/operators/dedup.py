"""Frontier admission: wave-local dedup → seen anti-join → budget cap → seq.

The distributed equivalent of SeenUrls#add? (seen_urls.rb:36-38) + the
unique-URL budget (coordinator.rb:707-717), restructured for Spark
(SURVEY §2.4 A1/A6, §4):

* wave-local dedup (F1, batch dedup coordinator.rb:566-592): keep the
  first candidate in deterministic admission order ``(parent_seq,
  sub_order)`` — the order a single-threaded FIFO coordinator would have
  admitted them in, so lineage attribution matches the oracle exactly.
* seen filter (F11): LEFT ANTI join against the seen table on url_hash —
  evaluated only for candidates that survived every deny gate, preserving
  the "denied URLs are never marked seen" invariant structurally.
* budget (F10): ``row_number`` over admission order, capped at
  ``max_unique_url_count - seen_so_far`` — the deterministic equivalent of
  the reference's check-then-admit counter.
* new ``seq`` values continue the global admission sequence so the next
  wave's children order correctly.

Scale note: at 10^10 URLs the anti-join is the dominant shuffle; both sides
hash-partition on url_hash (pages/seen bucketed the same way), Spark's
runtime bloom filter prunes the probe side, and the budget window is global
but tiny (a single rank over the wave's survivors, not the seen table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _admission_order():
    """Deterministic FIFO-equivalent ordering (needs an active session, so
    built lazily)."""
    return [F.col("parent_seq").asc(), F.col("sub_order").asc(), F.col("norm_url").asc()]


#: The one admission-order key both dedup stages rank by (the order a
#: single-threaded FIFO coordinator admits candidates in). UNIQUE per
#: candidate row by construction — _discoveries assigns sub_order
#: disjointly within a parent (redirect/canonical: 0; organic: 1+pos;
#: sitemap links: pos; sitemap content: 1e6+pos; a parent emits only one
#: kind's link families) and seed rows use distinct sub_orders under
#: parent_seq 0 — so the min_by picks below never face a tie. norm_url
#: rides along as a defensive third component (constant within every
#: group both stages build).
ADMISSION_KEY = ("parent_seq", "sub_order", "norm_url")


def wave_dedup(candidates: DataFrame) -> DataFrame:
    """Keep first occurrence per url_hash in admission order (F1).

    Implemented as ``min_by`` over the ADMISSION_KEY struct — a hash
    aggregate — rather than a ``row_number`` window: no per-partition
    sort (the window's dominant cost and spill risk at 10^10-row waves)
    and map-side partial combine collapses duplicates before the
    exchange. Ranking only the ADMISSION_KEY head (not the whole row)
    keeps the winner well-defined if candidates ever grow an unorderable
    payload type (map/binary), and both dedup stages
    (:func:`prededup_discoveries` and this one) rank by the IDENTICAL
    key, so they can never disagree. Winner rows are identical to the
    window formulation because the key is unique per candidate row (see
    ADMISSION_KEY; pinned by the FIFO/seq parity e2e vs the reference
    simulator)."""
    payload = [c for c in candidates.columns if c != "url_hash"]
    winner = candidates.groupBy("url_hash").agg(
        F.min_by(F.struct(*payload), F.struct(*ADMISSION_KEY)).alias("_w")
    )
    return winner.select(
        "url_hash", *[F.col(f"_w.{c}").alias(c) for c in payload]
    ).select(*candidates.columns)


def prededup_discoveries(candidates: DataFrame, max_depth: int) -> DataFrame:
    """Collapse duplicate discovered links JVM-side BEFORE the Python gate
    UDF (the lineage-off perf path).

    A wide wave explodes ready_pages x fanout candidate rows, but the
    stateless gate verdict is a pure function of (link string, task_type)
    and the admission winner per URL is the FIFO-minimum candidate — so the
    wave can be reduced to one row per distinct (norm_url, task_type,
    needs_norm) by a hash aggregate whose map-side partial combine crushes
    the duplication before the exchange. The gate UDF (Arrow round-trip +
    per-URL regex work) and the seen anti-join probe then run on the
    distinct set, not the exploded set — at fanout 128 that is a ~100x
    input cut for the single most expensive admission stage.

    Exactness (admitted set, seq assignment, frontier attribution — pinned
    by tests/test_crawl_e2e.py admission goldens):

    * the depth gate (the only verdict input that varies WITHIN a group) is
      applied first as the equivalent JVM filter (`depth > max` denies —
      apply_gates coalesces link_too_deep after the UDF), so a deep
      duplicate can never shadow a shallower admissible twin;
    * the winner per group is min_by over the shared ADMISSION_KEY — the
      same admission order wave_dedup ranks by (norm_url is constant
      within a group), so the per-url_hash winner after normalization is
      the global FIFO winner, identical row for row;
    * deny-reason attribution for the collapsed rows is not produced, which
      is exactly why this runs only when lineage is off (denied rows are
      unconsumed there).
    """
    key = ["norm_url", "task_type", "needs_norm"]
    payload = [c for c in candidates.columns if c not in key]
    winner = (
        candidates.filter(F.col("depth") <= max_depth)
        .groupBy(*key)
        .agg(F.min_by(F.struct(*payload), F.struct(*ADMISSION_KEY)).alias("_w"))
    )
    return winner.select(
        *key, *[F.col(f"_w.{c}").alias(c) for c in payload]
    ).select(*candidates.columns)


def ordered_global_rank(
    df: DataFrame, num_buckets: int = 32, seq_span: tuple[int, int] | None = None
) -> tuple[DataFrame, int]:
    """Deterministic global row_number over ADMISSION_ORDER without a
    single-task global sort. Returns (ranked_df, total_rows).

    A bare ``Window.orderBy`` funnels the whole wave through one task — fine
    at test scale, a hard bottleneck at 10^10. Instead: ``parent_seq`` is a
    dense admission sequence bounded by the known seq watermark, so
    *analytic range bucketing* on it yields buckets that are already
    globally ordered (every key in bucket b sorts before every key in
    bucket b+1). Rank locally per bucket (parallel window), then add
    per-bucket cumulative offsets (a tiny P-row aggregate collected to the
    driver). Fully deterministic — no sampling, no spark_partition_id.

    ``seq_span=(lo, hi_exclusive)``: the known bound on parent_seq values
    (all parents were admitted before the current watermark), which skips a
    min/max job — the per-wave job count matters more than perfect bucket
    balance, and the offsets are computed from actual counts so ranking
    stays exact even when buckets skew.
    """
    if seq_span is not None:
        mn, span = seq_span[0], max(1, seq_span[1] - seq_span[0])
    else:
        mnmx = df.agg(F.min("parent_seq"), F.max("parent_seq")).first()
        if mnmx[0] is None:
            return df.withColumn("_rank", F.lit(None).cast("long")), 0
        mn, span = mnmx[0], (mnmx[1] - mnmx[0]) + 1
    bkt = F.least(
        F.lit(num_buckets - 1),
        ((F.col("parent_seq") - F.lit(mn)) * num_buckets / F.lit(span)).cast("int"),
    )
    b = df.withColumn("_bkt", bkt)
    w_local = Window.partitionBy("_bkt").orderBy(*_admission_order())
    ranked = b.withColumn("_lrank", F.row_number().over(w_local))
    counts = {r["_bkt"]: r["cnt"] for r in b.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for i in range(num_buckets):
        offsets[i] = acc
        acc += counts.get(i, 0)
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    return (
        ranked.withColumn("_rank", (off_map[F.col("_bkt")] + F.col("_lrank")).cast("long"))
        .drop("_bkt", "_lrank")
    ), acc


def inplan_global_rank(
    df: DataFrame, num_buckets: int, seq_span: tuple[int, int]
) -> DataFrame:
    """Collect-free variant of :func:`ordered_global_rank`: the per-bucket
    cumulative offsets are computed INSIDE the plan — a ≤``num_buckets``-row
    aggregate, offset by a tiny ordered window, broadcast-joined back — so
    the whole admission chain is ONE job with nothing wave-sized pinned on
    the heap.

    The one explicit ``repartition(_bkt)`` exchange is shared by both
    consumers (the rank window and the bucket-count aggregate, each of which
    needs HashPartitioning(_bkt) and therefore reuses the exchange), so the
    expensive upstream — gate UDF, wave-dedup window, seen anti-join —
    executes exactly once. This replaced a ``deduped.cache()`` + driver
    ``collect()`` design whose wave-sized deserialized cache thrashed the
    heap and anti-scaled the seen write at 4N cores.
    """
    mn, span = seq_span[0], max(1, seq_span[1] - seq_span[0])
    bkt = F.least(
        F.lit(num_buckets - 1),
        ((F.col("parent_seq") - F.lit(mn)) * num_buckets / F.lit(span)).cast("int"),
    )
    pre = df.withColumn("_bkt", bkt).repartition(F.col("_bkt"))
    w_local = Window.partitionBy("_bkt").orderBy(*_admission_order())
    ranked = pre.withColumn("_lrank", F.row_number().over(w_local))
    counts = pre.groupBy("_bkt").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy(F.lit(0)).orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("long")
    )
    return (
        ranked.join(F.broadcast(offsets.select("_bkt", "_off")), on="_bkt")
        .withColumn("_rank", (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_bkt", "_lrank", "_off")
    )


def admit(
    allowed: DataFrame,
    seen: DataFrame | None,
    seen_count: int,
    max_unique: int,
    seq_base: int,
    num_buckets: int = 32,
    cache_tracker: list | None = None,
    queue_space: int | None = None,
    defer_count: bool = False,
    seen_bloom: DataFrame | None = None,
    bloom_conf: tuple[int, int] = (64, 1 << 20),
) -> tuple[DataFrame, int | None, DataFrame | None]:
    """Full admission pipeline → (admitted rows with final ``seq``, count,
    queue-dropped rows).

    ``allowed`` must already carry url_hash and have deny_reason null.
    ``seen`` is the url_hash seen table (None on the first wave).

    The admitted count falls out of the rank-offset aggregate: ranks are
    dense 1..N over survivors, so ``n = min(N, budget_left)`` — no extra
    count job. The deduped survivor set is cached (registered on
    ``cache_tracker`` for end-of-wave unpersist) so the gate UDF + dedup
    window + seen anti-join run exactly once per wave: the rank-offset
    collect materializes the cache and the later rank/filter reads it.

    ``queue_space`` (strict-compat mode, url_queue/memory_only.rb:37-49 +
    coordinator.rb:631-644): caps this wave's admissions below the budget;
    overflow rows come back as the third return value with
    ``deny_reason = queue_full`` and are NOT marked seen, so later waves
    can re-discover them — the wave-granularity equivalent of the
    reference's drop-and-unsee. None = unbounded (the frontier-as-table
    design has no in-memory queue to protect).

    ``defer_count=True`` (the lineage-off perf path): rank via
    :func:`inplan_global_rank` — no driver collect, no wave-sized cache,
    the whole chain is one job — and return ``n = None``; the caller
    carries the admitted count out of the seen write itself via an
    ``observe`` metric (store.append_counted — the local stand-in for an
    Iceberg snapshot's ``total-records``).
    """
    deduped = wave_dedup(allowed)
    if seen is not None:
        if seen_bloom is not None:
            # filter-then-verify (state/bloom.py): provably-new candidates
            # bypass the exact anti-join; only the maybe-seen tail (true
            # dups + fpp false positives) probes the seen table. The
            # classified wave feeds BOTH filter branches — persist it
            # (wave-sized skinny rows, end-of-wave unpersist via
            # cache_tracker) so the gate chain + bloom cogroup run once
            from pyspark.storagelevel import StorageLevel

            from ..state.bloom import bloom_classify

            classified = bloom_classify(
                deduped, seen_bloom, bloom_conf[0], bloom_conf[1]
            ).persist(StorageLevel.MEMORY_AND_DISK)
            if cache_tracker is not None:
                cache_tracker.append(classified)
            fresh = classified.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
            maybe = classified.filter(F.col("_maybe_seen")).drop("_maybe_seen")
            deduped = fresh.unionByName(
                maybe.join(seen.select("url_hash"), on="url_hash", how="left_anti")
            )
        else:
            deduped = deduped.join(
                seen.select("url_hash"), on="url_hash", how="left_anti"
            )
    budget_left = max(0, max_unique - seen_count)
    cap = budget_left if queue_space is None else min(budget_left, max(0, queue_space))
    if defer_count:
        ranked, total = inplan_global_rank(
            deduped, num_buckets=num_buckets, seq_span=(0, seq_base + 1)
        ), None
    else:
        deduped = deduped.cache()
        if cache_tracker is not None:
            cache_tracker.append(deduped)
        ranked, total = ordered_global_rank(
            deduped, num_buckets=num_buckets, seq_span=(0, seq_base + 1)
        )
    admitted = ranked.filter(F.col("_rank") <= cap)
    admitted = admitted.withColumn(
        "seq", (F.col("_rank") + F.lit(seq_base)).cast("long")
    ).drop("_rank")
    dropped = None
    if queue_space is not None:
        dropped = (
            ranked.filter((F.col("_rank") > cap) & (F.col("_rank") <= budget_left))
            .drop("_rank")
            .withColumn("deny_reason", F.lit("queue_full"))
        )
    return admitted, (None if total is None else min(total, cap)), dropped
