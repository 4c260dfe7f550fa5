"""Physical-plan regression tests: pin the plan *shapes* that make the
operators scale (BENCH/PLANS.md) so a refactor can't silently reintroduce
a cartesian product, lose a pushed-down filter, or drop a materialization
point. Timings don't carry from local[4] to a 1000-executor cluster —
plan shapes do.
"""

import pytest


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_queries():
    import __spark_entry__ as e

    return e.queries()


# every driver query: no cartesian product anywhere (the brute-force ANN
# baselines broadcast one side — BroadcastNestedLoopJoin, never
# CartesianProduct)
def test_no_cartesian_products_anywhere(spark, entry_queries):
    offenders = []
    for name, fn in entry_queries.items():
        plan = _formatted_plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_pricing_summary_partial_agg_and_pushdown(spark, entry_queries):
    plan = _formatted_plan(entry_queries["pricing_summary"](spark, SF_DIR))
    # map-side combine: two HashAggregates around one Exchange
    assert plan.count("HashAggregate") >= 2
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_seen_antijoin_is_broadcast_anti(spark, entry_queries):
    plan = _formatted_plan(entry_queries["seen_antijoin"](spark, SF_DIR))
    assert "LeftAnti" in plan
    # small build side broadcasts at test scale (bucketed SHJ at prod scale)
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_politeness_topk_group_limit_pushdown(spark, entry_queries):
    plan = _formatted_plan(entry_queries["politeness_topk"](spark, SF_DIR))
    # Spark 4 WindowGroupLimit: partial top-k below the exchange, so the
    # full frontier is never sorted globally
    assert "WindowGroupLimit" in plan


def test_minhash_lsh_pairs_single_signature_chain(spark, entry_queries):
    plan = _formatted_plan(entry_queries["minhash_lsh_pairs"](spark, SF_DIR))
    # the signature chain is persisted: consumers read InMemoryTableScan
    # instead of recomputing the grams->minhash->band aggregation (without
    # the persist the plan shows zero cache scans and four copies of the
    # aggregation subtree — BENCH/PLANS.md fix 1)
    assert "InMemoryTableScan" in plan


def test_paragraph_dedup_single_chunk_explode(spark, entry_queries):
    plan = _formatted_plan(entry_queries["paragraph_dedup"](spark, SF_DIR))
    # chunk-hash occurrence table is persisted (BENCH/PLANS.md fix 4):
    # both the first-owner agg and the join probe read the cache
    assert "InMemoryTableScan" in plan


def test_ivf_ann_assignment_broadcasts_centroids(spark, entry_queries):
    plan = _formatted_plan(entry_queries["ivf_ann_topk"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sequence_packing_no_global_sort(spark, entry_queries):
    plan = _formatted_plan(entry_queries["sequence_packing"](spark, SF_DIR))
    # the running offset windows per shard: hash exchange, never a global
    # range sort (rangepartitioning = one sorted stream = one task at scale)
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(shard" in plan.lower()


def test_pii_and_sampling_are_shuffle_free(spark, entry_queries):
    # pure scan-side operators: no Exchange anywhere in the plan
    for name in ("pii_scan", "stratified_sample"):
        plan = _formatted_plan(entry_queries[name](spark, SF_DIR))
        assert "Exchange" not in plan, name


def test_repetition_stats_partial_aggregation(spark, entry_queries):
    plan = _formatted_plan(entry_queries["repetition_stats"](spark, SF_DIR))
    # both explode->agg chains map-side combine before their exchange
    assert plan.count("HashAggregate") >= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_topk_no_global_sort_and_broadcast_count(spark, entry_queries):
    """The per-doc top-k is a hash-partitioned window (never a
    rangepartitioning global sort), and the corpus doc count reaches the
    scoring join as a broadcast, not a shuffle."""
    plan = _formatted_plan(entry_queries["tfidf_topk"](spark, SF_DIR))
    assert "rangepartitioning" not in plan.lower()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_bm25_single_pass_no_explode(spark, entry_queries):
    """BM25 term counts are replace-length arithmetic inside the scan:
    no Generate (explode) anywhere, corpus stats broadcast back."""
    plan = _formatted_plan(entry_queries["bm25_score"](spark, SF_DIR))
    assert "Generate" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_revisit_schedule_single_shuffle(spark, entry_queries):
    """The lag window and the per-key rollup share one hash exchange on
    the key — the rollup reuses the window's partitioning."""
    plan = _formatted_plan(entry_queries["revisit_schedule"](spark, SF_DIR))
    assert plan.count("hashpartitioning(") == 1
    # the window sort is partition-local — no global sort exchange
    assert "rangepartitioning" not in plan.lower()


def test_pagerank_partial_agg_and_no_global_sort(spark, entry_queries):
    """Each iteration's contribution rollup is map-side combined (partial
    + final HashAggregate pairs) and nothing range-partitions — the
    iterate-join-aggregate chain must stay hash-exchange only."""
    plan = _formatted_plan(entry_queries["pagerank_hosts"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 6  # 3 iterations x partial/final
    assert "rangepartitioning" not in plan.lower()


def test_host_quality_filter_single_corpus_shuffle(spark, entry_queries):
    """Quality is a projection; the only corpus-wide exchange is the
    per-source rollup (host-cardinality output, broadcast back)."""
    plan = _formatted_plan(entry_queries["host_quality_filter"](spark, SF_DIR))
    assert plan.count("hashpartitioning(") <= 2
    assert "rangepartitioning" not in plan.lower()


def test_ccnet_buckets_no_corpus_sort(spark, entry_queries):
    """The per-language thirds come from a histogram + broadcast cutoffs —
    never a rangepartitioned per-language global sort of the corpus (which
    would put all of 'en' in one partition at 100 TB)."""
    plan = _formatted_plan(entry_queries["ccnet_buckets"](spark, SF_DIR))
    assert "rangepartitioning" not in plan.lower()
    # histogram aggregate + the lang window over the (lang, ppl_fp) histogram
    assert plan.count("hashpartitioning(") <= 2
    # per-lang cutoffs broadcast back onto the doc stream
    assert "BroadcastExchange" in plan


def test_dsir_weights_broadcast_weight_join(spark, entry_queries):
    """Feature counts collapse map-side into <=256 rows; the weight table
    broadcast-joins back; the only corpus shuffles are the counts aggregate
    and the per-doc rollup."""
    plan = _formatted_plan(entry_queries["dsir_weights"](spark, SF_DIR))
    assert plan.count("hashpartitioning(") <= 2
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan.lower()


def test_semantic_dedup_shares_assignment_and_no_global_sort(spark, entry_queries):
    """The cluster assignment is computed once (persisted — consumed by
    the GEMM tiler, the verify joins and the keep-flag join) and the pair
    search is cluster-keyed AND sub-blocked (the degenerate-cluster skew
    guard): no cartesian product, no rangepartitioning, and the tiled
    applyInPandas stage is present. The tiler + the two exact-verify
    joins + the keep-flag join bound the exchanges at 8 (was 5 before
    the skew guard — the three extra exchanges move tiny candidate-pair
    rows, the price of never building one quadratic task)."""
    plan = _formatted_plan(entry_queries["semantic_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan.lower()
    assert "InMemoryTableScan" in plan      # shared assignment subtree
    assert "FlatMapGroupsInPandas" in plan  # tiled GEMM candidate stage
    assert plan.count("hashpartitioning(") <= 8


def test_c4_and_gopher_are_shuffle_free(spark, entry_queries):
    """Both cleaning rule sets run as single projections — the line/word
    arrays live and die inside the row (higher-order functions, no
    explode, no Exchange anywhere)."""
    for name in ("c4_line_filter", "gopher_rules"):
        plan = _formatted_plan(entry_queries[name](spark, SF_DIR))
        assert "Exchange" not in plan, name
        assert "Generate" not in plan, name  # no explode


def test_surt_index_is_shuffle_free(spark, entry_queries):
    """The SURT/CDX key is pure string codegen over the scan — no
    Exchange, no explode, no Python."""
    plan = _formatted_plan(entry_queries["surt_index"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_line_dedup_no_global_sort_and_shared_explode(spark, entry_queries):
    """Line reassembly sorts inside the doc row (array_sort), never via a
    rangepartitioning; the line-occurrence explode is persisted — both the
    frequency agg and the join-back read the cache."""
    plan = _formatted_plan(entry_queries["line_dedup"](spark, SF_DIR))
    assert "rangepartitioning" not in plan.lower()
    assert "InMemoryTableScan" in plan


def test_incremental_dedup_semi_probe_no_self_pairs(spark, entry_queries):
    """The cross-snapshot probe is a LEFT SEMI membership join on band
    keys — no pair self-join of the new batch, no cartesian, no sort."""
    plan = _formatted_plan(entry_queries["incremental_dedup"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_kmeans_assignment_is_shuffle_free(spark, entry_queries):
    """Centroids are broadcast as literals, so the returned assignment is
    a pure projection over the cached quantized vectors: zero Exchanges,
    zero joins (the update shuffles happened inside the training loop)."""
    plan = _formatted_plan(entry_queries["kmeans_clusters"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "InMemoryTableScan" in plan


def test_unicode_clean_single_arrow_stage_no_shuffle(spark, entry_queries):
    """The cleanup pass is one Arrow-batched Python map stage fused with
    the scan: no Exchange, no per-row Python (no BatchEvalPython)."""
    plan = _formatted_plan(entry_queries["unicode_clean"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time path forbidden


def test_cdc_chunks_fold_in_codegen_no_window(spark, entry_queries):
    """Chunk construction is a sequential ``aggregate`` fold inside the
    scan's codegen — the only explode is of the already-built chunk array,
    and ownership/join-back are hash-keyed on the uniform md5 fp: no
    window, no global sort, no nested-loop join."""
    plan = _formatted_plan(entry_queries["cdc_chunks"](spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan.lower()
    assert "NestedLoop" not in plan
    # ownership count and the occurrence side meet in a hash join on fp
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or (
        "SortMergeJoin" in plan
    )


def test_postings_topk_partial_agg_and_group_limit(spark, entry_queries):
    """One token explode feeds the (term, doc) tf aggregate with map-side
    partial combine; the impact-ordered prefix prunes below the exchange
    via WindowGroupLimit instead of sorting whole posting lists."""
    plan = _formatted_plan(entry_queries["postings_topk"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2  # partial + final tf combine
    assert "WindowGroupLimit" in plan  # per-term top-k pruned pre-shuffle
    assert "rangepartitioning" not in plan.lower()  # never a global sort


def test_crawl_diff_single_join_no_sort(spark, entry_queries):
    """Fingerprints are scan-side projections; the classifier is one
    full-outer join on the id — no window, no rangepartitioning."""
    plan = _formatted_plan(entry_queries["crawl_diff"](spark, SF_DIR))
    assert "FullOuter" in plan
    assert "rangepartitioning" not in plan.lower()
    assert "Window" not in plan


def test_event_asof_single_window_no_join(spark, entry_queries):
    """As-of join is the union-tag + running-window shape: ONE exchange
    for the per-key window, NO join operator of any kind — the naive
    theta-join (r.ts <= l.ts) would be a BroadcastNestedLoopJoin."""
    plan = _formatted_plan(entry_queries["event_asof"](spark, SF_DIR))
    assert "Join" not in plan  # matches every join flavor
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()  # no global sort


def test_range_week_join_hash_join_no_nested_loop(spark, entry_queries):
    """The point-in-interval join runs as an equi-join on the week
    bucket (hash join; AQE picks broadcast vs shuffled) with the exact
    range predicate applied at the join — never a nested loop over the
    cross product."""
    plan = _formatted_plan(entry_queries["range_week_join"](spark, SF_DIR))
    assert "NestedLoop" not in plan
    assert (
        "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
        or "SortMergeJoin" in plan
    )


def test_rollup_timegrain_one_expand_one_agg_chain(spark, entry_queries):
    """Both grains come from ONE GROUPING SETS pass: a single Expand
    feeding one partial+final hash-aggregate chain — one scan and one
    exchange for all grains, not one per grain."""
    import re

    plan = _formatted_plan(entry_queries["rollup_timegrain"](spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
    assert "HashAggregate" in plan
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1  # one for all grains


def test_kmv_distinct_no_join_no_global_sort(spark, entry_queries):
    """The sketch's exact count rides the same window pass as the
    k-smallest frontier (count(*) == max rank), so there is no second
    scan and no join; the only sort is per-group inside the window."""
    plan = _formatted_plan(entry_queries["kmv_distinct"](spark, SF_DIR))
    assert "Join" not in plan
    assert "rangepartitioning" not in plan.lower()
    assert "Window" in plan


def test_host_split_single_agg_no_shuffle_beyond_groupby(spark, entry_queries):
    """Split assignment is a hash over the unit aggregate's own key:
    one map-side-combined group-by, no window, no join."""
    plan = _formatted_plan(entry_queries["host_split"](spark, SF_DIR))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
