"""Training-data operator tests: ANN recall vs the exact baseline,
near-dup pair semantics, winnowing guarantees, blocked-GEMM correctness."""

import math
import random

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_lsh_ann_recall(spark, emb):
    from crawler_spark.textops.similarity import brute_force_topk, lsh_topk

    rng = random.Random(7)
    bands = [[[rng.gauss(0, 1) for _ in range(64)] for _ in range(3)] for _ in range(6)]
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_topk(emb, q, k=10))
    approx = _topk_sets(lsh_topk(emb, q, bands, k=10))
    # OR-amplified: 6 bands x 3 planes; weakly-similar corpus (max cos ~.5)
    # still needs recall well above the 2% chance floor
    hits = sum(len(exact[k] & approx.get(k, set())) for k in exact)
    total = sum(len(exact[k]) for k in exact)
    assert hits / total >= 0.5, f"LSH recall {hits}/{total} below sanity floor"


def test_ivf_ann_recall_and_shape(spark, emb):
    from crawler_spark.textops.similarity import brute_force_topk, ivf_topk

    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(brute_force_topk(emb, q, k=10))
    approx = ivf_topk(emb, q, n_centroids=8, n_probe=4, k=10)
    rows = approx.collect()
    # ranks dense per query, starting at 1
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    got = _topk_sets(approx)
    hits = sum(len(exact[k] & got.get(k, set())) for k in exact)
    total = sum(len(exact[k]) for k in exact)
    assert hits / total >= 0.3, f"IVF recall {hits}/{total} below sanity floor"


def test_ivf_probe_all_equals_exact(spark, emb):
    """n_probe == n_centroids probes every inverted list -> exact top-k."""
    from crawler_spark.textops.similarity import brute_force_topk, ivf_topk

    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_topk(emb, q, k=5))
    full = _topk_sets(ivf_topk(emb, q, n_centroids=4, n_probe=4, k=5))
    assert exact == full


def test_cosine_dup_pairs_matches_naive(spark, emb):
    from crawler_spark.textops.similarity import cosine_dup_pairs

    got = {
        (r.id_a, r.id_b): r.cos_bp
        for r in cosine_dup_pairs(emb, threshold=0.45, n_blocks=4).collect()
    }
    # naive reference in python — same sequential-fold + fixed-point rule
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    ids = sorted(vecs)
    want = {}
    for i, a in enumerate(ids):
        va = vecs[a]
        na = math.sqrt(sum(x * x for x in va))
        for b in ids[i + 1:]:
            vb = vecs[b]
            nb = math.sqrt(sum(x * x for x in vb))
            cos_bp = math.floor(
                sum(x * y for x, y in zip(va, vb)) / (na * nb) * 10_000 + 0.5
            )
            if cos_bp >= 4500:
                want[(a, b)] = cos_bp
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1


def test_cosine_dup_pairs_lsh_subset(spark, emb):
    """LSH-candidate variant returns a subset of the exact pairs (it can
    miss, never invent — every candidate is exactly verified)."""
    from crawler_spark.textops.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_lsh,
    )

    rng = random.Random(11)
    bands = [[[rng.gauss(0, 1) for _ in range(64)] for _ in range(3)] for _ in range(4)]
    exact = {(r.id_a, r.id_b) for r in cosine_dup_pairs(emb, threshold=0.4).collect()}
    approx = {(r.id_a, r.id_b) for r in cosine_dup_pairs_lsh(emb, bands, threshold=0.4).collect()}
    assert approx <= exact
    assert len(approx) >= 1  # 4 bands x 3 planes should catch some


def test_simhash_hamming_pairs(spark):
    from crawler_spark.textops.dedup import simhash, simhash_hamming_pairs

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
            (3, "alpha beta gamma delta epsilon eta"),    # near dup
            (4, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_hamming_pairs(df, max_dist=3).collect()}
    assert pairs.get((1, 2)) == 0
    # verify every reported distance against exact popcount of the simhashes
    sh = {r.doc_id: r.simhash for r in simhash(df).collect()}
    for (a, b), d in pairs.items():
        assert bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") == d


def test_winnowing_guarantee(spark):
    """Winnowing guarantee: two docs sharing a substring of length
    >= k + w - 1 share at least one fingerprint."""
    from crawler_spark.textops.textstats import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"  # len 43 >= 8+4-1
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "other start " + shared + " different end"),
            (3, "no overlap with anything else at all ok"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(df, k=8, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert len(fps[3]) > 0


def test_ngram_jaccard_bounds(spark, docs):
    from crawler_spark.textops.dedup import ngram_jaccard_pairs

    rows = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert len(rows) > 0  # the synthetic corpus contains near-dup docs
    for r in rows:
        assert 0.5 <= r.jaccard <= 1.0
        assert r.id_a < r.id_b


def test_frame_sample_stub(spark):
    from crawler_spark.textops.multimodal import frame_sample_stub

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 250)), (2, bytearray(b"y" * 5))],
        "asset_id long, payload binary",
    )
    got = {(r.asset_id, r.frame_idx) for r in frame_sample_stub(df, every_n=10).collect()}
    # asset 1: 250 bytes -> 3 fake frames -> sampled {0}; asset 2: 1 frame
    assert (1, 0) in got and (2, 0) in got
    df2 = spark.createDataFrame([(3, bytearray(b"z" * 10050))], "asset_id long, payload binary")
    got2 = sorted(r.frame_idx for r in frame_sample_stub(df2, every_n=10).collect())
    assert got2 == list(range(0, 101, 10))


def test_minhash_megabucket_no_quadratic_blowup(spark):
    """1,000 identical docs land in one (band, band_key) bucket per band;
    the bucket cap must emit star edges (N-1 pairs keeping the duplicate
    cluster connected), never the ~500k all-pairs rows."""
    from crawler_spark.textops.dedup import minhash_lsh_pairs

    rows = [(i, "boiler plate text that repeats verbatim on every page") for i in range(1000)]
    # fully-disjoint shingle sets: J=0, so NO family may band-collide them
    # (earlier texts shared 40% of their shingles, which pinned the hash
    # constants' luck, not the operator — J=0.4 docs MAY legitimately pair)
    rows += [
        (10_000 + i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, max_bucket=64).collect()
    boiler = [p for p in pairs if p.id_a < 1000 and p.id_b < 1000]
    # star edges: every dup doc links to the representative (min id = 0)
    assert len(boiler) == 999
    assert all(p.id_a == 0 for p in boiler)
    assert {p.id_b for p in boiler} == set(range(1, 1000))
    # small-bucket path still exact all-pairs: no unique-doc false pairs
    uniq = [p for p in pairs if p.id_a >= 1000]
    assert uniq == []


def test_minhash_small_buckets_unchanged_by_cap(spark):
    """With no mega-buckets the capped operator equals the naive all-pairs
    band join."""
    from crawler_spark.textops.dedup import minhash_lsh_pairs

    rows = [(i, f"doc {i % 7} shared shingle stream alpha beta gamma") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {(p.id_a, p.id_b) for p in minhash_lsh_pairs(df, max_bucket=64).collect()}
    uncapped = {(p.id_a, p.id_b) for p in minhash_lsh_pairs(df, max_bucket=10**9).collect()}
    assert capped == uncapped and len(capped) > 0


def test_score_with_model_pluggable(spark, docs):
    """The mapInPandas model-scorer hook: per-partition model load, Arrow
    batch scoring (deterministic fake model standing in for fastText)."""
    import pandas as pd

    from crawler_spark.textops.textstats import score_with_model

    def factory():
        return {"weights": 0.5}  # stands in for loading a .bin model

    def scorer(model, texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({
            "model_quality": texts.str.len() * model["weights"],
            "model_lang": texts.str.contains(" the ").map({True: "en", False: "other"}),
        })

    out = score_with_model(
        docs, factory, "doc_id long, model_quality double, model_lang string",
        batch_scorer=scorer,
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()
    one = docs.limit(1).collect()[0]
    assert rows[one.doc_id].model_quality == len(one.text) * 0.5


def test_chunk_dedup_keep_first(spark):
    from crawler_spark.textops.dedup import chunk_dedup

    # chunk_tokens=2: doc 0 = [a b][c d], doc 1 = [a b][a b], doc 2 = [c d][x]
    rows = [
        (0, "a b c d"),
        (1, "a b a b"),
        (2, "c d x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in chunk_dedup(df, chunk_tokens=2).collect()}
    # doc 0 owns both chunks (first occurrence)
    assert (out[0].n_chunks, out[0].n_dup_chunks) == (2, 0)
    # doc 1: both chunks duplicate "a b" (one of doc 0, one within-doc)
    assert (out[1].n_chunks, out[1].n_dup_chunks) == (2, 2)
    assert out[1].dup_ratio == 1.0
    # doc 2: "c d" duplicates doc 0's second chunk; trailing "x" is unique
    assert (out[2].n_chunks, out[2].n_dup_chunks) == (2, 1)
    assert out[2].dup_ratio == 0.5


def test_dup_clusters_matches_union_find(spark):
    from crawler_spark.textops.dedup import dup_clusters

    # 5-node chain (worst case for naive label chasing), triangle, pair,
    # duplicate + self edges for robustness
    pairs = [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11), (11, 12), (10, 12),
             (20, 21), (2, 1), (7, 7)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    out = {r.node: r.cluster for r in dup_clusters(df).collect()}

    # union-find reference (union-by-min → root IS the component minimum)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    assert out == expect


def test_dup_cluster_assign_canonicals(spark):
    from crawler_spark.textops.dedup import dup_cluster_assign

    texts = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "totally different words here entirely unrelated"),
        (4, "alpha beta gamma delta epsilon zeta"),  # another dup
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dup_cluster_assign(df).collect()
    }
    assert len(out) == 4
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (3, True)
    assert out[4] == (1, False)


def test_dedup_keep_best_quality_argmax(spark):
    from crawler_spark.textops.dedup import dedup_keep_best

    # cluster {1,2,4} (exact dups), singleton 3; external quality ranks 4 top
    texts = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "totally different words here entirely unrelated"),
        (4, "alpha beta gamma delta epsilon zeta"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.1), (4, 0.9)], ["doc_id", "quality"]
    )
    out = {r.doc_id: r for r in dedup_keep_best(df, quality=quality).collect()}
    assert len(out) == 4
    # tie at 0.9 between 2 and 4 → smaller id kept
    assert [out[i].keep for i in (1, 2, 3, 4)] == [False, True, True, False]
    assert {out[i].cluster_id for i in (1, 2, 4)} == {1}
    assert out[3].cluster_id == 3


def test_rare_token_stats_hand_computed(spark):
    from crawler_spark.textops.textstats import rare_token_stats

    # corpus TF: the=3, cat=2, sat=2, qzx=1, wvu=1, dog=1
    texts = [
        (1, "the cat sat"),
        (2, "the cat sat"),
        (3, "the qzx wvu dog"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {r.doc_id: r for r in rare_token_stats(df, rare_max_tf=2).collect()}
    # docs 1/2: cat(2) and sat(2) are rare at max_tf=2, the(3) is not
    assert (out[1].n_tokens, out[1].n_rare, out[1].rare_ratio) == (3, 2, 0.6667)
    assert (out[2].n_tokens, out[2].n_rare, out[2].rare_ratio) == (3, 2, 0.6667)
    # doc 3: qzx, wvu, dog each tf=1 → 3 of 4 rare
    assert (out[3].n_tokens, out[3].n_rare, out[3].rare_ratio) == (4, 3, 0.75)


def test_tfidf_topk_hand_computed(spark):
    from crawler_spark.textops.ranking import tfidf_topk

    # 'rare' appears only in doc 1 → highest idf there; 'the' is in every
    # doc → lowest idf
    texts = [
        (1, "the rare rare word"),
        (2, "the common word"),
        (3, "the common word"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.rnk)
    assert len(by_doc[1]) == 2 and all(len(v) <= 2 for v in by_doc.values())
    # doc 1 top term is 'rare' (tf=2, df=1 → idf = ln(4/2)+1)
    top = by_doc[1][0]
    assert top.tok == "rare" and top.tf == 2
    assert abs(top.score - 2 * (math.log(4 / 2) + 1)) < 1e-3
    # 'the' (df=3 → idf = ln(4/4)+1 = 1.0) scores exactly 1.0 everywhere
    the_rows = [r for r in out if r.tok == "the"]
    assert the_rows and all(r.score == 1.0 for r in the_rows)
    # ranks are 1..k with deterministic tie-break
    assert [r.rnk for r in by_doc[2]] == [1, 2]


def test_bm25_monotonic_in_tf_and_zero_when_absent(spark):
    from crawler_spark.textops.ranking import bm25_score

    texts = [
        (1, "spark spark spark filler filler filler"),
        (2, "spark filler filler filler filler filler"),
        (3, "filler filler filler filler filler filler"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {r.doc_id: r for r in bm25_score(df, terms=["spark"]).collect()}
    # doc 3 has no query term → filtered out; equal doc lengths → more
    # tf strictly wins
    assert set(out) == {1, 2}
    assert out[1].bm25 > out[2].bm25 > 0
    assert out[1].dl == 6


def test_bm25_length_normalization(spark):
    from crawler_spark.textops.ranking import bm25_score

    # same tf=1, shorter doc must score higher (b=0.75 length penalty)
    texts = [
        (1, "spark filler"),
        (2, "spark filler filler filler filler filler filler filler"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {r.doc_id: r for r in bm25_score(df, terms=["spark"]).collect()}
    assert out[1].bm25 > out[2].bm25


def test_bm25_plan_is_single_pass(spark):
    """No explode/generate and no per-doc shuffle: the only exchange in
    the plan feeds the 1-row corpus-stats aggregate + its broadcast
    back onto the scan."""
    from crawler_spark.textops.ranking import bm25_score

    df = spark.createDataFrame([(1, "spark a")], ["doc_id", "text"])
    plan = bm25_score(df, terms=["spark", "merge"])._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no explode
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_duplicated_span_stats_values(spark):
    """Hand-computed span-window duplication: cross-doc shared runs and
    within-doc repetition both count; unique docs score 0."""
    from crawler_spark.textops.dedup import duplicated_span_stats

    rows = [
        (1, "a b c d e f"),            # windows: abc bcd cde def
        (2, "x y a b c d q"),          # shares abc, bcd with doc 1
        (3, "m n o p"),                # unique
        (4, "r s t r s t r s t"),      # pure self-repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicated_span_stats(df, span=3).collect()}
    assert (out[1]["n_windows"], out[1]["n_dup_windows"], out[1]["dup_ratio"]) == (4, 2, 0.5)
    assert (out[2]["n_windows"], out[2]["n_dup_windows"], out[2]["dup_ratio"]) == (5, 2, 0.4)
    assert (out[3]["n_windows"], out[3]["n_dup_windows"], out[3]["dup_ratio"]) == (2, 0, 0.0)
    assert (out[4]["n_windows"], out[4]["n_dup_windows"], out[4]["dup_ratio"]) == (7, 7, 1.0)


def test_duplicated_span_short_doc_whole_text_window(spark):
    # docs shorter than the span hash as one whole-text window
    from crawler_spark.textops.dedup import duplicated_span_stats

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "other")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicated_span_stats(df, span=8).collect()}
    assert out[1]["dup_ratio"] == out[2]["dup_ratio"] == 1.0
    assert out[3]["dup_ratio"] == 0.0


def test_semantic_dedup_prunes_within_cluster_only(spark):
    """SemDeDup: near-dups sharing a cluster collapse to the lowest id;
    an equally-similar pair SPLIT across clusters survives (the paper's
    deliberate trade — the cluster partition bounds the pair search)."""
    from crawler_spark.textops.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),      # centroid 1
        (2, [0.0, 1.0, 0.0]),      # centroid 2
        (3, [0.999, 0.01, 0.0]),   # cluster 1, cos(1,3)~1.0   -> pruned
        (4, [0.1, 0.995, 0.0]),    # cluster 2, cos(2,4)~0.995 -> pruned
        (5, [0.0, 0.0, 1.0]),      # orthogonal, no near pair  -> kept
        (6, [0.72, 0.69, 0.0]),    # cluster 1 \ cos(6,7)~0.999 but split
        (7, [0.69, 0.72, 0.0]),    # cluster 2 /  across clusters -> both kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, n_centroids=2, threshold=0.99).collect()}

    assert len(out) == 7           # one row per vector, keep flag not a drop
    assert {v for v, r in out.items() if not r["keep"]} == {3, 4}
    assert out[3]["cent_id"] == 1 and out[4]["cent_id"] == 2
    assert out[6]["cent_id"] == 1 and out[7]["cent_id"] == 2
    assert out[6]["keep"] and out[7]["keep"]


def test_semantic_dedup_degenerate_cluster_no_quadratic_blowup(spark):
    """1,000 identical embeddings collapse the space into ONE cluster; the
    tiled witness-mode pair search must (a) still collapse them to the
    lowest id exactly, and (b) emit ~linear candidates, never the ~500k
    all-pairs rows (the semantic analog of the minhash mega-bucket cap)."""
    from pyspark.sql import functions as F

    from crawler_spark.textops.similarity import (
        _gemm_candidate_pairs,
        semantic_dedup,
    )

    rows = [(i, [0.6, 0.8, 0.0]) for i in range(1000)]
    rows += [(10_000, [1.0, 0.0, 0.0]), (10_001, [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {r["vec_id"]: r for r in
           semantic_dedup(df, n_centroids=2, threshold=0.99).collect()}
    assert len(out) == 1002
    kept = {v for v, r in out.items() if r["keep"]}
    assert 0 in kept and not any(i in kept for i in range(1, 1000))

    # linear candidate bound: each id contributes at most n_blocks witness
    # rows (one per tile) — nowhere near the 999*1000/2 all-pairs count
    n_blocks = 8
    cands = _gemm_candidate_pairs(
        df.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        0.99, n_blocks, witness_only=True,
    ).count()
    assert cands <= 1002 * n_blocks
    assert cands < 50_000  # vs ~500k unsalted


def test_incremental_dedup_flags_cross_snapshot_near_dups(spark):
    from crawler_spark.textops.dedup import incremental_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    index = spark.createDataFrame(
        [(1, base), (2, "completely different indexed content about spark engines")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base),  # exact dup of indexed doc 1
            (101, base + " again"),  # near dup: shares most shingles
            (102, "entirely novel text about distributed archive formats and parquet"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["novel"] for r in incremental_dedup(new, index).collect()}
    assert out[100] is False
    assert out[101] is False
    assert out[102] is True
    assert set(out) == {100, 101, 102}  # index docs never appear


def test_kmeans_lloyd_separates_blobs_and_is_partitioning_invariant(spark):
    from crawler_spark.textops.similarity import kmeans_lloyd

    # two tight 4-d blobs around +0.4 and -0.4; k=2 must split them
    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        rows.append((i, [0.4 + eps, 0.4, 0.4 - eps, 0.4]))
        rows.append((100 + i, [-0.4 - eps, -0.4, -0.4 + eps, -0.4]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["cluster"] for r in kmeans_lloyd(df, k=2, iters=2).collect()}
    pos = {out[i] for i in range(20)}
    neg = {out[100 + i] for i in range(20)}
    assert len(pos) == 1 and len(neg) == 1 and pos != neg

    # integer fixed point: identical assignment under any partitioning
    out2 = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_lloyd(df.repartition(7), k=2, iters=2).collect()
    }
    assert out == out2


def test_semantic_dedup_with_trained_kmeans_centroids(spark):
    from crawler_spark.textops.similarity import kmeans_centroids, semantic_dedup

    rows = []
    for i in range(10):
        rows.append((i, [0.4, 0.4, 0.4, 0.4]))          # one tight dup blob
        rows.append((100 + i, [-0.4 + i * 0.05, 0.3, -0.2, 0.1]))  # spread
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids(df, k=2, iters=2)
    assert cents.count() == 2 and cents.columns == ["cent_id", "cent_vec"]
    out = semantic_dedup(df, threshold=0.999, centroids=cents)
    kept = {r["vec_id"]: r["keep"] for r in out.collect()}
    # identical blob collapses to its lowest id under the trained partition
    assert kept[0] is True
    assert all(kept[i] is False for i in range(1, 10))
    assert len(kept) == 20


def test_unicode_clean_nfc_controls_whitespace(spark):
    from crawler_spark.textops.textstats import unicode_clean

    df = spark.createDataFrame(
        [
            (1, "cafe\u0301 au lait"),  # decomposed e + combining acute
            (2, "bell\u0007 and\ttabs\n\nhere"),
            (3, "  padded   spaces  "),
            (4, "already clean"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unicode_clean(df).collect()}
    assert out[1]["clean_text"] == "caf\u00e9 au lait"  # precomposed
    assert out[1]["changed"] is True
    assert out[2]["clean_text"] == "bell and tabs here"
    assert out[3]["clean_text"] == "padded spaces"
    assert out[4]["clean_text"] == "already clean" and out[4]["changed"] is False
    assert out[5]["clean_text"] == ""


def test_incremental_dedup_with_stored_band_index(spark, tmp_path):
    from crawler_spark.textops.dedup import band_key_index, incremental_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    index = spark.createDataFrame(
        [(1, base), (2, "indexed corpus text about spark engines and tables")],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "band_index.parquet")
    band_key_index(index).write.parquet(idx_path)

    new = spark.createDataFrame(
        [(100, base), (101, "wholly novel text on parquet archive formats")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["novel"]
        for r in incremental_dedup(
            new, index_keys=spark.read.parquet(idx_path)
        ).collect()
    }
    assert out == {100: False, 101: True}


def test_chunk_dedup_clean_keep_first_reassembly(spark):
    from crawler_spark.textops.dedup import chunk_dedup_clean

    boiler = "b1 b2 b3 b4"  # one 4-token boilerplate chunk
    df = spark.createDataFrame(
        [
            (1, f"{boiler} u1 u2 u3 u4"),       # first owner of boiler
            (2, f"{boiler} v1 v2 v3 v4"),       # boiler stripped here
            (3, f"w1 w2 w3 w4 {boiler}"),       # and here (later position)
            (4, boiler),                          # all-boilerplate doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup_clean(df, chunk_tokens=4).collect()}
    assert out[1]["clean_text"] == f"{boiler} u1 u2 u3 u4"
    assert out[2]["clean_text"] == "v1 v2 v3 v4"
    assert out[3]["clean_text"] == "w1 w2 w3 w4"
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1


def test_cdc_chunks_shift_robust(spark):
    """The CDC property: a prefix insertion only perturbs chunks before
    the next cut point — every chunk after it keeps its fingerprint
    (fixed windows would all shift and nothing downstream would match)."""
    from crawler_spark.textops.dedup import cdc_chunks

    base = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, base), (2, "inserted " + base)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    shared = fps[1] & fps[2]
    # everything from the first post-insertion cut onward re-aligns:
    # all but at most one chunk of doc 1 is shared with doc 2
    assert len(shared) >= len(fps[1]) - 1 and len(shared) > 0
    # and the ownership column reports the collision corpus-wide
    assert all(r["n_owners"] == 2 for r in rows if r["fp"] in shared)


def test_cdc_chunks_partition_exact(spark):
    """Chunks tile the document exactly: token counts sum to the doc's
    token count and reassembling chunks in order reproduces the text."""
    from crawler_spark.textops.dedup import cdc_chunks

    text = " ".join(f"w{i % 37}" for i in range(123))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted(cdc_chunks(df).collect(), key=lambda r: r["chunk_idx"])
    assert sum(r["n_toks"] for r in rows) == 123
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))


def test_postings_topk_impact_order(spark):
    from crawler_spark.textops.ranking import postings_topk

    df = spark.createDataFrame(
        [
            (1, "a a a b"),
            (2, "a b b"),
            (3, "a"),
        ],
        "doc_id long, text string",
    )
    out = {r["tok"]: r for r in postings_topk(df, k=2).collect()}
    assert out["a"]["df_t"] == 3 and out["a"]["cf"] == 5
    # tf desc, doc asc; k=2 truncates doc 3
    assert out["a"]["postings"] == "1:3,2:1"
    assert out["b"]["postings"] == "2:2,1:1"


def test_containment_catches_quotes_jaccard_misses(spark):
    """A short doc quoted wholesale inside a much longer one: containment
    of the short side is ~100% while Jaccard is low (so minhash bands
    never collide it) — the asymmetric operator must surface the pair
    with the right direction."""
    from crawler_spark.textops.dedup import containment_pairs, minhash_lsh_pairs

    quote = " ".join(f"quoted sentence token{i} alpha beta" for i in range(4))
    long_doc = (
        " ".join(f"long document filler word{i} gamma delta" for i in range(40))
        + " " + quote + " "
        + " ".join(f"tail filler word{i} epsilon" for i in range(40))
    )
    others = [
        (100 + i, " ".join(f"unrelated u{i}w{j}" for j in range(30)))
        for i in range(5)
    ]
    df = spark.createDataFrame(
        [(1, quote), (2, long_doc)] + others, "doc_id long, text string"
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in containment_pairs(df, chunk_tokens=8).collect()
    }
    assert (1, 2) in rows
    r = rows[(1, 2)]
    # the quote's shingles are (almost) all inside the long doc; the
    # chunk-grain alignment loses at most the boundary shingles
    assert r.cont_a_bp > 9000
    # ...while the long doc is mostly NOT in the quote
    assert r.cont_b_bp < 4000
    # and Jaccard-banded LSH indeed never pairs them (low resemblance)
    lsh = {(p.id_a, p.id_b) for p in minhash_lsh_pairs(df).collect()}
    assert (1, 2) not in lsh


def test_containment_robust_to_unaligned_offsets(spark):
    """ADVICE r3: position-aligned fixed windows share zero fingerprints
    when the quote's offset is not ≡ 0 mod the window size (7/8 of
    offsets at the default 8). Candidates now come from content-defined
    cuts, so the SAME quote must be caught at every offset — including
    offsets coprime to 8."""
    from crawler_spark.textops.dedup import containment_pairs

    quote = " ".join(f"quoted sentence token{i} alpha beta" for i in range(8))
    rows_per_shift = {}
    for shift in (1, 3, 7):
        long_doc = (
            " ".join(f"pre filler w{j}" for j in range(shift)) + " "
            + quote + " "
            + " ".join(f"tail filler word{i} epsilon" for i in range(40))
        )
        df = spark.createDataFrame(
            [(1, quote), (2, long_doc)]
            + [(100 + i, " ".join(f"unrelated u{i}w{j}" for j in range(30)))
               for i in range(3)],
            "doc_id long, text string",
        )
        rows = {
            (r.id_a, r.id_b): r
            for r in containment_pairs(df, chunk_tokens=8).collect()
        }
        assert (1, 2) in rows, f"pair missed at offset {shift}"
        rows_per_shift[shift] = rows[(1, 2)]
    for shift, r in rows_per_shift.items():
        assert r.cont_a_bp > 9000, (shift, r)
        assert r.cont_b_bp < 5000, (shift, r)
    # unrelated docs never pair
    assert all(a in (1,) and b in (2,) for a, b in rows)
