"""Corpus-filter operator tests: Gopher-style repetition gates,
benchmark n-gram contamination, quantized-embedding dedup — small
constructed fixtures with hand-computed expected values (oracle parity
at sf0.01 is additionally enforced via the driver contract)."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_values(spark):
    from crawler_spark.textops.corpusfilter import repetition_stats

    df = _docs(
        spark,
        [
            (1, "a a a a b"),  # degenerate: one token dominates
            (2, "x"),  # single token, no bigrams
            (3, "the quick brown fox jumps over the lazy dog today"),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    r1 = out[1]
    assert r1["n_tokens"] == 5
    assert r1["distinct_ratio"] == 0.4
    assert r1["top_token_share"] == 0.8
    # bigrams: "a a" x3, "a b" x1 -> 3/4
    assert r1["top_bigram_share"] == 0.75
    assert r1["repetition_ok"] is False

    r2 = out[2]
    assert r2["n_tokens"] == 1
    assert r2["distinct_ratio"] == 1.0
    assert r2["top_bigram_share"] == 0.0
    assert r2["repetition_ok"] is False  # top_token_share 1.0 > 0.2

    r3 = out[3]
    assert r3["n_tokens"] == 10
    assert r3["distinct_ratio"] == 0.9
    assert r3["top_token_share"] == 0.2  # "the" x2 / 10
    assert r3["top_bigram_share"] == round(1 / 9, 4)
    assert r3["repetition_ok"] is True


def test_contamination_flags_copied_benchmark_text(spark):
    from crawler_spark.textops.corpusfilter import contamination_check

    bench_text = " ".join(f"w{i}" for i in range(12))  # doc 0 = benchmark
    clean_text = " ".join(f"z{i}" for i in range(12))
    half = " ".join(f"w{i}" for i in range(8)) + " " + " ".join(
        f"q{i}" for i in range(8)
    )
    df = _docs(spark, [(0, bench_text), (1, bench_text), (2, clean_text), (3, half)])
    out = {r["doc_id"]: r for r in contamination_check(df).collect()}

    assert 0 not in out  # benchmark docs excluded from the output
    assert out[1]["contamination_ratio"] == 1.0 and out[1]["contaminated"] is True
    assert out[2]["n_hits"] == 0 and out[2]["contaminated"] is False
    # doc 3 shares exactly one 8-gram (w0..w7) with the benchmark
    assert out[3]["n_hits"] == 1
    assert out[3]["n_grams"] == 9  # 16 tokens -> 9 distinct 8-grams
    assert out[3]["contaminated"] is True  # 0.1 >= flag_ratio 0.1


def test_contamination_short_doc_whole_text_gram(spark):
    from crawler_spark.textops.corpusfilter import contamination_check

    # doc 0 (benchmark) is shorter than the gram size -> whole-text gram;
    # doc 5 repeats it verbatim, doc 6 embeds it inside a longer doc
    # (NOT a hit: whole-text gram != any 8-gram of doc 6)
    df = _docs(spark, [(0, "tiny doc"), (5, "tiny doc"), (6, "tiny doc " * 10 + "end")])
    out = {r["doc_id"]: r for r in contamination_check(df).collect()}
    assert out[5]["n_hits"] == 1 and out[5]["contaminated"] is True
    assert out[6]["n_hits"] == 0


def test_embedding_dedup_groups(spark):
    from crawler_spark.textops.corpusfilter import embedding_dedup

    df = spark.createDataFrame(
        [
            (1, [0.11, 0.19]),
            (2, [0.12, 0.15]),  # same 0.1-cell as vec 1
            (3, [0.31, 0.19]),
            (4, [-0.01, 0.19]),  # floor(-0.1) = -1: sign preserved
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in embedding_dedup(df).collect()}
    assert out[1]["fp"] == out[2]["fp"]
    assert out[1]["group_size"] == 2 and out[2]["group_size"] == 2
    assert out[1]["is_canonical"] is True and out[2]["is_canonical"] is False
    assert out[3]["group_size"] == 1 and out[3]["is_canonical"] is True
    assert out[4]["fp"] != out[1]["fp"]


def test_pii_scan_counts_and_redaction(spark):
    from crawler_spark.textops.corpusfilter import pii_scan

    df = _docs(
        spark,
        [
            (1, "contact alice@example.com or bob@test.org now"),
            (2, "call 555-123-4567 from 10.0.0.1 today"),
            (3, "clean text with no identifiers at all"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_pii"] == 2 and out[1]["has_pii"] is True
    assert out[2]["n_phone"] == 1 and out[2]["n_ipv4"] == 1
    # "call <PII> from <PII> today" = 25 chars
    assert out[2]["redacted_len"] == len("call <PII> from <PII> today")
    assert out[3]["has_pii"] is False
    assert out[3]["redacted_len"] == len("clean text with no identifiers at all")


def test_sequence_packing_offsets(spark):
    from crawler_spark.textops.corpusfilter import sequence_packing

    # one shard (n_shards=1): docs of 3/4/5 tokens, budget 6
    df = _docs(spark, [(1, "a b c"), (2, "d e f g"), (3, "h i j k l")])
    out = {
        r["doc_id"]: r
        for r in sequence_packing(df, budget=6, n_shards=1).collect()
    }
    assert out[1]["pack_id"] == 0 and out[1]["offset_in_pack"] == 0
    assert out[2]["pack_id"] == 0 and out[2]["offset_in_pack"] == 3  # straddles
    assert out[3]["pack_id"] == 1 and out[3]["offset_in_pack"] == 1
    # sharded: same docs land in distinct shards, each packs from 0
    sharded = {
        r["doc_id"]: r
        for r in sequence_packing(df, budget=6, n_shards=3).collect()
    }
    assert all(r["offset_in_pack"] == 0 for r in sharded.values())
    assert len({r["shard"] for r in sharded.values()}) == 3


def test_stratified_sample_deterministic_and_rate(spark):
    from crawler_spark.textops.corpusfilter import stratified_sample

    rows = [(i, "x", "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_sample(df, rates={"en": "80"})
    got = sorted(r["doc_id"] for r in out.collect())
    again = sorted(r["doc_id"] for r in stratified_sample(df, rates={"en": "80"}).collect())
    assert got == again  # reproducible: pure hash gate, no RNG
    assert all(i % 2 == 0 for i in got)  # zh (unlisted) fully dropped
    # '80'/256 = 50% of the 1000 en docs, binomial 3-sigma ~ +/-47
    assert 400 <= len(got) <= 600


def test_repetition_plan_stays_jvm_side(spark):
    """No Python UDFs in the repetition plan: explode/agg only."""
    from crawler_spark.textops.corpusfilter import repetition_stats

    df = _docs(spark, [(1, "a b c")])
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_pipeline_composes_gates(spark):
    from crawler_spark.textops.corpusfilter import corpus_pipeline

    good = " ".join(f"tok{i}" for i in range(40))  # 40 unique tokens, >100 chars
    # doc 0 (benchmark, id % 97 == 0) carries the good text -> doc 194
    # copying it is contaminated; doc 1 is an exact near-dup cluster-mate
    # of doc 98 (keep-best prunes one); doc 2 is pure repetition; doc 3 is
    # too short (fails the quality length gate and the repetition gate)
    other = " ".join(f"w{i}" for i in range(40))
    df = _docs(
        spark,
        [
            (0, good),
            (1, other),
            (98, other),
            (194, good),
            (2, "spam " * 40),
            (3, "the a and"),
        ],
    )
    out = {r["doc_id"]: r for r in corpus_pipeline(df, n_shards=1).collect()}
    assert 0 not in out  # benchmark doc excluded
    assert 194 not in out  # contaminated copy of the benchmark
    assert 2 not in out  # repetition gate
    assert 3 not in out  # quality length gate
    # exactly one of the near-dup pair survives (keep-best)
    assert len({1, 98} & set(out)) == 1
    survivor = ({1, 98} & set(out)).pop()
    assert out[survivor]["pack_id"] == 0 and out[survivor]["offset_in_pack"] == 0


def test_bpe_token_stats_values(spark):
    from crawler_spark.textops.corpusfilter import bpe_token_stats

    df = _docs(spark, [(1, "hello world"), (2, "it's 42 C!"), (3, "word")])
    out = {r["doc_id"]: r for r in bpe_token_stats(df).collect()}
    # "hello world" -> [hello][ ][world] = 3 pieces, 2 ws tokens
    assert out[1]["n_ws_tokens"] == 2 and out[1]["n_bpe_pieces"] == 3
    # "it's 42 C!" -> [it]['][s][ ][4][2][ ][C][!] = 9 pieces
    assert out[2]["n_bpe_pieces"] == 9 and out[2]["n_ws_tokens"] == 3
    assert out[2]["est_tokens_c4"] == 2.5  # 10 chars / 4
    assert out[3]["n_bpe_pieces"] == 1 and out[3]["pieces_per_word"] == 1.0


def test_sequence_packing_matches_python_reference(spark):
    """Randomized corpus: pack placement must equal a pure-Python running
    simulation of the token stream per shard (budget/shard invariants)."""
    import random

    from crawler_spark.textops.corpusfilter import sequence_packing

    rng = random.Random(17)
    rows = [
        (i, " ".join("t%d" % rng.randrange(50)
                      for _ in range(rng.randrange(1, 60))))
        for i in range(200)
    ]
    budget, shards = 37, 7
    out = {
        r["doc_id"]: r
        for r in sequence_packing(
            _docs(spark, rows), budget=budget, n_shards=shards
        ).collect()
    }
    cum = {}
    for i, text in rows:  # rows are doc_id-ordered
        sh = i % shards
        start = cum.get(sh, 0)
        n = len(text.split(" "))
        r = out[i]
        assert (r["shard"], r["n_tokens"]) == (sh, n)
        assert r["pack_id"] == start // budget
        assert r["offset_in_pack"] == start % budget
        assert 0 <= r["offset_in_pack"] < budget
        cum[sh] = start + n


def test_contamination_external_benchmark_file(spark, tmp_path):
    from crawler_spark.textops.corpusfilter import (
        benchmark_from_file,
        contamination_check,
    )

    bench_text = " ".join(f"w{i}" for i in range(12))
    clean_text = " ".join(f"z{i}" for i in range(12))
    bench_file = tmp_path / "evals.txt"
    bench_file.write_text(bench_text + "\n\n" + "other eval item\n")
    bench = benchmark_from_file(spark, str(bench_file))
    assert bench.count() == 2  # blank line dropped

    # with an external benchmark, EVERY corpus doc is scored (no carve-out)
    df = _docs(spark, [(0, bench_text), (1, clean_text)])
    out = {r["doc_id"]: r for r in contamination_check(df, benchmark=bench).collect()}
    assert set(out) == {0, 1}
    assert out[0]["contamination_ratio"] == 1.0 and out[0]["contaminated"] is True
    assert out[1]["n_hits"] == 0 and out[1]["contaminated"] is False


def test_contamination_jsonl_benchmark(spark, tmp_path):
    import json

    from crawler_spark.textops.corpusfilter import (
        benchmark_from_file,
        contamination_check,
    )

    items = [{"text": "alpha beta gamma"}, {"text": "delta epsilon zeta"}]
    bench_file = tmp_path / "evals.jsonl"
    bench_file.write_text("\n".join(json.dumps(i) for i in items))
    bench = benchmark_from_file(spark, str(bench_file))

    df = _docs(spark, [(10, "alpha beta gamma"), (11, "unrelated words here")])
    out = {r["doc_id"]: r for r in contamination_check(df, benchmark=bench).collect()}
    assert out[10]["contaminated"] is True
    assert out[11]["contaminated"] is False


def test_corpus_mix_sqrt_weights(spark):
    import math

    from crawler_spark.textops.corpusfilter import corpus_mix_report

    rows = [
        (1, "a b c", "en", "web"), (2, "d e", "en", "web"),
        (3, "f g h i", "de", "web"), (4, "j k", "en", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {(r.source, r.lang): r for r in corpus_mix_report(df).collect()}

    assert out[("web", "en")].n_docs == 2
    assert out[("web", "en")].n_tokens == 5
    assert out[("web", "de")].src_docs == 3  # source rollup spans langs
    # integer fixed-point: isqrt_fp(3)=17320, isqrt_fp(1)=10000, total=27320
    assert out[("web", "en")].src_weight_bp == 17320 * 10000 // 27320  # 6339
    assert out[("books", "en")].src_weight_bp == 10000 * 10000 // 27320  # 3660
    # sanity vs the float definition (within 1 bp of truncation)
    total = math.sqrt(3) + math.sqrt(1)
    assert abs(out[("web", "en")].src_weight_bp / 10000 - math.sqrt(3) / total) < 2e-4
    # weights are per source: both web rows carry the same weight
    assert out[("web", "en")].src_weight_bp == out[("web", "de")].src_weight_bp


def test_host_quality_filter_prunes_whole_domains(spark):
    """C4-style domain gate: a source whose AVERAGE quality is under the
    floor loses all its docs — including its individually-good ones — and
    a good source keeps its individually-bad ones."""
    from crawler_spark.textops.corpusfilter import host_quality_filter

    good = "the a and " * 40      # len 400, high stopword share -> quality 1.0
    bad = "zz " * 10              # len 30, no stopwords -> quality 0.0
    rows = [
        (1, "spamhost", bad), (2, "spamhost", bad), (3, "spamhost", good),
        (4, "goodhost", good), (5, "goodhost", good), (6, "goodhost", bad),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = host_quality_filter(df, min_avg_quality=0.5)
    kept = {r["doc_id"]: r for r in out.collect()}
    assert set(kept) == {4, 5, 6}          # all of goodhost, none of spamhost
    assert kept[6]["quality"] < 0.5        # the bad doc rides its good host
    # fixed-point average: goodhost = (10000+10000+0) div 3 = 6666
    assert kept[4]["host_avg_fp"] == 6666
    assert all(r["n_docs"] == 3 for r in kept.values())


def test_ccnet_buckets_cumulative_thirds(spark):
    """CCNet head/middle/tail: per-language cumulative-char thirds over
    the ppl proxy, whole score values never split across buckets."""
    from crawler_spark.textops.corpusfilter import ccnet_buckets

    rows = [
        # en: ppl_fp 250 (5 chars), 350 (7), 800 (8); total 20
        #   cum*3: 15, 36, 60 -> head_cut=350, mid_cut=800
        (1, "en", "aa bb"),
        (2, "en", "ccc ddd"),
        (3, "en", "eeeeeeee"),
        # de: three 10-char docs at ppl_fp 200/500/1000 -> exact thirds,
        #   one doc per bucket
        (4, "de", "a b c d ee"),
        (5, "de", "aaaa bbbbb"),
        (6, "de", "aaaaaaaaaa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in ccnet_buckets(df).collect()}

    assert out[1]["ppl_fp"] == 250 and out[1]["bucket"] == "head"
    assert out[2]["ppl_fp"] == 350 and out[2]["bucket"] == "head"
    assert out[3]["ppl_fp"] == 800 and out[3]["bucket"] == "middle"
    assert [out[i]["bucket"] for i in (4, 5, 6)] == ["head", "middle", "tail"]
    assert out[4]["ppl_fp"] == 200 and out[6]["ppl_fp"] == 1000


def test_dsir_weights_match_python_reference(spark):
    """DSIR importance scores replay a pure-Python computation of the
    same hashed-feature Laplace-ratio weights bit-for-bit."""
    import hashlib
    from collections import Counter

    from crawler_spark.textops.corpusfilter import dsir_weights

    rows = [
        (1, "src0", "a b c"),
        (2, "raw", "a b"),
        (3, "raw", "c c d e"),
    ]

    def feat(tok):
        return hashlib.md5(tok.encode()).hexdigest()[:2]

    qn, pn = Counter(), Counter()
    for _, src, text in rows:
        for tok in text.split(" "):
            qn[feat(tok)] += 1
            if src == "src0":
                pn[feat(tok)] += 1
    w = {f: ((pn[f] + 1) * 100_000) // (qn[f] + 1) for f in qn}
    expected = {
        doc_id: (
            len(text.split(" ")),
            sum(w[feat(t)] for t in text.split(" ")),
        )
        for doc_id, _, text in rows
    }

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in dsir_weights(df).collect()}
    assert set(out) == {1, 2, 3}
    for doc_id, (n_feats, score) in expected.items():
        assert out[doc_id]["n_feats"] == n_feats
        assert out[doc_id]["dsir_score_fp"] == score
    # the target doc's own features score at least the smoothed floor of
    # a pure-raw doc with the same length
    assert out[1]["dsir_score_fp"] > out[2]["dsir_score_fp"]


def test_c4_line_filter_rules(spark):
    """C4 §2.2 line rules: terminal punctuation, >=3 words, no
    javascript; page-level lorem-ipsum / brace / min-kept-lines drops."""
    from crawler_spark.textops.corpusfilter import c4_line_filter

    doc1 = "\n".join(
        [
            "This line ends with a period and has many words.",
            "short one.",                      # < 3 words -> dropped
            "no terminal punctuation here",    # dropped
            "Enable javascript to view this page.",  # dropped
            'He said "stop right there!" and they did?',  # ends '?' -> kept
        ]
    )
    doc2 = "function f() { return 1; }\nA real sentence follows here."  # brace -> page dropped
    doc3 = "Lorem Ipsum dolor sit amet consectetur."  # lorem ipsum -> page dropped
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in c4_line_filter(df, min_kept_lines=2).collect()}

    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"].splitlines() == [
        "This line ends with a period and has many words.",
        'He said "stop right there!" and they did?',
    ]
    assert out[1]["page_ok"] is True
    assert out[2]["page_ok"] is False          # brace
    assert out[3]["page_ok"] is False          # lorem ipsum (and n_kept < 2)
    assert out[3]["n_kept"] == 1               # the line itself is a valid line


def test_gopher_quality_rules_thresholds(spark):
    """Gopher A1.1: each rule trips independently; thresholds are integer
    cross-multiplications."""
    from crawler_spark.textops.corpusfilter import gopher_quality_rules

    good = ("the cat sat on of mat and went to sleep right there " * 5).strip()  # 60 words
    short = "the of and to brief text here now"                        # 8 words < 50
    symbols = ("the of " + "# " * 20 + "word " * 40).strip()           # symbol-heavy
    bullets = "\n".join(["- item one of the list"] * 3 + ["the of plain line"])
    numeric = "the of " + "123 456 " * 30                              # <80% alpha words
    rows = [
        (1, good), (2, short), (3, symbols), (4, bullets), (5, numeric),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_rules(df, min_words=50).collect()}

    assert out[1]["gopher_ok"] is True
    assert out[1]["n_stop"] >= 2 and out[1]["n_words"] == 60
    assert out[2]["gopher_ok"] is False and out[2]["n_words"] == 8
    r3 = out[3]
    assert r3["n_symbols"] == 20 and r3["n_symbols"] * 10 > r3["n_words"]
    assert r3["gopher_ok"] is False
    r4 = out[4]
    assert r4["n_lines"] == 4 and r4["n_bullet"] == 3
    assert r4["gopher_ok"] is False            # 3/4 bullet lines > 10%
    r5 = out[5]
    assert r5["n_alpha"] * 100 < 80 * r5["n_words"]
    assert r5["gopher_ok"] is False


def test_line_dedup_strips_corpus_boilerplate(spark):
    from crawler_spark.textops.corpusfilter import line_dedup

    footer = "subscribe to our newsletter"
    df = _docs(
        spark,
        [
            (1, f"alpha one\n{footer}\nbeta two"),
            (2, f"gamma three\n{footer}"),
            (3, f"{footer}\ndelta four"),
            (4, "unique page"),
            (5, ""),  # single empty line; empty string occurs once -> kept
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(df, max_freq=2).collect()}

    assert out[1]["n_lines"] == 3
    assert out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "alpha one\nbeta two"
    # order preserved regardless of where the boilerplate sat
    assert out[3]["clean_text"] == "delta four"
    assert out[4]["clean_text"] == "unique page"
    assert out[5]["n_lines"] == 1 and out[5]["n_kept"] == 1
    # every doc present even when all lines are boilerplate
    df_all = _docs(spark, [(1, "x"), (2, "x"), (3, "x"), (4, "x")])
    gone = {r["doc_id"]: r for r in line_dedup(df_all, max_freq=2).collect()}
    assert gone[1]["n_kept"] == 0 and gone[1]["clean_text"] == ""
    assert len(gone) == 4
