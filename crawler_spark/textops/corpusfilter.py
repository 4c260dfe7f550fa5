"""Corpus-level training-data filters: repetition statistics
(Gopher-style), benchmark n-gram contamination detection, and
quantized-embedding exact dedup.

All pure Catalyst expressions over built-in functions (split / explode /
transform / md5 / window aggregates) so the hot path stays inside
whole-stage codegen and every operator has a bit-identical DuckDB oracle.

Scale notes (the 100 TB shape):
- ``repetition_stats``: two explode → groupBy chains, both map-side
  combined on (doc, term) then rolled up to the doc — the shuffle volume
  is the distinct-(doc,term) table, far below the token stream. No joins
  except the final per-doc merge of the token and bigram rollups, which
  co-partition on the id.
- ``contamination_check``: the benchmark gram set is tiny relative to the
  corpus (the whole point of a held-out benchmark), so the probe is a
  broadcast-able semi-join; AQE picks broadcast at runtime. The corpus
  side never shuffles on the gram — only the per-doc rollup shuffles, on
  the id.
- ``embedding_dedup``: one md5 fingerprint per vector inside the scan,
  one shuffle on the fingerprint for the group window. Quantization uses
  floor(double(x) * scale) — exact float→double widening, so the
  fingerprint is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.textops.dedup import _grams_col


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_distinct_ratio: float = 0.2,
    max_top_token_share: float = 0.2,
    max_top_bigram_share: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1):
    per-document distinct-token ratio, most-frequent-token share, and
    most-frequent-bigram share, plus the composite ``repetition_ok`` gate.

    The reference pipeline's line/paragraph duplicate fractions live in
    ``dedup.chunk_dedup`` (the corpus is single-line); these are the
    token-level repetition signals that complement it.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    tok_agg = (
        toks.groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    w = F.split(F.col(text_col), " ")
    bigrams = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - 1), "
        f"i -> concat(element_at(split({text_col}, ' '), i), ' ', "
        f"element_at(split({text_col}, ' '), i + 1)))"
    )
    bg = df.filter(F.size(w) >= 2).select(
        F.col(id_col), F.explode(bigrams).alias("bg")
    )
    bg_agg = (
        bg.groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_b"))
    )
    distinct_ratio = F.round(F.col("n_distinct") / F.col("n_tokens"), 4)
    top_token_share = F.round(F.col("top_c") / F.col("n_tokens"), 4)
    top_bigram_share = F.coalesce(
        F.round(F.col("top_b") / F.col("n_bigrams"), 4), F.lit(0.0)
    )
    return (
        tok_agg.join(bg_agg, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            distinct_ratio.alias("distinct_ratio"),
            top_token_share.alias("top_token_share"),
            top_bigram_share.alias("top_bigram_share"),
        )
        .withColumn(
            "repetition_ok",
            (F.col("distinct_ratio") >= min_distinct_ratio)
            & (F.col("top_token_share") <= max_top_token_share)
            & (F.col("top_bigram_share") <= max_top_bigram_share),
        )
    )


def contamination_check(
    df: DataFrame,
    bench_mod: int = 97,
    gram: int = 8,
    flag_ratio: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
) -> DataFrame:
    """Benchmark contamination detection (GPT-3 appendix C / Pile-style):
    flag training documents sharing token n-grams with a held-out
    benchmark set.

    ``benchmark``: a DataFrame of held-out eval texts (any frame with a
    ``text_col`` column — load eval-suite files with
    ``benchmark_from_file``). When omitted, the benchmark is carved
    deterministically from the corpus (``id % bench_mod == 0``) so tests
    and the oracle can replay it; the plan is identical either way (the
    benchmark gram set is eval-suite-sized, i.e. tiny vs the corpus, so
    the probe join broadcasts). Documents shorter than ``gram`` tokens
    contribute their whole text as one gram (same fallback as the minhash
    shingler).

    Output: one row per training doc — distinct-gram count, hit count,
    contamination ratio, and the ``contaminated`` flag.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_grams_col(text_col, gram))).alias("g"),
    )
    if benchmark is not None:
        bench = (
            benchmark.select(
                F.explode(F.array_distinct(_grams_col(text_col, gram))).alias("g")
            )
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        corpus = grams
    else:
        bench = (
            grams.filter(F.col(id_col) % bench_mod == 0)
            .select("g")
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        corpus = grams.filter(F.col(id_col) % bench_mod != 0)
    ratio = F.round(F.col("n_hits") / F.col("n_grams"), 4)
    return (
        corpus.join(bench, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("n_hits"),
            ratio.alias("contamination_ratio"),
            (ratio >= flag_ratio).alias("contaminated"),
        )
    )


# GPT-2-style pre-tokenizer, reduced to the Java∩RE2 regex subset (no
# unicode property classes, no lookahead): letter runs, single digits,
# punctuation runs, whitespace runs. Piece count ≈ BPE token count upper
# bound before merges — the standard cheap budget estimator.
BPE_PIECE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+| "


def bpe_token_stats(
    df: DataFrame, chars_per_token: float = 4.0,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget estimation beyond whitespace counting: GPT-2-ish
    pre-tokenizer piece count (regex, digits split singly) plus the
    chars/4 heuristic — the two standard estimators used to size
    training shards before running a real BPE. All regexp_extract_all
    inside the scan's codegen; no shuffle.
    """
    t = F.col(text_col)
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    ws_tokens = F.when(F.length(t) == 0, 0).otherwise(spaces + 1)
    pieces = F.size(F.regexp_extract_all(t, F.lit(BPE_PIECE_RE), F.lit(0)))
    return df.select(
        F.col(id_col),
        ws_tokens.alias("n_ws_tokens"),
        pieces.alias("n_bpe_pieces"),
        F.round(F.length(t) / chars_per_token, 4).alias("est_tokens_c4"),
        F.round(pieces / ws_tokens, 4).alias("pieces_per_word"),
    )


# PII patterns kept to the regex intersection of Java (Spark) and RE2
# (DuckDB/production scanners): no backrefs, no lookaround, ASCII \b.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection + redaction accounting: per-doc match counts for
    email / phone / IPv4 patterns and the redacted text length (every
    match replaced by the fixed ``<PII>`` token, the usual pre-training
    scrub). Pure regexp_extract_all/regexp_replace inside the scan's
    codegen — the patterns are deliberately in the Java∩RE2 regex subset
    so the same scan runs on any engine. Swap/extend ``PII_PATTERNS``
    for a production taxonomy; the plan shape is unchanged.
    """
    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }
    redacted = t
    for pat in PII_PATTERNS.values():
        redacted = F.regexp_replace(redacted, pat, "<PII>")
    return df.select(
        F.col(id_col),
        *[counts[n].alias(f"n_{n}") for n in PII_PATTERNS],
        sum(list(counts.values()), F.lit(0)).alias("n_pii"),
        (sum(list(counts.values()), F.lit(0)) > 0).alias("has_pii"),
        F.length(redacted).alias("redacted_len"),
    )


def sequence_packing(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-sequence packing: lay documents end-to-end along a token
    stream and cut fixed ``budget``-token sequences (GPT-style packing —
    documents may straddle pack boundaries; the trainer inserts EOS).
    Each doc gets (shard, pack_id, offset_in_pack).

    Scale shape: a single global running sum would be one sorted task, so
    the stream is sharded by ``id % n_shards`` and packed independently
    per shard — the window partitions by shard and Spark sorts shards in
    parallel (this is how production packing runs: one stream per output
    shard/worker). Deterministic: ordering inside a shard is by id.
    """
    spaces = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit(" "), F.lit(""))
    )
    n_tokens = F.when(F.length(F.col(text_col)) == 0, 0).otherwise(spaces + 1)
    shard = (F.col(id_col) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(F.col(id_col), shard.alias("shard"), n_tokens.alias("n_tokens"))
        .withColumn("pack_id", F.floor(start / budget))
        .withColumn("offset_in_pack", (start % budget).cast("long"))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, str] | None = None,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling for corpus mixing: keep a doc
    when the first md5-hex byte of its id sorts below the stratum's
    threshold ('80' ≈ 50%, '40' ≈ 25%, ...). Hash-gated sampling is
    reproducible across engines and reruns (no RNG state), the standard
    way to pin a training-mix recipe; granularity is 1/256 per hex-byte
    threshold. Unlisted strata are dropped. Pure filter — no shuffle.
    """
    rates = rates or {"en": "80", "de": "40", "fr": "40", "es": "20"}
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    cond = F.lit(False)
    for stratum, thresh in rates.items():
        cond = cond | ((F.col(strat_col) == stratum) & (bucket < thresh))
    return df.filter(cond).select(F.col(id_col), F.col(strat_col), bucket.alias("bucket"))


def corpus_pipeline(
    df: DataFrame,
    min_quality: float = 0.5,
    budget: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed training-data pipeline, end to end: heuristic quality
    gate → Gopher repetition gate → near-dup cluster keep-best prune →
    benchmark decontamination (benchmark docs themselves are dropped — they
    are eval data) → GPT-style sequence packing of the survivors.

    Every stage is one of this module's / dedup's operators; the joins are
    all on the doc id (co-partitioned shuffles, AQE broadcasts the small
    feature tables at test scale). Output: one row per surviving doc with
    its pack placement.
    """
    from crawler_spark.textops.dedup import dedup_keep_best
    from crawler_spark.textops.textstats import quality_score

    q = quality_score(df, text_col, id_col).select(id_col, "quality")
    rep = repetition_stats(df, text_col, id_col).select(id_col, "repetition_ok")
    kb = dedup_keep_best(df, text_col=text_col, id_col=id_col).select(id_col, "keep")
    ct = contamination_check(df, text_col=text_col, id_col=id_col).select(
        id_col, "contaminated"
    )
    survivors = (
        df.select(id_col, text_col)
        .join(q, id_col)
        .join(rep, id_col)
        .join(kb, id_col)
        .join(ct, id_col)  # inner: benchmark docs drop out here
        .filter(
            (F.col("quality") >= min_quality)
            & F.col("repetition_ok")
            & F.col("keep")
            & ~F.col("contaminated")
        )
        .select(id_col, text_col)
    )
    return sequence_packing(survivors, budget, n_shards, text_col, id_col)


def embedding_dedup(
    df: DataFrame,
    scale: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact dedup over quantized embeddings: fingerprint =
    md5(join(floor(double(x) * scale))) — vectors equal after coarse
    quantization collapse to one group (the cheap first pass before
    cosine near-dup; a re-encoded or precision-cast copy of the same
    content hashes identically here without any pair join).

    One narrow projection inside the scan plus one shuffle on the
    fingerprint; group size and canonical flag come from a window over
    the fingerprint, so the output keeps one row per vector.
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale).cast("long").cast("string"),
    )
    win = Window.partitionBy("fp")
    return (
        df.select(F.col(id_col), F.md5(F.array_join(q, ",")).alias("fp"))
        .withColumn("group_size", F.count("*").over(win))
        .withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(win))
    )


def benchmark_from_file(spark, path: str, text_col: str = "text") -> DataFrame:
    """Load a held-out eval-suite file for ``contamination_check``:
    ``.jsonl``/``.json`` rows with a ``text`` field, or plain text with
    one benchmark item per line. The result is a tiny frame — the
    contamination probe join broadcasts it."""
    if path.endswith((".jsonl", ".json")):
        return spark.read.json(path).select(F.col(text_col))
    return (
        spark.read.text(path)
        .filter(F.col("value") != "")
        .select(F.col("value").alias(text_col))
    )


def corpus_mix_report(
    df: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-curation mix report: per (source, lang) document/token/char
    tallies plus the per-source temperature-sampled mixture weight
    ``sqrt(n_source) / Σ sqrt(n_source)`` — the sublinear (α=0.5)
    source-weighting scheme of the GPT-3/Pile training mixes, which
    up-weights small high-quality sources relative to raw proportion.

    The weight is integer fixed-point: ``src_weight_bp`` (BIGINT basis
    points) = ``isqrt_fp(src_docs) * 10000 DIV Σ isqrt_fp(src_docs)``
    where ``isqrt_fp(n) = isqrt(n * 10^8) = floor(sqrt(n) * 10^4)`` is
    an EXACT integer square root (floor(sqrt(double)) plus a one-step
    integer correction, valid for src_docs up to ~9e10 per source).
    Unlike summing doubles, BIGINT sums are partial-aggregation-order
    invariant, so the weights replay bit-identically in any oracle
    engine. One groupBy shuffle over the corpus; the source rollup and
    grand total are aggregates of the (tiny) group table, broadcast back.
    """
    t = F.col(text_col)
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    tokens = F.when(F.length(t) == 0, 0).otherwise(spaces + 1)
    g = df.groupBy(source_col, lang_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens).alias("n_tokens"),
        F.sum(F.length(t)).alias("n_chars"),
    )
    srcs = g.groupBy(source_col).agg(F.sum("n_docs").alias("src_docs"))
    # exact isqrt(src_docs * 10^8): the double sqrt estimate is within
    # ~2e-7 of the true root here, so a single +/-1 integer correction
    # makes floor() exact on every engine regardless of libm rounding.
    m = F.col("src_docs").cast("long") * F.lit(100_000_000).cast("long")
    s0 = F.floor(F.sqrt(m.cast("double"))).cast("long")
    isq = (
        s0
        + F.when((s0 + 1) * (s0 + 1) <= m, F.lit(1)).otherwise(F.lit(0))
        - F.when(s0 * s0 > m, F.lit(1)).otherwise(F.lit(0))
    )
    srcs = srcs.withColumn("src_isqrt", isq)
    total = srcs.agg(F.sum("src_isqrt").alias("total_isqrt"))
    return (
        g.join(srcs, source_col)
        .crossJoin(F.broadcast(total))
        .select(
            source_col,
            lang_col,
            "n_docs",
            "n_tokens",
            "n_chars",
            "src_docs",
            F.expr(
                "src_isqrt * 10000 DIV total_isqrt"
            ).alias("src_weight_bp"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): order each language's documents by an LM-perplexity score and
    split them into head / middle / tail at cumulative-size thirds — the
    head third of every language is the high-quality slice the paper
    trains on.

    The perplexity stand-in is integer fixed point — chars-per-token ×100
    (``(n_chars * 100) div n_tokens``): longer average tokens ≈ rarer
    vocabulary ≈ worse LM fit. A real KenLM swaps in via
    ``score_with_model`` (same downstream bucketing); the integer proxy
    keeps the DuckDB oracle bit-exact.

    Scale shape — NO per-language global sort of the corpus (the naive
    window over ``partitionBy(lang) orderBy(ppl)`` puts all of 'en' in
    one partition): instead the score histogram is aggregated per
    (lang, ppl_fp) — bounded cardinality: ~langs × score range — the
    cumulative thirds are computed on that tiny table, and each doc is
    bucketed by comparing its score against the two broadcast per-lang
    cutoffs. Per-doc work is a projection + broadcast join; the only
    corpus shuffle is the map-side-combined histogram aggregate. Boundary
    ties go to the earlier bucket (whole score values are never split
    across buckets — quantile-cutoff semantics, deterministic in any
    engine).
    """
    t = F.col(text_col)
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    tokens = F.when(F.length(t) == 0, 0).otherwise(spaces + 1)
    scored = df.select(
        F.col(id_col),
        F.col(lang_col),
        F.length(t).cast("bigint").alias("n_chars"),
        tokens.cast("bigint").alias("n_tokens"),
    ).withColumn("ppl_fp", F.expr("(n_chars * 100) div greatest(n_tokens, 1)"))
    hist = scored.groupBy(lang_col, "ppl_fp").agg(F.sum("n_chars").alias("chars"))
    cum = hist.select(
        lang_col,
        "ppl_fp",
        F.sum("chars").over(Window.partitionBy(lang_col).orderBy("ppl_fp")).alias("cum"),
        F.sum("chars").over(Window.partitionBy(lang_col)).alias("total"),
    )
    cuts = cum.groupBy(lang_col).agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("total"), F.col("ppl_fp"))).alias(
            "head_cut"
        ),
        F.min(F.when(F.col("cum") * 3 >= 2 * F.col("total"), F.col("ppl_fp"))).alias(
            "mid_cut"
        ),
    )
    bucket = (
        F.when(F.col("ppl_fp") <= F.col("head_cut"), F.lit("head"))
        .when(F.col("ppl_fp") <= F.col("mid_cut"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(cuts), lang_col).select(
        id_col, lang_col, "ppl_fp", bucket.alias("bucket")
    )


def dsir_weights(
    df: DataFrame,
    target_pred: str = "source = 'src0'",
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 100_000,
) -> DataFrame:
    """DSIR-style hashed-feature importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): hash
    each document's tokens into a small feature space, estimate the
    target-distribution and raw-distribution feature frequencies, and
    score every document by how much its features look like the target —
    the weight that importance-resamples a raw web crawl toward a curated
    corpus (the paper's Wikipedia+books target is ``target_pred`` here).

    Stand-ins that keep the oracle bit-exact, documented per house rule:
    the feature hash is the first 2 hex chars of md5 (256 buckets; the
    paper uses 10k hashed unigrams+bigrams — same dataflow, bigger
    dimension), and the per-feature weight is the Laplace-smoothed
    frequency RATIO in integer fixed point ``((pn+1) * scale) div (qn+1)``
    rather than log-ratio (log's last-ulp varies across engines; monotone
    in the same direction). A doc's score is the bigint SUM of its
    features' weights — order-independent, so any partitioning bit-matches.

    Scale shape: one token explode consumed twice (persisted): the feature
    count aggregate collapses map-side into ≤256 rows per task (both
    distributions in ONE pass — the target is a conditional sum), and the
    weight table (256 rows) broadcast-joins back onto the feature stream
    for the final map-side-combined per-doc rollup. Two corpus shuffles
    total (feature counts, doc rollup), no skew: every feature bucket is
    ~1/256 of the token stream.
    """
    from pyspark.storagelevel import StorageLevel

    feats = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
            F.expr(target_pred).alias("is_tgt"),
        )
        .select(
            F.col(id_col),
            F.substring(F.md5("tok"), 1, 2).alias("f"),
            F.col("is_tgt").cast("long").alias("is_tgt"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = feats.groupBy("f").agg(
        F.count("*").alias("qn"), F.sum("is_tgt").alias("pn")
    )
    w = counts.select("f", F.expr(f"((pn + 1) * {scale}) div (qn + 1)").alias("w_fp"))
    return (
        feats.join(F.broadcast(w), "f")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("w_fp").alias("dsir_score_fp"),
        )
    )


def host_quality_filter(
    df: DataFrame,
    source_col: str = "source",
    min_avg_quality: float = 0.55,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-level quality gate — drop WHOLE sources whose average
    document quality falls below the floor (the C4/RefinedWeb practice of
    pruning bad domains outright rather than per-document: a domain's
    average is a far stronger spam signal than any single page).

    The average is integer-exact fixed point: per-doc quality (already
    round(·,4)) is scaled to a BIGINT (×10000), summed (order-independent),
    and integer-divided by the doc count — so a distributed run and the
    SQL oracle agree bit-for-bit where a float mean could differ in the
    last ulp near the threshold.

    Scale shape: quality is a pure projection (no shuffle), the per-source
    rollup is one map-side-combined agg whose output is host-cardinality
    (tiny), and the join-back broadcasts under AQE. One shuffle total.
    """
    from .textstats import quality_score

    thr = int(round(min_avg_quality * 10000))
    q = quality_score(df, text_col=text_col, id_col=id_col,
                      extra_cols=(source_col,))
    qfp = F.round(F.col("quality") * 10000).cast("bigint")
    scored = q.select(id_col, source_col, "quality", qfp.alias("_qfp"))
    hosts = scored.groupBy(source_col).agg(
        F.sum("_qfp").alias("_sum_fp"), F.count("*").alias("n_docs")
    )
    avg_fp = F.expr("_sum_fp div n_docs")
    return (
        scored.join(hosts, source_col)
        .withColumn("host_avg_fp", avg_fp)
        .filter(F.col("host_avg_fp") >= F.lit(thr))
        .select(id_col, source_col, "quality", "host_avg_fp", "n_docs")
    )


def c4_line_filter(
    df: DataFrame,
    min_words: int = 3,
    min_kept_lines: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning…" §2.2 — the rules that turned Common Crawl into
    C4): keep only lines that end in terminal punctuation AND contain at
    least ``min_words`` words AND don't mention javascript; drop the whole
    page if it contains "lorem ipsum" or a curly brace, or fewer than
    ``min_kept_lines`` lines survive.

    Pure Catalyst higher-order array functions — the line split, per-line
    predicates, and reassembly all run inside one projection (ZERO
    shuffles, zero explodes: the kept lines never leave the row). The
    same lambda pipeline replays in DuckDB via list_filter.
    """
    t = F.col(text_col)

    def line_ok(l):
        last = F.substring(l, -1, 1)
        words = F.when(
            F.length(l) == 0, 0
        ).otherwise(F.length(l) - F.length(F.replace(l, F.lit(" "), F.lit(""))) + 1)
        return (
            last.isin(".", "!", "?", '"')
            & (words >= min_words)
            & ~F.lower(l).contains("javascript")
        )

    lines = F.split(t, "\n")
    kept = F.filter(lines, line_ok)
    page_clean = ~F.lower(t).contains("lorem ipsum") & ~t.contains("{")
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        ((F.size(kept) >= min_kept_lines) & page_clean).alias("page_ok"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    df: DataFrame,
    stopwords: tuple = GOPHER_STOPWORDS,
    min_words: int = 50,
    max_words: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021,
    appendix A1.1 — the heuristics MassiveWeb was filtered with): word
    count in [50, 100k]; mean word length in [3, 10]; symbol-to-word
    ratio (# and …) ≤ 0.1; ≤ 90% of lines may NOT start with a bullet is
    inverted — ≥ 90% must not; ≤ 30% of lines end with an ellipsis;
    ≥ 80% of words contain an alphabetic character; and at least 2 of the
    designated stop words appear (the paper's English set is the default;
    pass a corpus-appropriate set for other vocabularies).

    Every ratio threshold is an INTEGER cross-multiplication
    (``n_alpha * 100 >= 80 * n_words`` — never a float division), so the
    pass flag is bit-exact in any engine and under any row order. One
    projection, zero shuffles: the line/word arrays live and die inside
    the row via higher-order functions.
    """
    t = F.col(text_col)
    toks = F.split(t, " ")
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(toks)).cast("bigint")
    n_chars_nospace = (
        F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("bigint")
    )
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))
    ).cast("bigint")
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast("bigint")
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
        + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    ).cast("bigint")
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(lines, lambda l: F.substring(l, 1, 1).isin("-", "•", "*"))
    ).cast("bigint")
    n_ell_lines = F.size(
        F.filter(
            lines,
            lambda l: F.substring(l, -1, 1).isin("…")
            | (F.substring(l, -3, 3) == "..."),
        )
    ).cast("bigint")
    n_stop = sum(
        (
            F.when(
                F.concat(F.lit(" "), t, F.lit(" ")).contains(f" {w} "), 1
            ).otherwise(0)
        )
        for w in stopwords
    ).cast("bigint")

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_chars_nospace.alias("n_chars_ns"),
        n_alpha.alias("n_alpha"),
        (n_hash + n_ell).alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet"),
        n_ell_lines.alias("n_ell_lines"),
        n_stop.alias("n_stop"),
    )
    ok = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        # mean word length in [3, 10]: 3*W <= C <= 10*W
        & (F.col("n_chars_ns") >= 3 * F.col("n_words"))
        & (F.col("n_chars_ns") <= 10 * F.col("n_words"))
        # symbol-to-word ratio <= 0.1
        & (F.col("n_symbols") * 10 <= F.col("n_words"))
        # >= 90% of lines don't start with a bullet
        & (F.col("n_bullet") * 10 <= F.col("n_lines"))
        # <= 30% of lines end with an ellipsis
        & (F.col("n_ell_lines") * 10 <= 3 * F.col("n_lines"))
        # >= 80% of words contain an alphabetic character
        & (F.col("n_alpha") * 100 >= 80 * F.col("n_words"))
        # at least 2 of the stop words appear
        & (F.col("n_stop") >= 2)
    )
    return out.withColumn("gopher_ok", ok)


def line_dedup(
    df: DataFrame,
    max_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CORPUS-WIDE line-level dedup (CCNet §3.1 / RefinedWeb line-wise
    filtering): drop every line whose exact text occurs more than
    ``max_freq`` times across the whole corpus — the pass that strips
    navigation bars, cookie banners, and footer boilerplate that repeat
    on every page of a site. Complements :func:`c4_line_filter` (per-page
    line rules, no corpus context) and ``dedup.chunk_dedup`` (keep-first
    paragraph dedup): here a line above the frequency cap is removed from
    ALL documents, which is what boilerplate removal wants.

    Returns one row per input doc:
    ``(id, n_lines, n_kept, clean_text)`` with surviving lines rejoined
    in their original order (empty string when nothing survives).

    Scale shape (the 100 TB pass): posexplode → line-frequency agg
    (map-side combined; the shuffle is the distinct-line table, Zipf-small
    vs the line stream) → join-back on the line hash (md5 — uniform, AQE
    splits residual boilerplate skew) → per-doc rollup co-partitioned on
    the id. The reassembly sorts only within a doc (array_sort of the
    collected (pos, line) structs) — never a global sort.
    """
    from pyspark.storagelevel import StorageLevel

    lines = F.split(F.col(text_col), "\n")
    occ = df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    ).withColumn("lh", F.md5(F.col("line"))).persist(StorageLevel.MEMORY_AND_DISK)
    freq = occ.groupBy("lh").agg(F.count("*").alias("c"))
    kept = occ.join(freq, "lh").filter(F.col("c") <= max_freq)
    roll = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        df.select(F.col(id_col), F.size(lines).cast("bigint").alias("n_lines"))
        .join(roll, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    unit_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every document from the
    same ``unit_col`` (host / source / domain) lands in the SAME split,
    so near-duplicate pages within a site can never straddle the
    train/eval boundary — the standard contamination guard for web-text
    corpora (the same unit-level discipline the dedup pipeline uses;
    random per-document splits leak boilerplate and templated pages).

    The assignment is a pure hash of the unit name — md5's first 8
    nibbles mod 100 — so it is stable across runs, engines, and corpus
    growth: adding documents never reassigns an existing unit, which
    makes the split safe to apply incrementally per crawl wave.

    Output: one row per unit — ``(unit, bucket, split, n_docs,
    total_chars)`` — all integers/strings, bit-replayable anywhere.

    Scale shape: one map-side-combined aggregate on the unit (hosts are
    Zipf-many but each group collapses to one row per map task before
    the exchange); the hash is JVM codegen. Joining the assignment back
    onto the corpus is a broadcast join (the unit dim is tiny vs docs).
    """
    bucket = F.expr(
        "CAST(conv(substring(md5(unit), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    split = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        df.groupBy(F.col(unit_col).alias("unit"))
        .agg(
            F.count(id_col).cast("long").alias("n_docs"),
            F.sum(size_col).cast("long").alias("total_chars"),
        )
        .withColumn("bucket", bucket)
        .select("unit", "bucket", split.alias("split"), "n_docs", "total_chars")
    )
