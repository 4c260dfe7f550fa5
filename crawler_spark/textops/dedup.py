"""Deduplication operators for large-scale text corpora.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash. Designed for the 100TB regime: everything is built-in JVM
expressions (md5/xxhash64/bit ops inside whole-stage codegen) — no Python in
the hot path; the only shuffles are the dedup groupBys themselves.

MinHash uses *lexicographic-min of md5 hex strings* as the hash family:
portable across engines (the DuckDB oracle computes the identical
signature), seed-parameterized via prefix. Production note: at 10^10 docs
the band-bucket join is salted on bucket and AQE skew-join handles hot
buckets (boilerplate-heavy corpora produce mega-buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct text
    with the representative (min id) and the duplicate count."""
    return (
        df.withColumn("fp", F.md5(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dupes"))
        .select(id_col, "fp", "dupes")
    )


def _grams_col(text_col: str, n: int = 3):
    """Word n-gram shingles; texts shorter than n words shingle to the whole
    text. Pure Catalyst expressions (split/sequence/transform/slice)."""
    w = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array(F.col(text_col)))


def minhash_signatures(
    df: DataFrame, n_hashes: int = 16, gram: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, seed, sig): sig = min over shingles of md5(seed || ':' || shingle).

    The seed dimension is a 16-row broadcast cross join; the min-agg does
    map-side partial aggregation, so the shuffle is |docs| × n_hashes tiny
    rows.
    """
    spark = df.sparkSession
    seeds = spark.range(n_hashes).select(F.col("id").cast("int").alias("seed"))
    grams = df.select(F.col(id_col), F.explode(_grams_col(text_col, gram)).alias("g"))
    return (
        grams.join(F.broadcast(seeds))
        .select(
            id_col,
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("g"))).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame, n_hashes: int = 16, bands: int = 4, gram: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.

    band key = ordered concat of the band's signatures; pair = self-join on
    (band, key) with id_a < id_b, deduped across bands.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, n_hashes, gram, text_col, id_col)
    bandkeys = (
        sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(seed, sig))), x -> x.sig)"),
                ",",
            ).alias("band_key")
        )
    )
    a = bandkeys.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bandkeys.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens (xxhash64 word hashes, bitwise
    majority vote). JVM-side only; rows-only correctness check (xxhash64 has
    no portable SQL oracle)."""
    def mask(i: int) -> int:
        # two's-complement long literal (1 << 63 overflows java long)
        m = 1 << i
        return m - (1 << 64) if m >= (1 << 63) else m

    words = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
    hashed = words.select(id_col, F.xxhash64("w").alias("h"))
    bit_votes = [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(mask(i))) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ]
    votes = hashed.groupBy(id_col).agg(*bit_votes)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(mask(i)).cast("long")).otherwise(F.lit(0))
    return votes.select(id_col, sim.alias("simhash"))


def simhash_hamming_pairs(
    df: DataFrame, max_dist: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_dist.

    Pigeonhole band trick: split the 64-bit simhash into 4 × 16-bit chunks —
    any pair within hamming distance ≤ 3 must agree exactly on ≥ 1 chunk, so
    the self-join runs per (chunk_idx, chunk_value) bucket instead of all
    pairs; survivors are verified with an exact popcount. (For max_dist ≥ 4
    the guarantee needs ≥ max_dist+1 chunks — assert the invariant.)
    """
    assert max_dist <= 3, "4-chunk pigeonhole covers hamming distance <= 3"
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_idx"),
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_idx", "c.chunk_val")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk_idx", "chunk_val"
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.expr("sh_a ^ sh_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_dist)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, threshold: float = 0.5, gram: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (verification stage after
    LSH): |A∩B| / |A∪B| on distinct shingles. If no candidate set is given,
    uses LSH candidates — never the full cross product."""
    if candidates is None:
        candidates = minhash_lsh_pairs(df, gram=gram, text_col=text_col, id_col=id_col)
    grams = (
        df.select(F.col(id_col), F.explode(_grams_col(text_col, gram)).alias("g")).distinct()
    )
    ga = grams.withColumnRenamed(id_col, "id_a")
    gb = grams.withColumnRenamed(id_col, "id_b")
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n"))
    # explode both sides and count matching grams per candidate pair
    inter = (
        candidates.join(ga, "id_a")
        .join(gb, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
