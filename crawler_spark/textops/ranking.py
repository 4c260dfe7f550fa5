"""Ranking / term-weighting operators over the documents corpus: per-doc
TF-IDF top-k terms and BM25 scoring for a fixed query.

These are the retrieval-side twins of the dedup/quality operators — the
reference feeds Elasticsearch, whose relevance model IS BM25, so a user
replacing that stack needs the scoring math to live in the engine
(reference surface: the docs the crawler emits are scored by ES BM25 at
query time; here the same weighting is computed corpus-side as a
DataFrame job).

Scale shape:
- ``tfidf_topk``: one token explode feeding two aggregates (per-doc TF,
  corpus DF) — the DF table is Zipf-small so AQE broadcasts the
  join-back; the top-k is a per-doc window (hash-partitioned by doc,
  never a global sort).
- ``bm25_score``: NO explode at all — per-term occurrence counts come
  from replace-length arithmetic inside the scan's whole-stage codegen,
  and the only shuffle is a 1-row corpus-stats aggregate that broadcasts
  back. At 100 TB this is a single pass over the corpus.

log() portability: Spark's ``ln`` (java.lang.Math.log) and DuckDB's
``ln`` (libm) agree to well under 1e-12 on this value range; all exported
scores are rounded to 4 decimals, the same contract every other oracle
query uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _occurrences


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, sklearn's smooth_idf form).
    Deterministic tie-break: higher score first, then token ascending.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("tok").agg(F.count("*").alias("df_t"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dft, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "tok", "tf", "score", "rnk")
    )


def bm25_score(
    df: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 score of every document for a fixed bag-of-words query
    (Robertson/Sparck-Jones idf: ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

    Term frequencies are computed with the replace-length occurrence
    trick (no tokenizer, no explode) so the whole scan stays inside
    codegen; corpus stats (N, per-term doc frequency, average doc length)
    are one tiny aggregate row broadcast back onto the scan. Returns only
    matching docs (score > 0).
    """
    t = F.col(text_col)
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    n_tokens = F.when(F.length(t) == 0, 0).otherwise(spaces + 1)
    occ = df.select(
        F.col(id_col),
        n_tokens.alias("dl"),
        *[_occurrences(t, term).alias(f"occ_{i}") for i, term in enumerate(terms)],
    )
    # avgdl via exact integer sum / count (a double-typed avg() is a
    # partial-agg-order-dependent float sum; bigint/bigint division is
    # bit-identical across engines)
    stats = occ.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"occ_{i}") > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
    j = occ.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf_i = F.col(f"occ_{i}")
        idf_i = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        score = score + idf_i * (
            tf_i * (k1 + 1.0)
            / (tf_i + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        )
    return (
        j.withColumn("bm25", F.round(score, 4))
        .filter(F.col("bm25") > 0)
        .select(id_col, "dl", F.col("bm25"))
    )


def postings_topk(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index shard build: per term, the document frequency,
    collection frequency, and the top-``k`` postings serialized as
    ``"doc:tf"`` (ranked tf desc, doc asc — the impact-ordered prefix a
    WAND/maxscore engine serves hot). This is the batch index-construction
    workload behind the reference's Elasticsearch sink, expressed as a
    DataFrame job.

    Scale shape: one token explode feeds a (term, doc) hash aggregate with
    map-side partial combine; df/cf come from a second agg on the SAME key
    prefix (co-partitioned, AQE reuses the exchange). The top-k prefix is a
    per-term window — bounded by docs-per-term; for web-scale hot terms
    ("the": 10^9 postings) production would pre-reduce with a per-partition
    top-k before the window (same two-phase trick as dedup.budget_cap);
    the plan here keeps the single window and documents the swap.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("tok", id_col).agg(F.count("*").alias("tf"))
    stats = tf.groupBy("tok").agg(
        F.count("*").alias("df_t"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("tok").orderBy(F.desc("tf"), F.asc(id_col))
    top = tf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    postings = top.groupBy("tok").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("tf")).alias("ntf"), F.col(id_col).alias("d")
                        )
                    )
                ),
                lambda s: F.concat(
                    s["d"].cast("string"), F.lit(":"), (-s["ntf"]).cast("string")
                ),
            ),
            ",",
        ).alias("postings")
    )
    return stats.join(postings, "tok").select("tok", "df_t", "cf", "postings")
