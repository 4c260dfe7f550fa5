"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane signs) variant as the scale path: at 10^9 vectors the
brute-force cross join is O(Q·N) — the bucketed variant probes only vectors
sharing the query's sign-signature bucket (recall traded for a ~2^b fanout
reduction; standard practice is multi-probe over neighboring buckets).

Dot products run JVM-side via zip_with/aggregate in double precision —
no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine(a: str, b: str):
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)")
    na = F.sqrt(F.expr(f"aggregate({a}, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
    nb = F.sqrt(F.expr(f"aggregate({b}, 0D, (s, v) -> s + cast(v as double) * cast(v as double))"))
    return dot / (na * nb)


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos) — exact top-k by cosine.

    queries is broadcast (it is the small side by construction); ranking
    rounds the cosine to 4 decimals before ordering with an id tie-break so
    results are stable across float summation orders (and engines).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
    ).join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine("v_vec", "q_vec"), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hyperplane_bucket(df: DataFrame, planes: list, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Sign-signature bucket id from fixed random hyperplanes (list of
    python float lists, broadcast as literals). bits = sign(v·p)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        # dot product against the literal plane, JVM-side
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return df.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def lsh_topk(
    vectors: DataFrame, queries: DataFrame, planes: list, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN: rank only within the query's hyperplane bucket (scale path)."""
    from pyspark.sql import Window

    vb = hyperplane_bucket(vectors, planes, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    ).withColumnRenamed(vec_col, "v_vec")
    qb = hyperplane_bucket(queries, planes, id_col, vec_col).withColumnRenamed(
        id_col, "query_id"
    ).withColumnRenamed(vec_col, "q_vec")
    pairs = vb.join(F.broadcast(qb), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id", F.round(_cosine("v_vec", "q_vec"), 4).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
