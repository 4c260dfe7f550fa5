"""Deterministic distinct-count sketching: K-Minimum-Values (KMV).

``approx_count_distinct`` (HyperLogLog++) is Spark's built-in sketch,
but its register layout is engine-private — an oracle can't replay it,
and two engines never agree bit-for-bit. KMV (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002; Beyer et
al., "On synopses for distinct-value estimation under multiset
operations", SIGMOD 2007) is the portable alternative: keep the k
smallest values of a uniform hash of the elements; the k-th smallest
value h_k estimates the distinct count as ``(k-1) / h_k`` (hash scaled
to [0,1)). Because the hash (md5) and the "k smallest" selection are
both deterministic, the sketch — and the estimate — replay
bit-identically in ANY engine, which is the repo-wide oracle
discipline.

Scale shape: the per-group sketch is mergeable (union of sketches =
k smallest of the concatenation), so at 100 TB the map-side partial
aggregate already shrinks every task's contribution to k rows per
group before the exchange. Here the same effect comes from
``distinct`` (map-side combine on the (group, hash) key) followed by a
per-group running-rank window over the Zipf-small distinct set — never
a global sort, never a full-corpus window.

Fixed-point arithmetic: the hash is the first 13 hex nibbles of md5
read as a 52-bit integer (both Spark ``conv`` and nibble-arithmetic SQL
produce the identical value), and the estimate is
``(k-1) * 2^52 DIV h_k`` — BIGINT division, no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 13 hex nibbles = 52 bits: (k-1) * 2^52 stays far below BIGINT overflow
# for any practical k, and 52 bits of md5 is plenty of resolution for
# estimates up to ~2^26 distinct values per group.
HASH_BITS = 52
HASH_NIBBLES = 13
HASH_SPACE = 1 << HASH_BITS


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    elem_col,
    k: int = 64,
    with_exact: bool = True,
) -> DataFrame:
    """Per-``group_col`` KMV distinct-count estimate of ``elem_col``.

    Output (all BIGINT): ``k_used`` (min(k, observed distinct)),
    ``kth_h`` (the k-th smallest 52-bit hash — the sketch's frontier),
    ``est_distinct`` (``(k_used-1) * 2^52 DIV kth_h`` when the sketch
    is full, else the exact small count), and — when ``with_exact`` —
    ``exact_distinct`` for accuracy inspection (drop it in production;
    it costs the exact distinct the sketch exists to avoid).

    ``elem_col`` may be a Column (e.g. an exploded token) or a name.
    """
    elem = F.col(elem_col) if isinstance(elem_col, str) else elem_col
    h = F.expr(
        f"CAST(conv(substring(md5(_e), 1, {HASH_NIBBLES}), 16, 10) AS BIGINT)"
    )
    hashed = (
        df.select(F.col(group_col), elem.cast("string").alias("_e"))
        .select(group_col, h.alias("h"))
        .distinct()
    )
    # One window + ONE rollup: the running rank gives the k-smallest
    # frontier AND the exact count in the same pass (count(*) == max rn),
    # so no second scan / join for `with_exact`. The group-by keys the
    # window's partitioning, so the rollup adds no exchange.
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    in_k = F.col("rn") <= k
    sk = (
        ranked.groupBy(group_col)
        .agg(
            F.sum(F.when(in_k, 1).otherwise(0)).cast("long").alias("k_used"),
            F.max(F.when(in_k, F.col("h"))).alias("kth_h"),
            F.count("*").cast("long").alias("exact_distinct"),
        )
        .withColumn(
            "est_distinct",
            F.expr(
                f"CASE WHEN k_used < {k} THEN k_used "
                f"ELSE (k_used - 1) * CAST({HASH_SPACE} AS BIGINT) DIV kth_h END"
            ),
        )
        .select(group_col, "k_used", "kth_h", "est_distinct", "exact_distinct")
    )
    if not with_exact:
        sk = sk.drop("exact_distinct")
    return sk


def kmv_hash_sql(elem_sql: str) -> str:
    """The engine-portable ANSI-SQL spelling of this module's 52-bit
    hash: nibble-by-nibble strpos arithmetic over md5 — identical to
    Spark's ``conv(substring(md5(x),1,13),16,10)`` on every input.
    Exposed so oracles (and any non-Spark consumer) replay the sketch.
    """
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({elem_sql}), {p}, 1)) - 1)"
        f" * {16 ** (HASH_NIBBLES - p)}"
        for p in range(1, HASH_NIBBLES + 1)
    )
    return f"CAST({terms} AS BIGINT)"
