"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

The first stage of any LLM data pipeline that ships its own tokenizer:
iteratively merge the corpus's most frequent adjacent symbol pair,
starting from characters. The classic trainer is a single-machine loop
over a word-frequency dictionary (the HuggingFace ``tokenizers`` shape);
this is the same algorithm expressed Spark-first:

1. ONE corpus pass builds the (word, freq) table — Zipf-small relative
   to the token stream (a 100 TB corpus has a few hundred million
   distinct words, not 10^13). Every later iteration runs on this
   compressed table and NEVER rescans the corpus.
2. Each merge iteration is: adjacent-pair explode over the symbol
   strings (weighted by word freq, map-side combined) → one argmax row
   to the driver (the k-means precedent: k·dims rows per iter there,
   ONE row here) → a literal ``replace`` projection applying the merge
   corpus-wide. All whole-stage codegen; the per-iteration shuffle is
   the pair-count aggregate over the vocabulary, not the corpus.

Symbols are space-delimited inside a padded string ( `` h e l l o `` ).
Applying a merge must be leftmost-greedy: when ``lhs != rhs`` a
``replace`` of ``' x y '`` with ``' xy '`` applied TWICE is exactly
canonical (consecutive occurrences share their delimiter space, so the
first pass takes the alternating ones — `` x y x y `` → `` xy x y `` —
and the second merges the now-isolated rest; occurrences cannot overlap
when the symbols differ). When ``lhs == rhs`` the replace trick is NOT
canonical (a run of n >= 5 identical symbols merges as ``xx x xx``
instead of ``xx xx x``), so that case folds left-to-right over the
symbol list instead (Spark ``aggregate``; the DuckDB oracle uses the
same fold via ``list_reduce`` for EVERY merge — the oracle picks the
pair inside SQL so it cannot branch, and the fold is canonical for both
cases). Counts, tie-breaks (count DESC, pair ASC), and the merged vocab
replay bit-identically. Integer counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, LongType, StringType, StructField, StructType,
)

MERGE_SCHEMA = StructType([
    StructField("iter", IntegerType(), False),
    StructField("rank", IntegerType(), False),
    StructField("lhs", StringType(), False),
    StructField("rhs", StringType(), False),
    StructField("pair_count", LongType(), False),
    StructField("merged", BooleanType(), False),
])


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus's (word, freq) dictionary — the one corpus-sized pass."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _apply_merge(sym, x: str, y: str):
    """Leftmost-greedy corpus-wide application of merge (x, y) to a padded
    symbol string column.

    x != y: double-replace (whole-stage codegen; canonical because
    occurrences of a two-symbol pattern with distinct symbols cannot
    overlap, and the two passes together take every occurrence).
    x == y: left fold over the symbol list — a run of n identical
    symbols must become floor(n/2) merged tokens then the odd remainder,
    which no non-overlapping string replace can express. The fold's
    merge guard (trailing TOKEN equals x, checked via the ' x' suffix on
    the space-joined accumulator) cannot re-fire on a token merged this
    iteration: that token is x||y, never equal to x (y is non-empty).
    """
    if x != y:
        pat, rep = F.lit(f" {x} {y} "), F.lit(f" {x}{y} ")
        return F.replace(F.replace(sym, pat, rep), pat, rep)
    suffix = F.lit(f" {x}")
    return F.concat(
        F.aggregate(
            F.split(F.trim(sym), " "),
            F.lit(""),
            lambda acc, t: F.when(
                acc.endswith(suffix) & (t == F.lit(y)),
                F.concat(acc, F.lit(y)),
            ).otherwise(F.concat(acc, F.lit(" "), t)),
        ),
        F.lit(" "),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """freq-weighted adjacent-pair counts over the symbol strings."""
    syms = F.split(F.trim(F.col("sym")), " ")
    pairs = F.expr(
        "transform(sequence(1, size(split(trim(sym), ' ')) - 1), "
        "i -> concat(element_at(split(trim(sym), ' '), i), ' ', "
        "element_at(split(trim(sym), ' '), i + 1)))"
    )
    return (
        vocab.filter(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    iters: int = 3,
    top_k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Train ``iters`` BPE merges; return the per-iteration pair ranking.

    Output: one row per (iteration, rank<=top_k) — the iteration's
    ``top_k`` most frequent adjacent pairs with exact counts, rank 1
    being the pair that was merged (``merged`` true). Returning the
    ranking rather than just the merge makes the whole per-iteration
    aggregate oracle-checkable, not only its argmax.

    Driver traffic: ``top_k`` rows per iteration (the merge decision is
    inherently sequential — each iteration's counts depend on the
    previous merge — so BPE's driver loop is the algorithm, not a
    shortcut; k-means in this repo works the same way with k·dims rows).
    """
    spark = df.sparkSession
    vocab = word_freq_table(df, text_col).select(
        F.concat(
            F.lit(" "), F.concat_ws(" ", F.split("w", "")), F.lit(" ")
        ).alias("sym"),
        "freq",
    )
    # the vocab table is Zipf-small: keep it materialized across the
    # sequential iterations instead of recomputing the corpus explode
    vocab = vocab.localCheckpoint(eager=True)
    out_rows = []
    for it in range(iters):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(top_k)
            .collect()
        )
        if not top:
            break
        for rank, row in enumerate(top, start=1):
            left, right = row.pair.split(" ", 1)
            out_rows.append(
                (it, rank, left, right, int(row.cnt), rank == 1)
            )
        x, y = top[0].pair.split(" ", 1)
        vocab = vocab.withColumn(
            "sym", _apply_merge(F.col("sym"), x, y)
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(out_rows, MERGE_SCHEMA)


def _bpe_ctes(table: str, text_col: str, iters: int) -> list:
    """Shared CTE chain: word-freq dict, char vocab v0, and for each
    iteration i the pair counts p{i}, ranking r{i}, and merged vocab
    v{i+1} (always emitted so encode oracles can read v{iters})."""
    ctes = [
        f"""wf AS (
          SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split({text_col}, ' ')) AS w FROM {table})
          WHERE length(w) > 0 GROUP BY w)""",
        """v0 AS (
          SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' '
                   AS sym, freq
          FROM wf)""",
    ]
    for i in range(iters):
        ctes.append(f"""p{i} AS (
          SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT array_to_string(s[j:j+1], ' ') AS pair, freq FROM (
              SELECT string_split(trim(sym), ' ') AS s, freq FROM v{i}
              WHERE len(string_split(trim(sym), ' ')) >= 2),
            UNNEST(range(1, len(s))) AS t(j))
          GROUP BY pair)""")
        ctes.append(f"""r{i} AS (
          SELECT pair, cnt,
                 row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rnk
          FROM p{i})""")
        # leftmost-greedy fold (NOT double-replace: the pair is chosen
        # inside SQL, so the lhs==rhs run case — where replace deviates
        # from canonical BPE — cannot be branched away at build time; the
        # fold is canonical for both cases and matches _apply_merge's
        # results exactly). acc carries ' '-prefixed joined tokens, so
        # the ends_with(' '||lhs) guard tests the trailing whole token.
        # The argmax pair arrives via a 1-row cross join (DuckDB rejects
        # subqueries inside lambda bodies).
        ctes.append(f"""b{i} AS (
          SELECT string_split(pair, ' ')[1] AS lhs,
                 string_split(pair, ' ')[2] AS rhs
          FROM r{i} WHERE rnk = 1)""")
        ctes.append(f"""v{i + 1} AS (
          SELECT list_reduce(
                   list_prepend('', string_split(trim(sym), ' ')),
                   (acc, t) -> CASE
                     WHEN ends_with(acc, ' ' || b{i}.lhs) AND t = b{i}.rhs
                     THEN acc || b{i}.rhs
                     ELSE acc || ' ' || t END) || ' ' AS sym,
                 freq
          FROM v{i}, b{i})""")
    return ctes


def bpe_train_sql(table: str = "documents", text_col: str = "text",
                  iters: int = 3, top_k: int = 5) -> str:
    """The unrolled ANSI-SQL replay of :func:`bpe_train` (DuckDB oracle):
    iteration i's vocab CTE applies iteration i-1's argmax merge via the
    same scalar-subquery replace, so counts, tie-breaks, and ranks are
    bit-identical to the Spark run."""
    ctes = _bpe_ctes(table, text_col, iters)
    selects = [
        f"""SELECT {i} AS iter, CAST(rnk AS INT) AS rank,
                   string_split(pair, ' ')[1] AS lhs,
                   array_to_string(string_split(pair, ' ')[2:], ' ')
                     AS rhs,
                   cnt AS pair_count, rnk = 1 AS merged
            FROM r{i} WHERE rnk <= {top_k}"""
        for i in range(iters)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_vocab_counts(
    df: DataFrame,
    iters: int = 3,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Train ``iters`` merges, ENCODE the corpus under them, and return
    the top-``top_k`` tokens of the resulting vocabulary with exact
    corpus counts — the end-to-end train-then-tokenize pipeline.

    Encoding never touches the corpus either: token counts are the
    freq-weighted symbol counts of the merged word-frequency table, so
    the whole train+encode run costs one corpus pass total. The merges
    arrive as driver literals, so the encode is a static chain of
    ``iters`` double-``replace`` projections in whole-stage codegen —
    at 100 TB, applying a full 50k-merge vocabulary batches the chain
    through an Arrow ``mapInPandas`` tokenizer instead (the
    ``score_with_model`` broadcast pattern); the literal chain is the
    oracle-exact small-vocab path.
    """
    from pyspark.sql import Window

    merges = [
        (r.lhs, r.rhs)
        for r in bpe_train(df, iters=iters, top_k=1, text_col=text_col)
        .filter("merged").orderBy("iter").collect()
    ]
    vocab = word_freq_table(df, text_col).select(
        F.concat(
            F.lit(" "), F.concat_ws(" ", F.split("w", "")), F.lit(" ")
        ).alias("sym"),
        "freq",
    )
    sym = F.col("sym")
    for x, y in merges:
        sym = _apply_merge(sym, x, y)
    counts = (
        vocab.select(sym.alias("sym"), "freq")
        .select(F.explode(F.split(F.trim("sym"), " ")).alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("token", "n", "rank")
    )


def bpe_encode_sql(table: str = "documents", text_col: str = "text",
                   iters: int = 3, top_k: int = 50) -> str:
    """Unrolled oracle for :func:`bpe_vocab_counts`: the shared CTE chain
    through v{iters}, then freq-weighted token counts + deterministic
    global ranking."""
    ctes = _bpe_ctes(table, text_col, iters)
    ctes.append(f"""tc AS (
      SELECT token, CAST(sum(freq) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(trim(sym), ' ')) AS token, freq
        FROM v{iters})
      GROUP BY token)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT token, n, rank FROM (
          SELECT token, n,
                 CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT)
                   AS rank
          FROM tc)
        WHERE rank <= {top_k}"""
    )
