"""URL-level corpus filtering (the RefinedWeb / UT1 pre-fetch curation
stage — Penedo et al. 2023 §3.1.1).

Web-scale training pipelines prune documents by URL *before* spending
fetch/parse/quality compute: (a) an adult/malware domain blocklist (the
public UT1 list is ~4.6M registrable domains) and (b) a soft word score
over the URL string — each blocklist word carries a severity weight and a
URL is dropped when its weighted occurrence sum crosses a threshold.

Spark-first shapes:

* ``apply_domain_blocklist`` — anti-join on the extracted registrable host.
  The blocklist is a dimension table (millions of rows, a few hundred MB):
  small enough to broadcast on a healthy cluster, but we leave the
  strategy to AQE/stats rather than forcing a hint, because at UT1 scale a
  shuffled hash join on ``host`` is also fine (the corpus side shuffles on
  a key it often already carries from the politeness stage).
* ``url_word_score`` — the weighted word score folded into ONE codegen
  projection: per word, occurrences come from replace-length arithmetic
  (``(len(url) - len(replace(url, w))) / len(w)``), so the whole score is
  shuffle-free, UDF-free, and replays bit-identically in ANSI SQL (the
  weights are integers; the score stays a BIGINT).

The reference crawler has no corpus-curation equivalent — its URL filters
are per-ruleset begins/ends/contains/regex gates
(crawler/data/extraction/url_filter.rb, covered by the E19 extraction
engine); this module is the LLM-training-data counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_host(url_col) -> "F.Column":
    """Registrable-host extraction: scheme-less, port-less, lowercased.

    ``parse_url(url, 'HOST')`` is the JVM fast path; we post-lower it and
    strip a leading ``www.`` so ``WWW.Foo.COM`` and ``foo.com`` collide,
    which is how UT1 keys its list.
    """
    host = F.lower(F.parse_url(url_col, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def apply_domain_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop (or flag) rows whose URL host appears in ``blocklist``.

    ``blocklist`` must carry a ``host`` column of registrable domains.
    ``keep_blocked=False`` → anti-join (the UT1 prune);
    ``keep_blocked=True`` → adds a boolean ``blocked`` column instead
    (audit mode), via a left join on the deduped dimension.
    """
    dim = blocklist.select(F.lower(F.col("host")).alias("__bl_host")).dropDuplicates(
        ["__bl_host"]
    )
    keyed = df.withColumn("__host", url_host(F.col(url_col)))
    if keep_blocked:
        out = (
            keyed.join(dim, keyed["__host"] == dim["__bl_host"], "left")
            .withColumn("blocked", F.col("__bl_host").isNotNull())
            .drop("__bl_host", "__host")
        )
        return out
    return (
        keyed.join(dim, keyed["__host"] == dim["__bl_host"], "left_anti").drop("__host")
    )


def url_word_score(
    df: DataFrame,
    weights: dict[str, int],
    url_col: str = "url",
    threshold: int | None = None,
    score_col: str = "url_score",
) -> DataFrame:
    """Weighted substring-occurrence score over the lowercased URL.

    ``weights`` maps word → integer severity. The score is
    ``Σ_w weight[w] * occurrences(lower(url), w)`` built as one literal
    codegen expression (no explode, no join, no shuffle). With
    ``threshold`` set, adds ``url_banned = score >= threshold`` — the
    RefinedWeb soft-ban rule.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {word: int} dict")
    url = F.lower(F.col(url_col))
    score = F.lit(0).cast("bigint")
    for word, weight in sorted(weights.items()):
        if not word or int(weight) != weight:
            raise ValueError(f"bad weight entry: {word!r}: {weight!r}")
        occurrences = (
            F.length(url) - F.length(F.replace(url, F.lit(word), F.lit("")))
        ) / F.lit(len(word))
        score = score + (F.lit(int(weight)) * occurrences).cast("bigint")
    out = df.withColumn(score_col, score)
    if threshold is not None:
        out = out.withColumn("url_banned", F.col(score_col) >= F.lit(int(threshold)))
    return out
