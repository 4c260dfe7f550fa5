"""Discovery gate chain (SURVEY §2.2 F1-F12) as DataFrame ops.

Gate order is semantic, not just cosmetic (coordinator.rb:648-724): crawl
rules are checked before depth/budget so a URL keeps a stable deny reason,
and the seen-check is LAST so denied URLs are never marked seen. The chain
is therefore computed *structurally*: a single vectorized Arrow UDF yields
the ordered per-URL verdict for the stateless gates (scheme, length,
segments, params, domain allowlist, robots, crawl rules), then depth and the
budget/seen gates are applied as DataFrame filters/joins on only the
survivors — Catalyst cannot reorder the side-effecting part because the
anti-join and MERGE are separate stages (SURVEY §4).

Robots rules and compiled crawl rules ride a Spark broadcast variable (the
per-host rules dimension is small relative to the corpus: one entry per
host, and politeness/robots state is naturally host-bounded).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import CrawlConfig
from ..functions import urlnorm as U
from ..functions.robots import RobotRules
from ..functions.rules import RuleEngine

CANDIDATE_SCHEMA = StructType(
    [
        StructField("norm_url", StringType()),
        StructField("task_type", StringType()),
        StructField("depth", IntegerType()),
        StructField("source_type", StringType()),
        StructField("source_url", StringType()),
        StructField("parent_seq", LongType()),
        StructField("sub_order", LongType()),
        StructField("redirect_chain", ArrayType(StringType())),
        # norm_url is RAW when true; the gate UDF normalizes in the same
        # Python pass (one Arrow round-trip per wave instead of two)
        StructField("needs_norm", BooleanType()),
    ]
)

_GATE_OUT = StructType(
    [
        StructField("deny_reason", StringType()),
        StructField("host_key", StringType()),
        StructField("crawl_delay_ms", LongType()),
    ]
)


def make_gate_udf(cfg: CrawlConfig, robots_bc, rules_bc, allowed_sites: frozenset):
    """Build the stateless-gate verdict UDF.

    robots_bc: Broadcast[dict[host_key, RobotRules.to_tuple()]]
    rules_bc:  Broadcast[dict[site, list[(policy,type,pattern)]]]
    """

    def gate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        robots = {k: RobotRules.from_tuple(v) for k, v in (robots_bc.value or {}).items()}
        engines = {
            site: RuleEngine.from_specs(site, specs)
            for site, specs in (rules_bc.value or {}).items()
        }
        for pdf in it:
            needs = pdf["needs_norm"] if "needs_norm" in pdf else None
            norms, reasons, host_keys, delays = [], [], [], []
            for i, (url, task_type) in enumerate(zip(pdf["norm_url"], pdf["task_type"])):
                if needs is not None and needs.iat[i] and url is not None:
                    url = U.try_normalize(url)[0]
                norms.append(url)
                if url is None:
                    # unparseable link — dropped by the caller (link.rb:70-83
                    # invalid links are never enqueued)
                    host_keys.append(None)
                    delays.append(0)
                    reasons.append(None)
                    continue
                host_key = U.url_host_key(url)
                host_keys.append(host_key)
                rb = robots.get(host_key)
                delays.append(
                    int(rb.crawl_delay_ms) if rb is not None and rb.crawl_delay_ms and rb.crawl_delay_ms > 0 else 0
                )
                reasons.append(_verdict(url, task_type, cfg, allowed_sites, rb, engines))
            out = pdf.copy()
            out["norm_url"] = norms
            out["deny_reason"] = reasons
            out["host_key"] = host_keys
            out["crawl_delay_ms"] = delays
            yield out

    return gate


def _verdict(url: str, task_type: str, cfg: CrawlConfig, allowed_sites, rb, engines):
    """coordinator.rb:648-699 order (stateless part)."""
    if U.url_scheme(url) not in U.SUPPORTED_SCHEMES:
        return "incorrect_protocol"
    if len(U.request_uri(url)) > cfg.max_url_length:
        return "link_too_long"
    if U.path_segments_count(url) > cfg.max_url_segments:
        return "link_with_too_many_segments"
    if U.params_count(url) > cfg.max_url_params:
        return "link_with_too_many_params"
    if task_type != "sitemap":
        site = U.url_site(url)
        if site not in allowed_sites:
            return "domain_filter_denied"
        if rb is not None and (rb.allow_none() or not rb.allowed(U.url_path(url))):
            return "robots_txt_disallowed"
        eng = engines.get(site)
        if eng is not None and eng.rules and eng.outcome(url) == "deny":
            return "rule_engine_denied"
    return None


def apply_gates(
    candidates: DataFrame,
    cfg: CrawlConfig,
    robots_bc,
    rules_bc,
) -> DataFrame:
    """Stateless gates + depth gate → adds deny_reason/host_key/crawl_delay_ms.

    Depth check placed after the UDF verdict to preserve reason attribution
    (coordinator.rb:684-704).
    """
    allowed = frozenset(cfg.allowed_sites())
    schema = StructType(candidates.schema.fields + _GATE_OUT.fields)
    gated = candidates.mapInPandas(
        make_gate_udf(cfg, robots_bc, rules_bc, allowed), schema=schema
    )
    gated = gated.filter(F.col("norm_url").isNotNull())
    if "needs_norm" in gated.columns:
        gated = gated.drop("needs_norm")
    return gated.withColumn(
        "deny_reason",
        F.coalesce(
            F.col("deny_reason"),
            F.when(F.col("depth") > cfg.max_crawl_depth, F.lit("link_too_deep")),
        ),
    )
