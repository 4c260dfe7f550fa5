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

import re
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


# A raw URL is "canonical" when normalize(url) == url, provable by shape:
# lowercase ascii scheme+host (no port/userinfo — IDNA and default-port
# logic can't change them), path of literal PATH_SAFE chars (no '%', so no
# percent-(de)normalization), no dot-segments, optional query of literal
# QUERY_SAFE chars, no fragment/whitespace (ASCII ⇒ NFC-stable). The vast
# majority of discovered links are canonical already, so the per-row
# normalizer only runs on the residue.
_CANONICAL_RE = re.compile(
    r"^https?://"
    r"[a-z0-9]([a-z0-9-]*[a-z0-9])?(\.[a-z0-9]([a-z0-9-]*[a-z0-9])?)*"
    r"/[A-Za-z0-9\-._~!$&'()*+,;=:@/]*"
    r"(\?[A-Za-z0-9\-._~!$&'()*+,;=:@/?]*)?$"
)
# components of an already-normalized URL (no userinfo — '@' routed to the
# per-row fallback)
_NORM_PARTS_RE = re.compile(
    r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#:@]+)(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?$"
)


def _canonical_mask(raw: pd.Series) -> pd.Series:
    """Vectorized proof that normalize(u) == u (see _CANONICAL_RE)."""
    m = raw.str.match(_CANONICAL_RE, na=False)
    # dot-segments change under remove_dot_segments: a '.' or '..' segment
    # terminated by '/', '?' (query start) or end-of-string
    m &= ~raw.str.contains(r"/\.\.?(?:[/?]|$)", regex=True, na=False)
    return m


def _robots_verdicts(rb: RobotRules, paths: pd.Series) -> pd.Series:
    """Vectorized crawler-commons longest-match for one host's rows.

    Literal rule sets (no '*'/'$') vectorize as ordered startswith masks —
    longest pattern first, allow-beats-deny on ties (RFC 9309); wildcard
    rule sets fall back to the per-row matcher."""
    if rb.mode == "allow_all" or (rb.mode == "rules" and not rb.rules):
        return pd.Series(True, index=paths.index)
    if rb.mode == "allow_none":
        return pd.Series(False, index=paths.index)
    if any(("*" in p) or ("$" in p) for _a, p in rb.rules):
        return paths.map(rb.allowed)
    allowed = pd.Series(True, index=paths.index)
    decided = pd.Series(False, index=paths.index)
    for allow, pattern in sorted(rb.rules, key=lambda r: (-len(r[1]), not r[0])):
        hit = paths.str.startswith(pattern) & ~decided
        allowed[hit] = allow
        decided |= hit
    return allowed


def make_gate_udf(cfg: CrawlConfig, robots_bc, rules_bc, allowed_sites: frozenset,
                  emit_dim_cols: bool = False):
    """Build the stateless-gate verdict UDF.

    robots_bc: Broadcast[dict[host_key, RobotRules.to_tuple()]]
    rules_bc:  Broadcast[dict[site, list[(policy,type,pattern)]]]

    Vectorized end-to-end: canonical URLs skip the per-row normalizer
    (`_canonical_mask` proves identity), verdict gates F2-F5 are pandas
    column ops with `np.select` preserving the reference's deny-reason
    precedence (coordinator.rb:648-699), robots matching is grouped per
    host and vectorized for literal rule sets. Per-row Python survives
    only for non-canonical URLs, hosts with wildcard robots rules, and
    sites with crawl rules.
    """

    def _gate_batch(pdf: pd.DataFrame, robots, engines) -> pd.DataFrame:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        raw = pdf["norm_url"]
        needs = pdf["needs_norm"] if "needs_norm" in pdf else pd.Series(False, index=pdf.index)
        needs = needs.fillna(False)

        # --- normalize: vectorized identity proof, per-row residue -------
        # Arrow compute (RE2, C++) for the whole-batch regex work: the
        # pandas object-dtype str accessors run a Python-level re call per
        # row and were the measured bulk of the gate (125k rows/s/core);
        # the same masks/extraction in Arrow kernels run ~20x faster.
        # RE2 vs `re` parity notes: both patterns are anchored and use no
        # backreferences/lookarounds. _CANONICAL_RE runs on RAW candidate
        # urls, where the dialects differ on exactly one input class:
        # Python re's '$' also matches before a trailing '\n', so the old
        # pandas path judged "https://a.test/x\n" canonical and skipped
        # normalization (a bug — normalize strips whitespace, so the raw
        # string was NOT identical to its normalized form); RE2's '$' is
        # end-of-text, so such rows now correctly fall through to
        # try_normalize (pinned by test_gates.py trailing-newline case).
        # _NORM_PARTS_RE runs on normalized text (never a trailing
        # newline), where the dialects agree.
        arr_raw = pa.array(raw.fillna(""), type=pa.string())
        canonical = pd.Series(
            pc.and_(
                pc.match_substring_regex(arr_raw, _CANONICAL_RE.pattern),
                pc.invert(
                    pc.match_substring_regex(arr_raw, r"/\.\.?(?:[/?]|$)")
                ),
            ).to_numpy(zero_copy_only=False),
            index=pdf.index,
        )
        norm = raw.where(~needs | canonical)
        residue = needs & ~canonical
        if residue.any():
            norm.loc[residue] = raw[residue].map(
                lambda u: U.try_normalize(u)[0] if u is not None else None
            )

        # --- components (normalized rows; '@' authority → fallback) ------
        # Arrow extract_regex collapses unparticipating optional groups to
        # "" (pandas gives NaN); the distinctions the verdicts need are
        # recovered exactly: a participating port is never empty (\d+),
        # and the query group participates iff the URL contains '?' (path
        # chars exclude it under the anchored full match).
        arr_norm = pa.array(norm, type=pa.string())
        parts = pc.extract_regex(arr_norm, _NORM_PARTS_RE.pattern)
        scheme_a = pc.struct_field(parts, "scheme")
        host_a = pc.struct_field(parts, "host")
        port_a = pc.struct_field(parts, "port")
        path_a = pc.struct_field(parts, "path")
        query_a = pc.struct_field(parts, "query")
        vec_ok_np = pc.is_valid(scheme_a).to_numpy(zero_copy_only=False)
        vec_ok = pd.Series(vec_ok_np, index=pdf.index)
        no_port = pc.equal(port_a, "")
        # empty path group ⇒ group absent (it requires a leading '/')
        path_a = pc.if_else(pc.equal(path_a, ""), pa.scalar("/"), path_a)
        # url_host_key: DEFAULT_PORTS.get(scheme, 0) when no explicit port
        default_port = pc.case_when(
            pc.make_struct(pc.equal(scheme_a, "http"), pc.equal(scheme_a, "https")),
            pa.scalar("80"), pa.scalar("443"), pa.scalar("0"),
        )
        site_a = pc.binary_join_element_wise(
            scheme_a, "://", host_a,
            pc.if_else(no_port, pa.scalar(""),
                       pc.binary_join_element_wise(":", port_a, "")),
            "",
        )
        hk_a = pc.binary_join_element_wise(
            scheme_a, "://", host_a, ":",
            pc.if_else(no_port, default_port, port_a), "",
        )
        # site is only materialized to pandas when something per-site
        # actually consumes it (crawl rules / the dimension columns);
        # the allowlist check runs on the Arrow array directly
        site = (
            pd.Series(site_a.to_pandas().values, index=pdf.index)
            if (engines or emit_dim_cols)
            else None
        )
        host_key = pd.Series(hk_a.to_pandas().values, index=pdf.index)
        path = pd.Series(
            pc.coalesce(path_a, pa.scalar("/")).to_pandas().values,
            index=pdf.index,
        )

        hasq = pc.and_kleene(
            pc.is_valid(arr_norm),
            pc.greater(pc.count_substring(arr_norm, "?"), 0),
        )
        qlen = pc.if_else(
            hasq, pc.add(pc.utf8_length(query_a), 1), pa.scalar(0, pa.int32())
        )
        request_uri_len = pd.Series(
            pc.coalesce(
                pc.add(pc.utf8_length(path_a), qlen), pa.scalar(0, pa.int32())
            ).to_numpy(zero_copy_only=False),
            index=pdf.index,
        )
        seg_count = pd.Series(
            pc.coalesce(
                pc.count_substring(path_a, "/"), pa.scalar(0, pa.int32())
            ).to_numpy(zero_copy_only=False),
            index=pdf.index,
        )
        # non-empty '&'-separated query params, vectorized
        par_count = pd.Series(
            pc.coalesce(
                pc.count_substring_regex(
                    pc.if_else(hasq, query_a, pa.scalar("")), "[^&]+"
                ),
                pa.scalar(0, pa.int32()),
            ).to_numpy(zero_copy_only=False),
            index=pdf.index,
        )

        # --- robots / crawl rules (only for rows that reach those gates) --
        is_sitemap = pdf["task_type"] == "sitemap"
        site_allowed = pd.Series(
            pc.is_in(
                # explicit string type: pa.array([]) would infer null type,
                # and a sentinel value would punch a hole in the allowlist
                site_a, value_set=pa.array(sorted(allowed_sites), type=pa.string())
            ).to_numpy(zero_copy_only=False),
            index=pdf.index,
        )
        robots_denied = pd.Series(False, index=pdf.index)
        delays = pd.Series(0, index=pdf.index, dtype="int64")
        for hk, idx in host_key[vec_ok].groupby(host_key[vec_ok]).groups.items():
            rb = robots.get(hk)
            if rb is None:
                continue
            if rb.crawl_delay_ms and rb.crawl_delay_ms > 0:
                delays[idx] = int(rb.crawl_delay_ms)
            sub = idx[(site_allowed[idx]) & (~is_sitemap[idx])]
            if len(sub) == 0:
                continue
            robots_denied[sub] = ~_robots_verdicts(rb, path[sub])
        rules_denied = pd.Series(False, index=pdf.index)
        if engines:
            for st, idx in site[vec_ok].groupby(site[vec_ok]).groups.items():
                eng = engines.get(st)
                if eng is None or not eng.rules:
                    continue
                sub = idx[site_allowed[idx] & ~is_sitemap[idx] & ~robots_denied[idx]]
                if len(sub) == 0:
                    continue
                rules_denied[sub] = norm[sub].map(eng.outcome) == "deny"

        # --- verdict with reference precedence (coordinator.rb:648-699) --
        scheme_ok = pd.Series(
            pc.is_in(
                scheme_a, value_set=pa.array(sorted(U.SUPPORTED_SCHEMES))
            ).to_numpy(zero_copy_only=False),
            index=pdf.index,
        )
        reasons = np.select(
            [
                ~scheme_ok,
                request_uri_len > cfg.max_url_length,
                seg_count > cfg.max_url_segments,
                par_count > cfg.max_url_params,
                ~is_sitemap & ~site_allowed,
                ~is_sitemap & robots_denied,
                ~is_sitemap & rules_denied,
            ],
            [
                "incorrect_protocol",
                "link_too_long",
                "link_with_too_many_segments",
                "link_with_too_many_params",
                "domain_filter_denied",
                "robots_txt_disallowed",
                "rule_engine_denied",
            ],
            default=None,
        )
        reasons = pd.Series(reasons, index=pdf.index, dtype=object).where(vec_ok)

        # --- '@'-authority / odd-scheme fallback rows ---------------------
        fb = norm.notna() & ~vec_ok
        if fb.any():
            for i in pdf.index[fb]:
                url = norm.at[i]
                hk = U.url_host_key(url)
                host_key.at[i] = hk
                rb = robots.get(hk)
                if rb is not None and rb.crawl_delay_ms and rb.crawl_delay_ms > 0:
                    delays.at[i] = int(rb.crawl_delay_ms)
                reasons.at[i] = _verdict(
                    url, pdf["task_type"].at[i], cfg, allowed_sites, rb, engines
                )
                if emit_dim_cols:
                    site.at[i] = U.url_site(url)
                    path.at[i] = U.url_path(url)

        out = pdf.copy()
        out["norm_url"] = norm
        out["deny_reason"] = reasons
        out["host_key"] = host_key.where(norm.notna())
        out["crawl_delay_ms"] = delays
        if emit_dim_cols:
            out["_site"] = site.where(norm.notna())
            out["_path"] = path.where(norm.notna())
        return out

    def gate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        robots = {
            k: RobotRules.from_tuple(v)
            for k, v in ((robots_bc.value if robots_bc is not None else None) or {}).items()
        }
        engines = {
            site: RuleEngine.from_specs(site, specs)
            for site, specs in ((rules_bc.value if rules_bc is not None else None) or {}).items()
        }
        for pdf in it:
            yield _gate_batch(pdf, robots, engines)

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


def make_robots_stage_udf(cfg: CrawlConfig, rules_bc):
    """Second gate pass for the robots-DIMENSION mode: rows arrive with a
    ``rules_json`` column (left-joined per host_key from the distributed
    robots dimension) instead of a driver-broadcast robots dict. Applies
    the robots verdict, then the crawl-rules engine, preserving the
    reference's domain → robots → rules precedence (the first pass already
    attributed everything up to domain_filter_denied)."""
    import json

    def stage(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        engines = {
            site: RuleEngine.from_specs(site, specs)
            for site, specs in (rules_bc.value or {}).items()
        }
        for pdf in it:
            reasons = pdf["deny_reason"]
            delays = pdf["crawl_delay_ms"].copy()
            eligible = reasons.isna() & (pdf["task_type"] != "sitemap")
            robots_denied = pd.Series(False, index=pdf.index)
            has_rules = pdf["rules_json"].notna()
            if has_rules.any():
                hk = pdf["host_key"]
                for h, idx in hk[has_rules].groupby(hk[has_rules]).groups.items():
                    rb = RobotRules.from_tuple(json.loads(pdf["rules_json"][idx[0]]))
                    if rb.crawl_delay_ms and rb.crawl_delay_ms > 0:
                        delays[idx] = int(rb.crawl_delay_ms)
                    sub = idx[eligible[idx]]
                    if len(sub):
                        robots_denied[sub] = ~_robots_verdicts(rb, pdf["_path"][sub])
            rules_denied = pd.Series(False, index=pdf.index)
            if engines:
                st = pdf["_site"]
                for s, idx in st[st.notna()].groupby(st[st.notna()]).groups.items():
                    eng = engines.get(s)
                    if eng is None or not eng.rules:
                        continue
                    sub = idx[eligible[idx] & ~robots_denied[idx]]
                    if len(sub):
                        rules_denied[sub] = pdf["norm_url"][sub].map(eng.outcome) == "deny"
            out = pdf.drop(columns=["rules_json", "_site", "_path"])
            out["deny_reason"] = np.select(
                [robots_denied, rules_denied],
                ["robots_txt_disallowed", "rule_engine_denied"],
                default=reasons,
            )
            out["crawl_delay_ms"] = delays
            yield out

    return stage


def apply_gates(
    candidates: DataFrame,
    cfg: CrawlConfig,
    robots_bc,
    rules_bc,
    robots_dim: DataFrame | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stateless gates + depth gate → adds deny_reason/host_key/crawl_delay_ms.

    Depth check placed after the UDF verdict to preserve reason attribution
    (coordinator.rb:684-704).

    ``robots_dim``: the 10^8-host path — per-host robots rules as a
    DataFrame (host_key, rules_json) joined into the candidate stream
    instead of a driver-collected broadcast dict; ``broadcast_dim`` picks
    broadcast vs co-partitioned shuffle join for the dimension.
    """
    allowed = frozenset(cfg.allowed_sites())
    if robots_dim is None:
        schema = StructType(candidates.schema.fields + _GATE_OUT.fields)
        gated = candidates.mapInPandas(
            make_gate_udf(cfg, robots_bc, rules_bc, allowed), schema=schema
        )
        gated = gated.filter(F.col("norm_url").isNotNull())
        if "needs_norm" in gated.columns:
            gated = gated.drop("needs_norm")
    else:
        schema1 = StructType(
            candidates.schema.fields
            + _GATE_OUT.fields
            + [StructField("_site", StringType()), StructField("_path", StringType())]
        )
        # crawl rules deliberately NOT applied in pass 1 (rules_bc=None):
        # the reference checks robots before crawl rules, and robots lives
        # in pass 2 here
        stage1 = candidates.mapInPandas(
            make_gate_udf(cfg, None, None, allowed, emit_dim_cols=True),
            schema=schema1,
        )
        stage1 = stage1.filter(F.col("norm_url").isNotNull())
        if "needs_norm" in stage1.columns:
            stage1 = stage1.drop("needs_norm")
        dim = robots_dim.select("host_key", "rules_json")
        if broadcast_dim:
            dim = F.broadcast(dim)
        joined = stage1.join(dim, on="host_key", how="left")
        schema2 = StructType(
            [f for f in schema1.fields if f.name not in ("needs_norm", "_site", "_path")]
        )
        gated = joined.mapInPandas(make_robots_stage_udf(cfg, rules_bc), schema=schema2)
    return gated.withColumn(
        "deny_reason",
        F.coalesce(
            F.col("deny_reason"),
            F.when(F.col("depth") > cfg.max_crawl_depth, F.lit("link_too_deep")),
        ),
    )
