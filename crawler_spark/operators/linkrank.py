"""Link-graph ranking for crawl prioritization — integer fixed-point
PageRank over the crawl's own link graph.

The reference crawler pops its queue strictly FIFO (BFS); real frontiers
prioritize by link evidence — Common Crawl publishes host-level
centrality ranks for exactly this. This module closes the loop with the
engine's ``frontier_priority_expr`` (operators/politeness.py): rank the
hosts/URLs the crawl has already seen, store ``rank`` on the frontier,
dispatch by it.

Why integer fixed-point: floating-point PageRank sums are
addition-order-dependent, so a distributed run never reproduces exactly —
not across engines, not even across two Spark runs with different
partitioning. With ranks as scaled BIGINTs and per-edge contributions
``(damping * rank) div (100 * outdeg)`` (integer division, all values
positive), every sum is exact and order-independent: the DuckDB oracle
replays K unrolled iterations bit-for-bit, and a 1000-executor run equals
the single-threaded result. Dangling mass (nodes without out-edges) leaks
rather than being redistributed — ranks stay comparable for
prioritization, which is all a frontier needs (documented deviation from
the stochastic-matrix formulation).

Scale shape (10^10 edges): each iteration is ONE shuffle — contributions
partial-aggregate map-side onto ``dst``. ``outdeg`` is computed once and
joined on ``src`` (co-partitioned with the rank join; bucket the edges
table by ``src`` so iterations reuse the layout). The per-iteration
lineage is cut with ``localCheckpoint`` past ``checkpoint_after``
iterations so the unrolled plan never outgrows the optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    checkpoint_after: int = 6,
) -> DataFrame:
    """Integer fixed-point PageRank. Returns (node, rank) with
    ``rank ~ scale * pagerank`` after ``iterations`` synchronous updates
    from a uniform start of ``scale`` per node.

    edges: one row per DISTINCT directed edge (dedup upstream — parallel
    edges would double-count mass).
    """
    base = (100 - damping_pct) * scale // 100
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for i in range(iterations):
        r = ranks.select(F.col("node").alias(src), F.col("rank").alias("_rank"))
        contrib = (
            edges.join(r, src)
            .join(outdeg, src)
            .select(
                F.col(dst).alias("node"),
                F.expr(f"({damping_pct} * _rank) div (100 * outdeg)").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("_m"), F.lit(0))).cast("long").alias("rank"),
        )
        if i + 1 >= checkpoint_after and (i + 1) % checkpoint_after == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def link_edges_from_docs(docs: DataFrame) -> DataFrame:
    """Distinct host→host edges from the crawl docs' indexed ``links``
    column (E16) — the input :func:`pagerank` wants for host-level
    prioritization. Self-loops dropped (a host linking to itself carries
    no cross-host evidence)."""
    host_of = lambda c: F.parse_url(c, F.lit("HOST"))
    return (
        docs.select(host_of(F.col("url")).alias("src"),
                    F.explode("links").alias("_l"))
        .select("src", host_of(F.col("_l")).alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )
