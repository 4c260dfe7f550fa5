"""Integer fixed-point PageRank (operators/linkrank.py) vs an independent
single-threaded reference loop, plus the docs→edges extractor."""

from crawler_spark.operators.linkrank import link_edges_from_docs, pagerank


def _reference_pagerank(edges, iterations, damping_pct=85, scale=1_000_000):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (100 - damping_pct) * scale // 100
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        mass = {n: 0 for n in nodes}
        for u, v in edges:
            mass[v] += (damping_pct * rank[u]) // (100 * outdeg[u])
        rank = {n: base + mass[n] for n in nodes}
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d is never linked: rank decays to base
    ("c", "e"),            # e is dangling: its mass leaks (documented)
]


def test_pagerank_matches_reference_loop(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    for iters in (1, 3, 5):
        got = {r["node"]: r["rank"] for r in pagerank(df, iterations=iters).collect()}
        assert got == _reference_pagerank(EDGES, iters)


def test_pagerank_is_partitioning_invariant(spark):
    # the whole point of integer fixed-point: any partitioning, same bits
    df = spark.createDataFrame(EDGES, "src string, dst string")
    one = {r["node"]: r["rank"]
           for r in pagerank(df.coalesce(1), iterations=3).collect()}
    many = {r["node"]: r["rank"]
            for r in pagerank(df.repartition(16, "dst"), iterations=3).collect()}
    assert one == many


def test_pagerank_ordering_reflects_link_evidence(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    # c has 3 in-edges, a and e have 1, b has 1 (from the half of a), d none
    assert got["c"] > got["a"] > got["d"]
    assert got["d"] == 150_000  # pure base after decay


def test_link_edges_from_docs(spark):
    docs = spark.createDataFrame(
        [
            ("https://x.test/", ["https://y.test/a", "https://x.test/self",
                                 "https://z.test/"]),
            ("https://y.test/p", ["https://z.test/"]),
            ("https://y.test/q", ["https://z.test/"]),  # dup edge collapses
        ],
        "url string, links array<string>",
    )
    got = {(r["src"], r["dst"]) for r in link_edges_from_docs(docs).collect()}
    assert got == {("x.test", "y.test"), ("x.test", "z.test"),
                   ("y.test", "z.test")}
