"""Integer-exact PageRank (operators/graph): exact equality with a
pure-Python reference of the same recurrence, structure sanity, and
determinism under repartitioning."""

from __future__ import annotations

import pytest

from timeseriesutils_spark.operators.graph import pagerank


def _py_pagerank(edges, n_iter=5, d_num=17, d_den=20, scale=10**9):
    """The operator's documented recurrence, straight-line Python."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    outdeg = {}
    for u, _ in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    n = len(nodes)
    init = scale // n
    base = (init * (d_den - d_num)) // d_den
    r = {v: init for v in nodes}
    for _ in range(n_iter):
        inc = {v: 0 for v in nodes}
        for u, v in e:
            inc[v] += r[u] // outdeg[u]
        r = {v: base + (d_num * inc[v]) // d_den for v in nodes}
    return r


GRAPH = [
    (1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (1, 4), (5, 1),  # 5 dangles into 1
    (3, 4), (4, 3),
]


def test_pagerank_matches_integer_reference(spark):
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {r.node: r.rank_q for r in pagerank(df, n_iter=5).collect()}
    assert got == _py_pagerank(GRAPH, n_iter=5)


def test_pagerank_deterministic_under_repartition(spark):
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    a = sorted(map(tuple, pagerank(df, n_iter=4).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(5), n_iter=4).collect()))
    assert a == b


def test_pagerank_star_center_wins(spark):
    # undirected star: the hub must out-rank every leaf
    edges = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_q for r in pagerank(df, n_iter=6).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)


def test_pagerank_validates(spark):
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, n_iter=-1)
    with pytest.raises(ValueError):
        pagerank(df, d_num=21, d_den=20)


def test_pagerank_copartitioned_equals_broadcast(spark):
    """broadcast_nodes=False (the multi-billion-node path) must produce
    bit-identical ranks to the broadcast default — the recurrence is
    integer-exact, so the join strategy cannot perturb a single unit."""
    df = spark.createDataFrame(GRAPH, "src long, dst long")
    a = sorted(map(tuple, pagerank(df, n_iter=5, broadcast_nodes=True).collect()))
    b = sorted(map(tuple, pagerank(df, n_iter=5, broadcast_nodes=False).collect()))
    assert a == b
    assert {r[0]: r[1] for r in b} == _py_pagerank(GRAPH, n_iter=5)


def test_pagerank_copartitioned_edges_shuffle_once(spark):
    """Plan pin for the co-partitioned path: the cached edge set is
    hashpartitioned on src at build time, so a round's ranks⋈edges join
    must NOT re-exchange the edge scan — at scale the edge set is the
    multi-TB side and re-shuffling it per round is the one shape that
    cannot survive.  pagerank() now checkpoints every round eagerly
    (r5 ADVICE laziness fix), so assert on a LAZY round built exactly
    the way the operator builds it: no Exchange above the edge
    InMemoryTableScan referencing its src attribute."""
    import re

    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.graph import _pagerank_one_round

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.createDataFrame(GRAPH, "src long, dst long")
        e = (
            df.select("src", "dst")
            .distinct()
            .repartition("src")
            .sortWithinPartitions("src")
            .cache()
        )
        e.count()
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        ranks = nodes.select("node", F.lit(10**6).cast("bigint").alias("rank_q"))
        out = _pagerank_one_round(
            ranks, nodes, deg, e, lambda x: x, 50, 17, 20
        )
        lines = out._jdf.queryExecution().executedPlan().toString().splitlines()
        scan_idx = [
            i
            for i, l in enumerate(lines)
            if "InMemoryTableScan" in l and re.search(r"\[src#\d+L?, dst#\d+", l)
        ]
        assert scan_idx, "edge InMemoryTableScan not found in plan"
        i = scan_idx[0]
        m = re.search(r"src#(\d+)", lines[i])
        key = f"src#{m.group(1)}"
        # tree printing is top-down: a fresh shuffle of the cached edge
        # scan would appear as an Exchange line above it, keyed on the
        # scan's own src attribute
        offending = [
            l for l in lines[:i] if "Exchange" in l and key in l and "Reused" not in l
        ]
        assert not offending, offending
        e.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles (each node in 3); a pendant edge adds none;
    a hub star with no closing edges has zero triangles."""
    from timeseriesutils_spark.operators.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pendant = [(4, 5)]
    star = [(10, n) for n in range(11, 31)]
    edges = spark.createDataFrame(k4 + pendant + star, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_matches_bruteforce(spark):
    """Random G(n, p): oriented-wedge count == brute-force enumeration."""
    import itertools
    import random

    from timeseriesutils_spark.operators.graph import triangle_count

    rng = random.Random(11)
    n = 40
    edges = [
        (u, v) for u, v in itertools.combinations(range(n), 2) if rng.random() < 0.15
    ]
    eset = set(edges)
    want = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == want
