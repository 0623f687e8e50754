"""Distributed PageRank with integer-exact power iterations.

The reference has no graph ops (its only iterative math is the windowed
lstsq, ``/root/reference/src/timeseriesutils/featurize.py:390``); this
is a capability-parity op for corpus curation: link-graph centrality is
a standard quality weight for web-scale training data (which pages'
text to trust), and the same join+aggregate iteration shape underlies
label propagation and the large-star rounds in
``operators/dedup.connected_components``.

Exactness design (why an iterative graph algorithm can hash-match a SQL
oracle): ranks live as int64 at ``scale`` (default 10⁹ units of
probability mass), and every update uses only integer ops defined
identically in Spark and DuckDB —

    contrib(u)   = r_u div outdeg(u)                (integer division)
    r'_v         = base + (d_num · Σ contrib) div d_den
    base         = ((scale div N) · (d_den − d_num)) div d_den

with d = d_num/d_den (default 17/20 = 0.85).  No float touches the
recurrence, so partitioning, join order and engine cannot perturb a
single unit.  The floor-division mass leakage (≤ outdeg(u)−1 units per
node per round, i.e. ~10⁻⁹·deg relative) is a DEFINED part of the
semantics, mirrored bit-for-bit in the oracle — the standard float
formulation leaks accuracy nondeterministically instead.

Scale shape per iteration: one equi-join of ranks onto edges + one
map-combinable groupBy(dst) sum + one left join back to the node set —
all keyed by node id, so successive iterations reuse the same hash
partitioning (AQE keeps the exchanges).  The iteration count is fixed
(``n_iter``), the whole computation is ONE lazy plan, and the only
driver crossing is the node count (one scalar).

Dangling nodes (out-degree 0) contribute nothing (mass absorbed — the
"dangling mass dropped" simplification; callers needing the strict
random surfer add reverse edges or a sink node).  Nodes with no
in-edges settle at ``base``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin
from timeseriesutils_spark.functions.checkpoint import parquet_checkpoint


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    d_num: int = 17,
    d_den: int = 20,
    scale: int = 10**9,
    broadcast_nodes: bool = True,
    durable_every: int = 2,
) -> DataFrame:
    """Fixed-schedule integer PageRank; returns (node, rank_q, rank)
    where ``rank_q`` is the exact int64 mass and ``rank = rank_q/scale``
    (a deterministic double derived from the exact int).

    ``broadcast_nodes``: hint the node-sized frames (ranks, incoming
    sums) into broadcast joins so the edge set never re-shuffles across
    iterations — the right call while the node set fits an executor
    (nodes ≪ edges on real graphs; the hint is needed explicitly because
    the per-round lineage checkpoint erases size stats).  Disable for
    graphs whose node list itself is beyond broadcast range; the rounds
    then run as co-partitioned shuffle joins."""
    if n_iter < 0 or not (0 < d_num < d_den):
        raise ValueError("need n_iter ≥ 0 and 0 < d_num < d_den")
    e = edges.select(
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    ).distinct()
    if not broadcast_nodes:
        # co-partitioned path: pin the cached edge set to
        # hashpartitioning(src) (+ per-partition sort) so every round's
        # ranks⋈edges SortMergeJoin finds its distribution AND ordering
        # already satisfied from cache and shuffles only the node-sized
        # rank side.  Without this, distinct() leaves the cache
        # partitioned on (src, dst) and the multi-TB edge set would
        # re-exchange EVERY round — the one shape that cannot survive a
        # multi-billion-node graph.  One extra exchange at build time,
        # amortized over all rounds (plan-pinned in tests/test_graph.py).
        e = e.repartition("src").sortWithinPartitions("src")
    # persist the loop-invariant frames: the edge set is read every
    # iteration, and nodes/deg (node-sized, tiny next to edges) would
    # otherwise re-run their distinct/groupBy shuffles once per
    # iteration — measured 10.6 → 2.9 s at sf0.1 for 5 rounds
    # (cache policy: caller owns, same as text.py ops)
    e = pin(e)
    nodes = pin(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = pin(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")))
    n_nodes = nodes.count()  # one scalar — the only driver crossing
    if n_nodes == 0:
        raise ValueError("pagerank needs a non-empty edge set")
    init_q = scale // n_nodes
    base_q = (init_q * (d_den - d_num)) // d_den

    bcast = F.broadcast if broadcast_nodes else (lambda df: df)
    ranks = nodes.select("node", F.lit(init_q).cast("bigint").alias("rank_q"))
    # Scope the loop's shuffle width to the node count: every per-round
    # exchange (the incoming-mass groupBy, the rank rebuild) moves
    # node-sized data, and running those at the session's full
    # shuffle.partitions is pure task-scheduling overhead when nodes are
    # small (AQE's coalescing keeps >= defaultParallelism partitions by
    # default — parallelismFirst — so it never shrinks these).  ~250k
    # nodes per partition keeps partitions well under memory at any
    # scale; never widen beyond the session setting.  Measured 5.0 →
    # 2.8 s warm at sf0.1 (21k nodes: 32 → 8-way rounds).
    # NOTE: this mutates session-global conf for the duration of the
    # loop (restored in finally).  Safe because every round inside the
    # loop materializes eagerly (parquet checkpoint) before the restore;
    # on a session shared with CONCURRENT queries the narrowed width
    # would leak to them for the loop's duration — run pagerank on its
    # own session (or accept narrower shuffles) in that deployment.
    spark = edges.sparkSession
    cur_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = min(int(cur_parts), max(8, n_nodes // 250_000))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        ranks = _pagerank_rounds(
            ranks, nodes, deg, e, bcast, n_iter, base_q, d_num, d_den,
            durable_every,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur_parts)
    return ranks.select(
        "node",
        "rank_q",
        (F.col("rank_q").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def _pagerank_one_round(ranks, nodes, deg, e, bcast, base_q, d_num, d_den):
    """One lazy power-iteration round — split out so the per-round plan
    shape (node-sized sides broadcast into the edge join) stays
    assertable after the loop checkpoints every round eagerly
    (tests/test_plans.py::test_pagerank_rounds_broadcast_not_smj)."""
    rd = ranks.join(bcast(deg), ranks.node == deg.src).select(
        "src", "rank_q", "outdeg"
    )
    contrib = e.join(bcast(rd), "src").select(
        "dst", F.expr("rank_q div outdeg").alias("c")
    )
    inc = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
    return nodes.join(bcast(inc), nodes.node == inc.dst, "left").select(
        "node",
        (
            F.lit(base_q).cast("bigint")
            + F.expr(f"({d_num} * coalesce(inc, CAST(0 AS BIGINT))) div {d_den}")
        ).alias("rank_q"),
    )


def _pagerank_rounds(
    ranks, nodes, deg, e, bcast, n_iter, base_q, d_num, d_den,
    durable_every=2,
):
    de = max(1, int(durable_every))
    for it in range(n_iter):
        ranks = _pagerank_one_round(
            ranks, nodes, deg, e, bcast, base_q, d_num, d_den
        )
        # truncate lineage between rounds: without this the final plan
        # nests n_iter levels of joins and Catalyst re-optimizes the
        # whole tree at every reference.  The checkpointed frame is
        # node-sized — executor-local storage, nothing to the driver;
        # values are exact ints, so materialization cannot perturb
        # them.  (10.6 → 4.6 s warm at sf0.1 together with the
        # explicit broadcast hints above; ~0.6 s/round after the
        # 1.7 s edge-dedup setup.)
        # coalesce first: the rank frame is tiny next to the edge set,
        # and every subsequent stage over it pays per-task overhead ×
        # partition count.
        # The LAST round is checkpointed too (eager): the caller narrows
        # spark.sql.shuffle.partitions around this loop and restores it
        # on return, so every round's exchange must MATERIALIZE before
        # the restore — a lazily-returned final round would execute
        # under the restored (wide) setting and miss the narrowing.
        # Durable-tier CADENCE (round-14, the label_propagation
        # precedent): a durable parquet frame every ``durable_every``
        # rounds + the last; alternating rounds take the executor-pinned
        # localCheckpoint — recovery replays at most durable_every − 1
        # rounds from the last durable frame, still cluster-safe, at a
        # fraction of the per-round write/read tax.
        if it % de == de - 1 or it == int(n_iter) - 1:
            ranks = parquet_checkpoint(ranks.coalesce(8), "pagerank")
        else:
            ranks = ranks.coalesce(8).localCheckpoint(eager=True)
    return ranks


def pagerank_sql(
    edges_sql: str,
    n_iter: int = 5,
    d_num: int = 17,
    d_den: int = 20,
    scale: int = 10**9,
) -> str:
    """DuckDB twin of :func:`pagerank`: the identical fixed iteration
    schedule unrolled as CTE stages over ``edges_sql`` (a SELECT
    producing ``src, dst``).  Integer ``//`` matches Spark's ``div`` on
    the non-negative operands this recurrence produces."""
    base = f"(({scale} // n) * {d_den - d_num}) // {d_den}"
    parts = [
        f"""
e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
      FROM ({edges_sql})),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
p AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS rank_q
       FROM nodes CROSS JOIN p)"""
    ]
    prev = "r0"
    for it in range(1, n_iter + 1):
        parts.append(
            f"""
c{it} AS (SELECT e.dst, {prev}.rank_q // d.outdeg AS c
       FROM {prev} JOIN deg d ON {prev}.node = d.src JOIN e ON e.src = d.src),
i{it} AS (SELECT dst, SUM(c) AS inc FROM c{it} GROUP BY dst),
r{it} AS (SELECT node,
         CAST({base} + ({d_num} * COALESCE(inc, 0)) // {d_den} AS BIGINT) AS rank_q
       FROM nodes CROSS JOIN p LEFT JOIN i{it} ON node = i{it}.dst)"""
        )
        prev = f"r{it}"
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT node, rank_q, CAST(rank_q AS DOUBLE) / {float(scale)!r} AS rank
FROM {prev}
"""
    )


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    persist_edges: bool = False,
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation.

    ``edges`` is an undirected simple graph: one row per edge, src <
    dst, no duplicates (callers dedup upstream).  Returns (node,
    n_triangles) for every node in at least one triangle.

    The MPC-standard orientation trick: direct every edge from its
    lower-(degree, id) endpoint to the higher one, then count directed
    wedges a->b->c closed by a->c.  Each triangle is generated exactly
    once (from its unique minimum-(degree, id) corner), and the wedge
    join's fan-out per node is bounded by its *oriented* out-degree —
    O(sqrt(m)) on any graph (arboricity bound), so no hub explosion at
    scale: a celebrity node of degree 10^6 emits wedges only toward
    even-higher-degree nodes, not 10^12 pairs.

    All joins are int64 equi-joins (node ids / id pairs); the degree
    frame is node-sized.  Exact integer arithmetic end-to-end — the
    DuckDB twin (:func:`triangle_count_sql`) hash-matches bit-for-bit.

    ``e`` feeds degree-counting twice plus the orientation, and ``o``
    feeds both wedge sides plus the closing join.  By default the forks
    recompute: measured at sf0.1, the recomputed pipeline (1.97 s warm)
    beats the persisted one (4.0 s) — persists serialize the DAG into
    materialization barriers, while the replayed upstream is a cheap
    scan+distinct.  ``persist_edges=True`` flips to pinning both frames
    (functions/cache.pin) for graphs whose edge construction is itself
    expensive (billion-edge joins at 100 TB) — the standard
    recompute-vs-materialize tradeoff, exposed not hard-coded.
    """
    P = pin if persist_edges else (lambda df: df)
    e = P(edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v")))
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    o = P(
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                F.struct("du", "u") < F.struct("dv", "v"), F.col("u")
            ).otherwise(F.col("v")).alias("a"),
            F.when(
                F.struct("du", "u") < F.struct("dv", "v"), F.col("v")
            ).otherwise(F.col("u")).alias("b"),
        )
    )
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedge = e1.join(e2, "y")
    closed = wedge.join(
        o.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    corners = (
        closed.select(F.col("x").alias("node"))
        .unionAll(closed.select(F.col("y").alias("node")))
        .unionAll(closed.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_count_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_count` over ``edges_sql`` (a
    SELECT producing columns src, dst with src < dst, distinct)."""
    return f"""
WITH e AS (SELECT src AS u, dst AS v FROM ({edges_sql})),
deg AS (
  SELECT n, COUNT(*) AS d
  FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n
),
o AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS a,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS b
  FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v
),
closed AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM o e1 JOIN o e2 ON e1.b = e2.a
  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM closed
  UNION ALL SELECT y FROM closed
  UNION ALL SELECT z FROM closed
)
SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node
"""


def adamic_adar(
    edges: DataFrame,
    top_k: int = 50,
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected edge list
    (``src < dst`` convention, the triangle_count contract): for every
    wedge-connected node pair, score the likelihood of a (future) link
    by their common neighbors, weighting rare hubs up:

        AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1 / ln(deg z)

    (Adamic & Adar 2003).  Every common neighbor has deg ≥ 2, so
    ln(deg) > 0 except deg = 2 ... ln 2 ≈ 0.693 — no singularity.

    Exactness: ln(deg) is floor-quantized at 1e-9 (the libm rule),
    the reciprocal is re-quantized at 1e-9, and pair scores are exact
    int64 sums of those quanta — aggregation order free; the global
    top-k orders by the INTEGER score then (src, dst), fully
    deterministic.

    Scale shape: one degree aggregation, one wedge self-join on the
    shared neighbor (the same sqrt(m)-bounded fan-out triangle_count
    exploits — hub z contributes deg_z² wedges, which is why real
    deployments pre-filter supernodes), one groupBy(pair), one
    TakeOrderedAndProject.  ``already_linked`` marks pairs that are
    existing edges (link PREDICTION reads the false rows).

    Returns (src, dst, common, aa_score, already_linked) — top_k rows.
    """
    # duplicate edges would double-count degrees and fan out the
    # already_linked join — enforce the distinct-edge contract here
    e = edges.select("src", "dst").distinct()
    adj = pin(
        e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(
            e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
    )
    # deg-1 nodes can never be common neighbors, and 1/ln(1) is a
    # division by zero — drop them before the weight evaluates
    deg = adj.groupBy("nbr").agg(F.count(F.lit(1)).alias("_deg")).filter(
        F.col("_deg") >= 2
    )
    q9 = 1.0e9
    lnq = F.floor(F.log(F.col("_deg").cast("double")) * F.lit(q9) + F.lit(0.5)) / F.lit(q9)
    w = deg.select(
        "nbr",
        F.floor(F.lit(1.0) / lnq * F.lit(q9) + F.lit(0.5))
        .cast("bigint")
        .alias("_wq"),
    )
    wedges = (
        adj.alias("a")
        .join(adj.alias("b"), "nbr")
        .where(F.col("a.node") < F.col("b.node"))
        .select(
            F.col("a.node").alias("src"),
            F.col("b.node").alias("dst"),
            F.col("nbr"),
        )
    )
    scored = (
        wedges.join(w, "nbr")
        .groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("_wq").alias("_aaq"),
        )
    )
    linked = scored.join(
        e.withColumn("_e", F.lit(True)), ["src", "dst"], "left"
    ).select(
        "src",
        "dst",
        "common",
        "_aaq",
        F.coalesce(F.col("_e"), F.lit(False)).alias("already_linked"),
    )
    out = linked.orderBy(
        F.col("_aaq").desc(), F.col("src"), F.col("dst")
    ).limit(top_k)
    return out.select(
        "src",
        "dst",
        "common",
        (F.col("_aaq").cast("double") / F.lit(q9)).alias("aa_score"),
        "already_linked",
    )


def adamic_adar_sql(edges_sql: str, top_k: int = 50) -> str:
    """DuckDB twin of :func:`adamic_adar` (same double quantization,
    same integer ordering)."""
    return f"""
WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
adj AS (
  SELECT src AS node, dst AS nbr FROM e
  UNION ALL
  SELECT dst AS node, src AS nbr FROM e
),
deg AS (
  SELECT nbr, COUNT(*) AS _deg FROM adj GROUP BY nbr HAVING COUNT(*) >= 2
),
w AS (
  SELECT nbr,
    CAST(FLOOR(1.0 / (FLOOR(LN(CAST(_deg AS DOUBLE)) * 1000000000.0 + 0.5)
                      / 1000000000.0) * 1000000000.0 + 0.5) AS BIGINT) AS _wq
  FROM deg
),
wedges AS (
  SELECT a.node AS src, b.node AS dst, a.nbr
  FROM adj a JOIN adj b USING (nbr)
  WHERE a.node < b.node
),
scored AS (
  SELECT src, dst, COUNT(*) AS common, CAST(SUM(_wq) AS BIGINT) AS _aaq
  FROM wedges JOIN w USING (nbr)
  GROUP BY src, dst
),
linked AS (
  SELECT s.*, COALESCE(e2._e, FALSE) AS already_linked
  FROM scored s
  LEFT JOIN (SELECT src, dst, TRUE AS _e FROM e) e2 USING (src, dst)
)
SELECT src, dst, common,
  CAST(_aaq AS DOUBLE) / 1000000000.0 AS aa_score,
  already_linked
FROM linked
ORDER BY _aaq DESC, src, dst
LIMIT {int(top_k)}
"""


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    durable_every: int = 2,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007) over an undirected edge list (``src < dst``
    distinct, the triangle_count contract): every node starts in its
    own community and each round adopts the most frequent label among
    its neighbors — the standard near-linear-time community baseline
    (pagerank ranks nodes, triangle_count measures closure; this
    PARTITIONS the graph).

    Determinism (the published algorithm leaves ties to chance; this
    implementation pins them): synchronous rounds with a fixed
    ``n_iter``, vote argmax broken by (count DESC, label ASC), and
    node ids as initial labels — both engines walk identical label
    states, so the result is exact and the DuckDB twin hash-matches.
    Synchronous LPA can oscillate on bipartite structure (the paper's
    §3 note); a fixed round count makes that deterministic too.

    Scale shape: per round one adj⋈labels hash join (adjacency pinned
    once, labels are (node, label) pairs), one map-combinable
    (node, label) count, one per-node argmax window over the
    vote-distinct frame, then a lineage checkpoint (the pagerank
    precedent — each round's labels feed two consumers next round).
    At 100 TB scale: rounds are Pregel supersteps; nothing all-pairs.

    Returns (node, community, community_size) after ``n_iter`` rounds.
    """
    from pyspark.sql import Window

    from timeseriesutils_spark.functions.cache import pin

    e = edges.select("src", "dst").distinct()
    adj = pin(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    labels = adj.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    labels = parquet_checkpoint(labels, "lpa0")
    wv = Window.partitionBy("node").orderBy(
        F.col("_cnt").desc(), F.col("community").asc()
    )
    for _i in range(int(n_iter)):
        votes = adj.join(
            labels.select(
                F.col("node").alias("dst"), F.col("community")
            ),
            "dst",
        ).select(F.col("src").alias("node"), "community")
        counts = votes.groupBy("node", "community").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        labels = (
            counts.select(
                "node", "community", F.row_number().over(wv).alias("_rn")
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # durable cut every SECOND round (and on the final one): the
        # r13 every-round promotion cost +2.9 s (5 parquet write/read
        # round-trips on a node-sized frame); alternating rounds take
        # the executor-pinned localCheckpoint instead, so recovery
        # replays at most ONE round from the last durable frame —
        # still cluster-safe — at half the durability tax (measured in
        # BASELINE.md round-14).
        de = max(1, int(durable_every))
        if _i % de == de - 1 or _i == int(n_iter) - 1:
            labels = parquet_checkpoint(labels, "lpa")
        else:
            labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("community").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(F.broadcast(sizes), "community").select(
        "node", "community", "community_size"
    )


def label_propagation_sql(edges_sql: str, n_iter: int = 5) -> str:
    """DuckDB twin of :func:`label_propagation` (same synchronous
    rounds unrolled as MATERIALIZED CTEs, same tiebreak)."""
    K = int(n_iter)
    ctes = [
        f"""e AS MATERIALIZED (
  SELECT src, dst FROM (SELECT DISTINCT src, dst FROM ({edges_sql}))
  UNION ALL
  SELECT dst AS src, src AS dst FROM (SELECT DISTINCT src, dst FROM ({edges_sql}))
)""",
        """l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS community FROM e
)""",
    ]
    for k in range(1, K + 1):
        ctes.append(
            f"""l{k} AS MATERIALIZED (
  SELECT node, community FROM (
    SELECT e.src AS node, l.community, COUNT(*) AS _cnt,
      ROW_NUMBER() OVER (PARTITION BY e.src
                         ORDER BY COUNT(*) DESC, l.community ASC) AS _rn
    FROM e JOIN l{k - 1} l ON l.node = e.dst
    GROUP BY e.src, l.community
  ) WHERE _rn = 1
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT l.node, l.community, s.community_size
FROM l{K} l JOIN (
  SELECT community, COUNT(*) AS community_size FROM l{K} GROUP BY community
) s USING (community)"""
    )
