"""Distributed Lloyd k-means over an embedding column.

The reference has no clustering (its only iterative math is the
windowed lstsq, ``/root/reference/src/timeseriesutils/featurize.py:390``);
this is a capability-parity op for the LLM-pipeline surface: k-means is
the backbone of IVF index building (operators/similarity.knn_ivf trains
its coarse quantizer on a driver sample), semantic-dedup clustering, and
corpus topic bucketing.  Unlike ``similarity.ivf_centroids`` (bounded
driver sample, numpy), this one runs Lloyd iterations over the FULL
corpus distributed, with only O(k·d) state ever crossing the driver
boundary.

Determinism (why a SQL oracle can hash-match an "iterative ML" op):

* vectors are quantized once to int64 (``floor(x·10^scale + 0.5)``), so
  every squared-L2 distance is an EXACT int64 — no float summation
  order to drift;
* init is the k lowest-id vectors (k-means|| trades determinism for
  quality; a gate-checked op needs the opposite — callers wanting
  quality init pass ``init_ids``);
* argmin ties break toward the lower centroid index (struct-ordered
  ``least``);
* centroid updates accumulate component sums in DECIMAL(38,0) (exact
  to 38 digits in both engines — int64 SUM would wrap silently in
  Spark while DuckDB's HUGEINT doesn't, diverging on giant clusters),
  divided in double and re-rounded half-up to int64, so the next
  iteration's input is again exact while the MEAN (not the sum) stays
  below 2^53/10^scale — true for any unit-scale data;
* iteration count is FIXED (``n_iter``), not convergence-tested — the
  oracle must run the identical schedule.

Scale shape: each iteration is one map (k·d literal-array distance
expressions, whole-stage codegen, no Python) + one posexplode shuffle of
pre-combined (cluster, dim) partial sums — the exchange carries k·d rows
per map task, never the vectors.  The driver sees k·d ints per
iteration.  Empty clusters keep their previous centroid (documented,
mirrored in SQL via COALESCE).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin


def _quantize(vec_col, scale: int):
    mult = float(10**scale)
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * mult + F.lit(0.5)).cast("bigint")
    )


def _dist_expr(qcol: str, centroid: list[int]):
    """Exact int64 squared L2 distance between the quantized vector
    column and one centroid (literal array, JVM-side fold).  Rendered as
    SQL text: a k×d literal tree built from Column objects costs one
    py4j round trip per literal (the taylor lesson, BASELINE.md round-2
    note); one ``expr()`` parse is ~100× cheaper to construct."""
    arr = ",".join(f"{int(v)}L" for v in centroid)
    return F.expr(
        f"aggregate(zip_with({qcol}, array({arr}), (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS BIGINT), (acc, d) -> acc + d)"
    )


def kmeans_assign(qdf: DataFrame, centroids: list[list[int]], qcol: str = "_q"):
    """Append ``cluster`` (argmin centroid index, ties → lower index) and
    ``dist_q`` (exact int64 squared quantized distance)."""
    pairs = [
        F.struct(_dist_expr(qcol, c).alias("d"), F.lit(j).alias("j"))
        for j, c in enumerate(centroids)
    ]
    best = pairs[0] if len(pairs) == 1 else F.least(*pairs)
    return qdf.select(
        "*", best["j"].alias("cluster"), best["d"].alias("dist_q")
    )


def kmeans_lloyd(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 6,
    init_ids: list | None = None,
) -> DataFrame:
    """Fixed-schedule Lloyd k-means; returns one row per vector:
    (id, cluster, dist_q) after ``n_iter`` update rounds.

    Driver crossings are all bounded: the k init vectors (TakeOrdered of
    k rows) and k·d ints per iteration — never the corpus.
    """
    if k < 1 or n_iter < 0:
        raise ValueError("k must be ≥ 1 and n_iter ≥ 0")
    q = embeddings.select(id_col, _quantize(F.col(vec_col), scale).alias("_q"))
    # one narrow materialization: every iteration re-reads the quantized
    # corpus; at cluster scale this is the cached working set
    q = pin(q)

    if init_ids is None:
        init_rows = q.orderBy(id_col).limit(k).collect()
    else:
        wanted = q.filter(F.col(id_col).isin(list(init_ids)))
        init_rows = wanted.orderBy(id_col).collect()
    if len(init_rows) < k:
        q.unpersist()
        raise ValueError(f"need ≥ {k} vectors to seed {k} clusters")
    centroids = [list(r["_q"]) for r in init_rows[:k]]
    centroids = _lloyd_iterate(q, centroids, n_iter, k)

    out = kmeans_assign(q, centroids).select(id_col, "cluster", "dist_q")
    # the plan still references q; let the caller materialize before the
    # cache is dropped (same caller-owns-cache contract as text.py ops)
    return out


def kmeans_centroids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 6,
) -> list[list[int]]:
    """Final quantized centroids only (k·d ints on the driver) — the
    coarse-quantizer trainer for :func:`~timeseriesutils_spark.operators.
    similarity.knn_ivf_portable`.  Identical schedule and arithmetic to
    :func:`kmeans_lloyd`, so the unrolled SQL twin reproduces the exact
    centroid integers."""
    if k < 1 or n_iter < 0:
        raise ValueError("k must be ≥ 1 and n_iter ≥ 0")
    q = pin(embeddings.select(id_col, _quantize(F.col(vec_col), scale).alias("_q")))
    init_rows = q.orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        q.unpersist()
        raise ValueError(f"need ≥ {k} vectors to seed {k} clusters")
    centroids = _lloyd_iterate(q, [list(r["_q"]) for r in init_rows], n_iter, k)
    q.unpersist()
    return centroids


def _lloyd_iterate(
    q: DataFrame, centroids: list[list[int]], n_iter: int, k: int
) -> list[list[int]]:
    for _ in range(n_iter):
        assigned = kmeans_assign(q, centroids)
        comp = (
            assigned.select("cluster", F.posexplode("_q").alias("_pos", "_x"))
            .groupBy("cluster", "_pos")
            # decimal(38,0) accumulation: Spark's SUM(bigint) wraps
            # silently on int64 overflow while the DuckDB twin sums in
            # HUGEINT — a giant cluster at high quantization scale would
            # diverge exactly when it matters.  DECIMAL sums are exact to
            # 38 digits in both engines (functions/exact.py rationale).
            .agg(
                F.sum(F.col("_x").cast("decimal(38,0)")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "cluster",
                "_pos",
                F.floor(F.col("_s").cast("double") / F.col("_n") + F.lit(0.5))
                .cast("bigint")
                .alias("_c"),
            )
        )
        rows = comp.collect()  # k·d ints — bounded driver state
        new = {j: list(c) for j, c in enumerate(centroids)}  # empty keeps old
        for j in range(k):
            upd = [r for r in rows if r["cluster"] == j]
            if upd:
                vec = list(new[j])
                for r in upd:
                    vec[r["_pos"]] = r["_c"]
                new[j] = vec
        centroids = [new[j] for j in range(k)]
    return centroids


def kmeans_lloyd_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`kmeans_lloyd` (default init): the identical
    fixed iteration schedule unrolled as CTE stages.  Long-form
    (id, dim, component) joins replace the array expressions — same
    exact integer arithmetic, same tie-breaks.
    """
    parts, prev = kmeans_cte_parts(table, id_col, vec_col, k, n_iter, scale)
    final = f"""
df AS (
  SELECT ql.id, {prev}.j,
    CAST(SUM((ql.x - {prev}.c) * (ql.x - {prev}.c)) AS BIGINT) AS dist
  FROM ql JOIN {prev} USING (pos) GROUP BY ql.id, {prev}.j
)
SELECT id AS {id_col}, CAST(j AS INT) AS cluster, dist AS dist_q FROM (
  SELECT id, j, dist, ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, j) AS rn
  FROM df
) WHERE rn = 1
"""
    return "WITH " + ",".join(parts) + "," + final


def kmeans_cte_parts(
    source: str,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int,
    scale: int,
    prefix: str = "",
) -> tuple[list[str], str]:
    """The unrolled-Lloyd CTE chain over relation ``source``, reusable by
    composite twins (:func:`kmeans_lloyd_sql`, the IVF oracle; the PQ
    oracle instantiates it once PER SUBSPACE via ``prefix``, which
    namespaces every CTE so chains can coexist in one WITH).  Returns
    (cte_parts, final_centroid_cte_name); the final CTE has columns
    (j, pos, c) — centroid index, 1-based dimension, quantized int.
    Every stage is AS MATERIALIZED: DuckDB 1.0 inlines plain CTEs, so a
    chain whose stages reference their predecessor more than once
    re-expands EXPONENTIALLY in n_iter (the IVFADC twin at 2+2
    iterations ran >8 min before this; materialized it is sub-second
    — results identical, hashes unchanged)."""
    mult = float(10**scale)
    p = prefix
    parts = [
        f"""
{p}q AS MATERIALIZED (
  SELECT {id_col} AS id,
    [CAST(floor(CAST(x AS DOUBLE) * {mult!r} + 0.5) AS BIGINT) FOR x IN {vec_col}] AS q
  FROM {source}
),
{p}ql AS MATERIALIZED (
  SELECT id, u.pos AS pos, u.x AS x FROM (
    SELECT id, unnest([{{'pos': i, 'x': q[i]}} FOR i IN range(1, len(q) + 1)]) AS u
    FROM {p}q
  )
),
{p}c0 AS MATERIALIZED (  -- init: k lowest-id vectors, cluster index by id rank
  SELECT ids.j, ql.pos, ql.x AS c
  FROM (
    SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT) AS j
    FROM (SELECT id FROM {p}q ORDER BY id LIMIT {k})
  ) ids JOIN {p}ql AS ql USING (id)
)"""
    ]
    prev = f"{p}c0"
    for it in range(1, n_iter + 1):
        parts.append(
            f"""
{p}d{it} AS MATERIALIZED (  -- exact int64 squared distances to {prev}
  SELECT ql.id, {prev}.j,
    CAST(SUM((ql.x - {prev}.c) * (ql.x - {prev}.c)) AS BIGINT) AS dist
  FROM {p}ql AS ql JOIN {prev} USING (pos) GROUP BY ql.id, {prev}.j
),
{p}a{it} AS MATERIALIZED (  -- argmin, ties to lower centroid index
  SELECT id, j AS cluster FROM (
    SELECT id, j, ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, j) AS rn
    FROM {p}d{it}
  ) WHERE rn = 1
),
{p}c{it} AS MATERIALIZED (  -- centroid update: exact sums, half-up re-round; empty keeps old
  SELECT {prev}.j, {prev}.pos,
    COALESCE(
      CAST(floor(CAST(u.s AS DOUBLE) / u.n + 0.5) AS BIGINT),
      {prev}.c) AS c
  FROM {prev} LEFT JOIN (
    SELECT {p}a{it}.cluster AS j, ql.pos,
      CAST(SUM(ql.x) AS DECIMAL(38,0)) AS s, COUNT(*) AS n
    FROM {p}a{it} JOIN {p}ql AS ql USING (id) GROUP BY 1, 2
  ) u ON u.j = {prev}.j AND u.pos = {prev}.pos
)"""
        )
        prev = f"{p}c{it}"
    return parts, prev


def silhouette_audit(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 6,
) -> DataFrame:
    """Per-cluster simplified-silhouette audit of the deterministic
    Lloyd clustering — the cluster-QUALITY gauge next to
    :func:`kmeans_lloyd`'s assignments (and the tuning signal for the
    IVF coarse quantizer and SemDeDup's k ≈ N/cluster rule): per
    vector, with a = distance to its own centroid and b = distance to
    the nearest OTHER centroid,

        s = (b − a) / max(a, b)  =  1 − a/b   (b ≥ a by argmin)

    (the centroid-based "simplified silhouette" — the classic
    all-pairs silhouette is O(n²) and carries no more signal at
    corpus scale; public formulation, e.g. scikit-learn docs).

    Exactness: squared distances to ALL k centroids are exact int64
    (the kmeans_assign machinery); a and b come from one array_sort
    with the (dist, j) tie-break the SQL twin's ROW_NUMBER mirrors;
    per-row s and distance quantize at 1e-9 / 10^-scale before their
    DECIMAL sums.  Plan: the training pass (bounded driver state) +
    ONE projection over the corpus + one k-row aggregation — no joins
    against raw rows.

    Returns (cluster, n, mean_dist, mean_silhouette); silhouette NULL
    at k = 1.
    """
    centroids = kmeans_centroids(embeddings, id_col, vec_col, k, n_iter, scale)
    q = embeddings.select(id_col, _quantize(F.col(vec_col), scale).alias("_q"))
    pairs = [
        F.struct(_dist_expr("_q", c).alias("d"), F.lit(j).alias("j"))
        for j, c in enumerate(centroids)
    ]
    asort = F.array_sort(F.array(*pairs))
    mult = float(10**scale)
    a_d = F.sqrt(asort[0]["d"].cast("double")) / F.lit(mult)
    b_d = (
        F.sqrt(asort[1]["d"].cast("double")) / F.lit(mult)
        if k > 1
        else F.lit(None).cast("double")
    )
    s = F.when(b_d > 0, (b_d - a_d) / b_d).otherwise(
        F.when(b_d.isNotNull(), F.lit(0.0))
    )
    q9 = lambda c: F.floor(c * F.lit(1.0e9) + F.lit(0.5)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    rows = q.select(
        asort[0]["j"].alias("cluster"),
        q9(a_d).alias("_aq"),
        q9(s).alias("_sq"),
    )
    agg = rows.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_aq").alias("_sa"),
        F.sum("_sq").alias("_ss"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    return agg.select(
        "cluster",
        "n",
        (s2d("_sa") / F.lit(1.0e9) / nn).alias("mean_dist"),
        (s2d("_ss") / F.lit(1.0e9) / nn).alias("mean_silhouette"),
    )


def silhouette_audit_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`silhouette_audit` (the unrolled-Lloyd CTE
    chain's final centroids, the same (dist, j) tie-break via
    ROW_NUMBER, the same quantize points)."""
    parts, prev = kmeans_cte_parts(table, id_col, vec_col, k, n_iter, scale)
    mult = float(10**scale)
    a_d = f"(SQRT(CAST(_a AS DOUBLE)) / {mult!r})"
    b_d = f"(SQRT(CAST(_b AS DOUBLE)) / {mult!r})"
    s = (
        f"CASE WHEN {b_d} > 0 THEN ({b_d} - {a_d}) / {b_d}"
        f" WHEN _b IS NOT NULL THEN 0.0 END"
    )
    q9 = lambda e: f"CAST(FLOOR({e} * 1000000000.0 + 0.5) AS DECIMAL(38,0))"  # noqa: E731
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    final = f"""
df AS (
  SELECT ql.id, {prev}.j,
    CAST(SUM((ql.x - {prev}.c) * (ql.x - {prev}.c)) AS BIGINT) AS dist
  FROM ql JOIN {prev} USING (pos) GROUP BY ql.id, {prev}.j
),
ranked AS (
  SELECT id, j, dist,
    ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, j) AS rn
  FROM df
),
ab AS (
  SELECT r1.id, r1.j AS cluster, r1.dist AS _a, r2.dist AS _b
  FROM (SELECT * FROM ranked WHERE rn = 1) r1
  LEFT JOIN (SELECT * FROM ranked WHERE rn = 2) r2 USING (id)
),
rows_ AS (
  SELECT cluster, {q9(a_d)} AS _aq, {q9(s)} AS _sq FROM ab
),
agg AS (
  SELECT cluster, COUNT(*) AS n, SUM(_aq) AS _sa, SUM(_sq) AS _ss
  FROM rows_ GROUP BY cluster
)
SELECT CAST(cluster AS INT) AS cluster, n,
  {s2d('_sa')} / 1000000000.0 / CAST(n AS DOUBLE) AS mean_dist,
  {s2d('_ss')} / 1000000000.0 / CAST(n AS DOUBLE) AS mean_silhouette
FROM agg
"""
    return "WITH " + ",".join(parts) + "," + final


def cluster_balanced_sample(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 6,
    per_cluster: int = 16,
    mode: str = "uniform",
) -> DataFrame:
    """Cluster-balanced subset selection over the embedding space — the
    curation step between clustering and training-set assembly in
    SemDeDup-style pipelines (Abbas et al. 2023 sample within k-means
    clusters) and the prototypicality data-pruning rule of Sorscher et
    al. 2022 ("Beyond neural scaling laws": keep examples by distance
    to their cluster centroid).  Balancing across clusters fixes the
    long-tail starvation a global uniform sample has: every semantic
    region contributes ``per_cluster`` examples regardless of its mass.

    ``mode``:
      * ``uniform`` — md5-deterministic per-cluster sample (the repo's
        portable-hash sampling convention; seedless, engine-exact);
      * ``hard``    — farthest-from-centroid first (keep hard examples,
        the Sorscher rule for large datasets);
      * ``easy``    — nearest-first (keep prototypes, their rule for
        small datasets).

    Scale shape: :func:`kmeans_lloyd` (bounded driver state, pinned
    quantized corpus) + ONE rank window partitioned by cluster — the
    argmax/argmin never leaves the executors; ties are total
    (hash/dist, then id), so both engines pick identical subsets.

    Returns the sampled rows: (id, cluster, dist_q, pick_rank).
    """
    from timeseriesutils_spark.operators.dedup import portable_hash64

    assign = kmeans_lloyd(embeddings, id_col, vec_col, k, n_iter, scale)
    if mode == "uniform":
        order = [portable_hash64(F.col(id_col).cast("string")), F.col(id_col)]
    elif mode == "hard":
        order = [F.col("dist_q").desc(), F.col(id_col)]
    elif mode == "easy":
        order = [F.col("dist_q").asc(), F.col(id_col)]
    else:
        raise ValueError("mode must be uniform | hard | easy")
    w = Window.partitionBy("cluster").orderBy(*order)
    return (
        assign.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= int(per_cluster))
        .select(
            id_col,
            "cluster",
            "dist_q",
            F.col("pick_rank").cast("bigint").alias("pick_rank"),
        )
    )


def cluster_balanced_sample_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    scale: int = 6,
    per_cluster: int = 16,
    mode: str = "uniform",
) -> str:
    """DuckDB twin of :func:`cluster_balanced_sample` — the unrolled
    Lloyd chain as a subquery plus the same total-order rank window."""
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql

    km = kmeans_lloyd_sql(table, id_col, vec_col, k, n_iter, scale)
    if mode == "uniform":
        order = f"{portable_hash64_sql(f'CAST({id_col} AS VARCHAR)')}, {id_col}"
    elif mode == "hard":
        order = f"dist_q DESC, {id_col}"
    elif mode == "easy":
        order = f"dist_q ASC, {id_col}"
    else:
        raise ValueError("mode must be uniform | hard | easy")
    return f"""
SELECT {id_col}, cluster, dist_q, CAST(pick_rank AS BIGINT) AS pick_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
    ORDER BY {order}) AS pick_rank
  FROM ({km})
)
WHERE pick_rank <= {int(per_cluster)}
"""
