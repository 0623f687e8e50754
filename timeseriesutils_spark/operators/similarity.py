"""Similarity search over embedding columns (array<float>).

  * knn_bruteforce — exact top-k cosine: query-set × corpus join with a
    JVM-side quantized-int dot product (zip_with + aggregate; NO Python),
    then per-query top-k window.  Cost |Q|·|C| — right for small query
    sets or as the rerank stage.  With a broadcast query side this is a
    single scan of the corpus: the 100 TB-corpus pattern.
  * knn_lsh_buckets — scale path: random-hyperplane LSH (deterministic
    seeded planes, built as literal arrays) buckets the corpus; queries
    probe their bucket only, then exact rerank inside.  Recall < 1,
    tunable by bits/tables.

The dot/norm accumulate through quantized int64 so scores are
bit-identical across partitionings AND engines (integer addition is
associative; see _QUANT below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dsum, dsum_sql

# Quantization unit for exact integer accumulation: each double product is
# mapped to int64 units of 1e-14 via floor(x·1e14 + 0.5).  Every step is a
# deterministic IEEE double op (multiply, add, floor) that Spark and DuckDB
# compute identically, and the int64 sum is exact and order-independent —
# unlike a double sum (order-dependent) or a double→DECIMAL cast (Spark
# rounds the shortest string repr, DuckDB the binary value: off-by-1-ulp).
# Headroom: |product|·1e14 ≤ ~1e16 per element, ≤ ~1e18 per 64-dim sum —
# inside int64.
_QUANT = 1e14


def _dot_dec(a, b):
    """Order-independent quantized dot product of two float-array columns,
    as double (units of 1/_QUANT)."""
    prods = F.zip_with(
        a, b, lambda x, y: F.floor(x.cast("double") * y.cast("double") * _QUANT + 0.5)
    )
    return (
        F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, p: acc + p).cast("double")
        / _QUANT
    )


def cosine(a, b):
    return _dot_dec(a, b) / (F.sqrt(_dot_dec(a, a)) * F.sqrt(_dot_dec(b, b)))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, vec_id, cos) — k rows per query, ties broken by
    vec_id for determinism.  The query side is broadcast: one pass over
    the (arbitrarily large) corpus, no corpus shuffle.

    ``exclude_self`` (default True) drops the corpus row whose id equals
    the query id — correct when queries are drawn from the corpus (a
    vector's nearest neighbor is trivially itself).  Set False when query
    ids live in an independent namespace: an id collision there is a
    coincidence, not an identity, and the neighbor must be kept.
    """
    # norms are per-ROW quantities: compute them in each side's projection
    # (once per vector), not inside the pair expression (once per pair —
    # 3× the dot-product work of the join stage)
    q = queries.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", F.sqrt(_dot_dec(F.col("_qv"), F.col("_qv"))))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")).withColumn(
        "_cn", F.sqrt(_dot_dec(F.col("_cv"), F.col("_cv")))
    )
    cond = F.col(query_id) != F.col(id_col) if exclude_self else F.lit(True)
    scored = c.join(F.broadcast(q), cond).select(
        query_id,
        id_col,
        (_dot_dec(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos", "rn")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    bits: int = 8,
    dim: int = 64,
    tables: int = 4,
    max_bucket: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (a < b) by embedding cosine ≥ threshold — the
    semantic-dedup tier above MinHash/SimHash.

    ``method='lsh'`` (default — the 100 TB path): multi-table sign-LSH.
    Each of ``tables`` tables hashes vectors with its own ``bits`` seeded
    hyperplanes; pairs sharing a bucket in ≥1 table are scored with the
    exact quantized cosine, inside the bucket (vectors shuffle T× total;
    pair rows never carry vectors).  Scored volume ~ T·N²/2^bits vs N²
    all-pairs; recall for a pair at angle θ is 1−(1−p^bits)^tables with
    p = 1−θ/π (pinned against the exact tier in tests/test_llm_ops.py).
    ``method='exact'``: block outer product — vectors are assigned to
    ``n_blocks`` blocks (id mod B), every unordered block pair (p ≤ q)
    becomes one task, and each task scores its m×n pair tile in ONE
    vectorized numpy kernel (Arrow batch in, quantized-int64 math — the
    identical IEEE sequence the expression/oracle paths compute, so
    results stay bit-exact).  Replication factor is B (each vector joins
    B tiles): total work O(N²·d / cluster), no BroadcastNestedLoopJoin,
    no per-pair interpreted expressions.  Measured 17× faster than the
    theta-join form at sf0.1.  At 100 TB pick B ≈ √(N·d / tile_budget).
    O(N²·d) total work: the verify tier / small-corpus tier, not the
    default.

    Tuning rule (measured, BASELINE.md round-5 scaling study): ``bits``
    must grow with the corpus — with FIXED bits the per-table bucket
    count is constant, buckets fill as N/2^bits, and the in-bucket tile
    kernels turn quadratic (observed 12× cost for 4× data once buckets
    reached ~500 vectors).  Pick bits ≈ log2(N / target_bucket) with
    target_bucket ~ 32-64; scaling bits 8→10→12 across a 4×→16×→64×
    corpus kept cost near-linear (2.2 → 2.8 → 13.6 s).  ``max_bucket``
    is the guard against skewed buckets, not a substitute for sizing.
    """
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if method == "lsh":
        # One Arrow UDF call hashes all tables at once (planes differ per
        # table via seed+t); posexplode replicates each vector into its T
        # (table, bucket) rows — T× the corpus through ONE shuffle, then
        # each bucket is scored IN PLACE by the vectorized tile kernel
        # (same quantized-int64 sequence as the exact tier → bitwise-equal
        # scores).  Pairs never carry vectors: only (id_a, id_b, cos)
        # survivors leave a bucket, and cross-table duplicates drop AFTER
        # scoring (every table computes the identical cos, so the dedup
        # keeps a well-defined value).  ``max_bucket`` is the skew guard:
        # a bucket of k vectors costs a k×k tile, so at corpus scale cap
        # it (dropping only low-signal mega-buckets, the stop-shingle
        # rule applied to vector space).
        planes = np.array(
            [random_hyperplanes(dim, bits, seed + t) for t in range(tables)]
        )
        rep = base.select(
            "id", "v", F.posexplode(_multi_table_bucket_udf(planes)(F.col("v")))
        ).select("id", "v", F.col("pos").alias("_t"), F.col("col").alias("_b"))
        if max_bucket is not None:
            counts = rep.groupBy("_t", "_b").agg(F.count(F.lit(1)).alias("_c"))
            rep = rep.join(
                F.broadcast(counts.filter(F.col("_c") <= max_bucket).drop("_c")),
                ["_t", "_b"],
            )
        scored = rep.groupBy("_t", "_b").applyInPandas(
            _bucket_tile_score(threshold), "id_a long, id_b long, cos double"
        )
        # a pair colliding in k tables must surface once, not k times
        return scored.dropDuplicates(["id_a", "id_b"])
    return _blocked_exact_pairs(base, threshold, n_blocks=8)


def _bucket_tile_score(threshold: float):
    """applyInPandas kernel: score every (a < b) pair inside one LSH
    bucket with the quantized-int64 cosine — identical op sequence to
    :func:`_dot_dec` / the blocked exact kernel, so scores are bitwise
    reproducible across methods, partitionings, and engines."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        ids = pdf["id"].to_numpy(np.int64)
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        qn = np.sqrt(np.floor(V * V * _QUANT + 0.5).astype(np.int64).sum(-1) / _QUANT)
        tile = np.floor((V[:, None, :] * V[None, :, :]) * _QUANT + 0.5)
        dot = tile.astype(np.int64).sum(-1).astype(np.float64) / _QUANT
        cos = dot / (qn[:, None] * qn[None, :])
        mask = (cos >= threshold) & (ids[:, None] < ids[None, :])
        ai, bi = np.nonzero(mask)
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi], "cos": cos[ai, bi]})

    return score


def _blocked_exact_pairs(base: DataFrame, threshold: float, n_blocks: int) -> DataFrame:
    import pandas as pd

    B = n_blocks
    rep = (
        base.withColumn("_b", (F.col("id") % B).cast("int"))
        .withColumn(
            "_bp",
            F.explode(
                F.array_distinct(
                    F.array(
                        *[
                            F.struct(
                                F.least(F.col("_b"), F.lit(o)).alias("p"),
                                F.greatest(F.col("_b"), F.lit(o)).alias("q"),
                            )
                            for o in range(B)
                        ]
                    )
                )
            ),
        )
        .select(F.col("_bp.p").alias("p"), F.col("_bp.q").alias("q"), "_b", "id", "v")
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        p, q = int(pdf["p"].iloc[0]), int(pdf["q"].iloc[0])
        va_rows = pdf[pdf["_b"] == p]
        vb_rows = pdf[pdf["_b"] == q]
        if len(va_rows) == 0 or len(vb_rows) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        ida = va_rows["id"].to_numpy(np.int64)
        idb = vb_rows["id"].to_numpy(np.int64)
        va = np.stack(va_rows["v"].to_numpy()).astype(np.float64)
        vb = np.stack(vb_rows["v"].to_numpy()).astype(np.float64)

        def qnorm(m):
            return np.sqrt(
                np.floor(m * m * _QUANT + 0.5).astype(np.int64).sum(-1) / _QUANT
            )

        # identical op sequence to _dot_dec: (x*y)*Q + 0.5, floor, int sum
        tile = np.floor((va[:, None, :] * vb[None, :, :]) * _QUANT + 0.5)
        dot = tile.astype(np.int64).sum(-1).astype(np.float64) / _QUANT
        cos = dot / (qnorm(va)[:, None] * qnorm(vb)[None, :])
        if p == q:
            # va == vb: keep the upper triangle (each unordered pair once)
            mask = (cos >= threshold) & (ida[:, None] < idb[None, :])
            ai, bi = np.nonzero(mask)
            lo, hi = ida[ai], idb[bi]
        else:
            # disjoint blocks: every combo appears exactly once — orient
            # each pair (the smaller id may be on either side)
            ai, bi = np.nonzero(cos >= threshold)
            lo = np.minimum(ida[ai], idb[bi])
            hi = np.maximum(ida[ai], idb[bi])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": cos[ai, bi]})

    return rep.groupBy("p", "q").applyInPandas(
        score, "id_a long, id_b long, cos double"
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 1024,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic driver-side k-means for IVF coarse quantization.

    Trains on a bounded, deterministically-chosen sample — centroid
    quality needs a representative sample, not the full corpus, so the
    collect is O(sample), never O(N).  The sample is hash-ordered
    (``ORDER BY xxhash64(id)``), not an id prefix: ids usually correlate
    with content (ingest time, source, shard), so a prefix sample at
    100 TB would train the quantizer on one corner of the corpus and
    recall would degrade silently.  Hash order is just as reproducible
    (same ids → same sample, regardless of partitioning) but spreads the
    sample uniformly over the corpus.  Fixed seed + fixed iteration
    count ⇒ reproducible lists.
    """
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = X[m].mean(0)
    return cents


def _ivf_assign_udf(cents: np.ndarray, nearest: int = 1):
    """pandas UDF: vector → its ``nearest`` centroid ids (array<int>)."""
    c = cents.copy()

    @F.pandas_udf("array<int>")
    def assign(v: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :nearest]
        return pd.Series(list(idx.astype(np.int32)))

    return assign


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate KNN: k-means coarse quantizer → inverted lists →
    queries probe their ``nprobe`` nearest lists → exact quantized-cosine
    rerank inside the probed lists.

    The at-scale shape: the corpus is assigned once (write partitioned
    by list id and amortize), each query touches nprobe/n_centroids of
    the corpus, and the rerank is the same deterministic kernel as the
    brute-force path.  Recall tunes with nprobe.

    ``exclude_self``: see :func:`knn_bruteforce` — assumes query ids share
    the corpus id namespace; set False for an independent namespace.
    """
    cents = ivf_centroids(
        corpus, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    cb = corpus.select(
        id_col,
        F.col(vec_col).alias("_cv"),
        F.element_at(_ivf_assign_udf(cents, 1)(F.col(vec_col)), 1).alias("_list"),
    ).withColumn("_cn", F.sqrt(_dot_dec(F.col("_cv"), F.col("_cv"))))
    qb = queries.select(
        F.col(id_col).alias(query_id),
        F.col(vec_col).alias("_qv"),
        F.explode(_ivf_assign_udf(cents, nprobe)(F.col(vec_col))).alias("_list"),
    ).withColumn("_qn", F.sqrt(_dot_dec(F.col("_qv"), F.col("_qv"))))
    scored = (
        cb.join(F.broadcast(qb), on="_list")
        .filter(F.col(query_id) != F.col(id_col) if exclude_self else F.lit(True))
        .select(
            query_id,
            id_col,
            (_dot_dec(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos", "rn")
    )


def knn_ivf_portable(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_sample: int = 256,
    n_iter: int = 3,
    scale: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF KNN whose ENTIRE pipeline — quantizer training included — is
    engine-reproducible, making the approximate index hash-checkable:

      1. coarse-quantizer sample: the ``n_sample`` corpus vectors lowest
         in md5-hash order (representative like the hash sample in
         :func:`ivf_centroids`, but portable — DuckDB computes the same
         order);
      2. centroids: distributed quantized Lloyd
         (``kmeans.kmeans_centroids``) — exact int64 distances,
         DECIMAL(38,0) component sums, fixed schedule, so the unrolled
         SQL twin derives the identical centroid integers;
      3. assignment/probe: exact int64 quantized distances to centroid
         literals; corpus → argmin list, query → ``nprobe`` nearest
         lists (ties toward lower centroid index, both engines);
      4. rerank: the quantized-int64 cosine inside probed lists only.

    Same at-scale shape as :func:`knn_ivf` (assign once, probe
    nprobe/n_centroids of the corpus); the numpy-trained default remains
    for callers who want a cheaper driver-side quantizer.
    """
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.kmeans import (
        _dist_expr,
        _quantize,
        kmeans_centroids,
    )

    sample = corpus.orderBy(
        portable_hash64(F.col(id_col).cast("string")), F.col(id_col)
    ).limit(n_sample)
    cents = kmeans_centroids(
        sample, id_col, vec_col, k=n_centroids, n_iter=n_iter, scale=scale
    )
    dist_structs = F.array(
        *[
            F.struct(_dist_expr("_q", c).alias("d"), F.lit(j).alias("j"))
            for j, c in enumerate(cents)
        ]
    )
    cb = (
        corpus.select(
            id_col,
            F.col(vec_col).alias("_cv"),
            _quantize(F.col(vec_col), scale).alias("_q"),
        )
        .select(
            id_col,
            "_cv",
            F.element_at(F.array_sort(dist_structs), 1)["j"].alias("_list"),
        )
        .withColumn("_cn", F.sqrt(_dot_dec(F.col("_cv"), F.col("_cv"))))
    )
    qb = (
        queries.select(
            F.col(id_col).alias(query_id),
            F.col(vec_col).alias("_qv"),
            _quantize(F.col(vec_col), scale).alias("_q"),
        )
        .select(
            query_id,
            "_qv",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(dist_structs), 1, nprobe), lambda s: s["j"]
                )
            ).alias("_list"),
        )
        .withColumn("_qn", F.sqrt(_dot_dec(F.col("_qv"), F.col("_qv"))))
    )
    scored = (
        cb.join(F.broadcast(qb), on="_list")
        .filter(F.col(query_id) != F.col(id_col) if exclude_self else F.lit(True))
        .select(
            query_id,
            id_col,
            (_dot_dec(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos", "rn")
    )


def knn_ivf_portable_sql(
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_sample: int = 256,
    n_iter: int = 3,
    scale: int = 6,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB twin of :func:`knn_ivf_portable`: md5-ordered sample →
    unrolled-Lloyd centroid CTEs (``kmeans.kmeans_cte_parts``) →
    long-form exact assignment/probe → quantized-cosine rerank."""
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql
    from timeseriesutils_spark.operators.kmeans import kmeans_cte_parts

    parts, cfin = kmeans_cte_parts("smp", "id", "embedding", n_centroids, n_iter, scale)
    mult = float(10**scale)
    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)")
    smp = f"""
smp AS (
  SELECT vec_id AS id, embedding FROM embeddings
  ORDER BY {h}, vec_id
  LIMIT {n_sample}
)"""
    dot_qc = _quant_floor_sql(
        "CAST(eq.embedding[t.i] AS DOUBLE)", "CAST(ec.embedding[t.i] AS DOUBLE)"
    )
    dot_qq = _quant_floor_sql(
        "CAST(eq.embedding[t.i] AS DOUBLE)", "CAST(eq.embedding[t.i] AS DOUBLE)"
    )
    dot_cc = _quant_floor_sql(
        "CAST(ec.embedding[t.i] AS DOUBLE)", "CAST(ec.embedding[t.i] AS DOUBLE)"
    )
    ivf = f"""
cq AS (
  SELECT vec_id,
    [CAST(floor(CAST(x AS DOUBLE) * {mult!r} + 0.5) AS BIGINT) FOR x IN embedding] AS qv
  FROM embeddings
),
cql AS (
  SELECT vec_id, u.pos AS pos, u.x AS x FROM (
    SELECT vec_id, unnest([{{'pos': i, 'x': qv[i]}} FOR i IN range(1, len(qv) + 1)]) AS u
    FROM cq
  )
),
cd AS (
  SELECT cql.vec_id, {cfin}.j,
    CAST(SUM((cql.x - {cfin}.c) * (cql.x - {cfin}.c)) AS BIGINT) AS dist
  FROM cql JOIN {cfin} USING (pos) GROUP BY cql.vec_id, {cfin}.j
),
ca AS (
  SELECT vec_id, j AS list FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM cd
  ) WHERE rn = 1
),
qa AS (
  SELECT vec_id, j AS list FROM (
    SELECT vec_id, j, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM cd WHERE {query_pred}
  ) WHERE rn <= {nprobe}
),
pairs AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS vec_id,
    CAST(SUM({dot_qc}) AS DOUBLE) / 1e14 AS dot,
    CAST(SUM({dot_qq}) AS DOUBLE) / 1e14 AS qq,
    CAST(SUM({dot_cc}) AS DOUBLE) / 1e14 AS cc
  FROM qa JOIN ca ON ca.list = qa.list AND ca.vec_id <> qa.vec_id
  JOIN embeddings eq ON eq.vec_id = qa.vec_id
  JOIN embeddings ec ON ec.vec_id = ca.vec_id,
  range(1, {dim + 1}) t(i)
  GROUP BY 1, 2
)
SELECT query_id, vec_id, dot / (SQRT(qq) * SQRT(cc)) AS cos,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id
    ORDER BY dot / (SQRT(qq) * SQRT(cc)) DESC, vec_id) AS INT) AS rn
FROM pairs QUALIFY rn <= {k}
"""
    return "WITH " + smp + "," + ",".join(parts) + "," + ivf


def _multi_table_bucket_udf(planes: np.ndarray):
    """pandas UDF: vector → array of ``tables`` sign-LSH bucket ids.

    One Arrow batch computes ALL table×bit hyperplane dots as a single
    numpy product — the expression form (tables·bits separate
    ``aggregate(zip_with(...))`` folds) is interpreted per lambda and
    measured ~40× slower at 32 planes.  Each plane dot accumulates
    through the quantized-int64 path (per-element ``floor(x·w·Q+0.5)``
    then integer sum — same IEEE sequence as :func:`_dot_dec`), so the
    sign decision is bit-identical regardless of batch/partition
    boundaries AND across engines: the generated DuckDB twin
    (:func:`embedding_lsh_pairs_sql`) computes the same integers, which
    is what upgrades the LSH dedup query from rows-only to hash-green.
    """
    P = planes.copy()  # (tables, bits, dim)
    T, B, _ = P.shape
    weights = (1 << np.arange(B, dtype=np.int64))

    @F.pandas_udf("array<bigint>")
    def buckets(v: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        dq = np.floor(X[:, None, None, :] * P[None, :, :, :] * _QUANT + 0.5)
        d = dq.astype(np.int64).sum(-1)  # N×T×B, exact int64
        bk = ((d > 0).astype(np.int64) * weights).sum(-1)  # N×T
        return pd.Series(list(bk))

    return buckets


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side
    constants, embedded as literals — no randomness at execution time)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id (bigint) for a vector column: bit i = sign of
    ⟨v, plane_i⟩.  Pure expressions; planes are literal arrays.

    The sign is decided on the quantized-int64 dot (floor(x·w·Q+0.5)
    summed as bigint), not a double left-fold: integer addition is
    associative, so the bucket is identical for any evaluation order and
    any engine computing the same per-element floors — a double fold can
    flip sign near zero in the last ulp and silently desynchronize the
    corpus and oracle bucketings."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dq = F.aggregate(
            F.zip_with(
                vec_col,
                arr,
                lambda x, y: F.floor(x.cast("double") * y * _QUANT + 0.5),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, p: acc + p,
        )
        bucket = bucket + F.when(dq > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(0)
    return bucket


def _quant_floor_sql(x_expr: str, y_expr: str) -> str:
    """SQL for one quantized product term — the exact IEEE sequence of
    :func:`_dot_dec` / the numpy tile kernels: (x·y)·1e14 + 0.5, floor,
    int64."""
    return f"CAST(FLOOR({x_expr} * {y_expr} * 1e14 + 0.5) AS BIGINT)"


def _planes_values_sql(planes) -> str:
    """VALUES rows ``(b, i, w)`` (or ``(t, b, i, w)`` for a 3-d array) for
    a literal hyperplane table; ``i`` is 1-based for DuckDB list
    indexing.  ``repr(float)`` round-trips the exact double, so both
    engines see bit-identical plane weights."""
    arr = np.asarray(planes, dtype=np.float64)
    rows = []
    if arr.ndim == 2:
        for b in range(arr.shape[0]):
            for i in range(arr.shape[1]):
                rows.append(f"({b},{i + 1},{float(arr[b, i])!r})")
    else:
        for t in range(arr.shape[0]):
            for b in range(arr.shape[1]):
                for i in range(arr.shape[2]):
                    rows.append(f"({t},{b},{i + 1},{float(arr[t, b, i])!r})")
    return ",\n".join(rows)


def knn_lsh_sql(
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB twin of :func:`knn_lsh` — hash-green because every
    engine-divergent step is pinned: the hyperplanes are the same seeded
    literals, the bucket bit is the sign of the same quantized-int64 dot,
    and the rerank cosine is the same quantized accumulation the
    brute-force oracle already uses."""
    pl = _planes_values_sql(random_hyperplanes(dim, bits, seed))
    qdot = _quant_floor_sql(
        "CAST(e.embedding[pl.i] AS DOUBLE)", "pl.w"
    )
    return f"""
WITH pl(b, i, w) AS (VALUES {pl}),
d AS (
  SELECT e.vec_id, e.embedding, pl.b, SUM({qdot}) AS dq
  FROM embeddings e, pl
  GROUP BY e.vec_id, e.embedding, pl.b
),
bk AS (
  SELECT vec_id, embedding,
    SUM(CASE WHEN dq > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM d GROUP BY vec_id, embedding
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM bk WHERE {query_pred}),
pairs AS (
  SELECT q.query_id, e.vec_id,
    CAST(SUM({_quant_floor_sql("CAST(q.qe[t.i] AS DOUBLE)", "CAST(e.embedding[t.i] AS DOUBLE)")}) AS DOUBLE) / 1e14 AS dot,
    CAST(SUM({_quant_floor_sql("CAST(q.qe[t.i] AS DOUBLE)", "CAST(q.qe[t.i] AS DOUBLE)")}) AS DOUBLE) / 1e14 AS qq,
    CAST(SUM({_quant_floor_sql("CAST(e.embedding[t.i] AS DOUBLE)", "CAST(e.embedding[t.i] AS DOUBLE)")}) AS DOUBLE) / 1e14 AS cc
  FROM q JOIN bk e ON e.bucket = q.bucket AND e.vec_id <> q.query_id, range(1, {dim + 1}) t(i)
  GROUP BY 1, 2
)
SELECT query_id, vec_id, dot / (SQRT(qq) * SQRT(cc)) AS cos,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id
    ORDER BY dot / (SQRT(qq) * SQRT(cc)) DESC, vec_id) AS INT) AS rn
FROM pairs QUALIFY rn <= {k}
"""


def embedding_lsh_pairs_sql(
    threshold: float = 0.45,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> str:
    """DuckDB twin of ``embedding_near_dup_pairs(method='lsh')`` (no
    ``max_bucket``): per-table quantized sign-LSH buckets from the same
    seeded literal planes, distinct colliding pairs, exact quantized
    cosine ≥ threshold.  Bit-identical to the Arrow tile kernel because
    both reduce the same per-element int64 floors."""
    planes = np.array(
        [random_hyperplanes(dim, bits, seed + t) for t in range(tables)]
    )
    pl = _planes_values_sql(planes)
    qdot = _quant_floor_sql("CAST(e.embedding[pl.i] AS DOUBLE)", "pl.w")
    self_q = _quant_floor_sql(
        "CAST(embedding[t.i] AS DOUBLE)", "CAST(embedding[t.i] AS DOUBLE)"
    )
    pair_q = _quant_floor_sql(
        "CAST(a.embedding[t.i] AS DOUBLE)", "CAST(b.embedding[t.i] AS DOUBLE)"
    )
    return f"""
WITH pl(t, b, i, w) AS (VALUES {pl}),
d AS (
  SELECT e.vec_id, e.embedding, pl.t, pl.b, SUM({qdot}) AS dq
  FROM embeddings e, pl
  GROUP BY e.vec_id, e.embedding, pl.t, pl.b
),
bk AS (
  SELECT vec_id, t,
    SUM(CASE WHEN dq > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM d GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
n AS (
  SELECT vec_id, embedding,
    SQRT(CAST(SUM({self_q}) AS DOUBLE) / 1e14) AS nm
  FROM embeddings, range(1, {dim + 1}) t(i)
  GROUP BY vec_id, embedding
),
sc AS (
  SELECT c.id_a, c.id_b,
    CAST(SUM({pair_q}) AS DOUBLE) / 1e14 / (a.nm * b.nm) AS cos
  FROM cand c JOIN n a ON a.vec_id = c.id_a JOIN n b ON b.vec_id = c.id_b,
    range(1, {dim + 1}) t(i)
  GROUP BY c.id_a, c.id_b, a.nm, b.nm
)
SELECT id_a, id_b, cos FROM sc WHERE cos >= {threshold}
"""


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact rerank
    inside.  Corpus shuffles once on bucket id; at scale, bucket the
    corpus once (write partitioned by bucket) and amortize across query
    batches.

    ``exclude_self``: see :func:`knn_bruteforce` — assumes query ids share
    the corpus id namespace; set False for an independent namespace."""
    planes = random_hyperplanes(dim, bits, seed)
    cb = corpus.select(
        id_col, F.col(vec_col).alias("_cv"), lsh_bucket(F.col(vec_col), planes).alias("_b")
    ).withColumn("_cn", F.sqrt(_dot_dec(F.col("_cv"), F.col("_cv"))))
    qb = queries.select(
        F.col(id_col).alias(query_id),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col), planes).alias("_b"),
    ).withColumn("_qn", F.sqrt(_dot_dec(F.col("_qv"), F.col("_qv"))))
    scored = cb.join(F.broadcast(qb), on="_b").filter(
        F.col(query_id) != F.col(id_col) if exclude_self else F.lit(True)
    ).select(
        query_id,
        id_col,
        (_dot_dec(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos", "rn")
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 per-vector quantization summary — the storage prep
    step for a serving-scale ANN index (int8 vectors are 4× smaller than
    float32 and dot-product-compatible after rescale).

    Per vector: scale = 127 / max|x|, q_i = round_half_away(x_i·scale).
    Emits scalar audit columns (not the array — canonicalizer-safe and
    what a corpus QA report needs): dim, max_abs, q_sum (exact int64),
    q_l2 (exact int64 Σq²), n_sat (|q| = 127 count — symmetric-clip
    check).  Zero vectors are dropped (no defined scale).

    All arithmetic is deterministic: doubles for the scale/product,
    floor-based half-away rounding (same op both engines), int64
    accumulation (associative — partition-order independent).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    base = embeddings.select(
        id_col, v.alias("_v"), F.size(vec_col).alias("dim"), mx.alias("max_abs")
    ).filter(F.col("max_abs") > 0)
    scale = F.lit(127.0) / F.col("max_abs")
    # round-half-away-from-zero via sign·floor(|x|+0.5): identical in
    # Spark and DuckDB (unlike round(), whose tie mode differs by type)
    q = F.transform(
        F.col("_v"),
        lambda x: (
            F.signum(x) * F.floor(F.abs(x) * scale + 0.5)
        ).cast("bigint"),
    )
    withq = base.select(id_col, "dim", "max_abs", q.alias("_q"))
    i0 = F.lit(0).cast("bigint")
    return withq.select(
        id_col,
        "dim",
        "max_abs",
        F.aggregate("_q", i0, lambda a, x: a + x).alias("q_sum"),
        F.aggregate("_q", i0, lambda a, x: a + x * x).alias("q_l2"),
        F.size(F.filter("_q", lambda x: F.abs(x) == 127)).alias("n_sat"),
    )


def quantize_embeddings_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`quantize_embeddings` (list lambdas)."""
    return f"""
WITH v AS (
  SELECT {id_col},
    [CAST(x AS DOUBLE) FOR x IN {vec_col}] AS v,
    len({vec_col}) AS dim
  FROM {table}
), m AS (
  SELECT *, list_aggregate([abs(x) FOR x IN v], 'max') AS max_abs FROM v
  WHERE list_aggregate([abs(x) FOR x IN v], 'max') > 0
), q AS (
  SELECT {id_col}, dim, max_abs,
    [CAST(sign(x) * floor(abs(x) * (127.0 / max_abs) + 0.5) AS BIGINT) FOR x IN v] AS q
  FROM m
)
SELECT {id_col}, CAST(dim AS INT) AS dim, max_abs,
  CAST(list_sum(q) AS BIGINT) AS q_sum,
  CAST(list_sum([x * x FOR x IN q]) AS BIGINT) AS q_l2,
  CAST(len(list_filter(q, x -> abs(x) = 127)) AS INT) AS n_sat
FROM q
"""


def grouped_centroids(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 7,
) -> DataFrame:
    """Per-group vector mean in long format — the class-centroid /
    k-means-update primitive (one row per (group, dimension), scalar
    columns only).

    posexplode → partial-aggregated groupBy(group, dim): the shuffle
    carries one pre-combined row per (group, dim) per map task, NOT the
    exploded vectors — at 100 TB the exchange is |groups|·dim rows.
    Component sums accumulate in DECIMAL(38,scale) (exact/associative;
    unit-norm floats with scale 7 keep ~1e9 rows per (group,dim) inside
    2^53 unscaled — see functions/exact.py); the mean divides the exact
    sum by the exact count in double.  ``dim_idx`` is 1-based to match
    SQL list indexing.
    """
    e = embeddings.select(
        group_col, F.posexplode(vec_col).alias("_pos", "_x")
    )
    return (
        e.groupBy(group_col, (F.col("_pos") + 1).alias("dim_idx"))
        .agg(
            F.count("_x").alias("n"),
            dsum(F.col("_x").cast("double"), scale=scale).alias("comp_sum"),
        )
        .select(
            group_col,
            "dim_idx",
            "n",
            "comp_sum",
            (F.col("comp_sum") / F.col("n")).alias("centroid"),
        )
    )


def grouped_centroids_sql(
    table: str = "embeddings",
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 7,
) -> str:
    """DuckDB twin of :func:`grouped_centroids`."""
    return f"""
WITH e AS (
  SELECT {group_col},
    unnest([{{'pos': i, 'x': CAST({vec_col}[i] AS DOUBLE)}}
            FOR i IN range(1, len({vec_col}) + 1)]) AS u
  FROM {table}
)
SELECT {group_col}, CAST(u.pos AS INT) AS dim_idx, COUNT(u.x) AS n,
  {dsum_sql('u.x', scale=scale)} AS comp_sum,
  {dsum_sql('u.x', scale=scale)} / COUNT(u.x) AS centroid
FROM e GROUP BY {group_col}, u.pos
"""


def semantic_dedup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    threshold: float = 0.45,
    kmeans_scale: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the corpus with k-means, then score cosine pairs only WITHIN
    each cluster — the cluster assignment is the blocking key that turns
    O(N²) all-pairs into Σ_c O(|c|²), the published method's scaling
    argument.  Near-duplicates that land in different clusters are missed
    by design (the method's documented recall trade-off; raise k more
    slowly than corpus size to trade recall for cost).

    Determinism: clustering via operators/kmeans.kmeans_lloyd (exact
    int64 distances, fixed schedule); pair scores reuse the LSH tier's
    vectorized tile kernel (``_bucket_tile_score`` — quantized-int64
    dots, the identical IEEE sequence dedup_embedding's oracle computes),
    so the WHOLE pipeline — iterative clustering included — hash-matches
    a single SQL twin.

    Scale shape: one (cluster)-keyed shuffle of the vectors, then each
    cluster scores its own pair tile in ONE numpy kernel call — Arrow
    batch in, (id_a, id_b, cos) survivors out; pair rows never carry
    vectors, and no per-pair interpreted expression exists (the
    expression-join form measured 5× slower at sf0.1).  A skewed mega-
    cluster = a big tile; **k must grow linearly with the corpus**:
    tile cost is Σ|c|² ≈ N²/k, so fixed k is quadratic — measured
    (BASELINE.md round-7 heavy-tail study): 10× vectors at fixed k=8
    cost 104× (2.1 → 220.7 s); regrowing k to keep N/k constant
    (k=80) restores linear cost.  Rule: k ≈ N / target_cluster_size
    (the sign-LSH bits ≈ log2(N/bucket) rule's k-means form); Lloyd
    training at large k trains on a bounded md5-ordered sample, so
    the assignment pass, not training, carries the N·k term.
    """
    from timeseriesutils_spark.operators.kmeans import kmeans_lloyd

    assign = kmeans_lloyd(
        embeddings, id_col, vec_col, k=k, n_iter=n_iter, scale=kmeans_scale
    ).select(id_col, "cluster")
    base = embeddings.join(assign, id_col).select(
        F.col(id_col).alias("id"), "cluster", F.col(vec_col).alias("v")
    )
    scored = base.groupBy("cluster").applyInPandas(
        _bucket_tile_score(threshold), "id_a long, id_b long, cos double"
    )
    return scored.join(
        assign.select(F.col(id_col).alias("id_a"), "cluster"), "id_a"
    ).select("id_a", "id_b", "cluster", "cos")


def embedding_drift(
    embeddings: DataFrame,
    split_col: str,
    group_col: str = "label",
    vec_col: str = "embedding",
    comp_scale: int = 7,
    q_scale: int = 9,
) -> DataFrame:
    """Embedding-distribution drift monitor: per group, compare the
    centroid of split ``a`` against split ``b`` (old vs new snapshot,
    train vs serve traffic) and report cosine drift and L2 shift — the
    embedding-space analogue of ``psi_drift`` (operators/profile.py),
    the check that catches silent encoder or upstream-distribution
    changes before they poison retrieval or dedup.

    ``split_col`` must hold exactly the two values ``'a'`` and ``'b'``.

    Pipeline: per-(group, split, dim) exact-decimal component means
    (the :func:`grouped_centroids` shuffle shape — exchanges carry
    pre-combined (group, split, dim) partials, never vectors), pivot
    the two splits side by side, quantize each centroid component to
    int64 (floor(c·10^q_scale + 0.5)), then ONE decimal-exact reduce per
    group for the dot / norms / squared-diff sums.  The only doubles are
    the final sqrt/divide chain on identical integers — bit-equal across
    engines, partitionings, and merge orders.

    Returns (group, n_a, n_b, cos_sim, drift = 1 − cos, l2_shift).
    """
    e = embeddings.select(
        group_col, F.col(split_col).alias("_split"), F.posexplode(vec_col).alias("_pos", "_x")
    )
    cent = (
        e.groupBy(group_col, "_split", F.col("_pos").alias("_dim"))
        .agg(
            F.count("_x").alias("_n"),
            dsum(F.col("_x").cast("double"), scale=comp_scale).alias("_s"),
        )
        .select(
            group_col,
            "_split",
            "_dim",
            "_n",
            F.floor((F.col("_s") / F.col("_n")) * F.lit(float(10**q_scale)) + F.lit(0.5))
            .cast("bigint")
            .alias("_cq"),
        )
    )
    side = lambda s, c: F.max(F.when(F.col("_split") == s, F.col(c)))  # noqa: E731
    piv = cent.groupBy(group_col, "_dim").agg(
        side("a", "_cq").alias("_ca"),
        side("b", "_cq").alias("_cb"),
        side("a", "_n").alias("_na"),
        side("b", "_n").alias("_nb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = piv.groupBy(group_col).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.sum(dec(F.col("_ca") * F.col("_cb"))).alias("_dot"),
        F.sum(dec(F.col("_ca") * F.col("_ca"))).alias("_aa"),
        F.sum(dec(F.col("_cb") * F.col("_cb"))).alias("_bb"),
        F.sum(dec((F.col("_ca") - F.col("_cb")) * (F.col("_ca") - F.col("_cb")))).alias(
            "_d2"
        ),
    )
    cos = F.col("_dot").cast("double") / (
        F.sqrt(F.col("_aa").cast("double")) * F.sqrt(F.col("_bb").cast("double"))
    )
    return g.select(
        group_col,
        "n_a",
        "n_b",
        cos.alias("cos_sim"),
        (F.lit(1.0) - cos).alias("drift"),
        (F.sqrt(F.col("_d2").cast("double")) / F.lit(float(10**q_scale))).alias(
            "l2_shift"
        ),
    )


def embedding_drift_sql(
    split_expr: str,
    table: str = "embeddings",
    group_col: str = "label",
    vec_col: str = "embedding",
    comp_scale: int = 7,
    q_scale: int = 9,
) -> str:
    """DuckDB twin of :func:`embedding_drift`; ``split_expr`` is the SQL
    expression producing the 'a'/'b' split value."""
    m = float(10**q_scale)
    return f"""
WITH e AS (
  SELECT {group_col}, {split_expr} AS _split,
    unnest([{{'pos': i, 'x': CAST({vec_col}[i] AS DOUBLE)}}
            FOR i IN range(1, len({vec_col}) + 1)]) AS u
  FROM {table}
),
cent AS (
  SELECT {group_col}, _split, u.pos AS _dim, COUNT(u.x) AS _n,
    CAST(FLOOR(({dsum_sql('u.x', scale=comp_scale)} / COUNT(u.x)) * {m!r} + 0.5)
         AS BIGINT) AS _cq
  FROM e GROUP BY {group_col}, _split, u.pos
),
piv AS (
  SELECT {group_col}, _dim,
    MAX(CASE WHEN _split = 'a' THEN _cq END) AS _ca,
    MAX(CASE WHEN _split = 'b' THEN _cq END) AS _cb,
    MAX(CASE WHEN _split = 'a' THEN _n END) AS _na,
    MAX(CASE WHEN _split = 'b' THEN _n END) AS _nb
  FROM cent GROUP BY {group_col}, _dim
),
g AS (
  SELECT {group_col},
    CAST(MAX(_na) AS BIGINT) AS n_a, CAST(MAX(_nb) AS BIGINT) AS n_b,
    SUM(_ca * _cb) AS _dot, SUM(_ca * _ca) AS _aa, SUM(_cb * _cb) AS _bb,
    SUM((_ca - _cb) * (_ca - _cb)) AS _d2
  FROM piv GROUP BY {group_col}
)
SELECT {group_col}, n_a, n_b,
  CAST(_dot AS DOUBLE) / (sqrt(CAST(_aa AS DOUBLE)) * sqrt(CAST(_bb AS DOUBLE)))
    AS cos_sim,
  1.0 - CAST(_dot AS DOUBLE) / (sqrt(CAST(_aa AS DOUBLE)) * sqrt(CAST(_bb AS DOUBLE)))
    AS drift,
  sqrt(CAST(_d2 AS DOUBLE)) / {m!r} AS l2_shift
FROM g
"""


# --------------------------------------------------------------------------
# product quantization (PQ) — compressed ANN with asymmetric distances
# --------------------------------------------------------------------------


def _pq_train_books_driver(qrows, m, sub, n_codes, n_iter):
    """Driver-side numpy Lloyd per sub-space over the (already
    md5-ordered, id-sorted, quantized) sample — BIT-IDENTICAL to
    ``kmeans.kmeans_centroids`` by construction: exact int64 distances,
    argmin ties to the lower code (np.argmin takes the first minimum,
    codes ascend), centroid update floor(float(exact Σ)/n + 0.5)
    (python float division of an exact int == the DECIMAL→double cast
    both engines perform), empty clusters keep their centroid.  Tests
    pin the two trainers equal.  The sample is ≤ n_sample rows, so this
    replaces 4·m·n_iter Spark actions with one collect."""
    import numpy as np

    Q = np.array([r[1] for r in qrows], dtype=np.int64)
    books = []
    for s_i in range(m):
        X = Q[:, s_i * sub : (s_i + 1) * sub]
        C = X[:n_codes].copy()
        for _ in range(n_iter):
            D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = D.argmin(axis=1)
            for j in range(n_codes):
                members = X[assign == j]
                if len(members):
                    S = members.sum(axis=0, dtype=np.int64)
                    C[j] = np.floor(
                        S.astype(np.float64) / len(members) + 0.5
                    ).astype(np.int64)
        books.append([[int(v) for v in c] for c in C])
    return books


def _pq_encode_kernel(id_col, m, sub, books, mult, emit_tables):
    """mapInPandas kernel: quantize, then per sub-space either the
    argmin CODE (corpus side) or the full distance TABLE to all codes
    (query side) — exact int64 both ways."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        C = [np.array(b, dtype=np.int64) for b in books]
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            Q = np.floor(V * mult + 0.5).astype(np.int64)
            out = {id_col: pdf[id_col].to_numpy()}
            for s_i in range(m):
                X = Q[:, s_i * sub : (s_i + 1) * sub]
                D = ((X[:, None, :] - C[s_i][None, :, :]) ** 2).sum(axis=2)
                if emit_tables:
                    out[f"_dt{s_i}"] = list(D)
                else:
                    out[f"_c{s_i}"] = D.argmin(axis=1).astype(np.int32)
            yield pd.DataFrame(out)

    return fn


def knn_pq_portable(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    n_sample: int = 256,
    n_iter: int = 2,
    scale: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    exclude_self: bool = True,
    engine: str = "arrow",
) -> DataFrame:
    """Product-quantization KNN (Jégou et al. 2011, public) — THE
    memory-side scale lever the IVF lists don't give: each vector
    compresses to ``m`` sub-space code ids (here 4 × 4 bits — a
    64-float vector becomes 4 small ints), and search scores
    ASYMMETRIC distances (exact query subvector ↔ centroid of the
    corpus code) via per-query lookup tables, never touching the raw
    corpus floats.

    Fully engine-reproducible, training included (the knn_ivf_portable
    discipline): per sub-space, the codebook is deterministic
    quantized Lloyd over the md5-ordered sample; corpus codes are
    exact-int64 argmins (ties to lower code); the ADC score is an
    exact int64 sum of m table lookups — the SQL twin re-derives the
    identical codebooks, codes, and distances.

    Scale shape: codebooks are m·n_codes·(dim/m) ints of driver state
    (trained by a driver numpy Lloyd over the ≤n_sample-row md5 sample
    — bit-identical to the distributed trainer, pinned by tests); the
    corpus is ONE Arrow pass to (id, m codes); search broadcasts the
    per-query distance tables (m·n_codes ints each) and scans the
    CODES, not the vectors — at 100 TB the scan narrows from dim
    floats to m bytes per row, the entire point of PQ.

    ``engine='expr'`` is the pure-expression form the SQL twin mirrors
    (m·n_codes HOF distance aggregates per row — measured ~30 s at
    sf0.1 vs ~2 s for the Arrow kernels; kept for parity tests).

    Returns (query_id, vec_id, adc_dist, rn) — adc_dist in squared
    original units (int64 quantized, /10^2·scale), rn the ADC rank.
    """
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.kmeans import (
        _dist_expr,
        _quantize,
        kmeans_centroids,
    )

    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    sub = dim // m
    mult = float(10**scale)
    sample = corpus.orderBy(
        portable_hash64(F.col(id_col).cast("string")), F.col(id_col)
    ).limit(n_sample)
    if engine == "arrow":
        qrows = [
            (r[0], list(r[1]))
            for r in sample.select(
                id_col, _quantize(F.col(vec_col), scale)
            ).orderBy(id_col).collect()
        ]
        books = _pq_train_books_driver(qrows, m, sub, n_codes, n_iter)
        id_type = corpus.schema[id_col].dataType.simpleString()
        code_schema = f"{id_col} {id_type}, " + ", ".join(
            f"_c{s_i} int" for s_i in range(m)
        )
        codes = corpus.select(id_col, F.col(vec_col).alias("_v")).mapInPandas(
            _pq_encode_kernel(id_col, m, sub, books, mult, False),
            code_schema,
        )
        table_schema = f"{query_id} {id_type}, " + ", ".join(
            f"_dt{s_i} array<bigint>" for s_i in range(m)
        )
        qt = queries.select(
            F.col(id_col).alias(query_id), F.col(vec_col).alias("_v")
        ).mapInPandas(
            _pq_encode_kernel(query_id, m, sub, books, mult, True),
            table_schema,
        )
    else:
        books = []
        for s_i in range(m):
            s_df = sample.select(
                id_col,
                F.slice(F.col(vec_col), s_i * sub + 1, sub).alias("_sv"),
            )
            books.append(
                kmeans_centroids(
                    s_df, id_col, "_sv", k=n_codes, n_iter=n_iter,
                    scale=scale,
                )
            )
        # corpus → (id, code_0..m-1): one projection, exact argmin/book
        qcols = [
            _quantize(
                F.slice(F.col(vec_col), s_i * sub + 1, sub), scale
            ).alias(f"_q{s_i}")
            for s_i in range(m)
        ]
        cq = corpus.select(id_col, *qcols)
        code_cols = []
        for s_i, book in enumerate(books):
            structs = F.array(
                *[
                    F.struct(_dist_expr(f"_q{s_i}", c).alias("d"),
                             F.lit(j).alias("j"))
                    for j, c in enumerate(book)
                ]
            )
            code_cols.append(
                F.element_at(F.array_sort(structs), 1)["j"].alias(f"_c{s_i}")
            )
        codes = cq.select(id_col, *code_cols)
        qq = queries.select(F.col(id_col).alias(query_id), *qcols)
        dt_cols = [
            F.array(
                *[_dist_expr(f"_q{s_i}", c) for c in books[s_i]]
            ).alias(f"_dt{s_i}")
            for s_i in range(m)
        ]
        qt = qq.select(query_id, *dt_cols)
    joined = codes.crossJoin(F.broadcast(qt))
    adc = None
    for s_i in range(m):
        term = F.element_at(F.col(f"_dt{s_i}"), F.col(f"_c{s_i}") + 1)
        adc = term if adc is None else adc + term
    scored = joined.filter(
        F.col(query_id) != F.col(id_col) if exclude_self else F.lit(True)
    ).select(query_id, id_col, adc.alias("_adc"))
    w = Window.partitionBy(query_id).orderBy(F.col("_adc"), F.col(id_col))
    mult2 = float(10 ** (2 * scale))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id,
            id_col,
            (F.col("_adc").cast("double") / F.lit(mult2)).alias("adc_dist"),
            "rn",
        )
    )


def knn_pq_portable_sql(
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    n_sample: int = 256,
    n_iter: int = 2,
    scale: int = 6,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB twin of :func:`knn_pq_portable`: one prefixed
    unrolled-Lloyd chain PER SUB-SPACE, long-form exact code
    assignment, and the ADC sum as a UNION-ALL contribution rollup."""
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql
    from timeseriesutils_spark.operators.kmeans import kmeans_cte_parts

    sub = dim // m
    mult = float(10**scale)
    mult2 = float(10 ** (2 * scale))
    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)")
    ctes = [
        f"""
smp AS (
  SELECT vec_id AS id, embedding FROM embeddings
  ORDER BY {h}, vec_id
  LIMIT {n_sample}
)"""
    ]
    finals = []
    for s_i in range(m):
        lo, hi = s_i * sub + 1, (s_i + 1) * sub
        parts, cfin = kmeans_cte_parts(
            "smp", "id", f"embedding[{lo}:{hi}]", n_codes, n_iter, scale,
            prefix=f"s{s_i}_",
        )
        ctes += parts
        finals.append(cfin)
        ctes.append(
            f"""
pq{s_i} AS (
  SELECT vec_id,
    [CAST(floor(CAST(x AS DOUBLE) * {mult!r} + 0.5) AS BIGINT)
     FOR x IN embedding[{lo}:{hi}]] AS qv
  FROM embeddings
),
pql{s_i} AS (
  SELECT vec_id, u.pos AS pos, u.x AS x FROM (
    SELECT vec_id,
      unnest([{{'pos': i, 'x': qv[i]}} FOR i IN range(1, len(qv) + 1)]) AS u
    FROM pq{s_i}
  )
),
pd{s_i} AS (  -- exact distances of EVERY vector to every code
  SELECT pql{s_i}.vec_id, {cfin}.j,
    CAST(SUM((pql{s_i}.x - {cfin}.c) * (pql{s_i}.x - {cfin}.c)) AS BIGINT)
      AS dist
  FROM pql{s_i} JOIN {cfin} USING (pos)
  GROUP BY pql{s_i}.vec_id, {cfin}.j
),
pc{s_i} AS (  -- corpus code: argmin, ties to lower code id
  SELECT vec_id, j AS code FROM (
    SELECT vec_id, j,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM pd{s_i}
  ) WHERE rn = 1
),
con{s_i} AS (  -- ADC contribution: query's distance to the corpus code
  SELECT qd.vec_id AS query_id, co.vec_id, qd.dist
  FROM pc{s_i} co
  JOIN (SELECT * FROM pd{s_i} WHERE {query_pred}) qd ON qd.j = co.code
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM con{s_i}" for s_i in range(m)
    )
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
allcon AS ({union}),
adc AS (
  SELECT query_id, vec_id, CAST(SUM(dist) AS BIGINT) AS _adc
  FROM allcon WHERE query_id <> vec_id
  GROUP BY query_id, vec_id
)
SELECT query_id, vec_id,
  CAST(_adc AS DOUBLE) / {mult2!r} AS adc_dist,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY _adc, vec_id) AS INT) AS rn
FROM adc QUALIFY rn <= {k}
"""
    )


# --------------------------------------------------------------------------
# IVF + PQ compound index (IVFADC) — the 100 TB serving shape
# --------------------------------------------------------------------------


def _lloyd_driver(X, k, n_iter):
    """Driver numpy quantized Lloyd over an (already id-sorted,
    quantized) int64 sample — BIT-IDENTICAL to the distributed
    ``kmeans.kmeans_centroids`` by construction (same k-lowest-id
    init, exact int64 distances, first-min argmin = lower index,
    floor(float64(exact Σ)/n + 0.5) update, empty keeps old); tests
    pin the equality.  Replaces n_iter+1 Spark actions with zero."""
    import numpy as np

    C = X[:k].copy()
    for _ in range(n_iter):
        D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = D.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                S = members.sum(axis=0, dtype=np.int64)
                C[j] = np.floor(
                    S.astype(np.float64) / len(members) + 0.5
                ).astype(np.int64)
    return [[int(v) for v in c] for c in C]


def _ivfpq_train_books_driver(qrows, cents, m, sub, n_codes, n_iter):
    """Residual PQ codebooks (Jégou et al. 2011 IVFADC, public):
    assign each (md5-ordered, id-sorted, quantized) sample vector to
    its nearest coarse centroid — exact int64 distances, argmin ties
    to the lower list id — subtract, then run the same integer Lloyd
    as :func:`_pq_train_books_driver` per sub-space on the RESIDUALS.
    Bit-identical to the ``kmeans_cte_parts(scale=0)`` chains the SQL
    twin unrolls (python float division of an exact int == the
    DECIMAL→double cast; first-min argmin == (dist, j) row_number);
    tests pin the two trainers equal."""
    import numpy as np

    C = np.array(cents, dtype=np.int64)
    Q = np.array([r[1] for r in qrows], dtype=np.int64)
    D = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    lists = D.argmin(axis=1)
    R = Q - C[lists]
    books = []
    for s_i in range(m):
        X = R[:, s_i * sub : (s_i + 1) * sub]
        B = X[:n_codes].copy()
        for _ in range(n_iter):
            Db = ((X[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
            assign = Db.argmin(axis=1)
            for j in range(n_codes):
                members = X[assign == j]
                if len(members):
                    S = members.sum(axis=0, dtype=np.int64)
                    B[j] = np.floor(
                        S.astype(np.float64) / len(members) + 0.5
                    ).astype(np.int64)
        books.append([[int(v) for v in c] for c in B])
    return books


def _ivfpq_encode_kernel(id_col, cents, m, sub, books, mult, nprobe,
                         emit_tables):
    """mapInPandas kernel for IVFADC: corpus side emits (id, coarse
    list, m residual codes) in one vectorized pass; query side emits
    one row PER PROBED LIST with the m residual distance tables for
    that list's centroid.  All distances exact int64."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        C = np.array(cents, dtype=np.int64)
        B = [np.array(b, dtype=np.int64) for b in books]
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            Q = np.floor(V * mult + 0.5).astype(np.int64)
            D = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            if not emit_tables:
                lists = D.argmin(axis=1)
                R = Q - C[lists]
                out = {
                    id_col: pdf[id_col].to_numpy(),
                    "_lst": lists.astype(np.int32),
                }
                for s_i in range(m):
                    X = R[:, s_i * sub : (s_i + 1) * sub]
                    Db = ((X[:, None, :] - B[s_i][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    out[f"_c{s_i}"] = Db.argmin(axis=1).astype(np.int32)
                yield pd.DataFrame(out)
            else:
                # stable argsort == ties to the lower list id (the SQL
                # twin's ROW_NUMBER ... ORDER BY dist, j); query batches
                # are small (the probe fan-out is per-query state)
                order = np.argsort(D, axis=1, kind="stable")[:, :nprobe]
                ids, lsts = [], []
                tabs = [[] for _ in range(m)]
                for i in range(len(Q)):
                    for lst in order[i]:
                        R = Q[i] - C[lst]
                        ids.append(pdf[id_col].iloc[i])
                        lsts.append(int(lst))
                        for s_i in range(m):
                            x = R[s_i * sub : (s_i + 1) * sub]
                            dt = ((x[None, :] - B[s_i]) ** 2).sum(axis=1)
                            tabs[s_i].append([int(v) for v in dt])
                out = {id_col: ids, "_lst": np.array(lsts, dtype=np.int32)}
                for s_i in range(m):
                    out[f"_dt{s_i}"] = tabs[s_i]
                yield pd.DataFrame(out)

    return fn


def knn_ivfpq_portable(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 32,
    n_sample: int = 256,
    n_iter_coarse: int = 2,
    n_iter_pq: int = 2,
    scale: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    exclude_self: bool = True,
    engine: str = "arrow",
) -> DataFrame:
    """IVF + PQ compound ANN (Jégou et al. 2011 "IVFADC", public — the
    standard billion-scale serving layout): the coarse quantizer
    prunes WHICH corpus rows are scored (each query touches
    nprobe/n_centroids of the data, the knn_ivf lever) and PQ
    compresses WHAT is scored (each pruned row is m small residual
    codes, the knn_pq lever).  Distances are asymmetric: the query's
    exact residual against the centroid of each corpus code, per
    probed list — residuals are taken against the probed list's coarse
    centroid on BOTH sides, so the tables are list-specific.

    Fully engine-reproducible, training included: coarse centroids
    via the distributed quantized Lloyd (kmeans_centroids == the
    unrolled kmeans_cte_parts chain), residual codebooks via the same
    schedule per sub-space at scale=0 (residuals are already int64),
    exact int64 codes/tables/ADC sums — the SQL twin re-derives the
    identical index end to end.

    Scale shape (the 100 TB answer): driver state is n_centroids·dim
    + m·n_codes·(dim/m) ints; the corpus is ONE Arrow pass to
    (id, list, m codes) — amortizable by writing the encoded table
    partitioned by list; search broadcasts per-(query, probed-list)
    tables (m·n_codes ints each) and joins them against the CODES
    table co-partitioned on the list id, scanning m bytes per
    candidate row instead of dim floats, for nprobe/n_centroids of
    the rows.  ``engine='expr'`` is the expression form the twin
    mirrors (kept for parity tests; arrow is the production plan —
    the knn_pq precedent measured ~20× between them).

    Returns (query_id, vec_id, adc_dist, rn) — adc_dist in squared
    original units, rn the ADC rank.
    """
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.kmeans import (
        _dist_expr,
        _quantize,
        kmeans_centroids,
    )

    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    sub = dim // m
    mult = float(10**scale)
    sample = corpus.orderBy(
        portable_hash64(F.col(id_col).cast("string")), F.col(id_col)
    ).limit(n_sample)
    if engine == "arrow":
        # ONE Spark action for all training state: collect the quantized
        # sample, run the coarse Lloyd AND the residual book Lloyds in
        # driver numpy (bit-identical to the distributed trainer —
        # pinned by tests; the distributed form cost ~6 s of cold
        # per-iteration actions at sf0.1, BASELINE r10 note)
        import numpy as np

        qrows = [
            (r[0], list(r[1]))
            for r in sample.select(
                id_col, _quantize(F.col(vec_col), scale)
            ).orderBy(id_col).collect()
        ]
        X = np.array([r[1] for r in qrows], dtype=np.int64)
        cents = _lloyd_driver(X, n_centroids, n_iter_coarse)
        books = _ivfpq_train_books_driver(
            qrows, cents, m, sub, n_codes, n_iter_pq
        )
        id_type = corpus.schema[id_col].dataType.simpleString()
        code_schema = f"{id_col} {id_type}, _lst int, " + ", ".join(
            f"_c{s_i} int" for s_i in range(m)
        )
        codes = corpus.select(id_col, F.col(vec_col).alias("_v")).mapInPandas(
            _ivfpq_encode_kernel(
                id_col, cents, m, sub, books, mult, nprobe, False
            ),
            code_schema,
        )
        table_schema = f"{query_id} {id_type}, _lst int, " + ", ".join(
            f"_dt{s_i} array<bigint>" for s_i in range(m)
        )
        qt = queries.select(
            F.col(id_col).alias(query_id), F.col(vec_col).alias("_v")
        ).mapInPandas(
            _ivfpq_encode_kernel(
                query_id, cents, m, sub, books, mult, nprobe, True
            ),
            table_schema,
        )
    else:
        cents = kmeans_centroids(
            sample, id_col, vec_col, k=n_centroids, n_iter=n_iter_coarse,
            scale=scale,
        )
        cents_arr = "array(" + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in c) + ")" for c in cents
        ) + ")"
        dist_structs = F.array(
            *[
                F.struct(_dist_expr("_q", c).alias("d"), F.lit(j).alias("j"))
                for j, c in enumerate(cents)
            ]
        )
        resid = F.expr(
            f"zip_with(_q, element_at({cents_arr}, _lst + 1),"
            " (x, y) -> x - y)"
        )
        # residual sample → per-sub-space books (the distributed
        # trainer; bit-identical to the driver numpy path, pinned)
        rs = sample.select(
            id_col, _quantize(F.col(vec_col), scale).alias("_q")
        ).select(
            id_col,
            F.element_at(F.array_sort(dist_structs), 1)["j"].alias("_lst"),
            "_q",
        ).select(id_col, resid.alias("_r"))
        books = []
        for s_i in range(m):
            s_df = rs.select(
                id_col, F.slice(F.col("_r"), s_i * sub + 1, sub).alias("_sv")
            )
            books.append(
                kmeans_centroids(
                    s_df, id_col, "_sv", k=n_codes, n_iter=n_iter_pq,
                    scale=0,
                )
            )
        base = corpus.select(
            id_col, _quantize(F.col(vec_col), scale).alias("_q")
        ).select(
            id_col,
            F.element_at(F.array_sort(dist_structs), 1)["j"].alias("_lst"),
            "_q",
        ).select(id_col, "_lst", resid.alias("_r"))
        code_cols = []
        for s_i, book in enumerate(books):
            structs = F.array(
                *[
                    F.struct(
                        _dist_expr(f"slice(_r, {s_i * sub + 1}, {sub})", c)
                        .alias("d"),
                        F.lit(j).alias("j"),
                    )
                    for j, c in enumerate(book)
                ]
            )
            code_cols.append(
                F.element_at(F.array_sort(structs), 1)["j"].alias(f"_c{s_i}")
            )
        codes = base.select(id_col, "_lst", *code_cols)
        qb = queries.select(
            F.col(id_col).alias(query_id),
            _quantize(F.col(vec_col), scale).alias("_q"),
        ).select(
            query_id,
            "_q",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(dist_structs), 1, nprobe),
                    lambda s: s["j"],
                )
            ).alias("_lst"),
        ).select(query_id, "_lst", resid.alias("_r"))
        dt_cols = [
            F.array(
                *[
                    _dist_expr(f"slice(_r, {s_i * sub + 1}, {sub})", c)
                    for c in books[s_i]
                ]
            ).alias(f"_dt{s_i}")
            for s_i in range(m)
        ]
        qt = qb.select(query_id, "_lst", *dt_cols)
    joined = codes.join(F.broadcast(qt), on="_lst")
    adc = None
    for s_i in range(m):
        term = F.element_at(F.col(f"_dt{s_i}"), F.col(f"_c{s_i}") + 1)
        adc = term if adc is None else adc + term
    scored = joined.filter(
        F.col(query_id) != F.col(id_col) if exclude_self else F.lit(True)
    ).select(query_id, id_col, adc.alias("_adc"))
    w = Window.partitionBy(query_id).orderBy(F.col("_adc"), F.col(id_col))
    mult2 = float(10 ** (2 * scale))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            query_id,
            id_col,
            (F.col("_adc").cast("double") / F.lit(mult2)).alias("adc_dist"),
            "rn",
        )
    )


def knn_ivfpq_portable_sql(
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 32,
    n_sample: int = 256,
    n_iter_coarse: int = 2,
    n_iter_pq: int = 2,
    scale: int = 6,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB twin of :func:`knn_ivfpq_portable`: the coarse Lloyd
    chain + one residual Lloyd chain per sub-space (prefix-namespaced
    ``kmeans_cte_parts``), long-form exact coarse assignment /
    residuals / codes, per-(query, probed-list) distance rows, and the
    ADC as a UNION-ALL contribution rollup."""
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql
    from timeseriesutils_spark.operators.kmeans import kmeans_cte_parts

    sub = dim // m
    mult = float(10**scale)
    mult2 = float(10 ** (2 * scale))
    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)")
    ctes = [
        f"""
smp AS (
  SELECT vec_id AS id, embedding FROM embeddings
  ORDER BY {h}, vec_id
  LIMIT {n_sample}
)"""
    ]
    cparts, cfin = kmeans_cte_parts(
        "smp", "id", "embedding", n_centroids, n_iter_coarse, scale,
        prefix="cv_",
    )
    ctes += cparts
    ctes.append(
        f"""
aq AS MATERIALIZED (  -- full corpus, quantized
  SELECT vec_id,
    [CAST(floor(CAST(x AS DOUBLE) * {mult!r} + 0.5) AS BIGINT)
     FOR x IN embedding] AS qv
  FROM embeddings
),
aql AS MATERIALIZED (
  SELECT vec_id, u.pos AS pos, u.x AS x FROM (
    SELECT vec_id,
      unnest([{{'pos': i, 'x': qv[i]}} FOR i IN range(1, len(qv) + 1)]) AS u
    FROM aq
  )
),
ad AS MATERIALIZED (  -- exact coarse distances, every vector x every centroid
  SELECT aql.vec_id, {cfin}.j,
    CAST(SUM((aql.x - {cfin}.c) * (aql.x - {cfin}.c)) AS BIGINT) AS dist
  FROM aql JOIN {cfin} USING (pos) GROUP BY aql.vec_id, {cfin}.j
),
aa AS MATERIALIZED (  -- coarse list assignment: argmin, ties to lower list id
  SELECT vec_id, j AS lst FROM (
    SELECT vec_id, j,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM ad
  ) WHERE rn = 1
),
rl AS MATERIALIZED (  -- residual long form for every corpus vector
  SELECT aql.vec_id, aql.pos, aql.x - c.c AS x
  FROM aql JOIN aa USING (vec_id)
  JOIN {cfin} c ON c.j = aa.lst AND c.pos = aql.pos
),
rsmp AS MATERIALIZED (  -- the training sample's residual vectors, as arrays
  SELECT vec_id AS id, list(x ORDER BY pos) AS rv
  FROM rl WHERE vec_id IN (SELECT id FROM smp) GROUP BY vec_id
),
qp AS MATERIALIZED (  -- nprobe nearest lists per query
  SELECT vec_id AS query_id, j AS lst FROM (
    SELECT vec_id, j,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM ad WHERE {query_pred}
  ) WHERE rn <= {nprobe}
),
qrl AS MATERIALIZED (  -- query residuals, one set per probed list
  SELECT qp.query_id, qp.lst, aql.pos, aql.x - c.c AS x
  FROM qp JOIN aql ON aql.vec_id = qp.query_id
  JOIN {cfin} c ON c.j = qp.lst AND c.pos = aql.pos
)"""
    )
    for s_i in range(m):
        lo, hi = s_i * sub + 1, (s_i + 1) * sub
        parts, bfin = kmeans_cte_parts(
            "rsmp", "id", f"rv[{lo}:{hi}]", n_codes, n_iter_pq, 0,
            prefix=f"s{s_i}_",
        )
        ctes += parts
        ctes.append(
            f"""
sd{s_i} AS MATERIALIZED (  -- corpus residual distances to sub-space {s_i} codes
  SELECT rl.vec_id, b.j,
    CAST(SUM((rl.x - b.c) * (rl.x - b.c)) AS BIGINT) AS dist
  FROM rl JOIN {bfin} b ON b.pos = rl.pos - {lo - 1}
  WHERE rl.pos BETWEEN {lo} AND {hi}
  GROUP BY rl.vec_id, b.j
),
sc{s_i} AS MATERIALIZED (  -- corpus code: argmin, ties to lower code id
  SELECT vec_id, j AS code FROM (
    SELECT vec_id, j,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM sd{s_i}
  ) WHERE rn = 1
),
qd{s_i} AS MATERIALIZED (  -- query residual distance tables, per probed list
  SELECT qrl.query_id, qrl.lst, b.j,
    CAST(SUM((qrl.x - b.c) * (qrl.x - b.c)) AS BIGINT) AS dist
  FROM qrl JOIN {bfin} b ON b.pos = qrl.pos - {lo - 1}
  WHERE qrl.pos BETWEEN {lo} AND {hi}
  GROUP BY qrl.query_id, qrl.lst, b.j
),
con{s_i} AS (  -- ADC contribution: table lookup at the corpus code
  SELECT qd.query_id, sc.vec_id, qd.dist
  FROM sc{s_i} sc
  JOIN aa USING (vec_id)
  JOIN qd{s_i} qd ON qd.lst = aa.lst AND qd.j = sc.code
)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM con{s_i}" for s_i in range(m))
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
allcon AS ({union}),
adc AS (
  SELECT query_id, vec_id, CAST(SUM(dist) AS BIGINT) AS _adc
  FROM allcon WHERE query_id <> vec_id
  GROUP BY query_id, vec_id
)
SELECT query_id, vec_id,
  CAST(_adc AS DOUBLE) / {mult2!r} AS adc_dist,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY _adc, vec_id) AS INT) AS rn
FROM adc QUALIFY rn <= {k}
"""
    )


def pq_encode_sql(
    m: int = 8,
    n_codes: int = 64,
    n_sample: int = 256,
    n_iter: int = 3,
    scale: int = 6,
    dim: int = 64,
) -> str:
    """DuckDB twin of the PQ ENCODE step alone (the
    streaming.stream_pq_encode oracle): the same per-sub-space Lloyd
    chains as :func:`knn_pq_portable_sql`, stopping at the wide
    (vec_id, code_0..code_{m-1}) code table for EVERY vector."""
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql
    from timeseriesutils_spark.operators.kmeans import kmeans_cte_parts

    sub = dim // m
    mult = float(10**scale)
    h = portable_hash64_sql("CAST(vec_id AS VARCHAR)")
    ctes = [
        f"""
smp AS (
  SELECT vec_id AS id, embedding FROM embeddings
  ORDER BY {h}, vec_id
  LIMIT {n_sample}
)"""
    ]
    for s_i in range(m):
        lo, hi = s_i * sub + 1, (s_i + 1) * sub
        parts, cfin = kmeans_cte_parts(
            "smp", "id", f"embedding[{lo}:{hi}]", n_codes, n_iter, scale,
            prefix=f"s{s_i}_",
        )
        ctes += parts
        ctes.append(
            f"""
pq{s_i} AS MATERIALIZED (
  SELECT vec_id,
    [CAST(floor(CAST(x AS DOUBLE) * {mult!r} + 0.5) AS BIGINT)
     FOR x IN embedding[{lo}:{hi}]] AS qv
  FROM embeddings
),
pql{s_i} AS MATERIALIZED (
  SELECT vec_id, u.pos AS pos, u.x AS x FROM (
    SELECT vec_id,
      unnest([{{'pos': i, 'x': qv[i]}} FOR i IN range(1, len(qv) + 1)]) AS u
    FROM pq{s_i}
  )
),
pd{s_i} AS MATERIALIZED (
  SELECT pql{s_i}.vec_id, {cfin}.j,
    CAST(SUM((pql{s_i}.x - {cfin}.c) * (pql{s_i}.x - {cfin}.c)) AS BIGINT)
      AS dist
  FROM pql{s_i} JOIN {cfin} USING (pos)
  GROUP BY pql{s_i}.vec_id, {cfin}.j
),
pc{s_i} AS MATERIALIZED (
  SELECT vec_id, j AS code FROM (
    SELECT vec_id, j,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM pd{s_i}
  ) WHERE rn = 1
)"""
        )
    joins = " ".join(f"JOIN pc{s_i} USING (vec_id)" for s_i in range(1, m))
    cols = ", ".join(
        f"CAST(pc{s_i}.code AS INT) AS code_{s_i}" for s_i in range(m)
    )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT pc0.vec_id, {cols}
FROM pc0 {joins}
"""
    )


# --------------------------------------------------------------------------
# maximal marginal relevance (diversified top-k)
# --------------------------------------------------------------------------


def _mmr_greedy_arrow(cand, query_id, id_col, k, lam):
    """Stages (2)+(3) of :func:`mmr_diversify` as one grouped Arrow
    pass: per query, pairwise candidate sims + the greedy k picks, in
    exactly the relational unroll's arithmetic — ``cosine``'s
    floor-at-1e14 int64 dot (order-independent sum, so numpy's
    accumulation order is immaterial), the identical double score
    tree ``λ·rel − (1−λ)·max_sim``, Spark's NaN-is-largest double
    ordering for both the max and the argmax, ties by id.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(query_id, cand.schema[query_id].dataType),
            StructField(id_col, cand.schema[id_col].dataType),
            StructField("mmr_rank", IntegerType()),
            StructField("rel", DoubleType()),
            StructField("score", DoubleType()),
        ]
    )
    lam_f, om_f = float(lam), float(1.0 - lam)
    qf = float(_QUANT)
    kk = int(k)

    def _dot(a, b):
        # zip_with floor(x*y*1e14 + 0.5) → int64 fold → double → /1e14
        return float(
            int(np.floor(a * b * qf + 0.5).astype(np.int64).sum())
        ) / qf

    def _gt(x, y):
        # Spark double TOTAL order for max/argmax: NaN > any value
        xn, yn = math.isnan(x), math.isnan(y)
        if xn != yn:
            return xn
        if xn:
            return False
        return x > y

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn")
        ids = list(pdf[id_col])
        rels = [float(r) for r in pdf["rel"]]
        vecs = [np.asarray(v, dtype=np.float64) for v in pdf["_cv"]]
        n = len(ids)
        norms = [math.sqrt(_dot(v, v)) for v in vecs]
        picked = [False] * n
        picked[0] = True
        out = [(ids[0], 1, rels[0], lam_f * rels[0])]
        maxsim: list = [None] * n  # running max sim to the selected set
        last = 0
        for t in range(2, kk + 1):
            for i in range(n):
                if picked[i]:
                    continue
                s = _dot(vecs[i], vecs[last]) / (norms[i] * norms[last])
                if maxsim[i] is None or _gt(s, maxsim[i]):
                    maxsim[i] = s
            best = None
            for i in range(n):
                if picked[i]:
                    continue
                sc = lam_f * rels[i] - om_f * maxsim[i]
                if (
                    best is None
                    or _gt(sc, best[1])
                    or (not _gt(best[1], sc) and ids[i] < ids[best[0]])
                ):
                    best = (i, sc)
            if best is None:
                break
            picked[best[0]] = True
            out.append((ids[best[0]], t, rels[best[0]], best[1]))
            last = best[0]
        qv = pdf.iloc[0][query_id]
        return pd.DataFrame(
            {
                query_id: [qv] * len(out),
                id_col: [o[0] for o in out],
                "mmr_rank": [o[1] for o in out],
                "rel": [o[2] for o in out],
                "score": [o[3] for o in out],
            }
        )

    return cand.groupBy(query_id).applyInPandas(greedy, schema)


def mmr_diversify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    exclude_self: bool = True,
    engine: str = "arrow",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998, public): pick k results that are RELEVANT to the query but
    not redundant with each other —

        next = argmax_c  λ·rel(q, c) − (1−λ)·max_{s∈S} sim(c, s)

    the training-data-selection / retrieval diversifier next to plain
    knn (which happily returns k near-duplicates; the dedup family
    removes corpus-level dups, MMR removes RESULT-set redundancy).

    Plan shape (round-14 optimization, guide §1.2/§4.2): (1) relevance
    = the exact quantized cosine of knn_bruteforce, top-``n_candidates``
    per query (window prune — ONE corpus pass, the only data-sized
    stage); (2)+(3) the candidate pairwise sims AND the whole greedy
    loop run per query in ONE grouped Arrow pass (``applyInPandas``):
    the kernel replicates ``cosine``'s quantized-int dot (floor at
    1e14, order-independent int64 sum, the identical double tree) and
    the unrolled loop's argmax/tiebreak semantics exactly, over the
    n_candidates-bounded frame.  The k−1-step relational unroll
    (anti-join + max-sim join + argmax window per pick — its final
    plan carried 836 Exchange nodes and Catalyst planning dominated
    the runtime) is kept verbatim as ``engine="relational"``, the A/B
    control; tests pin arrow ≡ relational pick-for-pick.
    The selection is deterministic: cosines are the proven exact
    pair expressions, the score is one fixed double tree of them, and
    ties break by id — the SQL twin re-derives the identical k picks.

    Returns (query_id, vec_id, mmr_rank, rel, score) — score is the
    MMR objective at pick time (rank 1: λ·rel, empty-set convention).
    """
    from timeseriesutils_spark.functions.cache import pin

    qb = queries.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("_qv")
    )
    cb = corpus.select(id_col, F.col(vec_col).alias("_cv"))
    scored = (
        cb.crossJoin(F.broadcast(qb))
        .filter(
            F.col(query_id) != F.col(id_col) if exclude_self else F.lit(True)
        )
        .select(
            query_id,
            id_col,
            cosine(F.col("_qv"), F.col("_cv")).alias("rel"),
            "_cv",
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("rel").desc(), F.col(id_col)
    )
    cand_base = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_candidates)
        .select(query_id, id_col, "rel", "_cv", "_rn")
    )
    if engine == "arrow":
        return _mmr_greedy_arrow(cand_base, query_id, id_col, k, lam)
    cand = pin(cand_base)
    c1 = cand.select(
        query_id, F.col(id_col).alias("_a"), F.col("_cv").alias("_va")
    )
    c2 = cand.select(
        query_id, F.col(id_col).alias("_b"), F.col("_cv").alias("_vb")
    )
    sims = pin(
        c1.join(c2, on=query_id)
        .filter(F.col("_a") != F.col("_b"))
        .select(
            query_id, "_a", "_b",
            cosine(F.col("_va"), F.col("_vb")).alias("sim"),
        )
    )
    lam_ = F.lit(float(lam))
    one_m = F.lit(float(1.0 - lam))
    selected = cand.filter(F.col("_rn") == 1).select(
        query_id,
        id_col,
        F.lit(1).alias("mmr_rank"),
        "rel",
        (lam_ * F.col("rel")).alias("score"),
    )
    for t in range(2, k + 1):
        remaining = cand.join(
            selected.select(query_id, id_col), on=[query_id, id_col],
            how="left_anti",
        )
        ms = (
            remaining.select(query_id, id_col, "rel")
            .join(
                sims.withColumnRenamed("_a", id_col),
                on=[query_id, id_col],
            )
            .join(
                selected.select(
                    query_id, F.col(id_col).alias("_b")
                ),
                on=[query_id, "_b"],
            )
            .groupBy(query_id, id_col)
            .agg(F.max("rel").alias("rel"), F.max("sim").alias("_ms"))
        )
        sc = ms.select(
            query_id,
            id_col,
            "rel",
            (lam_ * F.col("rel") - one_m * F.col("_ms")).alias("score"),
        )
        wt = Window.partitionBy(query_id).orderBy(
            F.col("score").desc(), F.col(id_col)
        )
        pick = (
            sc.withColumn("_p", F.row_number().over(wt))
            .filter(F.col("_p") == 1)
            .select(
                query_id, id_col, F.lit(t).alias("mmr_rank"), "rel", "score"
            )
        )
        selected = pin(selected.unionByName(pick))
    return selected


def mmr_diversify_sql(
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB twin of :func:`mmr_diversify`: the knn_bruteforce pair
    cosine, one MATERIALIZED candidate/sims base each, and the greedy
    loop unrolled as sel1..sel{k} CTE stages."""
    from timeseriesutils_spark.functions.exact import dlit

    lm = dlit(float(lam))
    om = dlit(float(1.0 - lam))
    dd = dim + 1
    ctes = [
        f"""
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
       WHERE {query_pred}),
relp AS MATERIALIZED (
  SELECT x.query_id, y.vec_id,
    CAST(SUM(CAST(FLOOR(CAST(x.embedding[t.i] AS DOUBLE)
      * CAST(y.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT))
      AS DOUBLE) / 1e14 AS dot,
    CAST(SUM(CAST(FLOOR(CAST(x.embedding[t.i] AS DOUBLE)
      * CAST(x.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT))
      AS DOUBLE) / 1e14 AS qq,
    CAST(SUM(CAST(FLOOR(CAST(y.embedding[t.i] AS DOUBLE)
      * CAST(y.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT))
      AS DOUBLE) / 1e14 AS cc
  FROM qv x, embeddings y, range(1, {dd}) t(i)
  WHERE y.vec_id <> x.query_id
  GROUP BY 1, 2
),
cand AS MATERIALIZED (
  SELECT query_id, vec_id, rel, _rn FROM (
    SELECT query_id, vec_id, dot / (SQRT(qq) * SQRT(cc)) AS rel,
      ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY dot / (SQRT(qq) * SQRT(cc)) DESC, vec_id) AS _rn
    FROM relp
  ) WHERE _rn <= {n_candidates}
),
simp AS MATERIALIZED (
  SELECT a.query_id, a.vec_id AS _a, b.vec_id AS _b,
    (CAST(SUM(CAST(FLOOR(CAST(x.embedding[t.i] AS DOUBLE)
       * CAST(y.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT))
       AS DOUBLE) / 1e14)
    / (SQRT(CAST(SUM(CAST(FLOOR(CAST(x.embedding[t.i] AS DOUBLE)
       * CAST(x.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT))
       AS DOUBLE) / 1e14)
     * SQRT(CAST(SUM(CAST(FLOOR(CAST(y.embedding[t.i] AS DOUBLE)
       * CAST(y.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT))
       AS DOUBLE) / 1e14)) AS sim
  FROM cand a
  JOIN cand b ON b.query_id = a.query_id AND b.vec_id <> a.vec_id
  JOIN embeddings x ON x.vec_id = a.vec_id
  JOIN embeddings y ON y.vec_id = b.vec_id,
  range(1, {dd}) t(i)
  GROUP BY 1, 2, 3
),
sel1 AS MATERIALIZED (
  SELECT query_id, vec_id, 1 AS mmr_rank, rel, {lm} * rel AS score
  FROM cand WHERE _rn = 1
)"""
    ]
    prev = "sel1"
    for t in range(2, k + 1):
        ctes.append(
            f"""
scor{t} AS (
  SELECT c.query_id, c.vec_id, c.rel,
    {lm} * c.rel - {om} * MAX(s.sim) AS score
  FROM cand c
  LEFT JOIN {prev} dup
    ON dup.query_id = c.query_id AND dup.vec_id = c.vec_id
  JOIN simp s ON s.query_id = c.query_id AND s._a = c.vec_id
  JOIN {prev} p ON p.query_id = s.query_id AND p.vec_id = s._b
  WHERE dup.vec_id IS NULL
  GROUP BY c.query_id, c.vec_id, c.rel
),
sel{t} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  SELECT query_id, vec_id, {t} AS mmr_rank, rel, score FROM (
    SELECT query_id, vec_id, rel, score,
      ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, vec_id) AS _p
    FROM scor{t}
  ) WHERE _p = 1
)"""
        )
        prev = f"sel{t}"
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT query_id, vec_id, CAST(mmr_rank AS INT) AS mmr_rank, rel, score
FROM {prev}
"""
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top_k: int = 10,
    query_id: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rn",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, public) of N ranked
    result lists — the standard hybrid-retrieval combiner (dense ANN +
    lexical BM25, or exact + compressed indexes): items score

        RRF(d) = Σ_lists 1/(k + rank_list(d))

    which needs NO score calibration between lists (only ranks), the
    reason it wins ensembling bake-offs.  Items missing from a list
    contribute nothing for it.

    Exactness: each reciprocal is a 1e-12-quantized int64 (bounded by
    rank ≥ 1, so Σ over lists stays far inside int64); the fused order
    sorts on the exact integer score with id tie-break — both engines
    derive identical fusions.  One union + one (query, id) collapse +
    one rank window over per-query-bounded frames.

    Returns (query_id, vec_id, rrf_score, fused_rank) — top_k rows per
    query.
    """
    q12 = 10**12
    parts = []
    for r in rankings:
        parts.append(
            r.select(
                query_id,
                id_col,
                F.floor(
                    F.lit(float(q12))
                    / (F.lit(float(k)) + F.col(rank_col).cast("double"))
                    + F.lit(0.5)
                ).cast("bigint").alias("_rr"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy(query_id, id_col).agg(F.sum("_rr").alias("_s"))
    w = Window.partitionBy(query_id).orderBy(
        F.col("_s").desc(), F.col(id_col)
    )
    return (
        agg.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_k)
        .select(
            query_id,
            id_col,
            (F.col("_s").cast("double") / F.lit(float(q12))).alias(
                "rrf_score"
            ),
            "fused_rank",
        )
    )


def rrf_fuse_sql(
    ranking_sqls: list[str],
    k: int = 60,
    top_k: int = 10,
    query_id: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rn",
) -> str:
    """DuckDB twin of :func:`rrf_fuse`; ``ranking_sqls`` are SELECTs
    emitting (query_id, id, rank)."""
    q12 = 10**12
    parts = " UNION ALL ".join(
        f"""SELECT {query_id}, {id_col},
  CAST(FLOOR({float(q12)!r} / ({float(k)!r}
    + CAST({rank_col} AS DOUBLE)) + 0.5) AS BIGINT) AS _rr
FROM ({sql})"""
        for sql in ranking_sqls
    )
    return f"""
WITH u AS ({parts}),
agg AS (
  SELECT {query_id}, {id_col}, CAST(SUM(_rr) AS BIGINT) AS _s
  FROM u GROUP BY {query_id}, {id_col}
)
SELECT {query_id}, {id_col},
  CAST(_s AS DOUBLE) / {float(q12)!r} AS rrf_score,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY {query_id} ORDER BY _s DESC, {id_col}) AS INT)
    AS fused_rank
FROM agg QUALIFY fused_rank <= {top_k}
"""


# --------------------------------------------------------------------------
# quadratic-kernel MMD drift (closed-form moments, no pairwise)
# --------------------------------------------------------------------------


def _mmd_moments_arrow(base):
    """Exact int64 moment PARTIALS per Arrow batch for
    :func:`mmd_quad_drift`: rows (s, -1, -1, count), (s, a, -1, Σx_a)
    and (s, a, b, Σx_a·x_b) — the Gram cells via one int64 matmul per
    (batch, sample).  Per-element products are the identical bigint
    products the relational ``transform`` built; the batch-sum
    envelope is asserted (ValueError instead of a silent wrap), and
    the caller's final combine sums the partials exactly.  NULL vector
    elements contribute nothing, exactly like the relational SUM's
    NULL skip."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("_s", IntegerType()),
            StructField("_a", IntegerType()),
            StructField("_b", IntegerType()),
            StructField("_sm", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out_s, out_a, out_b, out_m = [], [], [], []
            for s in (1, 2):
                rows = pdf[pdf["_s"] == s]["_q"]
                cnt = len(rows)
                if cnt == 0:
                    continue
                out_s.append(s)
                out_a.append(-1)
                out_b.append(-1)
                out_m.append(cnt)
                lens = rows.map(len)
                for d in sorted(set(lens)):
                    sub = rows[lens == d]
                    if d == 0:
                        continue
                    V = np.array(
                        [np.asarray(r, dtype=np.float64) for r in sub]
                    )
                    V = np.where(np.isnan(V), 0.0, V)
                    amax = float(np.abs(V).max(initial=0.0))
                    if amax >= 2**53 or (
                        amax * amax * len(sub) >= 2**62
                    ):
                        raise ValueError(
                            "mmd_quad_drift arrow kernel: quantized"
                            " magnitude exceeds the int64 batch"
                            " envelope"
                        )
                    Vi = V.astype(np.int64)
                    col = Vi.sum(axis=0)
                    gram = Vi.T @ Vi
                    out_s.extend([s] * d)
                    out_a.extend(range(d))
                    out_b.extend([-1] * d)
                    out_m.extend(int(x) for x in col)
                    aa, bb = np.meshgrid(
                        np.arange(d), np.arange(d), indexing="ij"
                    )
                    out_s.extend([s] * (d * d))
                    out_a.extend(aa.ravel().tolist())
                    out_b.extend(bb.ravel().tolist())
                    out_m.extend(gram.ravel().tolist())
            yield pd.DataFrame(
                {"_s": out_s, "_a": out_a, "_b": out_b, "_sm": out_m}
            ).astype({"_s": "int32", "_a": "int32", "_b": "int32", "_sm": "int64"})

    return base.mapInPandas(gen, schema)


def mmd_quad_drift(
    df: DataFrame,
    vec_col: str,
    sample_col: str,
    scale: int = 4,
    c: float = 1.0,
    max_dim: int = 128,
    engine: str = "arrow",
) -> DataFrame:
    """Maximum mean discrepancy between two embedding samples under the
    degree-2 polynomial kernel k(x,y) = (c + x·y)² — the drift test
    that sees DISTRIBUTION-SHAPE changes the centroid audit
    (embedding_drift) is blind to (a split that preserves the mean but
    rotates the covariance has linear-MMD 0 but quadratic-MMD > 0).

    The kernel's feature map is explicit, so the V-statistic collapses
    to CLOSED-FORM moments — no pairwise anything:

        MMD² = 2c·‖μ₁−μ₂‖² + ‖M₁/n₁ − M₂/n₂‖²_F,
        μ_s = Σx/n_s,  M_s = Σ x xᵀ / n_s

    (the c² terms cancel; the first term is the linear-kernel MMD, the
    second the second-moment Frobenius gap).  Exactness: components
    quantized at 10^-scale; with the common denominator n₁n₂ every
    per-dimension difference numerator n₂S₁−n₁S₂ (and per-pair
    n₂M₁−n₁M₂) is an exact integer, their squares sum in DECIMAL, and
    the output is one double division — aggregation order free.

    Scale shape: one posexplode for the first moments, one
    double-expansion for the d² second moments (rows × d² — the d=64
    testdata keeps this at 4096 cells; the aggregation is
    map-combinable so the shuffled state is 2·d² rows regardless of
    corpus size), one broadcast of the 1-row counts.

    Dimension budget: the second-moment expansion is d² cells per row
    (d=64 → 4 096; d=768 → 590k) — the quadratic-kernel scope is LOW-d
    embeddings.  For d > ``max_dim`` (default 128, ~16k cells) the plan
    raises at execution (a JVM-side assert, no driver collect): project
    first with :func:`timeseriesutils_spark.operators.pca.pca_project`
    (hash-green) and run the drift test in the projected space.

    Returns one row: (n_1, n_2, mmd2_linear, mmd2_quad, mmd2).
    """
    m = 10**scale
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(m) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    s = F.col(sample_col).cast("int")
    base = df.filter(
        F.col(vec_col).isNotNull() & s.isin(1, 2)
    ).select(s.alias("_s"), q.alias("_q"))
    # d² explode guard: fail loudly (JVM-side, no collect) rather than
    # build a 590k-cells-per-row plan on a d=768 column
    base = base.where(
        F.assert_true(
            F.size(F.col("_q")) <= F.lit(int(max_dim)),
            F.lit(
                f"mmd_quad_drift: vector dim exceeds max_dim={int(max_dim)}"
                " (d\u00b2 feature-map explode); pca_project first or"
                " raise max_dim deliberately"
            ),
        ).isNull()
    )
    from timeseriesutils_spark.functions.cache import pin

    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    if engine == "arrow":
        # round-14 (guide §4.2): the d² second-moment explode built
        # rows·d² cells (20M rows at sf0.1) just to sum them into 2·d²
        # cells.  One mapInPandas pass now emits exact int64 PARTIALS
        # per Arrow batch — counts (a=-1,b=-1), first moments (b=-1),
        # and the Gram cells via an int64 matmul (per-element products
        # are the identical bigint products the relational transform
        # computed; batch-sum envelope asserted, so numpy can never
        # silently wrap) — and the final combine is the same exact
        # integer sum (int64 partials under DECIMAL, association
        # free).  The explode form stays as engine="relational".
        out = pin(_mmd_moments_arrow(base))
        # coalesce against SUM(0): a present-but-one-sided corpus gives
        # the absent sample count 0 (the relational conditional-sum
        # behavior) while a fully empty corpus keeps the relational
        # all-NULL row
        counts = out.filter(F.col("_a") == -1).groupBy().agg(
            F.coalesce(
                F.sum(F.when(F.col("_s") == 1, F.col("_sm"))),
                F.sum(F.lit(0)),
            ).cast("bigint").alias("_n1"),
            F.coalesce(
                F.sum(F.when(F.col("_s") == 2, F.col("_sm"))),
                F.sum(F.lit(0)),
            ).cast("bigint").alias("_n2"),
        )
        firsts = (
            out.filter((F.col("_a") >= 0) & (F.col("_b") == -1))
            .groupBy("_s", "_a")
            .agg(F.sum("_sm").alias("_sv"))
        )
        seconds_src = (
            out.filter(F.col("_b") >= 0)
            .groupBy("_s", "_a", "_b")
            .agg(F.sum(dec(F.col("_sm"))).alias("_sm"))
        )
    else:
        base = pin(base)  # feeds counts + both moment passes
        counts = base.groupBy().agg(
            F.sum((F.col("_s") == 1).cast("bigint")).alias("_n1"),
            F.sum((F.col("_s") == 2).cast("bigint")).alias("_n2"),
        )
        firsts = base.select(
            "_s", F.posexplode("_q").alias("_a", "_v")
        ).groupBy("_s", "_a").agg(F.sum("_v").alias("_sv"))
        seconds_src = None
    f1 = firsts.filter(F.col("_s") == 1).select("_a", F.col("_sv").alias("_s1"))
    f2 = firsts.filter(F.col("_s") == 2).select("_a", F.col("_sv").alias("_s2"))
    fj = (
        f1.join(f2, "_a", "full")
        .crossJoin(F.broadcast(counts))
        .select(
            (
                F.col("_n2") * F.coalesce(F.col("_s1"), F.lit(0))
                - F.col("_n1") * F.coalesce(F.col("_s2"), F.lit(0))
            ).alias("_d")
        )
    )
    sumA2 = fj.agg(F.sum(dec(F.col("_d")) * dec(F.col("_d"))).alias("_sa2"))
    seconds = seconds_src if seconds_src is not None else (
        base.select("_s", "_q", F.posexplode("_q").alias("_a", "_va"))
        .select(
            "_s",
            "_a",
            F.posexplode(
                F.transform(F.col("_q"), lambda vb: vb * F.col("_va"))
            ).alias("_b", "_vab"),
        )
        .groupBy("_s", "_a", "_b")
        .agg(F.sum(dec(F.col("_vab"))).alias("_sm"))
    )
    m1 = seconds.filter(F.col("_s") == 1).select(
        "_a", "_b", F.col("_sm").alias("_m1")
    )
    m2 = seconds.filter(F.col("_s") == 2).select(
        "_a", "_b", F.col("_sm").alias("_m2")
    )
    mj = (
        m1.join(m2, ["_a", "_b"], "full")
        .crossJoin(F.broadcast(counts))
        .select(
            (
                F.col("_n2") * F.coalesce(F.col("_m1"), F.lit(0).cast("decimal(38,0)"))
                - F.col("_n1") * F.coalesce(F.col("_m2"), F.lit(0).cast("decimal(38,0)"))
            ).alias("_d")
        )
    )
    sumB2 = mj.agg(F.sum(F.col("_d") * F.col("_d")).alias("_sb2"))
    out = counts.crossJoin(F.broadcast(sumA2)).crossJoin(F.broadcast(sumB2))
    s2d = lambda col: F.col(col).cast("string").cast("double")  # noqa: E731
    n1 = F.col("_n1").cast("double")
    n2 = F.col("_n2").cast("double")
    den = n1 * n2
    mf = F.lit(float(m))
    lin = (
        F.lit(2.0 * float(c))
        * s2d("_sa2")
        / (den * den)
        / (mf * mf)
    )
    quad = s2d("_sb2") / (den * den) / (mf * mf * mf * mf)
    ok = (F.col("_n1") > 0) & (F.col("_n2") > 0)
    return out.select(
        F.col("_n1").alias("n_1"),
        F.col("_n2").alias("n_2"),
        F.when(ok, lin).alias("mmd2_linear"),
        F.when(ok, quad).alias("mmd2_quad"),
        F.when(ok, lin + quad).alias("mmd2"),
    )


def mmd_quad_drift_sql(
    data_sql: str,
    vec_col: str,
    sample_col: str,
    scale: int = 4,
    c: float = 1.0,
    max_dim: int = 128,
) -> str:
    """DuckDB twin of :func:`mmd_quad_drift` (same common-denominator
    integer moments, and the SAME d² explode guard: both engines raise
    at execution for d > ``max_dim`` — ADVICE r12 asymmetry fix)."""
    from timeseriesutils_spark.functions.exact import dlit

    m = 10**scale
    q = (
        f"CASE WHEN len({vec_col}) <= {int(max_dim)} THEN "
        f"list_transform({vec_col}, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {m} + 0.5) AS BIGINT)) "
        f"ELSE error('mmd_quad_drift: vector dim exceeds "
        f"max_dim={int(max_dim)} (d2 feature-map explode); pca_project "
        f"first or raise max_dim deliberately') END"
    )
    s2d = lambda col: f"CAST(CAST({col} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    n1 = "CAST(_n1 AS DOUBLE)"
    n2 = "CAST(_n2 AS DOUBLE)"
    den = f"({n1} * {n2})"
    mf = dlit(float(m))
    lin = f"({dlit(2.0 * float(c))} * {s2d('_sa2')} / ({den} * {den}) / ({mf} * {mf}))"
    quad = f"({s2d('_sb2')} / ({den} * {den}) / ({mf} * {mf} * {mf} * {mf}))"
    ok = "(_n1 > 0 AND _n2 > 0)"
    return f"""
WITH base AS (
  SELECT CAST({sample_col} AS INT) AS _s, {q} AS _q
  FROM ({data_sql})
  WHERE {vec_col} IS NOT NULL AND CAST({sample_col} AS INT) IN (1, 2)
),
counts AS (
  SELECT CAST(SUM(CASE WHEN _s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS _n1,
    CAST(SUM(CASE WHEN _s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS _n2
  FROM base
),
firsts AS (
  SELECT _s, u.a AS _a, CAST(SUM(u.v) AS BIGINT) AS _sv
  FROM base, LATERAL (SELECT unnest(_q) AS v,
                             generate_subscripts(_q, 1) AS a) u
  GROUP BY _s, u.a
),
fj AS (
  SELECT CAST(c._n2 * COALESCE(f1._sv, 0) - c._n1 * COALESCE(f2._sv, 0)
    AS HUGEINT) AS _d
  FROM (SELECT * FROM firsts WHERE _s = 1) f1
  FULL JOIN (SELECT * FROM firsts WHERE _s = 2) f2 USING (_a)
  CROSS JOIN counts c
),
sa AS (SELECT SUM(_d * _d) AS _sa2 FROM fj),
seconds AS (
  SELECT _s, u.a AS _a, w.b AS _b,
    SUM(CAST(u.v AS HUGEINT) * w.v) AS _sm
  FROM base,
    LATERAL (SELECT unnest(_q) AS v, generate_subscripts(_q, 1) AS a) u,
    LATERAL (SELECT unnest(_q) AS v, generate_subscripts(_q, 1) AS b) w
  GROUP BY _s, u.a, w.b
),
mj AS (
  SELECT CAST(c._n2 * COALESCE(m1._sm, 0) - c._n1 * COALESCE(m2._sm, 0)
    AS HUGEINT) AS _d
  FROM (SELECT * FROM seconds WHERE _s = 1) m1
  FULL JOIN (SELECT * FROM seconds WHERE _s = 2) m2 USING (_a, _b)
  CROSS JOIN counts c
),
sb AS (SELECT SUM(_d * _d) AS _sb2 FROM mj)
SELECT _n1 AS n_1, _n2 AS n_2,
  CASE WHEN {ok} THEN {lin} END AS mmd2_linear,
  CASE WHEN {ok} THEN {quad} END AS mmd2_quad,
  CASE WHEN {ok} THEN {lin} + {quad} END AS mmd2
FROM counts, sa, sb
"""
