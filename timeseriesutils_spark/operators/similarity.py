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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, vec_id, cos) — k rows per query, ties broken by
    vec_id for determinism.  The query side is broadcast: one pass over
    the (arbitrarily large) corpus, no corpus shuffle.
    """
    q = queries.select(F.col(id_col).alias(query_id), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    scored = c.join(F.broadcast(q), F.col(query_id) != F.col(id_col)).select(
        query_id,
        id_col,
        cosine(F.col("_qv"), F.col("_cv")).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos", "rn")
    )


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side
    constants, embedded as literals — no randomness at execution time)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id (bigint) for a vector column: bit i = sign of
    ⟨v, plane_i⟩.  Pure expressions; planes are literal arrays."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        bucket = bucket + F.when(dot > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(0)
    return bucket


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
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact rerank
    inside.  Corpus shuffles once on bucket id; at scale, bucket the
    corpus once (write partitioned by bucket) and amortize across query
    batches."""
    planes = random_hyperplanes(dim, bits, seed)
    cb = corpus.select(id_col, F.col(vec_col).alias("_cv"), lsh_bucket(F.col(vec_col), planes).alias("_b"))
    qb = queries.select(
        F.col(id_col).alias(query_id),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col), planes).alias("_b"),
    )
    scored = cb.join(F.broadcast(qb), on="_b").filter(F.col(query_id) != F.col(id_col)).select(
        query_id, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos", "rn")
    )
