"""Deterministic Poisson bootstrap — distributed confidence intervals
without resampling passes: the standard large-scale bootstrap (each row
enters replicate k with a Poisson(1) multiplicity, approximating a
with-replacement resample of n from n) made fully deterministic by
deriving every weight from an md5 hash of (row id, replicate) instead
of a RNG.

Scale design — the whole estimator is ONE aggregation pass:

* no explode: replicate weights are 2·R extra aggregate expressions
  (Σ wₖ·x, Σ wₖ) in the same map-combinable agg that computes the point
  estimate — the fact table is scanned once, shuffled never (one
  scalar reduce);
* replicate means and their spread are row-local array math on the
  single result row — R is a constant (default 32), so driver state is
  O(R).

Exactness: weights are exact ints (inverse-CDF thresholds on a 9-digit
md5 uniform — literal double thresholds shared with the twin); value
sums accumulate quantized cents in DECIMAL(38,0); the replicate-mean
fold runs in a FIXED left-to-right order in both engines (Spark
``aggregate`` from 0.0 ≡ an explicit left-associated sum chain, since
0.0 + x = x in IEEE), so the final interval is bit-identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# P(Poisson(1) <= k) for k = 0..5; k = 6 catches the remaining ~1e-4 tail
_POISSON_CDF = [
    sum(math.exp(-1) / math.factorial(j) for j in range(k + 1)) for k in range(6)
]


def _poisson_weight(u):
    """Inverse-CDF Poisson(1) from a uniform column, as a CASE chain."""
    w = F.lit(6)
    for k in range(len(_POISSON_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("bigint")


def _poisson_weight_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POISSON_CDF)
    )
    return f"CAST(CASE {arms} ELSE 6 END AS BIGINT)"


def bootstrap_mean_ci(
    data: DataFrame,
    value_col: str,
    id_col: str,
    replicates: int = 32,
    scale: int = 2,
) -> DataFrame:
    """Bootstrap standard error / normal-approximation 95% CI for the
    mean of ``value_col``.  Returns one row: (n, mean, boot_se, ci_lo,
    ci_hi, replicates).
    """
    from timeseriesutils_spark.operators.dedup import portable_hash64

    m = 10**scale
    x = F.floor(F.col(value_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(dec(x)).alias("_sx")]
    for k in range(replicates):
        u = (
            portable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(f":{k}")))
            % F.lit(1_000_000_000)
        ).cast("double") / F.lit(1e9)
        w = _poisson_weight(u)
        aggs.append(F.sum(dec(w * x)).alias(f"_wx{k}"))
        aggs.append(F.sum(dec(w)).alias(f"_w{k}"))
    one = data.agg(*aggs)
    mf = float(m)
    ms = [
        F.col(f"_wx{k}").cast("double")
        / F.lit(mf)
        / F.col(f"_w{k}").cast("double")
        for k in range(replicates)
    ]
    boot = F.array(*ms)
    rr = float(replicates)
    mu = F.aggregate(boot, F.lit(0.0), lambda a, v: a + v) / F.lit(rr)
    var = F.aggregate(
        boot, F.lit(0.0), lambda a, v: a + (v - mu) * (v - mu)
    ) / F.lit(rr - 1.0)
    se = F.sqrt(var)
    mean = F.col("_sx").cast("double") / F.lit(mf) / F.col("n").cast("double")
    return one.select(
        "n",
        mean.alias("mean"),
        se.alias("boot_se"),
        (mean - F.lit(1.96) * se).alias("ci_lo"),
        (mean + F.lit(1.96) * se).alias("ci_hi"),
        F.lit(replicates).alias("replicates"),
    )


def bootstrap_mean_ci_sql(
    table: str,
    value_col: str,
    id_col: str,
    replicates: int = 32,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`bootstrap_mean_ci`."""
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql

    m = 10**scale
    mf = float(m)
    x = f"CAST(FLOOR({value_col} * {m} + 0.5) AS BIGINT)"
    cols = [f"COUNT(*) AS n", f"SUM({x}) AS _sx"]
    for k in range(replicates):
        h = portable_hash64_sql(f"CONCAT(CAST({id_col} AS VARCHAR), ':{k}')")
        u = f"CAST({h} % 1000000000 AS DOUBLE) / 1e9"
        w = _poisson_weight_sql(u)
        cols.append(f"SUM({w} * {x}) AS _wx{k}")
        cols.append(f"SUM({w}) AS _w{k}")
    ms = [
        f"CAST(_wx{k} AS DOUBLE) / {mf!r} / CAST(_w{k} AS DOUBLE)"
        for k in range(replicates)
    ]
    rr = float(replicates)
    # left-associated chains mirror Spark's aggregate fold from 0.0
    mu = "(0.0 + " + " + ".join(f"({e})" for e in ms) + f") / {rr!r}"
    sq = "(0.0 + " + " + ".join(f"(({e}) - mu) * (({e}) - mu)" for e in ms) + ")"
    return f"""
WITH agg AS (SELECT {', '.join(cols)} FROM {table}),
mid AS (SELECT *, {mu} AS mu FROM agg),
fin AS (
  SELECT n,
    CAST(_sx AS DOUBLE) / {mf!r} / CAST(n AS DOUBLE) AS mean,
    sqrt({sq} / {rr - 1.0!r}) AS boot_se
  FROM mid
)
SELECT n, mean, boot_se,
  mean - 1.96 * boot_se AS ci_lo,
  mean + 1.96 * boot_se AS ci_hi,
  {replicates} AS replicates
FROM fin
"""
