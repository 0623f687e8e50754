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

Exactness: weights are exact ints — the replicate-k uniform is an
affine permutation (a_k·h + b_k) mod P31 of ONE md5 row hash (the
portable-MinHash machinery, operators/dedup.minhash_perms: one md5 per
row total, not one per replicate — the per-replicate-md5 form measured
87 s at sf0.1 vs ~3 s for this), pushed through literal inverse-CDF
thresholds; value sums accumulate quantized cents in DECIMAL(38,0);
the replicate-mean fold runs in a FIXED left-to-right order in both
engines (Spark ``aggregate`` from 0.0 ≡ an explicit left-associated
sum chain, since 0.0 + x = x in IEEE), so the interval is
bit-identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# P(Poisson(1) <= k) for k = 0..5; k = 6 catches the remaining ~1e-4 tail.
# Thresholds are pre-scaled to integer units of P31 so the per-row weight
# decision is a pure int64 comparison chain (no division, no doubles).
_POISSON_CDF = [
    sum(math.exp(-1) / math.factorial(j) for j in range(k + 1)) for k in range(6)
]


def _partial_schema(replicates: int) -> str:
    cols = ["n bigint", "_sx bigint"]
    for k in range(replicates):
        cols.append(f"_wx{k} bigint")
        cols.append(f"_w{k} bigint")
    return ", ".join(cols)


def _partial_sums_kernel(replicates: int, perms, thresholds):
    """mapInPandas kernel: one partial-sums row per partition.

    Exact int64 throughout — the affine hashes, threshold compares, and
    products are the same integers the expression form computes; the
    per-partition int64 accumulation cannot wrap (rows_per_partition ×
    6 × max|x_q| ≪ 2^63 for any sane partition size); cross-partition
    combination happens in DECIMAL upstream.
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        P = np.int64(2_147_483_647)
        A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
        B = np.array([b for _, b in perms], dtype=np.int64)[:, None]
        T = np.array(thresholds, dtype=np.int64)
        n = 0
        sx = 0
        wx = np.zeros(replicates, dtype=np.int64)
        ws = np.zeros(replicates, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = pdf["_x"].to_numpy(dtype=np.int64)
            h = pdf["_h0"].to_numpy(dtype=np.int64)
            n += len(x)
            sx += int(x.sum())
            hk = (h[None, :] * A + B) % P  # (R, n); products < 2^62
            w = np.zeros_like(hk)
            for t in T:
                w += hk >= t  # CASE hk < t_k -> k  ==  #thresholds <= hk
            wx += (w * x[None, :]).sum(axis=1)
            ws += w.sum(axis=1)
        out = {"n": [n], "_sx": [sx]}
        for k in range(replicates):
            out[f"_wx{k}"] = [int(wx[k])]
            out[f"_w{k}"] = [int(ws[k])]
        yield pd.DataFrame(out)

    return fn


def _poisson_thresholds_int(modulus: int) -> list[int]:
    return [int(c * modulus) for c in _POISSON_CDF]


def _poisson_weight(hk, thresholds: list[int]):
    """Inverse-CDF Poisson(1) from an integer hash in [0, modulus)."""
    w = F.lit(6)
    for k in range(len(thresholds) - 1, -1, -1):
        w = F.when(hk < F.lit(thresholds[k]), F.lit(k)).otherwise(w)
    return w.cast("bigint")


def _poisson_weight_sql(hk: str, thresholds: list[int]) -> str:
    arms = " ".join(
        f"WHEN {hk} < {t} THEN {k}" for k, t in enumerate(thresholds)
    )
    return f"CAST(CASE {arms} ELSE 6 END AS BIGINT)"


def bootstrap_mean_ci(
    data: DataFrame,
    value_col: str,
    id_col: str,
    replicates: int = 32,
    scale: int = 2,
    engine: str = "arrow",
) -> DataFrame:
    """Bootstrap standard error / normal-approximation 95% CI for the
    mean of ``value_col``.  Returns one row: (n, mean, boot_se, ci_lo,
    ci_hi, replicates).

    ``engine='arrow'`` (default) computes the 2R partial sums in ONE
    vectorized numpy pass per partition (mapInPandas) — a 65-buffer
    HashAggregate is Spark's slow path (~10 s at sf0.1 vs ~1.5 s for
    the Arrow kernel); the arithmetic is identical exact int64 either
    way, and tests pin the two engines bit-equal.  ``engine='expr'``
    is the pure-expression form the DuckDB twin mirrors literally.
    """
    from timeseriesutils_spark.operators.dedup import (
        P31,
        minhash_perms,
        portable_hash64,
    )

    m = 10**scale
    x = F.floor(F.col(value_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    perms = minhash_perms(replicates, seed=1234)
    thr = _poisson_thresholds_int(P31)
    h0 = (portable_hash64(F.col(id_col).cast("string")) % F.lit(P31)).alias("_h0")
    base = data.select(x.alias("_x"), h0)
    if engine == "arrow":
        partials = base.mapInPandas(
            _partial_sums_kernel(replicates, perms, thr),
            _partial_schema(replicates),
        )
    else:
        # pure-expression form (the shape the DuckDB twin mirrors):
        # weights materialize as projection columns FIRST (each CASE
        # chain evaluated once per row in one codegen stage), then 2R
        # decimal sums
        wcols = [
            _poisson_weight(
                (F.col("_h0") * F.lit(a) + F.lit(b)) % F.lit(P31), thr
            ).alias(f"_p{k}")
            for k, (a, b) in enumerate(perms)
        ]
        proj = base.select(F.col("_x"), *wcols)
        partials = proj.select(
            F.lit(1).cast("bigint").alias("n"),
            F.col("_x").alias("_sx"),
            *[
                (F.col(f"_p{k}") * F.col("_x")).alias(f"_wx{k}")
                for k in range(replicates)
            ],
            *[F.col(f"_p{k}").alias(f"_w{k}") for k in range(replicates)],
        )
    # final combine: a handful of partial rows (one per partition for
    # arrow; per input row for expr) through exact decimal sums
    aggs = [F.sum(F.col("n")).alias("n"), F.sum(dec(F.col("_sx"))).alias("_sx")]
    for k in range(replicates):
        aggs.append(F.sum(dec(F.col(f"_wx{k}"))).alias(f"_wx{k}"))
        aggs.append(F.sum(dec(F.col(f"_w{k}"))).alias(f"_w{k}"))
    one = partials.agg(*aggs)
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
    from timeseriesutils_spark.operators.dedup import (
        P31,
        minhash_perms,
        portable_hash64_sql,
    )

    m = 10**scale
    mf = float(m)
    x = f"CAST(FLOOR({value_col} * {m} + 0.5) AS BIGINT)"
    h0 = f"({portable_hash64_sql(f'CAST({id_col} AS VARCHAR)')} % {P31})"
    perms = minhash_perms(replicates, seed=1234)
    thr = _poisson_thresholds_int(P31)
    wdefs = ", ".join(
        f"{_poisson_weight_sql(f'(_h0 * {a} + {b}) % {P31}', thr)} AS _p{k}"
        for k, (a, b) in enumerate(perms)
    )
    cols = [f"COUNT(*) AS n", f"SUM(_x) AS _sx"]
    for k in range(replicates):
        cols.append(f"SUM(_p{k} * _x) AS _wx{k}")
        cols.append(f"SUM(_p{k}) AS _w{k}")
    ms = [
        f"CAST(_wx{k} AS DOUBLE) / {mf!r} / CAST(_w{k} AS DOUBLE)"
        for k in range(replicates)
    ]
    rr = float(replicates)
    # left-associated chains mirror Spark's aggregate fold from 0.0
    mu = "(0.0 + " + " + ".join(f"({e})" for e in ms) + f") / {rr!r}"
    sq = "(0.0 + " + " + ".join(f"(({e}) - mu) * (({e}) - mu)" for e in ms) + ")"
    return f"""
WITH base AS (SELECT {x} AS _x, {h0} AS _h0 FROM {table}),
proj AS (SELECT _x, {wdefs} FROM base),
agg AS (SELECT {', '.join(cols)} FROM proj),
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
