"""Lomb–Scargle periodogram over IRREGULARLY sampled series — the
spectral tool the gappy/observational domain actually needs (Lomb 1976,
Scargle 1982, the Press & Rybicki formulation): ``domfreq`` /
``spectral_entropy`` require a regular grid, so users had to
``gap_fill`` first, which biases spectra; Lomb–Scargle evaluates the
least-squares sinusoid fit AT the observed timestamps.

Per group g with observations (t_i, x_i), centered dx_i = x_i − x̄ and
literal angular frequencies ω:

    τ(ω)  — atan2(Σ sin 2ωt_i, Σ cos 2ωt_i) / 2ω  (the phase that makes
            the cos/sin bases orthogonal)
    P(ω) = 1/(2σ²) · [ (Σ dx_i cos ω(t_i−τ))² / Σ cos²ω(t_i−τ)
                     + (Σ dx_i sin ω(t_i−τ))² / Σ sin²ω(t_i−τ) ]

Exactness contract (the taylor/DFT-twin renderer discipline): ONE
expression text runs on both engines — trig/atan2 outputs are the one
place libm implementations may differ in the last ulp, so every
trig-derived per-row term is floor-quantized (1e-9 for unit-range
values, 1e-6 for data products) to int64 BEFORE any cross-row sum;
sums are exact integers, and the final power is one fixed double tree
over exact-int-derived values.  Frequencies are driver literals
(``dlit``-rendered).

Scale shape: two grouped aggregations (the τ statistics, then the
power sums) with a broadcast join-back of the tiny per-group stats —
the per-row trig work is embarrassingly parallel, nothing is ever
collected, and each aggregate stage stays under the ~32-expression
whole-stage-codegen cliff for ≤ 5 frequencies (callers with a dense
grid should chunk frequencies across passes).

No counterpart in the reference engine (its domfreq at
/root/reference/src/timeseriesutils/featurize.py:543 assumes a regular grid) —
this is the §2.2b irregular-series extension.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.window_features import _as_list

__all__ = ["lomb_scargle", "lomb_scargle_sql"]


def _stage1_exprs(freqs: list[float]) -> list[str]:
    """Per-group τ statistics + variance sufficient stats (shared
    engine-neutral SQL text; SUMs cast to BIGINT for DuckDB's HUGEINT
    promotion — every sum is bounded far inside int64)."""
    ex = [
        "COUNT(*) AS n",
        "CAST(SUM(xq) AS BIGINT) AS sx",
        "SUM(CAST(xq AS HUGEINT) * xq) AS sxx",
    ]
    for k, f in enumerate(freqs):
        w2 = dlit(4.0 * math.pi * f)  # 2ω = 2·(2πf)
        ex.append(
            f"CAST(SUM(CAST(FLOOR(COS({w2} * tf) * 1e9 + 0.5) AS BIGINT))"
            f" AS BIGINT) AS c2_{k}"
        )
        ex.append(
            f"CAST(SUM(CAST(FLOOR(SIN({w2} * tf) * 1e9 + 0.5) AS BIGINT))"
            f" AS BIGINT) AS s2_{k}"
        )
    return ex


def _derived_exprs(freqs: list[float], scale_in: int) -> list[str]:
    """mean / σ² / quantized τ_k from the stage-1 integers — one shared
    double tree (the Σx² that can exceed 2^53 routes through VARCHAR,
    the r8 HUGEINT-cast rule)."""
    m = f"1e{scale_in}"
    ex = [
        f"CAST(sx AS DOUBLE) / n / {m} AS mean",
        f"(CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / {m} / {m}"
        f" - (CAST(sx AS DOUBLE) / {m}) * (CAST(sx AS DOUBLE) / {m}) / n)"
        f" / (n - 1) AS sig2",
    ]
    for k, f in enumerate(freqs):
        w2 = dlit(4.0 * math.pi * f)
        ex.append(
            f"CAST(FLOOR(ATAN2(CAST(s2_{k} AS DOUBLE), CAST(c2_{k} AS DOUBLE))"
            f" / {w2} * 1e9 + 0.5) AS BIGINT) AS tauq_{k}"
        )
    return ex


def _stage2_exprs(freqs: list[float], scale_in: int) -> list[str]:
    """Per-row quantized power terms, summed exactly."""
    m = f"1e{scale_in}"
    ex = []
    for k, f in enumerate(freqs):
        w = dlit(2.0 * math.pi * f)
        darg = f"({w} * (tf - CAST(tauq_{k} AS DOUBLE) / 1e9))"
        dx = f"(CAST(xq AS DOUBLE) / {m} - mean)"
        ex.append(
            f"CAST(SUM(CAST(FLOOR({dx} * COS({darg}) * 1e6 + 0.5) AS BIGINT))"
            f" AS BIGINT) AS sa_{k}"
        )
        ex.append(
            f"CAST(SUM(CAST(FLOOR({dx} * SIN({darg}) * 1e6 + 0.5) AS BIGINT))"
            f" AS BIGINT) AS sb_{k}"
        )
        ex.append(
            f"CAST(SUM(CAST(FLOOR(COS({darg}) * COS({darg}) * 1e9 + 0.5)"
            f" AS BIGINT)) AS BIGINT) AS scc_{k}"
        )
        ex.append(
            f"CAST(SUM(CAST(FLOOR(SIN({darg}) * SIN({darg}) * 1e9 + 0.5)"
            f" AS BIGINT)) AS BIGINT) AS sss_{k}"
        )
    return ex


def _power_expr(k: int) -> str:
    return (
        f"CASE WHEN sig2 > 0 AND scc_{k} > 0 AND sss_{k} > 0 THEN "
        f"((CAST(sa_{k} AS DOUBLE) / 1e6) * (CAST(sa_{k} AS DOUBLE) / 1e6)"
        f" / (CAST(scc_{k} AS DOUBLE) / 1e9)"
        f" + (CAST(sb_{k} AS DOUBLE) / 1e6) * (CAST(sb_{k} AS DOUBLE) / 1e6)"
        f" / (CAST(sss_{k} AS DOUBLE) / 1e9))"
        f" / (2e0 * sig2) END"
    )


def lomb_scargle(
    data: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    freqs: list[float],
    scale_in: int = 6,
) -> DataFrame:
    """Long-format Lomb–Scargle powers: one row per (group, freq) —
    (groups…, freq, n_obs, power).  ``freqs`` are ordinary frequencies
    (cycles per time unit); keep ≤ 5 per call (codegen envelope, see
    module docstring)."""
    if not freqs or len(freqs) > 5:
        raise ValueError("lomb_scargle takes 1-5 literal frequencies per call")
    g = _as_list(group_columns)
    m = float(10**scale_in)
    src = data.filter(
        F.col(value_col).isNotNull() & F.col(time_col).isNotNull()
    ).select(
        *g,
        F.col(time_col).cast("double").alias("tf"),
        F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5))
        .cast("bigint")
        .alias("xq"),
    )
    # Spark has no HUGEINT: the Σx² accumulator uses DECIMAL(38,0) with
    # the same VARCHAR-routed double cast downstream
    s1_exprs = [
        e.replace("SUM(CAST(xq AS HUGEINT) * xq)",
                  "SUM(CAST(xq AS DECIMAL(38,0)) * xq)")
        for e in _stage1_exprs(freqs)
    ]
    st1 = src.groupBy(*g).agg(
        *[F.expr(e) for e in s1_exprs]
    )
    # Spark spells the VARCHAR route CAST(x AS STRING); DuckDB has no
    # STRING alias — the one dialect split in the shared text
    st1 = st1.select(
        *g,
        *[
            F.expr(e.replace("AS VARCHAR)", "AS STRING)"))
            for e in _derived_exprs(freqs, scale_in)
        ],
    )
    joined = src.join(F.broadcast(st1), on=g)
    # sig2 is constant per group — carrying it as a grouping key keeps
    # it available to the power expression without a MAX() wrapper
    st2 = joined.groupBy(*g, "sig2").agg(
        *[F.expr(e) for e in _stage2_exprs(freqs, scale_in)],
        F.expr("CAST(COUNT(*) AS BIGINT) AS n_obs"),
    )
    stack_args = ", ".join(
        f"{dlit(f)}, {_power_expr(k)}" for k, f in enumerate(freqs)
    )
    return st2.selectExpr(
        *g,
        "n_obs",
        f"stack({len(freqs)}, {stack_args}) AS (freq, power)",
    ).select(*g, "freq", "n_obs", "power")


def lomb_scargle_sql(
    table: str,
    value_col: str,
    time_col: str,
    group_columns,
    freqs: list[float],
    scale_in: int = 6,
) -> str:
    """DuckDB twin of :func:`lomb_scargle` — the identical expression
    texts over the identical two-stage shape; the long format unrolls
    as one UNION ALL per frequency."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = f"1e{scale_in}"
    s1 = ",\n    ".join(_stage1_exprs(freqs))
    der = ",\n    ".join(_derived_exprs(freqs, scale_in))
    s2 = ",\n    ".join(_stage2_exprs(freqs, scale_in))
    unions = "\nUNION ALL\n".join(
        f"SELECT {gsel}, {dlit(f)} AS freq, n_obs, {_power_expr(k)} AS power"
        f" FROM st2"
        for k, f in enumerate(freqs)
    )
    return f"""
WITH src AS (
  SELECT {gsel}, CAST({time_col} AS DOUBLE) AS tf,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT) AS xq
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {time_col} IS NOT NULL
),
st1 AS (
  SELECT {gsel},
    {s1}
  FROM src GROUP BY {gsel}
),
drv AS (
  SELECT {gsel},
    {der}
  FROM st1
),
st2 AS (
  SELECT {gsel}, sig2,
    {s2},
    CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM src JOIN drv USING ({gsel})
  GROUP BY {gsel}, sig2
)
{unions}
"""
