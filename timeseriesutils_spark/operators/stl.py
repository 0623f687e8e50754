"""STL seasonal-trend decomposition (Cleveland et al. 1990) on a
regular integer time grid — the field-standard LOESS decomposition the
catalog's classical forms (decompose_series: centered-MA trend;
decompose_robust: median forms) do not cover.

One inner STL iteration, exactly the paper's steps with the initial
trend T⁰ = 0 and no robustness (outer) loop:

  1. cycle-subseries smoothing — each phase-p subseries (t ≡ p mod P)
     is LOESS(degree-1)-smoothed; at the CENTER of a symmetric ±hs
     window on a regular grid the degree-1 fit equals the tricube-
     weighted mean (Σ w_k·k = 0 by symmetry), so the smoother is a
     fixed linear filter with literal weights,
  2. low-pass — MA_P ∘ MA_P ∘ MA_3 of the raw seasonal (the paper's
     step 3), a composite integer kernel of width 2P+1 with exact
     rational weights c_j / 3P²,
  3. seasonal = raw − low-pass (step 4),
  4. trend — tricube LOESS-at-center (±ht rows) of the deseasonalized
     series (step 6),
  5. remainder = value − seasonal − trend.

The taylor/holt impulse-weight discipline: every smoother weight is a
DRIVER-computed literal (tricube weights floor-quantized at 1e-6, the
low-pass counts exact integers), so each stage is a Σ literal·lead/lag
expression over ONE ordered window per group — the whole decomposition
is window expressions on a single exchange, no joins, no Python, and
identical literal trees in the DuckDB twin.

Exactness: input values floor-quantized at 10^-scale; every stage sum
is an exact integer (trend accumulates in DECIMAL/HUGEINT — its terms
reach ~1e22); outputs are single divisions by driver-literal
denominators (string-cast where the numerator exceeds 2^53).  Edges
follow the complete-window NULL discipline: a window that runs off the
series yields NULL seasonal/trend/remainder (NULL propagates through
the chained + automatically).

Precondition: ``time_col`` is a REGULAR integer grid with step 1 per
group (compose ``timegrid.regularize`` first — the declared query
does); phase anchoring is calendar-stable (t mod P), so two engines
computing on the same grid agree row-for-row.

Reference scope note: reichlab/timeseriesutils has no decomposition
operator (featurize.py is windowed Taylor polynomials); STL here is
the §2.2b capability row for the standard public algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WQ = 10**6  # tricube weight quantum (per-stage literal denominators)


def _tricube_q(h: int) -> list[int]:
    """Quantized symmetric tricube weights for offsets -h..h."""
    out = []
    for k in range(-h, h + 1):
        u = abs(k) / (h + 1.0)
        w = (1.0 - u**3) ** 3
        out.append(int(w * _WQ + 0.5))
    return out


def _lowpass_counts(period: int) -> list[int]:
    """Integer kernel of MA_P ∘ MA_P ∘ MA_3, offsets -P..P; sums 3P²."""
    p = int(period)
    box = [1] * p

    def conv(a, b):
        n = len(a) + len(b) - 1
        out = [0] * n
        for i, x in enumerate(a):
            for j, y in enumerate(b):
                out[i + j] += x * y
        return out

    k = conv(conv(box, box), [1, 1, 1])
    assert len(k) == 2 * p + 1 and sum(k) == 3 * p * p
    return k


def stl_decompose(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
) -> DataFrame:
    """One-iteration STL with literal quantized-LOESS weights (module
    doc).  Returns (group..., time, value, seasonal, trend, remainder)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    P = int(period)
    hs, ht = int(seasonal_h), int(trend_h)
    if P < 2 or hs < 1 or ht < 1:
        raise ValueError("need period >= 2, seasonal_h >= 1, trend_h >= 1")
    mult = 10 ** int(scale)
    Wq = _tricube_q(hs)  # seasonal weights, offsets -hs..hs (in cycles)
    Uq = _tricube_q(ht)  # trend weights, offsets -ht..ht (in rows)
    cj = _lowpass_counts(P)  # low-pass counts, offsets -P..P
    SW = sum(Wq)
    SU = sum(Uq)
    DL = SW * 3 * P * P  # seasonal-numerator denominator

    wi = Window.partitionBy(*g).orderBy("_t")
    t = F.col(time_col).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731

    def off(col, k):
        return F.lead(col, k).over(wi) if k > 0 else (
            F.lag(col, -k).over(wi) if k < 0 else F.col(col)
        )

    base = df.select(
        *g,
        t.alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        F.floor(F.col(value_col).cast("double") * F.lit(mult) + F.lit(0.5))
        .cast("bigint")
        .alias("_xq"),
    )
    # 1. cycle-subseries tricube smoothing: neighbors k cycles away are
    # exactly k*P rows away on the regular grid — one window partition
    # serves every stage
    s_num = None
    for i, k in enumerate(range(-hs, hs + 1)):
        term = F.lit(Wq[i]) * off("_xq", k * P)
        s_num = term if s_num is None else s_num + term
    s1 = base.select("*", s_num.alias("_sn"))
    # 2./3. seasonal = raw - lowpass(raw), over the common denom DL
    l_num = None
    for i, j in enumerate(range(-P, P + 1)):
        term = F.lit(cj[i]) * off("_sn", j)
        l_num = term if l_num is None else l_num + term
    s2 = s1.select(
        "*", (F.col("_sn") * F.lit(3 * P * P) - l_num).alias("_seasn")
    )
    # 4. trend: tricube LOESS-at-center of (x - seasonal), denom DL*SU
    s3 = s2.select(
        "*", (F.col("_xq") * F.lit(DL) - F.col("_seasn")).alias("_vn")
    )
    t_num = None
    for i, m in enumerate(range(-ht, ht + 1)):
        term = dec(F.lit(Uq[i])) * dec(off("_vn", m))
        t_num = term if t_num is None else t_num + term
    s4 = s3.select("*", t_num.alias("_trn"))

    den_s = float(DL * mult)
    den_t = float(DL * SU * mult)
    seasonal = s2d(F.col("_seasn")) / F.lit(den_s)
    trend = s2d(F.col("_trn")) / F.lit(den_t)
    return s4.select(
        *g,
        F.col("_t").alias(time_col),
        F.col("_v").alias("value"),
        seasonal.alias("seasonal"),
        trend.alias("trend"),
        (F.col("_v") - seasonal - trend).alias("remainder"),
    )


def stl_decompose_sql(
    data_sql: str,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`stl_decompose` (same literal weights,
    same integer stages via HUGEINT, same division order)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    P = int(period)
    hs, ht = int(seasonal_h), int(trend_h)
    mult = 10 ** int(scale)
    Wq = _tricube_q(hs)
    Uq = _tricube_q(ht)
    cj = _lowpass_counts(P)
    SW = sum(Wq)
    SU = sum(Uq)
    DL = SW * 3 * P * P
    gsel = ", ".join(g)
    word = f"(PARTITION BY {gsel} ORDER BY _t)"

    def off(col: str, k: int) -> str:
        if k > 0:
            return f"LEAD({col}, {k}) OVER word"
        if k < 0:
            return f"LAG({col}, {-k}) OVER word"
        return col

    s_num = " + ".join(
        f"{Wq[i]} * {off('_xq', k * P)}"
        for i, k in enumerate(range(-hs, hs + 1))
    )
    l_num = " + ".join(
        f"{cj[i]} * {off('_sn', j)}" for i, j in enumerate(range(-P, P + 1))
    )
    t_num = " + ".join(
        f"{Uq[i]} * CAST({off('_vn', m)} AS HUGEINT)"
        for i, m in enumerate(range(-ht, ht + 1))
    )
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    seasonal = f"({s2d('_seasn')} / {dlit(float(DL * mult))})"
    trend = f"({s2d('_trn')} / {dlit(float(DL * SU * mult))})"
    return f"""
WITH base AS (
  SELECT {gsel}, CAST({time_col} AS BIGINT) AS _t,
    CAST({value_col} AS DOUBLE) AS _v,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {mult} + 0.5) AS BIGINT) AS _xq
  FROM ({data_sql})
),
s1 AS (SELECT *, {s_num} AS _sn FROM base WINDOW word AS {word}),
s2 AS (SELECT *, _sn * {3 * P * P} - ({l_num}) AS _seasn
       FROM s1 WINDOW word AS {word}),
s3 AS (SELECT *, _xq * {DL} - _seasn AS _vn FROM s2),
s4 AS (SELECT *, {t_num} AS _trn FROM s3 WINDOW word AS {word})
SELECT {gsel}, _t AS {time_col}, _v AS value,
  {seasonal} AS seasonal, {trend} AS trend,
  _v - {seasonal} - {trend} AS remainder
FROM s4
"""
