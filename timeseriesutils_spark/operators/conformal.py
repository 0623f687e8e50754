"""Split-conformal prediction intervals (Vovk et al. 2005; Lei et al.
2018 "Distribution-Free Predictive Inference"): turn ANY point
forecaster into a calibrated interval with finite-sample coverage
1 − α, assuming only exchangeability of the calibration residuals.
The catalog scores interval forecasts (wis_eval, pinball_eval,
calibration_curve) but could not PRODUCE calibrated intervals before
this — conformal completes the forecast_e2e story.

Method (split conformal, absolute-residual score):

  1. forecaster: trailing rolling mean of width ``fit_window`` —
     ŷ_t = mean(y_{t−W}..y_{t−1}), strictly prior rows, so every
     calibration residual is an honest one-step-ahead error;
  2. calibration scores: r_t = |y_t − ŷ_t| for every row with a full
     prior window, EXCLUDING each group's final row (the test point);
  3. conformal quantile: the ⌈(n_cal + 1)(1 − α)⌉-th smallest score —
     a RANK, not an interpolated quantile, which is what gives the
     finite-sample guarantee;  n_cal < that rank ⇒ the interval is
     unbounded (NULL lo/hi, the standard small-n answer);
  4. interval for the next step: ŷ_{T+1} ± q, with ŷ_{T+1} the
     trailing mean ENDING at the last observed row.

Exactness: values quantize at 10^-scale; with the common denominator
W every residual is the exact integer |W·y_t − Σ_prior|; the rank
selection is ROW_NUMBER over (score, t) — deterministic ties — and
⌈(n+1)(1−α)⌉ is computed in integer arithmetic from a rational α
(``alpha_num/alpha_den``), so both engines select the SAME stored
residual.  Outputs are single divisions by the literal W·10^scale.

Scale shape: one ordered window pass per group (rolling sum + count),
one rank window over the group's calibration rows, one group
aggregate — a dimension-sized result at any volume, no joins beyond
the final broadcast-sized assembly.

Returns one row per group: (group..., n_cal, q_score, point_forecast,
lo, hi); q_score/lo/hi NULL when n_cal + 1 < ⌈(n_cal+1)(1−α)⌉ never
holds — i.e. when rank > n_cal (insufficient calibration data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conformal_intervals(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_columns,
    fit_window: int = 14,
    alpha_num: int = 1,
    alpha_den: int = 10,
    scale: int = 2,
) -> DataFrame:
    """Split-conformal next-step interval per group (module doc).
    ``alpha = alpha_num/alpha_den`` as a rational so the coverage rank
    ⌈(n+1)(1−α)⌉ is exact integer arithmetic in both engines."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    W = int(fit_window)
    if W < 1:
        raise ValueError("fit_window must be >= 1")
    an, ad = int(alpha_num), int(alpha_den)
    if not (0 < an < ad):
        raise ValueError("need 0 < alpha_num < alpha_den")
    m = 10 ** int(scale)
    vq = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    wi = Window.partitionBy(*g).orderBy("_t")
    wprior = wi.rowsBetween(-W, -1)
    wlast = wi.rowsBetween(-(W - 1), 0)
    wg = Window.partitionBy(*g)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *g,
        F.col(order_col).alias("_t"),
        vq.alias("_vq"),
    ).select(
        "*",
        F.sum("_vq").over(wprior).alias("_sp"),
        F.count(F.lit(1)).over(wprior).alias("_cp"),
        F.sum("_vq").over(wlast).alias("_sl"),
        F.count(F.lit(1)).over(wlast).alias("_cl"),
        F.row_number().over(
            Window.partitionBy(*g).orderBy(F.col("_t").desc())
        ).alias("_rdesc"),
    )
    # calibration scores: full prior window, not the final row
    cal = base.filter((F.col("_cp") == W) & (F.col("_rdesc") > 1)).select(
        *g, "_t",
        F.abs(F.col("_vq") * F.lit(W) - F.col("_sp")).alias("_r"),
    )
    wr = Window.partitionBy(*g).orderBy("_r", "_t")
    ranked = cal.select(
        *g, "_r",
        F.row_number().over(wr).alias("_rn"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    )
    # rank = ceil((n+1)(ad-an)/ad) via the POSITIVE-operand idiom
    # (x + ad - 1) div ad: DuckDB's // truncates toward zero on
    # negatives (NOT floor), so the -floor(-x) ceil idiom diverges
    rank = F.floor(
        ((F.col("_n") + 1) * F.lit(ad - an) + F.lit(ad - 1)) / F.lit(ad)
    ).cast("bigint")
    qs = ranked.groupBy(*g).agg(
        F.max("_n").alias("n_cal"),
        F.max(F.when(F.col("_rn") == rank, F.col("_r"))).alias("_q"),
    )
    # next-step point forecast: trailing mean ending at the last row
    nxt = base.filter((F.col("_rdesc") == 1) & (F.col("_cl") == W)).select(
        *g, F.col("_sl").alias("_sn")
    )
    den = float(W * m)
    point = F.col("_sn").cast("double") / F.lit(den)
    q = F.col("_q").cast("double") / F.lit(den)
    return (
        nxt.join(qs, g, "left")
        .select(
            *g,
            F.coalesce(F.col("n_cal"), F.lit(0)).cast("bigint").alias("n_cal"),
            q.alias("q_score"),
            point.alias("point_forecast"),
            (point - q).alias("lo"),
            (point + q).alias("hi"),
        )
    )


def conformal_intervals_sql(
    data_sql: str,
    value_col: str,
    order_col: str,
    group_columns,
    fit_window: int = 14,
    alpha_num: int = 1,
    alpha_den: int = 10,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`conformal_intervals` (same integer
    residuals, same integer coverage rank, same division order)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    W = int(fit_window)
    an, ad = int(alpha_num), int(alpha_den)
    if not (0 < an < ad):
        raise ValueError("need 0 < alpha_num < alpha_den")
    m = 10 ** int(scale)
    den = f"{float(W * m)!r}"
    return f"""
WITH base AS (
  SELECT {gsel}, {order_col} AS _t,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT) AS _vq
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
w AS (
  SELECT *,
    SUM(_vq) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W} PRECEDING AND 1 PRECEDING) AS _sp,
    COUNT(*) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W} PRECEDING AND 1 PRECEDING) AS _cp,
    SUM(_vq) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS _sl,
    COUNT(*) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS _cl,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _t DESC) AS _rdesc
  FROM base
),
cal AS (
  SELECT {gsel}, _t, abs(_vq * {W} - _sp) AS _r
  FROM w WHERE _cp = {W} AND _rdesc > 1
),
ranked AS (
  SELECT {gsel}, _r,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _r, _t) AS _rn,
    COUNT(*) OVER (PARTITION BY {gsel}) AS _n
  FROM cal
),
qs AS (
  SELECT {gsel}, CAST(MAX(_n) AS BIGINT) AS n_cal,
    MAX(CASE WHEN _rn = ((_n + 1) * {ad - an} + {ad - 1}) // {ad}
        THEN _r END) AS _q
  FROM ranked GROUP BY {gsel}
),
nxt AS (
  SELECT {gsel}, CAST(_sl AS BIGINT) AS _sn
  FROM w WHERE _rdesc = 1 AND _cl = {W}
)
SELECT {gsel},
  CAST(COALESCE(qs.n_cal, 0) AS BIGINT) AS n_cal,
  CAST(qs._q AS DOUBLE) / {den} AS q_score,
  CAST(nxt._sn AS DOUBLE) / {den} AS point_forecast,
  CAST(nxt._sn AS DOUBLE) / {den} - CAST(qs._q AS DOUBLE) / {den} AS lo,
  CAST(nxt._sn AS DOUBLE) / {den} + CAST(qs._q AS DOUBLE) / {den} AS hi
FROM nxt LEFT JOIN qs USING ({gsel})
"""


def cqr_intervals(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_columns,
    fit_window: int = 20,
    alpha_num: int = 1,
    alpha_den: int = 10,
    scale: int = 2,
) -> DataFrame:
    """Conformalized quantile regression (Romano, Patterson & Candès
    2019): the ADAPTIVE-width upgrade of :func:`conformal_intervals` —
    the base interval tracks local spread via trailing rank quantiles,
    and the conformal step calibrates its coverage:

      1. base interval per row: the ⌈W·α/2⌉-th smallest / symmetric
         largest of the prior ``fit_window`` values (exact order
         statistics of the trailing window — ``sort_array`` over a
         windowed ``collect_list``; W and the ranks are driver
         literals);
      2. conformity scores E_t = max(q̂_lo − y_t, y_t − q̂_hi) on every
         full-window row except the last (scores are NEGATIVE inside
         the base interval — CQR's signed score is what lets the
         calibrated interval SHRINK when the base is conservative);
      3. conformal adjustment Q = the ⌈(n+1)(1−α)⌉-th smallest score
         (exact integer rank, the positive-operand ceil idiom);
      4. next-step interval [q̂_lo − Q, q̂_hi + Q] from the trailing
         window ending at the last row.

    Exactness: quantized int64 values end-to-end — order statistics of
    integer arrays, integer scores, integer rank selection; the only
    doubles are the final divisions by the literal 10^scale.

    Scale shape: like conformal_intervals plus one W-element array
    sort per row (W is a small literal; the array never leaves the
    row) — still one exchange per group, no joins beyond the final
    group-sized broadcast assembly.

    Returns one row per group: (group..., n_cal, q_adjust, lo, hi) —
    NULL q_adjust/lo/hi when calibration is too short.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    W = int(fit_window)
    an, ad = int(alpha_num), int(alpha_den)
    if not (0 < an < ad):
        raise ValueError("need 0 < alpha_num < alpha_den")
    # lower-quantile rank at alpha/2 over W prior rows (driver literal)
    klo = max(1, (W * an + 2 * ad - 1) // (2 * ad))  # ceil(W*a/2)
    khi = W + 1 - klo
    if klo >= khi:
        raise ValueError("fit_window too small for alpha (klo >= khi)")
    m = 10 ** int(scale)
    vq = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    wi = Window.partitionBy(*g).orderBy("_t")
    wprior = wi.rowsBetween(-W, -1)
    wlast = wi.rowsBetween(-(W - 1), 0)
    wg = Window.partitionBy(*g)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *g,
        F.col(order_col).alias("_t"),
        vq.alias("_vq"),
    ).select(
        "*",
        F.sort_array(F.collect_list("_vq").over(wprior)).alias("_ap"),
        F.count(F.lit(1)).over(wprior).alias("_cp"),
        F.sort_array(F.collect_list("_vq").over(wlast)).alias("_al"),
        F.count(F.lit(1)).over(wlast).alias("_cl"),
        F.row_number().over(
            Window.partitionBy(*g).orderBy(F.col("_t").desc())
        ).alias("_rdesc"),
    )
    qlo_p = F.col("_ap")[klo - 1]
    qhi_p = F.col("_ap")[khi - 1]
    cal = base.filter((F.col("_cp") == W) & (F.col("_rdesc") > 1)).select(
        *g, "_t",
        F.greatest(
            qlo_p - F.col("_vq"), F.col("_vq") - qhi_p
        ).alias("_e"),
    )
    wr = Window.partitionBy(*g).orderBy("_e", "_t")
    ranked = cal.select(
        *g, "_e",
        F.row_number().over(wr).alias("_rn"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    )
    rank = F.floor(
        ((F.col("_n") + 1) * F.lit(ad - an) + F.lit(ad - 1)) / F.lit(ad)
    ).cast("bigint")
    qs = ranked.groupBy(*g).agg(
        F.max("_n").alias("n_cal"),
        F.max(F.when(F.col("_rn") == rank, F.col("_e"))).alias("_q"),
    )
    nxt = base.filter((F.col("_rdesc") == 1) & (F.col("_cl") == W)).select(
        *g,
        F.col("_al")[klo - 1].alias("_nlo"),
        F.col("_al")[khi - 1].alias("_nhi"),
    )
    md = float(m)
    return (
        nxt.join(qs, g, "left")
        .select(
            *g,
            F.coalesce(F.col("n_cal"), F.lit(0)).cast("bigint").alias("n_cal"),
            (F.col("_q").cast("double") / F.lit(md)).alias("q_adjust"),
            (
                (F.col("_nlo") - F.col("_q")).cast("double") / F.lit(md)
            ).alias("lo"),
            (
                (F.col("_nhi") + F.col("_q")).cast("double") / F.lit(md)
            ).alias("hi"),
        )
    )


def cqr_intervals_sql(
    data_sql: str,
    value_col: str,
    order_col: str,
    group_columns,
    fit_window: int = 20,
    alpha_num: int = 1,
    alpha_den: int = 10,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`cqr_intervals` (same integer order
    statistics via list_sort over windowed list(), same signed scores,
    same positive-operand ceil rank)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    W = int(fit_window)
    an, ad = int(alpha_num), int(alpha_den)
    if not (0 < an < ad):
        raise ValueError("need 0 < alpha_num < alpha_den")
    klo = max(1, (W * an + 2 * ad - 1) // (2 * ad))
    khi = W + 1 - klo
    if klo >= khi:
        raise ValueError("fit_window too small for alpha (klo >= khi)")
    m = 10 ** int(scale)
    md = f"{float(m)!r}"
    return f"""
WITH base AS (
  SELECT {gsel}, {order_col} AS _t,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT) AS _vq
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
w AS (
  SELECT *,
    list_sort(list(_vq) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W} PRECEDING AND 1 PRECEDING)) AS _ap,
    COUNT(*) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W} PRECEDING AND 1 PRECEDING) AS _cp,
    list_sort(list(_vq) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)) AS _al,
    COUNT(*) OVER (PARTITION BY {gsel} ORDER BY _t
      ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS _cl,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _t DESC) AS _rdesc
  FROM base
),
cal AS (
  SELECT {gsel}, _t,
    GREATEST(_ap[{klo}] - _vq, _vq - _ap[{khi}]) AS _e
  FROM w WHERE _cp = {W} AND _rdesc > 1
),
ranked AS (
  SELECT {gsel}, _e,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _e, _t) AS _rn,
    COUNT(*) OVER (PARTITION BY {gsel}) AS _n
  FROM cal
),
qs AS (
  SELECT {gsel}, CAST(MAX(_n) AS BIGINT) AS n_cal,
    MAX(CASE WHEN _rn = ((_n + 1) * {ad - an} + {ad - 1}) // {ad}
        THEN _e END) AS _q
  FROM ranked GROUP BY {gsel}
),
nxt AS (
  SELECT {gsel}, _al[{klo}] AS _nlo, _al[{khi}] AS _nhi
  FROM w WHERE _rdesc = 1 AND _cl = {W}
)
SELECT {gsel},
  CAST(COALESCE(qs.n_cal, 0) AS BIGINT) AS n_cal,
  CAST(qs._q AS DOUBLE) / {md} AS q_adjust,
  CAST(nxt._nlo - qs._q AS DOUBLE) / {md} AS lo,
  CAST(nxt._nhi + qs._q AS DOUBLE) / {md} AS hi
FROM nxt LEFT JOIN qs USING ({gsel})
"""
