"""Forecast-support operators: seasonal-naive evaluation, calendar
features, leave-one-out target encoding.

The reference (reichlab/timeseriesutils, featurize.py) builds features
*for* forecasting models; these operators close the loop around that
workflow — the baseline forecast a featurized model must beat, the
calendar covariates every forecasting model wants next to the lag /
rollmean / taylor features, and the category-encoding step for the
boosted-tree models the reference targets (README.md:3 "gradient
boosting").

All pure built-in expressions.  Float determinism follows the repo
discipline (functions/exact.py): accumulate per-group error sums through
DECIMAL (exact, associative, partitioning-independent), derive ratios in
double from the exact sums.  Each op ships a DuckDB twin renderer so the
oracle runs the same tree in the same association order.

Scale notes (100 TB): every op here is one hash exchange on its group
key (or none — calendar features are per-row projections).  Error
metrics are map-side-combinable aggregates; the encoding is a window
over the category key, which AQE splits on skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import PRECISION, dlit
from timeseriesutils_spark.operators.window_features import _as_list, make_window

__all__ = [
    "naive_forecast_eval",
    "naive_forecast_eval_sql",
    "calendar_features",
    "calendar_features_sql_columns",
    "target_encode_loo",
    "target_encode_loo_sql_columns",
    "group_trend",
    "group_trend_sql",
    "seasonal_profile",
    "seasonal_profile_sql",
]


def naive_forecast_eval(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    season: int = 7,
    scale: int = 6,
) -> DataFrame:
    """Per-group error metrics of the seasonal-naive baseline
    ŷ_t = y_{t-season} — the standard yardstick a featurized model must
    beat (and the first sanity check on any forecasting pipeline).

    Emits one row per group: ``n_eval`` (rows with a defined forecast),
    ``mae``, ``rmse``, ``bias`` (mean error), ``mape`` (mean |err|/|y|
    over y ≠ 0, with ``n_mape`` its support count).

    Determinism: per-row error terms are single IEEE double ops.  MAE /
    bias / MAPE sums go through DECIMAL(38,scale) (exact + associative →
    identical for any partitioning / merge order and for the DuckDB
    twin).  The squared-error sum instead quantizes the error to an
    integer (floor(err·10^sq_scale + 0.5)) and sums q² as BIGINT: a
    squared-error decimal sum can exceed 2^53 in unscaled units, where
    DuckDB's decimal→double cast (int→double then scale division, two
    roundings) can differ from Java's correctly-rounded BigDecimal
    conversion by one ulp — a BIGINT→DOUBLE cast is a single rounding
    in both engines.  RMSE = sqrt(Σq²/n)/10^sq_scale, every step one
    IEEE op.  Range: |err|·10^sq_scale ≲ 3e9/√rows-per-group.
    """
    sq_scale = 2
    w = make_window(group_columns, order_by)
    g = _as_list(group_columns)
    err = F.col(column) - F.lag(column, season).over(w)
    dec = f"decimal({PRECISION},{scale})"
    y = F.col(column)
    ape = F.when(y != 0, F.abs(err) / F.abs(y))
    qerr = F.floor(err * F.lit(float(10**sq_scale)) + F.lit(0.5)).cast("bigint")
    staged = data.select(
        *g,
        err.alias("_err"),
        F.abs(err).cast(dec).alias("_aerr"),
        (qerr * qerr).alias("_sq"),
        err.cast(dec).alias("_derr"),
        ape.cast(dec).alias("_ape"),
    )
    n = F.count("_err")
    n_mape = F.count("_ape")
    return staged.groupBy(*g).agg(
        n.alias("n_eval"),
        (F.sum("_aerr").cast("double") / n).alias("mae"),
        (
            F.sqrt(F.sum("_sq").cast("double") / n) / F.lit(float(10**sq_scale))
        ).alias("rmse"),
        (F.sum("_derr").cast("double") / n).alias("bias"),
        (F.sum("_ape").cast("double") / n_mape).alias("mape"),
        n_mape.alias("n_mape"),
    )


def naive_forecast_eval_sql(
    table_sql: str,
    column: str,
    group_columns,
    order_by,
    season: int = 7,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`naive_forecast_eval` (same tree/order)."""
    sq_scale = 2
    g = ", ".join(_as_list(group_columns))
    over = f"(PARTITION BY {g} ORDER BY {', '.join(_as_list(order_by))})"
    dec = f"DECIMAL({PRECISION},{scale})"
    err = f"({column} - LAG({column}, {season}) OVER {over})"
    ape = f"CASE WHEN {column} <> 0 THEN ABS({err}) / ABS({column}) END"
    qerr = f"CAST(FLOOR({err} * {float(10 ** sq_scale)!r} + 0.5) AS BIGINT)"
    return f"""
WITH staged AS (
  SELECT {g},
    {err} AS _err,
    CAST(ABS({err}) AS {dec}) AS _aerr,
    ({qerr} * {qerr}) AS _sq,
    CAST({err} AS {dec}) AS _derr,
    CAST(({ape}) AS {dec}) AS _ape
  FROM ({table_sql})
)
SELECT {g},
  COUNT(_err) AS n_eval,
  CAST(SUM(_aerr) AS DOUBLE) / COUNT(_err) AS mae,
  SQRT(CAST(SUM(_sq) AS DOUBLE) / COUNT(_err)) / {float(10 ** sq_scale)!r} AS rmse,
  CAST(SUM(_derr) AS DOUBLE) / COUNT(_err) AS bias,
  CAST(SUM(_ape) AS DOUBLE) / COUNT(_ape) AS mape,
  COUNT(_ape) AS n_mape
FROM staged GROUP BY {g}
"""


# one name list shared by both renderers so the engines cannot drift;
# all INT-typed for cross-engine hashing
_CAL_NAMES = [
    "cal_year",
    "cal_quarter",
    "cal_month",
    "cal_day",
    "cal_doy",
    "cal_isodow",
    "cal_week",
    "cal_is_weekend",
    "cal_is_month_end",
]


def calendar_features(
    data: DataFrame, date_col: str, feature_names: list | None = None
) -> tuple[DataFrame, list]:
    """Calendar covariates from a date column: year / quarter / month /
    day / day-of-year / ISO weekday / ISO week / weekend + month-end
    flags.  Pure per-row projection — no shuffle, survives any scale.
    Flags are INT (nullable-boolean Arrow round-trips are engine-lumpy).
    ISO day-of-week is 1=Monday … 7=Sunday (Spark ``weekday()`` is
    0=Monday, DuckDB ``isodow`` is 1=Monday).
    """
    if feature_names is None:
        feature_names = []
    d = F.col(date_col)
    exprs = [
        F.year(d),
        F.quarter(d),
        F.month(d),
        F.dayofmonth(d),
        F.dayofyear(d),
        F.weekday(d) + F.lit(1),
        F.weekofyear(d),
        (F.weekday(d) >= 5).cast("int"),
        (d == F.last_day(d)).cast("int"),
    ]
    cols = [e.cast("int").alias(n) for n, e in zip(_CAL_NAMES, exprs)]
    feature_names.extend(_CAL_NAMES)
    return data.select("*", *cols), feature_names


def calendar_features_sql_columns(date_col: str) -> list[tuple[str, str]]:
    """DuckDB twin column list for :func:`calendar_features`."""
    c = date_col
    exprs = [
        f"CAST(year({c}) AS INT)",
        f"CAST(quarter({c}) AS INT)",
        f"CAST(month({c}) AS INT)",
        f"CAST(day({c}) AS INT)",
        f"CAST(dayofyear({c}) AS INT)",
        f"CAST(isodow({c}) AS INT)",
        f"CAST(weekofyear({c}) AS INT)",
        f"CAST(isodow({c}) >= 6 AS INT)",
        f"CAST({c} = last_day({c}) AS INT)",
    ]
    return list(zip(_CAL_NAMES, exprs))


def target_encode_loo(
    data: DataFrame,
    category_col: str,
    target_col: str,
    out_col: str | None = None,
    scale: int = 6,
) -> DataFrame:
    """Leave-one-out target encoding: each row gets the mean of
    ``target_col`` over all OTHER rows of its category — the standard
    high-cardinality categorical encoding for boosted trees that avoids
    leaking the row's own target.  NULL when the category has one row.

    Exact: the category sum accumulates in DECIMAL over an unbounded
    window partition (no order ⇒ no sort; one hash exchange on the
    category).  LOO value = (exact_sum − y) computed in DECIMAL, then
    one double division by (n−1).  Skewed categories: a hot category is
    one window partition — AQE cannot split an unbounded window, so at
    extreme skew pre-aggregate sums per category and broadcast-join back
    (same result; this window form is the single-pass default).
    """
    out_col = out_col or f"{target_col}_loo_{category_col}"
    dec = f"decimal({PRECISION},{scale})"
    w = Window.partitionBy(category_col)
    qy = F.col(target_col).cast(dec)
    s = F.sum(qy).over(w)
    n = F.count(target_col).over(w)
    loo = (s - qy).cast("double") / (n - F.lit(1)).cast("double")
    return data.select("*", F.when(n > 1, loo).alias(out_col))


def target_encode_loo_sql_columns(
    category_col: str, target_col: str, out_col: str | None = None, scale: int = 6
) -> tuple[str, str]:
    """(name, expr) DuckDB twin of :func:`target_encode_loo`."""
    out_col = out_col or f"{target_col}_loo_{category_col}"
    dec = f"DECIMAL({PRECISION},{scale})"
    over = f"(PARTITION BY {category_col})"
    qy = f"CAST({target_col} AS {dec})"
    s = f"SUM({qy}) OVER {over}"
    n = f"COUNT({target_col}) OVER {over}"
    expr = (
        f"CASE WHEN {n} > 1 THEN CAST(({s} - {qy}) AS DOUBLE)"
        f" / CAST(({n} - 1) AS DOUBLE) END"
    )
    return out_col, expr


def group_trend(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Per-group OLS trend of ``column`` against its row index: one row
    per group with ``slope`` (units per step), ``intercept`` (fitted
    value at the first row), ``n`` — the per-series linear trend summary
    (the whole-series counterpart of windowed_taylor_coefs' local β₁).

    Closed form from five sums: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    with x = 0-based row index.  y is quantized to integers
    (floor(y·10^scale + 0.5)) so every sum is an exact BIGINT and the
    slope is a deterministic double function of them — same discipline
    as rolling_corr; x is already integral.  Range guard:
    |y|·10^scale·n and n³ must stay under ~9.2e18 (bigint): n ≤ ~2M rows
    per group at scale 2.  One exchange (the window and the aggregate
    share the group partitioning).
    """
    w = make_window(group_columns, order_by)
    g = _as_list(group_columns)
    mult = float(10**scale)
    x = (F.row_number().over(w) - F.lit(1)).cast("bigint")
    qy = F.floor(F.col(column) * F.lit(mult) + F.lit(0.5)).cast("bigint")
    staged = data.select(*g, x.alias("_x"), qy.alias("_qy")).filter(
        F.col("_qy").isNotNull()
    )
    n = F.count("_qy")
    sx = F.sum("_x")
    sy = F.sum("_qy")
    sxy = F.sum(F.col("_x") * F.col("_qy"))
    sxx = F.sum(F.col("_x") * F.col("_x"))
    num = (n * sxy - sx * sy).cast("double")
    den = (n * sxx - sx * sx).cast("double")
    slope_q = num / den
    mean_y = sy.cast("double") / n.cast("double")
    mean_x = sx.cast("double") / n.cast("double")
    return staged.groupBy(*g).agg(
        n.alias("n"),
        F.when(den > 0, slope_q / F.lit(mult)).alias("slope"),
        F.when(den > 0, (mean_y - slope_q * mean_x) / F.lit(mult)).alias("intercept"),
    )


def group_trend_sql(
    table_sql: str,
    column: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`group_trend` (same tree/order)."""
    g = ", ".join(_as_list(group_columns))
    over = f"(PARTITION BY {g} ORDER BY {', '.join(_as_list(order_by))})"
    mult = float(10**scale)
    qy = f"CAST(FLOOR({column} * {mult!r} + 0.5) AS BIGINT)"
    x = f"CAST(ROW_NUMBER() OVER {over} - 1 AS BIGINT)"
    n = "COUNT(_qy)"
    sx, sy = "SUM(_x)", "SUM(_qy)"
    sxy, sxx = "SUM(_x * _qy)", "SUM(_x * _x)"
    num = f"CAST(({n} * {sxy} - {sx} * {sy}) AS DOUBLE)"
    den = f"CAST(({n} * {sxx} - {sx} * {sx}) AS DOUBLE)"
    slope_q = f"({num} / {den})"
    mean_y = f"(CAST({sy} AS DOUBLE) / CAST({n} AS DOUBLE))"
    mean_x = f"(CAST({sx} AS DOUBLE) / CAST({n} AS DOUBLE))"
    return f"""
WITH staged AS (
  SELECT {g}, {x} AS _x, {qy} AS _qy
  FROM ({table_sql})
)
SELECT {g}, {n} AS n,
  CASE WHEN {den} > 0 THEN {slope_q} / {mult!r} END AS slope,
  CASE WHEN {den} > 0 THEN ({mean_y} - {slope_q} * {mean_x}) / {mult!r} END AS intercept
FROM staged WHERE _qy IS NOT NULL GROUP BY {g}
"""


def seasonal_profile(
    data: DataFrame,
    column: str,
    date_col: str,
    group_columns,
    scale: int = 6,
) -> DataFrame:
    """Per-(group, ISO weekday) seasonal profile: observation count,
    exact mean, and the ratio to the group's overall mean — the
    day-of-week effect that dominates reporting-driven series (the
    reference's epi-surveillance domain: weekday reporting artifacts
    are the first seasonal signal a forecaster must model).

    One aggregation to (group, isodow) — map-combinable — then the
    group totals derive from summing the 7 weekday rows (a second tiny
    exchange over |groups|·7 rows, not a second fact scan).  All sums
    DECIMAL-exact; ratios divide exact sums in double.
    """
    g = _as_list(group_columns)
    dec = f"decimal({PRECISION},{scale})"
    dow = (F.weekday(F.col(date_col).cast("date")) + F.lit(1)).cast("int")
    per_dow = (
        data.select(*g, dow.alias("isodow"), F.col(column).cast(dec).alias("_q"))
        .groupBy(*g, "isodow")
        .agg(F.count("_q").alias("n"), F.sum("_q").alias("_s"))
    )
    w = Window.partitionBy(*g)
    tot_n = F.sum("n").over(w)
    tot_s = F.sum("_s").over(w)
    mean_dow = F.col("_s").cast("double") / F.col("n")
    mean_all = tot_s.cast("double") / tot_n
    return per_dow.select(
        *g,
        "isodow",
        "n",
        mean_dow.alias("dow_mean"),
        (mean_dow / mean_all).alias("dow_ratio"),
    )


def seasonal_profile_sql(
    table: str,
    column: str,
    date_col: str,
    group_columns,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`seasonal_profile` (same tree/order)."""
    g = ", ".join(_as_list(group_columns))
    dec = f"DECIMAL({PRECISION},{scale})"
    return f"""
WITH per_dow AS (
  SELECT {g}, CAST(isodow(CAST({date_col} AS DATE)) AS INT) AS isodow,
    COUNT(q) AS n, SUM(q) AS _s
  FROM (SELECT {g}, {date_col}, CAST({column} AS {dec}) AS q FROM {table})
  GROUP BY {g}, isodow(CAST({date_col} AS DATE))
)
SELECT {g}, isodow, n,
  CAST(_s AS DOUBLE) / n AS dow_mean,
  (CAST(_s AS DOUBLE) / n) /
    (CAST(SUM(_s) OVER (PARTITION BY {g}) AS DOUBLE) / SUM(n) OVER (PARTITION BY {g})) AS dow_ratio
FROM per_dow
"""


def seasonal_zscore(
    data: DataFrame,
    column: str,
    date_col: str,
    group_columns,
    threshold: float = 3.0,
    scale: int = 2,
    min_n: int = 5,
) -> DataFrame:
    """Seasonal-adjusted anomaly score: each observation standardized
    against its own (group, ISO weekday) stratum — "is this Monday
    unusual *for Mondays*" — the anomaly detector that survives strong
    weekly seasonality where a plain rolling z-score alarms every
    weekend (the reference's epi-reporting domain: seasonal_profile's
    scoring counterpart).

    Exactness: values quantized to BIGINT (floor(v·10^s + 0.5)); the
    stratum count / sum / sum-of-squares come from ONE whole-partition
    window over (group, isodow) — no join back, no second scan — and
    the population z is a fixed double formula of those exact integers:

        mean = s1/n;  var = s2/n − mean²;  z = (q − mean)/√var

    NULL where the stratum has < min_n points or zero variance.
    Range guard: n·(|v|·10^s)² < 9.2e18.

    Scale shape: a single hash exchange on (group, isodow) — the window
    needs no ordering (whole-partition frame), so there is no sort at
    all; everything stays in whole-stage codegen.
    """
    g = _as_list(group_columns)
    dow = (F.weekday(F.col(date_col).cast("date")) + F.lit(1)).cast("int")
    q = F.floor(F.col(column) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    base = data.select("*", dow.alias("isodow"), q.alias("_sz_q"))
    w = Window.partitionBy(*g, "isodow")
    tmp = base.select(
        "*",
        F.count("_sz_q").over(w).alias("_sz_n"),
        F.sum("_sz_q").over(w).alias("_sz_s1"),
        F.sum(F.col("_sz_q") * F.col("_sz_q")).over(w).alias("_sz_s2"),
    )
    n = F.col("_sz_n").cast("double")
    s1 = F.col("_sz_s1").cast("double")
    s2 = F.col("_sz_s2").cast("double")
    mean = s1 / n
    var = s2 / n - mean * mean
    z = F.when(
        (F.col("_sz_n") >= min_n) & (var > 0),
        (F.col("_sz_q").cast("double") - mean) / F.sqrt(var),
    )
    out_cols = [c for c in data.columns]
    return tmp.select(
        *out_cols,
        "isodow",
        z.alias("seasonal_z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))).alias(
            "is_seasonal_anomaly"
        ),
    )


def seasonal_zscore_sql(
    table: str,
    select_cols: str,
    column: str,
    date_col: str,
    group_columns,
    threshold: float = 3.0,
    scale: int = 2,
    min_n: int = 5,
) -> str:
    """DuckDB twin of :func:`seasonal_zscore` — same quantization,
    whole-partition window sums, and double formula shapes."""
    g = ", ".join(_as_list(group_columns))
    over = f"(PARTITION BY {g}, isodow)"
    q = "_sz_q"
    cnt = f"COUNT({q}) OVER {over}"
    n = f"CAST({cnt} AS DOUBLE)"
    s1 = f"CAST(SUM({q}) OVER {over} AS DOUBLE)"
    s2 = f"CAST(SUM({q} * {q}) OVER {over} AS DOUBLE)"
    mean = f"({s1} / {n})"
    var = f"({s2} / {n} - {mean} * {mean})"
    z = (
        f"CASE WHEN {cnt} >= {min_n} AND {var} > 0 "
        f"THEN (CAST({q} AS DOUBLE) - {mean}) / SQRT({var}) END"
    )
    return f"""
WITH base AS (
  SELECT {select_cols},
    CAST(isodow(CAST({date_col} AS DATE)) AS INT) AS isodow,
    CAST(FLOOR({column} * {float(10 ** scale)!r} + 0.5) AS BIGINT) AS _sz_q
  FROM {table}
)
SELECT {select_cols}, isodow,
  {z} AS seasonal_z,
  CASE WHEN ({z}) IS NOT NULL THEN ABS({z}) > {float(threshold)!r} END
    AS is_seasonal_anomaly
FROM base
"""


def rolling_origin_folds(
    data: DataFrame,
    time_col: str,
    fold_ends: list,
    horizon_days: int,
    embargo_days: int = 0,
) -> DataFrame:
    """Rolling-origin (walk-forward) backtest folds — the standard
    time-series cross-validation the reference's forecasting users run
    (train on everything ≤ origin, test on the next ``horizon_days``;
    an optional ``embargo_days`` purge gap between them prevents
    look-ahead leakage through lagged/rolling features).

    For each fold k with origin t_k: every input row is labeled
    ``train`` (time ≤ t_k), ``test`` (t_k + embargo < time ≤ t_k +
    embargo + horizon), or dropped for that fold.  Output = input rows
    × matching folds with (``fold``, ``origin``, ``split``) appended —
    the explode feeds per-fold featurize/fit/eval downstream.

    Scale shape: one cross join against a ≤|folds|-row broadcast dim +
    a per-row predicate — no shuffle at all; the fold dimension is the
    classic tiny broadcast side.  Row multiplication is |folds| in the
    worst case (every row trains in every fold) — the price of
    walk-forward evaluation itself, not of this formulation; filter
    folds upstream when only recent windows matter.
    """
    import datetime as _dt

    if horizon_days <= 0 or embargo_days < 0:
        raise ValueError("horizon_days must be > 0 and embargo_days ≥ 0")
    ends = [
        _dt.datetime.fromisoformat(e) if isinstance(e, str) else e
        for e in fold_ends
    ]
    folds = [(i, e) for i, e in enumerate(sorted(ends))]
    spark = data.sparkSession
    dim = spark.createDataFrame(folds, "fold int, origin_ts timestamp")
    t = F.col(time_col).cast("timestamp")
    test_lo = F.expr(f"origin_ts + INTERVAL {embargo_days} DAYS")
    test_hi = F.expr(f"origin_ts + INTERVAL {embargo_days + horizon_days} DAYS")
    lab = (
        F.when(t <= F.col("origin_ts"), "train")
        .when((t > test_lo) & (t <= test_hi), "test")
        .otherwise(None)
    )
    return (
        data.crossJoin(F.broadcast(dim))
        .withColumn("split", lab)
        .filter(F.col("split").isNotNull())
        .withColumn("origin", F.col("origin_ts").cast("string"))
        .drop("origin_ts")
    )


def rolling_origin_folds_sql(
    table: str,
    time_col: str,
    fold_ends: list,
    horizon_days: int,
    embargo_days: int = 0,
) -> str:
    """DuckDB twin of :func:`rolling_origin_folds`."""
    rows = ", ".join(
        f"({i}, TIMESTAMP '{e}')" for i, e in enumerate(sorted(fold_ends))
    )
    return f"""
WITH dim(fold, origin_ts) AS (VALUES {rows}),
j AS (
  SELECT t.*, d.fold, d.origin_ts,
    CASE
      WHEN CAST(t.{time_col} AS TIMESTAMP) <= d.origin_ts THEN 'train'
      WHEN CAST(t.{time_col} AS TIMESTAMP) > d.origin_ts + INTERVAL {embargo_days} DAY
       AND CAST(t.{time_col} AS TIMESTAMP)
           <= d.origin_ts + INTERVAL {embargo_days + horizon_days} DAY THEN 'test'
    END AS split
  FROM {table} t CROSS JOIN dim d
)
SELECT * EXCLUDE (origin_ts), CAST(origin_ts AS VARCHAR) AS origin
FROM j WHERE split IS NOT NULL
"""


def holt_weights(alpha: float, beta: float, window_size: int):
    """Impulse-response weights of the zero-initialized truncated Holt
    (double exponential smoothing) filter: weight of y_{t-j} on the
    final (level, trend) state, j = 0..w-1.

    State recursion s_t = A·s_{t-1} + B·y_t with
      A = [[1-a, 1-a], [-ab, 1-ab]],  B = [a, ab]^T
    so weight_j = A^j·B — computed once on the driver in float64 and
    emitted as literals into BOTH expression trees (the taylor P-matrix
    discipline).
    """
    import numpy as np

    a, b = float(alpha), float(beta)
    A = np.array([[1 - a, 1 - a], [-a * b, 1 - a * b]], dtype=float)
    B = np.array([a, a * b], dtype=float)
    wl, wb = [], []
    v = B.copy()
    for _ in range(window_size):
        wl.append(float(v[0]))
        wb.append(float(v[1]))
        v = A @ v
    return wl, wb


def holt_smooth(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    alpha: float = 0.3,
    beta: float = 0.1,
    window_size: int = 30,
) -> DataFrame:
    """Holt linear (double exponential) smoothing as a bounded linear
    filter: per row, ``level`` and ``trend`` are the zero-initialized
    truncated-filter response over the trailing ``window_size``
    observations, and ``forecast`` = level + trend is the one-step-ahead
    Holt forecast.

    Why truncated: the textbook recursion needs unbounded history per
    row (a sequential scan per group — the reference's pandas shape);
    expanding it as Σ_j w_j·lag_j with driver-precomputed impulse
    weights makes the op ONE window expression — single exchange, pure
    whole-stage codegen, 100 TB-safe — at the cost of the (documented,
    deterministic) zero-init truncation: residual weight (1-α)^w decays
    geometrically, ~2e-5 at α=0.3, w=30.  NULL until a full window
    exists (null lag arithmetic is the edge guard, the ewma pattern).
    """
    from functools import reduce as _reduce

    w = make_window(group_columns, order_by)
    wl, wb = holt_weights(alpha, beta, window_size)

    def combo(wts):
        terms = [
            F.lit(wt) * (F.lag(column, j).over(w) if j else F.col(column))
            for j, wt in enumerate(wts)
        ]
        return _reduce(lambda x, y: x + y, terms)

    level = combo(wl)
    trend = combo(wb)
    sfx = f"a{str(alpha).replace('.', 'p')}_b{str(beta).replace('.', 'p')}_w{window_size}"
    return data.select(
        "*",
        level.alias(f"{column}_holt_level_{sfx}"),
        trend.alias(f"{column}_holt_trend_{sfx}"),
        (level + trend).alias(f"{column}_holt_fc_{sfx}"),
    )


def holt_smooth_sql_columns(
    column: str,
    group_columns,
    order_by,
    alpha: float = 0.3,
    beta: float = 0.1,
    window_size: int = 30,
) -> list[tuple[str, str]]:
    """[(name, expr)] DuckDB twin of :func:`holt_smooth` — same
    literals, same term order, same association."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))})"
    )
    wl, wb = holt_weights(alpha, beta, window_size)

    def combo(wts):
        terms = [
            f"CAST('{wt!r}' AS DOUBLE) * "
            + (f"LAG({column}, {j}) OVER {over}" if j else column)
            for j, wt in enumerate(wts)
        ]
        return "(" + " + ".join(terms) + ")"

    sfx = f"a{str(alpha).replace('.', 'p')}_b{str(beta).replace('.', 'p')}_w{window_size}"
    lvl, trd = combo(wl), combo(wb)
    return [
        (f"{column}_holt_level_{sfx}", lvl),
        (f"{column}_holt_trend_{sfx}", trd),
        (f"{column}_holt_fc_{sfx}", f"({lvl} + {trd})"),
    ]


def growth_rates(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
    ln_scale: int = 6,
    out_scale: int = 9,
) -> DataFrame:
    """Per-series compound growth rate: OLS of ln(daily total) on the
    day index — the log-linear fit behind "X is growing n% per day";
    a straight-line fit on raw values (group_trend) misclassifies
    exponential growth, the log fit measures it.

    Daily totals are quantized-exact sums; ln is applied once per day
    and floor-quantized (the shared 1-ulp discipline); the OLS
    sufficient statistics are exact int64 products in DECIMAL; the
    growth rate exp(slope) − 1 is floor-quantized after the single exp.
    Days with non-positive totals are excluded (logged domain).
    ln_scale 6 keeps y² products inside int64 (ln values ≲ 40 → y ≲
    4e7, y² ≲ 1.6e15; scale 9 would overflow at y² ~ 1e21).

    Returns (group, n_days, slope_ln, pct_per_day, r2).
    """
    day0 = F.to_date(F.lit("1970-01-01"))
    daily = (
        events.select(
            F.col(group_col).alias("_g"),
            F.datediff(F.to_date(ts_col), day0).cast("bigint").alias("_d"),
            F.floor(F.col(value_col) * F.lit(100) + F.lit(0.5))
            .cast("bigint")
            .alias("_vq"),
        )
        .groupBy("_g", "_d")
        .agg(F.sum("_vq").alias("_tot"))
        .filter(F.col("_tot") > 0)
    )
    lm = float(10**ln_scale)
    om = float(10**out_scale)
    d = daily.select(
        "_g",
        F.col("_d").alias("_x"),
        F.floor(
            F.log(F.col("_tot").cast("double") / F.lit(100.0)) * F.lit(lm)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("_y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = d.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x") * F.col("_x"))).alias("_sxx"),
        F.sum(dec(F.col("_x") * F.col("_y"))).alias("_sxy"),
        F.sum(dec(F.col("_y") * F.col("_y"))).alias("_syy"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n_days").cast("double")
    cov = nn * s2d("_sxy") - s2d("_sx") * s2d("_sy")
    varx = nn * s2d("_sxx") - s2d("_sx") * s2d("_sx")
    vary = nn * s2d("_syy") - s2d("_sy") * s2d("_sy")
    slope = F.when(varx != 0, cov / varx / F.lit(lm))  # back to ln units
    pct = F.floor(
        (F.exp(slope) - F.lit(1.0)) * F.lit(om) + F.lit(0.5)
    ) / F.lit(om)
    return agg.select(
        F.col("_g").alias(group_col),
        "n_days",
        slope.alias("slope_ln"),
        F.when(varx != 0, pct).alias("pct_per_day"),
        F.when((varx != 0) & (vary != 0), cov * cov / (varx * vary)).alias("r2"),
    )


def growth_rates_sql(
    table: str = "events",
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
    ln_scale: int = 6,
    out_scale: int = 9,
) -> str:
    """DuckDB twin of :func:`growth_rates`."""
    lm = float(10**ln_scale)
    om = float(10**out_scale)
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n_days AS DOUBLE)"
    cov = f"({nn} * {s2d('_sxy')} - {s2d('_sx')} * {s2d('_sy')})"
    varx = f"({nn} * {s2d('_sxx')} - {s2d('_sx')} * {s2d('_sx')})"
    vary = f"({nn} * {s2d('_syy')} - {s2d('_sy')} * {s2d('_sy')})"
    slope = f"({cov} / {varx} / {dlit(lm)})"
    return f"""
WITH daily AS (
  SELECT {group_col} AS _g,
    date_diff('day', DATE '1970-01-01', CAST({ts_col} AS DATE)) AS _d,
    CAST(SUM(CAST(FLOOR({value_col} * 100 + 0.5) AS BIGINT)) AS BIGINT) AS _tot
  FROM {table} GROUP BY 1, 2
  HAVING SUM(CAST(FLOOR({value_col} * 100 + 0.5) AS BIGINT)) > 0
),
q AS (
  SELECT _g, _d AS _x,
    CAST(FLOOR(ln(CAST(_tot AS DOUBLE) / 100.0) * {dlit(lm)} + 0.5) AS BIGINT) AS _y
  FROM daily
),
agg AS (
  SELECT _g, COUNT(*) AS n_days,
    SUM(_x) AS _sx, SUM(_y) AS _sy,
    SUM(_x * _x) AS _sxx, SUM(_x * _y) AS _sxy, SUM(_y * _y) AS _syy
  FROM q GROUP BY _g
)
SELECT _g AS {group_col}, n_days,
  CASE WHEN {varx} <> 0 THEN {slope} END AS slope_ln,
  CASE WHEN {varx} <> 0 THEN
    FLOOR((exp({slope}) - 1.0) * {dlit(om)} + 0.5) / {dlit(om)} END AS pct_per_day,
  CASE WHEN {varx} <> 0 AND {vary} <> 0
       THEN {cov} * {cov} / ({varx} * {vary}) END AS r2
FROM agg
"""


def croston_forecast(
    demand: DataFrame,
    qty_col: str,
    day_col: str,
    group_columns,
    window_size: int = 8,
    ew_span: float = 5.0,
    scale: int = 2,
) -> DataFrame:
    """Croston's method for intermittent demand: per group, the
    exponentially-weighted mean demand SIZE (over nonzero-demand points)
    divided by the EW mean inter-demand INTERVAL — the standard forecast
    for sparse series where ordinary smoothing collapses toward zero
    (spare parts, rare SKUs, low-incidence surveillance counts).

    The recursive EWMAs use the repo's bounded-window convention
    (series_math.ewma_weights: normalized truncated trailing weights,
    the reference's ew_alpha = 2/(span+0.1)), evaluated at the LAST
    demand point of each group: fixed linear combinations of the last
    ``window_size`` demand sizes and of the last ``window_size``
    intervals — shuffle-free beyond the one exchange the sequence
    window needs, and oracle-expressible.  Sizes quantize to integer
    units; intervals are exact day differences; the only doubles are
    the two weighted sums and the final ratio, one shared tree.

    NULL forecast for groups with fewer than ``window_size`` + 1 demand
    points (a full size window plus a full interval window need n ≥ w+1).

    Returns (groups…, n_points, last_day, z_hat, p_hat, croston).
    """
    from timeseriesutils_spark.operators.series_math import ewma_weights

    g = _as_list(group_columns)
    m = 10**scale
    wts = ewma_weights(window_size, ew_span)
    qz = F.floor(F.col(qty_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    pts = demand.filter(F.col(qty_col).isNotNull() & (F.col(qty_col) != 0)).select(
        *g, F.col(day_col).cast("bigint").alias("_day"), qz.alias("_z")
    )
    w = Window.partitionBy(*g).orderBy("_day")
    pts = pts.withColumn("_q", F.col("_day") - F.lag("_day", 1).over(w))
    z_hat = None
    p_hat = None
    for j, wt in enumerate(wts):
        zj = F.lag("_z", j).over(w) if j else F.col("_z")
        qj = F.lag("_q", j).over(w) if j else F.col("_q")
        zt = F.lit(wt) * zj.cast("double")
        pt = F.lit(wt) * qj.cast("double")
        z_hat = zt if z_hat is None else z_hat + zt
        p_hat = pt if p_hat is None else p_hat + pt
    scored = pts.select(
        *g,
        "_day",
        (z_hat / F.lit(float(m))).alias("_zh"),
        p_hat.alias("_ph"),
        F.count(F.lit(1)).over(Window.partitionBy(*g)).alias("n_points"),
        F.row_number().over(Window.partitionBy(*g).orderBy(F.col("_day").desc())).alias("_rn"),
    )
    return scored.filter(F.col("_rn") == 1).select(
        *g,
        "n_points",
        F.col("_day").alias("last_day"),
        F.col("_zh").alias("z_hat"),
        F.col("_ph").alias("p_hat"),
        F.when(
            F.col("_ph").isNotNull() & (F.col("_ph") > 0),
            F.col("_zh") / F.col("_ph"),
        ).alias("croston"),
    )


def croston_forecast_sql(
    demand_sql: str,
    qty_col: str,
    day_col: str,
    group_columns,
    window_size: int = 8,
    ew_span: float = 5.0,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`croston_forecast`; ``demand_sql`` produces
    (groups…, day_col, qty_col)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.series_math import ewma_weights

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    wts = ewma_weights(window_size, ew_span)
    over = f"(PARTITION BY {gsel} ORDER BY _day)"
    z_terms = []
    p_terms = []
    for j, wt in enumerate(wts):
        zj = f"LAG(_z, {j}) OVER {over}" if j else "_z"
        qj = f"LAG(_q, {j}) OVER {over}" if j else "_q"
        z_terms.append(f"{dlit(wt)} * CAST({zj} AS DOUBLE)")
        p_terms.append(f"{dlit(wt)} * CAST({qj} AS DOUBLE)")
    z_hat = " + ".join(z_terms)
    p_hat = " + ".join(p_terms)
    return f"""
WITH pts AS (
  SELECT {gsel}, CAST({day_col} AS BIGINT) AS _day,
    CAST(FLOOR({qty_col} * {m} + 0.5) AS BIGINT) AS _z
  FROM ({demand_sql})
  WHERE {qty_col} IS NOT NULL AND {qty_col} <> 0
),
iv AS (
  SELECT *, _day - LAG(_day, 1) OVER {over} AS _q FROM pts
),
sc AS (
  SELECT {gsel}, _day,
    ({z_hat}) / {dlit(float(m))} AS _zh,
    ({p_hat}) AS _ph,
    COUNT(*) OVER (PARTITION BY {gsel}) AS n_points,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _day DESC) AS _rn
  FROM iv
)
SELECT {gsel}, n_points, _day AS last_day, _zh AS z_hat, _ph AS p_hat,
  CASE WHEN _ph IS NOT NULL AND _ph > 0 THEN _zh / _ph END AS croston
FROM sc WHERE _rn = 1
"""


def mase_eval(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    window: int = 7,
    scale: int = 2,
) -> DataFrame:
    """Per-group MASE scorecard (Hyndman & Koehler 2006) of the
    trailing-mean forecast: score ŷ_t = mean(y_{t-window} … y_{t-1})
    and scale its MAE by the in-sample one-step-naive MAE —

        MASE = MAE(model) / MAE(ŷ_t = y_{t-1})

    < 1 beats the naive walk, > 1 loses to it; the scale-free metric
    that lets error compare across groups of different magnitude
    (naive_forecast_eval's MAE/RMSE cannot).

    Exactness: values quantize to 10^-scale ints; the model error is
    kept in window-scaled integer units (window·y − Σ_window y, exact
    — no division before the sum), the naive error is a plain int
    difference, both accumulate in DECIMAL(38,0)/HUGEINT, and the
    final MASE is one shared expression tree over the two exact sums.
    Complete-window discipline: model errors only where all ``window``
    previous values exist, naive errors wherever y_{t-1} exists.

    One window pass + one map-combinable aggregation per group key —
    the naive_forecast_eval shape.

    Returns (groups…, n_model, n_naive, mae_model, mae_naive, mase);
    mase is NULL when the naive MAE is 0 or either support is empty.
    """
    g = _as_list(group_columns)
    w = make_window(g, _as_list(order_by))
    m = float(10**scale)
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.withColumn("_q", q)
    fr = w.rowsBetween(-window, -1)
    s = F.sum("_q").over(fr)
    c = F.count("_q").over(fr)
    model_err = F.when(
        c == window, F.abs(F.lit(window).cast("bigint") * F.col("_q") - s)
    )
    naive_err = F.abs(F.col("_q") - F.lag("_q", 1).over(w))
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    staged = d.select(*g, model_err.alias("_me"), naive_err.alias("_ne"))
    agg = staged.groupBy(*g).agg(
        F.count("_me").alias("n_model"),
        F.count("_ne").alias("n_naive"),
        F.sum(dec(F.col("_me"))).alias("_sm"),
        F.sum(dec(F.col("_ne"))).alias("_sn"),
    )
    nm = F.col("n_model").cast("double")
    nv = F.col("n_naive").cast("double")
    sm = F.col("_sm").cast("double")
    sn = F.col("_sn").cast("double")
    wd = float(window)
    mae_model = F.when(F.col("n_model") > 0, sm / (F.lit(wd) * nm) / F.lit(m))
    mae_naive = F.when(F.col("n_naive") > 0, sn / nv / F.lit(m))
    mase = F.when(
        (F.col("n_model") > 0) & (F.col("n_naive") > 0) & (sn > 0),
        (sm * nv) / (F.lit(wd) * nm * sn),
    )
    return agg.select(
        *g,
        "n_model",
        "n_naive",
        mae_model.alias("mae_model"),
        mae_naive.alias("mae_naive"),
        mase.alias("mase"),
    )


def diebold_mariano(
    data: DataFrame,
    column: str,
    series_columns,
    order_by,
    group_columns,
    window: int = 7,
    scale: int = 2,
    d_scale: int = 3,
) -> DataFrame:
    """Diebold–Mariano test of equal predictive accuracy — the
    inferential companion of :func:`mase_eval`: MASE says the
    trailing-``window``-mean forecast has a smaller error than the
    naive walk, DM says whether that difference is STATISTICALLY
    significant or sampling noise.

    Per series (``series_columns``), the per-step loss differential
    under squared error is

        d_t = (y_t − ŷ_A,t)² − (y_t − ŷ_B,t)²,
        ŷ_A = trailing-``window`` mean,  ŷ_B = y_{t−1} (naive)

    on complete cases (full window AND lag present), and the test
    aggregates over ``group_columns`` (cohorts of series):

        DM = d̄ / √(s²_d / n)   →  two-sided p via the engine kernel

    (the lag-0 variance estimator — the classic DM for one-step
    forecasts).  d_t < 0 favors the model; reject + negative DM =
    "the model significantly beats naive".

    Exactness: y quantizes to 10^-scale ints; both errors are exact
    integer trees (window-scaled for the mean, the mase_eval trick);
    d_t is one fixed double tree floor-quantized to 10^-d_scale, and
    n/Σd/Σd² accumulate in DECIMAL — so d̄, DM, and the decision are
    bit-identical across engines.  One window pass + one
    map-combinable aggregation.

    Returns (groups…, n, mean_loss_diff, dm_stat, p_value, reject_05).
    """
    from timeseriesutils_spark.operators.nonparam import two_sided_p_expr

    g = _as_list(group_columns)
    w = make_window(_as_list(series_columns), _as_list(order_by))
    m = float(10**scale)
    md = float(10**d_scale)
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.withColumn("_q", q)
    fr = w.rowsBetween(-window, -1)
    s = F.sum("_q").over(fr)
    c = F.count("_q").over(fr)
    qlag = F.lag("_q", 1).over(w)
    wd = float(window)
    ea = (F.lit(window).cast("bigint") * F.col("_q") - s).cast("double") / (
        F.lit(wd) * F.lit(m)
    )
    eb = (F.col("_q") - qlag).cast("double") / F.lit(m)
    dt = ea * ea - eb * eb
    dq = F.when(
        (c == window) & qlag.isNotNull(),
        F.floor(dt * F.lit(md) + F.lit(0.5)),
    ).cast("bigint")
    staged = d.select(*g, dq.alias("_dq"))
    d19 = F.col("_dq").cast("decimal(19,0)")
    agg = staged.groupBy(*g).agg(
        F.count("_dq").alias("n"),
        F.sum(F.col("_dq").cast("decimal(38,0)")).alias("_sd"),
        F.sum(d19 * d19).alias("_sdd"),
    )
    s2d = lambda col: F.col(col).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    dbar = s2d("_sd") / nn
    varq = s2d("_sdd") / nn - dbar * dbar
    ok = (F.col("n") > 1) & (varq > 0)
    dm = dbar / F.sqrt(varq / nn)
    p = two_sided_p_expr(dm)
    return agg.select(
        *g,
        "n",
        F.when(F.col("n") > 0, dbar / F.lit(md)).alias("mean_loss_diff"),
        F.when(ok, dm).alias("dm_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def diebold_mariano_sql(
    table_sql: str,
    column: str,
    series_columns,
    order_by,
    group_columns,
    window: int = 7,
    scale: int = 2,
    d_scale: int = 3,
) -> str:
    """DuckDB twin of :func:`diebold_mariano` (same trees/order)."""
    from timeseriesutils_spark.operators.nonparam import two_sided_p_sql

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    ssel = ", ".join(_as_list(series_columns))
    osel = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {ssel} ORDER BY {osel})"
    fr = (
        f"(PARTITION BY {ssel} ORDER BY {osel} "
        f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)"
    )
    m = float(10**scale)
    md = float(10**d_scale)
    qcol = f"CAST(FLOOR({column} * {dlit(m)} + 0.5) AS BIGINT)"
    ea = (
        f"(CAST(CAST({window} AS BIGINT) * _q - SUM(_q) OVER {fr} AS DOUBLE)"
        f" / ({dlit(float(window))} * {dlit(m)}))"
    )
    eb = f"(CAST(_q - LAG(_q, 1) OVER {over} AS DOUBLE) / {dlit(m)})"
    dt = f"({ea} * {ea} - {eb} * {eb})"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    dbar = f"({s2d('_sd')} / {nn})"
    varq = f"({s2d('_sdd')} / {nn} - {dbar} * {dbar})"
    dm = f"({dbar} / SQRT({varq} / {nn}))"
    p = two_sided_p_sql(dm)
    ok = f"n > 1 AND {varq} > 0"
    return f"""
WITH base AS (
  SELECT {gsel}, {ssel}, {osel}, {qcol} AS _q FROM ({table_sql})
), staged AS (
  SELECT {gsel},
    CASE WHEN COUNT(_q) OVER {fr} = {window}
          AND LAG(_q, 1) OVER {over} IS NOT NULL
         THEN CAST(FLOOR({dt} * {dlit(md)} + 0.5) AS BIGINT) END AS _dq
  FROM base
), agg AS (
  SELECT {gsel}, COUNT(_dq) AS n,
    SUM(CAST(_dq AS HUGEINT)) AS _sd,
    SUM(CAST(_dq AS HUGEINT) * CAST(_dq AS HUGEINT)) AS _sdd
  FROM staged GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN n > 0 THEN {dbar} / {dlit(md)} END AS mean_loss_diff,
  CASE WHEN {ok} THEN {dm} END AS dm_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


def mase_eval_sql(
    table_sql: str,
    column: str,
    group_columns,
    order_by,
    window: int = 7,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`mase_eval` (same tree/order)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    over = f"(PARTITION BY {gsel} ORDER BY {', '.join(_as_list(order_by))})"
    fr = (
        f"(PARTITION BY {gsel} ORDER BY {', '.join(_as_list(order_by))} "
        f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)"
    )
    m = float(10**scale)
    q = f"CAST(FLOOR({column} * {dlit(m)} + 0.5) AS BIGINT)"
    # HUGEINT→DOUBLE via VARCHAR: error sums can pass 2^53 at scale
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    osel = ", ".join(_as_list(order_by))
    return f"""
WITH base AS (
  SELECT {gsel}, {osel}, {q} AS _q FROM ({table_sql})
), staged AS (
  SELECT {gsel},
    CASE WHEN COUNT(_q) OVER {fr} = {window}
         THEN ABS(CAST({window} AS BIGINT) * _q - SUM(_q) OVER {fr}) END AS _me,
    ABS(_q - LAG(_q, 1) OVER {over}) AS _ne
  FROM base
), agg AS (
  SELECT {gsel},
    COUNT(_me) AS n_model, COUNT(_ne) AS n_naive,
    SUM(CAST(_me AS HUGEINT)) AS _sm, SUM(CAST(_ne AS HUGEINT)) AS _sn
  FROM staged GROUP BY {gsel}
)
SELECT {gsel}, n_model, n_naive,
  CASE WHEN n_model > 0 THEN {s2d('_sm')} / ({dlit(float(window))} * CAST(n_model AS DOUBLE)) / {dlit(m)} END AS mae_model,
  CASE WHEN n_naive > 0 THEN {s2d('_sn')} / CAST(n_naive AS DOUBLE) / {dlit(m)} END AS mae_naive,
  CASE WHEN n_model > 0 AND n_naive > 0 AND {s2d('_sn')} > 0
       THEN ({s2d('_sm')} * CAST(n_naive AS DOUBLE)) / ({dlit(float(window))} * CAST(n_model AS DOUBLE) * {s2d('_sn')}) END AS mase
FROM agg
"""


# --------------------------------------------------------------------------
# Theta-method forecast
# --------------------------------------------------------------------------


def theta_weights(ses_alpha: float, window_size: int):
    """Impulse-response weights of the zero-initialized truncated SES
    filter (w_j = α(1−α)^j) plus the two scalars the theta closed form
    needs: W = Σ w_j and S1 = Σ j·w_j — computed once on the driver in
    float64 and emitted as literals into BOTH expression trees (the
    holt_weights discipline)."""
    a = float(ses_alpha)
    ws = [a * (1.0 - a) ** j for j in range(window_size)]
    W = 0.0
    S1 = 0.0
    for j, wj in enumerate(ws):
        W += wj
        S1 += j * wj
    return ws, float(W), float(S1)


def theta_forecast(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    ses_alpha: float = 0.5,
    window_size: int = 30,
    horizons: tuple[int, ...] = (1, 7, 28),
    scale: int = 2,
) -> DataFrame:
    """Theta-method forecast per group (Assimakopoulos & Nikolopoulos
    2000 — the M3-competition winner): the equal-weight combination of
    the θ=0 line (the OLS trend, doubled long-run signal) and SES on
    the θ=2 line (doubled short-run curvature),

        ŷ_{n+h} = ½·(a + b·(n+h)) + ½·L₂,
        L₂ = SES_n(2y_t − (a + b·t))

    Holt answers "smooth level+trend"; theta is the cross-learning
    benchmark that beat it on M3.  The SES of the θ2 line never
    materializes z_t: by linearity L₂ = 2·SES_n(y) − a·W − b·(nW − S1)
    with W = Σw_j, S1 = Σ j·w_j driver literals — so the whole op is
    ONE window chain: row_number + partition-wide exact integer sums
    (Σty via one windowed product-sum; Σt, Σt² by the closed forms
    n(n+1)/2, n(n+1)(2n+1)/6), the truncated-SES lag combo
    (holt_smooth's filter discipline), filter to each group's last row.
    Single exchange, no joins, no plan forks, 100 TB-safe.

    Exactness: y quantizes to 10^-scale ints, every cross-row sum is
    exact integer, and (a, b, L₂, forecasts) are one fixed double tree
    mirrored verbatim in SQL.  Groups shorter than ``window_size`` get
    NULL forecasts (truncated-filter completeness, the holt rule);
    integer bound: Σt·q ≤ n²·q — swap the product sum to DECIMAL past
    ~1e5 rows/group at scale=2 on 1e7-unit values.

    Returns (groups…, n, intercept, slope, theta_level,
    fc_{h} per horizon).
    """
    from functools import reduce as _reduce

    g = _as_list(group_columns)
    order = _as_list(order_by)
    w = make_window(g, order)
    wall = Window.partitionBy(*g)
    m = float(10**scale)
    ws, W, S1 = theta_weights(ses_alpha, window_size)
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.select(*g, *order, q.alias("_q")).withColumn(
        "_rn", F.row_number().over(w)
    )
    terms = [
        F.lit(wt) * (F.lag("_q", j).over(w) if j else F.col("_q"))
        for j, wt in enumerate(ws)
    ]
    sesy = _reduce(lambda x, y: x + y, terms)
    staged = d.select(
        *g,
        F.col("_rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("_q").over(wall).alias("_sy"),
        F.sum(F.col("_rn") * F.col("_q")).over(wall).alias("_sty"),
        sesy.alias("_ses"),
    ).filter(F.col("_rn") == F.col("n"))
    nd = F.col("n").cast("double")
    st = nd * (nd + F.lit(1.0)) / F.lit(2.0)
    sxx = nd * (nd + F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(1.0)) / F.lit(6.0)
    sy = F.col("_sy").cast("double")
    sty = F.col("_sty").cast("double")
    denom = nd * sxx - st * st
    b = (nd * sty - st * sy) / denom
    a = (sy - b * st) / nd
    lvl2 = (
        F.lit(2.0) * F.col("_ses") - a * F.lit(W) - b * (nd * F.lit(W) - F.lit(S1))
    )
    ok = F.col("n") >= 2
    fcs = [
        F.when(
            ok,
            ((a + b * (nd + F.lit(float(h)))) + lvl2)
            * F.lit(0.5)
            / F.lit(m),
        ).alias(f"fc_{h}")
        for h in horizons
    ]
    return staged.select(
        *g,
        "n",
        F.when(ok, a / F.lit(m)).alias("intercept"),
        F.when(ok, b / F.lit(m)).alias("slope"),
        F.when(ok, lvl2 / F.lit(m)).alias("theta_level"),
        *fcs,
    )


def theta_forecast_sql(
    table_sql: str,
    column: str,
    group_columns,
    order_by,
    ses_alpha: float = 0.5,
    window_size: int = 30,
    horizons: tuple[int, ...] = (1, 7, 28),
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`theta_forecast` (same trees/order)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    osel = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {gsel} ORDER BY {osel})"
    wall = f"(PARTITION BY {gsel})"
    m = float(10**scale)
    ws, W, S1 = theta_weights(ses_alpha, window_size)
    qcol = f"CAST(FLOOR({column} * {dlit(m)} + 0.5) AS BIGINT)"
    terms = [
        f"{dlit(wt)} * " + (f"LAG(_q, {j}) OVER {over}" if j else "_q")
        for j, wt in enumerate(ws)
    ]
    ses = " + ".join(terms)
    nd = "CAST(n AS DOUBLE)"
    st = f"({nd} * ({nd} + 1.0) / 2.0)"
    sxx = f"({nd} * ({nd} + 1.0) * (2.0 * {nd} + 1.0) / 6.0)"
    sy = "CAST(_sy AS DOUBLE)"
    sty = "CAST(_sty AS DOUBLE)"
    denom = f"({nd} * {sxx} - {st} * {st})"
    b = f"(({nd} * {sty} - {st} * {sy}) / {denom})"
    a = f"(({sy} - {b} * {st}) / {nd})"
    lvl2 = (
        f"(2.0 * _ses - {a} * {dlit(W)} - {b} * ({nd} * {dlit(W)}"
        f" - {dlit(S1)}))"
    )
    fcs = ",\n  ".join(
        f"CASE WHEN n >= 2 THEN (({a} + {b} * ({nd} + {dlit(float(h))}))"
        f" + {lvl2}) * 0.5 / {dlit(m)} END AS fc_{h}"
        for h in horizons
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {osel}, {qcol} AS _q,
    ROW_NUMBER() OVER {over} AS _rn
  FROM ({table_sql})
),
staged AS (
  SELECT {gsel}, _rn,
    CAST(COUNT(*) OVER {wall} AS BIGINT) AS n,
    CAST(SUM(_q) OVER {wall} AS BIGINT) AS _sy,
    CAST(SUM(_rn * _q) OVER {wall} AS BIGINT) AS _sty,
    {ses} AS _ses
  FROM d
)
SELECT {gsel}, n,
  CASE WHEN n >= 2 THEN {a} / {dlit(m)} END AS intercept,
  CASE WHEN n >= 2 THEN {b} / {dlit(m)} END AS slope,
  CASE WHEN n >= 2 THEN {lvl2} / {dlit(m)} END AS theta_level,
  {fcs}
FROM staged WHERE _rn = n
"""


# --------------------------------------------------------------------------
# probability-forecast calibration
# --------------------------------------------------------------------------


def calibration_curve(
    data: DataFrame,
    prob_col: str,
    label_col,
    group_columns,
    bins: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Per-group reliability diagram + Brier/ECE of a probability
    forecast against a binary outcome — the calibration audit every
    scored model needs beside roc_auc's ranking check (a model can
    rank perfectly and still be wildly miscalibrated).

    Probabilities bucket into ``bins`` equal-width bins
    (floor(p·bins), top edge folded into the last bin); per bin the
    curve reports mean predicted probability vs observed positive
    rate, the Brier contribution, and the group-level expected
    calibration error ECE = Σ_b (n_b/N)·|obs_b − pred_b| plus the
    group Brier score ride along on every row (one partition-wide
    window over the ≤``bins`` rows per group).

    Exactness: per-row p and (p−y)² quantize to ints before DECIMAL
    sums; bin means are single double divisions of exact sums; the ECE
    window sums pre-quantized integers.  One aggregation + one tiny
    window — map-combinable, 100 TB-safe.

    Returns (groups…, bin, n, n_pos, mean_pred, frac_pos, gap,
    brier_bin, ece, brier).
    """
    from timeseriesutils_spark.operators.window_features import _as_list as _al

    g = _al(group_columns)
    mq = 10**scale
    p = F.col(prob_col).cast("double")
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    y = lab.cast("boolean").cast("bigint")
    b = F.least(
        F.floor(p * F.lit(float(bins))).cast("int"), F.lit(bins - 1)
    )
    pq = F.floor(p * F.lit(float(mq)) + F.lit(0.5)).cast("bigint")
    sq = F.floor(
        (p - y.cast("double")) * (p - y.cast("double")) * F.lit(float(mq))
        + F.lit(0.5)
    ).cast("bigint")
    d = data.filter(p.isNotNull() & lab.isNotNull()).select(
        *g, b.alias("bin"), y.alias("_y"), pq.alias("_pq"), sq.alias("_sq")
    )
    agg = d.groupBy(*g, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("n_pos"),
        F.sum(F.col("_pq").cast("decimal(38,0)")).alias("_sp"),
        F.sum(F.col("_sq").cast("decimal(38,0)")).alias("_sb"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    mean_pred = s2d("_sp") / nn / F.lit(float(mq))
    frac_pos = F.col("n_pos").cast("double") / nn
    gap = frac_pos - mean_pred
    # |gap| in exact integer units: |n_pos·mq − Σpq| (both exact ints)
    gap_abs_q = F.abs(
        F.col("n_pos").cast("decimal(38,0)")
        * F.lit(mq).cast("decimal(38,0)")
        - F.col("_sp")
    )
    wall = Window.partitionBy(*g)
    ntot = F.sum("n").over(wall)
    ece = (
        F.sum(gap_abs_q).over(wall).cast("string").cast("double")
        / ntot.cast("double")
        / F.lit(float(mq))
    )
    brier = (
        F.sum("_sb").over(wall).cast("string").cast("double")
        / ntot.cast("double")
        / F.lit(float(mq))
    )
    return agg.select(
        *g,
        "bin",
        "n",
        "n_pos",
        mean_pred.alias("mean_pred"),
        frac_pos.alias("frac_pos"),
        gap.alias("gap"),
        (s2d("_sb") / nn / F.lit(float(mq))).alias("brier_bin"),
        ece.alias("ece"),
        brier.alias("brier"),
    )


def calibration_curve_sql(
    table_sql: str,
    prob_col: str,
    label_sql: str,
    group_columns,
    bins: int = 10,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`calibration_curve`."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    mq = 10**scale
    p = f"CAST({prob_col} AS DOUBLE)"
    y = f"CAST(CAST({label_sql} AS BOOLEAN) AS BIGINT)"
    b = f"LEAST(CAST(FLOOR({p} * {dlit(float(bins))}) AS INT), {bins - 1})"
    pq = f"CAST(FLOOR({p} * {dlit(float(mq))} + 0.5) AS BIGINT)"
    sq = (
        f"CAST(FLOOR(({p} - CAST({y} AS DOUBLE)) * ({p} - CAST({y} AS DOUBLE))"
        f" * {dlit(float(mq))} + 0.5) AS BIGINT)"
    )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    wall = f"(PARTITION BY {gsel})"
    mean_pred = f"({s2d('_sp')} / {nn} / {dlit(float(mq))})"
    frac_pos = f"(CAST(n_pos AS DOUBLE) / {nn})"
    gap_abs_q = (
        f"ABS(CAST(n_pos AS DECIMAL(38,0)) * CAST({mq} AS DECIMAL(38,0))"
        f" - _sp)"
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {b} AS bin, {y} AS _y, {pq} AS _pq, {sq} AS _sq
  FROM ({table_sql})
  WHERE {prob_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
),
agg AS (
  SELECT {gsel}, bin, COUNT(*) AS n,
    CAST(SUM(_y) AS BIGINT) AS n_pos,
    SUM(CAST(_pq AS DECIMAL(38,0))) AS _sp,
    SUM(CAST(_sq AS DECIMAL(38,0))) AS _sb
  FROM d GROUP BY {gsel}, bin
)
SELECT {gsel}, bin, n, n_pos,
  {mean_pred} AS mean_pred,
  {frac_pos} AS frac_pos,
  {frac_pos} - {mean_pred} AS gap,
  {s2d('_sb')} / {nn} / {dlit(float(mq))} AS brier_bin,
  {s2d(f'SUM({gap_abs_q}) OVER {wall}')}
    / CAST(CAST(SUM(n) OVER {wall} AS BIGINT) AS DOUBLE)
    / {dlit(float(mq))} AS ece,
  {s2d(f'SUM(_sb) OVER {wall}')}
    / CAST(CAST(SUM(n) OVER {wall} AS BIGINT) AS DOUBLE)
    / {dlit(float(mq))} AS brier
FROM agg
"""


# --------------------------------------------------------------------------
# Holt–Winters additive seasonal smoothing
# --------------------------------------------------------------------------


def holt_winters_weights(
    alpha: float, beta: float, gamma: float, season: int, window_size: int
):
    """Impulse-response weights of the zero-initialized truncated
    additive Holt–Winters filter: the contribution of y_{t-j} to the
    final level, trend, and NEXT-step seasonal (the slot the h=1
    forecast reads).  State x = [l, b, s⁰, s⁻¹, …, s⁻⁽ᵐ⁻¹⁾] (seasonals
    by update recency); one update is linear in (x, y), so weight_j =
    A^j·B — driver float64 literals, the holt_weights discipline.
    """
    import numpy as np

    a, b, g = float(alpha), float(beta), float(gamma)
    m = int(season)
    dim = 2 + m

    def step(x, y):
        # returns the next state given state x and observation y
        nxt = np.zeros(dim)
        s_old = x[2 + m - 1]  # seasonal updated m steps ago = this phase
        lp = (1 - a) * (x[0] + x[1]) + a * (y - s_old)
        bp = b * (lp - x[0]) + (1 - b) * x[1]
        sp = g * (y - lp) + (1 - g) * s_old
        nxt[0] = lp
        nxt[1] = bp
        nxt[2] = sp
        nxt[3 : 2 + m] = x[2 : 2 + m - 1]
        return nxt

    # A from unit states, B from unit observation (linearity)
    A = np.zeros((dim, dim))
    for k in range(dim):
        e = np.zeros(dim)
        e[k] = 1.0
        A[:, k] = step(e, 0.0)
    B = step(np.zeros(dim), 1.0)
    wl, wb, ws = [], [], []
    v = B.copy()
    for _ in range(window_size):
        wl.append(float(v[0]))
        wb.append(float(v[1]))
        # h=1 forecast reads the OLDEST slot (updated m-1 steps ago,
        # due for phase t+1)
        ws.append(float(v[2 + m - 1]))
        v = A @ v
    return wl, wb, ws


def holt_winters(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.3,
    season: int = 7,
    window_size: int = 28,
) -> DataFrame:
    """Additive Holt–Winters (triple exponential) smoothing as a
    bounded linear filter — the seasonal member of the exponential
    family (SES lives inside theta_forecast, Holt in holt_smooth):
    level + trend + a rotating ``season``-slot seasonal state, with
    ``forecast`` = level + trend + next-phase seasonal = ŷ_{t+1}.

    Same design as holt_smooth: the textbook recursion is sequential,
    but zero-initialized truncation turns each output into Σ_j w_j·y_{t−j}
    with driver-precomputed impulse weights (holt_winters_weights) —
    ONE window expression, single exchange, no Python, 100 TB-safe.
    Truncation residual decays like (1−γ)^(window/season) on the
    seasonal component — window_size ≥ 4·season recommended; the
    filter semantics (not the textbook infinite-history recursion) are
    the pinned engine contract, mirrored verbatim by the SQL twin.
    NULL until a full window exists (null-lag propagation, the holt
    edge rule).
    """
    from functools import reduce as _reduce

    w = make_window(group_columns, order_by)
    wl, wb, ws = holt_winters_weights(alpha, beta, gamma, season, window_size)

    def combo(wts):
        terms = [
            F.lit(wt) * (F.lag(column, j).over(w) if j else F.col(column))
            for j, wt in enumerate(wts)
        ]
        return _reduce(lambda x, y: x + y, terms)

    level = combo(wl)
    trend = combo(wb)
    snext = combo(ws)
    sfx = (
        f"a{str(alpha).replace('.', 'p')}_g{str(gamma).replace('.', 'p')}"
        f"_m{season}_w{window_size}"
    )
    # round-14 (the dagostino_k2 staging rule, guide §7.3): the fc
    # column re-inlined all three window_size-term combos — stage them
    # once, then fc adds the plain column references (the same three
    # doubles in the same left-associated order, so fc is bit-identical;
    # CollapseProject keeps the boundary because each combo alias is
    # non-cheap and referenced twice).
    lc = f"{column}_hw_level_{sfx}"
    bc = f"{column}_hw_trend_{sfx}"
    sc = f"{column}_hw_season_{sfx}"
    staged = data.select(
        "*",
        level.alias(lc),
        trend.alias(bc),
        snext.alias(sc),
    )
    return staged.select(
        "*",
        (F.col(lc) + F.col(bc) + F.col(sc)).alias(f"{column}_hw_fc_{sfx}"),
    )


def holt_winters_sql_columns(
    column: str,
    group_columns,
    order_by,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.3,
    season: int = 7,
    window_size: int = 28,
) -> list[tuple[str, str]]:
    """[(name, expr)] DuckDB twin of :func:`holt_winters` — same
    literals, same term order, same association."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))})"
    )
    wl, wb, ws = holt_winters_weights(alpha, beta, gamma, season, window_size)

    def combo(wts):
        terms = [
            f"CAST('{wt!r}' AS DOUBLE) * "
            + (f"LAG({column}, {j}) OVER {over}" if j else column)
            for j, wt in enumerate(wts)
        ]
        return "(" + " + ".join(terms) + ")"

    sfx = (
        f"a{str(alpha).replace('.', 'p')}_g{str(gamma).replace('.', 'p')}"
        f"_m{season}_w{window_size}"
    )
    lvl, trd, ssn = combo(wl), combo(wb), combo(ws)
    return [
        (f"{column}_hw_level_{sfx}", lvl),
        (f"{column}_hw_trend_{sfx}", trd),
        (f"{column}_hw_season_{sfx}", ssn),
        (f"{column}_hw_fc_{sfx}", f"({lvl} + {trd} + {ssn})"),
    ]


# --------------------------------------------------------------------------
# damped-trend Holt (Gardner–McKenzie)
# --------------------------------------------------------------------------


def holt_damped_weights(
    alpha: float, beta: float, phi: float, window_size: int
):
    """Impulse-response weights of the zero-initialized truncated
    DAMPED Holt filter (Gardner–McKenzie):

        l_t = α·y + (1−α)(l + φb)
        b_t = β(l_t − l) + (1−β)·φb

    collapses to s_t = A·s_{t−1} + B·y_t with
        A = [[1−α, (1−α)φ], [−αβ, φ(1−αβ)]],  B = [α, αβ]^T
    (φ = 1 recovers :func:`holt_weights` exactly).  Driver-computed
    literals, the taylor P-matrix discipline.
    """
    import numpy as np

    a, b, p = float(alpha), float(beta), float(phi)
    A = np.array(
        [[1 - a, (1 - a) * p], [-a * b, p * (1 - a * b)]], dtype=float
    )
    B = np.array([a, a * b], dtype=float)
    wl, wb = [], []
    v = B.copy()
    for _ in range(window_size):
        wl.append(float(v[0]))
        wb.append(float(v[1]))
        v = A @ v
    return wl, wb


def holt_damped(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    alpha: float = 0.3,
    beta: float = 0.1,
    phi: float = 0.9,
    window_size: int = 30,
    horizons: tuple[int, ...] = (1, 7),
) -> DataFrame:
    """Damped-trend Holt smoothing — the M3 workhorse that beat plain
    Holt by refusing to extrapolate a straight line forever: the
    h-step forecast flattens toward l + b·φ(1−φ^h)/(1−φ) instead of
    growing without bound.  Same bounded truncated-filter plan as
    :func:`holt_smooth` (ONE window expression, single exchange;
    zero-init truncation decays like ((1−α)∨φ)^w); per-horizon
    forecasts use the damped partial sums Σ_{i≤h} φ^i as literals.

    Appends ``{column}_hd_level``, ``{column}_hd_trend``, and
    ``{column}_hd_fc{h}`` per horizon.
    """
    from functools import reduce as _reduce

    w = make_window(group_columns, order_by)
    wl, wb = holt_damped_weights(alpha, beta, phi, window_size)

    def combo(wts):
        terms = [
            F.lit(wt) * (F.lag(column, j).over(w) if j else F.col(column))
            for j, wt in enumerate(wts)
        ]
        return _reduce(lambda x, y: x + y, terms)

    level = combo(wl)
    trend = combo(wb)
    out = [level.alias(f"{column}_hd_level"), trend.alias(f"{column}_hd_trend")]
    for h in horizons:
        damp = sum(float(phi) ** i for i in range(1, h + 1))
        out.append((level + F.lit(damp) * trend).alias(f"{column}_hd_fc{h}"))
    return data.select("*", *out)


def holt_damped_sql_columns(
    column: str,
    group_columns,
    order_by,
    alpha: float = 0.3,
    beta: float = 0.1,
    phi: float = 0.9,
    window_size: int = 30,
    horizons: tuple[int, ...] = (1, 7),
) -> list[tuple[str, str]]:
    """[(name, expr)] DuckDB twin of :func:`holt_damped` — same
    literals, same term order, same association."""
    from timeseriesutils_spark.operators.window_features import _as_list

    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))})"
    )
    wl, wb = holt_damped_weights(alpha, beta, phi, window_size)

    def combo(wts):
        terms = [
            f"CAST('{wt!r}' AS DOUBLE) * "
            + (f"LAG({column}, {j}) OVER {over}" if j else column)
            for j, wt in enumerate(wts)
        ]
        return "(" + " + ".join(terms) + ")"

    lvl, trd = combo(wl), combo(wb)
    cols = [(f"{column}_hd_level", lvl), (f"{column}_hd_trend", trd)]
    for h in horizons:
        damp = sum(float(phi) ** i for i in range(1, h + 1))
        cols.append(
            (
                f"{column}_hd_fc{h}",
                f"({lvl} + CAST('{damp!r}' AS DOUBLE) * {trd})",
            )
        )
    return cols


# --------------------------------------------------------------------------
# OWA forecast scorecard (M4 overall weighted average, seasonal-naive ref)
# --------------------------------------------------------------------------


def owa_eval(
    df: DataFrame,
    actual_col: str,
    forecast_col: str,
    group_columns,
    order_by,
    season: int = 7,
    scale: int = 6,
) -> DataFrame:
    """Per-group OWA scorecard of ANY forecast column — the M4
    composite that mase_eval's single metric can't see both sides of:

        sMAPE  = mean 2|y−f| / (|y|+|f|)
        MASE   = mean|y−f| / mean|y_t − y_{t−season}|
        OWA    = ½·(sMAPE/sMAPE_snaive + MASE)

    (reference forecaster = seasonal naive y_{t−season}, which by
    construction has MASE 1 — the M4 convention with naive2 ≈
    seasonal naive; documented deviation: no multiplicative
    deseasonalization step).  Complete-case rows: y, f, and the
    seasonal lag all non-null, so every mean sees the same rows.
    Per-row ratios floor-quantize at 10^-scale and DECIMAL-sum (the
    pinball discipline); one lag window + one aggregation.

    Returns (groups…, n, smape, smape_snaive, mase, owa).
    """
    g = _as_list(group_columns)
    w = make_window(g, order_by)
    m = 10**scale
    y = F.col(actual_col).cast("double")
    f_ = F.col(forecast_col).cast("double")
    ylag = F.lag(F.col(actual_col).cast("double"), season).over(w)
    d = df.select(*g, y.alias("_y"), f_.alias("_f"), ylag.alias("_yl")).filter(
        F.col("_y").isNotNull()
        & F.col("_f").isNotNull()
        & F.col("_yl").isNotNull()
    )

    def qsum(c):
        return F.sum(
            F.floor(c * F.lit(float(m)) + F.lit(0.5)).cast("decimal(38,0)")
        )

    yy, ff, yl = F.col("_y"), F.col("_f"), F.col("_yl")
    sm_f = F.when(
        F.abs(yy) + F.abs(ff) > 0,
        F.lit(2.0) * F.abs(yy - ff) / (F.abs(yy) + F.abs(ff)),
    ).otherwise(F.lit(0.0))
    sm_n = F.when(
        F.abs(yy) + F.abs(yl) > 0,
        F.lit(2.0) * F.abs(yy - yl) / (F.abs(yy) + F.abs(yl)),
    ).otherwise(F.lit(0.0))
    agg = d.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        qsum(sm_f).alias("_smf"),
        qsum(sm_n).alias("_smn"),
        qsum(F.abs(yy - ff)).alias("_aef"),
        qsum(F.abs(yy - yl)).alias("_aen"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    md = F.lit(float(m))
    smape = s2d("_smf") / md / nn
    smape_n = s2d("_smn") / md / nn
    mase = s2d("_aef") / s2d("_aen")
    owa = F.lit(0.5) * (smape / smape_n + mase)
    ok = (F.col("n") > 0) & (F.col("_aen") > 0) & (F.col("_smn") > 0)
    return agg.select(
        *g,
        "n",
        F.when(F.col("n") > 0, smape).alias("smape"),
        F.when(F.col("n") > 0, smape_n).alias("smape_snaive"),
        F.when(F.col("_aen") > 0, mase).alias("mase"),
        F.when(ok, owa).alias("owa"),
    )


def owa_eval_sql(
    data_sql: str,
    actual_col: str,
    forecast_col: str,
    group_columns,
    order_by,
    season: int = 7,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`owa_eval` (same quantize points)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    osel = ", ".join(_as_list(order_by))
    m = 10**scale
    over = f"(PARTITION BY {gsel} ORDER BY {osel})"

    def qsum(expr):
        return (
            f"SUM(CAST(FLOOR(({expr}) * {float(m)!r} + 0.5)"
            f" AS DECIMAL(38,0)))"
        )

    sm_f = (
        "CASE WHEN ABS(_y) + ABS(_f) > 0"
        " THEN 2.0 * ABS(_y - _f) / (ABS(_y) + ABS(_f)) ELSE 0.0 END"
    )
    sm_n = (
        "CASE WHEN ABS(_y) + ABS(_yl) > 0"
        " THEN 2.0 * ABS(_y - _yl) / (ABS(_y) + ABS(_yl)) ELSE 0.0 END"
    )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    md = repr(float(m))
    smape = f"({s2d('_smf')} / {md} / {nn})"
    smape_n = f"({s2d('_smn')} / {md} / {nn})"
    mase = f"({s2d('_aef')} / {s2d('_aen')})"
    owa = f"(0.5 * ({smape} / {smape_n} + {mase}))"
    return f"""
WITH d AS (
  SELECT {gsel},
    CAST({actual_col} AS DOUBLE) AS _y,
    CAST({forecast_col} AS DOUBLE) AS _f,
    LAG(CAST({actual_col} AS DOUBLE), {season}) OVER {over} AS _yl
  FROM ({data_sql})
),
cc AS (
  SELECT * FROM d
  WHERE _y IS NOT NULL AND _f IS NOT NULL AND _yl IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    {qsum(sm_f)} AS _smf,
    {qsum(sm_n)} AS _smn,
    {qsum('ABS(_y - _f)')} AS _aef,
    {qsum('ABS(_y - _yl)')} AS _aen
  FROM cc GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN n > 0 THEN {smape} END AS smape,
  CASE WHEN n > 0 THEN {smape_n} END AS smape_snaive,
  CASE WHEN _aen > 0 THEN {mase} END AS mase,
  CASE WHEN n > 0 AND _aen > 0 AND _smn > 0 THEN {owa} END AS owa
FROM agg
"""


# --------------------------------------------------------------------------
# Theil's U2 forecast-accuracy ratio (naive-reference RMSE form)
# --------------------------------------------------------------------------


def theil_u(
    df: DataFrame,
    actual_col: str,
    forecast_col: str,
    group_columns,
    order_by,
    scale: int = 6,
) -> DataFrame:
    """Per-group Theil's U2 — the RMSE-ratio cousin of :func:`owa_eval`'s
    MASE (mean-absolute form): U2 < 1 means the forecast beats the
    last-value naive on SQUARED error, which punishes the occasional
    large miss MASE averages away:

        U2 = √(Σ(f_t − y_t)²) / √(Σ(y_{t−1} − y_t)²)

    Complete-case rows (y, f, and the lag-1 naive all non-null) so both
    sums see the same rows; per-row squared errors floor-quantize at
    10^-scale and DECIMAL-sum (order-free), one double √-ratio at the
    end.  One lag window + one map-combinable aggregation — a single
    group-key exchange at any scale.

    Returns (groups…, n, rmse_fc, rmse_naive, theil_u2).
    """
    g = _as_list(group_columns)
    w = make_window(g, order_by)
    m = 10**scale
    y = F.col(actual_col).cast("double")
    f_ = F.col(forecast_col).cast("double")
    yl = F.lag(F.col(actual_col).cast("double"), 1).over(w)
    d = df.select(*g, y.alias("_y"), f_.alias("_f"), yl.alias("_yl")).filter(
        F.col("_y").isNotNull()
        & F.col("_f").isNotNull()
        & F.col("_yl").isNotNull()
    )

    def qsum(c):
        return F.sum(
            F.floor(c * F.lit(float(m)) + F.lit(0.5)).cast("decimal(38,0)")
        )

    yy, ff, yn = F.col("_y"), F.col("_f"), F.col("_yl")
    agg = d.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        qsum((ff - yy) * (ff - yy)).alias("_sef"),
        qsum((yn - yy) * (yn - yy)).alias("_sen"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    md = F.lit(float(m))
    rmse_f = F.sqrt(s2d("_sef") / md / nn)
    rmse_n = F.sqrt(s2d("_sen") / md / nn)
    return agg.select(
        *g,
        "n",
        F.when(F.col("n") > 0, rmse_f).alias("rmse_fc"),
        F.when(F.col("n") > 0, rmse_n).alias("rmse_naive"),
        F.when((F.col("n") > 0) & (F.col("_sen") > 0), rmse_f / rmse_n).alias(
            "theil_u2"
        ),
    )


def theil_u_sql(
    data_sql: str,
    actual_col: str,
    forecast_col: str,
    group_columns,
    order_by,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`theil_u` (same quantize points, same
    double tree)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    osel = ", ".join(_as_list(order_by))
    m = 10**scale
    over = f"(PARTITION BY {gsel} ORDER BY {osel})"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731

    def qsum(expr):
        return (
            f"SUM(CAST(FLOOR(({expr}) * {float(m)!r} + 0.5)"
            " AS DECIMAL(38,0)))"
        )

    nn = "CAST(n AS DOUBLE)"
    md = f"{float(m)!r}"
    rmse_f = f"SQRT({s2d('_sef')} / {md} / {nn})"
    rmse_n = f"SQRT({s2d('_sen')} / {md} / {nn})"
    return f"""
WITH d AS (
  SELECT {gsel},
    CAST({actual_col} AS DOUBLE) AS _y,
    CAST({forecast_col} AS DOUBLE) AS _f,
    LAG(CAST({actual_col} AS DOUBLE), 1) OVER {over} AS _yl
  FROM ({data_sql})
),
cc AS (
  SELECT * FROM d
  WHERE _y IS NOT NULL AND _f IS NOT NULL AND _yl IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    {qsum('(_f - _y) * (_f - _y)')} AS _sef,
    {qsum('(_yl - _y) * (_yl - _y)')} AS _sen
  FROM cc GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN n > 0 THEN {rmse_f} END AS rmse_fc,
  CASE WHEN n > 0 THEN {rmse_n} END AS rmse_naive,
  CASE WHEN n > 0 AND _sen > 0 THEN {rmse_f} / {rmse_n} END AS theil_u2
FROM agg
"""


# --------------------------------------------------------------------------
# AR(2) Yule–Walker forecast
# --------------------------------------------------------------------------


def ar2_forecast(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    horizons: tuple[int, ...] = (1, 7),
    scale: int = 0,
    min_pairs: int = 2,
) -> DataFrame:
    """Per-group AR(2) fit by Yule–Walker + recursive h-step mean
    forecasts — the autoregressive member of the forecaster family
    (holt/theta/holt_winters are exponential-smoothing state models;
    AR(2) is the minimal model with OSCILLATORY dynamics, which
    smoothers cannot represent):

        φ₁ = r₁(1−r₂)/(1−r₁²),   φ₂ = (r₂−r₁²)/(1−r₁²)
        ŷ_{t+h} = μ + φ₁·(ŷ_{t+h−1}−μ) + φ₂·(ŷ_{t+h−2}−μ)

    (ŷ at or before t = observed y).  r₁, r₂ come from acf_features'
    exact-integer sums (bit-identical across engines); μ is the exact
    quantized-sum mean; the recursion unrolls to max(horizons) as a
    fixed double tree.  Plan: the acf aggregation + ONE extra
    window/agg pass for (n, Σ, last two values), joined group-on-group
    (both frames already collapsed to one row per group).

    Returns (groups…, n, phi1, phi2, horizon, forecast); NULL forecast
    where the fit is undefined (r₁ or r₂ NULL, or 1−r₁² = 0).
    """
    from timeseriesutils_spark.operators.acf import acf_features

    g = _as_list(group_columns)
    order = _as_list(order_by)
    acf = acf_features(
        data, column, g, order, max_lag=2, scale=scale,
        min_pairs=min_pairs,
    )
    rw = acf.groupBy(*g).agg(
        *[
            F.max(F.when(F.col("lag_k") == k, F.col("acf"))).alias(f"_r{k}")
            for k in (1, 2)
        ]
    )
    m = 10**scale
    q = F.floor(F.col(column).cast("double") * F.lit(float(m)) + F.lit(0.5)).cast(
        "bigint"
    )
    wdesc = Window.partitionBy(*g).orderBy(*[F.col(c).desc() for c in order])
    rows = data.filter(F.col(column).isNotNull()).select(
        *g, q.alias("_q"), F.row_number().over(wdesc).alias("_rn")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    state = rows.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_q"))).alias("_sq"),
        F.max(F.when(F.col("_rn") == 1, F.col("_q"))).alias("_y1"),
        F.max(F.when(F.col("_rn") == 2, F.col("_q"))).alias("_y2"),
    )
    j = rw.join(state, on=g, how="inner")
    md = F.lit(float(m))
    mu = F.col("_sq").cast("string").cast("double") / md / F.col("n").cast("double")
    r1, r2 = F.col("_r1"), F.col("_r2")
    den = F.lit(1.0) - r1 * r1
    phi1 = F.when(den != 0, r1 * (F.lit(1.0) - r2) / den)
    phi2 = F.when(den != 0, (r2 - r1 * r1) / den)
    base = j.select(
        *g, "n",
        mu.alias("_mu"),
        (F.col("_y1").cast("double") / md).alias("_v1"),
        (F.col("_y2").cast("double") / md).alias("_v2"),
        phi1.alias("phi1"),
        phi2.alias("phi2"),
    )
    # unroll the mean recursion to max(horizons): dev_h = φ1·dev_{h−1}
    # + φ2·dev_{h−2} with dev_0 = y_t−μ, dev_{−1} = y_{t−1}−μ
    hmax = max(horizons)
    devs = [F.col("_v2") - F.col("_mu"), F.col("_v1") - F.col("_mu")]
    fcs = {}
    for h in range(1, hmax + 1):
        d = F.col("phi1") * devs[-1] + F.col("phi2") * devs[-2]
        devs.append(d)
        if h in horizons:
            fcs[h] = F.col("_mu") + d
    per_h = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h).alias("horizon"), fcs[h].alias("forecast")
                )
                for h in sorted(fcs)
            ]
        )
    ).alias("_s")
    return base.select(*g, "n", "phi1", "phi2", per_h).select(
        *g, "n", "phi1", "phi2",
        F.col("_s.horizon").alias("horizon"),
        F.col("_s.forecast").alias("forecast"),
    )


def ar2_forecast_sql(
    relation: str,
    column: str,
    group_columns,
    order_by,
    horizons: tuple[int, ...] = (1, 7),
    scale: int = 0,
    min_pairs: int = 2,
) -> str:
    """DuckDB twin of :func:`ar2_forecast` (acf twin + the same
    unrolled recursion text)."""
    from timeseriesutils_spark.operators.acf import acf_features_sql

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    osel_desc = ", ".join(f"{c} DESC" for c in _as_list(order_by))
    inner = acf_features_sql(
        relation, column, g, _as_list(order_by), max_lag=2, scale=scale,
        min_pairs=min_pairs,
    )
    m = 10**scale
    md = f"{float(m)!r}"
    qq = (
        f"CAST(FLOOR(CAST({column} AS DOUBLE) * {md} + 0.5) AS BIGINT)"
    )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    mu = f"({s2d('_sq')} / {md} / CAST(n AS DOUBLE))"
    den = "(1.0 - _r1 * _r1)"
    phi1 = f"CASE WHEN {den} <> 0 THEN _r1 * (1.0 - _r2) / {den} END"
    phi2 = f"CASE WHEN {den} <> 0 THEN (_r2 - _r1 * _r1) / {den} END"
    hmax = max(horizons)
    devs = ["(_v2 - _mu)", "(_v1 - _mu)"]
    sel = []
    for h in range(1, hmax + 1):
        d = f"(phi1 * {devs[-1]} + phi2 * {devs[-2]})"
        devs.append(d)
        if h in horizons:
            sel.append(
                f"SELECT {gsel}, n, phi1, phi2, {h} AS horizon,"
                f" (_mu + {d}) AS forecast FROM base"
            )
    rows = " UNION ALL ".join(sel)
    return f"""
WITH rw AS (
  SELECT {gsel},
    MAX(CASE WHEN lag_k = 1 THEN acf END) AS _r1,
    MAX(CASE WHEN lag_k = 2 THEN acf END) AS _r2
  FROM ({inner}) GROUP BY {gsel}
),
ranked AS (
  SELECT {gsel}, {qq} AS _q,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {osel_desc}) AS _rn
  FROM {relation} WHERE {column} IS NOT NULL
),
state AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_q AS DECIMAL(38,0))) AS _sq,
    MAX(CASE WHEN _rn = 1 THEN _q END) AS _y1,
    MAX(CASE WHEN _rn = 2 THEN _q END) AS _y2
  FROM ranked GROUP BY {gsel}
),
base AS (
  SELECT {gsel}, n, {mu} AS _mu,
    CAST(_y1 AS DOUBLE) / {md} AS _v1,
    CAST(_y2 AS DOUBLE) / {md} AS _v2,
    {phi1} AS phi1,
    {phi2} AS phi2
  FROM rw JOIN state USING ({gsel})
)
{rows}
ORDER BY {gsel}, horizon
"""


# --------------------------------------------------------------------------
# Kalman local-level filter (state-space family)
# --------------------------------------------------------------------------


def kalman_weights(
    q: float, r: float, window_size: int, p0: float | None = None
) -> tuple[list[float], list[float], float]:
    """Impulse weights of the local-level Kalman filter run over a
    ``window_size``-observation window from a diffuse prior — the
    holt_weights / holt_winters_weights discipline applied to the
    state-space family (Durbin & Koopman 2012, public; local level =
    random walk + noise):

        y_t = l_t + ε_t (var r),   l_t = l_{t-1} + η_t (var q)
        K_t = (P_{t-1}+q)/(P_{t-1}+q+r),  P_t = (1-K_t)(P_{t-1}+q)

    The gain sequence is data-INdependent (the Riccati recursion sees
    only q, r, p0), so the filtered level is a linear filter of the
    observations; its weights are derived NUMERICALLY as the filter's
    unit-impulse responses (the holt_winters precedent) — each w_j is
    the float64 the sequential recursion itself would produce, so a
    numpy reference filter pins them exactly.  The diffuse prior
    (p0 = 1e7·(q+r) by default) makes K_1 ≈ 1: the window's oldest
    observation is properly re-normalized instead of holt's zero-init
    bias, and Σw_j ≈ 1 by construction.

    Returns (weights old→new reversed as lag-j order j=0 newest,
    gains, P_W) — P_W is the filtered state variance after W steps,
    so the one-step-ahead forecast variance is P_W + q + r.
    """
    if window_size < 1:
        raise ValueError("window_size must be ≥ 1")
    if p0 is None:
        p0 = 1.0e7 * (q + r)
    P = float(p0)
    gains: list[float] = []
    for _ in range(window_size):
        pp = P + q
        k = pp / (pp + r)
        gains.append(k)
        P = (1.0 - k) * pp
    w = [0.0] * window_size
    for pos in range(window_size):
        lvl = 0.0
        for t in range(window_size):
            y = 1.0 if t == pos else 0.0
            lvl = lvl + gains[t] * (y - lvl)
        w[window_size - 1 - pos] = lvl  # lag order: j=0 the newest obs
    return w, gains, P


def kalman_local_level(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    q: float = 0.1,
    r: float = 1.0,
    window_size: int = 30,
) -> DataFrame:
    """Local-level (random-walk-plus-noise) Kalman filter as a bounded
    linear filter — the classical state-space forecaster beside the
    exponential family (holt_smooth is the β→0 steady-state cousin;
    the Kalman form adds the PRINCIPLED warm-up: a diffuse prior
    re-normalizes early-window weights instead of biasing toward the
    zero init, and it ships its own forecast variance).

    Contract: per row, the EXACT Kalman filter over the trailing
    ``window_size`` observations restarted from the diffuse prior —
    sliding-window restart is what makes the weights position-free
    driver literals (one window expression, single exchange, pure
    whole-stage codegen; the reference family runs the unbounded
    sequential recursion per group — the shape that cannot
    distribute).  Truncation residual: the weight mass beyond W lags
    is (1-K∞)^W — geometric, ~1e-5 at the defaults.  NULL until a
    full window exists (null-lag arithmetic, the ewma/holt guard).

    Emits level (filtered state = one-step-ahead forecast of y_{t+1}),
    fc_var (P_W + q + r, a model constant — the honest uncertainty the
    exponential family lacks), and gain (steady K_W).
    """
    from functools import reduce as _reduce

    w = make_window(group_columns, order_by)
    wts, gains, P = kalman_weights(q, r, window_size)
    terms = [
        F.lit(wt) * (F.lag(column, j).over(w) if j else F.col(column))
        for j, wt in enumerate(wts)
    ]
    level = _reduce(lambda x, y: x + y, terms)
    sfx = (
        f"q{str(q).replace('.', 'p')}_r{str(r).replace('.', 'p')}"
        f"_w{window_size}"
    )
    lname = f"{column}_kll_level_{sfx}"
    # chain the gates off the NAMED level column: inlining the 30-term
    # lag tree into all three outputs tripled the window expression
    lvl = F.col(lname)
    return data.select("*", level.alias(lname)).select(
        "*",
        F.when(lvl.isNotNull(), F.lit(float(P + q + r))).alias(
            f"{column}_kll_fcvar_{sfx}"
        ),
        F.when(lvl.isNotNull(), F.lit(float(gains[-1]))).alias(
            f"{column}_kll_gain_{sfx}"
        ),
    )


def kalman_local_level_sql_columns(
    column: str,
    group_columns,
    order_by,
    q: float = 0.1,
    r: float = 1.0,
    window_size: int = 30,
) -> list[tuple[str, str]]:
    """[(name, expr)] DuckDB twin of :func:`kalman_local_level` — same
    literals, same term order, same association."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))})"
    )
    wts, gains, P = kalman_weights(q, r, window_size)
    terms = [
        f"CAST('{wt!r}' AS DOUBLE) * "
        + (f"LAG({column}, {j}) OVER {over}" if j else column)
        for j, wt in enumerate(wts)
    ]
    lvl = "(" + " + ".join(terms) + ")"
    sfx = (
        f"q{str(q).replace('.', 'p')}_r{str(r).replace('.', 'p')}"
        f"_w{window_size}"
    )
    fcv = f"CAST('{float(P + q + r)!r}' AS DOUBLE)"
    gn = f"CAST('{float(gains[-1])!r}' AS DOUBLE)"
    return [
        (f"{column}_kll_level_{sfx}", lvl),
        (
            f"{column}_kll_fcvar_{sfx}",
            f"(CASE WHEN {lvl} IS NOT NULL THEN {fcv} END)",
        ),
        (
            f"{column}_kll_gain_{sfx}",
            f"(CASE WHEN {lvl} IS NOT NULL THEN {gn} END)",
        ),
    ]


# --------------------------------------------------------------------------
# ARMA(1,1) — innovations form as a truncated linear filter
# --------------------------------------------------------------------------


def _arma11_base_exprs() -> list[tuple[str, str]]:
    """Engine-neutral expression texts for the ARMA(1,1) fit, given
    columns (_r1, _r2): method-of-moments φ = r₂/r₁ and the invertible
    MA root of  θ²(r₁−φ) + θ(2r₁φ−1−φ²) + (r₁−φ) = 0  (the two roots
    multiply to 1 — the CASE picks |θ|<1); AR(1) fallback (φ=r₁, θ=0)
    when the MoM system is degenerate.  Every literal carries an
    exponent marker (bare decimals parse as DECIMAL and poison double
    trees — the r7 renderer rule)."""
    phi_m = "CASE WHEN _r1 <> 0e0 THEN _r2 / _r1 END"
    return [
        ("_phi_m", phi_m),
        ("_a", "(_r1 - _phi_m)"),
        ("_b", "(2e0 * _r1 * _phi_m - 1e0 - _phi_m * _phi_m)"),
        ("_disc", "(_b * _b - 4e0 * _a * _a)"),
        ("_tp", "CASE WHEN _a <> 0e0 AND _disc > 0e0 THEN"
                " (-_b + SQRT(_disc)) / (2e0 * _a) END"),
        ("_tm", "CASE WHEN _a <> 0e0 AND _disc > 0e0 THEN"
                " (-_b - SQRT(_disc)) / (2e0 * _a) END"),
        ("_th_m", "CASE WHEN ABS(_tp) < 1e0 THEN _tp ELSE _tm END"),
        ("mom_valid",
         "(_phi_m IS NOT NULL AND ABS(_phi_m) < 1e0 AND _a <> 0e0"
         " AND _disc > 0e0 AND _th_m IS NOT NULL AND ABS(_th_m) < 1e0)"),
        ("phi", "CASE WHEN mom_valid THEN _phi_m"
                " WHEN ABS(_r1) < 1e0 THEN _r1 END"),
        ("theta", "CASE WHEN mom_valid THEN _th_m"
                  " WHEN ABS(_r1) < 1e0 THEN 0e0 END"),
    ]


def arma11_forecast(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    horizons: tuple[int, ...] = (1, 7),
    window_size: int = 20,
    scale: int = 0,
    min_pairs: int = 2,
) -> DataFrame:
    """Per-group ARMA(1,1) method-of-moments fit + h-step forecasts —
    the moving-average member the forecaster family was missing
    (holt/theta/holt_winters: exponential smoothers; ar2: pure AR;
    kalman_local_level: state space.  ARMA(1,1) is the minimal model
    mixing both error memories).

    Innovations-form forecast as a TRUNCATED LINEAR FILTER (the
    kalman/holt discipline — forecast.py:2240 region): substituting
    the innovation recursion into ŷ_{t+1} collapses to

        ŷ_{t+1} − μ = (φ+θ) Σ_{k≥0} (−θ)^k (y_{t−k} − μ)

    a geometric filter with data-dependent ratio −θ, truncated at
    ``window_size`` lags (residual mass |θ|^W, ~1e-6 at |θ|≤0.5,
    W=20); h-step means decay through φ: ŷ_{t+h}−μ = φ^{h−1}(ŷ_{t+1}−μ).

    Exactness: r₁/r₂ from acf_features' exact-integer sums; μ and the
    last-W values from one pivoted reduce on quantized ints; the
    (−θ)^k chain and the filter sum are NAMED chained columns — one
    fixed association both engines share (never POWER(), whose libm
    paths differ).  The tiny per-group frame is where all the chaining
    happens: per-row work is one window rank, fully distributed.

    Returns (groups…, n, phi, theta, mom_valid, horizon, forecast);
    NULL forecast where even the AR(1) fallback is undefined
    (|r₁| ≥ 1 or r₁ NULL).
    """
    from timeseriesutils_spark.operators.acf import acf_features

    g = _as_list(group_columns)
    order = _as_list(order_by)
    acf = acf_features(
        data, column, g, order, max_lag=2, scale=scale, min_pairs=min_pairs
    )
    rw = acf.groupBy(*g).agg(
        *[
            F.max(F.when(F.col("lag_k") == k, F.col("acf"))).alias(f"_r{k}")
            for k in (1, 2)
        ]
    )
    m = 10**scale
    q = F.floor(
        F.col(column).cast("double") * F.lit(float(m)) + F.lit(0.5)
    ).cast("bigint")
    wdesc = Window.partitionBy(*g).orderBy(*[F.col(c).desc() for c in order])
    rows = data.filter(F.col(column).isNotNull()).select(
        *g, q.alias("_q"), F.row_number().over(wdesc).alias("_rn")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    state = rows.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_q"))).alias("_sq"),
        *[
            F.max(F.when(F.col("_rn") == k, F.col("_q"))).alias(f"_yq{k}")
            for k in range(1, window_size + 1)
        ],
    )
    j = rw.join(state, on=g, how="inner")
    md = repr(float(m))
    base = j.selectExpr(
        *g, "n", "_r1", "_r2",
        f"(CAST(CAST(_sq AS STRING) AS DOUBLE) / {md}"
        f" / CAST(n AS DOUBLE)) AS _mu",
        *[
            f"(CAST(_yq{k} AS DOUBLE) / {md}) AS _v{k}"
            for k in range(1, window_size + 1)
        ],
    )
    for name, expr in _arma11_base_exprs():
        base = base.selectExpr("*", f"({expr}) AS {name}")
    # (−θ)^k chain + the truncated filter, all named columns
    base = base.selectExpr("*", "1e0 AS _t0")
    for k in range(1, window_size):
        base = base.selectExpr("*", f"(_t{k - 1} * (-theta)) AS _t{k}")
    terms = [
        f"CASE WHEN _v{k + 1} IS NOT NULL THEN"
        f" _t{k} * (_v{k + 1} - _mu) ELSE 0e0 END"
        for k in range(window_size)
    ]
    base = base.selectExpr(
        "*", f"((phi + theta) * ({' + '.join(terms)})) AS _dev1"
    )
    hmax = max(horizons)
    dev = "_dev1"
    fcs = {}
    for h in range(1, hmax + 1):
        if h > 1:
            base = base.selectExpr("*", f"(phi * {dev}) AS _dev{h}")
            dev = f"_dev{h}"
        if h in horizons:
            fcs[h] = dev
    per_h = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h).alias("horizon"),
                    (F.col("_mu") + F.col(fcs[h])).alias("forecast"),
                )
                for h in sorted(fcs)
            ]
        )
    ).alias("_s")
    return base.select(*g, "n", "phi", "theta", "mom_valid", per_h).select(
        *g, "n", "phi", "theta", "mom_valid",
        F.col("_s.horizon").alias("horizon"),
        F.col("_s.forecast").alias("forecast"),
    )


def arma11_forecast_sql(
    relation: str,
    column: str,
    group_columns,
    order_by,
    horizons: tuple[int, ...] = (1, 7),
    window_size: int = 20,
    scale: int = 0,
    min_pairs: int = 2,
) -> str:
    """DuckDB twin of :func:`arma11_forecast` — the same expression
    texts over the same staged shape (chained CTE columns preserve the
    association of the Spark select chain)."""
    from timeseriesutils_spark.operators.acf import acf_features_sql

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    osel_desc = ", ".join(f"{c} DESC" for c in _as_list(order_by))
    inner = acf_features_sql(
        relation, column, g, _as_list(order_by), max_lag=2, scale=scale,
        min_pairs=min_pairs,
    )
    m = 10**scale
    md = repr(float(m))
    qq = f"CAST(FLOOR(CAST({column} AS DOUBLE) * {md} + 0.5) AS BIGINT)"
    pivots = ",\n    ".join(
        f"MAX(CASE WHEN _rn = {k} THEN _q END) AS _yq{k}"
        for k in range(1, window_size + 1)
    )
    vals = ",\n    ".join(
        f"(CAST(_yq{k} AS DOUBLE) / {md}) AS _v{k}"
        for k in range(1, window_size + 1)
    )
    fit_chain = ""
    prev = "base0"
    for i, (name, expr) in enumerate(_arma11_base_exprs()):
        fit_chain += f",\nbase{i + 1} AS (SELECT *, ({expr}) AS {name} FROM {prev})"
        prev = f"base{i + 1}"
    tchain = f",\nt0 AS (SELECT *, 1e0 AS _t0 FROM {prev})"
    prev = "t0"
    for k in range(1, window_size):
        tchain += (
            f",\nt{k} AS (SELECT *, (_t{k - 1} * (-theta)) AS _t{k}"
            f" FROM {prev})"
        )
        prev = f"t{k}"
    terms = " + ".join(
        f"CASE WHEN _v{k + 1} IS NOT NULL THEN"
        f" _t{k} * (_v{k + 1} - _mu) ELSE 0e0 END"
        for k in range(window_size)
    )
    dchain = (
        f",\nd1 AS (SELECT *, ((phi + theta) * ({terms})) AS _dev1"
        f" FROM {prev})"
    )
    prev, dev = "d1", "_dev1"
    hmax = max(horizons)
    fcs = {}
    for h in range(1, hmax + 1):
        if h > 1:
            dchain += (
                f",\nd{h} AS (SELECT *, (phi * {dev}) AS _dev{h} FROM {prev})"
            )
            prev, dev = f"d{h}", f"_dev{h}"
        if h in horizons:
            fcs[h] = dev
    sel = " UNION ALL ".join(
        f"SELECT {gsel}, n, phi, theta, mom_valid, {h} AS horizon,"
        f" (_mu + {fcs[h]}) AS forecast FROM {prev}"
        for h in sorted(fcs)
    )
    return f"""
WITH rw AS (
  SELECT {gsel},
    MAX(CASE WHEN lag_k = 1 THEN acf END) AS _r1,
    MAX(CASE WHEN lag_k = 2 THEN acf END) AS _r2
  FROM ({inner}) GROUP BY {gsel}
),
ranked AS (
  SELECT {gsel}, {qq} AS _q,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {osel_desc}) AS _rn
  FROM {relation} WHERE {column} IS NOT NULL
),
state AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_q AS DECIMAL(38,0))) AS _sq,
    {pivots}
  FROM ranked GROUP BY {gsel}
),
base0 AS (
  SELECT {gsel}, n, _r1, _r2,
    (CAST(CAST(_sq AS VARCHAR) AS DOUBLE) / {md} / CAST(n AS DOUBLE)) AS _mu,
    {vals}
  FROM rw JOIN state USING ({gsel})
){fit_chain}{tchain}{dchain}
{sel}
ORDER BY {gsel}, horizon
"""


# --------------------------------------------------------------------------
# Box–Cox λ selection (Guerrero 1993)
# --------------------------------------------------------------------------

BOXCOX_LAMBDAS = (-1.0, -0.5, 0.0, 0.5, 1.0)


def boxcox_guerrero(
    df: DataFrame,
    value_col: str,
    group_columns,
    block_col,
    lambdas: tuple[float, ...] = BOXCOX_LAMBDAS,
    scale_in: int = 6,
) -> DataFrame:
    """Guerrero's (1993) Box–Cox λ selection per group: over seasonal
    blocks b with mean m_b and sd s_b, pick the λ minimizing the
    coefficient of variation of r_b = s_b / m_b^(1−λ) — the standard
    variance-stabilization pre-step before any additive forecaster
    (holt/theta/arma assume ~constant variance; a λ < 1 says the
    series needs compression first).

    Exactness: block (n, Σq, Σq²) are exact ints; ln r_b = ln s_b −
    (1−λ)·ln m_b is floor-quantized at 1e-9 (the libm rule); r_b spans
    orders of magnitude across λ, so each λ's CV is computed on the
    MAX-SHIFTED exponentials es_b = ⌊exp((lr_b − max_b lr)/1e9)·1e9⌋
    — all in (0, 1e9] (1e9 keeps the grid ~10⁷ ulps wide, the libm
    rule; 1e15 measurably straddles rounding boundaries), CV is scale-invariant under the common
    exp(max) factor, and the cross-block sums are exact integers
    (Σes² through DECIMAL/HUGEINT, VARCHAR-routed to double).
    Constant blocks (s = 0) contribute r = 0 exactly.  Ties pick the
    SMALLER λ (fixed CASE-chain order).

    Returns (groups…, n_blocks, lambda_best, cv_best, cv_λ…).
    """
    groups = _as_list(group_columns)
    blocks = _as_list(block_col)
    m = 10**scale_in
    q = F.floor(F.col(value_col).cast("double") * F.lit(float(m)) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, *blocks, q.alias("_q")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    bstats = d.groupBy(*groups, *blocks).agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum(dec(F.col("_q"))).alias("_s1"),
        # q² must leave BIGINT BEFORE the multiply (q ~ 1e11 at price
        # scale 6 → q² ~ 1e22 overflows int64)
        F.sum(dec19(F.col("_q")) * dec19(F.col("_q"))).alias("_s2"),
    )
    nbf = F.col("_nb").cast("double")
    md = F.lit(float(m))
    s1 = F.col("_s1").cast("string").cast("double")
    s2 = F.col("_s2").cast("string").cast("double")
    mean = s1 / md / nbf
    var = (s2 / md / md - (s1 / md) * (s1 / md) / nbf) / (nbf - 1.0)
    sd = F.sqrt(var)
    base = bstats.filter((F.col("_nb") >= 2)).select(
        *groups,
        mean.alias("_m"),
        sd.alias("_sd"),
    ).filter(F.col("_m") > 0)
    cols = [F.col(c) for c in groups]
    lr_cols = []
    for i, lam in enumerate(lambdas):
        lr = F.when(
            F.col("_sd") > 0,
            F.floor(
                (F.log(F.col("_sd")) - F.lit(1.0 - lam) * F.log(F.col("_m")))
                * F.lit(1.0e9)
                + F.lit(0.5)
            ).cast("bigint"),
        )
        lr_cols.append(lr.alias(f"_lr{i}"))
    wg = Window.partitionBy(*groups)
    withlr = base.select(*cols, *lr_cols)
    withmax = withlr.select(
        *cols,
        *[F.col(f"_lr{i}") for i in range(len(lambdas))],
        *[
            F.max(f"_lr{i}").over(wg).alias(f"_L{i}")
            for i in range(len(lambdas))
        ],
    )
    es_exprs = []
    for i in range(len(lambdas)):
        es = F.when(
            F.col(f"_lr{i}").isNotNull(),
            F.floor(
                F.exp(
                    (F.col(f"_lr{i}") - F.col(f"_L{i}")).cast("double")
                    / F.lit(1.0e9)
                )
                * F.lit(1.0e9)
                + F.lit(0.5)
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        es_exprs.append(es.alias(f"_es{i}"))
    est = withmax.select(*cols, *es_exprs)
    agg = est.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        *[F.sum(dec(F.col(f"_es{i}"))).alias(f"_se{i}") for i in range(len(lambdas))],
        *[
            F.sum(dec(F.col(f"_es{i}")) * dec(F.col(f"_es{i}"))).alias(
                f"_se2{i}"
            )
            for i in range(len(lambdas))
        ],
    )
    nn = F.col("n_blocks").cast("double")
    cvs = []
    for i in range(len(lambdas)):
        se = F.col(f"_se{i}").cast("string").cast("double")
        se2 = F.col(f"_se2{i}").cast("string").cast("double")
        mu = se / nn
        v = (se2 - se * se / nn) / (nn - 1.0)
        cv = F.when((F.col("n_blocks") > 1) & (mu > 0), F.sqrt(v) / mu)
        cvs.append(cv)
    best = None
    bestcv = None
    for i, lam in enumerate(lambdas):
        cond = cvs[i].isNotNull()
        for j in range(len(lambdas)):
            if j != i:
                cond = cond & (
                    cvs[j].isNull() | (cvs[i] <= cvs[j])
                    if j > i
                    else cvs[j].isNull() | (cvs[i] < cvs[j])
                )
        best = (
            F.when(cond, F.lit(float(lam)))
            if best is None
            else best.when(cond, F.lit(float(lam)))
        )
        bestcv = (
            F.when(cond, cvs[i]) if bestcv is None else bestcv.when(cond, cvs[i])
        )
    out_cols = [
        cvs[i].alias(f"cv_{str(lam).replace('-', 'm').replace('.', 'p')}")
        for i, lam in enumerate(lambdas)
    ]
    return agg.select(
        *groups,
        "n_blocks",
        best.alias("lambda_best"),
        bestcv.alias("cv_best"),
        *out_cols,
    )


def boxcox_guerrero_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    block_col,
    lambdas: tuple[float, ...] = BOXCOX_LAMBDAS,
    scale_in: int = 6,
) -> str:
    """DuckDB twin of :func:`boxcox_guerrero` (same quantized-log
    blocks, same max-shifted exponential sums, same argmin chain)."""
    from timeseriesutils_spark.functions.exact import dlit

    groups = _as_list(group_columns)
    blocks = _as_list(block_col)
    gsel = ", ".join(groups)
    bsel = ", ".join(blocks)
    m = 10**scale_in
    md = dlit(float(m))
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {md} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nbf = "CAST(_nb AS DOUBLE)"
    mean = f"({s2d('_s1')} / {md} / {nbf})"
    var = (
        f"(({s2d('_s2')} / {md} / {md}"
        f" - ({s2d('_s1')} / {md}) * ({s2d('_s1')} / {md}) / {nbf})"
        f" / ({nbf} - 1.0))"
    )
    lrs = ",\n    ".join(
        f"CASE WHEN _sd > 0 THEN CAST(FLOOR((LN(_sd)"
        f" - {dlit(1.0 - lam)} * LN(_m)) * 1e9 + 0.5) AS BIGINT) END AS _lr{i}"
        for i, lam in enumerate(lambdas)
    )
    ls = ",\n    ".join(
        f"MAX(_lr{i}) OVER (PARTITION BY {gsel}) AS _L{i}"
        for i in range(len(lambdas))
    )
    ess = ",\n    ".join(
        f"CASE WHEN _lr{i} IS NOT NULL THEN CAST(FLOOR("
        f"EXP(CAST(_lr{i} - _L{i} AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END AS _es{i}"
        for i in range(len(lambdas))
    )
    sums = ",\n    ".join(
        f"SUM(CAST(_es{i} AS HUGEINT)) AS _se{i},\n    "
        f"SUM(CAST(_es{i} AS HUGEINT) * _es{i}) AS _se2{i}"
        for i in range(len(lambdas))
    )
    nn = "CAST(n_blocks AS DOUBLE)"

    def cv(i: int) -> str:
        se, se2 = s2d(f"_se{i}"), s2d(f"_se2{i}")
        mu = f"({se} / {nn})"
        v = f"(({se2} - {se} * {se} / {nn}) / ({nn} - 1.0))"
        return f"(CASE WHEN n_blocks > 1 AND {mu} > 0 THEN SQRT({v}) / {mu} END)"

    best_chain = "CASE "
    bestcv_chain = "CASE "
    for i, lam in enumerate(lambdas):
        conds = [f"{cv(i)} IS NOT NULL"]
        for j in range(len(lambdas)):
            if j == i:
                continue
            op = "<=" if j > i else "<"
            conds.append(f"({cv(j)} IS NULL OR {cv(i)} {op} {cv(j)})")
        cond = " AND ".join(conds)
        best_chain += f"WHEN {cond} THEN {dlit(float(lam))} "
        bestcv_chain += f"WHEN {cond} THEN {cv(i)} "
    best_chain += "END"
    bestcv_chain += "END"
    out_cvs = ",\n  ".join(
        f"{cv(i)} AS cv_{str(lam).replace('-', 'm').replace('.', 'p')}"
        for i, lam in enumerate(lambdas)
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {bsel}, {qq} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
bstats AS (
  SELECT {gsel}, {bsel}, COUNT(*) AS _nb,
    SUM(CAST(_q AS HUGEINT)) AS _s1,
    SUM(CAST(_q AS HUGEINT) * _q) AS _s2
  FROM d GROUP BY {gsel}, {bsel}
),
base AS (
  SELECT {gsel}, {mean} AS _m, SQRT({var}) AS _sd
  FROM bstats WHERE _nb >= 2 AND {mean} > 0
),
withlr AS (
  SELECT {gsel},
    {lrs}
  FROM base
),
withmax AS (
  SELECT *,
    {ls}
  FROM withlr
),
est AS (
  SELECT {gsel},
    {ess}
  FROM withmax
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n_blocks,
    {sums}
  FROM est GROUP BY {gsel}
)
SELECT {gsel}, n_blocks,
  {best_chain} AS lambda_best,
  {bestcv_chain} AS cv_best,
  {out_cvs}
FROM agg
"""


# --------------------------------------------------------------------------
# Gumbel extreme-value fit via L-moments
# --------------------------------------------------------------------------

# Euler–Mascheroni constant and ln 2 as exact double literals (no libm
# in either engine's plan: every transcendental this fit needs is a
# compile-time constant)
_EULER_GAMMA = 0.5772156649015329
_LN2 = 0.6931471805599453


def gumbel_lmom(
    df: DataFrame,
    value_col: str,
    group_columns,
    return_periods: tuple[int, ...] = (10, 52, 100),
    scale: int = 2,
) -> DataFrame:
    """Per-group Gumbel (EV-I) fit by the method of L-moments (Hosking
    1990) — the extreme-value layer the forecast family lacks: given
    block maxima (weekly peak demand, daily max latency), estimate the
    location/scale of the maxima distribution and the T-period RETURN
    LEVELS capacity planning actually asks for ("the load exceeded
    once a year"):

        β̂ = ℓ₂/ln 2,  μ̂ = ℓ₁ − γ·β̂,
        x_T = μ̂ − β̂·ln(−ln(1 − 1/T))

    L-moments are EXACT rationals of order statistics: ℓ₁ = Σx/n and
    ℓ₂ = 2b₁ − ℓ₁ with b₁ = Σ (r−1)·x₍ᵣ₎ / (n(n−1)) — one row_number
    window (the weighted sum is tie-permutation invariant), integer
    sums in DECIMAL, and every transcendental (γ, ln 2, ln(−ln(1−1/T)))
    is a Python-literal constant, so the whole fit is libm-free and
    bit-identical by construction.  L-moments beat maximum likelihood
    here operationally: closed form, no iteration, robust to the short
    block counts typical of maxima series.

    Scale shape: one ordered window + one aggregation per group.

    Returns (groups…, n, l1, l2, mu, beta, rl_{T} per period).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    w = Window.partitionBy(*groups).orderBy("_qv")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, qv.alias("_qv")
    )
    ranked = d.select(
        *groups,
        "_qv",
        (F.row_number().over(w) - 1).cast("bigint").alias("_r0"),
    )
    agg = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_qv"))).alias("_s"),
        F.sum(dec(F.col("_r0") * F.col("_qv"))).alias("_b1n"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    mf = F.lit(float(m))
    l1 = s2d("_s") / nn / mf
    b1 = s2d("_b1n") / (nn * (nn - F.lit(1.0))) / mf
    l2 = F.lit(2.0) * b1 - l1
    beta = l2 / F.lit(_LN2)
    mu = l1 - F.lit(_EULER_GAMMA) * beta
    ok = (F.col("n") > 2) & (l2 > 0)
    import math

    cols = [
        *groups,
        "n",
        F.when(ok, l1).alias("l1"),
        F.when(ok, l2).alias("l2"),
        F.when(ok, mu).alias("mu"),
        F.when(ok, beta).alias("beta"),
    ]
    for T in return_periods:
        c_t = -math.log(-math.log(1.0 - 1.0 / float(T)))
        cols.append(F.when(ok, mu + beta * F.lit(c_t)).alias(f"rl_{T}"))
    return agg.select(*cols)


def gumbel_lmom_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    return_periods: tuple[int, ...] = (10, 52, 100),
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`gumbel_lmom` (same rank weights, same
    literal transcendentals)."""
    import math

    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    mf = dlit(float(m))
    l1 = f"({s2d('_s')} / {nn} / {mf})"
    b1 = f"({s2d('_b1n')} / ({nn} * ({nn} - 1.0)) / {mf})"
    l2 = f"(2.0 * {b1} - {l1})"
    beta = f"({l2} / {dlit(_LN2)})"
    mu = f"({l1} - {dlit(_EULER_GAMMA)} * {beta})"
    ok = f"(n > 2 AND {l2} > 0)"
    rls = ", ".join(
        f"CASE WHEN {ok} THEN {mu} + {beta} * "
        f"{dlit(-math.log(-math.log(1.0 - 1.0 / float(T))))} END AS rl_{T}"
        for T in return_periods
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel}, _qv,
    CAST(ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _qv) - 1
      AS BIGINT) AS _r0
  FROM d
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_qv AS DECIMAL(38,0))) AS _s,
    SUM(CAST(_r0 * _qv AS DECIMAL(38,0))) AS _b1n
  FROM ranked GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {ok} THEN {l1} END AS l1,
  CASE WHEN {ok} THEN {l2} END AS l2,
  CASE WHEN {ok} THEN {mu} END AS mu,
  CASE WHEN {ok} THEN {beta} END AS beta,
  {rls}
FROM agg
"""
