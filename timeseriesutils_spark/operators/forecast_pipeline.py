"""End-to-end backtested forecasting pipeline: the composed workflow a
reference (reichlab/timeseriesutils) user actually runs, as ONE
declared plan — the forecasting sibling of the corpus pipeline
(operators/corpus_pipeline.py, round-11 item 1).

The reference's featurize surface produces model inputs; its users then
split, fit, predict, and score.  Every stage below is an individually
hash-verified operator; this module composes

    daily series
      → lag features          (window_features.lag — reference
                               featurize.py:174-227 semantics)
      → trailing rollmean     (window_features.rollmean — :116-171)
      → horizon target        (window_features.horizon_targets — :230-297)
      → temporal fold split   (train < cutoff ≤ test: the only split
                               that is honest for time series)
      → per-cohort OLS fit    (regression.grouped_ols2 — closed-form
                               normal equations, train rows only)
      → broadcast apply       (coefficients joined back to test rows)
      → scoring               (MAE vs the lag-feature naive baseline,
                               quantized-int error sums → skill score)

so the COMPOSITION — one window pass feeding three features, the
train/test fork reading one featurized frame, the fit flowing back as
a broadcast — is itself gate-checked against one composed DuckDB
oracle.

Scale notes: the featurize pass is one window exchange on the series
key; the fit is a map-combinable sufficient-stats aggregation whose
output is |cohorts| rows (broadcast side); scoring is one more
aggregation.  No stage shuffles the fact twice — the featurized frame
is pinned at the train/test fork (the corpus-pipeline survivor-fork
rule).

Exactness: features are the hash-green lag/rollmean expressions
(DECIMAL window sums), coefficients the hash-green grouped_ols2 double
tree, and per-row forecast errors are floor-quantized to 10^-err_scale
before DECIMAL accumulation (the pinball pattern) — group means are
order-free and bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin
from timeseriesutils_spark.operators.regression import (
    grouped_ols2,
    grouped_ols2_sql,
)
from timeseriesutils_spark.operators.window_features import (
    horizon_targets,
    lag,
    rollmean,
)

__all__ = ["backtest_forecast_pipeline", "backtest_forecast_pipeline_sql"]


def backtest_forecast_pipeline(
    daily: DataFrame,
    value_col: str,
    time_col: str,
    series_col: str,
    cohort_modulus: int = 10,
    cutoff: int = 2000,
    lag_k: int = 7,
    roll_w: int = 7,
    horizon: int = 7,
    fit_scale: int = 2,
    err_scale: int = 6,
) -> DataFrame:
    """Run the composed featurize→fit→score backtest; see module doc.

    Returns one row per cohort: (cohort, n_train, n_test, r2, mae,
    naive_mae, skill) where skill = 1 − mae/naive_mae (positive when
    the fitted model beats carrying the lag feature forward).
    """
    lag_col = f"{value_col}_lag{lag_k}"
    roll_col = f"{value_col}_rollmean_w{roll_w}"
    tgt_col = f"{value_col}_target{horizon}"

    feat, _ = lag(
        daily, value_col, [series_col], window_size=lag_k,
        lags=[lag_k], order_by=[time_col],
    )
    feat, _ = rollmean(
        feat, value_col, [series_col], window_size=roll_w,
        order_by=[time_col],
    )
    feat, _ = horizon_targets(
        feat, value_col, [series_col], horizons=[horizon],
        layout="wide", order_by=[time_col],
    )
    labeled = pin(  # train/test fork reads ONE featurized frame
        feat.filter(
            F.col(lag_col).isNotNull()
            & F.col(roll_col).isNotNull()
            & F.col(tgt_col).isNotNull()
        ).select(
            (F.col(series_col) % cohort_modulus).cast("bigint").alias(
                "cohort"
            ),
            F.col(time_col).alias("_t"),
            F.col(lag_col).cast("double").alias("_x1"),
            F.col(roll_col).cast("double").alias("_x2"),
            F.col(tgt_col).cast("double").alias("_y"),
        )
    )
    train = labeled.filter(F.col("_t") < cutoff)
    test = labeled.filter(F.col("_t") >= cutoff)
    fit = grouped_ols2(train, "_y", "_x1", "_x2", ["cohort"], scale=fit_scale)
    m = 10**err_scale
    j = test.join(
        F.broadcast(
            fit.select(
                "cohort",
                F.col("n").alias("n_train"),
                "b0",
                "b1",
                "b2",
                "r2",
            )
        ),
        "cohort",
    )
    pred = F.col("b0") + F.col("b1") * F.col("_x1") + F.col("b2") * F.col(
        "_x2"
    )
    qerr = F.floor(F.abs(pred - F.col("_y")) * F.lit(m) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    qnaive = F.floor(
        F.abs(F.col("_x1") - F.col("_y")) * F.lit(m) + F.lit(0.5)
    ).cast("decimal(38,0)")
    agg = j.groupBy("cohort").agg(
        F.max("n_train").alias("n_train"),
        F.count(F.lit(1)).alias("n_test"),
        F.max("r2").alias("r2"),
        F.sum(qerr).alias("_se"),
        F.sum(qnaive).alias("_sn"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n_test").cast("double")
    mf = F.lit(float(m))
    mae = s2d("_se") / mf / nn
    naive = s2d("_sn") / mf / nn
    ok = (F.col("n_test") > 0) & (s2d("_sn") > 0)
    return agg.select(
        "cohort",
        "n_train",
        "n_test",
        "r2",
        F.when(F.col("n_test") > 0, mae).alias("mae"),
        F.when(F.col("n_test") > 0, naive).alias("naive_mae"),
        F.when(ok, F.lit(1.0) - mae / naive).alias("skill"),
    )


def backtest_forecast_pipeline_sql(
    daily_sql: str,
    value_col: str,
    time_col: str,
    series_col: str,
    cohort_modulus: int = 10,
    cutoff: int = 2000,
    lag_k: int = 7,
    roll_w: int = 7,
    horizon: int = 7,
    fit_scale: int = 2,
    err_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`backtest_forecast_pipeline` (same feature
    expressions as the lag/rollmean/horizon oracle texts, the
    grouped_ols2 twin nested for the fit, same quantized error
    sums)."""
    over = f"(PARTITION BY {series_col} ORDER BY {time_col})"
    frame = (
        f"(PARTITION BY {series_col} ORDER BY {time_col} "
        f"ROWS BETWEEN {roll_w - 1} PRECEDING AND CURRENT ROW)"
    )
    mean = (
        f"CAST(SUM(CAST({value_col} AS DECIMAL(38,6))) OVER {frame} AS DOUBLE)"
        f" / COUNT({value_col}) OVER {frame}"
    )
    m = 10**err_scale
    fit_sql = grouped_ols2_sql(
        "(SELECT * FROM train)", "_y", "_x1", "_x2", ["cohort"],
        scale=fit_scale,
    )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n_test AS DOUBLE)"
    mf = f"{float(m)!r}"
    mae = f"({s2d('_se')} / {mf} / {nn})"
    naive = f"({s2d('_sn')} / {mf} / {nn})"
    pred = "(b0 + b1 * _x1 + b2 * _x2)"
    return f"""
WITH daily AS ({daily_sql}),
feat AS (
  SELECT {series_col}, {time_col},
    LAG({value_col}, {lag_k}) OVER {over} AS _lagv,
    CASE WHEN COUNT({value_col}) OVER {frame} >= {roll_w}
         THEN {mean} END AS _rollv,
    LEAD({value_col}, {horizon}) OVER {over} AS _tgtv
  FROM daily
),
labeled AS (
  SELECT CAST({series_col} % {cohort_modulus} AS BIGINT) AS cohort,
    {time_col} AS _t,
    CAST(_lagv AS DOUBLE) AS _x1,
    CAST(_rollv AS DOUBLE) AS _x2,
    CAST(_tgtv AS DOUBLE) AS _y
  FROM feat
  WHERE _lagv IS NOT NULL AND _rollv IS NOT NULL AND _tgtv IS NOT NULL
),
train AS (SELECT * FROM labeled WHERE _t < {cutoff}),
test AS (SELECT * FROM labeled WHERE _t >= {cutoff}),
fit AS ({fit_sql}),
j AS (
  SELECT t.*, f.n AS n_train, f.b0, f.b1, f.b2, f.r2
  FROM test t JOIN fit f USING (cohort)
),
agg AS (
  SELECT cohort,
    MAX(n_train) AS n_train,
    COUNT(*) AS n_test,
    MAX(r2) AS r2,
    SUM(CAST(FLOOR(ABS({pred} - _y) * {m} + 0.5) AS DECIMAL(38,0))) AS _se,
    SUM(CAST(FLOOR(ABS(_x1 - _y) * {m} + 0.5) AS DECIMAL(38,0))) AS _sn
  FROM j GROUP BY cohort
)
SELECT cohort, n_train, n_test, r2,
  CASE WHEN n_test > 0 THEN {mae} END AS mae,
  CASE WHEN n_test > 0 THEN {naive} END AS naive_mae,
  CASE WHEN n_test > 0 AND {s2d('_sn')} > 0
    THEN 1.0 - {mae} / {naive} END AS skill
FROM agg
"""
