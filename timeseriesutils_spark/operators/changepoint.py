"""CUSUM changepoint / drift detection as pure window expressions.

The textbook one-sided CUSUM is a recursion —

    S+_t = max(0, S+_{t-1} + (x_t - k))        (upward drift)
    S-_t = max(0, S-_{t-1} - (x_t - k))        (downward drift)

— which looks inherently sequential (the reference engine family runs it
as a per-series Python loop; the reference itself has no changepoint op
at all, it stops at rolling moments — /root/reference/src/timeseriesutils/
featurize.py covers lag/rollmean/taylor/domfreq only).  But the
recursion has a closed form over prefix extrema:

    P_t  = sum_{j<=t} (x_j - k)                 (running sum)
    S+_t = P_t - min(0, min_{j<=t} P_j)
    S-_t = max(0, max_{j<=t} P_j) - P_t

(induction: max(0, S_{t-1} + d_t) = P_t - min(P_t, m_{t-1}) and
min(P_t, 0, min_{j<t} P_j) = m_t).  Running sum + running min/max are
plain window aggregates, so the whole detector is ONE exchange on the
group keys and stays inside whole-stage codegen — no Python, no
per-series loop, linear scan at any scale.

Exactness: values are quantized to integer units of 10^-scale first
(floor(v*10^scale + 0.5), the one rounding Spark and DuckDB share —
same discipline as rolling_zscore, operators/series_math.py), so every
intermediate is exact int64 arithmetic and the result is bit-identical
across engines and partitionings.  |x - k| * 10^scale * series_length
must stay below 2^63 (~9.2e18): business-magnitude series of billions
of rows fit at scale=2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def cusum(
    data: DataFrame,
    column: str,
    order_column: str,
    group_columns,
    target: float,
    threshold: float,
    scale: int = 2,
) -> DataFrame:
    """Two-sided CUSUM drift statistics per group.

    Adds ``<column>_cusum_pos``, ``<column>_cusum_neg`` (both in the
    input's units) and a boolean ``<column>_cusum_alarm`` that fires
    when either statistic exceeds ``threshold``.

    ``target`` is the in-control reference level k; a drift of d per
    step alarms after ~threshold/d steps.  Statistics reset to 0
    whenever the running sum touches a new prefix extremum — exactly
    the recursion's behavior, via the closed form above.
    """
    groups = _as_list(group_columns)
    mult = 10**scale
    k_q = int(round(target * mult))
    h_q = int(round(threshold * mult))

    q = F.floor(F.col(column) * F.lit(mult) + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy(*groups)
        .orderBy(order_column)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(q - F.lit(k_q)).over(w)
    data = data.withColumn("_cusum_p", p)
    floor0 = F.least(F.lit(0).cast("bigint"), F.min("_cusum_p").over(w))
    ceil0 = F.greatest(F.lit(0).cast("bigint"), F.max("_cusum_p").over(w))
    s_pos = F.col("_cusum_p") - floor0
    s_neg = ceil0 - F.col("_cusum_p")
    return (
        data.withColumn(f"{column}_cusum_pos", (s_pos / F.lit(mult)).cast("double"))
        .withColumn(f"{column}_cusum_neg", (s_neg / F.lit(mult)).cast("double"))
        .withColumn(
            f"{column}_cusum_alarm", (s_pos > F.lit(h_q)) | (s_neg > F.lit(h_q))
        )
        .drop("_cusum_p")
    )


def cusum_sql(
    inner_sql: str,
    column: str,
    order_column: str,
    group_columns,
    target: float,
    threshold: float,
    scale: int = 2,
    extra_cols: str = "",
) -> str:
    """Full DuckDB query text equivalent to :func:`cusum` over
    ``inner_sql`` (a SELECT producing the input relation)."""
    groups = _as_list(group_columns)
    mult = 10**scale
    k_q = int(round(target * mult))
    h_q = int(round(threshold * mult))
    win = (
        f"PARTITION BY {', '.join(groups)} ORDER BY {order_column} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    gcols = ", ".join(groups)
    lead = f"{gcols}, {order_column}, {column}"
    if extra_cols:
        lead = f"{lead}, {extra_cols}"
    return f"""
WITH src AS ({inner_sql}),
p AS (
  SELECT {lead},
    SUM(CAST(FLOOR({column} * {mult} + 0.5) AS BIGINT) - {k_q})
      OVER ({win}) AS _cusum_p
  FROM src
),
e AS (
  SELECT *,
    LEAST(CAST(0 AS BIGINT), MIN(_cusum_p) OVER ({win})) AS _lo,
    GREATEST(CAST(0 AS BIGINT), MAX(_cusum_p) OVER ({win})) AS _hi
  FROM p
)
SELECT {lead},
  CAST((_cusum_p - _lo) AS DOUBLE) / {mult} AS {column}_cusum_pos,
  CAST((_hi - _cusum_p) AS DOUBLE) / {mult} AS {column}_cusum_neg,
  ((_cusum_p - _lo) > {h_q} OR (_hi - _cusum_p) > {h_q}) AS {column}_cusum_alarm
FROM e
"""
