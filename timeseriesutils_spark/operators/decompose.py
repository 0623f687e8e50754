"""Classical seasonal decomposition: y = trend + seasonal + remainder
over a regular integer grid — the moving-average decomposition every
time-series practitioner runs before modeling (the reference's
featurization domain stops at Taylor/periodogram features; this is the
additive-components view of the same series).

Semantics (period m, odd):

* ``trend``    — centered moving average over m grid points, full
  windows only (NULL at each group's m//2 edge rows);
* ``seasonal`` — per (group, phase = t mod m) mean of the detrended
  series, centered so the m phase components sum to ~0 (the grand
  mean of the phase means is subtracted — statsmodels' "classical"
  convention);
* ``remainder``— y − trend − seasonal (NULL where trend is NULL).

Exactness discipline: the input measure is integral (counts, or a
pre-quantized value); the trend's window sum S and the scaled
detrended value m·y − S are exact BIGINTs, the per-phase sums are
exact BIGINTs, and every double in the output is ONE fixed expression
over those integers, rendered identically in the DuckDB twin.  The
seasonal centering term sums the m phase means in phase order with
left-to-right association — never a windowed double SUM (engines
disagree on accumulation order).

Scale shape: one hash exchange on the group keys covers the centered
window; the per-(group, phase) aggregate is map-combinable and its
m-row-per-group result joins back by broadcast (|groups|·m rows).
Requires a REGULAR grid — densify with ``timegrid.fill_gaps`` first
(the declared query zero-fills count gaps, the natural semantics for
event counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def decompose_series(
    data: DataFrame,
    y_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
) -> DataFrame:
    """See module docstring.  ``y_col`` must be integral (BIGINT-safe);
    ``time_col`` integral grid ticks with no gaps within each group."""
    if period % 2 != 1 or period < 3:
        raise ValueError("period must be odd and >= 3 (centered MA)")
    g = _as_list(group_columns)
    half = period // 2
    w = Window.partitionBy(*g).orderBy("_t")
    frame = w.rowsBetween(-half, half)
    y = F.col(y_col).cast("bigint")
    phase = (F.col(time_col).cast("bigint") % period).cast("int")
    base = data.select(
        *g,
        F.col(time_col).alias("_t"),
        y.alias("_y"),
        phase.alias("_ph"),
    )
    win = base.select(
        "*",
        F.sum("_y").over(frame).alias("_S"),
        F.count("_y").over(frame).alias("_n"),
    ).select(
        "*",
        F.when(
            F.col("_n") == period,
            F.lit(period).cast("bigint") * F.col("_y") - F.col("_S"),
        ).alias("_dm"),
    )
    # per-(group, phase) exact sums of the scaled detrended values
    aggs = []
    for d in range(period):
        hit = F.col("_ph") == d
        aggs += [
            F.sum(F.when(hit, F.col("_dm"))).alias(f"_A{d}"),
            F.count(F.when(hit & F.col("_dm").isNotNull(), F.lit(1))).alias(
                f"_n{d}"
            ),
        ]
    wide = win.groupBy(*g).agg(*aggs)
    # phase means and the grand centering term, unrolled in phase order
    means = [
        F.col(f"_A{d}").cast("double")
        / (F.lit(float(period)) * F.col(f"_n{d}").cast("double"))
        for d in range(period)
    ]
    acc = means[0]
    for mexp in means[1:]:
        acc = acc + mexp
    center = acc / F.lit(float(period))
    seasonal_cols = [
        (means[d] - center).alias(f"_s{d}") for d in range(period)
    ]
    wide = wide.select(*g, *seasonal_cols)
    joined = win.join(F.broadcast(wide), g, "left")
    seasonal = None
    for d in range(period):
        clause = F.when(F.col("_ph") == d, F.col(f"_s{d}"))
        seasonal = clause if seasonal is None else F.coalesce(seasonal, clause)
    trend = F.when(
        F.col("_n") == period, F.col("_S").cast("double") / F.lit(float(period))
    )
    remainder = F.col("_y").cast("double") - trend - seasonal
    return joined.select(
        *g,
        F.col("_t").alias(time_col),
        F.col("_y").alias(y_col),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        remainder.alias("remainder"),
    )


def decompose_series_sql(
    relation: str,
    y_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
) -> str:
    """DuckDB twin of :func:`decompose_series` — identical integer
    sums, unrolled centering, and double expression shapes.
    ``relation`` must already be the dense regular grid."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    half = period // 2
    over = (
        f"(PARTITION BY {gsel} ORDER BY _t "
        f"ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)"
    )
    a_aggs = ",\n    ".join(
        f"SUM(CASE WHEN _ph = {d} THEN _dm END) AS _A{d},\n"
        f"    COUNT(CASE WHEN _ph = {d} AND _dm IS NOT NULL THEN 1 END) AS _n{d}"
        for d in range(period)
    )
    means = [
        f"(CAST(_A{d} AS DOUBLE) / ({float(period)!r} * CAST(_n{d} AS DOUBLE)))"
        for d in range(period)
    ]
    acc = means[0]
    for mexp in means[1:]:
        acc = f"({acc} + {mexp})"
    center = f"({acc} / {float(period)!r})"
    s_sel = ",\n    ".join(
        f"{means[d]} - {center} AS _s{d}" for d in range(period)
    )
    seasonal = (
        "CASE "
        + " ".join(f"WHEN _ph = {d} THEN _s{d}" for d in range(period))
        + " END"
    )
    trend = (
        f"CASE WHEN _n = {period} "
        f"THEN CAST(_S AS DOUBLE) / {float(period)!r} END"
    )
    return f"""
WITH base AS (
  SELECT {gsel}, _t, _y, CAST(_t % {period} AS INT) AS _ph
  FROM (SELECT {gsel}, CAST({time_col} AS BIGINT) AS _t,
        CAST({y_col} AS BIGINT) AS _y FROM {relation})
), win AS (
  SELECT *, SUM(_y) OVER {over} AS _S, COUNT(_y) OVER {over} AS _n
  FROM base
), dm AS (
  SELECT *, CASE WHEN _n = {period}
    THEN CAST({period} AS BIGINT) * _y - _S END AS _dm
  FROM win
), wide AS (
  SELECT {gsel},
    {a_aggs}
  FROM dm GROUP BY {gsel}
), seas AS (
  SELECT {gsel},
    {s_sel}
  FROM wide
)
SELECT dm.{gsel.replace(', ', ', dm.')}, dm._t AS {time_col}, dm._y AS {y_col},
  {trend} AS trend,
  {seasonal} AS seasonal,
  CAST(_y AS DOUBLE) - ({trend}) - ({seasonal}) AS remainder
FROM dm JOIN seas USING ({gsel})
"""
