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

from timeseriesutils_spark.functions.cache import pin
from timeseriesutils_spark.functions.exact import dlit
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
    # floored modulus: both engines' % keeps the dividend's sign, so a
    # negative (pre-epoch) grid tick would yield phases -(m-1)..-1 that
    # match no seasonal arm — normalize into 0..m-1 (ADVICE r4)
    phase = (
        ((F.col(time_col).cast("bigint") % period) + period) % period
    ).cast("int")
    base = data.select(
        *g,
        F.col(time_col).alias("_t"),
        y.alias("_y"),
        phase.alias("_ph"),
    )
    # pin(): the windowed frame feeds BOTH the seasonal aggregation and
    # the final join, and Spark does not reuse the upstream exchange
    # across the two branches (ReusedExchange=0 observed) — without the
    # pin the whole upstream prep (scan + pre-agg + window sort) runs
    # twice.  Caller owns eviction per functions/cache.py.
    win = pin(
        base.select(
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
  SELECT {gsel}, _t, _y,
    CAST(((_t % {period}) + {period}) % {period} AS INT) AS _ph
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


def seasonal_strength(
    decomposed: DataFrame,
    group_columns,
    scale: int = 6,
) -> DataFrame:
    """Seasonal-strength diagnostic (Hyndman & Athanasopoulos, FPP §3.4
    convention, public reference): from a decomposition's components,

        F_s = max(0, 1 − Var(remainder) / Var(seasonal + remainder))

    per group — ~0 means the seasonal component explains nothing, →1
    means the series is dominated by its seasonal cycle.  The scalar
    that decides whether seasonal models are worth fitting.

    Component values (already doubles derived from exact BIGINTs —
    see decompose_series) are floor-quantized to int64 before the
    variance sums, so the reduce is exact in any partitioning; the
    final ratio is one double chain with VARCHAR-routed casts.

    Returns (groups…, n, var_remainder, var_deseasonal, strength).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    m = 10**scale
    q = lambda c: F.floor(c * F.lit(m) + F.lit(0.5)).cast("bigint")  # noqa: E731
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    d = decomposed.filter(F.col("remainder").isNotNull()).select(
        *groups,
        q(F.col("remainder")).alias("_r"),
        q(F.col("seasonal") + F.col("remainder")).alias("_sr"),
    )
    agg = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_r"))).alias("_s_r"),
        F.sum(dec(F.col("_r") * F.col("_r"))).alias("_ss_r"),
        F.sum(dec(F.col("_sr"))).alias("_s_sr"),
        F.sum(dec(F.col("_sr") * F.col("_sr"))).alias("_ss_sr"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    mf = float(m * m)
    var_r = (nn * s2d("_ss_r") - s2d("_s_r") * s2d("_s_r")) / (nn * nn) / F.lit(mf)
    var_sr = (nn * s2d("_ss_sr") - s2d("_s_sr") * s2d("_s_sr")) / (nn * nn) / F.lit(
        mf
    )
    strength = F.when(
        var_sr != 0, F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_sr)
    )
    return agg.select(
        *groups,
        "n",
        var_r.alias("var_remainder"),
        var_sr.alias("var_deseasonal"),
        strength.alias("strength"),
    )


def seasonal_strength_sql(
    decomposed_sql: str,
    group_columns,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`seasonal_strength` over a decomposition
    SELECT."""
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    g = ", ".join(groups)
    m = 10**scale
    mf = float(m * m)
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    var_r = f"(({nn} * {s2d('_ss_r')} - {s2d('_s_r')} * {s2d('_s_r')}) / ({nn} * {nn}) / {dlit(mf)})"
    var_sr = f"(({nn} * {s2d('_ss_sr')} - {s2d('_s_sr')} * {s2d('_s_sr')}) / ({nn} * {nn}) / {dlit(mf)})"
    return f"""
WITH comp AS ({decomposed_sql}),
q AS (
  SELECT {g},
    CAST(FLOOR(remainder * {m} + 0.5) AS BIGINT) AS _r,
    CAST(FLOOR((seasonal + remainder) * {m} + 0.5) AS BIGINT) AS _sr
  FROM comp WHERE remainder IS NOT NULL
),
agg AS (
  SELECT {g}, COUNT(*) AS n,
    SUM(_r) AS _s_r, SUM(_r * _r) AS _ss_r,
    SUM(_sr) AS _s_sr, SUM(_sr * _sr) AS _ss_sr
  FROM q GROUP BY {g}
)
SELECT {g}, n,
  {var_r} AS var_remainder,
  {var_sr} AS var_deseasonal,
  CASE WHEN {var_sr} <> 0
       THEN GREATEST(0.0, 1.0 - {var_r} / {var_sr}) END AS strength
FROM agg
"""


def decompose_robust(
    data: DataFrame,
    y_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
) -> DataFrame:
    """Robust (median-based) classical decomposition — the outlier-
    immune sibling of :func:`decompose_series`: trend = centered rolling
    MEDIAN over one period, seasonal = per-phase MEDIAN of the
    detrended series re-centered by the median of the phase effects,
    remainder = the rest.  One reporting spike cannot drag the trend or
    leak into the seasonal profile the way the mean version allows —
    the right baseline to feed excess/outbreak comparisons.

    Exactness: there are NO cross-row float sums anywhere — every
    statistic is a selection (sorted-array lerp median) or a
    subtraction of identical doubles, so the op is hash-exact without
    quantization.  Medians use the engine-pinned lerp
    (series_math._lerp_sorted); phase effects re-center through an
    ORDER-BY-phase collected array so the tiny inner median is
    deterministic too.

    Same contract as decompose_series: integral gapless ``time_col``
    grid per group; rows without a full centered window emit NULL
    trend/seasonal/remainder.  Shape: one window pass for the trend,
    one (group, phase) aggregation, one period-sized reduce per group,
    broadcast back — the fact table is scanned once.

    Returns (groups…, t, y, trend, seasonal, remainder).
    """
    from timeseriesutils_spark.operators.series_math import _lerp_sorted

    if period % 2 != 1 or period < 3:
        raise ValueError("period must be odd and >= 3 (centered window)")
    g = _as_list(group_columns)
    half = period // 2
    w = Window.partitionBy(*g).orderBy("_t")
    frame = w.rowsBetween(-half, half)
    phase = ((F.col("_t") % period) + period) % period
    base = data.select(
        *g,
        F.col(time_col).cast("bigint").alias("_t"),
        F.col(y_col).cast("double").alias("_y"),
    )
    tr = base.select(
        *g,
        "_t",
        "_y",
        phase.alias("_ph"),
        F.sort_array(F.collect_list("_y").over(frame)).alias("_arr"),
    ).withColumn(
        "trend",
        F.when(F.size("_arr") == period, _lerp_sorted(F.col("_arr"), 0.5)),
    ).drop("_arr")
    # pin(): det feeds both the phase-median branch and the final join —
    # same double-computation hazard as decompose_series (and what the
    # "scanned once" contract above promises); caller owns eviction.
    det = pin(tr.withColumn("_d", F.col("_y") - F.col("trend")))
    ph_med = (
        det.filter(F.col("_d").isNotNull())
        .groupBy(*g, "_ph")
        .agg(F.sort_array(F.collect_list("_d")).alias("_pa"))
        .select(*g, "_ph", _lerp_sorted(F.col("_pa"), 0.5).alias("_pm"))
    )
    # re-center: subtract the median of the per-phase effects so the
    # seasonal component sums to ~0 in the median sense
    center = (
        ph_med.groupBy(*g)
        .agg(
            F.sort_array(F.collect_list("_pm")).alias("_ca")
        )
        .select(*g, _lerp_sorted(F.col("_ca"), 0.5).alias("_c0"))
    )
    seas = ph_med.join(center, on=g).select(
        *g, "_ph", (F.col("_pm") - F.col("_c0")).alias("_seas")
    )
    out = det.join(F.broadcast(seas), on=[*g, "_ph"], how="left")
    seasonal = F.when(F.col("trend").isNotNull(), F.col("_seas"))
    return out.select(
        *g,
        F.col("_t").alias(time_col),
        F.col("_y").alias(y_col),
        "trend",
        seasonal.alias("seasonal"),
        F.when(
            F.col("trend").isNotNull(),
            F.col("_d") - F.col("_seas"),
        ).alias("remainder"),
    )


def decompose_robust_sql(
    relation: str,
    y_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
) -> str:
    """DuckDB twin of :func:`decompose_robust`."""
    from timeseriesutils_spark.operators.series_math import _lerp_sorted_sql

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    half = period // 2
    med_arr = _lerp_sorted_sql("_arr", 0.5)
    med_pa = _lerp_sorted_sql("_pa", 0.5)
    med_ca = _lerp_sorted_sql("_ca", 0.5)
    return f"""
WITH base AS (
  SELECT {gsel}, CAST({time_col} AS BIGINT) AS _t,
    CAST({y_col} AS DOUBLE) AS _y,
    CAST(((CAST({time_col} AS BIGINT) % {period}) + {period}) % {period}
         AS BIGINT) AS _ph
  FROM ({relation})
),
tr AS (
  SELECT *, list_sort(list(_y) OVER (PARTITION BY {gsel} ORDER BY _t
    ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)) AS _arr
  FROM base
),
tr2 AS (
  SELECT {gsel}, _t, _y, _ph,
    CASE WHEN len(_arr) = {period} THEN {med_arr} END AS trend
  FROM tr
),
det AS (SELECT *, _y - trend AS _d FROM tr2),
pm AS (
  SELECT {gsel}, _ph, list_sort(list(_d)) AS _pa
  FROM det WHERE _d IS NOT NULL GROUP BY {gsel}, _ph
),
pm2 AS (SELECT {gsel}, _ph, {med_pa} AS _pm FROM pm),
ctr AS (
  SELECT {gsel}, list_sort(list(_pm)) AS _ca FROM pm2 GROUP BY {gsel}
),
ctr2 AS (SELECT {gsel}, {med_ca} AS _c0 FROM ctr),
seas AS (
  SELECT {', '.join('pm2.' + c for c in g)}, pm2._ph,
    pm2._pm - ctr2._c0 AS _seas
  FROM pm2 JOIN ctr2 USING ({gsel})
)
SELECT {', '.join('d.' + c for c in g)}, d._t AS {time_col}, d._y AS {y_col},
  d.trend,
  CASE WHEN d.trend IS NOT NULL THEN s._seas END AS seasonal,
  CASE WHEN d.trend IS NOT NULL THEN d._d - s._seas END AS remainder
FROM det d LEFT JOIN seas s
  ON {' AND '.join(f'd.{c} = s.{c}' for c in g)} AND d._ph = s._ph
"""
