"""Declared queries for the time-grid / derived-signal operators
(operators/timegrid.py, series_math.py, sessions.py) on the per-supplier
daily price series and the events stream.

The daily series (one row per (supplier, ship day), exact decimal price
sum) is the natural demo of grid ops: real gaps exist — suppliers don't
ship every day — so fill/ffill/interpolate all do real work at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dsum, dsum_sql
from timeseriesutils_spark.operators.acf import (
    acf_features,
    acf_features_sql,
    lead_lag_corr,
    lead_lag_corr_sql,
)
from timeseriesutils_spark.operators.changepoint import cusum, cusum_sql
from timeseriesutils_spark.operators.series_math import (
    diff,
    ew_volatility,
    ew_volatility_sql_columns,
    ewma,
    ewma_sql_columns,
    hampel_filter,
    hampel_filter_sql,
    pct_change,
    rolling_mad,
    rolling_mad_sql,
    rolling_moments,
    rolling_moments_sql_columns,
    rolling_quantile,
    rolling_quantile_sql_column,
    rolling_zscore,
    rolling_zscore_sql_columns,
)
from timeseriesutils_spark.operators.sessions import (
    scd2_history,
    scd2_history_sql,
    session_stats,
    session_stats_sql,
)
from timeseriesutils_spark.operators.timegrid import regularize
from timeseriesutils_spark.queries import Q
from timeseriesutils_spark.queries.featurize_queries import LI_ORDER, LI_ORDER_SQL
from timeseriesutils_spark.sources.tables import load_table


def _daily(spark, sf_dir):
    """Per-(supplier, ship day) exact daily price sum — gappy by nature.

    Pre-partitioned by supplier alone: HashPartitioning(l_suppkey)
    satisfies the aggregation's clustering on (l_suppkey, ship_day) AND
    the window partitioning every grid op needs afterwards — the whole
    daily-series pipeline runs on ONE exchange (plan-tested)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_suppkey",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("ship_day"),
            "l_extendedprice",
        )
        .repartition("l_suppkey")
        .groupBy("l_suppkey", "ship_day")
        .agg(dsum("l_extendedprice").alias("day_price"))
    )


_SQL_DAILY = f"""
  SELECT l_suppkey,
    CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day,
    {dsum_sql('l_extendedprice')} AS day_price
  FROM lineitem GROUP BY 1, 2
"""

_SQL_GRID = f"""
day AS ({_SQL_DAILY}),
b AS (SELECT l_suppkey, MIN(ship_day) AS lo, MAX(ship_day) AS hi FROM day GROUP BY 1),
grid AS (SELECT l_suppkey, UNNEST(generate_series(lo, hi)) AS ship_day FROM b),
filled AS (
  SELECT g.l_suppkey, g.ship_day, d.day_price
  FROM grid g LEFT JOIN day d ON g.l_suppkey = d.l_suppkey AND g.ship_day = d.ship_day
)
"""


def q_gap_fill_ffill(spark, sf_dir):
    """Dense daily spine per supplier + last-observation-carried-forward:
    the canonical series-regularization pipeline (timegrid.fill_gaps →
    timegrid.ffill).  Missing days appear with NULL day_price and the
    ffilled column carries the last shipment's value across the gap."""
    return regularize(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"], how="ffill"
    )


_SQL_GAP_FILL_FFILL = f"""
WITH {_SQL_GRID}
SELECT l_suppkey, ship_day, day_price,
  LAST_VALUE(day_price IGNORE NULLS) OVER (
    PARTITION BY l_suppkey ORDER BY ship_day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_price_ffill
FROM filled
"""


def q_interpolate(spark, sf_dir):
    """Linear interpolation across the gaps of the daily spine
    (fused timegrid.regularize; equals fill_gaps → interpolate_linear):
    gap days get the line between the surrounding shipment days."""
    return regularize(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"], how="interp"
    )


# same association order as the Spark tree: pv + (nv - pv) * (dt / dT)
_W_BEFORE = (
    "(PARTITION BY l_suppkey ORDER BY ship_day "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_W_AFTER = (
    "(PARTITION BY l_suppkey ORDER BY ship_day "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
)
_PV = f"LAST_VALUE(day_price IGNORE NULLS) OVER {_W_BEFORE}"
_PT = f"LAST_VALUE(CASE WHEN day_price IS NOT NULL THEN ship_day END IGNORE NULLS) OVER {_W_BEFORE}"
_NV = f"FIRST_VALUE(day_price IGNORE NULLS) OVER {_W_AFTER}"
_NT = f"FIRST_VALUE(CASE WHEN day_price IS NOT NULL THEN ship_day END IGNORE NULLS) OVER {_W_AFTER}"

_SQL_INTERPOLATE = f"""
WITH {_SQL_GRID}
SELECT l_suppkey, ship_day, day_price,
  CASE WHEN day_price IS NOT NULL THEN CAST(day_price AS DOUBLE)
       ELSE {_PV} + ({_NV} - {_PV}) *
            (CAST(ship_day - {_PT} AS DOUBLE) / CAST({_NT} - {_PT} AS DOUBLE))
  END AS day_price_interp
FROM filled
"""


EWMA_PARAMS = dict(window_size=10, ew_span=5.0)


def q_ewma(spark, sf_dir):
    """Exponentially-weighted trailing mean (series_math.ewma) on the
    lineitem price series — reference ew-weight convention
    (alpha = 2/(span+0.1), featurize.py:374), bounded window, pure
    Σ w_j·LAG_j expression."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    df, _ = ewma(
        li, "l_extendedprice", ["l_suppkey"], order_by=LI_ORDER, **EWMA_PARAMS
    )
    return df.drop("l_shipdate")


def _sql_ewma():
    cols = ewma_sql_columns(
        "l_extendedprice", ["l_suppkey"], LI_ORDER_SQL.split(", "), **EWMA_PARAMS
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,\n  "
        f"{sel}\nFROM lineitem"
    )


def q_ew_volatility(spark, sf_dir):
    """EW variance + volatility (series_math.ew_volatility): weighted
    second moment minus squared ewma over the same bounded trailing
    window and reference weight convention -- the risk/dispersion
    companion to the ewma level signal, still a pure lag expression."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    out = ew_volatility(
        li, "l_extendedprice", ["l_suppkey"], order_by=LI_ORDER, **EWMA_PARAMS
    )
    return out.drop("l_shipdate")


def _sql_ew_volatility():
    cols = ew_volatility_sql_columns(
        "l_extendedprice", ["l_suppkey"], LI_ORDER_SQL.split(", "), **EWMA_PARAMS
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,\n  "
        f"{sel}\nFROM lineitem"
    )


def q_diff_pct(spark, sf_dir):
    """Differencing + percent change (series_math.diff / pct_change):
    1- and 7-row price deltas and 1-row relative change per supplier."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    df, _ = diff(li, "l_extendedprice", ["l_suppkey"], periods=[1, 7], order_by=LI_ORDER)
    df, _ = pct_change(df, "l_extendedprice", ["l_suppkey"], periods=1, order_by=LI_ORDER)
    return df.drop("l_shipdate")


def _sql_diff_pct():
    over = f"(PARTITION BY l_suppkey ORDER BY {LI_ORDER_SQL})"
    c = "l_extendedprice"
    return f"""
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,
  {c} - LAG({c}, 1) OVER {over} AS {c}_diff1,
  {c} - LAG({c}, 7) OVER {over} AS {c}_diff7,
  CASE WHEN LAG({c}, 1) OVER {over} <> 0
       THEN {c} / LAG({c}, 1) OVER {over} - 1.0 END AS {c}_pctchg1
FROM lineitem
"""


ZSCORE_PARAMS = dict(window_size=30, threshold=1.5, scale=6)


def q_rolling_zscore(spark, sf_dir):
    """Rolling z-score anomaly detection (series_math.rolling_zscore) on
    l_quantity: trailing-30 mean/std from exact integer sums, |z| > 1.5
    flag.  Quantity magnitudes (≤ 50) keep the quantized sums of squares
    far below bigint range."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    out = rolling_zscore(li, "l_quantity", ["l_suppkey"], order_by=LI_ORDER, **ZSCORE_PARAMS)
    return out.drop("l_shipdate")


def _sql_rolling_zscore():
    cols = rolling_zscore_sql_columns(
        "l_quantity", ["l_suppkey"], LI_ORDER_SQL.split(", "), **ZSCORE_PARAMS
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,\n  "
        f"{sel}\nFROM lineitem"
    )


def q_rolling_median(spark, sf_dir):
    """Trailing exact rolling median (series_math.rolling_quantile,
    q=0.5, w=15) of l_quantity per supplier — the outlier-robust center
    line; quantile_cont semantics shared with the oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    out = rolling_quantile(
        li, "l_quantity", 0.5, ["l_suppkey"], window_size=15, order_by=LI_ORDER
    )
    return out.drop("l_shipdate")


def _sql_rolling_median():
    name, expr = rolling_quantile_sql_column(
        "l_quantity", 0.5, ["l_suppkey"], LI_ORDER_SQL.split(", "), window_size=15
    )
    return (
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,\n  "
        f"{expr} AS {name}\nFROM lineitem"
    )


def q_rolling_mad(spark, sf_dir):
    """Robust rolling anomaly detection (series_math.rolling_mad):
    per-window median + median-absolute-deviation of l_quantity per
    supplier (w=15), flag where |x - med| > 3 * 1.4826 * MAD -- the
    50%-breakdown-point alternative to rolling_zscore."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    out = rolling_mad(
        li, "l_quantity", ["l_suppkey"], window_size=15, order_by=LI_ORDER
    )
    return out.drop("l_shipdate")


def _sql_rolling_mad():
    return rolling_mad_sql(
        "lineitem",
        "l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity",
        "l_quantity",
        ["l_suppkey"],
        LI_ORDER_SQL.split(", "),
        window_size=15,
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events stream
    (operators/sessions.session_stats): 30-minute inactivity splits, one
    row per (user, session) with exact value sums and integer-ms times."""
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, gap_minutes=30)


def q_scd2_history(spark, sf_dir):
    """SCD-2 dimension history (operators/sessions.scd2_history): per
    user, the intervals during which consecutive events kept the same
    event_type -- change-detection LAG + running block id, one key
    exchange."""
    return scd2_history(load_table(spark, sf_dir, "events"))


MOMENTS_PARAMS = dict(window_size=15, scale=2)


def q_rolling_moments(spark, sf_dir):
    """Rolling skewness + excess kurtosis (series_math.rolling_moments)
    of l_quantity per supplier, trailing w=15 — local distribution shape
    beyond mean/std: exact BIGINT power sums Sx..Sx^4, one double
    formula, full windows only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    out = rolling_moments(
        li, "l_quantity", ["l_suppkey"], order_by=LI_ORDER, **MOMENTS_PARAMS
    )
    return out.drop("l_shipdate")


def _sql_rolling_moments():
    cols = rolling_moments_sql_columns(
        "l_quantity", ["l_suppkey"], LI_ORDER_SQL.split(", "), **MOMENTS_PARAMS
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,\n  "
        f"{sel}\nFROM lineitem"
    )


ACF_PARAMS = dict(max_lag=7, scale=0, min_pairs=2)


def q_acf(spark, sf_dir):
    """Whole-series autocorrelation features (operators/acf.acf_features)
    on the per-supplier daily price series: ACF at lags 1..7 with the
    running Ljung-Box Q — is each supplier's shipping-value series
    self-correlated or white noise?  One exchange (window + groupBy share
    the supplier partitioning), 7 rows out per supplier."""
    return acf_features(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"], **ACF_PARAMS
    )


def _sql_acf():
    return acf_features_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"], **ACF_PARAMS
    )


def _daily_pq(spark, sf_dir):
    """Per-(supplier, ship day) exact daily price and quantity sums —
    the two-signal variant of _daily for cross-correlation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_suppkey",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("ship_day"),
            "l_extendedprice",
            "l_quantity",
        )
        .repartition("l_suppkey")
        .groupBy("l_suppkey", "ship_day")
        .agg(
            dsum("l_extendedprice").alias("day_price"),
            dsum("l_quantity").alias("day_qty"),
        )
    )


_SQL_DAILY_PQ = f"""
  SELECT l_suppkey,
    CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day,
    {dsum_sql('l_extendedprice')} AS day_price,
    {dsum_sql('l_quantity')} AS day_qty
  FROM lineitem GROUP BY 1, 2
"""

LEADLAG_PARAMS = dict(max_shift=5, scale_x=0, scale_y=2, min_pairs=8)


def q_lead_lag(spark, sf_dir):
    """Lead-lag cross-correlation scan (operators/acf.lead_lag_corr)
    between daily price and daily quantity per supplier: Pearson at
    shifts -5..+5 with the best shift flagged — does value lead volume
    or vice versa?  Exact BIGINT pair sums, deterministic tie-breaks."""
    return lead_lag_corr(
        _daily_pq(spark, sf_dir),
        "day_price",
        "day_qty",
        ["l_suppkey"],
        ["ship_day"],
        **LEADLAG_PARAMS,
    )


def _sql_lead_lag():
    return lead_lag_corr_sql(
        f"({_SQL_DAILY_PQ})",
        "day_price",
        "day_qty",
        ["l_suppkey"],
        ["ship_day"],
        **LEADLAG_PARAMS,
    )


CUSUM_PARAMS = dict(target=50_000.0, threshold=500_000.0, scale=2)


def q_cusum(spark, sf_dir):
    """Two-sided CUSUM drift detector (operators/changepoint.cusum) on
    the per-supplier daily price series: the max(0, ...) recursion
    computed as closed-form prefix-extrema window expressions — one
    exchange, exact int64 arithmetic, no per-series loop.  Alarms where
    cumulative deviation from the 50k in-control level exceeds 500k."""
    return cusum(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"], **CUSUM_PARAMS
    )


QUERIES = {
    "gap_fill_ffill": Q(q_gap_fill_ffill, _SQL_GAP_FILL_FFILL),
    "cusum_drift": Q(
        q_cusum,
        cusum_sql(
            _SQL_DAILY, "day_price", "ship_day", ["l_suppkey"], **CUSUM_PARAMS
        ),
    ),
    "interpolate": Q(q_interpolate, _SQL_INTERPOLATE),
    "ewma": Q(q_ewma, _sql_ewma()),
    "ew_volatility": Q(q_ew_volatility, _sql_ew_volatility()),
    "diff_pct": Q(q_diff_pct, _sql_diff_pct()),
    "rolling_zscore": Q(q_rolling_zscore, _sql_rolling_zscore()),
    "rolling_median": Q(q_rolling_median, _sql_rolling_median()),
    "rolling_mad": Q(q_rolling_mad, _sql_rolling_mad()),
    "rolling_moments": Q(q_rolling_moments, _sql_rolling_moments()),
    "acf_features": Q(q_acf, _sql_acf()),
    "lead_lag_corr": Q(q_lead_lag, _sql_lead_lag()),
    "sessionize": Q(q_sessionize, session_stats_sql(gap_minutes=30)),
    "scd2_history": Q(q_scd2_history, scd2_history_sql()),
}


def q_decompose(spark, sf_dir):
    """Classical seasonal decomposition (operators/decompose): daily
    lineitem counts per returnflag, zero-filled to a dense day grid,
    split into centered-MA trend + period-7 phase seasonal + remainder
    — all doubles derived from exact BIGINT sums."""
    from timeseriesutils_spark.operators.decompose import decompose_series
    from timeseriesutils_spark.operators.timegrid import fill_gaps

    li = load_table(spark, sf_dir, "lineitem")
    cnt = (
        li.select(
            "l_returnflag",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("ship_day"),
        )
        .groupBy("l_returnflag", "ship_day")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    dense = fill_gaps(cnt, "ship_day", ["l_returnflag"]).select(
        "l_returnflag",
        "ship_day",
        F.coalesce(F.col("n_items"), F.lit(0)).alias("n_items"),
    )
    return decompose_series(
        dense, "n_items", "ship_day", ["l_returnflag"], period=7
    )


def _sql_decompose():
    from timeseriesutils_spark.operators.decompose import decompose_series_sql

    dense = """(
  WITH day AS (
    SELECT l_returnflag,
      CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day,
      COUNT(*) AS n_items
    FROM lineitem GROUP BY 1, 2
  ), b AS (
    SELECT l_returnflag, MIN(ship_day) AS lo, MAX(ship_day) AS hi FROM day GROUP BY 1
  ), grid AS (
    SELECT l_returnflag, UNNEST(generate_series(lo, hi)) AS ship_day FROM b
  )
  SELECT g.l_returnflag, g.ship_day, COALESCE(d.n_items, 0) AS n_items
  FROM grid g LEFT JOIN day d
    ON g.l_returnflag = d.l_returnflag AND g.ship_day = d.ship_day
)"""
    return decompose_series_sql(
        dense, "n_items", "ship_day", ["l_returnflag"], period=7
    )


QUERIES.update({"decompose_series": Q(q_decompose, _sql_decompose())})


SAX_PARAMS = dict(n_segments=8, alphabet=4, scale=0)


def q_sax(spark, sf_dir):
    """SAX symbolization (operators/sax.sax_symbolize): each supplier's
    daily price series → an 8-char symbolic word over a 4-letter
    alphabet (PAA + Gaussian breakpoints) — the indexing/motif
    representation; exact integer substrate, one group exchange."""
    from timeseriesutils_spark.operators.sax import sax_symbolize

    return sax_symbolize(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"], **SAX_PARAMS
    )


def _sql_sax():
    from timeseriesutils_spark.operators.sax import sax_symbolize_sql

    return sax_symbolize_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"], **SAX_PARAMS
    )


QUERIES.update({"sax_words": Q(q_sax, _sql_sax())})


# weekly sawtooth template, 4 periods of 7 (a shape with real warping
# structure); the op z-normalizes it before alignment
_DTW_REF = [float(d % 7) for d in range(28)]

# 28-day period grain for the declared DTW query: per-supplier series
# of ~90 points against the 28-point template
_DTW_DAYS_PER_PERIOD = 28


def _period_price(spark, sf_dir):
    """Per-(supplier, 28-day period) exact price sum — the coarser
    sibling of :func:`_daily` (same one-exchange shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    day = (
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("bigint")
    )
    return (
        li.select("l_suppkey", day.alias("_day"), "l_extendedprice")
        .select(
            "l_suppkey",
            F.expr(f"CAST(_day div {_DTW_DAYS_PER_PERIOD} AS BIGINT)").alias(
                "ship_period"
            ),
            "l_extendedprice",
        )
        .repartition("l_suppkey")
        .groupBy("l_suppkey", "ship_period")
        .agg(dsum("l_extendedprice").alias("period_price"))
    )


_SQL_PERIOD = f"""
  SELECT l_suppkey,
    CAST(CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
         // {_DTW_DAYS_PER_PERIOD} AS BIGINT) AS ship_period,
    {dsum_sql('l_extendedprice')} AS period_price
  FROM lineitem GROUP BY 1, 2
"""


def q_dtw(spark, sf_dir):
    """Exact DTW pattern scan (operators/dtw.dtw_to_reference_exact):
    each supplier's z-normalized 28-day-period price series aligned to
    a sawtooth template, every float collapsed to int64 before any
    cross-row arithmetic — the sequential-DP operator made
    hash-verifiable (the DuckDB twin folds the identical integer
    min-plus DP with list_reduce).  The banded float-kernel
    dtw_to_reference remains the production path; kernel equivalence
    is pinned in tests/test_dtw.py."""
    from timeseriesutils_spark.operators.dtw import dtw_to_reference_exact

    return dtw_to_reference_exact(
        _period_price(spark, sf_dir),
        "period_price",
        ["l_suppkey"],
        ["ship_period"],
        reference=_DTW_REF,
    )


def _sql_dtw():
    from timeseriesutils_spark.operators.dtw import dtw_to_reference_exact_sql

    return dtw_to_reference_exact_sql(
        f"({_SQL_PERIOD})",
        "period_price",
        "l_suppkey",
        "ship_period",
        reference=_DTW_REF,
    )


QUERIES.update({"dtw_pattern": Q(q_dtw, _sql_dtw())})


_COUNTER_MOD = 1_000_000


def q_counter_rate(spark, sf_dir):
    """Monotonic-counter rate with reset handling
    (operators/counters.counter_rate): Prometheus rate() / TimescaleDB
    counter_agg semantics -- per-type hourly increase where the counter
    is a deterministic sawtooth built from the events stream (running
    quantized sum mod 1e6, so genuine resets occur), deltas exact int64,
    resets counted as fresh increase from zero."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.counters import counter_rate

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    q = F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)).cast("bigint")
    ctr = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.sum(q).over(w) % F.lit(_COUNTER_MOD)).alias("ctr"),
    )
    return counter_rate(
        ctr, "ctr", "ts", ["event_type"], bucket="hour", id_col="event_id"
    )


def _sql_counter_rate():
    from timeseriesutils_spark.operators.counters import counter_rate_sql

    inner = f"""
SELECT event_type, ts, event_id,
  CAST(SUM(CAST(FLOOR(ABS(value) * 100 + 0.5) AS BIGINT))
    OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    % {_COUNTER_MOD} AS ctr
FROM events
"""
    return counter_rate_sql(
        inner, "ctr", "ts", ["event_type"], bucket="hour", id_col="event_id"
    )


QUERIES.update({"counter_rate": Q(q_counter_rate, _sql_counter_rate())})


def q_fifo_allocation(spark, sf_dir):
    """FIFO lot allocation (operators/fifo.fifo_allocation): match
    'O'-status lineitem quantities (outgoing) against 'F'-status lots
    (incoming) per part in ship-date order via the cumulative-quantity
    interval-overlap closed form -- inventory costing / tax-lot matching
    without iteration."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.fifo import fifo_allocation

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint").alias("qty"),
        (F.col("l_linestatus") == "F").alias("is_buy"),
        "l_shipdate",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_id"),
    )
    return fifo_allocation(
        li, "l_partkey", "qty", "is_buy",
        ["l_shipdate", "line_id"], "line_id",
    )


def _sql_fifo_allocation():
    from timeseriesutils_spark.operators.fifo import fifo_allocation_sql

    inner = """
SELECT l_partkey,
  CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
  l_linestatus = 'F' AS is_buy,
  l_shipdate,
  l_orderkey * 10 + l_linenumber AS line_id
FROM lineitem
"""
    return fifo_allocation_sql(
        inner, "l_partkey", "qty", "is_buy",
        ["l_shipdate", "line_id"], "line_id",
    )


QUERIES.update({"fifo_allocation": Q(q_fifo_allocation, _sql_fifo_allocation())})


def q_local_peaks(spark, sf_dir):
    """Per-type event-value peak detection
    (operators/series_math.local_peaks): strict-left/tie-right local
    maxima over a 5-row neighborhood with a value floor -- quantized
    int64 comparisons, two frame-bounded window maxes on one series
    exchange."""
    from timeseriesutils_spark.operators.series_math import local_peaks

    return local_peaks(
        load_table(spark, sf_dir, "events"),
        "value",
        "event_id",
        ["event_type"],
        neighborhood=5,
        min_value=150.0,
        scale=2,
    )


def _sql_local_peaks():
    from timeseriesutils_spark.operators.series_math import local_peaks_sql

    return local_peaks_sql(
        "events",
        "value",
        "event_id",
        ["event_type"],
        neighborhood=5,
        min_value=150.0,
        scale=2,
    )


QUERIES.update({"local_peaks": Q(q_local_peaks, _sql_local_peaks())})


def q_rolling_slope(spark, sf_dir):
    """Trailing 14-point OLS slope of event value per type
    (operators/series_math.rolling_slope): the windowed local-trend /
    momentum indicator -- five exact int64 window sums on one series
    exchange, closed-form division."""
    from timeseriesutils_spark.operators.series_math import rolling_slope

    out = rolling_slope(
        load_table(spark, sf_dir, "events"),
        "value",
        "event_id",
        ["event_type"],
        window=14,
        scale=2,
    )
    return out.select("event_type", "event_id", "value", "value_slope")


def _sql_rolling_slope():
    from timeseriesutils_spark.operators.series_math import rolling_slope_sql

    return rolling_slope_sql(
        "events",
        "value",
        "event_id",
        ["event_type"],
        "event_type, event_id, value",
        window=14,
        scale=2,
    )


QUERIES.update({"rolling_slope": Q(q_rolling_slope, _sql_rolling_slope())})


def q_stockout_events(spark, sf_dir):
    """Stockout / recovery edge events per part
    (operators/series_math.threshold_crossings): running inventory =
    cumulative (+F-receipt / -O-issue) quantity in ship order; emit one
    event per zero-crossing, not per negative sample -- the edge-
    triggered alerting primitive."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.series_math import threshold_crossings

    li = load_table(spark, sf_dir, "lineitem")
    delta = F.when(
        F.col("l_linestatus") == "F", F.floor(F.col("l_quantity") + F.lit(0.5))
    ).otherwise(-F.floor(F.col("l_quantity") + F.lit(0.5))).cast("bigint")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lvl = li.select(
        "l_partkey",
        "l_shipdate",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_id"),
        F.sum(delta).over(w).cast("double").alias("level"),
    )
    return threshold_crossings(
        lvl, "level", ["l_shipdate", "line_id"], ["l_partkey"],
        threshold=0.0, scale=0,
    )


def _sql_stockout_events():
    from timeseriesutils_spark.operators.series_math import threshold_crossings_sql

    inner = """
SELECT l_partkey, l_shipdate,
  l_orderkey * 10 + l_linenumber AS line_id,
  CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                ELSE -CAST(FLOOR(l_quantity + 0.5) AS BIGINT) END)
    OVER (PARTITION BY l_partkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS level
FROM lineitem
"""
    return threshold_crossings_sql(
        inner, "level", ["l_shipdate", "line_id"], ["l_partkey"],
        threshold=0.0, scale=0,
    )


QUERIES.update({"stockout_events": Q(q_stockout_events, _sql_stockout_events())})


def q_seasonal_strength(spark, sf_dir):
    """Seasonal-strength diagnostic (operators/decompose.
    seasonal_strength): Hyndman's 1 - Var(remainder)/Var(seasonal +
    remainder) per returnflag over the period-7 decomposition of daily
    lineitem counts -- the go/no-go scalar for seasonal modeling,
    quantized-exact variance sums on top of the decomposition query."""
    from timeseriesutils_spark.operators.decompose import seasonal_strength

    return seasonal_strength(q_decompose(spark, sf_dir), ["l_returnflag"])


def _sql_seasonal_strength():
    from timeseriesutils_spark.operators.decompose import seasonal_strength_sql

    return seasonal_strength_sql(_sql_decompose(), ["l_returnflag"])


QUERIES.update(
    {"seasonal_strength": Q(q_seasonal_strength, _sql_seasonal_strength())}
)


_RQ_QS = (0.5, 0.95)
_RQ_W = 100


def q_rolling_quantile(spark, sf_dir):
    """Per-event trailing exact p50/p95 of value over the last 100 events
    per type (operators/stats.rolling_quantile) — the SLO-monitoring
    shape: one sorted window array per row, engine-pinned lerp
    quantiles."""
    from timeseriesutils_spark.operators.stats import rolling_quantile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    out = rolling_quantile(
        ev, "value", ["event_type"], ["ts", "event_id"], qs=_RQ_QS,
        window_size=_RQ_W,
    )
    return out.drop("ts")


def _sql_rolling_quantile():
    from timeseriesutils_spark.operators.stats import rolling_quantile_sql

    return rolling_quantile_sql(
        "events",
        "event_id, event_type, value",
        "value",
        ["event_type"],
        ["ts", "event_id"],
        qs=_RQ_QS,
        window_size=_RQ_W,
    )


QUERIES.update({"rolling_quantile": Q(q_rolling_quantile, _sql_rolling_quantile())})


def q_best_breakpoint(spark, sf_dir):
    """Single best mean-shift changepoint per supplier price series
    (operators/changepoint.best_breakpoint): closed-form SSE split costs
    from DECIMAL-exact prefix sums, argmin by window rank — WHERE the
    level changed, next to cusum_drift's HAS it drifted."""
    from timeseriesutils_spark.operators.changepoint import best_breakpoint

    return best_breakpoint(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"]
    )


def _sql_best_breakpoint():
    from timeseriesutils_spark.operators.changepoint import best_breakpoint_sql

    return best_breakpoint_sql(
        _SQL_DAILY, "day_price", "ship_day", ["l_suppkey"]
    )


QUERIES.update({"best_breakpoint": Q(q_best_breakpoint, _sql_best_breakpoint())})


def q_permutation_entropy(spark, sf_dir):
    """Normalized order-3 permutation entropy of each supplier's daily
    price series (operators/complexity.permutation_entropy): ordinal-
    pattern histogram entropy — 0 monotone, ->1 white noise.  One
    window pass + two map-combinable aggregations; the 6-term entropy
    sum is a fixed expression tree (never a float SUM across rows)."""
    from timeseriesutils_spark.operators.complexity import permutation_entropy

    return permutation_entropy(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"]
    )


def _sql_permutation_entropy():
    from timeseriesutils_spark.operators.complexity import permutation_entropy_sql

    return permutation_entropy_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"]
    )


QUERIES.update(
    {"permutation_entropy": Q(q_permutation_entropy, _sql_permutation_entropy())}
)


def q_hurst_exponent(spark, sf_dir):
    """Aggregated-variance Hurst exponent per supplier price series
    (operators/complexity.hurst_exponent): single-pass block-array
    plan — one exchange collects each series, block-mean variances at
    sizes 1/2/4/8/16 computed with array expressions in the same
    aggregation, closed-form log-log slope -> H."""
    from timeseriesutils_spark.operators.complexity import hurst_exponent

    return hurst_exponent(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"]
    )


def _sql_hurst_exponent():
    from timeseriesutils_spark.operators.complexity import hurst_exponent_sql

    return hurst_exponent_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"]
    )


QUERIES.update({"hurst_exponent": Q(q_hurst_exponent, _sql_hurst_exponent())})


def q_tech_indicators(spark, sf_dir):
    """Momentum / trend / volatility triple on the daily price series
    (operators/technical.tech_indicators): Cutler RSI-14, truncated-EW
    MACD(12,26,9), Bollinger(20,2) — bounded lag/sum expressions on
    two window passes over one series exchange, complete-window NULL
    discipline throughout."""
    from timeseriesutils_spark.operators.technical import tech_indicators

    return tech_indicators(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"]
    )


def _sql_tech_indicators():
    from timeseriesutils_spark.operators.technical import tech_indicators_sql

    return tech_indicators_sql(
        f"({_SQL_DAILY})",
        "l_suppkey, ship_day, day_price",
        "day_price",
        ["l_suppkey"],
        ["ship_day"],
    )


QUERIES.update({"tech_indicators": Q(q_tech_indicators, _sql_tech_indicators())})


def q_page_hinkley(spark, sf_dir):
    """Page–Hinkley mean-increase drift monitor per supplier on the
    daily price series (operators/changepoint.page_hinkley): deviation
    from the series' own running mean — the self-baselining
    concept-drift detector beside cusum_drift's fixed-target form.
    Three shared-partition window passes, integer-exact alarm."""
    from timeseriesutils_spark.operators.changepoint import page_hinkley

    return page_hinkley(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        delta=0.0, lam=5000.0,
    )


def _sql_page_hinkley():
    from timeseriesutils_spark.operators.changepoint import page_hinkley_sql

    return page_hinkley_sql(
        _SQL_DAILY, "day_price", ["l_suppkey"], ["ship_day"],
        delta=0.0, lam=5000.0,
    )


QUERIES.update({"page_hinkley": Q(q_page_hinkley, _sql_page_hinkley())})


def q_sample_entropy(spark, sf_dir):
    """Per-supplier sample entropy SampEn(2, 0.2σ) of the MONTHLY
    price series (operators/complexity.sample_entropy):
    amplitude-scale regularity beside permutation_entropy's ordinal
    measure — exact-integer pair matching over the group's array, the
    O(n²)-bounded coarse-grid convention (84 months ≈ 3.4k pairs)."""
    from timeseriesutils_spark.operators.complexity import sample_entropy

    d = _daily(spark, sf_dir)
    monthly = (
        d.select(
            "l_suppkey",
            (F.col("ship_day") / 30).cast("bigint").alias("month"),
            F.floor(F.col("day_price") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("_pq"),
        )
        .groupBy("l_suppkey", "month")
        .agg(F.sum("_pq").cast("double").alias("month_price"))
    )
    return sample_entropy(
        monthly, "month_price", ["l_suppkey"], ["month"], m=2,
        r_frac=0.2, scale=0,
    )


def _sql_sample_entropy():
    from timeseriesutils_spark.operators.complexity import sample_entropy_sql

    monthly = f"""
SELECT l_suppkey, CAST(FLOOR(ship_day / 30) AS BIGINT) AS month,
  CAST(CAST(SUM(CAST(FLOOR(day_price * 100 + 0.5) AS BIGINT)) AS BIGINT)
       AS DOUBLE) AS month_price
FROM ({_SQL_DAILY}) GROUP BY 1, 2
"""
    return sample_entropy_sql(
        monthly, "month_price", ["l_suppkey"], ["month"], m=2,
        r_frac=0.2, scale=0,
    )


QUERIES.update({"sample_entropy": Q(q_sample_entropy, _sql_sample_entropy())})


def q_mad_outliers(spark, sf_dir):
    """Robust MAD z-score outliers on the per-supplier daily price
    series (operators/stats.mad_outliers): |x − median|/(1.4826·MAD)
    flags spikes without the outliers inflating their own yardstick —
    the robust sibling of rolling_zscore's mean/std chart.  Two bounded
    per-group quantile passes broadcast back to one fact scan."""
    from timeseriesutils_spark.operators.stats import mad_outliers

    return mad_outliers(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], threshold=3.5
    )


def _sql_mad_outliers():
    from timeseriesutils_spark.operators.stats import mad_outliers_sql

    return mad_outliers_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"],
        "t.l_suppkey, t.ship_day, t.day_price", threshold=3.5,
    )


QUERIES.update({"mad_outliers": Q(q_mad_outliers, _sql_mad_outliers())})


def q_sampen_coarse(spark, sf_dir):
    """Sample entropy on the weekly coarse grid
    (operators/complexity.coarse_grid → sample_entropy): the documented
    answer to SampEn's O(n²) pair envelope — collapse the daily series
    onto a 7-day grid first (pairs drop ×49), then score regularity.
    The helper keeps the exact-integer discipline (quantized cell
    means land back on the same grid), so the chain stays
    hash-verifiable end to end."""
    from timeseriesutils_spark.operators.complexity import (
        coarse_grid,
        sample_entropy,
    )

    weekly = coarse_grid(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        factor=7, scale=2,
    )
    return sample_entropy(
        weekly, "day_price", ["l_suppkey"], ["grid_pos"],
        m=2, r_frac=0.2, scale=2,
    )


def _sql_sampen_coarse():
    from timeseriesutils_spark.operators.complexity import (
        coarse_grid_sql,
        sample_entropy_sql,
    )

    weekly = coarse_grid_sql(
        _SQL_DAILY, "day_price", "ship_day", ["l_suppkey"],
        factor=7, scale=2,
    )
    return sample_entropy_sql(
        f"({weekly})", "day_price", ["l_suppkey"], ["grid_pos"],
        m=2, r_frac=0.2, scale=2,
    )


QUERIES.update({"sampen_coarse": Q(q_sampen_coarse, _sql_sampen_coarse())})


def q_pacf(spark, sf_dir):
    """Partial autocorrelation at lags 1..5 per supplier
    (operators/acf.pacf_features): the AR order-selection companion of
    acf_features — PACF cuts off at the true AR order where ACF only
    tails off.  Durbin–Levinson over the exact-sum r_k as a fixed
    chain of small projections (the same SQL text runs in both
    engines); the pivot exchange moves max_lag rows per group."""
    from timeseriesutils_spark.operators.acf import pacf_features

    return pacf_features(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        max_lag=5, scale=0, min_pairs=2,
    )


def _sql_pacf():
    from timeseriesutils_spark.operators.acf import pacf_features_sql

    return pacf_features_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"],
        max_lag=5, scale=0, min_pairs=2,
    )


QUERIES.update({"pacf_features": Q(q_pacf, _sql_pacf())})


def q_hampel_filter(spark, sf_dir):
    """Hampel despiking of per-supplier quantity series
    (series_math.hampel_filter): centered 15-point median/MAD window,
    spikes beyond 3·1.4826·MAD replaced by the local median — the
    REPAIR sibling of rolling_mad's trailing-window FLAG (clean a
    historical series before fitting vs monitor live data)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice",
        "l_quantity", "l_shipdate",
    )
    out = hampel_filter(
        li, "l_quantity", ["l_suppkey"], half_window=7, order_by=LI_ORDER
    )
    return out.drop("l_shipdate")


def _sql_hampel_filter():
    return hampel_filter_sql(
        "lineitem",
        "l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity",
        "l_quantity",
        ["l_suppkey"],
        LI_ORDER_SQL.split(", "),
        half_window=7,
    )


def q_robust_scaler(spark, sf_dir):
    """Median/IQR feature standardization (stats.robust_scaler) of
    order totals per priority class — the outlier-proof z-score for
    feature pipelines (exact quantile_cont bounds, broadcast back;
    zero-IQR groups yield NULL instead of blowing up)."""
    from timeseriesutils_spark.operators.stats import robust_scaler

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return robust_scaler(o, "o_totalprice", ["o_orderpriority"])


def _sql_robust_scaler():
    from timeseriesutils_spark.operators.stats import robust_scaler_sql

    return robust_scaler_sql(
        "(SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders)"
        " AS o",
        "o_totalprice",
        ["o_orderpriority"],
        "o_orderkey, o_orderpriority, o_totalprice",
    )


QUERIES.update({
    "hampel_filter": Q(q_hampel_filter, _sql_hampel_filter()),
    "robust_scaler": Q(q_robust_scaler, _sql_robust_scaler()),
})


def q_binseg_breakpoints(spark, sf_dir):
    """Two-level binary segmentation of the per-supplier price series
    (operators/changepoint.binseg_breakpoints): best_breakpoint finds
    THE split; this recurses once onto each half — up to three ranked
    mean-shift breakpoints from two window passes, no driver loop."""
    from timeseriesutils_spark.operators.changepoint import (
        binseg_breakpoints,
    )

    return binseg_breakpoints(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"]
    )


def _sql_binseg_breakpoints():
    from timeseriesutils_spark.operators.changepoint import (
        binseg_breakpoints_sql,
    )

    return binseg_breakpoints_sql(
        _SQL_DAILY, "day_price", "ship_day", ["l_suppkey"]
    )


QUERIES.update({
    "binseg_breakpoints": Q(q_binseg_breakpoints, _sql_binseg_breakpoints())
})


# 4 literal frequencies (cycles/day): weekly, lunar-monthly, quarterly,
# yearly — the seasonal suspects for shipment series
_LOMB_FREQS = [1.0 / 7.0, 1.0 / 28.0, 1.0 / 91.0, 1.0 / 365.0]


def q_lomb_scargle(spark, sf_dir):
    """Lomb–Scargle periodogram over each supplier's IRREGULAR daily
    price series (operators/lomb.lomb_scargle): the least-squares
    spectral power at 4 literal frequencies evaluated at the observed
    timestamps — no gap-filling bias.  Trig terms 1e-9-quantized to
    int64 before summation (the renderer discipline), so the twin is
    hash-green despite libm."""
    from timeseriesutils_spark.operators.lomb import lomb_scargle

    return lomb_scargle(
        _daily(spark, sf_dir),
        "day_price",
        "ship_day",
        ["l_suppkey"],
        freqs=_LOMB_FREQS,
    )


def _sql_lomb():
    from timeseriesutils_spark.operators.lomb import lomb_scargle_sql

    return lomb_scargle_sql(
        f"({_SQL_DAILY})",
        "day_price",
        "ship_day",
        ["l_suppkey"],
        freqs=_LOMB_FREQS,
    )


QUERIES.update({"lomb_scargle": Q(q_lomb_scargle, _sql_lomb())})


def _shared_profile(spark, sf_dir):
    """The banded matrix profile feeds BOTH the ``matrix_profile`` and
    ``motif_discord`` queries — build it once per process per sf_dir
    via the parquet-checkpoint memo (functions/checkpoint.py) so the
    16-lag window chain is paid once, not twice (round-13 de-dup; the
    two queries were the r12 bench's #2 and #4 heaviest entries)."""
    from timeseriesutils_spark.functions.checkpoint import checkpoint_once
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    return checkpoint_once(
        f"matrix_profile:{sf_dir}",
        lambda: matrix_profile(
            _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
            w=8, band=20, excl=4, scale=2,
        ),
        spark,
    )


def q_matrix_profile(spark, sf_dir):
    """Banded z-normalized matrix profile of each supplier's daily
    price series (operators/matrixprofile.matrix_profile): STOMP's
    O(1)-per-cell normalized-correlation identity expressed as pure
    window expressions — per-lag lead-products + rolling sums give the
    QT dot products, the backward pair is a lag of the forward
    distance — so the whole motif/discord profile runs on ONE exchange
    per series with zero joins.  Served from the shared
    parquet-checkpointed build (see :func:`_shared_profile`)."""
    return _shared_profile(spark, sf_dir)


def _sql_matrix_profile():
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile_sql

    return matrix_profile_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"],
        w=8, band=20, excl=4, scale=2,
    )


QUERIES.update({"matrix_profile": Q(q_matrix_profile, _sql_matrix_profile())})


_STL_PARAMS = dict(period=7, seasonal_h=3, trend_h=10, scale=2)


def q_stl_decompose(spark, sf_dir):
    """STL decomposition (operators/stl.stl_decompose) of the
    interpolation-regularized daily supplier price series: one
    Cleveland inner iteration — cycle-subseries tricube LOESS,
    MA_P∘MA_P∘MA_3 low-pass, tricube trend — every smoother a
    Σ literal-weight·lead/lag expression on ONE ordered window per
    supplier (the taylor/holt impulse-weight discipline)."""
    from timeseriesutils_spark.operators.stl import stl_decompose

    grid = regularize(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        how="interp",
    )
    return stl_decompose(
        grid, "day_price_interp", "ship_day", ["l_suppkey"], **_STL_PARAMS
    )


def _sql_stl_decompose():
    from timeseriesutils_spark.operators.stl import stl_decompose_sql

    return stl_decompose_sql(
        f"({_SQL_INTERPOLATE})", "day_price_interp", "ship_day",
        ["l_suppkey"], **_STL_PARAMS
    )


QUERIES.update({"stl_decompose": Q(q_stl_decompose, _sql_stl_decompose())})


def q_seasonal_esd(spark, sf_dir):
    """Seasonal anomaly detection (operators/stl.seasonal_esd): robust
    iterative GESD (S-H-ESD) on the STL remainder of the regularized
    daily supplier series — up to 5 masking-aware anomaly rounds per
    series, entirely as one collect + a K-step integer fold."""
    from timeseriesutils_spark.operators.stl import seasonal_esd

    grid = regularize(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        how="interp",
    )
    return seasonal_esd(
        grid, "day_price_interp", "ship_day", ["l_suppkey"],
        **_STL_PARAMS, max_anomalies=5, thresh=3.0,
    )


def _sql_seasonal_esd():
    from timeseriesutils_spark.operators.stl import seasonal_esd_sql

    return seasonal_esd_sql(
        f"({_SQL_INTERPOLATE})", "day_price_interp", "ship_day",
        ["l_suppkey"], **_STL_PARAMS, max_anomalies=5, thresh=3.0,
    )


QUERIES.update({"seasonal_esd": Q(q_seasonal_esd, _sql_seasonal_esd())})


def q_stl_robust(spark, sf_dir):
    """Robust STL (operators/stl.stl_robust): the Cleveland outer
    iteration — bisquare robustness weights from the pass-1 remainder,
    both LOESS smoothers re-run weighted, so spikes stop polluting
    their neighbors' fits.  Same single-exchange window chain plus one
    broadcastable per-series median aggregate."""
    from timeseriesutils_spark.operators.stl import stl_robust

    grid = regularize(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        how="interp",
    )
    return stl_robust(
        grid, "day_price_interp", "ship_day", ["l_suppkey"], **_STL_PARAMS
    )


def _sql_stl_robust():
    from timeseriesutils_spark.operators.stl import stl_robust_sql

    return stl_robust_sql(
        f"({_SQL_INTERPOLATE})", "day_price_interp", "ship_day",
        ["l_suppkey"], **_STL_PARAMS
    )


QUERIES.update({"stl_robust": Q(q_stl_robust, _sql_stl_robust())})


def q_motif_discord(spark, sf_dir):
    """Motif + discord extraction per supplier series
    (operators/matrixprofile.motif_discord): the best-repeated pattern
    pair (profile minimum) and the most anomalous window (profile
    maximum) from the banded matrix profile — Yeh 2016's headline
    use-case, one aggregation over the profile's single-exchange plan."""
    from timeseriesutils_spark.operators.matrixprofile import motif_discord

    return motif_discord(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        w=8, band=20, excl=4, scale=2,
        profile=_shared_profile(spark, sf_dir),
    )


def _sql_motif_discord():
    from timeseriesutils_spark.operators.matrixprofile import motif_discord_sql

    return motif_discord_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"],
        w=8, band=20, excl=4, scale=2,
    )


QUERIES.update({"motif_discord": Q(q_motif_discord, _sql_motif_discord())})


def q_matrix_profile_chunked(spark, sf_dir):
    """Monster-series mitigation on the gate: the banded matrix
    profile computed CHUNK-PARALLEL (matrix_profile(chunk_rows=512) —
    two-sided context band/band+w−1, chunk id on the partition key)
    must hash-match the SAME oracle as the unchunked `matrix_profile`
    — the chunked_taylor precedent applied to a two-sided banded
    window reach.  chunk_rows follows the round-14 amortization rule
    for the grouped-Arrow kernel: fixed per-(group, chunk) cost, so
    the chunk must dwarf the 2·band+w context (C=64 → 3.9 s at sf0.1,
    C=512 → 1.5 s, same bit-identical rows)."""
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    return matrix_profile(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        w=8, band=20, excl=4, scale=2, chunk_rows=512,
    )


QUERIES.update(
    {"matrix_profile_chunked": Q(q_matrix_profile_chunked, _sql_matrix_profile())}
)


def q_conformal_intervals(spark, sf_dir):
    """Split-conformal next-step prediction interval per supplier
    (operators/conformal.conformal_intervals): trailing-mean point
    forecasts over the daily price series, absolute-residual
    calibration scores on every full-window row except the last, and
    the finite-sample rank quantile ceil((n+1)(1-alpha)) — the
    calibrated-interval producer the catalog's interval SCORERS
    (wis_eval, pinball_eval, calibration_curve) were missing."""
    from timeseriesutils_spark.operators.conformal import conformal_intervals

    return conformal_intervals(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        fit_window=14, alpha_num=1, alpha_den=10, scale=2,
    )


def _sql_conformal_intervals():
    from timeseriesutils_spark.operators.conformal import (
        conformal_intervals_sql,
    )

    return conformal_intervals_sql(
        f"({_SQL_DAILY})", "day_price", "ship_day", ["l_suppkey"],
        fit_window=14, alpha_num=1, alpha_den=10, scale=2,
    )


QUERIES.update(
    {"conformal_intervals": Q(q_conformal_intervals, _sql_conformal_intervals())}
)


def q_mstl_decompose(spark, sf_dir):
    """MSTL multi-seasonal decomposition (operators/stl.mstl_decompose,
    Bandara-Hyndman-Bergmeir 2021): weekly + biweekly seasonal
    components extracted by iterating the literal-weight STL machinery
    over an ascending period list on the regularized daily supplier
    series — two window sweeps on ONE partition key, the keep
    passthrough instead of a join-back, exact integer stages per pass."""
    from timeseriesutils_spark.operators.stl import mstl_decompose

    grid = regularize(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        how="interp",
    )
    return mstl_decompose(
        grid, "day_price_interp", "ship_day", ["l_suppkey"],
        periods=(7, 14), seasonal_h=3, trend_h=10, scale=2,
    )


def _sql_mstl_decompose():
    from timeseriesutils_spark.operators.stl import mstl_decompose_sql

    return mstl_decompose_sql(
        f"({_SQL_INTERPOLATE})", "day_price_interp", "ship_day",
        ["l_suppkey"], periods=(7, 14), seasonal_h=3, trend_h=10, scale=2,
    )


QUERIES.update({"mstl_decompose": Q(q_mstl_decompose, _sql_mstl_decompose())})


def q_cqr_intervals(spark, sf_dir):
    """Conformalized quantile regression (operators/conformal.
    cqr_intervals, Romano 2019): adaptive-width calibrated next-step
    intervals per supplier — trailing rank-quantile base interval,
    signed conformity scores (can shrink a conservative base), exact
    integer rank calibration.  The heteroskedastic upgrade of
    conformal_intervals."""
    from timeseriesutils_spark.operators.conformal import cqr_intervals

    return cqr_intervals(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        fit_window=20, alpha_num=1, alpha_den=10, scale=2,
    )


def _sql_cqr_intervals():
    from timeseriesutils_spark.operators.conformal import cqr_intervals_sql

    return cqr_intervals_sql(
        f"({_SQL_DAILY})", "day_price", "ship_day", ["l_suppkey"],
        fit_window=20, alpha_num=1, alpha_den=10, scale=2,
    )


QUERIES.update({"cqr_intervals": Q(q_cqr_intervals, _sql_cqr_intervals())})


def q_stl_chunked(spark, sf_dir):
    """Monster-series mitigation for the STL family on the gate:
    stl_decompose(chunk_rows=512) — two-sided context R = hs·P + P + ht
    per side, chunk id on a pinned partition key — must hash-match the
    SAME oracle as the unchunked `stl_decompose` (the
    matrix_profile_chunked precedent applied to the compound smoother
    reach; 1.8× at 2.4M rows / 25% monster, growing with series
    length).  chunk_rows follows the round-14 amortization rule: the
    grouped-Arrow kernel pays a fixed per-(group, chunk) cost, so the
    chunk must dwarf the 2R context (C=128 → 19.5K tiny groups + 59%
    row inflation, 6.6 s; C=512 → 3.0 s, same bit-identical rows)."""
    from timeseriesutils_spark.operators.stl import stl_decompose

    grid = regularize(
        _daily(spark, sf_dir), "day_price", "ship_day", ["l_suppkey"],
        how="interp",
    )
    return stl_decompose(
        grid, "day_price_interp", "ship_day", ["l_suppkey"],
        **_STL_PARAMS, chunk_rows=512,
    )


QUERIES.update({"stl_chunked": Q(q_stl_chunked, _sql_stl_decompose())})
