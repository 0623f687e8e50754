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


def best_breakpoint(
    data: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    scale: int = 2,
    min_seg: int = 2,
) -> DataFrame:
    """Single best mean-shift changepoint per group: the split k that
    minimizes SSE_left + SSE_right — the binary-segmentation primitive
    (one step of PELT/BinSeg), the answer to "WHERE did the level
    change" where :func:`cusum` answers "HAS it drifted".

    Same closed-form discipline as cusum: with prefix sums
    S1_k = Σ_{j≤k} x_j and S2_k = Σ_{j≤k} x_j² (exact quantized
    integers, DECIMAL-accumulated so squares can't wrap), each
    candidate split's cost is

        cost_k = (S2_k − S1_k²/k) + ((S2_n−S2_k) − (S1_n−S1_k)²/(n−k))

    — a fixed double tree over exact ints, evaluated for every k by one
    window pass; the argmin (ties → earliest k) is a row_number.  Whole
    thing = two window passes on one exchange, no Python, linear scan.

    ``min_seg`` bounds both segment lengths (a 1-point segment has zero
    SSE and always "wins" degenerately).

    Returns one row per group: (groups…, n, break_t, cost_best,
    cost_nosplit, gain) — ``break_t`` is the LAST time index of the
    left segment; gain = cost_nosplit − cost_best ≥ 0 is the variance
    explained by the split (rank groups by it to find real shifts).
    """
    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.filter(F.col(value_col).isNotNull()).select(
        *g, F.col(time_col).alias("_t"), q.alias("_q")
    )
    w = (
        Window.partitionBy(*g)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*g)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    p = d.select(
        *g,
        "_t",
        F.sum(dec(F.col("_q"))).over(w).alias("_s1"),
        F.sum(dec(F.col("_q") * F.col("_q"))).over(w).alias("_s2"),
        F.row_number().over(Window.partitionBy(*g).orderBy("_t")).alias("_k"),
        F.count(F.lit(1)).over(wg).alias("_n"),
        F.sum(dec(F.col("_q"))).over(wg).alias("_t1"),
        F.sum(dec(F.col("_q") * F.col("_q"))).over(wg).alias("_t2"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    kk = F.col("_k").cast("double")
    nn = F.col("_n").cast("double")
    s1, s2 = s2d("_s1"), s2d("_s2")
    t1, t2 = s2d("_t1"), s2d("_t2")
    sse_l = s2 - s1 * s1 / kk
    sse_r = (t2 - s2) - (t1 - s1) * (t1 - s1) / (nn - kk)
    cost = sse_l + sse_r
    cost_nosplit = t2 - t1 * t1 / nn
    cand = p.filter(
        (F.col("_k") >= min_seg) & (F.col("_k") <= F.col("_n") - min_seg)
    ).select(
        *g,
        "_t",
        "_n",
        cost.alias("_cost"),
        cost_nosplit.alias("_cns"),
    )
    rw = Window.partitionBy(*g).orderBy(F.col("_cost").asc(), F.col("_t").asc())
    mf2 = float(m * m)
    return (
        cand.withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") == 1)
        .select(
            *g,
            F.col("_n").alias("n"),
            F.col("_t").alias("break_t"),
            (F.col("_cost") / F.lit(mf2)).alias("cost_best"),
            (F.col("_cns") / F.lit(mf2)).alias("cost_nosplit"),
            ((F.col("_cns") - F.col("_cost")) / F.lit(mf2)).alias("gain"),
        )
    )


def best_breakpoint_sql(
    data_sql: str,
    value_col: str,
    time_col: str,
    group_columns,
    scale: int = 2,
    min_seg: int = 2,
) -> str:
    """DuckDB twin of :func:`best_breakpoint`; ``data_sql`` produces
    (groups…, time_col, value_col)."""
    from timeseriesutils_spark.functions.exact import dlit

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    over = (
        f"(PARTITION BY {gsel} ORDER BY _t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    og = f"(PARTITION BY {gsel})"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    kk = "CAST(_k AS DOUBLE)"
    nn = "CAST(_n AS DOUBLE)"
    s1, s2 = s2d("_s1"), s2d("_s2")
    t1, t2 = s2d("_t1"), s2d("_t2")
    sse_l = f"({s2} - {s1} * {s1} / {kk})"
    sse_r = f"(({t2} - {s2}) - ({t1} - {s1}) * ({t1} - {s1}) / ({nn} - {kk}))"
    cost = f"({sse_l} + {sse_r})"
    cns = f"({t2} - {t1} * {t1} / {nn})"
    return f"""
WITH d AS (
  SELECT {gsel}, {time_col} AS _t,
    CAST(FLOOR({value_col} * {m} + 0.5) AS BIGINT) AS _q
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
),
p AS (
  SELECT {gsel}, _t,
    SUM(CAST(_q AS DECIMAL(38,0))) OVER {over} AS _s1,
    SUM(CAST(_q * _q AS DECIMAL(38,0))) OVER {over} AS _s2,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _t) AS _k,
    COUNT(*) OVER {og} AS _n,
    SUM(CAST(_q AS DECIMAL(38,0))) OVER {og} AS _t1,
    SUM(CAST(_q * _q AS DECIMAL(38,0))) OVER {og} AS _t2
  FROM d
),
cand AS (
  SELECT {gsel}, _t, _n, {cost} AS _cost, {cns} AS _cns
  FROM p WHERE _k >= {min_seg} AND _k <= _n - {min_seg}
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {gsel}
        ORDER BY _cost ASC, _t ASC) AS _rn
  FROM cand
)
SELECT {gsel}, CAST(_n AS BIGINT) AS n, _t AS break_t,
  _cost / {dlit(float(m * m))} AS cost_best,
  _cns / {dlit(float(m * m))} AS cost_nosplit,
  (_cns - _cost) / {dlit(float(m * m))} AS gain
FROM r WHERE _rn = 1
"""


# --------------------------------------------------------------------------
# Page–Hinkley drift test
# --------------------------------------------------------------------------


def page_hinkley(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    delta: float = 0.0,
    lam: float = 50.0,
    scale: int = 2,
) -> DataFrame:
    """Page–Hinkley mean-INCREASE drift detector per group — the
    self-baselining cousin of the CUSUM above: where CUSUM tests
    against a FIXED target k, PH tracks deviation from the series' own
    RUNNING mean, so it needs no in-control calibration (the standard
    concept-drift monitor in streaming-ML land):

        U_t  = Σ_{i≤t} (x_i − x̄_i − δ),   x̄_i = running mean
        PH_t = U_t − min_{s≤t} U_s,        alarm when PH_t > λ

    Three ordered window passes sharing one partitioning (running
    int sum/count for x̄, then cumsum of the quantized deviation, then
    the running min) — single exchange, whole-stage codegen.

    Exactness: x quantizes to 10^-scale ints; x̄_i is one double
    division of exact ints; the per-row deviation term is floor-
    quantized to 10⁻⁶ value units so U and the running min are exact
    integers and the λ comparison is integer-exact.

    Returns one row per input row: (groups…, order…, value, ph,
    alarm).
    """
    g = _as_list(group_columns)
    order = _as_list(order_by)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    wcum = (
        Window.partitionBy(*g)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.filter(F.col(value_col).isNotNull()).select(
        *g, *order, F.col(value_col).alias("value"), q.alias("_q")
    )
    xbar = F.sum("_q").over(wcum).cast("double") / (
        F.count(F.lit(1)).over(wcum).cast("double") * F.lit(float(m))
    )
    term = (
        F.col("_q").cast("double") / F.lit(float(m)) - xbar - F.lit(float(delta))
    )
    tq = F.floor(term * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    staged = d.select(*g, *order, "value", tq.alias("_tq"))
    u = F.sum("_tq").over(wcum)
    staged2 = staged.select(*g, *order, "value", u.alias("_u"))
    umin = F.min("_u").over(wcum)
    lam_q = int(round(float(lam) * 1e6))
    ph_q = F.col("_u") - umin
    out = staged2.select(
        *g,
        *order,
        "value",
        ph_q.alias("_phq"),
    )
    return out.select(
        *g,
        *order,
        "value",
        (F.col("_phq").cast("double") / F.lit(1e6)).alias("ph"),
        (F.col("_phq") > F.lit(lam_q)).alias("alarm"),
    )


def page_hinkley_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    order_by,
    delta: float = 0.0,
    lam: float = 50.0,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`page_hinkley`."""
    from timeseriesutils_spark.functions.exact import dlit

    g = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(g)
    osel = ", ".join(order)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    wcum = (
        f"(PARTITION BY {gsel} ORDER BY {osel} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    xbar = (
        f"(CAST(CAST(SUM(_q) OVER {wcum} AS BIGINT) AS DOUBLE)"
        f" / (CAST(COUNT(*) OVER {wcum} AS DOUBLE) * {dlit(float(m))}))"
    )
    term = (
        f"(CAST(_q AS DOUBLE) / {dlit(float(m))} - {xbar}"
        f" - {dlit(float(delta))})"
    )
    lam_q = int(round(float(lam) * 1e6))
    return f"""
WITH d AS (
  SELECT {gsel}, {osel}, {value_col} AS value, {qq} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
staged AS (
  SELECT {gsel}, {osel}, value,
    CAST(FLOOR({term} * 1e6 + 0.5) AS BIGINT) AS _tq
  FROM d
),
staged2 AS (
  SELECT {gsel}, {osel}, value,
    CAST(SUM(_tq) OVER {wcum} AS BIGINT) AS _u
  FROM staged
),
phq AS (
  SELECT {gsel}, {osel}, value,
    _u - CAST(MIN(_u) OVER {wcum} AS BIGINT) AS _phq
  FROM staged2
)
SELECT {gsel}, {osel}, value,
  CAST(_phq AS DOUBLE) / 1e6 AS ph,
  _phq > {lam_q} AS alarm
FROM phq
"""


def binseg_breakpoints(
    data: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    scale: int = 2,
    min_seg: int = 2,
) -> DataFrame:
    """Two-level binary segmentation per group (Scott & Knott 1974 /
    the BinSeg scheme, public): :func:`best_breakpoint` finds THE
    split; this recurses once — re-running the same exact closed form
    on each half — yielding up to three ranked mean-shift breakpoints
    (the common "regime outline" ask; deeper recursion is the same
    composition again).

    Plan: level 1 is one window pass; its one-row-per-group result
    broadcasts back onto the data to label halves, and level 2 is the
    SAME window pass with the half-label appended to the keys — two
    exchanges total, no iteration driver loop, exact arithmetic
    throughout.  Groups (or halves) shorter than 2·min_seg simply
    produce no row at that level.

    Returns (groups…, level, segment, n, break_t, cost_best,
    cost_nosplit, gain) — segment '*' for level 1, 'L'/'R' for the
    level-2 halves; rank by gain to decide which splits are real.
    """
    from timeseriesutils_spark.functions.cache import pin

    g = _as_list(group_columns)
    # pinned (round-14): `data` feeds level 1 AND the level-2 half
    # labeling — without the pin the upstream (aggregation + exchange
    # for the daily series in the catalog query) executes twice
    data = pin(data)
    b1 = best_breakpoint(data, value_col, time_col, g, scale, min_seg)
    seg = data.join(
        F.broadcast(b1.select(*g, F.col("break_t").alias("_bt"))), on=g
    ).withColumn(
        "_seg",
        F.when(F.col(time_col) <= F.col("_bt"), F.lit("L")).otherwise(
            F.lit("R")
        ),
    )
    b2 = best_breakpoint(
        seg, value_col, time_col, [*g, "_seg"], scale, min_seg
    )
    lvl1 = b1.select(
        *g,
        F.lit(1).alias("level"),
        F.lit("*").alias("segment"),
        "n", "break_t", "cost_best", "cost_nosplit", "gain",
    )
    lvl2 = b2.select(
        *g,
        F.lit(2).alias("level"),
        F.col("_seg").alias("segment"),
        "n", "break_t", "cost_best", "cost_nosplit", "gain",
    )
    return lvl1.unionByName(lvl2)


def binseg_breakpoints_sql(
    data_sql: str,
    value_col: str,
    time_col: str,
    group_columns,
    scale: int = 2,
    min_seg: int = 2,
) -> str:
    """DuckDB twin of :func:`binseg_breakpoints` — the
    best_breakpoint_sql body nested per level (outer CTEs are in scope
    inside a CTE's own WITH, so level 2 reads the labeled halves)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    b1 = best_breakpoint_sql(
        data_sql, value_col, time_col, g, scale, min_seg
    )
    b2 = best_breakpoint_sql(
        "SELECT * FROM seg", value_col, time_col, [*g, "_seg"], scale,
        min_seg,
    )
    return f"""
WITH b1 AS ({b1}),
seg AS (
  SELECT d.*, CASE WHEN d.{time_col} <= b1.break_t
    THEN 'L' ELSE 'R' END AS _seg
  FROM ({data_sql}) d JOIN b1 USING ({gsel})
),
b2 AS ({b2})
SELECT {gsel}, 1 AS level, '*' AS segment,
  n, break_t, cost_best, cost_nosplit, gain FROM b1
UNION ALL
SELECT {gsel}, 2 AS level, _seg AS segment,
  n, break_t, cost_best, cost_nosplit, gain FROM b2
"""
