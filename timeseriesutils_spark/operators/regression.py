"""Grouped multivariate (two-feature) OLS via closed-form normal
equations — the distributed regression primitive: per-group
β = (XᵀX)⁻¹Xᵀy with intercept, solved by 2×2 determinant formulas from
ONE aggregation pass of sufficient statistics.

This extends ``group_trend`` (operators/forecast.py, single feature) to
the multi-feature case the reference domain needs for covariate
adjustment (price ~ quantity + discount per flag, demand ~ trend +
promo, …).  No iteration, no driver linear algebra: the nine
sufficient statistics (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y,
Σy²) are map-combinable aggregates, and the solve is a row-local
expression on the one-row-per-group result.

Exactness: inputs are quantized to integer units (floor(v·10^s + 0.5),
the shared rounding), per-row products are exact int64, and sums
accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so they cannot
wrap at any scale (ADVICE r3: int64 Σx² wraps first at ~1e18 — a
billion rows of 5-digit quantized values).  The determinant arithmetic
then runs in double on identical integers with an identical expression
tree — bit-equal across engines.  Collinear groups (det = 0) and
zero-variance targets yield NULL coefficients instead of ±inf.

Scale shape: one partial-aggregated exchange on the group key; the
solve stage touches |groups| rows.  The same shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def grouped_ols2(
    data: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group OLS of ``y ~ b0 + b1·x1 + b2·x2``.

    Returns (groups…, n, b0, b1, b2, r2).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = lambda c: F.floor(F.col(c) * F.lit(m) + F.lit(0.5)).cast("bigint")  # noqa: E731
    # complete-case: n must count exactly the rows the sums see, else a
    # NULL in any regressor deflates the normal equations (ADVICE r4)
    d = data.filter(
        F.col(y_col).isNotNull()
        & F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
    ).select(
        *groups,
        q(x1_col).alias("_x1"),
        q(x2_col).alias("_x2"),
        q(y_col).alias("_y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_x1"))).alias("_s1"),
        F.sum(dec(F.col("_x2"))).alias("_s2"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x1") * F.col("_x1"))).alias("_s11"),
        F.sum(dec(F.col("_x2") * F.col("_x2"))).alias("_s22"),
        F.sum(dec(F.col("_x1") * F.col("_x2"))).alias("_s12"),
        F.sum(dec(F.col("_x1") * F.col("_y"))).alias("_s1y"),
        F.sum(dec(F.col("_x2") * F.col("_y"))).alias("_s2y"),
        F.sum(dec(F.col("_y") * F.col("_y"))).alias("_syy"),
    )
    # back to original units, double, identical expression tree as the twin
    m1 = float(m)
    m2 = float(m * m)
    nn = F.col("n").cast("double")
    s1 = F.col("_s1").cast("double") / m1
    s2 = F.col("_s2").cast("double") / m1
    sy = F.col("_sy").cast("double") / m1
    s11 = F.col("_s11").cast("double") / m2
    s22 = F.col("_s22").cast("double") / m2
    s12 = F.col("_s12").cast("double") / m2
    s1y = F.col("_s1y").cast("double") / m2
    s2y = F.col("_s2y").cast("double") / m2
    syy = F.col("_syy").cast("double") / m2
    a11 = nn * s11 - s1 * s1
    a12 = nn * s12 - s1 * s2
    a22 = nn * s22 - s2 * s2
    b1v = nn * s1y - s1 * sy
    b2v = nn * s2y - s2 * sy
    det = a11 * a22 - a12 * a12
    b1 = F.when(det != 0, (a22 * b1v - a12 * b2v) / det)
    b2 = F.when(det != 0, (a11 * b2v - a12 * b1v) / det)
    ssy = nn * syy - sy * sy
    r2 = F.when((det != 0) & (ssy != 0), (b1 * b1v + b2 * b2v) / ssy)
    return agg.select(
        *groups,
        "n",
        F.when(det != 0, (sy - b1 * s1 - b2 * s2) / nn).alias("b0"),
        b1.alias("b1"),
        b2.alias("b2"),
        r2.alias("r2"),
    )


def grouped_ols2_sql(
    table: str,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`grouped_ols2`."""
    groups = _as_list(group_columns)
    g = ", ".join(groups)
    m = 10**scale
    m2 = m * m
    qq = lambda c: f"CAST(FLOOR({c} * {m} + 0.5) AS BIGINT)"  # noqa: E731
    return f"""
WITH q AS (
  SELECT {g}, {qq(x1_col)} AS _x1, {qq(x2_col)} AS _x2, {qq(y_col)} AS _y
  FROM {table}
  WHERE {y_col} IS NOT NULL AND {x1_col} IS NOT NULL
    AND {x2_col} IS NOT NULL
),
agg AS (
  SELECT {g}, COUNT(*) AS n,
    SUM(_x1) AS _s1, SUM(_x2) AS _s2, SUM(_y) AS _sy,
    SUM(_x1 * _x1) AS _s11, SUM(_x2 * _x2) AS _s22, SUM(_x1 * _x2) AS _s12,
    SUM(_x1 * _y) AS _s1y, SUM(_x2 * _y) AS _s2y, SUM(_y * _y) AS _syy
  FROM q GROUP BY {g}
),
u AS (
  SELECT {g}, n,
    CAST(n AS DOUBLE) AS nn,
    CAST(_s1 AS DOUBLE) / {float(m)!r} AS s1,
    CAST(_s2 AS DOUBLE) / {float(m)!r} AS s2,
    CAST(_sy AS DOUBLE) / {float(m)!r} AS sy,
    CAST(_s11 AS DOUBLE) / {float(m2)!r} AS s11,
    CAST(_s22 AS DOUBLE) / {float(m2)!r} AS s22,
    CAST(_s12 AS DOUBLE) / {float(m2)!r} AS s12,
    CAST(_s1y AS DOUBLE) / {float(m2)!r} AS s1y,
    CAST(_s2y AS DOUBLE) / {float(m2)!r} AS s2y,
    CAST(_syy AS DOUBLE) / {float(m2)!r} AS syy
  FROM agg
),
k AS (
  SELECT {g}, n, nn, s1, s2, sy,
    nn * s11 - s1 * s1 AS a11,
    nn * s12 - s1 * s2 AS a12,
    nn * s22 - s2 * s2 AS a22,
    nn * s1y - s1 * sy AS b1v,
    nn * s2y - s2 * sy AS b2v,
    nn * syy - sy * sy AS ssy
  FROM u
),
sol AS (
  SELECT {g}, n, nn, s1, s2, sy, b1v, b2v, ssy,
    a11 * a22 - a12 * a12 AS det,
    CASE WHEN a11 * a22 - a12 * a12 <> 0
         THEN (a22 * b1v - a12 * b2v) / (a11 * a22 - a12 * a12) END AS b1,
    CASE WHEN a11 * a22 - a12 * a12 <> 0
         THEN (a11 * b2v - a12 * b1v) / (a11 * a22 - a12 * a12) END AS b2
  FROM k
)
SELECT {g}, n,
  CASE WHEN det <> 0 THEN (sy - b1 * s1 - b2 * s2) / nn END AS b0,
  b1, b2,
  CASE WHEN det <> 0 AND ssy <> 0 THEN (b1 * b1v + b2 * b2v) / ssy END AS r2
FROM sol
"""


def mahalanobis_outliers(
    data: DataFrame,
    x1_col: str,
    x2_col: str,
    group_columns,
    id_cols: list[str],
    threshold: float = 13.815510557964274,  # chi2(2).isf(1e-3)
    scale: int = 2,
) -> DataFrame:
    """Bivariate Mahalanobis outlier detection per group: score each row
    by D² = (x − μ)ᵀ Σ⁻¹ (x − μ) against the group's own covariance and
    keep rows with D² > ``threshold`` (default: χ²₂ at the 1e-3 tail).
    Univariate z-scores miss exactly the points this catches — values
    plausible per-axis but far off the correlation ridge (a 50-unit
    order at a 1-unit price when quantity and price move together).

    Two passes over the facts: one map-combinable sufficient-statistics
    aggregation per group (the :func:`grouped_ols2` pattern — quantized
    int64 products in DECIMAL(38,0)), broadcast-joined back for a
    row-local score — the fact table is never shuffled.  The 2×2
    inverse is closed-form; all doubles derive from exact integers with
    one shared expression tree, so scores are bit-identical across
    engines and the survivor set is stable.  Degenerate groups
    (singular Σ) emit no rows.

    Returns (groups…, id_cols…, x1, x2, d2).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = lambda c: F.floor(F.col(c) * F.lit(m) + F.lit(0.5)).cast("bigint")  # noqa: E731
    # complete-case: rows with a NULL coordinate can be neither scored
    # nor counted into the covariance (ADVICE r4)
    d = data.filter(
        F.col(x1_col).isNotNull() & F.col(x2_col).isNotNull()
    ).select(
        *groups, *id_cols,
        F.col(x1_col).alias("_x1r"), F.col(x2_col).alias("_x2r"),
        q(x1_col).alias("_x1"), q(x2_col).alias("_x2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(F.col("_x1"))).alias("_s1"),
        F.sum(dec(F.col("_x2"))).alias("_s2"),
        F.sum(dec(F.col("_x1") * F.col("_x1"))).alias("_s11"),
        F.sum(dec(F.col("_x2") * F.col("_x2"))).alias("_s22"),
        F.sum(dec(F.col("_x1") * F.col("_x2"))).alias("_s12"),
    )
    nn = F.col("_n").cast("double")
    m1, m2 = float(m), float(m * m)
    mu1 = F.col("_s1").cast("double") / m1 / nn
    mu2 = F.col("_s2").cast("double") / m1 / nn
    # population covariance entries from raw sums (original units)
    c11 = F.col("_s11").cast("double") / m2 / nn - mu1 * mu1
    c22 = F.col("_s22").cast("double") / m2 / nn - mu2 * mu2
    c12 = F.col("_s12").cast("double") / m2 / nn - mu1 * mu2
    det = c11 * c22 - c12 * c12
    st = stats.select(
        *groups,
        mu1.alias("_mu1"), mu2.alias("_mu2"),
        c11.alias("_c11"), c22.alias("_c22"), c12.alias("_c12"),
        det.alias("_det"),
    ).filter(F.col("_det") != 0)
    j = d.join(F.broadcast(st), on=groups)
    dx1 = (F.col("_x1").cast("double") / m1) - F.col("_mu1")
    dx2 = (F.col("_x2").cast("double") / m1) - F.col("_mu2")
    d2 = (
        F.col("_c22") * dx1 * dx1
        - 2 * F.col("_c12") * dx1 * dx2
        + F.col("_c11") * dx2 * dx2
    ) / F.col("_det")
    return (
        j.withColumn("d2", d2)
        .filter(F.col("d2") > F.lit(threshold))
        .select(
            *groups, *id_cols,
            F.col("_x1r").alias(x1_col), F.col("_x2r").alias(x2_col), "d2",
        )
    )


def mahalanobis_outliers_sql(
    table: str,
    x1_col: str,
    x2_col: str,
    group_columns,
    id_cols: list[str],
    threshold: float = 13.815510557964274,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`mahalanobis_outliers`."""
    groups = _as_list(group_columns)
    g = ", ".join(groups)
    ids = ", ".join(id_cols)
    m = 10**scale
    m1, m2 = float(m), float(m * m)
    qq = lambda c: f"CAST(FLOOR({c} * {m} + 0.5) AS BIGINT)"  # noqa: E731
    return f"""
WITH d AS (
  SELECT {g}, {ids}, {x1_col} AS _x1r, {x2_col} AS _x2r,
    {qq(x1_col)} AS _x1, {qq(x2_col)} AS _x2
  FROM {table}
  WHERE {x1_col} IS NOT NULL AND {x2_col} IS NOT NULL
),
agg AS (
  SELECT {g}, COUNT(*) AS _n,
    SUM(_x1) AS _s1, SUM(_x2) AS _s2,
    SUM(_x1 * _x1) AS _s11, SUM(_x2 * _x2) AS _s22, SUM(_x1 * _x2) AS _s12
  FROM d GROUP BY {g}
),
st AS (
  SELECT {g},
    CAST(_s1 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE) AS _mu1,
    CAST(_s2 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE) AS _mu2,
    CAST(_s11 AS DOUBLE) / {m2!r} / CAST(_n AS DOUBLE)
      - CAST(_s1 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE)
        * (CAST(_s1 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE)) AS _c11,
    CAST(_s22 AS DOUBLE) / {m2!r} / CAST(_n AS DOUBLE)
      - CAST(_s2 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE)
        * (CAST(_s2 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE)) AS _c22,
    CAST(_s12 AS DOUBLE) / {m2!r} / CAST(_n AS DOUBLE)
      - CAST(_s1 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE)
        * (CAST(_s2 AS DOUBLE) / {m1!r} / CAST(_n AS DOUBLE)) AS _c12
  FROM agg
),
ok AS (
  SELECT *, _c11 * _c22 - _c12 * _c12 AS _det FROM st
  WHERE _c11 * _c22 - _c12 * _c12 <> 0
),
sc AS (
  SELECT d.*, ok._mu1, ok._mu2, ok._c11, ok._c22, ok._c12, ok._det,
    (ok._c22 * (CAST(d._x1 AS DOUBLE) / {m1!r} - ok._mu1)
       * (CAST(d._x1 AS DOUBLE) / {m1!r} - ok._mu1)
     - 2 * ok._c12 * (CAST(d._x1 AS DOUBLE) / {m1!r} - ok._mu1)
       * (CAST(d._x2 AS DOUBLE) / {m1!r} - ok._mu2)
     + ok._c11 * (CAST(d._x2 AS DOUBLE) / {m1!r} - ok._mu2)
       * (CAST(d._x2 AS DOUBLE) / {m1!r} - ok._mu2)) / ok._det AS d2
  FROM d JOIN ok USING ({g})
)
SELECT {g}, {ids}, _x1r AS {x1_col}, _x2r AS {x2_col}, d2
FROM sc WHERE d2 > {threshold!r}
"""


def theilsen_slope(
    data: DataFrame,
    y_col: str,
    t_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Theil–Sen robust trend: slope = median of all pairwise
    slopes (y_j − y_i)/(t_j − t_i) over t_i < t_j, intercept = median of
    the residuals y_i − slope·t_i.  Breakdown point ~29% — the trend
    estimate OLS can't give when a chunk of the series is corrupted
    (reporting artifacts, backfills — the reference domain's reality).

    Exactness: y is quantized to integer units; each pairwise slope is
    one double division of exact int64 differences; medians use the
    engine-pinned sorted-array lerp (series_math._lerp_sorted), so both
    stages are bit-identical across engines.

    Scale shape: the pair stage is an explicit self-join — O(n²/2) rows
    per group, the textbook estimator.  It is the right tool for the
    aggregated series it targets (weekly/daily rollups: n ≈ 10²–10³ →
    ≤ ~10⁶ pairs per group, one co-partitioned join + one groupBy).  For
    monster raw series, aggregate first (the declared query does) or
    sample pairs; the repeated-median variant is a different estimator,
    not a drop-in.

    Returns (groups…, n_obs, n_pairs, slope, intercept).
    """
    from timeseriesutils_spark.operators.series_math import _lerp_sorted

    g = _as_list(group_columns)
    m = 10**scale
    qy = F.floor(F.col(y_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.filter(
        F.col(y_col).isNotNull() & F.col(t_col).isNotNull()
    ).select(*g, F.col(t_col).cast("bigint").alias("_t"), qy.alias("_qy"))
    a = d.select(*g, F.col("_t").alias("_t1"), F.col("_qy").alias("_q1"))
    b = d.select(*g, F.col("_t").alias("_t2"), F.col("_qy").alias("_q2"))
    pairs = a.join(b, on=g).filter(F.col("_t1") < F.col("_t2"))
    slope_pair = (
        (F.col("_q2") - F.col("_q1")).cast("double")
        / (F.col("_t2") - F.col("_t1")).cast("double")
        / F.lit(float(m))
    )
    sl = (
        pairs.select(*g, slope_pair.alias("_s"))
        .groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sort_array(F.collect_list("_s")).alias("_arr"),
        )
        .select(*g, "n_pairs", _lerp_sorted(F.col("_arr"), 0.5).alias("slope"))
    )
    resid = (
        d.join(sl, on=g)
        .select(
            *g,
            "n_pairs",
            "slope",
            (
                F.col("_qy").cast("double") / F.lit(float(m))
                - F.col("slope") * F.col("_t").cast("double")
            ).alias("_r"),
        )
        .groupBy(*g, "n_pairs", "slope")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sort_array(F.collect_list("_r")).alias("_rarr"),
        )
    )
    return resid.select(
        *g,
        "n_obs",
        "n_pairs",
        "slope",
        _lerp_sorted(F.col("_rarr"), 0.5).alias("intercept"),
    )


def theilsen_slope_sql(
    data_sql: str,
    y_col: str,
    t_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`theilsen_slope`; ``data_sql`` is a SELECT
    producing (groups…, t_col, y_col)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.series_math import _lerp_sorted_sql

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    med_s = _lerp_sorted_sql("_arr", 0.5)
    med_r = _lerp_sorted_sql("_rarr", 0.5)
    return f"""
WITH d AS (
  SELECT {gsel}, CAST({t_col} AS BIGINT) AS _t,
    CAST(FLOOR({y_col} * {m} + 0.5) AS BIGINT) AS _qy
  FROM ({data_sql})
  WHERE {y_col} IS NOT NULL AND {t_col} IS NOT NULL
),
pairs AS (
  SELECT {', '.join('a.' + c for c in g)},
    CAST(b._qy - a._qy AS DOUBLE) / CAST(b._t - a._t AS DOUBLE)
      / {dlit(float(m))} AS _s
  FROM d a JOIN d b USING ({gsel})
  WHERE a._t < b._t
),
sl AS (
  SELECT {gsel}, COUNT(*) AS n_pairs, list_sort(list(_s)) AS _arr
  FROM pairs GROUP BY {gsel}
),
sl2 AS (SELECT {gsel}, n_pairs, {med_s} AS slope FROM sl),
resid AS (
  SELECT {', '.join('d.' + c for c in g)}, n_pairs, slope,
    CAST(d._qy AS DOUBLE) / {dlit(float(m))} - slope * CAST(d._t AS DOUBLE) AS _r
  FROM d JOIN sl2 USING ({gsel})
),
ragg AS (
  SELECT {gsel}, n_pairs, slope, COUNT(*) AS n_obs,
    list_sort(list(_r)) AS _rarr
  FROM resid GROUP BY {gsel}, n_pairs, slope
)
SELECT {gsel}, n_obs, n_pairs, slope, {med_r} AS intercept
FROM ragg
"""


def granger_lag_test(
    data: DataFrame,
    y_col: str,
    x_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Per-group one-lag Granger-style predictability test: does
    yesterday's x help predict today's y beyond yesterday's y?

    Nested OLS F-test from ONE sufficient-statistics pass:

        restricted    y_t ~ b0 + a·y_{t-1}
        unrestricted  y_t ~ b0 + b1·y_{t-1} + b2·x_{t-1}

        F = (R²_u − R²_r) · (n − 3) / (1 − R²_u),  df = (1, n − 3)

    Both models share the same normal-equation statistics (x1 = lag y,
    x2 = lag x — the :func:`grouped_ols2` aggregate), so the whole
    test is one window pass (the lags), one map-combinable aggregation
    on the group key, and a row-local closed-form solve — no second
    regression pass, no driver linear algebra.  This is the classic
    lag-1 bivariate Granger setup (Granger 1969); p-values need an
    F-CDF and are left to the caller (the F statistic and dfs are
    returned).

    Exactness: the grouped_ols2 discipline — complete-case lag triples,
    quantized int64 units, DECIMAL(38,0) sums, one shared double
    expression tree.  Degenerate groups (singular unrestricted system,
    zero residual variance, n ≤ 3) yield NULL f_stat.

    Returns (groups…, n, b_lagy, b_lagx, r2_u, r2_r, f_stat).
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    from pyspark.sql import Window

    w = Window.partitionBy(*groups).orderBy(*order)
    m = 10**scale
    q = lambda c: F.floor(F.col(c) * F.lit(m) + F.lit(0.5)).cast("bigint")  # noqa: E731
    lagged = data.select(
        *groups,
        q(y_col).alias("_yq"),
        F.lag(q(y_col), 1).over(w).alias("_x1"),
        F.lag(q(x_col), 1).over(w).alias("_x2"),
    ).filter(
        F.col("_yq").isNotNull()
        & F.col("_x1").isNotNull()
        & F.col("_x2").isNotNull()
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = lagged.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_x1"))).alias("_s1"),
        F.sum(dec(F.col("_x2"))).alias("_s2"),
        F.sum(dec(F.col("_yq"))).alias("_sy"),
        F.sum(dec(F.col("_x1")) * dec(F.col("_x1"))).alias("_s11"),
        F.sum(dec(F.col("_x2")) * dec(F.col("_x2"))).alias("_s22"),
        F.sum(dec(F.col("_x1")) * dec(F.col("_x2"))).alias("_s12"),
        F.sum(dec(F.col("_x1")) * dec(F.col("_yq"))).alias("_s1y"),
        F.sum(dec(F.col("_x2")) * dec(F.col("_yq"))).alias("_s2y"),
        F.sum(dec(F.col("_yq")) * dec(F.col("_yq"))).alias("_syy"),
    )
    nn = F.col("n").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a11 = nn * d("_s11") - d("_s1") * d("_s1")
    a12 = nn * d("_s12") - d("_s1") * d("_s2")
    a22 = nn * d("_s22") - d("_s2") * d("_s2")
    b1v = nn * d("_s1y") - d("_s1") * d("_sy")
    b2v = nn * d("_s2y") - d("_s2") * d("_sy")
    ssy = nn * d("_syy") - d("_sy") * d("_sy")
    det = a11 * a22 - a12 * a12
    b1 = (a22 * b1v - a12 * b2v) / det
    b2 = (a11 * b2v - a12 * b1v) / det
    expl_u = b1 * b1v + b2 * b2v
    expl_r = b1v * b1v / a11
    r2_u = expl_u / ssy
    r2_r = expl_r / ssy
    ok = (det != 0) & (a11 != 0) & (ssy > 0) & (F.col("n") > 3)
    f_stat = F.when(
        ok & ((ssy - expl_u) > 0),
        (expl_u - expl_r) * (nn - F.lit(3.0)) / (ssy - expl_u),
    )
    return agg.select(
        *groups,
        "n",
        F.when(ok, b1).alias("b_lagy"),
        F.when(ok, b2).alias("b_lagx"),
        F.when(ok, r2_u).alias("r2_u"),
        F.when(ok, r2_r).alias("r2_r"),
        f_stat.alias("f_stat"),
    )


def granger_lag_test_sql(
    data_sql: str,
    y_col: str,
    x_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`granger_lag_test`; ``data_sql`` is a
    SELECT producing (groups…, order…, y, x)."""
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    over = f"(PARTITION BY {gsel} ORDER BY {', '.join(order)})"
    m = 10**scale
    qq = lambda c: f"CAST(FLOOR({c} * {m} + 0.5) AS BIGINT)"  # noqa: E731
    # HUGEINT sums of squared quantized values exceed 2^53 → VARCHAR-
    # route every sum cast so both engines round-to-nearest
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH lagged AS (
  SELECT {gsel}, _yq, _x1, _x2 FROM (
    SELECT {gsel}, {qq(y_col)} AS _yq,
      LAG({qq(y_col)}, 1) OVER {over} AS _x1,
      LAG({qq(x_col)}, 1) OVER {over} AS _x2
    FROM ({data_sql})
  ) WHERE _yq IS NOT NULL AND _x1 IS NOT NULL AND _x2 IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_x1 AS HUGEINT)) AS _s1, SUM(CAST(_x2 AS HUGEINT)) AS _s2,
    SUM(CAST(_yq AS HUGEINT)) AS _sy,
    SUM(CAST(_x1 AS HUGEINT) * CAST(_x1 AS HUGEINT)) AS _s11,
    SUM(CAST(_x2 AS HUGEINT) * CAST(_x2 AS HUGEINT)) AS _s22,
    SUM(CAST(_x1 AS HUGEINT) * CAST(_x2 AS HUGEINT)) AS _s12,
    SUM(CAST(_x1 AS HUGEINT) * CAST(_yq AS HUGEINT)) AS _s1y,
    SUM(CAST(_x2 AS HUGEINT) * CAST(_yq AS HUGEINT)) AS _s2y,
    SUM(CAST(_yq AS HUGEINT) * CAST(_yq AS HUGEINT)) AS _syy
  FROM lagged GROUP BY {gsel}
),
k AS (
  SELECT {gsel}, n, CAST(n AS DOUBLE) AS nn,
    CAST(n AS DOUBLE) * {s2d('_s11')} - {s2d('_s1')} * {s2d('_s1')} AS a11,
    CAST(n AS DOUBLE) * {s2d('_s12')} - {s2d('_s1')} * {s2d('_s2')} AS a12,
    CAST(n AS DOUBLE) * {s2d('_s22')} - {s2d('_s2')} * {s2d('_s2')} AS a22,
    CAST(n AS DOUBLE) * {s2d('_s1y')} - {s2d('_s1')} * {s2d('_sy')} AS b1v,
    CAST(n AS DOUBLE) * {s2d('_s2y')} - {s2d('_s2')} * {s2d('_sy')} AS b2v,
    CAST(n AS DOUBLE) * {s2d('_syy')} - {s2d('_sy')} * {s2d('_sy')} AS ssy
  FROM agg
),
sol AS (
  SELECT {gsel}, n, nn, a11, ssy, b1v, b2v,
    a11 * a22 - a12 * a12 AS det,
    (a22 * b1v - a12 * b2v) / (a11 * a22 - a12 * a12) AS b1,
    (a11 * b2v - a12 * b1v) / (a11 * a22 - a12 * a12) AS b2
  FROM k
),
fin AS (
  SELECT {gsel}, n, nn, a11, ssy, b1v, b2v, det, b1, b2,
    b1 * b1v + b2 * b2v AS expl_u,
    b1v * b1v / a11 AS expl_r,
    (det <> 0 AND a11 <> 0 AND ssy > 0 AND n > 3) AS ok
  FROM sol
)
SELECT {gsel}, n,
  CASE WHEN ok THEN b1 END AS b_lagy,
  CASE WHEN ok THEN b2 END AS b_lagx,
  CASE WHEN ok THEN expl_u / ssy END AS r2_u,
  CASE WHEN ok THEN expl_r / ssy END AS r2_r,
  CASE WHEN ok AND (ssy - expl_u) > 0
       THEN (expl_u - expl_r) * (nn - 3.0) / (ssy - expl_u) END AS f_stat
FROM fin
"""


def adf_test(
    data: DataFrame,
    y_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Per-group augmented Dickey–Fuller unit-root test (lag order 1,
    constant, no trend):

        Δy_t = α + ρ·y_{t-1} + φ·Δy_{t-1} + ε,   t_ρ = ρ̂ / se(ρ̂)

    A strongly negative t_ρ rejects the unit root (series is
    mean-reverting / stationary); t_ρ near 0 means differencing is
    needed before modeling — THE pre-flight check of classical
    forecasting.  ``stationary_5pct`` compares t_ρ against the
    constant-only MacKinnon 5% critical value (−2.86, n→∞ asymptote,
    the textbook table entry).

    Same execution shape as :func:`granger_lag_test` — one lag window
    pass, ONE sufficient-statistics aggregation (x1 = y_{t-1},
    x2 = Δy_{t-1}, target Δy_t), closed-form 2×2 solve plus
    se(ρ̂)² = RSS·a22 / ((n−3)·det) from the same statistics.  Exact
    quantized int64 inputs, DECIMAL sums, one shared double tree.

    Returns (groups…, n, rho, t_rho, stationary_5pct); degenerate
    groups (singular system, zero residual variance, n ≤ 3) are NULL.
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    from pyspark.sql import Window

    w = Window.partitionBy(*groups).orderBy(*order)
    m = 10**scale
    q = F.floor(F.col(y_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    base = data.select(*groups, q.alias("_qy"), *order)
    lag1 = F.lag("_qy", 1).over(w)
    lag2 = F.lag("_qy", 2).over(w)
    staged = base.select(
        *groups,
        (F.col("_qy") - lag1).alias("_dy"),   # Δy_t
        lag1.alias("_x1"),                     # y_{t-1}
        (lag1 - lag2).alias("_x2"),            # Δy_{t-1}
    ).filter(
        F.col("_dy").isNotNull()
        & F.col("_x1").isNotNull()
        & F.col("_x2").isNotNull()
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = staged.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_x1"))).alias("_s1"),
        F.sum(dec(F.col("_x2"))).alias("_s2"),
        F.sum(dec(F.col("_dy"))).alias("_sy"),
        F.sum(dec(F.col("_x1")) * dec(F.col("_x1"))).alias("_s11"),
        F.sum(dec(F.col("_x2")) * dec(F.col("_x2"))).alias("_s22"),
        F.sum(dec(F.col("_x1")) * dec(F.col("_x2"))).alias("_s12"),
        F.sum(dec(F.col("_x1")) * dec(F.col("_dy"))).alias("_s1y"),
        F.sum(dec(F.col("_x2")) * dec(F.col("_dy"))).alias("_s2y"),
        F.sum(dec(F.col("_dy")) * dec(F.col("_dy"))).alias("_syy"),
    )
    nn = F.col("n").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a11 = nn * d("_s11") - d("_s1") * d("_s1")
    a12 = nn * d("_s12") - d("_s1") * d("_s2")
    a22 = nn * d("_s22") - d("_s2") * d("_s2")
    b1v = nn * d("_s1y") - d("_s1") * d("_sy")
    b2v = nn * d("_s2y") - d("_s2") * d("_sy")
    ssy = nn * d("_syy") - d("_sy") * d("_sy")
    det = a11 * a22 - a12 * a12
    rho = (a22 * b1v - a12 * b2v) / det
    b2 = (a11 * b2v - a12 * b1v) / det
    expl = rho * b1v + b2 * b2v
    rss = ssy - expl
    ok = (det != 0) & (F.col("n") > 3) & (rss > 0)
    se2 = rss * a22 / ((nn - F.lit(3.0)) * det)
    t_rho = F.when(ok & (se2 > 0), rho / F.sqrt(se2))
    return agg.select(
        *groups,
        "n",
        F.when(ok, rho).alias("rho"),
        t_rho.alias("t_rho"),
        F.when(ok & (se2 > 0), t_rho < F.lit(-2.86)).alias("stationary_5pct"),
    )


def adf_test_sql(
    data_sql: str,
    y_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`adf_test` (same statistics, same tree)."""
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    over = f"(PARTITION BY {gsel} ORDER BY {', '.join(order)})"
    m = 10**scale
    qq = f"CAST(FLOOR({y_col} * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH lagd AS (
  SELECT {gsel}, _qy,
    LAG(_qy, 1) OVER {over} AS _l1,
    LAG(_qy, 2) OVER {over} AS _l2
  FROM (SELECT {gsel}, {', '.join(order)}, {qq} AS _qy FROM ({data_sql}))
),
staged AS (
  SELECT {gsel}, _dy, _x1, _x2 FROM (
    SELECT {gsel}, _qy - _l1 AS _dy, _l1 AS _x1, _l1 - _l2 AS _x2 FROM lagd
  ) WHERE _dy IS NOT NULL AND _x1 IS NOT NULL AND _x2 IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_x1 AS HUGEINT)) AS _s1, SUM(CAST(_x2 AS HUGEINT)) AS _s2,
    SUM(CAST(_dy AS HUGEINT)) AS _sy,
    SUM(CAST(_x1 AS HUGEINT) * CAST(_x1 AS HUGEINT)) AS _s11,
    SUM(CAST(_x2 AS HUGEINT) * CAST(_x2 AS HUGEINT)) AS _s22,
    SUM(CAST(_x1 AS HUGEINT) * CAST(_x2 AS HUGEINT)) AS _s12,
    SUM(CAST(_x1 AS HUGEINT) * CAST(_dy AS HUGEINT)) AS _s1y,
    SUM(CAST(_x2 AS HUGEINT) * CAST(_dy AS HUGEINT)) AS _s2y,
    SUM(CAST(_dy AS HUGEINT) * CAST(_dy AS HUGEINT)) AS _syy
  FROM staged GROUP BY {gsel}
),
k AS (
  SELECT {gsel}, n, CAST(n AS DOUBLE) AS nn,
    CAST(n AS DOUBLE) * {s2d('_s11')} - {s2d('_s1')} * {s2d('_s1')} AS a11,
    CAST(n AS DOUBLE) * {s2d('_s12')} - {s2d('_s1')} * {s2d('_s2')} AS a12,
    CAST(n AS DOUBLE) * {s2d('_s22')} - {s2d('_s2')} * {s2d('_s2')} AS a22,
    CAST(n AS DOUBLE) * {s2d('_s1y')} - {s2d('_s1')} * {s2d('_sy')} AS b1v,
    CAST(n AS DOUBLE) * {s2d('_s2y')} - {s2d('_s2')} * {s2d('_sy')} AS b2v,
    CAST(n AS DOUBLE) * {s2d('_syy')} - {s2d('_sy')} * {s2d('_sy')} AS ssy
  FROM agg
),
sol AS (
  SELECT {gsel}, n, nn, a11, a22, ssy, b1v, b2v,
    a11 * a22 - a12 * a12 AS det,
    (a22 * b1v - a12 * b2v) / (a11 * a22 - a12 * a12) AS rho,
    (a11 * b2v - a12 * b1v) / (a11 * a22 - a12 * a12) AS b2
  FROM k
),
fin AS (
  SELECT {gsel}, n, nn, a22, det, rho,
    ssy - (rho * b1v + b2 * b2v) AS rss,
    (det <> 0 AND n > 3 AND (ssy - (rho * b1v + b2 * b2v)) > 0) AS ok
  FROM sol
),
fin2 AS (
  SELECT {gsel}, n, rho, ok,
    rss * a22 / ((nn - 3.0) * det) AS se2
  FROM fin
)
SELECT {gsel}, n,
  CASE WHEN ok THEN rho END AS rho,
  CASE WHEN ok AND se2 > 0 THEN rho / SQRT(se2) END AS t_rho,
  CASE WHEN ok AND se2 > 0 THEN (rho / SQRT(se2)) < -2.86 END AS stationary_5pct
FROM fin2
"""


def mann_kendall(
    data: DataFrame,
    y_col: str,
    group_columns,
    t_col: str,
    scale: int = 2,
) -> DataFrame:
    """Per-group Mann–Kendall monotonic-trend test — the
    nonparametric companion of :func:`theilsen_slope` (same pair pass;
    Theil–Sen answers HOW steep, Mann–Kendall answers IS there a
    trend at all, immune to outliers and any monotone transform):

        S = Σ_{i<j} sign(y_j − y_i)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (tie term)
        z = (S ∓ 1) / √Var(S)   (continuity-corrected, 0 when S = 0)

    Exactness: S and the tie counts are exact integers (quantized
    values compare exactly); Var(S) and z are one shared double tree.
    O(n²/group) pairs like Theil–Sen — the verify-tier trend test for
    dimension-sized series; at billion-row groups use the windowed
    rank formulation instead (documented swap, same statistic).

    Returns (groups…, n, s_stat, var_s, z).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(y_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.filter(F.col(y_col).isNotNull() & F.col(t_col).isNotNull()).select(
        *groups, F.col(t_col).alias("_t"), q.alias("_qy")
    )
    a, b = d.alias("a"), d.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in groups]
    pairs = a.join(b, on).filter(F.col("a._t") < F.col("b._t"))
    sgn = F.signum((F.col("b._qy") - F.col("a._qy")).cast("double")).cast("bigint")
    s_df = pairs.groupBy(*[F.col(f"a.{c}").alias(c) for c in groups]).agg(
        F.sum(sgn).alias("s_stat")
    )
    # tie correction: per distinct value count t, Σ t(t−1)(2t+5)
    ties = (
        d.groupBy(*groups, "_qy")
        .agg(F.count(F.lit(1)).alias("_tc"))
        .groupBy(*groups)
        .agg(
            F.sum("_tc").alias("n"),
            F.sum(
                F.col("_tc") * (F.col("_tc") - 1) * (2 * F.col("_tc") + 5)
            ).alias("_tie"),
        )
    )
    out = ties.join(s_df, on=groups, how="left")
    nn = F.col("n").cast("double")
    var_s = (
        nn * (nn - 1.0) * (2.0 * nn + 5.0) - F.col("_tie").cast("double")
    ) / F.lit(18.0)
    s = F.coalesce(F.col("s_stat"), F.lit(0).cast("bigint"))
    sd = s.cast("double")
    z = F.when(
        (var_s > 0) & (s != 0),
        (sd - F.signum(sd)) / F.sqrt(var_s),
    ).otherwise(F.lit(0.0))
    return out.select(
        *groups, "n", s.alias("s_stat"), var_s.alias("var_s"), z.alias("z")
    )


def mann_kendall_sql(
    data_sql: str,
    y_col: str,
    group_columns,
    t_col: str,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`mann_kendall`."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR({y_col} * {m} + 0.5) AS BIGINT)"
    ja = ", ".join(f"a.{c}" for c in groups)
    jon = " AND ".join(f"a.{c} = b.{c}" for c in groups)
    return f"""
WITH d AS (
  SELECT {gsel}, {t_col} AS _t, {qq} AS _qy
  FROM ({data_sql})
  WHERE {y_col} IS NOT NULL AND {t_col} IS NOT NULL
),
s AS (
  SELECT {ja}, CAST(SUM(CAST(SIGN(CAST(b._qy - a._qy AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_stat
  FROM d a JOIN d b ON {jon} AND a._t < b._t
  GROUP BY {ja}
),
ties AS (
  SELECT {gsel}, CAST(SUM(_tc) AS BIGINT) AS n,
    CAST(SUM(_tc * (_tc - 1) * (2 * _tc + 5)) AS BIGINT) AS _tie
  FROM (SELECT {gsel}, _qy, COUNT(*) AS _tc FROM d GROUP BY {gsel}, _qy)
  GROUP BY {gsel}
)
SELECT {gsel}, n,
  COALESCE(s_stat, CAST(0 AS BIGINT)) AS s_stat,
  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0)
    - CAST(_tie AS DOUBLE)) / 18.0 AS var_s,
  CASE WHEN ((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0)
    - CAST(_tie AS DOUBLE)) / 18.0) > 0 AND COALESCE(s_stat, 0) <> 0
    THEN (CAST(COALESCE(s_stat, CAST(0 AS BIGINT)) AS DOUBLE)
          - SIGN(CAST(COALESCE(s_stat, CAST(0 AS BIGINT)) AS DOUBLE)))
         / SQRT((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (2.0 * CAST(n AS DOUBLE) + 5.0)
    - CAST(_tie AS DOUBLE)) / 18.0)
    ELSE 0.0 END AS z
FROM ties LEFT JOIN s USING ({gsel})
"""


def seasonal_mann_kendall(
    data: DataFrame,
    y_col: str,
    group_columns,
    t_col: str,
    season_col: str,
    scale: int = 2,
) -> DataFrame:
    """Seasonal Mann–Kendall trend test (Hirsch & Slack 1984, public)
    per group — plain Mann–Kendall reads a 12-month cycle as noise (or
    worse, as trend); the seasonal form compares each season only with
    itself and POOLS the per-season statistics:

        S = Σ_seasons S_season,
        Var(S) = Σ_seasons Var(S_season),
        z = (S ∓ 1)/√Var(S)

    Exactness beyond the plain op: each season's variance NUMERATOR
    n(n−1)(2n+5) − Σt(t−1)(2t+5) is kept as an EXACT INTEGER and the
    cross-season pooling sums integers (a float Σ over unordered
    seasons would be association-dependent); /18 happens once at the
    end.  Same O(n²/season-group) pair pass as mann_kendall.

    Returns (groups…, n, n_seasons, s_stat, var_s, z).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(y_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.filter(
        F.col(y_col).isNotNull()
        & F.col(t_col).isNotNull()
        & F.col(season_col).isNotNull()
    ).select(
        *groups, F.col(season_col).alias("_sea"), F.col(t_col).alias("_t"),
        q.alias("_qy"),
    )
    a, b = d.alias("a"), d.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in groups] + [
        F.col("a._sea") == F.col("b._sea")
    ]
    pairs = a.join(b, on).filter(F.col("a._t") < F.col("b._t"))
    sgn = F.signum((F.col("b._qy") - F.col("a._qy")).cast("double")).cast(
        "bigint"
    )
    s_df = pairs.groupBy(
        *[F.col(f"a.{c}").alias(c) for c in groups],
        F.col("a._sea").alias("_sea"),
    ).agg(F.sum(sgn).alias("_s"))
    per = (
        d.groupBy(*groups, "_sea", "_qy")
        .agg(F.count(F.lit(1)).alias("_tc"))
        .groupBy(*groups, "_sea")
        .agg(
            F.sum("_tc").alias("_n"),
            F.sum(
                F.col("_tc") * (F.col("_tc") - 1) * (2 * F.col("_tc") + 5)
            ).alias("_tie"),
        )
    )
    sea = per.join(s_df, on=[*groups, "_sea"], how="left").select(
        *groups,
        "_n",
        F.coalesce(F.col("_s"), F.lit(0).cast("bigint")).alias("_s"),
        (
            F.col("_n") * (F.col("_n") - 1) * (2 * F.col("_n") + 5)
            - F.col("_tie")
        ).alias("_vnum"),
    )
    agg = sea.groupBy(*groups).agg(
        F.sum("_n").alias("n"),
        F.count(F.lit(1)).alias("n_seasons"),
        F.sum("_s").alias("s_stat"),
        F.sum("_vnum").alias("_vnum"),
    )
    var_s = F.col("_vnum").cast("double") / F.lit(18.0)
    s = F.col("s_stat")
    sd = s.cast("double")
    z = F.when(
        (var_s > 0) & (s != 0), (sd - F.signum(sd)) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return agg.select(
        *groups, "n", "n_seasons", "s_stat", var_s.alias("var_s"),
        z.alias("z"),
    )


def seasonal_mann_kendall_sql(
    data_sql: str,
    y_col: str,
    group_columns,
    t_col: str,
    season_col: str,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`seasonal_mann_kendall` (same integer
    pooling)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR({y_col} * {m} + 0.5) AS BIGINT)"
    ja = ", ".join(f"a.{c}" for c in groups)
    jon = " AND ".join(
        [f"a.{c} = b.{c}" for c in groups] + ["a._sea = b._sea"]
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {season_col} AS _sea, {t_col} AS _t, {qq} AS _qy
  FROM ({data_sql})
  WHERE {y_col} IS NOT NULL AND {t_col} IS NOT NULL
    AND {season_col} IS NOT NULL
),
s AS (
  SELECT {ja}, a._sea AS _sea,
    CAST(SUM(CAST(SIGN(CAST(b._qy - a._qy AS DOUBLE)) AS BIGINT))
      AS BIGINT) AS _s
  FROM d a JOIN d b ON {jon} AND a._t < b._t
  GROUP BY {ja}, a._sea
),
per AS (
  SELECT {gsel}, _sea, CAST(SUM(_tc) AS BIGINT) AS _n,
    CAST(SUM(_tc * (_tc - 1) * (2 * _tc + 5)) AS BIGINT) AS _tie
  FROM (
    SELECT {gsel}, _sea, _qy, COUNT(*) AS _tc
    FROM d GROUP BY {gsel}, _sea, _qy
  ) GROUP BY {gsel}, _sea
),
sea AS (
  SELECT {gsel}, _n,
    COALESCE(_s, CAST(0 AS BIGINT)) AS _s,
    _n * (_n - 1) * (2 * _n + 5) - _tie AS _vnum
  FROM per LEFT JOIN s USING ({gsel}, _sea)
),
agg AS (
  SELECT {gsel}, CAST(SUM(_n) AS BIGINT) AS n,
    COUNT(*) AS n_seasons,
    CAST(SUM(_s) AS BIGINT) AS s_stat,
    CAST(SUM(_vnum) AS BIGINT) AS _vnum
  FROM sea GROUP BY {gsel}
)
SELECT {gsel}, n, n_seasons, s_stat,
  CAST(_vnum AS DOUBLE) / 18.0 AS var_s,
  CASE WHEN CAST(_vnum AS DOUBLE) / 18.0 > 0 AND s_stat <> 0
    THEN (CAST(s_stat AS DOUBLE) - SIGN(CAST(s_stat AS DOUBLE)))
         / SQRT(CAST(_vnum AS DOUBLE) / 18.0)
    ELSE 0.0 END AS z
FROM agg
"""


# --------------------------------------------------------------------------
# KPSS level-stationarity test
# --------------------------------------------------------------------------


def kpss_test(
    data: DataFrame,
    y_col: str,
    group_columns,
    order_by,
    lags: int = 4,
    scale: int = 2,
) -> DataFrame:
    """Per-group KPSS test of LEVEL stationarity (Kwiatkowski, Phillips,
    Schmidt & Shin 1992) — adf_test's complement with the hypotheses
    REVERSED: KPSS's null is "stationary around a constant", so a
    series that rejects ADF's unit-root null AND fails to reject KPSS
    is confirmed stationary from both directions (the standard
    two-test protocol before differencing).

        η = (1/n²)·Σ_t S_t² / σ̂²_lr,  S_t = Σ_{s≤t}(y_s − ȳ)
        σ̂²_lr = γ̂₀ + 2·Σ_{k=1..L}(1 − k/(L+1))·γ̂_k   (Bartlett/Newey–West)

    Exactness: the residual is cleared of its 1/n by working with
    E_t = n·q_t − T (q = 10^-scale-quantized y, T = Σq): partial sums
    S′_t = Σ E_s and lagged products E_t·E_{t−k} are exact
    DECIMAL(38,0), and the normalizers cancel to ONE integer ratio

        η = A·(L+1) / (n·((L+1)·B₀ + 2·Σ_k (L+1−k)·B_k)),
        A = Σ S′², B_k = Σ E_t·E_{t−k}

    — a single double division (Bartlett weights make the denominator
    a PSD long-run variance, so it is ≥ 0 by construction; constant
    series → 0 → NULL).  ``level_stationary_5pct`` compares η against
    the 0.463 asymptotic 5% critical value (the KPSS table entry for
    the constant-only case).

    Scale shape: one ordered window pass per group (count/sum/cumsum +
    L lags all share the exchange) + one sufficient-stats aggregation.

    Returns (groups…, n, kpss_stat, level_stationary_5pct).
    """
    from pyspark.sql import Window

    groups = _as_list(group_columns)
    order = _as_list(order_by)
    L = int(lags)
    m = 10**scale
    w = Window.partitionBy(*groups).orderBy(*order)
    wfull = Window.partitionBy(*groups)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q = F.floor(F.col(y_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    base = data.filter(F.col(y_col).isNotNull()).select(
        *groups, *order, q.alias("_q")
    )
    nw = F.count(F.lit(1)).over(wfull)
    tw = F.sum("_q").over(wfull)
    staged = base.select(
        *groups,
        *order,
        "_q",
        nw.alias("_nn"),
        tw.alias("_t"),
        (nw * F.sum("_q").over(wcum) - F.sum(F.lit(1)).over(wcum) * tw)
        .cast("decimal(38,0)")
        .alias("_sp"),
    )
    e = (F.col("_nn") * F.col("_q") - F.col("_t")).cast("decimal(38,0)")
    lag_cols = [
        (
            e
            * (
                F.col("_nn") * F.lag("_q", k).over(w) - F.col("_t")
            ).cast("decimal(38,0)")
        ).alias(f"_bk{k}")
        for k in range(1, L + 1)
    ]
    rows = staged.select(
        *groups,
        (F.col("_sp") * F.col("_sp")).alias("_a"),
        (e * e).alias("_b0"),
        *lag_cols,
    )
    agg = rows.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_a").alias("_sa"),
        F.sum("_b0").alias("_sb0"),
        *[F.sum(f"_bk{k}").alias(f"_sb{k}") for k in range(1, L + 1)],
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    den_inner = s2d("_sb0") * F.lit(float(L + 1))
    for k in range(1, L + 1):
        den_inner = den_inner + F.lit(2.0 * (L + 1 - k)) * s2d(f"_sb{k}")
    stat = s2d("_sa") * F.lit(float(L + 1)) / (nn * den_inner)
    ok = (F.col("n") > L + 1) & (den_inner > 0)
    stat = F.when(ok, stat)
    return agg.select(
        *groups,
        "n",
        stat.alias("kpss_stat"),
        (stat < F.lit(0.463)).alias("level_stationary_5pct"),
    )


def kpss_test_sql(
    data_sql: str,
    y_col: str,
    group_columns,
    order_by,
    lags: int = 4,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`kpss_test` (same cleared-residual integer
    algebra, same Bartlett collapse to one division)."""
    from timeseriesutils_spark.functions.exact import dlit

    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    osel = ", ".join(order)
    L = int(lags)
    m = 10**scale
    over = f"(PARTITION BY {gsel})"
    overo = f"(PARTITION BY {gsel} ORDER BY {osel})"
    overc = (
        f"(PARTITION BY {gsel} ORDER BY {osel} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    qv = f"CAST(FLOOR(CAST({y_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    bks = ",\n    ".join(
        f"CAST(_nn * _q - _t AS HUGEINT)"
        f" * CAST(_nn * LAG(_q, {k}) OVER {overo} - _t AS HUGEINT)"
        f" AS _bk{k}"
        for k in range(1, L + 1)
    )
    sb = ", ".join(
        f"SUM(_bk{k}) AS _sb{k}" for k in range(1, L + 1)
    )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    den = f"{s2d('_sb0')} * {dlit(float(L + 1))}"
    for k in range(1, L + 1):
        den += f" + {dlit(2.0 * (L + 1 - k))} * {s2d(f'_sb{k}')}"
    stat = (
        f"({s2d('_sa')} * {dlit(float(L + 1))}"
        f" / (CAST(n AS DOUBLE) * ({den})))"
    )
    ok = f"(n > {L + 1} AND ({den}) > 0)"
    return f"""
WITH base AS (
  SELECT {gsel}, {osel}, {qv} AS _q
  FROM ({data_sql}) WHERE {y_col} IS NOT NULL
),
staged AS (
  SELECT {gsel}, {osel}, _q,
    COUNT(*) OVER {over} AS _nn,
    SUM(_q) OVER {over} AS _t,
    CAST(COUNT(*) OVER {over} * SUM(_q) OVER {overc}
         - SUM(1) OVER {overc} * SUM(_q) OVER {over}
      AS BIGINT) AS _sp
  FROM base
),
rows_k AS (
  SELECT {gsel},
    CAST(_sp AS HUGEINT) * CAST(_sp AS HUGEINT) AS _a,
    CAST(_nn * _q - _t AS HUGEINT)
      * CAST(_nn * _q - _t AS HUGEINT) AS _b0,
    {bks}
  FROM staged
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n, SUM(_a) AS _sa, SUM(_b0) AS _sb0, {sb}
  FROM rows_k GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {ok} THEN {stat} END AS kpss_stat,
  CASE WHEN {ok} THEN {stat} < 0.463 END AS level_stationary_5pct
FROM agg
"""


# --------------------------------------------------------------------------
# Lo–MacKinlay variance-ratio test
# --------------------------------------------------------------------------


def variance_ratio(
    data: DataFrame,
    y_col: str,
    group_columns,
    order_by,
    q: int = 5,
    scale: int = 2,
) -> DataFrame:
    """Per-group Lo–MacKinlay variance-ratio test (1988) of the random
    -walk hypothesis: if increments are uncorrelated, the variance of
    q-period differences is q× the variance of 1-period differences —
    VR < 1 flags mean reversion, VR > 1 momentum.  The third member of
    the stationarity triage beside adf_test (unit root) and kpss_test
    (level stationarity):

        VR(q) = σ̂²_c(q) / σ̂²_a,
        z = (VR−1)·√T / √(2(2q−1)(q−1)/(3q))   (homoscedastic form)

    where σ̂²_a is the one-period increment variance (df = T−1) and
    σ̂²_c(q) the overlapping q-period estimator normalized by
    m = q(T−q+1)(1−q/T) — m carries the q, making σ̂²_c per-period
    already (the classic 1/q-VR mistake is dividing again).

    Exactness: with y floor-quantized and the drift μ̂ = (y_T−y_0)/T
    cleared by multiplying every difference by T, both centered sums
    of squares are exact integers

        A₁ = Σ (T·Δy_t − D)²,  A_q = Σ (T·(y_t − y_{t−q}) − q·D)²,
        D = y_T − y_0

    and the normalizers collapse into one closed ratio of integers,

        VR = A_q·(T−1)·T / (A₁·q·(T−q+1)·(T−q))

    (m = q(T−q+1)(1−q/T) is Lo–MacKinlay's overlapping-window df) — a
    single double division; z adds one √ on literal-scaled terms.

    Scale shape: one ordered window pass (two lags + two boundary
    firsts/lasts share the exchange) + one sufficient-stats
    aggregation — the adf/kpss plan.

    Returns (groups…, n, vr, z_stat, random_walk_rejected_5pct).
    """
    from pyspark.sql import Window

    groups = _as_list(group_columns)
    order = _as_list(order_by)
    Q = int(q)
    m = 10**scale
    w = Window.partitionBy(*groups).orderBy(*order)
    wfull = Window.partitionBy(*groups)
    qv = F.floor(F.col(y_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    base = data.filter(F.col(y_col).isNotNull()).select(
        *groups, *order, qv.alias("_q")
    )
    # T = n-1 increment periods; D = y_last - y_first
    staged = base.select(
        *groups,
        "_q",
        (F.count(F.lit(1)).over(wfull) - 1).alias("_T"),
        (
            F.last("_q").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.first("_q").over(w)
        ).alias("_D"),
        F.lag("_q", 1).over(w).alias("_l1"),
        F.lag("_q", Q).over(w).alias("_lq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    e1 = F.col("_T") * (F.col("_q") - F.col("_l1")) - F.col("_D")
    eq = F.col("_T") * (F.col("_q") - F.col("_lq")) - F.lit(Q) * F.col("_D")
    agg = staged.select(
        *groups,
        F.col("_T").alias("_t"),
        F.when(F.col("_l1").isNotNull(), dec(e1) * dec(e1)).alias("_a1"),
        F.when(F.col("_lq").isNotNull(), dec(eq) * dec(eq)).alias("_aq"),
    ).groupBy(*groups).agg(
        F.max("_t").alias("_T"),
        F.sum("_a1").alias("_sa1"),
        F.sum("_aq").alias("_saq"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    T = F.col("_T").cast("double")
    vr = (
        s2d("_saq")
        * (T - F.lit(1.0))
        * T
        / (
            s2d("_sa1")
            * F.lit(float(Q))
            * (T - F.lit(float(Q)) + F.lit(1.0))
            * (T - F.lit(float(Q)))
        )
    )
    phi = 2.0 * (2 * Q - 1) * (Q - 1) / (3.0 * Q)
    z = (vr - F.lit(1.0)) * F.sqrt(T) / F.lit(phi**0.5)
    ok = (F.col("_T") > Q + 1) & (F.col("_sa1") > 0)
    vr = F.when(ok, vr)
    z = F.when(ok, z)
    return agg.select(
        *groups,
        (F.col("_T") + 1).alias("n"),
        vr.alias("vr"),
        z.alias("z_stat"),
        (F.abs(z) > F.lit(1.96)).alias("random_walk_rejected_5pct"),
    )


def variance_ratio_sql(
    data_sql: str,
    y_col: str,
    group_columns,
    order_by,
    q: int = 5,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`variance_ratio` (same cleared-drift
    integer algebra, same closed normalizer ratio)."""
    from timeseriesutils_spark.functions.exact import dlit

    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    osel = ", ".join(order)
    Q = int(q)
    m = 10**scale
    over = f"(PARTITION BY {gsel} ORDER BY {osel})"
    overf = (
        f"(PARTITION BY {gsel} ORDER BY {osel} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )
    qv = f"CAST(FLOOR(CAST({y_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    T = "CAST(_T AS DOUBLE)"
    vr = (
        f"({s2d('_saq')} * ({T} - 1.0) * {T}"
        f" / ({s2d('_sa1')} * {dlit(float(Q))}"
        f" * ({T} - {dlit(float(Q))} + 1.0) * ({T} - {dlit(float(Q))})))"
    )
    phi = 2.0 * (2 * Q - 1) * (Q - 1) / (3.0 * Q)
    z = f"(({vr} - 1.0) * SQRT({T}) / {dlit(phi**0.5)})"
    ok = f"(_T > {Q + 1} AND _sa1 > 0)"
    return f"""
WITH base AS (
  SELECT {gsel}, {osel}, {qv} AS _q
  FROM ({data_sql}) WHERE {y_col} IS NOT NULL
),
staged AS (
  SELECT {gsel}, _q,
    COUNT(*) OVER (PARTITION BY {gsel}) - 1 AS _T,
    LAST_VALUE(_q) OVER {overf} - FIRST_VALUE(_q) OVER {over} AS _D,
    LAG(_q, 1) OVER {over} AS _l1,
    LAG(_q, {Q}) OVER {over} AS _lq
  FROM base
),
agg AS (
  SELECT {gsel}, MAX(_T) AS _T,
    SUM(CASE WHEN _l1 IS NOT NULL
        THEN CAST(_T * (_q - _l1) - _D AS HUGEINT)
           * CAST(_T * (_q - _l1) - _D AS HUGEINT) END) AS _sa1,
    SUM(CASE WHEN _lq IS NOT NULL
        THEN CAST(_T * (_q - _lq) - {Q} * _D AS HUGEINT)
           * CAST(_T * (_q - _lq) - {Q} * _D AS HUGEINT) END) AS _saq
  FROM staged GROUP BY {gsel}
)
SELECT {gsel}, CAST(_T + 1 AS BIGINT) AS n,
  CASE WHEN {ok} THEN {vr} END AS vr,
  CASE WHEN {ok} THEN {z} END AS z_stat,
  CASE WHEN {ok} THEN ABS({z}) > 1.96 END AS random_walk_rejected_5pct
FROM agg
"""
