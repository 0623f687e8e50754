"""Whole-series correlation structure: autocorrelation (ACF) features
and a lead-lag cross-correlation scan.

These are the classic "does the series remember itself / which series
leads" diagnostics (tsfeatures/catch22-style summary features) that the
reference's featurization domain feeds into gradient-boosting models —
the reference itself stops at windowed Taylor coefficients and
periodograms (``/root/reference/src/timeseriesutils/featurize.py:300-686``);
ACF/CCF is the natural next member of that family, implemented
Spark-first.

Exactness discipline (same as series_math.rolling_corr):

* inputs are quantized to integers (``floor(v·10^s + 0.5)`` — the one
  rounding Spark and DuckDB compute identically), so every per-group /
  per-lag sum is an exact BIGINT, independent of partitioning;
* the final statistic is a short, fixed-shape DOUBLE expression over
  those exact integers, rendered from the same Python constants in the
  same association order for both engines → bit-identical results
  (IEEE-754 doubles, identical expression trees).

Scale shape: one hash exchange on the group keys (for the lag window),
then a map-side-combinable groupBy on the SAME keys — AQE/EnsureRequirements
reuses the partitioning, so the whole op is a single shuffle followed by
a tiny per-group explode (max_lag rows per group).  No Python anywhere.

Range guard (documented, mirrored in the twin): |q| ≤ Q and series
length n must satisfy n·Q² < 9.2e18 for the BIGINT sums; the DOUBLE
combination step only ever sees the exact sums (each < 2^63), never
n²-scaled products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list, make_window


def _q(col, scale: int):
    return F.floor(F.col(col) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")


def _q_sql(col: str, scale: int) -> str:
    return f"CAST(FLOOR({col} * {float(10 ** scale)!r} + 0.5) AS BIGINT)"


def acf_features(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    max_lag: int = 10,
    scale: int = 0,
    min_pairs: int = 2,
) -> DataFrame:
    """Per-group autocorrelation function at lags 1..max_lag, plus the
    running Ljung–Box Q statistic.

    Statistical ACF normalization (shared mean/variance, the standard
    estimator): for lag k over a group of n quantized points x with
    mean x̄ = Sx/n,

        r_k = [Σ_pairs (x_t − x̄)(x_{t−k} − x̄)] / [Σ (x_t − x̄)²]
            = (Sxy_k − x̄·(A_k + B_k) + n_k·x̄²) / (Sxx − x̄·Sx)

    where every S/A/B/n term is an exact BIGINT sum (Sxy_k = Σ x_t·x_{t−k}
    over valid pairs, A_k/B_k the pair-restricted sums of each side).
    The Ljung–Box portmanteau statistic accumulates over lag order:

        Q_k = n(n+2) · Σ_{j=1..k} r_j² / (n − j)

    computed as a running window sum over the per-lag rows (frame order
    = lag order in both engines, so the double summation order is
    pinned).

    Returns one row per (group, lag): group cols, ``lag_k``, ``n_pairs``,
    ``acf``, ``ljung_box_q``.
    """
    groups = _as_list(group_columns)
    w = make_window(groups, order_by)
    qx = _q(column, scale)
    lagged = data.select(
        *groups,
        qx.alias("_x"),
        *[F.lag(qx, k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    aggs = [
        F.count("_x").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        pair = lk.isNotNull() & F.col("_x").isNotNull()
        aggs += [
            F.count(F.when(pair, F.lit(1))).alias(f"_n{k}"),
            F.sum(F.when(pair, F.col("_x") * lk)).alias(f"_sxy{k}"),
            F.sum(F.when(pair, F.col("_x"))).alias(f"_a{k}"),
            F.sum(F.when(pair, lk)).alias(f"_b{k}"),
        ]
    g = lagged.groupBy(*groups).agg(*aggs)
    # per-lag ACF inside the wide row: one double formula of the exact sums
    n_d = F.col("_n").cast("double")
    xbar = F.col("_sx").cast("double") / n_d
    den = F.col("_sxx").cast("double") - xbar * F.col("_sx").cast("double")
    r_cols = []
    for k in range(1, max_lag + 1):
        num = (
            F.col(f"_sxy{k}").cast("double")
            - xbar * (F.col(f"_a{k}") + F.col(f"_b{k}")).cast("double")
            + F.col(f"_n{k}").cast("double") * xbar * xbar
        )
        r_cols.append(
            F.when((F.col(f"_n{k}") >= min_pairs) & (den > 0), num / den).alias(
                f"_r{k}"
            )
        )
    wide = g.select(*groups, "_n", *[F.col(f"_n{k}") for k in range(1, max_lag + 1)], *r_cols)
    # Ljung–Box Q_k: the cumulative sum over j<=k is UNROLLED left-to-right
    # (never a windowed double SUM — engines disagree on accumulation order
    # for windowed aggregates, e.g. segment-tree vs sequential)
    q_cols = []
    for k in range(1, max_lag + 1):
        acc = None
        for j in range(1, k + 1):
            term = (F.col(f"_r{j}") * F.col(f"_r{j}")) / (
                n_d - F.lit(float(j))
            )
            term = F.coalesce(term, F.lit(0.0))
            acc = term if acc is None else acc + term
        q_cols.append((n_d * (n_d + F.lit(2.0)) * acc).alias(f"_q{k}"))
    wide = wide.select(*groups, "_n", *[f"_n{k}" for k in range(1, max_lag + 1)],
                       *[f"_r{k}" for k in range(1, max_lag + 1)], *q_cols)
    per_lag = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag_k"),
                    F.col(f"_n{k}").alias("n_pairs"),
                    F.col(f"_r{k}").alias("acf"),
                    F.col(f"_q{k}").alias("ljung_box_q"),
                )
                for k in range(1, max_lag + 1)
            ]
        )
    ).alias("_s")
    return wide.select(*groups, per_lag).select(
        *groups,
        F.col("_s.lag_k").alias("lag_k"),
        F.col("_s.n_pairs").alias("n_pairs"),
        F.col("_s.acf").alias("acf"),
        F.col("_s.ljung_box_q").alias("ljung_box_q"),
    )


def acf_features_sql(
    relation: str,
    column: str,
    group_columns,
    order_by,
    max_lag: int = 10,
    scale: int = 0,
    min_pairs: int = 2,
) -> str:
    """DuckDB twin of :func:`acf_features` — same quantization, same
    BIGINT sums, same double expression shapes, per-lag rows via
    UNION ALL over the (tiny) aggregated relation."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    order = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {gsel} ORDER BY {order})"
    qx = _q_sql(column, scale)
    lag_cols = ",\n    ".join(
        f"LAG(_x, {k}) OVER {over} AS _l{k}" for k in range(1, max_lag + 1)
    )
    # _x is computed in an inner subquery so the window expressions never
    # reference a same-SELECT alias (not portable across engines)
    per_k_aggs = []
    for k in range(1, max_lag + 1):
        pair = f"_l{k} IS NOT NULL AND _x IS NOT NULL"
        per_k_aggs.append(
            f"COUNT(CASE WHEN {pair} THEN 1 END) AS _n{k},\n"
            f"    SUM(CASE WHEN {pair} THEN _x * _l{k} END) AS _sxy{k},\n"
            f"    SUM(CASE WHEN {pair} THEN _x END) AS _a{k},\n"
            f"    SUM(CASE WHEN {pair} THEN _l{k} END) AS _b{k}"
        )
    aggs = ",\n    ".join(per_k_aggs)
    n_d = "CAST(_n AS DOUBLE)"
    xbar = f"(CAST(_sx AS DOUBLE) / {n_d})"
    den = f"(CAST(_sxx AS DOUBLE) - {xbar} * CAST(_sx AS DOUBLE))"
    r_exprs = []
    for k in range(1, max_lag + 1):
        num = (
            f"(CAST(_sxy{k} AS DOUBLE) - {xbar} * CAST((_a{k} + _b{k}) AS DOUBLE) "
            f"+ CAST(_n{k} AS DOUBLE) * {xbar} * {xbar})"
        )
        r_exprs.append(
            f"CASE WHEN _n{k} >= {min_pairs} AND {den} > 0 "
            f"THEN {num} / {den} END AS _r{k}"
        )
    r_sel = ",\n    ".join(r_exprs)
    # Ljung–Box: unrolled left-to-right sum, mirroring the Spark tree
    q_exprs = []
    for k in range(1, max_lag + 1):
        terms = [
            f"COALESCE((_r{j} * _r{j}) / ({n_d} - CAST({j} AS DOUBLE)), 0.0)"
            for j in range(1, k + 1)
        ]
        acc = terms[0]
        for t in terms[1:]:
            acc = f"({acc} + {t})"
        q_exprs.append(f"{n_d} * ({n_d} + 2.0) * {acc} AS _q{k}")
    q_sel = ",\n    ".join(q_exprs)
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT {gsel}, {k} AS lag_k, _n{k} AS n_pairs, "
        f"_r{k} AS acf, _q{k} AS ljung_box_q FROM wide"
        for k in range(1, max_lag + 1)
    )
    n_cols = ", ".join(f"_n{k}" for k in range(1, max_lag + 1))
    r_cols_sel = ", ".join(f"_r{k}" for k in range(1, max_lag + 1))
    return f"""
WITH lagged AS (
  SELECT {gsel}, _x,
    {lag_cols}
  FROM (SELECT {gsel}, {order}, {qx} AS _x FROM {relation})
), agg AS (
  SELECT {gsel},
    COUNT(_x) AS _n,
    SUM(_x) AS _sx,
    SUM(_x * _x) AS _sxx,
    {aggs}
  FROM lagged GROUP BY {gsel}
), rr AS (
  SELECT {gsel}, _n, {n_cols},
    {r_sel}
  FROM agg
), wide AS (
  SELECT {gsel}, _n, {n_cols}, {r_cols_sel},
    {q_sel}
  FROM rr
)
{unions}
"""


def lead_lag_corr(
    data: DataFrame,
    col_x: str,
    col_y: str,
    group_columns,
    order_by,
    max_shift: int = 7,
    scale_x: int = 0,
    scale_y: int = 2,
    min_pairs: int = 8,
) -> DataFrame:
    """Per-group lead-lag cross-correlation scan: Pearson correlation
    between x_t and y_{t+s} for every shift s in −max_shift..+max_shift,
    with the winning shift flagged.

    Positive s ⇒ x *leads* y by s steps (today's x co-moves with y s
    steps later).  Pairwise normalization (the rolling_corr estimator at
    group scope): all five sums restricted to rows where both sides of
    the shifted pair exist, exact BIGINTs, then one double formula
    n·Sxy − Sx·Sy over √(n·Sxx − Sx²)·√(n·Syy − Sy²) with every sum
    cast to DOUBLE *before* the products (the BIGINT products would
    scale as n²·Q_x·Q_y and wrap; the sums themselves need only
    n·Q_x·Q_y < 9.2e18).

    ``is_best`` marks the shift with the highest correlation per group
    (ties → smallest |shift|, then smallest shift — deterministic).

    Returns one row per (group, shift): group cols, ``shift``,
    ``n_pairs``, ``xcorr``, ``is_best``.
    """
    groups = _as_list(group_columns)
    w = make_window(groups, order_by)
    qx = _q(col_x, scale_x)
    qy = _q(col_y, scale_y)
    shifts = list(range(-max_shift, max_shift + 1))
    def shifted(s):
        # y_{t+s}: lead for s>0, lag for s<0 (avoid negative offsets —
        # defined but less portable)
        return F.lead(qy, s).over(w) if s >= 0 else F.lag(qy, -s).over(w)

    lagged = data.select(
        *groups,
        qx.alias("_x"),
        *[shifted(s).alias(f"_y{i}") for i, s in enumerate(shifts)],
    )
    aggs = []
    for i, _s in enumerate(shifts):
        ys = F.col(f"_y{i}")
        pair = ys.isNotNull() & F.col("_x").isNotNull()
        aggs += [
            F.count(F.when(pair, F.lit(1))).alias(f"_n{i}"),
            F.sum(F.when(pair, F.col("_x"))).alias(f"_sx{i}"),
            F.sum(F.when(pair, ys)).alias(f"_sy{i}"),
            F.sum(F.when(pair, F.col("_x") * ys)).alias(f"_sxy{i}"),
            F.sum(F.when(pair, F.col("_x") * F.col("_x"))).alias(f"_sxx{i}"),
            F.sum(F.when(pair, ys * ys)).alias(f"_syy{i}"),
        ]
    g = lagged.groupBy(*groups).agg(*aggs)
    per_shift = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("shift"),
                    F.col(f"_n{i}").alias("n_pairs"),
                    F.col(f"_sx{i}").alias("sx"),
                    F.col(f"_sy{i}").alias("sy"),
                    F.col(f"_sxy{i}").alias("sxy"),
                    F.col(f"_sxx{i}").alias("sxx"),
                    F.col(f"_syy{i}").alias("syy"),
                )
                for i, s in enumerate(shifts)
            ]
        )
    ).alias("_s")
    e = g.select(*groups, per_shift).select(*groups, "_s.*")
    n, sx, sy = F.col("n_pairs"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # combine in the DOUBLE domain: the BIGINT products n·Sxy / Sx·Sy
    # scale as n²·Qx·Qy and would wrap int64 for ~1e5-row groups at
    # scale_y=2 (the documented n·Qx·Qy guard covers only the sums);
    # per-sum casts are exact under that guard and IEEE-identical in
    # both engines (same shape as acf_features)
    n_d = n.cast("double")
    sx_d, sy_d = sx.cast("double"), sy.cast("double")
    num = n_d * sxy.cast("double") - sx_d * sy_d
    vx = n_d * sxx.cast("double") - sx_d * sx_d
    vy = n_d * syy.cast("double") - sy_d * sy_d
    den = F.sqrt(F.greatest(vx, F.lit(0.0))) * F.sqrt(F.greatest(vy, F.lit(0.0)))
    xcorr = F.when((n >= min_pairs) & (den > 0), num / den)
    scored = e.select(*groups, "shift", "n_pairs", xcorr.alias("xcorr"))
    best_w = Window.partitionBy(*groups).orderBy(
        F.col("xcorr").desc_nulls_last(), F.abs(F.col("shift")), F.col("shift")
    )
    return scored.select(
        *groups,
        "shift",
        "n_pairs",
        "xcorr",
        # no winner when every shift failed the min_pairs/variance guard
        ((F.row_number().over(best_w) == 1) & F.col("xcorr").isNotNull()).alias(
            "is_best"
        ),
    )


def lead_lag_corr_sql(
    relation: str,
    col_x: str,
    col_y: str,
    group_columns,
    order_by,
    max_shift: int = 7,
    scale_x: int = 0,
    scale_y: int = 2,
    min_pairs: int = 8,
) -> str:
    """DuckDB twin of :func:`lead_lag_corr`."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    order = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {gsel} ORDER BY {order})"
    qx = _q_sql(col_x, scale_x)
    qy = _q_sql(col_y, scale_y)
    shifts = list(range(-max_shift, max_shift + 1))
    lag_cols = ",\n    ".join(
        (
            f"LEAD(_yq, {s}) OVER {over} AS _y{i}"
            if s >= 0
            else f"LAG(_yq, {-s}) OVER {over} AS _y{i}"
        )
        for i, s in enumerate(shifts)
    )
    agg_parts = []
    for i, _s in enumerate(shifts):
        pair = f"_y{i} IS NOT NULL AND _x IS NOT NULL"
        agg_parts.append(
            f"COUNT(CASE WHEN {pair} THEN 1 END) AS _n{i},\n"
            f"    SUM(CASE WHEN {pair} THEN _x END) AS _sx{i},\n"
            f"    SUM(CASE WHEN {pair} THEN _y{i} END) AS _sy{i},\n"
            f"    SUM(CASE WHEN {pair} THEN _x * _y{i} END) AS _sxy{i},\n"
            f"    SUM(CASE WHEN {pair} THEN _x * _x END) AS _sxx{i},\n"
            f"    SUM(CASE WHEN {pair} THEN _y{i} * _y{i} END) AS _syy{i}"
        )
    aggs = ",\n    ".join(agg_parts)
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT {gsel}, {s} AS shift, _n{i} AS n_pairs, _sx{i} AS sx, "
        f"_sy{i} AS sy, _sxy{i} AS sxy, _sxx{i} AS sxx, _syy{i} AS syy FROM agg"
        for i, s in enumerate(shifts)
    )
    num = (
        "(CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    vx = (
        "(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    vy = (
        "(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    den = f"(SQRT(GREATEST({vx}, 0.0)) * SQRT(GREATEST({vy}, 0.0)))"
    xcorr = (
        f"CASE WHEN n_pairs >= {min_pairs} AND {den} > 0 "
        f"THEN {num} / {den} END"
    )
    best_over = (
        f"(PARTITION BY {gsel} "
        "ORDER BY xcorr DESC NULLS LAST, ABS(shift), shift)"
    )
    return f"""
WITH lagged AS (
  SELECT {gsel}, _x, {lag_cols}
  FROM (SELECT {gsel}, {order}, {qx} AS _x, {qy} AS _yq FROM {relation})
), agg AS (
  SELECT {gsel},
    {aggs}
  FROM lagged GROUP BY {gsel}
), per_shift AS (
  {unions}
), scored AS (
  SELECT {gsel}, shift, n_pairs, {xcorr} AS xcorr FROM per_shift
)
SELECT {gsel}, shift, n_pairs, xcorr,
  ((ROW_NUMBER() OVER {best_over}) = 1 AND xcorr IS NOT NULL) AS is_best
FROM scored
"""


# --------------------------------------------------------------------------
# Ljung–Box portmanteau test (decision layer over acf_features)
# --------------------------------------------------------------------------


def ljung_box_test(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    h: int = 10,
    scale: int = 0,
    min_pairs: int = 2,
) -> DataFrame:
    """Per-group Ljung–Box white-noise test at lag order ``h``: is there
    ANY autocorrelation left up to lag h?  The residual-diagnostic
    gate after every forecaster in the engine (holt/theta/ARIMA-style
    residuals should fail to reject) — :func:`acf_features` already
    carries the running Q_k; this is its decision layer:

        Q_h = n(n+2)·Σ_{j≤h} r_j²/(n−j),   Q_h ~ χ²_h under H₀

    p comes from the Wilson–Hilferty χ² survival kernel
    (nonparam.chi2_sf_expr — quantized cube root, Bowling logistic
    tail), so accept/reject is bit-identical across engines.  Plan =
    acf_features' single-exchange lag/aggregate chain plus a
    lag_k = h filter.

    Returns (groups…, n, q_stat, df, p_value, reject_05).
    """
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.nonparam import chi2_sf_expr

    per_lag = acf_features(
        data, column, group_columns, order_by, max_lag=h, scale=scale,
        min_pairs=min_pairs,
    )
    groups = _as_list(group_columns)
    picked = per_lag.filter(F.col("lag_k") == h)
    q = F.col("ljung_box_q")
    p = chi2_sf_expr(q, F.lit(float(h)))
    ok = q.isNotNull() & (F.col("n_pairs") >= min_pairs)
    return picked.select(
        *groups,
        (F.col("n_pairs") + F.lit(h)).alias("n"),
        F.when(ok, q).alias("q_stat"),
        F.lit(h).alias("df"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def ljung_box_test_sql(
    relation: str,
    column: str,
    group_columns,
    order_by,
    h: int = 10,
    scale: int = 0,
    min_pairs: int = 2,
) -> str:
    """DuckDB twin of :func:`ljung_box_test` (acf_features_sql + the
    same kernel literals)."""
    from timeseriesutils_spark.operators.nonparam import chi2_sf_sql

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    inner = acf_features_sql(
        relation, column, group_columns, order_by, max_lag=h, scale=scale,
        min_pairs=min_pairs,
    )
    p = chi2_sf_sql("ljung_box_q", str(h))
    ok = f"ljung_box_q IS NOT NULL AND n_pairs >= {min_pairs}"
    return f"""
SELECT {gsel}, n_pairs + {h} AS n,
  CASE WHEN {ok} THEN ljung_box_q END AS q_stat,
  {h} AS df,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM ({inner})
WHERE lag_k = {h}
"""


# --------------------------------------------------------------------------
# partial autocorrelation (Durbin–Levinson over the exact-sum ACF)
# --------------------------------------------------------------------------


def _pacf_level_exprs(max_lag: int) -> list[list[tuple[str, str]]]:
    """Durbin–Levinson recursion as shared SQL text — one list of
    (column, expression) batches, each batch referencing only columns
    from earlier batches, valid verbatim in BOTH Spark SQL and DuckDB
    (arithmetic + CASE only), so the two engines evaluate the
    IDENTICAL double tree:

        φ_{1,1} = r_1
        φ_{k,k} = (r_k − Σ_{j<k} φ_{k−1,j}·r_{k−j})
                / (1 − Σ_{j<k} φ_{k−1,j}·r_j)
        φ_{k,j} = φ_{k−1,j} − φ_{k,k}·φ_{k−1,k−j}

    NULL r_k (too few pairs / zero variance upstream) propagates to
    NULL φ; a zero denominator yields NULL via the CASE guard.
    """
    batches: list[list[tuple[str, str]]] = [[("phi_1_1", "r1")]]
    for k in range(2, max_lag + 1):
        num_terms = " + ".join(
            f"phi_{k - 1}_{j} * r{k - j}" for j in range(1, k)
        )
        den_terms = " + ".join(
            f"phi_{k - 1}_{j} * r{j}" for j in range(1, k)
        )
        kk = (
            f"CASE WHEN (1.0 - ({den_terms})) <> 0.0 THEN "
            f"(r{k} - ({num_terms})) / (1.0 - ({den_terms})) END"
        )
        batches.append([(f"phi_{k}_{k}", kk)])
        if k < max_lag:  # φ_{k,j<k} only feed the NEXT level
            batches.append(
                [
                    (
                        f"phi_{k}_{j}",
                        f"phi_{k - 1}_{j} - phi_{k}_{k} * phi_{k - 1}_{k - j}",
                    )
                    for j in range(1, k)
                ]
            )
    return batches


def pacf_features(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    max_lag: int = 5,
    scale: int = 0,
    min_pairs: int = 2,
) -> DataFrame:
    """Per-group partial autocorrelation at lags 1..max_lag — the AR
    order-selection companion of :func:`acf_features`: ACF tails off
    for AR processes, PACF CUTS off at the true order p, so the last
    significant pacf lag is the p a modeler feeds an AR/ARIMA fit.

    Built entirely on acf_features' exact-integer machinery: the
    per-lag r_k (bit-identical across engines) pivot to one wide row
    per group, then the Durbin–Levinson recursion runs as a fixed
    chain of small projections (see :func:`_pacf_level_exprs` — the
    SAME SQL text executes in Spark and DuckDB, so association order
    is pinned without any quantization).  The pivot aggregates an
    already-collapsed max_lag-rows-per-group frame — the added
    exchange moves ~max_lag rows per group, nothing row-scale.

    Returns one row per (group, lag): groups…, lag_k, n_pairs, pacf.
    """
    groups = _as_list(group_columns)
    acf = acf_features(
        data, column, group_columns, order_by, max_lag=max_lag,
        scale=scale, min_pairs=min_pairs,
    )
    wide = acf.groupBy(*groups).agg(
        *[
            F.max(F.when(F.col("lag_k") == k, F.col("acf"))).alias(f"r{k}")
            for k in range(1, max_lag + 1)
        ],
        *[
            F.max(F.when(F.col("lag_k") == k, F.col("n_pairs"))).alias(
                f"np{k}"
            )
            for k in range(1, max_lag + 1)
        ],
    )
    for batch in _pacf_level_exprs(max_lag):
        wide = wide.selectExpr("*", *[f"{e} AS {n}" for n, e in batch])
    per_lag = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag_k"),
                    F.col(f"np{k}").alias("n_pairs"),
                    F.col(f"phi_{k}_{k}").alias("pacf"),
                )
                for k in range(1, max_lag + 1)
            ]
        )
    ).alias("_s")
    return wide.select(*groups, per_lag).select(
        *groups,
        F.col("_s.lag_k").alias("lag_k"),
        F.col("_s.n_pairs").alias("n_pairs"),
        F.col("_s.pacf").alias("pacf"),
    )


def pacf_features_sql(
    relation: str,
    column: str,
    group_columns,
    order_by,
    max_lag: int = 5,
    scale: int = 0,
    min_pairs: int = 2,
) -> str:
    """DuckDB twin of :func:`pacf_features`: the acf_features twin,
    the same pivot, and the same shared Durbin–Levinson SQL text."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    inner = acf_features_sql(
        relation, column, group_columns, order_by, max_lag=max_lag,
        scale=scale, min_pairs=min_pairs,
    )
    rcols = ",\n    ".join(
        f"MAX(CASE WHEN lag_k = {k} THEN acf END) AS r{k}"
        for k in range(1, max_lag + 1)
    )
    npcols = ",\n    ".join(
        f"MAX(CASE WHEN lag_k = {k} THEN n_pairs END) AS np{k}"
        for k in range(1, max_lag + 1)
    )
    ctes = [f"w0 AS (\n  SELECT {gsel},\n    {rcols},\n    {npcols}\n"
            f"  FROM ({inner}) GROUP BY {gsel}\n)"]
    prev = "w0"
    for i, batch in enumerate(_pacf_level_exprs(max_lag), start=1):
        cols = ", ".join(f"{e} AS {n}" for n, e in batch)
        ctes.append(f"w{i} AS (SELECT *, {cols} FROM {prev})")
        prev = f"w{i}"
    rows = " UNION ALL ".join(
        f"SELECT {gsel}, {k} AS lag_k, np{k} AS n_pairs,"
        f" phi_{k}_{k} AS pacf FROM {prev}"
        for k in range(1, max_lag + 1)
    )
    return f"""
WITH {','.join(ctes)}
{rows}
"""
