"""Windowed Taylor-polynomial coefficient features.

Reference: ``windowed_taylor_coefs`` + ``taylor_coefs_one_column_grp``
(featurize.py:428-516, 300-425): per group/column and per (window_size,
window_align, ew_span) combo, fit ``y ≈ Σ_d β_d · lag^d / d!`` by (optionally
exponentially weighted) least squares over a sliding window, emitting
β₀..β_D as columns ``{c}_taylor_d{D}_c{d}_w{w}{'c'|'t'}_s{span}``.

Spark-first design — closed form, no UDF on the hot path:
the design matrix X (and weight matrix W) depend only on the parameters,
never on the data, so the lstsq solution collapses to a constant projection
``P = pinv(√W·X)·√W`` computed once on the driver; then

    β_d(t) = Σ_j P[d][j] · y_{t+lag_j}

is a fixed linear combination of lag/lead columns — pure built-in
expressions inside whole-stage codegen, one hash exchange + sort shared by
every coefficient (and with the other window features when specs match).
``np.linalg.lstsq`` with ``rcond=None`` returns the minimum-norm solution,
which *is* the pseudoinverse solution, so this matches the reference bit
for-bit in exact arithmetic and to ulp noise in floats — including the
under-determined edge fits (and the empty i=0 trailing edge fit, which
lstsq resolves to β=0).

Reference quirks reproduced under ``strict_reference_edges=True`` (default;
SURVEY §2.4.2-3):
  * trailing: the first *full* window (row index w-1, 0-based) is left
    NULL — interior fill starts at row w (featurize.py:406 slices
    ``[window_size:]``; pinned by the reference's own unit test).
  * centered: row n-hw-1 — a valid full window — is left NULL even with
    ``fill_edges=True`` (featurize.py:390 slices ``[hw:-(hw+1)]`` while the
    edge loop covers only the last hw rows).
Set ``strict_reference_edges=False`` for the defect-free semantics.

NULL propagation: any NULL inside a row's (possibly truncated) window makes
that row's βs NULL — SQL null arithmetic reproduces the reference's NaN
propagation through lstsq (verified in SURVEY §2.1).

A twin SQL renderer (:func:`taylor_sql_columns`) emits the *same* linear
combination as ANSI SQL text with identical term order, so an external
engine (the DuckDB oracle) computes bit-identical doubles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce
from itertools import product

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.names import taylor_name
from timeseriesutils_spark.operators.window_features import _as_list, make_window


@dataclass
class TaylorMatrices:
    """Constant projection matrices for one parameter combo.

    ``interior``: (D+1, w) — β = interior @ y_window.
    ``start[i]`` / ``end[i]``: projections for truncated edge windows,
    paired with the list of window-lag offsets whose values they consume.
    """

    lags: list[int]
    interior: np.ndarray
    # edge entries: (lags, P, zero_mask, contaminated).
    # zero_mask[d]=True → column d of the sliced design matrix is all-zero,
    # so lstsq's min-norm solution pins β_d to exactly 0.0 regardless of the
    # RHS (even a NaN RHS — LAPACK zeroes null-space components without
    # touching it).  contaminated=True → the reference's ew-span diagonal
    # matmul (featurize.py:381) spread a structural NaN across the whole
    # window column, so every non-pinned coefficient is NaN.
    start: list[tuple[list[int], np.ndarray, list[bool], bool]]
    end: list[tuple[list[int], np.ndarray, list[bool], bool]]
    half_window: int


def taylor_matrices(
    taylor_degree: int,
    window_size: int,
    window_align: str,
    ew_span: float | None,
    fill_edges: bool,
) -> TaylorMatrices:
    """Precompute the projection matrices on the driver (reference math:
    featurize.py:346-381 for X/W construction, :383-416 for the fits)."""
    if window_align == "centered":
        half_window = (window_size - 1) // 2
        window_lags = np.arange(-half_window, half_window + 1)
    elif window_align == "trailing":
        half_window = 0
        window_lags = np.arange(-window_size, 0) + 1
    else:
        raise ValueError(
            f"window_align must be 'centered' or 'trailing', got {window_align!r}"
        )
    if len(window_lags) != window_size:
        raise ValueError(
            "centered alignment requires an odd window_size "
            f"(got {window_size}); the reference's design matrix is "
            "inconsistent otherwise"
        )

    X = np.concatenate(
        [np.ones((window_size, 1))]
        + [
            np.expand_dims((1 / math.factorial(d)) * window_lags**d, -1)
            for d in range(1, taylor_degree + 1)
        ],
        axis=1,
    )
    if ew_span is not None:
        # reference uses alpha = 2/(span + 0.1) — NOT pandas' 2/(span+1);
        # keep exactly (featurize.py:374, SURVEY §2.4.4).
        ew_alpha = 2.0 / (ew_span + 0.1)
        obs_weights = ew_alpha * (1 - ew_alpha) ** np.abs(window_lags)
        obs_weights = obs_weights / np.sum(obs_weights)
        sqrt_w = np.sqrt(obs_weights)
    else:
        sqrt_w = np.ones(window_size)

    Xw = X * sqrt_w[:, None]

    def proj(rows: slice) -> tuple[list[int], np.ndarray, list[bool]]:
        """P such that β = P @ y[rows]: pinv of the weighted sub-design,
        times the √weights applied to y (y was pre-multiplied by √W in the
        reference before slicing).  zero_mask flags design columns that are
        all-zero in the slice (lstsq pins those β to exactly 0.0)."""
        sub_X = Xw[rows]
        sub_w = sqrt_w[rows]
        P = np.linalg.pinv(sub_X) * sub_w[None, :]
        zero_mask = [bool(np.all(sub_X[:, d] == 0.0)) for d in range(sub_X.shape[1])]
        return [int(l) for l in window_lags[rows]], P, zero_mask

    _, interior, _ = proj(slice(None))
    start: list[tuple[list[int], np.ndarray, list[bool], bool]] = []
    end: list[tuple[list[int], np.ndarray, list[bool], bool]] = []
    # With ew_span set, the reference computes y ← W·y as a dense diagonal
    # matmul BEFORE slicing edge windows (featurize.py:381): 0·NaN = NaN, so
    # a structural NaN at any pre/post-series window position contaminates
    # the whole column and the truncated edge fit comes out NaN — except
    # exact-zero null-space components (LAPACK gelsd zeroes them without
    # touching the RHS) and fits whose slice is empty (β = 0).  Verified
    # against the reference.  Trailing edge i covers pre-series positions
    # iff i < w-1, so i = w-1 (a full window the reference still routes
    # through the edge loop, quirk §2.4.2) stays clean; centered edges are
    # always contaminated.
    ew = ew_span is not None
    if fill_edges:
        if window_align == "centered":
            for i in range(half_window):
                # row i: drop the first (hw - i) window rows (before series
                # start) — featurize.py:397-399
                l, P, zm = proj(slice(half_window - i, None))
                start.append((l, P, zm, ew))
                # row n-1-i: keep the first (hw + i + 1) rows — :401-403
                l, P, zm = proj(slice(None, half_window + i + 1))
                end.append((l, P, zm, ew))
        else:
            for i in range(window_size):
                # row i: keep the last i rows of the window — :412-416
                # (i=0 → empty fit → lstsq min-norm solution β = 0)
                l, P, zm = proj(slice(window_size - i, None))
                start.append((l, P, zm, ew and 0 < i < window_size - 1))
    return TaylorMatrices(
        lags=[int(l) for l in window_lags],
        interior=interior,
        start=start,
        end=end,
        half_window=half_window,
    )


# ---------------------------------------------------------------------------
# twin renderers — MUST keep identical term order so float sums agree


def _combo_col(c: str, lags: list[int], coefs: np.ndarray, w) -> Column:
    """Spark rendering of Σ_j coefs[j] · y_{t+lags[j]} (left-assoc)."""
    terms = []
    for coef, l in zip(coefs, lags):
        if l < 0:
            val = F.lag(c, -l).over(w)
        elif l > 0:
            val = F.lead(c, l).over(w)
        else:
            val = F.col(c)
        terms.append(F.lit(float(coef)) * val)
    if not terms:
        return F.lit(0.0)
    return reduce(lambda a, b: a + b, terms)


def _combo_sql(c: str, lags: list[int], coefs: np.ndarray, over: str) -> str:
    terms = []
    for coef, l in zip(coefs, lags):
        if l < 0:
            val = f"LAG({c}, {-l}) OVER {over}"
        elif l > 0:
            val = f"LEAD({c}, {l}) OVER {over}"
        else:
            val = c
        # CAST('…' AS DOUBLE): a bare literal would parse as DECIMAL and
        # convert via int/10^scale (double-rounding, off-by-one-ulp vs the
        # strtod parse Spark's lit() effectively uses)
        terms.append(f"CAST('{float(coef)!r}' AS DOUBLE) * {val}")
    if not terms:
        return "0.0"
    return "(" + " + ".join(terms) + ")"


def _edge_value_col(c: str, edge, d: int, w) -> Column | None:
    """Edge-fit value for coefficient d, or None → NULL (skip branch)."""
    lags_i, P, zero_mask, contaminated = edge
    if zero_mask[d]:
        return F.lit(0.0)  # null-space coefficient: lstsq pins it to 0
    if contaminated:
        return None  # structural NaN (ew matmul) → NULL
    return _combo_col(c, lags_i, P[d], w)


def _edge_value_sql(c: str, edge, d: int, over: str) -> str | None:
    lags_i, P, zero_mask, contaminated = edge
    if zero_mask[d]:
        return "0.0"
    if contaminated:
        return None
    return _combo_sql(c, lags_i, P[d], over)


def _beta_exprs_spark(
    c: str,
    m: TaylorMatrices,
    window_size: int,
    window_align: str,
    fill_edges: bool,
    strict_reference_edges: bool,
    w,
    rn0: Column,
    n: Column,
) -> list[Column]:
    """One Column per coefficient d, with edge/interior CASE dispatch."""
    out = []
    hw = m.half_window
    n_coef = m.interior.shape[0]
    for d in range(n_coef):
        interior = _combo_col(c, m.lags, m.interior[d], w)
        if window_align == "trailing":
            lo = window_size if strict_reference_edges else window_size - 1
            expr = F.when(rn0 >= lo, interior)
            if fill_edges:
                for i in reversed(range(len(m.start))):
                    val = _edge_value_col(c, m.start[i], d, w)
                    if val is None:
                        continue
                    expr = F.when(rn0 == i, val).otherwise(expr)
        else:
            hi_gap = hw + 1 if strict_reference_edges else hw
            expr = F.when((rn0 >= hw) & (rn0 <= n - 1 - hi_gap), interior)
            if fill_edges:
                for i in reversed(range(len(m.start))):
                    val = _edge_value_col(c, m.start[i], d, w)
                    if val is None:
                        continue
                    expr = F.when(rn0 == i, val).otherwise(expr)
                for i in reversed(range(len(m.end))):
                    val = _edge_value_col(c, m.end[i], d, w)
                    if val is None:
                        continue
                    expr = F.when(rn0 == n - 1 - i, val).otherwise(expr)
        out.append(expr)
    return out


def taylor_sql_columns(
    c: str,
    group_columns,
    order_by,
    taylor_degree: int = 1,
    window_size: int = 21,
    window_align: str = "centered",
    ew_span: float | None = None,
    fill_edges: bool = True,
    strict_reference_edges: bool = True,
) -> list[tuple[str, str]]:
    """ANSI-SQL twin of the Spark path: [(column_name, select_expr), ...].

    Used to generate the DuckDB oracle; term order matches the Spark
    renderer exactly so double arithmetic is bit-identical.  Requires a
    named window ``w`` (partition/order) to be interpolated by the caller —
    we inline it for self-containment.
    """
    m = taylor_matrices(taylor_degree, window_size, window_align, ew_span, fill_edges)
    groups = ", ".join(_as_list(group_columns))
    order = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {groups} ORDER BY {order})"
    rn0 = f"(ROW_NUMBER() OVER {over} - 1)"
    n = f"COUNT(*) OVER (PARTITION BY {groups})"
    hw = m.half_window
    out = []
    for d in range(m.interior.shape[0]):
        interior = _combo_sql(c, m.lags, m.interior[d], over)
        branches = []
        if window_align == "trailing":
            if fill_edges:
                for i, edge in enumerate(m.start):
                    val = _edge_value_sql(c, edge, d, over)
                    if val is None:
                        continue
                    branches.append(f"WHEN {rn0} = {i} THEN {val}")
            lo = window_size if strict_reference_edges else window_size - 1
            branches.append(f"WHEN {rn0} >= {lo} THEN {interior}")
        else:
            if fill_edges:
                # end edges before start edges — same branch order as the
                # Spark renderer (matters only for tiny groups n ≤ 2·hw
                # where the cases can overlap)
                for i, edge in enumerate(m.end):
                    val = _edge_value_sql(c, edge, d, over)
                    if val is None:
                        continue
                    branches.append(f"WHEN {rn0} = {n} - 1 - {i} THEN {val}")
                for i, edge in enumerate(m.start):
                    val = _edge_value_sql(c, edge, d, over)
                    if val is None:
                        continue
                    branches.append(f"WHEN {rn0} = {i} THEN {val}")
            hi_gap = hw + 1 if strict_reference_edges else hw
            branches.append(
                f"WHEN {rn0} >= {hw} AND {rn0} <= {n} - 1 - {hi_gap} THEN {interior}"
            )
        name = taylor_name(c, taylor_degree, d, window_size, window_align, ew_span)
        out.append((name, "CASE " + " ".join(branches) + " ELSE NULL END"))
    return out


def windowed_taylor_coefs(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    taylor_degree: int = 1,
    window_size=21,
    window_align="centered",
    ew_span=None,
    fill_edges: bool = True,
    order_by=None,
    strict_reference_edges: bool = True,
) -> tuple[DataFrame, list]:
    """Public API, reference signature + explicit ``order_by``.

    ``window_size`` / ``window_align`` / ``ew_span`` accept scalars or lists;
    features are emitted for the cartesian product (featurize.py:491).
    """
    if feature_names is None:
        feature_names = []
    columns = _as_list(columns)
    window_sizes = _as_list(window_size)
    aligns = _as_list(window_align) or ["centered"]
    spans = ew_span if isinstance(ew_span, list) else [ew_span]

    groups = _as_list(group_columns)
    order = _as_list(order_by)
    # Fast path: render the coefficient expressions as SQL text and let the
    # JVM parse them in ONE selectExpr.  The Column-builder path constructs
    # thousands of Column objects for the edge-CASE tree — one py4j round
    # trip each — costing ~2.5 s PER BUILD for d=2/w=14 (measured; the SQL
    # parse of the identical tree is ~50 ms).  Both paths render the same
    # term order, so results are bit-identical (the SQL renderer IS the
    # oracle twin).  Falls back to Columns when group/order entries aren't
    # plain column names.
    sql_ok = all(isinstance(x, str) for x in groups + order) and groups and order
    if sql_ok:
        exprs: list[str] = []
        for c, ws, align, span in product(columns, window_sizes, aligns, spans):
            for name, expr in taylor_sql_columns(
                c,
                groups,
                order,
                taylor_degree,
                ws,
                align,
                span,
                fill_edges,
                strict_reference_edges,
            ):
                exprs.append(f"{expr} AS {name}")
                feature_names.append(name)
        return data.selectExpr("*", *exprs), feature_names

    w = make_window(group_columns, order_by)
    wp = Window.partitionBy(*groups) if groups else Window.partitionBy()
    rn0 = F.row_number().over(w) - F.lit(1)
    n = F.count(F.lit(1)).over(wp)

    new_cols: list[Column] = []
    for c, ws, align, span in product(columns, window_sizes, aligns, spans):
        m = taylor_matrices(taylor_degree, ws, align, span, fill_edges)
        betas = _beta_exprs_spark(
            c, m, ws, align, fill_edges, strict_reference_edges, w, rn0, n
        )
        for d, beta in enumerate(betas):
            name = taylor_name(c, taylor_degree, d, ws, align, span)
            new_cols.append(beta.alias(name))
            feature_names.append(name)
    return data.select("*", *new_cols), feature_names


def _edge_value_np(edge, win, all_lags, t):
    """Numpy twin of _edge_value_col for the applyInPandas fallback."""
    lags_i, P, zero_mask, contaminated = edge
    n_coef = P.shape[0]
    out = np.full(n_coef, np.nan)
    if contaminated:
        vals = None
    else:
        vals = np.array([win[all_lags.index(l), t] for l in lags_i])
        fit = P @ vals if len(vals) else np.zeros(n_coef)
    for d in range(n_coef):
        if zero_mask[d]:
            out[d] = 0.0
        elif vals is not None:
            out[d] = fit[d]
    return out


def windowed_taylor_coefs_pandas(
    data: DataFrame,
    columns,
    group_columns,
    order_by,
    taylor_degree: int = 1,
    window_size: int = 21,
    window_align: str = "centered",
    ew_span=None,
    fill_edges: bool = True,
    strict_reference_edges: bool = True,
) -> DataFrame:
    """Grouped-map fallback: same math via ``applyInPandas`` lstsq per group.

    Exists to property-test the expression path (the two must agree to float
    tolerance) and as the escape hatch for future non-constant designs.
    One Arrow exchange per group batch; expression path is preferred.
    """
    import pandas as pd

    columns = _as_list(columns)
    groups = _as_list(group_columns)
    order = _as_list(order_by)

    names = [
        taylor_name(c, taylor_degree, d, window_size, window_align, ew_span)
        for c in columns
        for d in range(taylor_degree + 1)
    ]
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(data.schema.fields) + [StructField(nm, DoubleType()) for nm in names]
    )
    mats = taylor_matrices(taylor_degree, window_size, window_align, ew_span, fill_edges)
    hw = mats.half_window

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        nrows = len(pdf)
        for c in columns:
            y = pdf[c].to_numpy(dtype="float64")
            beta = np.full((taylor_degree + 1, nrows), np.nan)
            # windows matrix: rows = window lags, cols = time
            win = np.full((window_size, nrows), np.nan)
            for j, l in enumerate(mats.lags):
                if l < 0:
                    win[j, -l:] = y[:l] if l != 0 else y
                elif l > 0:
                    win[j, :-l] = y[l:]
                else:
                    win[j, :] = y
            if window_align == "trailing":
                lo = window_size if strict_reference_edges else window_size - 1
                for t in range(lo, nrows):
                    beta[:, t] = mats.interior @ win[:, t]
                if fill_edges:
                    for i, edge in enumerate(mats.start):
                        if i >= nrows:
                            continue
                        beta[:, i] = _edge_value_np(edge, win, mats.lags, i)
            else:
                hi_gap = hw + 1 if strict_reference_edges else hw
                for t in range(hw, nrows - hi_gap):
                    beta[:, t] = mats.interior @ win[:, t]
                if fill_edges:
                    for i, edge in enumerate(mats.start):
                        if i >= nrows:
                            continue
                        beta[:, i] = _edge_value_np(edge, win, mats.lags, i)
                    for i, edge in enumerate(mats.end):
                        t = nrows - 1 - i
                        if t < 0:
                            continue
                        beta[:, t] = _edge_value_np(edge, win, mats.lags, t)
            for d in range(taylor_degree + 1):
                pdf[taylor_name(c, taylor_degree, d, window_size, window_align, ew_span)] = beta[d]
        return pdf

    return data.groupBy(*groups).applyInPandas(fit_group, schema=schema)
