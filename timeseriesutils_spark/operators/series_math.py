"""Derived series signals: EWMA, differencing, percent change, rolling
z-score / anomaly flags.

All pure built-in window expressions (one exchange on the group keys,
whole-stage codegen, no Python).  Where float arithmetic is involved the
Spark expression tree and the generated DuckDB oracle SQL are rendered
from the same constants in the same association order, so results are
bit-identical across engines — the same twin-renderer discipline as
operators/taylor.py.

``ewma`` uses the reference's exponential-weight convention
(featurize.py:372-381): alpha = 2/(ew_span + 0.1) — NOT pandas'
2/(span+1) — with weights alpha*(1-alpha)^j over a *bounded* trailing
window of ``window_size`` rows, normalized to sum 1.  A bounded window
makes the op a fixed linear combination of lags (exactly computable,
shuffle-free, oracle-expressible) instead of an unbounded recursion;
rows before the first full window are NULL, matching the reference's
trailing-window edge policy.

``rolling_zscore`` quantizes values to integer units of 10^-scale first
(floor(v*10^s + 0.5): the one rounding Spark and DuckDB compute
identically), so window sums are exact integers and mean/variance are
deterministic functions of them — no float-accumulation-order hazard in
either engine.  |quantized value| must stay below ~3e9·sqrt(1/w) … in
practice: values up to ~1e9/10^scale are safe for window sizes ≤ 1000
(sum of squares bounded by 9.2e18 / bigint).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.window_features import _as_list, make_window


def ewma_weights(window_size: int, ew_span: float) -> list[float]:
    """Normalized trailing EW weights, j=0 (current row) … w-1."""
    alpha = 2.0 / (ew_span + 0.1)  # reference featurize.py:374
    u = [alpha * (1.0 - alpha) ** j for j in range(window_size)]
    tot = sum(u)
    return [x / tot for x in u]


def ewma_name(column: str, window_size: int, ew_span) -> str:
    # integral spans render without the '.0' (a dot in a column name breaks
    # ANSI identifiers); fractional spans use 'p' for the point
    s = int(ew_span) if float(ew_span).is_integer() else str(ew_span).replace(".", "p")
    return f"{column}_ewma_w{window_size}_s{s}"


def ewma(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    window_size: int = 10,
    ew_span: float = 5.0,
    order_by=None,
) -> tuple[DataFrame, list]:
    """Trailing exponentially-weighted mean as Σ_j w_j · lag_j(c); NULL
    until a full window exists (any NULL lag nulls the sum — Spark's
    null arithmetic is the edge guard)."""
    if feature_names is None:
        feature_names = []
    w = make_window(group_columns, order_by)
    wts = ewma_weights(window_size, ew_span)
    new_cols: list[Column] = []
    for c in _as_list(columns):
        terms = [
            F.lit(wt) * (F.lag(c, j).over(w) if j else F.col(c))
            for j, wt in enumerate(wts)
        ]
        name = ewma_name(c, window_size, ew_span)
        new_cols.append(reduce(lambda a, b: a + b, terms).alias(name))
        feature_names.append(name)
    return data.select("*", *new_cols), feature_names


def ewma_sql_columns(
    columns, group_columns, order_by, window_size: int = 10, ew_span: float = 5.0
) -> list[tuple[str, str]]:
    """DuckDB twin of ``ewma`` — same constants, same term order."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))})"
    )
    wts = ewma_weights(window_size, ew_span)
    out = []
    for c in _as_list(columns):
        terms = [
            f"CAST('{wt!r}' AS DOUBLE) * "
            + (f"LAG({c}, {j}) OVER {over}" if j else c)
            for j, wt in enumerate(wts)
        ]
        out.append((ewma_name(c, window_size, ew_span), "(" + " + ".join(terms) + ")"))
    return out


def diff(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    periods=1,
    order_by=None,
) -> tuple[DataFrame, list]:
    """k-period difference ``{c}_diff{k}`` = c − lag(c, k)."""
    if feature_names is None:
        feature_names = []
    w = make_window(group_columns, order_by)
    new_cols = []
    for c in _as_list(columns):
        for k in _as_list(periods):
            name = f"{c}_diff{k}"
            new_cols.append((F.col(c) - F.lag(c, k).over(w)).alias(name))
            feature_names.append(name)
    return data.select("*", *new_cols), feature_names


def pct_change(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    periods=1,
    order_by=None,
) -> tuple[DataFrame, list]:
    """k-period relative change ``{c}_pctchg{k}`` = c / lag(c,k) − 1;
    NULL when the base is 0 or missing (explicit guard — double
    division-by-zero semantics differ between engines)."""
    if feature_names is None:
        feature_names = []
    w = make_window(group_columns, order_by)
    new_cols = []
    for c in _as_list(columns):
        for k in _as_list(periods):
            base = F.lag(c, k).over(w)
            name = f"{c}_pctchg{k}"
            new_cols.append(
                F.when(base != 0, F.col(c) / base - F.lit(1.0)).alias(name)
            )
            feature_names.append(name)
    return data.select("*", *new_cols), feature_names


def _zscore_exprs(qc: Column, frame, window_size: int):
    """(n, mean_q, var_q) over the frame, from exact integer sums."""
    n = F.count(qc).over(frame)
    s = F.sum(qc).over(frame)
    s2 = F.sum(qc * qc).over(frame)
    nd = n.cast("double")
    mean_q = s.cast("double") / nd
    var_q = (s2.cast("double") - s.cast("double") * s.cast("double") / nd) / (
        nd - F.lit(1.0)
    )
    return n, mean_q, var_q


def rolling_zscore(
    data: DataFrame,
    column: str,
    group_columns=None,
    window_size: int = 30,
    order_by=None,
    threshold: float = 3.0,
    scale: int = 6,
) -> DataFrame:
    """Rolling mean / std / z-score / anomaly flag over a trailing window
    of ``window_size`` rows (full windows only — the standard
    control-chart shape).  Appends::

        {c}_rollmean   rolling mean (original units)
        {c}_rollstd    rolling sample std (original units)
        {c}_zscore     (x − mean) / std
        {c}_anomaly    |z| > threshold  (NULL where z undefined)
    """
    w = make_window(group_columns, order_by)
    frame = w.rowsBetween(-(window_size - 1), Window.currentRow)
    mult = float(10**scale)
    qc = F.floor(F.col(column) * F.lit(mult) + F.lit(0.5)).cast("bigint")
    # Catalyst does NOT deduplicate textually-identical window expressions
    # (each reference becomes its own _we slot in WindowExec), so the three
    # base aggregates are materialized ONCE as named columns and every
    # derived formula references the attributes — 3 window aggs instead of
    # the 35 the inlined form compiled to (measured 2.1 → 0.9 s at sf0.1)
    tmp = data.select(
        "*",
        qc.alias("_zs_q"),
        F.count(qc).over(frame).alias("_zs_n"),
        F.sum(qc).over(frame).alias("_zs_s"),
        F.sum(qc * qc).over(frame).alias("_zs_s2"),
    )
    nd = F.col("_zs_n").cast("double")
    sd = F.col("_zs_s").cast("double")
    mean_q = sd / nd
    var_q = (F.col("_zs_s2").cast("double") - sd * sd / nd) / (nd - F.lit(1.0))
    full = F.col("_zs_n") >= window_size
    # exact integer sums can still cancel to a tiny negative var in double;
    # clamp identically in both engines (sqrt(negative) semantics differ)
    std_q = F.sqrt(F.greatest(var_q, F.lit(0.0)))
    z = (F.col("_zs_q").cast("double") - mean_q) / std_q
    c = column
    return tmp.select(
        *data.columns,
        F.when(full, mean_q / F.lit(mult)).alias(f"{c}_rollmean"),
        F.when(full, std_q / F.lit(mult)).alias(f"{c}_rollstd"),
        F.when(full & (std_q > 0), z).alias(f"{c}_zscore"),
        # int, not boolean: nullable booleans round-trip as None/NaN
        # inconsistently through Arrow/pandas across engines
        F.when(full & (std_q > 0), (F.abs(z) > F.lit(threshold)).cast("int")).alias(
            f"{c}_anomaly"
        ),
    )


def rolling_zscore_sql_columns(
    column: str,
    group_columns,
    order_by,
    window_size: int = 30,
    threshold: float = 3.0,
    scale: int = 6,
) -> list[tuple[str, str]]:
    """DuckDB twin of ``rolling_zscore`` (same tree, bit-identical)."""
    c = column
    mult = float(10**scale)
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))} "
        f"ROWS BETWEEN {window_size - 1} PRECEDING AND CURRENT ROW)"
    )
    q = f"CAST(FLOOR({c} * {mult!r} + 0.5) AS BIGINT)"
    n = f"COUNT({q}) OVER {over}"
    s = f"SUM({q}) OVER {over}"
    s2 = f"SUM({q} * {q}) OVER {over}"
    nd = f"CAST({n} AS DOUBLE)"
    mean_q = f"(CAST({s} AS DOUBLE) / {nd})"
    var_q = f"((CAST({s2} AS DOUBLE) - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE) / {nd}) / ({nd} - 1.0))"
    std_q = f"SQRT(GREATEST({var_q}, 0.0))"
    z = f"((CAST({q} AS DOUBLE) - {mean_q}) / {std_q})"
    full = f"{n} >= {window_size}"
    return [
        (f"{c}_rollmean", f"CASE WHEN {full} THEN {mean_q} / {mult!r} END"),
        (f"{c}_rollstd", f"CASE WHEN {full} THEN {std_q} / {mult!r} END"),
        (f"{c}_zscore", f"CASE WHEN {full} AND {std_q} > 0 THEN {z} END"),
        (
            f"{c}_anomaly",
            f"CASE WHEN {full} AND {std_q} > 0 THEN CAST(ABS({z}) > {threshold!r} AS INTEGER) END",
        ),
    ]


def rolling_quantile(
    df,
    column: str,
    q: float,
    group_columns=None,
    window_size: int = 15,
    order_by=None,
    suffix: str | None = None,
):
    """Exact continuous quantile over a trailing rows window (rolling
    median for q=0.5 — the outlier-robust center line that
    rolling_zscore's mean/std is not).

    Semantics = SQL ``quantile_cont`` over the same frame: with the
    window's non-null values sorted ascending, h = (n−1)·q, result =
    a[⌊h⌋]·(1−frac) + a[⌊h⌋+1]·frac (frac = h−⌊h⌋) — the exact lerp
    form DuckDB computes; the algebraically-equal a+frac·(b−a) differs
    in the last ulp for some inputs.  Selection plus two multiplies and
    an add on doubles — deterministic across engines and partitionings
    (no accumulation order involved).

    Implementation: ``sort_array(collect_list)`` over the rows frame.
    Cost per row is O(w log w) — fine for the bounded windows this is
    for; at very large w switch to a t-digest sketch (approximate).
    """
    from timeseriesutils_spark.operators.window_features import _as_list, make_window

    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    w = make_window(group_columns, _as_list(order_by)).rowsBetween(
        -(window_size - 1), Window.currentRow
    )
    c = F.col(column)
    # materialize the sorted window ONCE: Catalyst keeps each inlined
    # reference to the collect_list window expression as its own
    # WindowExec slot, so the naive form sorts the window ~5× per row
    tmp = df.select(
        "*", F.sort_array(F.collect_list(c).over(w)).alias("_rq_arr")
    )
    arr = F.col("_rq_arr")
    n = F.size(arr)
    h = (n - 1).cast("double") * F.lit(float(q))
    lo = F.floor(h).cast("int")
    frac = h - lo.cast("double")
    base = F.element_at(arr, lo + 1).cast("double")
    nxt = F.element_at(arr, F.least(lo + 2, n)).cast("double")
    out = F.when(n > 0, base * (F.lit(1.0) - frac) + nxt * frac)
    name = suffix or f"{column}_q{int(q * 100)}_w{window_size}"
    return tmp.select(*df.columns, out.alias(name))


def rolling_quantile_sql_column(
    column: str,
    q: float,
    group_columns,
    order_by,
    window_size: int = 15,
    suffix: str | None = None,
) -> tuple[str, str]:
    """(name, expr) DuckDB twin: quantile_cont over the same frame."""
    over = (
        f"(PARTITION BY {', '.join(group_columns)} ORDER BY {', '.join(order_by)} "
        f"ROWS BETWEEN {window_size - 1} PRECEDING AND CURRENT ROW)"
    )
    name = suffix or f"{column}_q{int(q * 100)}_w{window_size}"
    return name, f"quantile_cont({column}, {q}) OVER {over}"


def rolling_corr(
    data: DataFrame,
    col_x: str,
    col_y: str,
    group_columns=None,
    window_size: int = 30,
    order_by=None,
    scale_x: int = 2,
    scale_y: int = 2,
    suffix: str | None = None,
) -> DataFrame:
    """Rolling Pearson correlation between two columns over a trailing
    rows window (full windows only) — the lead/lag co-movement signal
    between two series (e.g. does quantity track price this month).

    Same exactness trick as ``rolling_zscore``: both inputs are
    quantized to integers (floor(v·10^s + 0.5)), so the five window
    sums (Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs and the correlation
    is a deterministic double function of them — independent of
    partitioning and identical in the DuckDB twin.  Correlation is
    scale-invariant, so quantization only perturbs via rounding of the
    inputs themselves (defined semantics, mirrored in the oracle).

    Range guard: |x|·10^scale_x must stay ≲ 3e9/√w so Σx² fits BIGINT
    (same bound as rolling_zscore); products Σxy likewise.
    """
    w = make_window(group_columns, order_by)
    frame = w.rowsBetween(-(window_size - 1), Window.currentRow)
    qx = F.floor(F.col(col_x) * F.lit(float(10**scale_x)) + F.lit(0.5)).cast("bigint")
    qy = F.floor(F.col(col_y) * F.lit(float(10**scale_y)) + F.lit(0.5)).cast("bigint")
    # pair-complete windows only: count rows where BOTH sides are non-null
    pair = F.when(qx.isNotNull() & qy.isNotNull(), F.lit(1))
    px = F.when(pair.isNotNull(), qx)
    py = F.when(pair.isNotNull(), qy)
    # materialize the six window aggregates once as named columns —
    # Catalyst keeps every inlined reference as a separate WindowExec slot
    # (same fix as rolling_zscore; the output formula references each sum
    # 2-4 times, which would compile to ~17 window aggs instead of 6)
    tmp = data.select(
        "*",
        F.count(pair).over(frame).alias("_rc_n"),
        F.sum(px).over(frame).alias("_rc_sx"),
        F.sum(py).over(frame).alias("_rc_sy"),
        F.sum(px * py).over(frame).alias("_rc_sxy"),
        F.sum(px * px).over(frame).alias("_rc_sxx"),
        F.sum(py * py).over(frame).alias("_rc_syy"),
    )
    n, sx, sy = F.col("_rc_n"), F.col("_rc_sx"), F.col("_rc_sy")
    sxy, sxx, syy = F.col("_rc_sxy"), F.col("_rc_sxx"), F.col("_rc_syy")
    num = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    den = F.sqrt(F.greatest(vx, F.lit(0.0))) * F.sqrt(F.greatest(vy, F.lit(0.0)))
    full = n >= window_size
    name = suffix or f"corr_{col_x}_{col_y}_w{window_size}"
    return tmp.select(
        *data.columns, F.when(full & (den > 0), num / den).alias(name)
    )


def rolling_corr_sql_column(
    col_x: str,
    col_y: str,
    group_columns,
    order_by,
    window_size: int = 30,
    scale_x: int = 2,
    scale_y: int = 2,
    suffix: str | None = None,
) -> tuple[str, str]:
    """(name, expr) DuckDB twin of :func:`rolling_corr`."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))} "
        f"ROWS BETWEEN {window_size - 1} PRECEDING AND CURRENT ROW)"
    )
    qx = f"CAST(FLOOR({col_x} * {float(10 ** scale_x)!r} + 0.5) AS BIGINT)"
    qy = f"CAST(FLOOR({col_y} * {float(10 ** scale_y)!r} + 0.5) AS BIGINT)"
    pair = f"CASE WHEN {qx} IS NOT NULL AND {qy} IS NOT NULL THEN 1 END"
    px = f"CASE WHEN ({pair}) IS NOT NULL THEN {qx} END"
    py = f"CASE WHEN ({pair}) IS NOT NULL THEN {qy} END"
    n = f"COUNT({pair}) OVER {over}"
    sx = f"SUM({px}) OVER {over}"
    sy = f"SUM({py}) OVER {over}"
    sxy = f"SUM(({px}) * ({py})) OVER {over}"
    sxx = f"SUM(({px}) * ({px})) OVER {over}"
    syy = f"SUM(({py}) * ({py})) OVER {over}"
    num = f"CAST(({n} * {sxy} - {sx} * {sy}) AS DOUBLE)"
    vx = f"CAST(({n} * {sxx} - {sx} * {sx}) AS DOUBLE)"
    vy = f"CAST(({n} * {syy} - {sy} * {sy}) AS DOUBLE)"
    den = f"(SQRT(GREATEST({vx}, 0.0)) * SQRT(GREATEST({vy}, 0.0)))"
    name = suffix or f"corr_{col_x}_{col_y}_w{window_size}"
    return name, f"CASE WHEN {n} >= {window_size} AND {den} > 0 THEN {num} / {den} END"


def _lerp_sorted(arr, q: float):
    """quantile_cont over an already-sorted array column: h=(n-1)q,
    a[⌊h⌋+1]·(1−frac) + a[min(⌊h⌋+2,n)]·frac — the exact expression
    shape rolling_quantile documents; kept identical in the SQL twin."""
    n = F.size(arr)
    h = (n - 1).cast("double") * F.lit(float(q))
    lo = F.floor(h).cast("int")
    frac = h - lo.cast("double")
    base = F.element_at(arr, lo + 1).cast("double")
    nxt = F.element_at(arr, F.least(lo + 2, n)).cast("double")
    return F.when(n > 0, base * (F.lit(1.0) - frac) + nxt * frac)


def _lerp_sorted_const(arr, q: float, n: int):
    """:func:`_lerp_sorted` for a frame already FILTERED to arrays of
    exactly ``n`` elements: h = (n−1)·q and the two element indices are
    compile-time constants, so each quantile collapses to two
    ``element_at`` + two literal multiplies — bit-identical values by
    construction (same IEEE h/frac the runtime tree computes), but the
    generated code is ~10× smaller, which matters twice at bench scale:
    the generic tree ran INTERPRETED for several invocations before C2
    compiled it (wis_eval measured 13.4 s cold / 2.9 s warm generic vs
    2.1 s COLD with constant indices, BASELINE.md round-9)."""
    h = (n - 1) * q
    lo = int(h // 1)
    frac = h - lo
    base = F.element_at(arr, lo + 1).cast("double")
    nxt = F.element_at(arr, min(lo + 2, n)).cast("double")
    return base * F.lit(1.0 - frac) + nxt * F.lit(frac)


def _lerp_sorted_sql(arr: str, q: float) -> str:
    return (
        f"CASE WHEN len({arr}) > 0 THEN "
        f"CAST({arr}[CAST(FLOOR(CAST(len({arr}) - 1 AS DOUBLE) * {q!r}) AS INT) + 1] AS DOUBLE)"
        f" * (1.0 - (CAST(len({arr}) - 1 AS DOUBLE) * {q!r}"
        f" - CAST(CAST(FLOOR(CAST(len({arr}) - 1 AS DOUBLE) * {q!r}) AS INT) AS DOUBLE)))"
        f" + CAST({arr}[LEAST(CAST(FLOOR(CAST(len({arr}) - 1 AS DOUBLE) * {q!r}) AS INT) + 2, len({arr}))] AS DOUBLE)"
        f" * (CAST(len({arr}) - 1 AS DOUBLE) * {q!r}"
        f" - CAST(CAST(FLOOR(CAST(len({arr}) - 1 AS DOUBLE) * {q!r}) AS INT) AS DOUBLE)) END"
    )


# MAD → σ consistency constant for normal data (1/Φ⁻¹(3/4))
MAD_K = 1.4826


def _lerp_rows_np(sw, m, q: float):
    """Row-wise :func:`_lerp_sorted` over a (rows, W) sorted-window
    matrix with ``m`` valid (non-NaN, sorted-first) entries per row —
    the identical IEEE tree: h=(m−1)·q, a[⌊h⌋]·(1−frac)+a[min(⌊h⌋+1,
    m−1)]·frac (0-based).  Rows with m=0 are garbage; caller masks."""
    import numpy as np

    mm = np.maximum(m, 1)
    h = (m - 1).astype(np.float64) * q
    lo = np.floor(h).astype(np.int64)
    frac = h - lo.astype(np.float64)
    base = np.take_along_axis(sw, lo[:, None], 1)[:, 0]
    nxt = np.take_along_axis(
        sw, np.minimum(lo + 1, mm - 1)[:, None], 1
    )[:, 0]
    return base * (1.0 - frac) + nxt * frac


def _roll_med_mad_arrow(df, column: str, group_columns, order_by,
                        lo_off: int, hi_off: int):
    """Shared grouped-Arrow kernel for :func:`rolling_mad` /
    :func:`hampel_filter` (round-14, guide §4.2): per row of each
    ordered series, the sorted window of non-NULL values, the
    _lerp_sorted median, and the MAD about it — replacing the per-row
    ``collect_list → sort_array → transform → array_sort`` HOF chain
    with two vectorized (rows, W) numpy sorts per series.

    Bit-identity: the window multiset equals collect_list's (NaN pads
    for NULLs/edges sort last and are excluded by the per-row valid
    count m); value picks are monotone under the decimal→double cast,
    and the lerp/deviation arithmetic is the identical IEEE expression
    shape.  NaN outputs convert to NULL through Arrow — exactly the
    relational ``CASE WHEN n > 0`` empty-window NULL.

    Emits every input column plus ``_med``/``_mad``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    order = _as_list(order_by)
    schema = StructType(
        list(df.schema.fields)
        + [StructField("_med", DoubleType()), StructField("_mad", DoubleType())]
    )
    W = hi_off - lo_off + 1
    npad_l, npad_r = -lo_off, hi_off

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        v = pd.to_numeric(pdf[column]).to_numpy(np.float64)
        padded = np.concatenate(
            [np.full(npad_l, np.nan), v, np.full(npad_r, np.nan)]
        )
        win = np.lib.stride_tricks.sliding_window_view(padded, W)
        sw = np.sort(win, axis=1)
        m = (W - np.isnan(win).sum(axis=1)).astype(np.int64)
        med = _lerp_rows_np(sw, m, 0.5)
        devs = np.sort(np.abs(win - med[:, None]), axis=1)
        mad = _lerp_rows_np(devs, m, 0.5)
        empty = m == 0
        med[empty] = np.nan
        mad[empty] = np.nan
        pdf["_med"] = med
        pdf["_mad"] = mad
        return pdf

    return df.groupBy(*g).applyInPandas(kern, schema)


def rolling_mad(
    df,
    column: str,
    group_columns=None,
    window_size: int = 15,
    order_by=None,
    thresh: float = 3.0,
    engine: str = "arrow",
):
    """Robust rolling anomaly detector: per trailing window, the median
    and the Median Absolute Deviation *from that window's own median*
    (the textbook MAD — not a two-pass approximation that measures each
    neighbor against its own window), plus a flag where
    |x − med| > thresh · 1.4826 · MAD.

    Unlike rolling_zscore's mean/std, one wild spike inside the window
    cannot inflate the scale estimate and mask itself — the breakdown
    point is 50%.  Cost: the window values are collected and sorted
    ONCE; the deviation array is derived from it with JVM higher-order
    functions (transform → abs → array_sort), so the whole op is one
    exchange + one sort per group and no Python.
    """
    from timeseriesutils_spark.operators.window_features import _as_list, make_window

    c = F.col(column)
    med_name = f"{column}_med_w{window_size}"
    mad_name = f"{column}_mad_w{window_size}"
    if engine == "arrow" and group_columns:
        # round-14 (guide §4.2): the per-row HOF chain as one grouped
        # Arrow kernel; flag arithmetic stays relational on _med/_mad
        # (engine="relational" keeps the HOF chain as the A/B control)
        tmp = _roll_med_mad_arrow(
            df, column, group_columns, order_by,
            -(window_size - 1), 0,
        )
    else:
        w = make_window(group_columns, _as_list(order_by)).rowsBetween(
            -(window_size - 1), Window.currentRow
        )
        tmp = df.select(
            "*", F.sort_array(F.collect_list(c).over(w)).alias("_mad_arr")
        )
        tmp = tmp.withColumn("_med", _lerp_sorted(F.col("_mad_arr"), 0.5))
        devs = F.array_sort(
            F.transform(F.col("_mad_arr"), lambda v: F.abs(v - F.col("_med")))
        )
        tmp = tmp.withColumn("_mad", _lerp_sorted(devs, 0.5))
    flag = F.abs(c - F.col("_med")) > F.lit(float(thresh) * MAD_K) * F.col("_mad")
    return tmp.select(
        *df.columns,
        F.col("_med").alias(med_name),
        F.col("_mad").alias(mad_name),
        flag.alias(f"{column}_mad_anomaly"),
    )


def rolling_mad_sql(
    table: str,
    select_cols: str,
    column: str,
    group_columns,
    order_by,
    window_size: int = 15,
    thresh: float = 3.0,
) -> str:
    """DuckDB twin of :func:`rolling_mad` (full query text)."""
    over = (
        f"(PARTITION BY {', '.join(group_columns)} ORDER BY {', '.join(order_by)} "
        f"ROWS BETWEEN {window_size - 1} PRECEDING AND CURRENT ROW)"
    )
    med = _lerp_sorted_sql("arr", 0.5)
    mad = _lerp_sorted_sql("darr", 0.5)
    return f"""
WITH a AS (
  SELECT {select_cols}, list_sort(list({column}) OVER {over}) AS arr
  FROM {table}
),
m AS (SELECT *, {med} AS _med FROM a),
d AS (
  SELECT *, list_sort(list_transform(arr, v -> abs(v - _med))) AS darr FROM m
)
SELECT {select_cols}, _med AS {column}_med_w{window_size},
  {mad} AS {column}_mad_w{window_size},
  abs({column} - _med) > {float(thresh) * MAD_K!r} * {mad} AS {column}_mad_anomaly
FROM d
"""


def ew_volatility(
    data: DataFrame,
    column: str,
    group_columns=None,
    window_size: int = 10,
    ew_span: float = 5.0,
    order_by=None,
) -> DataFrame:
    """Exponentially-weighted variance / volatility over the same
    bounded trailing window and reference weight convention as ``ewma``:

        μ_t   = Σ_j w_j·x_{t-j}          (the ewma)
        var_t = Σ_j w_j·x_{t-j}² − μ_t²  (EW second moment − mean²)
        vol_t = sqrt(max(var_t, 0))

    Both weighted sums are fixed linear combinations of lags — same
    shuffle-free, codegen-resident, oracle-expressible shape as ewma;
    sqrt is correctly rounded (IEEE), so determinism carries through.
    The max(·, 0) guards the tiny negative residue the subtraction can
    produce when the window is constant."""
    w = make_window(group_columns, order_by)
    wts = ewma_weights(window_size, ew_span)
    mean_terms = [
        F.lit(wt) * (F.lag(column, j).over(w) if j else F.col(column))
        for j, wt in enumerate(wts)
    ]
    sq_terms = [
        F.lit(wt)
        * (
            (F.lag(column, j).over(w) * F.lag(column, j).over(w))
            if j
            else (F.col(column) * F.col(column))
        )
        for j, wt in enumerate(wts)
    ]
    mu = reduce(lambda a, b: a + b, mean_terms)
    m2 = reduce(lambda a, b: a + b, sq_terms)
    base = ewma_name(column, window_size, ew_span)
    var = m2 - mu * mu
    return data.select(
        "*",
        mu.alias(base),
        var.alias(base.replace("_ewma_", "_ewvar_")),
        # explicit null guard: greatest() IGNORES nulls in both engines,
        # which would turn the incomplete-window NULL into vol=0.0
        F.when(var.isNotNull(), F.sqrt(F.greatest(var, F.lit(0.0))))
        .alias(base.replace("_ewma_", "_ewvol_")),
    )


def ew_volatility_sql_columns(
    column: str, group_columns, order_by, window_size: int = 10, ew_span: float = 5.0
) -> list[tuple[str, str]]:
    """DuckDB twin of :func:`ew_volatility` — same constants, same term
    order, μ duplicated textually (identical double either way)."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))})"
    )
    wts = ewma_weights(window_size, ew_span)
    c = column
    mean_terms = [
        f"CAST('{wt!r}' AS DOUBLE) * " + (f"LAG({c}, {j}) OVER {over}" if j else c)
        for j, wt in enumerate(wts)
    ]
    sq_terms = [
        f"CAST('{wt!r}' AS DOUBLE) * "
        + (
            f"(LAG({c}, {j}) OVER {over} * LAG({c}, {j}) OVER {over})"
            if j
            else f"({c} * {c})"
        )
        for j, wt in enumerate(wts)
    ]
    mu = "(" + " + ".join(mean_terms) + ")"
    m2 = "(" + " + ".join(sq_terms) + ")"
    var = f"({m2} - {mu} * {mu})"
    base = ewma_name(c, window_size, ew_span)
    return [
        (base, mu),
        (base.replace("_ewma_", "_ewvar_"), var),
        (
            base.replace("_ewma_", "_ewvol_"),
            f"CASE WHEN {var} IS NOT NULL THEN sqrt(GREATEST({var}, 0.0)) END",
        ),
    ]


def rolling_moments(
    data: DataFrame,
    column: str,
    group_columns=None,
    window_size: int = 30,
    order_by=None,
    scale: int = 2,
) -> DataFrame:
    """Rolling skewness and excess kurtosis over a trailing rows window
    (full windows only) — the shape diagnostics beyond rolling_zscore's
    mean/std: heavy tails and asymmetry of the local distribution.

    Exactness: values quantized to integers (floor(v*10^s + 0.5)), the
    four power sums (Sx, Sx2, Sx3, Sx4) are exact BIGINTs over the
    frame, and the standardized moments are one fixed double formula of
    them (biased/population estimators, the plain moment definitions):

        mean = s1/n;  m2 = s2/n - mean^2
        m3 = s3/n - 3*mean*(s2/n) + 2*mean^3
        m4 = s4/n - 4*mean*(s3/n) + 6*mean^2*(s2/n) - 3*mean^4
        skew = m3 / m2^1.5;   ex_kurt = m4 / m2^2 - 3

    Range guard: |q|^4 * w must stay below 9.2e18 (e.g. |v| <= 50 at
    scale=2 -> q <= 5000, q^4 = 6.25e14, fine for w <= 1.4e4).

    Emits ``{column}_skew_w{w}`` and ``{column}_kurt_w{w}``; NULL until
    the window is full or when the window is constant (m2 == 0).
    """
    w = make_window(group_columns, order_by)
    frame = w.rowsBetween(-(window_size - 1), Window.currentRow)
    q = F.floor(F.col(column) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    tmp = data.select(
        "*",
        F.count(q).over(frame).alias("_m_n"),
        F.sum(q).over(frame).alias("_m_s1"),
        F.sum(q * q).over(frame).alias("_m_s2"),
        F.sum(q * q * q).over(frame).alias("_m_s3"),
        F.sum(q * q * q * q).over(frame).alias("_m_s4"),
    )
    n = F.col("_m_n").cast("double")
    s1 = F.col("_m_s1").cast("double")
    s2 = F.col("_m_s2").cast("double")
    s3 = F.col("_m_s3").cast("double")
    s4 = F.col("_m_s4").cast("double")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / n
        - F.lit(4.0) * mean * (s3 / n)
        + F.lit(6.0) * mean * mean * (s2 / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    full = F.col("_m_n") >= window_size
    ok = full & (m2 > 0)
    skew = F.when(ok, m3 / (m2 * F.sqrt(m2)))
    kurt = F.when(ok, m4 / (m2 * m2) - F.lit(3.0))
    return tmp.select(
        *data.columns,
        skew.alias(f"{column}_skew_w{window_size}"),
        kurt.alias(f"{column}_kurt_w{window_size}"),
    )


def rolling_moments_sql_columns(
    column: str,
    group_columns,
    order_by,
    window_size: int = 30,
    scale: int = 2,
) -> list[tuple[str, str]]:
    """[(name, expr)] DuckDB twin of :func:`rolling_moments` — identical
    quantization, BIGINT power sums, and double formula shapes."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))} "
        f"ROWS BETWEEN {window_size - 1} PRECEDING AND CURRENT ROW)"
    )
    q = f"CAST(FLOOR({column} * {float(10 ** scale)!r} + 0.5) AS BIGINT)"
    cnt = f"COUNT({q}) OVER {over}"
    n = f"CAST({cnt} AS DOUBLE)"
    s1 = f"CAST(SUM({q}) OVER {over} AS DOUBLE)"
    s2 = f"CAST(SUM(({q}) * ({q})) OVER {over} AS DOUBLE)"
    s3 = f"CAST(SUM(({q}) * ({q}) * ({q})) OVER {over} AS DOUBLE)"
    s4 = f"CAST(SUM(({q}) * ({q}) * ({q}) * ({q})) OVER {over} AS DOUBLE)"
    mean = f"({s1} / {n})"
    m2 = f"({s2} / {n} - {mean} * {mean})"
    m3 = f"({s3} / {n} - 3.0 * {mean} * ({s2} / {n}) + 2.0 * {mean} * {mean} * {mean})"
    m4 = (
        f"({s4} / {n} - 4.0 * {mean} * ({s3} / {n}) "
        f"+ 6.0 * {mean} * {mean} * ({s2} / {n}) "
        f"- 3.0 * {mean} * {mean} * {mean} * {mean})"
    )
    ok = f"{cnt} >= {window_size} AND {m2} > 0"
    return [
        (
            f"{column}_skew_w{window_size}",
            f"CASE WHEN {ok} THEN {m3} / ({m2} * SQRT({m2})) END",
        ),
        (
            f"{column}_kurt_w{window_size}",
            f"CASE WHEN {ok} THEN {m4} / ({m2} * {m2}) - 3.0 END",
        ),
    ]


def local_peaks(
    data: DataFrame,
    column: str,
    order_column: str,
    group_columns,
    neighborhood: int = 3,
    min_value: float | None = None,
    scale: int = 6,
) -> DataFrame:
    """Local-maximum peak detection per series: a row is a peak iff its
    value strictly exceeds every value in the ``neighborhood`` rows
    before it and is ≥ every value in the ``neighborhood`` rows after
    (the asymmetric tie rule keeps exactly the FIRST sample of a
    plateau — deterministic, no double-counted flat tops).  The
    spike/event-extraction primitive behind alert marking and cycle
    counting.

    Two frame-bounded window maxes over one series exchange — the
    rolling-feature plan family (window_features.rollmean).  Values
    compare as quantized int64, so peak decisions are bit-identical;
    ``prominence`` (value − highest neighbor) is exact integer units.

    Returns peak rows only: (groups…, order, value, prominence).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy(*groups).orderBy(order_column)
    prev_max = F.max("_q").over(w.rowsBetween(-neighborhood, -1))
    next_max = F.max("_q").over(w.rowsBetween(1, neighborhood))
    d = data.select(*groups, order_column, F.col(column), q.alias("_q")).withColumn(
        "_pm", prev_max
    ).withColumn("_nm", next_max)
    is_peak = (
        (F.col("_pm").isNull() | (F.col("_q") > F.col("_pm")))
        & (F.col("_nm").isNull() | (F.col("_q") >= F.col("_nm")))
    )
    if min_value is not None:
        is_peak = is_peak & (F.col("_q") >= F.lit(int(round(min_value * m))))
    neigh = F.greatest(
        F.coalesce(F.col("_pm"), F.lit(-(2**62))),
        F.coalesce(F.col("_nm"), F.lit(-(2**62))),
    )
    return d.filter(is_peak).select(
        *groups,
        order_column,
        column,
        ((F.col("_q") - neigh).cast("double") / F.lit(float(m))).alias("prominence"),
    )


def local_peaks_sql(
    table: str,
    column: str,
    order_column: str,
    group_columns,
    neighborhood: int = 3,
    min_value: float | None = None,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`local_peaks`."""
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    g = ", ".join(groups)
    m = 10**scale
    win = f"PARTITION BY {g} ORDER BY {order_column}"
    thr = (
        f"AND _q >= {int(round(min_value * m))}" if min_value is not None else ""
    )
    return f"""
WITH q AS (
  SELECT {g}, {order_column}, {column},
    CAST(FLOOR({column} * {m} + 0.5) AS BIGINT) AS _q
  FROM {table}
),
w AS (
  SELECT *,
    MAX(_q) OVER ({win} ROWS BETWEEN {neighborhood} PRECEDING AND 1 PRECEDING) AS _pm,
    MAX(_q) OVER ({win} ROWS BETWEEN 1 FOLLOWING AND {neighborhood} FOLLOWING) AS _nm
  FROM q
)
SELECT {g}, {order_column}, {column},
  CAST(_q - GREATEST(COALESCE(_pm, {-(2**62)}), COALESCE(_nm, {-(2**62)}))
       AS DOUBLE) / {float(m)!r} AS prominence
FROM w
WHERE (_pm IS NULL OR _q > _pm) AND (_nm IS NULL OR _q >= _nm) {thr}
"""


def rolling_slope(
    data: DataFrame,
    column: str,
    order_column: str,
    group_columns,
    window: int = 14,
    min_periods: int = 3,
    scale: int = 6,
) -> DataFrame:
    """Trailing OLS slope per row — the local-trend indicator
    ("momentum"): the least-squares slope of the last ``window`` values
    against their row positions, the windowed counterpart of the
    whole-series ``group_trend`` (operators/forecast.py).

    The regressor is the within-group row index, so all five windowed
    sufficient statistics (n, Σi, Σi², Σiy, Σy) are exact int64 window
    sums over one series exchange (values quantized; i·i and i·y
    products stay < 2^63 for series up to ~3e9 rows at scale 6).  The
    closed form divides exact integers in double, identical trees both
    engines.  Rows with fewer than ``min_periods`` points get NULL.

    Appends ``{column}_slope`` (units of value per step).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    w_ord = Window.partitionBy(*groups).orderBy(order_column)
    wf = w_ord.rowsBetween(-(window - 1), 0)
    d = data.withColumn("_i", F.row_number().over(w_ord).cast("bigint")).withColumn(
        "_y", q
    )
    # complete-case within the window: rows with NULL y contribute to
    # NONE of the five statistics (counting them in n/Σi/Σi² while the
    # y-sums skip them would bias the slope; ADVICE-r4 class)
    ok = F.col("_y").isNotNull()
    n = F.sum(ok.cast("bigint")).over(wf)
    si = F.sum(F.when(ok, F.col("_i"))).over(wf)
    sii = F.sum(F.when(ok, F.col("_i") * F.col("_i"))).over(wf)
    sy = F.sum("_y").over(wf)
    siy = F.sum(F.col("_i") * F.col("_y")).over(wf)
    nn = n.cast("double")
    num = nn * siy.cast("double") - si.cast("double") * sy.cast("double")
    den = nn * sii.cast("double") - si.cast("double") * si.cast("double")
    slope = F.when(
        (n >= min_periods) & (den != 0), num / den / F.lit(float(m))
    )
    return d.withColumn(f"{column}_slope", slope).drop("_i", "_y")


def rolling_slope_sql(
    table: str,
    column: str,
    order_column: str,
    group_columns,
    select_cols: str,
    window: int = 14,
    min_periods: int = 3,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`rolling_slope`; ``select_cols`` = the
    passthrough projection."""
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    g = ", ".join(groups)
    m = 10**scale
    win = f"PARTITION BY {g} ORDER BY {order_column}"
    fr = f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW"
    return f"""
WITH ix AS (
  SELECT *, CAST(row_number() OVER ({win}) AS BIGINT) AS _i,
    CAST(FLOOR({column} * {m} + 0.5) AS BIGINT) AS _y
  FROM {table}
),
s AS (
  SELECT *,
    CAST(SUM(CASE WHEN _y IS NOT NULL THEN 1 ELSE 0 END)
         OVER ({win} {fr}) AS BIGINT) AS _n,
    CAST(SUM(CASE WHEN _y IS NOT NULL THEN _i END)
         OVER ({win} {fr}) AS BIGINT) AS _si,
    CAST(SUM(CASE WHEN _y IS NOT NULL THEN _i * _i END)
         OVER ({win} {fr}) AS BIGINT) AS _sii,
    CAST(SUM(_y) OVER ({win} {fr}) AS BIGINT) AS _sy,
    CAST(SUM(_i * _y) OVER ({win} {fr}) AS BIGINT) AS _siy
  FROM ix
)
SELECT {select_cols},
  CASE WHEN _n >= {min_periods}
        AND CAST(_n AS DOUBLE) * CAST(_sii AS DOUBLE)
            - CAST(_si AS DOUBLE) * CAST(_si AS DOUBLE) <> 0
       THEN (CAST(_n AS DOUBLE) * CAST(_siy AS DOUBLE)
             - CAST(_si AS DOUBLE) * CAST(_sy AS DOUBLE))
            / (CAST(_n AS DOUBLE) * CAST(_sii AS DOUBLE)
               - CAST(_si AS DOUBLE) * CAST(_si AS DOUBLE))
            / {dlit(m)}
  END AS {column}_slope
FROM s
"""


def threshold_crossings(
    data: DataFrame,
    column: str,
    order_columns,
    group_columns,
    threshold: float,
    scale: int = 6,
) -> DataFrame:
    """Edge-triggered threshold crossing detection per series: emit an
    event only when the series MOVES across ``threshold`` (down-crossing
    = was ≥, now <; up-crossing = was <, now ≥) — the alerting primitive
    that fires once per excursion instead of once per sample (stockouts,
    SLO breaches, recovery events).

    One LAG over the series exchange; values compare as quantized int64
    so the crossing set is bit-stable.  The first sample of a series has
    no predecessor and never fires (no edge without a before-state).

    Returns crossing rows: (groups…, order, value, direction).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    order = _as_list(order_columns)
    m = 10**scale
    thr_q = int(round(threshold * m))
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy(*groups).orderBy(*[F.col(c).asc() for c in order])
    d = data.select(*groups, *order, F.col(column), q.alias("_q")).withColumn(
        "_prev", F.lag("_q").over(w)
    )
    direction = (
        F.when(
            (F.col("_prev") >= thr_q) & (F.col("_q") < thr_q), F.lit("down")
        ).when((F.col("_prev") < thr_q) & (F.col("_q") >= thr_q), F.lit("up"))
    )
    return (
        d.withColumn("direction", direction)
        .filter(F.col("direction").isNotNull())
        .select(*groups, *order, column, "direction")
    )


def threshold_crossings_sql(
    inner_sql: str,
    column: str,
    order_columns,
    group_columns,
    threshold: float,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`threshold_crossings` over ``inner_sql``."""
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    order = _as_list(order_columns)
    g = ", ".join(groups)
    o = ", ".join(order)
    oasc = ", ".join(f"{c} ASC" for c in order)
    m = 10**scale
    thr_q = int(round(threshold * m))
    return f"""
WITH src AS ({inner_sql}),
q AS (
  SELECT {g}, {o}, {column},
    CAST(FLOOR({column} * {m} + 0.5) AS BIGINT) AS _q
  FROM src
),
l AS (
  SELECT *, LAG(_q) OVER (PARTITION BY {g} ORDER BY {oasc}) AS _prev
  FROM q
)
SELECT {g}, {o}, {column},
  CASE WHEN _prev >= {thr_q} AND _q < {thr_q} THEN 'down'
       WHEN _prev < {thr_q} AND _q >= {thr_q} THEN 'up' END AS direction
FROM l
WHERE (_prev >= {thr_q} AND _q < {thr_q}) OR (_prev < {thr_q} AND _q >= {thr_q})
"""


def hampel_filter(
    df,
    column: str,
    group_columns=None,
    half_window: int = 7,
    order_by=None,
    thresh: float = 3.0,
    engine: str = "arrow",
):
    """Hampel filter (centered rolling median/MAD outlier REPAIR — the
    classic despiker for sensor/price series): per row, the median and
    MAD of the CENTERED 2·half_window+1 neighborhood; points beyond
    thresh·1.4826·MAD are replaced by the local median, everything
    else passes through.  The repair sibling of rolling_mad (which
    only FLAGS, trailing-window): use rolling_mad to monitor live
    data, hampel_filter to clean a historical series before fitting.

    Same plan shape as rolling_mad — one collect+sort per centered
    window, medians via the shared sorted-array lerp, JVM HOFs only —
    one exchange, no Python.  Edges use the truncated neighborhood
    (the standard contract: the filter stays defined at both ends).

    Appends {c}_hampel (the repaired series), {c}_hampel_replaced.
    """
    from timeseriesutils_spark.operators.window_features import (
        _as_list,
        make_window,
    )

    c = F.col(column)
    if engine == "arrow" and group_columns:
        # round-14 (guide §4.2): shared grouped-Arrow median/MAD kernel
        # (see _roll_med_mad_arrow); engine="relational" keeps the HOF
        # chain as the A/B control
        tmp = _roll_med_mad_arrow(
            df, column, group_columns, order_by, -half_window, half_window
        )
    else:
        w = make_window(group_columns, _as_list(order_by)).rowsBetween(
            -half_window, half_window
        )
        tmp = df.select(
            "*", F.sort_array(F.collect_list(c).over(w)).alias("_h_arr")
        )
        tmp = tmp.withColumn("_med", _lerp_sorted(F.col("_h_arr"), 0.5))
        devs = F.array_sort(
            F.transform(F.col("_h_arr"), lambda v: F.abs(v - F.col("_med")))
        )
        tmp = tmp.withColumn("_mad", _lerp_sorted(devs, 0.5))
    bad = F.abs(c - F.col("_med")) > (
        F.lit(float(thresh) * MAD_K) * F.col("_mad")
    )
    return tmp.select(
        *df.columns,
        F.when(bad, F.col("_med")).otherwise(c.cast("double")).alias(
            f"{column}_hampel"
        ),
        bad.alias(f"{column}_hampel_replaced"),
    )


def hampel_filter_sql(
    table: str,
    select_cols: str,
    column: str,
    group_columns,
    order_by,
    half_window: int = 7,
    thresh: float = 3.0,
) -> str:
    """DuckDB twin of :func:`hampel_filter` (full query text)."""
    over = (
        f"(PARTITION BY {', '.join(group_columns)} "
        f"ORDER BY {', '.join(order_by)} "
        f"ROWS BETWEEN {half_window} PRECEDING AND {half_window} FOLLOWING)"
    )
    med = _lerp_sorted_sql("arr", 0.5)
    mad = _lerp_sorted_sql("darr", 0.5)
    return f"""
WITH a AS (
  SELECT {select_cols}, list_sort(list({column}) OVER {over}) AS arr
  FROM {table}
),
m AS (SELECT *, {med} AS _med FROM a),
d AS (
  SELECT *, list_sort(list_transform(arr, v -> abs(v - _med))) AS darr FROM m
),
f AS (
  SELECT *,
    abs({column} - _med) > {float(thresh) * MAD_K!r} * {mad} AS _bad
  FROM d
)
SELECT {select_cols},
  CASE WHEN _bad THEN _med ELSE CAST({column} AS DOUBLE) END
    AS {column}_hampel,
  _bad AS {column}_hampel_replaced
FROM f
"""
