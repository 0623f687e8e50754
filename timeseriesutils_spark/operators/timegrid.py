"""Time-grid regularization: gap filling, forward/backward fill, linear
interpolation.

The reference operates on whatever rows the caller provides and silently
assumes a dense, pre-sorted grid (featurize.py:16-18 docstring contract);
real series have holes.  These operators make the grid explicit so every
downstream window feature (lag / rollmean / taylor / domfreq) sees one
row per (group, tick):

  * ``fill_gaps``          — per-group dense integral grid (date spine):
                             ``sequence`` + explode + left join.
  * ``ffill`` / ``bfill``  — last/next-observation carried forward via
                             ``last/first(..., ignorenulls=True)`` over
                             an unbounded frame (pure window, no UDF).
  * ``interpolate_linear`` — linear fill between the surrounding
                             observations, from four window exprs
                             (prev/next value + time); exact IEEE
                             arithmetic shared with the DuckDB oracle.

Scale notes:
  * ``fill_gaps`` bounds the per-row array from ``sequence`` with a
    two-level explode (chunk starts, then ticks within a chunk), so a
    group spanning years at 1-second resolution never materializes one
    giant array on an executor.  The spine join is an equi-join on
    (groups, time) — co-partitioned with every later window op.
  * ffill/bfill/interpolation are single-window passes over the same
    (groups, order) exchange as the rest of the feature chain; Spark's
    WindowExec evaluates last/first ignoreNulls in running fashion (no
    per-row rescans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list, make_window


def fill_gaps(
    df: DataFrame,
    time_col: str,
    group_columns,
    step: int = 1,
    chunk: int = 65536,
) -> DataFrame:
    """Densify each group's integral time axis to every ``step`` ticks
    between its min and max.  Missing ticks appear with NULLs in all
    non-key columns.

    ``time_col`` must be integral (day number, epoch seconds/millis, …);
    convert calendar types before calling (``datediff`` / ``unix_millis``)
    so grid arithmetic is exact and engine-portable.
    """
    if step <= 0 or chunk <= 0:
        raise ValueError("step and chunk must be positive")
    groups = _as_list(group_columns)
    if not groups:
        raise ValueError("fill_gaps requires group_columns (per-series spine)")
    lo, hi = F.col("_lo"), F.col("_hi")
    bounds = df.groupBy(*groups).agg(
        F.min(time_col).cast("bigint").alias("_lo"),
        F.max(time_col).cast("bigint").alias("_hi"),
    )
    span = step * chunk
    # level 1: chunk indices 0..floor((hi-lo)/span); level 2: ticks inside
    # the chunk — per-row arrays are ≤ chunk elements regardless of span
    chunks = bounds.select(
        *groups,
        "_lo",
        "_hi",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.floor((hi - lo) / F.lit(span)).cast("bigint"))
        ).alias("_ci"),
    )
    grid = chunks.select(
        *groups,
        F.explode(
            F.sequence(
                lo + F.col("_ci") * F.lit(span),
                F.least(hi, lo + (F.col("_ci") + F.lit(1)) * F.lit(span) - F.lit(step)),
                F.lit(step).cast("bigint"),
            )
        ).alias(time_col),
    )
    right = df.withColumn(time_col, F.col(time_col).cast("bigint"))
    return grid.join(right, groups + [time_col], "left")


def regularize(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    how: str = "spine",
    step: int = 1,
    chunk: int = 65536,
) -> DataFrame:
    """Fused spine + fill over an OBSERVATIONS frame (one non-null value
    per (group, tick)): densify each group's [min, max] time range and
    fill the gap rows in the same pass.

      how='spine'  → gap rows carry NULL (``fill_gaps`` equivalent)
      how='ffill'  → adds ``{value_col}_ffill`` = previous observation
      how='interp' → adds ``{value_col}_interp`` = linear fill (the exact
                     expression tree of :func:`interpolate_linear`)

    Why this exists when ``fill_gaps`` + ``ffill``/``interpolate_linear``
    compose to the same result: the composed plan is a bounds aggregate,
    a spine equi-join, and (for interpolation) TWO ordered window passes
    (ascending + descending).  Here each gap's surrounding observations
    are already ON the row that generates it — one ``lead`` window pass,
    one explode, NO join, no reverse sort (measured 3.7× faster at
    sf0.1).  At 100 TB this is one exchange + one in-partition pass.

    Gap arrays are chunk-bounded exactly like ``fill_gaps`` (a year-long
    gap at 1 s resolution never materializes one giant array).
    Precondition: ``value_col`` is non-null on input rows (true for any
    aggregated observation frame); interior NULL observations would be
    passed through, not interpolated — use the composable operators for
    frames that already contain NULL rows.  Grid = per-segment
    ``t + k·step`` (identical to ``fill_gaps`` for step=1; for coarser
    steps the composed form aligns the grid to the group min instead).
    """
    if how not in ("spine", "ffill", "interp"):
        raise ValueError(f"unknown how={how!r}")
    if step <= 0 or chunk <= 0:
        raise ValueError("step and chunk must be positive")
    groups = _as_list(group_columns)
    if not groups:
        raise ValueError("regularize requires group_columns (per-series spine)")
    w = make_window(groups, [time_col])
    src = df.select(
        *groups, F.col(time_col).cast("bigint").alias(time_col), value_col
    )
    b = src.select(
        "*",
        F.lead(time_col).over(w).alias("_nt"),
        F.lead(value_col).over(w).alias("_nv"),
    )
    t, span = F.col(time_col), step * chunk
    end = F.coalesce(F.col("_nt") - F.lit(step), t)  # segment's last tick
    chunks = b.select(
        "*",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.floor((end - t) / F.lit(span)).cast("bigint")
            )
        ).alias("_ci"),
    )
    ticks = F.explode(
        F.sequence(
            t + F.col("_ci") * F.lit(span),
            F.least(end, t + (F.col("_ci") + F.lit(1)) * F.lit(span) - F.lit(step)),
            F.lit(step).cast("bigint"),
        )
    )
    g = chunks.select(*groups, time_col, value_col, "_nt", "_nv", ticks.alias("_d"))
    d, obs = F.col("_d"), F.col("_d") == t
    v = F.col(value_col)
    out = [*groups, d.alias(time_col), F.when(obs, v).alias(value_col)]
    if how == "ffill":
        out.append(v.alias(f"{value_col}_ffill"))
    elif how == "interp":
        pv, nv, pt, nt = v, F.col("_nv"), t, F.col("_nt")
        interp = pv + (nv - pv) * (
            (d - pt).cast("double") / (nt - pt).cast("double")
        )
        out.append(
            F.when(obs, v.cast("double")).otherwise(interp).alias(f"{value_col}_interp")
        )
    return g.select(*out)


def _desc_window(group_columns, order_by):
    """Same partitioning, reversed order — lets every "look ahead to the
    next X" become a RUNNING frame.  Spark's running frames
    (UNBOUNDED PRECEDING → CURRENT ROW) evaluate incrementally in one
    pass; a CURRENT ROW → UNBOUNDED FOLLOWING frame re-aggregates the
    remainder of the partition per row — O(n²) on a monster group
    (measured 14× slower on the sf0.01 spine)."""
    order_by = _as_list(order_by)
    if not order_by:
        raise ValueError("order_by is required (explicit time ordering)")
    groups = _as_list(group_columns)
    cols = [F.col(c).desc() for c in order_by]
    if groups:
        return Window.partitionBy(*groups).orderBy(*cols)
    return Window.partitionBy().orderBy(*cols)


def ffill(df: DataFrame, columns, group_columns=None, order_by=None, suffix: str = "_ffill") -> DataFrame:
    """Last observation carried forward: ``{c}{suffix}`` = most recent
    non-null value of ``c`` at or before the current row."""
    w = make_window(group_columns, order_by)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols = [
        F.last(c, ignorenulls=True).over(run).alias(f"{c}{suffix}")
        for c in _as_list(columns)
    ]
    return df.select("*", *cols)


def bfill(df: DataFrame, columns, group_columns=None, order_by=None, suffix: str = "_bfill") -> DataFrame:
    """Next observation carried backward (mirror of ``ffill``); runs as a
    running frame over the descending order (see ``_desc_window``)."""
    w = _desc_window(group_columns, order_by)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols = [
        F.last(c, ignorenulls=True).over(run).alias(f"{c}{suffix}")
        for c in _as_list(columns)
    ]
    return df.select("*", *cols)


def interpolate_linear(
    df: DataFrame,
    column: str,
    time_col: str,
    group_columns=None,
    order_by=None,
    suffix: str = "_interp",
) -> DataFrame:
    """Linear interpolation of ``column`` over gaps: at rows where it is
    NULL but observations exist on both sides,

        prev + (next - prev) * ((t - t_prev) / (t_next - t_prev))

    (exactly this association — the DuckDB oracle renders the same tree,
    so doubles match bitwise).  Leading/trailing NULLs stay NULL; observed
    rows pass through unchanged.  ``time_col`` must be numeric.
    """
    order_by = _as_list(order_by) or [time_col]
    before = make_window(group_columns, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # "next observation" = running last over the REVERSED order: both
    # lookups are incremental one-pass frames (see _desc_window)
    after = _desc_window(group_columns, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c, t = F.col(column), F.col(time_col)
    obs_v = F.when(c.isNotNull(), c)
    obs_t = F.when(c.isNotNull(), t)
    pv = F.last(obs_v, ignorenulls=True).over(before)
    pt = F.last(obs_t, ignorenulls=True).over(before)
    nv = F.last(obs_v, ignorenulls=True).over(after)
    nt = F.last(obs_t, ignorenulls=True).over(after)
    interp = pv + (nv - pv) * ((t - pt).cast("double") / (nt - pt).cast("double"))
    out = F.when(c.isNotNull(), c.cast("double")).otherwise(interp)
    return df.select("*", out.alias(f"{column}{suffix}"))
